"""Optional tree-sitter parse branch (SURVEY §2.2 M1-M6 accuracy path).

The reference's PRIMARY extraction path is tree-sitter AST walking
(/root/reference/codesearch/parser/python_parser.py:44-289,
javascript_parser.py:44-357, go_parser.py:44-285, rust_parser.py:44-339);
the regex line scanners in :mod:`.parse` implement its deterministic
fallback semantics.  This module provides the AST branch where the
tree-sitter wheels exist, producing the SAME entity dict shape, and is a
no-op (``available() == False``) in environments without them — such as
this container, where the regex path remains canonical.

Design for Ray:

* every parser callable returned by :func:`make_parsers` is a MODULE-LEVEL
  function, so the dict pickles into ``build_index(extra_parsers=...)``
  closures and ships to workers;
* the tree-sitter ``Parser`` objects themselves (not picklable) are built
  lazily ONCE PER WORKER PROCESS via :func:`_get_parser`'s cache — the ST3
  parser-cache semantics without needing an actor class;
* any per-file AST failure falls back to the regex scanner for that file
  (the reference's ``_fallback_parse`` contract, python_parser.py:47-62).
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, List, Optional

from .parse import (
    _entity,
    parse_go as _regex_go,
    parse_javascript as _regex_js,
    parse_python as _regex_py,
    parse_rust as _regex_rust,
)

_LANG_MODULES = {
    "python": "tree_sitter_python",
    "javascript": "tree_sitter_javascript",
    "typescript": "tree_sitter_typescript",
    "go": "tree_sitter_go",
    "rust": "tree_sitter_rust",
}

_parsers: Dict[str, object] = {}
_lock = threading.Lock()


def available(langs: Optional[List[str]] = None) -> bool:
    """True when tree-sitter plus the per-language grammars are importable."""
    try:
        import tree_sitter  # noqa: F401
    except ImportError:
        return False
    import importlib.util

    for lang in langs or _LANG_MODULES:
        mod = _LANG_MODULES[lang]
        if importlib.util.find_spec(mod) is None and importlib.util.find_spec(
            "tree_sitter_languages"
        ) is None:
            return False
    return True


def _get_parser(lang: str):
    """Per-process parser cache (built once per worker, ST3 semantics)."""
    with _lock:
        p = _parsers.get(lang)
        if p is not None:
            return p
        from tree_sitter import Language, Parser

        try:
            import importlib

            mod = importlib.import_module(_LANG_MODULES[lang])
            if lang == "typescript":  # ships two grammars
                ts_lang = Language(mod.language_typescript())
            else:
                ts_lang = Language(mod.language())
        except ImportError:
            from tree_sitter_languages import get_language

            ts_lang = get_language(lang)
        try:
            parser = Parser(ts_lang)
        except TypeError:  # older tree-sitter API
            parser = Parser()
            parser.set_language(ts_lang)
        _parsers[lang] = parser
        return parser


def _text(node, src: bytes) -> str:
    return src[node.start_byte : node.end_byte].decode("utf-8", "replace")


def _loc(node) -> int:
    return node.end_point[0] - node.start_point[0] + 1


_BRANCH_TYPES = {
    "if_statement", "elif_clause", "for_statement", "while_statement",
    "except_clause", "with_statement", "boolean_operator", "conditional_expression",
    "match_statement", "case_clause",
    # js/go/rust equivalents
    "switch_statement", "catch_clause", "ternary_expression",
    "for_in_statement", "expression_switch_statement", "type_switch_statement",
    "if_expression", "while_expression", "for_expression", "loop_expression",
    "match_expression", "match_arm",
}


def _complexity(node) -> int:
    """1 + branch-node count — the reference's cyclomatic estimate
    (python_parser.py:267-289)."""
    n = 1
    stack = [node]
    while stack:
        cur = stack.pop()
        if cur.type in _BRANCH_TYPES:
            n += 1
        stack.extend(cur.children)
    return n


def _py_params(params_node, src: bytes) -> List[str]:
    out = []
    for ch in params_node.children:
        if ch.type in ("identifier",):
            out.append(_text(ch, src))
        elif ch.type in (
            "typed_parameter", "default_parameter", "typed_default_parameter",
            "list_splat_pattern", "dictionary_splat_pattern",
        ):
            for sub in ch.children:
                if sub.type == "identifier":
                    out.append(_text(sub, src))
                    break
            else:
                out.append(_text(ch, src))
    return out


def _py_docstring(fn_node, src: bytes) -> Optional[str]:
    for ch in fn_node.children:
        if ch.type == "block":
            for stmt in ch.children:
                if stmt.type == "expression_statement" and stmt.children:
                    first = stmt.children[0]
                    if first.type == "string":
                        raw = _text(first, src)
                        for q in ('"""', "'''", '"', "'"):
                            if raw.startswith(q) and raw.endswith(q) and len(raw) >= 2 * len(q):
                                return raw[len(q) : -len(q)].strip()
                        return raw.strip()
                return None if stmt.type == "expression_statement" else None
            return None
    return None


def parse_python_ts(content: str, file_path: str, repo_name: str) -> List[dict]:
    """AST Python extractor — the reference's primary path
    (python_parser.py:66-265): function_definition / class_definition walk,
    decorators from previous siblings, docstring = first string statement."""
    try:
        src = content.encode("utf-8")
        tree = _get_parser("python").parse(src)
        out: List[dict] = []

        def fn_entity(node, parent_class: Optional[str]) -> Optional[dict]:
            name, params, rtype = None, [], None
            for ch in node.children:
                if ch.type == "identifier" and name is None:
                    name = _text(ch, src)
                elif ch.type == "parameters":
                    params = _py_params(ch, src)
                elif ch.type == "type":
                    rtype = _text(ch, src).strip()
            if not name:
                return None
            decos: List[str] = []
            prev = node.prev_sibling
            while prev is not None and prev.type == "decorator":
                decos.insert(0, _text(prev, src))
                prev = prev.prev_sibling
            sig = f"def {name}({', '.join(params)})" + (f" -> {rtype}" if rtype else "")
            return _entity(
                name, "method" if parent_class else "function", "python",
                file_path, repo_name, node.start_point[0] + 1, node.end_point[0] + 1,
                _text(node, src), docstring=_py_docstring(node, src), signature=sig,
                parameters=params, return_type=rtype, decorators=decos,
                parent_class=parent_class, complexity=_complexity(node), loc=_loc(node),
            )

        def visit(node, parent_class: Optional[str]):
            if node.type == "decorated_definition":
                for ch in node.children:
                    visit(ch, parent_class)
                return
            if node.type == "function_definition":
                e = fn_entity(node, parent_class)
                if e:
                    out.append(e)
                # nested defs keep the enclosing class only at depth 1
                for ch in node.children:
                    if ch.type == "block":
                        for stmt in ch.children:
                            visit(stmt, None)
                return
            if node.type == "class_definition":
                cname = None
                for ch in node.children:
                    if ch.type == "identifier":
                        cname = _text(ch, src)
                        break
                if cname:
                    bases = []
                    for ch in node.children:
                        if ch.type == "argument_list":
                            bases = [
                                _text(b, src)
                                for b in ch.children
                                if b.type not in ("(", ")", ",")
                            ]
                    out.append(
                        _entity(
                            cname, "class", "python", file_path, repo_name,
                            node.start_point[0] + 1, node.end_point[0] + 1,
                            _text(node, src), docstring=_py_docstring(node, src),
                            signature=f"class {cname}({', '.join(bases)})" if bases else f"class {cname}",
                            complexity=_complexity(node), loc=_loc(node),
                        )
                    )
                for ch in node.children:
                    if ch.type == "block":
                        for stmt in ch.children:
                            visit(stmt, cname)
                return
            for ch in node.children:
                visit(ch, parent_class)

        visit(tree.root_node, None)
        return out
    except Exception:
        return _regex_py(content, file_path, repo_name)


def _js_params(node, src: bytes) -> List[str]:
    out = []
    for ch in node.children:
        if ch.type in ("identifier", "rest_pattern", "assignment_pattern",
                       "object_pattern", "array_pattern", "required_parameter",
                       "optional_parameter"):
            if ch.type in ("identifier",):
                out.append(_text(ch, src))
            else:
                for sub in ch.children:
                    if sub.type == "identifier":
                        out.append(_text(sub, src))
                        break
                else:
                    out.append(_text(ch, src))
    return out


def parse_javascript_ts(content: str, file_path: str, repo_name: str) -> List[dict]:
    """AST JS/TS extractor (javascript_parser.py:44-357): function
    declarations/expressions, arrow functions bound to names, classes with
    method_definition children."""
    lang = "typescript" if file_path.lower().endswith((".ts", ".tsx")) else "javascript"
    try:
        src = content.encode("utf-8")
        tree = _get_parser(lang).parse(src)
        out: List[dict] = []

        def add_fn(name, node, params_node, parent_class=None, etype="function"):
            params = _js_params(params_node, src) if params_node is not None else []
            out.append(
                _entity(
                    name, etype, lang, file_path, repo_name,
                    node.start_point[0] + 1, node.end_point[0] + 1, _text(node, src),
                    signature=f"{name}({', '.join(params)})", parameters=params,
                    parent_class=parent_class, complexity=_complexity(node), loc=_loc(node),
                )
            )

        def visit(node, parent_class: Optional[str]):
            t = node.type
            if t in ("function_declaration", "generator_function_declaration"):
                name, params_node = None, None
                for ch in node.children:
                    if ch.type == "identifier":
                        name = _text(ch, src)
                    elif ch.type == "formal_parameters":
                        params_node = ch
                if name:
                    add_fn(name, node, params_node)
            elif t in ("lexical_declaration", "variable_declaration"):
                for ch in node.children:
                    if ch.type == "variable_declarator":
                        name, value = None, None
                        for sub in ch.children:
                            if sub.type == "identifier" and name is None:
                                name = _text(sub, src)
                            elif sub.type in ("arrow_function", "function_expression", "function"):
                                value = sub
                        if name and value is not None:
                            pn = next(
                                (s for s in value.children if s.type == "formal_parameters"),
                                None,
                            )
                            add_fn(name, ch, pn)
            elif t in ("class_declaration", "class"):
                cname = None
                for ch in node.children:
                    if ch.type in ("identifier", "type_identifier"):
                        cname = _text(ch, src)
                        break
                if cname:
                    out.append(
                        _entity(
                            cname, "class", lang, file_path, repo_name,
                            node.start_point[0] + 1, node.end_point[0] + 1,
                            _text(node, src), signature=f"class {cname}",
                            complexity=_complexity(node), loc=_loc(node),
                        )
                    )
                for ch in node.children:
                    if ch.type == "class_body":
                        for m in ch.children:
                            if m.type == "method_definition":
                                mname, pn = None, None
                                for sub in m.children:
                                    if sub.type == "property_identifier":
                                        mname = _text(sub, src)
                                    elif sub.type == "formal_parameters":
                                        pn = sub
                                if mname:
                                    add_fn(mname, m, pn, parent_class=cname, etype="method")
                return
            for ch in node.children:
                visit(ch, parent_class)

        visit(tree.root_node, None)
        return out
    except Exception:
        return _regex_js(content, file_path, repo_name)


def parse_go_ts(content: str, file_path: str, repo_name: str) -> List[dict]:
    """AST Go extractor (go_parser.py:44-285): function_declaration,
    method_declaration (receiver -> parent), type struct/interface."""
    try:
        src = content.encode("utf-8")
        tree = _get_parser("go").parse(src)
        out: List[dict] = []

        def params_of(node) -> List[str]:
            ps = []
            for ch in node.children:
                if ch.type == "parameter_list":
                    for p in ch.children:
                        if p.type == "parameter_declaration":
                            for sub in p.children:
                                if sub.type == "identifier":
                                    ps.append(_text(sub, src))
                    break
            return ps

        def visit(node):
            t = node.type
            if t == "function_declaration":
                name = next(
                    (_text(ch, src) for ch in node.children if ch.type == "identifier"), None
                )
                if name:
                    ps = params_of(node)
                    out.append(
                        _entity(
                            name, "function", "go", file_path, repo_name,
                            node.start_point[0] + 1, node.end_point[0] + 1,
                            _text(node, src), signature=f"func {name}({', '.join(ps)})",
                            parameters=ps, complexity=_complexity(node), loc=_loc(node),
                        )
                    )
            elif t == "method_declaration":
                name, recv = None, None
                seen_params = 0
                for ch in node.children:
                    if ch.type == "field_identifier":
                        name = _text(ch, src)
                    elif ch.type == "parameter_list":
                        seen_params += 1
                        if seen_params == 1:  # receiver
                            for p in ch.children:
                                if p.type == "parameter_declaration":
                                    recv = _text(p.children[-1], src).lstrip("*") if p.children else None
                if name:
                    ps = params_of(node)
                    out.append(
                        _entity(
                            name, "method", "go", file_path, repo_name,
                            node.start_point[0] + 1, node.end_point[0] + 1,
                            _text(node, src), signature=f"func {name}({', '.join(ps)})",
                            parameters=ps, parent_class=recv,
                            complexity=_complexity(node), loc=_loc(node),
                        )
                    )
            elif t == "type_declaration":
                for ch in node.children:
                    if ch.type == "type_spec":
                        name, kind = None, None
                        for sub in ch.children:
                            if sub.type == "type_identifier" and name is None:
                                name = _text(sub, src)
                            elif sub.type == "struct_type":
                                kind = "struct"
                            elif sub.type == "interface_type":
                                kind = "interface"
                        if name and kind:
                            out.append(
                                _entity(
                                    name, kind, "go", file_path, repo_name,
                                    node.start_point[0] + 1, node.end_point[0] + 1,
                                    _text(node, src), signature=f"type {name} {kind}",
                                    complexity=1, loc=_loc(node),
                                )
                            )
            for ch in node.children:
                visit(ch)

        visit(tree.root_node)
        return out
    except Exception:
        return _regex_go(content, file_path, repo_name)


def parse_rust_ts(content: str, file_path: str, repo_name: str) -> List[dict]:
    """AST Rust extractor (rust_parser.py:44-339): function_item,
    struct_item, enum_item, trait_item (-> interface), impl_item methods."""
    try:
        src = content.encode("utf-8")
        tree = _get_parser("rust").parse(src)
        out: List[dict] = []

        def fn_entity(node, parent: Optional[str], etype: str):
            name, ps, rtype = None, [], None
            for ch in node.children:
                if ch.type == "identifier" and name is None:
                    name = _text(ch, src)
                elif ch.type == "parameters":
                    for p in ch.children:
                        if p.type == "parameter":
                            for sub in p.children:
                                if sub.type == "identifier":
                                    ps.append(_text(sub, src))
                                    break
                        elif p.type == "self_parameter":
                            ps.append("self")
                elif ch.type in ("type_identifier", "generic_type", "reference_type") and rtype is None:
                    prev = ch.prev_sibling
                    if prev is not None and prev.type == "->":
                        rtype = _text(ch, src)
            if name:
                out.append(
                    _entity(
                        name, etype, "rust", file_path, repo_name,
                        node.start_point[0] + 1, node.end_point[0] + 1, _text(node, src),
                        signature=f"fn {name}({', '.join(ps)})" + (f" -> {rtype}" if rtype else ""),
                        parameters=ps, return_type=rtype, parent_class=parent,
                        complexity=_complexity(node), loc=_loc(node),
                    )
                )

        def visit(node, parent: Optional[str]):
            t = node.type
            if t == "function_item":
                fn_entity(node, parent, "method" if parent else "function")
                return
            if t in ("struct_item", "enum_item", "trait_item"):
                name = next(
                    (_text(ch, src) for ch in node.children if ch.type == "type_identifier"),
                    None,
                )
                kind = {"struct_item": "struct", "enum_item": "enum", "trait_item": "interface"}[t]
                if name:
                    out.append(
                        _entity(
                            name, kind, "rust", file_path, repo_name,
                            node.start_point[0] + 1, node.end_point[0] + 1,
                            _text(node, src), signature=f"{kind} {name}",
                            complexity=1, loc=_loc(node),
                        )
                    )
                if t == "trait_item":
                    for ch in node.children:
                        if ch.type == "declaration_list":
                            for m in ch.children:
                                visit(m, name)
                return
            if t == "impl_item":
                target = next(
                    (_text(ch, src) for ch in node.children if ch.type == "type_identifier"),
                    None,
                )
                for ch in node.children:
                    if ch.type == "declaration_list":
                        for m in ch.children:
                            visit(m, target)
                return
            for ch in node.children:
                visit(ch, parent)

        visit(tree.root_node, None)
        return out
    except Exception:
        return _regex_rust(content, file_path, repo_name)


def make_parsers() -> Dict[str, Callable[[str, str, str], List[dict]]]:
    """Parser registry for ``build_index(extra_parsers=...)`` /
    ``parse_content(parsers=...)`` — module-level callables (picklable);
    tree-sitter state is built lazily per worker process."""
    if not available():
        raise RuntimeError(
            "tree-sitter grammars not installed; the regex scanners in "
            "stages.parse remain the canonical path"
        )
    return {
        "python": parse_python_ts,
        "javascript": parse_javascript_ts,
        "typescript": parse_javascript_ts,
        "go": parse_go_ts,
        "rust": parse_rust_ts,
    }
