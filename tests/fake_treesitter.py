"""Tree-sitter grammar stand-ins that EXECUTE the AST walkers in
``stages/treesitter_parse.py`` in this grammar-less container.

Each stand-in produces trees of :class:`FakeNode` objects with the exact
node-object surface the walkers consume (``type`` / ``children`` /
``start_byte`` / ``end_byte`` / ``start_point`` / ``end_point`` /
``prev_sibling``), using the node TYPE NAMES and shapes of the published
tree-sitter grammars (tree-sitter-python / -javascript / -go / -rust
``node-types.json``).  The Python stand-in is not hand-built at all: it
converts CPython's own ``ast`` parse (an independent, real parser) into
tree-sitter shapes, so the walker's byte slicing, decorator sibling
chain, docstring discovery and parameter extraction run against
genuinely parsed structure.  The JS/Go/Rust stand-ins are bounded
recursive line parsers covering the golden fixtures' construct set
(declarations, classes/impls with methods, receivers) — enough to
execute every walker code path the goldens pin.

Used by ``tests/test_treesitter.py`` to turn the formerly-skipping
golden tree-sitter tests into executed passes; the real-grammar path
still runs wherever the wheels are installed (the ``_parsers`` cache in
``treesitter_parse`` is the injection seam either way).
"""

from __future__ import annotations

import ast
import re
from typing import List, Optional


class FakeNode:
    __slots__ = ("type", "children", "start_byte", "end_byte",
                 "start_point", "end_point", "prev_sibling")

    def __init__(self, type_: str, start_byte: int, end_byte: int,
                 start_point, end_point, children=None):
        self.type = type_
        self.start_byte = start_byte
        self.end_byte = end_byte
        self.start_point = tuple(start_point)
        self.end_point = tuple(end_point)
        self.children = children or []
        self.prev_sibling = None
        _link_siblings(self.children)


def _link_siblings(children: List[FakeNode]) -> None:
    prev = None
    for ch in children:
        ch.prev_sibling = prev
        prev = ch


class FakeTree:
    def __init__(self, root: FakeNode):
        self.root_node = root


class FakeParser:
    """Drop-in for a ``tree_sitter.Parser``: ``parse(src_bytes)``."""

    def __init__(self, builder):
        self._builder = builder

    def parse(self, src: bytes) -> FakeTree:
        return FakeTree(self._builder(src))


# --------------------------------------------------------------------------
# Python: convert CPython ast -> tree-sitter-python shapes
# --------------------------------------------------------------------------

def _line_starts(src: bytes) -> List[int]:
    starts = [0]
    for i, b in enumerate(src):
        if b == 0x0A:
            starts.append(i + 1)
    return starts


class _PyConverter:
    """ast -> tree-sitter-python node shapes.  ast col offsets are UTF-8
    byte offsets, which is exactly tree-sitter's coordinate system."""

    def __init__(self, src: bytes):
        self.src = src
        self.starts = _line_starts(src)

    def byte(self, lineno: int, col: int) -> int:
        return self.starts[lineno - 1] + col

    def node(self, type_: str, a, children=None, *,
             start=None, end=None) -> FakeNode:
        sl, sc = start if start else (a.lineno, a.col_offset)
        el, ec = end if end else (a.end_lineno, a.end_col_offset)
        return FakeNode(type_, self.byte(sl, sc), self.byte(el, ec),
                        (sl - 1, sc), (el - 1, ec), children)

    def ident_at(self, lineno: int, col: int, name: str) -> FakeNode:
        b0 = self.byte(lineno, col)
        return FakeNode("identifier", b0, b0 + len(name),
                        (lineno - 1, col), (lineno - 1, col + len(name)))

    def _find_name(self, a, name: str) -> FakeNode:
        """Locate the definition's name token textually right after the
        def/class keyword on the header line."""
        line_start = self.starts[a.lineno - 1]
        line = self.src[line_start:
                        self.starts[a.lineno] if a.lineno < len(self.starts)
                        else len(self.src)].decode("utf-8", "replace")
        col = line.index(name, a.col_offset - 0 if False else 0)
        return self.ident_at(a.lineno, col, name)

    def _params(self, a) -> FakeNode:
        args = a.args
        kids: List[FakeNode] = []
        for arg in (args.posonlyargs + args.args + args.kwonlyargs):
            ident = self.node("identifier", arg,
                              end=(arg.lineno, arg.col_offset + len(arg.arg)))
            if arg.annotation is not None:
                kids.append(self.node("typed_parameter", arg,
                                      [ident,
                                       self.node("type", arg.annotation)]))
            else:
                kids.append(ident)
        if args.vararg is not None:
            v = args.vararg
            kids.append(self.node(
                "list_splat_pattern", v,
                [self.node("identifier", v,
                           end=(v.lineno, v.col_offset + len(v.arg)))]))
        if args.kwarg is not None:
            v = args.kwarg
            kids.append(self.node(
                "dictionary_splat_pattern", v,
                [self.node("identifier", v,
                           end=(v.lineno, v.col_offset + len(v.arg)))]))
        # span: from the first param to the last (fine for the walkers,
        # which only read children of this node)
        if kids:
            pn = FakeNode("parameters", kids[0].start_byte, kids[-1].end_byte,
                          kids[0].start_point, kids[-1].end_point, kids)
        else:
            b0 = self.byte(a.lineno, a.col_offset)
            pn = FakeNode("parameters", b0, b0,
                          (a.lineno - 1, a.col_offset),
                          (a.lineno - 1, a.col_offset))
        return pn

    def _block(self, stmts) -> Optional[FakeNode]:
        kids = [self.stmt(s) for s in stmts]
        kids = [k for k in kids if k is not None]
        if not kids:
            return None
        return FakeNode("block", kids[0].start_byte, kids[-1].end_byte,
                        kids[0].start_point, kids[-1].end_point, kids)

    _BRANCH = {
        ast.If: "if_statement", ast.For: "for_statement",
        ast.While: "while_statement", ast.With: "with_statement",
        ast.ExceptHandler: "except_clause", ast.BoolOp: "boolean_operator",
        ast.IfExp: "conditional_expression", ast.Match: "match_statement",
    }

    def stmt(self, a) -> Optional[FakeNode]:
        if isinstance(a, (ast.FunctionDef, ast.AsyncFunctionDef)):
            return self.function(a)
        if isinstance(a, ast.ClassDef):
            return self.classdef(a)
        if isinstance(a, ast.Expr):
            val = a.value
            kids = []
            if isinstance(val, ast.Constant) and isinstance(val.value, str):
                kids = [self.node("string", val)]
            else:
                kids = [b for b in (self._branches(val),) if b] and \
                    self._branches(val) or []
            return self.node("expression_statement", a, kids)
        # generic statement: keep branch structure for complexity
        t = self._BRANCH.get(type(a), a.__class__.__name__.lower())
        return self.node(t, a, self._branches_children(a))

    def _branches_children(self, a) -> List[FakeNode]:
        out = []
        for child in ast.iter_child_nodes(a):
            if not hasattr(child, "lineno"):
                continue
            t = self._BRANCH.get(type(child))
            kids = self._branches_children(child)
            if t is not None:
                out.append(self.node(t, child, kids))
            else:
                out.extend(kids)
        return out

    def _branches(self, a) -> List[FakeNode]:
        return self._branches_children(a)

    def function(self, a) -> FakeNode:
        name = self._find_name(a, a.name)
        kids: List[FakeNode] = [name, self._params(a)]
        if a.returns is not None:
            kids.append(self.node("type", a.returns))
        blk = self._block(a.body)
        if blk is not None:
            kids.append(blk)
        fn = self.node("function_definition", a, kids)
        if a.decorator_list:
            decos = [
                self.node("decorator", d,
                          start=(d.lineno, max(0, d.col_offset - 1)))
                for d in a.decorator_list
            ]
            first = decos[0]
            return FakeNode("decorated_definition", first.start_byte,
                            fn.end_byte, first.start_point, fn.end_point,
                            decos + [fn])
        return fn

    def classdef(self, a) -> FakeNode:
        name = self._find_name(a, a.name)
        kids: List[FakeNode] = [name]
        if a.bases or a.keywords:
            bases = [self.node("identifier", b) if isinstance(b, ast.Name)
                     else self.node("attribute", b) for b in a.bases]
            if bases:
                kids.append(FakeNode(
                    "argument_list", bases[0].start_byte, bases[-1].end_byte,
                    bases[0].start_point, bases[-1].end_point, bases))
        blk = self._block(a.body)
        if blk is not None:
            kids.append(blk)
        cls = self.node("class_definition", a, kids)
        if a.decorator_list:
            decos = [self.node("decorator", d,
                               start=(d.lineno, max(0, d.col_offset - 1)))
                     for d in a.decorator_list]
            return FakeNode("decorated_definition", decos[0].start_byte,
                            cls.end_byte, decos[0].start_point, cls.end_point,
                            decos + [cls])
        return cls


def build_python_tree(src: bytes) -> FakeNode:
    text = src.decode("utf-8")
    mod = ast.parse(text)
    conv = _PyConverter(src)
    kids = [conv.stmt(s) for s in mod.body]
    kids = [k for k in kids if k is not None]
    return FakeNode("module", 0, len(src), (0, 0),
                    (text.count("\n"), 0), kids)


# --------------------------------------------------------------------------
# shared helpers for the line-oriented mini-parsers
# --------------------------------------------------------------------------

def _match_brace(text: str, open_idx: int, open_ch="{", close_ch="}") -> int:
    depth = 0
    for i in range(open_idx, len(text)):
        c = text[i]
        if c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return i
    return len(text) - 1


def _pt(text: str, idx: int):
    row = text.count("\n", 0, idx)
    col = idx - (text.rfind("\n", 0, idx) + 1)
    return (row, col)


def _mk(text: str, type_: str, s: int, e: int, children=None) -> FakeNode:
    return FakeNode(type_, s, e, _pt(text, s), _pt(text, e), children)


def _ident(text: str, type_: str, m_start: int, name: str) -> FakeNode:
    return _mk(text, type_, m_start, m_start + len(name))


# --------------------------------------------------------------------------
# JavaScript / TypeScript (tree-sitter-javascript shapes)
# --------------------------------------------------------------------------

_JS_FN = re.compile(r"(?:export\s+)?(?:async\s+)?function\s+([A-Za-z_$][\w$]*)\s*\(")
_JS_ARROW = re.compile(
    r"(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*=\s*"
    r"(?:async\s*)?(?:\(([^)]*)\)|([A-Za-z_$][\w$]*))\s*=>")
_JS_CLASS = re.compile(r"(?:export\s+)?class\s+([A-Za-z_$][\w$]*)")
_JS_METHOD = re.compile(
    r"^\s*(?:async\s+)?(?:static\s+)?(?:get\s+|set\s+)?"
    r"([A-Za-z_$][\w$]*)\s*\(([^)]*)\)\s*{", re.M)


def _js_formal_params(text: str, paren_open: int) -> FakeNode:
    close = text.index(")", paren_open)
    inner = text[paren_open + 1:close]
    kids = []
    pos = paren_open + 1
    for part in inner.split(","):
        name = part.strip()
        if not name:
            continue
        # strip TS annotations / defaults down to the identifier
        m = re.match(r"(?:\.\.\.)?\s*([A-Za-z_$][\w$]*)", name)
        if not m:
            continue
        at = text.index(m.group(1), pos, close)
        if ":" in part or "?" in part:  # TS annotated parameter
            kids.append(_mk(text, "required_parameter", at,
                            at + len(part.strip()),
                            [_ident(text, "identifier", at, m.group(1))]))
        elif part.strip().startswith("..."):
            kids.append(_mk(text, "rest_pattern", at - 3,
                            at + len(m.group(1)),
                            [_ident(text, "identifier", at, m.group(1))]))
        else:
            kids.append(_ident(text, "identifier", at, m.group(1)))
        pos = at + len(m.group(1))
    return _mk(text, "formal_parameters", paren_open, close + 1, kids)


def build_javascript_tree(src: bytes) -> FakeNode:
    text = src.decode("utf-8")
    kids: List[FakeNode] = []
    consumed = [False] * len(text)

    for m in _JS_CLASS.finditer(text):
        brace = text.index("{", m.end())
        end = _match_brace(text, brace)
        cname_at = m.start(1)
        body_kids: List[FakeNode] = []
        for mm in _JS_METHOD.finditer(text[brace:end]):
            ms = brace + mm.start(1)
            p_open = brace + mm.end(1) + text[brace + mm.end(1):end].index("(")
            m_brace = text.index("{", p_open)
            m_end = _match_brace(text, m_brace)
            body_kids.append(_mk(
                text, "method_definition", ms, m_end + 1,
                [_ident(text, "property_identifier", ms, mm.group(1)),
                 _js_formal_params(text, p_open)]))
        body = _mk(text, "class_body", brace, end + 1, body_kids)
        kids.append(_mk(text, "class_declaration", m.start(), end + 1,
                        [_ident(text, "identifier", cname_at, m.group(1)),
                         body]))
        for i in range(m.start(), end + 1):
            consumed[i] = True

    for m in _JS_FN.finditer(text):
        if consumed[m.start()]:
            continue
        p_open = text.index("(", m.end(1))
        brace = text.index("{", p_open)
        end = _match_brace(text, brace)
        kids.append(_mk(
            text, "function_declaration", m.start(), end + 1,
            [_ident(text, "identifier", m.start(1), m.group(1)),
             _js_formal_params(text, p_open),
             _mk(text, "statement_block", brace, end + 1)]))

    for m in _JS_ARROW.finditer(text):
        if consumed[m.start()]:
            continue
        arrow_at = text.index("=>", m.start())
        # arrow body: block or expression to end of statement
        after = arrow_at + 2
        while after < len(text) and text[after] in " \t":
            after += 1
        if after < len(text) and text[after] == "{":
            end = _match_brace(text, after)
        else:
            nl = text.find("\n", after)
            end = (nl if nl != -1 else len(text)) - 1
        if m.group(2) is not None:
            p_open = text.index("(", m.end(1))
            params = _js_formal_params(text, p_open)
        else:
            at = m.start(3)
            params = _mk(text, "formal_parameters", at,
                         at + len(m.group(3)),
                         [_ident(text, "identifier", at, m.group(3))])
        arrow = _mk(text, "arrow_function",
                    text.index("=", m.end(1)) + 1, end + 1, [params])
        declr = _mk(text, "variable_declarator", m.start(1), end + 1,
                    [_ident(text, "identifier", m.start(1), m.group(1)),
                     arrow])
        kids.append(_mk(text, "lexical_declaration", m.start(), end + 1,
                        [declr]))

    kids.sort(key=lambda n: n.start_byte)
    _link_siblings(kids)
    return FakeNode("program", 0, len(src), (0, 0),
                    (text.count("\n"), 0), kids)


# --------------------------------------------------------------------------
# Go (tree-sitter-go shapes)
# --------------------------------------------------------------------------

_GO_TYPE = re.compile(r"^type\s+([A-Za-z_]\w*)\s+(struct|interface)\s*{", re.M)
_GO_FUNC = re.compile(r"^func\s+([A-Za-z_]\w*)\s*\(", re.M)
_GO_METHOD = re.compile(
    r"^func\s*\(\s*([A-Za-z_]\w*)\s+([*A-Za-z_][\w.]*)\s*\)\s*"
    r"([A-Za-z_]\w*)\s*\(", re.M)


def _go_param_list(text: str, open_idx: int) -> FakeNode:
    close = text.index(")", open_idx)
    inner = text[open_idx + 1:close]
    kids = []
    pos = open_idx + 1
    for part in inner.split(","):
        stripped = part.strip()
        if not stripped:
            continue
        words = stripped.split()
        sub = []
        if len(words) >= 2:  # name Type
            name_at = text.index(words[0], pos, close)
            type_at = text.index(words[-1], name_at + len(words[0]), close)
            sub = [_ident(text, "identifier", name_at, words[0]),
                   _ident(text,
                          "pointer_type" if words[-1].startswith("*")
                          else "type_identifier", type_at, words[-1])]
            s0 = name_at
        else:  # bare type
            type_at = text.index(words[0], pos, close)
            sub = [_ident(text, "type_identifier", type_at, words[0])]
            s0 = type_at
        kids.append(_mk(text, "parameter_declaration", s0,
                        sub[-1].end_byte, sub))
        pos = sub[-1].end_byte
    return _mk(text, "parameter_list", open_idx, close + 1, kids)


def build_go_tree(src: bytes) -> FakeNode:
    text = src.decode("utf-8")
    kids: List[FakeNode] = []

    for m in _GO_TYPE.finditer(text):
        brace = text.index("{", m.end() - 1)
        end = _match_brace(text, brace)
        inner = "struct_type" if m.group(2) == "struct" else "interface_type"
        spec = _mk(text, "type_spec", m.start(1), end + 1,
                   [_ident(text, "type_identifier", m.start(1), m.group(1)),
                    _mk(text, inner, m.start(2), end + 1)])
        kids.append(_mk(text, "type_declaration", m.start(), end + 1, [spec]))

    for m in _GO_METHOD.finditer(text):
        recv_open = text.index("(", m.start())
        recv = _go_param_list(text, recv_open)
        p_open = text.index("(", m.end(3))
        params = _go_param_list(text, p_open)
        brace = text.index("{", p_open)
        end = _match_brace(text, brace)
        kids.append(_mk(
            text, "method_declaration", m.start(), end + 1,
            [recv,
             _ident(text, "field_identifier", m.start(3), m.group(3)),
             params,
             _mk(text, "block", brace, end + 1)]))

    for m in _GO_FUNC.finditer(text):
        p_open = text.index("(", m.end(1))
        params = _go_param_list(text, p_open)
        brace = text.index("{", p_open)
        end = _match_brace(text, brace)
        kids.append(_mk(
            text, "function_declaration", m.start(), end + 1,
            [_ident(text, "identifier", m.start(1), m.group(1)),
             params,
             _mk(text, "block", brace, end + 1)]))

    kids.sort(key=lambda n: n.start_byte)
    _link_siblings(kids)
    return FakeNode("source_file", 0, len(src), (0, 0),
                    (text.count("\n"), 0), kids)


# --------------------------------------------------------------------------
# Rust (tree-sitter-rust shapes)
# --------------------------------------------------------------------------

_RS_ADT = re.compile(r"^(?:pub\s+)?(struct|enum|trait)\s+([A-Za-z_]\w*)", re.M)
_RS_FN = re.compile(r"(?:pub\s+)?fn\s+([A-Za-z_]\w*)\s*\(")
_RS_IMPL = re.compile(r"^impl(?:\s*<[^>]*>)?\s+([A-Za-z_]\w*)", re.M)


def _rs_fn_node(text: str, m: "re.Match") -> FakeNode:
    p_open = text.index("(", m.end(1))
    p_close = text.index(")", p_open)
    inner = text[p_open + 1:p_close]
    p_kids = []
    pos = p_open + 1
    for part in inner.split(","):
        stripped = part.strip()
        if not stripped:
            continue
        if stripped in ("&self", "&mut self", "self"):
            at = text.index("self", pos, p_close)
            p_kids.append(_mk(text, "self_parameter",
                              at - (len(stripped) - 4), at + 4))
            pos = at + 4
            continue
        name = stripped.split(":")[0].strip()
        at = text.index(name, pos, p_close)
        p_kids.append(_mk(text, "parameter", at, at + len(stripped),
                          [_ident(text, "identifier", at, name)]))
        pos = at + len(name)
    params = _mk(text, "parameters", p_open, p_close + 1, p_kids)
    brace = text.index("{", p_close)
    end = _match_brace(text, brace)
    fn_kids: List[FakeNode] = [
        _ident(text, "identifier", m.start(1), m.group(1)), params]
    arrow = text.find("->", p_close, brace)
    if arrow != -1:
        rt = text[arrow + 2:brace].strip()
        rt_at = text.index(rt, arrow, brace)
        fn_kids.append(_mk(text, "->", arrow, arrow + 2))
        fn_kids.append(_ident(text, "type_identifier", rt_at, rt))
    fn_kids.append(_mk(text, "block", brace, end + 1))
    return _mk(text, "function_item", m.start(), end + 1, fn_kids)


def build_rust_tree(src: bytes) -> FakeNode:
    text = src.decode("utf-8")
    kids: List[FakeNode] = []
    consumed = [False] * (len(text) + 1)

    for m in _RS_IMPL.finditer(text):
        brace = text.index("{", m.end())
        end = _match_brace(text, brace)
        decl_kids = [
            _rs_fn_node(text, fm)
            for fm in _RS_FN.finditer(text, brace, end)
        ]
        decls = _mk(text, "declaration_list", brace, end + 1, decl_kids)
        kids.append(_mk(
            text, "impl_item", m.start(), end + 1,
            [_ident(text, "type_identifier", m.start(1), m.group(1)),
             decls]))
        for i in range(m.start(), end + 1):
            consumed[i] = True

    for m in _RS_ADT.finditer(text):
        if consumed[m.start()]:
            continue
        kind = m.group(1)
        brace = text.index("{", m.end())
        end = _match_brace(text, brace)
        type_name = {"struct": "struct_item", "enum": "enum_item",
                     "trait": "trait_item"}[kind]
        adt_kids: List[FakeNode] = [
            _ident(text, "type_identifier", m.start(2), m.group(2))]
        if kind == "trait":
            decl_kids = [_rs_fn_node(text, fm)
                         for fm in _RS_FN.finditer(text, brace, end)
                         if "{" in text[fm.start():end]]
            adt_kids.append(_mk(text, "declaration_list", brace, end + 1,
                                decl_kids))
        else:
            adt_kids.append(_mk(text, "field_declaration_list", brace,
                                end + 1))
        kids.append(_mk(text, type_name, m.start(), end + 1, adt_kids))
        for i in range(m.start(), end + 1):
            consumed[i] = True

    for m in _RS_FN.finditer(text):
        if consumed[m.start()]:
            continue
        kids.append(_rs_fn_node(text, m))

    kids.sort(key=lambda n: n.start_byte)
    _link_siblings(kids)
    return FakeNode("source_file", 0, len(src), (0, 0),
                    (text.count("\n"), 0), kids)


BUILDERS = {
    "python": build_python_tree,
    "javascript": build_javascript_tree,
    "typescript": build_javascript_tree,
    "go": build_go_tree,
    "rust": build_rust_tree,
}


def install(monkeypatch=None):
    """Seed ``treesitter_parse._parsers`` with FakeParsers for every
    language (the walkers' per-process cache is the injection seam).
    Returns a restore callable when used without monkeypatch."""
    from distributedcodesearchengine_ray.stages import treesitter_parse as tsp

    saved = dict(tsp._parsers)
    for lang, builder in BUILDERS.items():
        tsp._parsers[lang] = FakeParser(builder)

    def restore():
        tsp._parsers.clear()
        tsp._parsers.update(saved)

    if monkeypatch is not None:
        monkeypatch.undo  # noqa: B018 - just assert the API exists
        return restore
    return restore
