"""Per-language code-entity extraction as a ``map_batches`` stage.

Deterministic, dependency-free line scanners (no tree-sitter in this
environment) producing the reference's entity model
(``/root/reference/codesearch/models.py:36-64``): one row per extracted
function / method / class / struct / interface / enum.  Semantics cover the
reference's deterministic fallback parsers (``python_parser.py:291-393``,
``javascript_parser.py:359-463``, ``go_parser.py:287-383``,
``rust_parser.py:341-465``) and additionally extract docstrings / doc
comments, return types and decorators (which the reference only extracts in
its tree-sitter mode — its own unit tests assert them, so they are part of
the required surface; ``tests/test_parser.py:16-32``).

Extension registry mirrors ``parser/factory.py:56-71``.  New languages are
added by registering a ``parse_<lang>(content, file_path, repo_name)``
callable in :data:`PARSERS` (the rebuild's equivalent of the
``CodeParser``/``ParserFactory.register`` hook, SURVEY.md §2.10).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional

import pyarrow as pa

ENTITY_FIELDS = [
    ("name", pa.string()),
    ("entity_type", pa.string()),
    ("language", pa.string()),
    ("file_path", pa.string()),
    ("repo_name", pa.string()),
    ("start_line", pa.int32()),
    ("end_line", pa.int32()),
    ("source_code", pa.string()),
    ("docstring", pa.string()),
    ("signature", pa.string()),
    ("parameters", pa.list_(pa.string())),
    ("return_type", pa.string()),
    ("decorators", pa.list_(pa.string())),
    ("parent_class", pa.string()),
    ("complexity", pa.int32()),
    ("loc", pa.int32()),
]

ENTITY_SCHEMA = pa.schema(ENTITY_FIELDS)


def _entity(
    name: str,
    entity_type: str,
    language: str,
    file_path: str,
    repo_name: str,
    start_line: int,
    end_line: int,
    source_code: str,
    docstring: Optional[str] = None,
    signature: Optional[str] = None,
    parameters: Optional[List[str]] = None,
    return_type: Optional[str] = None,
    decorators: Optional[List[str]] = None,
    parent_class: Optional[str] = None,
    complexity: Optional[int] = None,
    loc: int = 0,
) -> dict:
    return {
        "name": name,
        "entity_type": entity_type,
        "language": language,
        "file_path": file_path,
        "repo_name": repo_name,
        "start_line": start_line,
        "end_line": end_line,
        "source_code": source_code,
        "docstring": docstring,
        "signature": signature,
        "parameters": parameters or [],
        "return_type": return_type,
        "decorators": decorators or [],
        "parent_class": parent_class,
        "complexity": complexity,
        "loc": loc,
    }


# ---------------------------------------------------------------- python

_PY_DEF = re.compile(r"^(\s*)def\s+(\w+)\s*\(([^)]*)\)\s*(?:->\s*([^:]+))?:")
_PY_CLASS = re.compile(r"^(\s*)class\s+(\w+)(?:\s*\(([^)]*)\))?")
_PY_BRANCH = re.compile(r"\b(if|elif|for|while|except|with|and|or)\b")
_TRIPLE = ('"""', "'''")


def _py_docstring(lines: List[str], start: int, end: int) -> Optional[str]:
    """First statement after a def/class header that is a string literal."""
    for j in range(start, min(end + 1, len(lines))):
        s = lines[j].strip()
        if not s:
            continue
        for q in _TRIPLE:
            if s.startswith(q):
                body = s[len(q):]
                if body.endswith(q) and len(body) >= len(q):
                    return body[: -len(q)].strip()
                parts = [body]
                for k in range(j + 1, min(end + 1, len(lines))):
                    t = lines[k]
                    if q in t:
                        parts.append(t.split(q)[0])
                        return "\n".join(parts).strip()
                    parts.append(t)
                return "\n".join(parts).strip()
        return None  # first statement is not a string literal
    return None


def _py_decorators(lines: List[str], def_line: int) -> List[str]:
    decos: List[str] = []
    j = def_line - 1
    while j >= 0:
        s = lines[j].strip()
        if s.startswith("@"):
            decos.append(s[1:].split("(")[0].strip())
            j -= 1
        elif not s:
            j -= 1
        else:
            break
    decos.reverse()
    return decos


def _body_end(lines: List[str], i: int, indent: int) -> int:
    """Last line of the indentation-delimited block headed at line i."""
    end = i
    for j in range(i + 1, len(lines)):
        nxt = lines[j]
        if not nxt.strip():
            continue
        if len(nxt) - len(nxt.lstrip()) <= indent:
            break
        end = j
    return end


def parse_python(content: str, file_path: str, repo_name: str) -> List[dict]:
    entities: List[dict] = []
    lines = content.split("\n")
    current_class: Optional[str] = None
    class_indent = 0
    for i, line in enumerate(lines):
        cm = _PY_CLASS.match(line)
        if cm:
            indent, name, bases = len(cm.group(1)), cm.group(2), cm.group(3) or ""
            current_class, class_indent = name, indent
            end = _body_end(lines, i, indent)
            entities.append(
                _entity(
                    name=name,
                    entity_type="class",
                    language="python",
                    file_path=file_path,
                    repo_name=repo_name,
                    start_line=i + 1,
                    end_line=end + 1,
                    source_code="\n".join(lines[i : end + 1]),
                    docstring=_py_docstring(lines, i + 1, end),
                    signature=f"class {name}({bases})" if bases else f"class {name}",
                    parameters=[b.strip() for b in bases.split(",") if b.strip()],
                    decorators=_py_decorators(lines, i),
                    loc=end - i + 1,
                )
            )
            continue
        fm = _PY_DEF.match(line)
        if fm:
            indent, name, params = len(fm.group(1)), fm.group(2), fm.group(3)
            ret = (fm.group(4) or "").strip() or None
            is_method = current_class is not None and indent > class_indent
            end = _body_end(lines, i, indent)
            body = "\n".join(lines[i : end + 1])
            entities.append(
                _entity(
                    name=name,
                    entity_type="method" if is_method else "function",
                    language="python",
                    file_path=file_path,
                    repo_name=repo_name,
                    start_line=i + 1,
                    end_line=end + 1,
                    source_code=body,
                    docstring=_py_docstring(lines, i + 1, end),
                    signature=f"def {name}({params})" + (f" -> {ret}" if ret else ""),
                    parameters=[
                        p.strip().split(":")[0].split("=")[0].strip()
                        for p in params.split(",")
                        if p.strip()
                    ],
                    return_type=ret,
                    decorators=_py_decorators(lines, i),
                    parent_class=current_class if is_method else None,
                    complexity=1 + len(_PY_BRANCH.findall(body)),
                    loc=end - i + 1,
                )
            )
        if line.strip() and not line.startswith((" ", "\t")) and not cm:
            current_class = None
    return entities


# ---------------------------------------------------------------- js / ts

_JS_FUNC = re.compile(r"^\s*(?:export\s+)?(?:async\s+)?function\s+(\w+)\s*\(([^)]*)\)")
_JS_ARROW = re.compile(
    r"^\s*(?:export\s+)?(?:const|let|var)\s+(\w+)\s*=\s*(?:async\s+)?\(([^)]*)\)\s*=>"
)
_JS_CLASS = re.compile(r"^\s*(?:export\s+)?class\s+(\w+)(?:\s+extends\s+(\w+))?")
_JS_METHOD = re.compile(r"^\s+(?:async\s+)?(\w+)\s*\(([^)]*)\)\s*\{")
_JS_KEYWORDS = {"if", "for", "while", "switch", "catch", "function", "return"}


def _jsdoc_above(lines: List[str], i: int) -> Optional[str]:
    """Harvest a `/** ... */` block ending directly above line i."""
    j = i - 1
    while j >= 0 and not lines[j].strip():
        j -= 1
    if j < 0 or not lines[j].strip().endswith("*/"):
        return None
    block: List[str] = []
    k = j
    while k >= 0:
        block.append(lines[k])
        if lines[k].strip().startswith("/*"):
            break
        k -= 1
    if k < 0:
        return None
    block.reverse()
    out = []
    for raw in block:
        s = raw.strip().lstrip("/").lstrip("*").rstrip("/").rstrip("*").strip()
        if s.startswith("@"):
            continue
        if s:
            out.append(s)
    return " ".join(out) or None


def _split_params(params: str) -> List[str]:
    return [p.strip().split(":")[0].split("=")[0].strip() for p in params.split(",") if p.strip()]


def parse_javascript(content: str, file_path: str, repo_name: str) -> List[dict]:
    is_ts = file_path.endswith((".ts", ".tsx"))
    lang = "typescript" if is_ts else "javascript"
    entities: List[dict] = []
    lines = content.split("\n")
    current_class: Optional[str] = None
    brace_depth = 0  # tracks nesting so methods after the first survive
    class_depth = 0
    for i, line in enumerate(lines):
        cm = _JS_CLASS.match(line)
        if cm:
            current_class, extends = cm.group(1), cm.group(2)
            class_depth = brace_depth
            brace_depth += line.count("{") - line.count("}")
            entities.append(
                _entity(
                    name=current_class,
                    entity_type="class",
                    language=lang,
                    file_path=file_path,
                    repo_name=repo_name,
                    start_line=i + 1,
                    end_line=i + 1,
                    source_code=line,
                    docstring=_jsdoc_above(lines, i),
                    signature=f"class {current_class}"
                    + (f" extends {extends}" if extends else ""),
                    parent_class=extends,
                    loc=1,
                )
            )
            continue
        fm = _JS_FUNC.match(line)
        if fm:
            name, params = fm.group(1), fm.group(2)
            entities.append(
                _entity(
                    name=name,
                    entity_type="function",
                    language=lang,
                    file_path=file_path,
                    repo_name=repo_name,
                    start_line=i + 1,
                    end_line=i + 1,
                    source_code=line,
                    docstring=_jsdoc_above(lines, i),
                    signature=f"function {name}({params})",
                    parameters=_split_params(params),
                    loc=1,
                )
            )
            continue
        am = _JS_ARROW.match(line)
        if am:
            name, params = am.group(1), am.group(2)
            entities.append(
                _entity(
                    name=name,
                    entity_type="function",
                    language=lang,
                    file_path=file_path,
                    repo_name=repo_name,
                    start_line=i + 1,
                    end_line=i + 1,
                    source_code=line,
                    docstring=_jsdoc_above(lines, i),
                    signature=f"const {name} = ({params}) =>",
                    parameters=_split_params(params),
                    loc=1,
                )
            )
            continue
        if current_class:
            mm = _JS_METHOD.match(line)
            if mm and mm.group(1) not in _JS_KEYWORDS:
                name, params = mm.group(1), mm.group(2)
                entities.append(
                    _entity(
                        name=name,
                        entity_type="method",
                        language=lang,
                        file_path=file_path,
                        repo_name=repo_name,
                        start_line=i + 1,
                        end_line=i + 1,
                        source_code=line,
                        docstring=_jsdoc_above(lines, i),
                        signature=f"{name}({params})",
                        parameters=_split_params(params),
                        parent_class=current_class,
                        loc=1,
                    )
                )
        brace_depth += line.count("{") - line.count("}")
        if current_class is not None and brace_depth <= class_depth:
            current_class = None
    return entities


# ---------------------------------------------------------------- go

_GO_FUNC = re.compile(r"^func\s+(\w+)\s*\(([^)]*)\)\s*(\S.*)?\{")
_GO_METHOD = re.compile(r"^func\s+\((\w+)\s+\*?(\w+)\)\s+(\w+)\s*\(([^)]*)\)\s*(\S.*)?\{")
_GO_STRUCT = re.compile(r"^type\s+(\w+)\s+struct\s*\{")
_GO_IFACE = re.compile(r"^type\s+(\w+)\s+interface\s*\{")


def _godoc_above(lines: List[str], i: int) -> Optional[str]:
    out: List[str] = []
    j = i - 1
    while j >= 0 and lines[j].strip().startswith("//"):
        out.append(lines[j].strip().lstrip("/").strip())
        j -= 1
    out.reverse()
    return " ".join(out) or None


def parse_go(content: str, file_path: str, repo_name: str) -> List[dict]:
    entities: List[dict] = []
    lines = content.split("\n")
    for i, line in enumerate(lines):
        mm = _GO_METHOD.match(line)
        if mm:
            recv_name, recv_type, name, params = mm.group(1), mm.group(2), mm.group(3), mm.group(4)
            ret = (mm.group(5) or "").strip()
            entities.append(
                _entity(
                    name=name,
                    entity_type="method",
                    language="go",
                    file_path=file_path,
                    repo_name=repo_name,
                    start_line=i + 1,
                    end_line=i + 1,
                    source_code=line,
                    docstring=_godoc_above(lines, i),
                    signature=f"func ({recv_name} {recv_type}) {name}({params})",
                    parameters=_split_params(params),
                    return_type=ret or None,
                    parent_class=recv_type,
                    loc=1,
                )
            )
            continue
        fm = _GO_FUNC.match(line)
        if fm:
            name, params = fm.group(1), fm.group(2)
            ret = (fm.group(3) or "").strip()
            entities.append(
                _entity(
                    name=name,
                    entity_type="function",
                    language="go",
                    file_path=file_path,
                    repo_name=repo_name,
                    start_line=i + 1,
                    end_line=i + 1,
                    source_code=line,
                    docstring=_godoc_above(lines, i),
                    signature=f"func {name}({params}) {ret}".strip(),
                    parameters=_split_params(params),
                    return_type=ret or None,
                    loc=1,
                )
            )
            continue
        sm = _GO_STRUCT.match(line)
        if sm:
            name = sm.group(1)
            entities.append(
                _entity(
                    name=name,
                    entity_type="struct",
                    language="go",
                    file_path=file_path,
                    repo_name=repo_name,
                    start_line=i + 1,
                    end_line=i + 1,
                    source_code=line,
                    docstring=_godoc_above(lines, i),
                    signature=f"type {name} struct",
                    loc=1,
                )
            )
            continue
        im = _GO_IFACE.match(line)
        if im:
            name = im.group(1)
            entities.append(
                _entity(
                    name=name,
                    entity_type="interface",
                    language="go",
                    file_path=file_path,
                    repo_name=repo_name,
                    start_line=i + 1,
                    end_line=i + 1,
                    source_code=line,
                    docstring=_godoc_above(lines, i),
                    signature=f"type {name} interface",
                    loc=1,
                )
            )
    return entities


# ---------------------------------------------------------------- rust

_RS_FN = re.compile(r"^(\s*)(pub\s+)?(async\s+)?fn\s+(\w+)\s*(<[^>]*>)?\s*\(([^)]*)\)\s*(?:->\s*([^{{]+))?")
_RS_STRUCT = re.compile(r"^(\s*)(pub\s+)?struct\s+(\w+)")
_RS_ENUM = re.compile(r"^(\s*)(pub\s+)?enum\s+(\w+)")
_RS_TRAIT = re.compile(r"^(\s*)(pub\s+)?trait\s+(\w+)")
_RS_IMPL = re.compile(r"^impl\s*(?:<[^>]*>\s*)?(\w+)")


def _rustdoc_above(lines: List[str], i: int) -> Optional[str]:
    out: List[str] = []
    j = i - 1
    while j >= 0 and lines[j].strip().startswith(("///", "//!")):
        out.append(lines[j].strip().lstrip("/!").strip())
        j -= 1
    out.reverse()
    return " ".join(out) or None


def parse_rust(content: str, file_path: str, repo_name: str) -> List[dict]:
    entities: List[dict] = []
    lines = content.split("\n")
    current_impl: Optional[str] = None
    for i, line in enumerate(lines):
        im = _RS_IMPL.match(line)
        if im:
            current_impl = im.group(1)
            continue
        fm = _RS_FN.match(line)
        if fm:
            is_pub, is_async = bool(fm.group(2)), bool(fm.group(3))
            name, params = fm.group(4), fm.group(6)
            ret = (fm.group(7) or "").strip() or None
            sig = []
            if is_pub:
                sig.append("pub")
            if is_async:
                sig.append("async")
            sig.append(f"fn {name}({params})")
            entities.append(
                _entity(
                    name=name,
                    entity_type="method" if current_impl else "function",
                    language="rust",
                    file_path=file_path,
                    repo_name=repo_name,
                    start_line=i + 1,
                    end_line=i + 1,
                    source_code=line,
                    docstring=_rustdoc_above(lines, i),
                    signature=" ".join(sig),
                    parameters=_split_params(params),
                    return_type=ret,
                    parent_class=current_impl,
                    loc=1,
                )
            )
            continue
        for pat, etype, kw in (
            (_RS_STRUCT, "struct", "struct"),
            (_RS_ENUM, "enum", "enum"),
            (_RS_TRAIT, "interface", "trait"),
        ):
            m = pat.match(line)
            if m:
                is_pub, name = bool(m.group(2)), m.group(3)
                entities.append(
                    _entity(
                        name=name,
                        entity_type=etype,
                        language="rust",
                        file_path=file_path,
                        repo_name=repo_name,
                        start_line=i + 1,
                        end_line=i + 1,
                        source_code=line,
                        docstring=_rustdoc_above(lines, i),
                        signature=f"{'pub ' if is_pub else ''}{kw} {name}",
                        loc=1,
                    )
                )
                current_impl = None
                break
        else:
            if line.strip() == "}" and not line.startswith(" "):
                current_impl = None
    return entities


# ------------------------------------------------------------ dispatch

PARSERS: Dict[str, Callable[[str, str, str], List[dict]]] = {
    "python": parse_python,
    "javascript": parse_javascript,
    "typescript": parse_javascript,
    "go": parse_go,
    "rust": parse_rust,
}

EXTENSION_LANG = {
    ".py": "python", ".pyw": "python",
    ".js": "javascript", ".jsx": "javascript", ".mjs": "javascript", ".cjs": "javascript",
    ".ts": "typescript", ".tsx": "typescript",
    ".go": "go", ".rs": "rust",
}


def parse_content(
    content: str,
    file_path: str,
    repo_name: str,
    lang: Optional[str] = None,
    parsers: Optional[Dict[str, Callable]] = None,
    extensions: Optional[Dict[str, str]] = None,
) -> List[dict]:
    """Dispatch on language (or file extension) -> entity dicts.

    ``parsers``/``extensions`` extend the built-in registries for THIS call
    — in a distributed build, extensions must travel with the pipeline
    closure (driver-side mutation of the module dicts does not reach Ray
    worker processes); ``build_index(extra_parsers=...)`` threads them
    through."""
    ext_map = EXTENSION_LANG if not extensions else {**EXTENSION_LANG, **extensions}
    parser_map = PARSERS if not parsers else {**PARSERS, **parsers}
    if lang is None or lang not in parser_map:
        ext = "." + file_path.rsplit(".", 1)[-1].lower() if "." in file_path else ""
        lang = ext_map.get(ext, lang)
    fn = parser_map.get(lang or "")
    if fn is None:
        return []
    return fn(content, file_path, repo_name)


def entity_document(e: dict) -> str:
    """BM25 doc projection (bodies excluded) — mirrors the reference's
    entity->document rule (/root/reference/codesearch/storage/bm25_index.py:74-84)."""
    parts = [
        e.get("name") or "",
        e.get("signature") or "",
        e.get("docstring") or "",
        " ".join(e.get("parameters") or []),
        e.get("parent_class") or "",
        e.get("return_type") or "",
    ]
    return " ".join(p for p in parts if p)


def parse_batch(
    batch: pa.Table,
    parsers: Optional[Dict[str, Callable]] = None,
    extensions: Optional[Dict[str, str]] = None,
) -> pa.Table:
    """``map_batches`` UDF: corpus rows -> entity rows (1 file -> N entities).

    Adds provenance columns (repo/path/commit/ent_ord) and the BM25
    ``doc_text`` projection; stateless task, compiled regexes at module
    scope.
    """
    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    commits = batch["commit"].to_pylist()
    langs = batch["lang"].to_pylist()
    contents = batch["content"].to_pylist()
    out: Dict[str, list] = {name: [] for name, _ in ENTITY_FIELDS}
    prov: Dict[str, list] = {"repo": [], "path": [], "commit": [], "ent_ord": [], "doc_text": []}
    for repo, path, commit, lang, content in zip(repos, paths, commits, langs, contents):
        ents = parse_content(content or "", path, repo, lang, parsers, extensions)
        for k, e in enumerate(ents):
            for name, _ in ENTITY_FIELDS:
                out[name].append(e[name])
            prov["repo"].append(repo)
            prov["path"].append(path)
            prov["commit"].append(commit)
            prov["ent_ord"].append(k)
            prov["doc_text"].append(entity_document(e))
    cols = {}
    for name, typ in ENTITY_FIELDS:
        cols[name] = pa.array(out[name], type=typ)
    cols["repo"] = pa.array(prov["repo"], pa.string())
    cols["path"] = pa.array(prov["path"], pa.string())
    cols["commit"] = pa.array(prov["commit"], pa.string())
    cols["ent_ord"] = pa.array(prov["ent_ord"], pa.int32())
    cols["doc_text"] = pa.array(prov["doc_text"], pa.string())
    return pa.table(cols)
