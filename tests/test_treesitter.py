"""Dual-engine parser assertions — the reference's tolerant
tests/test_parser.py suite run under BOTH extraction branches: the regex
scanners (always) and the tree-sitter AST walkers (only where the grammars
are installed; skipped in this container)."""

import pytest

from distributedcodesearchengine_ray.stages import treesitter_parse
from distributedcodesearchengine_ray.stages.parse import parse_content

ENGINES = ["regex"] + (["treesitter"] if treesitter_parse.available() else [])


@pytest.fixture(params=ENGINES)
def parsers(request):
    if request.param == "treesitter":
        return treesitter_parse.make_parsers()
    return None  # built-in regex registry


def test_make_parsers_raises_when_unavailable():
    if treesitter_parse.available():
        pytest.skip("grammars installed; guard path not reachable")
    with pytest.raises(RuntimeError, match="tree-sitter"):
        treesitter_parse.make_parsers()


def test_python_function(parsers):
    code = (
        "\ndef hello_world(name: str) -> str:\n"
        '    """Greet someone."""\n'
        '    return f"Hello, {name}!"\n'
    )
    ents = parse_content(code, "test.py", "test-repo", "python", parsers)
    assert len(ents) == 1
    fn = ents[0]
    assert fn["name"] == "hello_world"
    assert fn["entity_type"] == "function"
    assert "name" in fn["parameters"]
    assert fn["docstring"] == "Greet someone."


def test_python_class_and_methods(parsers):
    code = (
        "\nclass Calculator:\n"
        '    """A simple calculator."""\n\n'
        "    def __init__(self):\n"
        "        self.result = 0\n\n"
        "    def add(self, x, y):\n"
        '        """Add two numbers."""\n'
        "        return x + y\n"
    )
    ents = parse_content(code, "test.py", "test-repo", "python", parsers)
    classes = [e for e in ents if e["entity_type"] == "class"]
    methods = [e for e in ents if e["entity_type"] == "method"]
    assert len(classes) == 1 and classes[0]["name"] == "Calculator"
    add = next((m for m in methods if m["name"] == "add"), None)
    assert add is not None and add["parent_class"] == "Calculator"


def test_python_decorated_function(parsers):
    code = '\n@app.route("/api")\n@auth_required\ndef api_endpoint():\n    return {"status": "ok"}\n'
    ents = parse_content(code, "test.py", "test-repo", "python", parsers)
    assert len(ents) == 1
    assert ents[0]["name"] == "api_endpoint"


def test_javascript_function_and_class(parsers):
    code = (
        "function fetchData(url, options) { return fetch(url, options); }\n"
        "const parse = (raw) => JSON.parse(raw);\n"
        "class ApiClient {\n  constructor(base) { this.base = base; }\n"
        "  get(path) { return fetch(this.base + path); }\n}\n"
    )
    ents = parse_content(code, "test.js", "test-repo", "javascript", parsers)
    names = {e["name"]: e for e in ents}
    assert names["fetchData"]["entity_type"] == "function"
    assert "url" in names["fetchData"]["parameters"]
    assert "parse" in names  # arrow function bound to a const
    assert names["ApiClient"]["entity_type"] == "class"
    assert names["get"]["parent_class"] == "ApiClient"


def test_go_function_method_struct(parsers):
    code = (
        "package main\n\n"
        "type Server struct { addr string }\n\n"
        "type Handler interface { Serve() }\n\n"
        "func NewServer(addr string) *Server { return &Server{addr} }\n\n"
        "func (s *Server) Start(port int) error { return nil }\n"
    )
    ents = parse_content(code, "main.go", "test-repo", "go", parsers)
    names = {e["name"]: e for e in ents}
    assert names["Server"]["entity_type"] == "struct"
    assert names["Handler"]["entity_type"] == "interface"
    assert names["NewServer"]["entity_type"] == "function"
    assert names["Start"]["entity_type"] == "method"
    assert names["Start"]["parent_class"] == "Server"


def test_rust_items(parsers):
    code = (
        "pub struct Point { x: f64, y: f64 }\n\n"
        "pub enum Shape { Circle, Square }\n\n"
        "pub trait Draw { fn draw(&self); }\n\n"
        "impl Point {\n    pub fn new(x: f64, y: f64) -> Point { Point { x, y } }\n}\n\n"
        "pub fn distance(a: &Point, b: &Point) -> f64 { 0.0 }\n"
    )
    ents = parse_content(code, "lib.rs", "test-repo", "rust", parsers)
    names = {e["name"]: e for e in ents}
    assert names["Point"]["entity_type"] == "struct"
    assert names["Shape"]["entity_type"] == "enum"
    assert names["Draw"]["entity_type"] == "interface"
    assert names["new"]["parent_class"] == "Point"
    assert names["distance"]["entity_type"] == "function"


# --- committed golden fixture contract -------------------------------------
#
# tests/fixtures/parser_golden.json pins, per language, a source snippet and
# the entity list the extraction contract must produce.  The snippets are
# restricted to constructs BOTH branches recognize (no async def / export
# default / annotated TS methods — the reference's own regex fallback,
# python_parser.py:303-305 and javascript_parser.py:375-378, skips those
# too), so the same golden asserts the regex branch here and the
# tree-sitter branch wherever the grammars are installed.

import json
import os

_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "parser_golden.json")

# the inventory both engines must agree on; regex-only extras (exact
# signature strings, loc) are asserted for the fallback only
_CORE_FIELDS = ("entity_type", "name", "parent_class", "language", "repo_name")


def _golden():
    with open(_GOLDEN_PATH) as f:
        return json.load(f)


def _core(ents):
    return [{k: e.get(k) for k in _CORE_FIELDS} for e in ents]


@pytest.mark.parametrize("lang", ["python", "javascript", "go", "rust", "typescript"])
def test_golden_regex_exact(lang):
    """The regex fallback reproduces the committed golden EXACTLY (every
    field) — runs in every environment, grammars or not."""
    g = _golden()[lang]
    ents = parse_content(g["source"], g["file_path"], "golden-repo", lang)
    assert ents == g["entities"]


_TS_PARSERS = {
    "python": treesitter_parse.parse_python_ts,
    "javascript": treesitter_parse.parse_javascript_ts,
    "typescript": treesitter_parse.parse_javascript_ts,
    "go": treesitter_parse.parse_go_ts,
    "rust": treesitter_parse.parse_rust_ts,
}


@pytest.mark.parametrize("lang", ["python", "javascript", "go", "rust", "typescript"])
def test_golden_treesitter_core(lang, monkeypatch):
    """The tree-sitter branch produces the same core entity inventory as
    the golden (name/type/parent per entity, in order) — EXECUTED in
    every environment: with the real grammars where installed, else
    against the fake-grammar stand-ins in tests/fake_treesitter.py
    (CPython ast converted to tree-sitter shapes for Python; bounded
    mini-parsers emitting the published node shapes for js/go/rust).
    The per-file regex fallback is disabled for the duration so a
    walker crash cannot silently pass via the fallback."""
    g = _golden()[lang]
    if treesitter_parse.available():
        restore = lambda: None  # noqa: E731
    else:
        from tests import fake_treesitter

        restore = fake_treesitter.install()
    try:
        for fb in ("_regex_py", "_regex_js", "_regex_go", "_regex_rust"):
            monkeypatch.setattr(
                treesitter_parse, fb,
                lambda *a, **k: (_ for _ in ()).throw(
                    AssertionError("AST walker fell back to regex")),
            )
        ents = parse_content(
            g["source"], g["file_path"], "golden-repo", lang,
            parsers=_TS_PARSERS,
        )
    finally:
        restore()
    assert _core(ents) == _core(g["entities"])
