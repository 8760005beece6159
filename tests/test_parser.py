"""Ported reference parser assertions (/root/reference/tests/test_parser.py)
against our regex line-scanner extractors."""

from distributedcodesearchengine_ray.stages.parse import (
    entity_document,
    parse_content,
    parse_go,
    parse_javascript,
    parse_python,
    parse_rust,
)


class TestPythonParser:
    def test_parse_function(self):
        code = '''
def hello_world(name: str) -> str:
    """Greet someone."""
    return f"Hello, {name}!"
'''
        entities = parse_python(code, "test.py", "test-repo")
        assert len(entities) == 1
        func = entities[0]
        assert func["name"] == "hello_world"
        assert func["entity_type"] == "function"
        assert func["language"] == "python"
        assert "name" in func["parameters"]
        assert func["docstring"] == "Greet someone."
        assert func["return_type"] == "str"

    def test_parse_class(self):
        code = '''
class Calculator:
    """A simple calculator."""

    def __init__(self):
        self.result = 0

    def add(self, x, y):
        """Add two numbers."""
        return x + y
'''
        entities = parse_python(code, "test.py", "test-repo")
        assert len(entities) >= 2
        classes = [e for e in entities if e["entity_type"] == "class"]
        methods = [e for e in entities if e["entity_type"] == "method"]
        assert len(classes) == 1
        assert classes[0]["name"] == "Calculator"
        assert classes[0]["docstring"] == "A simple calculator."
        assert len(methods) >= 1
        add = next((m for m in methods if m["name"] == "add"), None)
        assert add is not None
        assert add["parent_class"] == "Calculator"
        assert add["docstring"] == "Add two numbers."

    def test_parse_decorated_function(self):
        code = '''
@app.route("/api")
@auth_required
def api_endpoint():
    return {"status": "ok"}
'''
        entities = parse_python(code, "test.py", "test-repo")
        assert len(entities) == 1
        func = entities[0]
        assert func["name"] == "api_endpoint"
        assert "auth_required" in func["decorators"]
        assert "app.route" in func["decorators"]

    def test_module_function_after_class_is_not_method(self):
        code = "class A:\n    def m(self):\n        pass\n\ndef free():\n    pass\n"
        ents = parse_python(code, "t.py", "r")
        free = next(e for e in ents if e["name"] == "free")
        assert free["entity_type"] == "function"
        assert free["parent_class"] is None


class TestJavaScriptParser:
    def test_parse_function(self):
        code = """
function fetchData(url) {
    return fetch(url).then(r => r.json());
}
"""
        entities = parse_javascript(code, "test.js", "test-repo")
        assert len(entities) >= 1
        assert entities[0]["name"] == "fetchData"
        assert entities[0]["language"] == "javascript"

    def test_parse_arrow_function(self):
        code = "const processData = async (data) => {\n    return data.map(x => x * 2);\n};\n"
        entities = parse_javascript(code, "test.js", "test-repo")
        assert len(entities) >= 1
        assert entities[0]["name"] == "processData"

    def test_parse_class(self):
        code = """
class UserService extends BaseService {
    constructor(db) {
        this.db = db;
    }

    async getUser(id) {
        return this.db.find(id);
    }
}
"""
        entities = parse_javascript(code, "test.js", "test-repo")
        classes = [e for e in entities if e["entity_type"] == "class"]
        assert len(classes) == 1
        assert classes[0]["name"] == "UserService"
        methods = [e for e in entities if e["entity_type"] == "method"]
        assert any(m["name"] == "getUser" and m["parent_class"] == "UserService" for m in methods)

    def test_typescript_language(self):
        code = "function f(a) { return a; }\n"
        entities = parse_javascript(code, "test.ts", "r")
        assert entities[0]["language"] == "typescript"


class TestGoParser:
    def test_parse_function(self):
        code = """
// Add returns the sum of two integers
func Add(a int, b int) int {
    return a + b
}
"""
        entities = parse_go(code, "test.go", "test-repo")
        assert len(entities) >= 1
        fn = entities[0]
        assert fn["name"] == "Add"
        assert fn["entity_type"] == "function"
        assert fn["docstring"] == "Add returns the sum of two integers"

    def test_parse_method(self):
        code = """
func (s *Server) Start(port int) error {
    return s.listen(port)
}
"""
        entities = parse_go(code, "test.go", "test-repo")
        assert len(entities) >= 1
        m = entities[0]
        assert m["name"] == "Start"
        assert m["entity_type"] == "method"
        assert m["parent_class"] == "Server"

    def test_parse_struct(self):
        code = """
type User struct {
    Name string
    Age  int
}
"""
        entities = parse_go(code, "test.go", "test-repo")
        assert any(e["name"] == "User" and e["entity_type"] == "struct" for e in entities)


class TestRustParser:
    def test_parse_function(self):
        code = """
/// Computes the factorial of n
pub fn factorial(n: u64) -> u64 {
    (1..=n).product()
}
"""
        entities = parse_rust(code, "test.rs", "test-repo")
        assert len(entities) >= 1
        fn = entities[0]
        assert fn["name"] == "factorial"
        assert fn["entity_type"] == "function"
        assert fn["docstring"] == "Computes the factorial of n"
        assert "pub" in fn["signature"]

    def test_parse_struct(self):
        code = """
pub struct Point {
    x: f64,
    y: f64,
}
"""
        entities = parse_rust(code, "test.rs", "test-repo")
        assert any(e["name"] == "Point" and e["entity_type"] == "struct" for e in entities)

    def test_parse_impl_methods(self):
        code = """
impl Point {
    pub fn new(x: f64, y: f64) -> Self {
        Point { x, y }
    }

    fn magnitude(&self) -> f64 {
        (self.x * self.x + self.y * self.y).sqrt()
    }
}
"""
        entities = parse_rust(code, "test.rs", "test-repo")
        methods = [e for e in entities if e["entity_type"] == "method"]
        assert len(methods) == 2
        assert all(m["parent_class"] == "Point" for m in methods)

    def test_trait_is_interface(self):
        code = "pub trait Runner {\n    fn run(&self);\n}\n"
        entities = parse_rust(code, "test.rs", "r")
        assert entities[0]["entity_type"] == "interface"
        assert entities[0]["name"] == "Runner"


def test_dispatch_by_extension():
    assert parse_content("def f(): pass", "x.py", "r")[0]["language"] == "python"
    assert parse_content("function f() {}", "x.mjs", "r")[0]["language"] == "javascript"
    assert parse_content("print('hi')", "x.md", "r") == []


def test_entity_document_projection():
    e = {
        "name": "parse_json",
        "signature": "def parse_json(data)",
        "docstring": "Parse a JSON string",
        "parameters": ["data"],
        "parent_class": None,
        "return_type": "dict",
    }
    # bodies excluded; empty parts dropped (bm25_index.py:74-84 semantics)
    assert entity_document(e) == "parse_json def parse_json(data) Parse a JSON string data dict"


# ----------------------------------------------------- robustness / parity


def test_entity_doc_text_token_equivalent():
    """The vectorized staging projection (_entity_doc_text) must yield the
    SAME token sequence as the scalar entity_document for any entity —
    empty/None fields may only add whitespace (hypothesis fuzz)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.build_index import _entity_doc_text
    from distributedcodesearchengine_ray.stages.parse import entity_document

    field = st.one_of(st.none(), st.text(max_size=25))

    @settings(max_examples=200, deadline=None)
    @given(
        name=field, sig=field, doc=field,
        params=st.lists(st.text(min_size=1, max_size=8), max_size=4),
        parent=field, rtype=field,
    )
    def check(name, sig, doc, params, parent, rtype):
        e = {
            "name": name, "signature": sig, "docstring": doc,
            "parameters": params, "parent_class": parent, "return_type": rtype,
        }
        t = pa.table(
            {
                "name": pa.array([name], pa.string()),
                "signature": pa.array([sig], pa.string()),
                "docstring": pa.array([doc], pa.string()),
                "parameters": pa.array([params], pa.list_(pa.string())),
                "parent_class": pa.array([parent], pa.string()),
                "return_type": pa.array([rtype], pa.string()),
            }
        )
        vec_text = _entity_doc_text(t).to_pylist()[0]
        assert tokenize(vec_text) == tokenize(entity_document(e))

    check()


def test_parsers_never_crash_on_garbage():
    """Regex scanners must tolerate arbitrary text (hypothesis fuzz)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(content=st.text(max_size=400), lang=st.sampled_from(
        ["python", "javascript", "typescript", "go", "rust"]))
    def check(content, lang):
        ents = parse_content(content, f"x.{lang[:2]}", "r", lang)
        for e in ents:
            assert e["name"]
            assert isinstance(e["parameters"], list)

    check()
