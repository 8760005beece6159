"""Tokenizer unit + scalar/vectorized equivalence tests.

Ports the reference tokenization assertions
(/root/reference/tests/test_search.py:83-95) and property-tests that the
Arrow-vectorized path is identical to the scalar reference semantics.
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from distributedcodesearchengine_ray.functions.tokenizer import tokenize, tokenize_array, token_count_array


def test_camel_case_splitting():
    tokens = tokenize("parseJSONData")
    assert "parse" in tokens
    assert "json" in tokens
    assert "data" in tokens


def test_snake_case_splitting():
    tokens = tokenize("parse_json_data")
    assert tokens == ["parse", "json", "data"]


def test_acronym_and_separators():
    assert tokenize("HTTPClientFactory") == ["http", "client", "factory"]
    assert tokenize("a.b/c\\d-e_f") == []  # all 1-char pieces dropped
    assert tokenize("req.timeout_ms") == ["req", "timeout", "ms"]


def test_min_length_and_specials():
    assert tokenize("x @#$ a I") == []
    assert tokenize("v2 OK") == ["v2", "ok"]


def test_vectorized_matches_scalar_basic():
    texts = [
        "parseJSONData_v2.go",
        "HTTPClientFactory sends  HTTP\trequests",
        "",
        "   ",
        "a",
        "def parse_json(data): return json.loads(data)",
        "XMLHttpRequest.onreadystatechange",
        "snake_case camelCase SCREAMING_SNAKE ABCDefGhi",
        "tab\tnewline\nmix\xa0nbsp",
        "unicode: héllo wörld ünïcode",
    ]
    out = tokenize_array(pa.array(texts)).to_pylist()
    assert out == [tokenize(t) for t in texts]


def test_null_handling():
    out = tokenize_array(pa.array(["ok_token", None, "x"])).to_pylist()
    assert out == [["ok", "token"], [], []]


def test_token_count():
    texts = ["parse_json_data", "", "one two three"]
    assert token_count_array(pa.array(texts)).to_pylist() == [3, 0, 3]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs", "Pc", "Pd"),
                max_codepoint=0x2FF,
                # U+0130: Python lower() gives a 2-char expansion, Arrow's does
                # not — documented divergence in tokenizer.py.
                blacklist_characters="İ",
            ),
            max_size=60,
        ),
        max_size=8,
    )
)
def test_vectorized_matches_scalar_property(texts):
    out = tokenize_array(pa.array(texts, type=pa.string())).to_pylist()
    assert out == [tokenize(t) for t in texts]
