"""SURVEY §2.10 extension surface: register a NEW language parser at
runtime and index/search files of that language end-to-end (the rebuild's
equivalent of CodeParser + ParserFactory.register)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_register_new_language_end_to_end(ray_session, tmp_path):
    # the parser is a CLOSURE (cloudpickle serializes it by value into the
    # Ray pipeline) — a module-level function in a test module would fail
    # to import on workers
    import re

    java_method = re.compile(
        r"^\s*(?:public|private|protected)\s+(?:static\s+)?(\w+)\s+(\w+)\s*\(([^)]*)\)"
    )
    java_class = re.compile(r"^\s*(?:public\s+)?class\s+(\w+)")

    def parse_java(content, file_path, repo_name):
        from distributedcodesearchengine_ray.stages.parse import _entity

        out = []
        current_class = None
        for i, line in enumerate(content.split("\n")):
            cm = java_class.match(line)
            if cm:
                current_class = cm.group(1)
                out.append(_entity(
                    name=current_class, entity_type="class", language="java",
                    file_path=file_path, repo_name=repo_name,
                    start_line=i + 1, end_line=i + 1, source_code=line,
                    signature=f"class {current_class}", loc=1,
                ))
                continue
            mm = java_method.match(line)
            if mm and current_class:
                ret, name, params = mm.groups()
                out.append(_entity(
                    name=name, entity_type="method", language="java",
                    file_path=file_path, repo_name=repo_name,
                    start_line=i + 1, end_line=i + 1, source_code=line,
                    signature=f"{ret} {name}({params})",
                    parameters=[p.strip().split()[-1] for p in params.split(",") if p.strip()],
                    return_type=ret, parent_class=current_class, loc=1,
                ))
        return out

    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    code = (
        "public class JsonParser {\n"
        "    public Map parseJsonString(String payload) {\n"
        "        return mapper.readValue(payload);\n"
        "    }\n"
        "}\n"
    )
    corpus = tmp_path / "c"
    corpus.mkdir()
    pq.write_table(
        pa.table(
            {
                "repo": ["org/j"], "path": ["src/JsonParser.java"],
                "commit": ["a" * 40], "lang": ["java"], "content": [code],
            }
        ),
        str(corpus / "part-0.parquet"),
    )
    idx = str(tmp_path / "idx")
    # extensions are passed EXPLICITLY: mutating the module registry on the
    # driver would not reach Ray worker processes
    m = build_index(
        str(corpus), idx, mode="entity", docs_per_partition=10,
        extra_parsers={"java": parse_java}, extra_extensions={".java": "java"},
    )
    assert m.n_docs == 2  # class + method
    engine = QueryEngine(idx, num_actors=1)
    try:
        df = engine.search_with_meta("parse json string", limit=5)
        assert "parseJsonString" in df["name"].tolist()
        assert df["lang"].tolist().count("java") == len(df)
    finally:
        engine.close()
