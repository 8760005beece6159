"""Ingestion connector: checked-out directory tree -> corpus parquet ->
index -> search, end-to-end on a real tree (this repo's own source)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq


def test_iter_repo_files_filters(tmp_path):
    from distributedcodesearchengine_ray.sources.ingest import iter_repo_files

    (tmp_path / "src").mkdir()
    (tmp_path / "src" / "a.py").write_text("def f():\n    pass\n")
    (tmp_path / "src" / "b.txt").write_text("not code")
    (tmp_path / "node_modules").mkdir()
    (tmp_path / "node_modules" / "c.js").write_text("function x() {}")
    files = dict(iter_repo_files(str(tmp_path)))
    assert "src/a.py" in files
    assert "src/b.txt" not in files  # unsupported extension
    assert all("node_modules" not in p for p in files)  # skip dir


def test_ingest_git_head(tmp_path):
    from distributedcodesearchengine_ray.sources.ingest import _git_head, ingest_directory

    (tmp_path / ".git").mkdir()
    (tmp_path / ".git" / "HEAD").write_text("ref: refs/heads/main\n")
    (tmp_path / ".git" / "refs" / "heads").mkdir(parents=True)
    (tmp_path / ".git" / "refs" / "heads" / "main").write_text("a" * 40 + "\n")
    (tmp_path / "x.py").write_text("def f():\n    return 1\n")
    assert _git_head(str(tmp_path)) == "a" * 40
    out = ingest_directory(str(tmp_path), str(tmp_path / "corpus"), repo_name="r")
    t = pq.read_table(os.path.join(out, "ingest-00000.parquet"))
    assert t["commit"][0].as_py() == "a" * 40
    assert t["repo"][0].as_py() == "r"


def test_ingest_build_search_end_to_end(ray_session, tmp_path):
    """Ingest this engine's own source tree, build an entity index over it,
    and find a real function by name."""
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine
    from distributedcodesearchengine_ray.sources.ingest import ingest_directory

    corpus = ingest_directory(
        "/root/repo/distributedcodesearchengine_ray", str(tmp_path / "corpus"), repo_name="engine"
    )
    idx = str(tmp_path / "idx")
    m = build_index(corpus, idx, mode="entity", docs_per_partition=200)
    assert m.n_docs > 100
    eng = QueryEngine(idx, num_actors=2)
    try:
        hits = eng.search_with_meta("winnow fingerprints", limit=10)
        assert "winnow_fingerprints" in hits["name"].tolist()
    finally:
        eng.close()


def test_file_uri_round_trip(ray_session, tmp_path):
    """Build + query through file:// URIs (the documented shared-filesystem
    contract; native s3:// is rejected with a FUSE pointer)."""
    import pytest

    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine
    from distributedcodesearchengine_ray.sources.corpus import write_corpus
    from distributedcodesearchengine_ray.state.manifest import normalize_dir

    corpus = write_corpus(str(tmp_path / "c"), n_files=80, seed=5, num_shards=2)
    idx_uri = f"file://{tmp_path}/idx"
    m = build_index(f"file://{corpus}", idx_uri, mode="entity", docs_per_partition=100)
    assert m.n_docs > 0
    assert m.extra["filesystem"] == "shared-posix"
    eng = QueryEngine(idx_uri, num_actors=1)
    try:
        assert len(eng.search("parse json", limit=5)) > 0
    finally:
        eng.close()
    with pytest.raises(NotImplementedError, match="mount"):
        normalize_dir("s3://bucket/idx")


def test_cli_ingest(tmp_path):
    (tmp_path / "r").mkdir()
    (tmp_path / "r" / "m.py").write_text("def main():\n    return 0\n")
    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "ingest", str(tmp_path / "r"),
         "--out", str(tmp_path / "c"), "--repo", "demo"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip())
    assert info["files_ingested"] == 1
