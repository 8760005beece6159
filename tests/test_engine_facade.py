"""Facade + CLI parity tests (reference engine surface)."""

import json
import subprocess
import sys

import pytest

from distributedcodesearchengine_ray.sources.corpus import write_corpus


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    return write_corpus(str(tmp_path_factory.mktemp("c")), n_files=150, seed=42, num_shards=2)


@pytest.fixture(scope="module")
def engine(ray_session, corpus_dir, tmp_path_factory):
    from distributedcodesearchengine_ray.engine import CodeSearchEngine

    eng = CodeSearchEngine(str(tmp_path_factory.mktemp("idx")), mode="entity")
    eng.index_corpus(corpus_dir, docs_per_partition=50, with_embeddings=True)
    yield eng
    eng.close()


def test_search_normalized_with_highlights(engine):
    hits = engine.search("parse json data", limit=10)
    assert hits
    assert hits[0]["score"] == pytest.approx(1.0)  # K4 normalization
    assert all(0 <= h["score"] <= 1.0 + 1e-12 for h in hits)
    assert any(h["highlights"] for h in hits)  # M11
    # filters thread through
    py = engine.search("parse json data", limit=10, language="python")
    assert all(h["lang"] == "python" for h in py)


def test_hybrid_path(engine):
    hits = engine.search("send http request", limit=10, use_hybrid=True)
    assert hits
    assert "semantic_score" in hits[0]
    assert "highlights" in hits[0]


def test_wand_method(engine):
    dense = engine.search("validate email address", limit=10, method="dense")
    wand = engine.search("validate email address", limit=10, method="wand")
    assert [h["doc_id"] for h in dense] == [h["doc_id"] for h in wand]


def test_stats_and_count(engine):
    s = engine.stats()
    assert s["n_docs"] == engine.count() > 0
    assert s["vocab_size"] > 0
    assert set(s["languages"]) <= {"python", "javascript", "typescript", "go", "rust"}


def test_remove_by_repo(ray_session, corpus_dir, tmp_path_factory):
    from distributedcodesearchengine_ray.engine import CodeSearchEngine

    eng = CodeSearchEngine(str(tmp_path_factory.mktemp("idx2")), mode="entity")
    try:
        m1 = eng.index_corpus(corpus_dir, docs_per_partition=50)
        before = eng.stats()
        victim = "org1/repo1"
        hits = eng.search("parse json", limit=50)
        m2 = eng.remove_by_repo(corpus_dir, victim, docs_per_partition=50)
        assert m2.n_docs < m1.n_docs
        after_hits = eng.search("parse json", limit=50)
        assert all(h.get("repo_name") != victim for h in after_hits)
    finally:
        eng.close()


def test_cli_end_to_end(corpus_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx3"))
    env = None
    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "index", corpus_dir,
         "--index-dir", idx, "--docs-per-partition", "100"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["n_docs"] > 0

    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "search",
         "parse json", "--index-dir", idx, "--limit", "5"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert 0 < len(lines) <= 5
    assert "doc_id" in lines[0]

    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "search",
         "parse json", "--index-dir", idx, "--facets", "language"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    facets = json.loads(out.stdout.strip().splitlines()[-1])
    assert facets["facet"] == "language"
    assert facets["total"] == sum(facets["counts"].values()) > 0

    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "similar",
         "0", "--index-dir", idx, "--limit", "5"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert 0 < len(lines) <= 5 and all(l["doc_id"] != 0 for l in lines)

    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "stats",
         "--index-dir", idx],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1])["n_docs"] == info["n_docs"]


def test_cli_dedup_smoke(tmp_path_factory):
    """`cli dedup` over the testdata documents table: ngram method with
    clustering, pairs + clusters parquet written, summary JSON sane."""
    out_dir = str(tmp_path_factory.mktemp("dedup_out"))
    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "dedup",
         "/root/testdata/sf0.001/documents.parquet", "--method", "ngram",
         "--clusters", "--out", out_dir, "--limit", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]
    summary = lines[0]
    assert summary["method"] == "ngram"
    assert summary["pairs"] > 0
    assert summary["clusters"] <= summary["clustered_docs"]
    import os

    assert os.path.exists(os.path.join(out_dir, "pairs.parquet"))
    assert os.path.exists(os.path.join(out_dir, "clusters.parquet"))
    # printed pair rows carry exact jaccard scores
    assert {"id_a", "id_b", "jaccard"} <= set(lines[1].keys())


def test_cli_curate_end_to_end(tmp_path_factory):
    """`cli curate` over the testdata documents table: writes the slim
    flag table, the selected doc ids, and the audit; selection row count
    equals the audit's budget stage exactly (the funnel's oracle-checked
    numbers)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out_dir = str(tmp_path_factory.mktemp("curate_out"))
    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "curate",
         "/root/testdata/sf0.001/documents.parquet", "--out", out_dir],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    stages = summary["stages"]
    assert stages["all"]["n_docs"] >= stages["dedup"]["n_docs"] >= \
        stages["gopher"]["n_docs"] >= stages["decontam"]["n_docs"] >= \
        stages["budget"]["n_docs"] > 0
    audit = json.load(open(os.path.join(out_dir, "audit.json")))
    assert [r["stage"] for r in audit] == [
        "all", "dedup", "gopher", "decontam", "budget"
    ]
    sel = sum(pq.ParquetFile(f).metadata.num_rows
              for f in glob.glob(os.path.join(out_dir, "selected", "*.parquet")))
    assert sel == stages["budget"]["n_docs"]
    flags = sum(pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(os.path.join(out_dir, "flags", "*.parquet")))
    assert flags == stages["all"]["n_docs"]


def test_cli_curate_file_fed_benchmark(tmp_path_factory):
    """`cli curate --benchmark PATH`: the decontamination stage flags
    documents sharing 5-grams with a USER-SUPPLIED benchmark file (plain
    text, one entry per line) instead of the synthetic doc_id %% 19
    half — the stage is usable as shipped.  The benchmark lines are real
    document texts, so contamination must flag at least those docs."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001/documents.parquet"
    t = pq.read_table(src, columns=["doc_id", "text"])
    texts = t["text"].to_pylist()
    # two real document texts as benchmark entries -> their docs (and any
    # 5-gram-sharing near-dups) must be flagged contaminated
    bench_lines = [texts[3], texts[7]]
    bench_path = str(tmp_path_factory.mktemp("bench") / "benchmark.txt")
    with open(bench_path, "w") as f:
        f.write("\n".join(ln.replace("\n", " ") for ln in bench_lines) + "\n")

    out_dir = str(tmp_path_factory.mktemp("curate_bench_out"))
    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "curate",
         src, "--out", out_dir, "--benchmark", bench_path],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    stages = summary["stages"]
    assert stages["decontam"]["n_docs"] <= stages["gopher"]["n_docs"]
    flags = pa.concat_tables([
        pq.read_table(f, columns=["doc_id", "contaminated"])
        for f in glob.glob(os.path.join(out_dir, "flags", "*.parquet"))
    ]).to_pandas().set_index("doc_id")
    # the benchmark docs themselves contain their own grams
    assert int(flags["contaminated"].sum()) >= 2
    assert int(flags.loc[3, "contaminated"]) == 1
    assert int(flags.loc[7, "contaminated"]) == 1
    # and far fewer docs are contaminated than with the synthetic
    # 1-in-19 benchmark half (the file-fed set is 2 docs, not ~5%)
    assert int(flags["contaminated"].sum()) < len(flags) // 4


def test_cli_version():
    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "version"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    from distributedcodesearchengine_ray import __version__

    assert json.loads(out.stdout.strip()) == {"version": __version__}


def test_cli_serve_smoke(corpus_dir, tmp_path_factory):
    """`cli serve` starts the HTTP server (its own Ray session) and answers
    /health and /search; SIGTERM shuts it down."""
    import signal
    import time
    import urllib.request

    idx = str(tmp_path_factory.mktemp("idx4"))
    out = subprocess.run(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "index", corpus_dir,
         "--index-dir", idx, "--docs-per-partition", "100"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    proc = subprocess.Popen(
        [sys.executable, "-m", "distributedcodesearchengine_ray.cli", "serve",
         "--index-dir", idx, "--port", "18921"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd="/root/repo",
    )
    try:
        line = proc.stdout.readline()  # blocks until "serving on ..."
        assert "serving on" in line, line
        deadline = time.time() + 60
        body = None
        while time.time() < deadline:
            try:
                with urllib.request.urlopen("http://127.0.0.1:18921/health", timeout=5) as r:
                    body = json.loads(r.read())
                break
            except OSError:
                time.sleep(0.5)
        assert body == {"status": "ok"}
        with urllib.request.urlopen(
            "http://127.0.0.1:18921/search?q=parse+json&limit=3", timeout=120
        ) as r:
            res = json.loads(r.read())
        assert res["total"] > 0
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=30)


def test_phrase_search_entity_mode(engine):
    """Quoted phrase on an entity index: every hit's reconstructed doc
    text contains the phrase verbatim; ranking comes from BM25."""
    qe = engine._bm25()
    plain = engine.search("parse json data", limit=30)
    quoted = engine.search('parse json data "parse_json"', limit=30)
    texts = qe._doc_texts([h["doc_id"] for h in quoted])
    assert quoted, "phrase must match entity docs in the fixture corpus"
    assert all("parse_json" in texts[h["doc_id"]] for h in quoted)
    assert len(quoted) <= len(plain)


def test_facade_facets_match_full_result_set(engine):
    """facets() == language value-counts of the full thresholded hit set
    (per-shard partials must agree with shipping every row)."""
    q = "parse json data"
    counts = engine.facets(q, facet_col="language")
    assert counts and all(c > 0 for c in counts.values())
    df = engine._bm25().search_with_meta(q, limit=10**6)
    assert counts == df["lang"].value_counts().sort_index().to_dict()
    # filter narrowing agrees
    lang = next(iter(counts))
    assert engine.facets(q, facet_col="language", language=lang) == {lang: counts[lang]}


def test_find_similar_facade(engine):
    hits = engine.find_similar(3, limit=8)
    assert hits
    assert all(h["doc_id"] != 3 for h in hits)  # source excluded
    assert hits[0]["score"] == pytest.approx(1.0)  # K4 normalization
    scores = [h["bm25_score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
    assert "highlights" in hits[0] and "name" in hits[0]


def test_find_similar_respects_filters(engine):
    hits = engine.find_similar(3, limit=8, entity_type="function")
    assert all(h["entity_type"] == "function" for h in hits)
