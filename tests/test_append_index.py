"""Incremental append (reference insert path): equivalence vs a full
rebuild, docID stability, dedup-on-insert, idempotence, and the
stale-partition cleanup when a full rebuild follows appends."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distributedcodesearchengine_ray.pipelines.build_index import append_index, build_index
from distributedcodesearchengine_ray.pipelines.query import QueryEngine
from distributedcodesearchengine_ray.sources.corpus import _rows_to_table, gen_corpus_row
from distributedcodesearchengine_ray.state.manifest import IndexManifest

N_A, N_B = 120, 80
QUERIES = ["parse json data stream", "send http request", "merge sort values"]


def _write_rows(out_dir, lo, hi, seed=5):
    os.makedirs(out_dir, exist_ok=True)
    rows = [gen_corpus_row(i, seed) for i in range(lo, hi)]
    pq.write_table(_rows_to_table(rows), os.path.join(out_dir, "part-00000.parquet"))
    return out_dir


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = tmp_path_factory.mktemp("append")
    a = _write_rows(str(root / "a"), 0, N_A)
    b = _write_rows(str(root / "b"), N_A, N_A + N_B)
    ab = _write_rows(str(root / "ab"), 0, N_A + N_B)
    return root, a, b, ab


def _search_map(index_dir, query, limit=50):
    eng = QueryEngine(index_dir, num_actors=2)
    try:
        df = eng.search_with_meta(query, limit=limit, columns=["path"])
    finally:
        eng.close()
    return dict(zip(df["path"], df["score"]))


def test_append_matches_full_rebuild(ray_session, corpora):
    root, a, b, ab = corpora
    idx1 = str(root / "idx_append")
    idx2 = str(root / "idx_full")

    m_a = build_index(a, idx1, mode="file", docs_per_partition=40)
    p_old = m_a.num_partitions
    # snapshot the pre-append partition files: append must not touch them
    meta_dir = os.path.join(idx1, "docmeta")
    before = {
        f: open(os.path.join(meta_dir, f), "rb").read()
        for f in os.listdir(meta_dir)
        if f.endswith(".parquet")
    }

    m_app = append_index(idx1, b, docs_per_partition=40)
    m_full = build_index(ab, idx2, mode="file", docs_per_partition=40)

    # corpus-wide scalars are order-independent sums: must match exactly
    # (average_idf within float summation-order noise)
    assert m_app.n_docs == m_full.n_docs
    assert m_app.total_tokens == m_full.total_tokens
    assert m_app.avgdl == pytest.approx(m_full.avgdl, rel=1e-12)
    assert m_app.vocab_size == m_full.vocab_size
    assert m_app.average_idf == pytest.approx(m_full.average_idf, rel=1e-12)
    assert m_app.num_partitions > p_old

    # docID stability: old partitions byte-identical
    for f, blob in before.items():
        assert open(os.path.join(meta_dir, f), "rb").read() == blob

    # appended docs take ids AFTER the old corpus, in key order
    new_meta = pa.concat_tables(
        pq.read_table(os.path.join(meta_dir, f))
        for f in sorted(os.listdir(meta_dir))
        if f.endswith(".parquet") and int(f[5:10]) >= p_old
    )
    assert int(pa.compute.min(new_meta["doc_id"]).as_py()) == m_a.n_docs
    assert len(new_meta) == m_full.n_docs - m_a.n_docs

    # search identity: same (path -> score) map as the full rebuild
    for q in QUERIES:
        got, want = _search_map(idx1, q), _search_map(idx2, q)
        assert set(got) == set(want), q
        for path, score in want.items():
            assert got[path] == pytest.approx(score, rel=1e-9), (q, path)


def test_append_idempotent_and_resumable(ray_session, corpora):
    root, a, b, ab = corpora
    idx1 = str(root / "idx_append")  # built by the previous test
    m1 = IndexManifest.load(idx1)
    m2 = append_index(idx1, b, docs_per_partition=40)  # same batch again
    assert m2.n_docs == m1.n_docs
    assert m2.num_partitions == m1.num_partitions
    assert len(m2.extra["appends"]) == len(m1.extra["appends"])


def test_rebuild_after_append_drops_stale_partitions(ray_session, corpora):
    root, a, b, ab = corpora
    idx1 = str(root / "idx_append")
    m_before = IndexManifest.load(idx1)
    assert m_before.extra.get("appends")  # appends happened
    m = build_index(a, idx1, mode="file", docs_per_partition=40)  # resume path
    assert m.n_docs < m_before.n_docs  # back to corpus A only
    pids = [
        int(f[5:10])
        for f in os.listdir(os.path.join(idx1, "postings"))
        if f.endswith(".parquet")
    ]
    assert max(pids) < m.num_partitions  # appended stragglers removed
    # lexicon stats equal a fresh A-only build's
    idx_fresh = str(root / "idx_fresh_a")
    m_fresh = build_index(a, idx_fresh, mode="file", docs_per_partition=40)
    assert m.vocab_size == m_fresh.vocab_size
    assert m.total_tokens == m_fresh.total_tokens


def test_append_dedup_on_insert(ray_session, corpora, tmp_path):
    root, a, b, ab = corpora
    idx = str(tmp_path / "idx")
    m_a = build_index(a, idx, mode="file", docs_per_partition=40)

    # batch: 10 genuinely new files + 5 with content ALREADY in the index
    # (new paths) + one new content duplicated under two paths
    rows = [gen_corpus_row(i, 5) for i in range(N_A, N_A + 10)]
    for i in range(5):
        dup = dict(gen_corpus_row(i, 5))
        dup["path"] = f"copies/copy_{i}" + os.path.splitext(dup["path"])[1]
        rows.append(dup)
    twin = dict(gen_corpus_row(N_A + 10, 5))
    twin_b = dict(twin)
    twin_b["path"] = "zz/" + os.path.basename(twin["path"])
    rows += [twin, twin_b]
    batch_dir = str(tmp_path / "batch")
    os.makedirs(batch_dir)
    pq.write_table(_rows_to_table(rows), os.path.join(batch_dir, "part-00000.parquet"))

    m = append_index(idx, batch_dir, dedup_on_insert=True, docs_per_partition=40)
    # filters may drop some of the 10 new rows (skip dirs / unknown ext),
    # but every survivor is unique and no pre-existing content re-enters
    meta = pa.concat_tables(
        pq.read_table(os.path.join(idx, "docmeta", f), columns=["sha256", "doc_id"])
        for f in sorted(os.listdir(os.path.join(idx, "docmeta")))
        if f.endswith(".parquet")
    )
    shas = meta["sha256"].to_pylist()
    assert len(shas) == len(set(shas))  # global exact uniqueness
    assert m.n_docs == len(meta)
    # the twin content appears exactly once
    import hashlib

    twin_sha = hashlib.sha256(twin["content"].encode()).hexdigest()
    assert shas.count(twin_sha) == 1


def test_append_entity_mode_smoke(ray_session, corpora, tmp_path):
    root, a, b, ab = corpora
    idx = str(tmp_path / "idx_ent")
    m_a = build_index(a, idx, mode="entity", docs_per_partition=60)
    m = append_index(idx, b, docs_per_partition=60)
    assert m.n_docs > m_a.n_docs
    assert m.mode == "entity"
    got = _search_map(idx, "parse json data", limit=10)
    assert got  # appended index serves queries
