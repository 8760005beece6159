"""Segment merge (merge_indexes): search identity vs append_index over the
same corpora, positional phrase survival, manifest invariants, guards."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from distributedcodesearchengine_ray.pipelines.build_index import (
    append_index,
    build_index,
    merge_indexes,
)
from distributedcodesearchengine_ray.pipelines.query import QueryEngine
from distributedcodesearchengine_ray.sources.corpus import _rows_to_table, gen_corpus_row
from distributedcodesearchengine_ray.state.manifest import IndexManifest

BASE = "/tmp/rcs_merge"
QUERIES = [
    "parse json data stream",
    "send http request",
    "merge sort values",
    "import",  # hot term -> long postings cross partition boundaries
]


def _write_rows(out_dir, lo, hi, seed):
    os.makedirs(out_dir, exist_ok=True)
    rows = [gen_corpus_row(i, seed) for i in range(lo, hi)]
    pq.write_table(_rows_to_table(rows), os.path.join(out_dir, "part-00000.parquet"))
    return out_dir


def _results(index_dir, method="dense"):
    eng = QueryEngine(index_dir, num_actors=2)
    try:
        return {
            q: [
                (h["doc_id"], round(h["score"], 9))
                for h in eng.search(q, limit=40, method=method)
            ]
            for q in QUERIES
        }
    finally:
        eng.close()


@pytest.fixture(scope="module")
def merged(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    a_corpus = _write_rows(f"{BASE}/corpus_a", 0, 150, seed=3)
    b_corpus = _write_rows(f"{BASE}/corpus_b", 500, 620, seed=9)
    build_index(a_corpus, f"{BASE}/idx_a", mode="entity", docs_per_partition=50, resume=False)
    build_index(b_corpus, f"{BASE}/idx_b", mode="entity", docs_per_partition=40, resume=False)
    # reference semantics: merged(A, B) == A appended with B's corpus
    shutil.copytree(f"{BASE}/idx_a", f"{BASE}/idx_ref")
    append_index(f"{BASE}/idx_ref", b_corpus, docs_per_partition=40, resume=False)
    merge_indexes(f"{BASE}/idx_a", f"{BASE}/idx_b", f"{BASE}/idx_m")
    return BASE


def test_merge_matches_append_semantics(merged):
    assert _results(f"{BASE}/idx_m") == _results(f"{BASE}/idx_ref")


def test_merge_wand_identity(merged):
    assert _results(f"{BASE}/idx_m", method="wand") == _results(f"{BASE}/idx_m")


def test_merge_manifest_invariants(merged):
    ma = IndexManifest.load(f"{BASE}/idx_a")
    mb = IndexManifest.load(f"{BASE}/idx_b")
    mm = IndexManifest.load(f"{BASE}/idx_m")
    mr = IndexManifest.load(f"{BASE}/idx_ref")
    assert mm.n_docs == ma.n_docs + mb.n_docs == mr.n_docs
    assert mm.total_tokens == ma.total_tokens + mb.total_tokens
    assert mm.num_partitions == ma.num_partitions + mb.num_partitions
    # rebuild-exact global scalars (the score-identity preconditions)
    assert mm.avgdl == mr.avgdl
    assert abs(mm.average_idf - mr.average_idf) < 1e-12
    assert mm.vocab_size == mr.vocab_size
    spans = sorted((p.doc_lo, p.doc_hi) for p in mm.partitions)
    assert spans[0][0] == 0 and spans[-1][1] == mm.n_docs
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))


def test_merge_docmeta_ids_shifted(merged):
    import pyarrow.dataset as pads

    ids = (
        pads.dataset(f"{BASE}/idx_m/docmeta", format="parquet")
        .to_table(columns=["doc_id"])["doc_id"]
        .to_numpy()
    )
    assert sorted(ids) == list(range(len(ids)))


def test_merge_with_positions_phrase_search(ray_session):
    shutil.rmtree(f"{BASE}/pos", ignore_errors=True)
    a = _write_rows(f"{BASE}/pos/ca", 0, 80, seed=5)
    b = _write_rows(f"{BASE}/pos/cb", 300, 360, seed=6)
    build_index(a, f"{BASE}/pos/ia", mode="entity", docs_per_partition=40,
                resume=False, with_positions=True)
    build_index(b, f"{BASE}/pos/ib", mode="entity", docs_per_partition=40,
                resume=False, with_positions=True)
    shutil.copytree(f"{BASE}/pos/ia", f"{BASE}/pos/iref")
    append_index(f"{BASE}/pos/iref", b, docs_per_partition=40, resume=False)
    merge_indexes(f"{BASE}/pos/ia", f"{BASE}/pos/ib", f"{BASE}/pos/im")

    def phrase(idx):
        eng = QueryEngine(idx, num_actors=2)
        try:
            return [
                (h["doc_id"], round(h["score"], 9))
                for h in eng.search_phrase_positional("parse json data", limit=30)
            ]
        finally:
            eng.close()

    got, ref = phrase(f"{BASE}/pos/im"), phrase(f"{BASE}/pos/iref")
    assert got == ref
    assert got, "phrase should match on the synthetic corpus"


def test_merge_guards(merged, tmp_path):
    from distributedcodesearchengine_ray.pipelines.build_index import tombstone_delete

    # parameter mismatch
    with pytest.raises(ValueError):
        bad = f"{BASE}/idx_badparam"
        if not os.path.isdir(bad):
            shutil.copytree(f"{BASE}/idx_b", bad)
            m = IndexManifest.load(bad)
            m.k1 = 1.2
            m.save(bad)
        merge_indexes(f"{BASE}/idx_a", bad, str(tmp_path / "out1"))
    # tombstoned input refused
    tomb = f"{BASE}/idx_tomb"
    if not os.path.isdir(tomb):
        shutil.copytree(f"{BASE}/idx_b", tomb)
        tombstone_delete(tomb, column="lang", value="go")
    with pytest.raises(NotImplementedError):
        merge_indexes(f"{BASE}/idx_a", tomb, str(tmp_path / "out2"))
    # non-empty out_dir refused
    with pytest.raises(ValueError):
        merge_indexes(f"{BASE}/idx_a", f"{BASE}/idx_b", f"{BASE}/idx_m")
