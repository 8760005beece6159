"""Tombstone deletes: search identity to a full rebuild over the
filtered corpus (scores exact, paths identical), WAND==dense on a
tombstoned index, stats refresh, idempotence, append-after-delete."""

import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/rcs_tomb"
QUERIES = [
    "parse json data",
    "send http request",
    "user data",
    "validate input schema",
]
DEAD_REPO = "org3/repo3"


@pytest.fixture(scope="module")
def corpora(ray_session):
    from distributedcodesearchengine_ray.sources.corpus import write_corpus

    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE, exist_ok=True)
    write_corpus(f"{BASE}/corpus", n_files=600, seed=11, num_shards=4)
    return f"{BASE}/corpus"


def _hits_key(hits):
    """(path, entity-ish name, score) — id-free comparison basis."""
    return [
        (h["path"], h.get("name"), round(h["score"], 10)) for h in hits
    ]


def _build(corpus_ds_or_path, index_dir, mode="entity"):
    from distributedcodesearchengine_ray.pipelines.build_index import build_index

    shutil.rmtree(index_dir, ignore_errors=True)
    return build_index(
        corpus_ds_or_path, index_dir, mode=mode, docs_per_partition=150, resume=False
    )


def _filtered_ds(corpus, repo):
    import pyarrow.compute as pc

    from distributedcodesearchengine_ray.sources.corpus import read_corpus

    return read_corpus(corpus).map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["repo"], repo))),
        batch_format="pyarrow",
    )


@pytest.fixture(scope="module")
def deleted_and_rebuilt(corpora):
    """One tombstoned index + one rebuilt-over-filtered-corpus index."""
    from distributedcodesearchengine_ray.engine import CodeSearchEngine
    from distributedcodesearchengine_ray.pipelines.build_index import (
        tombstone_delete,
    )

    _build(corpora, f"{BASE}/idx_tomb")
    m_tomb = tombstone_delete(f"{BASE}/idx_tomb", "repo_name", DEAD_REPO)
    _build(_filtered_ds(corpora, DEAD_REPO), f"{BASE}/idx_rebuilt")
    return m_tomb


def test_manifest_scalars_match_rebuild(deleted_and_rebuilt):
    from distributedcodesearchengine_ray.state.manifest import IndexManifest

    mt = deleted_and_rebuilt
    mr = IndexManifest.load(f"{BASE}/idx_rebuilt")
    assert mt.n_docs == mr.n_docs
    assert mt.total_tokens == mr.total_tokens
    assert mt.avgdl == pytest.approx(mr.avgdl, rel=0, abs=0)
    assert mt.vocab_size == mr.vocab_size
    assert mt.average_idf == pytest.approx(mr.average_idf, rel=1e-12)


def test_search_identical_to_rebuild(ray_session, deleted_and_rebuilt):
    from distributedcodesearchengine_ray.engine import CodeSearchEngine

    et = CodeSearchEngine(f"{BASE}/idx_tomb")
    er = CodeSearchEngine(f"{BASE}/idx_rebuilt")
    try:
        for q in QUERIES:
            for kwargs in (
                {},
                {"language": "python"},
                {"method": "wand"},
            ):
                ht = et.search(q, limit=15, normalize=False, **kwargs)
                hr = er.search(q, limit=15, normalize=False, **kwargs)
                assert _hits_key(ht) == _hits_key(hr), (q, kwargs)
            # no dead-repo doc ever surfaces
            for h in et.search(q, limit=50, normalize=False):
                assert not h["path"].startswith(DEAD_REPO)
    finally:
        et.close()
        er.close()


def test_facets_match_rebuild(ray_session, deleted_and_rebuilt):
    from distributedcodesearchengine_ray.engine import CodeSearchEngine

    et = CodeSearchEngine(f"{BASE}/idx_tomb")
    er = CodeSearchEngine(f"{BASE}/idx_rebuilt")
    try:
        ft = et.facets(QUERIES[0], "language")
        fr = er.facets(QUERIES[0], "language")
        assert ft == fr
    finally:
        et.close()
        er.close()


def test_pinned_respects_tombstones_and_id_bound(ray_session, deleted_and_rebuilt):
    """search_pinned existence checks must use the assigned id bound (max
    partition doc_hi), not n_docs (live count < id bound once tombstones
    exist): live docs with high ids stay pinnable, dead ids never
    resurface pinned."""
    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    qe = QueryEngine(f"{BASE}/idx_tomb", num_actors=2)
    try:
        tomb_dir = f"{BASE}/idx_tomb/tombstones"
        dead_ids = sorted(
            int(x)
            for f in sorted(os.listdir(tomb_dir))
            if f.endswith(".parquet")
            for x in pq.read_table(os.path.join(tomb_dir, f))["doc_id"].to_pylist()
        )
        assert dead_ids, "fixture must actually tombstone something"
        doc_hi = max(p.doc_hi for p in qe.manifest.partitions)
        assert doc_hi > qe.manifest.n_docs  # the bound n_docs would miss
        live_high = next(i for i in range(doc_hi - 1, -1, -1) if i not in set(dead_ids))
        hits = qe.search_pinned(QUERIES[0], [dead_ids[0], live_high], limit=10)
        pinned = [h["doc_id"] for h in hits if h["pinned"]]
        assert pinned == [live_high]
        assert dead_ids[0] not in [h["doc_id"] for h in hits]
    finally:
        qe.close()


def test_stats_exclude_dead(ray_session, deleted_and_rebuilt):
    from distributedcodesearchengine_ray.engine import CodeSearchEngine

    st = CodeSearchEngine(f"{BASE}/idx_tomb").stats()
    sr = CodeSearchEngine(f"{BASE}/idx_rebuilt").stats()
    assert st["n_docs"] == sr["n_docs"]
    assert st["languages"] == sr["languages"]


def test_idempotent_redelete(ray_session, deleted_and_rebuilt):
    from distributedcodesearchengine_ray.pipelines.build_index import (
        tombstone_delete,
    )
    from distributedcodesearchengine_ray.state.manifest import IndexManifest

    before = IndexManifest.load(f"{BASE}/idx_tomb")
    after = tombstone_delete(f"{BASE}/idx_tomb", "repo_name", DEAD_REPO)
    assert after.n_docs == before.n_docs
    assert after.vocab_size == before.vocab_size
    # no-op deletes add no tombstone files
    assert after.extra.get("tombstoned_docs") == before.extra.get("tombstoned_docs")


def test_delete_unknown_value_is_noop(ray_session, deleted_and_rebuilt):
    from distributedcodesearchengine_ray.pipelines.build_index import (
        tombstone_delete,
    )

    before_files = sorted(os.listdir(f"{BASE}/idx_tomb/tombstones"))
    m = tombstone_delete(f"{BASE}/idx_tomb", "repo_name", "org99/nope")
    assert sorted(os.listdir(f"{BASE}/idx_tomb/tombstones")) == before_files
    assert m.n_docs > 0


def test_compact_after_delete_keeps_identity(ray_session, corpora, deleted_and_rebuilt):
    """Compaction renumbers partitions but keeps doc ids: the range-based
    alive mask and the lex_ddf corrections must survive it."""
    import shutil as _sh

    from distributedcodesearchengine_ray.engine import CodeSearchEngine
    from distributedcodesearchengine_ray.pipelines.build_index import compact_index

    _sh.copytree(f"{BASE}/idx_tomb", f"{BASE}/idx_tomb_compact")
    m = compact_index(f"{BASE}/idx_tomb_compact", max_docs_per_partition=10_000)
    assert m.num_partitions < 5 or m.num_partitions <= len(m.partitions) + 5
    ec = CodeSearchEngine(f"{BASE}/idx_tomb_compact")
    er = CodeSearchEngine(f"{BASE}/idx_rebuilt")
    try:
        for q in QUERIES:
            hc = ec.search(q, limit=15, normalize=False)
            hr = er.search(q, limit=15, normalize=False)
            assert _hits_key(hc) == _hits_key(hr), q
    finally:
        ec.close()
        er.close()


def test_cli_delete_smoke(ray_session, corpora, deleted_and_rebuilt):
    import json as _json
    import shutil as _sh
    import subprocess

    _sh.copytree(f"{BASE}/idx_tomb", f"{BASE}/idx_cli_del")
    out = subprocess.run(
        [
            sys.executable, "-m", "distributedcodesearchengine_ray.cli", "delete",
            "org1/repo1", "--index-dir", f"{BASE}/idx_cli_del",
        ],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = _json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["tombstoned_docs"] > deleted_and_rebuilt.extra["tombstoned_docs"]


def test_append_after_delete_matches_rebuild(ray_session, corpora):
    """lex_ddf persists through append's lexicon refresh: appending onto a
    tombstoned index gives the same ranking as a rebuild over
    (filtered + appended)."""
    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.engine import CodeSearchEngine
    from distributedcodesearchengine_ray.pipelines.build_index import (
        append_index,
        tombstone_delete,
    )
    from distributedcodesearchengine_ray.sources.corpus import (
        _rows_to_table,
        gen_corpus_row,
    )

    app_dir = f"{BASE}/append_corpus"
    os.makedirs(app_dir, exist_ok=True)
    pq.write_table(
        _rows_to_table([gen_corpus_row(i, 11, 2) for i in range(600, 680)]),
        os.path.join(app_dir, "part-00000.parquet"),
    )

    _build(corpora, f"{BASE}/idx_tomb2")
    tombstone_delete(f"{BASE}/idx_tomb2", "repo_name", DEAD_REPO)
    append_index(f"{BASE}/idx_tomb2", app_dir, docs_per_partition=150)

    import ray.data as rd

    from distributedcodesearchengine_ray.sources.corpus import read_corpus

    combined = _filtered_ds(corpora, DEAD_REPO).union(read_corpus(app_dir))
    _build(combined, f"{BASE}/idx_ref2")

    et = CodeSearchEngine(f"{BASE}/idx_tomb2")
    er = CodeSearchEngine(f"{BASE}/idx_ref2")
    try:
        for q in QUERIES[:2]:
            # ties order differently across append vs rebuild (appended
            # docs take ids past the old corpus; a rebuild re-ranks all
            # keys globally — pre-existing append semantics, not a
            # tombstone effect), so compare the score sequence and the
            # tie-insensitive hit multiset
            ht = et.search(q, limit=15, normalize=False)
            hr = er.search(q, limit=15, normalize=False)
            assert [round(h["score"], 10) for h in ht] == [
                round(h["score"], 10) for h in hr
            ], q
            assert sorted(_hits_key(ht)) == sorted(_hits_key(hr)), q
    finally:
        et.close()
        er.close()
