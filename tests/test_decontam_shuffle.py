"""Decontamination + deterministic shuffle: invariants beyond the
driver-contract oracle check (which covers value exactness at sf0.001)."""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _docs(num_blocks):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
        override_num_blocks=num_blocks,
    )


def test_shuffle_positions_dense_permutation(ray_session):
    from distributedcodesearchengine_ray.stages.shuffle import shuffle_positions

    out = shuffle_positions(_docs(4), seed="s0").to_pandas()
    pos = np.sort(out["pos"].to_numpy())
    assert (pos == np.arange(len(out))).all()  # dense 0..N-1, no dup/gap


def test_shuffle_positions_partitioning_invariant(ray_session):
    """Same permutation whatever the block layout — the reproducibility
    contract a training pipeline relies on."""
    from distributedcodesearchengine_ray.stages.shuffle import shuffle_positions

    a = (
        shuffle_positions(_docs(1), seed="s0")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        shuffle_positions(_docs(13), seed="s0")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a["pos"].tolist() == b["pos"].tolist()


def test_shuffle_seed_changes_permutation(ray_session):
    from distributedcodesearchengine_ray.stages.shuffle import shuffle_positions

    a = (
        shuffle_positions(_docs(4), seed="s0")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        shuffle_positions(_docs(4), seed="s1")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a["pos"].tolist() != b["pos"].tolist()


def test_decontaminate_self_is_fully_contaminated(ray_session):
    """Every doc with >= n tokens shares all its grams with itself: using
    the corpus as its own benchmark must flag exactly the >=5-token docs."""
    from distributedcodesearchengine_ray.stages.decontam import decontaminate
    from distributedcodesearchengine_ray.stages.simjoin import _explode_distinct_ngrams

    import pyarrow.parquet as pq

    docs = _docs(4)
    out = (
        decontaminate(docs, docs, n=5)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    t = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    grams = _explode_distinct_ngrams(t, 5, "doc_id", "text")
    has_grams = set(grams["doc_id"].to_pylist())
    for did, flag in zip(out["doc_id"], out["contaminated"]):
        assert bool(flag) == (did in has_grams)


def test_decontaminate_empty_benchmark_flags_nothing(ray_session):
    from distributedcodesearchengine_ray.stages.decontam import decontaminate

    docs = _docs(4)
    empty = docs.limit(0)
    out = decontaminate(docs, empty, n=5).to_pandas()
    assert int(out["contaminated"].sum()) == 0
    assert len(out) == docs.count()


def test_dedup_lines_boilerplate_removal(ray_session):
    """Multi-line docs sharing a boilerplate header: the header survives
    only in the smallest (doc_id, line_idx) position; unique lines are
    untouched; a doc that is ALL boilerplate vanishes."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.linededup import dedup_lines

    header = "copyright 2026\nall rights reserved"
    rows = [
        {"doc_id": 3, "text": f"{header}\nunique three"},
        {"doc_id": 1, "text": f"{header}\nunique one"},
        {"doc_id": 2, "text": header},  # all boilerplate -> vanishes
        {"doc_id": 7, "text": "unique seven\ncopyright 2026"},  # dup of line 0 of doc 1
    ]
    ds = rd.from_items(rows).repartition(3)
    out = (
        dedup_lines(ds)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    got = dict(zip(out["doc_id"], out["text"]))
    assert got == {
        1: f"{header}\nunique one",
        3: "unique three",
        7: "unique seven",
    }


def test_dedup_lines_partitioning_invariant(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.linededup import dedup_lines

    t = pq.read_table(os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"])
    a = (
        dedup_lines(rd.from_arrow(t).repartition(1))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        dedup_lines(rd.from_arrow(t).repartition(11))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["text"].tolist() == b["text"].tolist()
