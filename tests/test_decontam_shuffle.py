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
    empty = docs.filter(lambda r: False)
    out = decontaminate(docs, empty, n=5).to_pandas()
    assert int(out["contaminated"].sum()) == 0
    assert len(out) == docs.count()
