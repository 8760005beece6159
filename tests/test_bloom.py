"""Bloom-filter semi-join stage (stages/bloom.py): no false negatives,
bounded false positives, deterministic across partitionings, and the
distributed build equals a single-pass local build."""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributedcodesearchengine_ray.stages.bloom import (
    BloomPrefilter,
    bloom_contains,
    bloom_insert,
    build_bloom,
)

N_BITS, K = 1 << 16, 5


def _local_bloom(keys: np.ndarray) -> np.ndarray:
    bm = np.zeros(N_BITS // 64, dtype=np.uint64)
    bloom_insert(bm, keys, N_BITS, K)
    return bm


def test_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 62, size=3000, dtype=np.int64)
    bm = _local_bloom(keys)
    assert bloom_contains(bm, keys, N_BITS, K).all()


def test_false_positive_rate_band():
    rng = np.random.default_rng(11)
    members = rng.integers(0, 1 << 40, size=2000, dtype=np.int64)
    bm = _local_bloom(members)
    probe = rng.integers(1 << 41, 1 << 42, size=20000, dtype=np.int64)
    fp = bloom_contains(bm, probe, N_BITS, K).mean()
    # theoretical fp at m/n ~ 32 bits/key, k=5 is ~1e-4; allow generous slack
    assert fp < 0.01, fp


def test_distributed_build_matches_local(ray_session):
    import ray.data as rd

    keys = np.arange(10_000, dtype=np.int64) * 37 + 5
    ds = rd.from_arrow(pa.table({"key": pa.array(keys)})).repartition(7)
    bm_dist = build_bloom(ds, "key", n_bits=N_BITS, k=K)
    bm_local = _local_bloom(keys)
    assert np.array_equal(bm_dist, bm_local)


def test_prefilter_keeps_all_members_drops_most_rest(ray_session):
    import ray

    import ray.data as rd

    members = np.arange(0, 5000, 2, dtype=np.int64)  # evens
    bm = _local_bloom(members)
    ref = ray.put(bm)
    probe = pa.table({"key": pa.array(np.arange(5000, dtype=np.int64))})
    out = (
        rd.from_arrow(probe)
        .map_batches(
            BloomPrefilter,
            fn_constructor_kwargs={
                "bitmap_ref": ref,
                "column": "key",
                "n_bits": N_BITS,
                "k": K,
            },
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
    )
    kept = set(out["key"].tolist())
    assert set(members.tolist()) <= kept  # every true member survives
    odds_kept = len(kept) - len(members)
    assert odds_kept < 0.01 * 2500, odds_kept  # few false positives


def test_semi_join_query_exact_vs_pandas(ray_session):
    """urgent_lineitems_semi over sf0.001 equals a pandas EXISTS join —
    proves the bloom pass cannot change the answer, only shrink it."""
    import pandas as pd
    import pyarrow.parquet as pq

    from distributedcodesearchengine_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    got = Q.urgent_lineitems_semi(sf).to_pandas()
    li = pq.read_table(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    ).to_pandas()
    orders = pq.read_table(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).to_pandas()
    urgent = set(orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_orderkey"])
    exp = (
        li[li["l_orderkey"].isin(urgent)]
        .groupby("l_returnflag")
        .size()
        .rename("n")
        .reset_index()
        .sort_values("l_returnflag", ignore_index=True)
    )
    assert got["l_returnflag"].tolist() == exp["l_returnflag"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()


def test_large_volume_orders_distributed_path_matches_driver(ray_session, monkeypatch):
    """Force the Dataset.join path (Q18_DRIVER_MAX_BIG=0) and check it
    returns exactly what the driver pushdown path returns."""
    from distributedcodesearchengine_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    driver = Q.large_volume_orders(sf).to_pandas()
    monkeypatch.setattr(Q, "Q18_DRIVER_MAX_BIG", 0)
    dist = Q.large_volume_orders(sf).to_pandas()
    cols = sorted(driver.columns)
    d = driver[cols].sort_values(cols, ignore_index=True)
    x = dist[cols].sort_values(cols, ignore_index=True)
    assert d.astype(str).values.tolist() == x.astype(str).values.tolist()
