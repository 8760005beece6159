"""HyperLogLog sketch vs an independently-written scalar reference:
register-identical folds, merge semantics, and estimate accuracy."""

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scalar_hll(values, p=12):
    """Independent scalar HLL: same hash, bit ops only (no frexp)."""
    m = 1 << p
    reg = [0] * m
    h = pd.util.hash_array(np.asarray(list(values), dtype=object)).astype(np.uint64)
    for x in h.tolist():
        bucket = x >> (64 - p)
        low = x & ((1 << (64 - p)) - 1)
        rho = (64 - p) + 1 if low == 0 else (64 - p) - low.bit_length() + 1
        reg[bucket] = max(reg[bucket], rho)
    return np.array(reg, dtype=np.uint8)


def test_sketch_registers_match_scalar_reference():
    from distributedcodesearchengine_ray.stages.hll import sketch_values

    vals = np.array([f"tok{i}" for i in range(5000)], dtype=object)
    assert (sketch_values(vals) == _scalar_hll(vals)).all()


def test_merge_is_elementwise_max_and_order_free():
    from distributedcodesearchengine_ray.stages.hll import (
        estimate,
        merge_sketches,
        sketch_values,
    )

    a = np.array([f"a{i}" for i in range(1000)], dtype=object)
    b = np.array([f"b{i}" for i in range(1000)], dtype=object)
    whole = sketch_values(np.concatenate([a, b]))
    m1 = merge_sketches([sketch_values(a).tobytes(), sketch_values(b).tobytes()])
    m2 = merge_sketches([sketch_values(b).tobytes(), sketch_values(a).tobytes()])
    assert (m1 == whole).all() and (m2 == whole).all()
    assert estimate(m1) == estimate(whole)


def test_estimate_accuracy_bands():
    from distributedcodesearchengine_ray.stages.hll import estimate, sketch_values

    for n in (100, 3000, 50000, 300000):
        vals = np.array([f"v{i}" for i in range(n)], dtype=object)
        est = estimate(sketch_values(vals))
        # 4096 registers -> ~1.6% sigma; allow 5 sigma (plus small-range
        # linear counting, which is tighter)
        assert abs(est - n) / n < 0.08, (n, est)


def test_hll_distinct_tokens_matches_serial_fold(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.hll import (
        estimate,
        hll_distinct_tokens,
        sketch_values,
    )

    texts = [f"shared tok{i} tok{i+1} word{i % 7}" for i in range(300)]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(5)

    out = hll_distinct_tokens(ds)
    toks = np.array(
        sorted({w for t in texts for w in t.lower().split() if w}), dtype=object
    )
    truth_reg = sketch_values(toks)
    assert out["registers"] == truth_reg.tobytes()
    assert out["estimate"] == estimate(truth_reg)
    exact = len(toks)
    assert abs(out["estimate"] - exact) / exact < 0.08


def test_driver_query_accuracy_vs_exact(ray_session):
    """The distinct_users_hll driver query: every per-type estimate
    within 8% (5 sigma at 4096 registers) of the DuckDB exact count."""
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = entrymod.queries()["distinct_users_hll"](sf).to_pandas().set_index("event_type")
    exact = (
        duckdb.connect()
        .execute(
            "SELECT event_type, count(DISTINCT user_id) AS n FROM "
            f"read_parquet('{sf}/events.parquet') GROUP BY event_type"
        )
        .df()
        .set_index("event_type")
    )
    assert set(got.index) == set(exact.index)
    for et, n in exact["n"].items():
        est = got.loc[et, "estimate_milli"] / 1000.0
        assert abs(est - n) / n < 0.08, (et, est, n)


def test_hll_by_group_matches_per_group_fold(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.hll import (
        estimate,
        hll_distinct_by_group,
        sketch_values,
    )

    n = 2000
    groups = [f"g{i % 3}" for i in range(n)]
    vals = [i % 500 if i % 3 == 0 else i for i in range(n)]
    ds = rd.from_arrow(
        pa.table({"g": pa.array(groups, pa.string()), "v": pa.array(vals, pa.int64())})
    ).repartition(7)

    out = hll_distinct_by_group(ds, "g", "v").set_index("g")
    df = pd.DataFrame({"g": groups, "v": vals})
    for g, sub in df.groupby("g"):
        expect = estimate(sketch_values(sub["v"].unique()))
        assert out.loc[g, "estimate"] == expect, g
