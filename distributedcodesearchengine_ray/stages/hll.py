"""HyperLogLog distinct counting (Flajolet et al. 2007) — the mergeable
cardinality sketch for when exact COUNT DISTINCT would force a full
key-keyed shuffle of 100 TB.

Distributed shape (pure map-side; NOTHING keyed ever shuffles):

- every batch folds its values into a local 2^p-register sketch
  (vectorized ``np.maximum.at``) and emits ONE 2^p-byte row;
- the driver (or any combiner) merges sketches with elementwise max —
  merge is associative/commutative/idempotent, so retries, partition
  layout, and parallelism cannot change the result;
- the estimate is the standard alpha_m * m^2 / sum(2^-M) with
  linear-counting small-range correction (64-bit hash: no large-range
  correction needed).

Hashing: ``pd.util.hash_array`` (the deterministic 64-bit hash the
winnowing fingerprints already rely on).  Register index = top ``p``
bits; rho = leading-zero count of the remaining 52-bit field + 1,
computed exactly via ``np.frexp`` (every 52-bit value is exactly
representable in float64).

The estimate is approximate BY DESIGN, so there is no SQL value oracle;
exactness is gated in pytest against an independently-written scalar
HLL (register-identical) plus a relative-error band vs true
cardinality.  Beyond-reference operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

P = 12  # 4096 registers -> ~1.6% standard error
M = 1 << P
_ALPHA = 0.7213 / (1.0 + 1.079 / M)
_LOW_BITS = 64 - P  # 52: exactly float64's mantissa, so frexp is exact


def _rho(low: np.ndarray) -> np.ndarray:
    """Leading-zero count of the 52-bit field + 1 (1..53)."""
    out = np.full(len(low), _LOW_BITS + 1, dtype=np.uint8)  # v == 0 -> 53
    nz = low > 0
    # bit_length(v) = frexp exponent for exact float64 conversions
    _, exp = np.frexp(low[nz].astype(np.float64))
    out[nz] = (_LOW_BITS + 1 - exp).astype(np.uint8)
    return out


def sketch_values(values: np.ndarray, reg: np.ndarray | None = None) -> np.ndarray:
    """Fold an array of values into a 2^p uint8 register vector."""
    if reg is None:
        reg = np.zeros(M, dtype=np.uint8)
    if len(values) == 0:
        return reg
    h = pd.util.hash_array(np.asarray(values, dtype=object)).astype(np.uint64)
    bucket = (h >> np.uint64(_LOW_BITS)).astype(np.int64)
    low = (h & np.uint64((1 << _LOW_BITS) - 1)).astype(np.uint64)
    np.maximum.at(reg, bucket, _rho(low))
    return reg


def merge_sketches(sketches) -> np.ndarray:
    reg = np.zeros(M, dtype=np.uint8)
    for s in sketches:
        np.maximum(reg, np.frombuffer(s, dtype=np.uint8), out=reg)
    return reg


def estimate(reg: np.ndarray) -> float:
    e = _ALPHA * M * M / np.sum(np.exp2(-reg.astype(np.float64)))
    if e <= 2.5 * M:
        zeros = int(np.count_nonzero(reg == 0))
        if zeros:
            return M * np.log(M / zeros)  # linear counting
    return float(e)


def hll_distinct_tokens(ds, text_col: str = "text") -> dict:
    """Approximate distinct-token count over a text column.

    Returns ``{"estimate": float, "registers": bytes}``.  One streaming
    pass; the driver folds ``n_blocks`` 4-KiB rows.
    """
    from .dsir import _tokens_from_batch

    def partial(t: pa.Table) -> pa.Table:
        _, toks = _tokens_from_batch(t, text_col)
        reg = sketch_values(np.unique(toks) if len(toks) else toks)
        return pa.table({"sketch": pa.array([reg.tobytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    reg = merge_sketches(r["sketch"] for r in rows)
    return {"estimate": estimate(reg), "registers": reg.tobytes()}


def hll_distinct_by_group(ds, group_col: str, value_col: str):
    """Approximate distinct ``value_col`` per ``group_col`` group.

    Per-batch per-group partial sketches -> ONE group-keyed exchange of
    4-KiB rows (groups x blocks, never values) -> elementwise-max merge
    per group.  Returns a pandas DataFrame (group, estimate) — group
    cardinality is assumed driver-sized (event types, languages).
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t[group_col].to_numpy(zero_copy_only=False),
                "v": t[value_col].to_numpy(zero_copy_only=False),
            }
        )
        groups, sketches = [], []
        for g, sub in df.groupby("g", sort=False):
            groups.append(g)
            sketches.append(sketch_values(sub["v"].unique()).tobytes())
        return pa.table(
            {group_col: pa.array(groups), "sketch": pa.array(sketches, pa.binary())}
        )

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        reg = merge_sketches(df["sketch"].tolist())
        return pd.DataFrame(
            {group_col: [df[group_col].iloc[0]], "estimate": [estimate(reg)]}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(group_col, ignore_index=True)
