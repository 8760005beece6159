"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines sample and split by a PURE FUNCTION of a stable
row id — never by position or RNG state — so that reruns, resumed jobs
and differently-partitioned inputs all pick the same rows, and so a
plain-SQL oracle can reproduce the selection bit-for-bit.

The hash is Knuth multiplicative hashing kept inside int64 on purpose:

    h(id) = ((id mod 2^31) * 2654435761) mod 2^32

``id mod 2^31`` first makes the product bound 2^31 * 2654435761 < 2^63,
so the identical expression evaluates overflow-free in int64 on BOTH
sides (numpy here, DuckDB in the oracle) — no wrap-around semantics to
match.  h is uniform enough on sequential ids for rate selection (the
classic use of the golden-ratio multiplier).

Operators (all embarrassingly parallel — one vectorized map_batches, no
shuffle, nothing leaves the workers but selected rows):

- ``stratified_sample``: keep a row iff ``h(id) < rate[stratum] * 2^32``
  — per-stratum Bernoulli sampling with deterministic membership.
- ``hash_split``: label every row train/val/test from ``h(id) mod 100``
  against cumulative percentage fences.

Beyond-reference training-data operator (the reference engine has no
sampling stage); included in SURVEY §2's extension suite.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pyarrow as pa

_KNUTH = 2654435761
_MOD31 = 2**31
_MOD32 = 2**32


def hash_u32(ids: np.ndarray) -> np.ndarray:
    """The overflow-free int64 multiplicative hash (see module docs)."""
    ids = ids.astype(np.int64, copy=False)
    return ((ids % _MOD31) * _KNUTH) % _MOD32


def hash_u32_sql(col: str) -> str:
    """The identical expression in ANSI SQL (int64-safe in DuckDB)."""
    return f"(({col} % {_MOD31}) * {_KNUTH}) % {_MOD32}"


def stratified_sample(
    ds,
    rates: Dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
):
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value -> keep rate in [0, 1]; strata not
    listed use ``default_rate``.  Thresholds are precomputed as int64
    (``floor(rate * 2^32)``) so selection is integer-exact.
    """
    thresholds = {k: int(np.floor(v * _MOD32)) for k, v in rates.items()}
    default_thr = int(np.floor(default_rate * _MOD32))

    def sample(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = hash_u32(ids)
        strata = t[stratum_col].to_numpy(zero_copy_only=False)
        thr = np.full(len(t), default_thr, np.int64)
        for value, cut in thresholds.items():
            thr[strata == value] = cut
        return t.filter(pa.array(h < thr))

    return ds.map_batches(sample, batch_format="pyarrow")


def hash_split(
    ds,
    fences: Sequence[Tuple[str, int]] = (("train", 90), ("val", 95), ("test", 100)),
    id_col: str = "doc_id",
):
    """Append a ``split`` column: the first fence whose cumulative
    percentage exceeds ``h(id) mod 100``.  Fences are (label, cumulative
    percent) with the last at 100."""
    labels = [f[0] for f in fences]
    cuts = np.asarray([f[1] for f in fences], np.int64)
    if cuts[-1] != 100:
        raise ValueError("last fence must close the range at 100")

    def split(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        pct = hash_u32(ids) % 100
        idx = np.searchsorted(cuts, pct, side="right")
        return t.append_column(
            "split", pa.array(np.asarray(labels, object)[idx], pa.string())
        )

    return ds.map_batches(split, batch_format="pyarrow")
