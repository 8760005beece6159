"""Importance RESAMPLING on DSIR weights (the "IR" of Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

``dsir_weights`` (stages/dsir.py) scores every document; this operator
completes the paper's loop: draw a size-``n`` sample WITHOUT replacement
where the inclusion probability follows the importance weight, via the
Gumbel-top-k trick (Kool et al. 2019): ``key_i = w_i + Gumbel_i`` and
the top-``n`` keys ARE an importance-weighted sample.

Everything is deterministic and oracle-reproducible:

- the uniform draw for row ``i`` is a pure function of ``(seed, id)``:
  the first 12 hex digits of ``md5(f"{seed}:{id}")`` read as a base-16
  fraction, plus half an ulp so u is never 0 or 1.  Each term
  ``digit * 16^-k`` is a binary-exact float and the 48-bit sum is below
  the 53-bit mantissa, so numpy and SQL build bit-identical doubles
  from the same digits (same trick class as stages/shuffle.py's md5
  permutation);
- the Gumbel noise rounds to integer MILLI-nats (``floor(-ln(-ln u) *
  1000 + 0.5)``, the lm/nbayes convention) and adds to the integer
  milli-nat DSIR weight, so the ranking key is an int64 — bit-stable
  under any parallelism;
- top-``n`` is per-block top-``n`` + a driver merge over
  ``blocks x n`` rows — no global sort, no full materialization.

Beyond-reference operator (no counterpart in
Violet0725/DistributedCodeSearchEngine).
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

_HEX_DIGITS = 12  # 48 bits < float64's 53-bit mantissa: the sum is exact


def gumbel_milli(ids: np.ndarray, seed: str) -> np.ndarray:
    """Integer milli-nat Gumbel noise per id, deterministic in (seed, id).

    md5 has no vectorized kernel; the per-row loop matches
    stages/shuffle.py's documented cost profile (~1M digests/s/core).
    """
    pre = f"{seed}:".encode()
    u = np.empty(len(ids), np.float64)
    for k, i in enumerate(ids):
        d = hashlib.md5(pre + str(int(i)).encode()).hexdigest()[:_HEX_DIGITS]
        acc = 0.0
        for pos, ch in enumerate(d, start=1):
            acc += int(ch, 16) * (16.0 ** -pos)
        u[k] = acc + 0.5 * (16.0 ** -_HEX_DIGITS)
    return np.floor(-np.log(-np.log(u)) * 1000.0 + 0.5).astype(np.int64)


def gumbel_sql_expr(id_expr: str, seed: str) -> str:
    """The EXACT SQL twin of :func:`gumbel_milli` for the DuckDB oracle:
    same digits, same binary-exact fraction, same milli rounding."""
    digit = (
        "(strpos('0123456789abcdef', substr(md5('{seed}:' || CAST({id} AS VARCHAR)), {k}, 1)) - 1)"
    )
    terms = " + ".join(
        digit.format(seed=seed, id=id_expr, k=k) + f" * power(16.0, -{k})"
        for k in range(1, _HEX_DIGITS + 1)
    )
    u = f"({terms} + 0.5 * power(16.0, -{_HEX_DIGITS}))"
    return f"CAST(floor(-ln(-ln({u})) * 1000 + 0.5) AS BIGINT)"


def gumbel_topk(
    weights_ds,
    n: int,
    *,
    seed: str = "s0",
    id_col: str = "doc_id",
    weight_col: str = "dsir_milli",
):
    """Gumbel-top-k sample over a (id, integer-weight) Dataset.

    Returns a pyarrow Table ``(rank, id_col, weight_col, gumbel_milli,
    key_milli)`` of the ``n`` rows with the largest ``weight + gumbel``
    keys, rank 0-based ordered by ``(key desc, id asc)``.
    """

    def block_topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = gumbel_milli(ids, seed)
        key = w + g
        order = np.lexsort((ids, -key))[:n]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                weight_col: pa.array(w[order]),
                "gumbel_milli": pa.array(g[order]),
                "key_milli": pa.array(key[order]),
            }
        )

    # blocks x n candidate rows to the driver — n is user-facing-small
    cand = weights_ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["key_milli", id_col], ascending=[False, True], ignore_index=True
    ).head(n)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(cand), dtype=np.int64)),
            id_col: pa.array(cand[id_col].to_numpy(np.int64)),
            weight_col: pa.array(cand[weight_col].to_numpy(np.int64)),
            "gumbel_milli": pa.array(cand["gumbel_milli"].to_numpy(np.int64)),
            "key_milli": pa.array(cand["key_milli"].to_numpy(np.int64)),
        }
    )


def dsir_select(
    ds,
    is_target: Callable[[pa.Table], np.ndarray],
    n: int,
    *,
    seed: str = "s0",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """End-to-end DSIR selection: train the target/raw ratio model, score
    every row, Gumbel-top-k resample ``n`` winners."""
    from .dsir import dsir_weights

    weights = dsir_weights(ds, is_target, id_col=id_col, text_col=text_col)
    return gumbel_topk(weights, n, seed=seed, id_col=id_col)


def token_budget_select(
    ds,
    budget_num: int,
    budget_den: int,
    id_col: str = "doc_id",
    score_col: str = "score",
    count_col: str = "n_tokens",
):
    """Quality-ordered TOKEN-BUDGET corpus selection: take documents in
    (score DESC, id ASC) order until the running token total would exceed
    ``budget = total_tokens * budget_num // budget_den`` — the standard
    "best data under a token budget" selection (SlimPajama / FineWeb
    style curation), with SQL-window-exact prefix semantics.

    A global sort would be an all-to-all over every row; instead:

    - phase 1 (small exchange): ``groupby(score).sum(count)`` — one row
      per DISTINCT SCORE leaves the cluster (scores are integer-encoded
      ratios, so the histogram is bounded, e.g. <= 1001 rows for
      milli-ratios) — total tokens and the cutoff score fall out of the
      driver-side cumulative walk;
    - every doc with score > cutoff is selected by a stateless filter
      (no exchange);
    - only the CUTOFF-score group needs per-doc resolution: its docs get
      exact global prefix positions from ``pack_sequences``'s bucketed
      prefix sum (one bucket-keyed exchange over just that group), and
      survive while ``start + n <= remaining``.

    Returns a Dataset of (id_col, score_col, count_col) for the selected
    docs.  Equivalent to the SQL window ``SUM(count) OVER (ORDER BY
    score DESC, id ASC) <= budget`` — the paired oracle.
    """
    from ray.data.aggregate import Sum

    from .packing import pack_sequences

    hist = (
        ds.groupby(score_col)
        .aggregate(Sum(count_col, alias_name="__tok"))
        .to_pandas()
        .sort_values(score_col, ascending=False, ignore_index=True)
    )
    toks = hist["__tok"].to_numpy(dtype=np.int64)
    total = int(toks.sum())
    budget = total * budget_num // budget_den
    cum = np.cumsum(toks)
    # first score group whose inclusive cum exceeds the budget = cutoff
    over = np.flatnonzero(cum > budget)
    if len(over) == 0:  # everything fits
        return ds
    cut_i = int(over[0])
    cutoff = int(hist[score_col].iloc[cut_i])
    higher_sum = int(cum[cut_i - 1]) if cut_i > 0 else 0
    remaining = budget - higher_sum

    import pyarrow.compute as _pc

    full = ds.map_batches(
        lambda t: t.filter(_pc.greater(t[score_col], cutoff)),
        batch_format="pyarrow",
    )
    if remaining <= 0:
        return full
    cut_group = ds.map_batches(
        lambda t: t.filter(_pc.equal(t[score_col], cutoff)),
        batch_format="pyarrow",
    )
    packed = pack_sequences(
        cut_group, budget=max(remaining, 1), id_col=id_col, count_col=count_col
    )

    def take_prefix(t: pa.Table) -> pa.Table:
        start = t["start_tok"].to_numpy(zero_copy_only=False)
        n = t[count_col].to_numpy(zero_copy_only=False)
        keep = start + n <= remaining
        sub = t.filter(pa.array(keep))
        return pa.table(
            {
                id_col: sub[id_col],
                score_col: pa.array(
                    np.full(len(sub), cutoff, dtype=np.int64)
                ),
                count_col: sub[count_col],
            }
        )

    tail = packed.map_batches(take_prefix, batch_format="pyarrow")
    return full.select_columns([id_col, score_col, count_col]).union(tail)
