"""Two-pass exact heavy hitters over a token stream.

The scale pattern for "which terms exceed x% of all occurrences" that
never shuffles the full vocabulary:

- pass 1 (candidates): each block computes its EXACT local counts
  (``np.unique`` on the block's tokens — a block fits in memory by
  construction) and keeps only terms with ``f_b * denominator > n_b``.
  Pigeonhole guarantees completeness: if a term's global count satisfies
  ``f * denominator > N`` then some block must have
  ``f_b * denominator > n_b`` (otherwise summing the per-block bounds
  contradicts the global one), so the union of per-block local heavy
  hitters is a superset of the global ones.  Per-block output is at most
  ``denominator`` terms — driver-sized no matter how large the corpus.
- pass 2 (exact recount): the candidate set is broadcast once via
  ``ray.put`` and every block emits exact counts for candidates only
  (vectorized ``is_in``); the driver sums ``candidates x blocks`` tiny
  partials and applies the global threshold with INTEGER arithmetic
  (``count * denominator > N`` — no float boundary).

Contrast with ``term_df_top100``'s full ``groupby(term)``: that is exact
for arbitrary k but moves every distinct term through an all-to-all
exchange; this sketch answers the frequency-threshold question with two
narrow map passes and a driver-side merge.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def _flat_tokens(t: pa.Table, text_col: str, tokenize_batch) -> np.ndarray:
    toks = tokenize_batch(t[text_col])
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return np.asarray(toks.values.to_numpy(zero_copy_only=False), dtype=object)


def exact_heavy_hitters(
    ds,
    denominator: int = 1000,
    text_col: str = "text",
    tokenize_batch: Optional[Callable] = None,
) -> pa.Table:
    """All terms with ``count * denominator > total_tokens``, exact counts.

    ``tokenize_batch`` maps a string Array/ChunkedArray to a list<string>
    array (defaults to the code-aware tokenizer).  Returns (term,
    n_occurrences) sorted by (count desc, term asc).
    """
    import ray

    if tokenize_batch is None:
        from ..functions.tokenizer import tokenize_array

        tokenize_batch = tokenize_array

    def local_heavy(t: pa.Table) -> pa.Table:
        flat = _flat_tokens(t, text_col, tokenize_batch)
        n_b = len(flat)
        if n_b == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64()),
                 "n_block": pa.array([], pa.int64())}
            )
        terms, counts = np.unique(flat, return_counts=True)
        keep = counts * denominator > n_b
        # one extra row (term=None) carries the block's token total so a
        # single pass yields both candidates and N
        return pa.table(
            {
                "term": pa.array(list(terms[keep]) + [None], pa.string()),
                "cnt": pa.array(
                    np.concatenate([counts[keep], [0]]).astype(np.int64)
                ),
                "n_block": pa.array(
                    np.concatenate([np.zeros(int(keep.sum()), np.int64), [n_b]])
                ),
            }
        )

    pass1 = (
        ds.select_columns([text_col])
        .map_batches(local_heavy, batch_format="pyarrow")
        .to_pandas()
    )
    if len(pass1) == 0:
        # every block tokenized to nothing; Ray's to_pandas drops the
        # schema of an all-empty dataset, so bail before column access
        return pa.table(
            {"term": pa.array([], pa.string()), "n_occurrences": pa.array([], pa.int64())}
        )
    total = int(pass1["n_block"].sum())
    candidates = sorted(set(pass1["term"].dropna()))
    if not candidates or total == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "n_occurrences": pa.array([], pa.int64())}
        )
    cand_ref = ray.put(np.asarray(candidates, dtype=object))

    def recount(t: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        flat = _flat_tokens(t, text_col, tokenize_batch)
        if len(flat) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        s = pd.Series(flat)
        vc = s[s.isin(cand)].value_counts()
        return pa.table(
            {
                "term": pa.array(vc.index.to_numpy(), pa.string()),
                "cnt": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    partials = (
        ds.select_columns([text_col])
        .map_batches(recount, batch_format="pyarrow")
        .to_pandas()
    )
    totals = partials.groupby("term", sort=False)["cnt"].sum()
    totals = totals[totals * denominator > total]
    out = totals.reset_index().rename(columns={"cnt": "n_occurrences"})
    out = out.sort_values(
        ["n_occurrences", "term"], ascending=[False, True], ignore_index=True
    )
    return pa.table(
        {
            "term": pa.array(out["term"], pa.string()),
            "n_occurrences": pa.array(out["n_occurrences"], pa.int64()),
        }
    )


def exact_quantiles(
    ds,
    qs,
    value_col: str,
) -> pa.Table:
    """Exact discrete quantiles of an integer column without sorting it.

    The bounded-domain pattern: quantiles of a column whose DISTINCT
    value set is small (token counts, lengths, ratings — anything
    integer-ish) never need a distributed sort.  Each block emits its
    exact local (value, count) histogram (``np.unique`` — at most
    ``distinct(domain)`` rows per block, independent of block row
    count); the driver merges the partials, builds the global CDF, and
    reads each quantile off it by rank.

    Rank semantics mirror DuckDB's ``quantile_disc``: the element at
    1-indexed rank ``max(1, ceil(q * N))`` of the sorted column —
    verified empirically so the SQL oracle is exact, not approximate.

    Returns (q_micro, value): one row per requested quantile, with q
    encoded as ``floor(q * 1e6 + 0.5)`` so the schema is float-free.
    """

    def local_hist(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, counts = np.unique(vals, return_counts=True)
        return pa.table(
            {
                "val": pa.array(uniq, pa.int64()),
                "cnt": pa.array(counts.astype(np.int64)),
            }
        )

    partials = (
        ds.select_columns([value_col])
        .map_batches(local_hist, batch_format="pyarrow")
        .to_pandas()
    )
    merged = partials.groupby("val", sort=True)["cnt"].sum()
    values = merged.index.to_numpy(dtype=np.int64)
    cum = merged.to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))  # 1-indexed, q=0 -> min
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(int(np.floor(q * 1e6 + 0.5)))
        out_v.append(int(values[idx]))
    return pa.table(
        {
            "q_micro": pa.array(out_q, pa.int64()),
            "value": pa.array(out_v, pa.int64()),
        }
    )


def exact_quantiles_by_key(
    ds,
    qs,
    value_col: str,
    key_col: str,
) -> pa.Table:
    """Per-group exact discrete quantiles — the grouped form of
    ``exact_quantiles``, same bounded-integer-domain pattern.

    Each block emits its exact local (key, value, count) histogram;
    the partials are merged per (key, value) on the driver (at most
    ``groups x distinct(domain)`` rows — tiny next to the data), one
    CDF per key, ranks read with ``quantile_disc`` semantics
    (1-indexed rank ``max(1, ceil(q * N_key))``).

    Returns (key, q_micro, value) sorted by (key, q_micro).  Never
    sorts or shuffles the data itself: the only exchange is the
    histogram partial collection, whose size is independent of row
    count.
    """

    def local_hist(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"key": keys, "val": vals})
        g = df.groupby(["key", "val"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                "key": pa.array(g["key"]),
                "val": pa.array(g["val"], pa.int64()),
                "cnt": pa.array(g["cnt"], pa.int64()),
            }
        )

    partials = (
        ds.select_columns([key_col, value_col])
        .map_batches(local_hist, batch_format="pyarrow")
        .to_pandas()
    )
    out_k, out_q, out_v = [], [], []
    for key, grp in partials.groupby("key", sort=True):
        merged = grp.groupby("val", sort=True)["cnt"].sum()
        values = merged.index.to_numpy(dtype=np.int64)
        cum = merged.to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1]) if len(cum) else 0
        for q in qs:
            rank = max(1, int(np.ceil(q * n)))
            idx = int(np.searchsorted(cum, rank, side="left"))
            out_k.append(key)
            out_q.append(int(np.floor(q * 1e6 + 0.5)))
            out_v.append(int(values[idx]))
    return pa.table(
        {
            key_col: pa.array(out_k),
            "q_micro": pa.array(out_q, pa.int64()),
            "value": pa.array(out_v, pa.int64()),
        }
    )
