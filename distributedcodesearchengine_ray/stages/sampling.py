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


def temperature_sample(
    ds,
    total_num: int,
    total_den: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
):
    """EXACT temperature/alpha-sampled stratum mixture (the mT5 / T5
    multilingual-mix recipe, alpha = 0.5): the overall budget ``T =
    N * total_num // total_den`` docs is split across strata
    proportionally to ``sqrt(n_s)`` — upsampling the tail relative to
    raw proportions — and each stratum contributes EXACTLY its integer
    target (never a Bernoulli approximation): the ``target_s`` rows
    with the smallest ``(hash_u32(id), id)`` keys.

    Integer-exact on both engines: weights are micro-rounded
    ``floor(sqrt(n)*1e6 + 0.5)`` (sqrt is IEEE-correctly-rounded, all
    arithmetic after it is int64), targets are floor divisions, and
    selection keys are the int64 multiplicative hash with the SQL twin
    ``hash_u32_sql``.

    Scale shape — three bounded passes, no corpus exchange:

    - pass A: per-block (stratum, h >> shift) bucket-count partials ->
      one groupby over a <= strata x ``n_buckets`` domain; the driver
      derives per-stratum counts, weights, targets, and the coarse
      bucket holding each stratum's rank-``target`` cut;
    - pass B: collect ONLY the cut buckets' (stratum, h, id) rows
      (~N / n_buckets rows total) and resolve each stratum's exact
      threshold pair on the driver;
    - pass C: stateless map-side filter ``(h, id) <= cut`` +
      per-stratum audit partials -> one tiny groupby.

    Returns a pyarrow Table audit: (stratum, n_in, weight, target,
    n_selected, sel_id_sum) sorted by stratum — ``n_selected ==
    target`` by construction, and ``sel_id_sum`` is the int64 checksum
    of the selected ids so the oracle comparison pins membership, not
    just counts.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    shift = 32 - int(np.log2(n_buckets))

    def bucket_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = hash_u32(ids)
        g = (
            pd.DataFrame({"s": t[stratum_col].to_numpy(zero_copy_only=False),
                          "b": (h >> shift).astype(np.int64)})
            .groupby(["s", "b"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.table(
            {
                "s": pa.array(g["s"], pa.string()),
                "b": pa.array(g["b"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    hist = (
        ds.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby(["s", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["s", "b"], ignore_index=True)
    )
    n_s = hist.groupby("s")["n"].sum().astype(np.int64)
    strata = sorted(n_s.index)
    n_total = int(n_s.sum())
    weights = {s: int(np.floor(np.sqrt(float(n_s[s])) * 1_000_000 + 0.5))
               for s in strata}
    w_total = sum(weights.values())
    T = n_total * total_num // total_den
    targets = {s: min(int(n_s[s]), T * weights[s] // w_total) for s in strata}

    # coarse bucket containing each stratum's rank-target cut
    cut_bucket, rank_in_bucket = {}, {}
    for s in strata:
        tgt = targets[s]
        if tgt <= 0 or tgt >= int(n_s[s]):
            continue  # select-none / select-all need no threshold
        sub = hist[hist["s"] == s]
        cum = sub["n"].cumsum().to_numpy(np.int64)
        i = int(np.searchsorted(cum, tgt))
        cut_bucket[s] = int(sub["b"].iloc[i])
        rank_in_bucket[s] = tgt - (int(cum[i - 1]) if i > 0 else 0)

    cut_ref = ray.put(cut_bucket)

    def in_cut_bucket(t: pa.Table) -> pa.Table:
        cuts = ray.get(cut_ref)
        strata_col = t[stratum_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = hash_u32(ids)
        b = (h >> shift).astype(np.int64)
        # vectorized stratum -> cut-bucket lookup (a per-row Python
        # dict.get would dominate this corpus-scale pass)
        want = (
            pd.Series(strata_col).map(cuts).fillna(-1).to_numpy(np.int64)
        )
        keep = b == want
        return pa.table(
            {
                "s": pa.array(strata_col[keep], pa.string()),
                "h": pa.array(h[keep]),
                "i": pa.array(ids[keep].astype(np.int64)),
            }
        )

    cuts_exact = {}
    if cut_bucket:
        tiny = ds.map_batches(in_cut_bucket, batch_format="pyarrow").to_pandas()
        for s, grp in tiny.groupby("s"):
            grp = grp.sort_values(["h", "i"], ignore_index=True)
            r = rank_in_bucket[s]
            row = grp.iloc[r - 1]
            cuts_exact[s] = (int(row["h"]), int(row["i"]))

    sel_ref = ray.put((cuts_exact, targets, {s: int(n_s[s]) for s in strata}))

    def select_partial(t: pa.Table) -> pa.Table:
        cuts, tgt, ns = ray.get(sel_ref)
        strata_col = t[stratum_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash_u32(ids)
        keep = np.zeros(len(ids), dtype=bool)
        for s in np.unique(strata_col):
            m = strata_col == s
            if tgt.get(s, 0) >= ns.get(s, 0):
                keep |= m  # select-all stratum
            elif s in cuts:
                hc, ic = cuts[s]
                keep |= m & ((h < hc) | ((h == hc) & (ids <= ic)))
        g = (
            pd.DataFrame({"s": strata_col[keep], "i": ids[keep]})
            .groupby("s", as_index=False)
            .agg(n_sel=("i", "size"), id_sum=("i", "sum"))
        )
        return pa.table(
            {
                "s": pa.array(g["s"], pa.string()),
                "n_sel": pa.array(g["n_sel"].to_numpy(np.int64)),
                "id_sum": pa.array(g["id_sum"].to_numpy(np.int64)),
            }
        )

    if any(targets[s] > 0 for s in strata):
        sel = (
            ds.map_batches(select_partial, batch_format="pyarrow")
            .groupby("s")
            .aggregate(Sum("n_sel", alias_name="n_sel"),
                       Sum("id_sum", alias_name="id_sum"))
            .to_pandas()
            .set_index("s")
        )
    else:  # zero budget: nothing to scan (and all-empty blocks would
        # reach the groupby schema-less)
        sel = pd.DataFrame({"n_sel": [], "id_sum": []})
    return pa.table(
        {
            stratum_col: pa.array(strata, pa.string()),
            "n_in": pa.array([int(n_s[s]) for s in strata], pa.int64()),
            "weight": pa.array([weights[s] for s in strata], pa.int64()),
            "target": pa.array([targets[s] for s in strata], pa.int64()),
            "n_selected": pa.array(
                [int(sel["n_sel"].get(s, 0)) for s in strata], pa.int64()
            ),
            "sel_id_sum": pa.array(
                [int(sel["id_sum"].get(s, 0)) for s in strata], pa.int64()
            ),
        }
    )
