"""Explicit salted-key aggregation for Zipf-skewed term keys.

The index build itself avoids term-keyed skew structurally (postings stay
partition-local; the lexicon merge sees at most one row per term per
partition — SURVEY.md §4.3).  This module provides the general salted-key
pattern for pipelines that DO need a raw term-keyed shuffle over exploded
postings (e.g. ad-hoc corpus analytics at 10^12 scale where a hot term like
``import`` would otherwise land its billions of rows on one reducer):

1. map side: emit ``(term, salt)`` composite keys, ``salt = doc_id % S``
   for hot terms (everything else salt=0) — splits a hot key into S
   uniform sub-keys;
2. first ``groupby((term, salt))`` aggregates partials per sub-key
   (bounded reducer fan-in);
3. second, tiny ``groupby(term)`` over at most S rows per hot term merges
   the sub-aggregates.

Hot terms are detected from a deterministic hash-sampled frequency sketch,
so the salting decision is identical at every parallelism level.
"""

from __future__ import annotations

from typing import List, Optional, Set

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pcc

from ..functions.tokenizer import tokenize_array


def detect_hot_terms(
    ds, text_col: str = "text", threshold: float = 0.05, sample_mod: int = 20
) -> Set[str]:
    """Terms appearing in more than ``threshold`` of (hash-sampled) docs."""
    from ray.data.aggregate import Sum

    SENTINEL = "\x00__sampled_docs__"

    def sample_partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h = pd.util.hash_array(np.asarray(texts.to_pylist(), dtype=object))
        keep = (h % sample_mod) == 0
        sub = texts.filter(pa.array(keep))
        toks = tokenize_array(sub)
        flat = pcc.list_flatten(toks)
        parents = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        df_ = pd.DataFrame({"term": flat.to_pandas(), "d": parents}).drop_duplicates()
        partial = df_.groupby("term", sort=False).size().reset_index(name="df")
        # the sampled-doc denominator travels as a sentinel row ("\x00"
        # sorts before any real token, which cannot contain control chars)
        partial = pd.concat(
            [partial, pd.DataFrame({"term": [SENTINEL], "df": [int(keep.sum())]})],
            ignore_index=True,
        )
        return pa.Table.from_pandas(partial, preserve_index=False)

    agg = (
        ds.map_batches(sample_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    total_row = agg[agg["term"] == SENTINEL]
    total = int(total_row["df"].iloc[0]) if len(total_row) else 0
    if total == 0:
        return set()
    terms = agg[agg["term"] != SENTINEL]
    return set(terms.loc[terms["df"] >= threshold * total, "term"].tolist())


def term_df_salted(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_salts: int = 8,
    hot_terms: Optional[Set[str]] = None,
):
    """Global document frequency per term via salted two-phase groupby.

    Result is identical to an unsalted ``groupby(term)`` df count (asserted
    in tests) — the salt only bounds per-reducer fan-in for hot keys.
    Returns a Dataset of (term, df).
    """
    import ray
    from ray.data.aggregate import Sum

    if hot_terms is None:
        hot_terms = detect_hot_terms(ds, text_col=text_col)
    hot_ref = ray.put(hot_terms)

    class Explode:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            toks = tokenize_array(t[text_col])
            flat = pcc.list_flatten(toks)
            parents = pcc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
            ids = t[id_col].to_numpy(zero_copy_only=False)[parents]
            df_ = pd.DataFrame({"term": flat.to_pandas(), "d": ids}).drop_duplicates()
            terms = df_["term"].to_numpy()
            is_hot = np.fromiter((x in self.hot for x in terms), dtype=bool, count=len(terms))
            salts = np.where(is_hot, df_["d"].to_numpy() % num_salts, 0).astype(np.int64)
            partial = (
                pd.DataFrame({"term": terms, "salt": salts})
                .groupby(["term", "salt"], sort=False)
                .size()
                .reset_index(name="df")
            )
            return pa.Table.from_pandas(partial, preserve_index=False)

    # phase 1: (term, salt) sub-aggregates; phase 2: <= num_salts rows/term
    return (
        ds.map_batches(Explode, batch_format="pyarrow", concurrency=(1, 2))
        .groupby(["term", "salt"])
        .aggregate(Sum("df", alias_name="df"))
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
