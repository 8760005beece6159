"""N-gram language-model training + perplexity scoring (CCNet-style).

CCNet (Wenzek et al. 2020) ranks web documents for LM training by the
perplexity of a small n-gram model; this module is that pipeline shape on
Ray Data, with a bigram model small enough to broadcast:

* ``train_bigram_lm``   — distributed counting: per-batch partial
  (w1, w2, c) counts (pandas hash-groupby inside ``map_batches``, so the
  exchange moves AGGREGATED rows, never raw token pairs) followed by one
  ``groupby(w1, w2).sum`` — the only shuffle, sized by vocabulary not
  corpus.  Vocab size V = count of distinct unigrams (``Dataset.unique``).
* ``BigramScorer``      — actor-pool scoring stage: the trained model is
  ``ray.put`` once and resolved per actor in ``__init__`` (never re-shipped
  per batch); each batch vectorizes pair extraction + two pandas hash-join
  lookups + one numpy log.

Exactness: the per-pair log-probability is rounded to integer MILLI-nats
(``floor(ln(p)*1000 + 0.5)``) BEFORE summation, so per-doc totals are
order-independent integer sums that a DuckDB oracle can hash-match (the
same per-element-rounding rule the money aggregates use).  ``p`` itself is
one IEEE division of exact small integers — bit-identical in any engine;
only ``ln`` can differ (<=1 ulp), and the milli scale makes a floor flip
astronomically unlikely.

Model: add-one-smoothed bigram conditional
``P(w2|w1) = (c(w1,w2) + 1) / (c1(w1) + V)`` where ``c1`` counts w1 as the
LEFT element of corpus bigrams and V is the distinct-unigram count;
unseen (w1, w2) and unseen w1 degrade smoothly to ``1/(c1+V)`` and
``1/V``.  Tokens are lowercased whitespace tokens (the ws-token
definition proven SQL-identical by ``token_totals``).

At 100 TB: the model table is vocabulary-sized, not corpus-sized; cap it
with ``max_bigrams`` (keep the most frequent, count-desc then key-asc) and
the drop is LOGGED — scoring semantics stay total because missing entries
are exactly the smoothed-unseen case.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)


def _pairs_from_batch(
    batch: pa.Table, text_col: str
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (doc_index, w1, w2) extraction: lowercase ws-tokens,
    consecutive same-document pairs."""
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.utf8_lower(pc.fill_null(txt, ""))
    ws = pc.split_pattern_regex(txt, r"\s+")
    flat = pc.list_flatten(ws)
    par = pc.list_parent_indices(ws).to_numpy(zero_copy_only=False)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    toks = flat.to_pandas().to_numpy()[nonempty]
    tpar = par[nonempty]
    if len(toks) < 2:
        e = np.array([], object)
        return np.array([], np.int64), e, e
    mask = tpar[1:] == tpar[:-1]
    return tpar[:-1][mask], toks[:-1][mask], toks[1:][mask]


def train_bigram_lm(
    ds,
    *,
    text_col: str = "text",
    max_bigrams: Optional[int] = None,
) -> dict:
    """Count bigrams + unigram vocab over a Dataset of documents.

    Returns ``{"bigrams": DataFrame[w1, w2, c2], "lefts":
    DataFrame[w1, c1], "vocab_size": int}`` — the broadcastable model.
    """
    from ray.data.aggregate import Sum

    def partial_counts(t: pa.Table) -> pa.Table:
        _, w1, w2 = _pairs_from_batch(t, text_col)
        if len(w1) == 0:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        df = (
            pd.DataFrame({"w1": w1, "w2": w2})
            .groupby(["w1", "w2"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    bigrams = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c2"))
        .to_pandas()
    )

    def distinct_tokens(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.utf8_lower(pc.fill_null(txt, ""))
        flat = pc.list_flatten(pc.split_pattern_regex(txt, r"\s+"))
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return pa.table({"tok": pc.unique(flat)})

    vocab_size = len(ds.map_batches(distinct_tokens, batch_format="pyarrow").unique("tok"))

    if max_bigrams is not None and len(bigrams) > max_bigrams:
        bigrams = bigrams.sort_values(
            ["c2", "w1", "w2"], ascending=[False, True, True], ignore_index=True
        )
        dropped = len(bigrams) - max_bigrams
        logger.warning(
            "bigram LM capped at %d entries: dropping %d rarest bigrams "
            "(they score as smoothed-unseen)", max_bigrams, dropped,
        )
        bigrams = bigrams.iloc[:max_bigrams].reset_index(drop=True)

    lefts = bigrams.groupby("w1", sort=False)["c2"].sum().reset_index(name="c1")
    return {"bigrams": bigrams, "lefts": lefts, "vocab_size": int(vocab_size)}


class BigramScorer:
    """Actor-pool scoring stage: model resolved from the object store once
    per actor; per batch two vectorized hash-join lookups + one numpy log.

    Emits exact-integer columns per document: ``n_pairs`` and ``ll_milli``
    (sum of per-pair milli-nat log-probs, see module docstring).
    """

    def __init__(self, model_ref, id_col: str = "doc_id", text_col: str = "text"):
        import ray

        model = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.bigrams = model["bigrams"].set_index(["w1", "w2"])["c2"]
        self.lefts = model["lefts"].set_index("w1")["c1"]
        self.v = float(model["vocab_size"])
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        par, w1, w2 = _pairs_from_batch(batch, self.text_col)
        n_pairs = np.bincount(par, minlength=n).astype(np.int64)
        ll_milli = np.zeros(n, np.int64)
        if len(w1):
            idx = pd.MultiIndex.from_arrays([w1, w2])
            c2 = self.bigrams.reindex(idx).fillna(0).to_numpy(np.float64)
            c1 = self.lefts.reindex(pd.Index(w1)).fillna(0).to_numpy(np.float64)
            p = (c2 + 1.0) / (c1 + self.v)
            ll = np.floor(np.log(p) * 1000.0 + 0.5).astype(np.int64)
            ll_milli = np.bincount(par, weights=ll, minlength=n).astype(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_pairs": pa.array(n_pairs),
                "ll_milli": pa.array(ll_milli),
            }
        )


def perplexity_profile(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bigrams: Optional[int] = None,
    concurrency: int = 4,
):
    """Train on ``ds`` and score every document of ``ds`` (self-scoring —
    the CCNet shape trains on a reference slice; pass a different Dataset
    to ``train_bigram_lm`` for that).  Returns a Dataset of
    ``(doc_id, n_pairs, ll_milli)``."""
    import ray

    model = train_bigram_lm(ds, text_col=text_col, max_bigrams=max_bigrams)
    ref = ray.put(model)
    return ds.map_batches(
        BigramScorer,
        fn_constructor_kwargs={"model_ref": ref, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        # autoscaling pool with min=1: a fixed pool equal to the CPU count
        # deadlocks a small cluster (actors hold every CPU the upstream
        # read needs) — the (1, N) range lets Ray size it to free slots
        concurrency=(1, concurrency),
    )
