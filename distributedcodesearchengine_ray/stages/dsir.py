"""DSIR-style data-selection importance weights (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Per document: ``weight = sum over tokens of log p_target(tok) - log
p_raw(tok)`` — how much more the TARGET domain's unigram LM likes the
document than the raw-corpus LM.  Pipelines keep the high-weight tail
(or Gumbel-resample by weight) to shift a 100-TB raw crawl toward a
small high-quality target domain.

Differences from the paper, chosen for oracle totality:

- features are RAW unigrams keyed by token string rather than hashed
  n-gram buckets — the model stays vocabulary-sized (the same size class
  as the BM25 lexicon and the NB/bigram models that already broadcast
  fine); hashing to 2^k buckets is a drop-in swap (replace the term key
  with ``hash(term) % 2^k``) when vocabulary outgrows broadcast, at the
  cost of the exact SQL oracle;
- both LMs are add-one smoothed over the SHARED vocabulary V (every
  distinct token in the raw corpus), so every token has a finite ratio;
- each of the two log-probs rounds to integer MILLI-NATS per token
  before the subtraction and the per-doc sum (the nbayes/lm convention)
  — totals are order-independent, bit-stable under any parallelism, and
  SQL-hashable.

Distributed shape (one counting pass + map-side scoring):

- counting: per-batch partial (term, n_raw, n_target) counts ->
  ONE vocabulary-keyed ``groupby(term).sum`` exchange (pre-aggregated,
  so the exchange carries distinct-terms-per-batch rows, not tokens);
- model: per-term milli-nat log-ratio precomputed on the driver
  (vocab-sized) + the two unseen-token constants; ``ray.put`` once;
- scoring: actor pool, model resolved in ``__init__``, vectorized
  token explode + one pandas hash-join per batch.

Beyond-reference operator (no counterpart in
Violet0725/DistributedCodeSearchEngine).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _tokens_from_batch(batch: pa.Table, text_col: str):
    """(doc_index, token) arrays: lowercase ws-tokens, empties dropped
    (the shared regexp_split '\\s+' oracle definition)."""
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.utf8_lower(pc.fill_null(txt, ""))
    ws = pc.split_pattern_regex(txt, r"\s+")
    flat = pc.list_flatten(ws)
    par = pc.list_parent_indices(ws).to_numpy(zero_copy_only=False)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    return par[nonempty], flat.to_pandas().to_numpy()[nonempty]


def train_ratio_model(ds, is_target: Callable[[pa.Table], np.ndarray], text_col="text"):
    """One counting pass over the raw corpus ``ds``.  ``is_target`` maps a
    batch to a boolean row mask selecting the target-domain rows.

    Returns dict with per-term milli-nat ratios and unseen constants.
    """

    def partial(t: pa.Table) -> pa.Table:
        par, toks = _tokens_from_batch(t, text_col)
        tgt_rows = np.asarray(is_target(t), dtype=bool)
        df = pd.DataFrame(
            {"term": toks, "n_raw": np.int64(1), "n_tgt": tgt_rows[par].astype(np.int64)}
        )
        agg = df.groupby("term", as_index=False, sort=False).sum()
        return pa.table(
            {
                "term": pa.array(agg["term"], pa.string()),
                "n_raw": pa.array(agg["n_raw"], pa.int64()),
                "n_tgt": pa.array(agg["n_tgt"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n_raw", alias_name="n_raw"), Sum("n_tgt", alias_name="n_tgt"))
        .to_pandas()
    )
    v = len(counts)
    total_raw = int(counts["n_raw"].sum())
    total_tgt = int(counts["n_tgt"].sum())

    def milli(x: np.ndarray) -> np.ndarray:
        return np.floor(np.log(x) * 1000.0 + 0.5).astype(np.int64)

    ll_tgt = milli((counts["n_tgt"].to_numpy(np.float64) + 1.0) / (total_tgt + v))
    ll_raw = milli((counts["n_raw"].to_numpy(np.float64) + 1.0) / (total_raw + v))
    return {
        "ratio": pd.Series(ll_tgt - ll_raw, index=counts["term"].to_numpy()),
        # unseen token: both sides smooth to count 0
        "unseen": int(
            milli(np.array([1.0 / (total_tgt + v)]))[0]
            - milli(np.array([1.0 / (total_raw + v)]))[0]
        ),
    }


class DSIRScorer:
    """Actor-pool stage: per-doc summed milli-nat log-ratio."""

    def __init__(self, model_ref, id_col: str = "doc_id", text_col: str = "text"):
        import ray

        model = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.ratio = model["ratio"]
        self.unseen = model["unseen"]
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        par, toks = _tokens_from_batch(batch, self.text_col)
        n_tokens = np.bincount(par, minlength=n).astype(np.int64)
        w = np.zeros(n, np.int64)
        if len(toks):
            r = (
                self.ratio.reindex(pd.Index(toks))
                .fillna(self.unseen)
                .to_numpy(np.int64)
            )
            w = np.bincount(par, weights=r, minlength=n).astype(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(n_tokens),
                "dsir_milli": pa.array(w),
            }
        )


def dsir_weights(
    ds,
    is_target: Callable[[pa.Table], np.ndarray],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
):
    """Train the target/raw ratio model on ``ds`` and score every row.
    Returns a Dataset of ``(id_col, n_tokens, dsir_milli)``."""
    import ray

    model = train_ratio_model(ds, is_target, text_col=text_col)
    ref = ray.put(model)
    return ds.map_batches(
        DSIRScorer,
        fn_constructor_kwargs={"model_ref": ref, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        # (1, N) autoscaling pool — see lm.py on the small-cluster deadlock
        concurrency=(1, concurrency),
    )
