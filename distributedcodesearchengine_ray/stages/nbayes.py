"""Multinomial Naive Bayes over a Ray Data corpus — the model-based
document-classification shape of a training-data pipeline (fasttext-style
quality/source/domain classifiers: CCNet, RefinedWeb, Dolma all gate on
one).  NB is the aggregation-only member of that family, which makes it
both honestly distributed and EXACTLY oracle-checkable:

* ``train_nb`` — per-batch partial (class, term, tf) counts (pandas
  hash-groupby inside ``map_batches``) -> one ``groupby(class, term).sum``
  sized by vocabulary x classes, plus class priors from a metadata-cheap
  count.  The model broadcasts (vocab x n_classes int64 matrix).
* ``NBScorer`` — actor-pool stage: model resolved once per actor;
  per batch one token pass + integer gather-sums.

Exactness: all log-probabilities are rounded to integer MILLI-nats per
(class, term) entry BEFORE any summation (same rule as the bigram LM /
money aggregates), so per-doc class scores are order-independent integer
sums and the argmax (tie -> lexicographically smallest class) is
bit-stable against a DuckDB oracle.

Model: add-one smoothing, ws-token features (lowercased), as in any
textbook MNB: ``score(d, c) = prior_milli(c) + sum_t tf(d,t) *
ll_milli(t, c)`` with ``ll(t, c) = ln((count(t,c) + 1) / (total(c) + V))``
and ``prior(c) = ln(docs(c) / N)``.  Unseen terms at scoring time fall
back to ``ln(1 / (total(c) + V))`` per class.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _doc_term_tf(batch: pa.Table, text_col: str):
    """(parent_doc_index, term, tf-expanded arrays): lowercased ws tokens."""
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.utf8_lower(pc.fill_null(txt, ""))
    ws = pc.split_pattern_regex(txt, r"\s+")
    flat = pc.list_flatten(ws)
    par = pc.list_parent_indices(ws).to_numpy(zero_copy_only=False)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    return flat.to_pandas().to_numpy()[keep], par[keep]


def train_nb(ds, *, label_col: str, text_col: str = "text") -> dict:
    """Count (class, term) token totals + class doc counts over ``ds``.

    Returns the broadcastable model dict: sorted ``classes``, sorted
    ``terms``, ``ll_milli`` (|terms| x |classes| int64), ``unseen_milli``
    (per-class int64 fallback), ``prior_milli`` (per-class int64)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks, par = _doc_term_tf(t, text_col)
        labels = t[label_col].to_pandas().to_numpy()
        if len(toks) == 0:
            return pa.table(
                {"cls": pa.array([], pa.string()), "term": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64()), "docs": pa.array([], pa.int64())}
            )
        df = (
            pd.DataFrame({"cls": labels[par], "term": toks})
            .groupby(["cls", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        df["docs"] = 0
        # class doc counts ride along as (cls, term="") rows
        dc = pd.DataFrame({"cls": labels}).groupby("cls", sort=False).size().reset_index(name="docs")
        dc["term"] = ""
        dc["tf"] = 0
        return pa.Table.from_pandas(
            pd.concat([df, dc[["cls", "term", "tf", "docs"]]], ignore_index=True),
            preserve_index=False,
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cls", "term"])
        .aggregate(Sum("tf", alias_name="tf"), Sum("docs", alias_name="docs"))
        .to_pandas()
    )
    doc_counts = (
        counts[counts["term"] == ""].groupby("cls")["docs"].sum().sort_index()
    )
    tok = counts[counts["term"] != ""]
    classes = sorted(doc_counts.index.tolist())
    terms = sorted(tok["term"].unique().tolist())
    v = len(terms)
    t_idx = {t: i for i, t in enumerate(terms)}
    c_idx = {c: i for i, c in enumerate(classes)}
    cnt = np.zeros((v, len(classes)), np.int64)
    cnt[
        tok["term"].map(t_idx).to_numpy(np.int64),
        tok["cls"].map(c_idx).to_numpy(np.int64),
    ] = tok["tf"].to_numpy(np.int64)
    totals = cnt.sum(axis=0)  # tokens per class
    denom = (totals + v).astype(np.float64)
    ll_milli = np.floor(
        np.log((cnt + 1.0) / denom[None, :]) * 1000.0 + 0.5
    ).astype(np.int64)
    unseen_milli = np.floor(np.log(1.0 / denom) * 1000.0 + 0.5).astype(np.int64)
    n_docs = int(doc_counts.sum())
    prior_milli = np.floor(
        np.log(doc_counts.to_numpy(np.float64)[ [c_idx[c] for c in doc_counts.index] ] / n_docs)
        * 1000.0 + 0.5
    ).astype(np.int64)
    return {
        "classes": classes,
        "terms": terms,
        "ll_milli": ll_milli,
        "unseen_milli": unseen_milli,
        "prior_milli": prior_milli,
    }


class NBScorer:
    """Actor-pool scoring stage: per-doc integer class scores + argmax
    (tie -> lexicographically smallest class = lowest index)."""

    def __init__(self, model_ref, id_col: str = "doc_id", text_col: str = "text"):
        import ray

        model = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.classes: List[str] = model["classes"]
        self.t_idx: Dict[str, int] = {t: i for i, t in enumerate(model["terms"])}
        self.ll = model["ll_milli"]
        self.unseen = model["unseen_milli"]
        self.prior = model["prior_milli"]
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        toks, par = _doc_term_tf(batch, self.text_col)
        scores = np.tile(self.prior, (n, 1)).astype(np.int64)
        if len(toks):
            idx = pd.Series(toks).map(self.t_idx)
            seen = idx.notna().to_numpy()
            rows = self.ll[idx.to_numpy(np.float64, na_value=-1).astype(np.int64)[seen]]
            np.add.at(scores, par[seen], rows)
            if (~seen).any():
                np.add.at(
                    scores, par[~seen], np.tile(self.unseen, ((~seen).sum(), 1))
                )
        pred_i = scores.argmax(axis=1)  # first max = smallest class index
        cls_arr = np.asarray(self.classes, object)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "pred": pa.array(cls_arr[pred_i], pa.string()),
                "score_milli": pa.array(scores[np.arange(n), pred_i]),
            }
        )


def classify(
    ds,
    *,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
):
    """Train on ``ds`` and score every row of ``ds`` (self-scoring; pass a
    different training Dataset to ``train_nb`` for held-out use)."""
    import ray

    model = train_nb(ds, label_col=label_col, text_col=text_col)
    ref = ray.put(model)
    return ds.map_batches(
        NBScorer,
        fn_constructor_kwargs={"model_ref": ref, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        # autoscaling pool with min=1: a fixed pool equal to the CPU count
        # deadlocks a small cluster (actors hold every CPU the upstream
        # read needs) — the (1, N) range lets Ray size it to free slots
        concurrency=(1, concurrency),
    )
