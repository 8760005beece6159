"""Corpus-statistics operators over the raw-token stream: per-document
TF-IDF keyword extraction and top-vocabulary PMI co-occurrence.

Both follow the one-counting-pass + broadcast-model shape the DSIR and
bigram-LM stages use (a vocabulary-sized model is the same size class
as the BM25 lexicon — broadcast once with ``ray.put``, never reshipped
per batch), and both keep every ranking quantity an INTEGER so results
are bit-stable under any parallelism and exactly SQL-reproducible:

- ``tfidf_keywords``: idf rounds to integer milli-nats per TERM
  (``floor(ln((N+1)/(df+1)) * 1000 + 0.5)``); the per-(doc, term) score
  is the int64 product ``tf * idf_milli`` — no float ever touches a
  per-row value;
- ``term_cooccurrence``: document-frequency counts are exact ints; only
  the final ≤ C(V,2) PMI values (driver-side, vocabulary-bounded) take
  a log, rounded to milli-nats with the shared convention.

Tokens are the lowercase whitespace tokenizer the dsir/lm operators
share (``regexp_split '\\s+'`` oracle definition), NOT the code-aware
BM25 tokenizer — these are corpus-analysis ops and the simple split
keeps the SQL oracle total.

Beyond-reference operators (no counterpart in
Violet0725/DistributedCodeSearchEngine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dsir import _tokens_from_batch


def _df_counts(ds, text_col: str, id_col: str) -> pd.DataFrame:
    """One exchange: per-term document frequency over ``ds``.  Per-batch
    distinct (row, term) explosion -> partial counts -> groupby(term).sum
    (the exchange carries distinct-terms-per-batch rows, not tokens)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        par, toks = _tokens_from_batch(t, text_col)
        per_doc = pd.DataFrame({"term": toks, "d": par}).drop_duplicates()
        agg = per_doc.groupby("term", sort=False).size().reset_index(name="df")
        return pa.table(
            {
                "term": pa.array(agg["term"], pa.string()),
                "df": pa.array(agg["df"].to_numpy(), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )


class _KeywordScorer:
    """Actor-pool stage: top-k (term, tf, tf*idf_milli) rows per doc."""

    def __init__(self, idf_ref, k: int, id_col: str, text_col: str):
        import ray

        self.idf = ray.get(idf_ref) if not isinstance(idf_ref, pd.Series) else idf_ref
        self.k, self.id_col, self.text_col = k, id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        par, toks = _tokens_from_batch(batch, self.text_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(toks):
            return pa.table(
                {
                    self.id_col: pa.array([], pa.int64()),
                    "kw_rank": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "score_milli": pa.array([], pa.int64()),
                }
            )
        tf = (
            pd.DataFrame({"d": par, "term": toks})
            .groupby(["d", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        # model covers the training corpus; scoring the same corpus means
        # every term resolves (reindex keeps this honest if it ever doesn't)
        idf = self.idf.reindex(tf["term"]).fillna(0).to_numpy(np.int64)
        tf["score_milli"] = tf["tf"].to_numpy(np.int64) * idf
        tf = tf.sort_values(
            ["d", "score_milli", "term"], ascending=[True, False, True],
            kind="mergesort", ignore_index=True,
        )
        top = tf.groupby("d", sort=False).head(self.k)
        rank = top.groupby("d", sort=False).cumcount() + 1
        return pa.table(
            {
                self.id_col: pa.array(ids[top["d"].to_numpy()], pa.int64()),
                "kw_rank": pa.array(rank.to_numpy(np.int64)),
                "term": pa.array(top["term"], pa.string()),
                "tf": pa.array(top["tf"].to_numpy(np.int64)),
                "score_milli": pa.array(top["score_milli"].to_numpy(np.int64)),
            }
        )


def tfidf_keywords(
    ds,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
):
    """Top-``k`` TF-IDF keywords per document.

    Returns a Dataset of ``(id_col, kw_rank 1..k, term, tf,
    score_milli)``; ties break by term ascending.  ``idf_milli =
    floor(ln((N+1)/(df+1)) * 1000 + 0.5)`` with N = corpus row count.
    """
    import ray

    n_docs = ds.count()
    df = _df_counts(ds, text_col, id_col)
    idf = pd.Series(
        np.floor(
            np.log((n_docs + 1.0) / (df["df"].to_numpy(np.float64) + 1.0)) * 1000.0
            + 0.5
        ).astype(np.int64),
        index=df["term"].to_numpy(),
    )
    ref = ray.put(idf)
    return ds.map_batches(
        _KeywordScorer,
        fn_constructor_kwargs={
            "idf_ref": ref, "k": k, "id_col": id_col, "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )


def term_cooccurrence(
    ds,
    *,
    vocab_size: int = 50,
    min_count: int = 5,
    top_n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """PMI of top-vocabulary term pairs by document co-occurrence.

    Pass 1: document frequencies (one term-keyed exchange) -> top
    ``vocab_size`` terms by (df desc, term asc) on the driver.  Pass 2:
    per-batch docs x vocab presence matrix -> one 50x50 matmul -> the
    exchange carries <= C(V,2) partial pair counts per batch.  PMI =
    ``floor(ln(N * n_ab / (df_a * df_b)) * 1000 + 0.5)`` over pairs with
    ``n_ab >= min_count``; returns the ``top_n`` pairs by (pmi desc,
    term_a, term_b) with term_a < term_b lexicographically.
    """
    from ray.data.aggregate import Sum

    n_docs = ds.count()
    df = _df_counts(ds, text_col, id_col)
    top = df.sort_values(
        ["df", "term"], ascending=[False, True], kind="mergesort"
    ).head(vocab_size)
    # lexicographic vocab order so index i<j <=> term_i < term_j
    top = top.sort_values("term", ignore_index=True)
    vocab = top["term"].to_numpy()
    vdf = top["df"].to_numpy(np.int64)
    v = len(vocab)
    vindex = pd.Index(vocab)
    iu, ju = np.triu_indices(v, k=1)

    def pair_partial(t: pa.Table) -> pa.Table:
        par, toks = _tokens_from_batch(t, text_col)
        code = vindex.get_indexer(pd.Index(toks))
        keep = code >= 0
        m = np.zeros((len(t), v), dtype=np.float32)
        m[par[keep], code[keep]] = 1.0
        c = (m.T @ m).astype(np.int64)
        n_ab = c[iu, ju]
        nz = n_ab > 0
        return pa.table(
            {
                "ia": pa.array(iu[nz].astype(np.int64)),
                "ib": pa.array(ju[nz].astype(np.int64)),
                "n_ab": pa.array(n_ab[nz]),
            }
        )

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["ia", "ib"])
        .aggregate(Sum("n_ab", alias_name="n_ab"))
        .to_pandas()
    )
    pairs = pairs[pairs["n_ab"] >= min_count]
    if len(pairs) == 0:
        return pa.table(
            {
                "term_a": pa.array([], pa.string()),
                "term_b": pa.array([], pa.string()),
                "n_ab": pa.array([], pa.int64()),
                "pmi_milli": pa.array([], pa.int64()),
            }
        )
    ia = pairs["ia"].to_numpy(np.int64)
    ib = pairs["ib"].to_numpy(np.int64)
    n_ab = pairs["n_ab"].to_numpy(np.int64)
    ratio = (n_docs * n_ab).astype(np.float64) / (vdf[ia] * vdf[ib]).astype(np.float64)
    pmi = np.floor(np.log(ratio) * 1000.0 + 0.5).astype(np.int64)
    out = pd.DataFrame(
        {"term_a": vocab[ia], "term_b": vocab[ib], "n_ab": n_ab, "pmi_milli": pmi}
    ).sort_values(
        ["pmi_milli", "term_a", "term_b"], ascending=[False, True, True],
        kind="mergesort", ignore_index=True,
    ).head(top_n)
    return pa.table(
        {
            "term_a": pa.array(out["term_a"], pa.string()),
            "term_b": pa.array(out["term_b"], pa.string()),
            "n_ab": pa.array(out["n_ab"].to_numpy(np.int64)),
            "pmi_milli": pa.array(out["pmi_milli"].to_numpy(np.int64)),
        }
    )
