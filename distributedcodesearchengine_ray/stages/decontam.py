"""Benchmark decontamination: flag training documents that share any
word n-gram with a (small) benchmark/eval set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM /
Llama-style "13-gram overlap" decontamination, here parameterized by
``n``): every document whose text contains ANY n-gram that also appears
in the benchmark set is contaminated and must be dropped from the
training mix.

Scale shape (the part that matters at 100 TB):

- The BENCHMARK side is small by nature (eval sets are thousands of
  documents, not billions).  Its distinct n-gram set is computed with
  one distributed pass (``map_batches`` explode -> ``unique``) and
  BROADCAST once via ``ray.put`` — never a join: a corpus-sized shuffle
  against a benchmark-sized table would move 100 TB to co-locate with
  megabytes.
- The CORPUS side is one streaming ``map_batches`` pass over an
  actor pool: the gram set is fetched from the object store ONCE per
  actor in ``__init__`` (zero-copy for peers on the same node), each
  batch is exploded vectorized (shared ``_explode_distinct_ngrams``
  flat-buffer kernel from the similarity join) and membership-tested
  with a pandas hash-set ``isin``.

Exactness: grams are compared as STRINGS, so the result is exact (the
paired SQL oracle is a semi-join on the same gram definition).  For a
benchmark set too large to broadcast raw (hundreds of millions of
grams), swap the string set for a 64-bit hash set — documented scale
variant, not needed for eval-set-sized benchmarks.

Beyond-reference operator: Violet0725/DistributedCodeSearchEngine has no
decontamination step; semantics (lowercase whitespace tokens, space-joined
n-grams) match the similarity join so one oracle token definition covers
both.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .simjoin import _explode_distinct_ngrams

DEFAULT_NGRAM = 5


def benchmark_gram_refs(
    bench_ds,
    n: int = DEFAULT_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """One distributed pass over the benchmark set -> ``ray.put`` ref of
    its frozenset of distinct n-grams (small: eval-set sized)."""
    import ray

    def block_distinct(t: pa.Table) -> pa.Table:
        g = _explode_distinct_ngrams(t, n, id_col, text_col)
        return pa.table({"gram": pa.array(pd.unique(
            g["gram"].to_numpy(zero_copy_only=False)
        ))}) if len(g) else pa.table({"gram": pa.array([], pa.string())})

    # per-block distinct -> driver union: the benchmark side is
    # eval-set-sized by nature, so the union is driver-small and the
    # all-to-all a distributed unique() would pay buys nothing
    parts = bench_ds.map_batches(block_distinct, batch_format="pyarrow").to_pandas()
    grams = parts["gram"].tolist() if "gram" in parts.columns else []
    return ray.put(frozenset(grams))


class ContaminationFlagger:
    """Actor-pool stage: flag each document whose text contains any
    benchmark n-gram.  Gram set fetched once per actor in ``__init__``."""

    def __init__(
        self,
        gram_set_ref,
        n: int = DEFAULT_NGRAM,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        import ray

        self.grams = ray.get(gram_set_ref)
        self.n = n
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _explode_distinct_ngrams(t, self.n, self.id_col, self.text_col)
        if len(g) and self.grams:
            hit = pd.Series(g["gram"].to_numpy(zero_copy_only=False)).isin(self.grams)
            dirty = np.unique(g["doc_id"].to_numpy(zero_copy_only=False)[hit.to_numpy()])
        else:
            dirty = np.empty(0, dtype=np.int64)
        out = t.select([c for c in t.column_names if c != self.text_col])
        return out.append_column(
            "contaminated", pa.array(np.isin(ids, dirty).astype(np.int64))
        )


def decontaminate(
    docs_ds,
    bench_ds,
    n: int = DEFAULT_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=(1, 8),
):
    """Returns ``docs_ds`` minus ``text_col``, plus an int64
    ``contaminated`` column (1 = shares an n-gram with ``bench_ds``).
    Callers drop flagged rows with a filter; the flag is returned rather
    than pre-filtered so audits can count what was removed (no silent
    drops)."""
    ref = benchmark_gram_refs(bench_ds, n=n, id_col=id_col, text_col=text_col)
    return docs_ds.map_batches(
        ContaminationFlagger,
        fn_constructor_kwargs={
            "gram_set_ref": ref,
            "n": n,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
