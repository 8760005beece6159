"""Sequence packing: assign documents to fixed token-budget chunks.

The operator every LLM training-data pipeline ends with: documents,
taken in a deterministic global order (``id_col``), are laid out on an
infinite token tape and cut into chunks of ``budget`` tokens; each doc
gets the chunk id and intra-chunk offset where it STARTS.  Equivalent to
the SQL window ``SUM(n_tokens) OVER (ORDER BY id ROWS UNBOUNDED
PRECEDING AND 1 PRECEDING)`` followed by integer division — which is the
paired DuckDB oracle.

A global ordered prefix sum does not fit Ray Data's unordered-blocks
model directly, so it is computed with the same two-phase pattern the
index build uses for docID assignment (build_index.py prefix sums):

- phase 1 (small exchange): per-batch partial token sums per ID-RANGE
  BUCKET (``id // bucket_width``) -> ``groupby(bucket).sum`` — the
  exchange moves ONE row per bucket, ~N/bucket_width rows total,
  driver-sized at any corpus scale;
- driver: exclusive cumsum over the sorted bucket sums -> per-bucket
  global starting offset, broadcast once via ``ray.put``;
- phase 2 (the only full-data exchange): ``groupby(bucket).map_groups``
  — sort the bucket by id, local exclusive cumsum + the bucket's
  broadcast offset = each doc's global start position.  Chunk id and
  offset are integer arithmetic from there.

Both exchanges partition by the same pure function of ``id``, so the
operator composes with upstream stages already partitioned by id range.
Docs longer than ``budget`` simply start where they start (striding
semantics); callers wanting hard truncation split upstream.

Reference scope: this is one of the beyond-reference training-data
operators (the reference engine, Violet0725/DistributedCodeSearchEngine,
has no packing step); semantics chosen to be exactly SQL-window
expressible so the driver oracle is total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_BUCKET_WIDTH = 65_536


def pack_sequences(
    ds,
    budget: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
):
    """Returns a Dataset of (id_col, count_col, chunk_id, chunk_offset,
    start_tok) — one row per input row.

    ``ds`` must already carry an integer token count per row
    (``count_col``); ids must be unique (order ties would make the
    layout nondeterministic).
    """
    import ray
    from ray.data.aggregate import Sum

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                count_col: t[count_col],
                "__bkt": pa.array(ids // bucket_width),
            }
        )

    with_bucket = ds.map_batches(add_bucket, batch_format="pyarrow")

    # phase 1: one row per id-range bucket leaves the cluster
    bucket_sums = (
        with_bucket.groupby("__bkt")
        .aggregate(Sum(count_col, alias_name="__tok"))
        .to_pandas()
        .sort_values("__bkt", ignore_index=True)
    )
    totals = bucket_sums["__tok"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])
    offset_ref = ray.put(
        dict(zip(bucket_sums["__bkt"].astype(np.int64), offsets.astype(np.int64)))
    )

    def layout_bucket(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(offset_ref)[int(df["__bkt"].iloc[0])]
        df = df.sort_values(id_col, kind="mergesort", ignore_index=True)
        counts = df[count_col].to_numpy(dtype=np.int64)
        start = base + np.concatenate([[0], np.cumsum(counts)[:-1]])
        return pd.DataFrame(
            {
                id_col: df[id_col].astype(np.int64),
                count_col: counts,
                "start_tok": start,
                "chunk_id": start // budget,
                "chunk_offset": start % budget,
            }
        )

    return (
        with_bucket.groupby("__bkt")
        .map_groups(layout_bucket, batch_format="pandas")
    )


def chunk_sliding_windows(
    batch: pa.Table,
    window: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Sliding-window long-document chunking (map_batches kernel, 1->many).

    Each doc's nonempty whitespace tokens are cut into windows of
    ``window`` tokens every ``stride`` tokens: starts 0, S, 2S, ... while
    start < n_tokens (so the tail window may be short, and empty docs
    emit nothing).  The standard context-window layout for training /
    embedding long documents with overlap; provenance carried as
    (doc_id, chunk_idx, start_tok, n_tok).

    Fully vectorized: token explode on the flat Arrow buffer, grouped
    arange index arithmetic for the window membership (no per-doc Python
    loop), one ListArray rebuild + ``binary_join`` for the chunk text.
    """
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "start_tok": pa.array([], pa.int64()),
            "n_tok": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )
    if len(batch) == 0:
        return empty
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(pc.cast(txt, pa.string()), "")
    toks = pc.utf8_split_whitespace(txt)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = np.asarray(toks.values.to_numpy(zero_copy_only=False), dtype=object)
    parents = np.repeat(
        np.arange(len(batch)),
        np.diff(toks.offsets.to_numpy(zero_copy_only=False)),
    )
    keep = flat != ""  # whitespace split keeps boundary empties
    flat, parents = flat[keep], parents[keep]
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n_tokens = np.bincount(parents, minlength=len(batch)).astype(np.int64)
    doc_start = np.concatenate([[0], np.cumsum(n_tokens)[:-1]])
    # chunks per doc: #starts s in {0, S, 2S, ...} with s < n
    n_chunks = np.where(n_tokens > 0, (n_tokens - 1) // stride + 1, 0)
    total = int(n_chunks.sum())
    if total == 0:
        return empty
    chunk_doc = np.repeat(np.arange(len(batch)), n_chunks)
    chunk_base = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    chunk_idx = np.arange(total) - chunk_base[chunk_doc]
    start = chunk_idx * stride
    n_tok = np.minimum(window, n_tokens[chunk_doc] - start)
    # flat token indices per chunk via grouped arange
    abs_start = doc_start[chunk_doc] + start
    off = np.concatenate([[0], np.cumsum(n_tok)])
    pos = np.arange(int(off[-1]))
    idx = pos - np.repeat(off[:-1], n_tok) + np.repeat(abs_start, n_tok)
    values = pa.array(flat[idx], pa.string())
    chunks = pa.ListArray.from_arrays(pa.array(off, pa.int32()), values)
    text_out = pc.binary_join(chunks, " ")
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[chunk_doc], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "n_tok": pa.array(n_tok, pa.int64()),
            "chunk_text": text_out,
        }
    )
