"""Embedding stage: actor-pool ``map_batches`` over entity docmeta.

The stage shape matches the reference's transformer embedder (ST1,
/root/reference/codesearch/embeddings/generator.py:59-207): state (model /
tokenizer — here the deterministic mock) constructed ONCE per actor in
``__init__``, batched encode in ``__call__``.  Swapping in a real
SentenceTransformer is a one-class change; the Ray-side plumbing (schema,
concurrency, batch size) stays identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.embed import mock_embed_batch, searchable_text


class MockEmbedStage:
    """Callable class for ``map_batches(MockEmbedStage, concurrency=N)``."""

    def __init__(self, dim: int = 768, text_column: str = "__searchable__"):
        self.dim = dim
        self.text_column = text_column

    def _texts(self, batch: pa.Table):
        if self.text_column in batch.column_names:
            return batch[self.text_column].to_pylist()
        # entity docmeta: build the M9 searchable-text projection
        cols = {
            c: batch[c].to_pylist() if c in batch.column_names else [None] * len(batch)
            for c in (
                "name", "entity_type", "signature", "parameters",
                "docstring", "return_type", "parent_class",
            )
        }
        return [
            searchable_text(
                cols["name"][i] or "",
                cols["entity_type"][i],
                cols["signature"][i],
                cols["parameters"][i],
                cols["docstring"][i],
                cols["return_type"][i],
                cols["parent_class"][i],
            )
            for i in range(len(batch))
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = mock_embed_batch(self._texts(batch), self.dim)
        emb_col = pa.FixedSizeListArray.from_arrays(
            pa.array(embs.reshape(-1), pa.float32()), self.dim
        )
        keep = [
            c
            for c in ("doc_id", "lang", "entity_type", "repo_name")
            if c in batch.column_names
        ]
        out = batch.select(keep) if keep else batch
        if "lang" in out.column_names:  # filterable as "language" downstream
            out = out.rename_columns(
                [c if c != "lang" else "language" for c in out.column_names]
            )
        return out.append_column("embedding", emb_col)


def build_embeddings(index_dir: str, dim: int = 768, concurrency: int = 4) -> str:
    """Embed every indexed entity -> ``index_dir/embeddings`` parquet."""
    import os

    import ray.data as rd

    out_dir = os.path.join(index_dir, "embeddings")
    import pyarrow.dataset as pads

    avail = set(pads.dataset(os.path.join(index_dir, "docmeta"), format="parquet").schema.names)
    want = [
        "doc_id", "name", "entity_type", "signature", "parameters",
        "docstring", "return_type", "parent_class", "lang", "repo_name",
    ]
    ds = rd.read_parquet(
        os.path.join(index_dir, "docmeta"),
        columns=[c for c in want if c in avail],
    )
    ds.map_batches(
        MockEmbedStage(dim=dim),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    ).write_parquet(out_dir)
    return out_dir
