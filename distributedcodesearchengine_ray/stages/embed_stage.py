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


def mean_pool(token_embeddings: np.ndarray, attention_mask: np.ndarray,
              normalize: bool = True) -> np.ndarray:
    """Attention-mask mean pooling over token embeddings — the exact math
    of the reference's transformers fallback (ref
    embeddings/generator.py:163-199: ``sum(emb * mask_expanded, 1) /
    clamp(mask_sum, min=1e-9)`` then optional L2 normalize), expressed in
    numpy (each torch op maps 1:1: unsqueeze/expand -> broadcasting,
    torch.clamp -> np.maximum, F.normalize -> divide by row norm)."""
    emb = np.asarray(token_embeddings, dtype=np.float32)  # (B, T, H)
    mask = np.asarray(attention_mask, dtype=np.float32)[..., None]  # (B, T, 1)
    summed = (emb * mask).sum(axis=1)  # (B, H)
    counts = np.maximum(mask.sum(axis=1), 1e-9)  # (B, 1)
    pooled = summed / counts
    if normalize:
        norms = np.linalg.norm(pooled, axis=1, keepdims=True)
        pooled = pooled / np.maximum(norms, 1e-12)
    return pooled.astype(np.float32)


class TransformersFallbackModel:
    """The reference's raw-transformers fallback (ref
    embeddings/generator.py:103-123 load, :163-199 encode) wrapped in the
    two-method sentence-transformers surface so
    ``SentenceTransformerEmbedStage`` can hold either interchangeably:
    tokenize (padding / truncation / max_length=512) -> forward ->
    attention-mask mean pooling -> optional L2 normalize.

    ``tokenizer`` / ``model`` are injectable (any pair where
    ``tokenizer(texts, ...)`` yields ``input_ids`` / ``attention_mask``
    and ``model(**encoded)`` yields an object with
    ``last_hidden_state``), so the pooling path executes for real in
    torch-free environments; with genuine HuggingFace objects the
    forward pass runs under ``torch.no_grad()`` and tensors convert via
    ``.detach().cpu().numpy()``."""

    def __init__(self, tokenizer, model, hidden_size: int | None = None):
        self.tokenizer = tokenizer
        self.model = model
        self._hidden = int(
            hidden_size
            if hidden_size is not None
            else model.config.hidden_size
        )

    def get_sentence_embedding_dimension(self) -> int:
        return self._hidden

    @staticmethod
    def _to_numpy(x):
        if hasattr(x, "detach"):  # torch tensor
            return x.detach().cpu().numpy()
        return np.asarray(x)

    def encode(self, texts, convert_to_numpy=True, normalize_embeddings=True,
               show_progress_bar=False):
        import contextlib

        try:
            import torch

            grad_ctx = torch.no_grad()
            encoded = self.tokenizer(
                list(texts), padding=True, truncation=True, max_length=512,
                return_tensors="pt",
            )
        except ImportError:
            grad_ctx = contextlib.nullcontext()
            encoded = self.tokenizer(
                list(texts), padding=True, truncation=True, max_length=512
            )
        with grad_ctx:
            outputs = self.model(**encoded)
        return mean_pool(
            self._to_numpy(outputs.last_hidden_state),
            self._to_numpy(encoded["attention_mask"]),
            normalize=normalize_embeddings,
        )


class SentenceTransformerEmbedStage(MockEmbedStage):
    """ST1: the REAL transformer embedder as a Ray actor-pool stage.

    Contract mirrors the reference ``CodeBERTEmbedder``
    (/root/reference/codesearch/embeddings/generator.py:59-207): model
    loaded ONCE per actor in ``__init__`` (sentence-transformers API,
    L2-normalized output), batched encode in ``__call__``, and the
    zero-vector fallback on an encode failure (generator.py:155-159).  Use
    as ``map_batches(SentenceTransformerEmbedStage, fn_constructor_kwargs=
    {"model_name": ...}, concurrency=N, num_cpus=c)``; the schema and
    downstream plumbing are identical to ``MockEmbedStage``.

    Raises ``RuntimeError`` in ``__init__`` when sentence-transformers /
    torch are not installed (the reference's error path,
    generator.py:126-130).  The ``model`` parameter injects any object
    with the two-method sentence-transformers surface (``encode`` /
    ``get_sentence_embedding_dimension``) so every part of the stage
    EXCEPT the torch forward pass — text projection, batching,
    normalize flag pass-through, the zero-vector error path, output
    schema — is exercised by skipless tests in this container; only the
    default model load stays environment-gated.
    """

    def __init__(
        self,
        model_name: str = "microsoft/codebert-base",
        device=None,
        normalize: bool = True,
        text_column: str = "__searchable__",
        model=None,
    ):
        self.model = model if model is not None else self._load_model(model_name, device)
        self.normalize = normalize
        self.dim = int(self.model.get_sentence_embedding_dimension())
        self.text_column = text_column

    @staticmethod
    def _load_model(model_name: str, device):
        # mirror the reference's two-tier load (generator.py:93-130):
        # sentence-transformers first, raw transformers + mean pooling
        # as the fallback, RuntimeError with the install hint when the
        # ML stack is absent entirely
        try:
            from sentence_transformers import SentenceTransformer

            try:
                return SentenceTransformer(model_name, device=device)
            except Exception:
                pass
            from transformers import AutoModel, AutoTokenizer

            tok = AutoTokenizer.from_pretrained(model_name)
            mdl = AutoModel.from_pretrained(model_name)
            import torch

            dev = device or ("cuda" if torch.cuda.is_available() else "cpu")
            return TransformersFallbackModel(tok, mdl.to(dev).eval())
        except ImportError as e:
            raise RuntimeError(
                "Please install: pip install sentence-transformers transformers torch"
            ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = self._texts(batch)
        try:
            embs = self.model.encode(
                texts,
                convert_to_numpy=True,
                normalize_embeddings=self.normalize,
                show_progress_bar=False,
            ).astype(np.float32)
        except Exception:
            embs = np.zeros((len(texts), self.dim), dtype=np.float32)
        emb_col = pa.FixedSizeListArray.from_arrays(
            pa.array(embs.reshape(-1), pa.float32()), self.dim
        )
        keep = [
            c for c in ("doc_id", "lang", "entity_type", "repo_name") if c in batch.column_names
        ]
        out = batch.select(keep) if keep else batch
        if "lang" in out.column_names:
            out = out.rename_columns(
                [c if c != "lang" else "language" for c in out.column_names]
            )
        return out.append_column("embedding", emb_col)


def add_lsh_bucket(batch: pa.Table, n_bits: int = 8, seed: int = 42) -> pa.Table:
    """Append the random-hyperplane LSH bucket of each (normalized)
    embedding — the build-time partition key of the ANN scale path."""
    from .annsearch import lsh_signatures

    emb = batch["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    if pa.types.is_fixed_size_list(emb.type):
        dim = emb.type.list_size
        mat = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float32).reshape(-1, dim)
    else:
        mat = np.asarray(emb.to_pylist(), dtype=np.float32)
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    sig = lsh_signatures(mat / n, n_bits, seed)
    return batch.append_column("bucket", pa.array(sig.astype(np.int64)))


def add_ivf_cell(batch: pa.Table, centroids: np.ndarray) -> pa.Table:
    """Append each (normalized) embedding's nearest-centroid id — the
    build-time partition key of the IVF scale path."""
    emb = batch["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    if pa.types.is_fixed_size_list(emb.type):
        dim = emb.type.list_size
        mat = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float32).reshape(-1, dim)
    else:
        mat = np.asarray(emb.to_pylist(), dtype=np.float32)
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    cells = np.argmax((mat / n) @ centroids.T, axis=1).astype(np.int64)
    return batch.append_column("ivf_cell", pa.array(cells))


def build_embeddings(
    index_dir: str,
    dim: int = 768,
    concurrency: int = 4,
    *,
    partition_by: str = "bucket",
    n_bits: int = 8,
    ivf_cells: int = 16,
    seed: int = 42,
    stage=None,
) -> str:
    """Embed every indexed entity -> ``index_dir/embeddings`` parquet.

    ``partition_by`` picks the ANN scale layout:

    * ``"bucket"`` (default): hive-partition by the random-hyperplane LSH
      bucket (``bucket=<id>/`` subdirs) — an approximate query probes only
      its Hamming-ball neighborhood's files.
    * ``"ivf"``: train an IVF coarse quantizer on a deterministic id-hash
      sample of the entities, persist the centroids
      (``<index_dir>/ivf_centroids.parquet``), and hive-partition by
      nearest-centroid id (``ivf_cell=<id>/``) — a query probes its
      ``n_probe`` closest cells.
    * ``"none"``: flat layout.

    Exact consumers just ``read_parquet`` the directory root; the layout is
    transparent to them.
    """
    import functools
    import os

    import pandas as pd
    import ray.data as rd

    out_dir = os.path.join(index_dir, "embeddings")
    import pyarrow.dataset as pads

    avail = set(pads.dataset(os.path.join(index_dir, "docmeta"), format="parquet").schema.names)
    want = [
        "doc_id", "name", "entity_type", "signature", "parameters",
        "docstring", "return_type", "parent_class", "lang", "repo_name",
    ]
    cols = [c for c in want if c in avail]

    def read_meta():
        return rd.read_parquet(os.path.join(index_dir, "docmeta"), columns=cols)

    def embed(ds):
        return ds.map_batches(
            stage if stage is not None else MockEmbedStage(dim=dim),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=concurrency,
        )

    out = embed(read_meta())
    if partition_by == "bucket":
        out = out.map_batches(
            functools.partial(add_lsh_bucket, n_bits=n_bits, seed=seed),
            batch_format="pyarrow",
        )
        out.write_parquet(out_dir, partition_cols=["bucket"])
    elif partition_by == "ivf":
        import pyarrow.parquet as pq

        from .annsearch import ivf_train_centroids

        # centroids from a deterministic id-hash sample of the EMBEDDED
        # entities (unbiased, parallelism-independent), persisted for query
        # time
        n_rows = read_meta().count()
        modulus = max(1, n_rows // 4096)

        def keep_sample(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(np.ascontiguousarray(ids))
            return t.filter(pa.array(h % modulus == 0))

        sample = embed(read_meta().map_batches(keep_sample, batch_format="pyarrow"))
        cent = ivf_train_centroids(sample, n_centroids=ivf_cells, seed=seed, id_column="doc_id")
        pq.write_table(
            pa.table({"cell": pa.array(range(len(cent)), pa.int64()),
                      "centroid": pa.array(list(cent.astype(np.float32)))}),
            os.path.join(index_dir, "ivf_centroids.parquet"),
        )
        out = out.map_batches(
            functools.partial(add_ivf_cell, centroids=cent), batch_format="pyarrow"
        )
        out.write_parquet(out_dir, partition_cols=["ivf_cell"])
    else:
        out.write_parquet(out_dir)
    return out_dir
