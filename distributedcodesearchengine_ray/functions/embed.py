"""Deterministic mock embeddings + the entity searchable-text projection.

The reference's ``MockEmbedder`` (/root/reference/codesearch/embeddings/
generator.py:210-243) — sha256(text) -> big-endian 4-byte chunks scaled to
[-1, 1], zero-padded to ``dim`` and L2-normalized — is the dependency-free
deterministic stand-in for the transformer embedder (ST1).  A real model
would slot into the same actor-pool stage (model load in ``__init__``; see
:class:`distributedcodesearchengine_ray.stages.embed_stage.MockEmbedStage`).

``searchable_text`` is the reference's embedding-text projection (M9,
/root/reference/codesearch/models.py:66-103).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np


def mock_embed_text(text: str, dim: int = 768) -> np.ndarray:
    h = hashlib.sha256(text.encode()).digest()
    n_chunks = min(len(h), dim) // 4 + (1 if min(len(h), dim) % 4 else 0)
    vals = []
    for i in range(0, min(len(h), dim), 4):
        v = int.from_bytes(h[i : i + 4], "big") / (2**32)
        vals.append(v * 2 - 1)
    emb = np.zeros(dim, dtype=np.float64)
    emb[: len(vals)] = vals
    norm = np.sqrt((emb * emb).sum())
    if norm > 0:
        emb = emb / norm
    return emb.astype(np.float32)


def mock_embed_batch(texts, dim: int = 768) -> np.ndarray:
    return np.stack([mock_embed_text(t or "", dim) for t in texts])


def searchable_text(
    name: str,
    entity_type: Optional[str],
    signature: Optional[str],
    parameters,
    docstring: Optional[str],
    return_type: Optional[str],
    parent_class: Optional[str],
) -> str:
    parts = [name]
    if entity_type in ("function", "method"):
        parts.append("function")
    elif entity_type == "class":
        parts.append("class")
    if signature:
        parts.append(signature)
    if parameters is not None and len(parameters):
        parts.append("parameters: " + " ".join(list(parameters)))
    if docstring:
        parts.append(docstring.replace('"""', "").replace("'''", "").strip())
    if return_type:
        parts.append(f"returns {return_type}")
    if parent_class:
        parts.append(f"method of {parent_class}")
    return " ".join(parts)
