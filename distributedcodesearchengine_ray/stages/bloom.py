"""Distributed Bloom-filter semi-join (the scale path for EXISTS joins).

At 100 TB the probe side of a semi-join is the whole corpus; shuffling it
on the join key is an all-to-all exchange of every probe row.  When the
build side's distinct-key set fits a bitmap (1e9 keys at ~10 bits/key is
~1.2 GiB — broadcastable), a Bloom filter pruned MAP-SIDE cuts the probe
volume to ``|matches| + fp_rate * |rest|`` BEFORE the exchange, so the
exact verify join moves roughly the match set instead of the corpus.

The final result is EXACT: a Bloom filter has false positives but never
false negatives, and the verify stage (the same tag-and-union groupby the
plain semi-join uses, e.g. ``queries.orders_with_returns``) removes the
false positives.  The filter itself is deterministic — splitmix64 double
hashing (Kirsch-Mitzenmacher 2006: ``h_i = h1 + i*h2``), no RNG — so
results are independent of partitioning and retries.

Build-side exchange: NONE.  Each block emits one fixed-size partial bitmap
(``n_bits/8`` bytes); the driver ORs them (a tree-reduce via Ray tasks is a
drop-in if block count × bitmap size ever dominates — at 4096 blocks ×
1 MiB that fold is 4 GiB of sequential ORs, still driver-feasible, and the
object store holds the only broadcast copy after ``ray.put``).

Reference parity: the reference resolves EXISTS-shaped lookups through its
BM25/Qdrant stores (J3/J4, SURVEY §2.4); this stage is the generic
relational counterpart sized for the 100-TB tier.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)
_H2_SALT = np.uint64(0xD6E8FEB86659FD93)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    with np.errstate(over="ignore"):
        x = (x + _MIX1).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * _MIX2).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * _MIX3).astype(np.uint64)
        return x ^ (x >> np.uint64(31))


def _hash_pair(keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(h1, h2) per key; h2 forced odd so the double-hash probe sequence
    cycles the whole table for power-of-two sizes."""
    x = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(x)
    h2 = _splitmix64(x ^ _H2_SALT) | np.uint64(1)
    return h1, h2


def _bit_positions(keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    h1, h2 = _hash_pair(keys)
    nb = np.uint64(n_bits)
    with np.errstate(over="ignore"):
        idx = np.stack([(h1 + np.uint64(i) * h2) % nb for i in range(k)])
    return idx  # shape (k, n)


def bloom_insert(bitmap: np.ndarray, keys: np.ndarray, n_bits: int, k: int) -> None:
    """Set the k bit positions for every key into ``bitmap`` (uint64 words)."""
    idx = _bit_positions(keys, n_bits, k).ravel()
    words = (idx >> np.uint64(6)).astype(np.int64)
    bits = (np.uint64(1) << (idx & np.uint64(63))).astype(np.uint64)
    np.bitwise_or.at(bitmap, words, bits)


def bloom_contains(bitmap: np.ndarray, keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """Boolean maybe-member mask (no false negatives)."""
    idx = _bit_positions(keys, n_bits, k)
    words = (idx >> np.uint64(6)).astype(np.int64)
    bits = (np.uint64(1) << (idx & np.uint64(63))).astype(np.uint64)
    hit = (bitmap[words] & bits) != 0
    return hit.all(axis=0)


def build_bloom(ds, column: str, n_bits: int = 1 << 20, k: int = 5) -> np.ndarray:
    """One streaming pass over the build side: per-block partial bitmaps
    (one ``n_bits/8``-byte row each), OR-folded on the driver.

    ``n_bits`` sizing: ~10 bits per distinct key gives <1% false
    positives at k=5; the default 1 MiB handles ~1e5 keys and the caller
    passes a corpus-sized value at scale.
    """
    words = n_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(words, dtype=np.uint64)
        keys = t[column].to_numpy(zero_copy_only=False).astype(np.int64)
        bloom_insert(bm, keys, n_bits, k)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    out = np.zeros(words, dtype=np.uint64)
    for batch in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).iter_batches(batch_format="pyarrow"):
        for buf in batch["bm"]:
            out |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return out


class BloomPrefilter:
    """Actor-pool map_batches stage: keep rows whose ``column`` is a maybe-
    member.  The bitmap is passed as a ``ray.put`` ObjectRef and resolved
    once per actor in ``__init__`` (zero-copy view onto the object store),
    never re-shipped per batch."""

    def __init__(self, bitmap_ref, column: str, n_bits: int, k: int):
        import ray

        self.bitmap = ray.get(bitmap_ref) if not isinstance(bitmap_ref, np.ndarray) else bitmap_ref
        self.column = column
        self.n_bits = n_bits
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        keys = t[self.column].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = bloom_contains(self.bitmap, keys, self.n_bits, self.k)
        return t.filter(pa.array(mask))
