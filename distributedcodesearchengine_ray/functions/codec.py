"""Posting-list compression: delta + varint (LEB128) codecs.

Posting lists store ascending doc ids; we delta-encode then varint-encode
(numpy-vectorized both directions).  Term frequencies are varint-encoded
directly.  This is the on-disk / in-actor representation of the inverted
index (`north_star`: "delta-encoded + varint/PForDelta-compressed posting
lists"); the arrays round-trip exactly (property-tested).
"""

from __future__ import annotations

import numpy as np

_MASKS = 0x7F
_CONT = 0x80


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (ceil(bit_length/7), min 1)."""
    v = np.asarray(values, dtype=np.uint64)
    lens = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while (tmp > 0).any():
        lens[tmp > 0] += 1
        tmp >>= np.uint64(7)
    return lens


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    nbytes = varint_lengths(v)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    # fill byte k of every value that has >= k+1 bytes
    max_b = int(nbytes.max())
    tmp = v.copy()
    for k in range(max_b):
        active = nbytes > k
        pos = starts[active] + k
        chunk = (tmp[active] & np.uint64(_MASKS)).astype(np.uint8)
        not_last = nbytes[active] > (k + 1)
        out[pos] = chunk | (not_last.astype(np.uint8) << 7)
        tmp[active] >>= np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Vectorized LEB128 decode -> uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & _CONT) == 0
    # value index of each byte: number of terminators strictly before it
    value_idx = np.zeros(len(raw), dtype=np.int64)
    value_idx[1:] = np.cumsum(is_last)[:-1]
    n = int(is_last.sum())
    # byte position within its value
    starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(is_last)
    starts[1:] = ends[:-1] + 1
    within = np.arange(len(raw)) - starts[value_idx]
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(
        out,
        value_idx,
        (raw & np.uint8(_MASKS)).astype(np.uint64) << (np.uint64(7) * within.astype(np.uint64)),
    )
    return out


def delta_varint_encode(sorted_ids: np.ndarray) -> bytes:
    """Delta + varint encode an ascending int array (doc ids)."""
    a = np.asarray(sorted_ids, dtype=np.uint64)
    if len(a) == 0:
        return b""
    deltas = np.empty_like(a)
    deltas[0] = a[0]
    np.subtract(a[1:], a[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`delta_varint_encode` -> int64 array."""
    deltas = varint_decode(buf)
    if len(deltas) == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(deltas.astype(np.int64))
