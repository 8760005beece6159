import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from distributedcodesearchengine_ray.functions.codec import (
    delta_varint_decode,
    delta_varint_encode,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_small():
    v = np.array([0, 1, 127, 128, 300, 2**21, 2**40, 2**63], dtype=np.uint64)
    assert (varint_decode(varint_encode(v)) == v).all()


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varint_decode(b"")) == 0
    assert len(delta_varint_decode(b"")) == 0


def test_delta_roundtrip():
    ids = np.array([0, 3, 4, 100, 10_000, 10_001, 2**40], dtype=np.int64)
    assert (delta_varint_decode(delta_varint_encode(ids)) == ids).all()


def test_compression_is_effective():
    ids = np.arange(0, 100_000, 3, dtype=np.int64)
    enc = delta_varint_encode(ids)
    assert len(enc) < len(ids) * 2  # ~1 byte per small delta vs 8 raw


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varint_property(values):
    v = np.array(values, dtype=np.uint64)
    assert (varint_decode(varint_encode(v)) == v).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
def test_delta_property(values):
    ids = np.unique(np.array(values, dtype=np.int64))
    assert (delta_varint_decode(delta_varint_encode(ids)) == ids).all()
