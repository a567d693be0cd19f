"""Property tests for the vectorized VByte posting codec (SURVEY.md F-9/I-9)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

settings.register_profile(
    "vbyte",
    suppress_health_check=[HealthCheck.data_too_large, HealthCheck.too_slow],
    deadline=None,
)
settings.load_profile("vbyte")

from fastcatsearch3_spark.functions.vbyte import (
    decode_blocks,
    decode_meta,
    decode_postings,
    encode_postings,
    vbyte_decode,
    vbyte_decode_prefix,
    vbyte_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = vbyte_encode(arr)
    dec = vbyte_decode(enc)
    assert dec.tolist() == vals


def test_vbyte_known_bytes():
    # protobuf-varint convention: 300 = 0b10101100 0b00000010
    enc = vbyte_encode(np.array([0, 1, 127, 128, 300], dtype=np.uint64))
    assert enc.tolist() == [0x00, 0x01, 0x7F, 0x80, 0x01, 0xAC, 0x02]


def test_vbyte_prefix():
    arr = np.arange(1000, dtype=np.uint64) * 9973
    enc = vbyte_encode(arr)
    vals, consumed = vbyte_decode_prefix(enc, 10)
    assert vals.tolist() == arr[:10].tolist()
    assert consumed <= 10 * 10
    vals2 = vbyte_decode(enc[consumed:])
    assert vals2.tolist() == arr[10:].tolist()


@st.composite
def posting_arrays(draw):
    n = draw(st.integers(min_value=1, max_value=600))
    gaps = draw(
        st.lists(
            st.integers(min_value=1, max_value=2**31),
            min_size=n,
            max_size=n,
        )
    )
    docnos = np.cumsum(np.array(gaps, dtype=np.uint64)) - 1
    tfs = np.array(
        draw(st.lists(st.integers(1, 10000), min_size=n, max_size=n)),
        dtype=np.uint64,
    )
    dls = np.array(
        draw(st.lists(st.integers(1, 100000), min_size=n, max_size=n)),
        dtype=np.uint64,
    )
    return docnos, tfs, dls


@given(posting_arrays(), st.sampled_from([4, 128, 4096]))
@settings(max_examples=60, deadline=None)
def test_posting_blob_roundtrip(arrs, block_size):
    docnos, tfs, dls = arrs
    blob = encode_postings(docnos, tfs, dls, block_size=block_size)
    d2, t2, l2 = decode_postings(blob)
    np.testing.assert_array_equal(d2, docnos)
    np.testing.assert_array_equal(t2, tfs)
    np.testing.assert_array_equal(l2, dls)


@given(posting_arrays())
@settings(max_examples=40, deadline=None)
def test_block_meta_invariants(arrs):
    """WAND safety: block maxima/minima must bound every entry (§5.2)."""
    docnos, tfs, dls = arrs
    bs = 128
    blob = encode_postings(docnos, tfs, dls, block_size=bs)
    meta = decode_meta(blob)
    assert meta.n == docnos.size
    cnts = meta.block_counts()
    assert cnts.sum() == docnos.size
    for i in range(meta.nblocks):
        lo, hi = i * bs, i * bs + int(cnts[i])
        assert meta.block_first[i] == docnos[lo]
        assert meta.block_maxtf[i] == tfs[lo:hi].max()
        assert meta.block_mindl[i] == dls[lo:hi].min()


@given(posting_arrays(), st.data())
@settings(max_examples=30, deadline=None)
def test_decode_selected_blocks(arrs, data):
    docnos, tfs, dls = arrs
    blob = encode_postings(docnos, tfs, dls, block_size=64)
    meta = decode_meta(blob)
    nb = meta.nblocks
    sel = sorted(
        data.draw(
            st.sets(st.integers(0, nb - 1), min_size=0, max_size=min(nb, 5))
        )
    )
    d2, t2, l2 = decode_blocks(blob, meta, np.array(sel, dtype=np.int64))
    expect_d, expect_t, expect_l = [], [], []
    cnts = meta.block_counts()
    for i in sel:
        lo, hi = i * 64, i * 64 + int(cnts[i])
        expect_d.append(docnos[lo:hi])
        expect_t.append(tfs[lo:hi])
        expect_l.append(dls[lo:hi])
    if sel:
        np.testing.assert_array_equal(d2, np.concatenate(expect_d))
        np.testing.assert_array_equal(t2, np.concatenate(expect_t))
        np.testing.assert_array_equal(l2, np.concatenate(expect_l))
    else:
        assert d2.size == 0


def test_single_entry():
    blob = encode_postings(
        np.array([42], dtype=np.uint64),
        np.array([7], dtype=np.uint64),
        np.array([99], dtype=np.uint64),
    )
    d, t, dl = decode_postings(blob)
    assert d.tolist() == [42] and t.tolist() == [7] and dl.tolist() == [99]
