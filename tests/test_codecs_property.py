"""Property-based fuzzing of the pure-Python codecs: any payload the
encoders produce must decode back bit-exactly (LZW / GIF / BMP / PNG),
for arbitrary shapes and byte contents — the roundtrip law the oracle
gates exercise only at the fixture shapes."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ast_data_pipeline_spark.operators.multimodal import (
    _bmp_decode,
    _gif_decode,
    _lzw_compress,
    _lzw_decompress,
    _png_decode,
    encode_bmp,
    encode_gif,
    encode_png,
)


@given(data=st.binary(min_size=0, max_size=4000))
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_arbitrary_bytes(data):
    assert _lzw_decompress(_lzw_compress(data, 8), 8) == data


@given(
    data=st.lists(st.integers(0, 15), min_size=1, max_size=3000),
    mcs=st.sampled_from([4, 5, 8]),
)
@settings(max_examples=40, deadline=None)
def test_lzw_roundtrip_small_alphabets(data, mcs):
    raw = bytes(d % (1 << mcs) for d in data)
    assert _lzw_decompress(_lzw_compress(raw, mcs), mcs) == raw


_grey = st.tuples(
    st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1)
)


@given(_grey)
@settings(max_examples=40, deadline=None)
def test_gif_bmp_png_roundtrip_random_grey(shape):
    h, w, seed = shape
    arr = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
    assert (_gif_decode(encode_gif(arr)) == arr).all()
    assert (_bmp_decode(encode_bmp(arr)) == arr).all()
    for ft in (0, 1, 2):
        assert (_png_decode(encode_png(arr, filter_type=ft)) == arr).all()


@given(_grey)
@settings(max_examples=20, deadline=None)
def test_bmp_png_roundtrip_random_rgb(shape):
    h, w, seed = shape
    arr = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    assert (_bmp_decode(encode_bmp(arr)) == arr).all()
    assert (_png_decode(encode_png(arr, filter_type=1)) == arr).all()
