"""Property-based tests for the from-scratch image ENCODERS (r5).

The encoders back the F10 source-MIME thumbnail path
(``utils/ImageParse.java:173-176`` parity), so they must hold for
arbitrary pixel content, not just the fixture gradients:

- encode_bmp / encode_tiff are LOSSLESS — the repo's independently
  validated decoders must recover the exact array for any shape/content;
- encode_jpeg must produce a spec-valid stream the decoder inverts
  within quantization tolerance, and its Annex-K.2 optimal-Huffman
  derivation must emit a feasible canonical code for ANY symbol
  frequency profile (the procedure's merge/adjust steps are the
  subtlest part of the encoder).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _img(draw, max_side=40):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["noise", "flat", "gradient"]))
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "flat":
        return np.full((h, w, 3), draw(st.integers(0, 255)), np.uint8)
    y, x = np.mgrid[0:h, 0:w]
    a, b = draw(st.integers(1, 7)), draw(st.integers(1, 7))
    return ((x[..., None] * a + y[..., None] * b + np.arange(3)) % 256).astype(
        np.uint8
    )


@st.composite
def images(draw):
    return _img(draw)


@settings(max_examples=40, deadline=None)
@given(images())
def test_bmp_tiff_lossless_any_image(img):
    from image_search_indexing_spark.operators.multimodal import (
        decode_bmp, decode_tiff, encode_bmp, encode_tiff, parse_image_dims,
    )

    b = encode_bmp(img)
    assert parse_image_dims(b) == (img.shape[1], img.shape[0])
    assert np.array_equal(decode_bmp(b), img)
    t = encode_tiff(img)
    assert parse_image_dims(t) == (img.shape[1], img.shape[0])
    assert np.array_equal(decode_tiff(t), img)


@settings(max_examples=25, deadline=None)
@given(images())
def test_jpeg_round_trip_any_image(img):
    from image_search_indexing_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg, parse_image_dims, sniff_mime,
    )

    data = encode_jpeg(img, quality=90)
    assert sniff_mime(data) == "image/jpeg"
    assert parse_image_dims(data) == (img.shape[1], img.shape[0])
    got = decode_jpeg(data)
    assert got is not None and got.shape == img.shape
    # quality-90 quantization bound: flat/gradient images reconstruct
    # tightly; dense noise is the worst case for a DCT coder
    err = np.abs(got.astype(np.int32) - img.astype(np.int32))
    assert err.mean() < 24.0, err.mean()


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 255), st.integers(1, 10_000), min_size=1, max_size=200
    )
)
def test_huffman_spec_valid_for_any_frequencies(freqs):
    """Annex K.2 output is always a feasible canonical Huffman spec:
    counts match values, no duplicates, every input symbol coded, all
    lengths ≤ 16, Kraft sum strictly < 1 (the reserved-symbol slack
    guarantees no all-ones code), and the code map decodes uniquely."""
    from image_search_indexing_spark.operators.multimodal import (
        _huff_encode_map, _huff_spec_from_freq,
    )

    bits, vals = _huff_spec_from_freq(freqs)
    assert sum(bits) == len(vals)
    assert len(set(vals)) == len(vals)
    assert set(freqs) <= set(vals)
    kraft = sum(c * 2 ** (16 - ln) for ln, c in enumerate(bits, 1))
    assert 0 < kraft < 2**16
    codes = _huff_encode_map(bits, vals)
    assert set(codes) == set(vals)
    # prefix-freeness: canonical codes as (length, code) bit strings
    as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
    assert len(as_bits) == len(codes)
    for a in as_bits:
        for b in as_bits:
            if a is not b and len(a) < len(b):
                assert not b.startswith(a), (a, b)


def test_encode_jpeg_u16_dim_guard():
    """SOF dims are u16 (T.81 §B.2.2): oversize arrays raise a clear
    ValueError instead of a byte-overflow deep in header assembly, and
    the thumbnail path maps any encoder ValueError to the reference's
    IOException → null-image contract rather than failing the task."""
    import pytest

    from image_search_indexing_spark.operators.multimodal import encode_jpeg

    with pytest.raises(ValueError, match="u16"):
        encode_jpeg(np.zeros((70000, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="u16"):
        encode_jpeg(np.zeros((4, 0, 3), np.uint8))
