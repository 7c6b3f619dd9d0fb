"""Native C RLE codec vs the numpy oracle (data/coco.py).

The C extension (native/rle_ext.c) must agree bit-for-bit with the pure
numpy codec — which is itself golden-tested against the public COCO RLE
spec — on decoded masks and on compressed-varint counts decoding.
"""

import numpy as np
import pytest

from maskrcnn_tf2_tpu.data.coco import (
    _decode_rle_counts,
    mask_to_rle,
    rle_to_mask,
)
from maskrcnn_tf2_tpu.native import rle as native_rle

native = native_rle.get()
pytestmark = pytest.mark.skipif(
    native is None, reason="no C toolchain for the native RLE extension"
)


def _encode_counts(counts):
    """Inverse of _decode_rle_counts (pycocotools rleToString semantics):
    delta-code runs > 2 against counts[i-2], then base-48 6-bit varints with
    bit 5 as continuation."""
    s = []
    for i, x in enumerate(counts):
        x = int(x)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) and not (
                x == -1 and (c & 0x10)
            )
            if more:
                c |= 0x20
            s.append(chr(c + 48))
    return "".join(s)


def _numpy_decode(rle, h, w, monkeypatch):
    """Force the numpy fallback branch of rle_to_mask."""
    monkeypatch.setattr(native_rle, "get", lambda: None)
    try:
        return rle_to_mask(rle, h, w)
    finally:
        monkeypatch.undo()


@pytest.mark.parametrize("seed,h,w,p", [
    (0, 37, 53, 0.5), (1, 64, 64, 0.05), (2, 128, 96, 0.95),
    (3, 1, 1, 0.5), (4, 200, 3, 0.3),
])
def test_mask_roundtrip_matches_numpy(seed, h, w, p, monkeypatch):
    rs = np.random.RandomState(seed)
    mask = rs.rand(h, w) < p
    rle = mask_to_rle(mask)
    got = rle_to_mask(rle, h, w)       # native path
    want = _numpy_decode(rle, h, w, monkeypatch)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, mask)


def test_degenerate_masks(monkeypatch):
    for mask in (np.zeros((5, 7), bool), np.ones((5, 7), bool)):
        rle = mask_to_rle(mask)
        np.testing.assert_array_equal(rle_to_mask(rle, 5, 7), mask)


def test_compressed_string_counts_agree():
    cases = [
        [0, 1],
        [3, 4, 2, 9, 1, 100000],     # multi-group varint + deltas
        [0, 70000, 12, 5, 5, 5],      # long first run
        [2, 2, 2, 1, 3, 1],           # negative deltas (sign extension)
        [5, 0, 0, 7],                 # zero runs mid-stream
    ]
    for counts in cases:
        s = _encode_counts(counts)
        assert _decode_rle_counts(s) == counts          # numpy oracle
        assert list(native.decode_counts(s)) == counts  # C codec


def test_string_counts_decode_to_same_mask(monkeypatch):
    rs = np.random.RandomState(7)
    mask = rs.rand(61, 45) < 0.4
    rle = mask_to_rle(mask)
    srle = {"counts": _encode_counts(rle["counts"]), "size": rle["size"]}
    got = rle_to_mask(srle, 61, 45)
    want = _numpy_decode(srle, 61, 45, monkeypatch)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, mask)


def test_short_counts_pad_with_zeros():
    # counts summing to less than h*w must zero-pad (numpy path pads too)
    rle = {"counts": [2, 3], "size": [4, 4]}
    m = rle_to_mask(rle, 4, 4)
    flat = np.asfortranarray(m).reshape(-1, order="F")
    assert flat[:2].sum() == 0 and flat[2:5].all() and flat[5:].sum() == 0
