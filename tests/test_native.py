"""Native C++ FLAC parser: parity with the Python BitReader path."""

import numpy as np
import pytest

import aukit_tpu as ak
from aukit_tpu.codecs import flac as flac_codec
from aukit_tpu.native import flacbits

from tests import fixtures

RNG = np.random.default_rng(5)

pytestmark = pytest.mark.skipif(not flacbits.available(), reason="native parser unavailable")


def _mixed_stream():
    n = 576
    sig = np.cumsum(RNG.integers(-40, 40, n)).astype(np.int64)
    order, shift, coefs = 2, 5, [40, -13]

    def residuals(s):
        res = list(s[:order])
        for i in range(order, len(s)):
            pred = (int(s[i - 1]) * coefs[0] + int(s[i - 2]) * coefs[1]) >> shift
            res.append(int(s[i]) - pred)
        return res

    frames = b""
    # verbatim + constant stereo frame
    vals = RNG.integers(-(1 << 15), 1 << 15, n).tolist()
    frames += fixtures.flac_frame(
        [{"type": "verbatim", "values": vals}, {"type": "constant", "value": 77}], n, 1, 16
    )
    # lpc mono-ish frames with escape partitions and wasted bits
    frames += fixtures.flac_frame(
        [{
            "type": "lpc", "order": order, "warmup": [int(v) for v in sig[:order]],
            "precision": 7, "shift": shift, "coefs": coefs,
            "residuals": residuals(sig)[order:], "param": 9, "partition_order": 2,
        }, {"type": "fixed", "order": 2, "warmup": [1, 2],
            "residuals": [int(v) for v in RNG.integers(-100, 100, n - 2)],
            "param": 7, "partition_order": 0}],
        n, 0, 16,
    )
    return fixtures.flac_stream_header(48000, 2, 16, 2 * n) + frames


def test_native_matches_python_parse():
    data = _mixed_stream()
    _, _, _, _, _, pos = flac_codec.parse_flac_header(data)
    fm_n, sub_n, co_n, val_n = flac_codec.parse_all_frames(data, pos, 2, 16, use_native=True)
    fm_p, sub_p, co_p, val_p = flac_codec.parse_all_frames(data, pos, 2, 16, use_native=False)
    np.testing.assert_array_equal(fm_n, fm_p)
    for k in sub_p:
        np.testing.assert_array_equal(sub_n[k], sub_p[k], err_msg=k)
    np.testing.assert_array_equal(co_n, co_p)
    np.testing.assert_array_equal(val_n, val_p)


def test_native_full_decode_matches():
    data = _mixed_stream()
    a = flac_codec.decode_flac(data, use_native=True)[0]
    b = flac_codec.decode_flac(data, use_native=False)[0]
    np.testing.assert_array_equal(a, b)


def test_native_lenient_truncation():
    data = _mixed_stream()
    cut = data[: len(data) - 300]  # truncate mid-frame
    _, _, _, _, _, pos = flac_codec.parse_flac_header(cut)
    fm, _, _, _ = flac_codec.parse_all_frames(cut, pos, 2, 16, use_native=True, strict=False)
    fm_p, _, _, _ = flac_codec.parse_all_frames(cut, pos, 2, 16, use_native=False, strict=False)
    assert len(fm) == len(fm_p) == 1  # only the first complete frame survives
    with pytest.raises(flac_codec.FlacError):
        flac_codec.parse_all_frames(cut, pos, 2, 16, use_native=True, strict=True)


def test_native_speedup():
    """The native parser should beat the Python BitReader clearly."""
    import time

    n = 4096
    frames = b""
    for _ in range(12):
        vals = RNG.integers(-(1 << 14), 1 << 14, n).tolist()
        frames += fixtures.flac_frame(
            [{"type": "fixed", "order": 1, "warmup": [vals[0]],
              "residuals": [int(v) for v in RNG.integers(-2000, 2000, n - 1)],
              "param": 11, "partition_order": 0}], n, 0, 16,
        )
    data = fixtures.flac_stream_header(48000, 1, 16, 12 * n) + frames
    _, _, _, _, _, pos = flac_codec.parse_flac_header(data)

    t0 = time.perf_counter()
    flac_codec.parse_all_frames(data, pos, 1, 16, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    flac_codec.parse_all_frames(data, pos, 1, 16, use_native=False)
    t_python = time.perf_counter() - t0
    assert t_native < t_python  # typically 50-500x


def test_native_incremental_truncation_sweep():
    """The fleet's exact native entry (incremental parse_all_frames) over
    EVERY byte-boundary truncation of a mixed stream: committed frames and
    end_pos must match the Python BitReader at each cut, and no cut may read
    out of bounds (this test is part of the ASan sweep — jax-jit paths crash
    under ASan's __cxa_throw interceptor vs jaxlib, so native coverage lives
    in jit-free tests like this one)."""
    data = _mixed_stream()
    _, _, _, _, _, pos = flac_codec.parse_flac_header(data)
    for cut in range(pos, len(data) + 1):
        d = data[:cut]
        fm_n, sub_n, _co_n, val_n, end_n = flac_codec.parse_all_frames(
            d, pos, 2, 16, use_native=True, strict=False, incremental=True)
        fm_p, sub_p, _co_p, val_p, end_p = flac_codec.parse_all_frames(
            d, pos, 2, 16, use_native=False, strict=False, incremental=True)
        assert end_n == end_p <= cut, cut
        np.testing.assert_array_equal(fm_n, fm_p, err_msg=str(cut))
        np.testing.assert_array_equal(val_n, val_p, err_msg=str(cut))
        np.testing.assert_array_equal(sub_n["block"], sub_p["block"])


def test_native_qoa_full_decode_matches_python():
    """Fused C++ QOA decode vs the vectorized-numpy oracle, incl. a short
    trailing frame and the 8-byte slack quirk."""
    from aukit_tpu.codecs.qoa import decode_qoa

    data = fixtures.qoa_stream(RNG, 2, 44100, [5120, 5120, 700]) + b"\x00" * 8
    a, ra, ta = decode_qoa(data, use_native=True)
    b, rb, tb = decode_qoa(data, use_native=False)
    assert (ra, ta) == (rb, tb)
    np.testing.assert_array_equal(a, b)
    # exact-size stream (no slack): reference drops the final frame
    data2 = fixtures.qoa_stream(RNG, 1, 48000, [5120, 2000])
    a2 = decode_qoa(data2, use_native=True)[0]
    b2 = decode_qoa(data2, use_native=False)[0]
    np.testing.assert_array_equal(a2, b2)

