"""ctypes bindings for the native FLAC bitstream parser (native/flacbits.cpp).

Builds the shared object on first use with g++ (cached next to the source);
``available()`` is False when no compiler/source is present and callers fall
back to the pure-Python BitReader path in codecs/flac.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "flacbits.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "flacbits.so")
_lock = threading.Lock()
_lib = None
_tried = False


class _ParseResult(ctypes.Structure):
    _fields_ = [
        ("frame_block_size", ctypes.POINTER(ctypes.c_int32)),
        ("frame_chan_asgn", ctypes.POINTER(ctypes.c_int32)),
        ("n_frames", ctypes.c_int64),
        ("sub_order", ctypes.POINTER(ctypes.c_int32)),
        ("sub_shift", ctypes.POINTER(ctypes.c_int32)),
        ("sub_wasted", ctypes.POINTER(ctypes.c_int32)),
        ("sub_blk", ctypes.POINTER(ctypes.c_int32)),
        ("coefs", ctypes.POINTER(ctypes.c_int32)),
        ("n_subs", ctypes.c_int64),
        ("values", ctypes.POINTER(ctypes.c_int32)),
        ("n_values", ctypes.c_int64),
        ("error", ctypes.c_int32),
        ("end_pos", ctypes.c_int64),
    ]


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            # -ffp-contract=off: the DSP twins promise the numpy oracle's
            # exact per-op IEEE rounding; FMA contraction would fuse mul+add
            ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
             "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.flac_parse.restype = ctypes.POINTER(_ParseResult)
        lib.flac_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.flac_free.argtypes = [ctypes.POINTER(_ParseResult)]
        lib.flac_restore.restype = None
        lib.flac_restore.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ]
        lib.flac_restore_flat.restype = None
        lib.flac_restore_flat.argtypes = [ctypes.POINTER(ctypes.c_int64)] * 7 + [ctypes.c_int64]
        lib.flac_decode_full.restype = ctypes.POINTER(_DecodeResult)
        lib.flac_decode_full.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.flac_decode_free.argtypes = [ctypes.POINTER(_DecodeResult)]
        lib.qoa_decode_full.restype = ctypes.POINTER(_QoaDecodeResult)
        lib.qoa_decode_full.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64,
        ]
        lib.qoa_decode_free.argtypes = [ctypes.POINTER(_QoaDecodeResult)]
        lib.pcm_frames.restype = ctypes.c_int64
        lib.pcm_frames.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.chunk_dsp.restype = None
        lib.chunk_dsp.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_double, ctypes.c_double, ctypes.c_int32,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
        ]
        lib.qoa_lms.restype = None
        lib.qoa_lms.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.block_resample_rows.restype = None
        lib.block_resample_rows.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.iir_scan_rows.restype = None
        lib.iir_scan_rows.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.dfpwm_decode_rows.restype = None
        lib.dfpwm_decode_rows.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dfpwm_encode_rows.restype = None
        lib.dfpwm_encode_rows.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


class _QoaDecodeResult(ctypes.Structure):
    _fields_ = [
        ("samples", ctypes.POINTER(ctypes.c_int32)),
        ("n", ctypes.c_int64),
    ]


class _DecodeResult(ctypes.Structure):
    _fields_ = [
        ("samples", ctypes.POINTER(ctypes.c_float)),
        ("n", ctypes.c_int64),
        ("error", ctypes.c_int32),
    ]


def available() -> bool:
    return _load() is not None


def decode_full(data: bytes, pos: int, channels: int, depth: int, strict: bool = True):
    """Fused whole-file decode: parse -> restore -> decorrelate -> normalize
    in one native pass. Returns float32[C, N] (half-scale, /2^depth).
    Raises FlacError on malformed streams when strict."""
    from ..codecs.flac import FlacError

    lib = _load()
    assert lib is not None
    res = lib.flac_decode_full(data, len(data), pos, channels, depth)
    try:
        r = res.contents
        if r.error != 0 and strict:
            raise FlacError(_ERRORS.get(int(r.error), f"FLAC parse error {int(r.error)}"))
        n = int(r.n)
        if n == 0:
            return np.zeros((channels, 0), np.float32)
        flat = np.ctypeslib.as_array(r.samples, (channels * n,)).copy()
        return flat.reshape(channels, n)
    finally:
        lib.flac_decode_free(res)


_ERRORS = {
    1: "Reserved residual coding method",
    2: "Block size not divisible by number of Rice partitions",
    3: "Reserved subframe type",
    4: "Sync code expected",
    5: "Reserved block size",
    6: "Reserved channel assignment",
    7: "unexpected end of FLAC stream",
}


def parse_frames(data: bytes, pos: int, channels: int, depth: int, strict: bool = True,
                 incremental: bool = False):
    """Parse all frames natively. Returns
    (frame_meta [F,2] int32 (block_size, chan_asgn),
     sub_meta dict of int64 arrays (order, shift, wasted, block),
     coefs [S,32] int64, values_flat int64[n]) — dtypes match the Python path;
    with ``incremental=True`` a fifth element is returned: the byte offset
    just past the last committed frame (frames whose CRC16 bytes are absent
    stay uncommitted — resume from end_pos once more bytes arrive).
    Raises FlacError on malformed streams (same conditions as the reference);
    with strict=False, returns the frames completed before the error (the
    stream path's lenient behavior, aukit.lua:3158)."""
    from ..codecs.flac import FlacError

    lib = _load()
    assert lib is not None
    res = lib.flac_parse(data, len(data), pos, channels, depth, 1 if incremental else 0)
    try:
        r = res.contents
        if r.error != 0 and strict:
            raise FlacError(_ERRORS.get(int(r.error), f"FLAC parse error {int(r.error)}"))
        F, S, NV = int(r.n_frames), int(r.n_subs), int(r.n_values)
        fbs = np.ctypeslib.as_array(r.frame_block_size, (max(F, 1),))[:F].copy()
        fca = np.ctypeslib.as_array(r.frame_chan_asgn, (max(F, 1),))[:F].copy()
        sub = {
            "order": np.ctypeslib.as_array(r.sub_order, (max(S, 1),))[:S].astype(np.int64),
            "shift": np.ctypeslib.as_array(r.sub_shift, (max(S, 1),))[:S].astype(np.int64),
            "wasted": np.ctypeslib.as_array(r.sub_wasted, (max(S, 1),))[:S].astype(np.int64),
            "block": np.ctypeslib.as_array(r.sub_blk, (max(S, 1),))[:S].astype(np.int64),
        }
        coefs = np.ctypeslib.as_array(r.coefs, (max(S, 1) * 32,))[: S * 32].astype(np.int64).reshape(S, 32)
        values = np.ctypeslib.as_array(r.values, (max(NV, 1),))[:NV].astype(np.int64)
        frame_meta = np.stack([fbs, fca], axis=1) if F else np.zeros((0, 2), np.int32)
        if incremental:
            return frame_meta, sub, coefs, values, int(r.end_pos)
        return frame_meta, sub, coefs, values
    finally:
        lib.flac_free(res)


def qoa_decode(data: bytes, pos: int, channels: int, sample_rate: int,
               file_samples: int) -> np.ndarray:
    """Fused whole-stream QOA decode (frame walk + slices + LMS in one native
    pass). Returns int32[C, N] reconstructed samples."""
    lib = _load()
    assert lib is not None
    res = lib.qoa_decode_full(data, len(data), pos, channels, sample_rate, file_samples)
    try:
        r = res.contents
        n = int(r.n)
        if n == 0:
            return np.zeros((channels, 0), np.int32)
        return np.ctypeslib.as_array(r.samples, (channels * n,)).copy().reshape(channels, n)
    finally:
        lib.qoa_decode_free(res)


_PCM_TYPE = {"signed": 0, "unsigned": 1, "float": 2}


def pcm_frames(raw: bytes, bit_depth: int, data_type: str, big_endian: bool,
               channels: int, mono: bool) -> np.ndarray:
    """One-pass unpack + normalize (+mono mean) -> float64[C_out, k].
    Bit-identical to the staged unpack_pcm/normalize_pcm/mean pipeline."""
    lib = _load()
    assert lib is not None
    bpf = (bit_depth // 8) * channels
    k = len(raw) // bpf
    c_out = 1 if (mono and channels > 1) else channels
    out = np.empty((c_out, k), np.float64)
    lib.pcm_frames(raw, len(raw), bit_depth, _PCM_TYPE[data_type],
                   1 if big_endian else 0, channels,
                   1 if (mono and channels > 1) else 0,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def chunk_dsp(ext: np.ndarray, ffx: np.ndarray, frac: np.ndarray, exact: np.ndarray,
              out_len: int, mode: str, interp_clamp, lowpass: bool, alpha: float,
              filter_state: np.ndarray, zero_state_after: bool,
              scale_int8: bool, floor_output: bool):
    """Fused gather+lerp+FIR+scale for the 'none'/'linear' stream modes —
    float64 ops in the numpy oracle's exact order. Returns
    (out f64[C, out_len], new_filter_state f64[C])."""
    lib = _load()
    assert lib is not None
    ext = np.ascontiguousarray(ext, np.float64)
    C, n_ext = ext.shape
    ffx = np.ascontiguousarray(ffx[:out_len], np.int64)
    frac = np.ascontiguousarray(frac[:out_len], np.float64)
    exact_u8 = np.ascontiguousarray(exact[:out_len], np.uint8)
    fs = np.ascontiguousarray(filter_state, np.float64).copy()
    out = np.empty((C, out_len), np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.chunk_dsp(
        ext.ctypes.data_as(dp), C, n_ext,
        ffx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        frac.ctypes.data_as(dp),
        exact_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_len,
        0 if mode == "none" else 1,
        0 if interp_clamp is None else 1,
        0.0 if interp_clamp is None else float(interp_clamp[0]),
        0.0 if interp_clamp is None else float(interp_clamp[1]),
        1 if lowpass else 0, float(alpha), fs.ctypes.data_as(dp),
        1 if zero_state_after else 0, 1 if scale_int8 else 0,
        1 if floor_output else 0, out.ctypes.data_as(dp))
    return out, fs


def qoa_lms(dequantized: np.ndarray, history: np.ndarray, weights: np.ndarray):
    """Host QOA LMS: dq int32[L, T] + state int32[L, 4] (updated in place) ->
    int32[L, T] reconstructed samples."""
    lib = _load()
    assert lib is not None
    dq = np.ascontiguousarray(dequantized, np.int32)
    hist = np.ascontiguousarray(history, np.int32)
    wts = np.ascontiguousarray(weights, np.int32)
    L, T = dq.shape
    out = np.empty((L, T), np.int32)
    p = ctypes.POINTER(ctypes.c_int32)
    lib.qoa_lms(dq.ctypes.data_as(p), out.ctypes.data_as(p),
                hist.ctypes.data_as(p), wts.ctypes.data_as(p), L, T)
    return out, hist, wts


def block_resample_rows(ext: np.ndarray, ffx: np.ndarray, frac: np.ndarray,
                        exact: np.ndarray, out_len: int, mode: str,
                        interp_clamp) -> np.ndarray:
    """Row-batched block resample ("none"/"linear") — bit-identical f64 order
    to the numpy path in stream/engine.py::lua_block_resample. ``ext`` is
    [..., n_ext] (any leading dims); returns [..., out_len]."""
    lib = _load()
    assert lib is not None
    ext = np.ascontiguousarray(ext, np.float64)
    n_ext = ext.shape[-1]
    R = ext.size // n_ext if n_ext else 0
    ffx = np.ascontiguousarray(ffx, np.int64)
    frac = np.ascontiguousarray(frac, np.float64)
    exact_u8 = np.ascontiguousarray(exact, np.uint8)
    out = np.empty(ext.shape[:-1] + (out_len,), np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.block_resample_rows(
        ext.ctypes.data_as(dp), R, n_ext,
        ffx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        frac.ctypes.data_as(dp),
        exact_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_len,
        0 if mode == "none" else 1,
        0 if interp_clamp is None else 1,
        0.0 if interp_clamp is None else float(interp_clamp[0]),
        0.0 if interp_clamp is None else float(interp_clamp[1]),
        out.ctypes.data_as(dp))
    return out


def iir_scan_rows(x: np.ndarray, alpha: float, state: np.ndarray):
    """Row-batched recursive-doubling IIR — bit-identical to
    stream/engine.py::iir_lowpass_scan's numpy math. ``x`` is [..., T] with
    ``state`` shaped like x[..., 0]. Returns (y, final_state)."""
    lib = _load()
    assert lib is not None
    T = x.shape[-1]
    y = np.ascontiguousarray(x, np.float64).copy() if not (
        isinstance(x, np.ndarray) and x.flags.c_contiguous and x.dtype == np.float64
    ) else x.copy()
    st = np.ascontiguousarray(state, np.float64).reshape(-1).copy()
    R = y.size // T
    dp = ctypes.POINTER(ctypes.c_double)
    fs = np.empty(R, np.float64)
    lib.iir_scan_rows(y.ctypes.data_as(dp), st.ctypes.data_as(dp),
                      fs.ctypes.data_as(dp), float(alpha), R, T)
    return y, fs.reshape(np.shape(state)).copy()


def restore_lpc_flat(flat: np.ndarray, offsets: np.ndarray, blocks: np.ndarray,
                     orders: np.ndarray, shifts: np.ndarray, wasted: np.ndarray,
                     coefs: np.ndarray) -> np.ndarray:
    """In-place LPC restore + wasted-bits shift on the parser's flat int64
    values (one contiguous span per subframe) — no padded-matrix staging."""
    lib = _load()
    assert lib is not None
    flat = np.ascontiguousarray(flat, np.int64)
    p = ctypes.POINTER(ctypes.c_int64)
    # hold references: ascontiguousarray temporaries must outlive the C call
    arrs = [np.ascontiguousarray(a, np.int64)
            for a in (offsets, blocks, orders, shifts, wasted, coefs)]
    lib.flac_restore_flat(flat.ctypes.data_as(p), *(a.ctypes.data_as(p) for a in arrs),
                          len(blocks))
    return flat


def restore_lpc(values: np.ndarray, blocks: np.ndarray, orders: np.ndarray,
                shifts: np.ndarray, coefs: np.ndarray) -> np.ndarray:
    """In-place batched LPC restore over values[S, T] int64 (C-contiguous)."""
    lib = _load()
    assert lib is not None
    values = np.ascontiguousarray(values, np.int64)
    blocks = np.ascontiguousarray(blocks, np.int64)
    orders = np.ascontiguousarray(orders, np.int64)
    shifts = np.ascontiguousarray(shifts, np.int64)
    coefs = np.ascontiguousarray(coefs, np.int64)
    S, T = values.shape
    p = ctypes.POINTER(ctypes.c_int64)
    lib.flac_restore(
        values.ctypes.data_as(p), blocks.ctypes.data_as(p), orders.ctypes.data_as(p),
        shifts.ctypes.data_as(p), coefs.ctypes.data_as(p), S, T,
    )
    return values


def dfpwm_decode_rows(bytes_u8: np.ndarray, state: np.ndarray):
    """Host DFPWM1a decode, bit-identical to codecs/dfpwm.py::dfpwm_decode.
    bytes_u8 [L, B] uint8, state [5, L] int32 (charge, strength, prev_bit,
    prev_charge, lowpass). Returns (out int32[L, B*8], new_state [5, L])."""
    lib = _load()
    assert lib is not None
    b = np.ascontiguousarray(bytes_u8, np.uint8)
    st = np.ascontiguousarray(state, np.int32).copy()
    L, B = b.shape
    out = np.empty((L, B * 8), np.int32)
    lib.dfpwm_decode_rows(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), L, B,
        st.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, st


def dfpwm_encode_rows(levels: np.ndarray, state: np.ndarray):
    """Host DFPWM1a encode, bit-identical to codecs/dfpwm.py::dfpwm_encode.
    levels [L, N] int32 (N % 8 == 0), state [3, L] int32 (charge, strength,
    prev_bit). Returns (out uint8[L, N//8], new_state [3, L])."""
    lib = _load()
    assert lib is not None
    lv = np.ascontiguousarray(levels, np.int32)
    st = np.ascontiguousarray(state, np.int32).copy()
    L, N = lv.shape
    out = np.empty((L, N // 8), np.uint8)
    lib.dfpwm_encode_rows(
        lv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), L, N,
        st.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, st
