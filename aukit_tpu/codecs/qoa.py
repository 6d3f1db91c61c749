"""QOA (Quite OK Audio) decoder — frame-parallel batched LMS scan.

Reference: aukit.qoa (aukit.lua:1706-1777) and the dequant table at 1662-1679.
QOA frames carry their full LMS state (4 history + 4 weights int16 per channel)
in-band, so every (frame, channel) pair decodes independently: the TPU-native
layout is lanes = frames x channels with one ``lax.scan`` over the (padded)
within-frame sample axis (SURVEY.md §5.7).

Integer semantics: the reference's ``signed_rshift`` coerces through bit32
(mod 2^32) before the arithmetic shift, which is exactly int32 wraparound
arithmetic — so all math here is int32 and bit-exact, including LMS predictor
overflow behavior.

Slice layout: 64 bits = [sf:4][r0:3][r1:3]...[r19:3][pad:?]; the reference
reads residuals MSB-first by shifting the high word left 3 per sample
(aukit.lua:1760-1762); we extract all 20 indices vectorized on the host.
"""

from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import Audio
from ..ops import pcmcode

# aukit.lua:1662-1679 — dequantized residual per (scalefactor, 3-bit index)
QOA_DEQUANT = np.array(
    [
        [1, -1, 3, -3, 5, -5, 7, -7],
        [5, -5, 18, -18, 32, -32, 49, -49],
        [16, -16, 53, -53, 95, -95, 147, -147],
        [34, -34, 113, -113, 203, -203, 315, -315],
        [63, -63, 210, -210, 378, -378, 588, -588],
        [104, -104, 345, -345, 621, -621, 966, -966],
        [158, -158, 528, -528, 950, -950, 1477, -1477],
        [228, -228, 760, -760, 1368, -1368, 2128, -2128],
        [316, -316, 1053, -1053, 1895, -1895, 2947, -2947],
        [422, -422, 1405, -1405, 2529, -2529, 3934, -3934],
        [548, -548, 1828, -1828, 3290, -3290, 5117, -5117],
        [696, -696, 2320, -2320, 4176, -4176, 6496, -6496],
        [868, -868, 2893, -2893, 5207, -5207, 8099, -8099],
        [1064, -1064, 3548, -3548, 6386, -6386, 9933, -9933],
        [1286, -1286, 4288, -4288, 7718, -7718, 12005, -12005],
        [1536, -1536, 5120, -5120, 9216, -9216, 14336, -14336],
    ],
    dtype=np.int32,
)


@jax.jit
def qoa_lms_scan(dequantized: jnp.ndarray, history: jnp.ndarray, weights: jnp.ndarray):
    """LMS reconstruction: dequantized[L, T] + per-lane state[L, 4] ->
    (int32[L, T] samples, (history, weights) final)."""
    xs = dequantized.T  # [T, L]

    def step(carry, dq):
        h, w = carry
        pred = jnp.sum(h * w, axis=1) >> 13
        recon = jnp.clip(pred + dq, -32768, 32767)
        delta = dq >> 4
        w = w + jnp.where(h < 0, -delta[:, None], delta[:, None])
        h = jnp.concatenate([h[:, 1:], recon[:, None]], axis=1)
        return (h, w), recon

    (history, weights), out = jax.lax.scan(step, (history, weights), xs)
    return jnp.transpose(out), (history, weights)


def qoa_lms_batched(dq: np.ndarray, hist: np.ndarray, wts: np.ndarray) -> np.ndarray:
    """LMS reconstruction for HOST-resident data (the whole-file loader path):
    native C++ when available, else the jitted lax.scan. The Pallas kernel
    (kernels/qoa_pallas.py) is for device-resident flows — the batch engine
    calls it directly; routing host loads through it pays two bulk
    host<->HBM transfers per call, which loses badly on remote-TPU links
    (measured ~3 MB/s through this environment's tunnel)."""
    from ..native import flacbits as _nb

    if _nb.available():
        out, _, _ = _nb.qoa_lms(dq, hist, wts)
        return out
    out, _ = qoa_lms_scan(jnp.asarray(dq), jnp.asarray(hist), jnp.asarray(wts))
    return np.asarray(out)


def parse_qoa_frames(data: bytes, pos: int, file_channels: int, file_sample_rate: int, file_samples: int):
    """Walk frames from ``pos`` collecting per-(frame,channel) state + slices.
    Returns (frames list, total_samples). Mirrors aukit.lua:1713-1775 including
    the graceful ``break`` on malformed frame headers."""
    frames = []
    sample_pos = 0
    n = len(data)
    while pos + 16 * file_channels + 8 <= n and sample_pos < file_samples:
        channels, samplerate_hi, samples, frame_size = struct.unpack_from(">B3sHH", data, pos)
        samplerate = int.from_bytes(samplerate_hi, "big")
        fpos = pos + 8
        data_size = frame_size - 8 - 4 * 4 * channels
        num_slices = data_size // 8
        if (
            channels != file_channels
            or samplerate != file_sample_rate
            or frame_size > n - pos - 8
            or samples * channels > num_slices * 20
        ):
            break
        hist = np.zeros((channels, 4), np.int32)
        wts = np.zeros((channels, 4), np.int32)
        for c in range(channels):
            hist[c] = struct.unpack_from(">4h", data, fpos)
            wts[c] = struct.unpack_from(">4h", data, fpos + 8)
            fpos += 16
        nslices_per_ch = -(-samples // 20)
        total_slices = nslices_per_ch * channels
        avail = min(total_slices * 8, n - fpos)
        raw = np.frombuffer(data, np.uint8, count=avail, offset=fpos)
        if avail < total_slices * 8:  # defensively zero-pad malformed frames
            raw = np.concatenate([raw, np.zeros(total_slices * 8 - avail, np.uint8)])
        if raw.ctypes.data % 8:  # malformed frame sizes can misalign the view
            raw = raw.copy()
        # slice order: per 20-sample group, one slice per channel
        slices = raw.view(">u8").astype(np.uint64).reshape(nslices_per_ch, channels)
        sf = (slices >> np.uint64(60)).astype(np.int64)
        shifts = (57 - 3 * np.arange(20, dtype=np.uint64)).astype(np.uint64)
        res = ((slices[:, :, None] >> shifts[None, None, :]) & np.uint64(7)).astype(np.int64)
        dq = QOA_DEQUANT[sf[:, :, None], res]  # [S, C, 20]
        dq = np.moveaxis(dq, 1, 0).reshape(channels, -1)  # [C, S*20]
        frames.append({"history": hist, "weights": wts, "dequant": dq, "samples": samples})
        sample_pos += samples
        pos += frame_size
    return frames, sample_pos


def walk_qoa_headers(data: bytes, pos: int, file_channels: int, file_sample_rate: int,
                     file_samples: int):
    """Cheap first pass: (pos, samples, frame_size) per valid frame, applying
    the reference's lenient break conditions (aukit.lua:1732-1740)."""
    metas = []
    sample_pos = 0
    n = len(data)
    while pos + 16 * file_channels + 8 <= n and sample_pos < file_samples:
        channels, samplerate_hi, samples, frame_size = struct.unpack_from(">B3sHH", data, pos)
        samplerate = int.from_bytes(samplerate_hi, "big")
        data_size = frame_size - 8 - 4 * 4 * channels
        num_slices = data_size // 8
        if (
            channels != file_channels
            or samplerate != file_sample_rate
            or frame_size > n - pos - 8
            or samples * channels > num_slices * 20
        ):
            break
        metas.append((pos, samples, frame_size))
        sample_pos += samples
        pos += frame_size
    return metas, sample_pos


def _extract_run(blk: np.ndarray, channels: int):
    """Vectorized state+slice extraction over a run of equal-size frames.
    blk: uint8[F, frame_size] -> (dq int32[F, C, S*20], hist, wts int32[F,C,4],
    samples int32[F])."""
    F, fs = blk.shape
    samples = (blk[:, 4].astype(np.int32) << 8) | blk[:, 5]
    hdr = blk[:, 8 : 8 + 16 * channels]
    state16 = hdr.reshape(F, -1, 2)
    s = ((state16[..., 0].astype(np.int32) << 8) | state16[..., 1]).astype(np.int32)
    s = np.where(s >= 32768, s - 65536, s).reshape(F, channels, 2, 4)
    hist, wts = s[:, :, 0], s[:, :, 1]
    nslices_per_ch = (fs - 8 - 16 * channels) // (8 * channels)
    nbytes = nslices_per_ch * channels * 8
    sl = np.ascontiguousarray(blk[:, 8 + 16 * channels : 8 + 16 * channels + nbytes])
    slices = sl.view(">u8").astype(np.uint64).reshape(F, nslices_per_ch, channels)
    sf = (slices >> np.uint64(60)).astype(np.int64)
    shifts = (57 - 3 * np.arange(20, dtype=np.uint64)).astype(np.uint64)
    res = ((slices[..., None] >> shifts) & np.uint64(7)).astype(np.int64)
    dq = QOA_DEQUANT[sf[..., None], res]  # [F, S, C, 20]
    dq = np.moveaxis(dq, 2, 1).reshape(F, channels, -1)
    return dq.astype(np.int32), hist, wts, samples


def parse_qoa_bulk(data: bytes, pos: int, file_channels: int, file_sample_rate: int,
                   file_samples: int):
    """Whole-stream vectorized parse: contiguous equal-size frame runs extract
    in ONE numpy pass each (a real file is one run of full frames + a short
    tail, so the per-frame Python loop of the naive walk disappears).

    Returns (dq int32[F, C, Tmax], hist, wts int32[F, C, 4], samples int32[F])
    or None when no frame is valid."""
    metas, _ = walk_qoa_headers(data, pos, file_channels, file_sample_rate, file_samples)
    if not metas:
        return None
    raw = np.frombuffer(data, np.uint8)
    runs = []  # (start_index, count, frame_size)
    i = 0
    while i < len(metas):
        p0, _, fs = metas[i]
        j = i + 1
        while j < len(metas) and metas[j][2] == fs and metas[j][0] == p0 + (j - i) * fs:
            j += 1
        runs.append((i, j - i, fs))
        i = j
    parts = []
    for start, count, fs in runs:
        p0 = metas[start][0]
        blk = raw[p0 : p0 + count * fs].reshape(count, fs)
        parts.append(_extract_run(blk, file_channels))
    tmax = max(p[0].shape[2] for p in parts)
    F = len(metas)
    dq = np.zeros((F, file_channels, tmax), np.int32)
    hist = np.zeros((F, file_channels, 4), np.int32)
    wts = np.zeros((F, file_channels, 4), np.int32)
    samples = np.zeros(F, np.int32)
    at = 0
    for d, h, w, smp in parts:
        c = d.shape[0]
        dq[at : at + c, :, : d.shape[2]] = d
        hist[at : at + c] = h
        wts[at : at + c] = w
        samples[at : at + c] = smp
        at += c
    return dq, hist, wts, samples


def decode_qoa(data: bytes, use_native: bool | None = None):
    """QOA bytes -> (int32[C, N] reconstructed samples, sample_rate, file_samples).

    Native fast path: one fused C++ pass (frame walk + slice extraction +
    LMS, native/flacbits.cpp::qoa_decode_full); the vectorized-numpy path
    remains the fallback and parity oracle."""
    try:
        magic, file_samples = struct.unpack_from(">4sI", data, 0)
    except struct.error as e:
        raise ValueError("Not a QOA file") from e
    if magic != b"qoaf":
        raise ValueError("Not a QOA file")
    file_channels = data[8]
    file_sample_rate = int.from_bytes(data[9:12], "big")
    from ..native import flacbits as _nb

    if use_native is None:
        use_native = _nb.available() and file_channels >= 1
    if use_native:
        out = _nb.qoa_decode(data, 8, file_channels, file_sample_rate, file_samples)
        return out, file_sample_rate, file_samples
    parsed = parse_qoa_bulk(data, 8, file_channels, file_sample_rate, file_samples)
    if parsed is None:
        return np.zeros((file_channels, 0), np.int32), file_sample_rate, file_samples
    dq, hist, wts, samples = parsed
    F, C, tmax = dq.shape
    out = qoa_lms_batched(dq.reshape(F * C, tmax), hist.reshape(F * C, 4), wts.reshape(F * C, 4))
    out = out.reshape(F, C, tmax)
    # per-frame sample masks -> one flat gather per channel (no Python loop)
    keep = np.arange(tmax)[None, :] < samples[:, None]  # [F, tmax]
    chans = [out[:, c][keep] for c in range(C)]
    return np.stack(chans), file_sample_rate, file_samples


def decode_qoa_audio(data: bytes) -> Audio:
    """reference aukit.qoa (aukit.lua:1706)."""
    samples, sample_rate, _ = decode_qoa(data)
    return Audio(
        pcmcode.normalize_pcm(samples, 16, "signed"),
        sample_rate,
        {},
        {"bitDepth": 16, "dataType": "signed"},
    )
