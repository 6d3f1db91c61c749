"""Device decode paths for the batched multi-stream engine (stream/batch.py).

Each codec gets ONE pure, jittable function ``uint8[L, in_bytes] ->
float32[L, in_samples]`` (mono, loader-normalized) so a group's whole step —
byte parse -> codec kernel -> channel mixdown -> resample/FIR/int8 — fuses
into a single device dispatch (SURVEY.md §7 item 5). Block codecs (IMA/MS
ADPCM via WAV block layout, aukit.lua:1511/1543; QOA frames, aukit.lua:1713)
carry their state in-band, so a chunk of K blocks decodes as K extra kernel
lanes with NO carried codec state; only DFPWM threads decoder state across
steps (aukit.lua:2446-2468).

Geometry: every group consumes a fixed byte count per step chosen so the
decoded sample count is ~1 second of input (the reference's per-second stream
batching, aukit.lua:2617-2619), then resamples to CONFIG.output_rate.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.adpcm import MSADPCM_DEFAULT_COEFFS, ima_adpcm_scan, msadpcm_scan
from ..codecs.dfpwm import DfpwmState, dfpwm_decode
from ..codecs.qoa import QOA_DEQUANT, qoa_lms_scan

CODECS = ("dfpwm", "pcm8", "pcm8u", "pcm16", "pcm16be", "pcm24", "pcm24be",
          "pcm32", "pcm32be", "f32", "f32be", "ulaw", "alaw", "ima", "msadpcm", "qoa")

_BYTES_PER_SAMPLE = {"pcm8": 1, "pcm8u": 1, "ulaw": 1, "alaw": 1,
                     "pcm16": 2, "pcm16be": 2, "pcm24": 3, "pcm24be": 3,
                     "pcm32": 4, "pcm32be": 4, "f32": 4, "f32be": 4}

QOA_SLICES_PER_FRAME = 256
QOA_SAMPLES_PER_FRAME = QOA_SLICES_PER_FRAME * 20  # 5120


@dataclasses.dataclass(frozen=True)
class LaneSpec:
    """One stream's decode parameters. Lanes with equal specs share a group
    (one fused dispatch, one resample plan — VERDICT r1 item 2)."""

    codec: str
    sample_rate: int = 48000
    channels: int = 1
    block_align: int = 0  # ima / msadpcm block size in bytes
    chunk_bytes: int = 0  # override input bytes/step (0 = ~1 s of input)

    def __post_init__(self):
        if self.codec not in CODECS:
            raise ValueError(f"unsupported batch codec {self.codec!r}")
        if self.codec in ("ima", "msadpcm"):
            hdr = (4 if self.codec == "ima" else 7) * self.channels
            if self.block_align <= hdr:
                raise ValueError(f"{self.codec} needs block_align > {hdr}")
        if self.codec == "dfpwm" and self.channels != 1:
            raise ValueError("dfpwm batch lanes are mono; use one lane per channel")
        if self.channels not in (1, 2) and self.codec in ("ima", "msadpcm", "qoa"):
            raise ValueError(f"{self.codec} batch lanes support 1-2 channels")


def lane_spec_for_wav(data: bytes) -> tuple[LaneSpec, int, int]:
    """Map a WAV header to an engine lane: (spec, data_offset, data_size).

    Feed ``data[data_offset : data_offset + data_size]`` to the lane — the
    container-to-engine bridge so a fleet of WAV files (PCM 8/16, G.711,
    IMA/MS ADPCM, DFPWM-in-WAV) batches without manual specs (reference
    dispatch surface aukit.lua:2992-2996)."""
    import struct

    from ..containers.wav import parse_fmt

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("invalid WAV file")
    pos = 12
    fmt = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        if cid == b"fmt ":
            fmt = parse_fmt(data[pos : pos + size])
        elif cid == b"data":
            if fmt is None:
                raise ValueError("invalid WAV file")
            data_type, channels, rate, block_align, bit_depth, _co = fmt
            codec = {
                "signed": {16: "pcm16", 24: "pcm24", 32: "pcm32"}.get(bit_depth),
                "unsigned": "pcm8u" if bit_depth == 8 else None,
                "float": "f32" if bit_depth == 32 else None,
                "alaw": "alaw", "ulaw": "ulaw",
                "adpcm": "ima", "msadpcm": "msadpcm", "dfpwm": "dfpwm",
            }.get(data_type)
            if codec is None:
                raise ValueError(f"no engine lane mapping for WAV {data_type}/{bit_depth}")
            spec = LaneSpec(codec, rate, 1 if codec == "dfpwm" else channels,
                            block_align=block_align if codec in ("ima", "msadpcm") else 0)
            return spec, pos, size
        pos += size + (size % 2)
    raise ValueError("invalid WAV file")


def lane_spec_for_aiff(data: bytes) -> tuple[LaneSpec, int, int]:
    """AIFF/AIFC header -> (spec, data_offset, data_size). Compressions:
    NONE (BE PCM16), sowt (LE), alaw/ulaw (aukit.lua:1576-1634)."""
    import struct

    if data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF file")
    is_aifc = data[8:12] == b"AIFC"
    pos = 12
    meta = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from(">I", data, pos + 4)
        pos += 8
        if cid == b"COMM":
            from ..containers.aiff import parse_comm_rate

            channels, _frames, depth, e = struct.unpack_from(">hIhH", data, pos)
            m = int.from_bytes(data[pos + 10 : pos + 17], "big")
            comp = data[pos + 18 : pos + 22].decode("latin-1") if is_aifc else "NONE"
            rate = int(parse_comm_rate(e, m))
            meta = (channels, depth, rate, comp)
        elif cid == b"SSND":
            if meta is None:
                raise ValueError("invalid AIFF file")
            channels, depth, rate, comp = meta
            offset, _align = struct.unpack_from(">II", data, pos)
            codec = {"NONE": {16: "pcm16be", 24: "pcm24be", 32: "pcm32be"}.get(depth),
                     "sowt": {16: "pcm16", 24: "pcm24", 32: "pcm32"}.get(depth),
                     "fl32": "f32be", "FL32": "f32be",
                     "alaw": "alaw", "ALAW": "alaw",
                     "ulaw": "ulaw", "ULAW": "ulaw"}.get(comp)
            if codec is None:
                raise ValueError(f"no engine lane mapping for AIFF {comp}/{depth}")
            return (LaneSpec(codec, rate, channels), pos + 8 + offset, size - 8 - offset)
        pos += size + (size % 2)
    raise ValueError("invalid AIFF file")


def lane_spec_for_au(data: bytes) -> tuple[LaneSpec, int, int]:
    """AU header -> (spec, data_offset, data_size); encodings 1 µ-law,
    2-5 BE PCM 8/16/24/32, 6 f32 BE, 27 A-law (aukit.lua:1636-1651, incl.
    the 1-based offset quirk Q20)."""
    from ..containers.au import parse_au_header

    offset, size, encoding, rate, channels = parse_au_header(bytes(data))
    codec = {1: "ulaw", 2: "pcm8", 3: "pcm16be", 4: "pcm24be", 5: "pcm32be",
             6: "f32be", 27: "alaw"}.get(encoding)
    if codec is None:
        raise ValueError(f"no engine lane mapping for AU encoding {encoding}")
    start = offset - 1  # reference 1-based offset quirk
    if size == 0xFFFFFFFF:
        size = len(data) - start
    return LaneSpec(codec, rate, channels), start, size


def lane_spec_for_qoa(data: bytes) -> tuple[LaneSpec, int, int]:
    """QOA file header -> (spec, data_offset, data_size): strips the 8-byte
    ``qoaf`` header (aukit.lua:1713-1717) so raw QOA files feed engine lanes
    directly; the trailing short frame is handled by the decoder's
    header-count masking."""
    if data[:4] != b"qoaf":
        raise ValueError("Not a QOA file")
    channels = data[8]
    rate = int.from_bytes(bytes(data[9:12]), "big")
    return LaneSpec("qoa", rate, channels), 8, len(data) - 8


def mdfpwm_to_lanes(data: bytes):
    """MDFPWMv3 -> two mono DFPWM engine lanes (aukit.lua:1416-1448): parse
    the header, de-interleave the alternating 6000-byte L/R blocks, and trim
    each lane to length//2 bytes (the loader's length*8-sample trim split
    across the two channels). Returns (LaneSpec, left_bytes, right_bytes)."""
    from ..containers.mdfpwm import parse_mdfpwm_header

    length, _artist, _title, _album, hdr = parse_mdfpwm_header(bytes(data))
    arr = np.frombuffer(bytes(data), np.uint8, count=len(data) - hdr, offset=hdr)
    nb = len(arr) // 12000
    pairs = arr[: nb * 12000].reshape(nb, 2, 6000)
    left = bytearray(pairs[:, 0].reshape(-1).tobytes())
    right = bytearray(pairs[:, 1].reshape(-1).tobytes())
    tail = arr[nb * 12000 :]
    left += tail[:6000].tobytes()
    right += tail[6000:].tobytes()
    per = length // 2
    return LaneSpec("dfpwm", 48000, 1), bytes(left[:per]), bytes(right[:per])


def geometry(spec: LaneSpec) -> tuple[int, int]:
    """(in_bytes, in_samples) consumed/decoded per lane per step."""
    r, ch, ba = spec.sample_rate, spec.channels, spec.block_align
    if spec.codec == "dfpwm":
        n = spec.chunk_bytes or r // 8
        return n, n * 8
    bps = _BYTES_PER_SAMPLE.get(spec.codec)
    if bps is not None:
        n = spec.chunk_bytes or bps * r * ch
        return n, n // (bps * ch)
    if spec.codec == "ima":
        spb = (ba - 4 * ch) * 2 // ch
        k = max(1, -(-spec.chunk_bytes // ba)) if spec.chunk_bytes else -(-r // spb)
        return k * ba, k * spb
    if spec.codec == "msadpcm":
        spb = (ba - 7 * ch) * 2 // ch + 2
        k = max(1, -(-spec.chunk_bytes // ba)) if spec.chunk_bytes else -(-r // spb)
        return k * ba, k * spb
    # qoa
    fb = 8 + ch * (16 + QOA_SLICES_PER_FRAME * 8)
    k = max(1, -(-spec.chunk_bytes // fb)) if spec.chunk_bytes else -(-r // QOA_SAMPLES_PER_FRAME)
    return k * fb, k * QOA_SAMPLES_PER_FRAME


def _norm16(v: jnp.ndarray) -> jnp.ndarray:
    """Asymmetric 16-bit normalize (aukit.lua:1255/1765)."""
    return v.astype(jnp.float32) / jnp.where(v < 0, 32768.0, 32767.0)


def _norm8(v: jnp.ndarray) -> jnp.ndarray:
    return v.astype(jnp.float32) / jnp.where(v < 0, 128.0, 127.0)


def _mono(f: jnp.ndarray) -> jnp.ndarray:
    """[..., C, T] -> [..., T] mean mixdown (aukit.lua:685-687)."""
    return f if f.ndim == 2 else jnp.mean(f, axis=-2)


def _le16(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    v = lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 8)
    return jnp.where(v >= 32768, v - 65536, v)


def _be16(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    v = (hi.astype(jnp.int32) << 8) | lo.astype(jnp.int32)
    return jnp.where(v >= 32768, v - 65536, v)


# -- per-codec decoders (bytes -> float; mono [L, T] or per-channel
# [L, C, T] — the batched analog of the reference's per-channel chunk
# contract, aukit.lua:2223-2227) ----------------------------------------------

def _frames(spec: LaneSpec, f: jnp.ndarray, mono: bool = True) -> jnp.ndarray:
    """Interleaved samples -> mono [L, T] (mean mixdown, aukit.lua:685-687)
    or, with ``mono=False``, per-channel [L, C, T]."""
    L = f.shape[0]
    x = jnp.moveaxis(f.reshape(L, -1, spec.channels), -1, -2)
    return _mono(x) if mono else x


def _decode_pcm8(spec: LaneSpec, b: jnp.ndarray, mono: bool = True) -> jnp.ndarray:
    v = b.astype(jnp.int32)
    v = jnp.where(v >= 128, v - 256, v)
    return _frames(spec, _norm8(v), mono)


def _decode_pcm8u(spec: LaneSpec, b: jnp.ndarray, mono: bool = True) -> jnp.ndarray:
    """Unsigned 8-bit (WAV): bias 128 then asymmetric normalize (Q1 path,
    aukit.lua:1088/1152)."""
    v = b.astype(jnp.int32) - 128
    return _frames(spec, _norm8(v), mono)


def _decode_pcm24(spec: LaneSpec, b: jnp.ndarray, mono: bool = True) -> jnp.ndarray:
    x = b.astype(jnp.int32)
    if spec.codec.endswith("be"):
        v = (x[:, 0::3] << 16) | (x[:, 1::3] << 8) | x[:, 2::3]
    else:
        v = (x[:, 2::3] << 16) | (x[:, 1::3] << 8) | x[:, 0::3]
    v = jnp.where(v >= 1 << 23, v - (1 << 24), v)
    f = v.astype(jnp.float32) / jnp.where(v < 0, 8388608.0, 8388607.0)
    return _frames(spec, f, mono)


def _u32_words(b: jnp.ndarray, big_endian: bool) -> jnp.ndarray:
    u = b.astype(jnp.uint32)
    if big_endian:
        return (u[:, 0::4] << 24) | (u[:, 1::4] << 16) | (u[:, 2::4] << 8) | u[:, 3::4]
    return (u[:, 3::4] << 24) | (u[:, 2::4] << 16) | (u[:, 1::4] << 8) | u[:, 0::4]


def _decode_pcm32(spec: LaneSpec, b: jnp.ndarray, mono: bool = True) -> jnp.ndarray:
    v = jax.lax.bitcast_convert_type(_u32_words(b, spec.codec.endswith("be")), jnp.int32)
    f = v.astype(jnp.float32) / jnp.where(v < 0, 2147483648.0, 2147483647.0)
    return _frames(spec, f, mono)


def _decode_f32(spec: LaneSpec, b: jnp.ndarray, mono: bool = True) -> jnp.ndarray:
    """Raw IEEE f32 samples, used directly like the reference's float loader
    (aukit.lua:1102: no normalization)."""
    f = jax.lax.bitcast_convert_type(_u32_words(b, spec.codec.endswith("be")), jnp.float32)
    return _frames(spec, f, mono)


def _decode_pcm16(spec: LaneSpec, b: jnp.ndarray, mono: bool = True) -> jnp.ndarray:
    if spec.codec == "pcm16be":
        v = _be16(b[:, 0::2], b[:, 1::2])
    else:
        v = _le16(b[:, 0::2], b[:, 1::2])
    L = v.shape[0]
    f = jnp.moveaxis(_norm16(v).reshape(L, -1, spec.channels), -1, -2)
    return _mono(f) if mono else f


def _decode_g711(spec: LaneSpec, b: jnp.ndarray, mono: bool = True) -> jnp.ndarray:
    from ..codecs.g711 import decode_g711_device

    f = decode_g711_device(b, spec.codec == "ulaw", spec.channels, 0x2000)
    return _mono(f) if mono else f


def _decode_ima(spec: LaneSpec, b: jnp.ndarray, use_pallas: bool,
                mono: bool = True) -> jnp.ndarray:
    """WAV-layout IMA blocks (aukit.lua:1511-1541): per-channel 4 B headers,
    then (stereo) channel-alternating 4-byte nibble groups; low nibble first."""
    ba, ch = spec.block_align, spec.channels
    L = b.shape[0]
    blk = b.reshape(L, -1, ba).astype(jnp.int32)
    K = blk.shape[1]
    if ch == 1:
        pred = _le16(blk[..., 0], blk[..., 1])
        sidx = blk[..., 2] & 0x0F  # mono header quirk Q13 (aukit.lua:1544)
        body = blk[..., 4:]
        nibs = jnp.stack([body & 0x0F, body >> 4], axis=-1).reshape(L, K, -1)
        lanes = nibs.reshape(L * K, -1)
        pred0, sidx0 = pred.reshape(-1), sidx.reshape(-1)
    else:
        pred_l = _le16(blk[..., 0], blk[..., 1])
        pred_r = _le16(blk[..., 4], blk[..., 5])
        # clamp instead of erroring: a malformed lane must not kill the batch
        # (SURVEY.md §5.3); the strict loader path validates and raises
        sidx_l = jnp.clip(blk[..., 2], 0, 88)
        sidx_r = jnp.clip(blk[..., 6], 0, 88)
        body = blk[..., 8:].reshape(L, K, -1, 2, 4)  # [L, K, groups, chan, 4B]
        nib2 = jnp.stack([body & 0x0F, body >> 4], axis=-1)  # low nibble first
        # -> [L, K, chan, groups*8]
        nibs = jnp.moveaxis(nib2, 3, 2).reshape(L, K, 2, -1)
        lanes = nibs.reshape(L * K * 2, -1)
        pred0 = jnp.stack([pred_l, pred_r], axis=-1).reshape(-1)
        sidx0 = jnp.stack([sidx_l, sidx_r], axis=-1).reshape(-1)
    if use_pallas:
        from ..kernels.ima_pallas import ima_decode_pallas

        out, _ = ima_decode_pallas(lanes, pred0, sidx0)
        out = out.astype(jnp.int32)
    else:
        out, _ = ima_adpcm_scan(lanes, pred0, sidx0)
    if ch == 1:
        flat = _norm16(out.reshape(L, -1))
        return flat if mono else flat[:, None, :]
    f = _norm16(out).reshape(L, K, 2, -1)
    if mono:
        return _mono(f).reshape(L, -1)
    return jnp.moveaxis(f, 2, 1).reshape(L, 2, -1)


def _decode_msadpcm(spec: LaneSpec, b: jnp.ndarray, use_pallas: bool,
                    mono: bool = True) -> jnp.ndarray:
    """MS ADPCM blocks (aukit.lua:1283-1353): stereo header <BBhhhhhh with
    channel-alternating nibbles (hi=L, lo=R); mono header <Bhhh. The two
    header samples (s2 then s1) are emitted before the predictors."""
    ba, ch = spec.block_align, spec.channels
    c1_tbl = jnp.asarray(MSADPCM_DEFAULT_COEFFS[0])
    c2_tbl = jnp.asarray(MSADPCM_DEFAULT_COEFFS[1])
    L = b.shape[0]
    blk = b.reshape(L, -1, ba).astype(jnp.int32)
    K = blk.shape[1]
    if ch == 1:
        pidx = jnp.clip(blk[..., 0], 0, 6).reshape(-1)
        delta = _le16(blk[..., 1], blk[..., 2]).reshape(-1)
        s1 = _le16(blk[..., 3], blk[..., 4]).reshape(-1)
        s2 = _le16(blk[..., 5], blk[..., 6]).reshape(-1)
        body = blk[..., 7:]
        nib = jnp.stack([body >> 4, body & 0x0F], axis=-1).reshape(L * K, -1)
    else:
        pidx = jnp.clip(blk[..., 0:2], 0, 6)
        delta_l = _le16(blk[..., 2], blk[..., 3])
        delta_r = _le16(blk[..., 4], blk[..., 5])
        s1_l = _le16(blk[..., 6], blk[..., 7])
        s1_r = _le16(blk[..., 8], blk[..., 9])
        s2_l = _le16(blk[..., 10], blk[..., 11])
        s2_r = _le16(blk[..., 12], blk[..., 13])
        body = blk[..., 14:]
        nib_lr = jnp.stack([body >> 4, body & 0x0F], axis=-2)  # [L, K, 2, T]
        nib = nib_lr.reshape(L * K * 2, -1)
        pidx = pidx.reshape(-1)
        delta = jnp.stack([delta_l, delta_r], axis=-1).reshape(-1)
        s1 = jnp.stack([s1_l, s1_r], axis=-1).reshape(-1)
        s2 = jnp.stack([s2_l, s2_r], axis=-1).reshape(-1)
    nib = jnp.where(nib >= 8, nib - 16, nib)
    c1, c2 = jnp.take(c1_tbl, pidx), jnp.take(c2_tbl, pidx)
    if use_pallas:
        from ..kernels.msadpcm_pallas import msadpcm_decode_pallas

        preds, _ = msadpcm_decode_pallas(nib, s1, s2, delta, c1, c2)
    else:
        preds = msadpcm_scan(nib, c1, c2, delta, s1, s2)
    full = jnp.concatenate([s2[:, None], s1[:, None], preds], axis=1)  # [lanes, 2+T]
    if ch == 1:
        flat = _norm16(full.reshape(L, -1))
        return flat if mono else flat[:, None, :]
    f = _norm16(full).reshape(L, K, 2, -1)
    if mono:
        return _mono(f).reshape(L, -1)
    return jnp.moveaxis(f, 2, 1).reshape(L, 2, -1)


def _qoa_dequant_device(sf, res):
    """``QOA_DEQUANT[sf, res]`` without a device gather (TPU gathers
    serialize — an elementwise jnp.take runs ~10 ns/element while this
    decomposition fuses into the surrounding VPU work): the table's odd
    columns are the negated even columns, so the four positive magnitudes
    select per SLICE via a 16-way where-chain on the slice-shaped ``sf``
    (1/20th of the samples) and each sample picks its column/sign from the
    3-bit residual arithmetically. Bit-equal to the table
    (test_batch::test_qoa_dequant_device_matches_table)."""
    M = np.asarray(QOA_DEQUANT)[:, 0::2]  # [16, 4] positive magnitudes
    cols = []
    for j in range(4):
        v = jnp.full_like(sf, int(M[0, j]))
        for s in range(1, 16):
            v = jnp.where(sf == s, int(M[s, j]), v)
        cols.append(v[..., None])  # [L, K, S, ch, 1]
    j = res >> 1  # [L, K, S, ch, 20]
    m = jnp.where(j == 0, cols[0],
                  jnp.where(j == 1, cols[1],
                            jnp.where(j == 2, cols[2], cols[3])))
    return jnp.where((res & 1) == 1, -m, m)


def _decode_qoa(spec: LaneSpec, b: jnp.ndarray, use_pallas: bool = False,
                mono: bool = True) -> jnp.ndarray:
    """QOA frames (aukit.lua:1713-1775): 8 B header + per-channel LMS state +
    64-bit big-endian slices interleaved one-per-channel per 20-sample group.
    Residual extraction is pure uint32 shift/mask math on the VPU; samples
    beyond the header's sample count (short trailing frames) are masked."""
    ch = spec.channels
    fb = 8 + ch * (16 + QOA_SLICES_PER_FRAME * 8)
    L = b.shape[0]
    blk = b.reshape(L, -1, fb)
    K = blk.shape[1]
    samples = (blk[..., 4].astype(jnp.int32) << 8) | blk[..., 5].astype(jnp.int32)
    hdr = blk[..., 8 : 8 + 16 * ch].astype(jnp.int32).reshape(L, K, ch, 2, 4, 2)
    state16 = _be16(hdr[..., 0], hdr[..., 1])  # [L, K, ch, 2, 4]
    hist = state16[..., 0, :].reshape(L * K * ch, 4)
    wts = state16[..., 1, :].reshape(L * K * ch, 4)
    sl = blk[..., 8 + 16 * ch :].astype(jnp.uint32)
    sl = sl.reshape(L, K, QOA_SLICES_PER_FRAME, ch, 8)
    hi = (sl[..., 0] << 24) | (sl[..., 1] << 16) | (sl[..., 2] << 8) | sl[..., 3]
    lo = (sl[..., 4] << 24) | (sl[..., 5] << 16) | (sl[..., 6] << 8) | sl[..., 7]
    sf = (hi >> 28).astype(jnp.int32)  # [L, K, S, ch]
    res = []
    for i in range(20):
        pos = 57 - 3 * i  # LSB index of residual i within the 64-bit slice
        if pos >= 32:
            r = (hi >> (pos - 32)) & 7
        elif pos == 30:  # straddles the word boundary (i == 9)
            r = ((hi & 1) << 2) | (lo >> 30)
        else:
            r = (lo >> pos) & 7
        res.append(r.astype(jnp.int32))
    res = jnp.stack(res, axis=-1)  # [L, K, S, ch, 20]
    dq = _qoa_dequant_device(sf, res)  # [L, K, S, ch, 20]
    dq = jnp.moveaxis(dq, 3, 2).reshape(L * K * ch, -1)  # [L*K*ch, 5120]
    if use_pallas:
        from ..kernels.qoa_pallas import qoa_lms_pallas

        recon, _ = qoa_lms_pallas(dq, hist, wts)
    else:
        recon, _ = qoa_lms_scan(dq, hist, wts)
    recon = recon.reshape(L, K, ch, QOA_SAMPLES_PER_FRAME)
    t = jnp.arange(QOA_SAMPLES_PER_FRAME, dtype=jnp.int32)
    recon = jnp.where(t[None, None, None, :] < samples[..., None, None], recon, 0)
    if mono:  # mean of the int samples, then the asymmetric normalize
        return _norm16(_mono(recon)).reshape(L, -1)
    return _norm16(jnp.moveaxis(recon, 2, 1)).reshape(L, ch, -1)


def build_decoder(spec: LaneSpec, use_pallas: bool, mono: bool = True):
    """Return (fn, stateful): fn(bytes_u8, state) -> (f32 samples, state).
    Samples are mono [L, in_samples] by default, or per-channel
    [L, C, in_samples] with ``mono=False`` (the batched analog of the
    reference's per-channel chunks, aukit.lua:2223-2227). Only DFPWM threads
    codec state between steps; all block codecs read their state in-band.
    ``fn`` is pure/jittable (Pallas calls trace under jit)."""
    if spec.codec == "dfpwm":
        if use_pallas:
            from ..kernels.dfpwm_pallas import dfpwm_decode_pallas

            def fn(b, state):
                decoded, new_state = dfpwm_decode_pallas(b, state)
                f = _norm8(decoded.astype(jnp.int32))
                return (f if mono else f[:, None, :]), new_state
        else:
            def fn(b, state):
                decoded, new_state = dfpwm_decode(b, state)
                f = _norm8(decoded)
                return (f if mono else f[:, None, :]), new_state
        return fn, True
    decoders = {
        "pcm8": _decode_pcm8,
        "pcm8u": _decode_pcm8u,
        "pcm16": _decode_pcm16,
        "pcm16be": _decode_pcm16,
        "pcm24": _decode_pcm24,
        "pcm24be": _decode_pcm24,
        "pcm32": _decode_pcm32,
        "pcm32be": _decode_pcm32,
        "f32": _decode_f32,
        "f32be": _decode_f32,
        "ulaw": _decode_g711,
        "alaw": _decode_g711,
    }
    if spec.codec in ("ima", "msadpcm", "qoa"):
        base = {"ima": _decode_ima, "msadpcm": _decode_msadpcm, "qoa": _decode_qoa}[spec.codec]

        def fn(b, state):
            return base(spec, b, use_pallas, mono), state
    else:
        dec = decoders[spec.codec]

        def fn(b, state):
            return dec(spec, b, mono), state
    return fn, False


def init_state(spec: LaneSpec, lanes: int):
    if spec.codec == "dfpwm":
        return DfpwmState.zeros(lanes)
    return ()
