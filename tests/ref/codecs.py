"""Loop-based reference decoders: PCM, G.711, IMA/MS ADPCM, QOA, DFPWM.

Each function mirrors the corresponding aukit.lua loop sample by sample in
float64/int Python math (Lua numbers are doubles; all these integer codecs stay
exact). Used as the parity oracle for the framework's vectorized codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# -- PCM (aukit.lua:1049-1171) --------------------------------------------------

def pcm_ref(data, bit_depth=8, data_type="signed", channels=1, interleaved=True, big_endian=False):
    max_value = float(1 << (bit_depth - 1))
    vals = []
    if isinstance(data, (bytes, bytearray)):
        order = ">" if big_endian else "<"
        n = len(data) // (bit_depth // 8)
        for i in range(n):
            off = i * (bit_depth // 8)
            if bit_depth == 24:
                b = data[off : off + 3]
                if big_endian:
                    v = (b[0] << 16) | (b[1] << 8) | b[2]
                else:
                    v = (b[2] << 16) | (b[1] << 8) | b[0]
                if data_type == "signed" and v >= 1 << 23:
                    v -= 1 << 24
            elif data_type == "float":
                (v,) = struct.unpack_from(order + "f", data, off)
            else:
                fmt = {8: "b", 16: "h", 32: "i"}[bit_depth]
                if data_type == "unsigned":
                    fmt = fmt.upper()
                (v,) = struct.unpack_from(order + fmt, data, off)
            vals.append(v)
    else:
        vals = list(data)
    out = []
    for v in vals:
        if data_type == "float":
            out.append(v)
        elif data_type == "signed":
            out.append(v / (max_value if v < 0 else max_value - 1))
        else:  # unsigned, quirk Q1: pivot/bias 128 for all depths
            out.append((v - 128) / (max_value if v < 128 else max_value - 1))
    n = len(out) // channels
    chans = [[0.0] * n for _ in range(channels)]
    if interleaved:
        for i in range(n):
            for c in range(channels):
                chans[c][i] = out[i * channels + c]
    else:
        for c in range(channels):
            chans[c] = out[c * n : (c + 1) * n]
    return np.array(chans, dtype=np.float64)


# -- G.711 (aukit.lua:1361-1384) ---------------------------------------------------

def g711_ref(data: bytes, ulaw: bool, channels=1, denom=0x2000):
    xor = 0xFF if ulaw else 0x55
    out = [[] for _ in range(channels)]
    for i, raw in enumerate(data):
        b = raw ^ xor
        m = b & 0x0F
        e = (b >> 4) & 0x7
        if not ulaw and e == 0:
            m = m * 4 + 2
        else:
            m = (m * 2 + 33) << e
        if ulaw:
            m -= 33
        neg = ((b & 0x80) != 0) == ulaw
        out[i % channels].append(m / (-denom if neg else denom))
    n = min(len(c) for c in out)
    return np.array([c[:n] for c in out], dtype=np.float64)


# -- IMA ADPCM (aukit.lua:1243-1272) -------------------------------------------------

IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
IMA_STEP = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230,
    253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963,
    1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
    3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def _clamp(n, lo, hi):
    return lo if n < lo else hi if n > hi else n


def ima_ref(nibbles, predictor=0, step_index=0):
    """Single-lane IMA recurrence -> list of int predictors."""
    out = []
    for nib in nibbles:
        step = IMA_STEP[step_index]
        step_index = _clamp(step_index + IMA_INDEX[nib], 0, 88)
        diff = (((nib % 8) * step) >> 2) + (step >> 3)
        if nib >= 8:
            predictor = _clamp(predictor - diff, -32768, 32767)
        else:
            predictor = _clamp(predictor + diff, -32768, 32767)
        out.append(predictor)
    return out


def nibbles_from_bytes(data: bytes, top_first: bool = True):
    out = []
    for b in data:
        if top_first:
            out += [b >> 4, b & 0x0F]
        else:
            out += [b & 0x0F, b >> 4]
    return out


# -- MS ADPCM (aukit.lua:1316-1348) ---------------------------------------------------

MS_ADAPT = {
    -8: 768, -7: 614, -6: 512, -5: 409, -4: 307, -3: 230, -2: 230, -1: 230,
    0: 230, 1: 230, 2: 230, 3: 230, 4: 307, 5: 409, 6: 512, 7: 614,
}
MS_C1 = [256, 512, 0, 192, 240, 460, 392]
MS_C2 = [0, -256, 0, 64, 0, -208, -232]


def ms_block_ref(nibbles, pidx, delta, sample1, sample2, coeffs=None):
    """Within-block recurrence -> list of ints (headers NOT included)."""
    c1 = (coeffs[0] if coeffs else MS_C1)[pidx]
    c2 = (coeffs[1] if coeffs else MS_C2)[pidx]
    out = []
    for nib in nibbles:
        import math

        pred = _clamp(math.floor((sample1 * c1 + sample2 * c2) / 256) + nib * delta, -32768, 32767)
        out.append(pred)
        sample2, sample1 = sample1, pred
        # same defensive delta cap as the framework (valid data never reaches it)
        delta = min(max(math.floor(MS_ADAPT[nib] * delta / 256), 16), 1 << 20)
    return out


def msadpcm_ref(data: bytes, block_align: int, channels: int, coeffs=None,
                mono_header_from_first_block: bool = True):
    """Whole-stream loader semantics (incl. the mono header-reuse quirk)."""
    left, right = [], []
    first_hdr = None
    for n in range(0, len(data), block_align):
        block = data[n : n + block_align]
        if channels == 2:
            if len(block) < 14:
                break
            pl, pr, dl, dr, s1l, s1r, s2l, s2r = struct.unpack_from("<BBhhhhhh", block, 0)
            for s, chan in ((s2l, left), (s1l, left), (s2r, right), (s1r, right)):
                chan.append(s)
            nl, nr = [], []
            for b in block[14:]:
                hi, lo = b >> 4, b & 0x0F
                nl.append(hi - 16 if hi >= 8 else hi)
                nr.append(lo - 16 if lo >= 8 else lo)
            outl = ms_block_ref(nl, pl, dl, s1l, s2l, coeffs)
            outr = ms_block_ref(nr, pr, dr, s1r, s2r, coeffs)
            # interleaved emission order doesn't matter per channel
            left += outl
            right += outr
        else:
            if len(block) < 7:
                break
            hdr = struct.unpack_from("<Bhhh", block, 0)
            if first_hdr is None:
                first_hdr = hdr
            if mono_header_from_first_block:
                hdr = first_hdr  # aukit.lua:1316 unpacks from the stream start
            p, d, s1, s2 = hdr
            left += [s2, s1]
            nibs = []
            for b in block[7:]:
                hi, lo = b >> 4, b & 0x0F
                nibs.append(hi - 16 if hi >= 8 else hi)
                nibs.append(lo - 16 if lo >= 8 else lo)
            left += ms_block_ref(nibs, p, d, s1, s2, coeffs)
    if channels == 2:
        n = min(len(left), len(right))
        return np.array([left[:n], right[:n]], dtype=np.int64)
    return np.array([left], dtype=np.int64)


def norm16(arr):
    a = np.asarray(arr, dtype=np.float64)
    return a / np.where(a < 0, 32768.0, 32767.0)


# -- QOA (aukit.lua:1681-1777) ----------------------------------------------------------

QOA_DEQUANT = [
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
]


def _srs(a, b):
    """signed_rshift via 32-bit coercion (aukit.lua:1681)."""
    n = (a & 0xFFFFFFFF) >> b
    # replicate arithmetic shift: sign-extend before shifting
    v = a & 0xFFFFFFFF
    if v >= 0x80000000:
        v -= 0x100000000
    n = v >> b
    return n


def qoa_ref(data: bytes):
    """Full-file decode -> (int samples [C][N], sample_rate, file_samples)."""
    magic, file_samples = struct.unpack_from(">4sI", data, 0)
    assert magic == b"qoaf"
    file_channels = data[8]
    file_rate = int.from_bytes(data[9:12], "big")
    pos = 8
    out = [[] for _ in range(file_channels)]
    lms = [{"h": [0, 0, 0, 0], "w": [0, 0, 0, 0]} for _ in range(file_channels)]
    sample_pos = 0
    n = len(data)
    while pos + 16 * file_channels + 8 <= n and sample_pos < file_samples:
        channels = data[pos]
        samplerate = int.from_bytes(data[pos + 1 : pos + 4], "big")
        samples, frame_size = struct.unpack_from(">HH", data, pos + 4)
        p = pos + 8
        data_size = frame_size - 8 - 4 * 4 * channels
        num_slices = data_size // 8
        if (
            channels != file_channels
            or samplerate != file_rate
            or frame_size > n - pos - 8
            or samples * channels > num_slices * 20
        ):
            break
        for c in range(channels):
            lms[c]["h"] = list(struct.unpack_from(">4h", data, p))
            lms[c]["w"] = list(struct.unpack_from(">4h", data, p + 8))
            p += 16
        for sample_index in range(0, samples, 20):
            for c in range(channels):
                hi, lo = struct.unpack_from(">II", data, p)
                p += 8
                sf = (hi >> 28) & 0xF
                for _ in range(20):
                    h, w = lms[c]["h"], lms[c]["w"]
                    predicted = _srs(w[0] * h[0] + w[1] * h[1] + w[2] * h[2] + w[3] * h[3], 13)
                    quantized = (hi >> 25) & 0x7
                    dq = QOA_DEQUANT[sf][quantized]
                    recon = _clamp(predicted + dq, -32768, 32767)
                    out[c].append(recon)
                    hi = ((hi << 3) & 0xFFFFFFFF) + ((lo >> 29) & 0x7)
                    lo = (lo << 3) & 0xFFFFFFFF
                    delta = _srs(dq, 4)
                    for k in range(4):
                        w[k] += -delta if h[k] < 0 else delta
                    lms[c]["h"] = h[1:] + [recon]
        sample_pos += samples
        pos += frame_size
    return np.array(out, dtype=np.int64), file_rate, file_samples


# -- DFPWM1a (framework spec; see aukit_tpu/codecs/dfpwm.py) -----------------------------

def dfpwm_decode_ref(data: bytes, prec=10, lp_num=140):
    charge = strength = 0
    prev_bit = 0
    prev_charge = 0
    lowpass = 0
    half = 1 << (prec - 1)
    smax = (1 << prec) - 1
    out = []
    for byte in data:
        for k in range(8):
            bit = (byte >> k) & 1
            target = 127 if bit else -128
            nq = charge + ((strength * (target - charge) + half) >> prec)
            if nq == charge and nq != target:
                nq += 1 if bit else -1
            z = smax if bit == prev_bit else 0
            if strength != z:
                strength += 1 if bit == prev_bit else -1
            if strength < (1 << (prec - 7)):  # canonical dfpwm1a floor
                strength = 1 << (prec - 7)
            if bit != prev_bit:
                aj = (nq + prev_charge + 1) >> 1
            else:
                aj = nq
            charge = nq
            prev_charge = nq
            prev_bit = bit
            lowpass += ((aj - lowpass) * lp_num + 0x80) >> 8
            out.append(lowpass)
    return out


def dfpwm_encode_ref(levels, prec=10):
    charge = strength = 0
    prev_bit = 0
    half = 1 << (prec - 1)
    smax = (1 << prec) - 1
    out = bytearray()
    byte = 0
    for i, level in enumerate(levels):
        bit = 1 if (level > charge or (level == charge and charge == 127)) else 0
        target = 127 if bit else -128
        nq = charge + ((strength * (target - charge) + half) >> prec)
        if nq == charge and nq != target:
            nq += 1 if bit else -1
        z = smax if bit == prev_bit else 0
        if strength != z:
            strength += 1 if bit == prev_bit else -1
        if strength < (1 << (prec - 7)):  # canonical dfpwm1a floor
            strength = 1 << (prec - 7)
        charge, prev_bit = nq, bit
        byte |= bit << (i % 8)
        if i % 8 == 7:
            out.append(byte)
            byte = 0
    return bytes(out)
