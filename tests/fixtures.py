"""Fixture encoders: synthesize valid container/codec byte streams for tests.

Independent of the framework's writers (struct-based), per SURVEY.md §4 item 2:
the corpus is generated, decoded by both the loop reference models and the
framework, and compared.
"""

from __future__ import annotations

import struct

import numpy as np


# -- generic WAV ------------------------------------------------------------------

def wav_pcm(samples: np.ndarray, sample_rate: int, bit_depth: int, fmt_code: int | None = None) -> bytes:
    """samples: int array [C, N] (raw sample values) or float32 for fmt 3."""
    c, n = samples.shape
    inter = samples.T.reshape(-1)
    if bit_depth == 8:
        payload = inter.astype(np.uint8).tobytes()
        code = 1
    elif bit_depth == 16:
        payload = inter.astype("<i2").tobytes()
        code = 1
    elif bit_depth == 24:
        v = inter.astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v)
        b = np.empty((len(v), 3), np.uint8)
        b[:, 0], b[:, 1], b[:, 2] = v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF
        payload = b.tobytes()
        code = 1
    elif bit_depth == 32 and samples.dtype.kind == "f":
        payload = inter.astype("<f4").tobytes()
        code = 3
    else:
        payload = inter.astype("<i4").tobytes()
        code = 1
    if fmt_code is not None:
        code = fmt_code
    block_align = c * bit_depth // 8
    fmt = struct.pack("<HHIIHH", code, c, sample_rate, sample_rate * block_align, block_align, bit_depth)
    return _riff(fmt, payload)


def _riff(fmt_chunk: bytes, payload: bytes, extra_chunks: list = ()) -> bytes:
    chunks = [b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk]
    for cid, body in extra_chunks:
        chunks.append(cid + struct.pack("<I", len(body)) + body)
    chunks.append(b"data" + struct.pack("<I", len(payload)) + payload)
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_g711(data: bytes, sample_rate: int, channels: int, ulaw: bool) -> bytes:
    fmt = struct.pack("<HHIIHH", 7 if ulaw else 6, channels, sample_rate, sample_rate * channels, channels, 8)
    return _riff(fmt, data)


def wav_ima(blocks_payload: bytes, sample_rate: int, channels: int, block_align: int) -> bytes:
    fmt = struct.pack("<HHIIHHH", 0x11, channels, sample_rate, sample_rate, block_align, 4, 2)
    return _riff(fmt, blocks_payload)


def wav_msadpcm(blocks_payload: bytes, sample_rate: int, channels: int, block_align: int) -> bytes:
    spb = (block_align - 7 * channels) * 2 // channels + 2
    coeffs = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232)]
    extra = struct.pack("<HHH", 32, spb, len(coeffs)) + b"".join(struct.pack("<hh", a, b) for a, b in coeffs)
    fmt = struct.pack("<HHIIHH", 2, channels, sample_rate, sample_rate, block_align, 4) + extra
    return _riff(fmt, blocks_payload)


# -- IMA ADPCM block stream (WAV layout) ----------------------------------------------

def ima_wav_blocks(rng: np.random.Generator, nblocks: int, block_align: int, channels: int):
    """Random valid IMA block stream (headers + nibble groups)."""
    out = bytearray()
    for _ in range(nblocks):
        for _c in range(channels):
            pred = int(rng.integers(-32768, 32768))
            idx = int(rng.integers(0, 89))
            out += struct.pack("<hBx", pred, idx)
        body = rng.integers(0, 256, size=block_align - 4 * channels, dtype=np.uint8)
        out += body.tobytes()
    return bytes(out)


# -- MS ADPCM --------------------------------------------------------------------------

def ms_encode(samples: np.ndarray, block_align: int) -> bytes:
    """Real MS-ADPCM encoder (mono or stereo) so delta stays signal-scaled.
    samples: int16 [C, N]. Returns whole blocks only."""
    from tests.ref.codecs import MS_ADAPT, MS_C1, MS_C2, _clamp

    c, n = samples.shape
    data_bytes = block_align - 7 * c
    body_per_ch = 2 * data_bytes if c == 1 else data_bytes
    spb = body_per_ch + 2
    pidx = 0
    c1, c2 = MS_C1[pidx], MS_C2[pidx]
    out = bytearray()
    pos = 0
    while pos + spb <= n:
        states = []
        for ch in range(c):
            s2, s1 = int(samples[ch, pos]), int(samples[ch, pos + 1])
            seg = samples[ch, pos : pos + spb].astype(np.int64)
            delta = max(16, int(np.abs(np.diff(seg)).mean() / 4))
            states.append([delta, s1, s2])
        if c == 2:
            out += struct.pack(
                "<BBhhhhhh", pidx, pidx, states[0][0], states[1][0],
                states[0][1], states[1][1], states[0][2], states[1][2],
            )
        else:
            out += struct.pack("<Bhhh", pidx, states[0][0], states[0][1], states[0][2])
        nibs = [[] for _ in range(c)]
        for i in range(pos + 2, pos + spb):
            for ch in range(c):
                delta, s1, s2 = states[ch]
                lin = (s1 * c1 + s2 * c2) >> 8
                err = int(samples[ch, i]) - lin
                nib = _clamp(round(err / delta), -8, 7)
                pred = _clamp(lin + nib * delta, -32768, 32767)
                states[ch] = [
                    min(max((MS_ADAPT[nib] * delta) >> 8, 16), 1 << 20), pred, s1,
                ]
                nibs[ch].append(nib & 0xF)
        if c == 2:
            for hi, lo in zip(nibs[0], nibs[1]):
                out.append((hi << 4) | lo)
        else:
            seq = nibs[0]
            for k in range(0, len(seq), 2):
                out.append((seq[k] << 4) | seq[k + 1])
        pos += spb
    return bytes(out)


# -- FLAC ---------------------------------------------------------------------------------

class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int):
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


def _rice_write(w: BitWriter, v: int, param: int):
    u = 2 * v if v >= 0 else -2 * v - 1
    w.write_unary(u >> param)
    if param:
        w.write(u & ((1 << param) - 1), param)


def flac_stream_header(sample_rate: int, channels: int, depth: int, total: int, comments: dict | None = None) -> bytes:
    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", 4096, 4096)
    si += b"\x00\x00\x00" * 2  # min/max frame size
    packed = (sample_rate << 44) | ((channels - 1) << 41) | ((depth - 1) << 36) | total
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16  # MD5
    last = 0x80 if not comments else 0
    out += bytes([last | 0]) + len(si).to_bytes(3, "big") + si
    if comments:
        vc = bytearray()
        vendor = b"aukit-tpu-test"
        vc += struct.pack("<I", len(vendor)) + vendor
        vc += struct.pack("<I", len(comments))
        for k, v in comments.items():
            s = f"{k}={v}".encode()
            vc += struct.pack("<I", len(s)) + s
        out += bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc
    return bytes(out)


def _flac_crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style frame/sample number coding (1-7 bytes)."""
    if n < 0x80:
        return bytes([n])
    # count continuation bytes: payload = (6 - count) lead bits + 6*count
    for count in range(1, 7):
        if n.bit_length() <= 6 - count + 6 * count:
            lead = (0xFF << (7 - count)) & 0xFF | (n >> (6 * count))
            cont = [0x80 | ((n >> (6 * (count - 1 - k))) & 0x3F) for k in range(count)]
            return bytes([lead] + cont)
    raise ValueError("frame number too large")


def flac_frame(
    channel_data: list,  # per-subframe dicts: {"type": ..., ...}
    block_size: int,
    chan_asgn: int,
    depth_bits: int,
    frame_number: int = 0,
) -> bytes:
    w = BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)  # block size code 7: 16-bit value follows
    w.write(0, 4)  # sample rate code 0: use STREAMINFO
    w.write(chan_asgn, 4)
    w.write(0, 4)
    for b in _utf8_coded(frame_number):
        w.write(b, 8)
    w.write(block_size - 1, 16)
    w.write(_flac_crc8(w.bytes()), 8)  # real CRC8 (decoder ignores; seek checks)
    for i, sub in enumerate(channel_data):
        depth = depth_bits
        if chan_asgn == 9 and i == 0 or chan_asgn in (8, 10) and i == 1:
            depth += 1
        _write_subframe(w, sub, block_size, depth)
    w.align()
    w.write(0xBEEF, 16)  # CRC16 (ignored)
    return w.bytes()


def _write_subframe(w: BitWriter, sub: dict, block_size: int, depth: int):
    w.write(0, 1)
    wasted = sub.get("wasted", 0)
    d = depth - wasted
    if sub["type"] == "constant":
        w.write(0, 6)
        _wasted_bits(w, wasted)
        w.write(sub["value"], d)
    elif sub["type"] == "verbatim":
        w.write(1, 6)
        _wasted_bits(w, wasted)
        for v in sub["values"]:
            w.write(v, d)
    elif sub["type"] == "fixed":
        order = sub["order"]
        w.write(8 + order, 6)
        _wasted_bits(w, wasted)
        for v in sub["warmup"]:
            w.write(v, d)
        _write_residuals(w, sub, block_size, order)
    else:  # lpc
        order = sub["order"]
        w.write(31 + order, 6)
        _wasted_bits(w, wasted)
        for v in sub["warmup"]:
            w.write(v, d)
        w.write(sub["precision"] - 1, 4)
        w.write(sub["shift"], 5)
        for cf in sub["coefs"]:
            w.write(cf, sub["precision"])
        _write_residuals(w, sub, block_size, order)


def _wasted_bits(w: BitWriter, wasted: int):
    if wasted == 0:
        w.write(0, 1)
    else:
        w.write(1, 1)
        w.write(1, wasted)  # (wasted-1) zeros then a 1


def _write_residuals(w: BitWriter, sub: dict, block_size: int, order: int):
    res = sub["residuals"]
    method = sub.get("method", 0)
    w.write(method, 2)
    porder = sub.get("partition_order", 0)
    w.write(porder, 4)
    nparts = 1 << porder
    psize = block_size // nparts
    param_bits = 4 if method == 0 else 5
    escape = 0xF if method == 0 else 0x1F
    idx = 0
    for i in range(nparts):
        count = psize - (order if i == 0 else 0)
        vals = res[idx : idx + count]
        idx += count
        if sub.get("escape_partition") == i:
            w.write(escape, param_bits)
            nb = sub.get("escape_bits", 18)
            w.write(nb, 5)
            for v in vals:
                w.write(v, nb)
        else:
            param = sub.get("param", 6)
            w.write(param, param_bits)
            for v in vals:
                _rice_write(w, v, param)


# -- QOA ------------------------------------------------------------------------------------

def qoa_stream(rng: np.random.Generator, channels: int, sample_rate: int, frame_samples: list) -> bytes:
    """Random valid QOA stream: random LMS states + random slice payloads."""
    total = sum(frame_samples)
    out = bytearray(struct.pack(">4sI", b"qoaf", total))
    for samples in frame_samples:
        nslices = -(-samples // 20) * channels
        frame_size = 8 + 16 * channels + nslices * 8
        out += struct.pack(">B", channels)
        out += int(sample_rate).to_bytes(3, "big")
        out += struct.pack(">HH", samples, frame_size)
        for _c in range(channels):
            out += rng.integers(-200, 200, 4, dtype=np.int64).astype(">i2").tobytes()
            out += rng.integers(-300, 300, 4, dtype=np.int64).astype(">i2").tobytes()
        out += rng.integers(0, 256, nslices * 8, dtype=np.int64).astype(np.uint8).tobytes()
    return bytes(out)


# -- AIFF / AU / MDFPWM ------------------------------------------------------------------------

def aiff_file(samples_be: bytes, channels: int, sample_rate: int, depth: int, aifc: bool = False, compression: bytes = b"NONE") -> bytes:
    frames = len(samples_be) // (channels * max(depth // 8, 1))
    # 80-bit extended float for the sample rate
    import math

    m, e = math.frexp(sample_rate)
    mant = int(m * (1 << 64))
    exp = e - 1 + 16383
    rate80 = struct.pack(">H", exp) + mant.to_bytes(8, "big")
    comm = struct.pack(">hIh", channels, frames, depth) + rate80
    if aifc:
        comm += compression + bytes([4]) + b"test" + b"\x00"
    ssnd = struct.pack(">II", 0, 0) + samples_be
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    body = (b"AIFC" if aifc else b"AIFF") + chunks
    return b"FORM" + struct.pack(">I", len(body)) + body


def au_file(payload: bytes, encoding: int, sample_rate: int, channels: int) -> bytes:
    # The reference treats the header's data offset as a 1-based index
    # (payload read from offset-1); writing offset=25 with a 24-byte header
    # makes that quirk land exactly on the payload.
    hdr = struct.pack(">4sIIIII", b".snd", 25, len(payload), encoding, sample_rate, channels)
    return hdr + payload


def mdfpwm_file(left: bytes, right: bytes, length_pairs: int, artist=b"art", title=b"tit", album=b"alb") -> bytes:
    out = bytearray(b"MDFPWM\x03")
    out += struct.pack("<I", length_pairs)
    for s in (artist, title, album):
        out += bytes([len(s)]) + s
    for i in range(0, len(left), 6000):
        out += left[i : i + 6000].ljust(6000, b"\x00") if i + 6000 <= len(left) else left[i:]
        out += right[i : i + 6000].ljust(6000, b"\x00") if i + 6000 <= len(right) else right[i:]
    return bytes(out)
