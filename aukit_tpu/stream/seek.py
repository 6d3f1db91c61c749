"""Stream-level seek: map a target time to a decodable byte boundary
(SURVEY.md §5.4: "seek = re-init from nearest block boundary; ADPCM/QOA
blocks are self-contained; FLAC needs frame-boundary scan; DFPWM needs
decode-from-start or saved state").

``seek_point`` returns (byte_offset, landing_seconds): feed the stream from
``byte_offset`` into the matching ``stream.*`` decoder (or a batch-engine
lane) and audio resumes at ``landing_seconds`` — bit-identical to having
decoded from the start, because these codecs carry their state in-band.

DFPWM is intentionally absent: its decoder state is NOT in-band, so exact
seek requires either decode-from-start or a saved checkpoint
(BatchStreamEngine.checkpoint / ChunkResampler.get_state)."""

from __future__ import annotations

import struct


def pcm_seek(seconds: float, sample_rate: int, channels: int = 1,
             bit_depth: int = 16) -> tuple[int, float]:
    """Raw PCM: sample-exact."""
    frame = channels * (bit_depth // 8)
    n = int(seconds * sample_rate)
    return n * frame, n / sample_rate


def g711_seek(seconds: float, sample_rate: int, channels: int = 1) -> tuple[int, float]:
    n = int(seconds * sample_rate)
    return n * channels, n / sample_rate


def ima_seek(seconds: float, sample_rate: int, block_align: int,
             channels: int = 1) -> tuple[int, float]:
    """WAV-layout IMA ADPCM: nearest preceding block boundary (every block
    header re-seeds predictor+step index, aukit.lua:1511)."""
    spb = (block_align - 4 * channels) * 2 // channels
    block = int(seconds * sample_rate) // spb
    return block * block_align, block * spb / sample_rate


def msadpcm_seek(seconds: float, sample_rate: int, block_align: int,
                 channels: int = 1) -> tuple[int, float]:
    """MS ADPCM: block boundary (header carries s1/s2/delta, aukit.lua:1543)."""
    spb = (block_align - 7 * channels) * 2 // channels + 2
    block = int(seconds * sample_rate) // spb
    return block * block_align, block * spb / sample_rate


def qoa_seek(data: bytes, seconds: float) -> tuple[int, float]:
    """QOA: walk the length-prefixed frame headers (LMS state is in-band per
    frame, aukit.lua:1713). ``data`` must start at the 8-byte file header;
    the returned offset points at a frame, so feed ``header + data[off:]``
    or use it with stream.qoa's incremental source."""
    if data[:4] != b"qoaf":
        raise ValueError("Not a QOA file")
    (file_samples,) = struct.unpack_from(">I", data, 4)
    channels = data[8]
    sample_rate = int.from_bytes(data[9:12], "big")
    target = int(seconds * sample_rate)
    pos, sample_pos = 8, 0
    n = len(data)
    while pos + 16 * channels + 8 <= n and sample_pos < min(target, file_samples):
        samples, frame_size = struct.unpack_from(">HH", data, pos + 4)
        if frame_size > n - pos - 8 or sample_pos + samples > target:
            break
        sample_pos += samples
        pos += frame_size
    return pos, sample_pos / sample_rate if sample_rate else 0.0


def wav_data_seek(fmt_code: int, seconds: float, sample_rate: int, channels: int,
                  bit_depth: int, block_align: int) -> tuple[int, float]:
    """Offset within a WAV data chunk for the given fmt code (1/3 PCM float,
    6/7 G.711, 0x11 IMA, 2 MS-ADPCM)."""
    if fmt_code in (1, 3):
        return pcm_seek(seconds, sample_rate, channels, bit_depth)
    if fmt_code in (6, 7):
        return g711_seek(seconds, sample_rate, channels)
    if fmt_code == 0x11:
        return ima_seek(seconds, sample_rate, block_align, channels)
    if fmt_code == 2:
        return msadpcm_seek(seconds, sample_rate, block_align, channels)
    raise ValueError(f"no seek support for fmt code {fmt_code:#x}")
