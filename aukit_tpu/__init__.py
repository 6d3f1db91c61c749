"""aukit-tpu: a TPU-native batched audio decode & DSP framework.

A from-scratch rebuild of the capabilities of MCJack123/AUKit (the Lua
reference mounted at /root/reference) designed for JAX/XLA/Pallas: codecs are
lane-batched device kernels, resampling/effects are fused array transforms, and
the streaming pipeline decodes thousands of concurrent streams per dispatch.

Public surface mirrors the reference module (aukit.lua:1026-2195):
  loaders      : pcm, adpcm, msadpcm, g711, dfpwm, mdfpwm, wav, aiff, au, flac, qoa
  generators   : new, tone, noise
  utilities    : pack, detect
  streaming    : stream.pcm/.wav/.dfpwm/... (chunked 48 kHz int8 iterators)
  playback     : play, player
  effects      : effects.amplify/.fade/.normalize/...
plus the framework-native batched engine under ``aukit_tpu.stream.batch``.
"""

from __future__ import annotations

import numpy as np

from .audio import Audio, new_audio
from .config import CONFIG
from .ops import pcmcode as _pcmcode
from .ops.generate import noise, silence, tone
from .utils.validation import check_bit_depth, check_data_type

__version__ = "0.3.0"
_REFERENCE_VERSION = "1.10.0"  # aukit.lua:98


# -- loaders (reference aukit.* constructors, aukit.lua:1049-1777) -------------

def pcm(
    data,
    bit_depth: int = 8,
    data_type: str = "signed",
    channels: int = 1,
    sample_rate: int = 48000,
    interleaved: bool = True,
    big_endian: bool = False,
) -> Audio:
    """Raw PCM -> Audio (reference aukit.pcm, aukit.lua:1049)."""
    check_bit_depth(bit_depth)
    check_data_type(data_type, bit_depth)
    arr = _pcmcode.decode_pcm(data, bit_depth, data_type, channels, interleaved, big_endian)
    return Audio(arr, sample_rate, {}, {"bitDepth": bit_depth, "dataType": data_type})


def adpcm(
    data,
    channels: int = 1,
    sample_rate: int = 48000,
    top_first: bool = True,
    interleaved: bool = True,
    predictor=None,
    step_index=None,
) -> Audio:
    """IMA ADPCM -> Audio (reference aukit.adpcm, aukit.lua:1183)."""
    from .codecs.adpcm import decode_ima_adpcm

    preds = decode_ima_adpcm(data, channels, top_first, interleaved, predictor, step_index)
    norm = _pcmcode.normalize_pcm(preds, 16, "signed")
    return Audio(norm, sample_rate, {}, {"bitDepth": 16, "dataType": "signed"})


def msadpcm(
    data: bytes,
    block_align: int,
    channels: int = 1,
    sample_rate: int = 48000,
    coefficients=None,
) -> Audio:
    """Microsoft ADPCM -> Audio (reference aukit.msadpcm, aukit.lua:1283)."""
    from .codecs.adpcm import decode_msadpcm

    preds = decode_msadpcm(data, block_align, channels, coefficients)
    norm = _pcmcode.normalize_pcm(preds, 16, "signed")
    return Audio(norm, sample_rate, {}, {"bitDepth": 16, "dataType": "signed"})


def g711(data: bytes, ulaw: bool, channels: int = 1, sample_rate: int = 8000) -> Audio:
    """G.711 u-law/A-law -> Audio (reference aukit.g711, aukit.lua:1361).
    Note the reference stores bitDepth/dataType in *metadata* (quirk Q11),
    replicated here."""
    from .codecs.g711 import decode_g711

    arr = decode_g711(data, ulaw, channels, denom=0x2000)
    return Audio(
        arr, sample_rate, {"bitDepth": 14 if ulaw else 13, "dataType": "signed"}, {}
    )


def dfpwm(data: bytes, channels: int = 1, sample_rate: int = 48000) -> Audio:
    """DFPWM1a -> Audio (reference aukit.dfpwm, aukit.lua:1392): one shared
    decoder over the full stream, samples interleaved."""
    from .codecs.dfpwm import decode_dfpwm_audio

    arr = decode_dfpwm_audio(data, channels, sample_rate)
    return Audio(arr, sample_rate, {}, {"bitDepth": 8, "dataType": "signed"})


def mdfpwm(data: bytes, head: bool = False) -> Audio:
    """MDFPWMv3 -> Audio (reference aukit.mdfpwm, aukit.lua:1420)."""
    from .containers.mdfpwm import decode_mdfpwm

    return decode_mdfpwm(data, head)


def wav(data: bytes, head: bool = False) -> Audio:
    """WAV -> Audio (reference aukit.wav, aukit.lua:1456)."""
    from .containers.wav import decode_wav

    return decode_wav(data, head)


def aiff(data: bytes, head: bool = False) -> Audio:
    """AIFF/AIFC -> Audio (reference aukit.aiff, aukit.lua:1580)."""
    from .containers.aiff import decode_aiff

    return decode_aiff(data, head)


def au(data: bytes) -> Audio:
    """Sun AU -> Audio (reference aukit.au, aukit.lua:1639)."""
    from .containers.au import decode_au

    return decode_au(data)


def flac(data: bytes, head: bool = False) -> Audio:
    """FLAC -> Audio (reference aukit.flac, aukit.lua:1657)."""
    from .codecs.flac import decode_flac_audio

    return decode_flac_audio(data, head)


def qoa(data: bytes) -> Audio:
    """QOA -> Audio (reference aukit.qoa, aukit.lua:1706)."""
    from .codecs.qoa import decode_qoa_audio

    return decode_qoa_audio(data)


# -- generators ----------------------------------------------------------------

def new(duration: float, channels: int = 1, sample_rate: int = 48000) -> Audio:
    """Silence (reference aukit.new, aukit.lua:1784)."""
    return silence(duration, channels, sample_rate)


# -- utilities -------------------------------------------------------------------

def pack(data, bit_depth: int = 8, data_type: str = "signed", big_endian: bool = False) -> bytes:
    """Sample values -> packed bytes (reference aukit.pack, aukit.lua:1861)."""
    check_bit_depth(bit_depth)
    check_data_type(data_type, bit_depth)
    return _pcmcode.pack_pcm(np.asarray(data), bit_depth, data_type, big_endian)


def detect(data: bytes):
    """Magic/heuristic format detection (reference aukit.detect, aukit.lua:2156).
    Returns (type, bit_depth, data_type) with Nones where unknown."""
    from .containers.detect import detect_format

    return detect_format(data)


def play_file(path: str, *sinks, volume: float | None = None):
    """One-liner player (the reference module's __call metamethod,
    aukit.lua:100-107): detect the format from the first 64 bytes (DFPWM as
    the fallback), stream-decode, and play. With no sinks, a realtime-paced
    null sink is used."""
    from .playback import NullSink

    with open(path, "rb") as f:
        head = f.read(64)
        f.seek(0)
        data = f.read()
    kind = detect(head)[0] or "dfpwm"
    streamer = getattr(stream, kind)
    if kind == "pcm":
        it, _ = streamer(data)
    elif kind == "dfpwm":
        it, _ = streamer(data, 48000, 1)
    else:
        it, _ = streamer(data)
    if not sinks:
        sinks = (NullSink(realtime=True),)
    play(it, *sinks, volume=volume)


# -- subsystem namespaces ---------------------------------------------------------

from . import effects  # noqa: E402
from . import stream  # noqa: E402
from .playback import play, player  # noqa: E402

__all__ = [
    "Audio",
    "CONFIG",
    "new_audio",
    "pcm",
    "adpcm",
    "msadpcm",
    "g711",
    "dfpwm",
    "mdfpwm",
    "wav",
    "aiff",
    "au",
    "flac",
    "qoa",
    "new",
    "tone",
    "noise",
    "pack",
    "detect",
    "effects",
    "stream",
    "play",
    "player",
    "play_file",
]
