"""Global configuration for aukit-tpu.

Mirrors the reference library's module-level switches (aukit.lua:96-99
``defaultInterpolation``, aukit.lua:129 ``sincWindowSize``) plus framework-native
settings for the TPU streaming pipeline.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Config:
    # Interpolation mode used by every resampling site when not given explicitly
    # (reference: aukit.defaultInterpolation, consumed at aukit.lua:2366 et al.)
    default_interpolation: str = "linear"

    # Half-width of the windowed-sinc interpolator (reference: aukit.lua:129,
    # `jit and 30 or 10`; we always use the high-quality setting).
    sinc_window_size: int = 30

    # Output samples per channel per stream chunk (reference emits 1 s of 48 kHz
    # audio per iterator call, aukit.lua:2395).
    chunk_samples: int = 48000

    # Output sample rate of the streaming pipeline (reference: 48 kHz speaker
    # format, aukit.lua README.md:5).
    output_rate: int = 48000

    # Replicate reference stream-path quirks bit-for-bit (SURVEY.md Q3-Q6, Q9).
    # When False (default) the fixed semantics are used; parity tests flip this.
    compat_quirks: bool = False

    # Minimum batch size (subframes x max block) at which the STAGED FLAC
    # path (incremental streams / non-native fallback) routes LPC restore to
    # the Pallas kernel on TPU (kernels/flac_pallas.py; exact for depth <= 24).
    # Default OFF: whole-file loads use the fused native decoder anyway, and
    # host-resident data through this environment's ~3 MB/s remote-TPU tunnel
    # loses to C++ at any size. Hosts with locally attached chips should set
    # ~1<<22 to offload large streamed restores.
    flac_device_restore_min: int = 1 << 62


CONFIG = Config()


def get_interpolation(mode: str | None) -> str:
    mode = mode or CONFIG.default_interpolation
    if mode not in ("none", "linear", "cubic", "sinc"):
        raise ValueError(f"invalid interpolation type {mode!r}")
    return mode
