"""G.711 µ-law / A-law decode as a 256-entry LUT gather.

The reference expands every byte arithmetically in a Lua loop
(aukit.g711, aukit.lua:1361-1384; aukit.stream.g711 scale variant at 2891).
The expansion is a pure function of the byte, so the TPU-native form is a
precomputed lookup table + one gather — exactly what BASELINE.json asks for.

Expansion rules (aukit.lua:1371-1382), for byte ``raw``:
  b = raw XOR (ulaw ? 0xFF : 0x55)
  m = b & 0x0F ; e = (b >> 4) & 0x07
  A-law, e == 0 : m = m*4 + 2        else : m = (m*2 + 33) << e
  µ-law         : m = ((m*2 + 33) << e) - 33
  sign          : negative iff (bit7 of b) == ulaw
  loader scale  : m / ±0x2000   (13/14-bit ranges)
  stream scale  : m / ±0x40     (int8 fast path, aukit.lua:2891)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def g711_expand_lut(ulaw: bool) -> np.ndarray:
    """int32[256]: signed linear magnitude*sign per raw input byte, BEFORE the
    final scale divide. Positive magnitudes carry the sign already applied."""
    raw = np.arange(256, dtype=np.int64)
    b = raw ^ (0xFF if ulaw else 0x55)
    m = b & 0x0F
    e = (b >> 4) & 0x07
    if ulaw:
        m = ((m * 2 + 33) << e) - 33
    else:
        m = np.where(e == 0, m * 4 + 2, (m * 2 + 33) << np.minimum(e, 62))
    negative = ((b & 0x80) != 0) == ulaw
    return np.where(negative, -m, m).astype(np.int32)


@functools.lru_cache(maxsize=8)
def g711_float_lut(ulaw: bool, denom: int) -> np.ndarray:
    """float32[256]: final float sample per raw byte at the given scale
    (0x2000 for the loader, 0x40 for the int8 stream path)."""
    return (g711_expand_lut(ulaw).astype(np.float64) / denom).astype(np.float32)


def decode_g711(data: bytes, ulaw: bool, channels: int = 1, denom: int = 0x2000) -> np.ndarray:
    """bytes -> [channels, N] float32 (reference aukit.g711, aukit.lua:1361).
    Channel c receives bytes at positions ``i % channels == c`` (interleaved)."""
    lut = g711_float_lut(bool(ulaw), denom)
    raw = np.frombuffer(data, dtype=np.uint8)
    vals = lut[raw]
    n = len(vals) // channels
    vals = vals[: n * channels]
    if channels > 1:
        return np.ascontiguousarray(vals.reshape(n, channels).T)
    return vals.reshape(1, -1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def decode_g711_device(raw_u8: jnp.ndarray, ulaw: bool, channels: int, denom: int) -> jnp.ndarray:
    """Device-side batched variant: uint8[..., N] -> float32[..., C, N//C].

    Computes the expansion arithmetically (shift/mask elementwise VPU ops)
    instead of a table gather — gathers serialize on TPU while the formula
    vectorizes at full width."""
    b = raw_u8.astype(jnp.int32) ^ (0xFF if ulaw else 0x55)
    m = b & 0x0F
    e = (b >> 4) & 0x7
    if ulaw:
        mag = ((m * 2 + 33) << e) - 33
    else:
        mag = jnp.where(e == 0, m * 4 + 2, (m * 2 + 33) << e)
    negative = ((b & 0x80) != 0) == bool(ulaw)
    vals = jnp.where(negative, -mag, mag).astype(jnp.float32) * jnp.float32(1.0 / denom)
    if channels > 1:
        n = vals.shape[-1] // channels
        vals = vals[..., : n * channels]
        vals = jnp.moveaxis(vals.reshape(*vals.shape[:-1], n, channels), -1, -2)
    else:
        vals = vals[..., None, :]
    return vals
