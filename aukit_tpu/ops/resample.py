"""Resampling as static gather+weight tables — the TPU-native recast of the
reference's per-sample interpolation loops (aukit.lua:253-284 ``interpolate``,
aukit.lua:653-673 ``Audio:resample``).

The reference evaluates ``x = (i-1)/ratio + 1`` per output sample in a Lua loop
and dispatches to one of four interpolators. Here the output->input mapping is a
*static* function of (n_in, src_rate, dst_rate, mode), so we precompute integer
index vectors and float weight vectors once on the host (exact rational math,
no FP drift in the passthrough test) and the device op is a handful of fused
gathers and multiply-adds over the whole [C, N_out] array.

Semantics parity (vs aukit.lua):
 - output length  = floor(n_in * dst / src)            (Lua numeric-for bound)
 - passthrough    : x integer -> data[x] with NO clamp  (aukit.lua:667)
 - fractional x   : clamp(interp(data, x), -1, 1)       (aukit.lua:668)
 - linear         : right edge falls back to last sample (aukit.lua:265)
 - cubic          : Catmull-Rom-style with -0.5..1.5 coefficients and
                    edge fallbacks p0->p1, p2->p1, p3->p2->p1 (aukit.lua:268-272)
 - sinc           : window half-width W, missing taps skipped (aukit.lua:274-283)

The passthrough test is done in exact integer arithmetic (``(i*src) % dst == 0``)
rather than the reference's float ``x % 1 == 0``; for linear/cubic the two are
value-identical (the interpolants reproduce data[x] exactly at frac==0), for
sinc the integer test is strictly more accurate. Documented deviation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CONFIG

INTERP_MODES = ("none", "linear", "cubic", "sinc")

# Warmup sample counts per mode (reference interpolation_start/_end,
# aukit.lua:284) — used by the streaming engine.
INTERPOLATION_START = {"none": 1, "linear": 1, "cubic": 0, "sinc": 0}
INTERPOLATION_END = {"none": 1, "linear": 2, "cubic": 3, "sinc": 0}


@functools.lru_cache(maxsize=256)
def resample_plan(n_in: int, src_rate: int, dst_rate: int):
    """Static output->input mapping: (n_out, ffx[int32 n_out], frac[f64 n_out]).

    0-based: out sample i sits at input position t = i*src/dst;
    ffx = floor(t), frac = t - ffx, exact-rational.
    """
    n_out = (n_in * dst_rate) // src_rate
    i = np.arange(n_out, dtype=np.int64)
    num = i * src_rate
    ffx = num // dst_rate
    rem = num - ffx * dst_rate
    frac = rem.astype(np.float64) / dst_rate
    return n_out, ffx.astype(np.int32), frac


def sinc_weights(frac: np.ndarray, window: int) -> np.ndarray:
    """[n_out, 2W+1] float32 weights: w[i, k] = sinc(pi*(frac[i] - n_k)),
    n_k = k - W (reference aukit.lua:274-283; the n == frac case yields 1)."""
    n = np.arange(-window, window + 1, dtype=np.float64)[None, :]
    px = np.pi * (frac[:, None] - n)
    with np.errstate(invalid="ignore", divide="ignore"):
        w = np.where(px == 0.0, 1.0, np.sin(px) / px)
    return w.astype(np.float32)


def _take(d: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    return jnp.take(d, jnp.asarray(idx), axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def resample_audio_array(
    data: jnp.ndarray, src_rate: int, dst_rate: int, mode: str
) -> jnp.ndarray:
    """Resample ``data[C, N]`` from src_rate to dst_rate using ``mode``.

    Matches Audio:resample (aukit.lua:653): clamp(-1, 1) applies only at
    fractional positions; integer positions pass the raw sample through.
    """
    n_in = data.shape[1]
    n_out, ffx, frac = resample_plan(n_in, src_rate, dst_rate)
    if n_out == 0:
        return data[:, :0]
    exact = frac == 0.0  # numpy bool [n_out]
    fr = jnp.asarray(frac.astype(np.float32))

    if mode == "none":
        out = _take(data, ffx)
        interp = out
    elif mode == "linear":
        p1 = _take(data, ffx)
        p2 = _take(data, np.minimum(ffx + 1, n_in - 1))
        interp = p1 + (p2 - p1) * fr
        out = p1
    elif mode == "cubic":
        p0 = _take(data, np.maximum(ffx - 1, 0))
        p1 = _take(data, ffx)
        p2 = _take(data, np.minimum(ffx + 1, n_in - 1))
        p3 = _take(data, np.minimum(ffx + 2, n_in - 1))
        interp = (
            (-0.5 * p0 + 1.5 * p1 - 1.5 * p2 + 0.5 * p3) * fr**3
            + (p0 - 2.5 * p1 + 2.0 * p2 - 0.5 * p3) * fr**2
            + (-0.5 * p0 + 0.5 * p2) * fr
            + p1
        )
        out = p1
    elif mode == "sinc":
        w = CONFIG.sinc_window_size
        weights = sinc_weights(frac, w)  # [n_out, 2w+1]
        idx = ffx[:, None] + np.arange(-w, w + 1)[None, :]  # [n_out, 2w+1]
        valid = (idx >= 0) & (idx < n_in)
        wmat = jnp.asarray(weights * valid.astype(np.float32))
        taps = jnp.take(data, jnp.asarray(np.clip(idx, 0, n_in - 1)), axis=1)
        interp = jnp.einsum("cok,ok->co", taps, wmat)
        out = _take(data, ffx)
    else:  # pragma: no cover
        raise ValueError(f"invalid interpolation mode {mode!r}")

    mask = jnp.asarray(exact)
    return jnp.where(mask, out, jnp.clip(interp, -1.0, 1.0))


def block_interp_device(ext, n: int, H: int, out_len, ffx0, frac, exact,
                        mode: str, w, axis: int = -1):
    """Traced device core shared by every jnp resample twin (the FLAC
    fleet's device DSP, parallel.pipeline.dsp_chain): replicate
    ``lua_block_resample``'s edge-fallback semantics (aukit.lua:253-284)
    over ``ext[..., H + n]`` (H history columns, hist_valid == H so lo == 0;
    H == 0 is the engine's chunk-local form) with STATIC index/weight
    tables — all four interpolation modes. f32.

    ``axis`` selects the sample axis (default: last). The FLAC fleet's
    grouped-residency route interpolates along axis 2 of its native
    [C, G, T, 32, 128] layout so the stream never leaves the Pallas
    kernels' layout between the restore and block-IIR segments."""
    import jax.numpy as jnp

    hi = H + n - 1
    ffx = ffx0 + H

    def bcast(v):
        if axis == -1:
            return v
        shape = [1] * ext.ndim
        shape[axis] = v.shape[0]
        return v.reshape(shape)

    fracj = bcast(jnp.asarray(np.asarray(frac, np.float32)))
    exactj = bcast(jnp.asarray(exact))

    def take(idx):
        return jnp.take(ext, jnp.asarray(np.clip(idx, 0, hi)), axis=axis)

    if mode == "none":
        return take(ffx)
    p1 = take(ffx)
    if mode == "linear":
        p2 = take(np.where(ffx + 1 <= hi, ffx + 1, ffx))
        return jnp.where(exactj, p1, p1 + (p2 - p1) * fracj)
    if mode == "cubic":
        p0 = take(np.where(ffx - 1 >= 0, ffx - 1, ffx))
        i2 = np.where(ffx + 1 <= hi, ffx + 1, ffx)
        p2 = take(i2)
        p3 = take(np.where(ffx + 2 <= hi, ffx + 2, i2))
        val = ((-0.5 * p0 + 1.5 * p1 - 1.5 * p2 + 0.5 * p3) * fracj**3
               + (p0 - 2.5 * p1 + 2.0 * p2 - 0.5 * p3) * fracj**2
               + (-0.5 * p0 + 0.5 * p2) * fracj + p1)
        return jnp.where(exactj, p1, val)
    if mode != "sinc":
        raise ValueError(f"invalid interpolation mode {mode!r}")
    # sinc: static per-output weight rows; taps outside [0, hi] drop via the
    # static valid mask (host path: take() clips + weight zeroing)
    W = (w.shape[1] - 1) // 2
    acc = jnp.zeros_like(p1)
    for t in range(2 * W + 1):
        idx = ffx + (t - W)
        valid = (idx >= 0) & (idx <= hi)
        wt = np.asarray(w[:, t] * valid, np.float32)
        if not wt.any():
            continue
        acc = acc + take(idx) * bcast(jnp.asarray(wt))
    return jnp.where(exactj, p1, acc)
