"""Effects suite (reference aukit.effects, aukit.lua:3349-3618).

Reference effects mutate the Audio in place and return it; we keep that
user-visible contract (the Python object's ``data`` field is replaced) while
every transform is a pure jnp function underneath.

TPU-native recasts of the sequential filters:
 - ``lowpass``/``highpass`` are first-order *linear* recurrences
   (aukit.lua:3586/3604) -> ``jax.lax.associative_scan`` over affine pairs,
   O(log n) depth instead of the reference's per-sample loop. Floating-point
   reassociation makes results differ from strict sequential evaluation at the
   1e-6 level (documented deviation, covered by tolerance tests).
 - ``echo`` (aukit.lua:3524) feeds back at a lag of ``delay*rate`` samples with
   clamping (nonlinear), so it runs as a block scan: each delay-length block is
   a vectorized update depending only on the previous block.
 - ``reverb`` (aukit.lua:3546): four parallel comb filters (block scans) +
   the reference's two in-place allpass passes, including quirk Q8 (the
   *forward* tap ``sum[i + 20 - samples]``, i.e. a second feedback lag of
   ``samples - 20``) and the double-application to sample ``samples+1``.

Divergences from reference defects (SURVEY.md quirk list):
 - ``trim`` implements the documented intent; the reference's own trim always
   errors at runtime (Q7: ``str_sub(audio, ...)`` on a table, aukit.lua:3495).
 - ``normalize`` of all-silence returns silence (the reference produces NaNs
   via peak/0).
 - ``fade`` clamps the affected index range into the valid sample range (the
   reference errors on startTime == 0).
"""

from __future__ import annotations

import functools
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from .audio import Audio


def _set(audio: Audio, data) -> Audio:
    audio.data = data
    return audio


@jax.jit
def _affine_scan(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """y_i = A_i * y_{i-1} + B_i along axis 1 (first-order linear recurrence)
    via associative scan — O(log n) depth on device."""

    def combine(x, y):
        return (x[0] * y[0], y[0] * x[1] + y[1])

    _, y = jax.lax.associative_scan(combine, (A, B), axis=1)
    return y


def amplify(audio: Audio, multiplier: float) -> Audio:
    """clamp(x * multiplier) (aukit.lua:3356)."""
    if multiplier == 1:
        return audio
    return _set(audio, jnp.clip(audio.data * jnp.float32(multiplier), -1.0, 1.0))


def speed(audio: Audio, multiplier: float) -> Audio:
    """Change speed+pitch, keeping the sample rate (aukit.lua:3376): resample
    from rate*multiplier to rate. Exact rational ratio via Fraction."""
    if multiplier == 1:
        return audio
    from .ops.resample import resample_audio_array
    from .config import get_interpolation

    frac = Fraction(multiplier).limit_denominator(1 << 24)
    out = resample_audio_array(
        audio.data, int(frac.numerator), int(frac.denominator), get_interpolation(None)
    )
    return _set(audio, out)


def fade(
    audio: Audio,
    start_time: float,
    start_amplitude: float,
    end_time: float,
    end_amplitude: float,
) -> Audio:
    """Linear amplitude ramp over [start_time, end_time] seconds (aukit.lua:3394)."""
    if start_amplitude == 1 and end_amplitude == 1:
        return audio
    sr = audio.sample_rate
    n = audio.num_samples
    start = start_time * sr
    m = (end_amplitude - start_amplitude) / ((end_time - start_time) * sr)
    i0 = max(int(np.ceil(start)), 1)
    i1 = min(int(np.floor(end_time * sr)), n)
    if i1 < i0:
        return audio
    idx = np.arange(i0, i1 + 1, dtype=np.float64)
    gain = (m * (idx - start) + start_amplitude).astype(np.float32)
    seg = jnp.clip(audio.data[:, i0 - 1 : i1] * jnp.asarray(gain), -1.0, 1.0)
    return _set(audio, audio.data.at[:, i0 - 1 : i1].set(seg))


def invert(audio: Audio) -> Audio:
    """Polarity inversion (aukit.lua:3417)."""
    return _set(audio, -audio.data)


def normalize(audio: Audio, peak_amplitude: float = 1.0, independent: bool = False) -> Audio:
    """Scale to a peak amplitude, globally or per channel (aukit.lua:3431)."""
    d = audio.data
    if independent:
        peak = jnp.max(jnp.abs(d), axis=1, keepdims=True)
    else:
        peak = jnp.max(jnp.abs(d))
    mult = jnp.where(peak > 0, peak_amplitude / jnp.maximum(peak, 1e-30), 0.0)
    return _set(audio, jnp.clip(d * mult, -1.0, 1.0))


def center(audio: Audio) -> Audio:
    """Remove DC offset per one-second window (aukit.lua:3464)."""
    d = audio.data
    c, n = d.shape
    sr = audio.sample_rate
    nwin = -(-n // sr)
    pad = nwin * sr - n
    dp = jnp.pad(d, ((0, 0), (0, pad)))
    mask = jnp.pad(jnp.ones((n,), jnp.float32), (0, pad)).reshape(nwin, sr)
    w = dp.reshape(c, nwin, sr)
    counts = jnp.maximum(mask.sum(axis=1), 1.0)
    means = (w * mask).sum(axis=2) / counts  # [c, nwin]
    out = jnp.clip(w - means[:, :, None], -1.0, 1.0).reshape(c, nwin * sr)[:, :n]
    return _set(audio, out)


def trim(audio: Audio, threshold: float = 1.0 / 65536) -> Audio:
    """Strip leading/trailing silence below threshold (intended semantics of
    aukit.lua:3483; the reference implementation itself errors — quirk Q7)."""
    mag = np.max(np.abs(np.asarray(audio.data)), axis=0)
    above = np.nonzero(mag > threshold)[0]
    if len(above) == 0:
        return _set(audio, audio.data[:, :0])
    return _set(audio, audio.data[:, above[0] : above[-1] + 1])


def delay(audio: Audio, delay_time: float, multiplier: float = 0.5) -> Audio:
    """Add a scaled copy of the *original* signal shifted by delay seconds
    (aukit.lua:3505)."""
    samples = int(np.floor(delay_time * audio.sample_rate))
    d = audio.data
    if samples <= 0 or samples >= d.shape[1]:
        return audio
    shifted = jnp.pad(d[:, : d.shape[1] - samples], ((0, 0), (samples, 0)))
    return _set(audio, jnp.clip(d + shifted * jnp.float32(multiplier), -1.0, 1.0))


@functools.partial(jax.jit, static_argnums=(1, 3))
def _feedback_blocks(d: jnp.ndarray, lag: int, multiplier, clamp: bool) -> jnp.ndarray:
    """In-place feedback ``y[i] = f(y[i] + y[i-lag]*mult)`` for i > lag,
    vectorized as a scan over lag-sized blocks (each block depends only on the
    previous block's *updated* values)."""
    c, n = d.shape
    nblk = -(-n // lag)
    pad = nblk * lag - n
    dp = jnp.pad(d, ((0, 0), (0, pad))).reshape(c, nblk, lag)
    dp = jnp.moveaxis(dp, 1, 0)  # [nblk, c, lag]
    mult = jnp.asarray(multiplier, jnp.float32)

    def step(prev, block):
        y = block + prev * mult
        if clamp:
            y = jnp.clip(y, -1.0, 1.0)
        return y, y

    init = dp[0]
    _, rest = jax.lax.scan(step, init, dp[1:])
    out = jnp.concatenate([init[None], rest], axis=0)  # [nblk, c, lag]
    return jnp.moveaxis(out, 0, 1).reshape(c, nblk * lag)[:, :n]


def echo(audio: Audio, delay_time: float = 1.0, multiplier: float = 0.5) -> Audio:
    """In-place feedback echo with clamping (aukit.lua:3524)."""
    samples = int(np.floor(delay_time * audio.sample_rate))
    d = audio.data
    if samples <= 0 or samples >= d.shape[1]:
        return audio
    return _set(audio, _feedback_blocks(d, samples, multiplier, clamp=True))


_COMB_DELAY_SHIFT = (0.0, -11.73, 19.31, -7.97)  # ms (aukit.lua:3543)
_COMB_DECAY_SHIFT = (0.0, 0.1313, 0.2743, 0.31)


@functools.partial(jax.jit, static_argnums=(1,))
def _allpass_inplace(s: jnp.ndarray, lag: int) -> jnp.ndarray:
    """The reference's *in-place* allpass pass (aukit.lua:3574-3575, incl. quirk
    Q8): sequentially for j >= lag+1 (0-based):
        s[j] = s[j] - 0.131*s[j-lag] + 0.131*s[j-(lag-20)]
    reading already-updated values. Both lags are >= blk = lag-20, so a scan
    over blk-sized blocks sees only finalized history: carry = sliding window
    of the last ``lag`` finalized samples."""
    c, n = s.shape
    if lag <= 21 or lag + 1 >= n:
        return s
    blk = lag - 20
    nblk = -(-n // blk)
    pad = nblk * blk - n
    sp = jnp.pad(s, ((0, 0), (0, pad)))
    blocks = jnp.moveaxis(sp.reshape(c, nblk, blk), 1, 0)  # [nblk, c, blk]
    update_mask = (np.arange(nblk * blk).reshape(nblk, blk) >= lag + 1).astype(np.float32)
    masks = jnp.asarray(update_mask)

    def step(window, inp):
        block, mask = inp  # [c, blk], [blk]
        tap_lag = window[:, :blk]  # s[j - lag]
        tap_fwd = window[:, lag - blk :]  # s[j - (lag - 20)]
        upd = block - 0.131 * tap_lag + 0.131 * tap_fwd
        new = jnp.where(mask[None, :] > 0, upd, block)
        window = jnp.concatenate([window[:, blk:], new], axis=1)
        return window, new

    init = jnp.zeros((c, lag), s.dtype)
    _, out = jax.lax.scan(step, init, (blocks, masks))
    return jnp.moveaxis(out, 0, 1).reshape(c, nblk * blk)[:, :n]


def reverb(
    audio: Audio,
    delay_ms: float = 100.0,
    decay: float = 0.3,
    wet_multiplier: float = 1.0,
    dry_multiplier: float = 0.0,
) -> Audio:
    """Schroeder-style reverb (aukit.lua:3546): 4 parallel comb filters with
    per-comb delay/decay shifts, wet/dry mix, then two in-place allpass passes
    at 0.08927 s (including quirk Q8's forward tap)."""
    d = audio.data
    c, n = d.shape
    sr = audio.sample_rate
    total = jnp.zeros_like(d)
    for k in range(4):
        lag = int(np.floor((delay_ms + _COMB_DELAY_SHIFT[k]) / 1000.0 * sr))
        mult = decay - _COMB_DECAY_SHIFT[k]
        if lag <= 0 or lag >= n:
            total = total + d
        else:
            total = total + _feedback_blocks(d, lag, mult, clamp=False)
    total = total * jnp.float32(wet_multiplier) + d * jnp.float32(dry_multiplier)
    lag = int(np.floor(0.08927 * sr))
    if 21 < lag + 1 < n:
        # pass 1 (aukit.lua:3573-3575): pre-step at index lag (0-based), then
        # the sequential in-place allpass over sum
        total = total.at[:, lag].add(-0.131 * total[:, 0])
        total = _allpass_inplace(total, lag)
        # pass 2 (aukit.lua:3576-3577): pure FIR over the *finalized* sum,
        # written into the output; index lag gets the 0.131*sum[0] subtraction
        # applied a second time (reference double-application)
        tap_lag = jnp.pad(total[:, : n - lag], ((0, 0), (lag, 0)))
        fwd = lag - 20
        tap_fwd = jnp.pad(total[:, : n - fwd], ((0, 0), (fwd, 0)))
        fir = jnp.clip(total - 0.131 * tap_lag + 0.131 * tap_fwd, -1.0, 1.0)
        idx = jnp.arange(n)
        out = jnp.where((idx >= lag + 1)[None, :], fir, d)
        out = out.at[:, lag].set(jnp.clip(total[:, lag] - 0.131 * total[:, 0], -1.0, 1.0))
    else:
        out = d
    return _set(audio, out)


def lowpass(audio: Audio, frequency: float) -> Audio:
    """One-pole lowpass y[i] = y[i-1] + a*(x[i]-y[i-1]) (aukit.lua:3586),
    evaluated as an associative scan over affine maps."""
    a = 1.0 - np.exp(-(frequency / audio.sample_rate) * 2.0 * np.pi)
    d = audio.data
    n = d.shape[1]
    if n < 2:
        return audio
    # y[0] = x[0]; for i>0: y[i] = (1-a) y[i-1] + a x[i]
    A = jnp.full((d.shape[0], n), np.float32(1.0 - a))
    B = d * np.float32(a)
    A = A.at[:, 0].set(0.0)
    B = B.at[:, 0].set(d[:, 0])
    return _set(audio, _affine_scan(A, B))


def highpass(audio: Audio, frequency: float) -> Audio:
    """One-pole highpass y[i] = a*(y[i-1] + x[i] - x[i-1]) (aukit.lua:3604),
    associative scan over affine maps."""
    a = 1.0 / (2.0 * np.pi * (frequency / audio.sample_rate) + 1.0)
    d = audio.data
    n = d.shape[1]
    if n < 2:
        return audio
    dx = jnp.diff(d, axis=1)  # x[i] - x[i-1] for i>=1
    A = jnp.full((d.shape[0], n), np.float32(a))
    B = jnp.concatenate([d[:, :1], dx * np.float32(a)], axis=1)
    A = A.at[:, 0].set(0.0)
    return _set(audio, _affine_scan(A, B))
