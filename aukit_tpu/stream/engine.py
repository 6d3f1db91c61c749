"""Chunked-stream resample/filter engine.

Replicates the per-chunk semantics of the reference's ``aukit.stream.pcm`` hot
loop (aukit.lua:2376-2421) as vectorized table-driven array ops:

 - each iterator call emits up to ``chunk`` (48000) output samples per channel;
 - output i (1-based) samples input position x_i = (i-1)*in_rate/out_rate + 1;
 - integer x passes through; fractional x interpolates (none/linear/cubic/sinc)
   over the *lazily consumed* input, so the per-chunk input consumption M is a
   static function of (mode, rates) — M = the highest input index touched by
   any output (computed in exact integer arithmetic);
 - warmup (aukit.lua:2376-2386): the first chunk eagerly reads
   interpolation_start..interpolation_end — for cubic/sinc (start == 0) the
   very first input sample lands at position 0, shifting the stream by one;
   every chunk requires at least interpolation_end fresh samples or the stream
   ends with no partial chunk;
 - the last two input samples (sinc: the last W+1) carry to the next chunk as
   positions -1..0 (-W..0) and x restarts at 1 — the reference's per-chunk
   phase reset (SURVEY.md §5.7);
 - a "lowpass" smoother out_i = prev_raw + alpha*(s_i - prev_raw) with
   alpha = 1 - exp(-(in_rate/96000)*2*pi). This is a 2-tap FIR, because the
   reference stores the *raw* previous sample as filter state
   (aukit.lua:2403-2404) — fully parallel on TPU;
 - output scale: v * (v < 0 ? 128 : 127), optionally floored, clamped to
   [-128, 127] (stream.pcm never floors — float-valued int8-range output).

Quirk handling (SURVEY.md §7 policy): by default the filter state carries
across chunks; the reference re-seeds it to 0 every chunk (quirk Q9,
aukit.lua:2392-2394) — set ``CONFIG.compat_quirks`` for that behavior.

At EOF a partial chunk is emitted covering every output whose inputs were
readable, matching the reference's pcall-truncated final chunk
(aukit.lua:2389, 2406).
"""

from __future__ import annotations

import functools
import math

import numpy as np

from ..config import CONFIG
from ..ops.resample import INTERPOLATION_END, INTERPOLATION_START, sinc_weights
from ..parallel.pipeline import fir_alpha


@functools.lru_cache(maxsize=256)
def stream_plan(in_rate: int, out_rate: int, mode: str, chunk: int, window: int):
    """Static per-chunk tables (see module docstring)."""
    i = np.arange(chunk, dtype=np.int64)
    num = i * in_rate  # x_i - 1 = num / out_rate, exact rational
    ffx1 = num // out_rate + 1  # Lua floor(x_i), 1-based
    rem = num - (num // out_rate) * out_rate
    frac = rem.astype(np.float64) / out_rate
    exact = rem == 0
    if mode == "none":
        touch = ffx1
    elif mode == "linear":
        touch = np.where(exact, ffx1, ffx1 + 1)
    elif mode == "cubic":
        touch = np.where(exact, ffx1, ffx1 + 2)
    elif mode == "sinc":
        touch = np.where(exact, ffx1, ffx1 + window)
    else:
        raise ValueError(f"invalid interpolation mode {mode!r}")
    maxtouch = np.maximum.accumulate(touch)
    # EOF rule: lookahead taps fall back via the Lua `or` chain without
    # erroring; only the base sample d[floor(x)] (or d[x] at integer x) is
    # required, so a partial chunk emits while required <= available.
    required = np.maximum.accumulate(ffx1)
    warm_later = INTERPOLATION_END[mode]
    warm_first = warm_later - INTERPOLATION_START[mode] + 1
    M = int(max(maxtouch[-1], warm_later))
    hist = window + 1 if mode == "sinc" else 2
    w = sinc_weights(frac, window).astype(np.float64) if mode == "sinc" else None
    return {
        "ffx0": (ffx1 - 1).astype(np.int64),
        "frac": frac,
        "exact": exact,
        "maxtouch": maxtouch,
        "required": required,
        "M": M,
        "hist": hist,
        "warm_first": warm_first,
        "warm_later": warm_later,
        "shift_first": INTERPOLATION_START[mode] == 0,
        "sinc_w": w,
    }


def iir_lowpass_scan(x: np.ndarray, alpha: float, state: np.ndarray):
    """First-order IIR y_i = y_{i-1} + alpha*(x_i - y_{i-1}) over the last axis
    with initial state, evaluated by recursive doubling (O(n log n) vector ops,
    no per-sample Python loop). Returns (y, final_state). Used by the FLAC/QOA
    stream paths whose reference lowpass is truly recursive (aukit.lua:3178,
    3322), unlike stream.pcm's FIR variant. ``state`` must be shaped like
    ``x[..., 0]``. The native twin (flacbits.cpp::iir_scan_rows) replays the
    identical doubling pass order — bit-equal, in-place, no per-pass
    temporaries (the FLAC-fleet DSP hot path)."""
    from ..native import flacbits as _nb

    if _nb.available() and np.ndim(x) >= 1 and x.shape[-1] > 0 \
            and np.shape(state) == np.shape(x)[:-1]:
        return _nb.iir_scan_rows(np.asarray(x, np.float64), alpha, state)
    c = 1.0 - alpha
    b = x * alpha
    b[..., 0] += c * state
    y = b
    ck = c
    shift = 1
    n = y.shape[-1]
    while shift < n:
        if ck == 0.0:  # f64 underflow: every further doubling pass adds
            break  # exactly +0.0 — skipping is bit-identical
        y[..., shift:] += ck * y[..., :-shift]
        ck = ck * ck
        shift *= 2
    return y, y[..., -1].copy()


@functools.lru_cache(maxsize=512)
def block_resample_plan(n_in: int, in_rate: int, out_rate: int, mode: str, window: int, out_len: int | None = None):
    """Tables for resampling ONE block of n_in samples the Lua way:
    out i (0-based) at x = i*in/out + 1 (Lua 1-based), out_len =
    floor(n_in*out/in) unless given. Returns (out_len, ffx0, frac, exact,
    sinc weights) with ffx0 0-based relative to the block start."""
    if out_len is None:
        out_len = (n_in * out_rate) // in_rate
    i = np.arange(out_len, dtype=np.int64)
    num = i * in_rate
    ffx0 = num // out_rate
    rem = num - ffx0 * out_rate
    frac = rem.astype(np.float64) / out_rate
    exact = rem == 0
    w = sinc_weights(frac, window).astype(np.float64) if mode == "sinc" else None
    return out_len, ffx0, frac, exact, w


def lua_block_resample(
    ext: np.ndarray,
    hist_valid: int,
    n_in: int,
    in_rate: int,
    out_rate: int,
    mode: str,
    interp_clamp: tuple | None = None,
    out_len: int | None = None,
    hist: int | None = None,
) -> np.ndarray:
    """Resample one block with Lua edge-fallback semantics (aukit.lua:253-284):
    ``ext[..., H + n_in]`` where the last ``n_in`` columns are the block
    (Lua d[1..n]) and the preceding H columns are history (Lua d[<=0], of which
    only the trailing ``hist_valid`` are real). Missing p0 falls back to p1,
    missing p2 to p1, missing p3 to p2->p1; sinc skips missing taps.
    Vectorized over arbitrary leading dims. Returns float64 [..., out_len]."""
    H = ext.shape[-1] - n_in if hist is None else hist
    window = CONFIG.sinc_window_size
    out_len, ffx0, frac, exact, w = block_resample_plan(n_in, in_rate, out_rate, mode, window, out_len)
    if out_len == 0:
        return np.zeros(ext.shape[:-1] + (0,), np.float64)
    ffx = ffx0 + H  # position of Lua d[floor(x)] within ext
    lo = H - hist_valid
    hi = ext.shape[-1] - 1

    if mode in ("none", "linear"):
        from ..native import flacbits as _nb

        if _nb.available():
            # fused native gather+lerp over rows (bit-identical f64 order;
            # the batched FLAC-fleet resample path)
            return _nb.block_resample_rows(
                np.asarray(ext, np.float64), ffx, frac, exact, out_len, mode,
                interp_clamp)

    def take(idx):
        return np.take(ext, np.clip(idx, 0, hi), axis=-1)

    def clip(v):
        if interp_clamp is None:
            return v
        return np.clip(v, interp_clamp[0], interp_clamp[1])

    if mode == "none":
        return take(ffx).astype(np.float64)
    if mode == "linear":
        p1 = take(ffx)
        p2 = take(np.where(ffx + 1 <= hi, ffx + 1, ffx))
        return np.where(exact, p1, clip(p1 + (p2 - p1) * frac))
    if mode == "cubic":
        p1 = take(ffx)
        p0 = take(np.where(ffx - 1 >= lo, ffx - 1, ffx))
        i2 = np.where(ffx + 1 <= hi, ffx + 1, ffx)
        p2 = take(i2)
        p3 = take(np.where(ffx + 2 <= hi, ffx + 2, i2))
        val = (
            (-0.5 * p0 + 1.5 * p1 - 1.5 * p2 + 0.5 * p3) * frac**3
            + (p0 - 2.5 * p1 + 2.0 * p2 - 0.5 * p3) * frac**2
            + (-0.5 * p0 + 0.5 * p2) * frac
            + p1
        )
        return np.where(exact, p1, clip(val))
    # sinc
    acc = np.zeros(ext.shape[:-1] + (out_len,), np.float64)
    for t in range(2 * window + 1):
        idx = ffx + (t - window)
        valid = (idx >= lo) & (idx <= hi)
        acc += take(idx) * (w[:, t] * valid)
    return np.where(exact, take(ffx), clip(acc))


@functools.lru_cache(maxsize=256)
def _device_chunk_fn(in_rate: int, out_rate: int, mode: str, chunk: int, window: int,
                     out_len: int, lowpass: bool, alpha: float, scale_int8: bool,
                     floor_output: bool, interp_clamp, compat_quirks: bool):
    """Jitted device twin of ChunkResampler's per-chunk math (VERDICT r1 item
    6): the SAME static plan tables drive one fused XLA graph
    gather -> interp -> FIR -> scale, in float32 (TPU has no f64 — the numpy
    f64 path remains the bit-parity oracle). Returns
    fn(carry f32[C,hist], fresh f32[C,k], filter_state f32[C], first_valid)
    -> (out f32[C,out_len], new_carry, new_filter_state)."""
    import jax
    import jax.numpy as jnp

    plan = stream_plan(in_rate, out_rate, mode, chunk, window)
    hist = plan["hist"]
    ffx = jnp.asarray(plan["ffx0"][:out_len] + hist)
    frac = jnp.asarray(plan["frac"][:out_len].astype(np.float32))
    exact = jnp.asarray(plan["exact"][:out_len])
    sinc_w = None if plan["sinc_w"] is None else np.asarray(plan["sinc_w"][:out_len], np.float32)
    M = plan["M"]

    def clip_i(v):
        if interp_clamp is None:
            return v
        return jnp.clip(v, interp_clamp[0], interp_clamp[1])

    @jax.jit
    def fn(carry, fresh, filter_state, first_valid):
        ext = jnp.concatenate([carry, fresh], axis=-1)
        k = fresh.shape[-1]
        n_ext = ext.shape[-1]
        take = lambda idx: jnp.take(ext, jnp.clip(idx, 0, n_ext - 1), axis=-1)
        if mode == "none":
            s = take(ffx)
        elif mode == "linear":
            p1 = take(ffx)
            p2 = take(jnp.minimum(ffx + 1, n_ext - 1))
            s = jnp.where(exact, p1, clip_i(p1 + (p2 - p1) * frac))
        elif mode == "cubic":
            p1 = take(ffx)
            p0 = take(jnp.maximum(ffx - 1, first_valid))
            p2 = take(jnp.minimum(ffx + 1, n_ext - 1))
            p3 = take(jnp.minimum(ffx + 2, n_ext - 1))
            val = ((-0.5 * p0 + 1.5 * p1 - 1.5 * p2 + 0.5 * p3) * frac**3
                   + (p0 - 2.5 * p1 + 2.0 * p2 - 0.5 * p3) * frac**2
                   + (-0.5 * p0 + 0.5 * p2) * frac + p1)
            s = jnp.where(exact, p1, clip_i(val))
        else:  # sinc
            acc = jnp.zeros(ext.shape[:-1] + (out_len,), jnp.float32)
            for t in range(2 * window + 1):
                idx = ffx + (t - window)
                valid = (idx >= first_valid) & (idx < hist + k)
                acc = acc + take(idx) * (jnp.asarray(sinc_w[:, t]) * valid)
            s = jnp.where(exact, take(ffx), clip_i(acc))
        if lowpass:
            prev = jnp.concatenate([filter_state[..., None], s[..., :-1]], axis=-1)
            out = prev + jnp.float32(alpha) * (s - prev)
            new_fs = (jnp.zeros_like(filter_state) if compat_quirks else s[..., -1])
        else:
            out = s
            new_fs = filter_state
        if scale_int8:
            out = out * jnp.where(out < 0, 128.0, 127.0)
        if floor_output:
            out = jnp.floor(out)
        if scale_int8:
            out = jnp.clip(out, -128.0, 127.0)
        read = min(k, M)
        new_carry = jax.lax.dynamic_slice_in_dim(ext, read, hist, axis=-1)
        return out, new_carry, new_fs

    return fn


class ChunkResampler:
    """Stateful per-stream chunk pipeline: raw samples in -> scaled chunks out.

    Values flow at the caller's scale ([-1,1] floats for PCM, int8-scale for
    the DFPWM path); ``scale_int8``/``floor_output``/``interp_clamp`` select
    the quantize variant each reference stream.* uses.

    Two backends: numpy float64 (the bit-parity oracle, default) and a fused
    jitted float32 device graph used automatically when ``process`` receives
    a jax array (device-resident decode outputs stay on device; SURVEY.md §7
    item 5's fused per-chunk graph).
    """

    def __init__(
        self,
        in_rate: int,
        channels: int,
        mode: str | None = None,
        out_rate: int | None = None,
        chunk: int | None = None,
        lowpass: bool = True,
        scale_int8: bool = True,
        floor_output: bool = False,
        interp_clamp: tuple | None = None,
    ):
        from ..config import get_interpolation

        self.mode = get_interpolation(mode)
        self.in_rate = int(in_rate)
        self.out_rate = int(out_rate or CONFIG.output_rate)
        self.chunk = int(chunk or CONFIG.chunk_samples)
        self.channels = channels
        self.window = CONFIG.sinc_window_size
        self.plan = stream_plan(self.in_rate, self.out_rate, self.mode, self.chunk, self.window)
        self.lowpass = lowpass
        self.alpha = fir_alpha(self.in_rate, self.out_rate)
        self.scale_int8 = scale_int8
        self.floor_output = floor_output
        self.interp_clamp = interp_clamp
        hist = self.plan["hist"]
        self.carry = np.zeros((channels, hist), np.float64)
        self.carry_valid = 0
        self.filter_state = np.zeros(channels, np.float64)
        self.first = True
        self.out_count = 0

    @property
    def samples_needed(self) -> int:
        """Fresh input samples consumed by the next full chunk."""
        extra = 1 if (self.first and self.plan["shift_first"]) else 0
        return self.plan["M"] + extra

    def _interp_clip(self, s):
        if self.interp_clamp is None:
            return s
        return np.clip(s, self.interp_clamp[0], self.interp_clamp[1])

    def process(self, fresh):
        """fresh[C, k] raw samples (k <= samples_needed; fewer signals EOF).
        Returns (chunk[C, out_len] float32, position_seconds) or None at end.
        A jax-array input routes through the fused device graph (output and
        carried state stay device-resident); numpy stays on the host oracle."""
        if not isinstance(fresh, (np.ndarray, list, tuple)):
            import jax

            if isinstance(fresh, jax.Array):
                return self._process_device(fresh)
        plan = self.plan
        M, hist = plan["M"], plan["hist"]
        fresh = np.asarray(fresh, np.float64)
        if self.first and plan["shift_first"]:
            # warmup places the first read at position 0 (aukit.lua:2376)
            if fresh.shape[1] == 0:
                return None
            self.carry = np.concatenate([self.carry[:, 1:], fresh[:, :1]], axis=1)
            self.carry_valid = 1
            fresh = fresh[:, 1:]
        k = fresh.shape[1]
        warm = plan["warm_first"] - (1 if plan["shift_first"] else 0) if self.first else plan["warm_later"]
        if k < warm:
            return None
        ext = np.concatenate([self.carry, fresh], axis=1)
        if k >= M:
            out_len = self.chunk
        else:
            out_len = int(np.searchsorted(plan["required"], k, side="right"))
            if out_len == 0:
                return None
        ffx = plan["ffx0"][:out_len] + hist
        frac = plan["frac"][:out_len]
        exact = plan["exact"][:out_len]
        n_ext = ext.shape[1]
        first_valid = hist - self.carry_valid

        if self.mode in ("none", "linear"):
            from ..native import flacbits as _nb

            if _nb.available():
                # fused native gather+lerp+FIR+scale (bit-identical f64 order)
                out, new_fs = _nb.chunk_dsp(
                    ext, ffx, frac, exact, out_len, self.mode, self.interp_clamp,
                    self.lowpass, self.alpha, self.filter_state,
                    CONFIG.compat_quirks, self.scale_int8, self.floor_output)
                self.filter_state = new_fs
                read = min(k, M)
                self.carry = ext[:, read : hist + read].copy()
                self.carry_valid = min(self.carry_valid + read, hist)
                self.first = False
                pos = self.out_count / self.out_rate
                self.out_count += out_len
                return out.astype(np.float32), pos

        if self.mode == "none":
            s = ext[:, np.clip(ffx, 0, n_ext - 1)]
        elif self.mode == "linear":
            p1 = ext[:, ffx]
            p2 = ext[:, np.minimum(ffx + 1, n_ext - 1)]
            s = np.where(exact, p1, self._interp_clip(p1 + (p2 - p1) * frac))
        elif self.mode == "cubic":
            p1 = ext[:, ffx]
            p0 = ext[:, np.maximum(ffx - 1, first_valid)]
            p2 = ext[:, np.minimum(ffx + 1, n_ext - 1)]
            p3 = ext[:, np.minimum(ffx + 2, n_ext - 1)]
            val = (
                (-0.5 * p0 + 1.5 * p1 - 1.5 * p2 + 0.5 * p3) * frac**3
                + (p0 - 2.5 * p1 + 2.0 * p2 - 0.5 * p3) * frac**2
                + (-0.5 * p0 + 0.5 * p2) * frac
                + p1
            )
            s = np.where(exact, p1, self._interp_clip(val))
        else:  # sinc
            w = plan["sinc_w"][:out_len]
            W = self.window
            acc = np.zeros((self.channels, out_len), np.float64)
            for t in range(2 * W + 1):
                idx = ffx + (t - W)
                valid = (idx >= first_valid) & (idx < hist + k)
                acc += ext[:, np.clip(idx, 0, n_ext - 1)] * (w[:, t] * valid)
            s = np.where(exact, ext[:, np.clip(ffx, 0, n_ext - 1)], self._interp_clip(acc))

        if self.lowpass:
            prev = np.concatenate([self.filter_state[:, None], s[:, :-1]], axis=1)
            out = prev + self.alpha * (s - prev)
            if CONFIG.compat_quirks:
                self.filter_state = np.zeros(self.channels, np.float64)  # quirk Q9
            else:
                self.filter_state = s[:, -1].copy()
        else:
            out = s

        if self.scale_int8:
            out = out * np.where(out < 0, 128.0, 127.0)
        if self.floor_output:
            out = np.floor(out)
        out = np.clip(out, -128.0, 127.0) if self.scale_int8 else out

        read = min(k, M)
        self.carry = ext[:, read : hist + read].copy()
        self.carry_valid = min(self.carry_valid + read, hist)
        self.first = False
        pos = self.out_count / self.out_rate
        self.out_count += out_len
        return out.astype(np.float32), pos

    def _process_device(self, fresh):
        """Device twin of ``process``: same plan/warmup/EOF logic on shapes,
        the per-chunk math as ONE jitted dispatch (float32)."""
        import jax.numpy as jnp

        plan = self.plan
        M, hist = plan["M"], plan["hist"]
        fresh = jnp.asarray(fresh, jnp.float32)
        if isinstance(self.carry, np.ndarray):
            self.carry = jnp.asarray(self.carry, jnp.float32)
            self.filter_state = jnp.asarray(self.filter_state, jnp.float32)
        if self.first and plan["shift_first"]:
            if fresh.shape[1] == 0:
                return None
            self.carry = jnp.concatenate([self.carry[:, 1:], fresh[:, :1]], axis=1)
            self.carry_valid = 1
            fresh = fresh[:, 1:]
        k = fresh.shape[1]
        warm = plan["warm_first"] - (1 if plan["shift_first"] else 0) if self.first else plan["warm_later"]
        if k < warm:
            return None
        if k >= M:
            out_len = self.chunk
        else:
            out_len = int(np.searchsorted(plan["required"], k, side="right"))
            if out_len == 0:
                return None
        fn = _device_chunk_fn(
            self.in_rate, self.out_rate, self.mode, self.chunk, self.window,
            out_len, self.lowpass, self.alpha, self.scale_int8,
            self.floor_output, self.interp_clamp, CONFIG.compat_quirks)
        out, self.carry, self.filter_state = fn(
            self.carry, fresh, self.filter_state, hist - self.carry_valid)
        self.carry_valid = min(self.carry_valid + min(k, M), hist)
        self.first = False
        pos = self.out_count / self.out_rate
        self.out_count += out_len
        return out, pos

    # -- checkpoint / resume (SURVEY.md §5.4): serializable resampler state ----
    def get_state(self) -> dict:
        return {
            "carry": np.asarray(self.carry).copy(),
            "carry_valid": self.carry_valid,
            "filter_state": np.asarray(self.filter_state).copy(),
            "first": self.first,
            "out_count": self.out_count,
        }

    def set_state(self, state: dict):
        self.carry = np.array(state["carry"], np.float64)
        self.carry_valid = int(state["carry_valid"])
        self.filter_state = np.array(state["filter_state"], np.float64)
        self.first = bool(state["first"])
        self.out_count = int(state["out_count"])
