"""Fused batched decode+DSP pipeline — the framework's "flagship model".

One jittable step takes a batch of raw DFPWM byte streams and produces
48 kHz int8 chunks: decode -> normalize -> resample (static gather tables) ->
FIR smoothing -> int8 quantize, all fused by XLA into one dispatch
(SURVEY.md §7 item 5: the whole L4 chunk pipeline as a single device graph).

Two decode backends:
 - Pallas kernel (TPU): lane groups of 4096 in native [G, B, 32, 128] layout
 - lax.scan (portable): used under CPU/interpret and for the multi-chip dryrun

Multi-chip scaling (SURVEY.md §2.4): streams are the batch axis — the mesh
shards lane groups across ("dp", "sp"); the only cross-chip communication is
the optional global peak reduction for normalization (an all-reduce XLA
inserts from the sharded ``jnp.max``), so scaling rides ICI with no
host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.dfpwm import DfpwmState, dfpwm_decode


@functools.lru_cache(maxsize=64)
def _resample_tables(n_in: int, in_rate: int, out_rate: int):
    """Static linear-interp gather tables for one block: (n_out, idx0, frac)."""
    n_out = (n_in * out_rate) // in_rate
    i = np.arange(n_out, dtype=np.int64)
    num = i * in_rate
    ffx = num // out_rate
    frac = (num - ffx * out_rate).astype(np.float32) / out_rate
    return n_out, ffx.astype(np.int32), frac


def fir_alpha(in_rate: int, out_rate: int) -> float:
    """The chunk-DSP smoothing constant (aukit.lua:2365 ``lp_alpha``),
    shared by every consumer — dsp_chain, the fused Pallas decode+DSP
    epilogue (stream/batch.py), the single-stream chunk engine and the FLAC
    paths. Bit-parity between the fused and two-stage engine paths depends
    on both reading this exact value."""
    return float(1.0 - np.exp(-(in_rate / (out_rate * 2)) * 2.0 * np.pi))


def dsp_chain(samples_f32: jnp.ndarray, in_rate: int, out_rate: int = 48000,
              fir_state=None, mode: str = "linear", gain=None):
    """float[..., T] @in_rate -> int8[..., T_out] @out_rate: resample
    (none/linear/cubic/sinc, reference interpolator surface
    aukit.lua:253-284) + FIR smoothing (alpha per aukit.lua:2365) + int8
    scale/clamp.

    ``fir_state``: optional float[...] previous raw sample carried across
    chunks; when given, returns (out, new_fir_state).

    ``gain``: optional (gain0, slope_per_sample) per-lane volume ramp
    (each shaped to broadcast against ``out[..., None]`` dims): the smoothed
    stream is scaled by ``gain0 + slope * t`` before the int8 quantize —
    the batched analog of speaker.playAudio's volume (aukit.lua:1935);
    gain 1 / slope 0 multiplies by exactly 1.0 (bit-identical). The fused
    Pallas epilogue (kernels/dfpwm_pallas.py::_decode_dsp_kernel) computes
    the SAME expression per sample.

    Boundary semantics: the FIR state carries across chunks, but the
    interpolation window clamps at each chunk's edges (missing taps fall
    back toward p1, the Lua `or`-chain) instead of deferring boundary
    outputs to the next chunk the way the single-stream ChunkResampler
    does — a deliberate fixed-shape simplification (affects ~ratio samples
    per chunk by < 1 interpolation step; exact for identity rates, where
    every mode passes p1 through)."""
    if mode not in ("none", "linear", "cubic", "sinc"):
        raise ValueError(f"invalid interpolation mode {mode!r}")
    n_in = samples_f32.shape[-1]
    if in_rate == out_rate:
        s = samples_f32  # identity: every mode passes p1 through at exact x
    else:
        from ..ops.resample import block_interp_device, sinc_weights

        n_out, ffx, frac = _resample_tables(n_in, in_rate, out_rate)
        w = None
        if mode == "sinc":
            from ..config import CONFIG

            w = sinc_weights(frac.astype(np.float64), CONFIG.sinc_window_size)
        # H == 0: the chunk-local form (edge taps clamp/fall back within the
        # chunk — the documented fixed-shape simplification)
        s = block_interp_device(samples_f32, n_in, 0, n_out,
                                ffx.astype(np.int64), frac, frac == 0.0,
                                mode, w)
    alpha = jnp.float32(fir_alpha(in_rate, out_rate))
    first = jnp.zeros_like(s[..., :1]) if fir_state is None else fir_state[..., None]
    prev = jnp.concatenate([first, s[..., :-1]], axis=-1)
    out = prev + alpha * (s - prev)
    if gain is not None:
        g0, gslope = gain
        t = jnp.arange(out.shape[-1], dtype=jnp.float32)
        out = out * (g0[..., None] + gslope[..., None] * t)
    out = out * jnp.where(out < 0, 128.0, 127.0)
    out = jnp.clip(out, -128, 127).astype(jnp.int8)
    if fir_state is None:
        return out
    return out, s[..., -1]


def decode_pipeline_scan(bytes_u8: jnp.ndarray, state: DfpwmState, in_rate: int = 48000,
                         normalize_peak: float | None = None):
    """Portable flagship step: uint8[L, B] -> (int8[L, T_out], new_state).
    With ``normalize_peak`` set, a global cross-lane peak reduction rescales the
    batch (becomes an all-reduce when lanes are sharded across chips)."""
    decoded, state = dfpwm_decode(bytes_u8, state)
    f = decoded.astype(jnp.float32) / jnp.where(decoded < 0, 128.0, 127.0)
    if normalize_peak is not None:
        peak = jnp.max(jnp.abs(f))  # cross-chip all-reduce under sharding
        f = f * (normalize_peak / jnp.maximum(peak, 1e-6))
    return dsp_chain(f, in_rate), state


def decode_pipeline_pallas(bytes_gm: jnp.ndarray, state_gm: jnp.ndarray, in_rate: int = 48000):
    """TPU flagship step in native layout: uint8[G, B, 32, 128] ->
    (int8[G, T_out, 32, 128], state_gm)."""
    from ..kernels.dfpwm_pallas import dfpwm_decode_grouped

    decoded, state_gm = dfpwm_decode_grouped(bytes_gm, state_gm)
    d = decoded.astype(jnp.float32)
    f = d / jnp.where(d < 0, 128.0, 127.0)
    # DSP along the time axis (axis 1 in grouped layout)
    f = jnp.moveaxis(f, 1, -1)
    out = dsp_chain(f, in_rate)
    return jnp.moveaxis(out, -1, 1), state_gm


def make_mesh(n_devices: int | None = None, axes=("dp", "sp")):
    """1x2-factorized device mesh for stream sharding."""
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devices)
    dp = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            dp = cand
            break
    shape = (dp, n // dp)
    return jax.sharding.Mesh(np.array(devices).reshape(shape), axes)


def sharded_pipeline_step(mesh: jax.sharding.Mesh, lanes: int, nbytes: int, in_rate: int = 48000):
    """Build a jitted multi-chip step: lanes sharded over the whole mesh, DSP
    local, peak-normalize as the cross-chip collective. Returns (fn, args)."""
    P = jax.sharding.PartitionSpec
    lane_sharding = jax.sharding.NamedSharding(mesh, P(("dp", "sp"), None))

    def step(bytes_u8, charge, strength, prev_bit, prev_charge, lowpass):
        state = DfpwmState(charge, strength, prev_bit, prev_charge, lowpass)
        out, st = decode_pipeline_scan(bytes_u8, state, in_rate, normalize_peak=0.9)
        return out, st.charge, st.strength, st.previous_bit, st.previous_charge, st.lowpass

    state_sharding = jax.sharding.NamedSharding(mesh, P(("dp", "sp")))
    fn = jax.jit(
        step,
        in_shardings=(lane_sharding,) + (state_sharding,) * 5,
        out_shardings=(lane_sharding,) + (state_sharding,) * 5,
    )
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 256, (lanes, nbytes), dtype=np.uint8))
    z = jnp.zeros((lanes,), jnp.int32)
    return fn, (data, z, z, z, z, z)
