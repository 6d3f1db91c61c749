"""DFPWM1a Pallas TPU kernels — the flagship batched-codec kernels (N1 in
SURVEY.md §2.3, BASELINE.json north star).

DFPWM is 1 bit/sample and strictly sequential in time, so the kernel keeps
time sequential and vectorizes across lanes (independent streams):

 - lanes are tiled [32, 128] — one int8-aligned vreg tile; a lane *group* of
   4096 streams advances together, one VPU op per predictor step;
 - the byte axis is tiled across a sequential grid dimension with the decoder
   state held in VMEM scratch between grid steps (the standard Mosaic
   carried-state pattern), so arbitrarily long streams never leave the chip;
 - input layout is time-major ``u8[G, B, 32, 128]`` and output
   ``i8[G, B*8, 32, 128]`` so every load/store is a full aligned tile. The
   batched stream engine keeps buffers in this layout natively; a transposing
   convenience wrapper from ``[lanes, bytes]`` is provided.

Integer semantics identical to codecs/dfpwm.py (the lax.scan reference);
parity is asserted in tests via interpret mode and on-device when available.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codecs.dfpwm import PREC, PREC_HALF, STRENGTH_MAX, STRENGTH_MIN, LOWPASS_NUM, DfpwmState

SUB = 32  # sublanes per tile
LANE = 128  # lanes per tile
GROUP = SUB * LANE  # streams per lane group
# bytes per grid step: the output block is TIME_TILE*8 rows of [32,128] int8
# (TIME_TILE=128 -> 4 MB out + 0.5 MB in per buffer, fits 16 MB VMEM with
# double buffering)
TIME_TILE = 128


def _decode_tile(byte, q, s, lb, pq, lp, out_rows):
    """8 unrolled bit steps on one [SUB, LANE] int32 tile of lanes."""
    for k in range(8):
        bit = (byte >> k) & 1
        target = jnp.where(bit == 1, 127, -128)
        nq = q + ((s * (target - q) + PREC_HALF) >> PREC)
        nq = jnp.where((nq == q) & (nq != target), nq + jnp.where(bit == 1, 1, -1), nq)
        same = bit == lb
        z = jnp.where(same, STRENGTH_MAX, 0)
        s = jnp.where(s != z, s + jnp.where(same, 1, -1), s)
        s = jnp.maximum(s, STRENGTH_MIN)
        aj = jnp.where(bit != lb, (nq + pq + 1) >> 1, nq)
        lp = lp + (((aj - lp) * LOWPASS_NUM + 0x80) >> 8)
        out_rows.append(lp)
        q = nq
        pq = nq
        lb = bit
    return q, s, lb, pq, lp


UNROLL = 2  # bytes per loop iteration (measured +25% over 1; 4 regresses)
assert TIME_TILE % UNROLL == 0  # fori_loop count floors; a non-divisor would drop samples


def _decode_kernel(nvalid_ref, bytes_ref, state_in_ref, out_ref, state_out_ref, st):
    t = pl.program_id(1)
    nvalid = nvalid_ref[0]  # true byte count (time padding must not advance state)

    @pl.when(t == 0)
    def _():
        st[:] = state_in_ref[0]

    def body(i, carry, guarded: bool):
        q, s, lb, pq, lp = carry
        rows = []
        for u in range(UNROLL):
            byte = bytes_ref[0, i * UNROLL + u].astype(jnp.int32)
            nq, ns, nlb, npq, nlp = _decode_tile(byte, q, s, lb, pq, lp, rows)
            if guarded:
                valid = (t * TIME_TILE + i * UNROLL + u) < nvalid
                q = jnp.where(valid, nq, q)
                s = jnp.where(valid, ns, s)
                lb = jnp.where(valid, nlb, lb)
                pq = jnp.where(valid, npq, pq)
                lp = jnp.where(valid, nlp, lp)
            else:  # fully-valid tile: tail-freeze selects elided
                q, s, lb, pq, lp = nq, ns, nlb, npq, nlp
        out_ref[0, pl.ds(i * UNROLL * 8, UNROLL * 8)] = jnp.stack(rows).astype(jnp.int8)
        return (q, s, lb, pq, lp)

    nt = bytes_ref.shape[1] // UNROLL
    # valid-mask selects exist only to freeze state at the nvalid boundary;
    # tiles strictly before it run select-free (msadpcm fast-tile split)
    @pl.when((t + 1) * TIME_TILE <= nvalid)
    def _():
        carry = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=False),
            (st[0], st[1], st[2], st[3], st[4]))
        st[0], st[1], st[2], st[3], st[4] = carry

    @pl.when((t + 1) * TIME_TILE > nvalid)
    def _():
        carry = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=True),
            (st[0], st[1], st[2], st[3], st[4]))
        st[0], st[1], st[2], st[3], st[4] = carry

    state_out_ref[0] = jnp.stack([st[0], st[1], st[2], st[3], st[4]])


@functools.partial(jax.jit, static_argnums=(3,))
def dfpwm_decode_grouped(bytes_gm: jnp.ndarray, state_gm: jnp.ndarray, n_valid=None, interpret: bool = False):
    """Native-layout decode.

    bytes_gm : uint8[G, B, 32, 128] (B a multiple of TIME_TILE)
    state_gm : int32[G, 5, 32, 128]
    n_valid  : int32[1] — true byte count (defaults to B)
    returns  : (int8[G, B*8, 32, 128], int32[G, 5, 32, 128])
    """
    G, B = bytes_gm.shape[0], bytes_gm.shape[1]
    if n_valid is None:
        n_valid = jnp.full((1,), B, jnp.int32)
    nt = B // TIME_TILE
    grid = (G, nt)
    return pl.pallas_call(
        _decode_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TIME_TILE * 8, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, B * 8, SUB, LANE), jnp.int8),
            jax.ShapeDtypeStruct((G, 5, SUB, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((5, SUB, LANE), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")  # state resets at t==0
        ),
        interpret=interpret,
    )(n_valid, bytes_gm, state_gm)


def _decode_dsp_kernel(with_gain, nvalid_ref, alpha_ref, bytes_ref,
                       state_in_ref, mask_ref, *rest):
    """Decode + fused DSP epilogue: normalize (/128|127), 1-tap smoothing
    ``prev + alpha*(cur - prev)`` (dsp_chain's identity-rate form,
    parallel/pipeline.py), optional per-lane volume ``g0 + slope*sample``
    (the batched analog of speaker.playAudio's volume, aukit.lua:1935;
    slope 0 is a constant gain), int8 scale/clamp, and the per-lane ready
    mask — all on the VMEM tile, so the f32 stream never touches HBM and
    masked lanes emit zeros without a separate select pass. ``with_gain``
    is a TRACE-TIME flag: ungained fleets compile the epilogue WITHOUT the
    gain input or its per-sample fma, so the default path costs exactly
    what it did before volume existed. The smoothing carry needs no extra
    state: the previous raw sample IS the lowpass field (st[4]). State
    advances regardless of the mask — the engine restores masked lanes'
    state outside (cheap [G,5,32,128] selects)."""
    if with_gain:
        gain_ref, out_ref, state_out_ref, st = rest
    else:
        gain_ref = None
        out_ref, state_out_ref, st = rest
    t = pl.program_id(1)
    nvalid = nvalid_ref[0]
    alpha = alpha_ref[0]

    @pl.when(t == 0)
    def _():
        st[:] = state_in_ref[0]

    def norm(v):
        f = v.astype(jnp.float32)
        return f / jnp.where(v < 0, 128.0, 127.0)

    def body(i, carry, guarded: bool):
        q, s, lb, pq, lp = carry
        rows = []
        for u in range(UNROLL):
            byte = bytes_ref[0, i * UNROLL + u].astype(jnp.int32)
            nq, ns, nlb, npq, nlp = _decode_tile(byte, q, s, lb, pq, lp, rows)
            if guarded:
                valid = (t * TIME_TILE + i * UNROLL + u) < nvalid
                q = jnp.where(valid, nq, q)
                s = jnp.where(valid, ns, s)
                lb = jnp.where(valid, nlb, lb)
                pq = jnp.where(valid, npq, pq)
                lp = jnp.where(valid, nlp, lp)
            else:  # fully-valid tile: tail-freeze selects elided
                q, s, lb, pq, lp = nq, ns, nlb, npq, nlp
        prevf = norm(carry[4])  # raw sample before this iteration's 16
        live = mask_ref[0, 0] != 0
        if with_gain:
            g0 = gain_ref[0, 0]
            gslope = gain_ref[0, 1]
            base = ((t * TIME_TILE + i * UNROLL) * 8).astype(jnp.float32)
        outs = []
        for j, r in enumerate(rows):
            f = norm(r)
            o = prevf + alpha * (f - prevf)
            if with_gain:
                o = o * (g0 + gslope * (base + float(j)))
            o = o * jnp.where(o < 0, 128.0, 127.0)
            q8 = jnp.clip(o, -128.0, 127.0).astype(jnp.int8)
            outs.append(jnp.where(live, q8, 0))
            prevf = f
        out_ref[0, pl.ds(i * UNROLL * 8, UNROLL * 8)] = jnp.stack(outs)
        return (q, s, lb, pq, lp)

    nt = bytes_ref.shape[1] // UNROLL
    # the msadpcm fast-tile split: tiles strictly before the nvalid boundary
    # run the select-free body
    @pl.when((t + 1) * TIME_TILE <= nvalid)
    def _():
        carry = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=False),
            (st[0], st[1], st[2], st[3], st[4]))
        st[0], st[1], st[2], st[3], st[4] = carry

    @pl.when((t + 1) * TIME_TILE > nvalid)
    def _():
        carry = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=True),
            (st[0], st[1], st[2], st[3], st[4]))
        st[0], st[1], st[2], st[3], st[4] = carry

    state_out_ref[0] = jnp.stack([st[0], st[1], st[2], st[3], st[4]])


@functools.partial(jax.jit, static_argnums=(2, 6))
def dfpwm_decode_dsp_grouped(bytes_gm: jnp.ndarray, state_gm: jnp.ndarray,
                             alpha: float, n_valid=None, mask_gm=None,
                             gain_gm=None, interpret: bool = False):
    """Native-layout decode with the fused identity-rate DSP epilogue
    (see _decode_dsp_kernel). Same shapes as dfpwm_decode_grouped; the
    int8 output is the SMOOTHED, int8-scaled stream (the engine's
    dsp_chain contract at in_rate == out_rate) rather than raw samples,
    zeroed on lanes whose ``mask_gm`` (int32[G, 1, 32, 128], default all
    live) entry is 0, and scaled by the per-lane volume ramp ``gain_gm``
    (f32[G, 2, 32, 128]: [gain0, slope-per-sample]; None compiles the
    epilogue WITHOUT the gain input — zero cost on the default path). The
    smoothing carry is implicit in the lowpass state."""
    G, B = bytes_gm.shape[0], bytes_gm.shape[1]
    if n_valid is None:
        n_valid = jnp.full((1,), B, jnp.int32)
    if mask_gm is None:
        mask_gm = jnp.ones((G, 1, SUB, LANE), jnp.int32)
    alpha_arr = jnp.full((1,), np.float32(alpha), jnp.float32)
    nt = B // TIME_TILE
    with_gain = gain_gm is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 5, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [n_valid, alpha_arr, bytes_gm, state_gm, mask_gm]
    if with_gain:
        in_specs.append(pl.BlockSpec((1, 2, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM))
        args.append(gain_gm)
    return pl.pallas_call(
        functools.partial(_decode_dsp_kernel, with_gain),
        grid=(G, nt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, TIME_TILE * 8, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, B * 8, SUB, LANE), jnp.int8),
            jax.ShapeDtypeStruct((G, 5, SUB, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((5, SUB, LANE), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(*args)


def _encode_kernel(nvalid_ref, levels_ref, state_in_ref, out_ref, state_out_ref, st):
    t = pl.program_id(1)
    nvalid = nvalid_ref[0]  # true byte count

    @pl.when(t == 0)
    def _():
        st[:] = state_in_ref[0]

    def body(i, carry, guarded: bool):
        q0, s0, lb0 = carry
        q, s, lb = q0, s0, lb0
        levels = levels_ref[0, pl.ds(i * 8, 8)].astype(jnp.int32)  # [8, SUB, LANE]
        byte = jnp.zeros_like(q)
        for k in range(8):
            level = levels[k]
            bitc = (level > q) | ((level == q) & (q == 127))
            # keep bit as an arithmetic int32: Mosaic cannot lower eq-compares
            # between comparison-derived i1 vectors
            bit = jnp.where(bitc, 1, 0)
            target = jnp.where(bitc, 127, -128)
            nq = q + ((s * (target - q) + PREC_HALF) >> PREC)
            nq = jnp.where((nq == q) & (nq != target), nq + jnp.where(bitc, 1, -1), nq)
            same = (bit + lb) != 1  # int32 arithmetic equality of two 0/1 values
            z = jnp.where(same, STRENGTH_MAX, 0)
            s = jnp.where(s != z, s + jnp.where(same, 1, -1), s)
            s = jnp.maximum(s, STRENGTH_MIN)
            q = nq
            lb = bit
            byte = byte | (bit << k)
        out_ref[0, i] = byte.astype(jnp.uint8)
        if not guarded:  # fully-valid tile: tail-freeze selects elided
            return (q, s, lb)
        valid = (t * TIME_TILE + i) < nvalid
        return (
            jnp.where(valid, q, q0),
            jnp.where(valid, s, s0),
            jnp.where(valid, lb, lb0),
        )

    nb = out_ref.shape[1]
    # the msadpcm fast-tile split: tiles strictly before the nvalid boundary
    # run the select-free body
    @pl.when((t + 1) * TIME_TILE <= nvalid)
    def _():
        carry = jax.lax.fori_loop(
            0, nb, functools.partial(body, guarded=False),
            (st[0], st[1], st[2]))
        st[0], st[1], st[2] = carry

    @pl.when((t + 1) * TIME_TILE > nvalid)
    def _():
        carry = jax.lax.fori_loop(
            0, nb, functools.partial(body, guarded=True),
            (st[0], st[1], st[2]))
        st[0], st[1], st[2] = carry

    state_out_ref[0] = jnp.stack([st[0], st[1], st[2]])


@functools.partial(jax.jit, static_argnums=(3,))
def dfpwm_encode_grouped(levels_gm: jnp.ndarray, state_gm: jnp.ndarray, n_valid=None, interpret: bool = False):
    """Native-layout encode.

    levels_gm : int8[G, N, 32, 128] sample levels (N multiple of 8*TIME_TILE);
        int8 keeps the VMEM input block at 4 MB (int32 would exceed the 16 MB
        scoped limit)
    state_gm  : int32[G, 3, 32, 128] (charge, strength, previous_bit)
    n_valid   : int32[1] — true *byte* count (defaults to N//8)
    returns   : (uint8[G, N//8, 32, 128], int32[G, 3, 32, 128])
    """
    G, N = levels_gm.shape[0], levels_gm.shape[1]
    B = N // 8
    if n_valid is None:
        n_valid = jnp.full((1,), B, jnp.int32)
    nt = B // TIME_TILE
    return pl.pallas_call(
        _encode_kernel,
        grid=(G, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TIME_TILE * 8, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, B, SUB, LANE), jnp.uint8),
            jax.ShapeDtypeStruct((G, 3, SUB, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((3, SUB, LANE), jnp.int32)],
        interpret=interpret,
    )(n_valid, levels_gm, state_gm)


# -- layout helpers -----------------------------------------------------------------

def lanes_to_groups(x: np.ndarray | jnp.ndarray, time_multiple: int):
    """[L, T] -> (device array [G, Tp, 32, 128], (L, T) original dims).
    Pads L to a multiple of GROUP and T to a multiple of time_multiple."""
    L, T = x.shape
    Lp = -(-L // GROUP) * GROUP
    Tp = -(-T // time_multiple) * time_multiple
    xp = jnp.asarray(x)
    xp = jnp.pad(xp, ((0, Lp - L), (0, Tp - T)))
    g = xp.reshape(Lp // GROUP, SUB, LANE, Tp)
    return jnp.transpose(g, (0, 3, 1, 2)), (L, T)


def groups_to_lanes(x: jnp.ndarray, L: int, T: int) -> jnp.ndarray:
    """[G, Tp, 32, 128] -> [L, T]"""
    # slice the time padding BEFORE the transpose: XLA folds a leading-prefix
    # slice into the relayout copy, where slicing the transposed result costs
    # a separate full-array pass (profiled on the engine step)
    g = jnp.transpose(x[:, :T], (0, 2, 3, 1))
    flat = g.reshape(-1, T)
    return flat[:L]


def state_to_groups(state: DfpwmState, fields: int = 5) -> jnp.ndarray:
    arrs = [state.charge, state.strength, state.previous_bit, state.previous_charge, state.lowpass][:fields]
    L = arrs[0].shape[0]
    Lp = -(-L // GROUP) * GROUP
    out = []
    for a in arrs:
        ap = jnp.pad(jnp.asarray(a, jnp.int32), (0, Lp - L))
        out.append(ap.reshape(Lp // GROUP, SUB, LANE))
    return jnp.stack(out, axis=1)  # [G, fields, 32, 128]


def state_from_groups(gm: jnp.ndarray, L: int) -> DfpwmState:
    flat = [gm[:, i].reshape(-1)[:L] for i in range(gm.shape[1])]
    while len(flat) < 5:
        flat.append(jnp.zeros_like(flat[0]))
    return DfpwmState(*flat)


def dfpwm_decode_pallas(bytes_u8, state: DfpwmState | None = None, interpret: bool = False):
    """Convenience wrapper: uint8[L, B] -> (int32-compatible int8[L, B*8], state).
    Pads/transposes into the native kernel layout."""
    bytes_u8 = jnp.asarray(bytes_u8, jnp.uint8)
    L, B = bytes_u8.shape
    if state is None:
        state = DfpwmState.zeros(L)
    gm, _ = lanes_to_groups(bytes_u8, TIME_TILE)
    sg = state_to_groups(state, 5)
    out_gm, state_gm = dfpwm_decode_grouped(gm, sg, jnp.full((1,), B, jnp.int32), interpret)
    out = groups_to_lanes(out_gm, L, B * 8)
    return out, state_from_groups(state_gm, L)


def dfpwm_decode_dsp_pallas(bytes_u8, state: DfpwmState | None = None,
                            alpha: float = 0.0, mask=None, gain=None,
                            interpret: bool = False):
    """Convenience wrapper for the fused decode+DSP kernel: uint8[L, B] ->
    (int8[L, B*8] smoothed/int8-scaled samples, state). ``mask``: optional
    bool[L] per-lane liveness — masked lanes emit zeros in-kernel.
    ``gain``: optional (gain0 f32[L], slope_per_sample f32[L]) volume ramp
    applied in-kernel (see _decode_dsp_kernel)."""
    bytes_u8 = jnp.asarray(bytes_u8, jnp.uint8)
    L, B = bytes_u8.shape
    if state is None:
        state = DfpwmState.zeros(L)
    gm, _ = lanes_to_groups(bytes_u8, TIME_TILE)
    sg = state_to_groups(state, 5)
    Lp = -(-L // GROUP) * GROUP
    mg = None
    if mask is not None:
        mg = jnp.pad(jnp.asarray(mask, jnp.int32), (0, Lp - L)).reshape(
            Lp // GROUP, 1, SUB, LANE)
    gg = None
    if gain is not None:
        g0, gs = gain
        g0 = jnp.pad(jnp.asarray(g0, jnp.float32), (0, Lp - L),
                     constant_values=1.0).reshape(Lp // GROUP, SUB, LANE)
        gs = jnp.pad(jnp.asarray(gs, jnp.float32), (0, Lp - L)).reshape(
            Lp // GROUP, SUB, LANE)
        gg = jnp.stack([g0, gs], axis=1)
    out_gm, state_gm = dfpwm_decode_dsp_grouped(
        gm, sg, float(alpha), jnp.full((1,), B, jnp.int32), mg, gg, interpret)
    out = groups_to_lanes(out_gm, L, B * 8)
    return out, state_from_groups(state_gm, L)


def dfpwm_encode_pallas(levels, state: DfpwmState | None = None, interpret: bool = False):
    """Convenience wrapper: int[L, N] levels (values in [-128, 127]) ->
    (uint8[L, N//8], state). Levels travel as int8 to keep VMEM blocks small."""
    levels = jnp.asarray(levels, jnp.int8)
    L, N = levels.shape
    if state is None:
        state = DfpwmState.zeros(L)
    gm, _ = lanes_to_groups(levels, TIME_TILE * 8)
    sg = state_to_groups(state, 3)
    out_gm, state_gm = dfpwm_encode_grouped(gm, sg, jnp.full((1,), N // 8, jnp.int32), interpret)
    out = groups_to_lanes(out_gm, L, N // 8)
    st = state_from_groups(state_gm, L)
    return out, DfpwmState(st.charge, st.strength, st.previous_bit, state.previous_charge, state.lowpass)
