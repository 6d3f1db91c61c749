"""IMA ADPCM Pallas TPU kernel — block-lane batched decode.

Completes the ADPCM-family kernel set (see kernels/msadpcm_pallas.py /
dfpwm_pallas.py for the shared shape discipline: [32, 128] lane tiles,
sequential time grid, VMEM-carried state, SMEM n_valid ragged masking).

The 89-entry step table lives as a lane-indexed VMEM constant: each sublane row
holds entries 0..88 (padded to 128 lanes), and the per-lane lookup is a single
``take_along_axis`` along the lane axis — the one gather shape Mosaic
vectorizes. The index table needs no lookup at all (it is the closed form
``m < 4 ? -1 : (m - 3) * 2``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codecs.adpcm import IMA_STEP_TABLE

SUB = 32
LANE = 128
GROUP = SUB * LANE
TIME_TILE = 512  # nibbles per grid step
UNROLL = 32  # nibbles per loop iteration. Device-profiled sweep (v5e, XLA-Ops
# plane, G=4 T=8192): u2 1.92 ms, u4 1.23 ms, u8 0.93 ms, u16 0.80 ms,
# u32 0.75 ms — the step-table gather pipelines across unrolled iterations
# (a no-gather twin measures 0.68 ms at u4: the lookup is the inherent cost).
assert TIME_TILE % UNROLL == 0  # fori_loop count floors; a non-divisor would drop samples

_STEP_TBL_PADDED = np.pad(IMA_STEP_TABLE, (0, LANE - len(IMA_STEP_TABLE))).astype(np.int32)


def _ima_kernel(nvalid_ref, tbl_ref, nib_ref, state_ref, out_ref, state_out_ref, st):
    t = pl.program_id(1)
    nvalid = nvalid_ref[0]

    @pl.when(t == 0)
    def _():
        st[:] = state_ref[0]

    tbl = tbl_ref[...]

    def body(i, carry, guarded: bool):
        pred, sidx = carry
        nibs = nib_ref[0, pl.ds(i * UNROLL, UNROLL)].astype(jnp.int32)
        outs = []
        for u in range(UNROLL):
            nib = nibs[u]
            # clamp the LOOKUP only (scan parity: jnp.take clamps, but the
            # raw index still feeds the state arithmetic for one step) —
            # malformed headers carry 89..255, which unclamped would gather
            # table padding or out of lane range
            step = jnp.take_along_axis(tbl, jnp.clip(sidx, 0, 88), axis=1)
            m = nib & 7
            nsidx = jnp.clip(sidx + jnp.where(m < 4, -1, (m - 3) * 2), 0, 88)
            diff = ((m * step) >> 2) + (step >> 3)
            npred = jnp.clip(jnp.where(nib >= 8, pred - diff, pred + diff), -32768, 32767)
            outs.append(npred.astype(jnp.int16))
            if guarded:
                valid = (t * TIME_TILE + i * UNROLL + u) < nvalid
                pred = jnp.where(valid, npred, pred)
                sidx = jnp.where(valid, nsidx, sidx)
            else:  # fully-valid tile: tail-freeze selects elided
                pred, sidx = npred, nsidx
        out_ref[0, pl.ds(i * UNROLL, UNROLL)] = jnp.stack(outs)
        return (pred, sidx)

    nt = nib_ref.shape[1] // UNROLL
    # the valid-mask selects exist only to freeze state at the nvalid
    # boundary; tiles strictly before it run the select-free body (the
    # msadpcm_pallas fast-tile split: +9% device throughput there)
    @pl.when((t + 1) * TIME_TILE <= nvalid)
    def _():
        pred, sidx = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=False), (st[0], st[1]))
        st[0], st[1] = pred, sidx

    @pl.when((t + 1) * TIME_TILE > nvalid)
    def _():
        pred, sidx = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=True), (st[0], st[1]))
        st[0], st[1] = pred, sidx

    state_out_ref[0] = jnp.stack([st[0], st[1]])


@functools.partial(jax.jit, static_argnums=(3,))
def ima_decode_grouped(nib_gm, state_gm, n_valid=None, interpret: bool = False):
    """Native-layout IMA decode.

    nib_gm   : uint8/int8[G, T, 32, 128] nibbles in [0, 15] (T % TIME_TILE == 0)
    state_gm : int32[G, 2, 32, 128] (predictor, step_index)
    returns  : (int16[G, T, 32, 128] predictors, int32[G, 2, 32, 128] state)
    """
    G, T = nib_gm.shape[0], nib_gm.shape[1]
    if n_valid is None:
        n_valid = jnp.full((1,), T, jnp.int32)
    return pl.pallas_call(
        _ima_kernel,
        grid=(G, T // TIME_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((SUB, LANE), lambda g, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, T, SUB, LANE), jnp.int16),
            jax.ShapeDtypeStruct((G, 2, SUB, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((2, SUB, LANE), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(n_valid, jnp.asarray(np.broadcast_to(_STEP_TBL_PADDED, (SUB, LANE)).copy()), nib_gm, state_gm)


def ima_decode_pallas(nibbles, predictor, step_index, interpret: bool = False):
    """Convenience wrapper from flat lanes: int[L, T] nibbles (0..15) + state ->
    (int32[L, T] predictors, (predictor, step_index) final)."""
    from .dfpwm_pallas import lanes_to_groups, groups_to_lanes

    nibbles = jnp.asarray(nibbles, jnp.uint8)
    L, T = nibbles.shape
    gm, _ = lanes_to_groups(nibbles, TIME_TILE)

    def pack(v):
        v = jnp.asarray(v, jnp.int32)
        Lp = -(-L // GROUP) * GROUP
        return jnp.pad(v, (0, Lp - L)).reshape(Lp // GROUP, SUB, LANE)

    state_gm = jnp.stack([pack(predictor), pack(step_index)], axis=1)
    out_gm, st_gm = ima_decode_grouped(gm, state_gm, jnp.full((1,), T, jnp.int32), interpret)
    out = groups_to_lanes(out_gm.astype(jnp.int32), L, T)
    fin = tuple(st_gm[:, i].reshape(-1)[:L] for i in range(2))
    return out, fin
