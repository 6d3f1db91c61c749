"""Microsoft ADPCM Pallas TPU kernel — block-lane batched decode.

Same shape discipline as the DFPWM kernel (kernels/dfpwm_pallas.py): lanes are
[32, 128] tiles (4096 blocks per group), time is a sequential grid with state
in VMEM scratch. One lane = one MS-ADPCM block (the format stores predictor
state in every block header, SURVEY.md §5.7), so a WAV's entire data region
decodes in one dispatch.

The adaption table (aukit.lua:188-191) is evaluated arithmetically as
cumulative threshold adds — no gather:
    adapt(|n|<=3)=230, (4)=307, (5)=409, (6)=512, (7)=614, (-8)=768
    = 230 + 77*[m>=4] + 102*[m>=5] + 103*[m>=6] + 102*[m>=7] + 154*[n==-8]

int32 state with the same defensive delta cap as codecs/adpcm.py; int16
output (samples are clamped to int16 by construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codecs.adpcm import _DELTA_CAP

SUB = 32
LANE = 128
GROUP = SUB * LANE
TIME_TILE = 512  # nibbles per grid step
UNROLL = 8  # nibbles per loop iteration (device-profiled: u4 0.92 ms,
# u8 0.90 ms, u16 ties u8 at G=4 T=8192 — the recurrence is ALU-bound)
assert TIME_TILE % UNROLL == 0  # fori_loop count floors; a non-divisor would drop samples


def _adapt(nib, m):
    a = jnp.full_like(nib, 230)
    a = a + jnp.where(m >= 4, 77, 0)
    a = a + jnp.where(m >= 5, 102, 0)
    a = a + jnp.where(m >= 6, 103, 0)
    a = a + jnp.where(m >= 7, 102, 0)
    return a + jnp.where(nib == -8, 154, 0)


def _ms_kernel(nvalid_ref, nib_ref, state_ref, coef_ref, out_ref, state_out_ref, st):
    t = pl.program_id(1)
    nvalid = nvalid_ref[0]

    @pl.when(t == 0)
    def _():
        st[:] = state_ref[0]

    c1 = coef_ref[0, 0]
    c2 = coef_ref[0, 1]

    def body(i, carry, guarded: bool):
        s1, s2, delta = carry
        nibs = nib_ref[0, pl.ds(i * UNROLL, UNROLL)].astype(jnp.int32)
        outs = []
        for u in range(UNROLL):
            nib = nibs[u]
            lin = (s1 * c1 + s2 * c2) >> 8
            pred = jnp.clip(lin + nib * delta, -32768, 32767)
            outs.append(pred.astype(jnp.int16))
            m = jnp.abs(nib)
            ndelta = jnp.clip((_adapt(nib, m) * delta) >> 8, 16, _DELTA_CAP)
            if guarded:
                valid = (t * TIME_TILE + i * UNROLL + u) < nvalid
                s1, s2, delta = (
                    jnp.where(valid, pred, s1),
                    jnp.where(valid, s1, s2),
                    jnp.where(valid, ndelta, delta),
                )
            else:  # fully-valid tile: no tail to freeze, selects elided
                s1, s2, delta = pred, s1, ndelta
        out_ref[0, pl.ds(i * UNROLL, UNROLL)] = jnp.stack(outs)
        return (s1, s2, delta)

    nt = nib_ref.shape[1] // UNROLL
    # the valid-mask selects exist only to freeze state at the nvalid
    # boundary; every tile strictly before it runs the select-free body
    # (3 fewer [32,128] selects per sample — the common whole-tile case)
    @pl.when((t + 1) * TIME_TILE <= nvalid)
    def _():
        init = (st[0], st[1], st[2])
        s1, s2, delta = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=False), init)
        st[0], st[1], st[2] = s1, s2, delta

    @pl.when((t + 1) * TIME_TILE > nvalid)
    def _():
        init = (st[0], st[1], st[2])
        s1, s2, delta = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=True), init)
        st[0], st[1], st[2] = s1, s2, delta

    state_out_ref[0] = jnp.stack([st[0], st[1], st[2]])


@functools.partial(jax.jit, static_argnums=(4,))
def msadpcm_decode_grouped(nib_gm, state_gm, coef_gm, n_valid=None, interpret: bool = False):
    """Native-layout MS-ADPCM decode.

    nib_gm   : int8[G, T, 32, 128] signed nibbles in [-8, 7] (T % TIME_TILE == 0)
    state_gm : int32[G, 3, 32, 128] (sample1, sample2, delta)
    coef_gm  : int32[G, 2, 32, 128] (c1, c2 per lane)
    returns  : (int16[G, T, 32, 128] predictors, int32[G, 3, 32, 128] state)
    """
    G, T = nib_gm.shape[0], nib_gm.shape[1]
    if n_valid is None:
        n_valid = jnp.full((1,), T, jnp.int32)
    return pl.pallas_call(
        _ms_kernel,
        grid=(G, T // TIME_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, T, SUB, LANE), jnp.int16),
            jax.ShapeDtypeStruct((G, 3, SUB, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((3, SUB, LANE), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(n_valid, nib_gm, state_gm, coef_gm)


def msadpcm_decode_pallas(nibbles, sample1, sample2, delta, c1, c2, interpret: bool = False):
    """Convenience wrapper from flat lanes: int[L, T] signed nibbles + per-lane
    state/coeffs -> (int32[L, T] predictors, (s1, s2, delta) final)."""
    from .dfpwm_pallas import lanes_to_groups, groups_to_lanes

    nibbles = jnp.asarray(nibbles, jnp.int8)
    L, T = nibbles.shape
    gm, _ = lanes_to_groups(nibbles, TIME_TILE)

    def pack(v):
        v = jnp.asarray(v, jnp.int32)
        Lp = -(-L // GROUP) * GROUP
        vp = jnp.pad(v, (0, Lp - L))
        return vp.reshape(Lp // GROUP, SUB, LANE)

    # the signed header delta is used as-is for the first sample of each block
    # (the >=16 floor only applies from the first update) — clamping here would
    # diverge from msadpcm_scan and the reference (ADVICE r1)
    state_gm = jnp.stack([pack(sample1), pack(sample2), pack(delta)], axis=1)
    coef_gm = jnp.stack([pack(c1), pack(c2)], axis=1)
    out_gm, st_gm = msadpcm_decode_grouped(gm, state_gm, coef_gm, jnp.full((1,), T, jnp.int32), interpret)
    out = groups_to_lanes(out_gm.astype(jnp.int32), L, T)
    fin = tuple(st_gm[:, i].reshape(-1)[:L] for i in range(3))
    return out, fin
