"""QOA LMS Pallas TPU kernel — frame-lane batched reconstruction.

Same shape discipline as the other codec kernels (kernels/dfpwm_pallas.py):
lanes are [32, 128] tiles (4096 frame-channels per group), time is a
sequential grid with the 8-int32 LMS state (4 history + 4 weights) in VMEM
scratch. One lane = one (frame, channel) pair — QOA frames carry their full
LMS state in-band (aukit.lua:1713), so a whole file's frames decode in one
dispatch (SURVEY.md §5.7).

Integer semantics match codecs/qoa.py::qoa_lms_scan exactly: the reference's
``signed_rshift`` coerces through bit32 (mod 2^32), i.e. native int32
wraparound — the predictor sum may legitimately wrap (aukit.lua:1686-1704).

Input dequantized residuals travel as int16 (|dq| <= 14336) to halve VMEM
bandwidth; output is the int16-clamped reconstruction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 32
LANE = 128
GROUP = SUB * LANE
TIME_TILE = 256  # samples per grid step (512 int16 in+out blocks
# double-buffer to 16.6 MB and overflow the 16 MB scoped VMEM limit)


UNROLL = 8  # samples per loop iteration (device-profiled: u4 0.59 ms,
# u8 0.57 ms, u16 ties u8 at G=4 T=5120 — the LMS recurrence is ALU-bound)
assert TIME_TILE % UNROLL == 0  # fori_loop count floors; a non-divisor would drop samples


def _qoa_kernel(nvalid_ref, dq_ref, state_ref, out_ref, state_out_ref, st):
    t = pl.program_id(1)
    nvalid = nvalid_ref[0]

    @pl.when(t == 0)
    def _():
        st[:] = state_ref[0]

    def body(i, carry, guarded: bool):
        h0, h1, h2, h3, w0, w1, w2, w3 = carry
        dqs = dq_ref[0, pl.ds(i * UNROLL, UNROLL)].astype(jnp.int32)
        outs = []
        for u in range(UNROLL):
            dq = dqs[u]
            pred = (w0 * h0 + w1 * h1 + w2 * h2 + w3 * h3) >> 13  # int32 wrap = spec
            recon = jnp.clip(pred + dq, -32768, 32767)
            outs.append(recon.astype(jnp.int16))
            delta = dq >> 4
            nw0 = w0 + jnp.where(h0 < 0, -delta, delta)
            nw1 = w1 + jnp.where(h1 < 0, -delta, delta)
            nw2 = w2 + jnp.where(h2 < 0, -delta, delta)
            nw3 = w3 + jnp.where(h3 < 0, -delta, delta)
            if guarded:
                valid = (t * TIME_TILE + i * UNROLL + u) < nvalid
                h0, h1, h2, h3, w0, w1, w2, w3 = (
                    jnp.where(valid, h1, h0),
                    jnp.where(valid, h2, h1),
                    jnp.where(valid, h3, h2),
                    jnp.where(valid, recon, h3),
                    jnp.where(valid, nw0, w0),
                    jnp.where(valid, nw1, w1),
                    jnp.where(valid, nw2, w2),
                    jnp.where(valid, nw3, w3),
                )
            else:  # fully-valid tile: 8 tail-freeze selects elided per sample
                h0, h1, h2, h3 = h1, h2, h3, recon
                w0, w1, w2, w3 = nw0, nw1, nw2, nw3
        out_ref[0, pl.ds(i * UNROLL, UNROLL)] = jnp.stack(outs)
        return (h0, h1, h2, h3, w0, w1, w2, w3)

    nt = dq_ref.shape[1] // UNROLL
    # the valid-mask selects exist only to freeze the 8-word LMS state at
    # the nvalid boundary — the heaviest masking tax of the codec kernels
    # (8 of ~32 ops/sample); tiles strictly before the boundary run the
    # select-free body (the msadpcm_pallas fast-tile split)
    @pl.when((t + 1) * TIME_TILE <= nvalid)
    def _():
        carry = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=False),
            tuple(st[i] for i in range(8)))
        for i in range(8):
            st[i] = carry[i]

    @pl.when((t + 1) * TIME_TILE > nvalid)
    def _():
        carry = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=True),
            tuple(st[i] for i in range(8)))
        for i in range(8):
            st[i] = carry[i]

    state_out_ref[0] = jnp.stack([st[i] for i in range(8)])


@functools.partial(jax.jit, static_argnums=(3,))
def qoa_lms_grouped(dq_gm, state_gm, n_valid=None, interpret: bool = False):
    """Native-layout QOA LMS reconstruction.

    dq_gm    : int16[G, T, 32, 128] dequantized residuals (T % TIME_TILE == 0)
    state_gm : int32[G, 8, 32, 128] (h0..h3, w0..w3)
    returns  : (int16[G, T, 32, 128] samples, int32[G, 8, 32, 128] state)
    """
    G, T = dq_gm.shape[0], dq_gm.shape[1]
    if n_valid is None:
        n_valid = jnp.full((1,), T, jnp.int32)
    return pl.pallas_call(
        _qoa_kernel,
        grid=(G, T // TIME_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, T, SUB, LANE), jnp.int16),
            jax.ShapeDtypeStruct((G, 8, SUB, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, SUB, LANE), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(n_valid, dq_gm, state_gm)


def qoa_lms_pallas(dq, history, weights, interpret: bool = False):
    """Convenience wrapper from flat lanes: dq int[L, T] + state int32[L, 4]
    each -> (int32[L, T] samples, (history, weights) final)."""
    from .dfpwm_pallas import groups_to_lanes, lanes_to_groups

    dq = jnp.asarray(dq, jnp.int16)
    L, T = dq.shape
    gm, _ = lanes_to_groups(dq, TIME_TILE)

    def pack(v):
        v = jnp.asarray(v, jnp.int32)
        Lp = -(-L // GROUP) * GROUP
        return jnp.pad(v, ((0, Lp - L), (0, 0))).T.reshape(4, Lp // GROUP, SUB, LANE)

    state_gm = jnp.concatenate([pack(history), pack(weights)], axis=0)
    state_gm = jnp.moveaxis(state_gm, 0, 1)  # [G, 8, 32, 128]
    out_gm, st_gm = qoa_lms_grouped(gm, state_gm, jnp.full((1,), T, jnp.int32), interpret)
    out = groups_to_lanes(out_gm.astype(jnp.int32), L, T)
    flat = st_gm.transpose(1, 0, 2, 3).reshape(8, -1)[:, :L]
    return out, (flat[:4].T, flat[4:].T)
