"""1-pole lowpass Pallas TPU kernel — block-lane batched, zero-initialized.

The FLAC fleet's device DSP runs the reference's recursive lowpass
(aukit.lua:3178 ``ls = ls + alpha*(v - ls)`` evaluated as
``y[t] = alpha*x[t] + (1-alpha)*y[t-1]``) over hundreds of resampled blocks
per step. Profiling showed the former recursive-doubling formulation was
~95% of the fleet's device time: log2(T) full-array passes over HBM. This
kernel runs the recurrence **sequentially in time but batched over (lane,
block, channel) tiles** (same [32, 128] shape discipline as the codec
kernels, kernels/dfpwm_pallas.py), touching HBM once in and once out.

Blocks decode with ZERO initial state; the cross-block chain is recovered
outside the kernel (stream/flac_fleet.py::_device_dsp_step) from each
block's final sample plus a ``(1-alpha)^(t+1)`` decay-vector correction —
exact because the correction to a block's final sample carries the factor
``(1-alpha)^out_len`` which the chain scan applies explicitly. The fused
multiply-add order (``a*x + c*y``) differs from the doubling order only in
f32 rounding; the device twin's contract is f32-closeness to the host f64
oracle (tests/test_flac_fleet.py::test_fleet_device_dsp_twin_close).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 32
LANE = 128
GROUP = SUB * LANE
TIME_TILE = 128  # f32 in+out double-buffered blocks stay inside scoped VMEM
UNROLL = 8
assert TIME_TILE % UNROLL == 0  # fori_loop count floors; a non-divisor would drop samples


def _iir_kernel(ab_ref, x_ref, out_ref, st):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        st[0] = jnp.zeros((SUB, LANE), jnp.float32)

    a = ab_ref[0]
    c = ab_ref[1]

    def body(i, y):
        xs = x_ref[0, pl.ds(i * UNROLL, UNROLL)]
        outs = []
        for u in range(UNROLL):
            y = a * xs[u] + c * y
            outs.append(y)
        out_ref[0, pl.ds(i * UNROLL, UNROLL)] = jnp.stack(outs)
        return y

    st[0] = jax.lax.fori_loop(0, x_ref.shape[1] // UNROLL, body, st[0])


@functools.partial(jax.jit, static_argnums=(1, 2))
def iir_zero_grouped(x_gm, alpha: float, interpret: bool = False):
    """Native-layout zero-init 1-pole lowpass.

    x_gm : f32[G, T, 32, 128] (T % TIME_TILE == 0)
    returns f32[G, T, 32, 128] with y[t] = alpha*x[t] + (1-alpha)*y[t-1],
    y[-1] = 0 per lane.
    """
    G, T = x_gm.shape[0], x_gm.shape[1]
    ab = jnp.asarray([alpha, 1.0 - alpha], jnp.float32)
    return pl.pallas_call(
        _iir_kernel,
        grid=(G, T // TIME_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TIME_TILE, SUB, LANE),
                               lambda g, t: (g, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, T, SUB, LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, SUB, LANE), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(ab, x_gm)


def iir_zero_lanes(x, alpha: float, interpret: bool = False):
    """Convenience wrapper from flat lanes: f32[L, T] -> f32[L, T] zero-init
    lowpass (pads to [32,128] lane tiles and TIME_TILE internally)."""
    from .dfpwm_pallas import groups_to_lanes, lanes_to_groups

    x = jnp.asarray(x, jnp.float32)
    L, T = x.shape
    gm, _ = lanes_to_groups(x, TIME_TILE)
    out = iir_zero_grouped(gm, float(alpha), interpret)
    return groups_to_lanes(out, L, T)
