"""FLAC LPC restore Pallas TPU kernel — subframe-lane batched.

The restore recurrence (aukit.lua:411-419) is
    v[i] += floor(sum_j v[i-1-j] * c[j] / 2^shift)   for i >= order
with order <= 32 and signed 5-bit shift. The accumulator needs ~38 bits, and
the TPU has no int64 — so each tap's product is evaluated in int32 LIMBS:

    v = v_hi*2^16 + v_lo          (v_hi = v >> 16 arithmetic, v_lo unsigned)
    r = v_lo*c                    (|r| < 2^31: v_lo < 2^16, |c| <= 2^15)
    sum = Q*2^16 + RH*2^15 + RL   Q  = sum(v_hi*c)   RH = sum(r >> 15)
                                  RL = sum(r & 0x7FFF)
    T' = 2Q + RH;  sum = T'*2^15 + RL  (RL >= 0 < 2^20)
    floor(sum / 2^s) = (T' << (15-s)) + (RL >> s)            0 <= s <= 15
                     = T' >> (s-15)                          s > 15
                     = (T' << (15-s)) + (RL << -s)           s < 0

Every step is EXACT in int32 as long as |v| < 2^25 and |c| <= 2^15 — i.e. all
FLAC streams of depth <= 24 at any legal coefficient precision (<= 16 bits;
Q and T' then stay under 2^30). 32-bit-depth streams keep the int64 host
path (codecs/flac.py routes).

Lanes = subframes in [32, 128] tiles; time is a sequential grid; the order-K
sample window rides the fori carry (K = max order across the batch, rounded
to {4, 8, 16, 32} — one compiled kernel per bucket). Per-lane block lengths
mask tail padding, so mixed block sizes batch together.
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
TIME_TILE = 128

MAX_ABS_SAMPLE = 1 << 25  # exactness domain bound (see module docstring)
MAX_ABS_COEF = 1 << 15


UNROLL = 8  # samples per loop iteration. Device-profiled (v5e, order 8,
# 32768x4096): stacked-window concat baseline 10.44 ms -> tuple-carry u4
# 10.07 -> u8 9.89 (283k x realtime). The kernel is bound by the per-tap
# int32 multiplies (VPUs emulate 32-bit integer multiply), not by the
# window shift or loop overhead — an f32-exact product decomposition costs
# about the same op count, so this is the int-exact speed of light here.
assert TIME_TILE % UNROLL == 0  # fori_loop count floors; a non-divisor would drop samples


def _lpc_kernel(K, bounds_ref, vals_ref, meta_ref, coef_ref, out_ref, win):
    g = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        win[:] = jnp.zeros_like(win)

    order = meta_ref[0, 0]
    shift = meta_ref[0, 1]
    block = meta_ref[0, 2]
    haspred = order > 0  # loop-invariant: hoisted out of the sample loop
    sa = jnp.clip(15 - shift, 0, 31)  # s <= 15 branch (incl. negative s)
    sb = jnp.clip(shift, 0, 15)
    sc = jnp.clip(shift - 15, 0, 31)
    sd = jnp.clip(-shift, 0, 31)
    coefs = [coef_ref[0, j] for j in range(K)]

    # the order-K window rides the carry as K NAMED registers (the QOA-kernel
    # pattern): shifting the window is trace-time renaming, where a stacked
    # [K, 32, 128] array cost K tile copies per sample (measured ~2x)
    def body(i, carry, guarded: bool):
        outs = []
        for u in range(UNROLL):
            a = t * TIME_TILE + i * UNROLL + u
            res = vals_ref[0, i * UNROLL + u]
            q = jnp.zeros_like(res)
            rh = jnp.zeros_like(res)
            rl = jnp.zeros_like(res)
            for j in range(K):
                v = carry[j]
                c = coefs[j]
                q = q + (v >> 16) * c
                r = (v & 0xFFFF) * c
                rh = rh + (r >> 15)
                rl = rl + (r & 0x7FFF)
            # normalize: RL may reach 32*2^15 — carry its high bits into T'
            tp = 2 * q + rh + (rl >> 15)
            rl = rl & 0x7FFF
            p_low = (tp << sa) + jnp.where(shift >= 0, rl >> sb, rl << sd)
            pred = jnp.where(shift > 15, tp >> sc, p_low)
            if guarded:
                upd = (a >= order) & (a < block) & haspred
            else:
                # fast tile: every sample index is >= the group's max order
                # and < its min block, so only the per-lane haspred remains
                upd = haspred
            vnew = jnp.where(upd, res + pred, res)
            outs.append(vnew)
            carry = (vnew,) + carry[:-1]
        out_ref[0, pl.ds(i * UNROLL, UNROLL)] = jnp.stack(outs)
        return carry

    nt = TIME_TILE // UNROLL
    fast = ((t * TIME_TILE >= bounds_ref[g, 1])
            & ((t + 1) * TIME_TILE <= bounds_ref[g, 0]))

    @pl.when(fast)
    def _():
        carry = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=False),
            tuple(win[j] for j in range(K)))
        for j in range(K):
            win[j] = carry[j]

    @pl.when(jnp.logical_not(fast))
    def _():
        carry = jax.lax.fori_loop(
            0, nt, functools.partial(body, guarded=True),
            tuple(win[j] for j in range(K)))
        for j in range(K):
            win[j] = carry[j]


@functools.partial(jax.jit, static_argnums=(3, 4))
def lpc_restore_grouped(vals_gm, meta_gm, coef_gm, K: int, interpret: bool = False):
    """Native-layout restore.

    vals_gm : int32[G, T, 32, 128] warmup+residuals (T % TIME_TILE == 0)
    meta_gm : int32[G, 3, 32, 128] (order, shift, block_length)
    coef_gm : int32[G, K, 32, 128] (coef j multiplies v[i-1-j]; 0 beyond order)
    returns : int32[G, T, 32, 128] restored samples
    """
    G, T = vals_gm.shape[0], vals_gm.shape[1]
    # per-group fast-tile bounds: tiles past every lane's order and inside
    # every predictive lane's block run a select-cheap body (rows whose
    # order is 0 — verbatim/constant/padding — never update, so their block
    # is excluded from the min)
    order_pl = meta_gm[:, 0]
    blocks_eff = jnp.where(order_pl > 0, meta_gm[:, 2], jnp.iinfo(jnp.int32).max)
    bounds = jnp.stack([jnp.min(blocks_eff, axis=(1, 2)),
                        jnp.max(order_pl, axis=(1, 2))], axis=1)  # [G, 2]
    return pl.pallas_call(
        functools.partial(_lpc_kernel, K),
        grid=(G, T // TIME_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, SUB, LANE), lambda g, t: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TIME_TILE, SUB, LANE), lambda g, t: (g, t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, T, SUB, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((K, SUB, LANE), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(bounds, vals_gm, meta_gm, coef_gm)


def _order_bucket(max_order: int) -> int:
    for k in (4, 8, 16, 32):
        if max_order <= k:
            return k
    return 32


@functools.partial(jax.jit, static_argnums=(5,))
def lpc_restore_scan(vals, orders, shifts, blocks, coefs, K: int):
    """Pure-jnp twin of the Pallas kernel: the SAME int32-limb tap math as a
    ``lax.scan`` over time with [S] lanes vectorized — identical results on
    the depth <= 24 exactness domain, compilable on ANY backend and trivially
    shardable over the lane axis (all ops are lane-elementwise). This is the
    restore the sharded FLAC fleet runs on non-TPU meshes (and the dryrun's
    CPU mesh).

    vals int32[S, T]; orders/shifts/blocks int32[S]; coefs int32[S, >=K].
    """
    vals = jnp.asarray(vals, jnp.int32)
    orders = jnp.asarray(orders, jnp.int32)
    shifts = jnp.asarray(shifts, jnp.int32)
    blocks = jnp.asarray(blocks, jnp.int32)
    coefs = jnp.asarray(coefs, jnp.int32)
    S, T = vals.shape
    sa = jnp.clip(15 - shifts, 0, 31)
    sb = jnp.clip(shifts, 0, 15)
    sc = jnp.clip(shifts - 15, 0, 31)
    sd = jnp.clip(-shifts, 0, 31)
    nonneg = shifts >= 0
    big = shifts > 15
    haspred = orders > 0
    taps = [coefs[:, j] for j in range(K)]

    def body(w, xi):
        res, i = xi
        q = jnp.zeros_like(res)
        rh = jnp.zeros_like(res)
        rl = jnp.zeros_like(res)
        for j in range(K):
            v = w[j]
            c = taps[j]
            q = q + (v >> 16) * c
            r = (v & 0xFFFF) * c
            rh = rh + (r >> 15)
            rl = rl + (r & 0x7FFF)
        tp = 2 * q + rh + (rl >> 15)
        rl = rl & 0x7FFF
        p_low = (tp << sa) + jnp.where(nonneg, rl >> sb, rl << sd)
        pred = jnp.where(big, tp >> sc, p_low)
        upd = (i >= orders) & (i < blocks) & haspred
        vnew = jnp.where(upd, res + pred, res)
        return jnp.concatenate([vnew[None], w[:-1]], axis=0), vnew

    w0 = jnp.zeros((K, S), jnp.int32)
    _, out = jax.lax.scan(body, w0, (vals.T, jnp.arange(T, dtype=jnp.int32)))
    return out.T


def lpc_restore_sharded(vals, orders, shifts, blocks, coefs, mesh,
                        use_pallas: bool | None = None):
    """Mesh-sharded batched restore: subframe lanes are fully independent, so
    they split over every mesh axis with ZERO collectives (SURVEY.md §2.4
    "sharded over chips" applied to the FLAC fleet). Pads lanes to a
    device-count multiple; on TPU meshes each shard runs the Pallas kernel
    under shard_map, elsewhere the jnp scan twin partitions under jit."""
    S, T = vals.shape
    n = mesh.devices.size
    pad = (-S) % n
    K = _order_bucket(int(np.max(orders)) if len(orders) else 1)

    def padded(a, fill=0):
        a = jnp.asarray(a, jnp.int32)
        width = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
        return jnp.pad(a, width, constant_values=fill)

    vals_p = padded(vals)
    args = (vals_p, padded(orders), padded(shifts),
            padded(blocks), padded(coefs)[:, :K])
    P = jax.sharding.PartitionSpec
    axes = tuple(mesh.axis_names)
    lane = jax.sharding.NamedSharding(mesh, P(axes))
    lane2 = jax.sharding.NamedSharding(mesh, P(axes, None))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        specs = (P(axes, None), P(axes), P(axes), P(axes), P(axes, None))
        fn = jax.jit(jax.shard_map(
            lambda v, o, s, b, c: lpc_restore_pallas(v, o, s, b, c, K=K),
            mesh=mesh, in_specs=specs, out_specs=P(axes, None),
            check_vma=False))  # pallas outputs carry no vma metadata
        out = fn(*args)
    else:
        shardings = (lane2, lane, lane, lane, lane2)
        args = tuple(jax.device_put(a, sh) for a, sh in zip(args, shardings))
        out = lpc_restore_scan(*args, K)
    return out[:S]


def lpc_restore_pallas(vals, orders, shifts, blocks, coefs, interpret: bool = False,
                       K: int | None = None):
    """Flat-lane wrapper: vals int32[S, T] (+ per-lane order/shift/block,
    coefs [S, 32]) -> restored int32[S, T]. Pads lanes to [32, 128] groups and
    T to the time tile; tap count specializes on the batch's max order (pass
    ``K`` explicitly under tracing, e.g. inside shard_map, where orders is
    abstract)."""
    from .dfpwm_pallas import groups_to_lanes, lanes_to_groups

    vals = jnp.asarray(vals, jnp.int32)
    S, T = vals.shape
    if K is None:
        K = _order_bucket(int(np.max(orders)) if len(orders) else 1)
    gm, _ = lanes_to_groups(vals, TIME_TILE)

    def pack(v):
        v = jnp.asarray(v, jnp.int32)
        Lp = -(-S // GROUP) * GROUP
        return jnp.pad(v, (0, Lp - S)).reshape(Lp // GROUP, SUB, LANE)

    meta = jnp.stack([pack(orders), pack(shifts), pack(blocks)], axis=1)
    co = jnp.asarray(coefs, jnp.int32)[:, :K]
    Lp = -(-S // GROUP) * GROUP
    co = jnp.pad(co, ((0, Lp - S), (0, 0)))
    coef_gm = jnp.moveaxis(co.reshape(Lp // GROUP, SUB, LANE, K), -1, 1)
    out_gm = lpc_restore_grouped(gm, meta, coef_gm, K, interpret)
    return groups_to_lanes(out_gm, S, T)
