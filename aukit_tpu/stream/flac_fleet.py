"""Batched FLAC fleet: N concurrent FLAC streams, ONE lane-batched LPC-restore
dispatch per step (SURVEY.md §2.4 "batch parallelism across streams" — the
north-star axis — applied to the reference's flagship network-streaming case,
``aukit.stream.flac``, aukit.lua:3115-3191).

Where ``stream.flac`` decodes one stream through one iterator, the fleet packs
many independent drip-fed FLAC streams into fixed lanes and composes the
existing pieces per step:

 1. **host parse, per lane**: the incremental frame walk (native C++
    ``flac_parse`` with ``end_pos``, else the Python BitReader) commits frames
    as soon as their bytes — including the CRC16 footer — have arrived; only
    the undecoded tail stays buffered (aukit.lua:3128-3144 lazy-source
    semantics, same stall bound as stream.flac);
 2. **one batched LPC restore**: every committed subframe of every lane joins
    a single flat batch — subframes are fully independent recurrence lanes, so
    the WHOLE fleet restores in one dispatch (``codecs.flac.restore_flat``:
    the [32,128]-tiled int32-limb Pallas kernel on TPU, the C++ in-place
    restore elsewhere);
 3. **vectorized DSP, batched across lanes**: per-frame-block resample with
    2-sample history (``lua_block_resample`` over stacked [pairs, C, 2+n]
    extents) and the true recursive lowpass (``iir_lowpass_scan``), evaluated
    in "rounds" (every lane's r-th block together) so each lane's IIR state
    chains exactly as stream.flac's does. Both kernels are elementwise over
    the leading axis, so per-lane outputs are BIT-IDENTICAL to a solo
    ``stream.flac(data, mono=True)`` run (tests/test_flac_fleet.py asserts
    equality, not closeness).

Output contract: ``step()`` emits ``float32[L, output_rate]`` one-second
windows of int8-range samples (stream.flac's scale) with a per-lane
real-audio mask — lanes progress raggedly (variable frame sizes, jittery
feeds), so a starved lane is masked, never stalls the batch, and never gets
silence spliced into its timeline (§5.3). With ``mono=False`` windows keep
the decoded channels — ``float32[L, channels, output_rate]`` per-channel
chunks, each channel bit-equal to solo ``stream.flac(data, mono=False)``
(reference chunk contract aukit.lua:2223-2227). Per-lane checkpoints capture
(byte offset, pending tail, resampler history, lowpass state, FIFO remnant) —
restore + re-feed from ``byte_offset + len(pending)`` resumes bit-exactly
(§5.4; FLAC seek coarse-positioning lives in stream/seek.py).
"""

from __future__ import annotations

import collections
import functools
import math
import struct
import time

import numpy as np

from ..codecs import flac as flac_codec
from ..config import CONFIG, get_interpolation
from ..parallel.pipeline import fir_alpha
from .batch import BatchMetrics
from .engine import block_resample_plan, iir_lowpass_scan, lua_block_resample

__all__ = ["FlacFleet"]

from . import _STALL_LIMIT as _PULL_STALL_LIMIT  # shared with stream.flac:
# the fleet's stall poisoning mirrors the solo stream's undecodable bound


def _bucket(n: int) -> int:
    """Next power of two: bounds device-DSP recompiles to log-many shapes."""
    return 1 << max(0, (n - 1)).bit_length()


def _fit_channels(arr: np.ndarray, cap: int) -> np.ndarray:
    """[C, T] -> [cap, T]: extra channels truncate, missing channels
    replicate channel 0 (the reference's ``chunk[i] or chunk[1]`` speaker
    fallback, aukit.lua:1935)."""
    C = arr.shape[0]
    if C == cap:
        return arr
    if C > cap:
        return arr[:cap]
    return np.concatenate(
        [arr, np.broadcast_to(arr[:1], (cap - C, arr.shape[1]))])


from ..ops.resample import block_interp_device as _block_interp_device  # noqa: E402
# (shared traced interpolator core — also used by parallel.pipeline.dsp_chain)


@functools.lru_cache(maxsize=128)
def _device_resample_fn(n: int, in_rate: int, out_rate: int, mode: str, window: int):
    """Jitted f32 twin of the per-block lua_block_resample (all 4 modes):
    ext f32[P, C, n+2] -> f32[P, C, out_len]. Static plan tables baked in."""
    import jax

    out_len, ffx0, frac, exact, w = block_resample_plan(n, in_rate, out_rate, mode, window)
    if out_len == n and exact.all() and (ffx0 == np.arange(n)).all():
        # identity rate: every mode passes p1 through at exact x
        # (where(exact, p1, ...) — aukit.lua:2397) — a pure slice, no gather
        @jax.jit
        def fn(ext):
            return ext[..., 2:2 + out_len]

        return fn, out_len

    @jax.jit
    def fn(ext):
        return _block_interp_device(ext, n, 2, out_len, ffx0, frac, exact,
                                    mode, w)

    return fn, out_len


@functools.lru_cache(maxsize=64)
def _device_decode_fn(K: int, nsubs: int, chan_asgn: int, depth: int,
                      n: int, rate: int, out_rate: int, mode: str,
                      window: int, interpret: bool, mesh=None):
    """Jitted device-resident decode chain for ONE uniform geometry:
    scattered residuals int32[Sp, n] -> Pallas LPC restore -> wasted-bits
    shift -> stereo decorrelation butterflies -> sign wrap -> f32 normalize
    (*2^-depth, exact) -> per-block resample (all 4 modes; "none"/"linear"
    never index the 2 history columns, cubic/sinc gather each frame's
    history from the PREVIOUS frame's tail on device, first frames from the
    host-carried ``tails0``) -> (res f32[F, C, out_len], tail f32[F, C, <=2]
    raw dec tails for the host-side history mirror). Composes with
    _device_block_iir_scale_fn: the decoded stream never visits the host
    between parse and the final windows.

    With a ``mesh``, the Pallas restore runs under shard_map over the
    subframe rows (row-local, zero collectives — the lpc_restore_sharded
    pattern); everything else stays global-view jit, so GSPMD shards the
    elementwise chain and inserts the few gathers' collectives itself.
    Callers must pad ``Sp`` to a device-count multiple."""
    import jax
    import jax.numpy as jnp

    from ..kernels.flac_pallas import lpc_restore_pallas

    out_len, ffx0, frac, exact, w = block_resample_plan(
        n, rate, out_rate, mode, window)
    identity = bool(out_len == n and exact.all()
                    and (ffx0 == np.arange(n)).all())
    ffx = jnp.asarray(ffx0)
    fracj = jnp.asarray(frac.astype(np.float32))
    exactj = jnp.asarray(exact)
    half = 1 << (depth - 1)
    full = 1 << depth
    scale = np.float32(1.0) / np.float32(1 << depth)  # /2^depth, exact

    @jax.jit
    def fn(vals, orders, shifts, blocks, coefs, wasted, first, prev_idx,
           tails0):
        if mesh is None:
            restored = lpc_restore_pallas(
                vals, orders, shifts, blocks, coefs, interpret, K)
        else:
            P = jax.sharding.PartitionSpec
            axes = tuple(mesh.axis_names)
            restored = jax.shard_map(
                lambda v, o, s, b, c: lpc_restore_pallas(
                    v, o, s, b, c, interpret, K),
                mesh=mesh,
                in_specs=(P(axes, None), P(axes), P(axes), P(axes),
                          P(axes, None)),
                out_specs=P(axes, None), check_vma=False,
            )(vals, orders, shifts, blocks, coefs)
        restored = restored << wasted[:, None]  # [Sp, n] i32
        F = vals.shape[0] // nsubs
        rows = restored.reshape(F, nsubs, n)
        if chan_asgn <= 7:
            chans = rows
        else:
            a, b = rows[:, 0], rows[:, 1]
            if chan_asgn == 8:  # left/side
                b = a - b
            elif chan_asgn == 9:  # side/right
                a = a + b
            else:  # mid/side
                side = b
                right = a - (side >> 1)
                b = right
                a = right + side
            chans = jnp.stack([a, b], axis=1)
        wrapped = jnp.where(chans >= half, chans - full, chans)
        dec = wrapped.astype(jnp.float32) * scale  # [F, C, n]
        if identity:
            res = dec
        elif mode == "none":
            res = jnp.take(dec, jnp.clip(ffx, 0, n - 1), axis=-1)
        elif mode == "linear":
            p1 = jnp.take(dec, jnp.clip(ffx, 0, n - 1), axis=-1)
            p2 = jnp.take(dec, jnp.minimum(ffx + 1, n - 1), axis=-1)
            res = jnp.where(exactj, p1, p1 + (p2 - p1) * fracj)
        else:  # cubic / sinc: 2-column history from the previous frame
            hist = jnp.where(first[:, None, None], tails0,
                             jnp.take(dec, prev_idx, axis=0)[..., n - 2:])
            ext = jnp.concatenate([hist, dec], axis=-1)
            res = _block_interp_device(ext, n, 2, out_len, ffx0, frac,
                                       exact, mode, w)
        return res, dec[..., n - 2:]  # caller guards n >= 2

    return fn, out_len


@functools.lru_cache(maxsize=64)
def _device_grouped_fn(K: int, nsubs: int, chan_asgn: int, depth: int,
                       n: int, rate: int, out_rate: int, mode: str,
                       window: int, out_mode: str, interpret: bool):
    """Grouped-residency fusion of ``_device_decode_fn`` +
    ``_device_block_iir_scale_fn`` for UNMESHED fleets: the decoded stream
    stays in the Pallas kernels' native [G, T, 32, 128] layout from the LPC
    restore through the block IIR, gain line and int8-range scale. The
    lane-major route pays 4-6 full-array relayout copies per step at the two
    Pallas custom-call boundaries (custom calls pin default layouts; round-5
    profile: ~16 of 23.4 ms/pass at bench scale was relayouts running at
    mem-BW) — here exactly TWO remain: one transpose in (residual scatter ->
    grouped) and one out (scaled windows -> lane-major), with the whole
    middle chain elementwise or axis-gathers in grouped space.

    Layout contract: subframe rows pack PLANAR — subframe j of frame f at
    row ``j * FpR + f`` with each channel plane padded to whole [32, 128]
    groups (FpR = GaG * 4096) — so the stereo decorrelation butterflies
    (aukit.lua:553-566 channel assignments) are pure group-axis slices and
    every per-frame scalar (gain line, chain state, block index) rides a
    [GaG, 32, 128] pack that reshapes, never transposes. Per-element math is
    kept verbatim from the lane-major route, so outputs are BIT-identical to
    it (pinned by test_fleet_device_route_sharded_over_mesh_bit_exact and
    the dryrun's mesh-vs-unmeshed FLAC case, which now cross-check the two
    implementations).

    Returns (fn, out_len); fn maps the COMPACT planar host scatter
    ([nsubs, Fb, ...]; group padding happens on device) + parse metadata to
    (windows [Lb, (C,) m*out_len], new_state f32[Lb, C], lane tail samples
    f32[Lb, C, 2]). The first/tails0 history inputs are read only by
    cubic/sinc at a non-identity rate (traced-but-dropped otherwise)."""
    import jax
    import jax.numpy as jnp

    from ..kernels.dfpwm_pallas import lanes_to_groups
    from ..kernels.flac_pallas import (GROUP, LANE, SUB, TIME_TILE,
                                       lpc_restore_grouped)
    from ..kernels.iir_pallas import iir_zero_grouped

    out_len, ffx0, frac, exact, w = block_resample_plan(
        n, rate, out_rate, mode, window)
    if out_len == 0:
        return None, 0
    identity = bool(out_len == n and exact.all()
                    and (ffx0 == np.arange(n)).all())
    C = nsubs if chan_asgn <= 7 else 2
    half = 1 << (depth - 1)
    full = 1 << depth
    scale = np.float32(1.0) / np.float32(1 << depth)  # /2^depth, exact
    Tp = -(-n // TIME_TILE) * TIME_TILE
    out_lenP = -(-out_len // TIME_TILE) * TIME_TILE  # block-IIR tile pad
    padT = out_lenP - out_len
    # plan tables padded to the IIR tile: pad outputs gather a clamped index
    # and are sliced away before the final lane transpose
    ffx_p = np.concatenate([ffx0, np.full(padT, ffx0[-1], np.int64)])
    frac_p = np.concatenate([frac, np.zeros(padT)])
    exact_p = np.concatenate([exact, np.ones(padT, bool)])
    w_p = None if w is None else np.pad(w, ((0, padT), (0, 0)))
    alpha = fir_alpha(rate, out_rate)
    cdec = np.float32(1.0 - alpha)
    dvec = np.cumprod(np.full(out_len, cdec, dtype=np.float32),
                      dtype=np.float32)  # dvec[t] = c^(t+1), f32 chain order
    dN = dvec[-1]
    dvec_p = np.pad(dvec, (0, padT))
    if dN:
        chain = lambda s, f: (f + dN * s, s)  # noqa: E731
    else:  # c^out_len underflowed: the chain is a pure shift
        chain = lambda s, f: (f, s)  # noqa: E731

    @jax.jit
    def fn(vals, orders, shifts, wasted, coefs, idx, vmask, lastblk, lastfr,
           rmul, g0f, g1f, donef, spanf, ls, first, tails0):
        # hosts hand over COMPACT [nsubs, Fb, ...] arrays (Fb = pow2 frame
        # bucket — the transfer is the same size as the lane-major route's);
        # the group padding to whole [32, 128] planes happens HERE, on
        # device, where it fuses into the relayout instead of riding the
        # tunnel as zeros
        Fb = vals.shape[1]
        GaG = -(-Fb // GROUP)  # groups per channel plane
        FpR = GaG * GROUP
        padF = FpR - Fb
        G = nsubs * GaG
        RowsP = nsubs * FpR
        Lb = idx.shape[0]

        def fpad(v, fill=0):  # compact frame axis -> plane-padded
            width = ((0, 0), (0, padF)) + ((0, 0),) * (v.ndim - 2)
            return jnp.pad(v, width, constant_values=fill)

        vals_p = fpad(vals).reshape(RowsP, n)
        gm, _ = lanes_to_groups(vals_p, TIME_TILE)  # the ONE in-relayout

        def pack(v):  # per-row scalar -> grouped (pure reshape: row
            return fpad(v).reshape(G, SUB, LANE)  # r = g*4096 + s*128 + l)

        def fpack(v, fill=0):  # per-FRAME scalar -> one plane's groups
            return jnp.pad(v, (0, padF),
                           constant_values=fill).reshape(GaG, SUB, LANE)

        meta_gm = jnp.stack(
            [pack(orders), pack(shifts),
             jnp.full((G, SUB, LANE), n, jnp.int32)], axis=1)
        coef_gm = jnp.moveaxis(
            fpad(coefs).reshape(G, SUB, LANE, K), -1, 1)
        restored = lpc_restore_grouped(gm, meta_gm, coef_gm, K, interpret)
        restored = restored << pack(wasted)[:, None]  # [G, Tp, 32, 128]
        planes = restored.reshape(nsubs, GaG, Tp, SUB, LANE)
        if chan_asgn <= 7:
            chans = planes
        else:
            a, b = planes[0], planes[1]
            if chan_asgn == 8:  # left/side
                b = a - b
            elif chan_asgn == 9:  # side/right
                a = a + b
            else:  # mid/side
                side = b
                right = a - (side >> 1)
                b = right
                a = right + side
            chans = jnp.stack([a, b], axis=0)
        wrapped = jnp.where(chans >= half, chans - full, chans)
        dec_t = wrapped.astype(jnp.float32) * scale  # [C, GaG, Tp, 32, 128]
        # raw dec tails, frame-major (tiny: 2 time columns) — the host
        # history mirror + cubic/sinc cross-frame history source
        tails_fr = jnp.transpose(dec_t[:, :, n - 2:n],
                                 (1, 3, 4, 0, 2)).reshape(FpR, C, 2)
        if identity:
            res = dec_t  # Tp == out_lenP; time pad is exactly zero
        elif mode == "none":
            res = jnp.take(dec_t, jnp.asarray(np.clip(ffx_p, 0, n - 1)),
                           axis=2)
        elif mode == "linear":
            p1 = jnp.take(dec_t, jnp.asarray(np.clip(ffx_p, 0, n - 1)),
                          axis=2)
            p2 = jnp.take(dec_t, jnp.asarray(np.minimum(ffx_p + 1, n - 1)),
                          axis=2)
            ex = jnp.asarray(exact_p).reshape(1, 1, -1, 1, 1)
            fr_ = jnp.asarray(frac_p.astype(np.float32)).reshape(1, 1, -1, 1, 1)
            res = jnp.where(ex, p1, p1 + (p2 - p1) * fr_)
        else:  # cubic / sinc: 2-column history from the previous frame
            prev = jnp.maximum(jnp.arange(FpR, dtype=jnp.int32) - 1, 0)
            tprev = jnp.take(tails_fr, prev, axis=0)
            hist = jnp.where(fpad(first[None])[0, :, None, None],
                             fpad(tails0[None])[0], tprev)
            hist_g = jnp.transpose(hist.reshape(GaG, SUB, LANE, C, 2),
                                   (3, 0, 4, 1, 2))  # tiny: 2 columns
            ext = jnp.concatenate([hist_g, dec_t], axis=2)
            res = _block_interp_device(ext, n, 2, out_lenP, ffx_p, frac_p,
                                       exact_p, mode, w_p, axis=2)
        res_g = res.reshape(C * GaG, out_lenP, SUB, LANE)
        y0 = iir_zero_grouped(res_g, float(alpha), interpret)
        # cross-frame chain + state (all frame-level: tiny)
        fin0 = y0[:, out_len - 1]  # zero-init finals [C*GaG, 32, 128]
        fin0_fr = fin0.reshape(C, FpR).T  # [FpR, C]
        fb = jnp.take(fin0_fr, idx, axis=0)  # [Lb, m, C]
        _, s_in = jax.lax.scan(chain, ls, jnp.moveaxis(fb, 1, 0))
        s_in = jnp.moveaxis(s_in, 0, 1)  # incoming state per block [Lb, m, C]
        lb = lastblk[:, None, None]
        # filter state at each lane's last sample (pre-gain, post-chain):
        # fin + c^out_len * s_in — identical to the lane route's indexed read
        new_state = (jnp.take_along_axis(fb, lb, axis=1)
                     + dN * jnp.take_along_axis(s_in, lb, axis=1))[:, 0]
        # scatter incoming states to frames (pad idx entries add +0.0 to
        # frame 0 — harmless; valid frames belong to exactly one lane)
        s_fr = jnp.zeros((FpR, C), jnp.float32).at[idx.reshape(-1)].add(
            jnp.where(vmask[..., None], s_in, 0.0).reshape(-1, C))
        s_g = s_fr.T.reshape(C, GaG, 1, SUB, LANE)
        decj = jnp.asarray(dvec_p)
        y5 = (y0.reshape(C, GaG, out_lenP, SUB, LANE)
              + decj[None, None, :, None, None] * s_g)
        # volume AFTER the state read; per-sample linear ramp line — the
        # lane route's g(t) over concatenated lane time, evaluated per frame
        # via the exact-integer offset rmul = r*out_len (f32-exact ints, so
        # done + (rmul + t) bit-equals the lane route's done + arange(T))
        t = jnp.arange(out_lenP, dtype=jnp.float32)
        tg = fpack(rmul)[:, None] + t[None, :, None, None]
        fracg = jnp.minimum((fpack(donef)[:, None] + tg)
                            / fpack(spanf, fill=1)[:, None], 1.0)
        g = fpack(g0f)[:, None] + (fpack(g1f)[:, None]
                                   - fpack(g0f)[:, None]) * fracg
        y5 = y5 * g[None]
        scaled = jnp.clip(y5 * jnp.where(y5 < 0, 128.0, 127.0), -128.0, 127.0)
        if out_mode == "mix":
            scaled = scaled.mean(axis=0)
        elif out_mode == "first":
            scaled = scaled[0]
        # the ONE out-relayout: slice the time pad BEFORE the transpose
        # (XLA folds a prefix slice into the relayout copy — see
        # kernels/dfpwm_pallas.py groups_to_lanes)
        if out_mode == "multi":
            rows = jnp.transpose(scaled[:, :, :out_len],
                                 (1, 3, 4, 0, 2)).reshape(FpR, C, out_len)
            win = jnp.take(rows, idx, axis=0)  # [Lb, m, C, out_len]
            win = jnp.moveaxis(win, 2, 1).reshape(Lb, C, -1)
        else:
            rows = jnp.transpose(scaled[:, :out_len],
                                 (0, 2, 3, 1)).reshape(FpR, out_len)
            win = jnp.take(rows, idx, axis=0).reshape(Lb, -1)
        tails_last = jnp.take(tails_fr, lastfr, axis=0)  # [Lb, C, 2]
        return win, new_state, tails_last

    return fn, out_len


@functools.lru_cache(maxsize=128)
def _device_block_iir_scale_fn(out_len: int, alpha: float, out_mode: str,
                               interpret: bool, mesh=None):
    """Block-parallel twin of ``_device_iir_scale_fn``: the 1-pole lowpass
    runs as ONE Pallas pass over every (lane, block, channel) with zero
    initial state (kernels/iir_pallas.py — HBM once in/once out, vs log2(T)
    full-array doubling passes), then the cross-block chain is recovered
    exactly: block r's incoming state s_r follows the scalar recurrence
    ``s_{r+1} = fin0_r + c^out_len * s_r`` (fin0 = zero-init finals; the
    decay factor is usually exactly 0.0 in f32, collapsing the scan to a
    shift) and the correction ``y += c^(t+1) * s`` is one fused elementwise
    pass. Takes (res f32[Pb, C, out_len] resampled blocks, idx int[Lb, m]
    rows per lane in time order, tvalid int32[Lb], state f32[Lb, C]);
    returns the same (scaled f32[Lb, T'], new_state) contract."""
    import jax
    import jax.numpy as jnp

    from ..kernels.dfpwm_pallas import groups_to_lanes, lanes_to_groups
    from ..kernels.iir_pallas import TIME_TILE, iir_zero_grouped

    c = np.float32(1.0 - alpha)
    dec = np.cumprod(np.full(out_len, c, dtype=np.float32),
                     dtype=np.float32)  # dec[t] = c^(t+1), f32 chain order
    dN = dec[-1]
    decj = jnp.asarray(dec)
    if dN:
        chain = lambda s, f: (f + dN * s, s)  # noqa: E731
    else:  # c^out_len underflowed: the chain is a pure shift
        chain = lambda s, f: (f, s)  # noqa: E731

    def iir0(rows):
        """Zero-state block IIR over shard-local rows [R, out_len] — the
        Pallas segment; row-local, so a mesh shards it with zero
        collectives (shard_map below)."""
        gm, _dims = lanes_to_groups(rows, TIME_TILE)
        return groups_to_lanes(iir_zero_grouped(gm, float(alpha), interpret),
                               rows.shape[0], out_len)

    @functools.partial(jax.jit, donate_argnums=())
    def fn(res, idx, tvalid, state, g0, g1, gdone, gspan):
        Pb, C, _ = res.shape
        rows = res.reshape(Pb * C, out_len)
        if mesh is None:
            y0 = iir0(rows)
        else:  # callers pad Pb to a device-count multiple
            P = jax.sharding.PartitionSpec
            axes = tuple(mesh.axis_names)
            y0 = jax.shard_map(iir0, mesh=mesh, in_specs=P(axes, None),
                               out_specs=P(axes, None), check_vma=False)(rows)
        y0 = y0.reshape(Pb, C, out_len)
        fin0 = y0[..., -1]  # [Pb, C]
        yb = jnp.take(y0, idx, axis=0)  # [Lb, m, C, out_len]
        fb = jnp.take(fin0, idx, axis=0)  # [Lb, m, C]
        _, s_in = jax.lax.scan(chain, state, jnp.moveaxis(fb, 1, 0))
        s_in = jnp.moveaxis(s_in, 0, 1)  # incoming state per block [Lb, m, C]
        y = yb + decj * s_in[..., None]
        x2 = jnp.moveaxis(y, 2, 1).reshape(y.shape[0], C, -1)
        T = x2.shape[-1]
        i2 = jnp.clip(tvalid - 1, 0, T - 1)
        new_state = jnp.take_along_axis(x2, i2[:, None, None], axis=-1)[..., 0]
        # volume AFTER the state read; per-sample linear ramp line
        # g(t) = g0 + (g1-g0)*min((done+t)/span, 1): constant lanes carry
        # (g, g, 1, 1) so the expression folds to exactly g (set_volume ramp)
        t = jnp.arange(T, dtype=jnp.float32)
        frac = jnp.minimum((gdone[:, None] + t) / gspan[:, None], 1.0)
        g = g0[:, None] + (g1[:, None] - g0[:, None]) * frac  # [Lb, T]
        x2 = x2 * g[:, None, :]
        scaled = jnp.clip(x2 * jnp.where(x2 < 0, 128.0, 127.0), -128.0, 127.0)
        if out_mode == "mix":
            scaled = scaled.mean(axis=1)
        elif out_mode == "first":
            scaled = scaled[:, 0]
        # "multi": keep the channel axis [Lb, C, T]
        return scaled, new_state

    return fn


@functools.lru_cache(maxsize=128)
def _device_iir_scale_fn(T: int, alpha: float, out_mode: str):
    """Jitted f32 IIR (recursive doubling over the whole step) + int8-range
    scale + mono mean: x f32[L, C, T], state f32[L, C], tvalid int32[L] ->
    (scaled f32[L, T'], new_state f32[L, C]). State is read at each lane's
    last VALID index, so trailing pad never corrupts the carry."""
    import jax
    import jax.numpy as jnp

    c = np.float32(1.0 - alpha)
    a = np.float32(alpha)

    @jax.jit
    def fn(x, state, tvalid, g0, g1, gdone, gspan):
        y = x * a
        y = y.at[..., 0].add(c * state)
        ck = c
        shift = 1
        while shift < T:
            if ck == 0:  # trace-time f32 underflow: every further doubling
                break  # pass adds exactly +0.0 — skipping is bit-identical
            y = y.at[..., shift:].add(ck * y[..., :-shift])
            ck = ck * ck
            shift *= 2
        idx = jnp.clip(tvalid - 1, 0, T - 1)
        new_state = jnp.take_along_axis(y, idx[:, None, None], axis=-1)[..., 0]
        # volume AFTER the state read; same ramp line as the block-IIR twin
        t = jnp.arange(T, dtype=jnp.float32)
        frac = jnp.minimum((gdone[:, None] + t) / gspan[:, None], 1.0)
        g = g0[:, None] + (g1[:, None] - g0[:, None]) * frac  # [Lb, T]
        y = y * g[:, None, :]
        scaled = jnp.clip(y * jnp.where(y < 0, 128.0, 127.0), -128.0, 127.0)
        if out_mode == "mix":
            scaled = scaled.mean(axis=1)
        elif out_mode == "first":
            scaled = scaled[:, 0]
        # "multi": keep the channel axis [Lb, C, T]
        return scaled, new_state

    return fn


class _Lane:
    __slots__ = (
        "buf", "eof", "dirty", "ended", "error", "consumed", "pos",
        "rate", "channels", "depth", "num_samples", "meta", "alpha",
        "last", "ls", "fifo", "fill", "samples_out", "stalled_at", "gain",
        "gain0", "ramp_pos", "ramp_len",
    )

    def __init__(self):
        self.buf = bytearray()
        self.eof = False
        self.dirty = False
        self.ended = False  # no more frames will ever decode
        self.error: str | None = None
        self.consumed = 0  # committed stream bytes (deleted from buf)
        self.pos = 0  # parse offset within buf (fpos until first commit)
        self.rate = None  # header not yet parsed
        self.channels = 0
        self.depth = 0
        self.num_samples = 0
        self.meta: dict = {}
        self.alpha = 0.0
        self.last: np.ndarray | None = None  # [C, 2] f64 resample history
        self.ls: np.ndarray | None = None  # [C] f64 lowpass state
        self.fifo: collections.deque[np.ndarray] = collections.deque()
        self.fill = 0
        self.samples_out = 0
        self.stalled_at: int | None = None
        self.gain = 1.0  # per-lane volume (aukit.lua:1935 analog)
        self.gain0 = 1.0  # ramp start gain (== gain when not ramping)
        self.ramp_pos = 0  # decoded samples into the active ramp
        self.ramp_len = 0  # ramp span in output samples (0 = no ramp)


class FlacFleet:
    """Fixed-lane batched FLAC -> 48 kHz decoder (see module docstring).

    Parameters
    ----------
    lanes : number of concurrent streams
    device_restore : route the batched LPC restore to the Pallas TPU kernel
        (True), the host C++/numpy path (False), or the CONFIG-driven default
        (None — ``flac_device_restore_min`` threshold on TPU backends)
    mesh : optional ``jax.sharding.Mesh`` — the per-step restore batch shards
        its subframe lanes over every mesh axis with zero collectives
        (SURVEY.md §2.4 "sharded over chips"; Pallas under shard_map on TPU,
        the jnp limb-scan twin elsewhere). Depth > 24 lanes fall back to the
        host restore, and an EXPLICIT ``device_restore=False`` keeps the host
        restore even under a mesh (restore_flat's documented opt-out).

    Each lane carries its own format (rate/channels/depth parsed from its own
    ``fLaC`` header), so a fleet may mix files freely; malformed lanes are
    poisoned individually (``lane_error``) and never affect the batch.
    """

    def __init__(self, lanes: int, device_restore: bool | None = None,
                 mesh=None, device_dsp: bool = False, mono: bool = True,
                 channels: int = 2, interpolation: str | None = None):
        if lanes < 1:
            raise ValueError("need at least one lane")
        self.lanes = lanes
        self.device_restore = device_restore
        self.mesh = mesh
        # mono=False keeps the decoded channels: windows become
        # f32[L, channels, output_rate] per-channel chunks (the reference
        # contract aukit.lua:2223-2227); lanes with fewer channels replicate
        # channel 0, lanes with more truncate to the fleet capacity.
        self.mono = mono
        self.out_ch = 1 if mono else channels
        # device_dsp: run the resample+lowpass+scale phase as two fused f32
        # device dispatches per step (for locally-attached chips; this
        # environment's tunnel makes per-step dispatches host-bound). The
        # host f64 path remains the bit-parity oracle; the twin is f32-close
        # (same contract as ChunkResampler's device twin). Steps whose parsed
        # frames span multiple geometries fall back to the host path.
        self.device_dsp = device_dsp
        # lowpass routing inside the device DSP: the Pallas block-parallel
        # kernel on real TPUs, the XLA recursive-doubling twin elsewhere
        # (pallas-TPU requires interpret mode off-device; tests may set
        # ``fleet._block_iir = "interpret"`` to force the kernel path on CPU)
        self._block_iir = False
        if device_dsp:
            import jax

            self._block_iir = jax.default_backend() == "tpu"
        # per-fleet interpolation override (VERDICT r3 weak 6): None reads
        # CONFIG.default_interpolation at construction, so two fleets can run
        # different quality settings without mutating global config
        self.mode = get_interpolation(interpolation)
        self.out_rate = CONFIG.output_rate
        self._lanes = [_Lane() for _ in range(lanes)]
        self.metrics = BatchMetrics()

    # -- ingestion -----------------------------------------------------------
    def feed(self, lane: int, data: bytes | None):
        """Append bytes to a lane; None marks end-of-stream."""
        ln = self._lanes[lane]
        if data is None:
            ln.eof = True
        else:
            ln.buf.extend(data)
        ln.dirty = True

    def feed_many(self, datas):
        for lane, d in enumerate(datas):
            self.feed(lane, d)

    # -- queries ---------------------------------------------------------------
    @property
    def done(self) -> bool:
        return all(ln.ended and ln.fill == 0 for ln in self._lanes)

    @property
    def active(self) -> np.ndarray:
        return np.array([not ln.ended or ln.fill > 0 for ln in self._lanes])

    def lane_error(self, lane: int) -> str | None:
        """Poison reason for an ended lane (None = healthy); §5.3 isolation."""
        return self._lanes[lane].error

    def set_volume(self, lane: int, volume: float, ramp: bool = False):
        """Per-lane playback volume (aukit.lua:1935 analog): the smoothed
        stream scales by ``volume`` after the filter-state read, before the
        int8-range scale — on every path (host oracle, device DSP twins).
        Takes effect from the next decoded block; volume 1.0 is bit-exactly
        the ungained stream.

        With ``ramp=True`` the gain moves linearly from its current
        (instantaneous, mid-ramp included) value to ``volume`` across the
        lane's next second of decoded output — the click-free contract of
        ``BatchStreamEngine.set_volume(ramp=True)`` (whose ramp spans one
        chunk, i.e. the same one second of output), the batched effects.fade
        analog."""
        ln = self._lanes[lane]
        if ramp:
            ln.gain0 = self._instant_gain(ln)
            ln.ramp_pos = 0
            ln.ramp_len = self.out_rate
        else:
            ln.gain0 = float(volume)
            ln.ramp_pos = ln.ramp_len = 0
        ln.gain = float(volume)

    def get_volume(self, lane: int) -> float:
        return self._lanes[lane].gain

    @staticmethod
    def _instant_gain(ln: _Lane) -> float:
        if ln.ramp_len == 0 or ln.ramp_pos >= ln.ramp_len:
            return ln.gain
        frac = ln.ramp_pos / ln.ramp_len
        return ln.gain0 + (ln.gain - ln.gain0) * frac

    @staticmethod
    def _gain_params(ln: _Lane):
        """(g0, g1, done, span) describing the lane's gain over its next
        decoded samples: g(t) = g0 + (g1 - g0) * min((done + t) / span, 1).
        Constant lanes fold to (g, g, 1, 1) so the device expression yields
        exactly g (and exactly 1.0 for unity gain)."""
        if ln.ramp_len == 0 or ln.ramp_pos >= ln.ramp_len:
            return ln.gain, ln.gain, 1.0, 1.0
        return ln.gain0, ln.gain, float(ln.ramp_pos), float(ln.ramp_len)

    @staticmethod
    def _gain_vector(ln: _Lane, T: int) -> np.ndarray | float:
        """Per-sample f64 gains for the lane's next T decoded samples (a
        scalar when constant — the bit-exact legacy path). Callers advance
        the ramp cursor via ``_advance_ramp`` afterwards."""
        g0, g1, done, span = FlacFleet._gain_params(ln)
        if g0 == g1:
            return g1
        t = np.arange(T, dtype=np.float64)
        frac = np.minimum((done + t) / span, 1.0)
        return g0 + (g1 - g0) * frac

    @staticmethod
    def _advance_ramp(ln: _Lane, n: int):
        if ln.ramp_len:
            ln.ramp_pos += int(n)
            if ln.ramp_pos >= ln.ramp_len:
                ln.gain0 = ln.gain
                ln.ramp_pos = ln.ramp_len = 0

    def lane_info(self, lane: int) -> dict | None:
        """(rate, channels, depth, length_seconds, metadata) once the lane's
        header has parsed; None before."""
        ln = self._lanes[lane]
        if ln.rate is None:
            return None
        return {
            "sampleRate": ln.rate, "channels": ln.channels,
            "bitDepth": ln.depth, "metadata": ln.meta,
            "length": ln.num_samples / ln.rate if ln.num_samples else None,
        }

    # -- per-step phases --------------------------------------------------------
    def _parse_header(self, ln: _Lane) -> bool:
        try:
            (ln.rate, ln.channels, ln.depth, ln.num_samples, ln.meta,
             ln.pos) = flac_codec.parse_flac_header(bytes(ln.buf))
        except (IndexError, struct.error):
            ln.rate = None
            if ln.eof:  # stream.flac raises here; a fleet lane is poisoned
                ln.ended, ln.error = True, "unexpected end of FLAC stream"
            return False
        except flac_codec.FlacError as e:
            ln.ended, ln.error = True, str(e)
            return False
        ln.alpha = fir_alpha(ln.rate, self.out_rate)
        ln.last = np.zeros((ln.channels, 2), np.float64)
        ln.ls = np.zeros(ln.channels, np.float64)
        return True

    def _parse_step(self):
        """Incremental frame parse on every dirty lane. Returns
        [(lane_idx, frame_meta, sub, coefs, values), ...] for lanes that
        committed frames this step (stream.flac frames() semantics,
        aukit.lua:3145-3151 + CRC-gated commits)."""
        parsed = []
        for li, ln in enumerate(self._lanes):
            if ln.ended or not ln.dirty:
                continue
            if ln.rate is None and not self._parse_header(ln):
                ln.dirty = False
                continue
            data_now = bytes(ln.buf)
            if ln.eof:
                # final pass: commit the tail frame even without CRC16 bytes
                fm, sub, coefs, values = flac_codec.parse_all_frames(
                    data_now, ln.pos, ln.channels, ln.depth, strict=False)
                end = len(data_now)
                ln.ended = True
            else:
                fm, sub, coefs, values, end = flac_codec.parse_all_frames(
                    data_now, ln.pos, ln.channels, ln.depth,
                    strict=False, incremental=True)
            ln.dirty = False
            if len(fm):
                del ln.buf[:end]
                ln.consumed += end
                ln.pos = 0
                ln.stalled_at = None
                parsed.append((li, fm, sub, coefs, values))
            elif not ln.ended:
                if ln.stalled_at is None:
                    ln.stalled_at = len(ln.buf)
                elif len(ln.buf) - ln.stalled_at > _PULL_STALL_LIMIT:
                    ln.ended, ln.error = True, "undecodable FLAC stream"
        return parsed

    def _device_full_step(self, parsed):
        """Fully device-resident step for ONE uniform geometry: residual
        scatter -> [restore -> decorrelate -> normalize -> resample] ->
        [block IIR -> chain -> scale -> mask] as two device dispatches with
        NO intermediate host transfer (the host handles only parse metadata
        and the final window fetch). Returns {lane: f32[take]} or None when
        the step's geometry is mixed (short final frames, mid-stream format
        changes) — the caller falls back to the staged host path. Mesh
        fleets take this route too (VERDICT r3 item 4): both Pallas
        segments (restore, block IIR) run row-sharded under shard_map and
        the glue stays global-view jit."""
        import jax.numpy as jnp

        from ..kernels.flac_pallas import _order_bucket

        lanes = [p[0] for p in parsed]
        l0 = self._lanes[lanes[0]]
        rate, C, depth = l0.rate, l0.channels, l0.depth
        if depth > 24 or any(
                (self._lanes[li].rate, self._lanes[li].channels,
                 self._lanes[li].depth) != (rate, C, depth) for li in lanes):
            return None
        fm_all = np.concatenate([p[1] for p in parsed])
        n, asgn = int(fm_all[0, 0]), int(fm_all[0, 1])
        if n < 2 or not ((fm_all[:, 0] == n).all()
                         and (fm_all[:, 1] == asgn).all()):
            return None
        blocks_all = np.concatenate([p[2]["block"] for p in parsed])
        if not (blocks_all == n).all():
            return None
        nsubs = C if asgn <= 7 else 2
        if self.mesh is None:
            # grouped-residency route: the stream never leaves the Pallas
            # layout between restore and block IIR (see _device_grouped_fn);
            # mesh fleets keep the lane-major route below (rows shard evenly
            # under shard_map; small per-plane group counts don't)
            return self._device_full_step_grouped(
                parsed, rate, C, depth, n, asgn, nsubs)

        orders = np.concatenate([p[2]["order"] for p in parsed])
        shifts = np.concatenate([p[2]["shift"] for p in parsed])
        wasted = np.concatenate([p[2]["wasted"] for p in parsed])
        coefs = np.concatenate([p[3] for p in parsed]).astype(np.int32)
        values = np.concatenate([p[4] for p in parsed])
        S = len(orders)
        Sp = _bucket(max(S, nsubs))  # pow2 row padding bounds recompiles
        Sp += (-Sp) % nsubs
        if self.mesh is not None:
            # shard_map splits rows evenly: Sp must divide by the device
            # count while staying frame-aligned (F = Sp/nsubs also divides)
            q = nsubs * self.mesh.devices.size
            Sp += (-Sp) % q
        vals = np.zeros((Sp, n), np.int32)
        vals[:S] = values.reshape(S, n)
        pad = np.zeros(Sp - S, np.int32)
        meta = [np.concatenate([a.astype(np.int32), pad])
                for a in (orders, shifts, wasted)]
        blk = np.full(Sp, n, np.int32)
        cf = np.zeros((Sp, coefs.shape[1]), np.int32)
        cf[:S] = coefs
        K = _order_bucket(int(orders.max()) if S else 1)

        interpret = self._block_iir == "interpret"
        fn_a, out_len = _device_decode_fn(
            K, nsubs, asgn, depth, n, rate, self.out_rate, self.mode,
            CONFIG.sinc_window_size, interpret, self.mesh)
        if out_len == 0:
            return None
        # lane -> its frame rows (contiguous per lane, time order preserved);
        # cubic/sinc frames gather history from the previous row on device,
        # first-of-lane rows from the host-carried resample tails
        fstarts = np.concatenate(
            [[0], np.cumsum([len(p[1]) for p in parsed])])
        Fp = Sp // nsubs
        first = np.zeros(Fp, bool)
        tails0 = np.zeros((Fp, C, 2), np.float32)
        for i, li in enumerate(lanes):
            first[fstarts[i]] = True
            tails0[fstarts[i]] = self._lanes[li].last
        prev_idx = np.maximum(np.arange(Fp) - 1, 0)
        res, tails = fn_a(jnp.asarray(vals), jnp.asarray(meta[0]),
                          jnp.asarray(meta[1]), jnp.asarray(blk),
                          jnp.asarray(cf), jnp.asarray(meta[2]),
                          jnp.asarray(first), jnp.asarray(prev_idx),
                          jnp.asarray(tails0))

        Lb = _bucket(len(lanes))
        m_max = _bucket(max(len(p[1]) for p in parsed))
        idx = np.zeros((Lb, m_max), np.int64)
        tval = np.zeros(Lb, np.int32)
        ls = np.zeros((Lb, C), np.float32)
        gp = np.ones((4, Lb), np.float32)  # g0 / g1 / done / span rows
        for i, li in enumerate(lanes):
            F_li = len(parsed[i][1])
            idx[i, :F_li] = fstarts[i] + np.arange(F_li)
            tval[i] = F_li * out_len
            ls[i] = self._lanes[li].ls
            gp[:, i] = self._gain_params(self._lanes[li])
        alpha = float(l0.alpha)
        fn_b = _device_block_iir_scale_fn(out_len, alpha, self._out_mode(C),
                                          interpret, self.mesh)
        scaled, new_state = fn_b(res, jnp.asarray(idx), jnp.asarray(tval),
                                 jnp.asarray(ls), *map(jnp.asarray, gp))
        scaled = np.asarray(scaled)
        new_state = np.asarray(new_state)
        tails = np.asarray(tails)  # [F, C, <=2] raw dec tails (tiny fetch)
        out = {}
        for i, li in enumerate(lanes):
            ln = self._lanes[li]
            ln.ls = new_state[i].astype(np.float64)
            # n >= 2 is guarded above, so the tail is always exactly 2 wide
            ln.last = tails[fstarts[i + 1] - 1].astype(np.float64).copy()
            out[li] = scaled[i][..., : tval[i]]
            self._advance_ramp(ln, int(tval[i]))
        return out

    def _device_full_step_grouped(self, parsed, rate, C, depth, n, asgn,
                                  nsubs):
        """Host prep + dispatch for ``_device_grouped_fn`` (unmeshed fully
        device-resident steps): COMPACT planar scatter ([nsubs, Fb, ...] —
        subframe j of frame f at plane j, row f; the group padding happens
        on device), per-frame gain/chain metadata, one fused device call,
        and the same lane bookkeeping as the lane-major route. Geometry is
        pre-validated by ``_device_full_step`` (uniform rate/C/depth, one
        block size n >= 2, one channel assignment)."""
        import jax.numpy as jnp

        from ..kernels.flac_pallas import _order_bucket

        lanes = [p[0] for p in parsed]
        orders = np.concatenate([p[2]["order"] for p in parsed])
        shifts = np.concatenate([p[2]["shift"] for p in parsed])
        wasted = np.concatenate([p[2]["wasted"] for p in parsed])
        coefs = np.concatenate([p[3] for p in parsed]).astype(np.int32)
        values = np.concatenate([p[4] for p in parsed])
        F = len(orders) // nsubs
        K = _order_bucket(int(orders.max()) if len(orders) else 1)
        interpret = self._block_iir == "interpret"
        fn, out_len = _device_grouped_fn(
            K, nsubs, asgn, depth, n, rate, self.out_rate, self.mode,
            CONFIG.sinc_window_size, self._out_mode(C), interpret)
        if fn is None:
            return None

        # compact planar arrays at a pow2 frame bucket (the same transfer
        # size as the lane-major route's Sp rows); fn pads the frame axis
        # to whole [32, 128] groups ON DEVICE, so the tunnel never carries
        # group-padding zeros
        Fb = _bucket(F)
        vals = np.zeros((nsubs, Fb, n), np.int32)
        om = np.zeros((nsubs, Fb), np.int32)
        sm = np.zeros((nsubs, Fb), np.int32)
        wm = np.zeros((nsubs, Fb), np.int32)
        cf = np.zeros((nsubs, Fb, K), np.int32)
        v3 = values.reshape(F, nsubs, n)
        o3 = orders.reshape(F, nsubs)
        s3 = shifts.reshape(F, nsubs)
        w3 = wasted.reshape(F, nsubs)
        c3 = coefs.reshape(F, nsubs, -1)
        cw = min(K, c3.shape[2])
        for j in range(nsubs):
            vals[j, :F] = v3[:, j]
            om[j, :F] = o3[:, j]
            sm[j, :F] = s3[:, j]
            wm[j, :F] = w3[:, j]
            cf[j, :F, :cw] = c3[:, j, :cw]

        fstarts = np.concatenate(
            [[0], np.cumsum([len(p[1]) for p in parsed])])
        # cross-frame history for cubic/sinc (traced-but-unused — and
        # dropped by XLA — in the other modes; the fill loop is O(lanes))
        first = np.zeros(Fb, bool)
        tails0 = np.zeros((Fb, C, 2), np.float32)
        for i, li in enumerate(lanes):
            first[fstarts[i]] = True
            tails0[fstarts[i]] = self._lanes[li].last

        Lb = _bucket(len(lanes))
        m_max = _bucket(max(len(p[1]) for p in parsed))
        idx = np.zeros((Lb, m_max), np.int32)
        vmask = np.zeros((Lb, m_max), bool)
        tvalh = np.zeros(Lb, np.int32)
        lastblk = np.zeros(Lb, np.int32)
        lastfr = np.zeros(Lb, np.int32)
        ls = np.zeros((Lb, C), np.float32)
        rmul = np.zeros(Fb, np.float32)  # r*out_len: f32-exact ints
        g0f = np.ones(Fb, np.float32)
        g1f = np.ones(Fb, np.float32)
        donef = np.ones(Fb, np.float32)
        spanf = np.ones(Fb, np.float32)
        for i, li in enumerate(lanes):
            F_li = len(parsed[i][1])
            fr = fstarts[i] + np.arange(F_li)
            idx[i, :F_li] = fr
            vmask[i, :F_li] = True
            tvalh[i] = F_li * out_len
            lastblk[i] = F_li - 1
            lastfr[i] = fstarts[i + 1] - 1
            ls[i] = self._lanes[li].ls
            g0, g1, done, span = self._gain_params(self._lanes[li])
            g0f[fr], g1f[fr], donef[fr], spanf[fr] = g0, g1, done, span
            rmul[fr] = np.arange(F_li, dtype=np.float64) * out_len

        win, new_state, tails_last = fn(*map(jnp.asarray, (
            vals, om, sm, wm, cf, idx, vmask, lastblk, lastfr, rmul,
            g0f, g1f, donef, spanf, ls, first, tails0)))
        win = np.asarray(win)
        new_state = np.asarray(new_state)
        tails_last = np.asarray(tails_last)
        out = {}
        for i, li in enumerate(lanes):
            ln = self._lanes[li]
            ln.ls = new_state[i].astype(np.float64)
            # n >= 2 is guarded by the caller: the tail is always 2 wide
            ln.last = tails_last[i].astype(np.float64).copy()
            out[li] = win[i][..., : tvalh[i]]
            self._advance_ramp(ln, int(tvalh[i]))
        return out

    def _out_mode(self, C: int) -> str:
        """Channel handling for the device scale stage: mono fleets mix
        (C > 1) or squeeze (C == 1); multichannel fleets keep the axis."""
        if not self.mono:
            return "multi"
        return "mix" if C > 1 else "first"

    def _lane_geometry(self, p):
        """(rate, channels, depth, block, chan_asgn) when EVERY frame a lane
        committed this step shares one device-eligible geometry, else None."""
        li, fm, sub = p[0], p[1], p[2]
        ln = self._lanes[li]
        if ln.depth > 24 or len(fm) == 0:
            return None
        n, asgn = int(fm[0, 0]), int(fm[0, 1])
        if n < 2 or not ((fm[:, 0] == n).all() and (fm[:, 1] == asgn).all()):
            return None
        if not (sub["block"] == n).all():
            return None
        return (ln.rate, ln.channels, ln.depth, n, asgn)

    def _decode_step(self, parsed):
        """One fleet-wide LPC restore, then per-lane decorrelate + batched
        rounds of resample/lowpass; scaled output lands in the lane FIFOs."""
        # full device residency needs the restore device-capable: explicit
        # True, or the None default on a backend where _block_iir is active
        # (TPU, or forced interpret in tests) — only an explicit
        # device_restore=False opts out. Lanes partition into per-geometry
        # groups (a mixed-rate fleet takes the device route group by group);
        # non-uniform lanes (short final frames, format changes) fall back to
        # the staged host path below. All 4 interpolation modes run on
        # device (VERDICT r3 item 5), and mesh fleets take this route too
        # (item 4: the Pallas segments shard under shard_map).
        if (self.device_dsp and self._block_iir
                and self.device_restore is not False):
            groups: dict[tuple, list] = {}
            residual = []
            for p in parsed:
                key = self._lane_geometry(p)
                if key is None:
                    residual.append(p)
                else:
                    groups.setdefault(key, []).append(p)
            for group in groups.values():
                dev_out = self._device_full_step(group)
                if dev_out is None:
                    residual.extend(group)
                    continue
                for li, samples in dev_out.items():
                    self._push_lane(self._lanes[li], samples)
            if not residual:
                return
            parsed = residual
        sub_all = {k: np.concatenate([p[2][k] for p in parsed])
                   for k in ("order", "shift", "wasted", "block")}
        coefs_all = np.concatenate([p[3] for p in parsed])
        values_all = np.concatenate([p[4] for p in parsed])
        depth_max = max(self._lanes[p[0]].depth for p in parsed)
        restored = flac_codec.restore_flat(
            sub_all, coefs_all, values_all, depth_max,
            device=self.device_restore,
            mesh=self.mesh if depth_max <= 24 else None,
            interpret=self._block_iir == "interpret")
        voffs = np.concatenate(
            [[0], np.cumsum([int(p[2]["block"].sum()) for p in parsed])])

        # per lane: decorrelate + normalize, then per-block resample extents
        # (history = previous block's tail — decoded data, no sequential dep)
        jobs: dict[tuple, list] = {}  # (n, rate, C) -> [(li, round, ext), ...]
        rounds: dict[int, list] = {}  # lane -> [None per block round]
        for k, (li, fm, sub, _c, _v) in enumerate(parsed):
            ln = self._lanes[li]
            raw = flac_codec.decorrelate_frames(
                fm, sub["block"], restored[voffs[k]:voffs[k + 1]],
                ln.channels, ln.depth)
            dec = raw.astype(np.float64) / (1 << ln.depth)
            sizes = fm[:, 0].astype(np.int64)
            rounds[li] = [None] * len(sizes)
            uniform = bool((sizes == sizes[0]).all()) and sizes[0] >= 2
            if uniform:
                n = int(sizes[0])
                padded = np.concatenate([ln.last, dec], axis=1)
                exts = np.lib.stride_tricks.sliding_window_view(
                    padded, n + 2, axis=1)[:, ::n].transpose(1, 0, 2)
                for r in range(len(sizes)):
                    jobs.setdefault((n, ln.rate, ln.channels), []).append(
                        (li, r, exts[r]))
                ln.last = dec[:, -2:].copy()
            else:
                hist = ln.last
                off = 0
                for r, n in enumerate(map(int, sizes)):
                    blk = dec[:, off:off + n]
                    off += n
                    jobs.setdefault((n, ln.rate, ln.channels), []).append(
                        (li, r, np.concatenate([hist, blk], axis=1)))
                    # stream.flac history rule incl. 1-sample blocks
                    # (aukit.lua:3189 analog, stream/__init__.py flac gen)
                    hist = (blk[:, -2:] if n >= 2 else
                            np.concatenate([hist[:, -1:], blk], axis=1)[:, -2:])
                ln.last = hist.copy()

        if self.device_dsp and len(jobs) == 1:
            (n, rate, C), items = next(iter(jobs.items()))
            dev_out = self._device_dsp_step(n, rate, C, items)
            if dev_out is not None:
                for li, samples in dev_out.items():
                    self._push_lane(self._lanes[li], samples)
                return

        # resample every (lane, block) pair, batched per distinct geometry
        for (n, rate, _C), items in jobs.items():
            stk = np.stack([ext for _li, _r, ext in items])
            res = lua_block_resample(stk, 2, n, rate, self.out_rate, self.mode,
                                     hist=2)
            for (li, r, _ext), row in zip(items, res):
                rounds[li][r] = row

        # recursive lowpass in rounds: every lane's r-th block together, so
        # per-lane state chains block-by-block exactly like stream.flac
        max_rounds = max(len(v) for v in rounds.values())
        out_parts: dict[int, list] = {li: [] for li in rounds}
        for r in range(max_rounds):
            groups: dict[tuple, list] = {}
            for li, blocks in rounds.items():
                if r < len(blocks) and blocks[r].shape[-1]:
                    ln = self._lanes[li]
                    groups.setdefault(
                        (blocks[r].shape, ln.alpha), []).append(li)
            for (_shape, alpha), lis in groups.items():
                x = np.stack([rounds[li][r] for li in lis])
                st = np.stack([self._lanes[li].ls for li in lis])
                y, fs = iir_lowpass_scan(x, alpha, st)
                # per-lane volume AFTER the filter-state read, then the
                # int8-range scale + mono mean, batched over the whole group
                # (elementwise -> identical to stream.flac's per-chunk order:
                # scale in f64, mean in f64, then the f32 cast; gain 1.0
                # multiplies exactly). Ramping lanes get a per-sample linear
                # gain line instead of the scalar (set_volume ramp=True).
                T_r = y.shape[-1]
                gv = [self._gain_vector(self._lanes[li], T_r) for li in lis]
                if all(np.isscalar(g) for g in gv):
                    y = y * np.array(gv)[:, None, None]
                else:
                    y = y * np.stack(
                        [np.broadcast_to(np.asarray(g, np.float64), (T_r,))
                         for g in gv])[:, None, :]
                for li in lis:
                    self._advance_ramp(self._lanes[li], T_r)
                scaled = np.clip(y * np.where(y < 0, 128.0, 127.0), -128, 127)
                if self.mono:
                    if scaled.shape[1] > 1:
                        scaled = scaled.mean(axis=1)
                    else:
                        scaled = scaled[:, 0]
                scaled = scaled.astype(np.float32)
                for i, li in enumerate(lis):
                    self._lanes[li].ls = fs[i]
                    out_parts[li].append(scaled[i])

        for li, parts in out_parts.items():
            if not parts:
                continue
            out = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=-1)
            self._push_lane(self._lanes[li], out)

    def _device_dsp_step(self, n: int, rate: int, C: int, items):
        """Single-geometry device DSP: ONE f32 resample dispatch over every
        (lane, block) pair plus ONE fused IIR+scale+mono dispatch over the
        lane-stacked step matrix (power-of-two row/time buckets bound
        recompiles). Returns {lane: scaled f32[T_l]} or None when the
        geometry can't run on device."""
        import jax.numpy as jnp

        fn_r, out_len = _device_resample_fn(
            n, rate, self.out_rate, self.mode, CONFIG.sinc_window_size)
        if out_len == 0:
            return None
        P = len(items)
        Pb = _bucket(P)
        if self.mesh is not None:  # fn_b's shard_map splits rows evenly
            Pb += (-Pb) % self.mesh.devices.size
        ext = np.zeros((Pb, C, n + 2), np.float32)
        for k, (_li, _r, e) in enumerate(items):
            ext[k] = e
        res = fn_r(jnp.asarray(ext))  # [Pb, C, out_len]
        per_lane: dict[int, list[tuple[int, int]]] = {}
        for k, (li, r, _e) in enumerate(items):
            per_lane.setdefault(li, []).append((r, k))
        lanes = sorted(per_lane)
        Lb = _bucket(len(lanes))
        m_max = _bucket(max(len(v) for v in per_lane.values()))
        idx = np.zeros((Lb, m_max), np.int64)
        tval = np.zeros(Lb, np.int32)
        ls = np.zeros((Lb, C), np.float32)
        gp = np.ones((4, Lb), np.float32)  # g0 / g1 / done / span rows
        for i, li in enumerate(lanes):
            rows = [k for _r, k in sorted(per_lane[li])]
            idx[i, : len(rows)] = rows
            tval[i] = len(rows) * out_len  # valid prefix; pad rows masked
            ls[i] = self._lanes[li].ls
            gp[:, i] = self._gain_params(self._lanes[li])
        alpha = float(self._lanes[lanes[0]].alpha)  # one geometry -> one rate
        if self._block_iir:
            # Pallas block-parallel lowpass (see _device_block_iir_scale_fn)
            fn_b = _device_block_iir_scale_fn(
                out_len, alpha, self._out_mode(C),
                self._block_iir == "interpret", self.mesh)
            scaled, new_state = fn_b(res, jnp.asarray(idx),
                                     jnp.asarray(tval), jnp.asarray(ls),
                                     *map(jnp.asarray, gp))
        else:
            x = jnp.take(res, jnp.asarray(idx), axis=0)  # [Lb, m, C, out_len]
            x = jnp.moveaxis(x, 2, 1).reshape(Lb, C, m_max * out_len)
            fn_i = _device_iir_scale_fn(m_max * out_len, alpha,
                                        self._out_mode(C))
            scaled, new_state = fn_i(x, jnp.asarray(ls), jnp.asarray(tval),
                                     *map(jnp.asarray, gp))
        scaled = np.asarray(scaled)
        new_state = np.asarray(new_state)
        out = {}
        for i, li in enumerate(lanes):
            self._lanes[li].ls = new_state[i].astype(np.float64)
            out[li] = scaled[i][..., : tval[i]]
            self._advance_ramp(self._lanes[li], int(tval[i]))
        return out

    def _push_lane(self, ln: _Lane, samples: np.ndarray):
        """Append decoded samples to a lane FIFO: 1-D [T] for mono fleets,
        [C, T] fitted to the fleet's channel capacity otherwise."""
        if not self.mono:
            if samples.ndim == 1:
                samples = samples[None]
            samples = _fit_channels(samples, self.out_ch)
        ln.fifo.append(samples)
        ln.fill += samples.shape[-1]

    def _pop(self, ln: _Lane, out: np.ndarray) -> int:
        take = min(ln.fill, out.shape[-1])
        at = 0
        while at < take:
            head = ln.fifo[0]
            m = min(head.shape[-1], take - at)
            out[..., at:at + m] = head[..., :m]
            if m == head.shape[-1]:
                ln.fifo.popleft()
            else:
                ln.fifo[0] = head[..., m:]
            at += m
        ln.fill -= take
        return take

    # -- the batched step ---------------------------------------------------------
    def step(self):
        """Parse + decode newly fed bytes across all lanes, then emit one-second
        windows. Returns (window f32[L, output_rate] int8-range samples —
        f32[L, channels, output_rate] with ``mono=False`` — mask bool[L],
        positions f64[L] seconds at window start) or None when no lane can
        produce a window (starved mid-stream feeds hold their FIFO — audio is
        never zero-padded into a live lane's timeline)."""
        if self.done:
            return None
        t0 = time.perf_counter()
        parsed = self._parse_step()
        if parsed:
            self._decode_step(parsed)
        shape = ((self.lanes, self.out_rate) if self.mono
                 else (self.lanes, self.out_ch, self.out_rate))
        window = np.zeros(shape, np.float32)
        mask = np.zeros(self.lanes, bool)
        positions = np.zeros(self.lanes, np.float64)
        emitted = 0
        for li, ln in enumerate(self._lanes):
            positions[li] = ln.samples_out / self.out_rate
            if ln.fill >= self.out_rate or (ln.ended and ln.fill > 0):
                take = self._pop(ln, window[li])
                ln.samples_out += take
                mask[li] = True
                emitted += take
        self.metrics.steps += 1
        self.metrics.wall_seconds += time.perf_counter() - t0
        if not mask.any():
            self.metrics.underruns += int(not self.done)
            return None
        self.metrics.samples_decoded += emitted
        return window, mask, positions

    # -- checkpoint / resume (SURVEY.md §5.4) --------------------------------------
    def checkpoint(self, lane: int) -> dict:
        """Serializable per-stream state. Restore into a fresh lane and feed
        the source from byte ``byte_offset + len(pending)`` onward to resume
        bit-exactly (the FIFO remnant rides along, so any step boundary is a
        valid checkpoint — no window-alignment requirement).

        device_dsp carve-out: the device route computes the resample history
        (``last``) and lowpass state (``ls``) in float32, so a checkpoint
        taken from a ``device_dsp=True`` fleet carries f32-rounded DSP state.
        Restoring it — into a host fleet or another device fleet — resumes
        within the device twin's documented tolerance (the first resumed
        window differs by <= the f32 state rounding amplified through one
        lowpass pass, ~1e-3 in int8-range units; pinned by
        tests/test_flac_fleet.py::test_fleet_device_dsp_checkpoint_into_host),
        not bit-exactly. Host-path (default) checkpoints remain bit-exact."""
        ln = self._lanes[lane]
        return {
            "byte_offset": ln.consumed,
            "pending": bytes(ln.buf),
            "pos": ln.pos,
            "eof": ln.eof,
            "ended": ln.ended,
            "error": ln.error,
            "header": None if ln.rate is None else
                (ln.rate, ln.channels, ln.depth, ln.num_samples, dict(ln.meta)),
            "last": None if ln.last is None else ln.last.copy(),
            "ls": None if ln.ls is None else ln.ls.copy(),
            "fifo": np.concatenate(list(ln.fifo), axis=-1) if ln.fill else
                np.zeros(0, np.float32),
            "samples_out": ln.samples_out,
            "stalled_at": ln.stalled_at,
            "gain": ln.gain,
            "ramp": (ln.gain0, ln.ramp_pos, ln.ramp_len),
        }

    def restore(self, lane: int, ckpt: dict):
        ln = _Lane()
        ln.buf = bytearray(ckpt["pending"])
        ln.pos = ckpt["pos"]
        ln.consumed = ckpt["byte_offset"]
        ln.eof = ckpt["eof"]
        ln.ended = ckpt.get("ended", False)
        ln.error = ckpt.get("error")
        ln.dirty = (len(ln.buf) > 0 or ln.eof) and not ln.ended
        ln.stalled_at = ckpt.get("stalled_at")
        if ckpt["header"] is not None:
            ln.rate, ln.channels, ln.depth, ln.num_samples, ln.meta = ckpt["header"]
            ln.alpha = fir_alpha(ln.rate, self.out_rate)
            ln.last = np.array(ckpt["last"], np.float64)
            ln.ls = np.array(ckpt["ls"], np.float64)
        fifo = np.asarray(ckpt["fifo"], np.float32)
        if fifo.shape[-1]:
            ln.fifo.append(fifo.copy())
            ln.fill = fifo.shape[-1]
        ln.samples_out = int(ckpt["samples_out"])
        ln.gain = float(ckpt.get("gain", 1.0))
        ln.gain0, ln.ramp_pos, ln.ramp_len = ckpt.get(
            "ramp", (ln.gain, 0, 0))
        self._lanes[lane] = ln

    def reset_lane(self, lane: int):
        """Reuse a finished lane for a new stream."""
        self._lanes[lane] = _Lane()
