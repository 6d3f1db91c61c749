"""Batched multi-stream decode engine: thousands of concurrent streams in one
sharded dispatch (SURVEY.md §2.4 "the north-star axis", §5.7, §5.8).

Where the reference decodes one stream per coroutine, this engine packs many
independent streams into fixed lanes:

 - **lane specs & groups**: every lane declares its codec/rate/channels
   (``LaneSpec``); lanes with equal specs share a *group* — one fused device
   dispatch and one static resample plan per group, so a mixed fleet of
   WAV/PCM16 + DFPWM + ADPCM + QOA streams at mixed sample rates decodes
   concurrently (VERDICT r1 item 2; reference stream dispatch surface
   aukit.lua:2992-2996);
 - host side: vectorized staging — bulk-fed groups stage whole chunk matrices
   as column *views* of the fed arrays (zero host copies, no per-lane Python
   loop; VERDICT r1 item 3), per-lane ``feed()`` remains for jittery network
   ingestion;
 - device side: one fused dispatch per group per ``step()``: batched codec
   kernel (Pallas on TPU, lax.scan elsewhere) -> resample -> FIR -> int8,
   with per-lane DFPWM state carried on device between steps — no host
   round-trips for state (SURVEY.md §7 hard part 3). Dispatches are async:
   staging chunk k+1 overlaps device compute of chunk k (double buffering);
 - lanes that are exhausted or unfed are masked, not removed: a poisoned or
   starved lane never stalls the batch (§5.3 per-stream error isolation);
 - per-lane serializable checkpoints (§5.4): byte offset + codec state + DSP
   state; ``checkpoint()``/``restore()`` round-trip through numpy;
 - optional ``jax.sharding.Mesh``: every group (homogeneous or mixed fleet)
   shards its lanes over the whole mesh — lanes are padded per group to a
   device-count multiple and the pad rows masked. Group steps run under
   ``jax.shard_map`` (lane-elementwise, zero collectives), so the Pallas
   kernels stay the fast path on multi-chip too — GSPMD cannot partition a
   pallas_call, but shard_map hands each device its own (SURVEY.md §2.4
   "sharded over chips", §5.8).

Output contract: homogeneous engines (one group) emit each decode chunk
directly as a device array (the flagship DFPWM bench path). Heterogeneous
engines emit uniform ``int8[L, output_rate]`` one-second windows — ALSO
device-resident, assembled from device-side per-group FIFOs (block codecs
decode whole blocks, >= 1 s of input per step, reference per-second batching
aukit.lua:2617-2619); audio only crosses to the host when the consumer
fetches it. With ``mono=False`` windows keep the decoded channels —
``int8[L, C, T]`` per-channel chunks feeding speaker-per-channel fan-out
(aukit.lua:2223-2227 chunk contract + 1929-1940 playback fan-out; lanes
with fewer channels replicate channel 0, the ``chunk[i] or chunk[1]``
fallback).
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CONFIG
from ..parallel.pipeline import dsp_chain, fir_alpha
from .batch_codecs import LaneSpec, build_decoder, geometry, init_state

__all__ = ["LaneSpec", "BatchStreamEngine", "BatchDfpwmDecoder", "BatchMetrics"]


@dataclasses.dataclass
class BatchMetrics:
    """Per-engine counters (SURVEY.md §5.5)."""

    steps: int = 0
    samples_decoded: int = 0
    wall_seconds: float = 0.0
    underruns: int = 0  # steps where some active lane had no data

    @property
    def realtime_factor(self) -> float:
        if self.wall_seconds == 0:
            return 0.0
        return self.samples_decoded / self.wall_seconds / CONFIG.output_rate


@jax.jit
def _dev_push(fifo, out):
    return jnp.concatenate([fifo, out], axis=-1)


@functools.partial(jax.jit, static_argnames=("take", "count"))
def _dev_pop(fifo, take: int, count: int):
    window = fifo[..., :take]
    if take < count:
        pad = ((0, 0),) * (fifo.ndim - 1) + ((0, count - take),)
        window = jnp.pad(window, pad)
    return window, fifo[..., take:]


@functools.partial(jax.jit, static_argnames=("take", "count", "smax"))
def _dev_pop_skip(fifo, skip, take: int, count: int, smax: int):
    """Per-lane-cursor pop: lane l reads columns [skip[l], skip[l]+count) —
    lanes whose cursor rides AHEAD of the FIFO front (a mid-stream
    seek/reset discarded their stale prefix) deliver their own timeline
    while the group front advances in lockstep. Columns beyond the fill are
    zeros (EOF tail only; _step_mixed holds pops until fill covers
    smax+count otherwise)."""
    fill = fifo.shape[-1]
    need = smax + count
    if fill < need:
        pad = ((0, 0),) * (fifo.ndim - 1) + ((0, need - fill),)
        fifo_p = jnp.pad(fifo, pad)
    else:
        fifo_p = fifo
    idx = skip[:, None] + jnp.arange(count, dtype=skip.dtype)  # [L, count]
    if fifo.ndim == 3:
        idx = idx[:, None, :]
    window = jnp.take_along_axis(fifo_p, idx, axis=-1)
    return window, fifo[..., take:]


@functools.partial(jax.jit, static_argnames=("cmax",))
def _dev_padch(w, cmax: int):
    """[L, C, T] -> [L, cmax, T]: missing channels replicate channel 0 — the
    batched form of the reference's speaker fallback ``chunk[i] or chunk[1]``
    (aukit.lua:1935)."""
    C = w.shape[1]
    if C == cmax:
        return w
    rep = jnp.broadcast_to(w[:, :1], (w.shape[0], cmax - C, w.shape[2]))
    return jnp.concatenate([w, rep], axis=1)


@jax.jit
def _dev_assemble(windows, inv):
    cat = jnp.concatenate(windows, axis=0) if len(windows) > 1 else windows[0]
    return jnp.take(cat, inv, axis=0)


def _concat_cols(parts, n: int, lanes: int):
    """Column-concatenate segments (host or device) and zero-pad to n."""
    if all(isinstance(p, np.ndarray) for p in parts):
        out = np.zeros((lanes, n), np.uint8)
        at = 0
        for p in parts:
            out[:, at : at + p.shape[1]] = p
            at += p.shape[1]
        return out
    import jax.numpy as jnp

    cat = jnp.concatenate([jnp.asarray(p) for p in parts], axis=1)
    if cat.shape[1] < n:
        cat = jnp.pad(cat, ((0, 0), (0, n - cat.shape[1])))
    return cat


class _GroupIO:
    """Per-group ingestion buffers.

    Two modes, fixed at first feed:
     - "bulk": whole ``[lanes, bytes]`` matrices via feed_bulk; staging slices
       columns out of the fed arrays (views — zero copy, zero Python loops);
     - "lane": per-lane bytearrays via feed_lane (network-style ingestion).
    """

    def __init__(self, lanes: int, n: int):
        self.lanes, self.n = lanes, n
        self.mode: str | None = None
        self.segs: collections.deque = collections.deque()  # np or jax [L, W] segments
        self.seg_off = 0  # consumed columns of segs[0]
        # lane mode: per-lane deques of fed byte chunks + a consumed-prefix
        # offset into each head chunk (no bytearray shifting), so staging can
        # gather every ready lane's bytes into ONE join + ONE frombuffer +
        # ONE scatter per step (VERDICT r4 item 9 — O(L) numpy calls were the
        # host bottleneck for 1k+ jittery network lanes)
        self.bufs: list[collections.deque] | None = None
        self.offs: list[int] | None = None
        self.sizes: np.ndarray | None = None  # int64[L] buffered bytes
        self.eof = np.zeros(lanes, bool)

    # -- feeding -------------------------------------------------------------
    def feed_lane(self, slot: int, data: bytes | None):
        if data is None:
            self.eof[slot] = True
            return
        if self.mode == "bulk":
            raise RuntimeError("group already fed via feed_array; cannot mix with feed()")
        if self.mode is None:
            self.mode = "lane"
            self.bufs = [collections.deque() for _ in range(self.lanes)]
            self.offs = [0] * self.lanes
            self.sizes = np.zeros(self.lanes, np.int64)
        if len(data) == 0:
            return
        # snapshot mutable buffers: staged views must not alias caller state
        self.bufs[slot].append(data if isinstance(data, bytes) else bytes(data))
        self.sizes[slot] += len(data)

    def feed_bulk(self, arr, eof: bool):
        if self.mode == "lane":
            raise RuntimeError("group already fed via feed(); cannot mix with feed_array()")
        self.mode = "bulk"
        # device (jax) arrays are accepted: staging then slices ON DEVICE and
        # the step skips the host->HBM transfer entirely — the path for
        # TPU-host-resident ingestion (and for benchmarking the engine without
        # a remote-tunnel transfer bottleneck)
        if isinstance(arr, np.ndarray) and arr.dtype != np.uint8:
            arr = arr.astype(np.uint8)
        if arr.shape[0] != self.lanes:
            raise ValueError(f"feed_array rows {arr.shape[0]} != group lanes {self.lanes}")
        if arr.shape[1]:
            self.segs.append(arr)
        if eof:
            self.eof[:] = True

    # -- queries -------------------------------------------------------------
    def available(self) -> np.ndarray:
        if self.mode == "bulk":
            tot = sum(s.shape[1] for s in self.segs) - self.seg_off
            return np.full(self.lanes, tot, np.int64)
        if self.mode == "lane":
            return self.sizes.copy()
        return np.zeros(self.lanes, np.int64)

    @property
    def exhausted(self) -> bool:
        return bool(self.eof.all()) and not self.available().any()

    def pending_bytes(self, slot: int) -> bytes:
        if self.mode == "bulk":
            parts, off = [], self.seg_off
            for s in self.segs:
                parts.append(np.asarray(s[slot, off:]).tobytes())
                off = 0
            return b"".join(parts)
        if self.mode == "lane":
            off = self.offs[slot]
            return b"".join(
                memoryview(c)[off:] if i == 0 and off else c
                for i, c in enumerate(self.bufs[slot]))
        return b""

    def replace_lane(self, slot: int, data: bytes, eof: bool):
        if self.mode == "bulk":
            raise RuntimeError("cannot restore a single lane of a bulk-fed group")
        if self.mode is None:
            self.mode = "lane"
            self.bufs = [collections.deque() for _ in range(self.lanes)]
            self.offs = [0] * self.lanes
            self.sizes = np.zeros(self.lanes, np.int64)
        self.bufs[slot] = collections.deque([bytes(data)] if data else [])
        self.offs[slot] = 0
        self.sizes[slot] = len(data)
        self.eof[slot] = eof

    def snapshot(self) -> "_GroupIO":
        """Copy of the ingestion state (cursors + chunk references, no byte
        copies) — the normalize measurement pass consumes the copy and leaves
        the live buffers untouched."""
        s = _GroupIO(self.lanes, self.n)
        s.mode = self.mode
        s.segs = collections.deque(self.segs)
        s.seg_off = self.seg_off
        if self.bufs is not None:
            s.bufs = [collections.deque(d) for d in self.bufs]
            s.offs = list(self.offs)
            s.sizes = self.sizes.copy()
        s.eof = self.eof.copy()
        return s

    def _take_lane(self, slot: int, need: int, pieces: list):
        """Append exactly ``need`` buffered bytes of one lane to ``pieces``
        (zero-copy memoryviews) and advance the lane's cursor."""
        dq, off = self.bufs[slot], self.offs[slot]
        while need:
            head = dq[0]
            avail = len(head) - off
            if avail <= need:
                pieces.append(memoryview(head)[off:] if off else head)
                dq.popleft()
                off = 0
                need -= avail
            else:
                pieces.append(memoryview(head)[off: off + need])
                off += need
                need = 0
        self.offs[slot] = off

    # -- staging -------------------------------------------------------------
    def stage(self):
        """-> (staged uint8[L, n], ready bool[L], consumed int64[L], underrun)
        or None when no lane can produce. Partial EOF tails are zero-padded
        (round-1 semantics). Bulk staging is a column VIEW when the chunk falls
        inside one fed segment — the only copy is the device transfer."""
        n = self.n
        if self.mode == "bulk":
            tot = sum(s.shape[1] for s in self.segs) - self.seg_off
            if tot >= n:
                head = self.segs[0]
                if head.shape[1] - self.seg_off >= n:
                    staged = head[:, self.seg_off : self.seg_off + n]  # view
                    self.seg_off += n
                    if self.seg_off == head.shape[1]:
                        self.segs.popleft()
                        self.seg_off = 0
                else:  # chunk spans segments: assemble once
                    parts = []
                    filled = 0
                    while filled < n:
                        head = self.segs[0]
                        take = min(n - filled, head.shape[1] - self.seg_off)
                        parts.append(head[:, self.seg_off : self.seg_off + take])
                        filled += take
                        self.seg_off += take
                        if self.seg_off == head.shape[1]:
                            self.segs.popleft()
                            self.seg_off = 0
                    staged = _concat_cols(parts, n, self.lanes)
                return staged, np.ones(self.lanes, bool), np.full(self.lanes, n, np.int64), False
            if tot > 0 and self.eof.all():
                parts = []
                while self.segs:
                    head = self.segs.popleft()
                    parts.append(head[:, self.seg_off :])
                    self.seg_off = 0
                staged = _concat_cols(parts, n, self.lanes)
                return staged, np.ones(self.lanes, bool), np.full(self.lanes, tot, np.int64), False
            return None
        if self.mode == "lane":
            sizes = self.sizes
            full = sizes >= n
            partial = self.eof & ~full & (sizes > 0)  # EOF tails, zero-padded
            underrun = bool((~self.eof & ~full).any())
            ready = full | partial
            if not ready.any():
                return None
            consumed = np.where(full, n, np.where(partial, sizes, 0))
            # ONE join + ONE frombuffer + ONE scatter for the full lanes (the
            # steady state of a live fleet); the per-lane Python work is just
            # deque slicing into the pieces list — no numpy call per lane
            full_idx = np.nonzero(full)[0]
            pieces: list = []
            for slot in full_idx:
                self._take_lane(int(slot), n, pieces)
            sizes[full_idx] -= n
            mat = np.frombuffer(b"".join(pieces), np.uint8)
            if len(full_idx) == self.lanes:
                return (mat.reshape(self.lanes, n), ready,
                        consumed.astype(np.int64), underrun)
            staged = np.zeros((self.lanes, n), np.uint8)
            if len(full_idx):
                staged[full_idx] = mat.reshape(len(full_idx), n)
            for slot in np.nonzero(partial)[0]:  # rare: final EOF tails only
                take = int(sizes[slot])
                tail: list = []
                self._take_lane(int(slot), take, tail)
                staged[slot, :take] = np.frombuffer(b"".join(tail), np.uint8)
                sizes[slot] = 0
            return staged, ready, consumed.astype(np.int64), underrun
        return None


class _Group:
    """Lanes sharing one LaneSpec: fused device step + staging + output FIFO."""

    def __init__(self, spec: LaneSpec, slots: np.ndarray, mesh, use_pallas,
                 out_rate: int, mono: bool = True, mode: str = "linear"):
        self.spec = spec
        self.slots = slots  # external lane ids, in engine order
        self.lanes = len(slots)
        self.mesh = mesh
        self.mono = mono
        self.mode = mode  # resample interpolation (dsp_chain, all 4 modes)
        self.out_ch = 1 if mono else spec.channels
        # in_samples counts per-channel frames, so out_samples holds for both
        # the mono [L, T] and the per-channel [L, C, T] output contract
        self.in_bytes, self.in_samples = geometry(spec)
        self.out_samples = self.in_samples * out_rate // spec.sample_rate
        if use_pallas is None:
            # always on TPU: a device lax.scan pays while-loop overhead per
            # TIME step (profiled ~65 us/iter on a 32-lane IMA group = 33 ms
            # of a 46 ms mixed pass), while the kernel runs the same T as one
            # grid step even when the [32,128] lane tile is mostly padding.
            # Meshes keep the kernels too: the step runs under shard_map
            # (GSPMD cannot partition a pallas_call), each device decoding
            # its own lane shard with zero collectives — multi-chip is the
            # fast path, not the fallback (VERDICT r3 item 1).
            use_pallas = (
                jax.default_backend() == "tpu"
                and spec.codec in ("dfpwm", "ima", "msadpcm", "qoa")
            )
        self.use_pallas = use_pallas
        self.io = _GroupIO(self.lanes, self.in_bytes)
        # a sharded group pads its device lanes to a device-count multiple so
        # EVERY group of a mixed fleet shards over the whole mesh (VERDICT r2
        # item 2); host bookkeeping stays at the real lane count
        self.pad = 0 if mesh is None else (-self.lanes) % mesh.devices.size
        self.dlanes = self.lanes + self.pad
        self.fir = (jnp.zeros(self.dlanes, jnp.float32) if mono
                    else jnp.zeros((self.dlanes, self.out_ch), jnp.float32))
        # per-lane volume (aukit.lua:1935 analog): gain ramps linearly from
        # gain0 to gain1 across each lane's next chunk (click-free volume
        # moves, the batched effects.fade analog); gain0 == gain1 == 1 is
        # bit-exactly the ungained stream (x * 1.0 in f32)
        self.gain0 = np.ones(self.dlanes, np.float32)
        self.gain1 = np.ones(self.dlanes, np.float32)
        # per-lane native-rate DSP stage (VERDICT r4 item 3 — auplay.lua:20-31
        # stage order: mono -> normalize -> one-pole filter, applied to the
        # decoded float stream BEFORE the playback resample; auplay itself
        # filters AFTER its 48k resample — see set_filter's docstring):
        #  - lp_kind: 0 none, 1 lowpass (aukit.lua:3586), 2 highpass (:3604)
        #  - lp_a: the filter's alpha at the lane's native rate
        #  - norm_gain: whole-file normalize multiplier (engine.normalize)
        #  - mono_sel: per-lane mono-mix toggle (mono=False engines)
        # filter state (y_prev / x_prev / started) carries across chunks
        self.lp_kind = np.zeros(self.dlanes, np.int32)
        self.lp_a = np.zeros(self.dlanes, np.float32)
        self.norm_gain = np.ones(self.dlanes, np.float32)
        self.mono_sel = np.zeros(self.dlanes, bool)
        fshape = (self.dlanes,) if mono else (self.dlanes, self.out_ch)
        self.filt_y = jnp.zeros(fshape, jnp.float32)
        self.filt_x = jnp.zeros(fshape, jnp.float32)
        self.filt_started = np.zeros(self.dlanes, bool)
        state = init_state(spec, self.dlanes)
        self._state_leaves, self._state_def = jax.tree_util.tree_flatten(state)
        self.samples_in = np.zeros(self.lanes, np.int64)  # input samples consumed
        self.samples_out = np.zeros(self.lanes, np.int64)  # output samples emitted
        # mixed-engine output FIFO (lockstep across the group's lanes).
        # ``spans`` are [start, end, ready_mask] column ranges relative to
        # the CURRENT front; ``skip`` is each lane's read cursor — normally
        # 0, set to the live fill by a mid-stream seek/reset so the lane's
        # stale undelivered columns are discarded instead of played
        # (cursors rebase to 0 whenever the FIFO fully drains)
        self.fifo: np.ndarray | None = None
        self.fill = 0
        self.spans: collections.deque[list] = collections.deque()
        self.skip = np.zeros(self.lanes, np.int64)
        self._sharding = None
        if mesh is not None:
            P = jax.sharding.PartitionSpec
            self._sharding = jax.sharding.NamedSharding(mesh, P(tuple(mesh.axis_names), None))
        self._out_rate = out_rate
        # step variants keyed (with_gain, with_dsp), built lazily: the plain
        # one compiles WITHOUT the volume/DSP inputs (the default path costs
        # exactly what it did before those features existed); variants engage
        # when any lane's volume differs from 1 / any DSP stage is set
        self._step_fns: dict[tuple, object] = {}
        self._step_fns[(False, False)] = self._build_step(out_rate, False, False)
        self._measure_fn = None

    def _build_step(self, out_rate: int, with_gain: bool, with_dsp: bool):
        decode, self.stateful = build_decoder(self.spec, self.use_pallas,
                                              self.mono)
        in_rate = self.spec.sample_rate
        state_def = self._state_def
        # identity-rate DFPWM lanes (the flagship path): the normalize /
        # 1-tap smoothing / int8 quantize epilogue runs INSIDE the decode
        # kernel (dfpwm_decode_dsp_grouped) — the f32 stream never touches
        # HBM. Profiled: the separate dsp_chain + select passes were ~60% of
        # the engine's device time. Bit-identical to the two-stage path
        # (tests/test_pallas_kernels.py fused-parity test); the smoothing
        # carry is implicit in the lowpass state, so new_fir is derived
        # rather than carried.
        fused = (self.spec.codec == "dfpwm" and self.use_pallas
                 and in_rate == out_rate and not with_dsp)
        if fused:
            from ..kernels.dfpwm_pallas import dfpwm_decode_dsp_pallas

            alpha = fir_alpha(in_rate, out_rate)

            mono = self.mono

            def step(bytes_u8, mask2d, fir, *rest):
                if with_gain:
                    g0, gs, *state_leaves = rest
                    gain = (g0, gs)
                else:
                    state_leaves, gain = rest, None
                state = jax.tree_util.tree_unflatten(state_def, state_leaves)
                mask1 = mask2d[:, 0]
                out, new_state = dfpwm_decode_dsp_pallas(
                    bytes_u8, state, alpha, mask=mask1, gain=gain)
                lpf = new_state.lowpass.astype(jnp.float32)
                new_fir = lpf / jnp.where(new_state.lowpass < 0, 128.0, 127.0)
                if not mono:  # per-channel contract: DFPWM lanes are C == 1
                    out = out[:, None, :]
                    new_fir = new_fir[:, None]
                new_fir = jnp.where(mask1[:, None] if not mono else mask1,
                                    new_fir, fir)
                new_leaves = [
                    jnp.where(mask1, nl, ol)
                    for nl, ol in zip(jax.tree_util.tree_leaves(new_state), state_leaves)
                ]
                return (out, new_fir, *new_leaves)

            return self._wrap_step(step, with_gain, False)

        mono = self.mono
        mode = self.mode

        def step(bytes_u8, mask2d, fir, *rest):
            at = 0
            gain = None
            if with_gain:
                g0, gs = rest[0:2]
                gain = (g0, gs) if mono else (g0[:, None], gs[:, None])
                at = 2
            if with_dsp:
                ng, kindv, av, msel, started, sy, sx = rest[at: at + 7]
                at += 7
            state_leaves = rest[at:]
            state = jax.tree_util.tree_unflatten(state_def, state_leaves)
            f, new_state = decode(bytes_u8, state)  # [L, T] or [L, C, T]
            mask1 = mask2d[:, 0]
            if with_dsp:
                # the batched auplay chain at native rate (auplay.lua:20-31):
                # per-lane mono-mix -> normalize gain -> one-pole filter
                bl = (slice(None), None) if mono else (slice(None), None, None)
                if not mono:
                    mixed = jnp.mean(f, axis=1, keepdims=True)
                    f = jnp.where(msel[bl], mixed, f)
                f = f * ng[bl]
                kindb, ab = kindv[bl], av[bl]
                # per-sample-0 quantities broadcast one axis less than f
                wide = (lambda v: v) if mono else (lambda v: v[:, None])
                k1w, k2w = wide(kindv == 1), wide(kindv == 2)
                aw, stw = wide(av), wide(started)
                x0 = f[..., 0]
                dx = jnp.diff(f, axis=-1)
                # first-of-stream sample passes through (effects.lowpass /
                # highpass y[0] = x[0]); later chunks chain the carried state
                y0_lp = jnp.where(stw, (1.0 - aw) * sy + aw * x0, x0)
                y0_hp = jnp.where(stw, aw * (sy + x0 - sx), x0)
                b0 = jnp.where(k1w, y0_lp, jnp.where(k2w, y0_hp, x0))
                A = jnp.where(kindb == 1, 1.0 - ab,
                              jnp.where(kindb == 2, ab, 0.0))
                B = jnp.where(kindb == 1, ab * f,
                              jnp.where(kindb == 2,
                                        ab * jnp.concatenate(
                                            [jnp.zeros_like(x0)[..., None],
                                             dx], axis=-1), f))
                A = jnp.broadcast_to(A, f.shape).at[..., 0].set(0.0)
                B = B.at[..., 0].set(b0)

                def combine(p, q):
                    return (p[0] * q[0], q[0] * p[1] + q[1])

                _, y = jax.lax.associative_scan(combine, (A, B), axis=-1)
                new_sy, new_sx = y[..., -1], f[..., -1]
                f = y
            out, new_fir = dsp_chain(f, in_rate, out_rate, fir_state=fir,
                                     mode=mode, gain=gain)
            if mono:
                out = jnp.where(mask2d, out, 0)
                new_fir = jnp.where(mask1, new_fir, fir)
            else:
                out = jnp.where(mask1[:, None, None], out, 0)
                new_fir = jnp.where(mask1[:, None], new_fir, fir)
            new_leaves = [
                jnp.where(mask1, nl, ol)
                for nl, ol in zip(jax.tree_util.tree_leaves(new_state), state_leaves)
            ]
            if with_dsp:
                mk = mask1 if mono else mask1[:, None]
                new_sy = jnp.where(mk, new_sy, sy)
                new_sx = jnp.where(mk, new_sx, sx)
                return (out, new_fir, new_sy, new_sx, *new_leaves)
            return (out, new_fir, *new_leaves)

        return self._wrap_step(step, with_gain, with_dsp)

    def _wrap_step(self, step, with_gain: bool, with_dsp: bool = False):
        """jit the group step; under a mesh, run it inside ``jax.shard_map``
        over the lane axis. Lanes are embarrassingly parallel (decode kernels,
        DSP and masking are all lane-elementwise), so each device executes the
        Pallas kernel / scan on its own lane shard with ZERO collectives — the
        ``lpc_restore_sharded`` pattern (kernels/flac_pallas.py). This is what
        lets ``use_pallas`` stay on under a mesh: GSPMD cannot partition a
        ``pallas_call``, but shard_map hands every device its own call."""
        if self._sharding is None:
            return jax.jit(step)
        P = jax.sharding.PartitionSpec
        axes = tuple(self.mesh.axis_names)
        lane1, lane2, lane3 = P(axes), P(axes, None), P(axes, None, None)
        nstate = len(self._state_leaves)
        out_spec, fir_spec = (lane2, lane1) if self.mono else (lane3, lane2)
        gain_specs = (lane1, lane1) if with_gain else ()
        # dsp inputs: ng, kind, alpha, mono_sel, started ([l]) + y/x carries
        dsp_specs = ((lane1,) * 5 + (fir_spec, fir_spec)) if with_dsp else ()
        dsp_out = (fir_spec, fir_spec) if with_dsp else ()
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # metadata, and the steps are collective-free by construction
        return jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(lane2, lane2, fir_spec) + gain_specs + dsp_specs
                     + (lane1,) * nstate,
            out_specs=(out_spec, fir_spec) + dsp_out + (lane1,) * nstate,
            check_vma=False,
        ))

    def decode_once(self):
        """Stage + dispatch one chunk. Returns (out_dev[dlanes, T], ready,
        underrun) or None when no lane could produce. Sharded groups carry
        ``pad`` masked-off device lanes (see __init__)."""
        st = self.io.stage()
        if st is None:
            return None
        staged, ready, consumed, underrun = st
        ready_dev = ready
        if self.pad:
            pad = ((0, self.pad), (0, 0))
            staged = np.pad(staged, pad) if isinstance(staged, np.ndarray) else jnp.pad(staged, pad)
            ready_dev = np.pad(ready, (0, self.pad))
        dev = jnp.asarray(staged)
        if self._sharding is not None:
            dev = jax.device_put(dev, self._sharding)
        with_gain = bool((self.gain0 != 1.0).any() or (self.gain1 != 1.0).any())
        with_dsp = bool(self.lp_kind.any() or self.mono_sel.any()
                        or (self.norm_gain != 1.0).any())
        fn = self._step_fns.get((with_gain, with_dsp))
        if fn is None:
            fn = self._step_fns[(with_gain, with_dsp)] = self._build_step(
                self._out_rate, with_gain, with_dsp)
        # Host arrays that are LATER MUTATED IN PLACE (the post-step gain0
        # handoff below, set_volume/set_filter/... between steps) must go to
        # the device as SNAPSHOT COPIES: jnp.asarray enqueues an ASYNC host
        # read, so handing it a live buffer races the mutation (seen as the
        # ramp lane decoding a whole chunk at its POST-ramp gain under CPU
        # load). Fresh per-step arrays (ready, gs, staged) need no copy.
        args = [dev, jnp.asarray(ready_dev[:, None]), self.fir]
        if with_gain:
            # volume ramp: slope per OUTPUT sample across this chunk's
            # nominal window; once a lane decodes, its ramp completes
            gs = (self.gain1 - self.gain0) / np.float32(self.out_samples)
            args += [jnp.asarray(self.gain0.copy()), jnp.asarray(gs)]
        if with_dsp:
            args += [jnp.asarray(self.norm_gain.copy()),
                     jnp.asarray(self.lp_kind.copy()),
                     jnp.asarray(self.lp_a.copy()),
                     jnp.asarray(self.mono_sel.copy()),
                     jnp.asarray(self.filt_started.copy()),
                     self.filt_y, self.filt_x]
        out, fir, *state = fn(*args, *self._state_leaves)
        if with_gain:
            self.gain0[: self.lanes] = np.where(
                ready, self.gain1[: self.lanes], self.gain0[: self.lanes])
        if with_dsp:
            self.filt_y, self.filt_x, *state = state
            # only FILTERED lanes have warmed their recurrence — a lane that
            # merely rode a DSP-active group step (e.g. normalize-only) must
            # still get the reference's y[0]=x[0] first-sample pass-through
            # when a filter is enabled on it later
            self.filt_started[: self.lanes] |= (
                ready & (self.lp_kind[: self.lanes] != 0))
        self.fir = fir
        self._state_leaves = state
        self.samples_in += np.where(ready, (consumed * self.in_samples) // self.in_bytes, 0)
        return out, ready, underrun

    # -- mixed-engine FIFO (DEVICE-resident: windows never round-trip to the
    # host; concat/slice are async device ops) ---------------------------------
    def fifo_push(self, out_dev, ready: np.ndarray):
        if self.fifo is None or self.fill == 0:
            self.fifo = out_dev
        else:
            self.fifo = _dev_push(self.fifo, out_dev)  # async jitted dispatch
        self.spans.append([self.fill, self.fill + out_dev.shape[-1], ready])
        self.fill += out_dev.shape[-1]

    def fifo_pop(self, count: int):
        """Pop ``count`` samples (zero-padded if short). Returns
        (int8[L, count] device array, had_real bool[L] host). The fifo array
        length always equals ``fill``; pop is one jitted dispatch (eager slice
        chains cost a full round trip each on remote-TPU links). Lane l reads
        its window at its own cursor [skip[l], skip[l]+count) — see the
        ``skip`` note in __init__."""
        take = min(count, self.fill)
        smax = int(self.skip.max())
        if take == 0:
            # device width: sharded groups carry pad rows (window widths must
            # match the dlanes-based offsets in _inv_perm_dev)
            shape = ((self.dlanes, count) if self.mono
                     else (self.dlanes, self.out_ch, count))
            window = jnp.zeros(shape, jnp.int8)
        elif smax == 0:
            window, self.fifo = _dev_pop(self.fifo, take=take, count=count)
        else:
            skip_dev = jnp.asarray(np.pad(self.skip, (0, self.pad)))
            window, self.fifo = _dev_pop_skip(
                self.fifo, skip_dev, take=take, count=count, smax=smax)
        self.fill -= take
        # per-lane real-audio accounting: a span contributes to lane l iff
        # it overlaps the lane's OWN read range
        had_real = np.zeros(self.lanes, bool)
        lo = self.skip
        for start, end, mask in self.spans:
            had_real |= mask & (lo < end) & (lo + count > start)
        for sp in self.spans:
            sp[0] -= take
            sp[1] -= take
        while self.spans and self.spans[0][1] <= 0:
            self.spans.popleft()
        if self.fill == 0:  # fully drained: rebase every cursor
            self.fifo = None
            self.skip[:] = 0
            self.spans.clear()
        self.samples_out += np.where(had_real, count, 0)
        return window, had_real


def _build_measure(g: "_Group"):
    """Jitted normalize-measurement step for one group: decode a staged
    chunk (fresh zero state threaded by the caller), apply the per-lane mono
    toggle, return each ready lane's native-float peak."""
    from .batch_codecs import build_decoder

    decode, _stateful = build_decoder(g.spec, g.use_pallas, g.mono)
    state_def = g._state_def
    mono = g.mono

    @jax.jit
    def meas(bytes_u8, mask2d, msel, *leaves):
        state = jax.tree_util.tree_unflatten(state_def, leaves)
        f, new_state = decode(bytes_u8, state)
        mask1 = mask2d[:, 0]
        if not mono:
            mixed = jnp.mean(f, axis=1, keepdims=True)
            f = jnp.where(msel[:, None, None], mixed, f)
            m = jnp.max(jnp.abs(f), axis=(-2, -1))
        else:
            m = jnp.max(jnp.abs(f), axis=-1)
        m = jnp.where(mask1, m, 0.0)
        new_leaves = [jnp.where(mask1, nl, ol) for nl, ol in
                      zip(jax.tree_util.tree_leaves(new_state), leaves)]
        return (m, *new_leaves)

    return meas


class BatchStreamEngine:
    """Fixed-lane batched multi-codec -> 48 kHz int8 decoder.

    Parameters
    ----------
    specs : one LaneSpec per lane (lanes with equal specs share a group/dispatch)
    mesh : optional Mesh; every group's lanes shard over all axes (mixed
        fleets too — each group pads to a device-count multiple)
    use_pallas : force/disable the Pallas kernels (default: auto on TPU)
    mono : True (default) mixes every lane to mono windows ``int8[L, T]``;
        False keeps the decoded channels — windows become ``int8[L, C, T]``
        with C = the fleet's max channel count, lanes with fewer channels
        replicating channel 0 (the reference's per-channel chunk contract,
        aukit.lua:2223-2227, with its speaker fallback ``chunk[i] or
        chunk[1]``, aukit.lua:1935)
    windowed : None (default) emits uniform 1-second windows only for
        heterogeneous fleets (homogeneous engines emit raw decode chunks,
        the flagship bench path); True forces the windowed contract even for
        a single group (the Fleet facade's uniform output)
    interpolation : per-engine resample mode override (none/linear/cubic/
        sinc, reference aukit.lua:253-284); None reads
        CONFIG.default_interpolation at construction
    """

    def __init__(
        self,
        specs: Sequence[LaneSpec],
        mesh: jax.sharding.Mesh | None = None,
        use_pallas: bool | None = None,
        mono: bool = True,
        windowed: bool | None = None,
        interpolation: str | None = None,
    ):
        specs = list(specs)
        if not specs:
            raise ValueError("need at least one lane")
        self.lanes = len(specs)
        self.specs = specs
        self.mono = mono
        self.out_channels = 1 if mono else max(s.channels for s in specs)
        by_spec: dict[LaneSpec, list[int]] = {}
        for i, s in enumerate(specs):
            by_spec.setdefault(s, []).append(i)
        self.heterogeneous = (len(by_spec) > 1 if windowed is None
                              else bool(windowed) or len(by_spec) > 1)
        if len(by_spec) > 1:
            for s in by_spec:
                if s.chunk_bytes:
                    raise ValueError("chunk_bytes overrides require a homogeneous engine")
        from ..config import get_interpolation

        mode = get_interpolation(interpolation)
        self.interpolation = mode
        self.groups = [
            _Group(s, np.array(slots), mesh, use_pallas, CONFIG.output_rate,
                   mono=mono, mode=mode)
            for s, slots in by_spec.items()
        ]
        self._lane_map: list[tuple[int, int]] = [None] * self.lanes  # lane -> (gi, slot)
        for gi, g in enumerate(self.groups):
            for slot, lane in enumerate(g.slots):
                self._lane_map[lane] = (gi, slot)
        # engine lane -> row in the concat of the groups' (padded) windows
        row = np.zeros(self.lanes, np.int64)
        base = 0
        for g in self.groups:
            row[g.slots] = base + np.arange(g.lanes)
            base += g.dlanes
        self._inv_perm_dev = jnp.asarray(row)
        self.mesh = mesh
        self.metrics = BatchMetrics()

    # -- ingestion ---------------------------------------------------------------
    def feed(self, lane: int, data: bytes | None):
        """Append bytes to a lane's buffer; None marks end-of-stream
        (SURVEY.md §5.8 host ingestion boundary)."""
        gi, slot = self._lane_map[lane]
        self.groups[gi].io.feed_lane(slot, data)

    def feed_many(self, datas: Sequence[bytes | None]):
        for lane, d in enumerate(datas):
            self.feed(lane, d)

    def set_volume(self, lane: int, volume: float, ramp: bool = False):
        """Per-lane playback volume (the batched analog of
        ``speaker.playAudio(chunk, volume)``, aukit.lua:1935): the smoothed
        float stream scales by ``volume`` before the int8 quantize — inside
        the fused Pallas epilogue on the kernel route. With ``ramp=True``
        the gain moves linearly from its current value to ``volume`` across
        the lane's next chunk (click-free, the batched effects.fade
        analog)."""
        gi, slot = self._lane_map[lane]
        g = self.groups[gi]
        if not ramp:
            g.gain0[slot] = volume
        g.gain1[slot] = volume

    def get_volume(self, lane: int) -> float:
        gi, slot = self._lane_map[lane]
        return float(self.groups[gi].gain1[slot])

    # -- per-lane DSP stages (VERDICT r4 item 3: the batched auplay chain) ----
    def set_filter(self, lane: int, kind: str | None, cutoff: float = 0.0):
        """Per-lane one-pole filter at the lane's NATIVE rate, applied to the
        decoded float stream before the playback resample. Stage ORDER matches
        auplay's chain (mono -> normalize -> filter, auplay.lua:20-31), but
        auplay resamples to 48 kHz FIRST (auplay.lua:21) and filters at 48
        kHz; here the filter runs pre-resample, so ``cutoff`` is interpreted
        against the lane's native rate — identical to solo
        ``stream.* -> effects.lowpass`` at native rate, and a (slightly)
        different one-pole response than post-resample filtering for non-48k
        lanes (documented deviation; filtering before decimation also avoids
        folding the stopband). ``kind`` is "lowpass" (aukit.lua:3586) or
        "highpass" (aukit.lua:3604); None clears the filter. Alphas use the
        reference formulas; the recurrence evaluates as an associative scan
        with chunk-carried state (same documented reassociation tolerance as
        effects.lowpass/highpass)."""
        gi, slot = self._lane_map[lane]
        g = self.groups[gi]
        rate = g.spec.sample_rate
        if kind is None:
            g.lp_kind[slot] = 0
            g.lp_a[slot] = 0.0
        elif kind == "lowpass":
            g.lp_kind[slot] = 1
            g.lp_a[slot] = 1.0 - np.exp(-(cutoff / rate) * 2.0 * np.pi)
        elif kind == "highpass":
            g.lp_kind[slot] = 2
            g.lp_a[slot] = 1.0 / (2.0 * np.pi * (cutoff / rate) + 1.0)
        else:
            raise ValueError(f"unknown filter kind {kind!r}")
        # a (re-)configured filter starts a fresh recurrence: next chunk gets
        # the reference's y[0]=x[0] first-sample pass-through instead of
        # chaining from a previous filter epoch's (or zero) carried state
        g.filt_started[slot] = False
        fy = np.asarray(g.filt_y).copy()
        fx = np.asarray(g.filt_x).copy()
        fy[slot] = 0.0
        fx[slot] = 0.0
        g.filt_y, g.filt_x = jnp.asarray(fy), jnp.asarray(fx)

    def set_mono(self, lane: int, on: bool = True):
        """Per-lane mono-mix toggle for ``mono=False`` engines: the lane's
        decoded channels are replaced by their mean (replicated across the
        window's channel axis — every speaker receives the mix, the batched
        Audio:mono, aukit.lua:685-687). No-op semantics on mono engines
        (windows are already mixed)."""
        gi, slot = self._lane_map[lane]
        self.groups[gi].mono_sel[slot] = bool(on)

    def normalize(self, peak: float = 0.8):
        """Whole-file per-lane normalize for EOF-fed engines (the batched
        effects.normalize(peak), aukit.lua:3431, auplay.lua's normalize(0.8)
        stage): a measurement pass decodes a SNAPSHOT of the buffered bytes
        (native float, after the per-lane mono toggle), takes each lane's
        peak, and sets the per-lane normalize gain to ``peak / lane_peak``.
        The live buffers, codec state and metrics are untouched. Requires
        every lane fed to EOF and no steps taken yet."""
        import jax.numpy as jnp

        for g in self.groups:
            if not g.io.eof.all():
                raise ValueError("normalize requires every lane fed to EOF")
            if g.fill or g.samples_in.any():
                raise ValueError("normalize must run before stepping")
        for g in self.groups:
            io = g.io.snapshot()
            from .batch_codecs import init_state

            leaves = jax.tree_util.tree_leaves(init_state(g.spec, g.dlanes))
            fn = g._measure_fn
            if fn is None:
                fn = g._measure_fn = _build_measure(g)
            peaks = np.zeros(g.lanes, np.float64)
            while True:
                st = io.stage()
                if st is None:
                    break
                staged, ready, _consumed, _u = st
                ready_dev = ready
                if g.pad:
                    pw = ((0, g.pad), (0, 0))
                    staged = (np.pad(staged, pw)
                              if isinstance(staged, np.ndarray)
                              else jnp.pad(staged, pw))
                    ready_dev = np.pad(ready, (0, g.pad))
                m, *leaves = fn(jnp.asarray(staged),
                                jnp.asarray(ready_dev[:, None]),
                                jnp.asarray(g.mono_sel.copy()), *leaves)
                peaks = np.maximum(peaks, np.asarray(m)[: g.lanes])
            g.norm_gain[: g.lanes] = np.where(
                peaks > 0, peak / peaks, 1.0).astype(np.float32)

    def feed_array(self, arr, eof: bool = True):
        """Bulk ingestion: ``uint8[L, B]`` rows in engine lane order. Bulk-fed
        groups stage chunks as views — no per-lane host loop (the fast path
        for benchmark/offline fleets). A device (jax) array keeps staging and
        decode entirely on device (TPU-host-resident ingestion)."""
        if isinstance(arr, (bytes, bytearray, list, tuple)):
            arr = np.asarray(arr)
        if arr.shape[0] != self.lanes:
            raise ValueError(f"feed_array rows {arr.shape[0]} != lanes {self.lanes}")
        for g in self.groups:
            rows = arr[g.slots] if len(self.groups) > 1 else arr
            if isinstance(rows, np.ndarray):
                rows = np.ascontiguousarray(rows)
            g.io.feed_bulk(rows, eof)

    @property
    def active(self) -> np.ndarray:
        out = np.zeros(self.lanes, bool)
        for g in self.groups:
            avail = g.io.available()
            act = ~g.io.eof | (avail > 0)
            out[g.slots] = act
        return out

    @property
    def done(self) -> bool:
        return all(g.io.exhausted and g.fill == 0 for g in self.groups)

    # -- the batched step -----------------------------------------------------------
    def step(self):
        """Decode one chunk across all lanes.

        Returns (chunk, mask bool[L], positions float[L]) or None when every
        lane is finished/starved. ``mask`` marks lanes that produced real audio
        this step; ``positions`` are per-lane stream positions in seconds at
        chunk start.

        ``chunk`` is a device int8 array in both modes (homogeneous:
        [L, out_samples] straight from the dispatch; heterogeneous:
        [L, output_rate] windows assembled on device from per-group FIFOs;
        with ``mono=False`` a channel axis rides in between: [L, C, ...]) —
        dispatches are async, so staging the next chunk overlaps device
        compute and audio crosses to the host only when fetched."""
        if self.done:
            return None
        t0 = time.perf_counter()
        r = self._step_mixed() if self.heterogeneous else self._step_single()
        if r is None:
            return None
        chunk, mask, positions, nsamp = r
        self.metrics.steps += 1
        self.metrics.samples_decoded += int(mask.sum()) * nsamp
        self.metrics.wall_seconds += time.perf_counter() - t0
        return chunk, mask, positions

    def _step_single(self):
        g = self.groups[0]
        positions = g.samples_in / g.spec.sample_rate
        r = g.decode_once()
        if r is None:
            return None
        out, ready, underrun = r
        if g.pad:
            out = out[: g.lanes]
        self.metrics.underruns += int(underrun)
        g.samples_out += np.where(ready, g.out_samples, 0)
        return out, ready, positions, g.out_samples

    def _step_mixed(self):
        out_rate = CONFIG.output_rate
        progressed = False
        for g in self.groups:
            # lanes whose cursor rides ahead (mid-stream seek/reset) need the
            # FIFO to cover skip+window before a pop stays pad-free
            need = out_rate + int(g.skip.max())
            while g.fill < need:
                r = g.decode_once()
                if r is None:
                    break
                out, ready, underrun = r
                self.metrics.underruns += int(underrun)
                g.fifo_push(out, ready)
                progressed = True
        if not progressed and all(g.fill == 0 for g in self.groups):
            return None
        mask = np.zeros(self.lanes, bool)
        positions = np.zeros(self.lanes, np.float64)
        windows = []
        for g in self.groups:
            positions[g.slots] = g.samples_out / out_rate
            need = out_rate + int(g.skip.max())
            if g.fill >= need or (g.io.exhausted and g.fill > 0):
                got, had_real = g.fifo_pop(out_rate)
            else:
                # starved (not exhausted): hold the partial FIFO — popping it
                # now would zero-pad silence INTO the lane's timeline
                shape = ((g.dlanes, out_rate) if self.mono
                         else (g.dlanes, g.out_ch, out_rate))
                got = jnp.zeros(shape, jnp.int8)
                had_real = np.zeros(g.lanes, bool)
            if not self.mono and g.out_ch < self.out_channels:
                got = _dev_padch(got, self.out_channels)
            windows.append(got)
            mask[g.slots] = had_real
        if not mask.any():
            return None
        # assemble on device: concat in group order, un-permute to lane order
        chunk = _dev_assemble(tuple(windows), self._inv_perm_dev)
        return chunk, mask, positions, out_rate

    # -- checkpoint / resume (SURVEY.md §5.4) ------------------------------------------
    def checkpoint(self, lane: int) -> dict:
        """Serializable per-stream state: re-feeding bytes from ``byte_offset``
        after ``restore`` resumes the stream exactly.

        ``codec_state`` is the lane's row of every flattened codec-state leaf
        (pytree-generic: any stateful lane codec round-trips, not just DFPWM).
        Heterogeneous engines must checkpoint on a window boundary — a group
        FIFO remnant is lockstep-shared across the group's lanes and cannot be
        restored into a single lane, so a mid-window checkpoint raises rather
        than silently dropping buffered audio."""
        gi, slot = self._lane_map[lane]
        g = self.groups[gi]
        if self.heterogeneous and g.fill > 0:
            raise ValueError(
                "heterogeneous checkpoint requires a window boundary: the "
                f"lane's group FIFO holds {g.fill} undelivered samples "
                "(step() until the group drains, or checkpoint a finished lane)")
        byte_offset = int(g.samples_in[slot] * g.in_bytes // g.in_samples)
        codec_state = [np.asarray(leaf)[slot].copy() for leaf in g._state_leaves]
        fir = np.asarray(g.fir)[slot]
        filt_y = np.asarray(g.filt_y)[slot]
        filt_x = np.asarray(g.filt_x)[slot]
        return {
            "byte_offset": byte_offset,
            "pending": g.io.pending_bytes(slot),
            "eof": bool(g.io.eof[slot]),
            "codec_state": codec_state,
            # mono: scalar float (round-1 format); mono=False: f32[C] row
            "fir_state": float(fir) if fir.ndim == 0 else fir.copy(),
            "volume": (float(g.gain0[slot]), float(g.gain1[slot])),
            "dsp": {
                "kind": int(g.lp_kind[slot]), "alpha": float(g.lp_a[slot]),
                "norm_gain": float(g.norm_gain[slot]),
                "mono": bool(g.mono_sel[slot]),
                "started": bool(g.filt_started[slot]),
                "y": float(filt_y) if filt_y.ndim == 0 else filt_y.copy(),
                "x": float(filt_x) if filt_x.ndim == 0 else filt_x.copy(),
            },
        }

    def restore(self, lane: int, ckpt: dict):
        gi, slot = self._lane_map[lane]
        g = self.groups[gi]
        # a live restore (Fleet seek / station rotation) abandons the lane's
        # undelivered group-FIFO columns — they belong to the OLD timeline.
        # The cursor discards them lane-locally; other lanes are untouched
        g.skip[slot] = g.fill
        g.samples_in[slot] = ckpt["byte_offset"] * g.in_samples // g.in_bytes
        g.io.replace_lane(slot, ckpt["pending"], ckpt["eof"])
        if g._state_leaves:
            cs = ckpt.get("codec_state")  # None/absent -> zero the lane's state
            new_leaves = []
            for i, leaf in enumerate(g._state_leaves):
                arr = np.asarray(leaf).copy()
                arr[slot] = cs[i] if cs is not None else 0
                new_leaves.append(jnp.asarray(arr))
            g._state_leaves = new_leaves
        fir = np.asarray(g.fir).copy()
        fir[slot] = ckpt.get("fir_state", 0.0)
        g.fir = jnp.asarray(fir)
        g.gain0[slot], g.gain1[slot] = ckpt.get("volume", (1.0, 1.0))
        dsp = ckpt.get("dsp") or {}
        g.lp_kind[slot] = dsp.get("kind", 0)
        g.lp_a[slot] = dsp.get("alpha", 0.0)
        g.norm_gain[slot] = dsp.get("norm_gain", 1.0)
        g.mono_sel[slot] = dsp.get("mono", False)
        g.filt_started[slot] = dsp.get("started", False)
        fy = np.asarray(g.filt_y).copy()
        fx = np.asarray(g.filt_x).copy()
        fy[slot] = dsp.get("y", 0.0)
        fx[slot] = dsp.get("x", 0.0)
        g.filt_y, g.filt_x = jnp.asarray(fy), jnp.asarray(fx)

    def reset_lane(self, lane: int):
        """Reuse a finished lane for a new stream."""
        zero = {"byte_offset": 0, "pending": b"", "eof": False, "fir_state": 0.0,
                "codec_state": None}
        gi, slot = self._lane_map[lane]
        self.restore(lane, zero)
        self.groups[gi].samples_out[slot] = 0

    def lane_iterator(self, lane: int):
        """Generator of ``(chunk, position_seconds)`` for ONE lane — the
        stream-iterator facade over the batched engine, directly consumable by
        ``playback.play`` / ``playback.player`` (with ``mono=False`` each
        chunk is [C, T]: sink i receives channel i, the reference fan-out,
        aukit.lua:1929-1940). NOTE: iterating advances the WHOLE engine; use
        one consumer thread per engine, not per lane. Live feeds keep
        iterating through starved steps until ``done`` — a feed gap pauses
        the stream rather than ending it."""
        while True:
            r = self.step()
            if r is None:
                if self.done:
                    return
                time.sleep(0.005)  # starved, not done: await more feeds
                continue
            chunk, mask, pos = r
            if mask[lane]:
                yield np.asarray(chunk[lane]), float(pos[lane])


class BatchDfpwmDecoder(BatchStreamEngine):
    """Round-1 compatible facade: a homogeneous engine over one byte codec.

    Parameters mirror the original: lanes, sample_rate, chunk_bytes (input
    bytes per lane per step), mesh, use_pallas, codec ("dfpwm"/"ulaw"/"alaw"/
    "pcm8" plus, now, any other LaneSpec codec).
    """

    def __init__(
        self,
        lanes: int,
        sample_rate: int = 48000,
        chunk_bytes: int = 6000,
        mesh: jax.sharding.Mesh | None = None,
        use_pallas: bool | None = None,
        codec: str = "dfpwm",
    ):
        spec = LaneSpec(codec, sample_rate, 1, chunk_bytes=chunk_bytes)
        super().__init__([spec] * lanes, mesh=mesh, use_pallas=use_pallas)
        self.sample_rate = sample_rate
        self.chunk_bytes = chunk_bytes
        self.codec = codec
