"""Batched multi-stream ENCODER engine — the transcode mirror of
stream/batch.py (SURVEY.md §2.4's batch axis applied to the write path; the
reference's encode surface is Audio:pcm / Audio:wav / Audio:dfpwm,
aukit.lua:868-1018, one stream at a time, and auconvert's decode->write
pipeline, auconvert.lua:412-419).

``BatchEncodeEngine`` generalizes round 1's mono DFPWM encoder to the decode
engine's shape (VERDICT r4 item 2):

 - **encode lane specs & groups**: every lane declares its target codec /
   channels (``EncodeSpec``: DFPWM or little-endian WAV-layout PCM
   8/16/24/32); equal specs share one fused device dispatch per step;
 - **device-to-device glue**: ``encode_windows(windows, mask)`` consumes a
   decode engine's / Fleet's int8 window array WITHOUT leaving HBM — the
   int8 -> target-int conversion evaluates the 256-entry conversion table
   as gather-free int32 arithmetic (``int8_to_target_ints_device``; TPU
   gathers serialize) replicating the exact solo chain (int8 bytes ->
   aukit.pcm 8-bit loader -> encodePCM/f64 -> trunc), so fleet transcodes
   are BIT-equal to the solo writers (aukit.lua:868-874/1005 numerics,
   including the unsigned-8 bias ordering and the truncating pack of
   ops/pcmcode.pack_pcm);
 - **host float ingestion**: ``feed(lane, samples)`` takes [-1, 1] float
   chunks (the Audio currency); conversion to target ints happens at feed
   time in f64 — the same correctly-rounded path the solo writers take;
 - **mesh**: every group pads its lanes to a device-count multiple and runs
   its step under ``jax.shard_map`` (the decode engine's ``_wrap_step``
   pattern — Pallas stays on under a mesh, zero collectives);
 - per-lane serializable **checkpoints** (encoder state rows + cursors +
   gain), per-lane **gain** with the decode engine's click-free ramp
   (applied in f32 before the target quantize; gain 1 takes the bit-exact
   LUT path);
 - multichannel lanes interleave frames on device exactly like the solo
   interleaved writers (Audio:wav / Audio:dfpwm(interleaved=True)).

Outputs per step: (bytes uint8[L, Bmax] device array, nbytes int64[L] valid
bytes per lane, mask bool[L], positions f64[L] seconds). DFPWM lanes emit
whole bytes only (the solo encoder's truncation, aukit.lua:1009).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.dfpwm import DfpwmState, dfpwm_encode
from ..ops.pcmcode import denormalize_pcm
from .batch import BatchMetrics, _GroupIO

__all__ = ["BatchDfpwmEncoder", "BatchEncodeEngine", "EncodeSpec",
           "transcode_fleet"]


class BatchDfpwmEncoder:
    """Fixed-lane batched PCM8 -> DFPWM encoder.

    Feed signed 8-bit sample bytes per lane (``feed``/``feed_array``, same
    ingestion surface as the decode engine, incl. device-resident arrays);
    every ``step()`` consumes ``chunk_samples`` per ready lane and returns
    (bytes uint8[L, chunk_samples//8] device array, mask, positions_seconds).
    Trailing partials are zero-padded to whole bytes (the reference encoder
    consumes whole bytes, aukit.lua:1009).
    """

    def __init__(self, lanes: int, chunk_samples: int = 48000, use_pallas: bool | None = None):
        if chunk_samples % 8:
            raise ValueError("chunk_samples must be a multiple of 8")
        self.lanes = lanes
        self.chunk_samples = chunk_samples
        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          and lanes * chunk_samples >= 1 << 20)
        self.use_pallas = use_pallas
        self.io = _GroupIO(lanes, chunk_samples)  # 1 byte per sample (pcm8)
        self.state = DfpwmState.zeros(lanes)
        self.samples_in = np.zeros(lanes, np.int64)
        self.metrics = BatchMetrics()
        self._step_fn = self._build_step()

    def _build_step(self):
        use_pallas = self.use_pallas

        def step(bytes_u8, mask2d, charge, strength, prev_bit):
            v = bytes_u8.astype(jnp.int32)
            levels = jnp.where(v >= 128, v - 256, v)  # signed 8-bit samples
            state = DfpwmState(charge, strength, prev_bit,
                               jnp.zeros_like(charge), jnp.zeros_like(charge))
            if use_pallas:
                from ..kernels.dfpwm_pallas import dfpwm_encode_pallas

                enc, new_state = dfpwm_encode_pallas(levels, state)
            else:
                enc, new_state = dfpwm_encode(levels, state)
            mask1 = mask2d[:, 0]
            enc = jnp.where(mask2d[:, : enc.shape[1]], enc, 0)
            keep = lambda n, o: jnp.where(mask1, n, o)
            return (enc, keep(new_state.charge, charge),
                    keep(new_state.strength, strength),
                    keep(new_state.previous_bit, prev_bit))

        return jax.jit(step)

    # ingestion mirrors the decode engine
    def feed(self, lane: int, data: bytes | None):
        self.io.feed_lane(lane, data)

    def feed_many(self, datas: Sequence[bytes | None]):
        for lane, d in enumerate(datas):
            self.feed(lane, d)

    def feed_array(self, arr, eof: bool = True):
        self.io.feed_bulk(arr, eof)

    @property
    def done(self) -> bool:
        return self.io.exhausted

    def step(self):
        """Encode one chunk across all lanes, or None when finished/starved.
        Returns (dfpwm uint8[L, chunk//8] device array, mask, positions)."""
        if self.done:
            return None
        t0 = time.perf_counter()
        st = self.io.stage()
        if st is None:
            return None
        staged, ready, consumed, underrun = st
        positions = self.samples_in / 48000.0
        dev = jnp.asarray(staged)
        enc, charge, strength, prev_bit = self._step_fn(
            dev, jnp.asarray(ready[:, None]),
            self.state.charge, self.state.strength, self.state.previous_bit)
        self.state = DfpwmState(charge, strength, prev_bit,
                                self.state.previous_charge, self.state.lowpass)
        self.samples_in += np.where(ready, consumed, 0)
        self.metrics.steps += 1
        self.metrics.samples_decoded += int(ready.sum()) * self.chunk_samples
        self.metrics.underruns += int(underrun)
        self.metrics.wall_seconds += time.perf_counter() - t0
        return enc, ready, positions


# -- the generalized encode engine (VERDICT r4 item 2) -------------------------

_DEPTH = {"pcm8": 8, "pcm16": 16, "pcm24": 24, "pcm32": 32}
ENCODE_CODECS = ("dfpwm",) + tuple(_DEPTH)


@dataclasses.dataclass(frozen=True)
class EncodeSpec:
    """One encode lane's target format. ``pcm8`` is unsigned (the WAV
    convention, Audio:wav bit_depth=8); pcm16/24/32 are signed little-endian
    (aukit.lua:942 fmt layout). Lanes with equal specs share a group — one
    fused device dispatch per step."""

    codec: str
    channels: int = 1
    sample_rate: int = 48000  # bookkeeping (positions, WAV headers)

    def __post_init__(self):
        if self.codec not in ENCODE_CODECS:
            raise ValueError(f"unsupported encode codec {self.codec!r}")
        if self.channels < 1:
            raise ValueError("channels must be >= 1")


@functools.lru_cache(maxsize=16)
def _int8_lut(codec: str) -> np.ndarray:
    """int8 window value (+128) -> target int, replicating the solo chain
    EXACTLY: int8 byte -> aukit.pcm 8-bit loader (f64 normalize, f32 cast;
    ops/pcmcode.normalize_pcm) -> encodePCM f64 denormalize (+ unsigned bias
    BEFORE the trunc, pack_pcm order) -> trunc. The gain==1 device path
    evaluates this table gather-free (``int8_to_target_ints_device``); the
    table stays the ground truth that decomposition is tested against —
    bit-equal to the solo writers by construction."""
    w = np.arange(-128, 128, dtype=np.float64)
    d = (w / np.where(w < 0, 128.0, 127.0)).astype(np.float32).astype(np.float64)
    return float_to_target_ints(d, codec)


def float_to_target_ints(samples, codec: str) -> np.ndarray:
    """Host-side exact conversion: float [-1, 1] samples -> target ints via
    the solo writers' f64 path (encodePCM aukit.lua:868-874 numerics via
    ops/pcmcode.denormalize_pcm — the ONE place the unsigned-bias/trunc
    ordering lives; DFPWM levels per Audio:dfpwm, aukit.lua:1005)."""
    d = np.asarray(samples, dtype=np.float64)
    if codec == "dfpwm":
        scaled = denormalize_pcm(d, 8, "signed")
    else:
        b = _DEPTH[codec]
        scaled = denormalize_pcm(d, b, "unsigned" if b == 8 else "signed")
    return np.trunc(scaled).astype(np.int64).astype(np.int32)


# int8 -> target-int conversion WITHOUT a device gather. A 256-entry
# ``jnp.take`` serializes on the TPU: in the round-5 transcode profile the
# one LUT gather cost 717 ms of the 730 ms device pass — ~250x the whole
# DFPWM encode kernel it fed. The same table decomposes into a handful of
# VPU-vectorized int32 ops instead:
#  - NEGATIVE int8 values convert exactly (the /128 normalize is a
#    power-of-2 scale, exact in f32/f64): value = w * scale + bias;
#  - POSITIVE values are base(w) = w*num//den + add (exact integer
#    arithmetic) plus a per-w correction delta(w) in [-64, 63] that
#    captures the f32-rounding of the solo chain's w/127 normalize.
#    delta rides in <=7 bit-planes of 128-bit masks, each evaluated as an
#    8-way chunk select + shift (no gather).
# Bit-equality with _int8_lut for all 256 inputs x all codecs is pinned by
# test_batch_encode::test_int8_device_conversion_matches_lut.
_NEG_AFFINE = {"dfpwm": (1, 0), "pcm8": (1, 128), "pcm16": (256, 0),
               "pcm24": (65536, 0), "pcm32": (16777216, 0)}
_POS_BASE = {"dfpwm": (1, 1, 0), "pcm8": (1, 1, 128),
             "pcm16": (32767, 127, 0), "pcm24": (8388607, 127, 0),
             "pcm32": (2147483647, 127, 0)}


def _pos_base_np(wp: np.ndarray, codec: str) -> np.ndarray:
    num, den, add = _POS_BASE[codec]
    return wp * num // den + add


@functools.lru_cache(maxsize=16)
def _pos_delta_planes(codec: str):
    """(planes int32[P, 8], bias): positive-half LUT deltas vs _pos_base_np
    packed as bit-planes of 16-bit chunks (bit w of plane b lives at
    planes[b, w >> 4] bit (w & 15))."""
    lut = _int8_lut(codec).astype(np.int64)[128:]
    wp = np.arange(128, dtype=np.int64)
    delta = lut - _pos_base_np(wp, codec)
    bias = int(-delta.min())
    d = delta + bias
    nbits = max(1, int(d.max()).bit_length())
    planes = np.zeros((nbits, 8), np.int32)
    for w in range(128):
        v = int(d[w])
        for b in range(nbits):
            if (v >> b) & 1:
                planes[b, w >> 4] |= 1 << (w & 15)
    return planes, bias


def int8_to_target_ints_device(x, codec: str):
    """Gather-free device twin of ``jnp.take(_int8_lut(codec), x + 128)``
    (see the decomposition note above). ``x`` is int8[...]; returns
    int32[...] target values, bit-equal to the table."""
    w = x.astype(jnp.int32)
    nmul, nadd = _NEG_AFFINE[codec]
    neg = w * nmul + nadd
    wp = jnp.maximum(w, 0)
    num, den, add = _POS_BASE[codec]
    q, r = divmod(num, den)
    base = wp * q + (wp * r) // den + add if r else wp * q + add
    planes, bias = _pos_delta_planes(codec)
    if planes.any() or bias:
        chunk = wp >> 4
        bit = wp & 15
        delta = jnp.zeros_like(wp)
        for b in range(planes.shape[0]):
            val = jnp.full_like(wp, int(planes[b, 0]))
            for k in range(1, 8):
                if planes[b, k]:
                    val = jnp.where(chunk == k, int(planes[b, k]), val)
                else:
                    val = jnp.where(chunk == k, 0, val)
            delta = delta + (((val >> bit) & 1) << b)
        base = base + delta - bias
    return jnp.where(w < 0, neg, base)


class _EncGroup:
    """Encode lanes sharing one EncodeSpec: fused device step + host FIFO."""

    def __init__(self, spec: EncodeSpec, slots: np.ndarray, mesh,
                 use_pallas, chunk: int):
        self.spec = spec
        self.slots = slots
        self.lanes = len(slots)
        self.mesh = mesh
        self.chunk = chunk
        self.pad = 0 if mesh is None else (-self.lanes) % mesh.devices.size
        self.dlanes = self.lanes + self.pad
        depth = _DEPTH.get(spec.codec, 8)
        self.bytes_per_frame = (spec.channels if spec.codec == "dfpwm"
                                else spec.channels * depth // 8)
        # one step's output width; DFPWM packs 8 interleaved levels per byte
        lv = chunk * spec.channels
        self.out_bytes = lv // 8 if spec.codec == "dfpwm" else lv * depth // 8
        if spec.codec == "dfpwm" and lv % 8:
            raise ValueError("dfpwm lanes need chunk*channels % 8 == 0")
        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          and spec.codec == "dfpwm"
                          and self.dlanes * lv >= 1 << 20)
        self.use_pallas = use_pallas
        self.stateful = spec.codec == "dfpwm"
        z = jnp.zeros(self.dlanes, jnp.int32)
        self.state: tuple = (z, z, z) if self.stateful else ()
        self.gain0 = np.ones(self.dlanes, np.float32)
        self.gain1 = np.ones(self.dlanes, np.float32)
        self.samples_in = np.zeros(self.lanes, np.int64)
        # host float-feed FIFO: per-lane deques of int32 [C, k] pending vals
        import collections

        self.pend = [collections.deque() for _ in range(self.lanes)]
        self.sizes = np.zeros(self.lanes, np.int64)
        self.eof = np.zeros(self.lanes, bool)
        self._sharding = None
        if mesh is not None:
            P = jax.sharding.PartitionSpec
            self._sharding = jax.sharding.NamedSharding(
                mesh, P(tuple(mesh.axis_names), None, None))
        self._fns: dict = {}

    # -- step builders ------------------------------------------------------
    def _encode_core(self, vals, mask1, state):
        """vals int32 [l, C, T] target ints -> (bytes uint8[l, B], state').
        Channels interleave per frame exactly like the solo interleaved
        writers (Audio:wav/Audio:dfpwm, aukit.lua:942/1005)."""
        L = vals.shape[0]
        flat = jnp.moveaxis(vals, 1, 2).reshape(L, -1)  # frame-interleaved
        if self.spec.codec == "dfpwm":
            st = DfpwmState(state[0], state[1], state[2],
                            jnp.zeros_like(state[0]), jnp.zeros_like(state[0]))
            if self.use_pallas:
                from ..kernels.dfpwm_pallas import dfpwm_encode_pallas

                enc, ns = dfpwm_encode_pallas(flat, st)
            else:
                enc, ns = dfpwm_encode(flat, st)
            enc = jnp.where(mask1[:, None], enc, 0)
            keep = lambda n_, o_: jnp.where(mask1, n_, o_)  # noqa: E731
            return enc, (keep(ns.charge, state[0]),
                         keep(ns.strength, state[1]),
                         keep(ns.previous_bit, state[2]))
        nb = _DEPTH[self.spec.codec] // 8
        u = flat.astype(jnp.uint32)  # two's-complement low bytes == pack_pcm
        parts = [((u >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(nb)]
        out = jnp.stack(parts, axis=-1).reshape(L, -1)
        return jnp.where(mask1[:, None], out, 0), state

    def _build(self, kind: str, with_gain: bool):
        """kind: "vals" (host-converted ints) | "win" (int8 windows — LUT or
        gained f32 conversion on device)."""
        spec = self.spec
        depth = _DEPTH.get(spec.codec, 8)
        mv = np.float32(128.0 if spec.codec == "dfpwm" else 1 << (depth - 1))
        add = np.float32(mv if spec.codec == "pcm8" else 0.0)

        def step(x, mask2d, *rest):
            mask1 = mask2d[:, 0]
            if with_gain:
                g0, gs, *state = rest
            else:
                state = list(rest)
            if kind == "win":
                if with_gain:
                    # f32 path (documented rounding): normalize, per-sample
                    # linear gain line, saturate, denormalize, trunc. The
                    # clip matches the decode chain's int8 saturation
                    # (parallel/pipeline.py) — without it |gain*x| > 1 would
                    # wrap two's-complement in the int cast
                    d = x.astype(jnp.float32) / jnp.where(x < 0, 128.0, 127.0)
                    t = jnp.arange(x.shape[-1], dtype=jnp.float32)
                    d = d * (g0[:, None, None] + gs[:, None, None] * t)
                    d = jnp.clip(d, -1.0, 1.0)
                    scaled = d * jnp.where(d < 0, mv, mv - 1.0) + add
                    vals = scaled.astype(jnp.int32)
                else:  # bit-exact gather-free table evaluation
                    vals = int8_to_target_ints_device(x, spec.codec)
            else:
                vals = x
            out, new_state = self._encode_core(vals, mask1, tuple(state))
            return (out, *new_state)

        return self._wrap(step, with_gain)

    def _wrap(self, step, with_gain: bool):
        if self._sharding is None:
            return jax.jit(step)
        P = jax.sharding.PartitionSpec
        axes = tuple(self.mesh.axis_names)
        lane1, lane2, lane3 = P(axes), P(axes, None), P(axes, None, None)
        nstate = len(self.state)
        gspec = (lane1, lane1) if with_gain else ()
        return jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(lane3, lane2) + gspec + (lane1,) * nstate,
            out_specs=(lane2,) + (lane1,) * nstate,
            check_vma=False,
        ))

    def _fn(self, kind: str, with_gain: bool):
        key = (kind, with_gain)
        if key not in self._fns:
            self._fns[key] = self._build(kind, with_gain)
        return self._fns[key]

    def _dispatch(self, x, ready: np.ndarray, kind: str):
        """Pad to dlanes, place under the mesh sharding, run the step."""
        if self.pad:
            pw = ((0, self.pad), (0, 0), (0, 0))
            x = jnp.pad(x, pw) if not isinstance(x, np.ndarray) else np.pad(x, pw)
        dev = jnp.asarray(x)
        if self._sharding is not None:
            dev = jax.device_put(dev, self._sharding)
        ready_dev = np.pad(ready, (0, self.pad)) if self.pad else ready
        with_gain = kind == "win" and bool(
            (self.gain0 != 1.0).any() or (self.gain1 != 1.0).any())
        fn = self._fn(kind, with_gain)
        if with_gain:
            T = x.shape[-1]
            gs = (self.gain1 - self.gain0) / np.float32(T)
            # gain0 is mutated in place below and by set_volume: snapshot it
            # (jnp.asarray's host read is async — see _Group.step)
            out, *state = fn(dev, jnp.asarray(ready_dev[:, None]),
                             jnp.asarray(self.gain0.copy()), jnp.asarray(gs),
                             *self.state)
            self.gain0[: self.lanes] = np.where(
                ready, self.gain1[: self.lanes], self.gain0[: self.lanes])
        else:
            out, *state = fn(dev, jnp.asarray(ready_dev[:, None]), *self.state)
        self.state = tuple(state)
        return out

    # -- host float FIFO ----------------------------------------------------
    def feed_lane(self, slot: int, samples):
        if samples is None:
            self.eof[slot] = True
            return
        s = np.atleast_2d(np.asarray(samples))
        if s.shape[0] != self.spec.channels:
            raise ValueError(
                f"lane expects {self.spec.channels} channels, got {s.shape[0]}")
        g = float(self.gain1[slot])
        if g != 1.0:  # host path: instantaneous gain at feed time (no ramp);
            # saturate like the device gain path (ungained feeds stay on the
            # solo writers' unclipped path for bit-equality)
            s = np.clip(s * g, -1.0, 1.0)
        self.pend[slot].append(float_to_target_ints(s, self.spec.codec))
        self.sizes[slot] += s.shape[1]

    def stage(self):
        """-> (vals int32[lanes, C, chunk], ready, consumed, underrun) or
        None. EOF tails zero-pad (DFPWM reports whole real bytes only)."""
        full = self.sizes >= self.chunk
        partial = self.eof & ~full & (self.sizes > 0)
        ready = full | partial
        if not ready.any():
            return None
        underrun = bool((~self.eof & ~full).any())
        staged = np.zeros((self.lanes, self.spec.channels, self.chunk), np.int32)
        consumed = np.zeros(self.lanes, np.int64)
        for slot in np.nonzero(ready)[0]:
            need = int(min(self.chunk, self.sizes[slot]))
            consumed[slot] = need
            at = 0
            dq = self.pend[slot]
            while at < need:
                head = dq[0]
                m = min(head.shape[1], need - at)
                staged[slot, :, at:at + m] = head[:, :m]
                if m == head.shape[1]:
                    dq.popleft()
                else:
                    dq[0] = head[:, m:]
                at += m
            self.sizes[slot] -= need
        return staged, ready, consumed, underrun

    @property
    def exhausted(self) -> bool:
        return bool(self.eof.all()) and not self.sizes.any()


class BatchEncodeEngine:
    """Fixed-lane batched float/int8 -> encoded-bytes engine (see module
    docstring).

    Parameters
    ----------
    specs : one EncodeSpec per lane (equal specs share a fused dispatch)
    chunk_samples : per-channel samples consumed per host-fed step (the
        window length for ``encode_windows`` is taken from the array)
    mesh : optional Mesh — every group's lanes shard over all axes
    use_pallas : force/disable the DFPWM Pallas encode kernel
    """

    def __init__(self, specs: Sequence[EncodeSpec], chunk_samples: int = 48000,
                 mesh=None, use_pallas: bool | None = None):
        specs = list(specs)
        if not specs:
            raise ValueError("need at least one lane")
        self.specs = specs
        self.lanes = len(specs)
        self.chunk_samples = chunk_samples
        by_spec: dict[EncodeSpec, list[int]] = {}
        for i, s in enumerate(specs):
            by_spec.setdefault(s, []).append(i)
        self.groups = [
            _EncGroup(s, np.array(slots), mesh, use_pallas, chunk_samples)
            for s, slots in by_spec.items()
        ]
        self._lane_map: list[tuple[int, int]] = [None] * self.lanes
        for gi, g in enumerate(self.groups):
            for slot, lane in enumerate(g.slots):
                self._lane_map[lane] = (gi, slot)
        row = np.zeros(self.lanes, np.int64)
        base = 0
        for g in self.groups:
            row[g.slots] = base + np.arange(g.lanes)
            base += g.dlanes
        self._inv_perm = jnp.asarray(row)
        self.mesh = mesh
        self.metrics = BatchMetrics()

    # -- ingestion ----------------------------------------------------------
    def feed(self, lane: int, samples):
        """Append float [-1, 1] samples ([T] or [C, T]) to a lane; None marks
        end-of-stream. Conversion to target ints happens here, in f64 — the
        solo writers' exact path."""
        gi, slot = self._lane_map[lane]
        self.groups[gi].feed_lane(slot, samples)

    def feed_many(self, samples_list):
        for lane, s in enumerate(samples_list):
            self.feed(lane, s)

    def set_volume(self, lane: int, volume: float, ramp: bool = False):
        """Per-lane encode gain. On the window-glue path the gain applies on
        device (f32, with the decode engine's click-free linear ramp across
        the next window when ``ramp=True``); gain 1.0 keeps the bit-exact LUT
        path. Host-fed lanes apply the instantaneous gain at feed time."""
        gi, slot = self._lane_map[lane]
        g = self.groups[gi]
        if not ramp:
            g.gain0[slot] = volume
        g.gain1[slot] = volume

    def get_volume(self, lane: int) -> float:
        gi, slot = self._lane_map[lane]
        return float(self.groups[gi].gain1[slot])

    @property
    def done(self) -> bool:
        return all(g.exhausted for g in self.groups)

    # -- device-to-device glue ----------------------------------------------
    def encode_windows(self, windows, mask):
        """Encode ONE decode-engine window batch device-to-device: ``windows``
        is int8[L, T] (mono) or int8[L, C, T] in engine lane order (a device
        array stays on device — the Fleet/engine step output feeds straight
        in), ``mask`` bool[L] marks lanes with real audio. Returns
        (bytes uint8[L, Bmax] device, nbytes int64[L], mask, positions).
        Rows beyond a lane's nbytes are zero padding (groups differ in output
        width)."""
        t0 = time.perf_counter()
        mask = np.asarray(mask, bool)
        if windows.ndim == 2:
            windows = windows[:, None, :]
        T = windows.shape[-1]
        outs = []
        widths = []
        positions = np.zeros(self.lanes, np.float64)
        for g in self.groups:
            if windows.shape[1] != g.spec.channels:
                raise ValueError(
                    f"window channels {windows.shape[1]} != lane spec "
                    f"channels {g.spec.channels}")
            rows = (jnp.take(windows, jnp.asarray(g.slots), axis=0)
                    if len(self.groups) > 1 else jnp.asarray(windows))
            ready = mask[g.slots]
            out = g._dispatch(rows, ready, "win")
            lv = T * g.spec.channels
            width = lv // 8 if g.spec.codec == "dfpwm" else out.shape[-1]
            outs.append(out)
            widths.append(width)
            # positions report the CHUNK-START second (the decode engines'
            # and step()'s convention), so decode/encode positions align on
            # the glue path
            positions[g.slots] = g.samples_in / g.spec.sample_rate
            g.samples_in += np.where(ready, T, 0)
        nbytes = np.zeros(self.lanes, np.int64)
        for g, width in zip(self.groups, widths):
            nbytes[g.slots] = np.where(mask[g.slots], width, 0)
        bmax = max(out.shape[-1] for out in outs)
        padded = [out if out.shape[-1] == bmax
                  else jnp.pad(out, ((0, 0), (0, bmax - out.shape[-1])))
                  for out in outs]
        cat = padded[0] if len(padded) == 1 else jnp.concatenate(padded, axis=0)
        assembled = jnp.take(cat, self._inv_perm, axis=0)
        self.metrics.steps += 1
        self.metrics.samples_decoded += int(mask.sum()) * T
        self.metrics.wall_seconds += time.perf_counter() - t0
        return assembled, nbytes, mask, positions

    # -- host-fed step ------------------------------------------------------
    def step(self):
        """Encode one chunk across all host-fed lanes, or None when
        finished/starved. Returns (bytes uint8[L, Bmax] device, nbytes
        int64[L], mask, positions)."""
        if self.done:
            return None
        t0 = time.perf_counter()
        outs, masks, consumed_all = [], np.zeros(self.lanes, bool), {}
        any_ready = False
        for g in self.groups:
            st = g.stage()
            if st is None:
                outs.append(jnp.zeros((g.dlanes, g.out_bytes), jnp.uint8))
                consumed_all[id(g)] = None
                continue
            staged, ready, consumed, underrun = st
            any_ready = True
            self.metrics.underruns += int(underrun)
            out = g._dispatch(staged, ready, "vals")
            outs.append(out)
            masks[g.slots] = ready
            consumed_all[id(g)] = consumed
        if not any_ready:
            return None
        nbytes = np.zeros(self.lanes, np.int64)
        positions = np.zeros(self.lanes, np.float64)
        for g in self.groups:
            positions[g.slots] = g.samples_in / g.spec.sample_rate
            consumed = consumed_all[id(g)]
            if consumed is None:
                continue
            lv = consumed * g.spec.channels
            nb = (lv // 8 if g.spec.codec == "dfpwm"
                  else lv * g.bytes_per_frame // g.spec.channels)
            nbytes[g.slots] = nb
            g.samples_in += consumed
        bmax = max(out.shape[-1] for out in outs)
        padded = [out if out.shape[-1] == bmax
                  else jnp.pad(out, ((0, 0), (0, bmax - out.shape[-1])))
                  for out in outs]
        cat = padded[0] if len(padded) == 1 else jnp.concatenate(padded, axis=0)
        assembled = jnp.take(cat, self._inv_perm, axis=0)
        self.metrics.steps += 1
        self.metrics.samples_decoded += int(masks.sum()) * self.chunk_samples
        self.metrics.wall_seconds += time.perf_counter() - t0
        return assembled, nbytes, masks, positions

    # -- checkpoint / resume (SURVEY.md §5.4) --------------------------------
    def checkpoint(self, lane: int) -> dict:
        gi, slot = self._lane_map[lane]
        g = self.groups[gi]
        pend = (np.concatenate(list(g.pend[slot]), axis=1)
                if g.pend[slot] else np.zeros((g.spec.channels, 0), np.int32))
        return {
            "samples_in": int(g.samples_in[slot]),
            "codec_state": [int(np.asarray(s)[slot]) for s in g.state],
            "volume": (float(g.gain0[slot]), float(g.gain1[slot])),
            "pending": pend,
            "eof": bool(g.eof[slot]),
        }

    def restore(self, lane: int, ckpt: dict):
        import collections

        gi, slot = self._lane_map[lane]
        g = self.groups[gi]
        g.samples_in[slot] = ckpt["samples_in"]
        cs = ckpt.get("codec_state") or [0] * len(g.state)
        new_state = []
        for leaf, v in zip(g.state, cs):
            arr = np.asarray(leaf).copy()
            arr[slot] = v
            new_state.append(jnp.asarray(arr))
        g.state = tuple(new_state)
        g.gain0[slot], g.gain1[slot] = ckpt.get("volume", (1.0, 1.0))
        pend = np.asarray(ckpt.get("pending",
                                   np.zeros((g.spec.channels, 0), np.int32)))
        g.pend[slot] = collections.deque([pend] if pend.shape[1] else [])
        g.sizes[slot] = pend.shape[1]
        g.eof[slot] = ckpt.get("eof", False)

    def reset_lane(self, lane: int):
        self.restore(lane, {"samples_in": 0, "codec_state": None,
                            "volume": (1.0, 1.0), "eof": False})


def transcode_fleet(source, encoder: BatchEncodeEngine, max_steps: int = 1 << 20):
    """Drive a decode engine / Fleet into a BatchEncodeEngine device-to-device
    (auconvert's decode->write pipeline, auconvert.lua:333-419, on SURVEY
    §2.4's batch axis): every decode window feeds ``encode_windows`` without
    leaving HBM; encoded bytes are fetched once per step. Returns per-lane
    ``bytes``. Final windows are zero-padded to the one-second window grid by
    the decode engines, so outputs may carry encoded trailing silence up to
    one window (documented; solo writers stop at the exact sample)."""
    outs = [bytearray() for _ in range(encoder.lanes)]
    for _ in range(max_steps):
        if source.done:
            break
        r = source.step()
        if r is None:
            continue
        windows, mask, _pos = r
        out, nbytes, m2, _p = encoder.encode_windows(windows, mask)
        host = np.asarray(out)
        for i in np.nonzero(m2)[0]:
            outs[i].extend(host[i, : nbytes[i]].tobytes())
    return [bytes(o) for o in outs]
