"""Multi-host distributed backend (SURVEY.md §5.8).

The reference's transport layer is austream's rednet/websocket pulls feeding
one Lua VM. The TPU-native equivalent scales the *batch axis* over hosts:
every process ingests its own streams (network/disk), places them as the
local shards of one global lane-sharded array, and the jitted pipeline step
runs globally — per-lane decode stays chip-local, the only cross-chip/
cross-host communication is whatever collective the pipeline asks for (e.g.
the global peak-normalize all-reduce), inserted by XLA and riding ICI within
a slice / DCN across hosts. No NCCL/MPI analog is needed (SURVEY.md §5.8).

Usage (same program on every host):

    from aukit_tpu.parallel import distributed as dist
    dist.init_distributed("host0:1234", num_processes=N, process_id=i)
    mesh = dist.global_mesh()
    step, to_global = dist.multihost_pipeline_step(mesh, lanes, nbytes)
    g_bytes, g_state = to_global(local_bytes, local_state)   # local shards in
    out, new_state = step(g_bytes, *g_state)                 # global dispatch

Tested two-process on a virtual CPU mesh (tests/test_distributed.py) — the
same code path scales to real multi-host TPU slices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.dfpwm import DfpwmState
from .pipeline import decode_pipeline_scan


def init_distributed(coordinator_address: str, num_processes: int, process_id: int, **kw):
    """Join the process group (jax.distributed). Call before any backend use."""
    jax.distributed.initialize(
        coordinator_address, num_processes=num_processes, process_id=process_id, **kw
    )


def global_mesh(axes=("dp", "sp")) -> jax.sharding.Mesh:
    """Mesh over every device of every process (near-square factorization,
    same shape rule as parallel.pipeline.make_mesh)."""
    devices = jax.devices()
    n = len(devices)
    dp = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            dp = cand
            break
    return jax.sharding.Mesh(np.array(devices).reshape(dp, n // dp), axes)


def multihost_pipeline_step(mesh: jax.sharding.Mesh, lanes_per_process: int,
                            nbytes: int, in_rate: int = 48000):
    """Build (step_fn, to_global) for the flagship DFPWM pipeline with lanes
    sharded over the whole (possibly multi-host) mesh.

    ``to_global(local_bytes uint8[lanes_per_process, nbytes], state)`` places
    each process's ingested streams as its local shards of the global arrays;
    ``step_fn`` is the jitted global dispatch returning (int8 chunk, state).
    """
    P = jax.sharding.PartitionSpec
    lane_sh = jax.sharding.NamedSharding(mesh, P(tuple(mesh.axis_names), None))
    state_sh = jax.sharding.NamedSharding(mesh, P(tuple(mesh.axis_names)))
    total_lanes = lanes_per_process * jax.process_count()

    def step(bytes_u8, charge, strength, prev_bit, prev_charge, lowpass):
        state = DfpwmState(charge, strength, prev_bit, prev_charge, lowpass)
        out, st = decode_pipeline_scan(bytes_u8, state, in_rate, normalize_peak=0.9)
        return out, st.charge, st.strength, st.previous_bit, st.previous_charge, st.lowpass

    step_fn = jax.jit(
        step,
        in_shardings=(lane_sh,) + (state_sh,) * 5,
        out_shardings=(lane_sh,) + (state_sh,) * 5,
    )

    def to_global(local_bytes: np.ndarray, state: DfpwmState | None = None):
        local_bytes = np.ascontiguousarray(local_bytes, np.uint8)
        g_bytes = jax.make_array_from_process_local_data(
            lane_sh, local_bytes, (total_lanes, nbytes))
        if state is None:
            local_state = [np.zeros(lanes_per_process, np.int32)] * 5
        else:
            local_state = [np.asarray(getattr(state, f), np.int32) for f in
                           ("charge", "strength", "previous_bit", "previous_charge", "lowpass")]
        g_state = [
            jax.make_array_from_process_local_data(state_sh, s, (total_lanes,))
            for s in local_state
        ]
        return g_bytes, g_state

    return step_fn, to_global


class MultiHostEngine:
    """One spec-group of ``BatchStreamEngine`` lanes sharded across PROCESSES
    (VERDICT r4 item 5 — multi-host for the production engines, not just the
    flagship scan).

    Each process owns ``lanes_per_process`` contiguous lanes: it feeds their
    bytes locally (``feed``/``feed_many``), and every ``step()`` is ONE
    global sharded dispatch of the group's production step function — the
    same ``_Group._build_step`` graph the single-process engine compiles,
    shard_map'd over the global mesh (``use_pallas`` stays available: each
    device runs the kernel on its own lane shard, zero collectives).
    Ingestion crosses the host boundary per group via
    ``jax.make_array_from_process_local_data``: each host's staged
    ``uint8[L_local, in_bytes]`` block becomes its local shards of the global
    ``[lanes, in_bytes]`` array (SURVEY.md §5.8 "DCN for multi-host ingest
    fan-out"); decoder state lives as global arrays carried step to step, so
    audio and state never leave the devices.

    Contract:
      - every process calls ``step()`` in LOCKSTEP (a global dispatch needs
        every process). A process whose lanes are all starved/finished still
        participates — its stage is fully masked, bit-preserving its lanes'
        state (the engine's ready-mask semantics).
      - ``step()`` returns (global int8 chunk [lanes, T] / [lanes, C, T],
        local ready mask, local positions); ``local_rows(chunk)`` fetches
        only this process's addressable rows.
      - ``global_done()`` is the one-scalar agreement (a jitted all-reduce
        over per-process done flags).

    Heterogeneous fleets run one MultiHostEngine per spec group — exactly
    the single-process engine's per-group dispatch structure (groups never
    share a device op; the 1-second window merge is consumer-side there).
    """

    def __init__(self, spec, lanes_per_process: int, mesh=None,
                 use_pallas: bool | None = False, mono: bool = True,
                 interpolation: str | None = None):
        from ..config import CONFIG, get_interpolation
        from ..stream.batch import _Group, _GroupIO

        self.npr = jax.process_count()
        self.pid = jax.process_index()
        self.lanes_local = int(lanes_per_process)
        self.lanes = self.lanes_local * self.npr
        self.mesh = mesh if mesh is not None else global_mesh()
        ndev = self.mesh.devices.size
        if self.lanes % ndev:
            raise ValueError(
                f"total lanes {self.lanes} must divide the {ndev}-device "
                "mesh (pad lanes_per_process)")
        self._g = _Group(spec, np.arange(self.lanes), self.mesh, use_pallas,
                         CONFIG.output_rate, mono=mono,
                         mode=get_interpolation(interpolation))
        self._io = _GroupIO(self.lanes_local, self._g.in_bytes)
        # promote the group's carried state to GLOBAL arrays: local shard =
        # this process's lane block (zeros, same as _Group's init)
        self._g.fir = self._glob(np.zeros(
            (self.lanes_local,) + tuple(self._g.fir.shape[1:]), np.float32))
        self._g._state_leaves = [
            self._glob(np.zeros((self.lanes_local,) + tuple(l.shape[1:]),
                                np.asarray(l).dtype))
            for l in self._g._state_leaves
        ]
        self.samples_in = np.zeros(self.lanes_local, np.int64)
        self.samples_out = np.zeros(self.lanes_local, np.int64)
        self._all_fn = jax.jit(jnp.all)

    def _glob(self, local: np.ndarray):
        """Process-local block -> global lane-sharded array (the per-group
        make_array_from_process_local_data ingestion)."""
        local = np.ascontiguousarray(local)
        P = jax.sharding.PartitionSpec
        axes = tuple(self.mesh.axis_names)
        sh = jax.sharding.NamedSharding(
            self.mesh, P(axes, *([None] * (local.ndim - 1))))
        gshape = (self.lanes,) + local.shape[1:]
        return jax.make_array_from_process_local_data(sh, local, gshape)

    # -- ingestion (this process's lanes only) -------------------------------
    def feed(self, local_lane: int, data: bytes | None):
        self._io.feed_lane(local_lane, data)

    def feed_many(self, datas):
        for lane, d in enumerate(datas):
            self._io.feed_lane(lane, d)

    @property
    def local_done(self) -> bool:
        return self._io.exhausted

    def global_done(self) -> bool:
        """True when EVERY process's lanes are exhausted (one tiny jitted
        all-reduce; call in lockstep like step())."""
        flags = np.full(self.lanes_local, self._io.exhausted, bool)
        return bool(self._all_fn(self._glob(flags)))

    # -- the global step -----------------------------------------------------
    def step(self):
        """ONE global sharded dispatch (lockstep across processes). Returns
        (global device chunk, local ready bool[L_local], local positions
        f64[L_local] at chunk start)."""
        st = self._io.stage()
        if st is None:
            staged = np.zeros((self.lanes_local, self._g.in_bytes), np.uint8)
            ready = np.zeros(self.lanes_local, bool)
            consumed = np.zeros(self.lanes_local, np.int64)
        else:
            staged, ready, consumed, _under = st
            staged = np.ascontiguousarray(np.asarray(staged))
        positions = self.samples_in / self._g.spec.sample_rate
        g_bytes = self._glob(staged)
        g_mask = self._glob(ready[:, None])
        fn = self._g._step_fns[(False, False)]
        out, fir, *leaves = fn(g_bytes, g_mask, self._g.fir,
                               *self._g._state_leaves)
        self._g.fir = fir
        self._g._state_leaves = leaves
        self.samples_in += np.where(
            ready, (consumed * self._g.in_samples) // self._g.in_bytes, 0)
        self.samples_out += np.where(ready, self._g.out_samples, 0)
        return out, ready, positions

    def local_rows(self, chunk) -> np.ndarray:
        """Fetch ONLY this process's rows of a global chunk to the host."""
        rows = np.zeros((self.lanes_local,) + chunk.shape[1:], chunk.dtype)
        lo = self.pid * self.lanes_local
        for shard in chunk.addressable_shards:
            s = shard.index[0]
            rows[s.start - lo: s.stop - lo] = np.asarray(shard.data)
        return rows
