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
