"""Worker for tests/test_distributed.py: one process of a two-process CPU
"multi-host" group. Runs one sharded pipeline step over per-process lanes and
asserts every LOCAL shard equals the single-process (unsharded) decode of the
same bytes — sharding- and process-invariance (SURVEY.md §4 item 5, §5.8)."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aukit_tpu.codecs.dfpwm import DfpwmState, dfpwm_decode  # noqa: E402
from aukit_tpu.parallel import distributed as dist  # noqa: E402
from aukit_tpu.parallel.pipeline import decode_pipeline_scan  # noqa: E402

LANES, NBYTES = 8, 96
mesh = dist.global_mesh()
assert mesh.devices.size == 4, mesh
step, to_global = dist.multihost_pipeline_step(mesh, LANES, NBYTES)

# every process generates ALL lanes deterministically, ingests only its own
rng = np.random.default_rng(7)
all_bytes = rng.integers(0, 256, (2 * LANES, NBYTES), dtype=np.uint8)
local = all_bytes[pid * LANES : (pid + 1) * LANES]

g_bytes, g_state = to_global(local)
out = jax.block_until_ready(step(g_bytes, *g_state))

# unsharded single-process reference over the full batch
import jax.numpy as jnp  # noqa: E402

ref_out, _ = decode_pipeline_scan(
    jnp.asarray(all_bytes), DfpwmState.zeros(2 * LANES), 48000, normalize_peak=0.9)
ref_np = np.asarray(ref_out)

for shard in out[0].addressable_shards:
    rows = range(shard.index[0].start or 0, shard.index[0].stop or 2 * LANES)
    np.testing.assert_array_equal(np.asarray(shard.data), ref_np[list(rows)])
print(f"DIST_OK {pid}", flush=True)
