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

# -- engine case (VERDICT r4 item 5): the PRODUCTION BatchStreamEngine group,
# lanes split across the two processes. Each process feeds only its own
# lanes; every step is one global sharded dispatch with
# make_array_from_process_local_data ingestion and global carried state.
# Every local row / mask / position must be BIT-identical to the
# single-process engine over the union of the feeds.
from aukit_tpu.stream.batch import BatchStreamEngine, LaneSpec  # noqa: E402

LANES_E, NB = 8, 1500  # 2 chunks/lane -> decoder state carries across steps
spec = LaneSpec("dfpwm", 48000, chunk_bytes=750)
eng = dist.MultiHostEngine(spec, LANES_E, mesh=mesh, use_pallas=False)
all_feed = rng.integers(0, 256, (2 * LANES_E, NB), dtype=np.uint8)
lo = pid * LANES_E
for i in range(LANES_E):
    eng.feed(i, all_feed[lo + i].tobytes())
    eng.feed(i, None)

ref = BatchStreamEngine([spec] * (2 * LANES_E), use_pallas=False)
for i in range(2 * LANES_E):
    ref.feed(i, all_feed[i].tobytes())
    ref.feed(i, None)

steps = 0
while not eng.global_done():
    out, ready, pos = eng.step()
    rr = ref.step()
    assert rr is not None
    rchunk, rmask, rpos = rr
    np.testing.assert_array_equal(eng.local_rows(out),
                                  np.asarray(rchunk)[lo: lo + LANES_E])
    np.testing.assert_array_equal(ready, rmask[lo: lo + LANES_E])
    np.testing.assert_array_equal(pos, rpos[lo: lo + LANES_E])
    steps += 1
assert steps == 2 and ref.step() is None
print(f"DIST_ENGINE_OK {pid}", flush=True)
