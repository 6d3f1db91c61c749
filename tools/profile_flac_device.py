"""Per-op device profile of the fully device-resident FLAC fleet pass.

Reproduces bench.py config 7's device pass (96 drip-fed 48k/16-bit LPC-8
lanes, 20 s each, block 4096) under ``jax.profiler.trace`` and prints the
XLA-Ops plane grouped by op name — the tool that found round 5's relayout
costs (ROUND5.md "FLAC device route profiled"). Run on the TPU backend:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_flac_device.py

Total device ms/pass is the number ROUND5.md quotes (23.4 ms/pass on the
lane-major route; the grouped-residency route of _device_grouped_fn is the
follow-up this measures).
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aukit_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_fixture(lanes=96, seconds=20):
    from tests import fixtures

    rng = np.random.default_rng(0)
    n = 4096
    order, shift, coefs = 8, 9, [120, -60, 30, -15, 8, -4, 2, -1]
    sig = np.cumsum(rng.integers(-60, 60, n)).astype(np.int64)
    res = list(sig[:order].astype(int))
    for i in range(order, n):
        pred = sum(int(sig[i - 1 - j]) * coefs[j] for j in range(order)) >> shift
        res.append(int(sig[i]) - pred)
    one = fixtures.flac_frame(
        [{"type": "lpc", "order": order, "warmup": [int(v) for v in sig[:order]],
          "precision": 8, "shift": shift, "coefs": coefs,
          "residuals": res[order:], "param": 7, "partition_order": 2}], n, 0, 16)
    nfr = seconds * 48000 // n
    data = fixtures.flac_stream_header(48000, 1, 16, nfr * n) + one * nfr
    return data, lanes, nfr * n


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=96)
    ap.add_argument("--seconds", type=int, default=20)
    ap.add_argument("--old-route", action="store_true",
                    help="force the lane-major route via a 1-device mesh "
                         "(the pre-grouped-residency path) for A/B")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (functional smoke run; "
                         "interpret-mode kernels, no XLA-Ops plane)")
    args = ap.parse_args()

    import jax

    if args.cpu:  # must precede backend init — and the aukit import, whose
        # module graph touches the backend (the axon plugin ignores env)
        jax.config.update("jax_platforms", "cpu")
    from aukit_tpu.stream.flac_fleet import FlacFleet

    backend = jax.default_backend()
    data, lanes, samples_per_lane = build_fixture(args.lanes, args.seconds)
    mesh = None
    if args.old_route:
        mesh = jax.sharding.Mesh(
            np.array(jax.devices()[:1]).reshape(1), ("dp",))

    def device_pass():
        fdev = FlacFleet(lanes, device_restore=True, device_dsp=True,
                         mesh=mesh)
        if backend != "tpu":
            fdev._block_iir = "interpret"
        fdev.feed_many([data] * lanes)
        for i in range(lanes):
            fdev.feed(i, None)
        while not fdev.done:
            fdev.step()
        return fdev.metrics.samples_decoded

    print(f"backend={backend}; compiling...", flush=True)
    device_pass()  # compile off-trace
    iters = 2
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            for _ in range(iters):
                device_pass()
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        by_name: dict[str, float] = {}
        tot_ps = 0
        for fp in glob.glob(d + "/**/*.xplane.pb", recursive=True):
            xs = xplane_pb2.XSpace()
            with open(fp, "rb") as fh:
                xs.ParseFromString(fh.read())
            for p in xs.planes:
                if not p.name.startswith("/device:TPU"):
                    continue
                for ln in p.lines:
                    if ln.name != "XLA Ops":
                        continue
                    names = p.event_metadata
                    for ev in ln.events:
                        nm = names[ev.metadata_id].name
                        by_name[nm] = by_name.get(nm, 0.0) + ev.duration_ps
                        tot_ps += ev.duration_ps
        if tot_ps == 0:
            print("no /device:TPU XLA-Ops plane in the trace "
                  "(CPU backend?) — functional smoke only")
            return
        dev_s = tot_ps / 1e12 / iters
        total_samples = lanes * samples_per_lane
        print(f"\ndevice total: {dev_s * 1e3:.2f} ms/pass "
              f"({total_samples / dev_s / 48000:.0f}x realtime device-only)")
        print(f"{'op':60s} {'ms/pass':>10s} {'%':>6s}")
        for nm, ps in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
            ms = ps / 1e9 / iters
            print(f"{nm[:60]:60s} {ms:10.3f} {100 * ps / tot_ps:6.1f}")


if __name__ == "__main__":
    main()
