"""Example: an internet-radio FLAC fleet — N independent stations drip-feed
FLAC bytes at jittery, realtime-ish rates and ONE FlacFleet decodes them all
with a single batched LPC-restore dispatch per tick (the reference's flagship
network-streaming case, ``aukit.stream.flac`` aukit.lua:3115-3191, batched
across stations per SURVEY.md §2.4's north-star axis).

Each tick: every station delivers whatever bytes "arrived" since the last
tick, the fleet emits one-second f32 windows with per-lane masks/positions,
and starved lanes simply skip the window (no silence is spliced in).

Run:  python examples/flac_radio_fleet.py [stations] [seconds]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _make_station(rng, seconds: int) -> bytes:
    """Synthesize one station's FLAC stream (LPC-coded drifting tone)."""
    from tests import fixtures

    n = 4096
    rate = 48000
    order, shift = 2, 5
    coefs = [63, -31]  # gentle 2-tap predictor
    frames = []
    total = 0
    while total < seconds * rate:
        sig = np.cumsum(rng.integers(-40, 41, n)).astype(np.int64)
        res = list(sig[:order].astype(int))
        for i in range(order, n):
            pred = (int(sig[i - 1]) * coefs[0] + int(sig[i - 2]) * coefs[1]) >> shift
            res.append(int(sig[i]) - pred)
        frames.append(fixtures.flac_frame(
            [{"type": "lpc", "order": order, "warmup": [int(v) for v in sig[:order]],
              "precision": 7, "shift": shift, "coefs": coefs,
              "residuals": res[order:], "param": 6, "partition_order": 0}],
            n, 0, 16, frame_number=len(frames)))
        total += n
    return fixtures.flac_stream_header(rate, 1, 16, total) + b"".join(frames)


def main(stations: int = 64, seconds: int = 6):
    from aukit_tpu.stream.flac_fleet import FlacFleet

    rng = np.random.default_rng(0)
    print(f"synthesizing {stations} FLAC stations ({seconds}s each)...")
    base = [_make_station(rng, seconds) for _ in range(min(stations, 8))]
    feeds = [bytearray(base[i % len(base)]) for i in range(stations)]

    fleet = FlacFleet(stations)
    # a radio feed delivers ~bytes_per_second with jitter; we tick once per
    # simulated second and deliver 0.5-1.5 s of bytes per station
    bps = [len(f) // seconds for f in feeds]
    offs = [0] * stations

    t0 = time.time()
    windows = 0
    while not fleet.done:
        for i in range(stations):
            if offs[i] < len(feeds[i]):
                burst = int(bps[i] * rng.uniform(0.5, 1.5))
                fleet.feed(i, bytes(feeds[i][offs[i]: offs[i] + burst]))
                offs[i] += burst
                if offs[i] >= len(feeds[i]):
                    fleet.feed(i, None)
        r = fleet.step()
        if r is not None:
            window, mask, positions = r
            windows += 1
            live = int(mask.sum())
            print(f"tick {windows:3d}: {live:4d}/{stations} lanes emitted, "
                  f"lead position {positions.max():6.2f}s")
    dt = time.time() - t0
    # metrics count the actual per-lane take (final windows are zero-padded)
    out_samples = fleet.metrics.samples_decoded
    errs = [i for i in range(stations) if fleet.lane_error(i)]
    print(f"\n{out_samples} samples from {stations} stations in {dt:.2f}s "
          f"({out_samples / dt / 48000:.0f}x realtime aggregate); "
          f"{len(errs)} poisoned lanes")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         int(sys.argv[2]) if len(sys.argv) > 2 else 6)
