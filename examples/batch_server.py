"""Example: a batched decode "server" — many concurrent DFPWM streams through
one device dispatch per tick (the deployment shape SURVEY.md §2.4 targets).

Simulates N clients whose streams arrive in bursts; the engine masks starved
lanes, recycles finished ones, and reports aggregate metrics.

Run:  python examples/batch_server.py [lanes] [seconds]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(lanes: int = 256, duration_s: float = 2.0):
    import aukit_tpu as ak
    from aukit_tpu.stream.batch import BatchDfpwmDecoder

    rng = np.random.default_rng(0)
    chunk_bytes = 6000  # 1 s of 48 kHz audio per lane per tick

    # synthesize per-client DFPWM content (a tone per client)
    print(f"encoding {lanes} client streams ({duration_s:.1f}s each)...")
    freqs = rng.uniform(100, 2000, lanes)
    streams = []
    for i in range(lanes):
        a = ak.tone(float(freqs[i]), duration_s, 0.6, "sine", sample_rate=48000)
        streams.append(a.dfpwm(True))

    eng = BatchDfpwmDecoder(lanes, 48000, chunk_bytes=chunk_bytes)
    cursors = [0] * lanes
    sinks = [0] * lanes  # decoded sample counters
    t0 = time.perf_counter()
    tick = 0
    while not eng.done:
        # bursty ingestion: each tick, a random subset of clients delivers data
        for lane in range(lanes):
            if cursors[lane] >= len(streams[lane]):
                continue
            if rng.random() < 0.8:  # 20% of lanes starve this tick (jitter)
                n = chunk_bytes * int(rng.integers(1, 3))
                eng.feed(lane, streams[lane][cursors[lane] : cursors[lane] + n])
                cursors[lane] += n
                if cursors[lane] >= len(streams[lane]):
                    eng.feed(lane, None)
        r = eng.step()
        tick += 1
        if r is None:
            continue
        chunk, mask, _pos = r
        for lane in np.nonzero(mask)[0]:
            sinks[lane] += chunk.shape[1]
    wall = time.perf_counter() - t0
    m = eng.metrics
    print(f"ticks={tick} decoded={m.samples_decoded/1e6:.1f}M samples "
          f"underrun_ticks={m.underruns}")
    print(f"aggregate: {m.samples_decoded / wall / 48000:.0f}x realtime "
          f"({lanes} concurrent streams, wall {wall:.2f}s)")


if __name__ == "__main__":
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    main(lanes, secs)
