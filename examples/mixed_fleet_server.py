"""Example: a mixed-codec decode fleet — DFPWM + WAV/PCM16 + IMA ADPCM + QOA
clients at different sample rates, all through ONE BatchStreamEngine
(SURVEY.md §2.4's multi-stream ingestion axis; the reference's whole
stream-dispatch surface aukit.lua:2992-2996 as engine lanes).

Each tick delivers bursty per-client bytes, the engine emits uniform one-
second int8 windows per lane with per-lane masks and positions.

Run:  python examples/mixed_fleet_server.py [lanes_per_codec] [seconds]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(per_codec: int = 64, duration_s: float = 3.0):
    import aukit_tpu as ak
    from aukit_tpu.stream.batch import BatchStreamEngine, LaneSpec

    rng = np.random.default_rng(0)
    ba = 256
    specs = ([LaneSpec("dfpwm", 48000)] * per_codec
             + [LaneSpec("pcm16", 44100)] * per_codec
             + [LaneSpec("ima", 22050, 1, block_align=ba)] * per_codec
             + [LaneSpec("ulaw", 8000)] * per_codec)
    L = len(specs)

    print(f"synthesizing {L} client streams ({duration_s:.1f}s each)...")
    streams: list[bytes] = []
    for i, spec in enumerate(specs):
        f = float(rng.uniform(110, 1760))
        if spec.codec == "dfpwm":
            streams.append(ak.tone(f, duration_s, 0.6, "sine", sample_rate=48000).dfpwm(True))
        elif spec.codec == "pcm16":
            t = np.arange(int(44100 * duration_s)) / 44100
            streams.append((np.sin(2 * np.pi * f * t) * 20000).astype("<i2").tobytes())
        elif spec.codec == "ima":
            nblocks = int(22050 * duration_s) // ((ba - 4) * 2) + 1
            blocks = bytearray()
            for _b in range(nblocks):
                blocks += int(0).to_bytes(2, "little") + bytes([40, 0])
                blocks += rng.integers(0, 256, ba - 4, dtype=np.uint8).tobytes()
            streams.append(bytes(blocks))
        else:  # ulaw
            streams.append(rng.integers(0, 256, int(8000 * duration_s), dtype=np.uint8).tobytes())

    eng = BatchStreamEngine(specs)
    cursors = [0] * L
    burst = 16384
    emitted = np.zeros(L, np.int64)
    t0 = time.perf_counter()
    ticks = 0
    while not eng.done:
        for lane in range(L):
            if cursors[lane] >= len(streams[lane]):
                continue
            if rng.random() < 0.85:  # jittery delivery
                eng.feed(lane, streams[lane][cursors[lane] : cursors[lane] + burst])
                cursors[lane] += burst
                if cursors[lane] >= len(streams[lane]):
                    eng.feed(lane, None)
        r = eng.step()
        ticks += 1
        if r is None:
            continue
        chunk, mask, pos = r
        emitted += np.where(mask, chunk.shape[1], 0)
    wall = time.perf_counter() - t0
    m = eng.metrics
    print(f"ticks={ticks} windows emitted per lane ~{emitted.mean()/48000:.1f}s "
          f"underruns={m.underruns}")
    print(f"aggregate: {m.samples_decoded / wall / 48000:.0f}x realtime "
          f"({L} concurrent mixed-codec streams, wall {wall:.2f}s)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    main(n, secs)
