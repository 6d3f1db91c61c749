"""Headline benchmark: batched DFPWM -> 48 kHz PCM decode throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the north-star target of 10,000x realtime
per chip (BASELINE.json; the Lua reference publishes no numbers and runs in a
single-threaded interpreter at roughly realtime scale)."""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    from aukit_tpu.kernels import dfpwm_pallas as kp
    from aukit_tpu.codecs.dfpwm import DfpwmState, dfpwm_decode

    # NOTE on methodology: this environment's remote TPU backend can elide or
    # cache executions whose results are never fetched, so every iteration
    # chains the decoder state (streaming pattern: unique inputs) and fetches a
    # dependent scalar, forcing real device execution.
    @jax.jit
    def _force(o):
        return jnp.sum(o.astype(jnp.int32))

    rng = np.random.default_rng(0)
    if backend == "tpu":
        # production path: Pallas kernel, native [G, B, 32, 128] layout
        G, Bb = 4, 6016  # 16384 streams x ~1s @48kHz
        B = -(-Bb // kp.TIME_TILE) * kp.TIME_TILE
        xs = [jnp.asarray(rng.integers(0, 256, (G, B, 32, 128), dtype=np.uint8)) for _ in range(4)]
        st0 = jnp.zeros((G, 5, 32, 128), jnp.int32)
        nv = jnp.full((1,), B, jnp.int32)

        def run(i, st):
            out, st = kp.dfpwm_decode_grouped(xs[i % 4], st, nv)
            return out, st

        samples = G * kp.GROUP * B * 8
    else:
        # portable path: lax.scan decode
        L, B = 2048, 1500
        xs = [jnp.asarray(rng.integers(0, 256, (L, B), dtype=np.uint8)) for _ in range(2)]
        st0 = DfpwmState.zeros(L)

        def run(i, st):
            return dfpwm_decode(xs[i % 2], st)

        samples = L * B * 8

    out, st = run(0, st0)
    int(_force(out))  # compile + warm both kernels
    iters = 10 if backend == "tpu" else 3
    st = st0
    t0 = time.time()
    for i in range(iters):
        out, st = run(i, st)
        int(_force(out))  # dependent 4-byte fetch forces execution
    dt = (time.time() - t0) / iters

    realtime_x = samples / dt / 48000.0
    print(json.dumps({
        "metric": f"dfpwm_decode_realtime_factor_48k_{backend}",
        "value": round(realtime_x, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(realtime_x / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
