"""Generate the frozen golden-vector corpus (tests/golden/golden.npz).

Run once (python tests/make_golden.py) and commit the artifact. The vectors
freeze the integer-codec semantics — especially the DFPWM1a spec, whose
bit-exact oracle (CC:Tweaked) is unreachable from this environment — so any
future change to either the framework or the loop reference models that shifts
decode output fails tests/test_golden.py loudly.
"""

from __future__ import annotations

import os

import numpy as np


def build_corpus() -> dict:
    from tests.ref import codecs as refc
    from tests import fixtures

    rng = np.random.default_rng(0xA0D10)
    corpus: dict[str, np.ndarray] = {}

    dfpwm_in = rng.integers(0, 256, 4000, dtype=np.uint8)
    corpus["dfpwm_in"] = dfpwm_in
    corpus["dfpwm_out"] = np.asarray(refc.dfpwm_decode_ref(dfpwm_in.tobytes()), np.int32)
    levels = rng.integers(-128, 128, 4000 * 8).astype(np.int32)
    corpus["dfpwm_enc_in"] = levels
    corpus["dfpwm_enc_out"] = np.frombuffer(refc.dfpwm_encode_ref(levels.tolist()), np.uint8)

    g711_in = rng.integers(0, 256, 2048, dtype=np.uint8)
    corpus["g711_in"] = g711_in
    corpus["g711_ulaw_out"] = refc.g711_ref(g711_in.tobytes(), True, 1)[0]
    corpus["g711_alaw_out"] = refc.g711_ref(g711_in.tobytes(), False, 1)[0]

    ima_in = rng.integers(0, 256, 2000, dtype=np.uint8)
    corpus["ima_in"] = ima_in
    corpus["ima_out"] = np.asarray(
        refc.ima_ref(refc.nibbles_from_bytes(ima_in.tobytes(), True), 123, 17), np.int32
    )

    sig = np.stack([
        (np.sin(np.arange(4096) / 23) * 11000).astype(np.int64),
        (np.cos(np.arange(4096) / 31) * 8000).astype(np.int64),
    ])
    ms_in = fixtures.ms_encode(sig, 256)
    corpus["ms_in"] = np.frombuffer(ms_in, np.uint8)
    corpus["ms_out"] = refc.msadpcm_ref(ms_in, 256, 2).astype(np.int32)

    qoa_in = fixtures.qoa_stream(rng, 2, 44100, [5120, 700]) + b"\x00" * 8
    corpus["qoa_in"] = np.frombuffer(qoa_in, np.uint8)
    corpus["qoa_out"] = refc.qoa_ref(qoa_in)[0].astype(np.int32)

    return corpus


def main():
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "golden.npz")
    np.savez_compressed(path, **build_corpus())
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
