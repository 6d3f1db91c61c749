"""Batched multi-stream engine: lane isolation, state carry, checkpoint, sharding."""

import numpy as np
import pytest
import jax

import aukit_tpu as ak
from aukit_tpu.stream.batch import BatchDfpwmDecoder
from tests.ref.codecs import dfpwm_decode_ref

RNG = np.random.default_rng(77)


def fir_48k(dec):
    """48k->48k DSP: identity resample + FIR + int8 (dsp_chain semantics)."""
    import math

    s = np.asarray(dec, np.float64)
    s = s / np.where(s < 0, 128.0, 127.0)
    a = 1.0 - math.exp(-0.5 * 2 * math.pi)
    prev = np.concatenate([[0.0], s[:-1]])
    out = prev + a * (s - prev)
    out = out * np.where(out < 0, 128.0, 127.0)
    return np.clip(out, -128, 127).astype(np.int8)


def test_batch_matches_single_stream():
    lanes = 3
    streams = [bytes(RNG.integers(0, 256, 6000 * 2, dtype=np.uint8)) for _ in range(lanes)]
    eng = BatchDfpwmDecoder(lanes, 48000, chunk_bytes=6000)
    for i, s in enumerate(streams):
        eng.feed(i, s)
        eng.feed(i, None)
    outs = [[] for _ in range(lanes)]
    while True:
        r = eng.step()
        if r is None:
            break
        chunk, mask, pos = r
        for i in range(lanes):
            if mask[i]:
                outs[i].append(np.asarray(chunk[i]))
    for i, s in enumerate(streams):
        got = np.concatenate(outs[i])
        # FIR state carries across chunks on-device: compare whole stream
        exp = fir_48k(dfpwm_decode_ref(s))
        np.testing.assert_array_equal(got, exp)
    assert eng.done
    assert eng.metrics.samples_decoded == lanes * 6000 * 2 * 8
    assert eng.metrics.realtime_factor > 0


def test_batch_lane_isolation_and_staggered_eof():
    """A starved lane must not stall others; lanes end independently."""
    eng = BatchDfpwmDecoder(3, 48000, chunk_bytes=600)
    a = bytes(RNG.integers(0, 256, 1200, dtype=np.uint8))
    b = bytes(RNG.integers(0, 256, 600, dtype=np.uint8))
    eng.feed(0, a)
    eng.feed(0, None)
    eng.feed(1, b)
    eng.feed(1, None)
    # lane 2: never fed, never EOF -> underrun but no stall
    r1 = eng.step()
    assert r1 is not None
    _, m1, p1 = r1
    assert list(m1) == [True, True, False]
    assert p1[0] == 0.0
    r2 = eng.step()
    _, m2, p2 = r2
    assert list(m2) == [True, False, False]
    assert p2[0] == 600 * 8 / 48000
    eng.feed(2, None)
    assert eng.step() is None
    assert eng.metrics.underruns >= 2


def test_batch_checkpoint_resume():
    stream = bytes(RNG.integers(0, 256, 6000 * 3, dtype=np.uint8))
    eng = BatchDfpwmDecoder(2, 48000, chunk_bytes=6000)
    eng.feed(0, stream)
    eng.feed(0, None)
    eng.feed(1, stream)
    eng.feed(1, None)
    c1, _, _ = eng.step()
    ckpt = eng.checkpoint(0)
    assert ckpt["byte_offset"] == 6000
    c2, _, _ = eng.step()
    # new engine, restore lane 0 from checkpoint, replay from byte_offset
    eng2 = BatchDfpwmDecoder(2, 48000, chunk_bytes=6000)
    eng2.restore(0, {**ckpt, "pending": stream[ckpt["byte_offset"]:], "eof": True})
    r1, m, _ = eng2.step()
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(c2[0]))


def test_batch_partial_tail():
    stream = bytes(RNG.integers(0, 256, 700, dtype=np.uint8))
    eng = BatchDfpwmDecoder(1, 48000, chunk_bytes=600)
    eng.feed(0, stream)
    eng.feed(0, None)
    c1, m1, _ = eng.step()
    c2, m2, _ = eng.step()
    assert m1[0] and m2[0]
    assert eng.step() is None
    exp = fir_48k(dfpwm_decode_ref(stream + b"\x00" * 500))  # zero-padded tail
    got = np.concatenate([np.asarray(c1[0]), np.asarray(c2[0])])
    np.testing.assert_array_equal(got[: 600 * 8], exp[: 600 * 8])


def test_batch_sharded_over_mesh():
    from aukit_tpu.parallel.pipeline import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(8)
    lanes = 16
    eng = BatchDfpwmDecoder(lanes, 48000, chunk_bytes=750, mesh=mesh)
    streams = [bytes(RNG.integers(0, 256, 750, dtype=np.uint8)) for _ in range(lanes)]
    for i, s in enumerate(streams):
        eng.feed(i, s)
        eng.feed(i, None)
    chunk, mask, _ = eng.step()
    assert mask.all()
    for i in (0, 7, 15):
        exp = fir_48k(dfpwm_decode_ref(streams[i]))
        np.testing.assert_array_equal(np.asarray(chunk[i]), exp)


def test_batch_g711_and_pcm8_codecs():
    from tests.ref.codecs import g711_ref

    data = bytes(RNG.integers(0, 256, 8000, dtype=np.uint8))
    eng = BatchDfpwmDecoder(2, 8000, chunk_bytes=8000, codec="ulaw")
    eng.feed(0, data)
    eng.feed(0, None)
    eng.feed(1, None)
    chunk, mask, pos = eng.step()
    assert list(mask) == [True, False]
    assert chunk.shape[1] == 48000  # 8k -> 48k resample
    # pcm8 passthrough at 48k: FIR of the normalized signed bytes
    raw = bytes(RNG.integers(0, 256, 4800, dtype=np.uint8))
    eng2 = BatchDfpwmDecoder(1, 48000, chunk_bytes=4800, codec="pcm8")
    eng2.feed(0, raw)
    eng2.feed(0, None)
    c2, m2, _ = eng2.step()
    assert m2[0] and c2.shape[1] == 4800
