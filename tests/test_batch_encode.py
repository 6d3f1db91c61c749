"""Batched write/transcode path (stream/batch_encode.BatchEncodeEngine) —
VERDICT r4 item 2. The contract under test is BIT-equality with the solo
writers: fleet-encoded bytes equal Audio:dfpwm / Audio:wav / pack_pcm output
over the same samples (aukit.lua:868-1018)."""

import numpy as np
import pytest

import aukit_tpu as ak
from aukit_tpu.stream.batch import BatchStreamEngine, LaneSpec
from aukit_tpu.stream.batch_encode import (BatchEncodeEngine, EncodeSpec,
                                           transcode_fleet)

RNG = np.random.default_rng(123)


def drain(enc):
    outs = [bytearray() for _ in range(enc.lanes)]
    while True:
        r = enc.step()
        if r is None:
            break
        out, nbytes, mask, _pos = r
        host = np.asarray(out)
        for i in np.nonzero(mask)[0]:
            outs[i].extend(host[i, : nbytes[i]].tobytes())
    return [bytes(o) for o in outs]


def glue_all(source, enc):
    return transcode_fleet(source, enc)


def solo_dfpwm(floats):
    """Audio:dfpwm over [C, N] float samples (the solo writer)."""
    a = ak.new_audio(np.atleast_2d(np.asarray(floats, np.float32)), 48000)
    return a.dfpwm(True)


def solo_wav_body(floats, depth, channels=1):
    a = ak.new_audio(np.atleast_2d(np.asarray(floats, np.float32)), 48000)
    return a.to_pcm_bytes(depth, "unsigned" if depth == 8 else "signed",
                          interleaved=True)


def test_encode_engine_dfpwm_matches_solo_writer():
    """Host-fed float lanes -> DFPWM bytes == Audio:dfpwm, chunk-split
    invariant, trailing partials truncated to whole bytes like the solo
    encoder."""
    L = 3
    t = np.arange(48000 * 2 + 40)  # non-multiple-of-8 tail (truncates)
    sigs = [np.sin(t / (17 + 9 * i)) * (0.5 + 0.1 * i) for i in range(L)]
    enc = BatchEncodeEngine([EncodeSpec("dfpwm")] * L, chunk_samples=48000)
    for i, s in enumerate(sigs):
        for off in range(0, len(t), 13337):  # jittery chunk feeds
            enc.feed(i, s[off: off + 13337].astype(np.float32))
        enc.feed(i, None)
    outs = drain(enc)
    for i, s in enumerate(sigs):
        exp = solo_dfpwm(s.astype(np.float32))
        assert outs[i] == exp
    assert enc.done


def test_encode_engine_pcm_all_depths_match_pack():
    """pcm8(unsigned)/16/24/32 lanes == the solo to_pcm_bytes writer
    (encodePCM + pack_pcm numerics, incl. the unsigned-8 bias-then-trunc
    order)."""
    n = 48000
    sig = (np.sin(np.arange(n) / 7.3) * 0.9).astype(np.float32)
    specs = [EncodeSpec("pcm8"), EncodeSpec("pcm16"), EncodeSpec("pcm24"),
             EncodeSpec("pcm32")]
    enc = BatchEncodeEngine(specs, chunk_samples=48000)
    for i in range(4):
        enc.feed(i, sig)
        enc.feed(i, None)
    outs = drain(enc)
    for i, depth in enumerate((8, 16, 24, 32)):
        assert outs[i] == solo_wav_body(sig, depth), f"depth {depth}"


def test_encode_engine_stereo_interleave():
    """Stereo pcm16 and interleaved stereo DFPWM lanes match the solo
    interleaved writers frame-for-frame."""
    n = 48000
    st = np.stack([np.sin(np.arange(n) / 11.0) * 0.7,
                   np.cos(np.arange(n) / 23.0) * 0.6]).astype(np.float32)
    enc = BatchEncodeEngine([EncodeSpec("pcm16", channels=2),
                             EncodeSpec("dfpwm", channels=2)],
                            chunk_samples=48000)
    enc.feed(0, st)
    enc.feed(0, None)
    enc.feed(1, st)
    enc.feed(1, None)
    outs = drain(enc)
    assert outs[0] == solo_wav_body(st, 16, 2)
    assert outs[1] == solo_dfpwm(st)


def test_transcode_wav_fleet_to_dfpwm_bit_equal_solo():
    """N WAV files -> decode engine -> encode engine, device-to-device: each
    lane's DFPWM bytes equal the solo writer over the decode engine's own
    int8 output (int8 windows -> aukit.pcm 8-bit loader -> Audio:dfpwm —
    the LUT's declared parity chain)."""
    from aukit_tpu.stream.batch_codecs import lane_spec_for_wav

    wavs = [ak.tone(200 + 90 * i, 1.2, 0.6, "sine",
                    sample_rate=24000).wav(16) for i in range(3)]
    specs, feeds = [], []
    for w in wavs:
        spec, off, size = lane_spec_for_wav(w)
        specs.append(spec)
        feeds.append(w[off: off + size])
    dec = BatchStreamEngine(specs, windowed=True)
    for i, f in enumerate(feeds):
        dec.feed(i, f)
        dec.feed(i, None)
    # capture the decode windows for the solo reference while transcoding
    solo_samples = [[] for _ in range(3)]
    enc = BatchEncodeEngine([EncodeSpec("dfpwm")] * 3)
    outs = [bytearray() for _ in range(3)]
    while not dec.done:
        r = dec.step()
        if r is None:
            continue
        windows, mask, _ = r
        out, nbytes, m2, _p = enc.encode_windows(windows, mask)
        host_w = np.asarray(windows)
        host_o = np.asarray(out)
        for i in np.nonzero(m2)[0]:
            solo_samples[i].append(host_w[i])
            outs[i].extend(host_o[i, : nbytes[i]].tobytes())
    for i in range(3):
        samples = np.concatenate(solo_samples[i])
        audio = ak.pcm(samples.astype(np.int8).tobytes(), 8, "signed", 1, 48000)
        assert bytes(outs[i]) == audio.dfpwm(True)


def test_transcode_flac_fleet_to_wav16_bit_equal_solo():
    """N FLAC sources -> Fleet -> encode engine: each lane's WAV16 body (and
    the full wrapped WAV file) equals the solo writer over the facade's int8
    windows."""
    from aukit_tpu.stream.fleet import Fleet
    from tests.test_flac_fleet import make_flac

    flacs = [make_flac(48000, 50, seed=40 + i) for i in range(2)]
    fleet = Fleet(flacs)
    enc = BatchEncodeEngine([EncodeSpec("pcm16")] * 2)
    outs = glue_all(fleet, enc)
    fleet2 = Fleet(flacs)
    ref = [[] for _ in range(2)]
    while not fleet2.done:
        r = fleet2.step()
        if r is None:
            continue
        w, m, _ = r
        host = np.asarray(w)
        for i in np.nonzero(m)[0]:
            ref[i].append(host[i])
    for i in range(2):
        samples = np.concatenate(ref[i])
        audio = ak.pcm(samples.astype(np.int8).tobytes(), 8, "signed", 1, 48000)
        body = audio.to_pcm_bytes(16, "signed", interleaved=True)
        assert outs[i] == body
        # wrapped: header + body == the solo Audio:wav file
        from aukit_tpu.containers.wav import pcm_wav_header

        exp = audio.wav(16)
        got = pcm_wav_header(1, 48000, 16, len(outs[i])) + outs[i]
        assert got == exp


def test_encode_engine_mesh_bit_parity():
    """Sharded encode == unsharded encode bit-for-bit (mixed dfpwm + pcm16
    groups whose lane counts do not divide the device count)."""
    from aukit_tpu.parallel.pipeline import make_mesh

    n = 48000
    sigs = [np.sin(np.arange(n) / (5 + 3 * i)) * 0.8 for i in range(3)]
    specs = [EncodeSpec("dfpwm"), EncodeSpec("dfpwm"), EncodeSpec("pcm16")]

    def run(mesh):
        enc = BatchEncodeEngine(specs, chunk_samples=n, mesh=mesh)
        for i, s in enumerate(sigs):
            enc.feed(i, s.astype(np.float32))
            enc.feed(i, None)
        return drain(enc)

    plain, sharded = run(None), run(make_mesh(8))
    assert plain == sharded


def test_encode_engine_checkpoint_resume():
    """A checkpointed DFPWM encode lane restores into a fresh engine and the
    joined bytes equal the uninterrupted run."""
    n = 48000
    sig = (np.sin(np.arange(3 * n) / 9.0) * 0.7).astype(np.float32)
    full_enc = BatchEncodeEngine([EncodeSpec("dfpwm")])
    full_enc.feed(0, sig)
    full_enc.feed(0, None)
    full = drain(full_enc)[0]

    enc = BatchEncodeEngine([EncodeSpec("dfpwm")])
    enc.feed(0, sig[:n])
    r = enc.step()
    head = np.asarray(r[0])[0, : r[1][0]].tobytes()
    ck = enc.checkpoint(0)
    enc2 = BatchEncodeEngine([EncodeSpec("dfpwm")])
    enc2.restore(0, ck)
    enc2.feed(0, sig[n:])
    enc2.feed(0, None)
    tail = drain(enc2)[0]
    assert head + tail == full


def test_encode_engine_gain_lut_vs_float_paths():
    """gain 1.0 rides the bit-exact LUT path; a gained lane uses the f32
    path and tracks the host-computed expectation; ramp moves click-free."""
    dec_win = RNG.integers(-100, 101, (2, 48000), dtype=np.int64).astype(np.int8)
    import jax.numpy as jnp

    enc = BatchEncodeEngine([EncodeSpec("pcm16")] * 2)
    enc.set_volume(1, 0.5)
    out, nbytes, mask, _ = enc.encode_windows(jnp.asarray(dec_win),
                                              np.ones(2, bool))
    host = np.asarray(out)
    # lane 0 (unity): exact LUT == solo writer
    audio = ak.pcm(dec_win[0].tobytes(), 8, "signed", 1, 48000)
    assert host[0, : nbytes[0]].tobytes() == audio.to_pcm_bytes(16, "signed")
    # lane 1 (0.5): f32 path, tracks the f64 reference within 1 LSB
    d = (dec_win[1].astype(np.float64)
         / np.where(dec_win[1] < 0, 128.0, 127.0)) * 0.5
    expv = np.trunc(d * np.where(d < 0, 32768.0, 32767.0)).astype(np.int64)
    got = np.frombuffer(host[1, : nbytes[1]].tobytes(), "<i2").astype(np.int64)
    assert np.abs(got - expv).max() <= 1


def test_encode_engine_masked_lane_state_freeze():
    """A masked (starved) lane's encoder state does not advance: encoding the
    same window later yields the bytes an uninterrupted run yields."""
    import jax.numpy as jnp

    w1 = RNG.integers(-90, 91, (2, 4800), dtype=np.int64).astype(np.int8)
    w2 = RNG.integers(-90, 91, (2, 4800), dtype=np.int64).astype(np.int8)
    enc = BatchEncodeEngine([EncodeSpec("dfpwm")] * 2)
    a1, n1, _, _ = enc.encode_windows(jnp.asarray(w1), np.array([True, False]))
    a2, n2, _, _ = enc.encode_windows(jnp.asarray(w2), np.array([True, True]))
    ref = BatchEncodeEngine([EncodeSpec("dfpwm")] * 1)
    b1, _, _, _ = ref.encode_windows(jnp.asarray(w2[1:]), np.array([True]))
    np.testing.assert_array_equal(np.asarray(a2)[1], np.asarray(b1)[0])


def test_encode_gain_saturates_not_wraps():
    """|gain * sample| > 1 saturates to the target full-scale value instead
    of wrapping two's-complement in the int cast (r5 review finding: 0.9 at
    gain 2.0 packed as pcm16 -6556). Covers the device window-glue gain path
    and the host feed-time gain path."""
    import jax.numpy as jnp

    # device glue path (gained f32 conversion)
    enc = BatchEncodeEngine([EncodeSpec("pcm16")])
    enc.set_volume(0, 2.0)
    win = np.full((1, 256), 115, np.int8)  # ~0.906 normalized
    out, nbytes, mask, _ = enc.encode_windows(jnp.asarray(win), np.array([True]))
    ints = np.frombuffer(np.asarray(out)[0, : nbytes[0]].tobytes(), "<i2")
    assert (ints == 32767).all()
    # negative side clips to the signed minimum
    enc2 = BatchEncodeEngine([EncodeSpec("pcm16")])
    enc2.set_volume(0, 2.0)
    wneg = np.full((1, 256), -115, np.int8)
    out, nbytes, mask, _ = enc2.encode_windows(jnp.asarray(wneg), np.array([True]))
    ints = np.frombuffer(np.asarray(out)[0, : nbytes[0]].tobytes(), "<i2")
    assert (ints == -32768).all()
    # host feed path (instantaneous gain at feed time)
    enc3 = BatchEncodeEngine([EncodeSpec("pcm16")], chunk_samples=256)
    enc3.set_volume(0, 2.0)
    enc3.feed(0, np.full(256, 0.9))
    enc3.feed(0, None)
    out, nbytes, mask, _ = enc3.step()
    ints = np.frombuffer(np.asarray(out)[0, : nbytes[0]].tobytes(), "<i2")
    assert (ints == 32767).all()


def test_encode_windows_positions_chunk_start():
    """encode_windows reports positions at CHUNK START (the decode engines'
    and step()'s convention): the first window reports 0.0, the second 1 x
    window seconds (r5 review finding: glue path was end-of-chunk)."""
    import jax.numpy as jnp

    enc = BatchEncodeEngine([EncodeSpec("dfpwm")])
    win = np.zeros((1, 48000), np.int8)
    _, _, _, pos = enc.encode_windows(jnp.asarray(win), np.array([True]))
    assert pos[0] == 0.0
    _, _, _, pos = enc.encode_windows(jnp.asarray(win), np.array([True]))
    assert pos[0] == 1.0


def test_int8_device_conversion_matches_lut():
    """The gather-free device conversion (int8_to_target_ints_device) is
    bit-equal to the 256-entry ground-truth table for every codec and every
    int8 input (TPU gathers serialize; the arithmetic decomposition replaced
    the jnp.take that cost ~250x the encode kernel in the r5 profile)."""
    import jax
    import jax.numpy as jnp

    from aukit_tpu.stream.batch_encode import (_int8_lut,
                                               int8_to_target_ints_device)

    x = np.arange(-128, 128, dtype=np.int8)
    for codec in ("dfpwm", "pcm8", "pcm16", "pcm24", "pcm32"):
        got = np.asarray(jax.jit(
            lambda v, c=codec: int8_to_target_ints_device(v, c))(jnp.asarray(x)))
        np.testing.assert_array_equal(got, _int8_lut(codec), err_msg=codec)
