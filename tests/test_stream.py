"""Streaming pipeline parity: ChunkResampler / stream.* vs the loop model."""

import numpy as np
import pytest

import aukit_tpu as ak
from aukit_tpu.config import CONFIG

from tests import fixtures
from tests.ref import codecs as refc
from tests.ref.stream import stream_pcm_ref

RNG = np.random.default_rng(123)


def collect(it):
    out = []
    for chunk, pos in it:
        out.append((np.asarray(chunk), pos))
    return out


# NOTE: rates above 48000 are excluded: the reference's lazy-read table hands
# *consecutive* samples to sparse indices, so downsampling never decimates and
# plays at the wrong speed (quirk Q18) — the framework implements true
# decimation instead (see test_stream_pcm_downsample_fixed).
@pytest.mark.parametrize("rate", [48000, 44100, 24000, 8000, 32000])
@pytest.mark.parametrize("mode", ["linear", "none", "cubic"])
def test_stream_pcm_parity(rate, mode):
    old = CONFIG.default_interpolation
    CONFIG.default_interpolation = mode
    try:
        n = int(rate * 2.35)  # ~2.35 s -> multiple chunks + partial tail
        vals = (RNG.random(n) * 2 - 1).astype(np.float32).astype(np.float64)
        raw = np.clip(np.round(vals * 32767), -32768, 32767).astype("<i2")
        norm = np.where(raw < 0, raw / 32768.0, raw / 32767.0).astype(np.float32).astype(np.float64)
        it, length = ak.stream.pcm(raw.tobytes(), 16, "signed", 1, rate)
        got = collect(it)
        ref = list(stream_pcm_ref(list(norm), 1, rate, mode=mode))
        assert len(got) == len(ref), (len(got), len(ref))
        assert abs(length - n / rate) < 1e-9
        for (gc, gp), (rc, rp) in zip(got, ref):
            assert gp == rp
            assert gc.shape[1] == len(rc[0])
            np.testing.assert_allclose(gc[0], np.array(rc[0], np.float32), atol=2e-4)
    finally:
        CONFIG.default_interpolation = old


def test_stream_pcm_sinc_parity():
    """Sinc mode: window history carry + forward-tap consumption vs the loop
    model (short input: the model is O(61) per sample)."""
    old = CONFIG.default_interpolation
    CONFIG.default_interpolation = "sinc"
    try:
        rate = 32000
        n = int(rate * 1.6)
        vals = (RNG.random(n) * 2 - 1) * 0.7
        raw = np.clip(np.round(vals * 32767), -32768, 32767).astype("<i2")
        norm = np.where(raw < 0, raw / 32768.0, raw / 32767.0).astype(np.float32).astype(np.float64)
        it, _ = ak.stream.pcm(raw.tobytes(), 16, "signed", 1, rate)
        got = collect(it)
        ref = list(stream_pcm_ref(list(norm), 1, rate, mode="sinc"))
        assert len(got) == len(ref)
        for (gc, gp), (rc, rp) in zip(got, ref):
            assert gp == rp and gc.shape[1] == len(rc[0])
            np.testing.assert_allclose(gc[0], np.array(rc[0], np.float32), atol=5e-5)
    finally:
        CONFIG.default_interpolation = old


def test_stream_pcm_downsample_fixed():
    """96 kHz -> 48 kHz decimates by 2 (reference quirk Q18 fixed)."""
    import math

    rate = 96000
    n = rate * 2  # 2 s in, 1 s out per chunk -> 2 chunks
    raw = RNG.integers(-20000, 20000, n).astype("<i2")
    it, _ = ak.stream.pcm(raw.tobytes(), 16, "signed", 1, rate)
    got = collect(it)
    norm = np.where(raw < 0, raw / 32768.0, raw / 32767.0).astype(np.float64)
    # per-chunk consumption M = 95999 (the last even index is never touched),
    # so each chunk decimates from its own base — the replicated per-chunk
    # phase reset produces one extra output overall
    M = 95999
    s = []
    base = 0
    for chunk, _ in got:
        for j in range(chunk.shape[1]):
            s.append(norm[base + 2 * j])
        base += M
    s = np.array(s)
    assert len(s) == n // 2 + 1
    alpha = 1.0 - math.exp(-(rate / 96000) * 2 * math.pi)
    prev = np.concatenate([[0.0], s[:-1]])
    out = prev + alpha * (s - prev)
    exp = np.clip(out * np.where(out < 0, 128.0, 127.0), -128, 127)
    flat = np.concatenate([c[0] for c, _ in got])
    np.testing.assert_allclose(flat, exp.astype(np.float32), atol=2e-4)


def test_stream_pcm_stereo_and_mono_mix():
    rate = 32000
    n = rate  # 1 s
    vals = (RNG.random(n * 2) * 2 - 1) * 0.9
    raw = np.clip(np.round(vals * 32767), -32768, 32767).astype("<i2")
    norm = np.where(raw < 0, raw / 32768.0, raw / 32767.0).astype(np.float32).astype(np.float64)
    for mono in (False, True):
        it, _ = ak.stream.pcm(raw.tobytes(), 16, "signed", 2, rate, False, mono)
        got = collect(it)
        ref = list(stream_pcm_ref(list(norm), 2, rate, mono=mono))
        assert len(got) == len(ref)
        for (gc, gp), (rc, rp) in zip(got, ref):
            assert gc.shape[0] == len(rc)
            for c in range(gc.shape[0]):
                np.testing.assert_allclose(gc[c], np.array(rc[c], np.float32), atol=2e-4)


def test_stream_pcm_quirk_q9_reseed():
    CONFIG.compat_quirks = True
    try:
        rate = 24000
        vals = (RNG.random(rate * 2) * 2 - 1) * 0.5
        raw = np.clip(np.round(vals * 32767), -32768, 32767).astype("<i2")
        norm = np.where(raw < 0, raw / 32768.0, raw / 32767.0).astype(np.float32).astype(np.float64)
        it, _ = ak.stream.pcm(raw.tobytes(), 16, "signed", 1, rate)
        got = collect(it)
        ref = list(stream_pcm_ref(list(norm), 1, rate, quirk_q9=True))
        for (gc, _), (rc, _) in zip(got, ref):
            np.testing.assert_allclose(gc[0], np.array(rc[0], np.float32), atol=2e-4)
    finally:
        CONFIG.compat_quirks = False


def test_stream_pcm_function_source():
    rate = 48000
    raw = np.clip(RNG.integers(-1000, 1000, rate * 2), -32768, 32767).astype("<i2").tobytes()
    chunks = [raw[i : i + 9973] for i in range(0, len(raw), 9973)]
    feed = iter(chunks)
    it, _ = ak.stream.pcm(lambda: next(feed, None), 16, "signed", 1, rate)
    got = collect(it)
    it2, _ = ak.stream.pcm(raw, 16, "signed", 1, rate)
    whole = collect(it2)
    assert len(got) == len(whole)
    for (a, _), (b, _) in zip(got, whole):
        np.testing.assert_array_equal(a, b)


def test_stream_dfpwm_mono_rate48k():
    data = RNG.integers(0, 256, 6000 * 2 + 1234, dtype=np.uint8).tobytes()
    it, length = ak.stream.dfpwm(data, 48000, 1)
    got = collect(it)
    assert abs(length - len(data) * 8 / 48000) < 1e-9
    # 48k -> 48k, linear: x integer everywhere -> passthrough of decoded bytes
    ref = refc.dfpwm_decode_ref(data)
    flat = np.concatenate([c[0] for c, _ in got])
    np.testing.assert_array_equal(flat, np.array(ref, np.float32))
    # positions: bytes*8/rate
    assert got[0][1] == 0.0
    assert got[1][1] == 6000 * 8 / 48000


def test_stream_dfpwm_resampled():
    data = RNG.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    it, _ = ak.stream.dfpwm(data, 24000, 1)
    (chunk, pos), = collect(it)
    dec = refc.dfpwm_decode_ref(data)
    # per-block resample with 1-sample history (audio[0]=0 first block)
    ext = [0.0] + [float(v) for v in dec]
    out = []
    from fractions import Fraction

    for i in range(1, len(dec) * 2 + 1):
        x = Fraction((i - 1), 2) + 1
        if x.denominator == 1:
            out.append(ext[int(x)])
        else:
            a, b = ext[int(x)], ext[min(int(x) + 1, len(ext) - 1)]
            v = a + (b - a) * 0.5
            out.append(max(-128.0, min(127.0, v)))
    np.testing.assert_allclose(chunk[0], np.array(out, np.float32), atol=1e-4)


def test_stream_g711():
    data = bytes(RNG.integers(0, 256, 8000 * 2 + 777, dtype=np.uint8))
    it, length = ak.stream.g711(data, True, 1, 8000)
    got = collect(it)
    assert abs(length - len(data) / 8000) < 1e-9
    # output sample count: floor(n*6) per second-block
    total = sum(c.shape[1] for c, _ in got)
    assert total == 8000 * 6 + 8000 * 6 + 777 * 6
    # spot-check first block against direct expand+resample
    lut = refc.g711_ref(data[:8000], True, 1, denom=0x40)[0]
    from aukit_tpu.stream.engine import lua_block_resample

    ext = np.concatenate([np.zeros((1, 30)), lut[None, :]], axis=1)
    exp = lua_block_resample(ext, 0, 8000, 8000, 48000, "linear", hist=30)
    exp = np.clip(np.floor(exp), -128, 127)
    np.testing.assert_array_equal(got[0][0], exp.astype(np.float32))


def test_stream_adpcm_blocks():
    payload = fixtures.ima_wav_blocks(RNG, 5, 256, 2)
    it, length = ak.stream.adpcm(payload, 256, 2, 24000)
    got = collect(it)
    spb = (256 - 8) * 2 // 2
    assert abs(length - len(payload) / 256 * spb / 24000) < 1e-9
    total = sum(c.shape[1] for c, _ in got)
    assert total == 5 * (spb * 2)  # ratio 2
    assert got[0][0].shape[0] == 2


def test_stream_msadpcm():
    sig = np.stack([(np.sin(np.arange(8192) / 21) * 10000).astype(np.int64)] * 2)
    payload = fixtures.ms_encode(sig, 256)
    it, _ = ak.stream.msadpcm(payload, 256, 2, 24000)
    got = collect(it)
    assert got, "no chunks"
    # block outputs are floor'd int8-scale values
    allv = np.concatenate([c.reshape(-1) for c, _ in got])
    assert np.all(allv == np.floor(allv))
    assert allv.min() >= -128 and allv.max() <= 127
    # mono mixdown fixed semantics: floor(mean)
    it2, _ = ak.stream.msadpcm(payload, 256, 2, 24000, mono=True)
    got2 = collect(it2)
    assert got2[0][0].shape[0] == 1


def test_stream_wav_dispatch_matches_direct():
    sig = RNG.integers(-3000, 3000, (2, 44100))
    w = fixtures.wav_pcm(sig, 44100, 16)
    it, length = ak.stream.wav(w)
    got = collect(it)
    payload = sig.T.reshape(-1).astype("<i2").tobytes()
    it2, _ = ak.stream.pcm(payload, 16, "signed", 2, 44100, False, False)
    direct = collect(it2)
    assert len(got) == len(direct)
    for (a, ap), (b, bp) in zip(got, direct):
        np.testing.assert_array_equal(a, b)
        assert ap == bp


def test_stream_aiff_dispatch():
    sig = RNG.integers(-3000, 3000, (2, 24000))
    payload = sig.T.reshape(-1).astype(">i2").tobytes()
    f = fixtures.aiff_file(payload, 2, 24000, 16)
    it, length = ak.stream.aiff(f)
    got = collect(it)
    assert abs(length - 1.0) < 1e-9
    it2, _ = ak.stream.pcm(payload, 16, "signed", 2, 24000, True, False)
    direct = collect(it2)
    for (a, ap), (b, bp) in zip(got, direct):
        np.testing.assert_array_equal(a, b)
        assert ap == bp


def test_stream_au_dispatch():
    sig = RNG.integers(-3000, 3000, 16000)
    payload = sig.astype(">i2").tobytes()
    f = fixtures.au_file(payload, 3, 16000, 1)
    it, length = ak.stream.au(f)
    got = collect(it)
    assert abs(length - 1.0) < 1e-9
    it2, _ = ak.stream.pcm(payload, 16, "signed", 1, 16000, True, False)
    direct = collect(it2)
    assert len(got) == len(direct)
    for (a, _), (b, _) in zip(got, direct):
        np.testing.assert_array_equal(a, b)


def test_stream_wav_ima_and_dfpwm_dispatch():
    payload = fixtures.ima_wav_blocks(RNG, 3, 256, 2)
    w = fixtures.wav_ima(payload, 24000, 2, 256)
    it, _ = ak.stream.wav(w)
    direct, _ = ak.stream.adpcm(payload, 256, 2, 24000)
    for a, b in zip(collect(it), collect(direct)):
        np.testing.assert_array_equal(a[0], b[0])
    # DFPWM-in-WAV via the extensible container written by Audio.wav(1)
    tone = ak.tone(300, 0.25, 0.4, sample_rate=48000)
    w2 = tone.wav(1)
    it2, length2 = ak.stream.wav(w2)
    direct2, _ = ak.stream.dfpwm(tone.dfpwm(True), 48000, 1)
    got = collect(it2)
    exp = collect(direct2)
    assert len(got) == len(exp) and abs(length2 - 0.25) < 1e-9
    for a, b in zip(got, exp):
        np.testing.assert_array_equal(a[0], b[0])


def test_stream_wav_ignore_header_resync():
    """Mid-stream RIFF headers are stripped when ignore_header=True
    (looping net-radio feeds, aukit.lua:2984-2990)."""
    sig = RNG.integers(-2000, 2000, (1, 48000)).astype(np.int64)
    w = fixtures.wav_pcm(sig, 48000, 16)
    # source function yields the file twice back-to-back
    feed = [w, w]

    def fn():
        return feed.pop(0) if feed else None

    it, _ = ak.stream.wav(fn, ignore_header=True)
    total = sum(c.shape[1] for c, _p in collect(it))
    assert total == 2 * 48000  # both payloads decoded, header stripped


def test_stream_flac():
    n = 4096
    vals = RNG.integers(-(1 << 14), 1 << 14, n).tolist()
    frames = fixtures.flac_frame([{"type": "verbatim", "values": vals}], n, 0, 16)
    data = fixtures.flac_stream_header(48000, 1, 16, n) + frames
    it, length = ak.stream.flac(data)
    got = collect(it)
    assert abs(length - n / 48000) < 1e-9
    total = sum(c.shape[1] for c, _ in got)
    assert total == n  # 48k -> 48k
    # values: x integer passthrough, then IIR lowpass, scale within int8 range
    flat = np.concatenate([c[0] for c, _ in got])
    assert flat.min() >= -128 and flat.max() <= 127


def test_stream_qoa():
    # NOTE: the reference's frame-size validity check requires 8 slack bytes
    # beyond the frame, so a file ending exactly at the last frame drops it
    # (quirk Q19, aukit.lua:1733/3270 — replicated). Pad 8 bytes to keep all.
    data = fixtures.qoa_stream(RNG, 2, 48000, [5120, 3000]) + b"\x00" * 8
    it, length = ak.stream.qoa(data)
    got = collect(it)
    assert abs(length - 8120 / 48000) < 1e-9
    total = sum(c.shape[1] for c, _ in got)
    assert total == 8120
    ref, _, _ = refc.qoa_ref(data)
    int8 = np.floor(ref / 256.0)
    # IIR lowpass applied at 48k->48k: y_i = y_{i-1} + a*(x_i - y_{i-1})
    import math

    a = 1.0 - math.exp(-(48000 / 96000) * 2 * math.pi)
    y = np.zeros(2)
    exp = np.zeros_like(int8, dtype=np.float64)
    for i in range(int8.shape[1]):
        y = y + a * (int8[:, i] - y)
        exp[:, i] = y
    flat = np.concatenate([c for c, _ in got], axis=1)
    np.testing.assert_allclose(flat, exp.astype(np.float32), atol=2e-3)


def test_stream_mdfpwm():
    left = bytes(RNG.integers(0, 256, 12000, dtype=np.uint8))
    right = bytes(RNG.integers(0, 256, 12000, dtype=np.uint8))
    f = fixtures.mdfpwm_file(left, right, 24000)
    it, length = ak.stream.mdfpwm(f)
    got = collect(it)
    assert length == 2.0
    total = sum(c.shape[1] for c, _ in got)
    assert total == 96000
    refl = refc.dfpwm_decode_ref(left)
    flat = np.concatenate([c[0] for c, _ in got])
    np.testing.assert_array_equal(flat, np.array(refl, np.float32))
    assert got[1][1] == 1.0  # position in seconds (p/12000)


def test_play_split_rule_and_backpressure():
    # a 2.5-second chunk must be split into 48000-sample pieces
    big = np.zeros((1, 120000), np.float32)
    sink = ak.playback.BufferSink()
    ak.play(iter([(big, 0.0)]), sink)
    sizes = [c.shape[-1] for c in sink.chunks]
    assert sizes == [48000, 48000, 24000]


def test_player_pause_seek():
    import time

    chunks = [(np.full((1, 48000), float(i), np.float32), float(i)) for i in range(3)]
    sink = ak.playback.BufferSink()
    p = ak.player(iter(chunks), sink)
    deadline = time.time() + 10
    while time.time() < deadline and len(sink.samples()) < 3 * 48000:
        time.sleep(0.01)
    p.stop()
    out = sink.samples()
    assert len(out) == 3 * 48000
    assert out[0] == 0 and out[-1] == 2


def test_player_windows_span_chunk_boundaries():
    """The chunk-list decoded buffer (O(1) appends, VERDICT r2 item 7) must
    reassemble 48000-sample play windows across chunk boundaries exactly."""
    import time

    n, total = 12345, 12345 * 9  # windows never align with chunk edges
    ramp = (np.arange(total) % 101 - 50).astype(np.float32)  # int8-safe values
    chunks = [(ramp[None, i : i + n], i / 48000.0) for i in range(0, total, n)]
    sink = ak.playback.BufferSink()
    p = ak.player(iter(chunks), sink)
    deadline = time.time() + 10
    while time.time() < deadline and len(sink.samples()) < total:
        time.sleep(0.01)
    p.stop()
    np.testing.assert_array_equal(sink.samples(), ramp)


def test_chunk_resampler_checkpoint_roundtrip():
    from aukit_tpu.stream.engine import ChunkResampler

    rate = 32000
    data = (RNG.random((1, int(rate * 2.2))) * 2 - 1) * 0.8
    a = ChunkResampler(rate, 1)
    c1 = a.process(data[:, : a.samples_needed])
    state = a.get_state()
    pos = a.samples_needed  # consumed so far (first chunk may differ)
    # continue on a fresh engine from the checkpoint
    b = ChunkResampler(rate, 1)
    b.set_state(state)
    n2 = b.samples_needed
    ca = a.process(data[:, pos : pos + a.samples_needed])
    cb = b.process(data[:, pos : pos + n2])
    np.testing.assert_array_equal(ca[0], cb[0])
    assert ca[1] == cb[1]


def test_play_multi_sink_channel_fanout():
    left = np.full((1, 1000), 10.0, np.float32)
    right = np.full((1, 1000), -20.0, np.float32)
    chunk = np.concatenate([left, right], axis=0)
    s1, s2, s3 = (ak.playback.BufferSink() for _ in range(3))
    ak.play(iter([(chunk, 0.0)]), s1, s2, s3)
    assert s1.samples()[0] == 10 and s2.samples()[0] == -20
    # extra sinks fall back to channel 1 (aukit.lua:1935)
    assert s3.samples()[0] == 10


def test_stream_flac_incremental_drip_fed():
    """A function source drip-feeding 4 KB chunks must decode identically to
    the whole-buffer path WITH bounded buffering (VERDICT r1 item 5;
    reference lazy byte table aukit.lua:3128-3144)."""
    n = 4096
    vals = RNG.integers(-(1 << 14), 1 << 14, n).tolist()
    frame = fixtures.flac_frame([{"type": "verbatim", "values": vals}], n, 0, 16)
    data = fixtures.flac_stream_header(48000, 1, 16, 24 * n) + frame * 24

    whole_it, _ = ak.stream.flac(data)
    whole = np.concatenate([c for c, _ in collect(whole_it)], axis=1)

    pos = 0
    pulls = []

    def drip():
        nonlocal pos
        if pos >= len(data):
            return None
        chunk = data[pos : pos + 4096]
        pos += len(chunk)
        pulls.append(len(chunk))
        return chunk

    it, _ = ak.stream.flac(drip)
    first = next(iter(it))  # first chunk must arrive before the whole file fed
    fed_at_first = sum(pulls)
    assert fed_at_first < len(data), "stream.flac buffered the entire source"
    rest = [c for c, _ in collect(it)]
    got = np.concatenate([first[0]] + rest, axis=1)
    np.testing.assert_array_equal(got, whole)


def test_stream_qoa_incremental_drip_fed():
    data = fixtures.qoa_stream(RNG, 2, 48000, [5120] * 20) + b"\x00" * 8
    whole_it, _ = ak.stream.qoa(data)
    whole = np.concatenate([c for c, _ in collect(whole_it)], axis=1)

    pos = 0
    pulls = []

    def drip():
        nonlocal pos
        if pos >= len(data):
            return None
        chunk = data[pos : pos + 4096]
        pos += len(chunk)
        pulls.append(len(chunk))
        return chunk

    it, _ = ak.stream.qoa(drip)
    first = next(iter(it))
    assert sum(pulls) < len(data), "stream.qoa buffered the entire source"
    rest = [c for c, _ in collect(it)]
    got = np.concatenate([first[0]] + rest, axis=1)
    np.testing.assert_array_equal(got, whole)


def test_stream_flac_incremental_garbage_mid_stream_ends():
    """A parse error mid-feed ends the stream leniently after bounded
    buffering (reference pcall-to-EOF semantics)."""
    n = 1024
    vals = RNG.integers(-(1 << 10), 1 << 10, n).tolist()
    frame = fixtures.flac_frame([{"type": "verbatim", "values": vals}], n, 0, 16)
    data = fixtures.flac_stream_header(48000, 1, 16, 2 * n) + frame + b"\x00\x01" * 600 + frame

    feed = [data[:2048], data[2048:]]
    it, _ = ak.stream.flac(lambda: feed.pop(0) if feed else None)
    total = sum(c.shape[1] for c, _ in collect(it))
    assert total == n  # first frame decoded; garbage ended the stream


def test_chunk_resampler_device_path_matches_host():
    """ChunkResampler routes jax-array inputs through the fused device graph
    (VERDICT r1 item 6); output must match the numpy f64 oracle to f32
    tolerance across chunk boundaries, all four interp modes."""
    import jax.numpy as jnp
    from aukit_tpu.stream.engine import ChunkResampler

    sig = np.sin(np.arange(44100 * 3) / 11.0)[None, :] * 0.7
    for mode in ("none", "linear", "cubic", "sinc"):
        host = ChunkResampler(44100, 1, mode=mode)
        dev = ChunkResampler(44100, 1, mode=mode)
        pos = 0
        chunks_h, chunks_d = [], []
        while True:
            need = host.samples_needed
            fresh = sig[:, pos : pos + need]
            pos += need
            rh = host.process(fresh)
            rd = dev.process(jnp.asarray(fresh, jnp.float32))
            assert (rh is None) == (rd is None)
            if rh is None:
                break
            ch, ph = rh
            cd, pd = rd
            assert ph == pd
            chunks_h.append(ch)
            chunks_d.append(np.asarray(cd))
            if fresh.shape[1] < need:
                break
        h = np.concatenate(chunks_h, axis=1)
        d = np.concatenate(chunks_d, axis=1)
        assert h.shape == d.shape
        np.testing.assert_allclose(d, h, atol=2e-3, err_msg=mode)


def test_stream_aiff_function_source_form_resync():
    """Function source feeding the file twice (icecast-style loop): with
    ignore_header the repeated FORM header is stripped via the SSND offset
    walk (aukit.lua:3053-3062 — whose size/offset misread we fix)."""
    sig = RNG.integers(-3000, 3000, (2, 48000))
    payload = sig.T.reshape(-1).astype(">i2").tobytes()
    f = fixtures.aiff_file(payload, 2, 48000, 16)
    feed = [f, f]
    it, _ = ak.stream.aiff(lambda: feed.pop(0) if feed else None, ignore_header=True)
    got = np.concatenate([c for c, _ in collect(it)], axis=1)
    it2, _ = ak.stream.pcm(payload + payload, 16, "signed", 2, 48000, True, False)
    exp = np.concatenate([c for c, _ in collect(it2)], axis=1)
    np.testing.assert_array_equal(got, exp)


def test_stream_au_function_source_snd_restrip():
    """Repeated .snd header mid-stream is re-stripped via its (1-based,
    quirk Q20) offset field (aukit.lua:3097-3101)."""
    sig = RNG.integers(-3000, 3000, 48000)
    payload = sig.astype(">i2").tobytes()
    f = fixtures.au_file(payload, 3, 48000, 1)
    feed = [f, f]
    it, _ = ak.stream.au(lambda: feed.pop(0) if feed else None, ignore_header=True)
    got = np.concatenate([c for c, _ in collect(it)], axis=1)
    it2, _ = ak.stream.pcm(payload + payload, 16, "signed", 1, 48000, True, False)
    exp = np.concatenate([c for c, _ in collect(it2)], axis=1)
    np.testing.assert_array_equal(got, exp)


def test_stream_au_function_source_plain():
    """Function-source AU without header repetition: the prefixed-source
    closure must deliver header-chunk payload then tail chunks seamlessly."""
    sig = RNG.integers(-3000, 3000, 48000 * 3)
    payload = sig.astype(">i2").tobytes()
    f = fixtures.au_file(payload, 3, 48000, 1)
    pos = 0

    def drip():
        nonlocal pos
        if pos >= len(f):
            return None
        out = f[pos : pos + 70000]
        pos += len(out)
        return out

    it, _ = ak.stream.au(drip)
    got = np.concatenate([c for c, _ in collect(it)], axis=1)
    it2, _ = ak.stream.pcm(payload, 16, "signed", 1, 48000, True, False)
    exp = np.concatenate([c for c, _ in collect(it2)], axis=1)
    np.testing.assert_array_equal(got, exp)


def test_ws_ingestion_end_to_end():
    """N6 parity (SURVEY.md §2.3): a ws:// source through austream's
    open_source feeds the stream pipeline; binary messages are chunks."""
    import threading

    websockets = pytest.importorskip("websockets")
    from websockets.sync.server import serve

    sig = RNG.integers(-3000, 3000, 48000)
    payload = sig.astype("<i2").tobytes()
    data = fixtures.wav_pcm(sig[None, :], 48000, 16)
    chunks = [data[i : i + 4096] for i in range(0, len(data), 4096)]

    def handler(conn):
        for c in chunks:
            conn.send(c)
        conn.close()

    with serve(handler, "127.0.0.1", 0) as server:
        port = server.socket.getsockname()[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        from aukit_tpu.cli.austream import open_source

        src = open_source(f"ws://127.0.0.1:{port}", True)
        it, _ = ak.stream.wav(src)
        got = np.concatenate([c for c, _ in collect(it)], axis=1)
        server.shutdown()
    it2, _ = ak.stream.pcm(payload, 16, "signed", 1, 48000, False, False)
    exp = np.concatenate([c for c, _ in collect(it2)], axis=1)
    np.testing.assert_array_equal(got, exp)


def test_stream_seek_points_resume_exactly():
    """stream/seek.py: resuming a block codec from the returned byte offset
    reproduces the from-start decode at the landing time (SURVEY §5.4)."""
    from aukit_tpu.stream import seek as sk

    ba, rate = 256, 8000
    payload = fixtures.ima_wav_blocks(RNG, 40, ba, 1)  # ~2.5 s
    off, landing = sk.ima_seek(1.3, rate, ba, 1)
    spb = (ba - 4) * 2
    assert off % ba == 0 and abs(landing - (off // ba) * spb / rate) < 1e-12
    full_it, _ = ak.stream.adpcm(payload, ba, 1, rate)
    full = np.concatenate([c for c, _ in collect(full_it)], axis=1)
    part_it, _ = ak.stream.adpcm(payload[off:], ba, 1, rate)
    part = np.concatenate([c for c, _ in collect(part_it)], axis=1)
    skip = int(round(landing * 48000))
    n = min(part.shape[1], full.shape[1] - skip)
    # identical per-second block batching from a block boundary: both decodes
    # share block state (in-band), resample phase resets per call chunk
    assert n > 48000
    np.testing.assert_allclose(part[:, :n], full[:, skip : skip + n], atol=2.0)

    # QOA frame seek: landing on a frame boundary
    data = fixtures.qoa_stream(RNG, 1, 10240, [5120] * 4) + b"\x00" * 8
    off_q, landing_q = sk.qoa_seek(data, 1.2)
    assert landing_q <= 1.2
    assert (off_q - 8) % (8 + 16 + 256 * 8) == 0  # frame-aligned


def test_flac_seek_frame_boundary_resume():
    """flac_seek: validated sync walk lands on a frame boundary; decoding
    header + frames-from-the-landing is BIT-identical to the from-start
    decode's tail (frames carry warmup in-band; SURVEY §5.4)."""
    from aukit_tpu.codecs import flac as fc
    from aukit_tpu.stream import seek as sk

    n, rate = 4096, 48000
    frames = []
    for k in range(24):  # ~2 s, distinct content per frame
        vals = (np.arange(n) * (k + 3) % 1999 - 999).astype(int)
        frames.append(fixtures.flac_frame(
            [{"type": "verbatim", "values": [int(v) for v in vals]}],
            n, 0, 16, frame_number=k))
    data = fixtures.flac_stream_header(rate, 1, 16, 24 * n) + b"".join(frames)
    hdr_len = len(fixtures.flac_stream_header(rate, 1, 16, 24 * n))

    off, landing = sk.flac_seek(data, 1.3)
    k = int(1.3 * rate) // n
    assert landing == k * n / rate  # last frame boundary at/under target
    assert off == hdr_len + sum(len(f) for f in frames[:k])

    full, _sr, _m, _d = fc.decode_flac(data)
    part, _sr2, _m2, _d2 = fc.decode_flac(data[:hdr_len] + data[off:])
    skip = int(round(landing * rate))
    np.testing.assert_array_equal(part, full[:, skip:])

    # stream-level resume: exact after the (restarted) IIR lowpass converges
    it_f, _ = ak.stream.flac(data)
    full_s = np.concatenate([c for c, _ in collect(it_f)], axis=1)
    it_p, _ = ak.stream.flac(data[:hdr_len] + data[off:])
    part_s = np.concatenate([c for c, _ in collect(it_p)], axis=1)
    m = part_s.shape[1]
    np.testing.assert_allclose(part_s[:, :16], full_s[:, skip : skip + 16], atol=6.0)
    np.testing.assert_allclose(part_s[:, 16:], full_s[:, skip + 16 : skip + m], atol=1e-9)

    # a mid-stream target between syncs still lands on the preceding frame
    off2, landing2 = sk.flac_seek(data, 0.0)
    assert (off2, landing2) == (hdr_len, 0.0)


def test_stream_pcm_native_dsp_bit_identical(monkeypatch):
    """The fused C++ unpack/DSP paths must be BIT-identical to the numpy
    oracle across dtypes, rates, channels, and chunk boundaries."""
    from aukit_tpu.native import flacbits as nb

    if not nb.available():
        pytest.skip("native helpers unavailable")
    cases = [
        (8, "signed", 1, 48000, False),
        (8, "unsigned", 2, 32000, False),
        (16, "signed", 2, 44100, False),
        (16, "signed", 2, 44100, True),
        (16, "unsigned", 1, 12000, False),
        (24, "signed", 2, 96000, True),
        (32, "signed", 1, 48000, False),
        (32, "float", 2, 22050, False),
    ]
    for depth, dtype, ch, rate, be in cases:
        n = rate // 2 + 371
        if dtype == "float":
            raw = (RNG.random(n * ch).astype("f4") * 2 - 1).astype(">f4" if be else "<f4").tobytes()
        else:
            hi = 1 << depth
            v = RNG.integers(0, hi, n * ch, dtype=np.int64)
            if dtype == "signed":
                v = v - (hi >> 1)
            from aukit_tpu.ops.pcmcode import pack_pcm
            raw = pack_pcm(v, depth, dtype, be)
        for mode in ("none", "linear"):
            import aukit_tpu.config as cfgmod

            monkeypatch.setattr(cfgmod.CONFIG, "default_interpolation", mode)
            it_n, _ = ak.stream.pcm(raw, depth, dtype, ch, rate, be, True)
            got_n = [c for c, _ in collect(it_n)]
            monkeypatch.setattr(nb, "available", lambda: False)
            it_p, _ = ak.stream.pcm(raw, depth, dtype, ch, rate, be, True)
            got_p = [c for c, _ in collect(it_p)]
            monkeypatch.undo()
            monkeypatch.setattr(cfgmod.CONFIG, "default_interpolation", mode)
            assert len(got_n) == len(got_p), (depth, dtype, mode)
            for a, b in zip(got_n, got_p):
                np.testing.assert_array_equal(a, b, err_msg=f"{depth}/{dtype}/{mode}")


def test_stream_pcm_native_dsp_q9_compat(monkeypatch):
    """CONFIG.compat_quirks (Q9 per-chunk lowpass reseed) must behave
    identically on the native and numpy DSP paths."""
    from aukit_tpu.native import flacbits as nb
    import aukit_tpu.config as cfgmod

    if not nb.available():
        pytest.skip("native helpers unavailable")
    raw = RNG.integers(0, 256, 44100 * 2, dtype=np.uint8).tobytes()
    monkeypatch.setattr(cfgmod.CONFIG, "compat_quirks", True)
    it_n, _ = ak.stream.pcm(raw, 8, "signed", 1, 44100, False, False)
    got_n = [c for c, _ in collect(it_n)]
    monkeypatch.setattr(nb, "available", lambda: False)
    it_p, _ = ak.stream.pcm(raw, 8, "signed", 1, 44100, False, False)
    got_p = [c for c, _ in collect(it_p)]
    assert len(got_n) == len(got_p) >= 2
    for a, b in zip(got_n, got_p):
        np.testing.assert_array_equal(a, b)


def test_chunk_resampler_device_state_roundtrip():
    """get_state/set_state must serialize device-resident carry/filter state
    (SURVEY §5.4) and resume identically on either backend."""
    import jax.numpy as jnp
    from aukit_tpu.stream.engine import ChunkResampler

    sig = np.sin(np.arange(44100 * 2) / 9.0)[None, :] * 0.5
    dev = ChunkResampler(44100, 1, mode="linear")
    pos = 0
    for _ in range(1):
        need = dev.samples_needed
        dev.process(jnp.asarray(sig[:, pos : pos + need], jnp.float32))
        pos += need
    state = dev.get_state()
    assert isinstance(state["carry"], np.ndarray)  # serializable numpy

    resumed = ChunkResampler(44100, 1, mode="linear")
    resumed.set_state(state)
    a = dev.process(jnp.asarray(sig[:, pos : pos + dev.samples_needed], jnp.float32))
    b = resumed.process(jnp.asarray(sig[:, pos : pos + resumed.samples_needed], jnp.float32))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert a[1] == b[1]


def test_stream_pcm_jax_value_source_device_twin():
    """stream.pcm on a jax VALUE array (the reference's table input, device
    resident) routes through the fused device twin end-to-end: chunks come
    back as float32 jax arrays matching the host numpy oracle to f32
    tolerance, same positions and chunk shapes (VERDICT r2 weak item 7)."""
    import jax
    import jax.numpy as jnp

    sig = np.sin(np.arange(44100 * 2) / 9.0) * 0.6
    vals16 = np.round(sig * 20000).astype(np.int64)
    for depth, dtype, vals in ((32, "float", sig.astype(np.float32)),
                               (16, "signed", vals16)):
        it_h, len_h = ak.stream.pcm(vals.tolist() if depth == 16 else np.asarray(vals),
                                 depth, dtype, 1, 44100)
        it_d, len_d = ak.stream.pcm(jnp.asarray(vals), depth, dtype, 1, 44100)
        assert len_h == len_d
        while True:
            rh, rd = it_h(), it_d()
            assert (rh is None) == (rd is None)
            if rh is None:
                break
            ch, ph = rh
            cd, pd = rd
            assert ph == pd
            assert isinstance(cd, jax.Array) and cd.dtype == jnp.float32
            assert ch.shape == cd.shape
            np.testing.assert_allclose(np.asarray(cd), ch, atol=2e-2)


def test_iir_doubling_zero_pass_skip_bit_identical():
    """The recursive-doubling lowpass twins skip passes once the decay
    constant underflows to exactly 0.0 (every such pass adds +0.0). Pin
    bit-identity against a full-pass replica on all three implementations:
    host f64 (native C++ or numpy fallback), numpy fallback directly, and
    the fleet's jitted f32 device twin."""
    from aukit_tpu.stream.engine import iir_lowpass_scan

    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 2, 4096)) * 0.4
    state = rng.standard_normal((5, 2)) * 0.1
    for alpha in (0.9568, 0.407, 0.02):  # 48k / 8k stream alphas + a slow one
        c = 1.0 - alpha

        def full_doubling(xx, st):  # the pre-skip evaluation order, verbatim
            y = xx * alpha
            y[..., 0] += c * st
            ck, shift = c, 1
            while shift < y.shape[-1]:
                y[..., shift:] += ck * y[..., :-shift]
                ck = ck * ck
                shift *= 2
            return y, y[..., -1].copy()

        y_ref, fin_ref = full_doubling(x.copy(), state)
        y, fin = iir_lowpass_scan(x.copy(), alpha, state.copy())
        np.testing.assert_array_equal(y, y_ref)
        np.testing.assert_array_equal(fin, fin_ref)

    # fleet device twin (f32): compare against a jitted FULL-pass replica —
    # device vs device, so backend FMA/rounding choices cancel and only the
    # skip's effect (none) is under test
    from aukit_tpu.stream.flac_fleet import _device_iir_scale_fn
    import jax
    import jax.numpy as jnp

    T = 2048
    xf = (rng.standard_normal((4, 1, T)) * 0.4).astype(np.float32)
    stf = (rng.standard_normal((4, 1)) * 0.1).astype(np.float32)
    tval = np.full(4, T, np.int32)
    alpha = 0.9568
    a32, c32 = np.float32(alpha), np.float32(1.0 - alpha)

    @jax.jit
    def full_fn(x, state, tvalid):
        y = x * a32
        y = y.at[..., 0].add(c32 * state)
        ck, shift = c32, 1
        while shift < T:
            y = y.at[..., shift:].add(ck * y[..., :-shift])
            ck = ck * ck
            shift *= 2
        idx = jnp.clip(tvalid - 1, 0, T - 1)
        new_state = jnp.take_along_axis(y, idx[:, None, None], axis=-1)[..., 0]
        scaled = jnp.clip(y * jnp.where(y < 0, 128.0, 127.0), -128.0, 127.0)
        return scaled[:, 0], new_state

    exp, fin_exp = full_fn(jnp.asarray(xf), jnp.asarray(stf), jnp.asarray(tval))
    fn = _device_iir_scale_fn(T, alpha, "first")
    ones = jnp.asarray(np.ones(4, np.float32))
    got, new_state = fn(jnp.asarray(xf), jnp.asarray(stf), jnp.asarray(tval),
                        ones, ones, ones, ones)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))
    np.testing.assert_array_equal(np.asarray(new_state), np.asarray(fin_exp))


def test_stream_adpcm_malformed_step_index_clamped():
    """A garbage IMA block whose step-index byte exceeds 88 decodes with the
    index clamped at parse (defined output, stream stays alive) — the
    reference nil-errors the stream here; clamping is the engine's documented
    lenient convention, now shared by the single-stream path."""
    rng = np.random.default_rng(33)
    ba = 256
    good = bytes([0, 0, 40, 0]) + rng.integers(0, 256, ba - 4, dtype=np.uint8).tobytes()
    bad = bytes([0, 0, 0xFF, 0]) + rng.integers(0, 256, ba - 4, dtype=np.uint8).tobytes()
    it, _ = ak.stream.adpcm(good + bad + good, ba, 1, 8000)
    chunks = [c for c, _p in it]
    out = np.concatenate(chunks, axis=1)
    assert np.isfinite(out).all()
    assert out.shape[1] > 0
    # the clamped block must decode exactly like one whose header already
    # carries 88 (clip semantics, not fill/garbage)
    bad88 = bytes([0, 0, 88, 0]) + bad[4:]
    it2, _ = ak.stream.adpcm(good + bad88 + good, ba, 1, 8000)
    out2 = np.concatenate([c for c, _p in it2], axis=1)
    np.testing.assert_array_equal(out, out2)


def test_stream_adpcm_malformed_step_index_compat_errors(monkeypatch):
    """Q28: under CONFIG.compat_quirks the reference's behavior returns — a
    step index > 88 hard-errors the stream instead of clamping."""
    import aukit_tpu.config as cfgmod

    rng = np.random.default_rng(33)
    ba = 256
    bad = bytes([0, 0, 0xFF, 0]) + rng.integers(0, 256, ba - 4, dtype=np.uint8).tobytes()
    monkeypatch.setattr(cfgmod.CONFIG, "compat_quirks", True)
    it, _ = ak.stream.adpcm(bad, ba, 1, 8000)
    with pytest.raises(ValueError, match="malformed IMA step index"):
        for _c, _p in it:
            pass


def test_flac_seek_estimated_probe_on_long_stream():
    """VERDICT r3 weak 4: flac_seek on a long stream starts from a byte-rate
    guess and touches O(probe) bytes, not the whole file — while landing on
    exactly the same frame as the definition (last frame start <= target)."""
    from aukit_tpu.stream import seek as sk

    n, rate = 256, 48000
    nframes = 2200  # ~12 s of 256-sample verbatim frames, ~1.2 MB
    rngl = np.random.default_rng(8)
    frames = [fixtures.flac_frame(
        [{"type": "verbatim",
          "values": [int(v) for v in rngl.integers(-2000, 2000, n)]}],
        n, 0, 16, frame_number=k) for k in range(nframes)]
    hdr = fixtures.flac_stream_header(rate, 1, 16, nframes * n)
    data = hdr + b"".join(frames)
    offs = [len(hdr)]
    for f in frames:
        offs.append(offs[-1] + len(f))
    assert len(data) > (1 << 20)

    for target_s in (9.0, 0.5, 11.7):
        off, landing = sk.flac_seek(data, target_s)
        k = int(target_s * rate) // n
        assert landing == k * n / rate
        assert off == offs[k]
        # probe cost: a handful of back-off hops + the local forward walk,
        # not the megabyte between the stream start and the target
        assert sk.flac_seek.last_scanned < 300_000, sk.flac_seek.last_scanned

    # targets at/after EOF clamp to the last frame
    off, landing = sk.flac_seek(data, 10_000.0)
    assert off == offs[nframes - 1]
    assert landing == (nframes - 1) * n / rate


def test_flac_seek_probe_bounded_on_frameless_suffix():
    """Review r4 finding 2: when the byte-rate guess lands in a large
    frameless suffix (appended garbage), each back-off probe is bounded at
    the already-proven-frameless region — total scan stays O(n), not
    O(n log n)."""
    from aukit_tpu.stream import seek as sk

    n, rate = 256, 48000
    nframes = 400
    rngl = np.random.default_rng(9)
    frames = [fixtures.flac_frame(
        [{"type": "verbatim",
          "values": [int(v) for v in rngl.integers(-2000, 2000, n)]}],
        n, 0, 16, frame_number=k) for k in range(nframes)]
    hdr = fixtures.flac_stream_header(rate, 1, 16, nframes * n)
    audio = hdr + b"".join(frames)
    garbage = b"\x01\x02" * (1 << 20)  # 2 MB frameless suffix, no 0xFF
    data = audio + garbage

    off, landing = sk.flac_seek(data, 1.5)
    k = int(1.5 * rate) // n
    assert landing == k * n / rate
    # every probe past the first is clipped at the proven-frameless edge:
    # total <= one pass over the suffix + the local hops, far below the
    # ~5x-suffix cost of unbounded rescans
    assert sk.flac_seek.last_scanned < len(garbage) + 600_000, \
        sk.flac_seek.last_scanned
