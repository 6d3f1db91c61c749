"""One-facade Fleet (stream/fleet.py): mixed sources behind one dispatch
surface (reference aukit.lua:2992-2996), VERDICT r3 item 3."""

import math

import numpy as np
import pytest

import aukit_tpu as ak
from aukit_tpu.stream.batch import LaneSpec
from aukit_tpu.stream.fleet import Fleet
from tests import fixtures
from tests.ref.codecs import dfpwm_decode_ref
from tests.test_flac_fleet import make_flac, solo_reference

RNG = np.random.default_rng(99)


def fir_48k_f(dec):
    """dsp_chain identity-rate reference for DFPWM engine lanes (f32)."""
    s = np.asarray(dec, np.float64)
    s = s / np.where(s < 0, 128.0, 127.0)
    a = 1.0 - math.exp(-0.5 * 2 * math.pi)
    prev = np.concatenate([[0.0], s[:-1]])
    out = prev + a * (s - prev)
    out = out * np.where(out < 0, 128.0, 127.0)
    return np.clip(out, -128, 127).astype(np.int8)


def dsp_ref_16(sig, rate):
    from tests.test_batch import dsp_ref, norm16f

    out, _ = dsp_ref(norm16f(np.asarray(sig, np.int64)), rate)
    return out


def collect(fleet):
    outs = [[] for _ in fleet.stations]
    guard = 0
    while not fleet.done:
        r = fleet.step()
        guard += 1
        assert guard < 10000
        if r is None:
            if fleet.done:
                break
            continue
        w, m, _pos = r
        for i in range(len(fleet.stations)):
            if m[i]:
                outs[i].append(w[i])
    return [np.concatenate(o, axis=-1) if o else np.zeros(0, np.int8)
            for o in outs]


def make_mdfpwm(nblocks=3, extra=100):
    """Valid MDFPWMv3 bytes: header + alternating 6000-byte L/R blocks."""
    body = RNG.integers(0, 256, nblocks * 12000 + extra, dtype=np.uint8)
    length = len(body) - (extra // 2)  # trim exercises the per-lane cap
    hdr = b"MDFPWM\x03" + int(length).to_bytes(4, "little") \
        + bytes([1]) + b"a" + bytes([1]) + b"t" + bytes([1]) + b"l"
    return hdr + body.tobytes(), length


def test_fleet_facade_mixed_sources():
    """WAV(pcm16) + raw DFPWM + FLAC + QOA in ONE Fleet: every station's
    int8 windows match its own reference chain."""
    rate = 24000
    sig = (np.sin(np.arange(rate) / 9.0) * 20000).astype(np.int16)
    wav = ak.tone(440, 1.0, 0.5, "sine", sample_rate=rate).wav(16)
    dfp = RNG.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    flac = make_flac(44100, 6, seed=80)
    qrate = 10240
    qoa = fixtures.qoa_stream(RNG, 1, qrate, [5120, 5120]) + b"\x00" * 8

    # raw DFPWM bytes are random (no 0x55/0xAA runs), so the station is
    # declared explicitly — the reference's detect can't see them either
    fleet = Fleet([wav, (LaneSpec("dfpwm", 48000), dfp), flac, qoa])
    assert [st.kind for st in fleet.stations] == ["engine"] * 2 + ["flac", "engine"]
    outs = collect(fleet)

    # WAV station: the engine's pcm16 chain on the data chunk
    from aukit_tpu.stream.batch_codecs import lane_spec_for_wav

    spec, off, size = lane_spec_for_wav(wav)
    body = np.frombuffer(wav[off: off + size], "<i2")
    exp = dsp_ref_16(body, spec.sample_rate)
    np.testing.assert_allclose(outs[0][: len(exp)].astype(np.int32), exp,
                               atol=1)
    # DFPWM station
    exp_d = fir_48k_f(dfpwm_decode_ref(dfp))
    np.testing.assert_array_equal(outs[1][: len(exp_d)], exp_d)
    # FLAC station: solo stream.flac quantized with the truncating int8 cast
    exp_f = np.clip(solo_reference(flac), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(outs[2][: len(exp_f)], exp_f)
    # QOA station produced real audio of the expected length
    assert len(outs[3]) >= 2 * 5120 * 48000 // qrate - 48000
    assert outs[3].any()


def test_fleet_facade_mdfpwm_station_and_drip_invariance():
    """An MDFPWM station merges its two DFPWM lanes (fixed-Q3 mixdown) and is
    drip-size invariant (the de-interleave cursor handles partial pairs)."""
    data, length = make_mdfpwm()
    per = length // 2
    whole = collect(Fleet([data]))

    # reference: per-lane dsp windows, then floor((l+r)/2)
    from aukit_tpu.containers.mdfpwm import parse_mdfpwm_header

    hdr = parse_mdfpwm_header(data)[4]
    body = data[hdr:]
    nb = len(body) // 12000
    pairs = np.frombuffer(body[: nb * 12000], np.uint8).reshape(nb, 2, 6000)
    left = pairs[:, 0].reshape(-1).tobytes() + body[nb * 12000: nb * 12000 + 6000]
    right = pairs[:, 1].reshape(-1).tobytes() + body[nb * 12000 + 6000:]
    # the length trim leaves the lanes ragged (L carries the partial tail
    # block). Engine semantics: a partial EOF tail zero-pads the INPUT bytes
    # to the chunk size, so the pad bytes decode through the DFPWM decoder
    # (decay, not silence); the exhausted R lane contributes zeros to the
    # final window.
    lbytes = left[:per]
    lbytes += b"\x00" * ((-len(lbytes)) % 6000)
    dl = fir_48k_f(dfpwm_decode_ref(lbytes)).astype(np.float64)
    dr = fir_48k_f(dfpwm_decode_ref(right[:per])).astype(np.float64)
    n4 = max(len(dl), len(dr))
    dlp, drp = np.zeros(n4), np.zeros(n4)
    dlp[: len(dl)], drp[: len(dr)] = dl, dr
    exp = np.floor((dlp + drp) / 2).astype(np.int8)
    got = whole[0]
    assert len(got) == n4
    np.testing.assert_array_equal(got, exp)

    # drip-feed in awkward chunk sizes, crossing header and pair boundaries
    fleet2 = Fleet([data[:50]], eof=False)
    pos = 50
    while pos < len(data):
        fleet2.feed(0, data[pos: pos + 7013])
        pos += 7013
    fleet2.feed(0, None)
    dripped = collect(fleet2)
    np.testing.assert_array_equal(dripped[0], whole[0])

    info = fleet2.station_info(0)
    assert info["artist"] == "a" and info["title"] == "t"


def test_fleet_facade_multichannel_windows():
    """mono=False: stations emit [N, C, T] windows; the stereo FLAC station
    carries distinct channels, mono stations replicate channel 0."""
    flac = make_flac(44100, 6, channels=2, chan_asgn=10, seed=81)
    dfp = RNG.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    fleet = Fleet([flac, (LaneSpec("dfpwm", 48000), dfp)], mono=False,
                  channels=2)
    got = [[] for _ in range(2)]
    while not fleet.done:
        r = fleet.step()
        if r is None:
            if fleet.done:
                break
            continue
        w, m, _ = r
        assert w.ndim == 3 and w.shape[1] == 2
        for i in range(2):
            if m[i]:
                got[i].append(w[i])
    fl = np.concatenate(got[0], axis=-1)
    from tests.test_flac_fleet import solo_reference_mc

    exp = np.clip(solo_reference_mc(flac), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(fl[:, : exp.shape[1]], exp)
    assert not np.array_equal(exp[0], exp[1])  # genuinely stereo
    df = np.concatenate(got[1], axis=-1)
    np.testing.assert_array_equal(df[0], df[1])  # replicated channel 0


def test_fleet_facade_checkpoint_roundtrip():
    """Engine and FLAC station checkpoints restore into a fresh Fleet and
    resume identically."""
    flac = make_flac(48000, 8, seed=82)
    dfp = RNG.integers(0, 256, 18000, dtype=np.uint8).tobytes()
    dspec = LaneSpec("dfpwm", 48000)
    full = collect(Fleet([(dspec, dfp), flac]))

    fleet = Fleet([(dspec, dfp), flac], eof=False)
    got = [[] for _ in range(2)]
    for _ in range(2):
        r = fleet.step()
        if r is not None:
            w, m, _ = r
            for i in range(2):
                if m[i]:
                    got[i].append(w[i])
    cks = [fleet.checkpoint(0), fleet.checkpoint(1)]
    fleet2 = Fleet([(dspec, b""), flac[:4]], eof=False)
    # fresh facade over the same station layout (4 magic bytes fix the FLAC
    # kind; restore replaces lane state wholesale); restore + refeed tails
    fleet2.restore(0, cks[0])
    fleet2.restore(1, cks[1])
    fleet2.feed(0, dfp[cks[0]["fed"]:])
    fleet2.feed(0, None)
    off = cks[1]["sub"]["byte_offset"] + len(cks[1]["sub"]["pending"])
    fleet2.feed(1, flac[off:])
    fleet2.feed(1, None)
    rest = collect(fleet2)
    for i in range(2):
        parts = got[i] + ([rest[i]] if len(rest[i]) else [])
        resumed = np.concatenate(parts, axis=-1)
        np.testing.assert_array_equal(resumed, full[i])


def test_fleet_facade_explicit_lanespec_and_errors():
    """(LaneSpec, bytes) stations bypass detection; undetectable sources
    raise; checkpoint kind mismatch raises."""
    raw = (np.sin(np.arange(8000) / 5.0) * 100).astype(np.int8).tobytes()
    fleet = Fleet([(LaneSpec("pcm8", 8000), raw)])
    outs = collect(fleet)
    assert len(outs[0]) >= 47000 and outs[0].any()
    with pytest.raises(ValueError):
        Fleet([RNG.integers(60, 200, 200, dtype=np.uint8).tobytes()])
    flac = make_flac(48000, 2, seed=83)
    f2 = Fleet([flac])
    with pytest.raises(ValueError, match="kind"):
        f2.restore(0, {"kind": "engine", "fed": 0, "sub": {}})


def test_fleet_facade_channel_capacity_mismatch():
    """Review r4 finding 1: an engine station whose channel count differs
    from the facade capacity fits (replicate channel 0 / truncate) instead
    of crashing."""
    rate = 24000
    t = np.arange(rate)
    left = (np.sin(t / 9.0) * 20000).astype(np.int16)
    right = (np.cos(t / 5.0) * 15000).astype(np.int16)
    inter = np.stack([left, right], axis=1).reshape(-1).tobytes()
    spec = LaneSpec("pcm16", rate, 2)
    # stereo station into a 4-channel facade: channels 2/3 replicate ch 0
    f4 = Fleet([(spec, inter)], mono=False, channels=4)
    w, m, _ = f4.step()
    assert w.shape[1] == 4 and m[0]
    np.testing.assert_array_equal(w[0, 2], w[0, 0])
    np.testing.assert_array_equal(w[0, 3], w[0, 0])
    assert not np.array_equal(w[0, 0], w[0, 1])
    # stereo station into a 1-channel facade: truncates to channel 0
    f1 = Fleet([(spec, inter)], mono=False, channels=1)
    w1, m1, _ = f1.step()
    assert w1.shape[1] == 1 and m1[0]
    np.testing.assert_array_equal(w1[0, 0], w[0, 0])


def test_fleet_facade_station_iterator_playback():
    """station_iterator feeds playback.play — the one-liner path from a
    facade station to sinks."""
    from aukit_tpu.playback import BufferSink, play

    rate = 24000
    wav = ak.tone(330, 1.0, 0.5, "sine", sample_rate=rate).wav(16)
    f = Fleet([wav])
    sink = BufferSink()
    play(f.station_iterator(0), sink)
    out = sink.samples()
    assert len(out) >= 47000 and np.abs(out).max() > 20


def test_fleet_facade_poisoned_flac_station_isolated(monkeypatch):
    """§5.3 isolation through the facade: a FLAC station fed garbage after
    a valid magic poisons (undecodable-stream stall bound) without stalling
    the healthy stations, and the fleet completes."""
    import aukit_tpu.stream.flac_fleet as ff

    monkeypatch.setattr(ff, "_PULL_STALL_LIMIT", 100_000)
    healthy = make_flac(48000, 4, seed=97)
    # valid fLaC magic + STREAMINFO, then garbage that never forms a frame;
    # the stream stays LIVE (no EOF) so the undecodable stall bound trips
    # (an EOF'd garbage stream instead ends silently — reference pcall
    # semantics)
    bad_head = healthy[:50]
    garbage = bytes(RNG.integers(0, 255, 400_000, dtype=np.uint8))
    f = Fleet([bad_head, healthy], eof=False)
    f.feed(1, None)
    f.feed(0, garbage[:200_000])
    outs = [[] for _ in range(2)]
    r0 = f.step()  # healthy station may emit right here (short stream)
    if r0 is not None:
        for i in range(2):
            if r0[1][i]:
                outs[i].append(r0[0][i])
    f.feed(0, garbage[200_000:])  # grows past the stall limit, no commit
    guard = 0
    while not f.done:
        r = f.step()
        guard += 1
        assert guard < 1000
        if r is None:
            if f.stations[0].kind == "flac" and f.flac.done and                     (f.engine is None or f.engine.done):
                break
            continue
        w, m, _ = r
        for i in range(2):
            if m[i]:
                outs[i].append(w[i])
    assert f.station_error(0) is not None          # poisoned, with a reason
    assert "undecodable" in f.station_error(0)
    assert f.station_error(1) is None
    got = np.concatenate(outs[1], axis=-1)
    exp = np.clip(solo_reference(healthy), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got[: len(exp)], exp)


def test_play_fleet_concurrent_stations():
    """playback.play_fleet: one producer steps the Fleet, per-station
    consumers drain sinks concurrently — outputs equal the sequential
    collect() exactly; stereo stations fan channels across sink tuples."""
    from aukit_tpu.playback import BufferSink, play_fleet

    rate = 24000
    wav = ak.tone(440, 1.0, 0.5, "sine", sample_rate=rate).wav(16)
    flac = make_flac(44100, 60, channels=2, chan_asgn=10, seed=98)
    expected = collect(Fleet([wav, flac], mono=False, channels=2))

    f = Fleet([wav, flac], mono=False, channels=2)
    s_wav = (BufferSink(), BufferSink())
    s_flac = (BufferSink(), BufferSink())
    seen = []
    play_fleet(f, [s_wav, s_flac], progress=lambda i, p: seen.append((i, p)))
    for st, sinks in enumerate((s_wav, s_flac)):
        for ch, sink in enumerate(sinks):
            got = sink.samples()
            np.testing.assert_array_equal(got, expected[st][ch])
    assert any(i == 1 for i, _p in seen)


def test_play_fleet_drop_isolates_slow_sink():
    """drop=True: a sink that never accepts cannot stall the batch — the
    healthy station still receives ALL its audio and play_fleet returns."""
    from aukit_tpu.playback import BufferSink, SinkBase, play_fleet

    class RefusingSink(SinkBase):
        def __init__(self):
            super().__init__()
            self.attempts = 0

        def play_audio(self, samples, volume=None):
            self.attempts += 1
            return False  # forever full

        def wait_drain(self, timeout=None):
            import time as _t

            _t.sleep(min(timeout or 0.1, 0.1))  # no hot spin in the suite
            return False

        def _consume(self, samples, volume):
            pass

    rate = 24000
    wav = ak.tone(440, 1.0, 0.5, "sine", sample_rate=rate).wav(16)
    expected = collect(Fleet([wav, wav]))

    f = Fleet([wav, wav])
    slow, ok = RefusingSink(), BufferSink()
    import threading

    done = threading.Event()

    def run():
        play_fleet(f, [slow, ok], drop=True, queue_windows=1)
        done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    # the refusing sink loses ITS pieces (drop semantics extend to the sink
    # retry loop), the healthy station gets everything, and play_fleet
    # RETURNS — a stuck speaker can neither stall the batch nor the joins
    for _ in range(400):
        if done.is_set():
            break
        import time as _t

        _t.sleep(0.05)
    assert done.is_set(), "play_fleet must return despite the refusing sink"
    np.testing.assert_array_equal(ok.samples()[: len(expected[1])],
                                  expected[1])
    assert slow.attempts >= 1


def test_fleet_detects_real_tail_pcm():
    """VERDICT r4 weak 4: the facade probes the REAL construction bytes —
    a headerless-PCM source with a loud head and a near-silent (but nonzero)
    tail is accepted by aukit_tpu.detect (aukit.lua:2164-2191 tail probe)
    and must construct a Fleet station identically."""
    body = RNG.integers(-100, 100, 4000, dtype=np.int64)
    body[-16:] = np.array([1, -2, 3, -1, 2, -3, 1, -2] * 2)  # quiet tail
    src = body.astype(np.int8).tobytes()
    assert ak.detect(src) == ("pcm", 8, "signed")
    fleet = Fleet([src])
    st = fleet.stations[0]
    assert st.kind == "engine"
    assert fleet.engine.specs[st.lanes[0]].codec == "pcm8"
    outs = collect(fleet)
    assert outs[0].shape[-1] > 0


def test_fleet_facade_flac_volume_ramp():
    """VERDICT r4 item 7: ``Fleet.set_volume(ramp=True)`` is honored on FLAC
    stations (no silent click-y fallback): the ramped station's first window
    starts near the old gain and ends the ramp at the new gain."""
    data = make_flac(48000, 110, seed=77)  # ~2.3 s
    base = collect(Fleet([data]))[0].astype(np.float64)
    fleet = Fleet([data])
    fleet.set_volume(0, 0.25, ramp=True)
    got = collect(fleet)[0].astype(np.float64)
    n = min(len(base), len(got))
    t = np.arange(n, dtype=np.float64)
    line = 1.0 + (0.25 - 1.0) * np.minimum(t / 48000.0, 1.0)
    # int8-quantized windows: the ramp line holds within 1 LSB + rounding
    np.testing.assert_allclose(got[:n], (base * line)[:n], atol=1.5)
    # and the ramp actually moved: the head still rides ~unity gain while the
    # post-ramp tail sits at the 0.25x amplitude
    assert np.abs(got[:8000]).mean() > 0.7 * np.abs(base[:8000]).mean()
    # [60000:100000] is past the 48000-sample ramp but inside the real
    # (non-zero-padded) audio
    assert np.abs(got[60000:100000]).mean() < \
        0.45 * np.abs(base[60000:100000]).mean()


def test_fleet_step_returns_device_windows_bit_equal_to_host_merge():
    """VERDICT r4 item 1: ``Fleet.step`` returns a DEVICE array assembled by
    one jitted merge — bit-identical to an explicit host-side merge of the
    two engines' outputs (FLAC truncating int8 quantize, MDFPWM floor-mean,
    channel fit, station permutation, mask zeroing)."""
    import jax

    fl = make_flac(44100, 40, seed=21)
    dfpwm = RNG.integers(0, 256, 12000, dtype=np.uint8).tobytes()
    mdf, _ = make_mdfpwm(2)
    fleet = Fleet([fl, (LaneSpec("dfpwm", 48000), dfpwm), mdf])
    host = Fleet([fl, (LaneSpec("dfpwm", 48000), dfpwm), mdf])
    while True:
        r = fleet.step()
        if r is None:
            assert fleet.done
            break
        w, m, _p = r
        assert isinstance(w, jax.Array)  # device-resident windows
        # explicit host merge over the same step of the twin fleet
        er = host.engine.step()
        hr = host.flac.step()
        exp = np.zeros((3, 48000), np.int8)
        if hr is not None and hr[1][0]:
            exp[0] = np.clip(hr[0][0], -128, 127).astype(np.int8)
        if er is not None:
            ewh = np.asarray(er[0])
            if er[1][0]:
                exp[1] = ewh[0]
            if er[1][1] or er[1][2]:
                exp[2] = np.floor((ewh[1].astype(np.float64)
                                   + ewh[2].astype(np.float64)) / 2)
        np.testing.assert_array_equal(np.asarray(w), exp)


def test_fleet_512_station_scale():
    """512 mixed stations through the one facade dispatch: windows stay
    device-resident, every station decodes, and spot-checked stations are
    bit-equal to their solo references."""
    import jax

    n_st = 512
    dfpwm_srcs = [RNG.integers(0, 256, 6000, dtype=np.uint8).tobytes()
                  for _ in range(4)]
    fl = make_flac(48000, 40, seed=31)
    sources = []
    for i in range(n_st):
        if i % 64 == 0:
            sources.append(fl)
        else:
            sources.append((LaneSpec("dfpwm", 48000), dfpwm_srcs[i % 4]))
    fleet = Fleet(sources)
    outs = [[] for _ in range(n_st)]
    while not fleet.done:
        r = fleet.step()
        if r is None:
            continue
        w, m, _p = r
        assert isinstance(w, jax.Array)
        host = np.asarray(w)  # one fetch per step for the scale assertion
        for i in np.nonzero(m)[0]:
            outs[i].append(host[i])
    assert all(len(o) > 0 for o in outs)
    # spot parity: a DFPWM station vs the engine-DSP reference, FLAC vs solo
    dec = dfpwm_decode_ref(np.frombuffer(dfpwm_srcs[1], np.uint8))
    np.testing.assert_array_equal(np.concatenate(outs[1])[: len(dec)],
                                  fir_48k_f(dec))
    from tests.test_flac_fleet import solo_reference
    exp = np.clip(solo_reference(fl), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(np.concatenate(outs[0])[: len(exp)], exp)


def test_fleet_dsp_passthrough_and_honest_flac_errors():
    """Fleet.set_filter/set_mono/normalize reach engine stations; FLAC
    stations reject loudly rather than silently dropping the request."""
    dfp = RNG.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    fl = make_flac(48000, 4, seed=55)
    fleet = Fleet([(LaneSpec("dfpwm", 48000), dfp), fl])
    fleet.set_filter(0, "lowpass", 9000)
    assert fleet.engine.groups[0].lp_kind[0] == 1
    with pytest.raises(ValueError, match="FLAC"):
        fleet.set_filter(1, "lowpass", 9000)
    with pytest.raises(ValueError, match="FLAC"):
        fleet.normalize(0.8)
    eng_only = Fleet([(LaneSpec("dfpwm", 48000), dfp)])
    eng_only.normalize(0.8)
    outs = collect(eng_only)
    assert outs[0].shape[-1] > 0


# -- station lifecycle + seek (VERDICT r4 item 4) ----------------------------------

def test_fleet_reset_station_rotates_sources():
    """A finished station's lane slots host a NEW source without rebuilding
    the fleet (the radio-server rotation, reference reusable speaker model);
    ``source=None`` replays the retained source. Post-rotation windows are
    bit-equal to a fresh fleet on the new sources."""
    dspec = LaneSpec("dfpwm", 48000)
    dfp_a = RNG.integers(0, 256, 9000, dtype=np.uint8).tobytes()
    dfp_b = RNG.integers(0, 256, 7000, dtype=np.uint8).tobytes()
    wav = ak.tone(440, 1.0, 0.5, "sine", sample_rate=24000).wav(16)
    fl_a = make_flac(48000, 6, seed=60)
    fl_b = make_flac(48000, 9, seed=61)
    mdf_a, _ = make_mdfpwm(2)
    mdf_b, _ = make_mdfpwm(3)

    fleet = Fleet([(dspec, dfp_a), wav, fl_a, mdf_a])
    first = collect(fleet)
    fleet.reset_station(0, (dspec, dfp_b))
    fleet.reset_station(1)          # replay the retained WAV from the start
    fleet.reset_station(2, fl_b)
    fleet.reset_station(3, mdf_b)
    second = collect(fleet)
    fresh = collect(Fleet([(dspec, dfp_b), wav, fl_b, mdf_b]))
    for got, exp in zip(second, fresh):
        np.testing.assert_array_equal(got, exp)
    np.testing.assert_array_equal(second[1], first[1])  # replay == original


def test_fleet_reset_station_guards():
    """Kind and lane-spec mismatches reject loudly (lane slots are fixed at
    construction); live stations with no retained source reject replay."""
    wav = ak.tone(440, 0.5, 0.5, "sine", sample_rate=24000).wav(16)
    fl = make_flac(48000, 4, seed=63)
    fleet = Fleet([wav, fl])
    collect(fleet)
    with pytest.raises(ValueError, match="kind|detects"):
        fleet.reset_station(0, fl)
    with pytest.raises(ValueError, match="spec"):
        fleet.reset_station(0, ak.tone(440, 0.5, 0.5, "sine",
                                       sample_rate=48000).wav(16))
    live = Fleet([wav[:2048]], eof=False)
    with pytest.raises(ValueError, match="retained"):
        live.reset_station(0)


def test_fleet_seek_dfpwm_bit_exact():
    """DFPWM seek reconstructs the out-of-band decoder state from the byte
    prefix (host fast path): post-seek windows are bit-identical to the
    continuous decode from the landing."""
    dspec = LaneSpec("dfpwm", 48000)
    dfp = RNG.integers(0, 256, 24000, dtype=np.uint8).tobytes()  # 4 s
    full = collect(Fleet([(dspec, dfp)]))[0]
    fleet = Fleet([(dspec, dfp)])
    collect(fleet)
    landing = fleet.seek(0, 2.0)
    assert landing == 2.0
    got = collect(fleet)[0]
    np.testing.assert_array_equal(got, full[96000:])
    # seeking an un-drained fleet also works (reposition mid-decode)
    fleet.seek(0, 1.0)
    got1 = collect(fleet)[0]
    np.testing.assert_array_equal(got1, full[48000:])


def test_fleet_seek_mdfpwm_bit_exact():
    """MDFPWM seek repositions BOTH DFPWM lanes (prefix-decoded state) and
    the merged station windows match the continuous decode."""
    data, _ = make_mdfpwm(4)
    full = collect(Fleet([data]))[0]
    fleet = Fleet([data])
    collect(fleet)
    landing = fleet.seek(0, 1.0)
    assert landing == 1.0
    got = collect(fleet)[0]
    np.testing.assert_array_equal(got, full[48000:])


def test_fleet_seek_flac_frame_aligned():
    """FLAC seek lands on a validated frame boundary at or before the target
    (warmup is in-band): post-seek windows equal the solo decode from the
    landing sample."""
    fl = make_flac(48000, 110, seed=62)
    solo = np.clip(solo_reference(fl), -128, 127).astype(np.int8)
    fleet = Fleet([fl])
    collect(fleet)
    landing = fleet.seek(0, 1.0)
    assert 0.0 < landing <= 1.0
    s0 = int(round(landing * 48000))
    got = collect(fleet)[0]
    exp = solo[s0:]
    np.testing.assert_array_equal(got[: len(exp)], exp)
    assert not got[len(exp):].any()  # zero-padded final window only


def test_fleet_seek_wav_pcm_sample_exact():
    """PCM-in-WAV seek is sample-exact: the landing byte offset decodes
    exactly like a fresh lane on the body tail, and matches the continuous
    decode once the 2-tap smoothing rewarms (chunk boundaries align)."""
    wav = ak.tone(440, 3.0, 0.5, "sine", sample_rate=24000).wav(16)
    full = collect(Fleet([wav]))[0]
    fleet = Fleet([wav])
    collect(fleet)
    landing = fleet.seek(0, 2.0)
    assert landing == 2.0
    got = collect(fleet)[0]
    from aukit_tpu.stream.batch_codecs import lane_spec_for_wav

    spec, off, size = lane_spec_for_wav(wav)
    body = wav[off: off + size]
    fresh = collect(Fleet([(spec, body[2 * 24000 * 2:])]))[0]
    np.testing.assert_array_equal(got, fresh)
    # beyond the first chunk the carries agree with the continuous decode
    np.testing.assert_array_equal(got[48000:], full[144000:])
    np.testing.assert_allclose(got[:48000].astype(np.int32),
                               full[96000:144000].astype(np.int32), atol=2)


def test_fleet_seek_qoa_frame_aligned():
    """QOA seek walks the length-prefixed frame headers (LMS state in-band):
    the landing is frame-aligned and post-seek decode matches a fresh lane
    fed from the landing frame."""
    qrate = 10240
    qoa = fixtures.qoa_stream(RNG, 1, qrate, [5120, 5120, 5120])
    fleet = Fleet([qoa])
    collect(fleet)
    landing = fleet.seek(0, 1.0)
    assert landing == 2 * 5120 / qrate  # exactly two frames in
    got = collect(fleet)[0]
    from aukit_tpu.stream.batch_codecs import lane_spec_for_qoa

    spec, off, _sz = lane_spec_for_qoa(qoa)
    pos, _ = __import__("aukit_tpu.stream.seek", fromlist=["qoa_seek"]) \
        .qoa_seek(qoa, 1.0)
    fresh = collect(Fleet([(spec, qoa[pos:])]))[0]
    np.testing.assert_array_equal(got, fresh)


def test_fleet_seek_keeps_volume_and_dsp_config():
    """Seek preserves the lane's volume and DSP CONFIG (filter kind/cutoff)
    while resetting only transient filter state."""
    dspec = LaneSpec("dfpwm", 48000)
    dfp = RNG.integers(0, 256, 12000, dtype=np.uint8).tobytes()
    fleet = Fleet([(dspec, dfp)])
    fleet.set_volume(0, 0.5)
    fleet.set_filter(0, "lowpass", 6000)
    collect(fleet)
    fleet.seek(0, 1.0)
    g = fleet.engine.groups[0]
    assert float(g.gain1[0]) == 0.5
    assert int(g.lp_kind[0]) == 1 and float(g.lp_a[0]) > 0
    ref = Fleet([(dspec, dfp)])
    ref.set_volume(0, 0.5)
    ref.set_filter(0, "lowpass", 6000)
    full = collect(ref)[0]
    got = collect(fleet)[0]
    # filter state rewarms at the landing: equality from the second window
    np.testing.assert_array_equal(got[48000:], full[96000:])
    assert len(got) == len(full) - 48000


def test_fleet_seek_requires_retained_source():
    wav = ak.tone(440, 0.5, 0.5, "sine", sample_rate=24000).wav(16)
    live = Fleet([wav], eof=False)
    with pytest.raises(ValueError, match="eof station"):
        live.seek(0, 0.1)


def test_fleet_seek_mid_play_discards_fifo_remnant():
    """A mid-play seek on a station whose engine group FIFO holds
    undelivered samples must NOT deliver the stale pre-seek audio: the
    lane's FIFO cursor discards its remnant lane-locally (r5 review
    finding), positions restart at the landing, and the sibling station
    sharing the group is bit-unaffected."""
    ba = 256
    p0 = fixtures.ima_wav_blocks(RNG, 40, ba, 1)
    p1 = fixtures.ima_wav_blocks(RNG, 40, ba, 1)
    w0 = fixtures.wav_ima(p0, 8000, 1, ba)
    w1 = fixtures.wav_ima(p1, 8000, 1, ba)
    base = collect(Fleet([w0, w1]))  # undisturbed full timelines

    fleet = Fleet([w0, w1])
    outs1 = []
    for _ in range(2):  # leave the block-codec group's FIFO part-full
        r = fleet.step()
        assert r is not None
        w, m, _pos = r
        if m[1]:
            outs1.append(np.asarray(w)[1])
    gi, _slot = fleet.engine._lane_map[fleet.stations[0].lanes[0]]
    assert fleet.engine.groups[gi].fill > 0  # the hazard is live
    landing = fleet.seek(0, 0.0)
    assert landing == 0.0
    outs0, pos0 = [], []
    guard = 0
    while not fleet.done:
        r = fleet.step()
        guard += 1
        assert guard < 1000
        if r is None:
            continue
        w, m, pos = r
        if m[0]:
            pos0.append(pos[0])
            outs0.append(np.asarray(w)[0])
        if m[1]:
            outs1.append(np.asarray(w)[1])
    got0 = np.concatenate(outs0, axis=-1)
    got1 = np.concatenate(outs1, axis=-1)
    # station 0 re-plays its timeline from the landing bit-exactly with NO
    # stale pre-seek samples in front; its first window reports 0.0 s
    assert pos0[0] == 0.0
    np.testing.assert_array_equal(got0, base[0])
    # the sibling lane in the SAME group is untouched
    np.testing.assert_array_equal(got1, base[1])


def test_fleet_reset_station_mid_play_no_stale_audio():
    """Rotating a station to a new source while its group FIFO is part-full
    discards the old timeline's undelivered samples: the new source plays
    from its first sample (r5 review finding)."""
    ba = 256
    p0 = fixtures.ima_wav_blocks(RNG, 40, ba, 1)
    p1 = fixtures.ima_wav_blocks(RNG, 40, ba, 1)
    p2 = fixtures.ima_wav_blocks(RNG, 40, ba, 1)
    w0 = fixtures.wav_ima(p0, 8000, 1, ba)
    w1 = fixtures.wav_ima(p1, 8000, 1, ba)
    w2 = fixtures.wav_ima(p2, 8000, 1, ba)
    base = collect(Fleet([w2, w1]))  # what the rotated fleet should play

    fleet = Fleet([w0, w1])
    for _ in range(2):
        assert fleet.step() is not None
    gi, _slot = fleet.engine._lane_map[fleet.stations[0].lanes[0]]
    assert fleet.engine.groups[gi].fill > 0
    fleet.reset_station(0, w2)
    outs0 = []
    guard = 0
    while not fleet.done:
        r = fleet.step()
        guard += 1
        assert guard < 1000
        if r is None:
            continue
        w, m, _pos = r
        if m[0]:
            outs0.append(np.asarray(w)[0])
    got0 = np.concatenate(outs0, axis=-1)
    np.testing.assert_array_equal(got0, base[0])
