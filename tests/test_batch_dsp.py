"""Per-lane DSP stages on the batched decode engine (VERDICT r4 item 3):
the auplay pipeline — mono -> normalize -> one-pole filter at native rate
(auplay.lua:20-31) — batched across lanes, with chunk-carried filter state.
"""

import math

import numpy as np
import pytest

import aukit_tpu as ak
from aukit_tpu.stream.batch import BatchStreamEngine, LaneSpec
from tests.test_batch import dsp_ref, norm16f

RNG = np.random.default_rng(7)


def seq_filter(x, kind, a):
    """Sequential f64 oracle of the reference one-pole filters
    (aukit.lua:3586 lowpass / :3604 highpass), y[0] = x[0]."""
    y = np.zeros_like(x, np.float64)
    y[0] = x[0]
    for i in range(1, len(x)):
        if kind == "lowpass":
            y[i] = y[i - 1] + a * (x[i] - y[i - 1])
        else:
            y[i] = a * (y[i - 1] + x[i] - x[i - 1])
    return y


def fir_quant(x):
    """Identity-rate dsp_chain epilogue: one-pole FIR + int8 quantize."""
    x = np.asarray(x, np.float64)
    alpha = 1.0 - math.exp(-0.5 * 2 * math.pi)
    prev = np.concatenate([[0.0], x[:-1]])
    out = prev + alpha * (x - prev)
    out = out * np.where(out < 0, 128.0, 127.0)
    return np.clip(out, -128, 127).astype(np.int8)


def run_lanes(engine, n):
    outs = [[] for _ in range(n)]
    while True:
        r = engine.step()
        if r is None:
            break
        chunk, mask, _ = r
        host = np.asarray(chunk)
        for i in range(n):
            if mask[i]:
                outs[i].append(host[i])
    return [np.concatenate(o, axis=-1) for o in outs]


def mostly_equal(got, exp, frac=0.99, tol=1):
    got = np.asarray(got, np.int32)
    exp = np.asarray(exp, np.int32)
    assert np.abs(got - exp).max() <= tol
    assert (got == exp).mean() >= frac


@pytest.mark.parametrize("kind", ["lowpass", "highpass"])
def test_lane_filter_matches_sequential_oracle(kind):
    """A filtered pcm16 lane tracks the sequential f64 reference filter
    through the int8 quantize (associative-scan reassociation stays within
    1 LSB — the documented effects.lowpass tolerance), across chunk
    boundaries (the 2.5 s feed spans three carried-state chunks)."""
    n = int(48000 * 2.5)
    sig = (np.sin(np.arange(n) / 13.0) * 18000
           + np.sin(np.arange(n) / 271.0) * 9000).astype(np.int16)
    cutoff = 2000.0
    eng = BatchStreamEngine([LaneSpec("pcm16", 48000)], windowed=True)
    eng.set_filter(0, kind, cutoff)
    eng.feed(0, sig.astype("<i2").tobytes())
    eng.feed(0, None)
    got = run_lanes(eng, 1)[0]

    f = norm16f(sig.astype(np.int64)).astype(np.float64)
    a = (1.0 - math.exp(-(cutoff / 48000) * 2 * math.pi) if kind == "lowpass"
         else 1.0 / (2 * math.pi * (cutoff / 48000) + 1.0))
    exp = fir_quant(seq_filter(f, kind, a))
    mostly_equal(got[: len(exp)], exp)
    # the zero-padded final window rings the filter down to silence
    assert np.abs(got[-1000:].astype(np.int32)).max() <= 2


def test_lane_filter_batch_invariance():
    """The filtered lane's output is identical whether it decodes alone or
    beside unfiltered lanes (per-lane DSP is lane-elementwise)."""
    n = 48000 * 2
    sig = (np.cos(np.arange(n) / 7.0) * 15000).astype(np.int16)
    other = RNG.integers(-20000, 20000, n, dtype=np.int16)

    solo = BatchStreamEngine([LaneSpec("pcm16", 48000)], windowed=True)
    solo.set_filter(0, "lowpass", 4000)
    solo.feed(0, sig.astype("<i2").tobytes())
    solo.feed(0, None)
    a = run_lanes(solo, 1)[0]

    batch = BatchStreamEngine([LaneSpec("pcm16", 48000)] * 3, windowed=True)
    batch.set_filter(1, "lowpass", 4000)
    for i, s in enumerate((other, sig, other)):
        batch.feed(i, s.astype("<i2").tobytes())
        batch.feed(i, None)
    b = run_lanes(batch, 3)
    np.testing.assert_array_equal(a, b[1])
    # and the unfiltered lanes are bit-equal to a DSP-free engine (the
    # with_dsp step with kind 0 / gain 1 is the identity on them)
    plain = BatchStreamEngine([LaneSpec("pcm16", 48000)], windowed=True)
    plain.feed(0, other.astype("<i2").tobytes())
    plain.feed(0, None)
    np.testing.assert_array_equal(run_lanes(plain, 1)[0], b[0])


def test_lane_lowpass_matches_effects_lowpass():
    """Fleet lane with lowpass(f) vs the solo chain ``decode ->
    effects.lowpass -> playback DSP``: the engine's in-step filter is the
    same associative-scan recurrence effects.lowpass evaluates, so the int8
    streams agree within 1 LSB."""
    n = 48000 * 2
    sig = (np.sin(np.arange(n) / 29.0) * 24000).astype(np.int16)
    cutoff = 6000.0
    eng = BatchStreamEngine([LaneSpec("pcm16", 48000)], windowed=True)
    eng.set_filter(0, "lowpass", cutoff)
    eng.feed(0, sig.astype("<i2").tobytes())
    eng.feed(0, None)
    got = run_lanes(eng, 1)[0]

    audio = ak.new_audio(norm16f(sig.astype(np.int64))[None], 48000)
    ak.effects.lowpass(audio, cutoff)
    exp = fir_quant(np.asarray(audio.data)[0].astype(np.float64))
    mostly_equal(got[: len(exp)], exp)


def test_engine_normalize_two_pass():
    """engine.normalize(0.8): per-lane whole-file peak measured over a
    snapshot (buffers untouched), gains match effects.normalize, and the
    decoded output hits the target amplitude."""
    n = 48000 * 2
    quiet = (np.sin(np.arange(n) / 11.0) * 3000).astype(np.int16)
    loud = (np.sin(np.arange(n) / 17.0) * 30000).astype(np.int16)
    eng = BatchStreamEngine([LaneSpec("pcm16", 48000)] * 2, windowed=True)
    for i, s in enumerate((quiet, loud)):
        eng.feed(i, s.astype("<i2").tobytes())
        eng.feed(i, None)
    eng.normalize(0.8)
    for i, s in enumerate((quiet, loud)):
        peak = np.abs(norm16f(s.astype(np.int64))).max()
        assert np.isclose(eng.groups[0].norm_gain[i], 0.8 / peak, rtol=1e-6)
    outs = run_lanes(eng, 2)
    for o in outs:
        assert len(o) == n  # buffers were untouched by the measurement
        peak8 = np.abs(o.astype(np.int32)).max()
        assert 0.74 * 127 <= peak8 <= 0.82 * 128


def test_engine_normalize_requires_eof():
    eng = BatchStreamEngine([LaneSpec("pcm16", 48000)], windowed=True)
    eng.feed(0, b"\x00\x00" * 100)
    with pytest.raises(ValueError, match="fed to EOF"):
        eng.normalize(0.8)


def test_lane_mono_toggle_multichannel():
    """mono=False engine: a toggled stereo lane emits its channel mean on
    every channel; untouched lanes keep distinct channels."""
    n = 48000
    left = (np.sin(np.arange(n) / 9.0) * 20000).astype(np.int16)
    right = (np.cos(np.arange(n) / 31.0) * 12000).astype(np.int16)
    inter = np.stack([left, right], axis=1).reshape(-1).astype("<i2").tobytes()
    eng = BatchStreamEngine([LaneSpec("pcm16", 48000, 2)] * 2, mono=False,
                            windowed=True)
    eng.set_mono(0, True)
    for i in range(2):
        eng.feed(i, inter)
        eng.feed(i, None)
    outs = run_lanes(eng, 2)
    np.testing.assert_array_equal(outs[0][0], outs[0][1])  # mixed everywhere
    assert not np.array_equal(outs[1][0], outs[1][1])      # stereo preserved
    # the mix is the mean of the untouched lane's channels through the DSP
    f = norm16f(np.stack([left, right]).astype(np.int64)).mean(axis=0)
    exp = fir_quant(f.astype(np.float64))
    mostly_equal(outs[0][0][: len(exp)], exp)


def test_auplay_pipeline_fleet_wide():
    """The full auplay chain (mono + normalize(0.8) + lowpass(rate/2)) runs
    across a mixed fleet in one engine; every lane lands at the normalized
    amplitude with its filter applied."""
    n = 24000 * 2
    s16 = (np.sin(np.arange(n) / 5.0) * 8000).astype(np.int16)
    dfp = RNG.integers(0, 256, 6000 * 2, dtype=np.uint8).tobytes()
    eng = BatchStreamEngine(
        [LaneSpec("pcm16", 24000), LaneSpec("dfpwm", 48000)], windowed=True)
    for lane in range(2):
        eng.set_mono(lane, True)
        rate = eng.specs[lane].sample_rate
        eng.set_filter(lane, "lowpass", rate / 2)
    for lane, d in enumerate((s16.astype("<i2").tobytes(), dfp)):
        eng.feed(lane, d)
        eng.feed(lane, None)
    eng.normalize(0.8)
    outs = run_lanes(eng, 2)
    for o in outs:
        assert len(o) > 48000
        peak8 = np.abs(o.astype(np.int32)).max()
        assert peak8 >= 0.5 * 127  # normalized up; lowpass attenuates some


def test_engine_dsp_checkpoint_resume():
    """Filter + normalize + mono settings and carried filter state survive
    checkpoint/restore: resumed output equals the uninterrupted run."""
    n = 48000 * 3
    sig = (np.sin(np.arange(n) / 21.0) * 15000).astype(np.int16)
    data = sig.astype("<i2").tobytes()

    full = BatchStreamEngine([LaneSpec("pcm16", 48000)], windowed=True)
    full.set_filter(0, "lowpass", 3000)
    full.feed(0, data)
    full.feed(0, None)
    ref = run_lanes(full, 1)[0]

    eng = BatchStreamEngine([LaneSpec("pcm16", 48000)], windowed=True)
    eng.set_filter(0, "lowpass", 3000)
    eng.feed(0, data[: 2 * 48000])
    r = eng.step()
    head = np.asarray(r[0])[0]
    ck = eng.checkpoint(0)
    assert ck["dsp"]["kind"] == 1 and ck["dsp"]["started"]

    eng2 = BatchStreamEngine([LaneSpec("pcm16", 48000)], windowed=True)
    eng2.restore(0, ck)
    eng2.feed(0, data[ck["byte_offset"] + len(ck["pending"]):])
    eng2.feed(0, None)
    tail = run_lanes(eng2, 1)[0]
    np.testing.assert_array_equal(np.concatenate([head, tail]), ref)


def test_engine_dsp_mesh_bit_parity():
    """The with_dsp step under shard_map == unsharded, bit-for-bit (mixed
    filtered/unfiltered lanes whose count does not divide the mesh)."""
    from aukit_tpu.parallel.pipeline import make_mesh

    n = 48000
    sigs = [(np.sin(np.arange(n) / (7 + 4 * i)) * 20000).astype(np.int16)
            for i in range(3)]

    def run(mesh):
        eng = BatchStreamEngine([LaneSpec("pcm16", 48000)] * 3, mesh=mesh,
                                windowed=True)
        eng.set_filter(0, "lowpass", 2000)
        eng.set_filter(2, "highpass", 500)
        eng.set_volume(1, 0.7)
        for i, s in enumerate(sigs):
            eng.feed(i, s.astype("<i2").tobytes())
            eng.feed(i, None)
        eng.normalize(0.8)
        return run_lanes(eng, 3)

    plain, sharded = run(None), run(make_mesh(8))
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(a, b)


def test_set_filter_mid_stream_starts_fresh_recurrence():
    """Enabling a filter on a lane that already stepped inside a DSP-active
    group (normalize-only here) starts a FRESH recurrence: the next chunk
    gets the reference's y[0]=x[0] first-sample pass-through instead of
    chaining from another epoch's (or zero) carried state (r5 review
    finding: filt_started was set for every ready lane of the group)."""
    n = 48000 * 2
    sig = (np.sin(np.arange(n) / 13.0) * 15000
           + np.sin(np.arange(n) / 301.0) * 8000).astype(np.int16)
    cutoff = 2000.0
    eng = BatchStreamEngine([LaneSpec("pcm16", 48000)], windowed=True)
    eng.feed(0, sig.astype("<i2").tobytes())
    eng.feed(0, None)
    eng.normalize(0.8)  # makes the group's step DSP-active from chunk 1
    r1 = eng.step()     # chunk 1 decodes with no filter on the lane
    assert r1 is not None and bool(r1[1][0])
    eng.set_filter(0, "lowpass", cutoff)
    chunks = [np.asarray(r1[0])[0]]
    while True:
        r = eng.step()
        if r is None:
            break
        if r[1][0]:
            chunks.append(np.asarray(r[0])[0])
    got = np.concatenate(chunks)[:n]

    f = norm16f(sig.astype(np.int64)).astype(np.float64)
    g = 0.8 / np.abs(f).max()
    gf = g * f
    a = 1.0 - math.exp(-(cutoff / 48000) * 2 * math.pi)
    # chunk 1 unfiltered; chunk 2's filter starts fresh (y[0] = x[0]);
    # the playback FIR carries across the boundary as usual
    pre_fir = np.concatenate([gf[:48000],
                              seq_filter(gf[48000:], "lowpass", a)])
    exp = fir_quant(pre_fir)
    mostly_equal(got, exp)


def test_set_filter_reconfigure_resets_transient_state():
    """Re-configuring an ACTIVE filter (new cutoff) also restarts the
    recurrence — the old epoch's carried y/x state must not leak into the
    new filter's first chunk."""
    n = 48000 * 2
    sig = (np.cos(np.arange(n) / 9.0) * 14000).astype(np.int16)
    eng = BatchStreamEngine([LaneSpec("pcm16", 48000)], windowed=True)
    eng.set_filter(0, "lowpass", 8000)
    eng.feed(0, sig.astype("<i2").tobytes())
    eng.feed(0, None)
    r1 = eng.step()
    assert r1 is not None and bool(r1[1][0])
    eng.set_filter(0, "lowpass", 1000)
    chunks = [np.asarray(r1[0])[0]]
    while True:
        r = eng.step()
        if r is None:
            break
        if r[1][0]:
            chunks.append(np.asarray(r[0])[0])
    got = np.concatenate(chunks)[:n]

    f = norm16f(sig.astype(np.int64)).astype(np.float64)
    a1 = 1.0 - math.exp(-(8000 / 48000) * 2 * math.pi)
    a2 = 1.0 - math.exp(-(1000 / 48000) * 2 * math.pi)
    pre_fir = np.concatenate([seq_filter(f[:48000], "lowpass", a1),
                              seq_filter(f[48000:], "lowpass", a2)])
    exp = fir_quant(pre_fir)
    mostly_equal(got, exp)
