"""Audio object semantics and resample parity vs the loop reference."""

import numpy as np
import pytest

import aukit_tpu as ak
from aukit_tpu.ops.resample import resample_audio_array

from tests.ref.resample import resample_ref

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("mode", ["none", "linear", "cubic", "sinc"])
@pytest.mark.parametrize("rates", [(24000, 48000), (44100, 48000), (48000, 8000), (32000, 44100)])
def test_resample_parity(mode, rates):
    src, dst = rates
    chan = (RNG.random(997) * 2 - 1).astype(np.float32).astype(np.float64)
    got = np.asarray(resample_audio_array(np.array([chan], np.float32), src, dst, mode))[0]
    ref = resample_ref(list(chan), src, dst, mode)
    assert len(got) == len(ref)
    # sinc sums 61 taps in f32 on device (f64 in the loop model): allow
    # accumulation-order noise there; the other modes are exact to f32 rounding
    atol = 2e-6 if mode in ("sinc", "cubic") else 3e-7
    np.testing.assert_allclose(got, np.array(ref, np.float32), rtol=0, atol=atol)


def test_resample_identity_passthrough():
    a = ak.noise(0.01, 1.0, 1, 48000, seed=1)
    b = a.resample(96000).resample(48000)
    assert b.num_samples == a.num_samples


def test_mono_mean():
    a = ak.new_audio(np.array([[1.0, 0.0], [0.0, 1.0]]), 48000)
    np.testing.assert_allclose(np.asarray(a.mono().data), [[0.5, 0.5]])


def test_concat_channels_and_resample():
    a = ak.new_audio(np.ones((2, 10)), 48000)
    b = ak.new_audio(np.zeros((1, 5)), 48000)
    c = a.concat(b)
    assert c.channels == 2 and c.num_samples == 15
    # missing channel zero-filled
    np.testing.assert_array_equal(np.asarray(c.data[1, 10:]), np.zeros(5))


def test_sub_seconds_conventions():
    a = ak.new_audio(np.arange(10 * 100, dtype=np.float32)[None, :] / 2000, 100)
    s = a.sub(2, 4)
    assert s.num_samples == 201  # inclusive like the reference
    s2 = a.sub(-3, 0)
    # the reference's inclusive end falls one past the data at last==len,
    # yielding a nil entry, i.e. 300 real samples
    assert s2.num_samples == 300
    np.testing.assert_array_equal(np.asarray(s2.data), np.asarray(a.data)[:, 700:1000])


def test_combine_split_mix_rep_reverse():
    a = ak.new_audio(np.ones((1, 8)) * 0.25, 48000)
    b = ak.new_audio(np.ones((1, 4)) * 0.5, 48000)
    c = a.combine(b)
    assert c.channels == 2
    np.testing.assert_array_equal(np.asarray(c.data[1]), [0.5] * 4 + [0.0] * 4)
    l, r = c.split([1], [2])
    assert l.channels == r.channels == 1
    m = a.mix(2.0, b)
    np.testing.assert_allclose(np.asarray(m.data[0]), [1.0] * 4 + [0.5] * 4)  # clipped
    m2 = a.mix(b)  # audio as amplifier -> amp 1
    np.testing.assert_allclose(np.asarray(m2.data[0]), [0.75] * 4 + [0.25] * 4)
    assert (a * 3).num_samples == 24
    rv = a.reverse()
    np.testing.assert_array_equal(np.asarray(rv.data), np.asarray(a.data)[:, ::-1])


def test_operators():
    a = ak.new_audio(np.ones((1, 4)), 48000)
    b = ak.new_audio(np.zeros((1, 4)), 48000)
    assert (a + b).channels == 2
    assert (a * 2).num_samples == 8
    assert len(a) == 4 and abs(a.duration - 4 / 48000) < 1e-12


def test_tone_generators_match_formulas():
    for wt in ("sine", "triangle", "square", "sawtooth"):
        a = ak.tone(440, 0.01, 0.8, wt, 0.3, 1, 48000)
        assert a.num_samples == 480
        x = np.arange(1, 481) / 48000.0
        if wt == "sine":
            ref = np.sin(2 * x * np.pi * 440) * 0.8
        elif wt == "triangle":
            ref = 2 * np.abs(0.8 * np.fmod(2 * x * 440 + 1.5, 2.0) - 0.8) - 0.8
        elif wt == "square":
            ref = np.where((x * 440) % 1 >= 0.3, -0.8, 0.8)
        else:
            ref = 0.8 * np.fmod(2 * x * 440 + 1.0, 2.0) - 0.8
        np.testing.assert_allclose(np.asarray(a.data)[0], ref.astype(np.float32), atol=1e-6)


def test_audio_stream_chunks():
    a = ak.tone(100, 1.0, 0.5, sample_rate=4800)
    it, length = a.stream(1000, 16, "signed")
    assert abs(length - 1.0) < 1e-9
    chunks = list(it)
    assert len(chunks) == 5
    vals, pos = chunks[1]
    assert pos == 1000 / 4800
    assert vals.shape == (1, 1000)


def test_pytree_roundtrip():
    import jax

    a = ak.tone(440, 0.01)
    leaves, treedef = jax.tree_util.tree_flatten(a)
    b = jax.tree_util.tree_unflatten(treedef, leaves)
    assert b.sample_rate == a.sample_rate
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
