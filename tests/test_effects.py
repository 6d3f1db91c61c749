"""Effects suite parity vs loop reference models."""

import numpy as np
import pytest

import aukit_tpu as ak
from aukit_tpu import effects as fx

from tests.ref import effects as ref

RNG = np.random.default_rng(31)


def make_audio(channels=2, n=4000, rate=2000, scale=0.6):
    data = ((RNG.random((channels, n)) * 2 - 1) * scale).astype(np.float32)
    return ak.new_audio(data.copy(), rate), [list(map(float, row)) for row in data]


def assert_close(audio, chans, atol=2e-6):
    got = np.asarray(audio.data)
    exp = np.array(chans, np.float64).astype(np.float32)
    np.testing.assert_allclose(got, exp, rtol=0, atol=atol)


def test_amplify():
    a, chans = make_audio()
    fx.amplify(a, 1.7)
    assert_close(a, ref.amplify_ref(chans, 1.7))


def test_amplify_identity_inplace_contract():
    a, _ = make_audio()
    before = np.asarray(a.data).copy()
    out = fx.amplify(a, 1)
    assert out is a
    np.testing.assert_array_equal(np.asarray(out.data), before)


def test_fade():
    a, chans = make_audio(rate=1000)
    fx.fade(a, 1, 1.0, 3, 0.25)
    assert_close(a, ref.fade_ref(chans, 1000, 1, 1.0, 3, 0.25))


def test_invert():
    a, chans = make_audio()
    fx.invert(a)
    assert_close(a, [[-v for v in ch] for ch in chans])


@pytest.mark.parametrize("independent", [False, True])
def test_normalize(independent):
    a, chans = make_audio()
    fx.normalize(a, 0.9, independent)
    assert_close(a, ref.normalize_ref(chans, 0.9, independent))


def test_normalize_silence_no_nan():
    a = ak.new(0.01, 1, 48000)
    fx.normalize(a, 1.0)
    assert np.isfinite(np.asarray(a.data)).all()


def test_center():
    a, chans = make_audio(n=5500, rate=2000)
    fx.center(a)
    assert_close(a, ref.center_ref(chans, 2000))


def test_trim():
    data = np.zeros((1, 1000), np.float32)
    data[0, 100:900] = 0.5
    a = ak.new_audio(data, 48000)
    fx.trim(a)
    assert a.num_samples == 800


def test_delay():
    a, chans = make_audio(rate=1000)
    fx.delay(a, 0.5, 0.4)
    assert_close(a, ref.delay_ref(chans, 1000, 0.5, 0.4))


def test_echo():
    a, chans = make_audio(rate=1000)
    fx.echo(a, 0.25, 0.6)
    assert_close(a, ref.echo_ref(chans, 1000, 0.25, 0.6))


def test_lowpass():
    a, chans = make_audio(rate=8000, n=6000)
    fx.lowpass(a, 1000)
    # associative scan reassociates float ops: tolerance covers 1e-6-level noise
    assert_close(a, ref.lowpass_ref(chans, 8000, 1000), atol=5e-6)


def test_highpass():
    a, chans = make_audio(rate=8000, n=6000)
    fx.highpass(a, 1000)
    assert_close(a, ref.highpass_ref(chans, 8000, 1000), atol=5e-6)


def test_reverb():
    a, chans = make_audio(channels=1, n=9000, rate=8000, scale=0.2)
    fx.reverb(a, 100, 0.3, 1.0, 0.0)
    assert_close(a, ref.reverb_ref(chans, 8000, 100, 0.3, 1.0, 0.0), atol=2e-5)


def test_speed():
    a, _ = make_audio(rate=8000, n=8000)
    before = a.num_samples
    fx.speed(a, 2.0)
    assert abs(a.num_samples - before // 2) <= 1
    assert a.sample_rate == 8000
