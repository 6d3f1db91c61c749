"""Codec parity: framework vectorized/batched decoders vs loop reference models."""

import numpy as np
import pytest

import aukit_tpu as ak
from aukit_tpu.codecs.adpcm import decode_ima_adpcm, decode_msadpcm
from aukit_tpu.codecs.dfpwm import (
    DfpwmState,
    decode_dfpwm_bytes,
    dfpwm_decode,
    dfpwm_encode,
    encode_dfpwm_bytes,
)
from aukit_tpu.codecs.g711 import decode_g711
from aukit_tpu.codecs.qoa import decode_qoa
from aukit_tpu.ops import pcmcode

from tests import fixtures
from tests.ref import codecs as refc

RNG = np.random.default_rng(42)


# -- PCM -----------------------------------------------------------------------

@pytest.mark.parametrize("bit_depth", [8, 16, 24, 32])
@pytest.mark.parametrize("data_type", ["signed", "unsigned"])
@pytest.mark.parametrize("big_endian", [False, True])
def test_pcm_bytes_parity(bit_depth, data_type, big_endian):
    raw = RNG.integers(0, 256, 4 * 30, dtype=np.uint8).tobytes()
    got = pcmcode.decode_pcm(raw, bit_depth, data_type, 2, True, big_endian)
    ref = refc.pcm_ref(raw, bit_depth, data_type, 2, True, big_endian)
    np.testing.assert_allclose(got, ref.astype(np.float32), rtol=0, atol=0)


def test_pcm_float_and_planar():
    vals = (RNG.random(64, dtype=np.float64) * 2 - 1).astype("<f4")
    got = pcmcode.decode_pcm(vals.tobytes(), 32, "float", 2, False, False)
    ref = refc.pcm_ref(vals.tobytes(), 32, "float", 2, False, False)
    np.testing.assert_array_equal(got, ref.astype(np.float32))


def test_pcm_table_input_and_loader():
    vals = RNG.integers(-32768, 32767, 100).tolist()
    a = ak.pcm(vals, 16, "signed", 2, 44100)
    ref = refc.pcm_ref(vals, 16, "signed", 2, True)
    np.testing.assert_array_equal(np.asarray(a.data), ref.astype(np.float32))
    assert a.sample_rate == 44100
    assert a.info == {"bitDepth": 16, "dataType": "signed"}


def test_pcm_unsigned_quirk_q1():
    # 16-bit unsigned: the reference biases by 128, not 32768 (quirk Q1)
    vals = [0, 127, 128, 129, 40000]
    got = pcmcode.normalize_pcm(np.array(vals), 16, "unsigned")
    expect = [(v - 128) / (32768.0 if v < 128 else 32767.0) for v in vals]
    np.testing.assert_allclose(got, np.array(expect, np.float32))


def test_encode_pcm_asymmetric_no_round():
    a = ak.new_audio(np.array([[-1.0, -0.5, 0.0, 0.5, 1.0]]), 48000)
    vals = a.pcm(16, "signed")
    np.testing.assert_array_equal(vals, [-32768.0, -16384.0, 0.0, 16383.5, 32767.0])


def test_pack_roundtrip():
    vals = RNG.integers(-(1 << 23), (1 << 23) - 1, 50)
    packed = ak.pack(vals, 24, "signed", big_endian=True)
    back = pcmcode.unpack_pcm(packed, 24, "signed", True)
    np.testing.assert_array_equal(back, vals)


# -- G.711 -----------------------------------------------------------------------

@pytest.mark.parametrize("ulaw", [False, True])
def test_g711_parity(ulaw):
    data = bytes(range(256)) * 3
    got = decode_g711(data, ulaw, channels=2)
    ref = refc.g711_ref(data, ulaw, channels=2)
    np.testing.assert_array_equal(got, ref.astype(np.float32))


def test_g711_loader_quirk_q11():
    a = ak.g711(bytes(100), True, 1, 8000)
    assert a.metadata == {"bitDepth": 14, "dataType": "signed"}
    assert a.info == {}


# -- IMA ADPCM ----------------------------------------------------------------------

def test_ima_parity_interleaved():
    data = RNG.integers(0, 256, 400, dtype=np.uint8).tobytes()
    got = decode_ima_adpcm(data, channels=2, top_first=True, interleaved=True)
    nibs = refc.nibbles_from_bytes(data, top_first=True)
    ref_l = refc.ima_ref(nibs[0::2])
    ref_r = refc.ima_ref(nibs[1::2])
    np.testing.assert_array_equal(got[0], ref_l)
    np.testing.assert_array_equal(got[1], ref_r)


def test_ima_parity_planar_with_state():
    data = RNG.integers(0, 256, 100, dtype=np.uint8).tobytes()
    got = decode_ima_adpcm(data, 2, False, False, predictor=[100, -5000], step_index=[3, 70])
    nibs = refc.nibbles_from_bytes(data, top_first=False)
    half = len(nibs) // 2
    np.testing.assert_array_equal(got[0], refc.ima_ref(nibs[:half], 100, 3))
    np.testing.assert_array_equal(got[1], refc.ima_ref(nibs[half:], -5000, 70))


# -- MS ADPCM -----------------------------------------------------------------------

def test_msadpcm_stereo_parity():
    t = np.arange(4096)
    sig = np.stack([
        (np.sin(t / 30) * 12000).astype(np.int64),
        (np.sin(t / 17 + 1) * 9000).astype(np.int64),
    ])
    data = fixtures.ms_encode(sig, 256)
    got = decode_msadpcm(data, 256, 2)
    ref = refc.msadpcm_ref(data, 256, 2)
    np.testing.assert_array_equal(got, ref)


def test_msadpcm_mono_header_quirk_q4():
    sig = (np.sin(np.arange(4096) / 25) * 11000).astype(np.int64)[None, :]
    data = fixtures.ms_encode(sig, 128)
    got = decode_msadpcm(data, 128, 1)
    ref = refc.msadpcm_ref(data, 128, 1, mono_header_from_first_block=True)
    np.testing.assert_array_equal(got, ref)
    # and the corrected variant differs (if more than one block)
    got_fixed = decode_msadpcm(data, 128, 1, mono_header_from_first_block=False)
    ref_fixed = refc.msadpcm_ref(data, 128, 1, mono_header_from_first_block=False)
    np.testing.assert_array_equal(got_fixed, ref_fixed)


def test_msadpcm_random_nibbles_stereo():
    raw = RNG.integers(0, 256, 256 * 4, dtype=np.uint8)
    # sane headers: delta moderate
    for b in range(4):
        raw[b * 256 : b * 256 + 2] = [RNG.integers(0, 7), RNG.integers(0, 7)]
        raw[b * 256 + 2 : b * 256 + 4] = np.frombuffer(np.int16(200).tobytes(), np.uint8)
        raw[b * 256 + 4 : b * 256 + 6] = np.frombuffer(np.int16(180).tobytes(), np.uint8)
    data = raw.tobytes()
    got = decode_msadpcm(data, 256, 2)
    ref = refc.msadpcm_ref(data, 256, 2)
    np.testing.assert_array_equal(got, ref)


# -- QOA ---------------------------------------------------------------------------

def test_qoa_parity():
    data = fixtures.qoa_stream(RNG, 2, 44100, [5120, 5120, 1000])
    got, rate, total = decode_qoa(data)
    ref, rrate, rtotal = refc.qoa_ref(data)
    assert rate == rrate == 44100
    assert total == rtotal
    np.testing.assert_array_equal(got, ref)


def test_qoa_loader():
    data = fixtures.qoa_stream(RNG, 1, 48000, [2000])
    a = ak.qoa(data)
    ref, _, _ = refc.qoa_ref(data)
    np.testing.assert_array_equal(np.asarray(a.data), refc.norm16(ref).astype(np.float32))


# -- DFPWM ----------------------------------------------------------------------------

def test_dfpwm_decode_parity():
    data = RNG.integers(0, 256, 3000, dtype=np.uint8).tobytes()
    got, _ = decode_dfpwm_bytes(data)
    ref = refc.dfpwm_decode_ref(data)
    np.testing.assert_array_equal(got, ref)


def test_dfpwm_decode_state_continuity():
    data = RNG.integers(0, 256, 2400, dtype=np.uint8).tobytes()
    whole, _ = decode_dfpwm_bytes(data)
    state = DfpwmState.zeros(1)
    parts = []
    for i in range(0, len(data), 600):
        out, state = decode_dfpwm_bytes(data[i : i + 600], state)
        parts.append(out)
    np.testing.assert_array_equal(np.concatenate(parts), whole)


def test_dfpwm_encode_parity():
    levels = RNG.integers(-128, 128, 8 * 500)
    got, _ = encode_dfpwm_bytes(levels)
    ref = refc.dfpwm_encode_ref(levels.tolist())
    assert got == ref


def test_dfpwm_lane_batching_matches_single():
    data = RNG.integers(0, 256, (16, 750), dtype=np.uint8)
    import jax.numpy as jnp

    out, _ = dfpwm_decode(jnp.asarray(data), DfpwmState.zeros(16))
    out = np.asarray(out)
    for lane in range(16):
        single, _ = decode_dfpwm_bytes(data[lane].tobytes())
        np.testing.assert_array_equal(out[lane], single)


def test_dfpwm_roundtrip_quality():
    # silence and a soft tone should round-trip with bounded error
    t = np.arange(48000)
    sig = np.floor(np.sin(t / 40) * 60).astype(np.int32)
    enc, _ = encode_dfpwm_bytes(sig)
    dec, _ = decode_dfpwm_bytes(enc)
    # skip the adaptation warmup, compare RMS
    err = (dec[2000:] - sig[2000:]).astype(np.float64)
    assert np.sqrt((err**2).mean()) < 12.0


def test_dfpwm_audio_encoders():
    a = ak.tone(440, 0.1, 0.5, sample_rate=48000, channels=2)
    inter = a.dfpwm(True)
    planar = a.dfpwm(False)
    assert isinstance(inter, bytes) and len(inter) == 48000 * 2 * 0.1 // 8
    assert isinstance(planar, tuple) and len(planar) == 2


def test_ima_parallel_matches_sequential_scan():
    """The associative-scan IMA formulation must be bit-exact vs lax.scan."""
    import jax.numpy as jnp
    from aukit_tpu.codecs.adpcm import ima_adpcm_parallel, ima_adpcm_scan

    nibs = RNG.integers(0, 16, (7, 1009)).astype(np.int32)
    pred0 = RNG.integers(-32768, 32768, 7).astype(np.int32)
    sidx0 = RNG.integers(0, 89, 7).astype(np.int32)
    seq, (sp, si) = ima_adpcm_scan(jnp.asarray(nibs), jnp.asarray(pred0), jnp.asarray(sidx0))
    par, (pp, pi) = ima_adpcm_parallel(jnp.asarray(nibs), jnp.asarray(pred0), jnp.asarray(sidx0))
    np.testing.assert_array_equal(np.asarray(par), np.asarray(seq))
    np.testing.assert_array_equal(np.asarray(pp), np.asarray(sp))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(si))


def test_native_dfpwm_rows_matches_scan():
    """Host C++ DFPWM decode/encode vs the lax.scan reference, including
    multi-chunk state carry and empty input (the single/few-lane loader and
    stream routing, codecs/dfpwm.py::_routed_decode). Lives here rather
    than test_native.py because the scan reference jits (the ASan sweep of
    test_native.py must stay jit-free)."""
    from aukit_tpu.native import flacbits

    if not flacbits.available():
        import pytest

        pytest.skip("native lib unavailable")
    import jax
    import jax.numpy as jnp

    from aukit_tpu.codecs.dfpwm import DfpwmState, dfpwm_decode, dfpwm_encode

    rng = np.random.default_rng(23)
    L = 3
    st_scan = DfpwmState.zeros(L)
    st_nat = np.zeros((5, L), np.int32)
    for chunk in (rng.integers(0, 256, (L, 613), dtype=np.uint8),
                  rng.integers(0, 256, (L, 200), dtype=np.uint8)):
        exp, st_scan = dfpwm_decode(jnp.asarray(chunk), st_scan)
        got, st_nat = flacbits.dfpwm_decode_rows(chunk, st_nat)
        np.testing.assert_array_equal(got, np.asarray(exp))
    np.testing.assert_array_equal(
        st_nat, np.stack([np.asarray(a) for a in (
            st_scan.charge, st_scan.strength, st_scan.previous_bit,
            st_scan.previous_charge, st_scan.lowpass)]))
    # empty input: no-op, state unchanged
    got, st2 = flacbits.dfpwm_decode_rows(np.zeros((L, 0), np.uint8), st_nat)
    assert got.shape == (L, 0)
    np.testing.assert_array_equal(st2, st_nat)

    lv = rng.integers(-128, 128, (L, 8 * 77)).astype(np.int32)
    st_scan = DfpwmState.zeros(L)
    enc_exp, st_scan = dfpwm_encode(jnp.asarray(lv), st_scan)
    enc_got, st_enc = flacbits.dfpwm_encode_rows(lv, np.zeros((3, L), np.int32))
    np.testing.assert_array_equal(enc_got, np.asarray(enc_exp))
    np.testing.assert_array_equal(
        st_enc, np.stack([np.asarray(a) for a in (
            st_scan.charge, st_scan.strength, st_scan.previous_bit)]))
