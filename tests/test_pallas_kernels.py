"""Pallas kernel parity (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest
import jax

from aukit_tpu.codecs.dfpwm import DfpwmState, dfpwm_decode, dfpwm_encode
from aukit_tpu.kernels import dfpwm_pallas as kp

RNG = np.random.default_rng(99)

INTERPRET = jax.default_backend() != "tpu"


def test_pallas_decode_matches_scan():
    L, B = 5, kp.TIME_TILE * 2 + 100  # force padding in both dims
    data = RNG.integers(0, 256, (L, B), dtype=np.uint8)
    got, gst = kp.dfpwm_decode_pallas(data, interpret=INTERPRET)
    import jax.numpy as jnp

    ref, rst = dfpwm_decode(jnp.asarray(data), DfpwmState.zeros(L))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref).astype(np.int8))
    for f in ("charge", "strength", "previous_bit", "previous_charge", "lowpass"):
        np.testing.assert_array_equal(np.asarray(getattr(gst, f)), np.asarray(getattr(rst, f)))


def test_pallas_decode_state_continuity():
    L, B = 3, kp.TIME_TILE
    d1 = RNG.integers(0, 256, (L, B), dtype=np.uint8)
    d2 = RNG.integers(0, 256, (L, B), dtype=np.uint8)
    o1, st = kp.dfpwm_decode_pallas(d1, interpret=INTERPRET)
    o2, _ = kp.dfpwm_decode_pallas(d2, st, interpret=INTERPRET)
    whole, _ = kp.dfpwm_decode_pallas(np.concatenate([d1, d2], axis=1), interpret=INTERPRET)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(o1), np.asarray(o2)], axis=1), np.asarray(whole)
    )


def test_pallas_encode_matches_scan():
    L, N = 4, kp.TIME_TILE * 8
    levels = RNG.integers(-128, 128, (L, N)).astype(np.int32)
    got, gst = kp.dfpwm_encode_pallas(levels, interpret=INTERPRET)
    import jax.numpy as jnp

    ref, rst = dfpwm_encode(jnp.asarray(levels), DfpwmState.zeros(L))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    for f in ("charge", "strength", "previous_bit"):
        np.testing.assert_array_equal(np.asarray(getattr(gst, f)), np.asarray(getattr(rst, f)))


def test_pallas_roundtrip():
    L, N = 2, kp.TIME_TILE * 8 * 4
    t = np.arange(N)
    sig = np.stack([np.floor(np.sin(t / 40) * 60), np.floor(np.cos(t / 25) * 50)]).astype(np.int32)
    enc, _ = kp.dfpwm_encode_pallas(sig, interpret=INTERPRET)
    dec, _ = kp.dfpwm_decode_pallas(np.asarray(enc), interpret=INTERPRET)
    skip = 2000  # adaptation warmup
    err = np.asarray(dec)[:, skip:].astype(np.float64) - sig[:, skip:]
    assert err.size > 0
    assert np.sqrt((err**2).mean()) < 12.0


def test_msadpcm_pallas_matches_scan():
    from aukit_tpu.codecs.adpcm import msadpcm_scan
    from aukit_tpu.kernels import msadpcm_pallas as mp
    import jax.numpy as jnp

    L, T = 9, mp.TIME_TILE * 2 + 0  # padding exercised via lanes, T tile-aligned
    nibs = RNG.integers(-8, 8, (L, T)).astype(np.int32)
    s1 = RNG.integers(-2000, 2000, L).astype(np.int32)
    s2 = RNG.integers(-2000, 2000, L).astype(np.int32)
    # include negative header deltas: the signed value is used raw for the
    # first sample (the >=16 floor only applies from the first update)
    delta = RNG.integers(-400, 400, L).astype(np.int32)
    c1 = np.full(L, 256, np.int32)
    c2 = np.full(L, -208, np.int32)
    got, fin = mp.msadpcm_decode_pallas(nibs, s1, s2, delta, c1, c2, interpret=INTERPRET)
    ref = msadpcm_scan(
        jnp.asarray(nibs), jnp.asarray(c1), jnp.asarray(c2),
        jnp.asarray(delta), jnp.asarray(s1), jnp.asarray(s2),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_msadpcm_pallas_ragged_time():
    """n_valid masking: unaligned T must not corrupt final state."""
    from aukit_tpu.codecs.adpcm import msadpcm_scan
    from aukit_tpu.kernels import msadpcm_pallas as mp
    import jax.numpy as jnp

    L, T = 3, mp.TIME_TILE + 123
    nibs = RNG.integers(-8, 8, (L, T)).astype(np.int32)
    z16 = np.full(L, 64, np.int32)
    zero = np.zeros(L, np.int32)
    c1 = np.full(L, 512, np.int32)
    c2 = np.full(L, -256, np.int32)
    got, fin = mp.msadpcm_decode_pallas(nibs, zero, zero, z16, c1, c2, interpret=INTERPRET)
    ref = msadpcm_scan(jnp.asarray(nibs), jnp.asarray(c1), jnp.asarray(c2),
                       jnp.asarray(z16), jnp.asarray(zero), jnp.asarray(zero))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ima_pallas_matches_scan():
    from aukit_tpu.codecs.adpcm import ima_adpcm_scan
    from aukit_tpu.kernels import ima_pallas as ip
    import jax.numpy as jnp

    L, T = 7, ip.TIME_TILE + 77  # ragged time exercises n_valid masking
    nibs = RNG.integers(0, 16, (L, T)).astype(np.int32)
    pred = RNG.integers(-30000, 30000, L).astype(np.int32)
    sidx = RNG.integers(0, 89, L).astype(np.int32)
    got, (fp, fi) = ip.ima_decode_pallas(nibs, pred, sidx, interpret=INTERPRET)
    ref, (rp, ri) = ima_adpcm_scan(jnp.asarray(nibs), jnp.asarray(pred), jnp.asarray(sidx))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(rp))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ri))


def test_qoa_pallas_matches_scan():
    from aukit_tpu.codecs.qoa import qoa_lms_scan
    from aukit_tpu.kernels import qoa_pallas as qp
    import jax.numpy as jnp

    L, T = 6, qp.TIME_TILE + 137  # ragged time exercises n_valid masking
    dq = RNG.integers(-14336, 14337, (L, T)).astype(np.int32)
    hist = RNG.integers(-32768, 32768, (L, 4)).astype(np.int32)
    wts = RNG.integers(-30000, 30000, (L, 4)).astype(np.int32)
    got, (gh, gw) = qp.qoa_lms_pallas(dq, hist, wts, interpret=INTERPRET)
    ref, (rh, rw) = qoa_lms_scan(jnp.asarray(dq), jnp.asarray(hist), jnp.asarray(wts))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(gh), np.asarray(rh))
    np.testing.assert_array_equal(np.asarray(gw), np.asarray(rw))


def test_qoa_pallas_weight_wraparound():
    """The predictor sum wraps int32 (reference bit32 coercion) — the kernel
    must match the scan on adversarial states that overflow."""
    from aukit_tpu.codecs.qoa import qoa_lms_scan
    from aukit_tpu.kernels import qoa_pallas as qp
    import jax.numpy as jnp

    L, T = 2, qp.TIME_TILE
    dq = np.full((L, T), 14336, np.int32)
    dq[:, ::2] = -14336
    hist = np.full((L, 4), 32767, np.int32)
    wts = np.full((L, 4), 2_000_000_00, np.int32)  # forces wraparound products
    got, _ = qp.qoa_lms_pallas(dq, hist, wts, interpret=INTERPRET)
    ref, _ = qoa_lms_scan(jnp.asarray(dq), jnp.asarray(hist), jnp.asarray(wts))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
