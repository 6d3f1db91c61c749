"""Frozen golden-vector corpus: the framework's decoders must reproduce the
committed vectors bit-for-bit (semantic drift protection across rounds; the
corpus generation recipe is tests/make_golden.py)."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "golden.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN), reason="corpus not generated")


@pytest.fixture(scope="module")
def corpus():
    return np.load(GOLDEN)


def test_dfpwm_golden(corpus):
    from aukit_tpu.codecs.dfpwm import decode_dfpwm_bytes, encode_dfpwm_bytes

    out, _ = decode_dfpwm_bytes(corpus["dfpwm_in"].tobytes())
    np.testing.assert_array_equal(out, corpus["dfpwm_out"])
    enc, _ = encode_dfpwm_bytes(corpus["dfpwm_enc_in"])
    np.testing.assert_array_equal(np.frombuffer(enc, np.uint8), corpus["dfpwm_enc_out"])


def test_dfpwm_pallas_golden(corpus):
    import jax

    from aukit_tpu.kernels.dfpwm_pallas import dfpwm_decode_pallas

    out, _ = dfpwm_decode_pallas(
        corpus["dfpwm_in"][None, :], interpret=jax.default_backend() != "tpu"
    )
    np.testing.assert_array_equal(np.asarray(out)[0], corpus["dfpwm_out"].astype(np.int8))


def test_g711_golden(corpus):
    from aukit_tpu.codecs.g711 import decode_g711

    np.testing.assert_array_equal(
        decode_g711(corpus["g711_in"].tobytes(), True, 1)[0], corpus["g711_ulaw_out"].astype(np.float32)
    )
    np.testing.assert_array_equal(
        decode_g711(corpus["g711_in"].tobytes(), False, 1)[0], corpus["g711_alaw_out"].astype(np.float32)
    )


def test_ima_golden(corpus):
    from aukit_tpu.codecs.adpcm import decode_ima_adpcm

    out = decode_ima_adpcm(
        corpus["ima_in"].tobytes(), 1, True, True, predictor=[123], step_index=[17]
    )
    np.testing.assert_array_equal(out[0], corpus["ima_out"])


def test_ms_golden(corpus):
    from aukit_tpu.codecs.adpcm import decode_msadpcm

    out = decode_msadpcm(corpus["ms_in"].tobytes(), 256, 2)
    np.testing.assert_array_equal(out, corpus["ms_out"])


def test_qoa_golden(corpus):
    from aukit_tpu.codecs.qoa import decode_qoa

    out, _, _ = decode_qoa(corpus["qoa_in"].tobytes())
    np.testing.assert_array_equal(out, corpus["qoa_out"])
