"""Fuzz: malformed inputs must fail predictably (ValueError family), never
crash with internal errors, and never kill a batch (SURVEY.md §5.3)."""

import numpy as np
import pytest

import aukit_tpu as ak
from aukit_tpu.codecs.flac import FlacError

RNG = np.random.default_rng(2024)

PARSERS = [ak.wav, ak.aiff, ak.au, ak.flac, ak.qoa, ak.mdfpwm]


@pytest.mark.parametrize("seed", range(8))
def test_random_garbage(seed):
    rng = np.random.default_rng(seed)
    data = bytes(rng.integers(0, 256, int(rng.integers(0, 4000)), dtype=np.uint8))
    for parser in PARSERS:
        try:
            parser(data)
        except (ValueError, IndexError, KeyError, EOFError, AssertionError):
            pass  # controlled rejection
    ak.detect(data)  # detect never raises


def test_truncations_of_valid_files():
    from tests import fixtures

    sig = RNG.integers(-3000, 3000, (2, 400))
    files = {
        ak.wav: fixtures.wav_pcm(sig, 44100, 16),
        ak.aiff: fixtures.aiff_file(sig.T.reshape(-1).astype(">i2").tobytes(), 2, 44100, 16),
        ak.au: fixtures.au_file(sig.reshape(-1).astype(">i2").tobytes(), 3, 8000, 2),
        ak.qoa: fixtures.qoa_stream(RNG, 1, 48000, [1000]),
    }
    for parser, data in files.items():
        for cut in (1, 4, 11, len(data) // 3, len(data) - 3):
            try:
                parser(data[:cut])
            except (ValueError, IndexError, KeyError, EOFError, AssertionError, KeyboardInterrupt):
                pass


def test_flac_malformed_headers():
    from tests import fixtures

    good = fixtures.flac_stream_header(48000, 1, 16, 100)
    with pytest.raises(FlacError):
        ak.flac(b"NOPE" + good[4:])
    # depth not multiple of 8 -> reference errors
    bad_depth = bytearray(good)
    # depth bits live in the packed STREAMINFO; easiest: build a 12-bit header
    hdr = fixtures.flac_stream_header(48000, 1, 16, 0)
    b = bytearray(hdr)
    # flip depth-1 field (bits 36..40 of the packed word at offset 8+10)... use
    # the API instead: construct via parse of a 12-bit header
    packed = (48000 << 44) | (0 << 41) | ((12 - 1) << 36)
    b[8 + 10 : 8 + 18] = packed.to_bytes(8, "big")
    with pytest.raises(FlacError):
        ak.flac(bytes(b))


def test_stream_iterators_tolerate_garbage_tails():
    """A valid header followed by garbage ends the stream, doesn't raise."""
    from tests import fixtures

    n = 192
    vals = RNG.integers(-100, 100, n).tolist()
    frame = fixtures.flac_frame([{"type": "verbatim", "values": vals}], n, 0, 16)
    data = fixtures.flac_stream_header(48000, 1, 16, n) + frame + b"\xde\xad\xbe\xef" * 10
    it, _ = ak.stream.flac(data)
    chunks = list(it)
    total = sum(c.shape[1] for c, _ in chunks)
    assert total == n  # the valid frame decoded; garbage ended the stream


def test_batch_lane_poisoning_isolated():
    """Garbage in one lane never corrupts another lane's output."""
    from aukit_tpu.stream.batch import BatchDfpwmDecoder
    from tests.ref.codecs import dfpwm_decode_ref

    good = bytes(RNG.integers(0, 256, 1200, dtype=np.uint8))
    eng = BatchDfpwmDecoder(2, 48000, chunk_bytes=600)
    eng.feed(0, good)
    eng.feed(0, None)
    eng.feed(1, b"\xff" * 37)  # ragged garbage lane
    eng.feed(1, None)
    outs = []
    while True:
        r = eng.step()
        if r is None:
            break
        outs.append(r)
    lane0 = np.concatenate([np.asarray(c[0]) for c, m, _ in outs if m[0]])
    import math

    s = np.asarray(dfpwm_decode_ref(good), np.float64)
    s = s / np.where(s < 0, 128.0, 127.0)
    a = 1.0 - math.exp(-0.5 * 2 * math.pi)
    prev = np.concatenate([[0.0], s[:-1]])
    exp = np.clip((prev + a * (s - prev)) * np.where((prev + a * (s - prev)) < 0, 128.0, 127.0), -128, 127)
    np.testing.assert_array_equal(lane0, exp.astype(np.int8))
