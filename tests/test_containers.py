"""Container parsers: WAV/AIFF/AU/FLAC/QOA/MDFPWM + detect heuristics."""

import struct

import numpy as np
import pytest

import aukit_tpu as ak
from aukit_tpu.ops import pcmcode

from tests import fixtures
from tests.ref import codecs as refc

RNG = np.random.default_rng(11)


def test_wav_pcm16_roundtrip():
    sig = RNG.integers(-32768, 32767, (2, 500))
    w = fixtures.wav_pcm(sig, 44100, 16)
    a = ak.wav(w)
    assert a.sample_rate == 44100 and a.channels == 2
    ref = refc.pcm_ref(sig.T.reshape(-1).tolist(), 16, "signed", 2, True)
    np.testing.assert_array_equal(np.asarray(a.data), ref.astype(np.float32))
    assert a.info == {"dataType": "signed", "bitDepth": 16}


def test_wav_8bit_unsigned():
    sig = RNG.integers(0, 256, (1, 300))
    w = fixtures.wav_pcm(sig, 8000, 8)
    a = ak.wav(w)
    ref = refc.pcm_ref(sig.reshape(-1).tolist(), 8, "unsigned", 1, True)
    np.testing.assert_array_equal(np.asarray(a.data), ref.astype(np.float32))


def test_wav_float32():
    sig = (RNG.random((2, 200), dtype=np.float64) * 2 - 1).astype(np.float32)
    w = fixtures.wav_pcm(sig, 48000, 32)
    a = ak.wav(w)
    np.testing.assert_array_equal(np.asarray(a.data), sig)
    assert a.info["dataType"] == "float"


def test_wav_g711():
    data = bytes(RNG.integers(0, 256, 800, dtype=np.uint8))
    for ulaw in (False, True):
        w = fixtures.wav_g711(data, 8000, 2, ulaw)
        a = ak.wav(w)
        ref = refc.g711_ref(data, ulaw, 2)
        np.testing.assert_array_equal(np.asarray(a.data), ref.astype(np.float32))


def test_wav_ima_stereo():
    payload = fixtures.ima_wav_blocks(RNG, 3, 128, 2)
    w = fixtures.wav_ima(payload, 22050, 2, 128)
    a = ak.wav(w)
    # reference regroup: per block, headers then per-group L bytes 0-3, R 4-7
    exp = [[], []]
    for b in range(3):
        block = payload[b * 128 : (b + 1) * 128]
        predl, idxl = struct.unpack_from("<hB", block, 0)
        predr, idxr = struct.unpack_from("<hB", block, 4)
        nl, nr = [], []
        for g in range(8, 128, 8):
            for byte in block[g : g + 4]:
                nl += [byte & 0x0F, byte >> 4]
            for byte in block[g + 4 : g + 8]:
                nr += [byte & 0x0F, byte >> 4]
        exp[0] += refc.ima_ref(nl, predl, idxl)
        exp[1] += refc.ima_ref(nr, predr, idxr)
    np.testing.assert_array_equal(np.asarray(a.data), refc.norm16(np.array(exp)).astype(np.float32))


def test_wav_ima_stereo_step_index_validated():
    """Out-of-range stereo step index (>88) must raise like the reference's
    expect.range, not feed an unbounded gather (ADVICE r1)."""
    payload = bytearray(fixtures.ima_wav_blocks(RNG, 1, 128, 2))
    payload[2] = 200  # left-channel step index
    w = fixtures.wav_ima(bytes(payload), 22050, 2, 128)
    with pytest.raises(ValueError):
        ak.wav(w)


def test_wav_ima_mono_q13_index_mask():
    payload = fixtures.ima_wav_blocks(RNG, 2, 64, 1)
    w = fixtures.wav_ima(payload, 8000, 1, 64)
    a = ak.wav(w)
    exp = []
    for b in range(2):
        block = payload[b * 64 : (b + 1) * 64]
        pred, idx = struct.unpack_from("<hB", block, 0)
        idx &= 0x0F  # reference quirk Q13 (aukit.lua:1544)
        nibs = refc.nibbles_from_bytes(block[4:], top_first=False)
        exp += refc.ima_ref(nibs, pred, idx)
    np.testing.assert_array_equal(np.asarray(a.data)[0], refc.norm16(np.array(exp)).astype(np.float32))


def test_wav_msadpcm_container():
    sig = np.stack([(np.sin(np.arange(2048) / 20) * 9000).astype(np.int64)] * 2)
    payload = fixtures.ms_encode(sig, 256)
    w = fixtures.wav_msadpcm(payload, 22050, 2, 256)
    a = ak.wav(w)
    ref = refc.msadpcm_ref(payload, 256, 2)
    np.testing.assert_array_equal(np.asarray(a.data), refc.norm16(ref).astype(np.float32))


def test_wav_metadata_roundtrip():
    a = ak.tone(440, 0.01, 0.5)
    a.metadata = {"title": "Test Song", "artist": "Tester", "trackNumber": 3}
    w = a.wav(16)
    b = ak.wav(w)
    assert b.metadata["title"] == "Test Song"
    assert b.metadata["artist"] == "Tester"
    assert b.metadata["trackNumber"] == 3


def test_wav_dfpwm_container_roundtrip():
    a = ak.tone(300, 0.05, 0.4, sample_rate=48000)
    w = a.wav(1)  # DFPWM-in-WAV
    b = ak.wav(w)
    assert b.info["dataType"] == "dfpwm"
    assert b.sample_rate == 48000
    # decode parity: same bytes through the codec directly
    enc = a.dfpwm(True)
    ref, _ = __import__("aukit_tpu.codecs.dfpwm", fromlist=["decode_dfpwm_bytes"]).decode_dfpwm_bytes(enc)
    np.testing.assert_array_equal(
        np.asarray(b.data)[0],
        pcmcode.normalize_pcm(ref, 8, "signed"),
    )


def test_aiff_be_pcm():
    sig = RNG.integers(-32768, 32767, (2, 300))
    payload = sig.T.reshape(-1).astype(">i2").tobytes()
    f = fixtures.aiff_file(payload, 2, 44100, 16)
    a = ak.aiff(f)
    assert a.sample_rate == 44100
    ref = refc.pcm_ref(payload, 16, "signed", 2, True, big_endian=True)
    np.testing.assert_array_equal(np.asarray(a.data), ref.astype(np.float32))


def test_aifc_sowt_and_ulaw():
    sig = RNG.integers(-32768, 32767, (1, 200))
    payload = sig.reshape(-1).astype("<i2").tobytes()
    f = fixtures.aiff_file(payload, 1, 22050, 16, aifc=True, compression=b"sowt")
    a = ak.aiff(f)
    ref = refc.pcm_ref(payload, 16, "signed", 1, True, big_endian=False)
    np.testing.assert_array_equal(np.asarray(a.data), ref.astype(np.float32))
    g = bytes(RNG.integers(0, 256, 400, dtype=np.uint8))
    f2 = fixtures.aiff_file(g, 2, 8000, 16, aifc=True, compression=b"ulaw")
    b = ak.aiff(f2)
    # note: length is frames*channels*(16//8) bytes of G.711 = all 400 bytes
    np.testing.assert_array_equal(
        np.asarray(b.data), refc.g711_ref(g[: b.num_samples * 2], True, 2).astype(np.float32)
    )


def test_au_encodings():
    sig = RNG.integers(-32768, 32767, 200)
    payload = sig.astype(">i2").tobytes()
    f = fixtures.au_file(payload, 3, 16000, 2)
    a = ak.au(f)
    assert a.sample_rate == 16000 and a.channels == 2
    ref = refc.pcm_ref(payload, 16, "signed", 2, True, big_endian=True)
    np.testing.assert_array_equal(np.asarray(a.data), ref.astype(np.float32))
    g = bytes(RNG.integers(0, 256, 300, dtype=np.uint8))
    b = ak.au(fixtures.au_file(g, 1, 8000, 1))
    np.testing.assert_array_equal(np.asarray(b.data), refc.g711_ref(g, True, 1).astype(np.float32))


def test_mdfpwm_roundtrip():
    left = bytes(RNG.integers(0, 256, 12000, dtype=np.uint8))
    right = bytes(RNG.integers(0, 256, 12000, dtype=np.uint8))
    # header length = total DFPWM payload bytes (L+R); audio trimmed to length*8
    f = fixtures.mdfpwm_file(left, right, length_pairs=24000)
    a = ak.mdfpwm(f)
    assert a.channels == 2 and a.sample_rate == 48000
    assert a.metadata == {"artist": "art", "title": "tit", "album": "alb"}
    refl = refc.dfpwm_decode_ref(left)
    refr = refc.dfpwm_decode_ref(right)
    np.testing.assert_array_equal(
        np.asarray(a.data),
        pcmcode.normalize_pcm(np.stack([refl, refr]), 8, "signed"),
    )
    h = ak.mdfpwm(f, head=True)
    assert h.metadata["title"] == "tit" and h.num_samples == 0


def test_detect():
    assert ak.detect(fixtures.wav_pcm(np.zeros((1, 100), int), 48000, 16))[0] == "wav"
    assert ak.detect(fixtures.aiff_file(b"\0" * 100, 1, 48000, 16))[0] == "aiff"
    assert ak.detect(fixtures.au_file(b"\0" * 10, 3, 8000, 1))[0] == "au"
    assert ak.detect(b"fLaC" + b"\0" * 50)[0] == "flac"
    assert ak.detect(b"MDFPWM\x03" + b"\0" * 20)[0] == "mdfpwm"
    assert ak.detect(b"qoaf" + b"\0" * 20)[0] == "qoa"
    assert ak.detect(b"\x55" * 30)[0] == "dfpwm"
    # near-silent 16-bit signed PCM heuristic
    quiet = np.full(64, 5, dtype="<i2").tobytes()
    t, bits, dtype = ak.detect(quiet)
    assert (t, bits, dtype) == ("pcm", 8, "signed") or t == "pcm"
    assert ak.detect(b"") == (None, None, None)


def test_flac_header_and_metadata():
    hdr = fixtures.flac_stream_header(44100, 2, 16, 1000, {"TITLE": "Song", "ARTIST": "Me"})
    a = ak.flac(hdr + b"", head=True)
    assert a.sample_rate == 44100
    assert a.metadata["title"] == "Song"
    assert a.metadata["artist"] == "Me"


def test_flac_constant_and_verbatim():
    vals = RNG.integers(-(1 << 15), 1 << 15, 192).tolist()
    frame = fixtures.flac_frame(
        [{"type": "verbatim", "values": vals}, {"type": "constant", "value": -1234}],
        192, 1, 16,  # chanAsgn 1 = independent stereo... (0-7 independent)
    )
    data = fixtures.flac_stream_header(48000, 2, 16, 192) + frame
    a = ak.flac(data)
    assert a.num_samples == 192
    expect0 = np.array(vals, np.int64)
    np.testing.assert_array_equal(np.asarray(a.data)[0], (expect0 / 65536.0).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(a.data)[1], np.full(192, -1234 / 65536.0, np.float32))


def _inverse_fixed(signal, order):
    """Residuals for a fixed predictor so decode reproduces `signal`."""
    coefs = refc_flac_fixed(order)
    res = list(signal[:order])
    for i in range(order, len(signal)):
        pred = sum(signal[i - 1 - j] * coefs[j] for j in range(order))
        res.append(signal[i] - pred)
    return res


def refc_flac_fixed(order):
    return [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]][order]


def test_flac_fixed_prediction_exact():
    sig = np.cumsum(RNG.integers(-50, 50, 576)).astype(np.int64).tolist()
    for order in (1, 2, 3):
        res = _inverse_fixed(sig, order)
        frame = fixtures.flac_frame(
            [{
                "type": "fixed", "order": order, "warmup": sig[:order],
                "residuals": res[order:], "param": 8, "partition_order": 0,
            }],
            576, 0, 16,
        )
        data = fixtures.flac_stream_header(48000, 1, 16, 576) + frame
        a = ak.flac(data)
        np.testing.assert_array_equal(
            np.asarray(a.data)[0], (np.array(sig) / 65536.0).astype(np.float32)
        )


def test_flac_lpc_and_stereo_modes():
    n = 256
    base = (np.sin(np.arange(n) / 9) * 3000).astype(np.int64)
    side = (np.cos(np.arange(n) / 14) * 500).astype(np.int64)
    order, shift = 2, 5
    coefs = [40, -13]

    def residuals(sig, depth_bits):
        res = list(sig[:order])
        for i in range(order, len(sig)):
            pred = (sig[i - 1] * coefs[0] + sig[i - 2] * coefs[1]) >> shift
            res.append(int(sig[i]) - pred)
        return res

    for asgn in (0, 8, 9, 10):
        if asgn == 0:
            subs_sig = [base]
        elif asgn == 8:  # left/side: sub1 = left, sub2 = left - right
            left, right = base, base - side
            subs_sig = [left, left - right]
        elif asgn == 9:  # side/right: sub1 = left - right, sub2 = right
            left, right = base, base - side
            subs_sig = [left - right, right]
        else:  # mid/side
            left, right = base, base - side
            s = left - right
            m = (left + right) >> 1
            subs_sig = [m, s]
        subframes = []
        for sig in subs_sig:
            subframes.append({
                "type": "lpc", "order": order, "warmup": [int(v) for v in sig[:order]],
                "precision": 7, "shift": shift, "coefs": coefs,
                "residuals": residuals(sig, 16)[order:], "param": 9, "partition_order": 2,
            })
        frame = fixtures.flac_frame(subframes, n, asgn, 16)
        channels = 1 if asgn == 0 else 2
        data = fixtures.flac_stream_header(48000, channels, 16, n) + frame
        a = ak.flac(data)
        got = np.asarray(a.data)
        if asgn == 0:
            np.testing.assert_array_equal(got[0], (base / 65536.0).astype(np.float32))
        else:
            np.testing.assert_array_equal(got[0], (base / 65536.0).astype(np.float32))
            np.testing.assert_array_equal(got[1], ((base - side) / 65536.0).astype(np.float32))


def test_flac_escape_partition_and_wasted_bits():
    n = 192
    sig = (RNG.integers(-1000, 1000, n) * 4).astype(np.int64)  # 2 wasted bits
    shifted = (sig >> 2).tolist()
    frame = fixtures.flac_frame(
        [{
            "type": "verbatim", "values": shifted, "wasted": 2,
        }],
        n, 0, 16,
    )
    data = fixtures.flac_stream_header(48000, 1, 16, n) + frame
    a = ak.flac(data)
    np.testing.assert_array_equal(np.asarray(a.data)[0], (sig / 65536.0).astype(np.float32))
