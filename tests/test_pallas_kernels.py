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


def test_flac_lpc_pallas_matches_int64():
    """LPC restore limb kernel vs the int64 numpy oracle, within the
    documented exactness domain (|v| < 2^25, |c| <= 2^14): random orders,
    shifts incl. 0/15/>15/negative, ragged per-lane blocks."""
    from aukit_tpu.codecs.flac import restore_lpc_batch
    from aukit_tpu.kernels import flac_pallas as fp

    L, T = 11, fp.TIME_TILE * 2
    orders = RNG.integers(0, 33, L).astype(np.int64)
    shifts = np.array([0, 5, 9, 12, 15, 17, 20, 31, -1, -3, 14][:L], np.int64)
    blocks = RNG.integers(fp.TIME_TILE // 2, T + 1, L).astype(np.int64)
    coefs = np.zeros((L, 32), np.int64)
    vals = np.zeros((L, T), np.int64)
    for l in range(L):
        o = orders[l]
        coefs[l, :o] = RNG.integers(-(1 << 14), (1 << 14) + 1, o)
        # decaying residuals keep valid-file-like magnitudes in range
        vals[l, : blocks[l]] = RNG.integers(-2000, 2000, blocks[l])
        vals[l, :o] = RNG.integers(-30000, 30000, o)
    # negative shifts multiply: keep their lanes tiny so samples stay exact
    for l in range(L):
        if shifts[l] < 0:
            coefs[l] //= 1 << 12
            vals[l] = np.clip(vals[l], -3, 3)
    ref = restore_lpc_batch(vals.copy(), coefs, shifts, orders)
    # oracle restores past block end too; mask to each lane's block
    got = np.asarray(fp.lpc_restore_pallas(vals, orders, shifts, blocks, coefs,
                                           interpret=INTERPRET))
    for l in range(L):
        b = int(blocks[l])
        r = ref[l, :b]
        if np.abs(r).max() >= fp.MAX_ABS_SAMPLE:
            continue  # out of the documented exactness domain
        np.testing.assert_array_equal(got[l, :b], r, err_msg=f"lane {l}")


def test_flac_lpc_pallas_typical_stream():
    """Order-8 lane set shaped like a real file (uniform blocks)."""
    from aukit_tpu.codecs.flac import restore_lpc_batch
    from aukit_tpu.kernels import flac_pallas as fp

    L, T = 4, fp.TIME_TILE
    order, shift = 8, 9
    coefs = np.zeros((L, 32), np.int64)
    coefs[:, :order] = [120, -60, 30, -15, 8, -4, 2, -1]
    vals = RNG.integers(-800, 800, (L, T)).astype(np.int64)
    orders = np.full(L, order, np.int64)
    shifts = np.full(L, shift, np.int64)
    blocks = np.full(L, T, np.int64)
    ref = restore_lpc_batch(vals.copy(), coefs, shifts, orders)
    got = np.asarray(fp.lpc_restore_pallas(vals, orders, shifts, blocks, coefs,
                                           interpret=INTERPRET))
    np.testing.assert_array_equal(got, ref)


def test_flac_lpc_pallas_routed_flow_matches_cpp():
    """End-to-end shape of the TPU routing branch in restore_and_decorrelate:
    parse a real LPC stream, restore via the kernel (interpret), flat-gather —
    must equal the C++ int64 flat restore bit-for-bit."""
    from tests import fixtures
    from aukit_tpu.codecs import flac as fc
    from aukit_tpu.kernels import flac_pallas as fp
    from aukit_tpu.native import flacbits as nb

    if not nb.available():
        pytest.skip("native parser unavailable")
    n = 512
    order, shift, coefs_l = 8, 9, [120, -60, 30, -15, 8, -4, 2, -1]
    sig = np.cumsum(RNG.integers(-60, 60, n)).astype(np.int64)
    res = list(sig[:order].astype(int))
    for i in range(order, n):
        pred = sum(int(sig[i - 1 - j]) * coefs_l[j] for j in range(order)) >> shift
        res.append(int(sig[i]) - pred)
    frame = fixtures.flac_frame(
        [{"type": "lpc", "order": order, "warmup": [int(v) for v in sig[:order]],
          "precision": 8, "shift": shift, "coefs": coefs_l,
          "residuals": res[order:], "param": 7, "partition_order": 0}], n, 0, 16)
    data = fixtures.flac_stream_header(48000, 1, 16, 5 * n) + frame * 5
    _, _, _, _, _, pos = fc.parse_flac_header(data)
    fm, sub, coefs, values = fc.parse_all_frames(data, pos, 1, 16)
    offs = np.concatenate([[0], np.cumsum(sub["block"])])
    exp_flat = nb.restore_lpc_flat(values.copy(), offs[:-1], sub["block"],
                                   sub["order"], sub["shift"], sub["wasted"], coefs)
    S = len(sub["order"])
    T_max = int(sub["block"].max())
    vals = np.zeros((S, T_max), np.int32)
    for i in range(S):
        vals[i, : sub["block"][i]] = values[offs[i] : offs[i + 1]]
    restored = np.asarray(fp.lpc_restore_pallas(
        vals, sub["order"], sub["shift"], sub["block"], coefs,
        interpret=INTERPRET)).astype(np.int64)
    restored <<= sub["wasted"][:, None]
    keep = np.arange(T_max)[None, :] < sub["block"][:, None]
    np.testing.assert_array_equal(restored[keep], exp_flat)


def test_iir_zero_kernel_matches_sequential():
    """kernels/iir_pallas.py (interpret mode) vs the per-sample recurrence."""
    import numpy as np
    from aukit_tpu.kernels.iir_pallas import iir_zero_lanes

    rng = np.random.default_rng(11)
    L, T = 7, 300  # deliberately unaligned: exercises lane/time padding
    x = (rng.standard_normal((L, T)) * 0.5).astype(np.float32)
    for alpha in (0.9568, 0.12):
        a, c = np.float32(alpha), np.float32(1.0 - alpha)
        exp = np.empty_like(x)
        for l in range(L):
            y = np.float32(0.0)
            for t in range(T):
                y = a * x[l, t] + c * y
                exp[l, t] = y
        got = np.asarray(iir_zero_lanes(x, alpha, interpret=True))
        np.testing.assert_allclose(got, exp, rtol=0, atol=2e-6)


def test_dfpwm_decode_dsp_fused_matches_dsp_chain():
    """dfpwm_decode_dsp_grouped (fused normalize+smooth+int8 epilogue) vs the
    two-stage decode -> dsp_chain reference, across TWO chained chunks so the
    implicit smoothing carry (lowpass state as the previous raw sample) is
    exercised at the boundary. Exact int8 equality."""
    import jax.numpy as jnp
    from aukit_tpu.parallel.pipeline import dsp_chain

    G, B = 1, 256
    alpha = float(1.0 - np.exp(-0.5 * 2.0 * np.pi))  # 48k identity-rate alpha
    st_ref = jnp.zeros((G, 5, 32, 128), jnp.int32)
    st_fus = jnp.zeros((G, 5, 32, 128), jnp.int32)
    fir = jnp.zeros((G, 32, 128), jnp.float32)
    for chunk in range(2):
        data = jnp.asarray(
            RNG.integers(0, 256, (G, B, 32, 128), dtype=np.uint8))
        raw, st_ref = kp.dfpwm_decode_grouped(data, st_ref, interpret=True)
        f = raw.astype(jnp.float32) / jnp.where(raw < 0, 128.0, 127.0)
        # dsp_chain smooths along the last axis; kernel time axis is axis 1
        fm = jnp.moveaxis(f, 1, -1)
        exp, fir = dsp_chain(fm, 48000, 48000, fir_state=fir)
        exp = jnp.moveaxis(exp, -1, 1)
        got, st_fus = kp.dfpwm_decode_dsp_grouped(
            data, st_fus, alpha, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp),
                                      err_msg=f"chunk {chunk}")
        np.testing.assert_array_equal(np.asarray(st_fus), np.asarray(st_ref))


def test_ima_kernel_out_of_range_step_index_defined():
    """The kernel clamps its step-table LOOKUP (raw indices 89..255 would
    gather table padding or out of lane range = undefined) while the state
    arithmetic sees the raw index for one step; pinned against a per-sample
    numpy replica of that defined semantic. Stream/loader parse sites clamp
    indices at the source, so valid flows never reach this edge."""
    from aukit_tpu.codecs.adpcm import IMA_STEP_TABLE
    from aukit_tpu.kernels.ima_pallas import ima_decode_pallas

    rng = np.random.default_rng(29)
    L, T = 4, 96
    nib = rng.integers(0, 16, (L, T)).astype(np.int32)
    pred0 = np.zeros(L, np.int32)
    sidx_bad = np.array([0, 89, 127, 200], np.int32)

    exp = np.empty((L, T), np.int32)
    for l in range(L):
        p, s = int(pred0[l]), int(sidx_bad[l])
        for t in range(T):
            n = int(nib[l, t])
            step = int(IMA_STEP_TABLE[min(max(s, 0), 88)])
            m = n & 7
            s = min(max(s + (-1 if m < 4 else (m - 3) * 2), 0), 88)
            diff = ((m * step) >> 2) + (step >> 3)
            p = min(max(p - diff if n >= 8 else p + diff, -32768), 32767)
            exp[l, t] = p
    got, _ = ima_decode_pallas(nib, pred0, sidx_bad, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_fast_tile_split_nvalid_boundaries():
    """Round-4 fast-tile split: every codec kernel elides the tail-freeze
    selects on fully-valid tiles (pl.when branch). Pin that outputs over the
    valid prefix and the carried state are IDENTICAL across nvalid placements
    (tile-aligned, mid-tile, mid-unroll) vs a full decode."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)

    # DFPWM: nvalid in bytes, TIME_TILE 128
    xb = jnp.asarray(rng.integers(0, 256, (1, 256, 32, 128)).astype(np.uint8))
    st0 = jnp.zeros((1, 5, 32, 128), jnp.int32)
    full, _ = kp.dfpwm_decode_grouped(xb, st0, jnp.full((1,), 256, jnp.int32),
                                      True)
    for nv in (128, 129, 200, 255):
        part, stp = kp.dfpwm_decode_grouped(
            xb, st0, jnp.full((1,), nv, jnp.int32), True)
        np.testing.assert_array_equal(np.asarray(part)[:, : nv * 8],
                                      np.asarray(full)[:, : nv * 8])
        # frozen state == state after decoding exactly nv bytes
        _, st_ref = kp.dfpwm_decode_grouped(
            xb[:, :nv] if nv % kp.TIME_TILE == 0 else
            jnp.pad(xb[:, :nv], ((0, 0), (0, (-nv) % kp.TIME_TILE),
                                 (0, 0), (0, 0))),
            st0, jnp.full((1,), nv, jnp.int32), True)
        np.testing.assert_array_equal(np.asarray(stp), np.asarray(st_ref))

    # IMA / MS-ADPCM / QOA: nvalid in samples
    from aukit_tpu.kernels import ima_pallas as ip
    from aukit_tpu.kernels import msadpcm_pallas as mp2
    from aukit_tpu.kernels import qoa_pallas as qp

    xi = jnp.asarray(rng.integers(0, 16, (1, 1024, 32, 128)).astype(np.int8))
    sti = jnp.zeros((1, 2, 32, 128), jnp.int32)
    fi, _ = ip.ima_decode_grouped(xi, sti, jnp.full((1,), 1024, jnp.int32), True)
    pi, _ = ip.ima_decode_grouped(xi, sti, jnp.full((1,), 600, jnp.int32), True)
    np.testing.assert_array_equal(np.asarray(pi)[:, :600], np.asarray(fi)[:, :600])

    xm = jnp.asarray(rng.integers(-8, 8, (1, 1024, 32, 128)).astype(np.int8))
    stm = jnp.zeros((1, 3, 32, 128), jnp.int32).at[:, 2].set(64)
    com = jnp.zeros((1, 2, 32, 128), jnp.int32).at[:, 0].set(256)
    fm, _ = mp2.msadpcm_decode_grouped(xm, stm, com, jnp.full((1,), 1024, jnp.int32), True)
    pm, _ = mp2.msadpcm_decode_grouped(xm, stm, com, jnp.full((1,), 600, jnp.int32), True)
    np.testing.assert_array_equal(np.asarray(pm)[:, :600], np.asarray(fm)[:, :600])

    xq = jnp.asarray(rng.integers(-14000, 14000, (1, 512, 32, 128)).astype(np.int16))
    stq = jnp.zeros((1, 8, 32, 128), jnp.int32)
    fq, _ = qp.qoa_lms_grouped(xq, stq, jnp.full((1,), 512, jnp.int32), True)
    pq, _ = qp.qoa_lms_grouped(xq, stq, jnp.full((1,), 300, jnp.int32), True)
    np.testing.assert_array_equal(np.asarray(pq)[:, :300], np.asarray(fq)[:, :300])
