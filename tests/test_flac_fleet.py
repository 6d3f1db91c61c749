"""FLAC fleet engine: N-stream batched decode (stream/flac_fleet.py).

The contract under test is BIT-equality: each lane's concatenated unmasked
window samples equal a solo ``stream.flac(data, mono=True)`` run over the same
bytes (reference semantics aukit.lua:3115-3191), regardless of drip size,
fleet composition, or checkpoint/restore cuts.
"""

import numpy as np
import pytest

from aukit_tpu import stream as st
from aukit_tpu.stream.flac_fleet import FlacFleet
from tests import fixtures

RNG = np.random.default_rng(19)


def make_flac(rate, nframes, n=1024, channels=1, chan_asgn=0, seed=0,
              depth=16, final_short=0, comments=None):
    """Synthesize a valid FLAC stream mixing LPC/fixed/verbatim/constant
    subframes (fixtures write real Rice residuals + CRC8)."""
    r = np.random.default_rng(seed)

    def subframe(kind, bs):
        # predictive subframes derive residuals from a bounded target signal,
        # so restored samples stay in depth range like real encoder output
        # (the int64 host path and the int32-limb Pallas path agree only
        # inside the depth <= 24 exactness domain, kernels/flac_pallas.py)
        s = r.integers(-3000, 3000, bs).astype(np.int64)
        if kind == 0:
            order, coefs, shift = 3, [700, -300, 100], 4
            res = [int(s[i]) - (int(np.dot(s[i - order:i][::-1], coefs)) >> shift)
                   for i in range(order, bs)]
            return {"type": "lpc", "order": order,
                    "warmup": [int(v) for v in s[:order]],
                    "precision": 12, "shift": shift, "coefs": coefs,
                    "residuals": res}
        if kind == 1:
            res = [int(s[i]) - (2 * int(s[i - 1]) - int(s[i - 2]))
                   for i in range(2, bs)]
            return {"type": "fixed", "order": 2,
                    "warmup": [int(s[0]), int(s[1])], "residuals": res}
        if kind == 2:
            return {"type": "verbatim", "values": list(s)}
        return {"type": "constant", "value": int(r.integers(-100, 100))}

    nsubs = channels if chan_asgn <= 7 else 2
    total = nframes * n + final_short
    frames = []
    for k in range(nframes):
        frames.append(fixtures.flac_frame(
            [subframe((k + c) % 4, n) for c in range(nsubs)],
            n, chan_asgn, depth, frame_number=k))
    if final_short:
        frames.append(fixtures.flac_frame(
            [subframe(2, final_short) for _ in range(nsubs)],
            final_short, chan_asgn, depth, frame_number=nframes))
    hdr = fixtures.flac_stream_header(rate, channels, depth, total,
                                      comments=comments)
    return hdr + b"".join(frames)


def solo_reference(data):
    it, _total = st.flac(data, mono=True)
    chunks = [c for c, _p in it]
    return np.concatenate(chunks, axis=1)[0]


def run_fleet(datas, chunk=4096, fleet=None):
    """Drip-feed ``chunk`` bytes per lane per step; collect per-lane samples."""
    fleet = fleet or FlacFleet(len(datas))
    outs = [[] for _ in datas]
    offs = [0] * len(datas)
    eof = [False] * len(datas)
    guard = 0
    while not fleet.done:
        for i, d in enumerate(datas):
            if offs[i] < len(d):
                fleet.feed(i, d[offs[i]: offs[i] + chunk])
                offs[i] += chunk
            elif not eof[i]:
                fleet.feed(i, None)
                eof[i] = True
        r = fleet.step()
        guard += 1
        assert guard < 10_000
        if r is None:
            continue
        w, m, _pos = r
        for i in range(len(datas)):
            if m[i]:
                outs[i].append(w[i])
    return [np.concatenate(o) if o else np.zeros(0, np.float32) for o in outs], fleet


def assert_lane_equals_solo(got, data):
    exp = solo_reference(data)
    assert len(got) >= len(exp)
    np.testing.assert_array_equal(got[: len(exp)], exp)
    assert not got[len(exp):].any()  # final window zero-pad only


def test_fleet_bit_equality_mixed_formats():
    """Mixed rates, mono/stereo, all four subframe types, every stereo
    decorrelation mode, wasted bits via short final frames — each lane equals
    its solo stream.flac run bit-for-bit."""
    datas = [
        make_flac(32000, 12, seed=1),
        make_flac(44100, 10, seed=2, final_short=100),
        make_flac(48000, 8, channels=2, chan_asgn=0, seed=3),
        make_flac(24000, 9, channels=2, chan_asgn=8, seed=4),   # left/side
        make_flac(22050, 9, channels=2, chan_asgn=9, seed=5),   # side/right
        make_flac(48000, 9, channels=2, chan_asgn=10, seed=6),  # mid/side
    ]
    outs, fleet = run_fleet(datas)
    for got, data in zip(outs, datas):
        assert_lane_equals_solo(got, data)
    assert fleet.done
    # metrics count REAL samples (window zero-pad excluded)
    assert fleet.metrics.samples_decoded == sum(
        len(solo_reference(d)) for d in datas)


def test_fleet_drip_size_invariance():
    """Identical outputs whether fed in 512-byte dribbles or whole files."""
    datas = [make_flac(32000, 10, seed=7), make_flac(48000, 6, seed=8)]
    small, _ = run_fleet(datas, chunk=512)
    big, _ = run_fleet(datas, chunk=1 << 24)
    for a, b in zip(small, big):
        np.testing.assert_array_equal(a, b)


def test_fleet_one_restore_dispatch_spans_lanes(monkeypatch):
    """The batched LPC restore is ONE call per step covering every lane's
    subframes (the north-star batching axis, SURVEY.md §2.4)."""
    from aukit_tpu.codecs import flac as flac_codec

    calls = []
    real = flac_codec.restore_flat

    def spy(sub, coefs, values, depth, device=None, mesh=None, interpret=False):
        calls.append(len(sub["order"]))
        return real(sub, coefs, values, depth, device=device, mesh=mesh,
                    interpret=interpret)

    monkeypatch.setattr(flac_codec, "restore_flat", spy)
    datas = [make_flac(48000, 6, seed=i) for i in range(5)]
    fleet = FlacFleet(5)
    for i, d in enumerate(datas):
        fleet.feed(i, d)
        fleet.feed(i, None)
    fleet.step()
    assert len(calls) == 1
    assert calls[0] == 5 * 6  # every lane's subframes in one batch


def test_fleet_lane_poison_isolation():
    """A bad-magic lane and a mid-stream-garbage lane end individually; the
    healthy lane still decodes bit-exactly (SURVEY.md §5.3)."""
    good = make_flac(48000, 8, seed=9)
    bad_magic = b"OggS" + bytes(RNG.integers(0, 256, 4000, dtype=np.uint8))
    valid_then_garbage = make_flac(32000, 4, seed=10) + b"\xde\xad" * 3000
    fleet = FlacFleet(3)
    outs, fleet = run_fleet([good, bad_magic, valid_then_garbage], fleet=fleet)
    assert_lane_equals_solo(outs[0], good)
    assert fleet.lane_error(1) is not None
    assert len(outs[1]) == 0
    # lane 2: the 4 valid frames decode (garbage ends the lane at EOF parse)
    assert_lane_equals_solo(outs[2], valid_then_garbage)
    assert fleet.lane_error(0) is None


def test_fleet_starved_lane_masked_not_stalled():
    """An unfed lane masks out; once fed later its timeline has no spliced
    silence — output still equals the solo run."""
    a = make_flac(48000, 20, seed=11)
    b = make_flac(48000, 20, seed=12)
    fleet = FlacFleet(2)
    fleet.feed(0, a)
    fleet.feed(0, None)
    outs_a = []
    got_mask_b_false = False
    for _ in range(30):
        r = fleet.step()
        if r is None:
            break
        w, m, _ = r
        if m[0]:
            outs_a.append(w[0])
        if not m[1]:
            got_mask_b_false = True
        assert m[1] == False  # noqa: E712 - lane 1 never fed yet
    assert got_mask_b_false and outs_a
    fleet.feed(1, b)
    fleet.feed(1, None)
    outs_b = []
    while not fleet.done:
        r = fleet.step()
        if r is None:
            break
        w, m, _ = r
        if m[0]:
            outs_a.append(w[0])
        if m[1]:
            outs_b.append(w[1])
    assert_lane_equals_solo(np.concatenate(outs_a), a)
    assert_lane_equals_solo(np.concatenate(outs_b), b)


def test_fleet_checkpoint_restore_bit_exact():
    """Checkpoint mid-stream (any step boundary — the FIFO remnant rides
    along), restore into a FRESH fleet, feed the remaining bytes: continued
    output equals the uninterrupted run exactly (SURVEY.md §5.4)."""
    data = make_flac(44100, 30, seed=13)
    full, _ = run_fleet([data], chunk=3000)

    fleet = FlacFleet(2)
    cut = len(data) // 2
    fleet.feed(0, data[:cut])
    parts = []
    for _ in range(3):
        r = fleet.step()
        if r is None:
            break
        w, m, _ = r
        if m[0]:
            parts.append(w[0])
    ck = fleet.checkpoint(0)
    resumed_from = ck["byte_offset"] + len(ck["pending"])
    assert resumed_from == cut

    fleet2 = FlacFleet(1)
    fleet2.restore(0, ck)
    fleet2.feed(0, data[cut:])
    fleet2.feed(0, None)
    while True:
        r = fleet2.step()
        if r is None:
            if fleet2.done:
                break
            continue
        w, m, _ = r
        if m[0]:
            parts.append(w[0])
    got = np.concatenate(parts)
    np.testing.assert_array_equal(got, full[0])


def test_fleet_positions_and_info():
    data = make_flac(48000, 50, seed=14, comments={"TITLE": "x"})
    fleet = FlacFleet(1)
    fleet.feed(0, data)
    fleet.feed(0, None)
    seen = []
    while not fleet.done:
        r = fleet.step()
        if r is None:
            break
        _w, m, pos = r
        if m[0]:
            seen.append(pos[0])
    assert seen == [i * 1.0 for i in range(len(seen))]  # window starts
    info = fleet.lane_info(0)
    assert info["sampleRate"] == 48000 and info["bitDepth"] == 16
    assert info["metadata"]["title"] == "x"
    assert info["length"] == 50 * 1024 / 48000


def test_fleet_reset_lane_reuse():
    a = make_flac(48000, 6, seed=15)
    b = make_flac(32000, 6, seed=16)
    fleet = FlacFleet(1)
    outs, fleet = run_fleet([a], fleet=fleet)
    assert_lane_equals_solo(outs[0], a)
    fleet.reset_lane(0)
    outs2, fleet = run_fleet([b], fleet=fleet)
    assert_lane_equals_solo(outs2[0], b)


def test_fleet_device_restore_route_bit_exact():
    """The fleet with ``device_restore=True`` routes the whole batch through
    the Pallas LPC kernel (interpret mode on CPU via the _block_iir plumbing;
    compiled on TPU) and stays bit-identical to the host-restore run. Also
    pins the clear error for device=True on a non-TPU backend without
    interpret (restore_flat's guard)."""
    import jax

    from aukit_tpu.codecs import flac as flac_codec

    datas = [make_flac(48000, 6, seed=i, channels=2, chan_asgn=10)
             for i in range(3)]
    host, _ = run_fleet(datas, fleet=FlacFleet(3, device_restore=False))
    fleet = FlacFleet(3, device_restore=True)
    if jax.default_backend() != "tpu":
        fleet._block_iir = "interpret"  # routes interpret into restore_flat
    fleet.device_dsp = False  # pin the staged path: this test is about restore
    dev, _ = run_fleet(datas, fleet=fleet)
    for a, b in zip(host, dev):
        np.testing.assert_array_equal(a, b)
    if jax.default_backend() != "tpu":
        sub = {k: np.array(v) for k, v in
               (("order", [0]), ("shift", [0]), ("wasted", [0]), ("block", [4]))}
        with pytest.raises(RuntimeError, match="needs a TPU backend"):
            flac_codec.restore_flat(sub, np.zeros((1, 32), np.int32),
                                    np.zeros(4, np.int64), 16, device=True)


def test_fleet_tiny_blocks_nonuniform_history():
    """Block sizes below the 2-sample history (n=1) exercise the reference's
    short-block history splice (stream/__init__.py flac gen last-update)."""
    r = np.random.default_rng(17)
    frames = []
    for k, n in enumerate([192, 1, 1, 192, 64]):
        frames.append(fixtures.flac_frame(
            [{"type": "verbatim", "values": list(r.integers(-2000, 2000, n))}],
            n, 0, 16, frame_number=k))
    data = fixtures.flac_stream_header(8000, 1, 16, 192 * 2 + 64 + 2) + b"".join(frames)
    outs, _ = run_fleet([data], chunk=100)
    assert_lane_equals_solo(outs[0], data)


def test_lpc_restore_scan_matches_host():
    """The jnp limb-scan twin (the sharded fleet's non-TPU restore) equals
    the int64 host restore on the depth <= 24 domain, mixed orders/shifts."""
    from aukit_tpu.codecs.flac import restore_lpc_batch
    from aukit_tpu.kernels.flac_pallas import lpc_restore_scan

    r = np.random.default_rng(23)
    S, T = 7, 300
    orders = np.array([0, 1, 3, 8, 12, 32, 2], np.int64)
    shifts = np.array([0, 5, 15, 17, -2, 9, 31], np.int64)
    blocks = np.array([300, 300, 250, 300, 128, 300, 1], np.int64)
    coefs = np.zeros((S, 32), np.int64)
    # residuals derived from bounded targets (real-encoder-shaped input): the
    # int32-limb math is exact only while restored samples stay < 2^25
    vals = np.zeros((S, T), np.int64)
    targets = r.integers(-(1 << 17), 1 << 17, (S, T)).astype(np.int64)
    for i in range(S):
        o = int(orders[i])
        if shifts[i] < 0:  # negative shift MULTIPLIES the dot: keep the
            targets[i] >>= 7  # residual (s - pred) inside int32
            cs = 1 << 10
        else:
            cs = 1 << 14
        coefs[i, :o] = r.integers(-cs, cs, o)
        s = targets[i]
        vals[i, :o] = s[:o]
        for t in range(o, T):
            acc = int(np.dot(s[t - o:t][::-1], coefs[i, :o])) if o else 0
            sh = int(shifts[i])
            pred = (acc << -sh) if sh < 0 else (acc >> sh)
            vals[i, t] = (int(s[t]) - pred) if o else s[t]
    exp = restore_lpc_batch(vals.copy(), coefs, shifts, orders)
    keep = np.arange(T)[None, :] < blocks[:, None]
    np.testing.assert_array_equal(np.where(keep, exp, 0),
                                  np.where(keep, targets, 0) * keep)
    assert np.abs(vals).max() < 1 << 31, "residuals must fit int32"
    got = np.asarray(lpc_restore_scan(
        vals.astype(np.int32), orders.astype(np.int32), shifts.astype(np.int32),
        blocks.astype(np.int32), coefs.astype(np.int32), 32)).astype(np.int64)
    np.testing.assert_array_equal(np.where(keep, got, 0), np.where(keep, exp, 0))


def test_fleet_sharded_over_mesh_bit_exact():
    """FlacFleet(mesh=...) shards the restore batch over the 8-device CPU
    mesh; outputs are bit-identical to the unsharded fleet AND to solo
    stream.flac (MULTICHIP invariance for the FLAC north-star path)."""
    import jax

    from aukit_tpu.parallel.pipeline import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(8)
    datas = [make_flac(48000, 6, seed=30 + i, channels=1 + i % 2,
                       chan_asgn=0 if i % 2 == 0 else 10) for i in range(5)]
    plain, _ = run_fleet(datas, fleet=FlacFleet(len(datas)))
    sharded, _ = run_fleet(datas, fleet=FlacFleet(len(datas), mesh=mesh))
    for a, b, d in zip(plain, sharded, datas):
        np.testing.assert_array_equal(a, b)
        assert_lane_equals_solo(b, d)


def test_fleet_thousand_lanes_scale():
    """1024 drip-fed lanes in one fleet (the verdict's north-star scale bar):
    every lane bit-equal to its template's solo run; one restore dispatch
    per step spans all of them."""
    templates = [make_flac(32000, 3, n=512, seed=50),
                 make_flac(48000, 3, n=512, seed=51),
                 make_flac(44100, 3, n=512, channels=2, chan_asgn=10, seed=52),
                 make_flac(24000, 3, n=512, seed=53, final_short=64)]
    solos = [solo_reference(t) for t in templates]
    L = 1024
    fleet = FlacFleet(L)
    datas = [templates[i % 4] for i in range(L)]
    offs = [0] * L
    eof = [False] * L
    outs = [[] for _ in range(L)]
    while not fleet.done:
        for i, d in enumerate(datas):
            if offs[i] < len(d):
                fleet.feed(i, d[offs[i]: offs[i] + 1500])
                offs[i] += 1500
            elif not eof[i]:
                fleet.feed(i, None)
                eof[i] = True
        r = fleet.step()
        if r is None:
            continue
        w, m, _ = r
        for i in np.nonzero(m)[0]:
            outs[i].append(w[i])
    for i in range(L):
        got = np.concatenate(outs[i])
        exp = solos[i % 4]
        np.testing.assert_array_equal(got[: len(exp)], exp)
        assert not got[len(exp):].any()
    assert fleet.metrics.samples_decoded == sum(len(s) for s in solos) * (L // 4)


def test_fleet_device_dsp_twin_close():
    """FlacFleet(device_dsp=True): the fused f32 device resample+IIR+scale
    twin matches the host f64 oracle to f32 tolerance, same masks/positions;
    mixed-geometry steps fall back to the host path (exact by construction)."""
    datas = [make_flac(44100, 10, seed=60), make_flac(44100, 10, seed=61),
             make_flac(44100, 8, seed=62, channels=2, chan_asgn=10)]
    host, _ = run_fleet(datas, chunk=3000)
    dev, fl = run_fleet(datas, chunk=3000,
                        fleet=FlacFleet(len(datas), device_dsp=True))
    for a, b in zip(host, dev):
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=5e-3)
    # uniform-geometry fleet: the device path actually ran (not just fallback)
    datas_u = [make_flac(48000, 6, seed=63), make_flac(48000, 6, seed=64)]
    host_u, _ = run_fleet(datas_u)
    dev_u, _ = run_fleet(datas_u, fleet=FlacFleet(2, device_dsp=True))
    for a, b in zip(host_u, dev_u):
        np.testing.assert_allclose(b, a, atol=5e-3)


def test_device_block_iir_matches_doubling_twin():
    """_device_block_iir_scale_fn (Pallas zero-init blocks + exact chain
    recovery, interpret mode) vs _device_iir_scale_fn (recursive doubling)
    on the same inputs: same contract, f32-close, both alphas with and
    without decay underflow, stereo+mono, ragged tvalid."""
    import jax.numpy as jnp
    from aukit_tpu.stream.flac_fleet import (_device_block_iir_scale_fn,
                                             _device_iir_scale_fn)

    rng = np.random.default_rng(21)
    out_len, m, Lb, C = 160, 4, 4, 2
    Pb = 16  # block rows (>= Lb*m)
    res = (rng.standard_normal((Pb, C, out_len)) * 0.4).astype(np.float32)
    idx = np.arange(Lb * m, dtype=np.int64).reshape(Lb, m)
    tval = np.array([m, m, 2, 1], np.int32) * out_len  # ragged valid prefixes
    ls = (rng.standard_normal((Lb, C)) * 0.2).astype(np.float32)

    ones = np.ones(Lb, np.float32)
    for alpha, out_mode in ((0.9568, "mix"), (0.02, "first")):  # dN==0 / !=0
        fn_d = _device_iir_scale_fn(m * out_len, alpha, out_mode)
        x = jnp.take(jnp.asarray(res), jnp.asarray(idx), axis=0)
        x = jnp.moveaxis(x, 2, 1).reshape(Lb, C, m * out_len)
        exp, exp_st = fn_d(x, jnp.asarray(ls), jnp.asarray(tval),
                           jnp.asarray(ones), jnp.asarray(ones),
                           jnp.asarray(ones), jnp.asarray(ones))
        fn_b = _device_block_iir_scale_fn(out_len, alpha, out_mode, True)
        got, got_st = fn_b(jnp.asarray(res), jnp.asarray(idx),
                           jnp.asarray(tval), jnp.asarray(ls),
                           jnp.asarray(ones), jnp.asarray(ones),
                           jnp.asarray(ones), jnp.asarray(ones))
        assert got.shape == exp.shape
        for i in range(Lb):  # only the valid prefix is consumed downstream
            np.testing.assert_allclose(np.asarray(got)[i, :tval[i]],
                                       np.asarray(exp)[i, :tval[i]],
                                       rtol=0, atol=2e-3)
            np.testing.assert_allclose(np.asarray(got_st)[i],
                                       np.asarray(exp_st)[i],
                                       rtol=0, atol=2e-3)


def test_fleet_device_dsp_block_iir_interpret_close():
    """The STAGED device-DSP path with the Pallas block lowpass (interpret
    mode; device_restore=False pins the staged route now that the default
    routes uniform steps fully device-resident): per-lane output stays
    f32-close to the host f64 oracle."""
    datas = [make_flac(48000, 6, seed=70), make_flac(48000, 6, seed=71)]
    host, _ = run_fleet(datas)
    fleet = FlacFleet(len(datas), device_restore=False, device_dsp=True)
    fleet._block_iir = "interpret"
    dev, _ = run_fleet(datas, fleet=fleet)
    for a, b in zip(host, dev):
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=5e-3)


def test_fleet_fully_device_resident_step_close():
    """device_restore=True + device_dsp=True with uniform geometry routes
    through _device_full_step: parse metadata is the only host input and the
    final windows the only fetch (restore -> decorrelate -> normalize ->
    resample -> IIR -> scale all on device). Per-lane f32-closeness to the
    host f64 oracle, mono AND mid/side stereo, drip-fed; a spy asserts the
    device route actually ran."""
    calls = {"full": 0}

    class Spy(FlacFleet):
        def _device_full_step(self, parsed):
            r = super()._device_full_step(parsed)
            if r is not None:
                calls["full"] += 1
            return r

    for kwargs in ({"seed": 80}, {"seed": 81, "channels": 2, "chan_asgn": 10}):
        datas = [make_flac(48000, 6, **kwargs),
                 make_flac(48000, 6, **{**kwargs, "seed": kwargs["seed"] + 5})]
        host, _ = run_fleet(datas, chunk=4000)
        fleet = Spy(len(datas), device_restore=True, device_dsp=True)
        fleet._block_iir = "interpret"
        dev, _fl = run_fleet(datas, chunk=4000, fleet=fleet)
        for a, b in zip(host, dev):
            assert a.shape == b.shape
            np.testing.assert_allclose(b, a, atol=5e-3)
    assert calls["full"] >= 2


def test_fleet_unmeshed_device_route_takes_grouped_path():
    """An UNMESHED fully device-resident fleet must route uniform-geometry
    steps through the grouped-residency step (_device_grouped_fn — two
    relayouts per pass), not the lane-major mesh route: a silent routing
    regression would bring back the 4-6 relayout copies the round-5 profile
    eliminated. Outputs stay close to the host oracle."""
    calls = {"grouped": 0}

    class Spy(FlacFleet):
        def _device_full_step_grouped(self, *a, **k):
            r = super()._device_full_step_grouped(*a, **k)
            if r is not None:
                calls["grouped"] += 1
            return r

    datas = [make_flac(48000, 4, seed=170),
             make_flac(48000, 4, seed=171, channels=2, chan_asgn=8)]
    host, _ = run_fleet(datas)
    fleet = Spy(len(datas), device_restore=True, device_dsp=True)
    fleet._block_iir = "interpret"
    dev, _ = run_fleet(datas, fleet=fleet)
    assert calls["grouped"] >= 2  # both geometry groups took the new route
    for a, b in zip(host, dev):
        np.testing.assert_allclose(b, a, atol=5e-3)


def test_fleet_device_route_odd_block_size():
    """A uniform block size that is NOT a [32,128] time-tile multiple
    (n % 128 != 0) rides the grouped route's device-side time padding:
    identity-rate and resampling geometries both stay close to the host
    oracle (IIR finals read at out_len-1, window slice before transpose)."""
    datas = [make_flac(48000, 4, n=520, seed=200),
             make_flac(32000, 4, n=520, seed=201)]
    host, _ = run_fleet(datas)
    fleet = FlacFleet(2, device_restore=True, device_dsp=True)
    fleet._block_iir = "interpret"
    dev, _ = run_fleet(datas, fleet=fleet)
    for a, b in zip(host, dev):
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=5e-3)


def test_fleet_device_route_wasted_bits():
    """Wasted-bit subframes decode through the fully device-resident route:
    the per-row wasted shift rides the grouped metadata pack (verbatim rows,
    order 0 — no prediction, shift only), matching the host path."""
    n = 512
    r = np.random.default_rng(44)
    frames = []
    for k in range(4):
        sig = (r.integers(-1000, 1000, n) * 4).astype(np.int64)
        frames.append(fixtures.flac_frame(
            [{"type": "verbatim", "values": [int(v) >> 2 for v in sig],
              "wasted": 2}], n, 0, 16, frame_number=k))
    data = (fixtures.flac_stream_header(48000, 1, 16, 4 * n)
            + b"".join(frames))
    host, _ = run_fleet([data])
    fleet = FlacFleet(1, device_restore=True, device_dsp=True)
    fleet._block_iir = "interpret"
    dev, _ = run_fleet([data], fleet=fleet)
    assert host[0].shape == dev[0].shape
    np.testing.assert_allclose(dev[0], host[0], atol=5e-3)


def test_fleet_device_resident_mixed_geometry_falls_back():
    """A step whose frames span two block sizes (short final frame arriving
    with earlier full frames) is rejected by _device_full_step and decodes
    through the staged host path (device restore still on) — outputs close
    to a host-only fleet. A spy asserts BOTH routes actually ran."""
    calls = {"full": 0, "fallback": 0}

    class Spy(FlacFleet):
        def _device_full_step(self, parsed):
            r = super()._device_full_step(parsed)
            if r is not None:
                calls["full"] += 1
            return r

        def _lane_geometry(self, p):
            key = super()._lane_geometry(p)
            if key is None:
                calls["fallback"] += 1  # routed to the staged host path
            return key

    datas = [make_flac(44100, 4, seed=85, final_short=300),
             make_flac(44100, 4, seed=86, final_short=500)]
    host, _ = run_fleet(datas)
    fleet = Spy(len(datas), device_restore=True, device_dsp=True)
    fleet._block_iir = "interpret"
    dev, _ = run_fleet(datas, fleet=fleet)
    assert calls["full"] >= 1 and calls["fallback"] >= 1, calls
    for a, b in zip(host, dev):
        np.testing.assert_allclose(b, a, atol=5e-3)


def test_fleet_mixed_rate_device_groups():
    """A mixed-rate fleet partitions into per-geometry device groups: 48k and
    44.1k lanes BOTH take the fully-device route (one _device_full_step per
    geometry), while a short-final-frame lane falls back to the staged host
    path in the same step when its tail arrives. Outputs stay f32-close."""
    calls = {"full": 0, "fallback": 0}

    class Spy(FlacFleet):
        def _device_full_step(self, parsed):
            r = super()._device_full_step(parsed)
            calls["full" if r is not None else "fallback"] += 1
            return r

    datas = [make_flac(48000, 6, seed=130),
             make_flac(44100, 6, seed=131, channels=2, chan_asgn=9),
             make_flac(48000, 6, seed=132, final_short=200)]
    host, _ = run_fleet(datas, chunk=4000)
    fleet = Spy(len(datas), device_restore=True, device_dsp=True)
    fleet._block_iir = "interpret"
    dev, _ = run_fleet(datas, chunk=4000, fleet=fleet)
    assert calls["full"] >= 4, calls  # both geometries, multiple steps
    for a, b in zip(host, dev):
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=5e-3)


def test_fleet_device_restore_false_wins_over_mesh(monkeypatch):
    """An EXPLICIT device_restore=False keeps the host restore even under a
    mesh (restore_flat's documented opt-out, advisor r3 finding): the sharded
    route must never engage."""
    import jax

    from aukit_tpu.kernels import flac_pallas as kp
    from aukit_tpu.parallel.pipeline import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    def boom(*a, **k):
        raise AssertionError("sharded restore must not run with device=False")

    monkeypatch.setattr(kp, "lpc_restore_sharded", boom)
    datas = [make_flac(48000, 2, seed=77)]
    plain, _ = run_fleet(datas, fleet=FlacFleet(1, device_restore=False))
    hosted, _ = run_fleet(datas, fleet=FlacFleet(
        1, device_restore=False, mesh=make_mesh(8)))
    np.testing.assert_array_equal(plain[0], hosted[0])


# -- round 4: multichannel windows + per-fleet interpolation -------------------------

def solo_reference_mc(data):
    it, _total = st.flac(data, mono=False)
    chunks = [c for c, _p in it]
    return np.concatenate(chunks, axis=-1)


def run_fleet_mc(datas, fleet, chunk=4096):
    outs = [[] for _ in datas]
    offs = [0] * len(datas)
    eof = [False] * len(datas)
    guard = 0
    while not fleet.done:
        for i, d in enumerate(datas):
            if offs[i] < len(d):
                fleet.feed(i, d[offs[i]: offs[i] + chunk])
                offs[i] += chunk
            elif not eof[i]:
                fleet.feed(i, None)
                eof[i] = True
        r = fleet.step()
        guard += 1
        assert guard < 10_000
        if r is None:
            continue
        w, m, _pos = r
        assert w.ndim == 3
        for i in range(len(datas)):
            if m[i]:
                outs[i].append(w[i])
    return [np.concatenate(o, axis=-1) if o else
            np.zeros((fleet.out_ch, 0), np.float32) for o in outs]


def test_fleet_multichannel_stereo_bit_equals_solo():
    """mono=False: a stereo lane's window channels are BIT-equal to solo
    stream.flac(data, mono=False); a mono lane replicates channel 0 into the
    fleet's second channel (the chunk[i]-or-chunk[1] fallback)."""
    stereo = make_flac(44100, 8, channels=2, chan_asgn=10, seed=70)
    mono_d = make_flac(32000, 8, seed=71)
    fleet = FlacFleet(2, mono=False)
    outs = run_fleet_mc([stereo, mono_d], fleet)
    exp = solo_reference_mc(stereo)
    got = outs[0]
    assert got.shape[0] == 2 and got.shape[1] >= exp.shape[1]
    np.testing.assert_array_equal(got[:, : exp.shape[1]], exp)
    assert not got[:, exp.shape[1]:].any()
    # mono lane: channel 1 replicates channel 0; channel 0 equals mono solo
    m = outs[1]
    np.testing.assert_array_equal(m[0], m[1])
    exp_m = solo_reference_mc(mono_d)  # [1, T]
    np.testing.assert_array_equal(m[0][: exp_m.shape[1]], exp_m[0])


def test_fleet_multichannel_checkpoint_roundtrip():
    """mono=False checkpoints carry the 2-D FIFO remnant and resume
    bit-exactly mid-window."""
    data = make_flac(44100, 9, channels=2, chan_asgn=9, seed=72)
    fleet = FlacFleet(1, mono=False)
    full = run_fleet_mc([data], fleet)[0]
    # run a second fleet halfway, checkpoint, restore into a third
    f2 = FlacFleet(1, mono=False)
    half = len(data) // 2
    f2.feed(0, data[:half])
    got = []
    for _ in range(3):
        r = f2.step()
        if r is not None and r[1][0]:
            got.append(r[0][0])
    ck = f2.checkpoint(0)
    f3 = FlacFleet(1, mono=False)
    f3.restore(0, ck)
    f3.feed(0, data[ck["byte_offset"] + len(ck["pending"]):])
    f3.feed(0, None)
    guard = 0
    while not f3.done:
        r = f3.step()
        guard += 1
        assert guard < 1000
        if r is not None and r[1][0]:
            got.append(r[0][0])
    resumed = np.concatenate(got, axis=-1)
    np.testing.assert_array_equal(resumed, full)


def test_fleet_interpolation_override(monkeypatch):
    """FlacFleet(interpolation=...) pins the fleet's resample mode at
    construction without touching global CONFIG (VERDICT r3 weak 6)."""
    import aukit_tpu.config as cfgmod

    data = make_flac(44100, 5, seed=73)
    assert cfgmod.CONFIG.default_interpolation == "linear"
    linear = run_fleet([data])[0][0]  # default (linear) fleet, built first
    fleet_cubic = FlacFleet(1, interpolation="cubic")
    assert fleet_cubic.mode == "cubic"
    got = run_fleet([data], fleet=fleet_cubic)[0][0]
    # solo reference under a cubic default
    monkeypatch.setattr(cfgmod.CONFIG, "default_interpolation", "cubic")
    exp = solo_reference(data)
    np.testing.assert_array_equal(got[: len(exp)], exp)
    assert not np.array_equal(got[: len(exp)], linear[: len(exp)])


def test_fleet_multichannel_device_dsp_close():
    """mono=False + device_dsp: the f32 device twin keeps the channel axis
    ("multi" out_mode) and stays within the documented f32 tolerance of the
    host multichannel fleet."""
    import jax

    datas = [make_flac(48000, 6, channels=2, chan_asgn=8, seed=74),
             make_flac(48000, 6, channels=2, chan_asgn=8, seed=75)]
    host = run_fleet_mc(datas, FlacFleet(2, mono=False))
    fleet = FlacFleet(2, device_restore=True, device_dsp=True, mono=False)
    if jax.default_backend() != "tpu":
        fleet._block_iir = "interpret"
    dev = run_fleet_mc(datas, fleet)
    for a, b in zip(host, dev):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=5e-3)


# -- round 4: all-mode device DSP + mesh device route --------------------------------

@pytest.mark.parametrize("mode", ["none", "linear", "cubic", "sinc"])
def test_fleet_device_dsp_all_interpolation_modes(mode):
    """VERDICT r3 item 5: the device DSP twins run ALL four interpolation
    modes (cubic/sinc gather cross-frame history on device); each stays
    within the documented f32 tolerance of the host fleet in the same mode."""
    import jax

    datas = [make_flac(44100, 5, seed=60, channels=2, chan_asgn=10),
             make_flac(44100, 5, seed=61, channels=2, chan_asgn=10)]
    host, _ = run_fleet(datas, fleet=FlacFleet(2, interpolation=mode))
    fleet = FlacFleet(2, device_restore=True, device_dsp=True,
                      interpolation=mode)
    if jax.default_backend() != "tpu":
        fleet._block_iir = "interpret"
    dev, _ = run_fleet(datas, fleet=fleet)
    for a, b in zip(host, dev):
        assert len(a) == len(b) > 0
        np.testing.assert_allclose(a, b, atol=5e-3)


@pytest.mark.parametrize("mode", ["linear", "cubic"])
def test_fleet_device_route_sharded_over_mesh_bit_exact(mode):
    """VERDICT r3 item 4: the fully device-resident fleet step runs under a
    mesh — the Pallas restore and block-IIR segments shard row-wise via
    shard_map — and is BIT-identical to the unsharded device route."""
    import jax

    from aukit_tpu.parallel.pipeline import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    datas = [make_flac(48000, 4, seed=62 + i) for i in range(3)]

    def run(mesh):
        fleet = FlacFleet(3, device_restore=True, device_dsp=True, mesh=mesh,
                          interpolation=mode)
        fleet._block_iir = "interpret"
        return run_fleet(datas, fleet=fleet)[0]

    plain, sharded = run(None), run(make_mesh(8))
    for a, b in zip(plain, sharded):
        assert len(a) == len(b) > 0
        np.testing.assert_array_equal(a, b)


def test_fleet_per_lane_volume():
    """Per-lane fleet volume: a 0.5-gained lane's windows equal the ungained
    lane's windows x 0.5 exactly (power-of-two scale, no clipping), on both
    the host path and the device DSP twin; checkpoints carry the gain."""
    import jax

    data = make_flac(44100, 5, seed=90)
    base, _ = run_fleet([data])
    fleet = FlacFleet(1)
    fleet.set_volume(0, 0.5)
    got, fleet = run_fleet([data], fleet=fleet)
    b, g = base[0], got[0]
    unclipped = np.abs(b) < 127
    np.testing.assert_array_equal(g[unclipped], (b * 0.5)[unclipped])
    assert fleet.checkpoint(0)["gain"] == 0.5

    dev = FlacFleet(1, device_restore=True, device_dsp=True)
    if jax.default_backend() != "tpu":
        dev._block_iir = "interpret"
    dev.set_volume(0, 0.5)
    dv, _ = run_fleet([data], fleet=dev)
    np.testing.assert_allclose(dv[0], g, atol=5e-3)


def test_fleet_device_dsp_checkpoint_into_host():
    """VERDICT r3 weak 2 / item 8: a checkpoint taken mid-stream from a
    device_dsp fleet restores into a HOST-path fleet; the resumed stream
    matches the all-host run within the f32-state bound the checkpoint
    docstring pins (and the joint stream deviates nowhere beyond the twin
    tolerance)."""
    import jax

    data = make_flac(44100, 100, seed=95, channels=2, chan_asgn=10)
    full, _ = run_fleet([data])  # all-host oracle

    dev = FlacFleet(1, device_restore=True, device_dsp=True)
    if jax.default_backend() != "tpu":
        dev._block_iir = "interpret"
    half = len(data) // 2
    dev.feed(0, data[:half])
    got = []
    for _ in range(4):
        r = dev.step()
        if r is not None and r[1][0]:
            got.append(r[0][0])
    assert got, "device fleet must have produced windows before checkpoint"
    ck = dev.checkpoint(0)
    host = FlacFleet(1)  # restore into the host-path fleet
    host.restore(0, ck)
    host.feed(0, data[ck["byte_offset"] + len(ck["pending"]):])
    host.feed(0, None)
    guard = 0
    while not host.done:
        r = host.step()
        guard += 1
        assert guard < 1000
        if r is not None and r[1][0]:
            got.append(r[0][0])
    resumed = np.concatenate(got)
    assert len(resumed) == len(full[0])
    # the pre-checkpoint windows carry the f32 twin deviation; the resumed
    # tail additionally carries the f32-rounded carried state — both stay
    # within the documented tolerance of the all-host run
    np.testing.assert_allclose(resumed, full[0], atol=5e-3)


def test_fleet_three_channel_independent_subframes():
    """FLAC beyond stereo: 3 independent-channel frames (chan_asgn <= 7)
    through the fleet — mono mix matches solo, and a mono=False channels=3
    fleet is BIT-equal per channel to solo stream.flac(mono=False)."""
    data = make_flac(44100, 6, channels=3, chan_asgn=2, seed=99)
    outs, _ = run_fleet([data])
    assert_lane_equals_solo(outs[0], data)

    fleet = FlacFleet(1, mono=False, channels=3)
    got = run_fleet_mc([data], fleet)[0]
    exp = solo_reference_mc(data)
    assert got.shape[0] == 3
    np.testing.assert_array_equal(got[:, : exp.shape[1]], exp)
    assert not np.array_equal(exp[0], exp[1])


def test_fleet_volume_ramp():
    """VERDICT r4 item 7: ``set_volume(ramp=True)`` moves a FLAC lane's gain
    click-free along a linear line over the next second of output — matching
    the engine-lane ramp semantics (BatchStreamEngine.set_volume ramp=True:
    one chunk == one second). The ramped stream equals the unity stream times
    the per-sample gain line, the first ramped sample sits at the old gain
    (no click), and after the ramp the lane is bit-exactly a constant-gain
    lane. Checkpoints carry the mid-ramp cursor."""
    data = make_flac(48000, 110, seed=91)  # ~2.3 s at 48k
    base, _ = run_fleet([data])
    fleet = FlacFleet(1)
    fleet.set_volume(0, 0.25, ramp=True)
    got, fleet = run_fleet([data], fleet=fleet)
    b, g = base[0], got[0]
    n = len(b)
    assert n > 2 * 48000
    t = np.arange(n, dtype=np.float64)
    line = 1.0 + (0.25 - 1.0) * np.minimum(t / 48000.0, 1.0)
    unclipped = np.abs(b) < 127
    np.testing.assert_allclose(g[unclipped], (b * line)[unclipped], atol=0.02)
    # no click at the ramp start: the first samples ride the OLD gain
    np.testing.assert_allclose(g[:16], b[:16], atol=0.02)
    # beyond the ramp: exactly the constant-gain lane (0.25 = 2^-2, exact)
    const = FlacFleet(1)
    const.set_volume(0, 0.25)
    cg, _ = run_fleet([data], fleet=const)
    np.testing.assert_array_equal(g[2 * 48000:], cg[0][2 * 48000:])

    # a mid-ramp re-ramp starts from the instantaneous gain (continuity):
    # drip small chunks so the ramp is caught mid-flight
    f2 = FlacFleet(1)
    f2.set_volume(0, 0.0, ramp=True)
    off = 0
    while f2._lanes[0].ramp_pos == 0 and off < len(data) // 2:
        f2.feed(0, data[off: off + 4096])
        off += 4096
        f2.step()
    mid = FlacFleet._instant_gain(f2._lanes[0])
    assert 0.0 < mid < 1.0  # ramp is live mid-flight
    f2.set_volume(0, 1.0, ramp=True)
    assert abs(FlacFleet._instant_gain(f2._lanes[0]) - mid) < 1e-9
    ck = f2.checkpoint(0)
    assert ck["ramp"][2] == 48000  # span survives the checkpoint
    f3 = FlacFleet(1)
    f3.restore(0, ck)
    assert abs(FlacFleet._instant_gain(f3._lanes[0]) - mid) < 1e-9


def test_fleet_volume_ramp_device_dsp():
    """The device DSP twins compute the same ramp line (f32): a ramped
    device-route lane tracks the ramped host lane within the twin
    tolerance."""
    import jax

    data = make_flac(44100, 3, seed=92)
    host = FlacFleet(1)
    host.set_volume(0, 0.5, ramp=True)
    hg, _ = run_fleet([data], fleet=host)

    dev = FlacFleet(1, device_restore=True, device_dsp=True)
    if jax.default_backend() != "tpu":
        dev._block_iir = "interpret"
    dev.set_volume(0, 0.5, ramp=True)
    dg, _ = run_fleet([data], fleet=dev)
    np.testing.assert_allclose(dg[0], hg[0], atol=5e-3)
