"""Batched multi-stream decode engine: thousands of concurrent streams in one
sharded dispatch (SURVEY.md §2.4 "the north-star axis", §5.7, §5.8).

Where the reference decodes one stream per coroutine, this engine packs many
independent streams into fixed lanes:

 - host side: one ring buffer per lane fed by ``feed()`` (network/file
   ingestion), with per-lane EOF;
 - device side: one fused dispatch per ``step()``: batched codec kernel
   (Pallas on TPU, lax.scan elsewhere) -> resample -> FIR -> int8, plus
   per-lane state carried on device between steps — no host round-trips for
   state (SURVEY.md §7 hard part 3);
 - lanes that are exhausted or unfed are masked, not removed: a poisoned or
   starved lane never stalls the batch (§5.3 per-stream error isolation);
 - per-lane serializable checkpoints (§5.4): byte offset + codec state + DSP
   state; ``checkpoint()``/``restore()`` round-trip through numpy;
 - optional ``jax.sharding.Mesh``: lanes are sharded over the mesh so the same
   engine scales across chips with XLA-inserted collectives only.

Round-1 engine covers DFPWM (the flagship codec); the block-parallel codecs
(ADPCM/QOA) batch naturally through their block-lane kernels in stream/*.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.dfpwm import DfpwmState, dfpwm_decode
from ..config import CONFIG
from ..parallel.pipeline import dsp_chain


@dataclasses.dataclass
class BatchMetrics:
    """Per-engine counters (SURVEY.md §5.5)."""

    steps: int = 0
    samples_decoded: int = 0
    wall_seconds: float = 0.0
    underruns: int = 0  # steps where some active lane had no data

    @property
    def realtime_factor(self) -> float:
        if self.wall_seconds == 0:
            return 0.0
        return self.samples_decoded / self.wall_seconds / CONFIG.output_rate


class BatchDfpwmDecoder:
    """Fixed-lane batched codec -> 48 kHz int8 decoder.

    Parameters
    ----------
    lanes : number of concurrent streams
    sample_rate : input sample rate (all lanes; group streams by rate)
    chunk_bytes : input bytes consumed per lane per step
    mesh : optional Mesh; lanes are sharded over all mesh axes
    codec : "dfpwm" (default; Pallas kernel on TPU), "ulaw"/"alaw" (G.711
        arithmetic expand), or "pcm8" (signed 8-bit passthrough) — the
        byte-oriented codecs whose batched decode is one fused device op
    """

    def __init__(
        self,
        lanes: int,
        sample_rate: int = 48000,
        chunk_bytes: int = 6000,
        mesh: jax.sharding.Mesh | None = None,
        use_pallas: bool | None = None,
        codec: str = "dfpwm",
    ):
        if codec not in ("dfpwm", "ulaw", "alaw", "pcm8"):
            raise ValueError(f"unsupported batch codec {codec!r}")
        self.codec = codec
        self.samples_per_byte = 8 if codec == "dfpwm" else 1
        self.lanes = lanes
        self.sample_rate = sample_rate
        self.chunk_bytes = chunk_bytes
        self.mesh = mesh
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu" and mesh is None
        self.use_pallas = use_pallas
        self._buffers: list[bytearray] = [bytearray() for _ in range(lanes)]
        self._eof = np.zeros(lanes, dtype=bool)
        self._positions = np.zeros(lanes, dtype=np.int64)  # bytes consumed
        self.state = DfpwmState.zeros(lanes)
        self.fir = jnp.zeros(lanes, jnp.float32)  # carried DSP filter state
        self.metrics = BatchMetrics()
        self._sharding = None
        if mesh is not None:
            P = jax.sharding.PartitionSpec
            self._sharding = jax.sharding.NamedSharding(mesh, P(tuple(mesh.axis_names), None))
        self._step_fn = self._build_step()

    def _build_step(self):
        sr = self.sample_rate
        codec = self.codec

        def step(bytes_u8, mask, charge, strength, prev_bit, prev_charge, lowpass, fir):
            state = DfpwmState(charge, strength, prev_bit, prev_charge, lowpass)
            mask1d = mask[:, 0]

            def keep(new, old):
                return jnp.where(mask1d, new, old)

            if codec == "dfpwm":
                if self.use_pallas:
                    from ..kernels.dfpwm_pallas import dfpwm_decode_pallas

                    decoded, new_state = dfpwm_decode_pallas(bytes_u8, state)
                    decoded = decoded.astype(jnp.int32)
                else:
                    decoded, new_state = dfpwm_decode(bytes_u8, state)
                # lanes without data this step keep their previous state
                new_state = DfpwmState(
                    keep(new_state.charge, state.charge),
                    keep(new_state.strength, state.strength),
                    keep(new_state.previous_bit, state.previous_bit),
                    keep(new_state.previous_charge, state.previous_charge),
                    keep(new_state.lowpass, state.lowpass),
                )
                f = decoded.astype(jnp.float32) / jnp.where(decoded < 0, 128.0, 127.0)
            elif codec in ("ulaw", "alaw"):
                from ..codecs.g711 import decode_g711_device

                f = decode_g711_device(bytes_u8, codec == "ulaw", 1, 0x2000)[:, 0, :]
                new_state = state
            else:  # pcm8: signed 8-bit
                v = bytes_u8.astype(jnp.int32)
                v = jnp.where(v >= 128, v - 256, v)
                f = v.astype(jnp.float32) / jnp.where(v < 0, 128.0, 127.0)
                new_state = state
            out, new_fir = dsp_chain(f, sr, CONFIG.output_rate, fir_state=fir)
            out = jnp.where(mask, out, 0)
            return (
                out,
                new_state.charge,
                new_state.strength,
                new_state.previous_bit,
                new_state.previous_charge,
                new_state.lowpass,
                keep(new_fir, fir),
            )

        if self.use_pallas:
            return step  # dfpwm_decode_pallas is jitted internally; keep host glue
        if self._sharding is not None:
            state_sh = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec(tuple(self.mesh.axis_names)))
            return jax.jit(
                step,
                in_shardings=(self._sharding, state_sh) + (state_sh,) * 6,
                out_shardings=(self._sharding,) + (state_sh,) * 6,
            )
        return jax.jit(step)

    # -- ingestion ---------------------------------------------------------------
    def feed(self, lane: int, data: bytes | None):
        """Append bytes to a lane's ring buffer; None marks end-of-stream
        (SURVEY.md §5.8 host ingestion boundary)."""
        if data is None:
            self._eof[lane] = True
        else:
            self._buffers[lane].extend(data)

    def feed_many(self, datas: Sequence[bytes | None]):
        for lane, d in enumerate(datas):
            self.feed(lane, d)

    @property
    def active(self) -> np.ndarray:
        return ~self._eof | np.array([len(b) > 0 for b in self._buffers])

    @property
    def done(self) -> bool:
        return bool(np.all(self._eof) and not any(self._buffers))

    # -- the batched step -----------------------------------------------------------
    def step(self):
        """Decode one chunk across all lanes.

        Returns (chunk int8[L, out_samples], mask bool[L], positions float[L])
        or None when every lane is finished. ``mask`` marks lanes that produced
        real audio this step; ``positions`` are per-lane stream positions in
        seconds at chunk start.
        """
        if self.done:
            return None
        t0 = time.perf_counter()
        n = self.chunk_bytes
        staged = np.zeros((self.lanes, n), np.uint8)
        mask = np.zeros(self.lanes, dtype=bool)
        underrun = False
        for lane in range(self.lanes):
            buf = self._buffers[lane]
            if len(buf) >= n:
                # zero-copy view of the bytearray, single copy into the staging
                staged[lane] = np.frombuffer(buf, np.uint8, count=n)
                del buf[:n]
                mask[lane] = True
            elif self._eof[lane] and len(buf) > 0:
                take = len(buf)
                staged[lane, :take] = np.frombuffer(buf, np.uint8, count=take)
                del buf[:]
                mask[lane] = True  # trailing partial chunk (zero-padded tail)
            elif not self._eof[lane]:
                underrun = True
        if not mask.any():
            return None
        positions = self._positions * float(self.samples_per_byte) / self.sample_rate
        self._positions += np.where(mask, n, 0)
        dev_bytes = jnp.asarray(staged)
        dev_mask = jnp.asarray(mask[:, None])
        if self._sharding is not None:
            dev_bytes = jax.device_put(dev_bytes, self._sharding)
        out, *st = self._step_fn(
            dev_bytes,
            dev_mask,
            self.state.charge,
            self.state.strength,
            self.state.previous_bit,
            self.state.previous_charge,
            self.state.lowpass,
            self.fir,
        )
        self.state = DfpwmState(*st[:5])
        self.fir = st[5]
        self.metrics.steps += 1
        self.metrics.samples_decoded += int(mask.sum()) * n * self.samples_per_byte
        self.metrics.underruns += int(underrun)
        self.metrics.wall_seconds += time.perf_counter() - t0
        return out, mask, positions

    # -- checkpoint / resume (SURVEY.md §5.4) ------------------------------------------
    def checkpoint(self, lane: int) -> dict:
        """Serializable per-stream state: re-feeding bytes from ``byte_offset``
        after ``restore`` resumes the stream exactly."""
        return {
            "byte_offset": int(self._positions[lane]),
            "pending": bytes(self._buffers[lane]),
            "eof": bool(self._eof[lane]),
            "codec_state": {
                f: int(np.asarray(getattr(self.state, f))[lane])
                for f in ("charge", "strength", "previous_bit", "previous_charge", "lowpass")
            },
            "fir_state": float(np.asarray(self.fir)[lane]),
        }

    def restore(self, lane: int, ckpt: dict):
        self._positions[lane] = ckpt["byte_offset"]
        self._buffers[lane] = bytearray(ckpt["pending"])
        self._eof[lane] = ckpt["eof"]
        arrs = {f: np.asarray(getattr(self.state, f)) for f in
                ("charge", "strength", "previous_bit", "previous_charge", "lowpass")}
        for f, v in ckpt["codec_state"].items():
            a = arrs[f].copy()
            a[lane] = v
            arrs[f] = a
        self.state = DfpwmState(*(jnp.asarray(arrs[f]) for f in
                                  ("charge", "strength", "previous_bit", "previous_charge", "lowpass")))
        fir = np.asarray(self.fir).copy()
        fir[lane] = ckpt.get("fir_state", 0.0)
        self.fir = jnp.asarray(fir)

    def reset_lane(self, lane: int):
        """Reuse a finished lane for a new stream."""
        self._buffers[lane] = bytearray()
        self._eof[lane] = False
        self._positions[lane] = 0
        zero = {"byte_offset": 0, "pending": b"", "eof": False, "fir_state": 0.0,
                "codec_state": {f: 0 for f in ("charge", "strength", "previous_bit", "previous_charge", "lowpass")}}
        self.restore(lane, zero)
