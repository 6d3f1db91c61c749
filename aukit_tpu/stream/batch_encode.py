"""Batched multi-stream DFPWM ENCODER engine — the transcode mirror of
stream/batch.py (SURVEY.md §2.4's batch axis applied to the write path; the
reference's encode surface is Audio:dfpwm / the DFPWM-in-WAV writer,
aukit.lua:1005/942, one stream at a time).

Fixed lanes of 48 kHz sample streams encode to DFPWM bytes, one fused device
dispatch per step (Pallas kernel on TPU, lax.scan elsewhere), with per-lane
encoder state carried on device — a mass-transcode fleet: thousands of
concurrent PCM feeds emit DFPWM at once.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.dfpwm import DfpwmState, dfpwm_encode
from .batch import BatchMetrics, _GroupIO

__all__ = ["BatchDfpwmEncoder"]


class BatchDfpwmEncoder:
    """Fixed-lane batched PCM8 -> DFPWM encoder.

    Feed signed 8-bit sample bytes per lane (``feed``/``feed_array``, same
    ingestion surface as the decode engine, incl. device-resident arrays);
    every ``step()`` consumes ``chunk_samples`` per ready lane and returns
    (bytes uint8[L, chunk_samples//8] device array, mask, positions_seconds).
    Trailing partials are zero-padded to whole bytes (the reference encoder
    consumes whole bytes, aukit.lua:1009).
    """

    def __init__(self, lanes: int, chunk_samples: int = 48000, use_pallas: bool | None = None):
        if chunk_samples % 8:
            raise ValueError("chunk_samples must be a multiple of 8")
        self.lanes = lanes
        self.chunk_samples = chunk_samples
        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          and lanes * chunk_samples >= 1 << 20)
        self.use_pallas = use_pallas
        self.io = _GroupIO(lanes, chunk_samples)  # 1 byte per sample (pcm8)
        self.state = DfpwmState.zeros(lanes)
        self.samples_in = np.zeros(lanes, np.int64)
        self.metrics = BatchMetrics()
        self._step_fn = self._build_step()

    def _build_step(self):
        use_pallas = self.use_pallas

        def step(bytes_u8, mask2d, charge, strength, prev_bit):
            v = bytes_u8.astype(jnp.int32)
            levels = jnp.where(v >= 128, v - 256, v)  # signed 8-bit samples
            state = DfpwmState(charge, strength, prev_bit,
                               jnp.zeros_like(charge), jnp.zeros_like(charge))
            if use_pallas:
                from ..kernels.dfpwm_pallas import dfpwm_encode_pallas

                enc, new_state = dfpwm_encode_pallas(levels, state)
            else:
                enc, new_state = dfpwm_encode(levels, state)
            mask1 = mask2d[:, 0]
            enc = jnp.where(mask2d[:, : enc.shape[1]], enc, 0)
            keep = lambda n, o: jnp.where(mask1, n, o)
            return (enc, keep(new_state.charge, charge),
                    keep(new_state.strength, strength),
                    keep(new_state.previous_bit, prev_bit))

        return jax.jit(step)

    # ingestion mirrors the decode engine
    def feed(self, lane: int, data: bytes | None):
        self.io.feed_lane(lane, data)

    def feed_many(self, datas: Sequence[bytes | None]):
        for lane, d in enumerate(datas):
            self.feed(lane, d)

    def feed_array(self, arr, eof: bool = True):
        self.io.feed_bulk(arr, eof)

    @property
    def done(self) -> bool:
        return self.io.exhausted

    def step(self):
        """Encode one chunk across all lanes, or None when finished/starved.
        Returns (dfpwm uint8[L, chunk//8] device array, mask, positions)."""
        if self.done:
            return None
        t0 = time.perf_counter()
        st = self.io.stage()
        if st is None:
            return None
        staged, ready, consumed, underrun = st
        positions = self.samples_in / 48000.0
        dev = jnp.asarray(staged)
        enc, charge, strength, prev_bit = self._step_fn(
            dev, jnp.asarray(ready[:, None]),
            self.state.charge, self.state.strength, self.state.previous_bit)
        self.state = DfpwmState(charge, strength, prev_bit,
                                self.state.previous_charge, self.state.lowpass)
        self.samples_in += np.where(ready, consumed, 0)
        self.metrics.steps += 1
        self.metrics.samples_decoded += int(ready.sum()) * self.chunk_samples
        self.metrics.underruns += int(underrun)
        self.metrics.wall_seconds += time.perf_counter() - t0
        return enc, ready, positions
