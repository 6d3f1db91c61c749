"""The Audio object: a pytree of ``f32[channels, samples]`` plus sample rate.

TPU-native redesign of the reference's Audio class (aukit.lua:631-1024, C7 in
SURVEY.md). Where the reference stores per-channel Lua arrays of doubles in
[-1, 1] and loops per sample, we store one dense ``jnp.ndarray[C, N]`` and
express every operation as a pure, jit-compatible array transform so XLA fuses
chains of ops into single kernels.

Semantics parity notes (reference line numbers):
 - ``resample``      aukit.lua:653  ratio interpolation, clamp only on fractional x
 - ``mono``          aukit.lua:677  mean over channels
 - ``concat``        aukit.lua:696  time-axis concat, auto-resample, zero-fill
 - ``sub``           aukit.lua:726  seconds-based subregion, +/-/0 end conventions
 - ``combine``       aukit.lua:751  channel-axis concat, zero-pad to longest
 - ``split``         aukit.lua:779  select channel subsets
 - ``mix``           aukit.lua:804  sum + amplify + clip (audio-as-amplifier form)
 - ``rep``           aukit.lua:840  tiling
 - ``reverse``       aukit.lua:857  time reversal
 - operators         aukit.lua:1020 ``+``=combine ``*``=rep (``..``=concat -> .concat)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import get_interpolation
from .utils.validation import check_bit_depth, check_data_type


def _as_data(x) -> jnp.ndarray:
    arr = jnp.asarray(x, dtype=jnp.float32)
    if arr.ndim == 1:
        arr = arr[None, :]
    if arr.ndim != 2:
        raise ValueError(f"audio data must be [channels, samples], got shape {arr.shape}")
    return arr


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Audio:
    """A chunk of audio: ``data[C, N]`` float32 in [-1, 1] at ``sample_rate`` Hz."""

    data: jnp.ndarray
    sample_rate: int
    metadata: dict = dataclasses.field(default_factory=dict)
    info: dict = dataclasses.field(default_factory=dict)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.sample_rate, self.metadata, self.info)

    @classmethod
    def tree_unflatten(cls, aux, children):
        sample_rate, metadata, info = aux
        return cls(children[0], sample_rate, metadata, info)

    # -- basic queries -------------------------------------------------------
    @property
    def channels(self) -> int:
        """Number of channels (reference Audio:channels, aukit.lua:644)."""
        return int(self.data.shape[0])

    @property
    def num_samples(self) -> int:
        return int(self.data.shape[1])

    @property
    def duration(self) -> float:
        """Length in seconds (reference Audio:len / ``#audio``, aukit.lua:638)."""
        return self.num_samples / self.sample_rate

    def __len__(self) -> int:
        return self.num_samples

    def __repr__(self) -> str:
        return (
            f"Audio: {self.sample_rate} Hz, {self.channels} channels, "
            f"{self.duration} seconds"
        )

    def _like(self, data: jnp.ndarray, sample_rate: int | None = None) -> "Audio":
        return Audio(
            data,
            sample_rate if sample_rate is not None else self.sample_rate,
            dict(self.metadata),
            dict(self.info),
        )

    # -- transforms ----------------------------------------------------------
    def resample(self, sample_rate: int, interpolation: str | None = None) -> "Audio":
        """Resample to a new rate (reference Audio:resample, aukit.lua:653)."""
        from .ops.resample import resample_audio_array

        interpolation = get_interpolation(interpolation)
        if sample_rate == self.sample_rate:
            return self._like(self.data)
        out = resample_audio_array(self.data, self.sample_rate, sample_rate, interpolation)
        return self._like(out, sample_rate)

    def mono(self) -> "Audio":
        """Mix all channels to one by arithmetic mean (aukit.lua:677)."""
        return self._like(jnp.mean(self.data, axis=0, keepdims=True))

    def concat(self, *others: "Audio") -> "Audio":
        """Concatenate along time (aukit.lua:696): later audios are resampled to
        this rate; missing channels are zero-filled."""
        audios = [self] + [o.resample(self.sample_rate) if o.sample_rate != self.sample_rate else o for o in others]
        cn = max(a.channels for a in audios)
        parts = []
        for a in audios:
            d = a.data
            if a.channels < cn:
                d = jnp.concatenate(
                    [d, jnp.zeros((cn - a.channels, d.shape[1]), d.dtype)], axis=0
                )
            parts.append(d)
        return self._like(jnp.concatenate(parts, axis=1))

    def sub(self, start: float | None = None, last: float | None = None) -> "Audio":
        """Subregion in *seconds* with string.sub-like conventions (aukit.lua:726):
        negative start counts from the end; ``last <= 0`` counts from the end."""
        start = int(np.floor(start or 0))
        last = int(np.floor(last or 0))
        length = self.num_samples / self.sample_rate
        if start < 0:
            start = length + start
        if last <= 0:
            last = length + last
        if not (0 <= start <= length and 0 <= last <= length):
            raise ValueError("sub range out of bounds")
        i0 = int(start * self.sample_rate)
        i1 = int(last * self.sample_rate) + 1  # inclusive end, like the reference
        return self._like(self.data[:, i0:i1])

    def combine(self, *others: "Audio") -> "Audio":
        """Stack channels (aukit.lua:751), zero-padding shorter audio."""
        audios = [self] + [o.resample(self.sample_rate) if o.sample_rate != self.sample_rate else o for o in others]
        n = max(a.num_samples for a in audios)
        parts = []
        for a in audios:
            d = a.data
            if d.shape[1] < n:
                d = jnp.pad(d, ((0, 0), (0, n - d.shape[1])))
            parts.append(d)
        return self._like(jnp.concatenate(parts, axis=0))

    def split(self, *channel_lists: Sequence[int]) -> "Audio | tuple[Audio, ...]":
        """Select channel subsets (1-based indices, like the reference,
        aukit.lua:779). Returns one Audio per list."""
        out = []
        for cl in channel_lists:
            if len(cl) == 0:
                raise ValueError("cannot use empty channel list")
            for c in cl:
                if not (1 <= c <= self.channels):
                    raise ValueError(f"channel {c} out of range")
            idx = jnp.asarray([c - 1 for c in cl], dtype=jnp.int32)
            out.append(self._like(self.data[idx, :]))
        return out[0] if len(out) == 1 else tuple(out)

    def mix(self, amplifier, *others: "Audio") -> "Audio":
        """Mix audios sample-wise with optional amplifier then clip (aukit.lua:804).
        ``amplifier`` may be a number or another Audio (then treated as an input
        with amplifier 1, matching the reference)."""
        audios = [self]
        amp = 1.0
        if isinstance(amplifier, Audio):
            audios.append(
                amplifier.resample(self.sample_rate)
                if amplifier.sample_rate != self.sample_rate
                else amplifier
            )
        else:
            amp = float(amplifier)
        audios += [o.resample(self.sample_rate) if o.sample_rate != self.sample_rate else o for o in others]
        n = max(a.num_samples for a in audios)
        cn = max(a.channels for a in audios)
        acc = jnp.zeros((cn, n), jnp.float32)
        for a in audios:
            d = a.data
            d = jnp.pad(d, ((0, cn - d.shape[0]), (0, n - d.shape[1])))
            acc = acc + d
        return self._like(jnp.clip(acc * amp, -1.0, 1.0))

    def rep(self, count: int) -> "Audio":
        """Repeat ``count`` times along time (aukit.lua:840)."""
        return self._like(jnp.tile(self.data, (1, int(count))))

    def reverse(self) -> "Audio":
        """Reverse along time (aukit.lua:857)."""
        return self._like(self.data[:, ::-1])

    # -- operators (aukit.lua:1020) -------------------------------------------
    def __add__(self, other: "Audio") -> "Audio":
        return self.combine(other)

    def __mul__(self, count: int) -> "Audio":
        return self.rep(count)

    __rmul__ = __mul__

    # -- encoders --------------------------------------------------------------
    def pcm(self, bit_depth: int = 8, data_type: str = "signed", interleaved: bool = True):
        """Convert to raw PCM sample values (reference Audio:pcm, aukit.lua:901).

        Returns a numpy float array of *unquantized* sample values exactly like the
        reference's encodePCM (aukit.lua:868): ``d * (d < 0 ? 2^(b-1) : 2^(b-1)-1)
        + bias`` with no rounding (and the float path returning data untouched,
        reference quirk Q2).
        Shape: ``[C*N]`` interleaved or ``[C, N]`` planar.
        """
        from .ops.pcmcode import encode_pcm_values

        check_bit_depth(bit_depth)
        check_data_type(data_type, bit_depth)
        vals = encode_pcm_values(np.asarray(self.data), bit_depth, data_type)
        if interleaved:
            return vals.T.reshape(-1)
        return vals

    def to_pcm_bytes(
        self,
        bit_depth: int = 8,
        data_type: str = "signed",
        interleaved: bool = True,
        big_endian: bool = False,
    ) -> bytes:
        """Quantize and serialize to raw PCM bytes (framework-native helper;
        composes Audio:pcm + aukit.pack, aukit.lua:901/1861)."""
        from .ops.pcmcode import pack_pcm

        vals = self.pcm(bit_depth, data_type, interleaved)
        return pack_pcm(np.asarray(vals).reshape(-1), bit_depth, data_type, big_endian)

    def wav(self, bit_depth: int = 16) -> bytes:
        """Encode as a WAV file (reference Audio:wav, aukit.lua:942).
        ``bit_depth == 1`` produces DFPWM-in-WAV (WAVE_FORMAT_EXTENSIBLE)."""
        from .containers.wav import encode_wav

        return encode_wav(self, bit_depth)

    def dfpwm(self, interleaved: bool = True):
        """Encode to DFPWM1a (reference Audio:dfpwm, aukit.lua:1005). All channels
        share one encoder when interleaved; otherwise one encoder per channel."""
        from .codecs.dfpwm import encode_dfpwm_audio

        return encode_dfpwm_audio(self, interleaved)

    def stream(self, chunk_size: int = 131072, bit_depth: int = 8, data_type: str = "signed"):
        """Chunked PCM iterator (reference Audio:stream, aukit.lua:921): yields
        ``(values_per_channel, position_seconds)`` tuples."""
        check_bit_depth(bit_depth)
        check_data_type(data_type, bit_depth)
        from .ops.pcmcode import encode_pcm_values

        data = np.asarray(self.data)
        total = data.shape[1]
        sr = self.sample_rate

        def iterator():
            pos = 0
            while pos < total:
                chunk = encode_pcm_values(data[:, pos : pos + chunk_size], bit_depth, data_type)
                yield chunk, pos / sr
                pos += chunk_size

        return iterator(), total / sr


def new_audio(data, sample_rate: int, metadata: dict | None = None, info: dict | None = None) -> Audio:
    return Audio(_as_data(data), int(sample_rate), metadata or {}, info or {})
