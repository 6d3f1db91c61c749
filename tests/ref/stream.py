"""Loop reference for the stream.pcm chunk pipeline (aukit.lua:2228-2424).

Transliterates the lazy per-sample reads, warmup, per-chunk carry, FIR
"lowpass" and int8 scaling with the framework's *fixed* semantics:
 - filter state carries across chunks (``quirk_q9=True`` reseeds to 0 like the
   reference);
 - missing lookahead samples fall back (the Lua `or` chains); only the base
   sample d[floor(x)] ends the stream;
 - sinc skips missing taps and ends the stream when d[floor(x)] is missing
   (the reference's sinc EOF behavior pads garbage; fixed).
"""

from __future__ import annotations

import math
from fractions import Fraction

INTERPOLATION_START = {"none": 1, "linear": 1, "cubic": 0, "sinc": 0}
INTERPOLATION_END = {"none": 1, "linear": 2, "cubic": 3, "sinc": 0}


class _EOF(Exception):
    pass


def stream_pcm_ref(
    values,
    channels: int,
    sample_rate: int,
    mono: bool = False,
    mode: str = "linear",
    quirk_q9: bool = False,
    out_rate: int = 48000,
    chunk_len: int = 48000,
    sinc_window: int = 30,
):
    """values: interleaved normalized float samples. Yields
    (per-channel lists of float int8-scale values, position_seconds)."""
    cursor = {"i": 0}
    cn = 1 if (mono and channels > 1) else channels
    d = [dict() for _ in range(cn)]  # Lua tables, integer keys

    def fill_frame():
        """Read one frame (all channels) into pending queues; None at EOF."""
        if cursor["i"] + channels > len(values):
            # partial frame also ends the stream (read() returns nil mid-frame)
            if cursor["i"] >= len(values):
                return None
            if mono and channels > 1:
                return None
        frame = values[cursor["i"] : cursor["i"] + channels]
        if len(frame) < channels:
            return None
        cursor["i"] += channels
        if mono and channels > 1:
            return [sum(frame) / channels]
        return list(frame)

    def val(y, i, consume=True):
        """Lua d[y][i]: lazy consuming access; None means missing (EOF)."""
        if i in d[y]:
            return d[y][i]
        if not consume:
            return None
        # reads are frame-synchronized: filling index i for one channel fills
        # it for all channels
        frame = fill_frame()
        if frame is None:
            return None
        for c in range(cn):
            d[c][i] = frame[c]
        return d[y][i]

    def interp(y, x: Fraction):
        ffx = int(x)
        fx = float(x - ffx)
        if mode == "none":
            v = val(y, ffx)
            if v is None:
                raise _EOF
            return v
        if mode == "linear":
            a = val(y, ffx)
            if a is None:
                raise _EOF
            b = val(y, ffx + 1)
            if b is None:
                b = a
            return a + (b - a) * fx
        if mode == "cubic":
            p1 = val(y, ffx)
            if p1 is None:
                raise _EOF
            p0 = val(y, ffx - 1)
            p2 = val(y, ffx + 1)
            p3 = val(y, ffx + 2)
            if p0 is None:
                p0 = p1
            if p2 is None:
                p2 = p1
            if p3 is None:
                p3 = p2
            return (
                (-0.5 * p0 + 1.5 * p1 - 1.5 * p2 + 0.5 * p3) * fx**3
                + (p0 - 2.5 * p1 + 2.0 * p2 - 0.5 * p3) * fx**2
                + (-0.5 * p0 + 0.5 * p2) * fx
                + p1
            )
        # sinc: consume up to ffx+W; missing taps skipped; require base sample
        base = val(y, ffx)
        if base is None:
            raise _EOF
        for k in range(ffx + 1, ffx + sinc_window + 1):
            if val(y, k) is None:
                break
        total = 0.0
        for m in range(-sinc_window, sinc_window + 1):
            v = d[y].get(ffx + m)
            if v is None:
                continue
            px = math.pi * (fx - m)
            total += v if px == 0 else v * math.sin(px) / px
        return total

    alpha = 1.0 - math.exp(-(sample_rate / (out_rate * 2)) * 2.0 * math.pi)
    filter_state = [0.0] * cn
    first = {"v": True}
    n_out = {"n": 0}

    def one_chunk():
        start = INTERPOLATION_START[mode] if first["v"] else 1
        first["v"] = False
        for i in range(start, INTERPOLATION_END[mode] + 1):
            for y in range(cn):
                if val(y, i) is None:
                    return None
        chunk = [[] for _ in range(cn)]
        ls = [0.0] * cn if quirk_q9 else list(filter_state)
        try:
            for i in range(1, chunk_len + 1):
                for y in range(cn):
                    x = Fraction((i - 1) * sample_rate, out_rate) + 1
                    if x.denominator == 1:
                        s = val(y, int(x))
                        if s is None:
                            raise _EOF
                    else:
                        s = interp(y, x)
                    ns = ls[y] + alpha * (s - ls[y])
                    v = ns * (128.0 if ns < 0 else 127.0)
                    chunk[y].append(max(-128.0, min(127.0, v)))
                    ls[y] = s
        except _EOF:
            pass
        if not chunk[0]:
            return None
        for y in range(cn):
            filter_state[y] = ls[y]
        n_out["n"] += len(chunk[0])
        # carry (aukit.lua:2409-2421): relabel the top of the consecutive run
        for y in range(cn):
            n = 0
            while (n + 1) in d[y]:
                n += 1
            if mode == "sinc":
                newd = {}
                for i in range(-sinc_window, 1):
                    if (n + i) in d[y]:
                        newd[i] = d[y][n + i]
                d[y] = {**newd}
            else:
                newd = {}
                if (n - 1) in d[y]:
                    newd[-1] = d[y][n - 1]
                if n in d[y]:
                    newd[0] = d[y][n]
                d[y] = newd
        # rebind dicts inside val's closure
        return chunk, (n_out["n"] - len(chunk[0])) / out_rate

    def gen():
        while True:
            # re-close over possibly swapped dicts
            res = one_chunk()
            if res is None:
                return
            yield res

    return gen()
