"""Loop reference for interpolation/resampling (aukit.lua:253-284, 653-673).

Positions are computed as exact rationals (Fraction) rather than Lua's float
``x % 1 == 0`` test — matching the framework's documented exact-integer
passthrough. Data is a Python list (1-based access via helper) with None
beyond the ends, so the Lua ``or`` fallbacks transliterate directly.
"""

from __future__ import annotations

import math
from fractions import Fraction


def _get(data, i):
    if 1 <= i <= len(data):
        return data[i - 1]
    return None


def interp_ref(mode, data, x: Fraction, sinc_window=30):
    ffx = int(x)  # floor for positive x
    fx = float(x - ffx)
    if mode == "none":
        return _get(data, ffx)
    if mode == "linear":
        a = _get(data, ffx)
        b = _get(data, ffx + 1)
        if b is None:
            b = a
        return a + (b - a) * fx
    if mode == "cubic":
        p1 = _get(data, ffx)
        p0 = _get(data, ffx - 1)
        p2 = _get(data, ffx + 1)
        p3 = _get(data, ffx + 2)
        if p0 is None:
            p0 = p1
        if p2 is None:
            p2 = p1
        if p3 is None:
            p3 = p2 if p2 is not None else p1
        return (
            (-0.5 * p0 + 1.5 * p1 - 1.5 * p2 + 0.5 * p3) * fx**3
            + (p0 - 2.5 * p1 + 2.0 * p2 - 0.5 * p3) * fx**2
            + (-0.5 * p0 + 0.5 * p2) * fx
            + p1
        )
    if mode == "sinc":
        total = 0.0
        for n in range(-sinc_window, sinc_window + 1):
            d = _get(data, ffx + n)
            if d is None:
                continue
            px = math.pi * (fx - n)
            total += d if px == 0 else d * math.sin(px) / px
        return total
    raise ValueError(mode)


def _clamp(v, lo, hi):
    return lo if v < lo else hi if v > hi else v


def resample_ref(chan: list, src: int, dst: int, mode: str, sinc_window=30):
    """Audio:resample for one channel (aukit.lua:653)."""
    n = len(chan)
    newlen = n * dst // src
    out = []
    for i in range(1, newlen + 1):
        x = Fraction((i - 1) * src, dst) + 1
        if x.denominator == 1:
            out.append(chan[int(x) - 1])
        else:
            out.append(_clamp(interp_ref(mode, chan, x, sinc_window), -1.0, 1.0))
    return out
