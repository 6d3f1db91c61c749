"""Loop references for the effects suite (aukit.lua:3349-3618)."""

from __future__ import annotations

import math

import numpy as np


def _clamp(v, lo=-1.0, hi=1.0):
    return lo if v < lo else hi if v > hi else v


def amplify_ref(chans, mult):
    return [[_clamp(v * mult) for v in ch] for ch in chans]


def fade_ref(chans, rate, st, sa, et, ea):
    out = [list(ch) for ch in chans]
    start = st * rate
    m = (ea - sa) / ((et - st) * rate)
    for ch in out:
        i = max(int(math.ceil(start)), 1)
        while i <= min(int(math.floor(et * rate)), len(ch)):
            ch[i - 1] = _clamp(ch[i - 1] * (m * (i - start) + sa))
            i += 1
    return out


def normalize_ref(chans, peak=1.0, independent=False):
    out = [list(ch) for ch in chans]
    if not independent:
        mx = max((abs(v) for ch in out for v in ch), default=0.0)
        mult = peak / mx if mx else 0.0
        return [[_clamp(v * mult) for v in ch] for ch in out]
    res = []
    for ch in out:
        mx = max((abs(v) for v in ch), default=0.0)
        mult = peak / mx if mx else 0.0
        res.append([_clamp(v * mult) for v in ch])
    return res


def center_ref(chans, rate):
    out = [list(ch) for ch in chans]
    for ch in out:
        for i in range(0, len(ch), rate):
            l = min(len(ch) - i, rate)
            avg = sum(ch[i : i + l]) / l
            for j in range(l):
                ch[i + j] = _clamp(ch[i + j] - avg)
    return out


def delay_ref(chans, rate, t, mult=0.5):
    samples = int(math.floor(t * rate))
    out = []
    for ch in chans:
        orig = list(ch)
        new = list(ch)
        for i in range(samples, len(ch)):
            new[i] = _clamp(new[i] + orig[i - samples] * mult)
        out.append(new)
    return out


def echo_ref(chans, rate, t=1.0, mult=0.5):
    samples = int(math.floor(t * rate))
    out = []
    for ch in chans:
        new = list(ch)
        for i in range(samples, len(new)):
            new[i] = _clamp(new[i] + new[i - samples] * mult)
        out.append(new)
    return out


def lowpass_ref(chans, rate, freq):
    a = 1.0 - math.exp(-(freq / rate) * 2.0 * math.pi)
    out = []
    for ch in chans:
        new = list(ch)
        for i in range(1, len(new)):
            l = new[i - 1]
            new[i] = l + a * (new[i] - l)
        out.append(new)
    return out


def highpass_ref(chans, rate, freq):
    a = 1.0 / (2.0 * math.pi * (freq / rate) + 1.0)
    out = []
    for ch in chans:
        new = list(ch)
        lx = new[0]
        for i in range(1, len(new)):
            llx = new[i]
            new[i] = a * (new[i - 1] + llx - lx)
            lx = llx
        out.append(new)
    return out


COMB_DELAY_SHIFT = (0.0, -11.73, 19.31, -7.97)
COMB_DECAY_SHIFT = (0.0, 0.1313, 0.2743, 0.31)


def reverb_ref(chans, rate, delay_ms=100.0, decay=0.3, wet=1.0, dry=0.0):
    """Transliteration of aukit.lua:3546-3584 (incl. quirk Q8 semantics)."""
    out = []
    for ch in chans:
        o = list(ch)
        total = [0.0] * len(o)
        for k in range(4):
            lag = int(math.floor((delay_ms + COMB_DELAY_SHIFT[k]) / 1000.0 * rate))
            mult = decay - COMB_DECAY_SHIFT[k]
            comb = [0.0] * len(o)
            if lag <= 0 or lag >= len(o):
                for i in range(len(o)):
                    total[i] += o[i]
                continue
            for i in range(min(lag, len(o))):
                comb[i] = o[i]
                total[i] += o[i]
            for i in range(lag, len(o)):
                s = o[i] + comb[i - lag] * mult
                comb[i] = s
                total[i] += s
        for i in range(len(total)):
            total[i] = total[i] * wet + o[i] * dry
        lag = int(math.floor(0.08927 * rate))
        new = list(o)
        if 21 < lag + 1 < len(o):
            # pass 1: pre-step + in-place allpass over total
            total[lag] = total[lag] - 0.131 * total[0]
            for i in range(lag + 1, len(total)):
                total[i] = total[i] - 0.131 * total[i - lag] + 0.131 * total[i - (lag - 20)]
            # pass 2: FIR over finalized total -> output
            new[lag] = _clamp(total[lag] - 0.131 * total[0])
            for i in range(lag + 1, len(total)):
                new[i] = _clamp(total[i] - 0.131 * total[i - lag] + 0.131 * total[i - (lag - 20)])
        out.append(new)
    return out
