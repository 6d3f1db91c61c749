"""MDFPWMv3 container (reference aukit.mdfpwm, aukit.lua:1420-1448).

Layout: ``"MDFPWM\\x03"`` magic, then <I sample-pair length, three 1-byte
length-prefixed strings (artist, title, album), then alternating 6000-byte
L/R DFPWM blocks. Stereo 48 kHz by definition. Decoded with two independent
DFPWM decoders (one per channel) batched as two lanes in one dispatch.
"""

from __future__ import annotations

import struct

import numpy as np

from ..audio import Audio
from ..ops import pcmcode

MAGIC = b"MDFPWM\x03"


def parse_mdfpwm_header(data: bytes):
    if data[:7] != MAGIC:
        raise ValueError("not a MDFPWM file")
    (length,) = struct.unpack_from("<I", data, 7)
    pos = 11
    strs = []
    for _ in range(3):
        slen = data[pos]
        strs.append(data[pos + 1 : pos + 1 + slen].decode("latin-1"))
        pos += 1 + slen
    artist, title, album = strs
    return length, artist, title, album, pos


def decode_mdfpwm(data: bytes, head: bool = False) -> Audio:
    length, artist, title, album, pos = parse_mdfpwm_header(data)
    meta = {"artist": artist, "title": title, "album": album}
    if head:
        return Audio(np.zeros((2, 0), np.float32), 48000, meta, {})
    body = np.frombuffer(data, dtype=np.uint8)[pos:]
    npairs = len(body) // 12000
    tail = body[npairs * 12000 :]
    blocks = body[: npairs * 12000].reshape(npairs, 2, 6000)
    lanes_l = blocks[:, 0, :].reshape(-1)
    lanes_r = blocks[:, 1, :].reshape(-1)
    # reference stops at the first short/absent L or R block (aukit.lua:1434-1439):
    # a trailing partial pair decodes only as much as both channels have
    if len(tail) > 6000:
        lanes_l = np.concatenate([lanes_l, tail[:6000]])
        lanes_r = np.concatenate([lanes_r, tail[6000:]])
    elif len(tail) > 0:
        lanes_l = np.concatenate([lanes_l, tail])
    from ..codecs.dfpwm import DfpwmState, _routed_decode
    import jax.numpy as jnp

    nmin = min(len(lanes_l), len(lanes_r))
    nl, nr = len(lanes_l), len(lanes_r)
    # decode both channels as two lanes over the common prefix, then the ragged
    # remainder of the longer lane separately
    both = np.stack([lanes_l[:nmin], lanes_r[:nmin]])
    out, state = _routed_decode(np.asarray(both, np.uint8), DfpwmState.zeros(2))
    out = np.asarray(out)
    left, right = out[0], out[1]
    if nl > nmin:
        import jax

        extra, _ = _routed_decode(
            jnp.asarray(lanes_l[nmin:][None, :]),
            jax.tree_util.tree_map(lambda a: a[:1], state),
        )
        left = np.concatenate([left, np.asarray(extra)[0]])
    # interleave L/R like the reference's audio table, truncated to length*8
    # samples per the header (aukit.lua:1441)
    total = length * 8
    n = min(len(left), len(right))
    inter = np.empty(2 * n, np.int32)
    inter[0::2] = left[:n]
    inter[1::2] = right[:n]
    inter = inter[:total]
    # route through PCM normalize like aukit.pcm(audio, 8, "signed", 2, ...)
    m = len(inter) // 2
    arr = pcmcode.normalize_pcm(inter[: m * 2], 8, "signed").reshape(m, 2).T
    return Audio(np.ascontiguousarray(arr), 48000, meta, {"bitDepth": 8, "dataType": "signed"})
