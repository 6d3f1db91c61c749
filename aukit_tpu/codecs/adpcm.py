"""IMA ADPCM and Microsoft ADPCM decoders as lane-batched JAX scans.

Reference recurrences: aukit.adpcm (aukit.lua:1243-1272) and aukit.msadpcm
(aukit.lua:1316-1348). Both are per-sample integer predictor recurrences that
cannot be parallelized in time, but both formats carry their full predictor
state in block headers (WAV layout, aukit.lua:1511/1543), so the TPU-native
design decodes *all blocks of all streams concurrently*: lanes = blocks x
channels, one ``lax.scan`` over the within-block sample axis (SURVEY.md §5.7).

All arithmetic is int32 and bit-exact vs the reference's Lua double math:
 - IMA:  step read before index update; diff = ((nib%8)*step)>>2 + step>>3;
         predictor +/- diff clamped to int16; step_index clamped to [0,88].
 - MS:   predictor = clamp(floor((s1*c1 + s2*c2)/256) + nib*delta);
         delta = max(floor(adaption[nib]*delta/256), 16). The reference's Lua
         doubles stay exact to 2^53; we cap delta at 2^20 (far above any value
         reachable from valid int16 header deltas within a block) so the int32
         products cannot overflow — a defensive deviation that also gives
         per-lane error isolation inside a batch (SURVEY.md §5.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Reference tables (aukit.lua:158-186) — standard IMA ADPCM tables.
IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)
IMA_STEP_TABLE = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
     19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
     50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
     130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
     337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
     876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
     5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
     15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32,
)

# MS ADPCM adaption table indexed by signed nibble -8..7 (aukit.lua:188-191).
MSADPCM_ADAPTION = np.array(
    [768, 614, 512, 409, 307, 230, 230, 230,  # nibbles -8..-1
     230, 230, 230, 230, 307, 409, 512, 614],  # nibbles 0..7
    dtype=np.int32,
)

MSADPCM_DEFAULT_COEFFS = (
    np.array([256, 512, 0, 192, 240, 460, 392], dtype=np.int32),
    np.array([0, -256, 0, 64, 0, -208, -232], dtype=np.int32),
)

_DELTA_CAP = 1 << 20  # defensive overflow bound, see module docstring


@jax.jit
def ima_adpcm_scan(nibbles: jnp.ndarray, predictor: jnp.ndarray, step_index: jnp.ndarray):
    """Decode ``int32[lanes, T]`` nibbles (0..15) with per-lane initial state.
    Sequential-scan reference implementation (the parity oracle for the
    parallel formulation below).

    Returns (int32[lanes, T] predictors, (predictor, step_index) final state).
    """
    step_tbl = jnp.asarray(IMA_STEP_TABLE)
    idx_tbl = jnp.asarray(IMA_INDEX_TABLE)
    xs = nibbles.T  # [T, lanes]

    def step_fn(carry, nib):
        pred, sidx = carry
        step = jnp.take(step_tbl, sidx)
        sidx = jnp.clip(sidx + jnp.take(idx_tbl, nib), 0, 88)
        diff = (((nib % 8) * step) >> 2) + (step >> 3)
        pred = jnp.clip(jnp.where(nib >= 8, pred - diff, pred + diff), -32768, 32767)
        return (pred, sidx), pred

    (predictor, step_index), out = jax.lax.scan(step_fn, (predictor, step_index), xs)
    return jnp.transpose(out), (predictor, step_index)


_BIG = jnp.int32(1 << 30)


def _clampadd_scan(deltas: jnp.ndarray, lo: int, hi: int, init: jnp.ndarray):
    """Parallel evaluation of x_t = clamp(x_{t-1} + d_t, lo, hi) over the last
    axis. Functions x -> min(max(x+a, l), h) are closed under composition
    (min/max-plus algebra), so the whole recurrence is one associative scan:
        (f2 . f1): a = a1+a2, l = clamp(l1+a2, l2, h2), h = clamp(h1+a2, l2, h2)
    Returns all x_t (inclusive). Exact in int32."""
    a = deltas
    l = jnp.full_like(deltas, lo)
    h = jnp.full_like(deltas, hi)

    def combine(f1, f2):
        a1, l1, h1 = f1
        a2, l2, h2 = f2
        return (
            a1 + a2,
            jnp.clip(l1 + a2, l2, h2),
            jnp.clip(h1 + a2, l2, h2),
        )

    A, L, H = jax.lax.associative_scan(combine, (a, l, h), axis=-1)
    return jnp.clip(init[..., None] + A, L, H)


@jax.jit
def ima_adpcm_parallel(nibbles: jnp.ndarray, predictor: jnp.ndarray, step_index: jnp.ndarray):
    """Time-PARALLEL IMA decode — the associative-scan recast of the predictor
    recurrence (BASELINE.json north star: "predictor recurrences recast as
    associative scans").

    Both IMA recurrences are clamped additions:
      idx_t  = clamp(idx_{t-1} + index_delta(nib_t), 0, 88)
      pred_t = clamp(pred_{t-1} +/- diff_t,      -32768, 32767)
    where diff_t depends only on (nib_t, idx_{t-1}) — so: scan #1 yields every
    step index in O(log T) depth, one bulk table gather yields every step, and
    scan #2 yields every predictor. No sequential dependency remains.
    """
    step_tbl = jnp.asarray(IMA_STEP_TABLE)
    m = nibbles % 8
    # index_delta: m in 0..3 -> -1, else (m-3)*2  (the IMA index table, computed
    # arithmetically to avoid a gather)
    idx_delta = jnp.where(m < 4, -1, (m - 3) * 2)
    idx_all = _clampadd_scan(idx_delta, 0, 88, step_index)  # idx_t (post-update)
    # step_t uses idx_{t-1}: shift right, seed with the initial index
    idx_prev = jnp.concatenate([step_index[..., None], idx_all[..., :-1]], axis=-1)
    step = jnp.take(step_tbl, idx_prev)
    diff = ((m * step) >> 2) + (step >> 3)
    signed = jnp.where(nibbles >= 8, -diff, diff)
    pred_all = _clampadd_scan(signed, -32768, 32767, predictor)
    return pred_all, (pred_all[..., -1], idx_all[..., -1])


def decode_ima_adpcm(
    data,
    channels: int = 1,
    top_first: bool = True,
    interleaved: bool = True,
    predictor=None,
    step_index=None,
):
    """reference aukit.adpcm (aukit.lua:1183): bytes (nibble pairs) or a nibble
    array -> int32[channels, N] predictor samples (callers normalize to float).

    ``interleaved``: nibble k belongs to channel k % channels; otherwise the
    stream is split into contiguous per-channel halves.
    """
    if isinstance(data, (bytes, bytearray, memoryview)):
        b = np.frombuffer(bytes(data), dtype=np.uint8).astype(np.int32)
        if top_first:
            nibs = np.stack([b >> 4, b & 0x0F], axis=1).reshape(-1)
        else:
            nibs = np.stack([b & 0x0F, b >> 4], axis=1).reshape(-1)
    else:
        nibs = np.asarray(data, dtype=np.int32)
    n = len(nibs) // channels
    nibs = nibs[: n * channels]
    if interleaved:
        lanes = np.ascontiguousarray(nibs.reshape(n, channels).T)  # [C, n]
    else:
        lanes = nibs.reshape(channels, n)
    pred0 = np.zeros(channels, np.int32) if predictor is None else np.asarray(predictor, np.int32)
    sidx0 = np.zeros(channels, np.int32) if step_index is None else np.asarray(step_index, np.int32)
    # loader shape: few lanes (channels), long T -> the associative-scan form;
    # pad T to the next power of two so jit shapes stay bounded
    T = lanes.shape[1]
    Tp = 1 << max(10, (T - 1).bit_length())
    padded = np.zeros((lanes.shape[0], Tp), np.int32)
    padded[:, :T] = lanes
    out, _ = ima_adpcm_parallel(jnp.asarray(padded), jnp.asarray(pred0), jnp.asarray(sidx0))
    return np.asarray(out)[:, :T]


def ima_adpcm_blocks(nibbles: np.ndarray, predictor: np.ndarray, step_index: np.ndarray):
    """Block-parallel entry: nibbles[L, T], predictor[L], step_index[L] ->
    int32[L, T]. Used by the WAV container/stream paths where every block's
    header provides the state (lanes = blocks*channels decode concurrently).

    Backend routing: TPU batches take the Pallas kernel at ANY size — the
    jnp scan runs on the device too and pays while-loop overhead per time
    step (profiled ~65 us/iter) on top of the same transfer, so the kernel
    wins even when its [32,128] lane tile is mostly padding. On CPU the
    sequential scan stays (it also beats the memory-bound associative
    formulation with abundant lanes, measured ~4x; the associative form
    wins only in the few-lanes/long-T regime, decode_ima_adpcm loader)."""
    nib = np.asarray(nibbles, dtype=np.int32)
    if (jax.default_backend() == "tpu"
            and nib.shape[0] > 0 and nib.shape[1] > 0):  # kernels reject 0-dims
        from ..kernels.ima_pallas import ima_decode_pallas

        out, _ = ima_decode_pallas(
            nib, np.asarray(predictor, np.int32),
            np.asarray(step_index, np.int32),  # kernel clamps its lookup
        )
        return np.asarray(out)
    out, _ = ima_adpcm_scan(
        jnp.asarray(nib),
        jnp.asarray(predictor, dtype=jnp.int32),
        jnp.asarray(step_index, dtype=jnp.int32),
    )
    return np.asarray(out)


@jax.jit
def msadpcm_scan(
    nibbles: jnp.ndarray,  # int32[lanes, T] signed nibbles in [-8, 7]
    c1: jnp.ndarray,  # int32[lanes]
    c2: jnp.ndarray,
    delta: jnp.ndarray,
    sample1: jnp.ndarray,
    sample2: jnp.ndarray,
):
    """MS ADPCM within-block recurrence, batched over lanes.
    Returns int32[lanes, T] decoded samples (excluding the two header samples)."""
    adapt = jnp.asarray(MSADPCM_ADAPTION)
    xs = nibbles.T

    def step_fn(carry, nib):
        s1, s2, d = carry
        lin = (s1 * c1 + s2 * c2) >> 8  # floor((s1*c1+s2*c2)/256), exact for int32
        pred = jnp.clip(lin + nib * d, -32768, 32767)
        d = jnp.clip((jnp.take(adapt, nib + 8) * d) >> 8, 16, _DELTA_CAP)
        return (pred, s1, d), pred

    _, out = jax.lax.scan(step_fn, (sample1, sample2, delta), xs)
    return jnp.transpose(out)


def decode_msadpcm_blocks(
    nibbles: np.ndarray,
    predictor_index: np.ndarray,
    delta: np.ndarray,
    sample1: np.ndarray,
    sample2: np.ndarray,
    coefficients=None,
):
    """Block-parallel MS ADPCM: per-lane header state -> int32[L, T] samples.
    The caller prepends sample2, sample1 (the header samples are emitted first,
    aukit.lua:1308-1311)."""
    if coefficients is None:
        co1, co2 = MSADPCM_DEFAULT_COEFFS
    else:
        co1 = np.asarray(coefficients[0], dtype=np.int32)
        co2 = np.asarray(coefficients[1], dtype=np.int32)
    pidx = np.asarray(predictor_index, dtype=np.int64)
    nib = np.asarray(nibbles, dtype=np.int32)
    # TPU batches take the Pallas block-lane kernel at any size (the jnp
    # scan pays device while-loop overhead per time step on top of the same
    # transfer); CPU batches use the portable scan
    if (jax.default_backend() == "tpu"
            and nib.shape[0] > 0 and nib.shape[1] > 0):  # kernels reject 0-dims
        from ..kernels.msadpcm_pallas import msadpcm_decode_pallas

        out, _ = msadpcm_decode_pallas(
            nib, np.asarray(sample1, np.int32), np.asarray(sample2, np.int32),
            np.asarray(delta, np.int32), co1[pidx].astype(np.int32), co2[pidx].astype(np.int32),
        )
        return np.asarray(out)
    out = msadpcm_scan(
        jnp.asarray(nib),
        jnp.asarray(co1[pidx]),
        jnp.asarray(co2[pidx]),
        jnp.asarray(delta, dtype=jnp.int32),
        jnp.asarray(sample1, dtype=jnp.int32),
        jnp.asarray(sample2, dtype=jnp.int32),
    )
    return np.asarray(out)


def _signed_nibbles(data_bytes: np.ndarray) -> np.ndarray:
    """bytes[..., n] -> int32[..., n*2] signed nibbles, high nibble first
    (aukit.lua:1317)."""
    b = data_bytes.astype(np.int32)
    hi, lo = b >> 4, b & 0x0F
    nib = np.stack([hi, lo], axis=-1).reshape(*b.shape[:-1], -1)
    return np.where(nib >= 8, nib - 16, nib)


def decode_msadpcm(
    data: bytes,
    block_align: int,
    channels: int = 1,
    coefficients=None,
    mono_header_from_first_block: bool = True,
):
    """reference aukit.msadpcm (aukit.lua:1283): raw block stream ->
    int32[channels, N] samples (including the two header samples per block).

    Stereo blocks: 14-byte header <BBhhhhhh, nibbles alternate L/R (hi=L, lo=R).
    Mono blocks: 7-byte header <Bhhh, both nibbles belong to the channel.

    ``mono_header_from_first_block``: the reference's mono path unpacks every
    block header from position 1 (aukit.lua:1316 — ``str_unpack("<!1Bhhh",
    data)`` without a position argument; same defect as stream quirk Q4), so
    all mono blocks re-initialize from block 1's header. Replicated by default
    because loader semantics are the bit-exactness target (SURVEY.md §7); pass
    False for correct per-block headers.

    Partial trailing blocks are decoded up to the available bytes (the
    reference errors mid-way on them; documented lenient deviation).
    """
    raw = np.frombuffer(data, dtype=np.uint8)
    nblocks = len(raw) // block_align
    # tolerate a trailing partial block like the reference's unpack-until-end
    blocks = []
    tail = raw[nblocks * block_align :]
    full = raw[: nblocks * block_align].reshape(nblocks, block_align) if nblocks else np.zeros((0, block_align), np.uint8)
    if channels == 2:
        hdr = 14
        if len(tail) >= hdr:
            pad = np.zeros(block_align - len(tail), np.uint8)
            full = np.concatenate([full, np.concatenate([tail, pad])[None, :]], axis=0)
            # mark number of valid nibble-bytes in the tail block
            tail_valid = len(tail) - hdr
        else:
            tail_valid = None
        if full.shape[0] == 0:
            return np.zeros((2, 0), np.int32)
        h = full[:, :hdr]
        pidx_l = h[:, 0].astype(np.int32)
        pidx_r = h[:, 1].astype(np.int32)
        s16 = h[:, 2:14].view("<i2").astype(np.int32)  # [B, 6]
        delta_l, delta_r = s16[:, 0], s16[:, 1]
        s1l, s1r, s2l, s2r = s16[:, 2], s16[:, 3], s16[:, 4], s16[:, 5]
        nib = _signed_nibbles(full[:, hdr:])  # [B, (ba-14)*2] alternating L/R
        nib = nib.reshape(full.shape[0], -1, 2)
        nl, nr = nib[:, :, 0], nib[:, :, 1]
        lanes = np.concatenate([nl, nr], axis=0)
        out = decode_msadpcm_blocks(
            lanes,
            np.concatenate([pidx_l, pidx_r]),
            np.concatenate([delta_l, delta_r]),
            np.concatenate([s1l, s1r]),
            np.concatenate([s2l, s2r]),
            coefficients,
        )
        B = full.shape[0]
        out_l, out_r = out[:B], out[B:]
        chans = []
        for header2, header1, body in ((s2l, s1l, out_l), (s2r, s1r, out_r)):
            full_blocks = np.concatenate(
                [header2[:, None], header1[:, None], body], axis=1
            )  # [B, 2 + T]
            if tail_valid is not None:
                head = full_blocks[:-1].reshape(-1)
                tail_samples = full_blocks[-1, : 2 + tail_valid]
                chans.append(np.concatenate([head, tail_samples]))
            else:
                chans.append(full_blocks.reshape(-1))
        return np.stack(chans).astype(np.int32)
    elif channels == 1:
        hdr = 7
        if len(tail) >= hdr:
            pad = np.zeros(block_align - len(tail), np.uint8)
            full = np.concatenate([full, np.concatenate([tail, pad])[None, :]], axis=0)
            tail_valid = len(tail) - hdr
        else:
            tail_valid = None
        if full.shape[0] == 0:
            return np.zeros((1, 0), np.int32)
        pidx = full[:, 0].astype(np.int32)
        s16 = full[:, 1:7].view("<i2").astype(np.int32)
        delta, s1, s2 = s16[:, 0], s16[:, 1], s16[:, 2]
        if mono_header_from_first_block:
            pidx = np.broadcast_to(pidx[:1], pidx.shape)
            delta = np.broadcast_to(delta[:1], delta.shape)
            s1 = np.broadcast_to(s1[:1], s1.shape)
            s2 = np.broadcast_to(s2[:1], s2.shape)
        nib = _signed_nibbles(full[:, hdr:])  # [B, (ba-7)*2]
        out = decode_msadpcm_blocks(nib, pidx, delta, s1, s2, coefficients)
        full_blocks = np.concatenate([s2[:, None], s1[:, None], out], axis=1)
        if tail_valid is not None:
            head = full_blocks[:-1].reshape(-1)
            tail_samples = full_blocks[-1, : 2 + tail_valid * 2]
            flat = np.concatenate([head, tail_samples])
        else:
            flat = full_blocks.reshape(-1)
        return flat[None, :].astype(np.int32)
    raise ValueError(f"Unsupported number of channels: {channels}")
