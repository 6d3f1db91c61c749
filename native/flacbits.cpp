// FLAC frame/bitstream parser — native host component of aukit-tpu.
//
// Role: the variable-length, data-dependent part of FLAC decode (frame
// headers, subframe headers, Rice-partitioned residuals) is inherently
// sequential and byte-oriented, so it runs on the host; this C++ core replaces
// the pure-Python BitReader on the hot path (SURVEY.md §2.3: native runtime
// components). The arithmetic-heavy LPC restore stays on-device, batched
// across subframes.
//
// Semantics are bit-identical to aukit_tpu/codecs/flac.py (itself matching the
// reference decoder embedded in aukit.lua:311-619): CRC8/CRC16 read and
// ignored, signed 5-bit LPC shift, wasted-bits unary, clean-EOF detection on
// the first frame byte, hard error on mid-frame truncation.
//
// C ABI for ctypes. All outputs are malloc'd by flac_parse and released by
// flac_free.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t len;
    size_t pos;
    uint64_t buf = 0;
    int n = 0;
    bool error = false;

    BitReader(const uint8_t* d, size_t l, size_t p) : data(d), len(l), pos(p) {}

    // Bulk refill: one unaligned 64-bit load + bswap tops the buffer up to
    // >= 57 bits (vs the naive byte loop) — the parse hot path is dominated
    // by refills, so this is the main throughput lever for Rice decode.
    bool fill(int bits) {
        while (n < bits) {
            if (pos + 8 <= len && n <= 55) {
                uint64_t w;
                memcpy(&w, data + pos, 8);
                w = __builtin_bswap64(w);
                int k = (63 - n) >> 3;  // bytes that fit (>= 1 since n <= 55)
                buf = (buf << (8 * k)) | (w >> (64 - 8 * k));
                pos += (size_t)k;
                n += 8 * k;
            } else if (pos < len) {
                buf = (buf << 8) | data[pos++];
                n += 8;
            } else {
                return false;
            }
        }
        return true;
    }

    // returns value, sets error on EOF
    uint32_t u(int bits) {
        if (bits == 0) return 0;
        if (!fill(bits)) { error = true; return 0; }
        n -= bits;
        uint32_t r = (uint32_t)((buf >> n) & ((((uint64_t)1) << bits) - 1));
        buf &= (((uint64_t)1) << n) - 1;
        return r;
    }

    int32_t s(int bits) {
        uint32_t v = u(bits);
        if (bits && (v >= (1u << (bits - 1)))) return (int32_t)v - (int32_t)(1u << bits);
        return (int32_t)v;
    }

    int64_t unary() {
        int64_t q = 0;
        for (;;) {
            if (n == 0) {
                if (!fill(1)) { error = true; return 0; }
            }
            if (buf == 0) { q += n; n = 0; continue; }
            int top = 64 - __builtin_clzll(buf);  // bit_length
            q += n - top;
            n = top - 1;
            buf &= (((uint64_t)1) << n) - 1;
            return q;
        }
    }

    int32_t rice(int param) {
        uint64_t val = ((uint64_t)unary() << param) | (uint64_t)u(param);
        if (val & 1) return -(int32_t)(val >> 1) - 1;
        return (int32_t)(val >> 1);
    }

    void align() {
        int drop = n % 8;
        n -= drop;
        buf &= (((uint64_t)1) << n) - 1;
    }

    bool at_eof_byte() const { return pos >= len && n < 8; }
};

struct SubMeta {
    int32_t order = 0, shift = 0, wasted = 0, block_size = 0;
    bool is_fixed = false;
    int32_t coef_buf[32] = {0};
};

// Order-specialized restore inner loop: a compile-time tap count lets the
// compiler fully unroll and software-pipeline the MAC chain (the runtime-
// order loop can't) — ~2x on the typical order-8 path.
template <int ORDER>
static void restore_taps(int64_t* v, int64_t T, const int64_t* c, int shift) {
    if (shift >= 0) {
        for (int64_t i = ORDER; i < T; i++) {
            int64_t sum = 0;
            for (int j = 0; j < ORDER; j++) sum += v[i - 1 - j] * c[j];
            v[i] += sum >> shift;
        }
    } else {
        for (int64_t i = ORDER; i < T; i++) {
            int64_t sum = 0;
            for (int j = 0; j < ORDER; j++) sum += v[i - 1 - j] * c[j];
            v[i] += sum << (-shift);
        }
    }
}

static void restore_generic(int64_t* v, int64_t T, const int64_t* c, int order, int shift) {
    switch (order) {
        case 1: return restore_taps<1>(v, T, c, shift);
        case 2: return restore_taps<2>(v, T, c, shift);
        case 3: return restore_taps<3>(v, T, c, shift);
        case 4: return restore_taps<4>(v, T, c, shift);
        case 5: return restore_taps<5>(v, T, c, shift);
        case 6: return restore_taps<6>(v, T, c, shift);
        case 7: return restore_taps<7>(v, T, c, shift);
        case 8: return restore_taps<8>(v, T, c, shift);
        case 9: return restore_taps<9>(v, T, c, shift);
        case 10: return restore_taps<10>(v, T, c, shift);
        case 11: return restore_taps<11>(v, T, c, shift);
        case 12: return restore_taps<12>(v, T, c, shift);
        default:
            for (int64_t i = order; i < T; i++) {
                int64_t sum = 0;
                for (int j = 0; j < order; j++) sum += v[i - 1 - j] * c[j];
                v[i] += shift >= 0 ? (sum >> shift) : (sum << (-shift));
            }
    }
}

}  // namespace

extern "C" {

struct FlacParseResult {
    // per frame
    int32_t* frame_block_size;  // [n_frames]
    int32_t* frame_chan_asgn;   // [n_frames]
    int64_t n_frames;
    // per subframe (frames x channels, in stream order)
    int32_t* sub_order;   // [n_subs]
    int32_t* sub_shift;   // [n_subs]
    int32_t* sub_wasted;  // [n_subs]
    int32_t* sub_blk;     // [n_subs]
    int32_t* coefs;       // [n_subs * 32]
    int64_t n_subs;
    // concatenated pre-restore values, one block of sub_blk[i] per subframe
    int32_t* values;
    int64_t n_values;
    int32_t error;  // 0 ok; 1 reserved residual method; 2 partition mismatch;
                    // 3 reserved subframe type; 4 sync; 5 reserved block size;
                    // 6 reserved channel asgn; 7 truncated stream
    int64_t end_pos;  // byte offset just past the last COMMITTED frame's CRC16
};

void flac_free(FlacParseResult* r) {
    if (!r) return;
    free(r->frame_block_size);
    free(r->frame_chan_asgn);
    free(r->sub_order);
    free(r->sub_shift);
    free(r->sub_wasted);
    free(r->sub_blk);
    free(r->coefs);
    free(r->values);
    free(r);
}

static bool decode_residuals(BitReader& br, int warmup, int block_size,
                             int32_t* out, int32_t* err) {
    uint32_t method = br.u(2);
    if (br.error) { *err = 7; return false; }
    if (method >= 2) { *err = 1; return false; }
    int param_bits = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t porder = br.u(4);
    int num_partitions = 1 << porder;
    if (block_size % num_partitions != 0) { *err = 2; return false; }
    int psize = block_size / num_partitions;
    for (int i = 0; i < num_partitions; i++) {
        int start = i * psize + (i == 0 ? warmup : 0);
        int end = (i + 1) * psize;
        uint32_t param = br.u(param_bits);
        if (br.error) { *err = 7; return false; }
        if (param < escape) {
            // Fused Rice loop: bit-reader state in registers, one bulk refill
            // check per sample; falls back to the generic reader for long
            // unary runs or the stream tail. This is THE parse hot loop
            // (aukit.lua:380-409) — >2x over per-field reader calls.
            uint64_t buf = br.buf;
            int n = br.n;
            size_t pos = br.pos;
            const uint8_t* data = br.data;
            size_t fast_len = br.len >= 8 ? br.len - 8 : 0;
            int p = (int)param;
            int j = start;
            for (; j < end; j++) {
                if (n <= 40 && pos <= fast_len) {
                    uint64_t w;
                    memcpy(&w, data + pos, 8);
                    w = __builtin_bswap64(w);
                    int k = (63 - n) >> 3;
                    buf = (buf << (8 * k)) | (w >> (64 - 8 * k));
                    pos += (size_t)k;
                    n += 8 * k;
                }
                if (buf == 0) break;  // long unary run / stream tail
                int top = 64 - __builtin_clzll(buf);
                int rest = top - 1 - p;  // bits left after unary + param
                if (rest < 0) break;  // sample spans the buffer: generic path
                uint64_t q = (uint64_t)(n - top);
                uint64_t val = (q << p) | ((buf >> rest) & ((((uint64_t)1) << p) - 1));
                n = rest;
                buf &= (((uint64_t)1) << n) - 1;
                out[j] = (val & 1) ? -(int32_t)(val >> 1) - 1 : (int32_t)(val >> 1);
            }
            br.buf = buf;
            br.n = n;
            br.pos = pos;
            for (; j < end; j++) {
                out[j] = br.rice(p);
                if (br.error) break;
            }
        } else {
            uint32_t nbits = br.u(5);
            for (int j = start; j < end; j++) out[j] = br.s((int)nbits);
        }
        if (br.error) { *err = 7; return false; }
    }
    return true;
}

static const int FIXED_COEFS[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1},
};

static bool decode_subframe(BitReader& br, int depth, int block_size,
                            std::vector<int32_t>& values, SubMeta& m, int32_t* err) {
    br.u(1);
    uint32_t stype = br.u(6);
    uint32_t shift_w = br.u(1);
    if (br.error) { *err = 7; return false; }
    int wasted = 0;
    if (shift_w == 1) {
        wasted = 1;
        while (br.u(1) == 0) {
            if (br.error) { *err = 7; return false; }
            wasted++;
        }
    }
    int d = depth - wasted;
    m.wasted = wasted;
    m.order = 0;
    m.shift = 0;
    m.block_size = block_size;
    size_t base = values.size();
    // order (<=32) may exceed block_size on crafted input: warmup must not
    // write past the allocation (heap overflow, ADVICE r1). The Lua
    // reference's tables grow past block_size and the frame still emits
    // block_size samples, so over-allocate, then trim back to block_size.
    values.resize(base + (size_t)(block_size > 32 ? block_size : 32), 0);
    int32_t* out = values.data() + base;
    if (stype == 0) {
        int32_t c = br.s(d);
        if (br.error) { *err = 7; return false; }
        for (int i = 0; i < block_size; i++) out[i] = c;
    } else if (stype == 1) {
        for (int i = 0; i < block_size; i++) out[i] = br.s(d);
        if (br.error) { *err = 7; return false; }
    } else if (stype >= 8 && stype <= 12) {
        int order = (int)stype - 8;
        m.order = order;
        m.is_fixed = true;
        for (int i = 0; i < order; i++) out[i] = br.s(d);
        if (!decode_residuals(br, order, block_size, out, err)) return false;
    } else if (stype >= 32 && stype <= 63) {
        int order = (int)stype - 31;
        m.order = order;
        for (int i = 0; i < order; i++) out[i] = br.s(d);
        int precision = (int)br.u(4) + 1;
        m.shift = br.s(5);
        for (int i = 0; i < order; i++) m.coef_buf[i] = br.s(precision);
        if (br.error) { *err = 7; return false; }
        if (!decode_residuals(br, order, block_size, out, err)) return false;
    } else {
        *err = 3;
        return false;
    }
    if (br.error) { *err = 7; return false; }
    values.resize(base + block_size);
    return true;
}

// require_crc != 0: incremental mode — a frame is only committed once its
// CRC16 bytes are present (more data is coming; the decoder must not emit a
// tail frame whose trailing bytes would later be misread as a frame header).
FlacParseResult* flac_parse(const uint8_t* data, int64_t len, int64_t start_pos,
                            int32_t channels, int32_t depth, int32_t require_crc) {
    auto* r = (FlacParseResult*)calloc(1, sizeof(FlacParseResult));
    r->end_pos = start_pos;
    BitReader br(data, (size_t)len, (size_t)start_pos);
    std::vector<int32_t> fbs, fca, so, ss, sw, sb, coefs;
    std::vector<int32_t> values;
    for (;;) {
        // frame header (aukit.lua:510-553)
        if (!br.fill(8)) break;  // clean EOF
        uint32_t b0 = br.u(8);
        uint32_t sync = b0 * 64 + br.u(6);
        if (br.error) { r->error = 7; break; }
        if (sync != 0x3FFE) { r->error = 4; break; }
        br.u(2);
        uint32_t bsc = br.u(4);
        uint32_t src = br.u(4);
        uint32_t ca = br.u(4);
        br.u(4);
        uint32_t tmp = br.u(8);
        if (br.error) { r->error = 7; break; }
        int t2 = -1;
        for (int i = 7; i >= 0; i--) {
            if (!(tmp & (1u << i))) break;
            t2++;
        }
        for (int i = 0; i < t2; i++) br.u(8);
        int block_size;
        if (bsc == 1) block_size = 192;
        else if (bsc >= 2 && bsc <= 5) block_size = 576 << (bsc - 2);
        else if (bsc == 6) block_size = (int)br.u(8) + 1;
        else if (bsc == 7) block_size = (int)br.u(16) + 1;
        else if (bsc >= 8 && bsc <= 15) block_size = 256 << (bsc - 8);
        else { r->error = 5; break; }
        if (src == 12) br.u(8);
        else if (src == 13 || src == 14) br.u(16);
        br.u(8);  // CRC8 ignored
        if (br.error) { r->error = 7; break; }

        int nsubs;
        int sub_depths[8];
        if (ca <= 7) {
            nsubs = channels;
            for (int i = 0; i < nsubs; i++) sub_depths[i] = depth;
        } else if (ca <= 10) {
            nsubs = 2;
            sub_depths[0] = depth + (ca == 9 ? 1 : 0);
            sub_depths[1] = depth + (ca == 9 ? 0 : 1);
        } else {
            r->error = 6;
            break;
        }
        bool ok = true;
        for (int i = 0; i < nsubs && ok; i++) {
            SubMeta m;
            ok = decode_subframe(br, sub_depths[i], block_size, values, m, &r->error);
            if (ok) {
                so.push_back(m.order);
                ss.push_back(m.shift);
                sw.push_back(m.wasted);
                sb.push_back(m.block_size);
                for (int k = 0; k < 32; k++)
                    coefs.push_back(k < m.order
                                        ? (m.is_fixed ? FIXED_COEFS[m.order][k] : m.coef_buf[k])
                                        : 0);
            }
        }
        if (!ok) break;
        br.align();
        br.u(16);  // CRC16, may hit clean EOF
        if (br.error && require_crc) { br.error = false; break; }  // tentative tail
        br.error = false;
        fbs.push_back(block_size);
        fca.push_back((int32_t)ca);
        // logical position: bytes pulled minus whole bytes still buffered
        r->end_pos = (int64_t)br.pos - br.n / 8;
    }
    // partial frame state discarded: trim subframe arrays to complete frames
    size_t complete_subs = 0;
    {
        size_t vi = 0;
        std::vector<int32_t> keep_vals;
        size_t si = 0;
        for (size_t f = 0; f < fbs.size(); f++) {
            int nsubs = (fca[f] <= 7) ? channels : 2;
            for (int c = 0; c < nsubs; c++, si++) {
                keep_vals.insert(keep_vals.end(), values.begin() + vi, values.begin() + vi + sb[si]);
                vi += sb[si];
            }
        }
        complete_subs = si;
        values.swap(keep_vals);
    }
    so.resize(complete_subs);
    ss.resize(complete_subs);
    sw.resize(complete_subs);
    sb.resize(complete_subs);
    coefs.resize(complete_subs * 32);

    auto dup = [](const std::vector<int32_t>& v) {
        auto* p = (int32_t*)malloc(v.size() * sizeof(int32_t) + 1);
        memcpy(p, v.data(), v.size() * sizeof(int32_t));
        return p;
    };
    r->frame_block_size = dup(fbs);
    r->frame_chan_asgn = dup(fca);
    r->n_frames = (int64_t)fbs.size();
    r->sub_order = dup(so);
    r->sub_shift = dup(ss);
    r->sub_wasted = dup(sw);
    r->sub_blk = dup(sb);
    r->coefs = dup(coefs);
    r->n_subs = (int64_t)complete_subs;
    r->values = dup(values);
    r->n_values = (int64_t)values.size();
    return r;
}

// In-place batched LPC restore (the numpy fallback lives in codecs/flac.py):
// values[S, stride] int64 padded rows, coefs[S, 32], per-row block/order/shift.
// result[i] += floor(sum_j result[i-1-j]*coefs[j] / 2^shift) for i >= order;
// negative shift multiplies (signed 5-bit field parity).
void flac_restore(int64_t* values, const int64_t* blocks, const int64_t* orders,
                  const int64_t* shifts, const int64_t* coefs, int64_t n_subs,
                  int64_t stride) {
    for (int64_t s = 0; s < n_subs; s++) {
        int order = (int)orders[s];
        if (order == 0) continue;
        int64_t T = blocks[s];
        int shift = (int)shifts[s];
        int64_t* v = values + s * stride;
        const int64_t* c = coefs + s * 32;
        for (int64_t i = order; i < T; i++) {
            int64_t sum = 0;
            for (int j = 0; j < order; j++) sum += v[i - 1 - j] * c[j];
            int64_t pred = shift >= 0 ? (sum >> shift) : (sum << (-shift));
            v[i] += pred;
        }
    }
}

// Fused whole-file decode: parse -> LPC restore -> stereo decorrelate ->
// sign wrap -> float normalize in ONE pass per frame, while the frame's
// values are cache-hot — no intermediate metadata/values arrays cross the
// C/Python boundary (the loader's fast path; the meta-emitting flac_parse
// remains for the incremental stream path). Semantics identical to
// codecs/flac.py::decode_flac: /2^depth half-scale normalize (aukit.lua:
// 524-526), one-sided sign wrap after decorrelation, lenient truncation.
struct FlacDecodeResult {
    float* samples;  // planar [channels][n]
    int64_t n;       // samples per channel
    int32_t error;   // same codes as FlacParseResult (0/always-lenient here)
};

void flac_decode_free(FlacDecodeResult* r) {
    if (!r) return;
    free(r->samples);
    free(r);
}

FlacDecodeResult* flac_decode_full(const uint8_t* data, int64_t len, int64_t start_pos,
                                   int32_t channels, int32_t depth) {
    auto* res = (FlacDecodeResult*)calloc(1, sizeof(FlacDecodeResult));
    BitReader br(data, (size_t)len, (size_t)start_pos);
    std::vector<std::vector<float>> out((size_t)channels);
    std::vector<int32_t> values;
    const double inv_full = 1.0 / (double)((int64_t)1 << depth);
    const int64_t half = (int64_t)1 << (depth - 1);
    const int64_t full = (int64_t)1 << depth;
    std::vector<int64_t> a_buf, b_buf;
    for (;;) {
        if (!br.fill(8)) break;  // clean EOF
        uint32_t b0 = br.u(8);
        uint32_t sync = b0 * 64 + br.u(6);
        if (br.error) { res->error = 7; break; }
        if (sync != 0x3FFE) { res->error = 4; break; }
        br.u(2);
        uint32_t bsc = br.u(4);
        uint32_t src = br.u(4);
        uint32_t ca = br.u(4);
        br.u(4);
        uint32_t tmp = br.u(8);
        if (br.error) { res->error = 7; break; }
        int t2 = -1;
        for (int i = 7; i >= 0; i--) {
            if (!(tmp & (1u << i))) break;
            t2++;
        }
        for (int i = 0; i < t2; i++) br.u(8);
        int block_size;
        if (bsc == 1) block_size = 192;
        else if (bsc >= 2 && bsc <= 5) block_size = 576 << (bsc - 2);
        else if (bsc == 6) block_size = (int)br.u(8) + 1;
        else if (bsc == 7) block_size = (int)br.u(16) + 1;
        else if (bsc >= 8 && bsc <= 15) block_size = 256 << (bsc - 8);
        else { res->error = 5; break; }
        if (src == 12) br.u(8);
        else if (src == 13 || src == 14) br.u(16);
        br.u(8);
        if (br.error) { res->error = 7; break; }
        int nsubs;
        int sub_depths[8];
        if (ca <= 7) {
            nsubs = channels;
            for (int i = 0; i < nsubs; i++) sub_depths[i] = depth;
        } else if (ca <= 10) {
            nsubs = 2;
            sub_depths[0] = depth + (ca == 9 ? 1 : 0);
            sub_depths[1] = depth + (ca == 9 ? 0 : 1);
        } else { res->error = 6; break; }
        values.clear();
        SubMeta metas[8];
        bool ok = true;
        for (int i = 0; i < nsubs && ok; i++)
            ok = decode_subframe(br, sub_depths[i], block_size, values, metas[i], &res->error);
        if (!ok) break;
        br.align();
        br.u(16);
        br.error = false;
        // restore + wasted shift per subframe (int64 accumulators, cache-hot)
        a_buf.assign((size_t)block_size, 0);
        b_buf.assign((size_t)block_size, 0);
        for (int s = 0; s < nsubs; s++) {
            const int32_t* v32 = values.data() + (size_t)s * block_size;
            int64_t* v = s == 0 ? a_buf.data() : b_buf.data();
            std::vector<int64_t> extra;
            if (s >= 2) {  // >2-channel independent frames
                extra.assign((size_t)block_size, 0);
                v = extra.data();
            }
            for (int i = 0; i < block_size; i++) v[i] = v32[i];
            const SubMeta& m = metas[s];
            if (m.order > 0) {
                int64_t c[32];
                for (int j = 0; j < m.order; j++)
                    c[j] = m.is_fixed ? FIXED_COEFS[m.order][j] : m.coef_buf[j];
                restore_generic(v, block_size, c, m.order, m.shift);
            }
            if (m.wasted)
                for (int i = 0; i < block_size; i++) v[i] <<= m.wasted;
            if (s >= 2) {  // independent channel: wrap+emit immediately
                auto& ch = out[(size_t)s];
                for (int i = 0; i < block_size; i++) {
                    int64_t x = v[i] >= half ? v[i] - full : v[i];
                    ch.push_back((float)((double)x * inv_full));
                }
            }
        }
        // decorrelate channels 0/1 + sign wrap + normalize
        int emit = nsubs < 2 ? 1 : 2;
        for (int i = 0; i < block_size; i++) {
            int64_t a = a_buf[i], b = emit > 1 ? b_buf[i] : 0;
            if (ca == 8) b = a - b;           // left/side
            else if (ca == 9) a = a + b;      // side/right
            else if (ca == 10) {              // mid/side
                int64_t side = b;
                int64_t right = a - (side >> 1);
                b = right;
                a = right + side;
            }
            int64_t wa = a >= half ? a - full : a;
            out[0].push_back((float)((double)wa * inv_full));
            if (channels > 1) {
                int64_t wb = b >= half ? b - full : b;
                out[1].push_back((float)((double)(emit > 1 ? wb : 0) * inv_full));
            }
        }
        // channels beyond nsubs (ca<=7 handled above; stereo modes: none)
        for (int cch = (ca <= 7 ? nsubs : 2); cch < channels; cch++)
            for (int i = 0; i < block_size; i++) out[(size_t)cch].push_back(0.0f);
    }
    res->n = (int64_t)out[0].size();
    res->samples = (float*)malloc((size_t)channels * (size_t)res->n * sizeof(float) + 1);
    for (int cch = 0; cch < channels; cch++) {
        // short channels (shouldn't happen) zero-pad defensively
        size_t m = out[(size_t)cch].size();
        memcpy(res->samples + (size_t)cch * res->n, out[(size_t)cch].data(),
               std::min<size_t>(m, (size_t)res->n) * sizeof(float));
        for (size_t i = m; i < (size_t)res->n; i++)
            res->samples[(size_t)cch * res->n + i] = 0.0f;
    }
    return res;
}

// Flat-layout batched LPC restore: operates in place on the parser's
// concatenated values (one span of blocks[s] samples per subframe at
// offs[s]) — no padded-matrix staging on the Python side. Also applies the
// wasted-bits shift (aukit.lua:466) so the caller touches the buffer once.
void flac_restore_flat(int64_t* flat, const int64_t* offs, const int64_t* blocks,
                       const int64_t* orders, const int64_t* shifts,
                       const int64_t* wasted, const int64_t* coefs, int64_t n_subs) {
    for (int64_t s = 0; s < n_subs; s++) {
        int64_t* v = flat + offs[s];
        int64_t T = blocks[s];
        int order = (int)orders[s];
        int shift = (int)shifts[s];
        const int64_t* c = coefs + s * 32;
        if (order > 0) restore_generic(v, T, c, order, shift);
        if (wasted[s]) {
            int w = (int)wasted[s];
            for (int64_t i = 0; i < T; i++) v[i] <<= w;
        }
    }
}

// Fused whole-stream QOA decode: frame walk + slice extraction + dequant +
// LMS reconstruction in one pass (the loader's fast path; semantics identical
// to codecs/qoa.py::decode_qoa incl. the reference's lenient break conditions
// aukit.lua:1732-1740 and int32-wraparound LMS predict).
static const int32_t QOA_DEQUANT_TAB[16][8] = {
    {1, -1, 3, -3, 5, -5, 7, -7},
    {5, -5, 18, -18, 32, -32, 49, -49},
    {16, -16, 53, -53, 95, -95, 147, -147},
    {34, -34, 113, -113, 203, -203, 315, -315},
    {63, -63, 210, -210, 378, -378, 588, -588},
    {104, -104, 345, -345, 621, -621, 966, -966},
    {158, -158, 528, -528, 950, -950, 1477, -1477},
    {228, -228, 760, -760, 1368, -1368, 2128, -2128},
    {316, -316, 1053, -1053, 1895, -1895, 2947, -2947},
    {422, -422, 1405, -1405, 2529, -2529, 3934, -3934},
    {548, -548, 1828, -1828, 3290, -3290, 5117, -5117},
    {696, -696, 2320, -2320, 4176, -4176, 6496, -6496},
    {868, -868, 2893, -2893, 5207, -5207, 8099, -8099},
    {1064, -1064, 3548, -3548, 6386, -6386, 9933, -9933},
    {1286, -1286, 4288, -4288, 7718, -7718, 12005, -12005},
    {1536, -1536, 5120, -5120, 9216, -9216, 14336, -14336},
};

struct QoaDecodeResult {
    int32_t* samples;  // planar [channels][n]
    int64_t n;         // samples per channel
};

void qoa_decode_free(QoaDecodeResult* r) {
    if (!r) return;
    free(r->samples);
    free(r);
}

static inline int16_t be16s(const uint8_t* p) {
    return (int16_t)((p[0] << 8) | p[1]);
}

QoaDecodeResult* qoa_decode_full(const uint8_t* data, int64_t len, int64_t start_pos,
                                 int32_t file_channels, int32_t file_rate,
                                 int64_t file_samples) {
    auto* res = (QoaDecodeResult*)calloc(1, sizeof(QoaDecodeResult));
    std::vector<std::vector<int32_t>> out((size_t)file_channels);
    if (file_samples > 0 && file_samples < (int64_t)1 << 32)
        for (auto& ch : out) ch.reserve((size_t)file_samples);
    int64_t pos = start_pos, sample_pos = 0;
    int32_t h[8][4], w[8][4];
    while (pos + 16 * file_channels + 8 <= len && sample_pos < file_samples) {
        int channels = data[pos];
        int64_t samplerate = ((int64_t)data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
        int64_t samples = (data[pos + 4] << 8) | data[pos + 5];
        int64_t frame_size = (data[pos + 6] << 8) | data[pos + 7];
        int64_t data_size = frame_size - 8 - 4 * 4 * channels;
        int64_t num_slices = data_size / 8;
        if (channels != file_channels || samplerate != file_rate ||
            frame_size > len - pos - 8 || samples * channels > num_slices * 20 ||
            channels > 8)
            break;
        int64_t p = pos + 8;
        for (int c = 0; c < channels; c++) {
            for (int k = 0; k < 4; k++) h[c][k] = be16s(data + p + 2 * k);
            for (int k = 0; k < 4; k++) w[c][k] = be16s(data + p + 8 + 2 * k);
            p += 16;
        }
        for (int64_t si = 0; si < samples; si += 20) {
            int64_t emit = std::min<int64_t>(20, samples - si);
            for (int c = 0; c < channels; c++) {
                uint64_t slice;
                memcpy(&slice, data + p, 8);
                slice = __builtin_bswap64(slice);
                p += 8;
                int sf = (int)(slice >> 60);
                const int32_t* dq_row = QOA_DEQUANT_TAB[sf];
                int32_t* hc = h[c];
                int32_t* wc = w[c];
                auto& ch = out[(size_t)c];
                for (int64_t j = 0; j < 20; j++) {
                    int32_t dq = dq_row[(slice >> (57 - 3 * j)) & 7];
                    uint32_t sum = (uint32_t)wc[0] * (uint32_t)hc[0] + (uint32_t)wc[1] * (uint32_t)hc[1] +
                                   (uint32_t)wc[2] * (uint32_t)hc[2] + (uint32_t)wc[3] * (uint32_t)hc[3];
                    int32_t pred = (int32_t)sum >> 13;
                    int32_t rec = pred + dq;
                    if (rec < -32768) rec = -32768;
                    if (rec > 32767) rec = 32767;
                    if (j < emit) ch.push_back(rec);
                    int32_t delta = dq >> 4;
                    wc[0] += hc[0] < 0 ? -delta : delta;
                    wc[1] += hc[1] < 0 ? -delta : delta;
                    wc[2] += hc[2] < 0 ? -delta : delta;
                    wc[3] += hc[3] < 0 ? -delta : delta;
                    hc[0] = hc[1]; hc[1] = hc[2]; hc[2] = hc[3]; hc[3] = rec;
                }
            }
        }
        sample_pos += samples;
        pos += frame_size;
    }
    res->n = (int64_t)out[0].size();
    res->samples = (int32_t*)malloc((size_t)file_channels * (size_t)res->n * sizeof(int32_t) + 1);
    for (int c = 0; c < file_channels; c++) {
        size_t m = out[(size_t)c].size();
        memcpy(res->samples + (size_t)c * res->n, out[(size_t)c].data(),
               std::min<size_t>(m, (size_t)res->n) * sizeof(int32_t));
        for (size_t i = m; i < (size_t)res->n; i++)
            res->samples[(size_t)c * res->n + i] = 0;
    }
    return res;
}

// QOA LMS reconstruction (host fast path; semantics identical to
// codecs/qoa.py::qoa_lms_scan — int32 wraparound like the reference's bit32
// coercion). dq/out: [lanes, T]; hist/wts: [lanes, 4] updated in place.
void qoa_lms(const int32_t* dq, int32_t* out, int32_t* hist, int32_t* wts,
             int64_t lanes, int64_t T) {
    for (int64_t l = 0; l < lanes; l++) {
        int32_t h0 = hist[l * 4], h1 = hist[l * 4 + 1], h2 = hist[l * 4 + 2], h3 = hist[l * 4 + 3];
        int32_t w0 = wts[l * 4], w1 = wts[l * 4 + 1], w2 = wts[l * 4 + 2], w3 = wts[l * 4 + 3];
        const int32_t* d = dq + l * T;
        int32_t* o = out + l * T;
        for (int64_t t = 0; t < T; t++) {
            uint32_t sum = (uint32_t)w0 * (uint32_t)h0 + (uint32_t)w1 * (uint32_t)h1 +
                           (uint32_t)w2 * (uint32_t)h2 + (uint32_t)w3 * (uint32_t)h3;
            int32_t pred = (int32_t)sum >> 13;
            int32_t rec = pred + d[t];
            if (rec < -32768) rec = -32768;
            if (rec > 32767) rec = 32767;
            o[t] = rec;
            int32_t delta = d[t] >> 4;
            w0 += h0 < 0 ? -delta : delta;
            w1 += h1 < 0 ? -delta : delta;
            w2 += h2 < 0 ? -delta : delta;
            w3 += h3 < 0 ? -delta : delta;
            h0 = h1; h1 = h2; h2 = h3; h3 = rec;
        }
        hist[l * 4] = h0; hist[l * 4 + 1] = h1; hist[l * 4 + 2] = h2; hist[l * 4 + 3] = h3;
        wts[l * 4] = w0; wts[l * 4 + 1] = w1; wts[l * 4 + 2] = w2; wts[l * 4 + 3] = w3;
    }
}

// DFPWM1a host fast paths (semantics identical to codecs/dfpwm.py's scan:
// arithmetic int32 shifts, PREC=10, strength floor 8, antijerk average on
// bit flips, 140/256 output low-pass). The single/few-lane loader & stream
// paths are host-resident, where the Pallas kernel's [32,128] lane padding
// would cost 4096x the memory and a transfer — the same routing doctrine as
// the QOA/FLAC host paths. state: [5, lanes] (charge, strength, prev_bit,
// prev_charge, lowpass), updated in place. bytes [lanes, B] -> out [lanes, B*8].
void dfpwm_decode_rows(const uint8_t* bytes, int64_t L, int64_t B,
                       int32_t* state, int32_t* out) {
    for (int64_t l = 0; l < L; l++) {
        int32_t q = state[l], s = state[L + l], lb = state[2 * L + l];
        int32_t pq = state[3 * L + l], lp = state[4 * L + l];
        const uint8_t* row = bytes + l * B;
        int32_t* o = out + l * B * 8;
        for (int64_t i = 0; i < B; i++) {
            int32_t byte = row[i];
            for (int k = 0; k < 8; k++) {
                int32_t bit = (byte >> k) & 1;
                int32_t target = bit ? 127 : -128;
                int32_t nq = q + ((s * (target - q) + 512) >> 10);
                if (nq == q && nq != target) nq += bit ? 1 : -1;
                int32_t z = (bit == lb) ? 1023 : 0;
                if (s != z) s += (bit == lb) ? 1 : -1;
                if (s < 8) s = 8;
                int32_t aj = (bit != lb) ? ((nq + pq + 1) >> 1) : nq;
                lp += ((aj - lp) * 140 + 0x80) >> 8;
                o[i * 8 + k] = lp;
                q = nq; pq = nq; lb = bit;
            }
        }
        state[l] = q; state[L + l] = s; state[2 * L + l] = lb;
        state[3 * L + l] = pq; state[4 * L + l] = lp;
    }
}

// levels [lanes, N] (N % 8 == 0) -> out [lanes, N/8]; state rows used:
// charge, strength, prev_bit (prev_charge/lowpass untouched, like the scan).
void dfpwm_encode_rows(const int32_t* levels, int64_t L, int64_t N,
                       int32_t* state, uint8_t* out) {
    for (int64_t l = 0; l < L; l++) {
        int32_t q = state[l], s = state[L + l], lb = state[2 * L + l];
        const int32_t* row = levels + l * N;
        uint8_t* o = out + l * (N / 8);
        for (int64_t i = 0; i < N / 8; i++) {
            int32_t byte = 0;
            for (int k = 0; k < 8; k++) {
                int32_t level = row[i * 8 + k];
                int32_t bit = (level > q || (level == q && q == 127)) ? 1 : 0;
                int32_t target = bit ? 127 : -128;
                int32_t nq = q + ((s * (target - q) + 512) >> 10);
                if (nq == q && nq != target) nq += bit ? 1 : -1;
                int32_t z = (bit == lb) ? 1023 : 0;
                if (s != z) s += (bit == lb) ? 1 : -1;
                if (s < 8) s = 8;
                byte |= bit << k;
                q = nq; lb = bit;
            }
            o[i] = (uint8_t)byte;
        }
        state[l] = q; state[L + l] = s; state[2 * L + l] = lb;
    }
}

}  // extern "C"

extern "C" {

// One-pass PCM frame reader for the single-stream chunk engine
// (stream/sources.py::PcmFrameSource): unpack -> asymmetric normalize (with
// the float32 round-trip the staged numpy path performs) -> optional mono
// mean, planar f64 output. type: 0 signed, 1 unsigned, 2 float.
// Returns the frame count written.
int64_t pcm_frames(const uint8_t* raw, int64_t nbytes, int32_t depth, int32_t type,
                   int32_t be, int32_t channels, int32_t mono, double* out) {
    int bps = depth / 8;
    int64_t k = nbytes / ((int64_t)bps * channels);
    int64_t c_out = mono ? 1 : channels;
    const double maxv = (double)((int64_t)1 << (depth - 1));
    for (int64_t i = 0; i < k; i++) {
        double acc = 0.0;
        for (int c = 0; c < channels; c++) {
            const uint8_t* p = raw + ((i * channels + c) * bps);
            double x;
            if (type == 2) {  // float32
                uint32_t u = be ? ((uint32_t)p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
                               : ((uint32_t)p[3] << 24) | (p[2] << 16) | (p[1] << 8) | p[0];
                float f;
                memcpy(&f, &u, 4);
                x = (double)f;
            } else {
                int64_t v = 0;
                if (be) {
                    for (int b = 0; b < bps; b++) v = (v << 8) | p[b];
                } else {
                    for (int b = bps - 1; b >= 0; b--) v = (v << 8) | p[b];
                }
                if (type == 0 && v >= ((int64_t)1 << (depth - 1))) v -= (int64_t)1 << depth;
                double xf;
                if (type == 0) {
                    xf = (double)v / (v < 0 ? maxv : maxv - 1.0);
                } else {  // unsigned: reference quirk Q1 — pivot/bias fixed at 128
                    xf = ((double)v - 128.0) / (v < 128 ? maxv : maxv - 1.0);
                }
                x = (double)(float)xf;  // the staged path rounds through f32
            }
            if (mono) acc += x;
            else out[(int64_t)c * k + i] = x;
        }
        if (mono) out[i] = acc / channels;
    }
    (void)c_out;
    return k;
}

// Fused chunk DSP for the stream engine's "none"/"linear" interpolation
// modes (stream/engine.py::ChunkResampler.process): gather + lerp + 2-tap
// FIR + int8 scale in ONE pass, float64 ops in the numpy path's exact order
// (bit-identical; cubic/sinc stay on the numpy oracle). mode: 0 none,
// 1 linear. filter_state[C] is updated in place.
void chunk_dsp(const double* ext, int64_t C, int64_t n_ext, const int64_t* ffx,
               const double* frac, const uint8_t* exact, int64_t out_len,
               int32_t mode, int32_t clamp, double clo, double chi,
               int32_t lowpass, double alpha, double* filter_state,
               int32_t zero_state_after, int32_t scale_int8, int32_t floor_out,
               double* out) {
    for (int64_t c = 0; c < C; c++) {
        const double* e = ext + c * n_ext;
        double* o = out + c * out_len;
        double prev = filter_state[c];
        double last_s = prev;
        for (int64_t i = 0; i < out_len; i++) {
            double s;
            int64_t f = ffx[i];
            if (mode == 0) {
                int64_t fi = f < 0 ? 0 : (f > n_ext - 1 ? n_ext - 1 : f);
                s = e[fi];
            } else {
                double p1 = e[f];
                double p2 = e[f + 1 <= n_ext - 1 ? f + 1 : n_ext - 1];
                if (exact[i]) {
                    s = p1;
                } else {
                    s = p1 + (p2 - p1) * frac[i];
                    if (clamp) s = s < clo ? clo : (s > chi ? chi : s);
                }
            }
            double y = s;
            if (lowpass) {
                y = prev + alpha * (s - prev);
                prev = s;
                last_s = s;
            }
            if (scale_int8) y = y * (y < 0 ? 128.0 : 127.0);
            if (floor_out) y = __builtin_floor(y);
            if (scale_int8) y = y < -128.0 ? -128.0 : (y > 127.0 ? 127.0 : y);
            o[i] = y;
        }
        if (lowpass) filter_state[c] = zero_state_after ? 0.0 : last_s;
    }
}

}  // extern "C"

extern "C" {

// Per-block Lua-style resample over independent rows (the batched FLAC-fleet
// DSP hot path, stream/flac_fleet.py; also the single-stream flac/qoa block
// resample): gather + lerp on rows of ext[R, n_ext], float64 ops split into
// single-rounding statements in the numpy oracle's exact order
// (stream/engine.py::lua_block_resample; bit-identical for the "none" and
// "linear" modes — cubic/sinc stay on the numpy path). ffx is pre-offset by
// the history width like the numpy caller's `ffx0 + H`.
void block_resample_rows(const double* ext, int64_t R, int64_t n_ext,
                         const int64_t* ffx, const double* frac,
                         const uint8_t* exact, int64_t out_len, int32_t mode,
                         int32_t clamp, double clo, double chi, double* out) {
    int64_t hi = n_ext - 1;
    for (int64_t r = 0; r < R; r++) {
        const double* e = ext + r * n_ext;
        double* o = out + r * out_len;
        for (int64_t i = 0; i < out_len; i++) {
            int64_t f = ffx[i];
            int64_t f1 = f < 0 ? 0 : (f > hi ? hi : f);
            double p1 = e[f1];
            if (mode == 0 || exact[i]) {
                o[i] = p1;
                continue;
            }
            int64_t f2 = f + 1 <= hi ? f + 1 : f;  // numpy: where(ffx+1<=hi, ffx+1, ffx)
            f2 = f2 < 0 ? 0 : (f2 > hi ? hi : f2);
            double p2 = e[f2];
            double d = p2 - p1;   // separate statements: one IEEE rounding per
            double m = d * frac[i];  // op, immune to compiler FMA contraction
            double v = p1 + m;
            if (clamp) v = v < clo ? clo : (v > chi ? chi : v);
            o[i] = v;
        }
    }
}

// First-order IIR y_i = y_{i-1} + alpha*(x_i - y_{i-1}) over rows of y[R, T]
// with initial state[R] — evaluated by RECURSIVE DOUBLING in the numpy
// oracle's exact pass order and rounding (stream/engine.py::iir_lowpass_scan;
// the descending inner loop reads pre-pass values exactly like numpy's
// out-of-place `y[shift:] += ck * y[:-shift]`). In place; final per-row state
// lands in state_out (may alias state).
void iir_scan_rows(double* y, const double* state, double* state_out,
                   double alpha, int64_t R, int64_t T) {
    double c = 1.0 - alpha;
    for (int64_t r = 0; r < R; r++) {
        double* yr = y + r * T;
        for (int64_t i = 0; i < T; i++) {
            double t = yr[i] * alpha;
            yr[i] = t;
        }
        double t0 = c * state[r];
        yr[0] = yr[0] + t0;
        double ck = c;
        for (int64_t shift = 1; shift < T; shift <<= 1) {
            if (ck == 0.0) break;  // underflow: further passes add exactly
                                   // +0.0 — skipping is bit-identical
            for (int64_t i = T - 1; i >= shift; i--) {
                double t = ck * yr[i - shift];
                yr[i] = yr[i] + t;
            }
            ck = ck * ck;
        }
        state_out[r] = yr[T - 1];
    }
}

}  // extern "C"
