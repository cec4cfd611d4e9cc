// Block-aligner core: adaptive block Smith-Waterman with traceback, the
// algorithm behind the reference's default backtrace path
// (StructureSmithWaterman::alignStartPosBacktraceBlock,
// src/commons/StructureSmithWaterman.cpp:369-527, calling into the Rust
// crate lib/mmseqs/lib/block-aligner).
//
// DERIVATION NOTE — this is a from-scratch C++ reimplementation of the
// block-aligner ALGORITHM (Liu & Steinegger, block aligner; reference Rust
// source: lib/mmseqs/lib/block-aligner/src/scan_block.rs, avx2.rs,
// cigar.rs, scores.rs, read for SEMANTICS), not a transliteration. The
// published algorithm: a fixed-size square block of the DP matrix is
// shifted right or down by a step of 8, choosing the direction whose
// border prefix-max is larger; when the best score stagnates for
// ~block_size/step iterations the block doubles in size and restarts from
// the last-best checkpoint; blocks can also shrink when the border suffix
// says the tail is dominant. DP deltas are 16-bit with a 32-bit running
// offset. Byte-for-byte output parity with the reference binary REQUIRES
// reproducing its exact arithmetic, including the i16-saturating prefix-
// scan tree and the 128-bit-lane-local shifts of its AVX2 build (L = 16
// lanes, two independent 128-bit halves) — so the vector helpers below
// emulate those lane semantics exactly, in plain scalar C++ (auto-
// vectorized by -O3). Own choices here: scalar lane emulation instead of
// intrinsics, numeric (not ASCII) alphabet indices end-to-end, RAII
// buffers with resize-on-demand instead of fixed preallocation, bounds-
// checked trace growth, and a single driver entry point that performs the
// caller's exponential block-size search.
//
// Trace layout, checkpointing, and the traceback LUT follow the reference
// semantics exactly (scan_block.rs:1726-2010); the x-drop best-cell
// tie-break prefers the largest reference index then largest query index
// (scan_block.rs:374-380 `compare`).
#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

// BA_FORCE_SCALAR disables the intrinsic path (A/B testing); the scalar
// lane emulation and the AVX2 intrinsics compute bit-identical results by
// construction (the scalar helpers emulate exactly these intrinsics).
#if defined(__AVX2__) && !defined(BA_FORCE_SCALAR)
#define BA_AVX2 1
#include <immintrin.h>
#endif

namespace ba {

constexpr int L = 16;           // 16-bit lanes per vector (AVX2 build of the reference)
constexpr int HALF = 8;         // lanes per independent 128-bit half
constexpr int STEP = 8;         // block shift step (scan_block.rs:812)
constexpr int X_DROP_ITER = 2;  // consecutive bad steps before terminating
constexpr int SHRINK_SUFFIX_LEN = STEP / 4;
constexpr int16_t ZERO_OFF = 1 << 14;  // score offset ("ZERO", avx2.rs:15)
constexpr int16_t VMIN = 0;            // -inf sentinel ("MIN", avx2.rs:16)
constexpr uint8_t NULL_IDX = 26;       // padding letter index ('A'+26)

static inline int16_t sat16(int32_t v) {
    return v > 32767 ? 32767 : (v < -32768 ? (int16_t)-32768 : (int16_t)v);
}

#if defined(BA_AVX2)

typedef __m256i V;

static inline V set1(int16_t x) { return _mm256_set1_epi16(x); }
static inline V adds(V a, V b) { return _mm256_adds_epi16(a, b); }
static inline V subs(V a, V b) { return _mm256_subs_epi16(a, b); }
static inline V vmax(V a, V b) { return _mm256_max_epi16(a, b); }
static inline V cmpeq(V a, V b) { return _mm256_cmpeq_epi16(a, b); }
static inline V loadu(const void* p) {
    return _mm256_loadu_si256((const __m256i*)p);
}
static inline void storeu(void* p, V v) {
    _mm256_storeu_si256((__m256i*)p, v);
}
// shift left by one lane, lane 0 filled from b's top lane (simd_sl_i16!(a,b,1))
static inline V sl1(V a, V b) {
    return _mm256_alignr_epi8(a, _mm256_permute2x128_si256(a, b, 0x03), 14);
}
template <int N>
static inline V sllz(V a) {  // lane-local shift left by N i16, zero fill
    return _mm256_slli_si256(a, 2 * N);
}
static inline V step8(V a, V b) { return _mm256_permute2x128_si256(a, b, 0x03); }
static inline V broadcasthi(V v) {
    v = _mm256_shufflehi_epi16(v, 0xFF);
    return _mm256_permute4x64_epi64(v, 0xFF);
}
static inline int16_t lane0(V v) { return (int16_t)_mm256_extract_epi16(v, 0); }
static inline int16_t lane15(V v) { return (int16_t)_mm256_extract_epi16(v, 15); }
static inline V set_lane0(V v, int16_t x) {
    return _mm256_insert_epi16(v, x, 0);
}
static inline int16_t hmax(V v) {  // simd_hmax_i16 (avx2.rs:186-193)
    V v2 = _mm256_max_epi16(v, _mm256_srli_si256(v, 2));
    v2 = _mm256_max_epi16(v2, _mm256_srli_si256(v2, 4));
    v2 = _mm256_max_epi16(v2, _mm256_srli_si256(v2, 8));
    v2 = _mm256_max_epi16(v2, _mm256_permute2x128_si256(v2, v2, 0x03));
    return lane0(v2);
}
static inline int16_t prefix_hmax_step(V v) {  // max of lanes 0..7
    v = _mm256_max_epi16(v, _mm256_srli_si256(v, 8));
    v = _mm256_max_epi16(v, _mm256_srli_si256(v, 4));
    v = _mm256_max_epi16(v, _mm256_srli_si256(v, 2));
    return lane0(v);
}
static inline int16_t suffix_hmax(V v) {  // max of lanes 14..15
    v = _mm256_max_epi16(v, _mm256_slli_si256(v, 2));
    return lane15(v);
}

struct ScanConsts {
    V consts;
    V extend_all;
};

static inline ScanConsts scan_consts(int16_t gap) {
    // get_prefix_scan_consts (avx2.rs:295-311)
    V g = set1(gap);
    V s1 = adds(sllz<1>(g), g);
    V s2 = adds(sllz<2>(s1), s1);
    V s4 = adds(sllz<4>(s2), s2);
    V c1 = _mm256_srli_si256(_mm256_shufflehi_epi16(s4, 0xFF), 8);
    c1 = _mm256_permute4x64_epi64(c1, 0x05);
    ScanConsts sc;
    sc.consts = s4;
    sc.extend_all = adds(c1, s4);
    return sc;
}

static inline V prefix_scan(V R, int16_t gap, const ScanConsts& sc) {
    // simd_prefix_scan_i16 (avx2.rs:313-338), exact op sequence
    V gv = set1(gap);
    V s1 = vmax(R, adds(sllz<1>(R), gv));
    V s2 = vmax(s1, adds(sllz<2>(s1), _mm256_slli_epi16(gv, 1)));
    V s4 = vmax(s2, adds(sllz<4>(s2), _mm256_slli_epi16(gv, 2)));
    V c1 = _mm256_shufflehi_epi16(s4, 0xFF);
    c1 = _mm256_permute4x64_epi64(c1, 0x50);
    c1 = adds(c1, sc.consts);
    return vmax(s4, c1);
}

// per-lane score gather: mat rows are 32-byte lookup tables, query bytes
// select via pshufb with the bit-4 table-half blend
// (AAMatrix::get_scores + halfsimd_lookup2_i16, scores.rs:133-139,
// avx2.rs:342-351)
static inline V mat_lookup(const int8_t* row, const uint8_t* q) {
    __m128i qv = _mm_loadu_si128((const __m128i*)q);
    __m128i lut1 = _mm_loadu_si128((const __m128i*)row);
    __m128i lut2 = _mm_loadu_si128((const __m128i*)(row + 16));
    __m128i a = _mm_shuffle_epi8(lut1, qv);
    __m128i b = _mm_shuffle_epi8(lut2, qv);
    __m128i mask = _mm_slli_epi16(qv, 3);
    return _mm256_cvtepi8_epi16(_mm_blendv_epi8(a, b, mask));
}

static inline V score_vec(const int8_t* row_aa, const int8_t* row_3di,
                          const uint8_t* qa, const uint8_t* q3,
                          const int16_t* qb, V rbias) {
    V s_aa = mat_lookup(row_aa, qa);
    V s_3di = mat_lookup(row_3di, q3);
    V pos = adds(rbias, loadu(qb));
    return adds(adds(s_aa, s_3di), pos);
}

// compressed trace words: movemask over the byte-blended compare masks
// (place_block_3di TRACE section, scan_block.rs:1395-1405)
static inline void trace_words(V D11, V C11, V R11, V C11_open, V D11_open,
                               V& prev_trace_R, int32_t& t1, int32_t& t2) {
    V mask = set1((int16_t)0xFF00);
    t1 = _mm256_movemask_epi8(
        _mm256_blendv_epi8(cmpeq(D11, C11), cmpeq(D11, R11), mask));
    V temp_trace_R = cmpeq(R11, D11_open);
    V trace_R = sl1(temp_trace_R, prev_trace_R);
    t2 = _mm256_movemask_epi8(
        _mm256_blendv_epi8(cmpeq(C11, C11_open), trace_R, mask));
    prev_trace_R = temp_trace_R;
}

static inline void argmax_update(V& D_max, V& ai, V& aj, V D11, int16_t i,
                                 int16_t j) {
    D_max = vmax(D_max, D11);
    V m = cmpeq(D_max, D11);
    ai = _mm256_blendv_epi8(ai, set1(i), m);
    aj = _mm256_blendv_epi8(aj, set1(j), m);
}

static inline void store_arr(int16_t* dst, V v) { storeu(dst, v); }

#else  // scalar emulation of the exact AVX2 lane semantics

struct V {
    int16_t e[L];
};

static inline V set1(int16_t x) {
    V r;
    for (int i = 0; i < L; i++) r.e[i] = x;
    return r;
}

static inline V adds(const V& a, const V& b) {
    V r;
    for (int i = 0; i < L; i++) r.e[i] = sat16((int32_t)a.e[i] + b.e[i]);
    return r;
}

static inline V subs(const V& a, const V& b) {
    V r;
    for (int i = 0; i < L; i++) r.e[i] = sat16((int32_t)a.e[i] - b.e[i]);
    return r;
}

static inline V vmax(const V& a, const V& b) {
    V r;
    for (int i = 0; i < L; i++) r.e[i] = a.e[i] > b.e[i] ? a.e[i] : b.e[i];
    return r;
}

static inline V loadu(const void* p) {
    V r;
    std::memcpy(r.e, p, sizeof(r.e));
    return r;
}

static inline void storeu(void* p, const V& v) {
    std::memcpy(p, v.e, sizeof(v.e));
}

// shift left by one lane, lane 0 filled from b's top lane (simd_sl_i16!(a,b,1))
static inline V sl1(const V& a, const V& b) {
    V r;
    r.e[0] = b.e[L - 1];
    for (int i = 1; i < L; i++) r.e[i] = a.e[i - 1];
    return r;
}

// lane-local (per 128-bit half) shift left by n lanes, zero fill
// (_mm256_slli_si256 semantics used by the prefix-scan tree)
template <int N>
static inline V sllz(const V& a) {
    V r;
    for (int h = 0; h < L; h += HALF)
        for (int i = 0; i < HALF; i++)
            r.e[h + i] = i < N ? 0 : a.e[h + i - N];
    return r;
}

// out[0..7] = b[8..15], out[8..15] = a[0..7]  (simd_step, STEP = 8)
static inline V step8(const V& a, const V& b) {
    V r;
    for (int i = 0; i < HALF; i++) {
        r.e[i] = b.e[HALF + i];
        r.e[HALF + i] = a.e[i];
    }
    return r;
}

static inline V broadcasthi(const V& a) { return set1(a.e[L - 1]); }

static inline int16_t lane15(const V& v) { return v.e[L - 1]; }

static inline V set_lane0(V v, int16_t x) {
    v.e[0] = x;
    return v;
}

static inline int16_t hmax(const V& a) {
    int16_t m = a.e[0];
    for (int i = 1; i < L; i++) m = a.e[i] > m ? a.e[i] : m;
    return m;
}

static inline int16_t prefix_hmax_step(const V& a) {  // max of lanes 0..STEP-1
    int16_t m = a.e[0];
    for (int i = 1; i < STEP; i++) m = a.e[i] > m ? a.e[i] : m;
    return m;
}

static inline int16_t suffix_hmax(const V& a) {  // max of top SHRINK_SUFFIX_LEN lanes
    int16_t m = a.e[L - 1];
    for (int i = L - SHRINK_SUFFIX_LEN; i < L; i++) m = a.e[i] > m ? a.e[i] : m;
    return m;
}

// Prefix-scan constants (avx2.rs get_prefix_scan_consts): consts[i] =
// ((i % 8) + 1) * gap per half; gap_extend_all[i] = (i + 1) * gap globally.
struct ScanConsts {
    V consts;
    V extend_all;
};

static inline ScanConsts scan_consts(int16_t gap) {
    V g = set1(gap);
    V s1 = adds(sllz<1>(g), g);
    V s2 = adds(sllz<2>(s1), s1);
    V s4 = adds(sllz<4>(s2), s2);
    ScanConsts sc;
    sc.consts = s4;
    // cross-half cascade: upper half adds the lower half's full-gap sum
    V t;
    for (int i = 0; i < HALF; i++) t.e[i] = 0;
    for (int i = HALF; i < L; i++) t.e[i] = s4.e[HALF - 1];
    sc.extend_all = adds(t, s4);
    return sc;
}

// Saturating prefix max-scan with gap costs: out[i] = max_{j<=i}
// (in[j] + (i-j)*gap), computed with the reference's exact i16-saturating
// log-step tree including its lane-local shifts and cross-half correction
// (avx2.rs simd_prefix_scan_i16) — the tree's shifted-in zeros make its
// result differ from the mathematical scan in -inf-sentinel corners, and
// parity requires the tree's answer.
static inline V prefix_scan(const V& R, int16_t gap, const ScanConsts& sc) {
    V gv = set1(gap);
    V s1 = vmax(R, adds(sllz<1>(R), gv));
    V g2 = set1((int16_t)((uint16_t)gap << 1));  // wrapping <<1 (slli_epi16)
    V s2 = vmax(s1, adds(sllz<2>(s1), g2));
    V g4 = set1((int16_t)((uint16_t)gap << 2));
    V s4 = vmax(s2, adds(sllz<4>(s2), g4));
    // correction vector: [s4[0..3], s4[0..3], s4[7]x4, s4[7]x4] + consts;
    // a no-op on the lower half, carries s4[7] into the upper half
    V c;
    for (int k = 0; k < 4; k++) {
        c.e[k] = s4.e[k];
        c.e[4 + k] = s4.e[k];
        c.e[8 + k] = s4.e[7];
        c.e[12 + k] = s4.e[7];
    }
    c = adds(c, sc.consts);
    return vmax(s4, c);
}

static inline V score_vec(const int8_t* row_aa, const int8_t* row_3di,
                          const uint8_t* qa, const uint8_t* q3,
                          const int16_t* qb, const V& rbias) {
    V scores;
    for (int l = 0; l < L; l++)
        scores.e[l] = sat16(
            (int32_t)row_aa[qa[l]] + row_3di[q3[l]]
            + sat16((int32_t)rbias.e[l] + qb[l]));
    return scores;
}

static inline void trace_words(const V& D11, const V& C11, const V& R11,
                               const V& C11_open, const V& D11_open,
                               V& prev_trace_R, int32_t& t1, int32_t& t2) {
    t1 = t2 = 0;
    for (int l = 0; l < L; l++) {
        t1 |= (D11.e[l] == C11.e[l] ? 1 : 0) << (2 * l);
        t1 |= (D11.e[l] == R11.e[l] ? 1 : 0) << (2 * l + 1);
        t2 |= (C11.e[l] == C11_open.e[l] ? 1 : 0) << (2 * l);
        bool tr = l == 0 ? prev_trace_R.e[L - 1] != 0
                         : R11.e[l - 1] == D11_open.e[l - 1];
        t2 |= (tr ? 1 : 0) << (2 * l + 1);
    }
    for (int l = 0; l < L; l++)
        prev_trace_R.e[l] = R11.e[l] == D11_open.e[l] ? (int16_t)-1 : 0;
}

static inline void argmax_update(V& D_max, V& ai, V& aj, const V& D11,
                                 int16_t i, int16_t j) {
    V newmax = vmax(D_max, D11);
    for (int l = 0; l < L; l++) {
        if (newmax.e[l] == D11.e[l]) {
            ai.e[l] = i;
            aj.e[l] = j;
        }
    }
    D_max = newmax;
}

static inline void store_arr(int16_t* dst, const V& v) { storeu(dst, v); }

#endif  // BA_AVX2

// 27x32 substitution matrix, rows indexed by letter index (0..26; 26 is the
// padding letter whose row stays at -128 = i8::MIN, scores.rs AAMatrix).
struct Mat27 {
    int8_t m[27 * 32];
    Mat27() { std::memset(m, 0x80, sizeof(m)); }
    void set(uint8_t a, uint8_t b, int8_t score) {
        m[(size_t)a * 32 + b] = score;
        m[(size_t)b * 32 + a] = score;
    }
    inline const int8_t* row(uint8_t c) const { return m + (size_t)c * 32; }
};

// Padded sequence: s[0] = NULL_IDX, then len letter indices, then max_size
// NULL_IDX bytes (PaddedBytes, scan_block.rs:2144-2246).
struct PaddedSeq {
    std::vector<uint8_t> s;
    size_t len = 0;
    void set(const uint8_t* b, size_t n, size_t max_size) {
        s.assign(1 + n + max_size, NULL_IDX);
        std::memcpy(s.data() + 1, b, n);
        len = n;
    }
};

// Padded positional bias: b[0] = 0, then len i16 biases, zero tail.
struct PaddedBias {
    std::vector<int16_t> b;
    size_t len = 0;
    void set(const int16_t* src, size_t n, size_t max_size) {
        b.assign(1 + n + max_size + L, 0);
        if (src) std::memcpy(b.data() + 1, src, n * sizeof(int16_t));
        len = n;
    }
    void zeros(size_t n, size_t max_size) { set(nullptr, n, max_size); }
};

enum Op : uint8_t { OP_SENTINEL = 0, OP_M = 1, OP_I = 4, OP_D = 5 };

struct OpLen {
    uint8_t op;
    uint32_t len;
};

// Run-length cigar built backwards during traceback; get(i) reads in
// forward (start -> end) order (cigar.rs).
struct Cigar {
    std::vector<OpLen> s;
    size_t idx = 1;
    void clear() {
        s.clear();
        s.push_back({OP_SENTINEL, 0});
        idx = 1;
    }
    inline void add(uint8_t op) {
        if (op != s[idx - 1].op) {
            s.push_back({op, 0});
            idx++;
        }
        s[idx - 1].len++;
    }
    size_t size() const { return idx - 1; }
    OpLen get(size_t i) const { return s[idx - 1 - i]; }
};

// Traceback LUT (scan_block.rs:1860-1930): indexed by
// (trace << 4) | (trace2 << 2) | table. trace bit0 = D==C, bit1 = D==R;
// trace2 bit0 = C gap-open, bit1 = R gap-open (roles swapped for
// right = false blocks). table: 0 = D, 1 = C, 2 = R.
struct LutEntry {
    uint8_t op, di, dj, table;
};

struct OpLut {
    LutEntry lut[2][64];
    OpLut() {
        for (int right = 0; right < 2; right++)
            for (int trace = 0; trace < 4; trace++)
                for (int trace2 = 0; trace2 < 4; trace2++)
                    for (int table = 0; table < 3; table++) {
                        LutEntry r;
                        bool t2b0 = trace2 & 1, t2b1 = trace2 & 2;
                        if (right) {
                            if (table == 1)       // C table
                                r = t2b0 ? LutEntry{OP_D, 0, 1, 0}
                                         : LutEntry{OP_D, 0, 1, 1};
                            else if (table == 2)  // R table
                                r = t2b1 ? LutEntry{OP_I, 1, 0, 0}
                                         : LutEntry{OP_I, 1, 0, 2};
                            else if (trace == 0)
                                r = {OP_M, 1, 1, 0};
                            else if (trace == 1 || trace == 3)
                                r = t2b0 ? LutEntry{OP_D, 0, 1, 0}
                                         : LutEntry{OP_D, 0, 1, 1};
                            else  // trace == 2
                                r = t2b1 ? LutEntry{OP_I, 1, 0, 0}
                                         : LutEntry{OP_I, 1, 0, 2};
                        } else {
                            if (table == 2)       // R table
                                r = t2b0 ? LutEntry{OP_I, 1, 0, 0}
                                         : LutEntry{OP_I, 1, 0, 2};
                            else if (table == 1)  // C table
                                r = t2b1 ? LutEntry{OP_D, 0, 1, 0}
                                         : LutEntry{OP_D, 0, 1, 1};
                            else if (trace == 0)
                                r = {OP_M, 1, 1, 0};
                            else if (trace == 1 || trace == 3)
                                r = t2b0 ? LutEntry{OP_I, 1, 0, 0}
                                         : LutEntry{OP_I, 1, 0, 2};
                            else  // trace == 2
                                r = t2b1 ? LutEntry{OP_D, 0, 1, 0}
                                         : LutEntry{OP_D, 0, 1, 1};
                        }
                        lut[right][(trace << 4) | (trace2 << 2) | table] = r;
                    }
    }
};

inline const OpLut& op_lut() {
    static const OpLut lut;
    return lut;
}

// Compressed per-strip trace words + the rectangle list needed to index them
// (Trace, scan_block.rs:1726-1850).
struct Trace {
    std::vector<int32_t> trace, trace2;
    std::vector<uint64_t> right;
    std::vector<uint32_t> block_start;  // 2 per block (i, j)
    std::vector<uint16_t> block_size;   // 2 per block (height, width)
    size_t trace_idx = 0, block_idx = 0;
    size_t ckpt_trace_idx = 0, ckpt_block_idx = 0;
    size_t query_len = 0, reference_len = 0;
    bool overflow = false;

    void clear(size_t qlen, size_t rlen, size_t max_size) {
        size_t len = qlen + rlen;
        size_t tcap = (max_size / L) * (len + max_size * 2) + 64;
        size_t bcap = 2 * len + 256;
        if (trace.size() < tcap) { trace.resize(tcap); trace2.resize(tcap); }
        if (block_start.size() < bcap) {
            block_start.resize(bcap);
            block_size.resize(bcap);
        }
        right.assign((bcap / 2 + 63) / 64, 0);
        trace_idx = block_idx = ckpt_trace_idx = ckpt_block_idx = 0;
        query_len = qlen;
        reference_len = rlen;
        overflow = false;
    }
    inline void add(int32_t t, int32_t t2) {
        if (trace_idx >= trace.size()) { overflow = true; return; }
        trace[trace_idx] = t;
        trace2[trace_idx] = t2;
        trace_idx++;
    }
    inline void add_block(size_t i, size_t j, size_t width, size_t height,
                          bool is_right) {
        if (block_idx * 2 + 1 >= block_start.size()) { overflow = true; return; }
        block_start[block_idx * 2] = (uint32_t)i;
        block_start[block_idx * 2 + 1] = (uint32_t)j;
        block_size[block_idx * 2] = (uint16_t)height;
        block_size[block_idx * 2 + 1] = (uint16_t)width;
        uint64_t& w = right[block_idx / 64];
        uint64_t b = 1ull << (block_idx % 64);
        w = (w & ~b) | (is_right ? b : 0);
        block_idx++;
    }
    inline void save_ckpt() {
        ckpt_trace_idx = trace_idx;
        ckpt_block_idx = block_idx;
    }
    inline void restore_ckpt() {
        trace_idx = ckpt_trace_idx;
        block_idx = ckpt_block_idx;
    }

    // Walk the stored trace from DP cell (i, j) back to (0, 0)
    // (cigar_core, scan_block.rs:1845-2010). Returns false on any
    // inconsistency (treated as block-align failure by the caller).
    bool cigar(size_t i, size_t j, Cigar& out) const {
        if (overflow || i > query_len || j > reference_len) return false;
        out.clear();
        const OpLut& LUT = op_lut();
        size_t bidx = block_idx, tidx = trace_idx;
        int table = 0;
        while (i > 0 || j > 0) {
            size_t bi, bj, bw, bh;
            int r = 0;
            for (;;) {
                if (bidx == 0) return false;
                bidx--;
                bi = block_start[bidx * 2];
                bj = block_start[bidx * 2 + 1];
                bh = block_size[bidx * 2];
                bw = block_size[bidx * 2 + 1];
                size_t cells = bw * bh / L;
                if (tidx < cells) return false;
                tidx -= cells;
                if (i >= bi && j >= bj) {
                    r = (int)((right[bidx / 64] >> (bidx % 64)) & 1);
                    break;
                }
            }
            if (r) {
                while (i >= bi && j >= bj && (i > 0 || j > 0)) {
                    size_t ci = i - bi, cj = j - bj;
                    size_t idx = tidx + ci / L + cj * (bh / L);
                    int t = (trace[idx] >> ((ci % L) * 2)) & 3;
                    int t2 = (trace2[idx] >> ((ci % L) * 2)) & 3;
                    const LutEntry& e = LUT.lut[1][(t << 4) | (t2 << 2) | table];
                    if (e.di > i || e.dj > j) return false;
                    i -= e.di;
                    j -= e.dj;
                    table = e.table;
                    out.add(e.op);
                }
            } else {
                while (i >= bi && j >= bj && (i > 0 || j > 0)) {
                    size_t ci = i - bi, cj = j - bj;
                    size_t idx = tidx + cj / L + ci * (bw / L);
                    int t = (trace[idx] >> ((cj % L) * 2)) & 3;
                    int t2 = (trace2[idx] >> ((cj % L) * 2)) & 3;
                    const LutEntry& e = LUT.lut[0][(t << 4) | (t2 << 2) | table];
                    if (e.di > i || e.dj > j) return false;
                    i -= e.di;
                    j -= e.dj;
                    table = e.table;
                    out.add(e.op);
                }
            }
        }
        return true;
    }
};

struct AlignResult {
    int32_t score;
    size_t query_idx;
    size_t reference_idx;
};

// Aligned i16 border buffer with vector get/set (Aligned, scan_block.rs).
struct Border {
    std::vector<int16_t> d;
    void ensure(size_t n) {
        if (d.size() < n) d.resize(n);
    }
    void clear(size_t n) {
        ensure(n);
        std::fill(d.begin(), d.begin() + n, VMIN);
    }
    inline V load(size_t i) const { return loadu(d.data() + i); }
    inline void store(size_t i, const V& v) { storeu(d.data() + i, v); }
    inline int16_t* ptr(size_t i) { return d.data() + i; }
    inline const int16_t* ptr(size_t i) const { return d.data() + i; }
};

enum class Dir { Right, Down, Grow };

// 3Di + AA dual-alphabet block aligner with trace + x-drop — the one
// configuration the reference uses (Block::<true, true>::align_3di).
struct Aligner {
    Border D_col, C_col, D_row, R_row;
    Border D_col_ck, C_col_ck, D_row_ck, R_row_ck;
    Border temp1, temp2;
    Trace trace;
    AlignResult res{};

    struct SeqPair {
        const PaddedSeq* aa;
        const PaddedSeq* di;
        const PaddedBias* bias;
        size_t len() const { return aa->len; }
    };

    // Compute one rectangular region of the DP (place_block_3di,
    // scan_block.rs:1296-1442). "query"/"reference" are the strip axis and
    // the column axis respectively; right/down blocks swap them.
    // D_colB/C_colB hold the strip-axis border (height entries),
    // D_rowB/R_rowB receive the column-axis border (width entries).
    struct PlaceResult {
        V D_max, D_argmax_i, D_argmax_j;
    };
    PlaceResult place_block(const SeqPair& q, const SeqPair& r,
                            const Mat27& mat_aa, const Mat27& mat_3di,
                            int16_t gap_open, int16_t gap_extend,
                            size_t start_i, size_t start_j, size_t width,
                            size_t height, int16_t* D_colp, int16_t* C_colp,
                            int16_t* D_rowp, int16_t* R_rowp, V D_corner) {
        PlaceResult pr{set1(VMIN), set1(0), set1(0)};
        if (width == 0 || height == 0) return pr;
        V go = set1(gap_open), ge = set1(gap_extend);
        ScanConsts sc = scan_consts(gap_extend);
        V go_minus_ge = subs(go, ge);
        for (size_t j = 0; j < width; j++) {
            V R01 = set1(VMIN), D11 = set1(VMIN), R11 = set1(VMIN);
            V prev_trace_R = set1(0);
            uint8_t c = r.aa->s[start_j + j];
            uint8_t c3 = r.di->s[start_j + j];
            V rbias = set1(r.bias->b[start_j + j]);
            const int8_t* row_aa = mat_aa.row(c);
            const int8_t* row_3di = mat_3di.row(c3);
            for (size_t i = 0; i < height; i += L) {
                V D10 = loadu(D_colp + i);
                V C10 = loadu(C_colp + i);
                V D00 = sl1(D10, D_corner);
                D_corner = D10;

                V scores = score_vec(row_aa, row_3di,
                                     q.aa->s.data() + start_i + i,
                                     q.di->s.data() + start_i + i,
                                     q.bias->b.data() + start_i + i, rbias);
                D11 = adds(D00, scores);
                if (start_i + i == 0 && start_j + j == 0)
                    D11 = set_lane0(D11, ZERO_OFF);

                V C11_open = adds(D10, go);
                V C11 = vmax(adds(C10, ge), C11_open);
                D11 = vmax(D11, C11);

                V D11_open = adds(D11, go_minus_ge);
                R11 = prefix_scan(D11_open, gap_extend, sc);
                R11 = vmax(R11, adds(broadcasthi(R01), sc.extend_all));
                D11 = vmax(D11, R11);
                R01 = R11;

                int32_t t1, t2;
                trace_words(D11, C11, R11, C11_open, D11_open, prev_trace_R,
                            t1, t2);
                trace.add(t1, t2);

                argmax_update(pr.D_max, pr.D_argmax_i, pr.D_argmax_j, D11,
                              (int16_t)i, (int16_t)j);

                storeu(D_colp + i, D11);
                storeu(C_colp + i, C11);
            }
            D_corner = set1(VMIN);
            D_rowp[j] = lane15(D11);
            R_rowp[j] = lane15(R11);
        }
        return pr;
    }

    static void just_offset(size_t block_size, Border& b1, Border& b2,
                            const V& off_add) {
        for (size_t i = 0; i < block_size; i += L) {
            b1.store(i, adds(b1.load(i), off_add));
            b2.store(i, adds(b2.load(i), off_add));
        }
    }

    // Shift a border left by STEP and append temp values at the tail; the
    // value shifted past the corner is returned (shift_and_offset).
    static V shift_and_offset(size_t block_size, Border& b1, Border& b2,
                              Border& t1, Border& t2, const V& off_add) {
        V curr1 = adds(b1.load(0), off_add);
        int16_t c7[L];
        store_arr(c7, curr1);
        V corner = set1(c7[STEP - 1]);
        V curr2 = adds(b2.load(0), off_add);
        size_t i = 0;
        for (; i + L < block_size; i += L) {
            V next1 = adds(b1.load(i + L), off_add);
            V next2 = adds(b2.load(i + L), off_add);
            b1.store(i, step8(next1, curr1));
            b2.store(i, step8(next2, curr2));
            curr1 = next1;
            curr2 = next2;
        }
        b1.store(block_size - L, step8(t1.load(0), curr1));
        b2.store(block_size - L, step8(t2.load(0), curr2));
        return corner;
    }

    void copy_ckpt_from_live(size_t block_size) {
        for (size_t i = 0; i < block_size; i += L) {
            D_col_ck.store(i, D_col.load(i));
            C_col_ck.store(i, C_col.load(i));
            D_row_ck.store(i, D_row.load(i));
            R_row_ck.store(i, R_row.load(i));
        }
    }
    void copy_live_from_ckpt(size_t block_size) {
        for (size_t i = 0; i < block_size; i += L) {
            D_col.store(i, D_col_ck.load(i));
            C_col.store(i, C_col_ck.load(i));
            D_row.store(i, D_row_ck.load(i));
            R_row.store(i, R_row_ck.load(i));
        }
    }

    // align_core (scan_block.rs:120-690) for TRACE = true, X_DROP = true.
    void align_3di(const PaddedSeq& q_aa, const PaddedSeq& q_3di,
                   const PaddedBias& q_bias, const PaddedSeq& r_aa,
                   const PaddedSeq& r_3di, const PaddedBias& r_bias,
                   const Mat27& mat_aa, const Mat27& mat_3di, int16_t gap_open,
                   int16_t gap_extend, size_t min_size, size_t max_size,
                   int32_t x_drop) {
        if (min_size < (size_t)L) min_size = L;
        if (max_size < (size_t)L) max_size = L;
        SeqPair q{&q_aa, &q_3di, &q_bias};
        SeqPair r{&r_aa, &r_3di, &r_bias};
        size_t qlen = q.len(), rlen = r.len();
        trace.clear(qlen, rlen, max_size);
        D_col.clear(max_size);
        C_col.clear(max_size);
        D_row.clear(max_size);
        R_row.clear(max_size);
        D_col_ck.clear(max_size);
        C_col_ck.clear(max_size);
        D_row_ck.clear(max_size);
        R_row_ck.clear(max_size);
        temp1.clear(L);
        temp2.clear(L);

        int32_t best_max = 0;
        size_t best_argmax_i = 0, best_argmax_j = 0;
        Dir prev_dir = Dir::Grow, dir = Dir::Grow;
        size_t prev_size = 0, block_size = min_size;
        int32_t off = 0, prev_off, off_max = 0;
        size_t y_drop_iter = 0;
        int x_drop_iter = 0;
        size_t si = 0, sj = 0;  // state.i, state.j
        size_t i_ckpt = 0, j_ckpt = 0;
        int32_t off_ckpt = 0;
        V D_corner = set1(VMIN);

        for (;;) {
            prev_off = off;
            V grow_D_max = set1(VMIN), grow_argmax_i = set1(0),
              grow_argmax_j = set1(0);
            PlaceResult pb{};
            int16_t right_max, down_max;
            if (dir == Dir::Right) {
                off = off_max;
                V off_add = set1(sat16(prev_off - off));
                trace.add_block(si, sj + block_size - STEP, STEP, block_size,
                                true);
                just_offset(block_size, D_col, C_col, off_add);
                pb = place_block(
                    q, r, mat_aa, mat_3di, gap_open, gap_extend, si,
                    sj + block_size - STEP, STEP, block_size, D_col.ptr(0),
                    C_col.ptr(0), temp1.ptr(0), temp2.ptr(0),
                    prev_dir == Dir::Down ? adds(D_corner, off_add)
                                          : set1(VMIN));
                right_max = prefix_hmax_step(D_col.load(0));
                D_corner = shift_and_offset(block_size, D_row, R_row, temp1,
                                            temp2, off_add);
                down_max = prefix_hmax_step(D_row.load(0));
            } else if (dir == Dir::Down) {
                off = off_max;
                V off_add = set1(sat16(prev_off - off));
                trace.add_block(si + block_size - STEP, sj, block_size, STEP,
                                false);
                just_offset(block_size, D_row, R_row, off_add);
                pb = place_block(
                    r, q, mat_aa, mat_3di, gap_open, gap_extend, sj,
                    si + block_size - STEP, STEP, block_size, D_row.ptr(0),
                    R_row.ptr(0), temp1.ptr(0), temp2.ptr(0),
                    prev_dir == Dir::Right ? adds(D_corner, off_add)
                                           : set1(VMIN));
                down_max = prefix_hmax_step(D_row.load(0));
                D_corner = shift_and_offset(block_size, D_col, C_col, temp1,
                                            temp2, off_add);
                right_max = prefix_hmax_step(D_col.load(0));
            } else {  // Grow
                D_corner = set1(VMIN);
                size_t grow_step = block_size - prev_size;
                trace.add_block(si + prev_size, sj, prev_size, grow_step,
                                false);
                PlaceResult down_pb = place_block(
                    r, q, mat_aa, mat_3di, gap_open, gap_extend, sj,
                    si + prev_size, grow_step, prev_size, D_row.ptr(0),
                    R_row.ptr(0), D_col.ptr(prev_size), C_col.ptr(prev_size),
                    set1(VMIN));
                trace.add_block(si, sj + prev_size, grow_step, block_size,
                                true);
                pb = place_block(q, r, mat_aa, mat_3di, gap_open, gap_extend,
                                 si, sj + prev_size, grow_step, block_size,
                                 D_col.ptr(0), C_col.ptr(0),
                                 D_row.ptr(prev_size), R_row.ptr(prev_size),
                                 set1(VMIN));
                right_max = prefix_hmax_step(D_col.load(0));
                down_max = prefix_hmax_step(D_row.load(0));
                grow_D_max = down_pb.D_max;
                grow_argmax_i = down_pb.D_argmax_i;
                grow_argmax_j = down_pb.D_argmax_j;
                copy_ckpt_from_live(block_size);
                trace.save_ckpt();
            }
            if (trace.overflow) {  // capacity breach: fail hard, never UB
                res = {INT32_MIN, 0, 0};
                return;
            }

            prev_dir = dir;
            int16_t D_max_max = hmax(pb.D_max);
            int16_t grow_max = hmax(grow_D_max);
            int16_t mx = D_max_max > grow_max ? D_max_max : grow_max;
            off_max = off + (int32_t)mx - ZERO_OFF;

            y_drop_iter++;
            bool grow_no_max = dir == Dir::Grow;

            if (off_max > best_max) {
                size_t best_i = 0, best_j = 0;
                bool grow_part = dir == Dir::Grow && D_max_max < grow_max;
                int16_t cd_max[L], cai[L], caj[L];
                store_arr(cd_max, grow_part ? grow_D_max : pb.D_max);
                store_arr(cai, grow_part ? grow_argmax_i : pb.D_argmax_i);
                store_arr(caj, grow_part ? grow_argmax_j : pb.D_argmax_j);
                int16_t curr_max = grow_part ? grow_max : D_max_max;
                for (int l = 0; l < L; l++) {
                    if (cd_max[l] != curr_max) continue;
                    size_t idx_i = (size_t)(uint16_t)cai[l];
                    size_t idx_j = (size_t)(uint16_t)caj[l];
                    size_t gi, gj;
                    if (grow_part) {
                        gi = si + prev_size + idx_j;
                        gj = sj + idx_i + l;
                    } else if (dir == Dir::Right) {
                        gi = si + idx_i + l;
                        gj = sj + (block_size - STEP) + idx_j;
                    } else if (dir == Dir::Down) {
                        gi = si + (block_size - STEP) + idx_j;
                        gj = sj + idx_i + l;
                    } else {  // Grow, right part
                        gi = si + idx_i + l;
                        gj = sj + prev_size + idx_j;
                    }
                    if (gj > best_j || (gj == best_j && gi > best_i)) {
                        best_i = gi;
                        best_j = gj;
                    }
                }
                best_argmax_i = best_i;
                best_argmax_j = best_j;

                if (block_size < max_size) {
                    i_ckpt = si;
                    j_ckpt = sj;
                    off_ckpt = off;
                    copy_ckpt_from_live(block_size);
                    trace.save_ckpt();
                    grow_no_max = false;
                }
                best_max = off_max;
                y_drop_iter = 0;
            }

            if (off_max < best_max - x_drop) {
                if (x_drop_iter < X_DROP_ITER - 1) {
                    x_drop_iter++;
                } else {
                    break;  // x-drop termination
                }
            } else {
                x_drop_iter = 0;
            }

            if (si + block_size > qlen && sj + block_size > rlen) break;

            if (sj + block_size > rlen) {
                si += STEP;
                dir = Dir::Down;
                continue;
            }
            if (si + block_size > qlen) {
                sj += STEP;
                dir = Dir::Right;
                continue;
            }

            size_t next_size = block_size * 2;
            if (next_size <= max_size) {
                if (y_drop_iter > (block_size / STEP) - 1 || grow_no_max) {
                    prev_size = block_size;
                    block_size = next_size;
                    dir = Dir::Grow;
                    si = i_ckpt;
                    sj = j_ckpt;
                    off = off_ckpt;
                    copy_live_from_ckpt(prev_size);
                    trace.restore_ckpt();
                    y_drop_iter = 0;
                    continue;
                }
            }

            if (block_size > min_size && y_drop_iter == 0) {  // shrink
                int16_t sm_row = suffix_hmax(D_row.load(block_size - L));
                int16_t sm_col = suffix_hmax(D_col.load(block_size - L));
                int16_t shrink_max = sm_row > sm_col ? sm_row : sm_col;
                if (shrink_max >= mx) {
                    prev_dir = Dir::Grow;  // don't reuse D_corner
                    block_size /= 2;
                    for (size_t i = 0; i < block_size; i += L) {
                        D_col.store(i, D_col.load(i + block_size));
                        C_col.store(i, C_col.load(i + block_size));
                        D_row.store(i, D_row.load(i + block_size));
                        R_row.store(i, R_row.load(i + block_size));
                    }
                    si += block_size;
                    sj += block_size;
                    i_ckpt = si;
                    j_ckpt = sj;
                    off_ckpt = off;
                    copy_ckpt_from_live(block_size);
                    right_max = prefix_hmax_step(D_col.load(0));
                    down_max = prefix_hmax_step(D_row.load(0));
                    trace.save_ckpt();
                    y_drop_iter = 0;
                }
            }

            if (down_max > right_max) {
                si += STEP;
                dir = Dir::Down;
            } else {
                sj += STEP;
                dir = Dir::Right;
            }
        }

        res = {best_max, best_argmax_i, best_argmax_j};
    }
};

// Driver mirroring alignStartPosBacktraceBlock's exponential block-size
// search (StructureSmithWaterman.cpp:369-527): reversed, cropped sequences
// in, backtrace out. Sequences are numeric letter indices; bias is the
// i16 sum of the AA + 3Di composition biases per (reversed) query position.
// Returns true when the block search reproduced target_score; `ops` then
// holds the FORWARD-order backtrace ('M'/'I'/'D'), with q/t start offsets
// and the identical-AA count. On false the caller must reproduce the
// reference's failure row (score1 = UINT32_MAX path).
struct BlockDriver {
    Aligner aligner;
    PaddedSeq q_aa, q_3di, t_aa, t_3di;
    PaddedBias q_bias, t_bias;
    Cigar cig;

    static constexpr size_t MAX_SIZE = 4096;  // reference MAX_SIZE (TODO in C++)

    bool align(const uint8_t* q_aa_rev, const uint8_t* q_3di_rev,
               const int16_t* q_bias_rev, size_t q_aln_len,
               const uint8_t* t_aa_rev, const uint8_t* t_3di_rev,
               size_t t_aln_len, const Mat27& mat_aa, const Mat27& mat_3di,
               int gap_open_pos, int gap_extend_pos, int32_t target_score,
               std::string& ops, int32_t* q_consumed, int32_t* t_consumed,
               uint32_t* aa_ids) {
        int16_t go = (int16_t)(-gap_open_pos);
        int16_t ge = (int16_t)(-gap_extend_pos);
        q_aa.set(q_aa_rev, q_aln_len, MAX_SIZE);
        q_3di.set(q_3di_rev, q_aln_len, MAX_SIZE);
        q_bias.set(q_bias_rev, q_aln_len, MAX_SIZE);
        t_aa.set(t_aa_rev, t_aln_len, MAX_SIZE);
        t_3di.set(t_3di_rev, t_aln_len, MAX_SIZE);
        t_bias.zeros(t_aln_len, MAX_SIZE);

        AlignResult res{-1000000000, (size_t)-1, (size_t)-1};
        size_t min_size = 32;
        while (min_size <= MAX_SIZE && res.score < target_score) {
            int32_t x_drop = -((int32_t)min_size * ge + go);
            aligner.align_3di(q_aa, q_3di, q_bias, t_aa, t_3di, t_bias,
                              mat_aa, mat_3di, go, ge, min_size, MAX_SIZE,
                              x_drop);
            res = aligner.res;
            min_size *= 2;
        }
        if (res.score != target_score
            && !(target_score == INT16_MAX && res.score >= target_score))
            return false;
        if (!aligner.trace.cigar(res.query_idx, res.reference_idx, cig))
            return false;

        // cigar is over the REVERSED sequences in start->end order; the
        // forward backtrace is its reverse (SSW.cpp:489-517)
        size_t qpos = 0, tpos = 0;
        uint32_t ids = 0;
        std::string rev_ops;
        for (size_t k = 0; k < cig.size(); k++) {
            OpLen o = cig.get(k);
            if (o.op == OP_M) {
                for (uint32_t x = 0; x < o.len; x++)
                    ids += q_aa_rev[qpos + x] == t_aa_rev[tpos + x];
                qpos += o.len;
                tpos += o.len;
                rev_ops.append(o.len, 'M');
            } else if (o.op == OP_I) {
                qpos += o.len;
                rev_ops.append(o.len, 'I');
            } else if (o.op == OP_D) {
                tpos += o.len;
                rev_ops.append(o.len, 'D');
            }
        }
        ops.assign(rev_ops.rbegin(), rev_ops.rend());
        *q_consumed = (int32_t)qpos;
        *t_consumed = (int32_t)tpos;
        *aa_ids = ids;
        return true;
    }
};

}  // namespace ba
