// foldseek-tpu native host library.
//
// The TPU owns the all-pairs scoring kernels; this library owns the
// host-side per-hit work the reference implements in C++/Rust — alignment
// start recovery (reverse Smith-Waterman), banded traceback, and the
// iterative TM-score search — exposed through a plain C ABI for ctypes.
//
// Semantics mirror the Python implementations in foldseek_tpu/ops (which in
// turn mirror the reference: src/commons/StructureSmithWaterman.cpp
// alignStartPosBacktrace/banded_sw, src/commons/TMaligner.cpp
// computeAppoximateTMscore, lib/tmalign/TMalign.cpp TMscore8_search_standard).
// Double precision throughout the TM path matches the numpy float64 math.

#include <cstdint>
#include <ctime>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <string>
#include <vector>
#if defined(__AVX2__)
#include <immintrin.h>
#endif

#include "block_aligner.hpp"
#include "tm_ref.hpp"

extern "C" {

// section-time accumulators for the LoLalign hot path (perf diagnosis
// only; zero overhead unless read): 0=global fwbw, 1=seed selection,
// 2=block rescoring, 3=gap fwbw, 4=anchor qualify, 5=final selection,
// 6=recover reverse pass, 7=recover banded traceback
static thread_local double lol_prof[8] = {0};
extern "C" void lol_prof_reset() { for (int i = 0; i < 8; i++) lol_prof[i] = 0; }
extern "C" void lol_prof_get(double* out) {
    for (int i = 0; i < 8; i++) out[i] = lol_prof[i];
}
static inline double lol_now() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}


// ---------------------------------------------------------------------------
// reverse Smith-Waterman with early termination (start-position recovery)
// prof_*: [21 * lq] combined int32 profiles (row = target letter)
// returns 0 on success; out = {best_score, q_read_pos, t_ref_pos}
int reverse_sw(const int32_t* prof_aa, const int32_t* prof_ss, int lq,
               const int8_t* t_aa, const int8_t* t_ss, int lt,
               int gap_open, int gap_extend, int terminate,
               int64_t* out) {
    std::vector<int64_t> H(lq, 0), E(lq, INT64_MIN / 4), g(lq), F(lq);
    int64_t best = 0;
    int best_j = 0, best_qend = lq - 1;
    for (int j = lt - 1; j >= 0; j--) {
        const int32_t* pa = prof_aa + (size_t)t_aa[j] * lq;
        const int32_t* ps = prof_ss + (size_t)t_ss[j] * lq;
        // h_noF = max(diag + s, E, 0); diag = H shifted
        int64_t prev_diag = 0;
        int64_t running = INT64_MIN / 4;  // prefix max of h_noF[k] + k*ge
        int64_t col_max = 0;
        int col_arg = 0;
        for (int i = 0; i < lq; i++) {
            int64_t diag = prev_diag + pa[i] + ps[i];
            prev_diag = H[i];
            int64_t h_noF = std::max(std::max(diag, E[i]), (int64_t)0);
            // F from prefix of previous h_noF values
            int64_t f = (i == 0) ? INT64_MIN / 4
                                 : running - (int64_t)(i - 1) * gap_extend - gap_open;
            int64_t h = std::max(h_noF, f);
            E[i] = std::max(E[i] - gap_extend, h_noF - gap_open);
            int64_t gv = h_noF + (int64_t)i * gap_extend;
            if (gv > running) running = gv;
            H[i] = h;
            if (h > col_max) { col_max = h; col_arg = i; }
            else if (h == col_max && col_max > 0 && false) {}
        }
        // first index reaching col max (argmax of H == col_max)
        if (col_max > best) {
            best = col_max;
            best_j = j;
            for (int i = 0; i < lq; i++) {
                if (H[i] == col_max) { best_qend = i; break; }
            }
        }
        if (terminate && col_max == terminate) break;
    }
    out[0] = best;
    out[1] = best_qend;
    out[2] = best_j;
    return 0;
}

// ---------------------------------------------------------------------------
// Banded affine traceback over an already-scored alignment window.
// DERIVATION NOTE: the recurrence and its 5-state direction encoding
// (1=diag, 2/3=query-gap extend/open, 4/5=target-gap extend/open) are
// forced cell for cell by bit parity with the reference's
// StructureSmithWaterman::banded_sw (StructureSmithWaterman.h:345-354) —
// the emitted M/I/D string must be identical including every tie (open
// vs extend preferences, band edge clamps), so the DP order and the
// Gotoh-state comparisons are necessarily the same algorithm. What is
// NOT the reference's: the band-ring coordinate mapping was re-derived
// (band_col below), state lives in three thread-local row rings
// (row_prev_h / row_prev_e / row_cur_h), and the substitution scores are
// gathered per band row on the fly so callers need not materialize the
// full [qL x tL] rectangle the reference precomputes.
// Either `sub` ([qL * tL] dense int32 region scores) or the profile rows
// (pa_rows/ps_rows [letters x Lq] + target letters, region origin qs) must
// be provided; ops_out must hold qL+tL chars.
// Returns backtrace length, or -1 on failure.
static int banded_sw_bt_core(const int32_t* sub,
                             const int32_t* pa_rows, const int32_t* ps_rows,
                             int Lq, int qs,
                             const int8_t* taa, const int8_t* tss,
                             int qL, int tL, int score,
                             int gap_open, int gap_extend, char* ops_out) {
    int band_width = std::abs(tL - qL) + 1;
    const int go = gap_open, ge = gap_extend;
    static thread_local std::vector<int8_t> direction;
    static thread_local std::vector<int32_t> row_s;
    // int32 state: h >= 0 always (clamped Gotoh), e/f >= -gap_open, and
    // every value is bounded by the target score (< 2^20) — int64 was
    // 2x the ring traffic for no range benefit
    static thread_local std::vector<int32_t> row_prev_h, row_prev_e, row_cur_h;
    int width_d = 0;
    for (;;) {
        int w = band_width;
        int width = w * 2 + 3;
        width_d = w * 2 + 1;
        row_prev_h.assign(width, 0);
        row_prev_e.assign(width, 0);
        row_cur_h.assign(width, 0);
        direction.assign((size_t)qL * width_d * 3, 0);
        if ((int)row_s.size() < tL) row_s.resize(tL);
        int32_t max_score = 0;

        auto band_col = [w](int i, int j) {
            int x = i - w;
            if (x < 0) x = 0;
            return j - x + 1;
        };

        for (int i = 0; i < qL; i++) {
            int beg = std::max(0, i - w);
            int end = std::min(tL - 1, i + w);
            int edge = std::min(end + 1, width - 1);
            int32_t f = 0;
            row_prev_h[0] = row_prev_e[0] = row_prev_h[edge] = row_prev_e[edge] = row_cur_h[0] = 0;
            int8_t* dline = direction.data() + (size_t)i * width_d * 3;
            const int32_t* row_sub;
            if (sub != nullptr) {
                row_sub = sub + (size_t)i * tL;
            } else {
                // band-only gather from the profile rows (the dense fill
                // was O(qL * tL) for an O(qL * band) traceback)
                for (int j = beg; j <= end; j++)
                    row_s[j] = pa_rows[(size_t)taa[j] * Lq + qs + i]
                             + ps_rows[(size_t)tss[j] * Lq + qs + i];
                row_sub = row_s.data();
            }
            for (int j = beg; j <= end; j++) {
                int u = band_col(i, j);
                int e_coord = band_col(i - 1, j);
                int b_coord = band_col(i, j - 1);
                int d_coord = band_col(i - 1, j - 1);
                int du = (j - std::max(0, i - w)) * 3;

                int32_t temp1, temp2, e_val;
                if (i == 0) { temp1 = -go; temp2 = -ge; }
                else { temp1 = row_prev_h[e_coord] - go; temp2 = row_prev_e[e_coord] - ge; }
                if (temp1 > temp2) { e_val = temp1; dline[du + 0] = 3; }
                else { e_val = temp2; dline[du + 0] = 2; }

                temp1 = row_cur_h[b_coord] - go;
                temp2 = f - ge;
                if (temp1 > temp2) { f = temp1; dline[du + 1] = 5; }
                else { f = temp2; dline[du + 1] = 4; }

                int32_t e1 = e_val > 0 ? e_val : 0;
                int32_t f1 = f > 0 ? f : 0;
                temp1 = e1 > f1 ? e1 : f1;
                temp2 = row_prev_h[d_coord] + row_sub[j];
                int32_t h = temp1 > temp2 ? temp1 : temp2;
                if (h > max_score) max_score = h;
                if (temp1 <= temp2) dline[du + 2] = 1;
                else dline[du + 2] = (e1 > f1) ? dline[du + 0] : dline[du + 1];
                row_prev_e[u] = e_val;
                row_cur_h[u] = h;
            }
            int u = band_col(i, end);
            for (int k = 1; k <= u; k++) row_prev_h[k] = row_cur_h[k];
        }
        if (max_score >= score) break;
        band_width *= 2;
        if (band_width > 2 * (qL + tL)) return -1;
    }

    int i = qL - 1, j = tL - 1;
    int state = 2;
    int n = 0;
    while (i > 0 || j > 0) {
        int du = (j - std::max(0, i - band_width)) * 3;
        int8_t d = direction[(size_t)i * width_d * 3 + du +
                             (state == 0 ? 0 : (state == 1 ? 1 : 2))];
        switch (d) {
            case 1: i--; j--; state = 2; ops_out[n++] = 'M'; break;
            case 2: i--; state = 0; ops_out[n++] = 'I'; break;
            case 3: i--; state = 2; ops_out[n++] = 'I'; break;
            case 4: j--; state = 1; ops_out[n++] = 'D'; break;
            case 5: j--; state = 2; ops_out[n++] = 'D'; break;
            default: return -1;
        }
    }
    ops_out[n++] = 'M';
    std::reverse(ops_out, ops_out + n);
    return n;
}

int banded_sw_bt(const int32_t* sub, int qL, int tL, int score,
                 int gap_open, int gap_extend, char* ops_out) {
    return banded_sw_bt_core(sub, nullptr, nullptr, 0, 0, nullptr, nullptr,
                             qL, tL, score, gap_open, gap_extend, ops_out);
}

// ---------------------------------------------------------------------------
// full posting-match -> candidate pipeline for one k-mer prefilter query
// (QueryMatcher::matchQuery analogue): binary-search each similar k-mer in
// the sorted posting ids, walk its posting list in arrival order, stable
// counting-sort matches by target, detect double-diagonal candidates
// (zeroed duplicateBitArray semantics), Kadane-rescore each candidate on
// its diagonal, and keep the best (capped) count per target (first max on
// ties). Replaces four numpy passes + two ctypes calls with one call and
// int32/uint16 scratch. out_* must hold n_targets entries; returns m.
int posting_candidates(
        const int64_t* post_ids, int64_t n_ids, const int64_t* post_off,
        const int64_t* post_tid, const int64_t* post_pos,
        const int64_t* K, const int64_t* P, int64_t nk, int64_t n_targets,
        const int32_t* prof, int lq,
        const int8_t* seqs_flat, const int64_t* seq_off,
        const int32_t* seq_len,
        int64_t* out_tid, int32_t* out_count, int64_t* out_d16) {
    // 1) gather matches (arrival order)
    int64_t total = 0;
    std::vector<int64_t> loc(nk, -1);
    for (int64_t i = 0; i < nk; i++) {
        int64_t lo = 0, hi = n_ids;
        while (lo < hi) {
            int64_t mid = (lo + hi) >> 1;
            if (post_ids[mid] < K[i]) lo = mid + 1; else hi = mid;
        }
        if (lo < n_ids && post_ids[lo] == K[i]) {
            loc[i] = lo;
            total += post_off[lo + 1] - post_off[lo];
        }
    }
    std::vector<int32_t> mtid(total);
    std::vector<uint16_t> md16(total);
    int64_t w = 0;
    for (int64_t i = 0; i < nk; i++) {
        if (loc[i] < 0) continue;
        for (int64_t p = post_off[loc[i]]; p < post_off[loc[i] + 1]; p++) {
            mtid[w] = (int32_t)post_tid[p];
            md16[w] = (uint16_t)((P[i] - post_pos[p]) & 0xFFFF);
            w++;
        }
    }
    // 2) stable counting sort by target
    std::vector<int64_t> counts(n_targets + 1, 0);
    for (int64_t i = 0; i < total; i++) counts[mtid[i] + 1]++;
    for (int64_t t = 0; t < n_targets; t++) counts[t + 1] += counts[t];
    std::vector<int64_t> pos(counts.begin(), counts.end() - 1);
    std::vector<uint16_t> sd16(total);
    for (int64_t i = 0; i < total; i++) sd16[pos[mtid[i]]++] = md16[i];
    // 3) per-target dup detection + Kadane rescore + best-count keep
    int64_t m = 0;
    for (int64_t t = 0; t < n_targets; t++) {
        int64_t i = counts[t], end = counts[t + 1];
        if (i >= end) continue;
        uint8_t prev = 0;
        int best_count = -1;
        int64_t best_d16 = 0;
        int64_t last_kept_d8 = -1;
        const int8_t* t_seq = seqs_flat + seq_off[t];
        const int lt = seq_len[t];
        for (; i < end; i++) {
            uint8_t d8 = (uint8_t)(sd16[i] & 0xFF);
            if (d8 == prev && last_kept_d8 != (int64_t)d8) {
                last_kept_d8 = d8;
                // Kadane on this diagonal
                int d = sd16[i] >= 32768 ? (int)sd16[i] - 65536 : (int)sd16[i];
                int64_t best = 0, cur = 0;
                const int32_t* qrow;
                const int8_t* ts;
                int len = 0;
                if (d >= 0) {
                    if (d < lq) {
                        len = std::min(lt, lq - d);
                        qrow = prof + (size_t)d * 21;
                        ts = t_seq;
                    }
                } else if (-d < lt) {
                    len = std::min(lt + d, lq);
                    qrow = prof;
                    ts = t_seq - d;
                }
                for (int j = 0; j < len; j++) {
                    cur += qrow[(size_t)j * 21 + ts[j]];
                    if (cur < 0) cur = 0;
                    if (cur > best) best = cur;
                }
                int count = (int)std::min<int64_t>(255, best);
                if (count > best_count) {
                    best_count = count;
                    best_d16 = sd16[i];
                }
            }
            prev = d8;
        }
        if (best_count >= 0) {
            out_tid[m] = t;
            out_count[m] = best_count;
            out_d16[m] = best_d16;
            m++;
        }
    }
    return (int)m;
}

// ---------------------------------------------------------------------------
// double-diagonal candidate detection (QueryMatcher /
// CacheFriendlyOperations duplicateBitArray semantics): group the posting
// matches by target id (stable counting sort — arrival order preserved
// within a target, matching the python stable argsort), flag arrivals
// whose diagonal byte equals the previous arrival's for that target
// (first arrival compares against 0, the zero-initialized
// duplicateBitArray quirk), then keep one candidate per run of equal
// diagonal bytes. Replaces an O(n log n) numpy argsort over ~1M matches
// per query. Returns the candidate count.
int double_diag_detect(const int64_t* tid, const int64_t* d16, int64_t n,
                       int64_t n_targets,
                       int64_t* out_tid, int64_t* out_d16) {
    std::vector<int64_t> counts(n_targets + 1, 0);
    for (int64_t i = 0; i < n; i++) counts[tid[i] + 1]++;
    for (int64_t t = 0; t < n_targets; t++) counts[t + 1] += counts[t];
    std::vector<int64_t> pos(counts.begin(), counts.end() - 1);
    std::vector<int64_t> sd16(n);
    std::vector<int64_t> stid(n);
    for (int64_t i = 0; i < n; i++) {
        int64_t p = pos[tid[i]]++;
        stid[p] = tid[i];
        sd16[p] = d16[i];
    }
    int64_t m = 0;
    int64_t i = 0;
    while (i < n) {
        const int64_t t = stid[i];
        int64_t j = i;
        uint8_t prev = 0;          // zeroed duplicateBitArray
        int64_t last_kept_d8 = -1;  // -1 = no candidate kept yet this target
        for (; j < n && stid[j] == t; j++) {
            uint8_t d8 = (uint8_t)(sd16[j] & 0xFF);
            if (d8 == prev) {
                if (last_kept_d8 != (int64_t)d8) {
                    out_tid[m] = t;
                    out_d16[m] = sd16[j];
                    m++;
                    last_kept_d8 = d8;
                }
            }
            prev = d8;
        }
        i = j;
    }
    return (int)m;
}

// ---------------------------------------------------------------------------
// batched ungapped diagonal rescoring (UngappedAlignment::
// computeSingelSequenceScores analogue): exact integer Kadane along one
// query-profile diagonal per candidate, one call per query instead of one
// python call per candidate (~200k candidates/query at the biased
// prefilter threshold). prof: [lq*21] int32 (row = query position);
// d16: 16-bit wrapped diagonal (QueryMatcher convention).
int diag_score_batch(const int32_t* prof, int lq,
                     const int8_t* seqs_flat, const int64_t* seq_off,
                     const int32_t* seq_len,
                     const int64_t* tids, const int32_t* d16s, int n,
                     int32_t* out_scores) {
    for (int c = 0; c < n; c++) {
        const int8_t* t_seq = seqs_flat + seq_off[tids[c]];
        const int lt = seq_len[tids[c]];
        int d = d16s[c] >= 32768 ? d16s[c] - 65536 : d16s[c];
        const int32_t* qrow;
        const int8_t* ts;
        int m;
        if (d >= 0) {
            if (d >= lq) { out_scores[c] = 0; continue; }
            m = std::min(lt, lq - d);
            qrow = prof + (size_t)d * 21;
            ts = t_seq;
        } else {
            if (-d >= lt) { out_scores[c] = 0; continue; }
            m = std::min(lt + d, lq);
            qrow = prof;
            ts = t_seq - d;
        }
        int64_t best = 0, cur = 0;
        for (int i = 0; i < m; i++) {
            cur += qrow[(size_t)i * 21 + ts[i]];
            if (cur < 0) cur = 0;
            if (cur > best) best = cur;
        }
        out_scores[c] = (int32_t)best;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// batched start + traceback recovery: one call per query block instead of
// two ctypes round trips per hit (the ~0.1 ms/hit python marshalling was
// ~15% of a 64k-survivor fleet's host time). Per hit: the reversed-profile
// SW start recovery (reverse_sw semantics over a column slice of the full
// flipped profile — strided access replaces the per-hit numpy copy), the
// banded traceback over the recovered window, and the identity count.
// Failures (band overflow / score mismatch) set out_len[i] = -1 and the
// python side falls back to its per-hit path for that hit.
#if defined(__AVX2__)
// Vectorized reverse-SW pass of batch_recover (derivation, NOT a port:
// the scalar recurrence is restructured so each column has no intra-column
// dependency — E and the diagonal read only the previous column's state,
// and the F term is an exclusive prefix-max of h_noF[k] + k*ge — then each
// step maps onto 8-lane epi32 ops. Tie semantics match the scalar loop
// exactly: columns scanned j=lt-1..0, best updated on strict >, first-i
// argmax within a column, early break on col_max == target).
// Scores fit int32 comfortably (profile entries are small ints; the
// sentinel is INT32_MIN/4 so subtractions cannot wrap).
static inline __m256i pmax_excl_carry(__m256i v, int32_t& carry) {
    // inclusive log-step max-scan within the 8 lanes
    __m256i x = v;
    __m256i t;
    // shift lanes left by 1 (bring lane i-1 into lane i)
    t = _mm256_alignr_epi8(x, _mm256_permute2x128_si256(x, x, 0x08), 12);
    x = _mm256_max_epi32(x, t);
    t = _mm256_alignr_epi8(x, _mm256_permute2x128_si256(x, x, 0x08), 8);
    x = _mm256_max_epi32(x, t);
    t = _mm256_permute2x128_si256(x, x, 0x08);  // lanes 0..3 -> 4..7
    x = _mm256_max_epi32(x, t);
    // exclusive = inclusive shifted right by one lane, carry into lane 0
    __m256i ex = _mm256_alignr_epi8(x, _mm256_permute2x128_si256(x, x, 0x08), 12);
    ex = _mm256_insert_epi32(ex, carry, 0);
    ex = _mm256_max_epi32(ex, _mm256_set1_epi32(carry));
    carry = std::max(carry, _mm256_extract_epi32(x, 7));
    return ex;
}

// 16-lane epi16 variant of reverse_pass_avx2 for hits whose value range
// provably fits int16 (score + lq*ge + go + 512 < 32767; every DP cell of
// the reverse SW is bounded by the known optimum `score`, gv by
// score + i*ge, and e/f from below by -go / the -8192 sentinel, so no
// saturation arithmetic is needed and results are bit-identical to the
// epi32 pass). Profiles come as int16 copies padded to lqp + 16 columns
// so full-width tail loads stay in-bounds.
static void reverse_pass_avx2_i16(const int16_t* fpa16, const int16_t* fps16,
                                  int Lq16, int off, int lq,
                                  const int8_t* taa, const int8_t* tss, int lt,
                                  int go, int ge, int32_t target,
                                  int64_t* out_best, int* out_j,
                                  int* out_qend) {
    const int16_t NEG = -8192;
    const int nb = (lq + 15) / 16;
    const int lqp = nb * 16;
    static thread_local std::vector<int16_t> Hbuf16, Ebuf16, ramp16;
    if ((int)Hbuf16.size() < lqp + 16) {
        Hbuf16.resize(lqp + 16);
        Ebuf16.resize(lqp + 16);
    }
    std::fill(Hbuf16.begin(), Hbuf16.begin() + lqp + 16, (int16_t)0);
    std::fill(Ebuf16.begin(), Ebuf16.begin() + lqp + 16, NEG);
    int16_t* H = Hbuf16.data() + 1;
    int16_t* E = Ebuf16.data() + 1;
    if ((int)ramp16.size() < lqp || (lqp > 1 && ramp16[1] != ge)) {
        ramp16.resize(std::max((size_t)lqp, ramp16.size()));
        for (size_t i = 0; i < ramp16.size(); i++)
            ramp16[i] = (int16_t)(i * ge);
    }
    alignas(32) int16_t tmask[16];
    for (int k = 0; k < 16; k++)
        tmask[k] = ((nb - 1) * 16 + k < lq) ? -1 : 0;
    const __m256i tail = _mm256_load_si256((const __m256i*)tmask);
    const __m256i vgo = _mm256_set1_epi16((int16_t)go);
    const __m256i vge = _mm256_set1_epi16((int16_t)ge);
    const __m256i vzero = _mm256_setzero_si256();
    const __m256i vneg = _mm256_set1_epi16(NEG);

    auto shl_lanes = [](const __m256i x, const int bytes) {
        // shift epi16 lanes left by `bytes` within a virtual 32-byte lane
        const __m256i lo = _mm256_permute2x128_si256(x, x, 0x08);
        switch (bytes) {
            case 2: return _mm256_alignr_epi8(x, lo, 14);
            case 4: return _mm256_alignr_epi8(x, lo, 12);
            case 8: return _mm256_alignr_epi8(x, lo, 8);
            default: return lo;  // 16 bytes = 8 lanes
        }
    };

    int32_t best = 0;
    int best_j = 0, best_qend = lq - 1;
    for (int j = lt - 1; j >= 0; j--) {
        const int16_t* pa = fpa16 + (size_t)taa[j] * Lq16 + off;
        const int16_t* ps = fps16 + (size_t)tss[j] * Lq16 + off;
        int16_t carry = NEG;
        int16_t prev_last = 0;
        __m256i vcolmax = vzero;
        for (int b = 0; b < nb; b++) {
            const int i0 = b * 16;
            __m256i s = _mm256_add_epi16(
                _mm256_loadu_si256((const __m256i*)(pa + i0)),
                _mm256_loadu_si256((const __m256i*)(ps + i0)));
            __m256i hprev_m1 = _mm256_loadu_si256((const __m256i*)(H + i0 - 1));
            hprev_m1 = _mm256_insert_epi16(hprev_m1, prev_last, 0);
            __m256i diag = _mm256_add_epi16(hprev_m1, s);
            __m256i e = _mm256_loadu_si256((const __m256i*)(E + i0));
            __m256i h_noF = _mm256_max_epi16(_mm256_max_epi16(diag, e), vzero);
            if (b == nb - 1)
                h_noF = _mm256_blendv_epi8(vzero, h_noF, tail);
            __m256i e_new = _mm256_max_epi16(_mm256_sub_epi16(e, vge),
                                             _mm256_sub_epi16(h_noF, vgo));
            _mm256_storeu_si256((__m256i*)(E + i0), e_new);
            __m256i vramp = _mm256_loadu_si256(
                (const __m256i*)(ramp16.data() + i0));
            __m256i gv = _mm256_add_epi16(h_noF, vramp);
            if (b == nb - 1)
                gv = _mm256_blendv_epi8(vneg, gv, tail);
            // inclusive max-scan then exclusive with carry
            __m256i x = gv;
            x = _mm256_max_epi16(x, shl_lanes(x, 2));
            x = _mm256_max_epi16(x, shl_lanes(x, 4));
            x = _mm256_max_epi16(x, shl_lanes(x, 8));
            x = _mm256_max_epi16(x, shl_lanes(x, 16));
            __m256i ex = shl_lanes(x, 2);
            ex = _mm256_insert_epi16(ex, carry, 0);
            ex = _mm256_max_epi16(ex, _mm256_set1_epi16(carry));
            carry = std::max(carry, (int16_t)_mm256_extract_epi16(x, 15));
            __m256i f = _mm256_sub_epi16(
                _mm256_add_epi16(_mm256_sub_epi16(ex, vramp), vge), vgo);
            __m256i h = _mm256_max_epi16(h_noF, f);
            if (b == nb - 1)
                h = _mm256_blendv_epi8(vzero, h, tail);
            prev_last = H[i0 + 15];
            _mm256_storeu_si256((__m256i*)(H + i0), h);
            vcolmax = _mm256_max_epi16(vcolmax, h);
        }
        __m128i m = _mm_max_epi16(_mm256_castsi256_si128(vcolmax),
                                  _mm256_extracti128_si256(vcolmax, 1));
        m = _mm_max_epi16(m, _mm_shuffle_epi32(m, 0x4E));
        m = _mm_max_epi16(m, _mm_shuffle_epi32(m, 0xB1));
        m = _mm_max_epi16(m, _mm_shufflelo_epi16(m, 0xB1));
        int32_t col_max = (int16_t)_mm_cvtsi128_si32(m);
        if (col_max > best) {
            best = col_max;
            best_j = j;
            for (int i = 0; i < lq; i++) {
                if (H[i] == col_max) { best_qend = i; break; }
            }
        }
        if (col_max == target) break;
    }
    *out_best = best;
    *out_j = best_j;
    *out_qend = best_qend;
}

static bool reverse_pass_avx2(const int32_t* fpa_base, const int32_t* fps_base,
                              int Lq, int off, int lq,
                              const int8_t* taa, const int8_t* tss, int lt,
                              int go, int ge, int32_t target,
                              int64_t* out_best, int* out_j, int* out_qend) {
    const int32_t NEG = INT32_MIN / 4;
    const int nb = (lq + 7) / 8;
    const int lqp = nb * 8;
    // H buffer carries a leading 0 slot so diag[i] = H_old[i-1] is one
    // unaligned load; thread_local scratch avoids per-hit allocation
    static thread_local std::vector<int32_t> Hbuf, Ebuf, rampv;
    if ((int)Hbuf.size() < lqp + 8) {
        Hbuf.resize(lqp + 8);
        Ebuf.resize(lqp + 8);
    }
    std::fill(Hbuf.begin(), Hbuf.begin() + lqp + 8, 0);
    std::fill(Ebuf.begin(), Ebuf.begin() + lqp + 8, NEG);
    int32_t* H = Hbuf.data() + 1;
    int32_t* E = Ebuf.data() + 1;
    // ramp depends on ge; rebuilt when it grows or ge changes
    if ((int)rampv.size() < lqp || rampv[1] != ge) {
        rampv.resize(std::max((size_t)lqp, rampv.size()));
        for (size_t i = 0; i < rampv.size(); i++) rampv[i] = (int32_t)i * ge;
    }
    std::vector<int32_t>& ramp = rampv;
    // tail mask for the last block: 0xFFFF.. where lane is a real i
    alignas(32) int32_t tmask[8];
    for (int k = 0; k < 8; k++)
        tmask[k] = ((nb - 1) * 8 + k < lq) ? -1 : 0;
    const __m256i tail = _mm256_load_si256((const __m256i*)tmask);
    const __m256i vgo = _mm256_set1_epi32(go);
    const __m256i vge = _mm256_set1_epi32(ge);
    const __m256i vzero = _mm256_setzero_si256();
    const __m256i vneg = _mm256_set1_epi32(NEG);

    int32_t best = 0;
    int best_j = 0, best_qend = lq - 1;
    for (int j = lt - 1; j >= 0; j--) {
        const int32_t* pa = fpa_base + (size_t)taa[j] * Lq + off;
        const int32_t* ps = fps_base + (size_t)tss[j] * Lq + off;
        int32_t carry = NEG;
        int32_t prev_last = 0;  // H_old[i0 - 1] (already overwritten in place)
        __m256i vcolmax = vzero;
        // H is updated in place: lane i0-1 of the previous block holds the
        // NEW column by the time block b loads it, so the old value is
        // carried in prev_last and re-inserted
        for (int b = 0; b < nb; b++) {
            const int i0 = b * 8;
            // masked tail load: pa/ps rows end at lq real entries and a
            // full-width load could run past the profile allocation
            __m256i s = (b == nb - 1)
                ? _mm256_add_epi32(
                      _mm256_maskload_epi32(pa + i0, tail),
                      _mm256_maskload_epi32(ps + i0, tail))
                : _mm256_add_epi32(
                      _mm256_loadu_si256((const __m256i*)(pa + i0)),
                      _mm256_loadu_si256((const __m256i*)(ps + i0)));
            __m256i hprev_m1 = _mm256_loadu_si256((const __m256i*)(H + i0 - 1));
            hprev_m1 = _mm256_insert_epi32(hprev_m1, prev_last, 0);
            __m256i diag = _mm256_add_epi32(hprev_m1, s);
            __m256i e = _mm256_loadu_si256((const __m256i*)(E + i0));
            __m256i h_noF = _mm256_max_epi32(_mm256_max_epi32(diag, e), vzero);
            if (b == nb - 1)
                h_noF = _mm256_blendv_epi8(vzero, h_noF, tail);
            __m256i e_new = _mm256_max_epi32(_mm256_sub_epi32(e, vge),
                                             _mm256_sub_epi32(h_noF, vgo));
            _mm256_storeu_si256((__m256i*)(E + i0), e_new);
            __m256i vramp = _mm256_loadu_si256((const __m256i*)(ramp.data() + i0));
            __m256i gv = _mm256_add_epi32(h_noF, vramp);
            if (b == nb - 1)
                gv = _mm256_blendv_epi8(vneg, gv, tail);
            __m256i ex = pmax_excl_carry(gv, carry);
            // f = excl_pmax - (i-1)*ge - go = excl_pmax - ramp + ge - go
            __m256i f = _mm256_sub_epi32(
                _mm256_add_epi32(_mm256_sub_epi32(ex, vramp), vge), vgo);
            __m256i h = _mm256_max_epi32(h_noF, f);
            if (b == nb - 1)
                h = _mm256_blendv_epi8(vzero, h, tail);
            prev_last = H[i0 + 7];  // old value for the next block's diag
            _mm256_storeu_si256((__m256i*)(H + i0), h);
            vcolmax = _mm256_max_epi32(vcolmax, h);
        }
        // horizontal max
        __m128i m = _mm_max_epi32(_mm256_castsi256_si128(vcolmax),
                                  _mm256_extracti128_si256(vcolmax, 1));
        m = _mm_max_epi32(m, _mm_shuffle_epi32(m, 0x4E));
        m = _mm_max_epi32(m, _mm_shuffle_epi32(m, 0xB1));
        int32_t col_max = _mm_cvtsi128_si32(m);
        if (col_max > best) {
            best = col_max;
            best_j = j;
            for (int i = 0; i < lq; i++) {
                if (H[i] == col_max) { best_qend = i; break; }
            }
        }
        if (col_max == target) break;
    }
    *out_best = best;
    *out_j = best_j;
    *out_qend = best_qend;
    return true;
}
#endif  // __AVX2__

int batch_recover(const int32_t* fprof_aa, const int32_t* fprof_ss,
                  const int32_t* prof_aa, const int32_t* prof_ss,
                  const int8_t* q_aa, int Lq,
                  const int8_t* db_aa, const int8_t* db_ss,
                  const int64_t* t_off, const int32_t* t_end,
                  const int32_t* score, const int32_t* q_end,
                  int n_hits, int gap_open, int gap_extend,
                  int32_t* out_qstart, int32_t* out_tstart,
                  int32_t* out_ident, char* out_ops,
                  const int64_t* ops_off, int32_t* out_len) {
    std::vector<int64_t> H, E;
    std::vector<int32_t> sub;
#if defined(__AVX2__)
    // int16 copies of the flipped profiles (once per query-batch call):
    // entries are small substitution/PSSM ints; the 16-lane reverse pass
    // runs hits whose whole value range provably fits int16. Rows padded
    // to Lq + 16 so tail loads stay in-bounds.
    const int Lq16 = Lq + 16;
    static thread_local std::vector<int16_t> fpa16, fps16;
    bool prof_i16_ok = true;
    fpa16.assign((size_t)21 * Lq16, 0);
    fps16.assign((size_t)21 * Lq16, 0);
    for (int r = 0; r < 21 && prof_i16_ok; r++) {
        for (int i = 0; i < Lq; i++) {
            const int32_t a = fprof_aa[(size_t)r * Lq + i];
            const int32_t s2 = fprof_ss[(size_t)r * Lq + i];
            if (a < -256 || a > 256 || s2 < -256 || s2 > 256) {
                prof_i16_ok = false;
                break;
            }
            fpa16[(size_t)r * Lq16 + i] = (int16_t)a;
            fps16[(size_t)r * Lq16 + i] = (int16_t)s2;
        }
    }
#endif
    for (int hit = 0; hit < n_hits; hit++) {
        const int qe = q_end[hit];
        const int te = t_end[hit];
        const int lq = qe + 1;
        const int lt = te + 1;
        const int8_t* taa = db_aa + t_off[hit];
        const int8_t* tss = db_ss + t_off[hit];
        const int off = Lq - qe - 1;  // flipped-profile column offset
        // --- reverse pass (reverse_sw over fprof[:, off:off+lq]) ---
        int64_t best = 0;
        int best_j = 0, best_qend = lq - 1;
        double _t0 = lol_now();
#if defined(__AVX2__)
        if (prof_i16_ok
            && (int64_t)score[hit] + (int64_t)lq * gap_extend
               + gap_open + 512 < 32767)
            reverse_pass_avx2_i16(fpa16.data(), fps16.data(), Lq16, off, lq,
                                  taa, tss, lt, gap_open, gap_extend,
                                  score[hit], &best, &best_j, &best_qend);
        else
            reverse_pass_avx2(fprof_aa, fprof_ss, Lq, off, lq, taa, tss, lt,
                              gap_open, gap_extend, score[hit],
                              &best, &best_j, &best_qend);
        if (false)
#endif
        {
        H.assign(lq, 0);
        E.assign(lq, INT64_MIN / 4);
        for (int j = lt - 1; j >= 0; j--) {
            const int32_t* pa = fprof_aa + (size_t)taa[j] * Lq + off;
            const int32_t* ps = fprof_ss + (size_t)tss[j] * Lq + off;
            int64_t prev_diag = 0;
            int64_t running = INT64_MIN / 4;
            int64_t col_max = 0;
            for (int i = 0; i < lq; i++) {
                int64_t diag = prev_diag + pa[i] + ps[i];
                prev_diag = H[i];
                int64_t h_noF = std::max(std::max(diag, E[i]), (int64_t)0);
                int64_t f = (i == 0) ? INT64_MIN / 4
                    : running - (int64_t)(i - 1) * gap_extend - gap_open;
                int64_t h = std::max(h_noF, f);
                E[i] = std::max(E[i] - gap_extend, h_noF - gap_open);
                int64_t gv = h_noF + (int64_t)i * gap_extend;
                if (gv > running) running = gv;
                H[i] = h;
                if (h > col_max) col_max = h;
            }
            if (col_max > best) {
                best = col_max;
                best_j = j;
                for (int i = 0; i < lq; i++) {
                    if (H[i] == col_max) { best_qend = i; break; }
                }
            }
            if (col_max == score[hit]) break;
        }
        }  // scalar fallback block
        lol_prof[6] += lol_now() - _t0; _t0 = lol_now();
        if (best != score[hit]) { out_len[hit] = -1; continue; }
        const int q_start = qe - best_qend;
        const int t_start = best_j;
        // --- banded traceback over the recovered window (band-only
        // profile gather; no dense sub-matrix fill) ---
        const int wq = qe - q_start + 1;
        const int wt = te - t_start + 1;
        char* ops = out_ops + ops_off[hit];
        int n = banded_sw_bt_core(nullptr, prof_aa, prof_ss, Lq, q_start,
                                  taa + t_start, tss + t_start,
                                  wq, wt, score[hit],
                                  gap_open, gap_extend, ops);
        lol_prof[7] += lol_now() - _t0;
        if (n < 0) { out_len[hit] = -1; continue; }
        // --- identity count over M columns ---
        int qi = q_start, ti = t_start, ident = 0;
        for (int p = 0; p < n; p++) {
            if (ops[p] == 'M') {
                ident += (q_aa[qi] == taa[ti]);
                qi++; ti++;
            } else if (ops[p] == 'I') {
                qi++;
            } else {
                ti++;
            }
        }
        out_qstart[hit] = q_start;
        out_tstart[hit] = t_start;
        out_ident[hit] = ident;
        out_len[hit] = n;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Kabsch superposition (double precision, matches numpy's svd-based path)

}  // extern "C" — the TM helpers below are templated over the coordinate
// type (float engine for the full-TM-align path mirroring the reference's
// float arithmetic; double engine for the bit-pinned default search path),
// and templates cannot carry C linkage.

static void jacobi_eigen3(double a[3][3], double v[3][3], double w[3]) {
    // cyclic Jacobi for a symmetric 3x3; a is destroyed
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) v[i][j] = (i == j) ? 1.0 : 0.0;
    for (int sweep = 0; sweep < 64; sweep++) {
        double off = std::fabs(a[0][1]) + std::fabs(a[0][2]) + std::fabs(a[1][2]);
        if (off < 1e-15) break;
        for (int p = 0; p < 2; p++) {
            for (int q = p + 1; q < 3; q++) {
                if (std::fabs(a[p][q]) < 1e-300) continue;
                double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
                double t = (theta >= 0 ? 1.0 : -1.0)
                           / (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
                double c = 1.0 / std::sqrt(t * t + 1.0);
                double s = t * c;
                for (int k = 0; k < 3; k++) {
                    double akp = a[k][p], akq = a[k][q];
                    a[k][p] = c * akp - s * akq;
                    a[k][q] = s * akp + c * akq;
                }
                for (int k = 0; k < 3; k++) {
                    double apk = a[p][k], aqk = a[q][k];
                    a[p][k] = c * apk - s * aqk;
                    a[q][k] = s * apk + c * aqk;
                }
                for (int k = 0; k < 3; k++) {
                    double vkp = v[k][p], vkq = v[k][q];
                    v[k][p] = c * vkp - s * vkq;
                    v[k][q] = s * vkp + c * vkq;
                }
            }
        }
    }
    for (int i = 0; i < 3; i++) w[i] = a[i][i];
}

static double det3(const double m[3][3]) {
    return m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
         - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
         + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]);
}

// Closed-form Kabsch via Theobald's quaternion characteristic polynomial
// (QCP): the optimal proper rotation is the max-eigenvalue eigenvector of
// Horn's 4x4 key matrix; the max eigenvalue solves a quartic whose
// coefficients come straight from the covariance, found by Newton from
// e0/2 (it is the largest real root). Eigenvector by an adjugate column,
// fully unrolled. Same closed-form family as the TPU device path
// (ops/tm_device.py). Returns false on degenerate adjugates (caller falls
// back to the eigen-decomposition path). c[a][b] = sum dx_a dy_b, e0 =
// sum |dx|^2 + |dy|^2; rotation u satisfies y ~ u x.
static inline double det3x3(double a, double b, double c,
                            double d, double e, double f,
                            double g, double h, double i) {
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g);
}

static bool qcp_rotation(const double c[3][3], double e0,
                         double u[3][3], double* rms2_out) {
    const double Sxx = c[0][0], Sxy = c[0][1], Sxz = c[0][2];
    const double Syx = c[1][0], Syy = c[1][1], Syz = c[1][2];
    const double Szx = c[2][0], Szy = c[2][1], Szz = c[2][2];
    const double K00 = Sxx + Syy + Szz, K01 = Syz - Szy,
                 K02 = Szx - Sxz, K03 = Sxy - Syx;
    const double K11 = Sxx - Syy - Szz, K12 = Sxy + Syx, K13 = Szx + Sxz;
    const double K22 = -Sxx + Syy - Szz, K23 = Syz + Szy;
    const double K33 = -Sxx - Syy + Szz;
    // quartic: P(l) = l^4 + C2 l^2 + C1 l + C0 (K is traceless)
    const double C2 = -2.0 * (Sxx * Sxx + Sxy * Sxy + Sxz * Sxz
                              + Syx * Syx + Syy * Syy + Syz * Syz
                              + Szx * Szx + Szy * Szy + Szz * Szz);
    const double C1 = -8.0 * det3(c);
    // C0 = det(K), cofactor expansion along row 0 (symmetric K)
    const double M00 = det3x3(K11, K12, K13, K12, K22, K23, K13, K23, K33);
    const double M01 = det3x3(K01, K12, K13, K02, K22, K23, K03, K23, K33);
    const double M02 = det3x3(K01, K11, K13, K02, K12, K23, K03, K13, K33);
    const double M03 = det3x3(K01, K11, K12, K02, K12, K22, K03, K13, K23);
    const double C0 = K00 * M00 - K01 * M01 + K02 * M02 - K03 * M03;
    double lam = 0.5 * e0;
    const double tol = 1e-11 * std::max(1.0, std::fabs(lam));
    for (int it = 0; it < 50; it++) {
        const double l2 = lam * lam;
        const double p = (l2 + C2) * l2 + C1 * lam + C0;
        const double dp = (4.0 * l2 + 2.0 * C2) * lam + C1;
        if (dp == 0.0) break;
        const double step = p / dp;
        lam -= step;
        if (std::fabs(step) < tol) break;
    }
    // eigenvector of (K - lam I): adjugate column 0, unrolled (A symmetric,
    // so the cofactor matrix equals the adjugate)
    const double A00 = K00 - lam, A11 = K11 - lam, A22 = K22 - lam,
                 A33 = K33 - lam;
    double q0 =  det3x3(A11, K12, K13, K12, A22, K23, K13, K23, A33);
    double q1 = -det3x3(K01, K02, K03, K12, A22, K23, K13, K23, A33);
    double q2 =  det3x3(K01, K02, K03, A11, K12, K13, K13, K23, A33);
    double q3 = -det3x3(K01, K02, K03, A11, K12, K13, K12, A22, K23);
    double best_norm = q0 * q0 + q1 * q1 + q2 * q2 + q3 * q3;
    // adjugate entries are 3-entry products -> scale ~ e0^3, norm^2 ~ e0^6
    const double e1 = std::max(1.0, e0);
    const double e3 = e1 * e1 * e1;
    const double s6 = e3 * e3;
    if (!(best_norm > 1e-12 * s6)) {
        // cold path: try the remaining adjugate columns, keep the largest
        const double A[4][4] = {{A00, K01, K02, K03}, {K01, A11, K12, K13},
                                {K02, K12, A22, K23}, {K03, K13, K23, A33}};
        double q[4] = {q0, q1, q2, q3};
        for (int col = 1; col < 4; col++) {
            double v[4];
            for (int row = 0; row < 4; row++) {
                double m[3][3];
                int rr = 0;
                for (int a = 0; a < 4; a++) {
                    if (a == row) continue;
                    int cc = 0;
                    for (int b = 0; b < 4; b++) {
                        if (b == col) continue;
                        m[rr][cc++] = A[a][b];
                    }
                    rr++;
                }
                v[row] = (((row + col) & 1) ? -1.0 : 1.0) * det3(m);
            }
            double nrm = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
                         + v[3] * v[3];
            if (nrm > best_norm) {
                best_norm = nrm;
                std::memcpy(q, v, sizeof(v));
            }
        }
        if (!(best_norm > 1e-22 * s6))
            return false;  // (near-)multiple eigenvalue: fall back
        q0 = q[0]; q1 = q[1]; q2 = q[2]; q3 = q[3];
    }
    const double inv = 1.0 / std::sqrt(best_norm);
    q0 *= inv; q1 *= inv; q2 *= inv; q3 *= inv;
    u[0][0] = q0 * q0 + q1 * q1 - q2 * q2 - q3 * q3;
    u[0][1] = 2.0 * (q1 * q2 - q0 * q3);
    u[0][2] = 2.0 * (q1 * q3 + q0 * q2);
    u[1][0] = 2.0 * (q1 * q2 + q0 * q3);
    u[1][1] = q0 * q0 - q1 * q1 + q2 * q2 - q3 * q3;
    u[1][2] = 2.0 * (q2 * q3 - q0 * q1);
    u[2][0] = 2.0 * (q1 * q3 - q0 * q2);
    u[2][1] = 2.0 * (q2 * q3 + q0 * q1);
    u[2][2] = q0 * q0 - q1 * q1 - q2 * q2 + q3 * q3;
    *rms2_out = std::max(0.0, e0 - 2.0 * lam);
    return true;
}

// superpose x onto y: y ~ u x + t; returns rmsd. Accumulation runs in
// double for either coordinate type.
template <typename T>
static double kabsch_t(const T* x, const T* y, const int* idx, int n,
                       double u[3][3], double t[3]) {
    double xc[3] = {0, 0, 0}, yc[3] = {0, 0, 0};
    for (int k = 0; k < n; k++) {
        const T* xp = x + 3 * (idx ? idx[k] : k);
        const T* yp = y + 3 * (idx ? idx[k] : k);
        for (int d = 0; d < 3; d++) { xc[d] += xp[d]; yc[d] += yp[d]; }
    }
    for (int d = 0; d < 3; d++) { xc[d] /= n; yc[d] /= n; }
    // covariance C = sum (x-xc)(y-yc)^T  (3x3), e0 for rmsd — accumulated
    // in scalars (the array form escapes into qcp_rotation below, which
    // forces the accumulators into memory through the whole loop)
    double c00 = 0, c01 = 0, c02 = 0, c10 = 0, c11 = 0, c12 = 0,
           c20 = 0, c21 = 0, c22 = 0, e0 = 0;
    const double xc0 = xc[0], xc1 = xc[1], xc2 = xc[2];
    const double yc0 = yc[0], yc1 = yc[1], yc2 = yc[2];
    for (int k = 0; k < n; k++) {
        const T* xp = x + 3 * (idx ? idx[k] : k);
        const T* yp = y + 3 * (idx ? idx[k] : k);
        const double dx0 = xp[0] - xc0, dy0 = yp[0] - yc0;
        const double dx1 = xp[1] - xc1, dy1 = yp[1] - yc1;
        const double dx2 = xp[2] - xc2, dy2 = yp[2] - yc2;
        e0 += dx0 * dx0 + dy0 * dy0;
        e0 += dx1 * dx1 + dy1 * dy1;
        e0 += dx2 * dx2 + dy2 * dy2;
        c00 += dx0 * dy0; c01 += dx0 * dy1; c02 += dx0 * dy2;
        c10 += dx1 * dy0; c11 += dx1 * dy1; c12 += dx1 * dy2;
        c20 += dx2 * dy0; c21 += dx2 * dy1; c22 += dx2 * dy2;
    }
    const double c[3][3] = {{c00, c01, c02}, {c10, c11, c12},
                            {c20, c21, c22}};
    // float (TM-align) engine: closed-form QCP rotation — ~4x cheaper than
    // the iterative eigen path and well within the engine's tolerance band.
    // The double engine keeps the eigen path that pins default-search parity.
    if (sizeof(T) == sizeof(float)) {
        double rms2;
        if (qcp_rotation(c, e0, u, &rms2)) {
            for (int a = 0; a < 3; a++) {
                t[a] = yc[a];
                for (int k = 0; k < 3; k++) t[a] -= u[a][k] * xc[k];
            }
            return std::sqrt(rms2 / n);
        }
    }
    // SVD via eigen of C C^T
    double cct[3][3];
    for (int a = 0; a < 3; a++)
        for (int b = 0; b < 3; b++) {
            cct[a][b] = 0;
            for (int k = 0; k < 3; k++)
                cct[a][b] += c[a][k] * c[b][k];
        }
    double vv[3][3], ww[3], tmp[3][3];
    std::memcpy(tmp, cct, sizeof(tmp));
    jacobi_eigen3(tmp, vv, ww);
    // sort eigenpairs descending
    int order[3] = {0, 1, 2};
    std::sort(order, order + 3, [&](int a, int b) { return ww[a] > ww[b]; });
    double V[3][3], S[3];
    for (int i = 0; i < 3; i++) {
        S[i] = std::sqrt(std::max(0.0, ww[order[i]]));
        for (int k = 0; k < 3; k++) V[k][i] = vv[k][order[i]];
    }
    // W columns: C^T v_i / s_i (with fallback via cross product)
    double W[3][3];
    for (int i = 0; i < 2; i++) {
        double s = S[i] > 1e-12 ? S[i] : 1.0;
        for (int k = 0; k < 3; k++) {
            W[k][i] = (c[0][k] * V[0][i] + c[1][k] * V[1][i] + c[2][k] * V[2][i]) / s;
        }
        double norm = std::sqrt(W[0][i]*W[0][i] + W[1][i]*W[1][i] + W[2][i]*W[2][i]);
        if (norm > 1e-12) for (int k = 0; k < 3; k++) W[k][i] /= norm;
    }
    // third column: right-handed completion, det(W) = +1
    W[0][2] = W[1][0] * W[2][1] - W[2][0] * W[1][1];
    W[1][2] = W[2][0] * W[0][1] - W[0][0] * W[2][1];
    W[2][2] = W[0][0] * W[1][1] - W[1][0] * W[0][1];
    // optimal proper rotation R = V_svd diag(1,1,s) U^T with
    // s = sign(det C). With det(W) fixed to +1 the same rotation is
    // W diag(1,1,e) U^T where e = det(U) makes R proper (e*sigma = s).
    double d = det3(c) >= 0 ? 1.0 : -1.0;       // rmsd reflection sign
    double e = det3(V) >= 0 ? 1.0 : -1.0;       // rotation handedness fix
    for (int a = 0; a < 3; a++)
        for (int b = 0; b < 3; b++) {
            u[a][b] = 0;
            for (int k = 0; k < 3; k++)
                u[a][b] += W[a][k] * (k == 2 ? e : 1.0) * V[b][k];
        }
    for (int a = 0; a < 3; a++) {
        t[a] = yc[a];
        for (int k = 0; k < 3; k++) t[a] -= u[a][k] * xc[k];
    }
    double rms2 = e0 - 2.0 * (S[0] + S[1] + d * S[2]);
    if (rms2 < 0) rms2 = 0;
    return std::sqrt(rms2 / n);
}

static double kabsch_d(const double* x, const double* y, const int* idx,
                       int n, double u[3][3], double t[3]) {
    return kabsch_t<double>(x, y, idx, n, u, t);
}

// ---------------------------------------------------------------------------
// TM-score search (tmscore8_search_standard port, double precision)

struct TMSearchResult {
    double score;
    double u[3][3];
    double t[3];
};

template <typename T>
static void score_fun8(const T* xt, const T* y, int n, double d,
                       double score_d8, double d0, double lnorm,
                       std::vector<int>& cut, double* score,
                       std::vector<double>& di) {
    double d8sq = score_d8 * score_d8;
    double d0sq = d0 * d0;
    double sum = 0;
    di.resize(n);
    // two passes: distance fill (strided), then a branchless masked sum
    // over the dense di[] so the compiler vectorizes the division — the
    // conditional-sum single loop was scalar and division-latency-bound,
    // the hot op of the whole TM search
    for (int k = 0; k < n; k++) {
        T dx = xt[3 * k] - y[3 * k];
        T dy = xt[3 * k + 1] - y[3 * k + 1];
        T dz = xt[3 * k + 2] - y[3 * k + 2];
        di[k] = (double)(dx * dx + dy * dy + dz * dz);
    }
    const double* dip = di.data();
    for (int k = 0; k < n; k++) {
        double q = 1.0 / (1.0 + dip[k] / d0sq);
        sum += (dip[k] < d8sq) ? q : 0.0;
    }
    *score = sum / lnorm;
    double d2 = d * d;
    int inc = 0;
    for (;;) {
        cut.clear();
        for (int k = 0; k < n; k++) if (di[k] < d2) cut.push_back(k);
        if ((int)cut.size() >= 3 || n <= 3) break;
        inc++;
        double dinc = d + inc * 0.5;
        d2 = dinc * dinc;
    }
}

template <typename T>
static void rotate_all(const T* x, int n, const double u[3][3],
                       const double t[3], T* xt) {
    // u/t hoisted to locals: xt (double in the f64 engine) may alias the
    // caller's u/t arrays as far as the optimizer knows, forcing reloads
    const double u00 = u[0][0], u01 = u[0][1], u02 = u[0][2], t0 = t[0];
    const double u10 = u[1][0], u11 = u[1][1], u12 = u[1][2], t1 = t[1];
    const double u20 = u[2][0], u21 = u[2][1], u22 = u[2][2], t2 = t[2];
    for (int k = 0; k < n; k++) {
        const T* p = x + 3 * k;
        xt[3 * k] = (T)(u00 * p[0] + u01 * p[1] + u02 * p[2] + t0);
        xt[3 * k + 1] = (T)(u10 * p[0] + u11 * p[1] + u12 * p[2] + t1);
        xt[3 * k + 2] = (T)(u20 * p[0] + u21 * p[1] + u22 * p[2] + t2);
    }
}


// ---------------------------------------------------------------------------
// SoA float TM engine. The float (full TM-align) engine runs its hot loops
// over deinterleaved coordinate arrays with a 0/1 float mask standing in
// for the reference's cut-index lists: every pass (centroid, covariance,
// rotate+distance, d8 sum, mask build) is a pure vertical loop the
// vectorizer maps onto 8-wide AVX with no gathers. Blocked 8-lane float
// accumulation is deterministic (fixed lane order) and sits well inside
// the engine's tolerance band; the double engine above is untouched.

struct TMSoAScratch {
    std::vector<float> x0, x1, x2, y0, y1, y2;   // deinterleaved alignment
    std::vector<float> dif, mask, prev_mask;
    std::vector<float> gx, gy;                    // interleaved fallback
};
static TMSoAScratch& tm_soa_scratch() {
    static thread_local TMSoAScratch s;
    return s;
}

// masked Kabsch over SoA arrays (w = 0/1 floats, null = all points):
// blocked 8-lane float moments feed the double QCP solve. Returns false
// when QCP degenerates; the caller re-runs the interleaved scalar path
// (which ends in the Jacobi fallback).
static bool kabsch_soa(const float* x0, const float* x1, const float* x2,
                       const float* y0, const float* y1, const float* y2,
                       const float* w, int n, double u[3][3], double t[3]) {
    float aw[8] = {0}, ax0[8] = {0}, ax1[8] = {0}, ax2[8] = {0},
          ay0[8] = {0}, ay1[8] = {0}, ay2[8] = {0};
    int k = 0;
    if (w) {
        for (; k + 8 <= n; k += 8)
            for (int l = 0; l < 8; l++) {
                const float ww = w[k + l];
                aw[l] += ww;
                ax0[l] += ww * x0[k + l];
                ax1[l] += ww * x1[k + l];
                ax2[l] += ww * x2[k + l];
                ay0[l] += ww * y0[k + l];
                ay1[l] += ww * y1[k + l];
                ay2[l] += ww * y2[k + l];
            }
    } else {
        for (; k + 8 <= n; k += 8)
            for (int l = 0; l < 8; l++) {
                aw[l] += 1.0f;
                ax0[l] += x0[k + l];
                ax1[l] += x1[k + l];
                ax2[l] += x2[k + l];
                ay0[l] += y0[k + l];
                ay1[l] += y1[k + l];
                ay2[l] += y2[k + l];
            }
    }
    double sw = 0, sx0 = 0, sx1 = 0, sx2 = 0, sy0 = 0, sy1 = 0, sy2 = 0;
    for (int l = 0; l < 8; l++) {
        sw += aw[l];
        sx0 += ax0[l]; sx1 += ax1[l]; sx2 += ax2[l];
        sy0 += ay0[l]; sy1 += ay1[l]; sy2 += ay2[l];
    }
    for (; k < n; k++) {
        const float ww = w ? w[k] : 1.0f;
        sw += ww;
        sx0 += ww * x0[k]; sx1 += ww * x1[k]; sx2 += ww * x2[k];
        sy0 += ww * y0[k]; sy1 += ww * y1[k]; sy2 += ww * y2[k];
    }
    if (!(sw >= 1.0)) return false;
    const float xc0 = (float)(sx0 / sw), xc1 = (float)(sx1 / sw),
                xc2 = (float)(sx2 / sw);
    const float yc0 = (float)(sy0 / sw), yc1 = (float)(sy1 / sw),
                yc2 = (float)(sy2 / sw);
    float c00f[8] = {0}, c01f[8] = {0}, c02f[8] = {0}, c10f[8] = {0},
          c11f[8] = {0}, c12f[8] = {0}, c20f[8] = {0}, c21f[8] = {0},
          c22f[8] = {0}, e0f[8] = {0};
    k = 0;
    if (w) {
        for (; k + 8 <= n; k += 8)
            for (int l = 0; l < 8; l++) {
                const float ww = w[k + l];
                const float dx0 = ww * (x0[k + l] - xc0);
                const float dx1 = ww * (x1[k + l] - xc1);
                const float dx2 = ww * (x2[k + l] - xc2);
                const float dy0 = ww * (y0[k + l] - yc0);
                const float dy1 = ww * (y1[k + l] - yc1);
                const float dy2 = ww * (y2[k + l] - yc2);
                e0f[l] += dx0 * dx0 + dy0 * dy0;
                e0f[l] += dx1 * dx1 + dy1 * dy1;
                e0f[l] += dx2 * dx2 + dy2 * dy2;
                c00f[l] += dx0 * dy0; c01f[l] += dx0 * dy1; c02f[l] += dx0 * dy2;
                c10f[l] += dx1 * dy0; c11f[l] += dx1 * dy1; c12f[l] += dx1 * dy2;
                c20f[l] += dx2 * dy0; c21f[l] += dx2 * dy1; c22f[l] += dx2 * dy2;
            }
    } else {
        for (; k + 8 <= n; k += 8)
            for (int l = 0; l < 8; l++) {
                const float dx0 = x0[k + l] - xc0;
                const float dx1 = x1[k + l] - xc1;
                const float dx2 = x2[k + l] - xc2;
                const float dy0 = y0[k + l] - yc0;
                const float dy1 = y1[k + l] - yc1;
                const float dy2 = y2[k + l] - yc2;
                e0f[l] += dx0 * dx0 + dy0 * dy0;
                e0f[l] += dx1 * dx1 + dy1 * dy1;
                e0f[l] += dx2 * dx2 + dy2 * dy2;
                c00f[l] += dx0 * dy0; c01f[l] += dx0 * dy1; c02f[l] += dx0 * dy2;
                c10f[l] += dx1 * dy0; c11f[l] += dx1 * dy1; c12f[l] += dx1 * dy2;
                c20f[l] += dx2 * dy0; c21f[l] += dx2 * dy1; c22f[l] += dx2 * dy2;
            }
    }
    double c[3][3] = {{0}}, e0 = 0;
    for (int l = 0; l < 8; l++) {
        e0 += e0f[l];
        c[0][0] += c00f[l]; c[0][1] += c01f[l]; c[0][2] += c02f[l];
        c[1][0] += c10f[l]; c[1][1] += c11f[l]; c[1][2] += c12f[l];
        c[2][0] += c20f[l]; c[2][1] += c21f[l]; c[2][2] += c22f[l];
    }
    for (; k < n; k++) {
        const float ww = w ? w[k] : 1.0f;
        const double dx0 = ww * (x0[k] - xc0), dy0 = ww * (y0[k] - yc0);
        const double dx1 = ww * (x1[k] - xc1), dy1 = ww * (y1[k] - yc1);
        const double dx2 = ww * (x2[k] - xc2), dy2 = ww * (y2[k] - yc2);
        e0 += dx0 * dx0 + dy0 * dy0 + dx1 * dx1 + dy1 * dy1
            + dx2 * dx2 + dy2 * dy2;
        c[0][0] += dx0 * dy0; c[0][1] += dx0 * dy1; c[0][2] += dx0 * dy2;
        c[1][0] += dx1 * dy0; c[1][1] += dx1 * dy1; c[1][2] += dx1 * dy2;
        c[2][0] += dx2 * dy0; c[2][1] += dx2 * dy1; c[2][2] += dx2 * dy2;
    }
    double rms2;
    if (!qcp_rotation(c, e0, u, &rms2)) return false;
    t[0] = yc0 - (u[0][0] * xc0 + u[0][1] * xc1 + u[0][2] * xc2);
    t[1] = yc1 - (u[1][0] * xc0 + u[1][1] * xc1 + u[1][2] * xc2);
    t[2] = yc2 - (u[2][0] * xc0 + u[2][1] * xc1 + u[2][2] * xc2);
    return true;
}

// masked-kabsch fallback: gather the selected points into interleaved
// buffers and run the scalar path (QCP retry + Jacobi inside).
static void kabsch_soa_fallback(const TMSoAScratch& S, const float* w,
                                int n, double u[3][3], double t[3]) {
    auto& gx = const_cast<TMSoAScratch&>(S).gx;
    auto& gy = const_cast<TMSoAScratch&>(S).gy;
    gx.clear(); gy.clear();
    for (int k = 0; k < n; k++) {
        if (w && w[k] == 0.0f) continue;
        gx.push_back(S.x0[k]); gx.push_back(S.x1[k]); gx.push_back(S.x2[k]);
        gy.push_back(S.y0[k]); gy.push_back(S.y1[k]); gy.push_back(S.y2[k]);
    }
    if (gy.size() < 3) { return; }
    kabsch_t<float>(gx.data(), gy.data(), nullptr, (int)gy.size() / 3, u, t);
}

// fused rotate + squared distances + masked d8 sum + cut-mask build with
// the reference's grow-to-3 threshold loop. mask: 0/1 floats out.
static void rotate_score_soa(const TMSoAScratch& S, int n,
                             const double u[3][3], const double t[3],
                             double d, double score_d8, double d0,
                             double lnorm, float* mask, double* score) {
    const float u00 = (float)u[0][0], u01 = (float)u[0][1],
                u02 = (float)u[0][2], t0 = (float)t[0];
    const float u10 = (float)u[1][0], u11 = (float)u[1][1],
                u12 = (float)u[1][2], t1 = (float)t[1];
    const float u20 = (float)u[2][0], u21 = (float)u[2][1],
                u22 = (float)u[2][2], t2 = (float)t[2];
    const float* x0 = S.x0.data(); const float* x1 = S.x1.data();
    const float* x2 = S.x2.data();
    const float* y0 = S.y0.data(); const float* y1 = S.y1.data();
    const float* y2 = S.y2.data();
    float* dif = const_cast<TMSoAScratch&>(S).dif.data();
    for (int k = 0; k < n; k++) {
        const float r0 = u00 * x0[k] + u01 * x1[k] + u02 * x2[k] + t0;
        const float r1 = u10 * x0[k] + u11 * x1[k] + u12 * x2[k] + t1;
        const float r2 = u20 * x0[k] + u21 * x1[k] + u22 * x2[k] + t2;
        const float dx = r0 - y0[k], dy = r1 - y1[k], dz = r2 - y2[k];
        dif[k] = dx * dx + dy * dy + dz * dz;
    }
    const float d8sq = (float)(score_d8 * score_d8);
    const float d0sq = (float)(d0 * d0);
    float acc[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    int k = 0;
    for (; k + 8 <= n; k += 8)
        for (int l = 0; l < 8; l++) {
            const float q = 1.0f / (1.0f + dif[k + l] / d0sq);
            acc[l] += (dif[k + l] < d8sq) ? q : 0.0f;
        }
    double sum = 0;
    for (int l = 0; l < 8; l++) sum += (double)acc[l];
    for (; k < n; k++) {
        const float q = 1.0f / (1.0f + dif[k] / d0sq);
        sum += (dif[k] < d8sq) ? (double)q : 0.0;
    }
    *score = sum / lnorm;
    float d2 = (float)(d * d);
    int inc = 0;
    for (;;) {
        int cnt = 0;
        for (int kk = 0; kk < n; kk++) {
            const float m = (dif[kk] < d2) ? 1.0f : 0.0f;
            mask[kk] = m;
            cnt += (int)m;
        }
        if (cnt >= 3 || n <= 3) break;
        inc++;
        const double dinc = d + inc * 0.5;
        d2 = (float)(dinc * dinc);
    }
}

// float overload of tmscore8_search (exact-match beats the template):
// deinterleaves the alignment once, then runs every fragment seed and
// refinement iteration over the SoA engine above.
static void tmscore8_search(const float* xtm, const float* ytm, int l_ali,
                            int simplify_step, double local_d0_search,
                            double score_d8, double d0, double lnorm,
                            int n_it, TMSearchResult* res) {
    int l_ini_min = std::min(4, l_ali);
    std::vector<int> l_ini;
    for (int i = 0; i < 5; i++) {
        int lf = (int)(l_ali / std::pow(2.0, i));
        if (lf <= l_ini_min) { l_ini.push_back(l_ini_min); break; }
        l_ini.push_back(lf);
    }
    if ((int)l_ini.size() == 5 && l_ini.back() > l_ini_min)
        l_ini.push_back(l_ini_min);

    auto& S = tm_soa_scratch();
    S.x0.resize(l_ali); S.x1.resize(l_ali); S.x2.resize(l_ali);
    S.y0.resize(l_ali); S.y1.resize(l_ali); S.y2.resize(l_ali);
    S.dif.resize(l_ali); S.mask.resize(l_ali); S.prev_mask.resize(l_ali);
    for (int k = 0; k < l_ali; k++) {
        S.x0[k] = xtm[3 * k]; S.x1[k] = xtm[3 * k + 1];
        S.x2[k] = xtm[3 * k + 2];
        S.y0[k] = ytm[3 * k]; S.y1[k] = ytm[3 * k + 1];
        S.y2[k] = ytm[3 * k + 2];
    }
    res->score = -1.0;
    float* mask = S.mask.data();
    float* prev_mask = S.prev_mask.data();
    double u[3][3], t[3];

    for (int lf : l_ini) {
        int il_max = l_ali - lf;
        int i = 0;
        for (;;) {
            if (!kabsch_soa(S.x0.data() + i, S.x1.data() + i,
                            S.x2.data() + i, S.y0.data() + i,
                            S.y1.data() + i, S.y2.data() + i, nullptr, lf,
                            u, t))
                kabsch_t<float>(xtm + 3 * i, ytm + 3 * i, nullptr, lf, u, t);
            double d = local_d0_search - 1.0;
            double sc;
            rotate_score_soa(S, l_ali, u, t, d, score_d8, d0, lnorm, mask,
                             &sc);
            if (sc > res->score) {
                res->score = sc;
                std::memcpy(res->u, u, sizeof(u));
                std::memcpy(res->t, t, sizeof(t));
            }
            d = local_d0_search + 1.0;
            for (int it = 0; it < n_it; it++) {
                std::memcpy(prev_mask, mask, sizeof(float) * l_ali);
                if (!kabsch_soa(S.x0.data(), S.x1.data(), S.x2.data(),
                                S.y0.data(), S.y1.data(), S.y2.data(), mask,
                                l_ali, u, t))
                    kabsch_soa_fallback(S, mask, l_ali, u, t);
                rotate_score_soa(S, l_ali, u, t, d, score_d8, d0, lnorm,
                                 mask, &sc);
                if (sc > res->score) {
                    res->score = sc;
                    std::memcpy(res->u, u, sizeof(u));
                    std::memcpy(res->t, t, sizeof(t));
                }
                if (std::memcmp(mask, prev_mask, sizeof(float) * l_ali) == 0)
                    break;
            }
            if (i < il_max) i = std::min(i + simplify_step, il_max);
            else break;
        }
    }
}

template <typename T>
static void tmscore8_search(const T* xtm, const T* ytm, int l_ali,
                            int simplify_step, double local_d0_search,
                            double score_d8, double d0, double lnorm,
                            int n_it, TMSearchResult* res) {
    int l_ini_min = std::min(4, l_ali);
    std::vector<int> l_ini;
    for (int i = 0; i < 5; i++) {
        int lf = (int)(l_ali / std::pow(2.0, i));
        if (lf <= l_ini_min) { l_ini.push_back(l_ini_min); break; }
        l_ini.push_back(lf);
    }
    if ((int)l_ini.size() == 5 && l_ini.back() > l_ini_min) l_ini.push_back(l_ini_min);

    res->score = -1.0;
    std::vector<T> xt(3 * l_ali);
    std::vector<double> di;
    di.reserve(l_ali);
    std::vector<int> cut, prev_cut;
    cut.reserve(l_ali); prev_cut.reserve(l_ali);
    double u[3][3], t[3];

    for (int lf : l_ini) {
        int il_max = l_ali - lf;
        int i = 0;
        for (;;) {
            // the fragment is a contiguous slice of both arrays: pass
            // pointer offsets (identical arithmetic, no index indirection)
            kabsch_t<T>(xtm + 3 * i, ytm + 3 * i, nullptr, lf, u, t);
            rotate_all(xtm, l_ali, u, t, xt.data());
            double d = local_d0_search - 1.0;
            double sc;
            score_fun8(xt.data(), ytm, l_ali, d, score_d8, d0, lnorm, cut,
                       &sc, di);
            if (sc > res->score) {
                res->score = sc;
                std::memcpy(res->u, u, sizeof(u));
                std::memcpy(res->t, t, sizeof(t));
            }
            d = local_d0_search + 1.0;
            for (int it = 0; it < n_it; it++) {
                prev_cut = cut;
                kabsch_t<T>(xtm, ytm, cut.data(), (int)cut.size(), u, t);
                rotate_all(xtm, l_ali, u, t, xt.data());
                score_fun8(xt.data(), ytm, l_ali, d, score_d8, d0, lnorm,
                           cut, &sc, di);
                if (sc > res->score) {
                    res->score = sc;
                    std::memcpy(res->u, u, sizeof(u));
                    std::memcpy(res->t, t, sizeof(t));
                }
                if (cut == prev_cut) break;
            }
            if (i < il_max) i = std::min(i + simplify_step, il_max);
            else break;
        }
    }
}

static int nw_xyz_diag(const float* xt0, const float* xt1, const float* xt2,
                       int xlen, const float* yy0, const float* yy1,
                       const float* yy2, int ylen, float d02, float go,
                       const int8_t* secx, const int8_t* secy, int use_sec,
                       long* y2x);  // below

// ---------------------------------------------------------------------------
// Anti-diagonal fused score+NW kernel (gap_extend = 0 specialization —
// every TM-align NW uses ge=0, which collapses E/F to running maxima and
// makes all boundary values constants). Scores 1/(1 + d2/d02) are
// computed inline from SoA rotated coordinates, so no score matrix is
// materialized and the cell loop over a diagonal is lane-independent —
// the vectorizer runs it 8-wide (the scalar rolling-row kernel is bound
// by the sequential in-row E carry). Trace is stored diagonal-major.
// Identical per-cell float ops and tie rules as nw_gotoh_f32.
static int nw_xyz_diag(const float* xt0, const float* xt1, const float* xt2,
                       int xlen, const float* yy0, const float* yy1,
                       const float* yy2, int ylen, float d02, float go,
                       const int8_t* secx, const int8_t* secy, int use_sec,
                       long* y2x) {
    const float FLT_MIN_F = 1.1754943508222875e-38f;
    const float B = std::max(-go, FLT_MIN_F);         // H(i,-1) = H(-1,j) = B
    const float EB = std::max(B - go, FLT_MIN_F);     // E(i,-1)
    const int ND = ylen + xlen - 1;
    static thread_local std::vector<float> Hd1_s, Hd2_s, Ed1_s, Fd1_s,
        Hn_s, En_s, Fn_s;
    static thread_local std::vector<unsigned char> T_s;
    static thread_local std::vector<size_t> off_s;
    const int W = ylen + 2;  // slot [i+1] for i = -1..ylen
    Hd1_s.assign(W, B); Hd2_s.assign(W, B); Ed1_s.assign(W, EB);
    Fd1_s.assign(W, FLT_MIN_F); Hn_s.assign(W, B); En_s.assign(W, EB);
    Fn_s.assign(W, FLT_MIN_F);
    off_s.resize(ND + 1);
    size_t total = 0;
    for (int d = 0; d < ND; d++) {
        off_s[d] = total;
        const int i0 = std::max(0, d - xlen + 1);
        const int i1 = std::min(ylen - 1, d);
        total += (size_t)(i1 - i0 + 1);
    }
    off_s[ND] = total;
    if (T_s.size() < total) T_s.resize(total);
    unsigned char* T = T_s.data();

    float* Hd1 = Hd1_s.data(); float* Hd2 = Hd2_s.data();
    float* Ed1 = Ed1_s.data(); float* Fd1 = Fd1_s.data();
    float* Hn = Hn_s.data(); float* En = En_s.data(); float* Fn = Fn_s.data();
    Hd2[0] = 0.0f;  // H(-1,-1) for the d=0 diagonal cell

    for (int d = 0; d < ND; d++) {
        const int i0 = std::max(0, d - xlen + 1);
        const int i1 = std::min(ylen - 1, d);
        if (d < ylen) {            // new lane i=d: left neighbor (d,-1)
            Hd1[d + 1] = B;
            Ed1[d + 1] = EB;
        }
        unsigned char* trow = T + off_s[d] - i0;
        if (use_sec) {
            for (int i = i0; i <= i1; i++) {
                const int j = d - i;
                const float dx = yy0[i] - xt0[j];
                const float dy = yy1[i] - xt1[j];
                const float dz = yy2[i] - xt2[j];
                float s = 1.0f / (1.0f + (dx * dx + dy * dy + dz * dz) / d02);
                if (secy[i] == secx[j]) s += 0.5f;
                const float eo = Hd1[i + 1] - go;
                const float ee = Ed1[i + 1];
                const float e = std::max(eo, ee);
                const float fo = Hd1[i] - go;
                const float fe = Fd1[i];
                const float f = std::max(fo, fe);
                const float dg = Hd2[i] + s;
                const float h = std::max(std::max(dg, e), f);
                En[i + 1] = e; Fn[i + 1] = f; Hn[i + 1] = h;
                const unsigned char th = (h == dg) ? 0 : ((h == f) ? 1 : 2);
                trow[i] = (unsigned char)(th | (eo > ee ? 0 : 4)
                                          | (fo > fe ? 0 : 8));
            }
        } else {
            int i = i0;
#if defined(__AVX2__)
            // 8 lanes per step: y/state arrays load forward, the rotated
            // target coords load reversed (j = d - i) via a lane-reversing
            // permute. Same per-cell float ops as the scalar tail.
            const __m256i rev = _mm256_setr_epi32(7, 6, 5, 4, 3, 2, 1, 0);
            const __m256 gov = _mm256_set1_ps(go);
            const __m256 onev = _mm256_set1_ps(1.0f);
            const __m256 d02v = _mm256_set1_ps(d02);
            const __m256i one_i = _mm256_set1_epi32(1);
            const __m256i two_i = _mm256_set1_epi32(2);
            const __m256i four_i = _mm256_set1_epi32(4);
            const __m256i eight_i = _mm256_set1_epi32(8);
            const __m256i pickb = _mm256_setr_epi8(
                0, 4, 8, 12, -128, -128, -128, -128, -128, -128, -128, -128,
                -128, -128, -128, -128, 0, 4, 8, 12, -128, -128, -128, -128,
                -128, -128, -128, -128, -128, -128, -128, -128);
            for (; i + 8 <= i1 + 1; i += 8) {
                const int jlo = d - i - 7;
                const __m256 xr0 = _mm256_permutevar8x32_ps(
                    _mm256_loadu_ps(xt0 + jlo), rev);
                const __m256 xr1 = _mm256_permutevar8x32_ps(
                    _mm256_loadu_ps(xt1 + jlo), rev);
                const __m256 xr2 = _mm256_permutevar8x32_ps(
                    _mm256_loadu_ps(xt2 + jlo), rev);
                const __m256 dx = _mm256_sub_ps(_mm256_loadu_ps(yy0 + i), xr0);
                const __m256 dy = _mm256_sub_ps(_mm256_loadu_ps(yy1 + i), xr1);
                const __m256 dz = _mm256_sub_ps(_mm256_loadu_ps(yy2 + i), xr2);
                const __m256 d2v = _mm256_add_ps(
                    _mm256_add_ps(_mm256_mul_ps(dx, dx), _mm256_mul_ps(dy, dy)),
                    _mm256_mul_ps(dz, dz));
                const __m256 s = _mm256_div_ps(
                    onev, _mm256_add_ps(onev, _mm256_div_ps(d2v, d02v)));
                const __m256 eo =
                    _mm256_sub_ps(_mm256_loadu_ps(Hd1 + i + 1), gov);
                const __m256 ee = _mm256_loadu_ps(Ed1 + i + 1);
                const __m256 e = _mm256_max_ps(eo, ee);
                const __m256 fo = _mm256_sub_ps(_mm256_loadu_ps(Hd1 + i), gov);
                const __m256 fe = _mm256_loadu_ps(Fd1 + i);
                const __m256 f = _mm256_max_ps(fo, fe);
                const __m256 dg = _mm256_add_ps(_mm256_loadu_ps(Hd2 + i), s);
                const __m256 h = _mm256_max_ps(_mm256_max_ps(dg, e), f);
                _mm256_storeu_ps(En + i + 1, e);
                _mm256_storeu_ps(Fn + i + 1, f);
                _mm256_storeu_ps(Hn + i + 1, h);
                const __m256i m_dg = _mm256_castps_si256(
                    _mm256_cmp_ps(h, dg, _CMP_EQ_OQ));
                const __m256i m_hf = _mm256_castps_si256(
                    _mm256_cmp_ps(h, f, _CMP_EQ_OQ));
                const __m256i m_e = _mm256_castps_si256(
                    _mm256_cmp_ps(eo, ee, _CMP_GT_OQ));
                const __m256i m_fo = _mm256_castps_si256(
                    _mm256_cmp_ps(fo, fe, _CMP_GT_OQ));
                __m256i tr = _mm256_andnot_si256(
                    m_dg, _mm256_blendv_epi8(two_i, one_i, m_hf));
                tr = _mm256_or_si256(tr, _mm256_andnot_si256(m_e, four_i));
                tr = _mm256_or_si256(tr, _mm256_andnot_si256(m_fo, eight_i));
                const __m256i packed = _mm256_shuffle_epi8(tr, pickb);
                const __m128i lo = _mm256_castsi256_si128(packed);
                const __m128i hi = _mm256_extracti128_si256(packed, 1);
                *(int32_t*)(trow + i) = _mm_cvtsi128_si32(lo);
                *(int32_t*)(trow + i + 4) = _mm_cvtsi128_si32(hi);
            }
#endif
            for (; i <= i1; i++) {
                const int j = d - i;
                const float dx = yy0[i] - xt0[j];
                const float dy = yy1[i] - xt1[j];
                const float dz = yy2[i] - xt2[j];
                const float s =
                    1.0f / (1.0f + (dx * dx + dy * dy + dz * dz) / d02);
                const float eo = Hd1[i + 1] - go;
                const float ee = Ed1[i + 1];
                const float e = std::max(eo, ee);
                const float fo = Hd1[i] - go;
                const float fe = Fd1[i];
                const float f = std::max(fo, fe);
                const float dg = Hd2[i] + s;
                const float h = std::max(std::max(dg, e), f);
                En[i + 1] = e; Fn[i + 1] = f; Hn[i + 1] = h;
                const unsigned char th = (h == dg) ? 0 : ((h == f) ? 1 : 2);
                trow[i] = (unsigned char)(th | (eo > ee ? 0 : 4)
                                          | (fo > fe ? 0 : 8));
            }
        }
        // rotate: Hn -> Hd1 -> Hd2, En -> Ed1, Fn -> Fd1
        std::swap(Hd2_s, Hd1_s); std::swap(Hd1_s, Hn_s);
        std::swap(Ed1_s, En_s); std::swap(Fd1_s, Fn_s);
        Hd1 = Hd1_s.data(); Hd2 = Hd2_s.data(); Hn = Hn_s.data();
        Ed1 = Ed1_s.data(); En = En_s.data(); Fd1 = Fd1_s.data();
        Fn = Fn_s.data();
        Hn[0] = B; En[0] = EB; Fn[0] = FLT_MIN_F;  // (-1, d+1) boundaries
        Hd2[0] = B;  // H(-1, d) for the next diagonal's diag term
    }

    for (int i = 0; i < ylen; i++) y2x[i] = -1;
    int i = ylen - 1, j = xlen - 1, state = 0;
    while (i >= 0 && j >= 0) {
        const int d = i + j;
        const int di0 = std::max(0, d - xlen + 1);
        const unsigned char tr = T[off_s[d] + (size_t)(i - di0)];
        if (state == 0) {
            const unsigned char th = tr & 3;
            if (th == 0) { y2x[i] = j; i--; j--; }
            else state = th;
        } else if (state == 1) {
            i--;
            state = (tr & 8) ? 1 : 0;
        } else {
            j--;
            state = (tr & 4) ? 2 : 0;
        }
    }
    return 0;
}

extern "C" {

int nw_gotoh_f32(const float* score, int ylen, int xlen,
                 float gap_open, float gap_extend, long* y2x);  // below

// DP_iter (lib/tmalign/TMalign.cpp:1276-1360) fully native: per iteration
// an NW over rotated-distance scores (float32, matching the numpy
// wavefront) and a TMscore8 superposition search. x: [xlen*3] f32 target,
// y: [ylen*3] f32 query, y2x_seed: [ylen] i64 (-1 = unaligned).
// gap opens follow the reference's {-0.6, 0.0} table indexed g1..g2-1.
// Returns best score in *out_score and alignment in out_y2x (valid only
// when *out_found != 0).
int dp_iter_c(const float* x, int xlen, const float* y, int ylen,
              const int64_t* y2x_seed, int g1, int g2, int iteration_max,
              double local_d0_search, double lnorm, double d0,
              double score_d8, double* out_score, int64_t* out_y2x,
              int32_t* out_found) {
    const double d02d = d0 * d0;
    const float d02 = (float)d02d;
    const double gap_opens[2] = {-0.6, 0.0};
    *out_found = 0;
    *out_score = -1.0;

    std::vector<float> xtm, ytm;
    xtm.reserve(3 * ylen); ytm.reserve(3 * ylen);
    auto gather = [&](const long* y2x) {
        xtm.clear(); ytm.clear();
        for (int j = 0; j < ylen; j++) {
            long i = y2x[j];
            if (i < 0) continue;
            xtm.push_back(x[3 * i]); xtm.push_back(x[3 * i + 1]);
            xtm.push_back(x[3 * i + 2]);
            ytm.push_back(y[3 * j]); ytm.push_back(y[3 * j + 1]);
            ytm.push_back(y[3 * j + 2]);
        }
        return (int)ytm.size() / 3;
    };

    std::vector<long> seed(ylen), y2x(ylen);
    for (int j = 0; j < ylen; j++) seed[j] = (long)y2x_seed[j];
    if (gather(seed.data()) == 0) return 0;
    TMSearchResult r;
    tmscore8_search(xtm.data(), ytm.data(), (int)ytm.size() / 3, 40,
                    local_d0_search, score_d8, d0, lnorm, 10, &r);

    std::vector<float> xt0(xlen), xt1(xlen), xt2(xlen);
    std::vector<float> ys0(ylen), ys1(ylen), ys2(ylen);
    for (int j = 0; j < ylen; j++) {
        ys0[j] = y[3 * j]; ys1[j] = y[3 * j + 1]; ys2[j] = y[3 * j + 2];
    }
    for (int g = g1; g < g2; g++) {
        const float go = (float)(-gap_opens[g]);
        double tmscore_old = 0.0;
        double uu[3][3]; double tt[3];
        std::memcpy(uu, r.u, sizeof(uu));
        std::memcpy(tt, r.t, sizeof(tt));
        for (int it = 0; it < iteration_max; it++) {
            // score(i,j) = 1/(1 + |u x_i + t - y_j|^2 / d0^2), float32
            // with the numpy path's op order (last-ulp drift from FMA
            // contraction stays inside the tmalign tolerance band);
            // rotated coords kept SoA so the row loop runs vertical
            float uf[3][3], tf[3];
            for (int a = 0; a < 3; a++) {
                tf[a] = (float)tt[a];
                for (int b = 0; b < 3; b++) uf[a][b] = (float)uu[a][b];
            }
            for (int i = 0; i < xlen; i++) {
                const float* p = x + 3 * i;
                xt0[i] = uf[0][0] * p[0] + uf[0][1] * p[1]
                       + uf[0][2] * p[2] + tf[0];
                xt1[i] = uf[1][0] * p[0] + uf[1][1] * p[1]
                       + uf[1][2] * p[2] + tf[1];
                xt2[i] = uf[2][0] * p[0] + uf[2][1] * p[1]
                       + uf[2][2] * p[2] + tf[2];
            }
            if (nw_xyz_diag(xt0.data(), xt1.data(), xt2.data(), xlen,
                            ys0.data(), ys1.data(), ys2.data(), ylen,
                            d02, go, nullptr, nullptr, 0, y2x.data()) != 0)
                break;
            if (gather(y2x.data()) == 0) break;
            TMSearchResult ri;
            tmscore8_search(xtm.data(), ytm.data(), (int)ytm.size() / 3, 40,
                            local_d0_search, score_d8, d0, lnorm, 10, &ri);
            std::memcpy(uu, ri.u, sizeof(uu));
            std::memcpy(tt, ri.t, sizeof(tt));
            if (ri.score > *out_score) {
                *out_score = ri.score;
                for (int j = 0; j < ylen; j++) out_y2x[j] = y2x[j];
                *out_found = 1;
            }
            if (it > 0 && std::fabs(tmscore_old - ri.score) < 0.000001)
                break;
            tmscore_old = ri.score;
        }
    }
    return 0;
}

// NW over rotated-distance scores (ops/tmalign.py nw_xyz): builds the
// float32 score matrix 1/(1 + |u x_i + t - y_j|^2/d02) (+0.5 where the
// secondary-structure states match, for the ssplus variant) and runs the
// TM-align Gotoh NW. u/t are float64 (cast to f32 like the numpy path).
int nw_xyz_c(const float* x, int xlen, const float* y, int ylen,
             const double* u, const double* t, double d02d, float gap_open,
             const int8_t* secx, const int8_t* secy, int use_sec,
             long* y2x) {
    const float d02 = (float)d02d;
    float uf[3][3], tf[3];
    for (int a = 0; a < 3; a++) {
        tf[a] = (float)t[a];
        for (int b = 0; b < 3; b++) uf[a][b] = (float)u[3 * a + b];
    }
    // rotated coords kept SoA so the row loop runs vertical
    std::vector<float> xt0(xlen), xt1(xlen), xt2(xlen);
    for (int i = 0; i < xlen; i++) {
        const float* p = x + 3 * i;
        xt0[i] = uf[0][0] * p[0] + uf[0][1] * p[1] + uf[0][2] * p[2] + tf[0];
        xt1[i] = uf[1][0] * p[0] + uf[1][1] * p[1] + uf[1][2] * p[2] + tf[1];
        xt2[i] = uf[2][0] * p[0] + uf[2][1] * p[1] + uf[2][2] * p[2] + tf[2];
    }
    std::vector<float> ys0(ylen), ys1(ylen), ys2(ylen);
    for (int j = 0; j < ylen; j++) {
        ys0[j] = y[3 * j]; ys1[j] = y[3 * j + 1]; ys2[j] = y[3 * j + 2];
    }
    return nw_xyz_diag(xt0.data(), xt1.data(), xt2.data(), xlen,
                       ys0.data(), ys1.data(), ys2.data(), ylen, d02,
                       gap_open, secx, secy, use_sec, y2x);
}

// get_score_fast (lib/tmalign/TMalign.cpp:627-768): three Kabsch
// iterations over a gathered alignment — the inner scorer of every
// initial-alignment generator in full TM-align. xtm/ytm: [n*3] f64.
int score_fast(const float* xtm, const float* ytm, int n,
               double d0, double d0_search, double* out_score) {
    if (n < 3) { *out_score = -1.0; return 0; }
    const double d02 = d0 * d0;
    const double d002 = d0_search * d0_search;
    double u[3][3], t[3];
    std::vector<float> xt(3 * n);
    std::vector<double> dis(n);
    std::vector<int> sub;
    sub.reserve(n);

    auto score_and_dis = [&]() {
        rotate_all(xtm, n, u, t, xt.data());
        double s = 0;
        for (int k = 0; k < n; k++) {
            float dx = xt[3 * k] - ytm[3 * k];
            float dy = xt[3 * k + 1] - ytm[3 * k + 1];
            float dz = xt[3 * k + 2] - ytm[3 * k + 2];
            dis[k] = (double)(dx * dx + dy * dy + dz * dz);
            s += 1.0 / (1.0 + dis[k] / d02);
        }
        return s;
    };
    auto grow_sub = [&](double d002t) {
        for (;;) {
            sub.clear();
            for (int k = 0; k < n; k++) if (dis[k] <= d002t) sub.push_back(k);
            if ((int)sub.size() >= 3 || n <= 3) break;
            d002t += 0.5;
        }
    };

    kabsch_t<float>(xtm, ytm, nullptr, n, u, t);
    double tmscore = score_and_dis();
    grow_sub(d002);
    double tm1, tm2;
    if ((int)sub.size() != n) {
        kabsch_t<float>(xtm, ytm, sub.data(), (int)sub.size(), u, t);
        tm1 = score_and_dis();
        grow_sub(d002 + 1.0);
        kabsch_t<float>(xtm, ytm, sub.data(), (int)sub.size(), u, t);
        tm2 = score_and_dis();
    } else {
        tm1 = tm2 = tmscore;
    }
    *out_score = std::max(tmscore, std::max(tm1, tm2));
    return 0;
}

// Batched get_score_fast over candidate alignments of one pair: one call
// scores a whole gapless-threading sweep (get_initial / get_initial_fgt
// offset loops). x: [xlen*3] f32, y: [ylen*3] f32, y2x_batch: [n*ylen]
// i64 (-1 = unaligned).
int score_fast_batch(const float* x, const float* y, int ylen,
                     const int64_t* y2x_batch, int n,
                     double d0, double d0_search, double* out_scores) {
    std::vector<float> xtm, ytm;
    xtm.reserve(3 * ylen); ytm.reserve(3 * ylen);
    for (int r = 0; r < n; r++) {
        const int64_t* y2x = y2x_batch + (size_t)r * ylen;
        xtm.clear(); ytm.clear();
        for (int j = 0; j < ylen; j++) {
            int64_t i = y2x[j];
            if (i < 0) continue;
            xtm.push_back(x[3 * i]); xtm.push_back(x[3 * i + 1]);
            xtm.push_back(x[3 * i + 2]);
            ytm.push_back(y[3 * j]); ytm.push_back(y[3 * j + 1]);
            ytm.push_back(y[3 * j + 2]);
        }
        score_fast(xtm.data(), ytm.data(), (int)ytm.size() / 3, d0,
                   d0_search, out_scores + r);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// full TM-align in one call (ops/tmalign.py::tmalign orchestration over
// the native engines; reference: lib/tmalign/TMalign.cpp TMalign_main).
// x = target [xlen*3] f32, y = query [ylen*3] f32. Outputs: out4 =
// {tm_query, tm_target, rmsd, n_ali8}, u/t = final superposition from the
// query-normalized search, sel_y2x[ylen] = selected pair map (-1 = none).
// Returns 0, or -1 when no alignment exists (python returns None).

static void make_sec_c(const float* ca, int L, int8_t* sec) {
    for (int i = 0; i < L; i++) sec[i] = 1;
    if (L < 5) return;
    auto dist = [&](int a, int b) {
        float dx = ca[3*a] - ca[3*b], dy = ca[3*a+1] - ca[3*b+1],
              dz = ca[3*a+2] - ca[3*b+2];
        return std::sqrt(dx*dx + dy*dy + dz*dz);
    };
    for (int i = 2; i < L - 2; i++) {
        float d13 = dist(i-2, i), d14 = dist(i-2, i+1), d15 = dist(i-2, i+2);
        float d24 = dist(i-1, i+1), d25 = dist(i-1, i+2), d35 = dist(i, i+2);
        int8_t s = 1;
        if (d15 < 8.0f) s = 3;
        if (std::fabs(d15-13.0f) < 1.42f && std::fabs(d14-10.4f) < 1.42f
            && std::fabs(d25-10.4f) < 1.42f && std::fabs(d13-6.1f) < 1.42f
            && std::fabs(d24-6.1f) < 1.42f && std::fabs(d35-6.1f) < 1.42f)
            s = 4;
        if (std::fabs(d15-6.37f) < 2.1f && std::fabs(d14-5.18f) < 2.1f
            && std::fabs(d25-5.18f) < 2.1f && std::fabs(d13-5.45f) < 2.1f
            && std::fabs(d24-5.45f) < 2.1f && std::fabs(d35-5.45f) < 2.1f)
            s = 2;
        sec[i] = s;
    }
}

static int gather_fl(const float* x, const float* y, const long* y2x,
                     int ylen, std::vector<float>& xtm,
                     std::vector<float>& ytm) {
    xtm.clear(); ytm.clear();
    for (int j = 0; j < ylen; j++) {
        long i = y2x[j];
        if (i < 0) continue;
        xtm.push_back(x[3*i]); xtm.push_back(x[3*i+1]); xtm.push_back(x[3*i+2]);
        ytm.push_back(y[3*j]); ytm.push_back(y[3*j+1]); ytm.push_back(y[3*j+2]);
    }
    return (int)ytm.size() / 3;
}

int tmalign_c(const float* x, int xlen, const float* y, int ylen,
              int fast_opt, double* out4, double* u_out, double* t_out,
              int64_t* sel_y2x) {
    if (xlen <= 5 || ylen <= 5) return -1;
    // parameter_set4search
    const double lnorm = std::min(xlen, ylen);
    double d0 = (lnorm <= 19) ? 0.168 : 1.24 * std::cbrt(lnorm - 15.0) - 1.8;
    const double d0_min = d0 + 0.8;
    d0 = d0_min;
    const double d0_search = std::min(8.0, std::max(4.5, d0));
    const double score_d8 = 1.5 * std::pow(lnorm, 0.3) + 3.5;
    const double dcu0 = 4.25;
    const double local_d0_search = d0_search;
    const double ddcc = (lnorm <= 40) ? 0.1 : 0.4;

    std::vector<int8_t> secx(xlen), secy(ylen);
    make_sec_c(x, xlen, secx.data());
    make_sec_c(y, ylen, secy.data());

    std::vector<float> xtm, ytm;
    std::vector<long> y2x(ylen), invmap0(ylen, -1), dp_out(ylen);
    bool have_map = false;
    double tm_max = -1.0;
    double out_sc;
    int64_t dp_seed64_storage = 0; (void)dp_seed64_storage;
    std::vector<int64_t> seed64(ylen);
    int32_t found = 0;

    // consider(): detailed_search + conditional DP refinement
    // cond: 0 = always, 1 = tm > tm_max*0.2, 2 = tm > tm_max*ddcc
    auto consider = [&](const long* cand, int cond, int iters, int g1) {
        if (!cand) return;
        int n = gather_fl(x, y, cand, ylen, xtm, ytm);
        if (n == 0) return;
        TMSearchResult r;
        tmscore8_search(xtm.data(), ytm.data(), n, 40, local_d0_search,
                        score_d8, d0, lnorm, 10, &r);
        if (r.score > tm_max) {
            tm_max = r.score;
            std::copy(cand, cand + ylen, invmap0.begin());
            have_map = true;
        }
        bool run_dp = (cond == 0) || (cond == 1 && r.score > tm_max * 0.2)
                      || (cond == 2 && r.score > tm_max * ddcc);
        if (!run_dp) return;
        for (int j = 0; j < ylen; j++) seed64[j] = cand[j];
        double dsc;
        dp_iter_c(x, xlen, y, ylen, seed64.data(), g1, 2, iters,
                  local_d0_search, lnorm, d0, score_d8, &dsc,
                  (int64_t*)dp_out.data(), &found);
        if (found && dsc > tm_max) {
            tm_max = dsc;
            std::copy(dp_out.begin(), dp_out.end(), invmap0.begin());
            have_map = true;
        }
    };

    std::vector<long> cand(ylen);
    std::vector<double> scores;
    const int dp_iters = fast_opt ? 2 : 30;

    // 1) gapless threading (get_initial): batch-score all offsets, keep
    //    the LAST max (python '>=' update rule)
    {
        const int min_ali = std::max(5, (int)std::min(xlen, ylen) / 2);
        const int n1 = -ylen + min_ali, n2 = xlen - min_ali;
        const int step = fast_opt ? 5 : 1;
        std::vector<long> best(ylen, -1);
        double best_sc = -1.0;
        for (int k = n1; k <= n2; k += step) {
            for (int j = 0; j < ylen; j++) {
                int i = j + k;
                cand[j] = (i >= 0 && i < xlen) ? i : -1;
            }
            int n = gather_fl(x, y, cand.data(), ylen, xtm, ytm);
            double sc = -1.0;
            if (n >= 3)
                score_fast(xtm.data(), ytm.data(), n, d0, d0_search, &sc);
            if (sc >= best_sc) { best_sc = sc; best = cand; }
        }
        consider(best.data(), 0, dp_iters, 0);
    }

    // 2) secondary-structure NW
    {
        std::vector<float> sc((size_t)ylen * xlen);
        for (int j = 0; j < ylen; j++)
            for (int i = 0; i < xlen; i++)
                sc[(size_t)j * xlen + i] = (secy[j] == secx[i]) ? 1.0f : 0.0f;
        if (nw_gotoh_f32(sc.data(), ylen, xlen, 1.0f, 0.0f,
                         cand.data()) == 0)
            consider(cand.data(), 1, dp_iters, 0);
    }

    // 3) local fragment superposition (get_initial5); FIRST max wins
    {
        const double d01 = std::max(d0 + 1.5, d0_min);
        const double d02 = d01 * d01;
        const int aL = std::min(xlen, ylen);
        auto jump = [](int L) {
            int n = (L > 250) ? 45 : (L > 200) ? 35 : (L > 150) ? 25 : 15;
            return std::min(n, L / 3);
        };
        int n_jump1 = jump(xlen), n_jump2 = jump(ylen);
        if (fast_opt) { n_jump1 *= 5; n_jump2 *= 5; }
        const int n_frag[2] = {std::min(20, aL / 3), std::min(100, aL / 2)};
        std::vector<long> best(ylen, -1);
        double gl_max = 0.0;
        bool any = false;
        double u[3][3], t[3];
        double u9[9], t3[3];
        for (int f = 0; f < 2; f++) {
            const int nf = n_frag[f];
            const int m1 = xlen - nf + 1, m2 = ylen - nf + 1;
            for (int i = 0; i < m1; i += std::max(1, n_jump1)) {
                for (int j = 0; j < m2; j += std::max(1, n_jump2)) {
                    kabsch_t<float>(x + 3 * i, y + 3 * j, nullptr, nf, u, t);
                    for (int a = 0; a < 3; a++) {
                        t3[a] = t[a];
                        for (int b = 0; b < 3; b++) u9[3*a+b] = u[a][b];
                    }
                    if (nw_xyz_c(x, xlen, y, ylen, u9, t3, d02, 0.0f,
                                 nullptr, nullptr, 0, cand.data()) != 0)
                        continue;
                    int n = gather_fl(x, y, cand.data(), ylen, xtm, ytm);
                    double gl = -1.0;
                    if (n >= 3)
                        score_fast(xtm.data(), ytm.data(), n, d0,
                                   d0_search, &gl);
                    if (gl > gl_max) { gl_max = gl; best = cand; any = true; }
                }
            }
        }
        if (any) consider(best.data(), 2, 2, 0);
    }

    // 4) ss + superposition rescoring over the current best map
    // (python's get_initial_ssplus returns the previous map unchanged when
    // fewer than 3 pairs gather — consider() then re-runs on it)
    if (have_map) {
        const double d01 = std::max(d0 + 1.5, d0_min);
        const double d02 = d01 * d01;
        int n = gather_fl(x, y, invmap0.data(), ylen, xtm, ytm);
        const long* c4 = invmap0.data();
        if (n >= 3) {
            double u[3][3], t[3], u9[9], t3[3];
            kabsch_t<float>(xtm.data(), ytm.data(), nullptr, n, u, t);
            for (int a = 0; a < 3; a++) {
                t3[a] = t[a];
                for (int b = 0; b < 3; b++) u9[3*a+b] = u[a][b];
            }
            if (nw_xyz_c(x, xlen, y, ylen, u9, t3, d02, 1.0f,
                         secx.data(), secy.data(), 1, cand.data()) == 0)
                c4 = cand.data();
        }
        std::vector<long> c4copy(c4, c4 + ylen);  // consider may update invmap0
        consider(c4copy.data(), 2, dp_iters, 0);
    }

    // 5) fragment gapless threading (get_initial_fgt), DP with g1=1
    {
        const int fra_min = fast_opt ? 8 : 4;
        const int fra_min1 = fra_min - 1;
        auto find_max_frag = [&](const float* c, int L, int* s_out,
                                 int* e_out) {
            const int r_min = std::min(L / 3, fra_min);
            double dcu_cut = dcu0 * dcu0;
            int inc = 0;
            for (;;) {
                int lfr_max = 0, start_max = 0, end_max = 0;
                int j = 1, start = 0;
                for (int i = 1; i < L; i++) {
                    float dx = c[3*(i-1)] - c[3*i];
                    float dy = c[3*(i-1)+1] - c[3*i+1];
                    float dz = c[3*(i-1)+2] - c[3*i+2];
                    if (dx*dx + dy*dy + dz*dz < dcu_cut) {
                        j++;
                        if (i == L - 1) {
                            if (j > lfr_max) { lfr_max = j; start_max = start; end_max = i; }
                            j = 1;
                        }
                    } else {
                        if (j > lfr_max) { lfr_max = j; start_max = start; end_max = i - 1; }
                        j = 1;
                        start = i;
                    }
                }
                if (lfr_max >= r_min) { *s_out = start_max; *e_out = end_max; return; }
                inc++;
                double dinc = std::pow(1.1, inc) * dcu0;
                dcu_cut = dinc * dinc;
            }
        };
        int xs, xe, ys, ye;
        find_max_frag(x, xlen, &xs, &xe);
        find_max_frag(y, ylen, &ys, &ye);
        const int Lx = xe - xs + 1, Ly = ye - ys + 1;
        int L_fr = std::min(Lx, Ly);
        std::vector<int> ifr(L_fr);
        bool x_side;
        if (Lx < Ly || (Lx == Ly && xlen <= ylen)) {
            for (int i = 0; i < L_fr; i++) ifr[i] = xs + i;
            x_side = true;
        } else {
            for (int i = 0; i < L_fr; i++) ifr[i] = ys + i;
            x_side = false;
        }
        const int L0 = std::min(xlen, ylen);
        if (L_fr == L0) {
            const int n1 = (int)(L0 * 0.1), n2 = (int)(L0 * 0.89);
            ifr = std::vector<int>(ifr.begin() + n1,
                                   ifr.begin() + std::min(n2 + 1, (int)ifr.size()));
            L_fr = (int)ifr.size();
        }
        std::vector<long> best(ylen, -1);
        double best_sc = -1.0;
        bool any = false;
        if (x_side) {
            const int L1 = L_fr;
            const int min_ali = std::max(fra_min1,
                                         (int)(std::min(L1, ylen) / 2.5));
            const int n1 = -ylen + min_ali, n2 = L1 - min_ali;
            const int step = fast_opt ? 3 : 1;
            for (int k = n1; k <= n2; k += step) {
                for (int j = 0; j < ylen; j++) {
                    int i = j + k;
                    cand[j] = (i >= 0 && i < L1) ? ifr[i] : -1;
                }
                int n = gather_fl(x, y, cand.data(), ylen, xtm, ytm);
                double sc = -1.0;
                if (n >= 3)
                    score_fast(xtm.data(), ytm.data(), n, d0, d0_search, &sc);
                if (sc >= best_sc) { best_sc = sc; best = cand; any = true; }
            }
        } else {
            const int L2 = L_fr;
            const int min_ali = std::max(fra_min1,
                                         (int)(std::min(xlen, L2) / 2.5));
            const int n1 = -L2 + min_ali, n2 = xlen - min_ali;
            for (int k = n1; k <= n2; k++) {
                std::fill(cand.begin(), cand.end(), -1);
                for (int j = 0; j < L2; j++) {
                    int i = j + k;
                    if (i >= 0 && i < xlen) cand[ifr[j]] = i;
                }
                int n = gather_fl(x, y, cand.data(), ylen, xtm, ytm);
                double sc = -1.0;
                if (n >= 3)
                    score_fast(xtm.data(), ytm.data(), n, d0, d0_search, &sc);
                if (sc >= best_sc) { best_sc = sc; best = cand; any = true; }
            }
        }
        if (any) consider(best.data(), 2, 2, 1);
    }

    if (!have_map) return -1;
    bool all_neg = true;
    for (int j = 0; j < ylen; j++) if (invmap0[j] >= 0) { all_neg = false; break; }
    if (all_neg) return -1;

    // standard search for the final rotation
    int n0 = gather_fl(x, y, invmap0.data(), ylen, xtm, ytm);
    TMSearchResult rs;
    tmscore8_search(xtm.data(), ytm.data(), n0, fast_opt ? 40 : 1,
                    local_d0_search, score_d8, d0, (double)n0, 20, &rs);
    // select pairs with d <= score_d8 under (u, t)
    std::vector<float> xtm8, ytm8;
    int n_ali8 = 0;
    for (int j = 0; j < ylen; j++) {
        sel_y2x[j] = -1;
        long i = invmap0[j];
        if (i < 0) continue;
        double xt[3];
        for (int a = 0; a < 3; a++)
            xt[a] = rs.u[a][0]*x[3*i] + rs.u[a][1]*x[3*i+1]
                  + rs.u[a][2]*x[3*i+2] + rs.t[a];
        double dx = xt[0]-y[3*j], dy = xt[1]-y[3*j+1], dz = xt[2]-y[3*j+2];
        if (std::sqrt(dx*dx + dy*dy + dz*dz) <= score_d8) {
            sel_y2x[j] = i;
            xtm8.push_back(x[3*i]); xtm8.push_back(x[3*i+1]); xtm8.push_back(x[3*i+2]);
            ytm8.push_back(y[3*j]); ytm8.push_back(y[3*j+1]); ytm8.push_back(y[3*j+2]);
            n_ali8++;
        }
    }
    if (n_ali8 == 0) return -1;
    double u[3][3], t[3];
    double rmsd0 = kabsch_t<float>(xtm8.data(), ytm8.data(), nullptr, n_ali8,
                                   u, t);
    // final TM normalized by query then target length (parameter_set4final)
    auto final_params = [](double length, double* d0f, double* d0sf) {
        double d = (length <= 21) ? 0.5 : 1.24 * std::cbrt(length - 15.0) - 1.8;
        if (d < 0.5) d = 0.5;
        *d0f = d;
        *d0sf = std::min(8.0, std::max(4.5, d));
    };
    double d0q, d0sq, d0t, d0st;
    final_params((double)ylen, &d0q, &d0sq);
    final_params((double)xlen, &d0t, &d0st);
    TMSearchResult r1, r2;
    tmscore8_search(xtm8.data(), ytm8.data(), n_ali8, 1, d0sq, score_d8,
                    d0q, (double)ylen, 10, &r1);
    tmscore8_search(xtm8.data(), ytm8.data(), n_ali8, 1, d0st, score_d8,
                    d0t, (double)xlen, 10, &r2);
    out4[0] = r1.score;
    out4[1] = r2.score;
    out4[2] = rmsd0;
    out4[3] = n_ali8;
    for (int a = 0; a < 3; a++) {
        t_out[a] = r1.t[a];
        for (int b = 0; b < 3; b++) u_out[3*a+b] = r1.u[a][b];
    }
    return 0;
}

// compute_tm_score: approximate TM of a fixed alignment
// x = target matched coords [n*3], y = query matched [n*3] (pre-gathered)
// out: [tm, rmsd, u(9), t(3)] = 14 doubles
int tm_score_aligned(const double* x, const double* y, int n, int norm_len,
                     double* out) {
    if (n == 0) return -1;
    // parameter_set4search(norm, norm)
    double lnorm = norm_len;
    double d0 = (lnorm <= 19) ? 0.168 : 1.24 * std::cbrt(lnorm - 15.0) - 1.8;
    d0 += 0.8;  // d0_min = d0 + 0.8; d0 = d0_min
    double d0_search = std::min(8.0, std::max(4.5, d0));
    double score_d8 = 1.5 * std::pow(lnorm, 0.3) + 3.5;

    // standard_TMscore: d0_std
    double d0_std = (lnorm > 21) ? 1.24 * std::cbrt(lnorm - 15.0) - 1.8 : 0.5;
    if (d0_std < 0.5) d0_std = 0.5;

    double u0[3][3], t0[3];
    double rmsd0 = kabsch_d(x, y, nullptr, n, u0, t0);

    TMSearchResult r1, r2;
    // first pass normalizes by l_ali inside, then rescales by n/lnorm
    tmscore8_search(x, y, n, 40, d0_std, score_d8, d0_std, n, 20, &r1);
    double tm1 = r1.score * n / lnorm;
    tmscore8_search(x, y, n, 40, d0_search, score_d8, d0, n, 20, &r2);
    double tm2 = r2.score * n / lnorm;

    out[0] = std::max(tm1, tm2);
    out[1] = rmsd0;
    std::memcpy(out + 2, r2.u, 9 * sizeof(double));
    std::memcpy(out + 11, r2.t, 3 * sizeof(double));
    return 0;
}

// direct export of the iterative superposition search used by full TM-align
// (TMalign.cpp TMscore8_search): out13 = [score, u(9), t(3)]
int tm_search8(const double* xtm, const double* ytm, int l_ali,
               int simplify_step, double local_d0_search, double score_d8,
               double d0, double lnorm, int n_it, double* out13) {
    if (l_ali < 1) return -1;
    TMSearchResult r;
    tmscore8_search(xtm, ytm, l_ali, simplify_step, local_d0_search,
                    score_d8, d0, lnorm, n_it, &r);
    out13[0] = r.score;
    std::memcpy(out13 + 1, r.u, 9 * sizeof(double));
    std::memcpy(out13 + 10, r.t, 3 * sizeof(double));
    return 0;
}

// float-engine variant for the full-TM-align path (the reference's
// TM-align runs float32 coordinates; the default-search parity path keeps
// the double engine above)
int tm_search8f(const float* xtm, const float* ytm, int l_ali,
                int simplify_step, double local_d0_search, double score_d8,
                double d0, double lnorm, int n_it, double* out13) {
    if (l_ali < 1) return -1;
    TMSearchResult r;
    tmscore8_search(xtm, ytm, l_ali, simplify_step, local_d0_search,
                    score_d8, d0, lnorm, n_it, &r);
    out13[0] = r.score;
    std::memcpy(out13 + 1, r.u, 9 * sizeof(double));
    std::memcpy(out13 + 10, r.t, 3 * sizeof(double));
    return 0;
}

// Batched per-query TM + LDDT over a block of accepted hits — the host
// analogue of the device survivor-gating phase (structurealign.cpp:377-407
// runs these per hit inside the omp loop). One ctypes call replaces, per
// hit: the backtrace-index numpy pass, two coordinate gathers, and two
// native calls. Inputs: q_ca [lq*3] f32 (+ q_deg [lq] f32 full-chain
// neighbor degrees when need_lddt); t_ca_flat = concatenated per-hit
// target coords with residue offsets t_off; backtraces concatenated in
// bt_flat (M/I/D chars, bt_off/bt_len); norm_len = per-hit TM
// normalization. Outputs: tm/rmsd [n], u [n*9], tvec [n*3], lddt [n].
// n_cols==0 hits follow the python conventions (tm 0, identity u, lddt 0).
int lddt_aligned(const float* qa, const float* ta, const float* deg, int m,
                 double* out2, float* per_col);  // defined below
// float-exact reference engines, defined near the end of this file
int tm_score_aligned_ref(const float* xtm, const float* ytm, int n,
                         int norm_len, double* out14);
int lddt_aligned_ref(const float* qa, const float* ta, const float* deg,
                     int m, double* out2, float* per_col);

int batch_gates(const float* q_ca, int lq, const float* q_deg,
                const float* t_ca_flat, const int64_t* t_off,
                const int32_t* q_start, const int32_t* t_start,
                const char* bt_flat, const int64_t* bt_off,
                const int32_t* bt_len, const int32_t* norm_len,
                int n_hits, int need_tm, int need_lddt,
                double* tm, double* rmsd, double* u, double* tvec,
                double* lddt_out) {
    (void)lq;
    std::vector<double> xtm, ytm;
    std::vector<float> qa, ta, deg, percol;
    double out14[14];
    double o2[2];
    for (int h = 0; h < n_hits; h++) {
        const char* bt = bt_flat + bt_off[h];
        const float* tca = t_ca_flat + 3 * t_off[h];
        xtm.clear(); ytm.clear(); qa.clear(); ta.clear(); deg.clear();
        int qi = q_start[h], ti = t_start[h];
        for (int k = 0; k < bt_len[h]; k++) {
            const char c = bt[k];
            if (c == 'M') {
                const float* qp = q_ca + 3 * qi;
                const float* tp = tca + 3 * ti;
                if (need_tm) {
                    // x = target, y = query (TMaligner invmap convention);
                    // f32 -> f64 exactly like the numpy gather
                    xtm.push_back(tp[0]); xtm.push_back(tp[1]); xtm.push_back(tp[2]);
                    ytm.push_back(qp[0]); ytm.push_back(qp[1]); ytm.push_back(qp[2]);
                }
                if (need_lddt) {
                    qa.push_back(qp[0]); qa.push_back(qp[1]); qa.push_back(qp[2]);
                    ta.push_back(tp[0]); ta.push_back(tp[1]); ta.push_back(tp[2]);
                    deg.push_back(q_deg[qi]);
                }
                qi++; ti++;
            } else if (c == 'I') {
                qi++;
            } else {
                ti++;
            }
        }
        if (need_tm) {
            // float-exact reference engine (tm_ref.hpp): x = target coords
            const int n = (int)ytm.size() / 3;
            std::vector<float> xf(3 * n), yf(3 * n);
            for (int k = 0; k < 3 * n; k++) {
                xf[k] = (float)xtm[k];
                yf[k] = (float)ytm[k];
            }
            if (n > 0 && tm_score_aligned_ref(xf.data(), yf.data(), n,
                                              norm_len[h], out14) == 0) {
                tm[h] = out14[0];
                rmsd[h] = out14[1];
                std::memcpy(u + 9 * h, out14 + 2, 9 * sizeof(double));
                std::memcpy(tvec + 3 * h, out14 + 11, 3 * sizeof(double));
            } else {
                tm[h] = 0.0; rmsd[h] = 0.0;
                for (int a = 0; a < 9; a++) u[9 * h + a] = (a % 4 == 0) ? 1.0 : 0.0;
                tvec[3 * h] = tvec[3 * h + 1] = tvec[3 * h + 2] = 0.0;
            }
        }
        if (need_lddt) {
            const int n = (int)deg.size();
            if (n > 0) {
                percol.resize(n);
                lddt_aligned_ref(qa.data(), ta.data(), deg.data(), n, o2,
                                 percol.data());
                lddt_out[h] = o2[0];
            } else {
                lddt_out[h] = 0.0;
            }
        }
    }
    return 0;
}

// Gotoh Needleman-Wunsch over a dense float32 score matrix with the
// TM-align boundary conditions (negative boundaries clamp to FLT_MIN) and
// trace tie rules: E/F prefer extension on ties, H priority diag > F > E
// (lib/tmalign/TMalign.cpp NWDP_TM). Bit-identical to the numpy float32
// anti-diagonal version in ops/tmalign.py.

int nw_gotoh_f32(const float* score, int ylen, int xlen,
                 float gap_open, float gap_extend, long* y2x) {
    // Rolling-row DP (H needs only the previous row; E is a within-row
    // carry; F one row buffer) with a single packed trace byte per cell:
    // bits 0-1 = H trace (0 diag, 1 F, 2 E), bit 2 = E extend, bit 3 =
    // F extend. Per-cell float ops identical to the dense formulation.
    const float FLT_MIN_F = 1.1754943508222875e-38f;
    const int W = xlen + 1;
    // thread-local scratch: this runs under host thread pools
    static thread_local std::vector<float> Hprev_s, Hcur_s, Frow_s;
    static thread_local std::vector<unsigned char> T_s;
    Hprev_s.resize(W); Hcur_s.resize(W); Frow_s.resize(W);
    if (T_s.size() < (size_t)ylen * xlen) T_s.resize((size_t)ylen * xlen);
    float* Hprev = Hprev_s.data();
    float* Hcur = Hcur_s.data();
    float* Frow = Frow_s.data();
    unsigned char* T = T_s.data();

    Hprev[0] = 0.0f;
    for (int j = 1; j <= xlen; j++) {
        float v = -gap_open - gap_extend * (float)(j - 1);
        Hprev[j] = std::max(v, FLT_MIN_F);
        Frow[j] = FLT_MIN_F;
    }
    for (int i = 0; i < ylen; i++) {
        const float* srow = score + (size_t)i * xlen;
        unsigned char* trow = T + (size_t)i * xlen;
        // boundary H(i, -1) and its E seed (column-0 init)
        float v = -gap_open - gap_extend * (float)i;
        Hcur[0] = std::max(v, FLT_MIN_F);
        float e = std::max(Hcur[0] - gap_open, FLT_MIN_F);
        for (int j = 0; j < xlen; j++) {
            float e_open = Hcur[j] - gap_open;
            float e_ext = e - gap_extend;
            unsigned char te = (e_open > e_ext) ? 0 : 4;
            e = std::max(e_open, e_ext);
            float f_open = Hprev[j + 1] - gap_open;
            float f_ext = Frow[j + 1] - gap_extend;
            unsigned char tf = (f_open > f_ext) ? 0 : 8;
            float f = std::max(f_open, f_ext);
            Frow[j + 1] = f;
            float diag = Hprev[j] + srow[j];
            float h = std::max(std::max(diag, e), f);
            Hcur[j + 1] = h;
            unsigned char th = (h == diag) ? 0 : ((h == f) ? 1 : 2);
            trow[j] = (unsigned char)(th | te | tf);
        }
        std::swap(Hprev_s, Hcur_s);
        Hprev = Hprev_s.data();
        Hcur = Hcur_s.data();
    }
    for (int i = 0; i < ylen; i++) y2x[i] = -1;
    int i = ylen - 1, j = xlen - 1, state = 0;
    while (i >= 0 && j >= 0) {
        unsigned char tr = T[(size_t)i * xlen + j];
        if (state == 0) {
            unsigned char th = tr & 3;
            if (th == 0) { y2x[i] = j; i--; j--; }
            else state = th;
        } else if (state == 1) {
            i--;
            state = (tr & 8) ? 1 : 0;
        } else {
            j--;
            state = (tr & 4) ? 2 : 0;
        }
    }
    return 0;
}



// ---------------------------------------------------------------------------
// Full LoLalign orchestration in one call (ops/lolalign.py::LoLAligner.align
// is the semantics reference; reference src/strucclustutils/LoLAlign.cpp
// LoLAlign::align). Python keeps result assembly (_make_result); this
// returns the winning anchor-set pair (aq/at state arrays).

int fwbw_posterior_c(const double* s, int L1, int L2, double go, double ge,
                     double temperature, double* P, double* max_p);  // below
static int fwbw_posterior_f32s(const float* s, int stride, int L1, int L2,
                               double go, double ge, double temperature,
                               double* P, double* max_p);  // below

static inline float lol_seq_dist(int a, int b) {
    const float diff = (float)a - (float)b;
    return std::copysign(1.0f, diff) * std::log1p(std::fabs(diff));
}

// the 2->3->1 ReLU LoL net; dd < 0 contributes 0
static inline float lol_net(float dd, float ds, const float* w1,
                            const float* b1, const float* w2, float b2) {
    if (dd < 0.0f) return 0.0f;
    float s = b2;
    s += w2[0] * std::max(0.0f, ds * w1[0] + dd * w1[3] + b1[0]);
    s += w2[1] * std::max(0.0f, ds * w1[1] + dd * w1[4] + b1[1]);
    s += w2[2] * std::max(0.0f, ds * w1[2] + dd * w1[5] + b1[2]);
    return s;
}

// Next-unanchored-block scan over the paired anchor masks.
// DERIVATION NOTE: this control flow necessarily matches the reference's
// LoLAlign::calcGap (LoLAlign.cpp:96-136) step for step — the function IS
// the specification of which residue block the gap rescoring runs over,
// and any deviation (e.g. scanning both masks jointly instead of the
// reference's per-mask advance order) changes which blocks are rescored
// and breaks score parity. The two-pointer walk below was re-derived from
// that block semantics: advance past the current anchored run on both
// masks, record the block start, then advance to the next anchored pair.
// g = {q_block_start, q_scan_pos, t_block_start, t_scan_pos}.
static bool lol_calc_gap(const int8_t* aq, const int8_t* at, int q_len,
                         int t_len, int* g) {
    int iq = g[1], it = g[3];
    while (aq[iq] != 0 || at[it] != 0) {
        if (aq[iq] != 0 && at[it] != 0) { iq++; it++; }
        else if (aq[iq] == 0) iq++;
        else it++;
        if (iq == q_len || it == t_len) return false;
    }
    g[0] = iq; g[2] = it;
    while (aq[iq] == 0 || at[it] == 0) {
        if (aq[iq] == 0 && at[it] == 0) { iq++; it++; }
        else if (aq[iq] == 0) iq++;
        else it++;
        if (iq == q_len || it == t_len) { iq = q_len; it = t_len; break; }
    }
    g[1] = iq; g[3] = it;
    return true;
}

// anchor-set LoL total (ops/lolalign.py::_anchor_lol_score total_for_seed)
static double lol_anchor_total(const int8_t* aq, const int8_t* at, int qL,
                               int tL, const float* lol_m0,
                               const float* dist_q, const float* dist_t,
                               const float* w1, const float* b1,
                               const float* w2, float b2,
                               std::vector<int>& fa_q,
                               std::vector<int>& fa_t) {
    fa_q.clear(); fa_t.clear();
    for (int i = 0; i < qL; i++) if (aq[i] != 0) fa_q.push_back(i);
    for (int j = 0; j < tL; j++) if (at[j] != 0) fa_t.push_back(j);
    const int n = (int)std::min(fa_q.size(), fa_t.size());
    fa_q.resize(n); fa_t.resize(n);
    if (n == 0) return -1e300;
    double total = 0.0;
    for (int k = 0; k < n; k++)
        total += (double)lol_m0[(size_t)fa_q[k] * tL + fa_t[k]];
    // ds depends only on fa_q[a] - fa_q[b]: one log1p per delta
    static thread_local std::vector<float> ds_tab;
    ds_tab.resize(2 * qL + 1);
    for (int d = -qL; d <= qL; d++)
        ds_tab[d + qL] = std::copysign(1.0f, (float)d)
                         * std::log1p(std::fabs((float)d));
    for (int a = 0; a < n; a++) {
        const float* dqr = dist_q + (size_t)fa_q[a] * qL;
        const float* dtr = dist_t + (size_t)fa_t[a] * tL;
        const float* dst = ds_tab.data() + qL - fa_q[a];  // [-fa_q[b]]
        for (int b = 0; b < n; b++) {
            const float dq = dqr[fa_q[b]];
            if (!(dq > 0.0f)) continue;
            const float dd = std::fabs(dq - dtr[fa_t[b]]);
            const float ds = ds_tab[qL + fa_q[a] - fa_q[b]];
            total += (double)lol_net(dd, ds, w1, b1, w2, b2);
        }
        (void)dst;
    }
    return total;
}


// anchor-set LoL scoring for result assembly
// (ops/lolalign.py::_anchor_lol_score): per-anchor LoL vector (3Di+AA
// base + pairwise net sums), its self-hit variant (zero distance
// differences), and the derived totals. Outputs the matched anchor pair
// lists as well.
int lol_anchor_score_c(const int8_t* aq, const int8_t* at, int qL, int tL,
                       const float* lol_m0, const float* dist_q,
                       const float* dist_t, const float* w1,
                       const float* b1, const float* w2, float b2,
                       int64_t* fa_q_out, int64_t* fa_t_out,
                       int32_t* n_out, double* out3) {
    std::vector<int> fa_q, fa_t;
    for (int i = 0; i < qL; i++) if (aq[i] != 0) fa_q.push_back(i);
    for (int j = 0; j < tL; j++) if (at[j] != 0) fa_t.push_back(j);
    const int n = (int)std::min(fa_q.size(), fa_t.size());
    *n_out = n;
    if (n == 0) { out3[0] = -1e300; out3[1] = 0; out3[2] = 0; return 0; }
    for (int k = 0; k < n; k++) {
        fa_q_out[k] = fa_q[k];
        fa_t_out[k] = fa_t[k];
    }
    std::vector<double> lolv(n), sh(n, 0.0);
    for (int b = 0; b < n; b++)
        lolv[b] = (double)lol_m0[(size_t)fa_q[b] * tL + fa_t[b]];
    // ds and the self-hit net value depend only on fa_q[a] - fa_q[b]:
    // one log1p / one lol_net(0, ds) per index delta
    static thread_local std::vector<float> ds_tab, sh_tab;
    ds_tab.resize(2 * qL + 1);
    sh_tab.resize(2 * qL + 1);
    for (int d = -qL; d <= qL; d++) {
        const float ds = std::copysign(1.0f, (float)d)
                         * std::log1p(std::fabs((float)d));
        ds_tab[d + qL] = ds;
        sh_tab[d + qL] = lol_net(0.0f, ds, w1, b1, w2, b2);
    }
    for (int a = 0; a < n; a++) {
        const float* dqr = dist_q + (size_t)fa_q[a] * qL;
        const float* dtr = dist_t + (size_t)fa_t[a] * tL;
        for (int b = 0; b < n; b++) {
            const float dq = dqr[fa_q[b]];
            if (!(dq > 0.0f)) continue;
            const int di_ = qL + fa_q[a] - fa_q[b];
            const float dd = std::fabs(dq - dtr[fa_t[b]]);
            lolv[b] += (double)lol_net(dd, ds_tab[di_], w1, b1, w2, b2);
            sh[b] += (double)sh_tab[di_];
        }
    }
    double total = 0.0, max_lol = 0.0, norm_sh = 0.0;
    for (int b = 0; b < n; b++) {
        total += lolv[b];
        if (sh[b] != 0.0) {
            max_lol += lolv[b];
            const double r = lolv[b] / sh[b];
            if (std::isfinite(r)) norm_sh += r;
        }
    }
    out3[0] = total; out3[1] = max_lol; out3[2] = norm_sh;
    return 0;
}

// [L, L] pairwise C-alpha distance matrix (LoLalign's dist_q/dist_t;
// float32 arithmetic in numpy's reduce order so the values are
// bit-identical to ops/lolalign._dist_matrix). cutoff: >20 A -> 0.
__attribute__((optimize("fp-contract=off")))
int dist_matrix_c(const float* ca, int L, int cutoff, float* out) {
    for (int i = 0; i < L; i++) {
        const float xi = ca[3 * i], yi = ca[3 * i + 1], zi = ca[3 * i + 2];
        float* row = out + (size_t)i * L;
        row[i] = 0.0f;
        for (int j = i + 1; j < L; j++) {
            const float dx = xi - ca[3 * j];
            const float dy = yi - ca[3 * j + 1];
            const float dz = zi - ca[3 * j + 2];
            float d = std::sqrt(dx * dx + dy * dy + dz * dz);
            if (cutoff && d > 20.0f) d = 0.0f;
            row[j] = d;
            out[(size_t)j * L + i] = d;
        }
    }
    return 0;
}

// LoLalign initQuery self-score accumulation (ops/lolalign.py
// init_query:125-133): for every row i of dist_q, add the LoL net over
// (d_dist = dist_q[i, j] if > 0 else -1, d_seq = seq_dist(i, j) or -1)
// into the float64 lol_vec — same row order and f32->f64 accumulation as
// the numpy loop, so qq stays bit-identical.
__attribute__((optimize("fp-contract=off")))
int lol_init_query_vec(const float* dist_q, int L, const float* sd_table,
                       const float* w1, const float* b1, const float* w2,
                       float b2, double* lol_vec) {
    // sd_table: numpy-computed seq-dist values for diff = i - j in
    // [-(L-1), L-1] at index (L-1) + diff — keeps the float32 log1p
    // rounding identical to the python loop (numpy's SIMD log1p differs
    // from libm log1pf by 1 ulp on some inputs)
    for (int i = 0; i < L; i++) {
        const float* dr = dist_q + (size_t)i * L;
        for (int j = 0; j < L; j++) {
            if (!(dr[j] > 0.0f)) continue;
            const float ds = sd_table[L - 1 + i - j];
            float outv = b2;
            for (int h = 0; h < 3; h++)
                outv += w2[h] * std::max(0.0f, ds * w1[h] + b1[h]);
            lol_vec[j] += (double)outv;
        }
    }
    return 0;
}

int lolalign_c(const float* lol_m0, int qL, int tL, const float* dist_q,
               const float* dist_t, int sal, int multi_domain,
               const float* w1, const float* b1, const float* w2, float b2,
               double sa_go, double sa_ge, double sa_T, double lol_go,
               double lol_ge, double lol_T, double lol_min_p,
               int num_start_anchors, int seed_number, int8_t* out_aq,
               int8_t* out_at, int32_t* out_found) {
    *out_found = 0;
    const size_t NN = (size_t)qL * tL;
    // ---- start anchors from the global posterior ----
    static thread_local std::vector<double> P;
    P.resize(NN);
    double mp0;
    double _t0 = lol_now();
    fwbw_posterior_f32s(lol_m0, tL, qL, tL, sa_go, sa_ge, sa_T, P.data(),
                        &mp0);
    lol_prof[0] += lol_now() - _t0; _t0 = lol_now();

    static thread_local std::vector<float> lol_seed;
    lol_seed.assign(lol_m0, lol_m0 + NN);  // zeroed in bands
    const int NA = num_start_anchors;
    std::vector<int8_t> aq((size_t)NA * qL, 0), at((size_t)NA * tL, 0);
    std::vector<double> seed_scores(NA, 0.0);
    int n_seeds = 0;
    for (int s = 0; s < NA; s++) {
        const int r0 = sal, r1 = qL - sal, c0 = sal, c1 = tL - sal;
        if (r1 <= r0 || c1 <= c0) break;
        // argmax over the interior of P (row-major first max):
        // vectorized two-pass — max reduction, then first cell == max
        // (identical to the scalar strict-greater scan)
        int mi = r0, mj = c0;
        double best = -1.0;
        for (int i = r0; i < r1; i++) {
            const double* pr = P.data() + (size_t)i * tL;
#if defined(__AVX2__)
            __m256d vm = _mm256_set1_pd(best);
            int j = c0;
            for (; j + 4 <= c1; j += 4)
                vm = _mm256_max_pd(vm, _mm256_loadu_pd(pr + j));
            alignas(32) double lanes[4];
            _mm256_store_pd(lanes, vm);
            double rowmax = std::max(std::max(lanes[0], lanes[1]),
                                     std::max(lanes[2], lanes[3]));
            for (; j < c1; j++) rowmax = std::max(rowmax, pr[j]);
            if (rowmax > best) {
                for (int k = c0; k < c1; k++)
                    if (pr[k] == rowmax) { mi = i; mj = k; break; }
                best = rowmax;
            }
#else
            for (int j = c0; j < c1; j++)
                if (pr[j] > best) { best = pr[j]; mi = i; mj = j; }
#endif
        }
        // seed score: LoL over the seed diagonal (align:215-247)
        const int start_row = mi - std::min(mi, mj);
        const int start_col = mj - std::min(mi, mj);
        const int diag_len = std::min(qL - start_row, tL - start_col);
        std::vector<double> vec(diag_len);
        for (int k = 0; k < diag_len; k++)
            vec[k] = (double)lol_seed[(size_t)(start_row + k) * tL
                                      + start_col + k];
        for (int off = -sal; off < sal; off++) {
            const float* dqr = dist_q + (size_t)(mi + off) * qL;
            const float* dtr = dist_t + (size_t)(mj + off) * tL;
            for (int k = 0; k < diag_len; k++) {
                const float dq = dqr[start_row + k];
                if (!(dq > 0.0f)) continue;
                const float dd = std::fabs(dq - dtr[start_col + k]);
                const float ds = lol_seq_dist(mi + off, start_row + k);
                vec[k] += (double)lol_net(dd, ds, w1, b1, w2, b2);
            }
        }
        double cur = vec[0], bst = vec[0];
        for (int k = 1; k < diag_len; k++) {
            cur = std::max(vec[k], cur + vec[k]);
            bst = std::max(bst, cur);
        }
        seed_scores[s] = bst;
        for (int off = -sal; off <= sal; off++) {
            const int i = mi + off, j = mj + off;
            aq[(size_t)s * qL + i] = 2;
            at[(size_t)s * tL + j] = 2;
            P[(size_t)i * tL + j] = 0.0;
            lol_seed[(size_t)i * tL + j] = 0.0f;
        }
        n_seeds = s + 1;
    }
    lol_prof[1] += lol_now() - _t0;
    if (n_seeds == 0) return 0;

    // stable ascending argsort of seed scores (python argsort kind=stable)
    std::vector<int> order(NA);
    for (int s = 0; s < NA; s++) order[s] = s;
    std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
        return seed_scores[a] < seed_scores[b];
    });

    // ---- grow each of the top seeds ----
    static thread_local std::vector<double> prob;
    prob.assign(NN, 0.0);
    static thread_local std::vector<float> lol_work;
    lol_work.resize(NN);
    static thread_local std::vector<double> blockP;
    std::vector<std::vector<int8_t>> snap_q, snap_t;
    int min_idx = qL, max_idx = 0;
    for (int seed_iter = 0; seed_iter < seed_number; seed_iter++) {
        const int s = order[NA - seed_iter - 1];
        int8_t* aqs = aq.data() + (size_t)s * qL;
        int8_t* ats = at.data() + (size_t)s * tL;
        std::fill(lol_work.begin(), lol_work.end(), 0.0f);
        bool add_seq = false;
        for (int iteration = 0; iteration < 1000; iteration++) {
            int g[4] = {0, 0, 0, 0};
            // new-anchor pairs (state 2) are fixed for this iteration
            std::vector<int> anq, ant;
            for (int i = 0; i < qL; i++) if (aqs[i] == 2) anq.push_back(i);
            for (int j = 0; j < tL; j++) if (ats[j] == 2) ant.push_back(j);
            const int n = (int)std::min(anq.size(), ant.size());
            _t0 = lol_now();
            while (g[1] < qL && g[3] < tL) {
                if (!lol_calc_gap(aqs, ats, qL, tL, g)) break;
                for (int k = 0; k < n; k++) {
                    const int a_q = anq[k], a_t = ant[k];
                    const float* dqr = dist_q + (size_t)a_q * qL;
                    const float* dtr = dist_t + (size_t)a_t * tL;
                    for (int row = g[0]; row < g[1]; row++) {
                        const float dqv = dqr[row];
                        if (!(dqv > 0.0f)) continue;
                        if (row < min_idx) min_idx = row;
                        if (row + 1 > max_idx) max_idx = row + 1;
                        const float ds = lol_seq_dist(a_q, row);
                        const float h0 = ds * w1[0] + b1[0];
                        const float h1 = ds * w1[1] + b1[1];
                        const float h2 = ds * w1[2] + b1[2];
                        float* outr = lol_work.data() + (size_t)row * tL;
                        for (int col = g[2]; col < g[3]; col++) {
                            const float dd = std::fabs(dqv - dtr[col]);
                            float v = b2;
                            v += w2[0] * std::max(0.0f, h0 + dd * w1[3]);
                            v += w2[1] * std::max(0.0f, h1 + dd * w1[4]);
                            v += w2[2] * std::max(0.0f, h2 + dd * w1[5]);
                            outr[col] += v;
                        }
                    }
                }
            }
            lol_prof[2] += lol_now() - _t0;
            for (int i = 0; i < qL; i++) if (aqs[i] == 2) aqs[i] = 1;
            for (int j = 0; j < tL; j++) if (ats[j] == 2) ats[j] = 1;

            // forward-backward over the gap segments
            double max_p_iter = (iteration == 0) ? 0.5 : lol_min_p;
            _t0 = lol_now();
            g[0] = min_idx; g[1] = 0; g[2] = 0; g[3] = 0;
            while (g[1] < max_idx && g[3] < tL) {
                if (!lol_calc_gap(aqs, ats, max_idx, tL, g)) break;
                const int rows = g[1] - g[0], cols = g[3] - g[2];
                if (rows <= 0 || cols <= 0) continue;
                blockP.resize((size_t)rows * cols);
                double mp;
                fwbw_posterior_f32s(
                    lol_work.data() + (size_t)g[0] * tL + g[2], tL, rows,
                    cols, lol_go, lol_ge, lol_T, blockP.data(), &mp);
                if (mp > max_p_iter) max_p_iter = mp;
                for (int i = 0; i < rows; i++)
                    for (int j = 0; j < cols; j++)
                        prob[(size_t)(g[0] + i) * tL + g[2] + j] =
                            blockP[(size_t)i * cols + j];
            }

            lol_prof[3] += lol_now() - _t0; _t0 = lol_now();
            // anchor qualifying pairs
            int new_anchors = 0;
            g[0] = min_idx; g[1] = 0; g[2] = 0; g[3] = 0;
            const double thr = max_p_iter - 0.1;
            while (g[1] < max_idx && g[3] < tL) {
                if (!lol_calc_gap(aqs, ats, max_idx, tL, g)) break;
                for (int i = g[0]; i < g[1]; i++) {
                    if (aqs[i] != 0) continue;
                    const double* pr = prob.data() + (size_t)i * tL;
                    for (int j = g[2]; j < g[3]; j++) {
                        if (pr[j] > thr && ats[j] == 0) {
                            aqs[i] = 2;
                            ats[j] = 2;
                            new_anchors++;
                            break;
                        }
                    }
                }
            }
            lol_prof[4] += lol_now() - _t0;
            if (new_anchors == 0) {
                if (multi_domain && !add_seq) {
                    // multi-domain extension (align:281-322)
                    add_seq = true;
                    snap_q.emplace_back(aqs, aqs + qL);
                    snap_t.emplace_back(ats, ats + tL);
                    min_idx = 0; max_idx = qL;
                    for (size_t k = 0; k < NN; k++) lol_work[k] += lol_m0[k];
                    continue;
                }
                break;
            }
        }
    }

    // ---- pick the best anchor set by total LoL score ----
    _t0 = lol_now();
    double best_score = -1e300;
    int best_seed = -1, best_snap = -1;
    std::vector<int> fa_q, fa_t;
    for (int k = 0; k < seed_number; k++) {
        const int s = order[NA - k - 1];
        const double tot = lol_anchor_total(
            aq.data() + (size_t)s * qL, at.data() + (size_t)s * tL, qL, tL,
            lol_m0, dist_q, dist_t, w1, b1, w2, b2, fa_q, fa_t);
        if (tot > best_score) { best_score = tot; best_seed = s; best_snap = -1; }
    }
    for (size_t k = 0; k < snap_q.size(); k++) {
        const double tot = lol_anchor_total(
            snap_q[k].data(), snap_t[k].data(), qL, tL, lol_m0, dist_q,
            dist_t, w1, b1, w2, b2, fa_q, fa_t);
        if (tot > best_score) { best_score = tot; best_snap = (int)k; }
    }
    lol_prof[5] += lol_now() - _t0;
    if (best_snap >= 0) {
        std::memcpy(out_aq, snap_q[best_snap].data(), qL);
        std::memcpy(out_at, snap_t[best_snap].data(), tL);
    } else if (best_seed >= 0) {
        std::memcpy(out_aq, aq.data() + (size_t)best_seed * qL, qL);
        std::memcpy(out_at, at.data() + (size_t)best_seed * tL, tL);
    } else {
        return 0;
    }
    *out_found = 1;
    return 0;
}

// LoLalign lolMatrix block accumulation (ops/lolalign.py::_lol_matrix_block;
// reference src/strucclustutils/LoLAlign.cpp lolMatrix): for every new
// anchor pair (aq[k], at[k]) add the 2->3->1 ReLU LoL net score of
// |dist_q[aq,row] - dist_t[at,col]| and the log sequence offset to the
// unanchored block rows [g0,g1) x cols [g2,g3) of lol_m. Rows with
// dist_q <= 0 contribute nothing. Also reports the min/max contributing
// row (the python caller tracks the touched row range). The inner column
// loop is vertical: fabs + 3 fused mul-add + relu per cell.
int lol_block(const float* dist_q, int qL, const float* dist_t, int tL,
              const int64_t* anch_q, const int64_t* anch_t, int n_anch,
              int g0, int g1, int g2, int g3,
              const float* w1, const float* b1, const float* w2, float b2,
              float* lol_m, int64_t* minmax_row) {
    int64_t min_row = minmax_row[0], max_row = minmax_row[1];
    const float w10 = w1[0], w11 = w1[1], w12 = w1[2];  // d_seq weights
    const float w20 = w1[3], w21 = w1[4], w22 = w1[5];  // d_dist weights
    for (int k = 0; k < n_anch; k++) {
        const int aq = (int)anch_q[k];
        const int at = (int)anch_t[k];
        const float* dq_row = dist_q + (size_t)aq * qL;
        const float* dt_row = dist_t + (size_t)at * tL;
        for (int row = g0; row < g1; row++) {
            const float dqv = dq_row[row];
            if (!(dqv > 0.0f)) continue;
            if (row < min_row) min_row = row;
            if (row + 1 > max_row) max_row = row + 1;
            const float diff = (float)aq - (float)row;
            const float ds = std::copysign(1.0f, diff)
                             * std::log1p(std::fabs(diff));
            const float h0 = ds * w10 + b1[0];
            const float h1 = ds * w11 + b1[1];
            const float h2 = ds * w12 + b1[2];
            float* out = lol_m + (size_t)row * tL;
            for (int col = g2; col < g3; col++) {
                const float dd = std::fabs(dqv - dt_row[col]);
                float s = b2;
                s += w2[0] * std::max(0.0f, h0 + dd * w20);
                s += w2[1] * std::max(0.0f, h1 + dd * w21);
                s += w2[2] * std::max(0.0f, h2 + dd * w22);
                out[col] += s;
            }
        }
    }
    minmax_row[0] = min_row;
    minmax_row[1] = max_row;
    return 0;
}

// C-alpha LDDT over the aligned columns of one hit (src/commons/LDDT.cpp
// semantics as re-derived in ops/lddt.py): query-side <15A pairs scored
// 0.25 * #(|dq - dt| < {0.5,1,2,4}), column-normalized by the query
// residue's FULL-chain neighbor degree (passed in), averaged over columns
// with neighbors. qa/ta: [m*3] float32 aligned coords; deg: [m] float32.
// out2 = [avg, score_length]; per_col: [m].
int lddt_aligned(const float* qa, const float* ta, const float* deg, int m,
                 double* out2, float* per_col) {
    if (m <= 0) { out2[0] = 0.0; out2[1] = 0.0; return 0; }
    std::vector<float> col_sum(m, 0.0f);
    // two passes per row: a branchless distance/score fill (vectorizes —
    // the cutoff becomes a select instead of a skip; adding the masked
    // 0.0 terms to col_sum is an exact float identity, so results stay
    // bit-identical to the branchy original) then the scalar accumulation
    // in the original j order
    static thread_local std::vector<float> prow;
    prow.resize(m);
    float* p = prow.data();
    for (int i = 0; i < m; i++) {
        const float qx = qa[3 * i], qy = qa[3 * i + 1], qz = qa[3 * i + 2];
        const float tx = ta[3 * i], ty = ta[3 * i + 1], tz = ta[3 * i + 2];
        for (int j = i + 1; j < m; j++) {
            float dxq = qx - qa[3 * j];
            float dyq = qy - qa[3 * j + 1];
            float dzq = qz - qa[3 * j + 2];
            float dq = std::sqrt(dxq * dxq + dyq * dyq + dzq * dzq);
            float dxt = tx - ta[3 * j];
            float dyt = ty - ta[3 * j + 1];
            float dzt = tz - ta[3 * j + 2];
            float dt = std::sqrt(dxt * dxt + dyt * dyt + dzt * dzt);
            float dl = std::fabs(dq - dt);
            float pv = 0.25f
                * ((dl < 0.5f) + (dl < 1.0f) + (dl < 2.0f) + (dl < 4.0f));
            p[j] = (dq < 15.0f) ? pv : 0.0f;
        }
        for (int j = i + 1; j < m; j++) {
            col_sum[i] += p[j];
            col_sum[j] += p[j];
        }
    }
    double total = 0.0;
    int score_len = 0;
    for (int i = 0; i < m; i++) {
        if (deg[i] > 0.0f) {
            float v = col_sum[i] / std::max(deg[i], 1.0f);
            per_col[i] = v;
            total += v;
            score_len++;
        } else {
            per_col[i] = 0.0f;
        }
    }
    out2[0] = score_len ? total / score_len : 0.0;
    out2[1] = score_len;
    return 0;
}



// SIMD float exp for the ES fill of the LoLalign-internal FwBw variant:
// Cephes-style range reduction + degree-5 polynomial, ~1e-7 relative —
// the DP state stays double, only the per-cell exp(score/T) inputs are
// float-accurate. The exported fwbw_posterior_c keeps libm exp (its
// brute-force parity bound is 1e-9).
#if defined(__AVX2__)
static inline __m256 expf8(__m256 x) {
    const __m256 hi = _mm256_set1_ps(87.0f), lo = _mm256_set1_ps(-87.0f);
    x = _mm256_min_ps(_mm256_max_ps(x, lo), hi);
    const __m256 log2e = _mm256_set1_ps(1.44269504088896341f);
    const __m256 c1 = _mm256_set1_ps(0.693359375f);
    const __m256 c2 = _mm256_set1_ps(-2.12194440e-4f);
    __m256 fx = _mm256_mul_ps(x, log2e);
    fx = _mm256_round_ps(fx, _MM_FROUND_TO_NEAREST_INT | _MM_FROUND_NO_EXC);
    x = _mm256_sub_ps(x, _mm256_mul_ps(fx, c1));
    x = _mm256_sub_ps(x, _mm256_mul_ps(fx, c2));
    const __m256 z = _mm256_mul_ps(x, x);
    __m256 y = _mm256_set1_ps(1.9875691500e-4f);
    y = _mm256_add_ps(_mm256_mul_ps(y, x), _mm256_set1_ps(1.3981999507e-3f));
    y = _mm256_add_ps(_mm256_mul_ps(y, x), _mm256_set1_ps(8.3334519073e-3f));
    y = _mm256_add_ps(_mm256_mul_ps(y, x), _mm256_set1_ps(4.1665795894e-2f));
    y = _mm256_add_ps(_mm256_mul_ps(y, x), _mm256_set1_ps(1.6666665459e-1f));
    y = _mm256_add_ps(_mm256_mul_ps(y, x), _mm256_set1_ps(5.0000001201e-1f));
    y = _mm256_add_ps(_mm256_mul_ps(y, z), x);
    y = _mm256_add_ps(y, _mm256_set1_ps(1.0f));
    const __m256i n = _mm256_cvtps_epi32(fx);
    const __m256i pow2 = _mm256_slli_epi32(
        _mm256_add_epi32(n, _mm256_set1_epi32(127)), 23);
    return _mm256_mul_ps(y, _mm256_castsi256_ps(pow2));
}
#endif

// out[k] = exp(s[k] * invT); fast = SIMD float exp (LoLalign internal)
static void fwbw_exp_fill(const double* s, size_t n, double invT,
                          double* out, int fast) {
#if defined(__AVX2__)
    if (fast) {
        size_t k = 0;
        const __m256 invTv = _mm256_set1_ps((float)invT);
        for (; k + 8 <= n; k += 8) {
            const __m128 a = _mm256_cvtpd_ps(_mm256_loadu_pd(s + k));
            const __m128 b = _mm256_cvtpd_ps(_mm256_loadu_pd(s + k + 4));
            const __m256 x = _mm256_mul_ps(_mm256_set_m128(b, a), invTv);
            const __m256 e = expf8(x);
            _mm256_storeu_pd(out + k,
                             _mm256_cvtps_pd(_mm256_castps256_ps128(e)));
            _mm256_storeu_pd(out + k + 4,
                             _mm256_cvtps_pd(_mm256_extractf128_ps(e, 1)));
        }
        for (; k < n; k++) out[k] = (double)std::exp((float)(s[k] * invT));
        return;
    }
#endif
    (void)fast;
    for (size_t k = 0; k < n; k++) out[k] = std::exp(s[k] * invT);
}

}  // extern "C" — the templated FwBw forward needs C++ linkage

// ---------------------------------------------------------------------------
// FwBw posterior in scaled linear space (ops/fwbw.py::fwbw_posterior;
// the reference's Fwbw.cpp uses the same rescaled-probability
// formulation family, lib/mmseqs/src/alignment/Fwbw.cpp). State is kept
// as probabilities scaled by exp(-C[b]) with one log scale per column
// block per row: comparisons only ever span one block's content, and the
// two cross-block terms (the serial E carry and the diagonal feed at a
// block's first column) are adjusted by explicit exp(dC) factors, so
// alignments living in different column regions never suppress each
// other. Values more than ~700 log-units under their own block scale
// underflow to zero — they could only produce posteriors below double
// range anyway. Recurrences (Go = exp(go'), Ge = exp(ge')):
//   m(i,j) = ES(i,j) * (m(i-1,j-1) + e(i-1,j-1) + f(i-1,j-1) + 1)
//   e(i,j) = Go * m(i,j-1) + Ge * e(i,j-1)
//   f(i,j) = Go * m(i-1,j) + Ge * f(i-1,j)
//   Z = sum_ij m_fwd;  P = m_fwd * m_bwd / ES / Z

static const int FWBW_BLK = 128;
static const double FWBW_RENORM = 1e100;

// One scaled forward pass. ES: [L1*L2] row-major exp(score/T).
// Out: Ms [L1*L2] scaled m rows, C [L1*nb] per-(row, block) log scales.
// Value type T = double (exported posterior, 1e-9-exact vs brute force)
// or float (LoLalign-internal blocks: posteriors only gate anchoring
// thresholds ~0.6, so float state with a ~70-log-unit per-block window
// is plenty).
template <typename T>
static void fwbw_forward_scaled(const T* ES, int L1, int L2,
                                double Go, double Ge, T* Ms,
                                double* C) {
    const double RENORM = sizeof(T) == sizeof(float) ? 1e15 : FWBW_RENORM;
    const int nb = (L2 + FWBW_BLK - 1) / FWBW_BLK;
    std::vector<T> m_prev(L2, (T)0), e_prev(L2, (T)0), f_prev(L2, (T)0);
    std::vector<T> e_row(L2), f_row(L2);
    std::vector<double> c_row(nb, 0.0);   // current row scales (inherited)
    for (int i = 0; i < L1; i++) {
        T* m_row = Ms + (size_t)i * L2;
        const T* es = ES + (size_t)i * L2;
        for (int b = 0; b < nb; b++) {
            const int j0 = b * FWBW_BLK;
            const int j1 = std::min(L2, j0 + FWBW_BLK);
            // equalize scales upward at the boundary: when the left block
            // carries a larger scale, lift this block to it (rescaling the
            // carried state down — exact up to rounding) so the cross
            // factor below never exceeds 1 and cannot overflow
            if (b > 0 && c_row[b - 1] > c_row[b]) {
                const T down = (T)std::exp(c_row[b] - c_row[b - 1]);
                for (int j = j0; j < j1; j++) {
                    m_prev[j] *= down;
                    e_prev[j] *= down;
                    f_prev[j] *= down;
                }
                c_row[b] = c_row[b - 1];
            }
            const T fresh = (T)std::exp(-c_row[b]);
            // cross-block factor for the j0 column's left-neighbor terms
            const T xadj =
                (b > 0) ? (T)std::exp(c_row[b - 1] - c_row[b]) : (T)0;
            // f: vertical, no left deps — vectorizable over the block
            if (i > 0) {
                for (int j = j0; j < j1; j++)
                    f_row[j] = (T)Go * m_prev[j] + (T)Ge * f_prev[j];
            } else {
                for (int j = j0; j < j1; j++) f_row[j] = (T)0;
            }
            // m: needs (i-1, j-1) — vectorizable; j0 handled separately
            if (i > 0) {
                if (j0 == 0) {
                    m_row[0] = es[0] * fresh;
                } else {
                    m_row[j0] = es[j0]
                        * ((m_prev[j0 - 1] + e_prev[j0 - 1]
                            + f_prev[j0 - 1]) * xadj + fresh);
                }
                for (int j = j0 + 1; j < j1; j++)
                    m_row[j] = es[j]
                        * (m_prev[j - 1] + e_prev[j - 1] + f_prev[j - 1]
                           + fresh);
            } else {
                for (int j = j0; j < j1; j++) m_row[j] = es[j] * fresh;
            }
        }
        // e: serial left-to-right across the whole row with per-boundary
        // scale adjustment (uses m of THIS row)
        {
            T carry_e = (T)0, carry_m = (T)0;
            for (int b = 0; b < nb; b++) {
                const int j0 = b * FWBW_BLK;
                const int j1 = std::min(L2, j0 + FWBW_BLK);
                if (b > 0) {
                    const T xadj = (T)std::exp(c_row[b - 1] - c_row[b]);
                    carry_e *= xadj;
                    carry_m *= xadj;
                }
                for (int j = j0; j < j1; j++) {
                    const T e = (T)Go * carry_m + (T)Ge * carry_e;
                    e_row[j] = e;
                    carry_e = e;
                    carry_m = m_row[j];
                }
            }
        }
        // record scales, then renormalize drifting blocks for the next row
        for (int b = 0; b < nb; b++) {
            const int j0 = b * FWBW_BLK;
            const int j1 = std::min(L2, j0 + FWBW_BLK);
            C[(size_t)i * nb + b] = c_row[b];
            T mx = (T)0;
            for (int j = j0; j < j1; j++) {
                mx = std::max(mx, m_row[j]);
                mx = std::max(mx, e_row[j]);
                mx = std::max(mx, f_row[j]);
            }
            if ((double)mx > RENORM
                || ((double)mx > 0.0 && (double)mx < 1.0 / RENORM)) {
                // Ms stays in the scale recorded for THIS row; only the
                // carried state renormalizes (the next row re-inherits)
                const T r = (T)(1.0 / (double)mx);
                for (int j = j0; j < j1; j++) {
                    m_prev[j] = m_row[j] * r;
                    e_prev[j] = e_row[j] * r;
                    f_prev[j] = f_row[j] * r;
                }
                c_row[b] += std::log((double)mx);
            } else {
                for (int j = j0; j < j1; j++) {
                    m_prev[j] = m_row[j];
                    e_prev[j] = e_row[j];
                    f_prev[j] = f_row[j];
                }
            }
        }
    }
}

// ---------------------------------------------------------------------------
// FwBw log-space forward match matrix (ops/fwbw.py _forward_m; reference
// lib/mmseqs/src/alignment/Fwbw.cpp forward pass). Same op order as the
// numpy implementation so results match to the ulp.

static inline double laexp(double a, double b) {
    // numpy logaddexp semantics
    if (a == b) return a + 0.6931471805599453;  // log(2)
    double d = a - b;
    if (d > 0) return a + log1p(exp(-d));
    if (d <= 0) return b + log1p(exp(d));
    return a + b;  // propagates NaN
}




extern "C" {


// Full posterior: forward + backward (forward on the reversed matrix) +
// stable combine. s: [L1*L2] raw scores; P out [L1*L2]; *max_p out.
// core over a PREFILLED thread_local ES (fwbw_es() below): wrappers fill
// exp(score/T) from double or strided-float inputs without extra copies
static std::vector<double>& fwbw_es_buf() {
    static thread_local std::vector<double> ES;
    return ES;
}

static int fwbw_posterior_core(int L1, int L2, double go, double ge,
                               double temperature, double* P,
                               double* max_p) {
    if (L1 <= 0 || L2 <= 0) { *max_p = 0.0; return 0; }
    const double T = temperature;
    const double Go = std::exp(go / T), Ge = std::exp(ge / T);
    const int nb = (L2 + FWBW_BLK - 1) / FWBW_BLK;
    const size_t NN = (size_t)L1 * L2;
    std::vector<double>& ES = fwbw_es_buf();
    static thread_local std::vector<double> ESr, Mf, Mb, Cf, Cb;
    ESr.resize(NN); Mf.resize(NN); Mb.resize(NN);
    Cf.resize((size_t)L1 * nb); Cb.resize((size_t)L1 * nb);
    for (int i = 0; i < L1; i++)
        for (int j = 0; j < L2; j++)
            ESr[(size_t)i * L2 + j] =
                ES[(size_t)(L1 - 1 - i) * L2 + (L2 - 1 - j)];
    fwbw_forward_scaled(ES.data(), L1, L2, Go, Ge, Mf.data(), Cf.data());
    fwbw_forward_scaled(ESr.data(), L1, L2, Go, Ge, Mb.data(), Cb.data());
    // logZ = logsumexp over (i, b) of log(sum_block Mf) + Cf
    double zmax = -1e300;
    std::vector<double> part((size_t)L1 * nb, -1e300);
    for (int i = 0; i < L1; i++)
        for (int b = 0; b < nb; b++) {
            const int j0 = b * FWBW_BLK, j1 = std::min(L2, j0 + FWBW_BLK);
            double sblk = 0.0;
            const double* mr = Mf.data() + (size_t)i * L2;
            for (int j = j0; j < j1; j++) sblk += mr[j];
            if (sblk > 0.0) {
                const double v = std::log(sblk) + Cf[(size_t)i * nb + b];
                part[(size_t)i * nb + b] = v;
                if (v > zmax) zmax = v;
            }
        }
    if (zmax <= -1e300) {  // no mass at all
        std::memset(P, 0, sizeof(double) * NN);
        *max_p = 0.0;
        return 0;
    }
    double zsum = 0.0;
    for (size_t k = 0; k < part.size(); k++)
        if (part[k] > -1e300) zsum += std::exp(part[k] - zmax);
    const double logZ = zmax + std::log(zsum);
    // P(i,j) = Mf(i,j) * Mb(L1-1-i, L2-1-j) / ES(i,j)
    //          * exp(Cf[i][j/B] + Cb[L1-1-i][(L2-1-j)/B] - logZ)
    double mp = 0.0;
    for (int i = 0; i < L1; i++) {
        const double* mfr = Mf.data() + (size_t)i * L2;
        const double* mbr = Mb.data() + (size_t)(L1 - 1 - i) * L2;
        const double* cfr = Cf.data() + (size_t)i * nb;
        const double* cbr = Cb.data() + (size_t)(L1 - 1 - i) * nb;
        const double* esr = ES.data() + (size_t)i * L2;
        double* pr = P + (size_t)i * L2;
        int j = 0;
        while (j < L2) {
            const int bf = j / FWBW_BLK;
            const int jr = L2 - 1 - j;
            const int bb = jr / FWBW_BLK;
            // segment where both block indices stay constant
            int jend = std::min((bf + 1) * FWBW_BLK, L2);
            const int jr_lo = bb * FWBW_BLK;       // jr decreases with j
            jend = std::min(jend, j + (jr - jr_lo) + 1);
            const double arg = cfr[bf] + cbr[bb] - logZ;
            if (arg < 690.0) {
                const double fac = std::exp(arg);
                for (; j < jend; j++) {
                    const double p = mfr[j] * mbr[L2 - 1 - j];
                    const double v = (p > 0.0) ? p / esr[j] * fac : 0.0;
                    pr[j] = v;
                    if (v > mp) mp = v;
                }
            } else {
                // enormous scale gap: combine in log space cell by cell
                for (; j < jend; j++) {
                    const double p = mfr[j] * mbr[L2 - 1 - j];
                    double v = 0.0;
                    if (p > 0.0)
                        v = std::exp(std::log(p) - std::log(esr[j]) + arg);
                    pr[j] = v;
                    if (v > mp) mp = v;
                }
            }
        }
    }
    *max_p = mp;
    return 0;
}

static int fwbw_posterior_impl(const double* s, int L1, int L2, double go,
                               double ge, double temperature, double* P,
                               double* max_p, int fast_exp) {
    if (L1 > 0 && L2 > 0) {
        std::vector<double>& ES = fwbw_es_buf();
        ES.resize((size_t)L1 * L2);
        fwbw_exp_fill(s, (size_t)L1 * L2, 1.0 / temperature, ES.data(),
                      fast_exp);
    }
    return fwbw_posterior_core(L1, L2, go, ge, temperature, P, max_p);
}

// strided float scores (a sub-rectangle of a row-major float matrix):
// fills ES directly with the SIMD exp — no intermediate double copy
static int fwbw_posterior_f32s(const float* s, int stride, int L1, int L2,
                               double go, double ge, double temperature,
                               double* P, double* max_p) {
    if (L1 > 0 && L2 > 0) {
        std::vector<double>& ES = fwbw_es_buf();
        ES.resize((size_t)L1 * L2);
        const double invT = 1.0 / temperature;
        static thread_local std::vector<double> rowtmp;
        rowtmp.resize(L2);
        for (int i = 0; i < L1; i++) {
            const float* sr = s + (size_t)i * stride;
            for (int j = 0; j < L2; j++) rowtmp[j] = (double)sr[j];
            fwbw_exp_fill(rowtmp.data(), (size_t)L2, invT,
                          ES.data() + (size_t)i * L2, 1);
        }
    }
    return fwbw_posterior_core(L1, L2, go, ge, temperature, P, max_p);
}

int fwbw_posterior_c(const double* s, int L1, int L2, double go, double ge,
                     double temperature, double* P, double* max_p) {
    return fwbw_posterior_impl(s, L1, L2, go, ge, temperature, P, max_p, 0);
}

int fwbw_forward_m(const double* s, int L1, int L2, double go, double ge,
                   double* M) {
    const double NEGV = -1e30;
    std::vector<double> E_prev(L2, NEGV), F_prev(L2, NEGV), M_prev(L2, NEGV);
    std::vector<double> diag(L2), g(L2), E_row(L2), F_row(L2);
    for (int i = 0; i < L1; i++) {
        double* M_row = M + (size_t)i * L2;
        if (i > 0) {
            diag[0] = 0.0;
            for (int j = 1; j < L2; j++) {
                double prev = laexp(laexp(M_prev[j - 1], E_prev[j - 1]),
                                    F_prev[j - 1]);
                diag[j] = laexp(prev, 0.0);
            }
        } else {
            std::fill(diag.begin(), diag.end(), 0.0);
        }
        const double* srow = s + (size_t)i * L2;
        for (int j = 0; j < L2; j++) M_row[j] = srow[j] + diag[j];
        // E(i, j): within-row gaps over M(i, k<j)
        double run = M_row[0];  // g[0]
        E_row[0] = NEGV;
        for (int j = 1; j < L2; j++) {
            E_row[j] = (j - 1) * ge + go + run;
            run = laexp(run, M_row[j] - j * ge);
        }
        if (i > 0) {
            for (int j = 0; j < L2; j++)
                F_row[j] = laexp(go + M_prev[j], ge + F_prev[j]);
        } else {
            std::fill(F_row.begin(), F_row.end(), NEGV);
        }
        std::memcpy(M_prev.data(), M_row, sizeof(double) * L2);
        std::swap(E_prev, E_row);
        std::swap(F_prev, F_row);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Float-exact TM/LDDT engines (native/tm_ref.hpp): bit-identical to the
// reference binary's TMaligner::computeAppoximateTMscore and
// LDDTCalculator (validated 300/300 bitwise vs the reference's own
// compiled objects, tools/native_tests/test_tm_ref.cpp). These power the
// structure-bit score so the sqrt(lddt*tm) scaling matches byte-for-byte.

// xtm/ytm: [n,3] float32 row-major aligned pairs (x = target, y = query —
// the TMaligner invmap convention). out14 = [tm, rmsd, u(9), t(3)].
int tm_score_aligned_ref(const float* xtm, const float* ytm, int n,
                         int norm_len, double* out14) {
    if (n < 1) return -1;
    float u[3][3], t[3], rmsd = 0;
    double tm = tmref::tm_approx_ref(xtm, ytm, n, norm_len, u, t, &rmsd);
    out14[0] = tm;
    out14[1] = rmsd;
    for (int a = 0; a < 3; a++)
        for (int b = 0; b < 3; b++) out14[2 + 3 * a + b] = u[a][b];
    for (int a = 0; a < 3; a++) out14[11 + a] = t[a];
    return 0;
}

// the reference's per-pair distance (LDDT.cpp:6-12): float accumulation
// in loop shape so the compiler contracts it exactly like the reference's
// build (LDDT.cpp compiles WITH default -ffp-contract, unlike tmalign)
static inline float lddt_dist_ref(const float* a, const float* b) {
    float D2 = 0;
    for (int i = 0; i < 3; i++) D2 += (a[i] - b[i]) * (a[i] - b[i]);
    return sqrt(D2);
}

// per-residue <15A neighbor counts over the FULL query
// (LDDTCalculator::initQuery norm accumulation, LDDT.cpp:100-116)
int lddt_degree_ref(const float* q, int L, float* out_deg) {
    for (int col = 0; col < L; col++) {
        float n = 0;
        for (int row = 0; row < L; row++) {
            float d = lddt_dist_ref(q + 3 * row, q + 3 * col);
            n += (row != col) && (d < 15.0f);
        }
        out_deg[col] = n;
    }
    return 0;
}

// float-exact LDDT over aligned pairs: qa/ta [m,3] f32, deg = full-query
// neighbor counts per aligned column. The reference's grid only changes
// ITERATION ORDER; every added score is an exact multiple of 0.25 so the
// accumulation is order-insensitive, and the remaining float ops (dist,
// the 1/deg reciprocal multiply, the final float sum / float len) are
// reproduced exactly (LDDT.cpp:157-215, LDDT.h:102-119).
int lddt_aligned_ref(const float* qa, const float* ta, const float* deg,
                     int m, double* out2, float* per_col) {
    if (m <= 0) {
        out2[0] = 0.0;
        out2[1] = 0.0;
        return 0;
    }
    std::vector<float> col_sum(m, 0.0f);
    for (int i = 0; i < m; i++) {
        for (int j = i + 1; j < m; j++) {
            float dq = lddt_dist_ref(qa + 3 * i, qa + 3 * j);
            if (!(dq < 15.0f)) continue;
            float dt = lddt_dist_ref(ta + 3 * i, ta + 3 * j);
            float d_l = std::fabs(dq - dt);
            float score =
                0.25 * ((d_l < 0.5) + (d_l < 1.0) + (d_l < 2.0) + (d_l < 4.0));
            col_sum[i] += score;
            col_sum[j] += score;
        }
    }
    float sum = 0.0;
    int score_len = m;
    for (int i = 0; i < m; i++) {
        if (deg[i] > 0.0f) {
            float norm = 1 / deg[i];  // the reference's reciprocal-multiply
            float v = col_sum[i] * norm;
            per_col[i] = v;
            sum += v;
        } else {
            // reference: 0 * INF = NaN -> excluded from scoreLength
            per_col[i] = 0.0f;
            score_len--;
        }
    }
    out2[0] = score_len ? (double)(sum / (float)score_len) : 0.0;
    out2[1] = score_len;
    return 0;
}

// ---------------------------------------------------------------------------
// Block-aligner backtrace (the reference's DEFAULT non-profile path:
// StructureSmithWaterman::alignStartPosBacktraceBlock,
// StructureSmithWaterman.cpp:369-527, algorithm in native/block_aligner.hpp).
// One call per query batch; per hit the reversed, cropped query/target go
// through the exponential block-size search. out_len semantics:
//   >= 0  ops length — success, start/ident/ops filled
//   -2    block search could not reproduce the target score — the caller
//         must emit the reference's failure row (score1 = UINT32_MAX path:
//         qStart/dbStart = -1, empty backtrace; structurealign.cpp:78-89,
//         where the unpatched `align.score1 == UINT32_MAX` check is dead
//         code so the failed alignTmp is used as-is)
int batch_recover_block(
    const int8_t* q_aa_rev, const int8_t* q_ss_rev, const int16_t* bias_rev,
    int Lq, const int8_t* mat_aa, const int8_t* mat_ss, const int8_t* db_aa,
    const int8_t* db_ss, const int64_t* t_off, const int32_t* t_end,
    const int32_t* score, const int32_t* q_end, int n_hits, int gap_open,
    int gap_extend, int32_t* out_qstart, int32_t* out_tstart,
    int32_t* out_ident, char* out_ops, const int64_t* ops_off,
    int32_t* out_len) {
    static thread_local ba::BlockDriver drv;
    ba::Mat27 maa, mss;
    for (int a = 0; a < 21; a++)
        for (int b = 0; b < 21; b++) {
            maa.m[(size_t)a * 32 + b] = mat_aa[a * 21 + b];
            mss.m[(size_t)a * 32 + b] = mat_ss[a * 21 + b];
        }
    std::vector<uint8_t> rt_aa, rt_ss;
    std::string ops;
    for (int hit = 0; hit < n_hits; hit++) {
        const int qe = q_end[hit];
        const int te = t_end[hit];
        if (qe < 0 || te < 0 || qe >= Lq) {
            out_len[hit] = -2;
            continue;
        }
        const int q_aln = qe + 1;
        const int t_aln = te + 1;
        const int q_start_pos = Lq - q_aln;  // offset into the reversed query
        const int8_t* taa = db_aa + t_off[hit];
        const int8_t* tss = db_ss + t_off[hit];
        rt_aa.resize(t_aln);
        rt_ss.resize(t_aln);
        for (int j = 0; j < t_aln; j++) {
            rt_aa[j] = (uint8_t)taa[te - j];
            rt_ss[j] = (uint8_t)tss[te - j];
        }
        int32_t qc = 0, tc = 0;
        uint32_t ids = 0;
        ops.clear();
        bool ok = drv.align(
            (const uint8_t*)q_aa_rev + q_start_pos,
            (const uint8_t*)q_ss_rev + q_start_pos, bias_rev + q_start_pos,
            q_aln, rt_aa.data(), rt_ss.data(), t_aln, maa, mss, gap_open,
            gap_extend, score[hit], ops, &qc, &tc, &ids);
        if (!ok) {
            out_len[hit] = -2;
            continue;
        }
        out_qstart[hit] = qe + 1 - qc;
        out_tstart[hit] = te + 1 - tc;
        out_ident[hit] = (int32_t)ids;
        std::memcpy(out_ops + ops_off[hit], ops.data(), ops.size());
        out_len[hit] = (int32_t)ops.size();
    }
    return 0;
}

}  // extern "C"
