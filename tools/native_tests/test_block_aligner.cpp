// A/B harness for the block-aligner core (native/block_aligner.hpp):
//
// 1. Brute-force LOCAL Smith-Waterman (dual-alphabet affine, exactly the
//    pipeline's forward scoring semantics) finds the best score + end cell.
// 2. BlockDriver::align on the reversed, cropped sequences must reproduce
//    that score (the exponential block-size search from
//    StructureSmithWaterman.cpp:456-468).
// 3. The returned forward-order backtrace is REscored cell by cell with
//    affine gap rules — the path must be valid, within bounds, and sum to
//    the target score. This pins cigar/trace-layout correctness without
//    needing the Rust crate.
//
// Build: g++ -O2 -std=c++17 -o /tmp/test_ba test_block_aligner.cpp && /tmp/test_ba
#include <cassert>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

#include "../../native/block_aligner.hpp"

using ba::Mat27;

struct SW {
    int32_t score;
    int qend, tend;
};

// forward local SW: H(i,j) = max(0, H(i-1,j-1)+s, E, F) with gap len l
// costing open + (l-1)*extend; ties: first (smallest) tend column with the
// max, then smallest qend in that column — the pipeline's convention.
static SW local_sw(const std::vector<uint8_t>& q_aa,
                   const std::vector<uint8_t>& q_ss,
                   const std::vector<int16_t>& bias,
                   const std::vector<uint8_t>& t_aa,
                   const std::vector<uint8_t>& t_ss, const Mat27& maa,
                   const Mat27& mss, int go, int ge) {
    int lq = q_aa.size(), lt = t_aa.size();
    std::vector<int64_t> H(lq + 1, 0), E(lq + 1, INT32_MIN);
    SW best{0, -1, -1};
    for (int j = 1; j <= lt; j++) {
        int64_t diag = 0, F = INT32_MIN;
        int64_t col_best = 0;
        int col_qend = -1;
        for (int i = 1; i <= lq; i++) {
            int64_t s = maa.row(t_aa[j - 1])[q_aa[i - 1]]
                        + mss.row(t_ss[j - 1])[q_ss[i - 1]] + bias[i - 1];
            int64_t h = diag + s;
            E[i] = std::max(E[i] - ge, H[i] - go);
            F = std::max(F - ge, H[i - 1] - go);
            // E/F computed from H values BEFORE update (previous col/row)
            h = std::max(h, E[i]);
            h = std::max(h, F);
            h = std::max(h, (int64_t)0);
            diag = H[i];
            H[i] = h;
            if (h > col_best) {
                col_best = h;
                col_qend = i - 1;
            }
        }
        if (col_best > best.score) {
            best.score = (int32_t)col_best;
            best.qend = col_qend;
            best.tend = j - 1;
        }
    }
    return best;
}

// rescore a forward-order cigar starting at (qs, ts): must be a valid path
// ending exactly at (qend, tend) with the claimed score
static bool rescore(const std::string& ops, int qs, int ts, int qend,
                    int tend, int32_t target,
                    const std::vector<uint8_t>& q_aa,
                    const std::vector<uint8_t>& q_ss,
                    const std::vector<int16_t>& bias,
                    const std::vector<uint8_t>& t_aa,
                    const std::vector<uint8_t>& t_ss, const Mat27& maa,
                    const Mat27& mss, int go, int ge) {
    int64_t sc = 0;
    int qi = qs, ti = ts;
    char prev = 0;
    for (char c : ops) {
        if (c == 'M') {
            if (qi > qend || ti > tend) return false;
            sc += maa.row(t_aa[ti])[q_aa[qi]] + mss.row(t_ss[ti])[q_ss[qi]]
                  + bias[qi];
            qi++;
            ti++;
        } else if (c == 'I') {
            sc -= (prev == 'I') ? ge : go;
            qi++;
        } else if (c == 'D') {
            sc -= (prev == 'D') ? ge : go;
            ti++;
        } else {
            return false;
        }
        prev = c;
    }
    if (qi != qend + 1 || ti != tend + 1) {
        fprintf(stderr, "path end mismatch: qi=%d ti=%d vs %d %d\n", qi, ti,
                qend + 1, tend + 1);
        return false;
    }
    if (sc != target) {
        fprintf(stderr, "path score %lld != target %d\n", (long long)sc,
                target);
        return false;
    }
    return true;
}

int main() {
    std::mt19937 rng(12345);
    // mat3di-like value range incl. strong negatives
    auto rand_mat = [&](int lo, int hi) {
        Mat27 m;
        std::uniform_int_distribution<int> d(lo, hi);
        for (int a = 0; a < 21; a++)
            for (int b = a; b < 21; b++) m.set(a, b, (int8_t)d(rng));
        return m;
    };

    int n_ok = 0, n_fail_block = 0;
    unsigned long long digest = 1469598103934665603ull;  // FNV-1a
    auto fnv = [&](const void* p, size_t n) {
        const unsigned char* b = (const unsigned char*)p;
        for (size_t k = 0; k < n; k++) {
            digest ^= b[k];
            digest *= 1099511628211ull;
        }
    };
    ba::BlockDriver drv;
    for (int iter = 0; iter < 400; iter++) {
        int lq = 1 + (int)(rng() % (iter < 200 ? 120 : 900));
        int lt = 1 + (int)(rng() % (iter < 200 ? 120 : 900));
        Mat27 maa = rand_mat(-5, 11);
        Mat27 mss = rand_mat(-6, 10);
        std::vector<uint8_t> q_aa(lq), q_ss(lq), t_aa(lt), t_ss(lt);
        std::vector<int16_t> bias(lq);
        // correlated sequences so real alignments exist
        for (int i = 0; i < lq; i++) {
            q_aa[i] = rng() % 21;
            q_ss[i] = rng() % 21;
            bias[i] = (int)(rng() % 9) - 4;
        }
        for (int j = 0; j < lt; j++) {
            if (j < lq && rng() % 100 < 70) {
                t_aa[j] = q_aa[j];
                t_ss[j] = q_ss[j];
            } else {
                t_aa[j] = rng() % 21;
                t_ss[j] = rng() % 21;
            }
        }
        int go = 10, ge = 1;
        SW f = local_sw(q_aa, q_ss, bias, t_aa, t_ss, maa, mss, go, ge);
        if (f.score <= 0) continue;

        // reversed crops, as alignStartPosBacktraceBlock builds them
        int qa = f.qend + 1, ta = f.tend + 1;
        std::vector<uint8_t> rq_aa(qa), rq_ss(qa), rt_aa(ta), rt_ss(ta);
        std::vector<int16_t> rbias(qa);
        for (int i = 0; i < qa; i++) {
            rq_aa[i] = q_aa[f.qend - i];
            rq_ss[i] = q_ss[f.qend - i];
            rbias[i] = bias[f.qend - i];
        }
        for (int j = 0; j < ta; j++) {
            rt_aa[j] = t_aa[f.tend - j];
            rt_ss[j] = t_ss[f.tend - j];
        }
        std::string ops;
        int32_t qc = 0, tc = 0;
        uint32_t ids = 0;
        bool ok = drv.align(rq_aa.data(), rq_ss.data(), rbias.data(), qa,
                            rt_aa.data(), rt_ss.data(), ta, maa, mss, go, ge,
                            f.score, ops, &qc, &tc, &ids);
        if (!ok) {
            // legitimate for adversarial cases (block search may not reach
            // the local-SW score when the path needs giant gaps) but should
            // be rare on these correlated inputs
            n_fail_block++;
            continue;
        }
        int qs = f.qend + 1 - qc, ts = f.tend + 1 - tc;
        fnv(ops.data(), ops.size());
        fnv(&qs, sizeof(qs));
        fnv(&ts, sizeof(ts));
        if (qs < 0 || ts < 0) {
            fprintf(stderr, "iter %d: negative start %d %d\n", iter, qs, ts);
            return 1;
        }
        if (!rescore(ops, qs, ts, f.qend, f.tend, f.score, q_aa, q_ss, bias,
                     t_aa, t_ss, maa, mss, go, ge)) {
            fprintf(stderr, "iter %d: rescore failed (lq=%d lt=%d score=%d)\n",
                    iter, lq, lt, f.score);
            return 1;
        }
        // identity count check
        uint32_t want_ids = 0;
        int qi = qs, ti = ts;
        for (char c : ops) {
            if (c == 'M') {
                want_ids += q_aa[qi] == t_aa[ti];
                qi++;
                ti++;
            } else if (c == 'I')
                qi++;
            else
                ti++;
        }
        if (ids != want_ids) {
            fprintf(stderr, "iter %d: ids %u != %u\n", iter, ids, want_ids);
            return 1;
        }
        n_ok++;
    }
    printf("block-aligner A/B: %d paths validated, %d block-search misses\n",
           n_ok, n_fail_block);
    // FNV-1a over all paths: the AVX2 and BA_FORCE_SCALAR builds must print
    // the same digest (bit-identical tie paths, run.sh compares them)
    printf("paths digest: %016llx\n", (unsigned long long)digest);
    if (n_ok < 200) {
        fprintf(stderr, "too few validated cases\n");
        return 1;
    }
    puts("PASS");
    return 0;
}
