#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <vector>
#include <algorithm>
#include <random>
#define main disabled_main
#include "../../native/foldseek_host.cpp"
#undef main

int main() {
    std::mt19937 rng(12);
    for (int trial = 0; trial < 2000; trial++) {
        int lq = 1 + rng() % 200;
        int lt = 1 + rng() % 250;
        int Lq = lq + rng() % 50;  // flipped profile width >= lq
        int off = Lq - lq;         // mimic off = Lq - qe - 1, lq = qe+1
        int go = 10, ge = 1;
        std::vector<int32_t> fpa(21 * Lq), fps(21 * Lq);
        for (auto& v : fpa) v = (int32_t)(rng() % 21) - 10;
        for (auto& v : fps) v = (int32_t)(rng() % 21) - 10;
        std::vector<int8_t> taa(lt), tss(lt);
        for (auto& v : taa) v = rng() % 20;
        for (auto& v : tss) v = rng() % 20;
        // scalar reference (copy of the fallback loop), target = unreachable
        // first to scan fully, then rerun with real target for early break
        for (int pass = 0; pass < 2; pass++) {
            static int32_t target_store;
            int32_t target = pass == 0 ? INT32_MAX : target_store;
            std::vector<int64_t> H(lq, 0), E(lq, INT64_MIN / 4);
            int64_t best = 0; int best_j = 0, best_qend = lq - 1;
            for (int j = lt - 1; j >= 0; j--) {
                const int32_t* pa = fpa.data() + (size_t)taa[j] * Lq + off;
                const int32_t* ps = fps.data() + (size_t)tss[j] * Lq + off;
                int64_t prev_diag = 0;
                int64_t running = INT64_MIN / 4;
                int64_t col_max = 0;
                for (int i = 0; i < lq; i++) {
                    int64_t diag = prev_diag + pa[i] + ps[i];
                    prev_diag = H[i];
                    int64_t h_noF = std::max(std::max(diag, E[i]), (int64_t)0);
                    int64_t f = (i == 0) ? INT64_MIN / 4
                        : running - (int64_t)(i - 1) * ge - go;
                    int64_t h = std::max(h_noF, f);
                    E[i] = std::max(E[i] - ge, h_noF - go);
                    int64_t gv = h_noF + (int64_t)i * ge;
                    if (gv > running) running = gv;
                    H[i] = h;
                    if (h > col_max) col_max = h;
                }
                if (col_max > best) {
                    best = col_max; best_j = j;
                    for (int i = 0; i < lq; i++)
                        if (H[i] == col_max) { best_qend = i; break; }
                }
                if (col_max == target) break;
            }
            if (pass == 0) target_store = (int32_t)best;
            int64_t b2; int j2, q2;
            reverse_pass_avx2(fpa.data(), fps.data(), Lq, off, lq,
                              taa.data(), tss.data(), lt, go, ge,
                              target, &b2, &j2, &q2);
            if (b2 != best || j2 != best_j || q2 != best_qend) {
                printf("MISMATCH trial=%d pass=%d lq=%d lt=%d: scalar=(%ld,%d,%d) avx=(%ld,%d,%d)\n",
                       trial, pass, lq, lt, (long)best, best_j, best_qend,
                       (long)b2, j2, q2);
                if (trial > 3) return 1;
            }
        }
    }
    printf("all ok\n");
    return 0;
}
