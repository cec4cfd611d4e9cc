#include <cstdio>
#include <cstdint>
#include <vector>
#include <algorithm>
#include <random>
#define main disabled_main
#include "../../native/foldseek_host.cpp"
#undef main

int main() {
    std::mt19937 rng(77);
    for (int trial = 0; trial < 4000; trial++) {
        int lq = 1 + rng() % 300;
        int lt = 1 + rng() % 300;
        int Lq = lq + rng() % 40;
        int off = Lq - lq;
        int go = 10, ge = 1;
        std::vector<int32_t> fpa(21 * Lq), fps(21 * Lq);
        for (auto& v : fpa) v = (int32_t)(rng() % 21) - 10;
        for (auto& v : fps) v = (int32_t)(rng() % 21) - 10;
        std::vector<int8_t> taa(lt), tss(lt);
        for (auto& v : taa) v = rng() % 21;
        for (auto& v : tss) v = rng() % 21;
        // int16 padded copies
        int Lq16 = Lq + 16;
        std::vector<int16_t> fpa16(21 * Lq16, 0), fps16(21 * Lq16, 0);
        for (int r = 0; r < 21; r++)
            for (int i = 0; i < Lq; i++) {
                fpa16[(size_t)r * Lq16 + i] = (int16_t)fpa[(size_t)r * Lq + i];
                fps16[(size_t)r * Lq16 + i] = (int16_t)fps[(size_t)r * Lq + i];
            }
        for (int pass = 0; pass < 2; pass++) {
            static int32_t target_store = 1 << 29;
            int32_t target = pass == 0 ? (1 << 29) : target_store;
            int64_t b32; int j32, q32;
            reverse_pass_avx2(fpa.data(), fps.data(), Lq, off, lq,
                              taa.data(), tss.data(), lt, go, ge,
                              target, &b32, &j32, &q32);
            if (pass == 0) target_store = (int32_t)b32;
            int64_t b16; int j16, q16;
            reverse_pass_avx2_i16(fpa16.data(), fps16.data(), Lq16, off, lq,
                                  taa.data(), tss.data(), lt, go, ge,
                                  target, &b16, &j16, &q16);
            if (b16 != b32 || j16 != j32 || q16 != q32) {
                printf("MISMATCH trial=%d pass=%d lq=%d lt=%d: 32=(%ld,%d,%d) 16=(%ld,%d,%d)\n",
                       trial, pass, lq, lt, (long)b32, j32, q32,
                       (long)b16, j16, q16);
                if (trial > 3) return 1;
            }
        }
    }
    printf("all ok\n");
    return 0;
}
