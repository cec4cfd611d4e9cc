// A/B: tmref::tm_approx_ref (native/tm_ref.hpp, the float-exact port of
// TMaligner::computeAppoximateTMscore) vs the REFERENCE's own compiled
// TMaligner object code, on randomized aligned coordinate sets. The goal
// is BIT-equality of the returned TM, u, and t.
//
// Build (needs the reference build tree at /tmp/ref, tools/refbuild):
//   g++ -O3 -march=native -std=c++17 \
//     -I/tmp/ref/src/commons -I/tmp/ref/lib -I/tmp/ref/lib/tmalign \
//     -I/tmp/ref/lib/mmseqs/lib/simd -I/tmp/ref/lib/mmseqs/lib/simde \
//     -I/tmp/ref/lib/mmseqs/lib -I/tmp/ref/lib/mmseqs/lib/alp \
//     -I/tmp/ref/lib/mmseqs/src/commons -I/tmp/ref/lib/mmseqs/src/alignment \
//     -I/tmp/ref/lib/mmseqs/src -I/tmp/ref/build/generated \
//     -o /tmp/test_tm_ref test_tm_ref.cpp \
//     /tmp/ref/build/src/CMakeFiles/foldseek-framework.dir/commons/TMaligner.cpp.o \
//     /tmp/ref/build/src/CMakeFiles/foldseek-framework.dir/commons/StructureSmithWaterman.cpp.o \
//     /tmp/ref/build/lib/tmalign/libtmalign.a \
//     /tmp/ref/build/lib/mmseqs/src/libmmseqs-framework.a \
//     /tmp/ref/build/lib/mmseqs/libblock_aligner_c.a \
//     /tmp/ref/build/lib/mmseqs/src/libmmseqs-framework.a -fopenmp -lz
#include <cmath>
#include <cstdio>
#include <random>
#include <string>
#include <vector>

#include "TMaligner.h"
#include "../../native/tm_ref.hpp"

int main() {
    std::mt19937 rng(321);
    std::normal_distribution<float> noise(0.0f, 1.0f);
    int n_exact = 0, n_close = 0, n_diff = 0;
    double worst = 0;
    for (int iter = 0; iter < 300; iter++) {
        int n = 4 + (int)(rng() % 600);
        // cover norm > n, norm == n, and the aln2tmscore norm = span-1 < n
        int norm_len;
        switch (rng() % 3) {
            case 0: norm_len = n + (int)(rng() % 100); break;
            case 1: norm_len = n; break;
            default: norm_len = std::max(1, n - 1 - (int)(rng() % 8)); break;
        }
        // query: noisy helix; target: rotated+jittered copy (realistic
        // superposable pairs) with occasional outlier segments
        std::vector<float> q(3 * n), t(3 * n);
        float th = 0.3f + 0.001f * (rng() % 700);
        float c = std::cos(th), s = std::sin(th);
        for (int i = 0; i < n; i++) {
            float a = 0.6f * i;
            float x = 12.f * std::cos(a) + 0.5f * noise(rng);
            float y = 12.f * std::sin(a) + 0.5f * noise(rng);
            float z = 1.5f * i + 0.5f * noise(rng);
            q[3 * i] = x;
            q[3 * i + 1] = y;
            q[3 * i + 2] = z;
            float nx = x + noise(rng), ny = y + noise(rng),
                  nz = z + noise(rng);
            if (rng() % 100 < 8) {  // outlier
                nx += 15.f * noise(rng);
                ny += 15.f * noise(rng);
            }
            t[3 * i] = c * nx - s * ny + 4.f;
            t[3 * i + 1] = s * nx + c * ny - 7.f;
            t[3 * i + 2] = nz + 2.f;
        }
        // reference: initQuery(query=q), computeTMscore(target=t)
        std::vector<float> qx(n), qy(n), qz(n), tx(n), ty(n), tz(n);
        for (int i = 0; i < n; i++) {
            qx[i] = q[3 * i];
            qy[i] = q[3 * i + 1];
            qz[i] = q[3 * i + 2];
            tx[i] = t[3 * i];
            ty[i] = t[3 * i + 1];
            tz[i] = t[3 * i + 2];
        }
        TMaligner ref(2 * n + 16, false, true, false);
        ref.initQuery(qx.data(), qy.data(), qz.data(), NULL, n);
        std::string bt(n, 'M');
        TMaligner::TMscoreResult rr =
            ref.computeTMscore(tx.data(), ty.data(), tz.data(), n, 0, 0, bt,
                               norm_len);
        // ours: xtm = target coords, ytm = query coords (invmap gather)
        float u[3][3], tv[3], rmsd = 0;
        double tm = tmref::tm_approx_ref(t.data(), q.data(), n, norm_len, u,
                                         tv, &rmsd);
        double d = std::fabs(tm - rr.tmscore);
        bool ueq = true;
        for (int a = 0; a < 3; a++)
            for (int b = 0; b < 3; b++)
                if (u[a][b] != rr.u[a][b]) ueq = false;
        for (int a = 0; a < 3; a++)
            if (tv[a] != rr.t[a]) ueq = false;
        if (tm == rr.tmscore && ueq)
            n_exact++;
        else if (d < 1e-9)
            n_close++;
        else {
            n_diff++;
            if (d > worst) worst = d;
            if (n_diff <= 5)
                fprintf(stderr,
                        "iter %d n=%d norm=%d ref %.17g ours %.17g (d %.3g) "
                        "ueq=%d\n",
                        iter, n, norm_len, rr.tmscore, tm, d, (int)ueq);
        }
    }
    printf("tm_ref A/B: %d bit-exact, %d <1e-9, %d diff (worst %.3g)\n",
           n_exact, n_close, n_diff, worst);
    if (n_diff > 0) {
        puts("DIVERGED");
        return 1;
    }
    puts("PASS");
    return 0;
}
