// Float-exact TM-score engine: the reference's approximate TM-score path
// (TMaligner::computeAppoximateTMscore, src/commons/TMaligner.cpp:50-104)
// reproduced with ITS precision model — float32 coordinates, parameters,
// rotations and score sums, double only where the reference promotes
// (the quartic eigenvalue solve, the final TM ratio).
//
// DERIVATION NOTE — this is a from-scratch reimplementation against the
// reference sources (lib/tmalign/TMalign.cpp TMscore8_search_standard
// :394-547, standard_TMscore :1366-1426, detailed_search_standard
// :589-624, score_fun8 :76-143, parameter_set4search :25-47;
// lib/tmalign/Kabsch.h rmsd_uncentered_avx :474-722, rmatrix :80-120;
// lib/tmalign/basic_fun.h do_rotation), read for SEMANTICS. Bit-equality
// with the reference binary requires reproducing its float32 operation
// ORDER, so the vectorized reductions are re-expressed here as scalar
// code with the same association: the AVX Kabsch accumulates every sum in
// 4 float partials (lane j gets elements 8k+j and 8k+4+j, two sequential
// adds per block) reduced as (p0+p1)+(p2+p3), and each covariance dot
// product reduces as (0+a)+(b+c). score_fun8's per-element float math and
// its sequential float accumulation are kept verbatim-shaped so the
// compiler's contraction decisions match the reference build (both are
// g++ -O3 -march=native, default -ffp-contract=fast).
// The double-precision tm_score_aligned engine in foldseek_host.cpp stays
// the numerically-nicer default for standalone use; this engine exists so
// structure-bit scores and TM gates are byte-identical to the reference.
#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#pragma GCC push_options
#pragma GCC optimize("-ffp-contract=off")
namespace tmref {

// ---------------------------------------------------------------------
// Kabsch superposition, float32 partial-sum order of the AVX build
// (rmsd_uncentered_avx). Inputs are SoA float arrays zero-padded to a
// multiple of 8; outputs the reference's r[12] affine layout
// (u row-major 3x3 in r[0..10] with translations at r[3,7,11]).
//
// CONTRACTION MODEL: the reference's lib/tmalign is compiled with an
// explicit -ffp-contract=off (lib/tmalign/CMakeLists.txt:13-16), so NO
// expression in this engine may fuse into FMAs — the whole namespace is
// wrapped in fp-contract=off accordingly (verified by disassembling
// libtmalign.a: zero vfmadd/vfmsub in rmsd_uncentered_avx).

template <class T>
static void rmatrix_t(T ev, const T r[3][3], T u[3][3]) {
    // quaternion from Theobald's characteristic matrix (Kabsch.h:80-120,
    // the r[3][3] variant: no zero-length guard, 1.0f literals)
    T a00 = (r[0][0] + r[1][1] + r[2][2]);
    T a01 = (r[1][2] - r[2][1]);
    T a02 = (r[2][0] - r[0][2]);
    T a03 = (r[0][1] - r[1][0]);
    T a11 = (r[0][0] - r[1][1] - r[2][2]);
    T a12 = (r[0][1] + r[1][0]);
    T a13 = (r[2][0] + r[0][2]);
    T a22 = (-r[0][0] + r[1][1] - r[2][2]);
    T a23 = (r[1][2] + r[2][1]);
    T a33 = (-r[0][0] - r[1][1] + r[2][2]);
    a00 -= ev;
    a11 -= ev;
    a22 -= ev;
    a33 -= ev;
    T a2233_3223 = a22 * a33 - a23 * a23;
    T a1233_3123 = a12 * a33 - a13 * a23;
    T a1223_3122 = a12 * a23 - a13 * a22;
    T a0232_3022 = a02 * a23 - a03 * a22;
    T a0233_3023 = a02 * a33 - a03 * a23;
    T a0231_3021 = a02 * a13 - a03 * a12;
    T q[4] = {a11 * a2233_3223 - a12 * a1233_3123 + a13 * a1223_3122,
              -a01 * a2233_3223 + a12 * a0233_3023 - a13 * a0232_3022,
              a01 * a1233_3123 - a11 * a0233_3023 + a13 * a0231_3021,
              -a01 * a1223_3122 + a11 * a0232_3022 - a12 * a0231_3021};
    T invlen2q = 1.0f / (q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]);
    T aj = q[0] * q[0] * invlen2q;
    T xj = q[1] * q[1] * invlen2q;
    T yj = q[2] * q[2] * invlen2q;
    T zj = q[3] * q[3] * invlen2q;
    T xy = q[1] * q[2] * invlen2q;
    T az = q[0] * q[3] * invlen2q;
    T zx = q[3] * q[1] * invlen2q;
    T ay = q[0] * q[2] * invlen2q;
    T yz = q[2] * q[3] * invlen2q;
    T ax = q[0] * q[1] * invlen2q;
    u[0][0] = aj + xj - yj - zj;
    u[0][1] = 2.0f * (xy + az);
    u[0][2] = 2.0f * (zx - ay);
    u[1][0] = 2.0f * (xy - az);
    u[1][1] = aj - xj + yj - zj;
    u[1][2] = 2.0f * (yz + ax);
    u[2][0] = 2.0f * (zx + ay);
    u[2][1] = 2.0f * (yz - ax);
    u[2][2] = aj - xj - yj + zj;
}

// one scalar sum in the AVX build's partial/reduction order: 4 float
// partials, lane j accumulating elements 8k+j then 8k+4+j, reduced as
// (p0+p1)+(p2+p3). f(i) supplies the per-element float value.
template <class F>
static inline float lane_sum8(int upper8, F f) {
    float p[4] = {0, 0, 0, 0};
    for (int k = 0; k < upper8; k += 8) {
        for (int j = 0; j < 4; j++) p[j] += f(k + j);
        for (int j = 0; j < 4; j++) p[j] += f(k + 4 + j);
    }
    return (p[0] + p[1]) + (p[2] + p[3]);
}

struct KabschScratch {
    std::vector<float> buf;  // 6 zero-padded coordinate arrays
    float* ptr(int which, int upper8) { return buf.data() + which * upper8; }
    void load(int nat, const float* x1, const float* y1, const float* z1,
              const float* x2, const float* y2, const float* z2) {
        int upper8 = (nat % 8) ? (nat / 8) * 8 + 8 : nat;
        buf.assign((size_t)6 * upper8, 0.0f);
        std::memcpy(ptr(0, upper8), x1, nat * sizeof(float));
        std::memcpy(ptr(1, upper8), y1, nat * sizeof(float));
        std::memcpy(ptr(2, upper8), z1, nat * sizeof(float));
        std::memcpy(ptr(3, upper8), x2, nat * sizeof(float));
        std::memcpy(ptr(4, upper8), y2, nat * sizeof(float));
        std::memcpy(ptr(5, upper8), z2, nat * sizeof(float));
    }
};

// float statistics of rmsd_uncentered_avx: normed sums c0[8], centered
// covariances r9[9], the 6 gram products rr6 and the float determinant.
inline void kabsch_float_stats(int nat, KabschScratch& S, float c0[8],
                               float r9[9], float rr6[6], float* detf) {
    int upper8 = (nat % 8) ? (nat / 8) * 8 + 8 : nat;
    const float* c1x = S.ptr(0, upper8);
    const float* c1y = S.ptr(1, upper8);
    const float* c1z = S.ptr(2, upper8);
    const float* c2x = S.ptr(3, upper8);
    const float* c2y = S.ptr(4, upper8);
    const float* c2z = S.ptr(5, upper8);
    float invfnat = 1.0f / (float)nat;

    // raw sums and cross sums, float partial order
    float s1x = lane_sum8(upper8, [&](int i) { return c1x[i]; });
    float s1y = lane_sum8(upper8, [&](int i) { return c1y[i]; });
    float s1z = lane_sum8(upper8, [&](int i) { return c1z[i]; });
    float s2x = lane_sum8(upper8, [&](int i) { return c2x[i]; });
    float s2y = lane_sum8(upper8, [&](int i) { return c2y[i]; });
    float s2z = lane_sum8(upper8, [&](int i) { return c2z[i]; });
    float sxx = lane_sum8(upper8, [&](int i) { return c1x[i] * c2x[i]; });
    float sxy = lane_sum8(upper8, [&](int i) { return c1x[i] * c2y[i]; });
    float sxz = lane_sum8(upper8, [&](int i) { return c1x[i] * c2z[i]; });
    float syx = lane_sum8(upper8, [&](int i) { return c1y[i] * c2x[i]; });
    float syy = lane_sum8(upper8, [&](int i) { return c1y[i] * c2y[i]; });
    float syz = lane_sum8(upper8, [&](int i) { return c1y[i] * c2z[i]; });
    float szx = lane_sum8(upper8, [&](int i) { return c1z[i] * c2x[i]; });
    float szy = lane_sum8(upper8, [&](int i) { return c1z[i] * c2y[i]; });
    float szz = lane_sum8(upper8, [&](int i) { return c1z[i] * c2z[i]; });
    // ssq accumulates per block: c1x^2 (lo, hi) then the combined
    // ((c2x^2+c2z^2)+(c2y^2+c1y^2))+c1z^2 term (lo, hi)
    float ssq;
    {
        float p[4] = {0, 0, 0, 0};
        auto t1v = [&](int i) {
            return ((c2x[i] * c2x[i] + c2z[i] * c2z[i])
                    + (c2y[i] * c2y[i] + c1y[i] * c1y[i]))
                   + c1z[i] * c1z[i];
        };
        for (int k = 0; k < upper8; k += 8) {
            for (int j = 0; j < 4; j++) p[j] += c1x[k + j] * c1x[k + j];
            for (int j = 0; j < 4; j++)
                p[j] += c1x[k + 4 + j] * c1x[k + 4 + j];
            for (int j = 0; j < 4; j++) p[j] += t1v(k + j);
            for (int j = 0; j < 4; j++) p[j] += t1v(k + 4 + j);
        }
        ssq = (p[0] + p[1]) + (p[2] + p[3]);
    }

    // c0 = normed sums (float multiplies)
    c0[0] = sxx * invfnat;
    c0[1] = s1x * invfnat;
    c0[2] = s1y * invfnat;
    c0[3] = s1z * invfnat;
    c0[4] = ssq * invfnat;
    c0[5] = s2x * invfnat;
    c0[6] = s2y * invfnat;
    c0[7] = s2z * invfnat;
    // centered covariances, float: cov - (sA*invfnat)*sB with the exact
    // operand pairing of the vector path
    r9[0] = sxx - c0[1] * s2x;
    r9[1] = sxy - c0[1] * s2y;
    r9[2] = sxz - c0[1] * s2z;
    r9[3] = syx - c0[2] * s2x;
    r9[4] = syy - c0[2] * s2y;
    r9[5] = syz - c0[7] * s1y;  // s2z' * s1y
    r9[6] = szx - c0[5] * s1z;  // s2x' * s1z
    r9[7] = szy - c0[6] * s1z;
    r9[8] = szz - c0[7] * s1z;

    // float dot products in the hadd order (0 + a) + (b + c)
    auto dot3 = [](float a0, float a1, float b0, float b1, float c0_,
                   float c1_) {
        return (0.0f + a0 * a1) + (b0 * b1 + c0_ * c1_);
    };
    rr6[0] = dot3(r9[0], r9[0], r9[1], r9[1], r9[2], r9[2]);
    rr6[1] = dot3(r9[0], r9[3], r9[1], r9[4], r9[2], r9[5]);
    rr6[2] = dot3(r9[3], r9[3], r9[4], r9[4], r9[5], r9[5]);
    rr6[3] = dot3(r9[0], r9[6], r9[1], r9[7], r9[2], r9[8]);
    rr6[4] = dot3(r9[3], r9[6], r9[4], r9[7], r9[5], r9[8]);
    rr6[5] = dot3(r9[6], r9[6], r9[7], r9[7], r9[8], r9[8]);
    // det = r0 . (r1 x r2), float, hadd order (0 + x) + (y + z)
    float cx = r9[4] * r9[8] - r9[7] * r9[5];
    float cy = r9[5] * r9[6] - r9[8] * r9[3];
    float cz = r9[3] * r9[7] - r9[6] * r9[4];
    *detf = (0.0f + r9[0] * cx) + (r9[1] * cy + r9[2] * cz);
}

// translation: w = (-u^T | center2) applied to center1, float dot products
// in the R34v4_sse3 hadd order (m0+m1)+(m2+center2*1)
inline void kabsch_trans_w(const double u[3][3], const float* center1,
                           const float* center2, float w[3]) {
    for (int row = 0; row < 3; row++) {
        float m0 = (float)(-u[0][row]) * center1[0];
        float m1 = (float)(-u[1][row]) * center1[1];
        float m2 = (float)(-u[2][row]) * center1[2];
        float m3 = center2[row] * 1.0f;
        w[row] = (m0 + m1) + (m2 + m3);
    }
}

// float ssq-residual of the double section (float scalar ops).
inline float kabsch_ssq_float(const float c0[8], float fnat) {
    return (c0[4] - c0[1] * c0[1] - c0[2] * c0[2] - c0[3] * c0[3]
            - c0[5] * c0[5] - c0[6] * c0[6] - c0[7] * c0[7])
           * fnat;
}

// rmsd_uncentered_avx: returns rms; fills rm[12] (rows of u with the
// translation in column 3). The double tail below is plain scalar C++ in
// the reference too, so it compiles with default contraction.
inline float kabsch_ref(int nat, KabschScratch& S, float* rm) {
    double invdnat = 1.0 / (double)nat;
    float fnat = (float)nat;
    float c0[8], r9[9], rr6[6], detf;
    kabsch_float_stats(nat, S, c0, r9, rr6, &detf);

    // double section (rmsd_uncentered_avx:672-712)
    double ssq_d = (double)kabsch_ssq_float(c0, fnat);
    double det = (double)detf;
    double detsq = det * det;
    double rr[6] = {(double)rr6[0], (double)rr6[1], (double)rr6[2],
                    (double)rr6[3], (double)rr6[4], (double)rr6[5]};
    double inv3 = 1.0 / 3.0;
    double spur = (rr[0] + rr[2] + rr[5]) * inv3;
    double cof = (rr[2] * rr[5] - rr[4] * rr[4] + rr[0] * rr[5]
                  - rr[3] * rr[3] + rr[0] * rr[2] - rr[1] * rr[1])
                 * inv3;
    double e[3] = {spur, spur, spur};
    double h = (spur > 0) ? spur * spur - cof : -1.0;
    if (h > 0) {
        double g = (spur * cof - detsq) * 0.5 - spur * h;
        double sqrth = std::sqrt(h);
        double d1 = h * h * h - g * g;
        d1 = (d1 < 0) ? std::atan2(0.0, -g) * inv3
                      : std::atan2(std::sqrt(d1), -g) * inv3;
        double cth = sqrth * std::cos(d1);
        double sth = sqrth * 1.732050807568877 * std::sin(d1);
        e[0] += cth + cth;
        e[1] += -cth + sth;
        e[2] += -cth - sth;
    }
    e[0] = (e[0] < 0) ? 0 : std::sqrt(e[0]);
    e[1] = (e[1] < 0) ? 0 : std::sqrt(e[1]);
    e[2] = (e[2] < 0) ? 0 : std::sqrt(e[2]);
    double d = (det < 0) ? e[0] + e[1] - e[2] : e[0] + e[1] + e[2];
    double rms = (ssq_d - d - d) * invdnat;
    rms = (rms > 1e-8) ? std::sqrt(rms) : 0.0f;

    double mr[3][3] = {{r9[0], r9[1], r9[2]},
                       {r9[3], r9[4], r9[5]},
                       {r9[6], r9[7], r9[8]}};
    double u[3][3];
    rmatrix_t<double>(d, mr, u);

    float w[3];
    kabsch_trans_w(u, &c0[1], &c0[5], w);
    rm[0] = (float)u[0][0];
    rm[1] = (float)u[1][0];
    rm[2] = (float)u[2][0];
    rm[3] = w[0];
    rm[4] = (float)u[0][1];
    rm[5] = (float)u[1][1];
    rm[6] = (float)u[2][1];
    rm[7] = w[1];
    rm[8] = (float)u[0][2];
    rm[9] = (float)u[1][2];
    rm[10] = (float)u[2][2];
    rm[11] = w[2];
    return (float)rms;
}

// KabschFast (TMalign.cpp:191-224): r layout -> t[3], u[3][3] floats.
// The reference falls back to the classic double Kabsch when the
// quaternion path produced NaN; that fallback is practically unreachable
// for real fragments (it needs a zero covariance), and this port treats a
// NaN result as "keep NaN" so a divergence would be loud, not silent.
inline void kabsch_fast_ref(int nat, KabschScratch& S, float* rms, float t[3],
                            float u[3][3]) {
    float r[12];
    *rms = kabsch_ref(nat, S, r);
    t[0] = r[3];
    t[1] = r[7];
    t[2] = r[11];
    u[0][0] = r[0];
    u[0][1] = r[1];
    u[0][2] = r[2];
    u[1][0] = r[4];
    u[1][1] = r[5];
    u[1][2] = r[6];
    u[2][0] = r[8];
    u[2][1] = r[9];
    u[2][2] = r[10];
}

// do_rotation (basic_fun.h:75-…): y = t + u x, float per element with the
// mul/add order xx+yy then +zz then +t.
inline void do_rotation_ref(const float* xx, const float* xy, const float* xz,
                            float* yx, float* yy, float* yz, int len,
                            const float t[3], const float u[3][3]) {
    for (int i = 0; i < len; i++) {
        float a = u[0][0] * xx[i];
        float b = u[0][1] * xy[i];
        float c = u[0][2] * xz[i];
        yx[i] = t[0] + ((a + b) + c);
        a = u[1][0] * xx[i];
        b = u[1][1] * xy[i];
        c = u[1][2] * xz[i];
        yy[i] = t[1] + ((a + b) + c);
        a = u[2][0] * xx[i];
        b = u[2][1] * xy[i];
        c = u[2][2] * xz[i];
        yz[i] = t[2] + ((a + b) + c);
    }
}

// score_fun8 (TMalign.cpp:76-143): float distances/sums, d-threshold
// escalation until >=3 feasible pairs.
inline int score_fun8_ref(const float* xtx, const float* xty, const float* xtz,
                          const float* yx, const float* yy, const float* yz,
                          int n_ali, float d, int* i_ali, float* score1,
                          float lnorm, float score_d8, float d0,
                          float* dist_arr) {
    float score_sum = 0, di;
    float d_tmp = d * d;
    float d02 = d0 * d0;
    float score_d8_cut = score_d8 * score_d8;
    int i, n_cut, inc = 0;
    for (;;) {
        n_cut = 0;
        score_sum = 0;
        for (i = 0; i < n_ali; i++) {
            float dx = xtx[i] - yx[i];
            float dy = xty[i] - yy[i];
            float dz = xtz[i] - yz[i];
            di = (dx * dx + dy * dy) + dz * dz;
            dist_arr[i] = di;
            float one_div = 1.0f / (1.0f + di / d02);
            float summand = (di < score_d8_cut) ? one_div : 0.0f;
            i_ali[n_cut] = i;
            n_cut += (di < d_tmp);
            score_sum += summand;
        }
        if (n_cut < 3 && n_ali > 3) {
            inc++;
            double dinc = (d + inc * 0.5);
            d_tmp = (float)(dinc * dinc);
        } else
            break;
    }
    *score1 = score_sum / lnorm;
    return n_cut;
}

// scratch for one aligned-pair set (SoA, padded to 8)
struct TMRefScratch {
    std::vector<float> xtm, ytm, xt, dist;
    std::vector<int> i_ali, k_ali;
    KabschScratch kb;
    int n = 0, pad = 0;
    void load(const float* xtm_xyz, const float* ytm_xyz, int n_) {
        n = n_;
        pad = (n % 8) ? (n / 8) * 8 + 8 : n;
        xtm.assign((size_t)3 * pad, 0.0f);
        ytm.assign((size_t)3 * pad, 0.0f);
        xt.assign((size_t)3 * pad, 0.0f);
        dist.assign(pad, 0.0f);
        i_ali.assign(n + 8, 0);
        k_ali.assign(n + 8, 0);
        for (int i = 0; i < n; i++) {
            xtm[i] = xtm_xyz[3 * i];
            xtm[pad + i] = xtm_xyz[3 * i + 1];
            xtm[2 * pad + i] = xtm_xyz[3 * i + 2];
            ytm[i] = ytm_xyz[3 * i];
            ytm[pad + i] = ytm_xyz[3 * i + 1];
            ytm[2 * pad + i] = ytm_xyz[3 * i + 2];
        }
    }
    const float* xx() const { return xtm.data(); }
    const float* xy() const { return xtm.data() + pad; }
    const float* xz() const { return xtm.data() + 2 * pad; }
    const float* yx() const { return ytm.data(); }
    const float* yy() const { return ytm.data() + pad; }
    const float* yz() const { return ytm.data() + 2 * pad; }
};

// TMscore8_search_standard (TMalign.cpp:394-547): fragment seeding +
// iterative refinement, float throughout.
inline double tm8_search_standard_ref(TMRefScratch& S, int l_ali, float t0[3],
                                      float u0[3][3], int simplify_step,
                                      float local_d0_search, float score_d8,
                                      float d0) {
    float score_max, score, rmsd;
    float t[3], u[3][3];
    float d;
    int n_it = 20;
    const int n_init_max = 6;
    int l_ini[n_init_max];
    int l_ini_min = 4;
    if (l_ali < l_ini_min) l_ini_min = l_ali;
    int n_init = 0, i;
    for (i = 0; i < n_init_max - 1; i++) {
        n_init++;
        l_ini[i] = (int)(l_ali / std::pow(2.0, (double)i));
        if (l_ini[i] <= l_ini_min) {
            l_ini[i] = l_ini_min;
            break;
        }
    }
    if (i == n_init_max - 1) {
        n_init++;
        l_ini[i] = l_ini_min;
    }
    score_max = -1;

    int* i_ali = S.i_ali.data();
    int* k_ali = S.k_ali.data();
    float* xtx = S.xt.data();
    float* xty = S.xt.data() + S.pad;
    float* xtz = S.xt.data() + 2 * S.pad;
    for (int i_init = 0; i_init < n_init; i_init++) {
        int l_frag = l_ini[i_init];
        int il_max = l_ali - l_frag;
        int pos = 0;
        for (;;) {
            int ka = 0;
            for (int k = 0; k < l_frag; k++) k_ali[ka++] = k + pos;
            S.kb.load(l_frag, S.xx() + pos, S.xy() + pos, S.xz() + pos,
                      S.yx() + pos, S.yy() + pos, S.yz() + pos);
            kabsch_fast_ref(l_frag, S.kb, &rmsd, t, u);
            do_rotation_ref(S.xx(), S.xy(), S.xz(), xtx, xty, xtz, l_ali, t,
                            u);
            d = local_d0_search - 1;
            int n_cut = score_fun8_ref(xtx, xty, xtz, S.yx(), S.yy(), S.yz(),
                                       l_ali, d, i_ali, &score, (float)l_ali,
                                       score_d8, d0, S.dist.data());
            if (score > score_max) {
                score_max = score;
                for (int k = 0; k < 3; k++) {
                    t0[k] = t[k];
                    u0[k][0] = u[k][0];
                    u0[k][1] = u[k][1];
                    u0[k][2] = u[k][2];
                }
            }
            d = local_d0_search + 1;
            for (int it = 0; it < n_it; it++) {
                // gather the <d subset into the Kabsch scratch (zero-padded)
                int ka2 = 0;
                {
                    std::vector<float>& b = S.kb.buf;
                    int up8 = (n_cut % 8) ? (n_cut / 8) * 8 + 8
                                          : (n_cut ? n_cut : 8);
                    b.assign((size_t)6 * up8, 0.0f);
                    for (int k = 0; k < n_cut; k++) {
                        int m = i_ali[k];
                        b[k] = S.xx()[m];
                        b[up8 + k] = S.xy()[m];
                        b[2 * up8 + k] = S.xz()[m];
                        b[3 * up8 + k] = S.yx()[m];
                        b[4 * up8 + k] = S.yy()[m];
                        b[5 * up8 + k] = S.yz()[m];
                        k_ali[ka2++] = m;
                    }
                }
                kabsch_fast_ref(n_cut, S.kb, &rmsd, t, u);
                do_rotation_ref(S.xx(), S.xy(), S.xz(), xtx, xty, xtz, l_ali,
                                t, u);
                n_cut = score_fun8_ref(xtx, xty, xtz, S.yx(), S.yy(), S.yz(),
                                       l_ali, d, i_ali, &score, (float)l_ali,
                                       score_d8, d0, S.dist.data());
                if (score > score_max) {
                    score_max = score;
                    for (int k = 0; k < 3; k++) {
                        t0[k] = t[k];
                        u0[k][0] = u[k][0];
                        u0[k][1] = u[k][1];
                        u0[k][2] = u[k][2];
                    }
                }
                if (n_cut == ka2) {
                    int k = 0;
                    for (; k < n_cut; k++)
                        if (i_ali[k] != k_ali[k]) break;
                    if (k == n_cut) break;
                }
            }
            if (pos < il_max) {
                pos += simplify_step;
                if (pos > il_max) pos = il_max;
            } else
                break;
        }
    }
    return score_max;
}

// parameter_set4search (TMalign.cpp:25-47), float32 parameter block
inline void parameter_set4search_ref(int xlen, int ylen, float& d0_min,
                                     float& lnorm, float& score_d8, float& d0,
                                     float& d0_search, float& dcu0) {
    d0_min = 0.5f;
    dcu0 = 4.25f;
    lnorm = (float)std::min(xlen, ylen);
    if (lnorm <= 19) {
        d0 = 0.168f;
    } else {
        d0 = (1.24 * std::pow((lnorm * 1.0 - 15), 1.0 / 3) - 1.8);
    }
    d0_min = d0 + 0.8;  // double literal, like the reference's D0_MIN=d0+0.8
    d0 = d0_min;
    d0_search = d0;
    if (d0_search > 8) d0_search = 8;
    if (d0_search < 4.5) d0_search = 4.5;
    score_d8 = 1.5 * std::pow(lnorm * 1.0, 0.3) + 3.5;
}

// computeAppoximateTMscore on pre-gathered aligned pairs:
// xtm = target coords, ytm = query coords ([n,3] float32 row-major),
// exactly the invmap gather of TMaligner.cpp:50-104. Returns TM; fills
// u (row-major 3x3) and t as float32.
inline double tm_approx_ref(const float* xtm, const float* ytm, int n_al,
                            int norm_len, float u_out[3][3], float t_out[3],
                            float* rmsd_out) {
    if (n_al < 1) return 0.0;
    float D0_MIN, Lnorm, score_d8, d0, d0_search, dcu0;
    parameter_set4search_ref(norm_len, norm_len, D0_MIN, Lnorm, score_d8, d0,
                             d0_search, dcu0);
    double prevD0_MIN = D0_MIN;
    int prevLnorm = (int)Lnorm;
    double prevd0 = d0;
    double local_d0_search = d0_search;

    thread_local TMRefScratch S;
    S.load(xtm, ytm, n_al);

    // standard_TMscore (TMalign.cpp:1366-1426): invmap is all-aligned here
    float t[3], u[3][3];
    double tm_aln;
    {
        float D0_MIN_s = 0.5f;
        float d0_s;
        if (Lnorm > 21)
            d0_s = (1.24 * std::pow((Lnorm * 1.0 - 15), 1.0 / 3) - 1.8);
        else
            d0_s = D0_MIN_s;
        if (d0_s < D0_MIN_s) d0_s = D0_MIN_s;
        double d0_input = d0_s;
        float RMSD = 0;
        S.kb.load(n_al, S.xx(), S.xy(), S.xz(), S.yx(), S.yy(), S.yz());
        kabsch_fast_ref(n_al, S.kb, &RMSD, t, u);
        if (rmsd_out) *rmsd_out = RMSD;
        tm_aln = tm8_search_standard_ref(S, n_al, t, u, 40, (float)d0_input,
                                         score_d8, d0_s);
        tm_aln = tm_aln * n_al / (1.0 * Lnorm);
    }

    // detailed_search_standard with restored search params
    D0_MIN = prevD0_MIN;
    Lnorm = prevLnorm;
    d0 = prevd0;
    float t2[3], u2[3][3];
    // seed arrays zeroed like the reference's stack floats? the reference
    // passes its t/u locals UNINITIALIZED into TMscore8_search_standard,
    // which always overwrites them on the first fragment (score_max = -1
    // guarantees the first score wins); mirror by passing fresh locals
    // detailed_search_standard stores the search result in a FLOAT local
    // (`float tmscore`) before normalizing in float (TMalign.cpp:589-624)
    float tm_det_f = (float)tm8_search_standard_ref(
        S, n_al, t2, u2, 40, (float)local_d0_search, score_d8, d0);
    tm_det_f = tm_det_f * n_al / Lnorm;
    double tm_det = tm_det_f;

    double TM = std::max(tm_det, tm_aln);
    // the reference returns the t/u of the DETAILED search (the last
    // TMscoreResult fields come from detailed_search_standard's t/u args)
    for (int k = 0; k < 3; k++) {
        t_out[k] = t2[k];
        for (int j = 0; j < 3; j++) u_out[k][j] = u2[k][j];
    }
    return TM;
}

}  // namespace tmref
#pragma GCC pop_options
