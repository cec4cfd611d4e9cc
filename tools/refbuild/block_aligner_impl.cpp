// C-ABI drop-in for the reference build's Rust block-aligner crate
// (lib/mmseqs/lib/block-aligner/c/block_aligner.h), backed by the C++
// reimplementation in native/block_aligner.hpp. With this library the
// reference binary runs its DEFAULT backtrace code path
// (StructureSmithWaterman::alignStartPosBacktraceBlock) instead of the
// always-fail stub fallback — so A/B parity fixtures exercise the same
// block-growth traceback on both sides. Only the 19 symbols the reference
// actually links are provided; everything else in the header is unused
// by foldseek.
//
// Build (refbuild.sh): compiled into the `block_aligner_c` static lib that
// the stub used to provide.
#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <cstring>
#include <new>

#include "block_aligner.hpp"  // copied next to this file by refbuild.sh

extern "C" {

typedef void* BlockHandle;

struct Gaps {
    int8_t open;
    int8_t extend;
};
struct SizeRange {
    uintptr_t min;
    uintptr_t max;
};
struct AlignResult {
    int32_t score;
    uintptr_t query_idx;
    uintptr_t reference_idx;
};
struct OpLen {
    uint8_t op;
    uintptr_t len;
};

struct PaddedBytesC {
    ba::PaddedSeq seq;
};
struct PosBiasC {
    ba::PaddedBias bias;
};
struct AAMatrixC {
    ba::Mat27 mat;
};
struct CigarC {
    ba::Cigar cig;
};
struct BlockC {
    ba::Aligner aligner;
};

static inline uint8_t conv(uint8_t c) {
    return (uint8_t)(std::toupper(c) - 'A');  // AAMatrix::convert_char
}

PaddedBytesC* block_new_padded_aa(uintptr_t len, uintptr_t max_size) {
    PaddedBytesC* p = new PaddedBytesC();
    p->seq.s.assign(1 + len + max_size, ba::NULL_IDX);
    p->seq.len = len;
    return p;
}

void block_set_bytes_padded_aa(PaddedBytesC* padded, const uint8_t* s,
                               uintptr_t len, uintptr_t max_size) {
    padded->seq.s.assign(1 + len + max_size, ba::NULL_IDX);
    for (uintptr_t i = 0; i < len; i++) padded->seq.s[1 + i] = conv(s[i]);
    padded->seq.len = len;
}

void block_free_padded_aa(PaddedBytesC* padded) { delete padded; }

PosBiasC* block_new_pos_bias(uintptr_t len, uintptr_t max_size) {
    PosBiasC* p = new PosBiasC();
    p->bias.zeros(len, max_size);
    return p;
}

void block_set_pos_bias(PosBiasC* bias, const int16_t* b, uintptr_t len) {
    // PosBias::set_biases zero-fills the existing buffer then writes 1..len+1
    std::fill(bias->bias.b.begin(), bias->bias.b.end(), 0);
    if (bias->bias.b.size() < len + 1)
        bias->bias.b.resize(len + 1 + ba::L, 0);
    std::memcpy(bias->bias.b.data() + 1, b, len * sizeof(int16_t));
    bias->bias.len = len;
}

void block_free_pos_bias(PosBiasC* bias) { delete bias; }

AAMatrixC* block_new_simple_aamatrix(int8_t match_score,
                                     int8_t mismatch_score) {
    AAMatrixC* m = new AAMatrixC();  // all i8::MIN
    for (int a = 0; a < 26; a++)
        for (int b = 0; b < 26; b++)
            m->mat.m[(size_t)a * 32 + b] =
                a == b ? match_score : mismatch_score;
    return m;
}

void block_set_aamatrix(AAMatrixC* matrix, uint8_t a, uint8_t b,
                        int8_t score) {
    matrix->mat.set(conv(a), conv(b), score);
}

void block_free_aamatrix(AAMatrixC* matrix) { delete matrix; }

CigarC* block_new_cigar(uintptr_t, uintptr_t) {
    CigarC* c = new CigarC();
    c->cig.clear();
    return c;
}

uintptr_t block_len_cigar(const CigarC* cigar) { return cigar->cig.size(); }

OpLen block_get_cigar(const CigarC* cigar, uintptr_t i) {
    ba::OpLen o = cigar->cig.get(i);
    return OpLen{o.op, (uintptr_t)o.len};
}

void block_free_cigar(CigarC* cigar) { delete cigar; }

BlockHandle block_new_aa_trace_xdrop(uintptr_t, uintptr_t, uintptr_t) {
    return new BlockC();  // buffers grow on demand in align
}

void block_align_3di_aa_trace_xdrop(BlockHandle b, const PaddedBytesC* q,
                                    const PaddedBytesC* q_3di,
                                    const PosBiasC* q_bias,
                                    const PaddedBytesC* r,
                                    const PaddedBytesC* r_3di,
                                    const PosBiasC* r_bias,
                                    const AAMatrixC* m,
                                    const AAMatrixC* m_3di, Gaps g,
                                    SizeRange s, int32_t x) {
    BlockC* blk = (BlockC*)b;
    blk->aligner.align_3di(q->seq, q_3di->seq, q_bias->bias, r->seq,
                           r_3di->seq, r_bias->bias, m->mat, m_3di->mat,
                           (int16_t)g.open, (int16_t)g.extend, s.min, s.max,
                           x);
}

AlignResult block_res_aa_trace_xdrop(BlockHandle b) {
    BlockC* blk = (BlockC*)b;
    return AlignResult{blk->aligner.res.score, blk->aligner.res.query_idx,
                       blk->aligner.res.reference_idx};
}

void block_cigar_aa_trace_xdrop(BlockHandle b, uintptr_t query_idx,
                                uintptr_t reference_idx, CigarC* cigar) {
    BlockC* blk = (BlockC*)b;
    if (!blk->aligner.trace.cigar(query_idx, reference_idx, cigar->cig))
        cigar->cig.clear();
}

void block_free_aa_trace_xdrop(BlockHandle b) { delete (BlockC*)b; }

// --- symbols required only by base-mmseqs's SmithWaterman::
// alignStartPosBacktraceBlock (lib/mmseqs/src/alignment/
// StripedSmithWaterman.cpp), which nothing in foldseek calls (verified:
// no caller outside its own TU). Real implementations for the two
// trivial setters; loud aborts for the AAProfile machinery so any future
// caller is caught instead of silently mis-aligning. ---

void block_set_aamatrix_num(AAMatrixC* matrix, uint8_t a, uint8_t b,
                            int8_t score) {
    matrix->mat.set(a, b, score);  // numeric indices, no ASCII conversion
}

void block_set_bytes_padded_aa_numsequence(PaddedBytesC* padded,
                                           const uint8_t* s, uintptr_t len,
                                           uintptr_t max_size) {
    padded->seq.s.assign(1 + len + max_size, ba::NULL_IDX);
    std::memcpy(padded->seq.s.data() + 1, s, len);
    padded->seq.len = len;
}

static void ba_unimplemented(const char* sym) {
    fprintf(stderr,
            "block_aligner_impl: %s is not implemented (base-mmseqs "
            "AAProfile path, dead code in foldseek)\n",
            sym);
    abort();
}

void* block_new_aaprofile(uintptr_t, uintptr_t, int8_t) {
    ba_unimplemented("block_new_aaprofile");
    return nullptr;
}
uintptr_t aaprofile_pos_aa(uintptr_t, uint8_t) {
    ba_unimplemented("aaprofile_pos_aa");
    return 0;
}
uintptr_t aaprofile_aa_pos(uint8_t, uintptr_t) {
    ba_unimplemented("aaprofile_aa_pos");
    return 0;
}
uintptr_t block_get_curr_len_aaprofile(const void*) {
    ba_unimplemented("block_get_curr_len_aaprofile");
    return 0;
}
void block_set_aaprofile(void*, uintptr_t, uint8_t, int8_t) {
    ba_unimplemented("block_set_aaprofile");
}
void block_set_all_gap_open_C_aaprofile(void*, int8_t) {
    ba_unimplemented("block_set_all_gap_open_C_aaprofile");
}
void block_set_all_gap_close_C_aaprofile(void*, int8_t) {
    ba_unimplemented("block_set_all_gap_close_C_aaprofile");
}
void block_set_all_gap_open_R_aaprofile(void*, int8_t) {
    ba_unimplemented("block_set_all_gap_open_R_aaprofile");
}
void block_free_aaprofile(void*) { ba_unimplemented("block_free_aaprofile"); }
void block_align_profile_aa_trace_xdrop(BlockHandle, const PaddedBytesC*,
                                        const void*, SizeRange, int32_t) {
    ba_unimplemented("block_align_profile_aa_trace_xdrop");
}
void block_align_aa_trace_xdrop_posbias(BlockHandle, const PaddedBytesC*,
                                        const PosBiasC*, const PaddedBytesC*,
                                        const PosBiasC*, const AAMatrixC*,
                                        Gaps, SizeRange, int32_t) {
    ba_unimplemented("block_align_aa_trace_xdrop_posbias");
}

}  // extern "C"
