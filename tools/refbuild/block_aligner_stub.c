/* Build-environment stub for the Rust `block-aligner` crate (no Rust
 * toolchain in this image — see tests/golden/README.md).
 *
 * Alignment entry points always report failure (score far below any
 * target), which drives StructureSmithWaterman::alignStartPosBacktraceBlock
 * (src/commons/StructureSmithWaterman.cpp:369-457) to return
 * r.score1 == UINT32_MAX, so structurealign.cpp:76-101 takes its documented
 * fallback: reverse Smith-Waterman start recovery + banded_sw backtrace.
 * Requires the one-line fix changing the dead `align.score1` check to
 * `alignTmp.score1` (see refbuild.sh).
 */
#include <stdint.h>
#include <stdlib.h>

typedef struct OpLen { int op; uintptr_t len; } OpLen;
typedef struct Gaps { int8_t open; int8_t extend; } Gaps;
typedef struct SizeRange { uintptr_t min; uintptr_t max; } SizeRange;
typedef struct AlignResult {
  int32_t score;
  uintptr_t query_idx;
  uintptr_t reference_idx;
} AlignResult;

typedef void *BlockHandle;

/* opaque one-byte tokens; callers only pass them back to us */
static char token;

void *block_new_simple_aamatrix(int8_t m, int8_t mm) { (void)m; (void)mm; return &token; }
void block_set_aamatrix(void *x, uint8_t a, uint8_t b, int8_t s) { (void)x; (void)a; (void)b; (void)s; }
void block_set_aamatrix_num(void *x, int8_t a, int8_t b, int8_t s) { (void)x; (void)a; (void)b; (void)s; }
void block_free_aamatrix(void *x) { (void)x; }

void *block_new_padded_aa(uintptr_t len, uintptr_t max) { (void)len; (void)max; return &token; }
void block_set_bytes_padded_aa(void *p, const uint8_t *b, uintptr_t len, uintptr_t max) { (void)p; (void)b; (void)len; (void)max; }
void block_set_bytes_padded_aa_numsequence(void *p, const uint8_t *b, uintptr_t len, uintptr_t max) { (void)p; (void)b; (void)len; (void)max; }
void block_free_padded_aa(void *p) { (void)p; }

void *block_new_pos_bias(uintptr_t len, uintptr_t max) { (void)len; (void)max; return &token; }
void block_set_pos_bias(void *p, const int16_t *b, uintptr_t len) { (void)p; (void)b; (void)len; }
void block_free_pos_bias(void *p) { (void)p; }

void *block_new_cigar(uintptr_t q, uintptr_t r) { (void)q; (void)r; return &token; }
OpLen block_get_cigar(const void *c, uintptr_t i) { (void)c; (void)i; OpLen o = {0, 0}; return o; }
uintptr_t block_len_cigar(const void *c) { (void)c; return 0; }
void block_free_cigar(void *c) { (void)c; }

BlockHandle block_new_aa_trace_xdrop(uintptr_t q, uintptr_t r, uintptr_t max) { (void)q; (void)r; (void)max; return &token; }
void block_free_aa_trace_xdrop(BlockHandle b) { (void)b; }

void block_align_3di_aa_trace_xdrop(BlockHandle b, const void *q, const void *q3,
                                    const void *qb, const void *r, const void *r3,
                                    const void *rb, const void *m, const void *m3,
                                    Gaps g, SizeRange s, int32_t x) {
  (void)b; (void)q; (void)q3; (void)qb; (void)r; (void)r3; (void)rb;
  (void)m; (void)m3; (void)g; (void)s; (void)x;
}
void block_align_aa_trace_xdrop(BlockHandle b, const void *q, const void *r,
                                const void *m, Gaps g, SizeRange s, int32_t x) {
  (void)b; (void)q; (void)r; (void)m; (void)g; (void)s; (void)x;
}
void block_align_aa_trace_xdrop_posbias(BlockHandle b, const void *q, const void *qb,
                                        const void *r, const void *rb, const void *m,
                                        Gaps g, SizeRange s, int32_t x) {
  (void)b; (void)q; (void)qb; (void)r; (void)rb; (void)m; (void)g; (void)s; (void)x;
}
void block_align_profile_aa_trace_xdrop(BlockHandle b, const void *q, const void *r,
                                        SizeRange s, int32_t x) {
  (void)b; (void)q; (void)r; (void)s; (void)x;
}

/* AAProfile family (base StripedSmithWaterman::alignStartPosBacktraceBlock) */
void *block_new_aaprofile(uintptr_t len, uintptr_t max, int8_t ge) { (void)len; (void)max; (void)ge; return &token; }
void block_free_aaprofile(void *p) { (void)p; }
uintptr_t block_get_curr_len_aaprofile(const void *p) { (void)p; return 0; }
void block_set_aaprofile(void *p, uintptr_t i, uint8_t a, int8_t s) { (void)p; (void)i; (void)a; (void)s; }
void aaprofile_pos_aa(void *p, const int8_t *m, uintptr_t len, int16_t b) { (void)p; (void)m; (void)len; (void)b; }
void aaprofile_aa_pos(void *p, const int8_t *m, uintptr_t len, int16_t b) { (void)p; (void)m; (void)len; (void)b; }
void block_set_all_gap_open_C_aaprofile(void *p, int8_t g) { (void)p; (void)g; }
void block_set_all_gap_close_C_aaprofile(void *p, int8_t g) { (void)p; (void)g; }
void block_set_all_gap_open_R_aaprofile(void *p, int8_t g) { (void)p; (void)g; }
void block_set_all_gap_close_R_aaprofile(void *p, int8_t g) { (void)p; (void)g; }

AlignResult block_res_aa_trace_xdrop(BlockHandle b) {
  (void)b;
  AlignResult res;
  res.score = -1000000000; /* < any target score -> caller reports failure */
  res.query_idx = (uintptr_t)-1;
  res.reference_idx = (uintptr_t)-1;
  return res;
}
void block_cigar_aa_trace_xdrop(BlockHandle b, uintptr_t qi, uintptr_t ri, void *c) {
  (void)b; (void)qi; (void)ri; (void)c;
}
void block_cigar_eq_aa_trace_xdrop(BlockHandle b, const void *q, const void *r,
                                   uintptr_t qi, uintptr_t ri, void *c) {
  (void)b; (void)q; (void)r; (void)qi; (void)ri; (void)c;
}
