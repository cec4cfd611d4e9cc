/* QueryMatcher hit-buffer flush oracle (tools/gen_cfops_golden.py).
 *
 * Drives the reference's CacheFriendlyOperations (copied from
 * /root/reference at build time by build.sh — reference source is NOT
 * committed to this repo) through the exact QueryMatcher::match overflow
 * flow (lib/mmseqs/src/prefiltering/QueryMatcher.cpp:250-365) plus the
 * matchQuery diagonal-scoring tail (align -> keepMaxScoreElementOnly,
 * QueryMatcher.cpp:141-180, amino-acid non-nucleotide path), with
 * UngappedAlignment::align replaced by the deterministic fake scorer
 *     score(id, diag16) = (id * 2654435761u ^ (diag16 * 40503u)) & 0xFF
 * mirrored by tests/test_chunked_flush.py::fake_score.
 *
 * stdin:  "db_size max_db bincount max_pos"
 *         then one line per posting list: "pos n id j id j ..."
 *         (pos = query k-mer position current_i, ascending; n entries)
 * stdout: "id diag16 count" per surviving candidate.
 */
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include "CacheFriendlyOperations.h"

static unsigned char fakeScore(unsigned int id, unsigned short diag) {
    unsigned int v = id * 2654435761u ^ (unsigned int)(diag * 40503u);
    return (unsigned char)(v & 0xFFu);
}

struct List {
    unsigned short pos;
    std::vector<IndexEntryLocal> entries;
};

template <unsigned int BINCOUNT>
static void run(size_t dbSize, size_t maxDbMatches, unsigned short maxPos,
                const std::vector<List> &lists) {
    /* initBinSize mirrors QueryMatcher::initDiagonalMatcher
     * (QueryMatcher.cpp:462: maxDbMatches / BINCOUNT) */
    CacheFriendlyOperations<BINCOUNT> cfo(dbSize, maxDbMatches / BINCOUNT + 1);

    std::vector<IndexEntryLocal> databaseHits(maxDbMatches + 16);
    std::vector<IndexEntryLocal *> indexPointer(maxPos + 3, NULL);
    // foundDiagonals capacity: dbSize entries possible after keepMax;
    // flushes append after the overflow block like the reference
    size_t foundDiagonalsSize = dbSize * 2 + maxDbMatches + 64;
    std::vector<CounterResult> foundDiagonals(foundDiagonalsSize);

    size_t numMatches = 0;
    size_t overflowHitCount = 0;
    IndexEntryLocal *sequenceHits = databaseHits.data();
    IndexEntryLocal *lastSequenceHit = databaseHits.data() + maxDbMatches;
    unsigned short indexStart = 0;
    unsigned short indexTo = 0;
    bool zeroHits = false;

    int lastPos = -1;
    for (size_t li = 0; li < lists.size(); li++) {
        const unsigned short current_i = lists[li].pos;
        const size_t seqListSize = lists[li].entries.size();
        // QueryMatcher walks EVERY k-mer position; positions the driver
        // input skips get empty ranges, and a repeated position models
        // the inner similar-k-mer loop (indexPointer set once per i)
        for (int p = lastPos + 1; p <= (int)current_i; p++)
            indexPointer[p] = sequenceHits;
        lastPos = current_i;
        // (single posting list per position in this model: the inner
        // kmerPos loop of QueryMatcher collapses to one iteration)
        if ((sequenceHits + seqListSize) >= lastSequenceHit) {
            indexPointer[current_i + 1] = sequenceHits;
            const size_t hitCount = cfo.findDuplicates(
                indexPointer.data(), foundDiagonals.data() + overflowHitCount,
                foundDiagonalsSize - overflowHitCount, indexStart, current_i,
                false);
            if (overflowHitCount != 0) {  // two overflows in a row
                size_t n = cfo.mergeElementsByDiagonal(
                    foundDiagonals.data(), hitCount + overflowHitCount, true);
                for (size_t i = 0; i < n; i++)  // ungappedAlignment->align
                    foundDiagonals[i].count =
                        fakeScore(foundDiagonals[i].id, foundDiagonals[i].diagonal);
                overflowHitCount = cfo.keepMaxScoreElementOnly(
                    foundDiagonals.data(), n);
            } else {
                overflowHitCount = hitCount;
            }
            sequenceHits = databaseHits.data();
            indexPointer[current_i] = sequenceHits;
            indexStart = current_i;
            numMatches = 0;
            if ((sequenceHits + seqListSize) >= lastSequenceHit) {
                zeroHits = true;  // goto outer with numMatches == 0
                break;
            }
        }
        memcpy(sequenceHits, lists[li].entries.data(),
               sizeof(IndexEntryLocal) * seqListSize);
        sequenceHits += seqListSize;
        numMatches += seqListSize;
        indexTo = current_i;
    }

    size_t hitCount = 0;
    if (!zeroHits) {
        indexPointer[indexTo + 1] = databaseHits.data() + numMatches;
        if (numMatches > 0) {
            hitCount = cfo.findDuplicates(
                indexPointer.data(), foundDiagonals.data() + overflowHitCount,
                foundDiagonalsSize - overflowHitCount, indexStart, indexTo,
                false);
            if (overflowHitCount != 0) {
                hitCount = cfo.mergeElementsByDiagonal(
                    foundDiagonals.data(), overflowHitCount + hitCount, false);
            }
        }
    }
    // matchQuery diagonal-scoring tail: align everything, keep per-id max
    for (size_t i = 0; i < hitCount; i++)
        foundDiagonals[i].count =
            fakeScore(foundDiagonals[i].id, foundDiagonals[i].diagonal);
    hitCount = cfo.keepMaxScoreElementOnly(foundDiagonals.data(), hitCount);

    for (size_t i = 0; i < hitCount; i++)
        printf("%u %u %u\n", foundDiagonals[i].id,
               (unsigned)foundDiagonals[i].diagonal,
               (unsigned)foundDiagonals[i].count);
}

int main() {
    size_t dbSize, maxDb;
    unsigned int bincount;
    unsigned int maxPos;
    if (scanf("%zu %zu %u %u", &dbSize, &maxDb, &bincount, &maxPos) != 4)
        return 1;
    std::vector<List> lists;
    unsigned int pos, n;
    while (scanf("%u %u", &pos, &n) == 2) {
        List l;
        l.pos = (unsigned short)pos;
        for (unsigned int i = 0; i < n; i++) {
            unsigned int id, j;
            if (scanf("%u %u", &id, &j) != 2) return 1;
            IndexEntryLocal e;
            e.seqId = id;
            e.position_j = (unsigned short)j;
            l.entries.push_back(e);
        }
        lists.push_back(l);
    }
    switch (bincount) {
        case 2: run<2>(dbSize, maxDb, (unsigned short)maxPos, lists); break;
        case 4: run<4>(dbSize, maxDb, (unsigned short)maxPos, lists); break;
        case 16: run<16>(dbSize, maxDb, (unsigned short)maxPos, lists); break;
        default: fprintf(stderr, "bincount must be 2/4/16\n"); return 1;
    }
    return 0;
}
