/* Shim for the oracle build (tools/cfops_oracle): the reference's
 * CacheFriendlyOperations.h includes IndexTable.h only for the packed
 * IndexEntryLocal record; the full IndexTable drags in Sequence/DBReader.
 * Layout must match lib/mmseqs/src/prefiltering/IndexTable.h:25-27. */
#ifndef ORACLE_INDEXTABLE_SHIM_H
#define ORACLE_INDEXTABLE_SHIM_H

/* the real IndexTable.h drags these in transitively */
#include <stddef.h>
#include <string.h>
#include <new>

struct __attribute__((__packed__)) IndexEntryLocal {
    unsigned int seqId;
    unsigned short position_j;
};

#endif
