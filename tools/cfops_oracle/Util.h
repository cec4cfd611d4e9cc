/* Shim for the oracle build (tools/cfops_oracle): only
 * Util::checkAllocation is used by CacheFriendlyOperations.cpp. */
#ifndef ORACLE_UTIL_SHIM_H
#define ORACLE_UTIL_SHIM_H

#include <cstdio>
#include <cstdlib>
#include <cstring>

#ifndef UNLIKELY
#define UNLIKELY(x) __builtin_expect((x), 0)
#endif

namespace Util {
inline void checkAllocation(void *pointer, const char *message) {
    if (pointer == NULL) {
        fprintf(stderr, "%s\n", message);
        exit(1);
    }
}
}

#endif
