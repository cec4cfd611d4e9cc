#!/bin/sh
# Build the QueryMatcher flush oracle. Copies the reference's
# CacheFriendlyOperations verbatim at build time (external oracle — the
# reference source stays out of this repo; only the golden outputs in
# tests/golden/cfops are committed).
# Usage: sh tools/cfops_oracle/build.sh [outdir=/tmp/oracle]
set -e
OUT=${1:-/tmp/oracle}
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
mkdir -p "$OUT"
cp "$REF/lib/mmseqs/src/prefiltering/CacheFriendlyOperations.h" \
   "$REF/lib/mmseqs/src/prefiltering/CacheFriendlyOperations.cpp" "$OUT/"
cp "$HERE/oracle.cpp" "$HERE/IndexTable.h" "$HERE/Util.h" "$OUT/"
g++ -O2 -I"$OUT" -o "$OUT/oracle" "$OUT/oracle.cpp" "$OUT/CacheFriendlyOperations.cpp"
echo "built: $OUT/oracle"
