#!/bin/sh
# Regenerate the backtrace-dependent golden fixtures from the reference
# binary (build it first: sh tools/refbuild/refbuild.sh). Since r5 the
# reference build links the C++ block-aligner drop-in, so these fixtures
# follow the reference's DEFAULT backtrace path
# (alignStartPosBacktraceBlock); fixtures that do not depend on backtrace
# tie paths (3Di, prefilter, foldcomp, taxonomy, ...) are left alone.
# Usage: sh tools/regen_goldens.sh [ref_binary]
set -e
REF=${1:-/tmp/ref/build/src/foldseek}
HERE=$(cd "$(dirname "$0")" && pwd)
GOLD="$HERE/../tests/golden"
EX=/root/reference/example
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT
mkdir -p "$WORK/scop" "$WORK/a" "$WORK/b"
for f in "$EX"/*; do
    case $(basename "$f") in
        *tim*) ;;
        *) cp "$f" "$WORK/scop/" ;;
    esac
done
# easy-rbh fixture split (tests/test_rbh.py): sorted domains, even index
# into b/, odd into a/
i=0
for f in $(ls "$WORK/scop" | sort); do
    if [ $((i % 2)) -eq 0 ]; then cp "$WORK/scop/$f" "$WORK/b/"; else cp "$WORK/scop/$f" "$WORK/a/"; fi
    i=$((i + 1))
done
cd "$WORK"

EXT_FMT="query,target,fident,alnlen,mismatch,gapopen,qstart,qend,tstart,tend,evalue,bits,qlen,tlen,qcov,tcov,qaln,taln,cigar,rmsd,prob,alntmscore,qtmscore,ttmscore,lddt"

"$REF" easy-search "$EX/1tim.pdb.gz" "$EX/8tim.pdb.gz" tim.m8 tmp0 --threads 1 -v 1
"$REF" easy-search scop scop scop_ava.m8 tmp1 --threads 1 -v 1
"$REF" easy-search scop scop scop_ava_exh.m8 tmp2 --threads 1 --exhaustive-search 1 -v 1
"$REF" easy-search scop scop scop_ava_ext.m8 tmp3 --threads 1 --format-output "$EXT_FMT" -v 1
"$REF" easy-search "$EX/1tim.pdb.gz" "$EX/8tim.pdb.gz" tim_altali.m8 tmp5 --threads 1 --alt-ali 2 -v 1
"$REF" easy-search "$EX/1tim.pdb.gz" "$EX/8tim.pdb.gz" tim_at0.m8 tmp6 --threads 1 --alignment-type 0 -v 1
"$REF" easy-rbh a b rbh.m8 tmp4 --threads 1 -v 1

# cluster-search chain (tests/test_clusearch.py)
"$REF" createdb scop scopdb -v 1
"$REF" cluster scopdb cludb tmpc --threads 1 -v 1
"$REF" createtsv scopdb scopdb cludb scop_refclu.tsv -v 1
"$REF" createclusearchdb scopdb cludb clusearchdb -v 1
"$REF" createdb "$EX/d1asha_" qdb -v 1
"$REF" search qdb clusearchdb aln tmps --cluster-search 1 --threads 1 -v 1
"$REF" convertalis qdb clusearchdb_seq aln clusearch.m8 -v 1

for f in tim.m8 scop_ava.m8 scop_ava_exh.m8 scop_ava_ext.m8 tim_altali.m8 \
         tim_at0.m8 rbh.m8 scop_refclu.tsv clusearch.m8; do
    cp "$f" "$GOLD/$f"
    echo "regenerated $GOLD/$f ($(wc -l < "$f") lines)"
done
