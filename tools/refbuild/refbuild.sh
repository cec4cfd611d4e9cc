#!/bin/sh
# Rebuild the reference foldseek binary for parity fixtures (no Rust in
# this image, so the Rust block-aligner crate cannot be built):
#   1. The corrosion-imported Rust crate is replaced by a C++ drop-in
#      (block_aligner_impl.cpp) backed by the from-scratch reimplementation
#      of the block-aligner algorithm in native/block_aligner.hpp — the
#      reference then runs its DEFAULT backtrace path
#      (alignStartPosBacktraceBlock) instead of the stubbed fallback.
#   2. ENABLE_PROSTT5=0 (GGML unused by the parity fixtures).
# The r1-r4 always-fail stub (block_aligner_stub.c) is kept for A/B of the
# old fallback path: REFBUILD_STUB=1 sh refbuild.sh /tmp/refstub
# Usage: sh tools/refbuild/refbuild.sh [dest=/tmp/ref]
set -e
DEST=${1:-/tmp/ref}
HERE=$(cd "$(dirname "$0")" && pwd)

if [ ! -d "$DEST/src" ]; then
    mkdir -p "$DEST"
    cp -r /root/reference/CMakeLists.txt /root/reference/src \
          /root/reference/lib /root/reference/data "$DEST/"
fi
cd "$DEST"

if [ "${REFBUILD_STUB:-0}" = "1" ]; then
    BA_SRC=lib/block-aligner/c/block_aligner_stub.c
    cp "$HERE/block_aligner_stub.c" lib/mmseqs/lib/block-aligner/c/
    # the stub build needs the fallback-check fix (the unpatched check reads
    # the pre-call struct and is dead code; without block-aligner every
    # backtrace would otherwise be garbage)
    python3 - <<'EOF'
p = "src/strucclustutils/structurealign.cpp"
s = open(p).read()
s2 = s.replace("if (align.score1 == UINT32_MAX) {",
               "if (alignTmp.score1 == UINT32_MAX) {", 1)
if s2 != s:
    open(p, "w").write(s2)
    print("stub build: alignTmp fallback patch applied")
EOF
else
    BA_SRC=lib/block-aligner/c/block_aligner_impl.cpp
    cp "$HERE/block_aligner_impl.cpp" lib/mmseqs/lib/block-aligner/c/
    cp "$HERE/../../native/block_aligner.hpp" lib/mmseqs/lib/block-aligner/c/
    # default build keeps the PRISTINE structurealign.cpp (including its
    # dead fallback check) — true reference semantics
    python3 - <<'EOF'
p = "src/strucclustutils/structurealign.cpp"
s = open(p).read()
s2 = s.replace("if (alignTmp.score1 == UINT32_MAX) {",
               "if (align.score1 == UINT32_MAX) {", 1)
if s2 != s:
    open(p, "w").write(s2)
    print("default build: restored pristine (dead) fallback check")
EOF
fi

# swap the corrosion crate import for the local library
python3 - "$BA_SRC" <<'EOF'
import re, sys
ba_src = sys.argv[1]
p = "lib/mmseqs/CMakeLists.txt"
s = open(p).read()
if "add_library(block_aligner_c STATIC" not in s:
    s = s.replace('add_subdirectory(lib/corrosion)', '')
    s = re.sub(r'corrosion_import_crate\([^)]*\)',
               'add_library(block_aligner_c STATIC ' + ba_src + ')',
               s)
    s = re.sub(r'corrosion_add_target_local_rustflags\([^)]*\)', '', s)
    s = re.sub(r'if\(Rust_VERSION[^\n]*\n[^\n]*\nendif\(\)', '', s)
    s = s.replace('list(REMOVE_ITEM Rust_CARGO_TARGET_LINK_NATIVE_LIBS "gcc_s")', '')
    s = s.replace('set(Rust_CARGO_TARGET_LINK_NATIVE_LIBS ${Rust_CARGO_TARGET_LINK_NATIVE_LIBS} CACHE INTERNAL "")', '')
    open(p, "w").write(s)
else:
    s = re.sub(r'add_library\(block_aligner_c STATIC [^)]*\)',
               'add_library(block_aligner_c STATIC ' + ba_src + ')', s)
    open(p, "w").write(s)
print("cmake patched:", ba_src)
EOF

# the 2026-05-15 reference snapshot ships without three GENERATED_RESOURCES
# (K4000.crf context-state library, libPolished_8.lib, result_viz_prelude);
# they are embedded byte blobs used only by base-mmseqs CSProfile /
# result-viz paths our parity fixtures never touch -> placeholders
for f in resources/K4000.crf resources/libPolished_8.lib \
         resources/result_viz_prelude.html.zst; do
    [ -f "lib/mmseqs/data/$f" ] || printf 'placeholder' > "lib/mmseqs/data/$f"
done

mkdir -p build && cd build
cmake -G Ninja -DCMAKE_BUILD_TYPE=Release -DENABLE_PROSTT5=0 \
      -DNATIVE_ARCH=1 -DVERSION_OVERRIDE=refstub .. >cmake.log 2>&1
ninja foldseek >build.log 2>&1 || { tail -30 build.log; exit 1; }
echo "built: $DEST/build/src/foldseek"
"$DEST/build/src/foldseek" version
