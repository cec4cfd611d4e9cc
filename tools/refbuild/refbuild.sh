#!/bin/sh
# Rebuild the reference foldseek binary with the two build-environment
# patches documented in tests/golden/README.md (no Rust in this image):
#   1. Rust block-aligner replaced by an always-fail C stub ->
#      reference falls back to reverse-SW + banded_sw backtrace.
#   2. alignTmp.score1 fallback-check fix (the unpatched check reads the
#      pre-call struct and is dead code).
#   3. ENABLE_PROSTT5=0 (GGML unused by the parity fixtures).
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

# patch 1: swap the corrosion crate import for the C stub library
python3 - <<'EOF'
import re
p = "lib/mmseqs/CMakeLists.txt"
s = open(p).read()
if "block_aligner_stub" not in s:
    s = s.replace('add_subdirectory(lib/corrosion)', '')
    s = re.sub(r'corrosion_import_crate\([^)]*\)',
               'add_library(block_aligner_c STATIC lib/block-aligner/c/block_aligner_stub.c)',
               s)
    s = re.sub(r'corrosion_add_target_local_rustflags\([^)]*\)', '', s)
    s = re.sub(r'if\(Rust_VERSION[^\n]*\n[^\n]*\nendif\(\)', '', s)
    s = s.replace('list(REMOVE_ITEM Rust_CARGO_TARGET_LINK_NATIVE_LIBS "gcc_s")', '')
    s = s.replace('set(Rust_CARGO_TARGET_LINK_NATIVE_LIBS ${Rust_CARGO_TARGET_LINK_NATIVE_LIBS} CACHE INTERNAL "")', '')
    open(p, "w").write(s)

p = "src/strucclustutils/structurealign.cpp"
s = open(p).read()
s2 = s.replace("if (align.score1 == UINT32_MAX) {",
               "if (alignTmp.score1 == UINT32_MAX) {", 1)
if s2 != s:
    open(p, "w").write(s2)
print("patched")
EOF
cp "$HERE/block_aligner_stub.c" lib/mmseqs/lib/block-aligner/c/

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
