#!/bin/sh
# Standalone A/B harnesses for the AVX2 reverse-SW passes: each compiles
# the native source directly and cross-checks the vectorized passes
# against the scalar reference recurrence (i32) and against each other
# (i16 vs i32) on thousands of randomized cases. Exits nonzero on any
# mismatch.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
for t in test_reverse_pass_i32 test_reverse_pass_i16; do
    g++ -O2 -march=native -o "/tmp/$t" "$HERE/$t.cpp"
    "/tmp/$t"
done
