#!/bin/sh -e
set -e   # also when invoked as `sh build.sh` (shebang flags skipped then)
# Build the reference-oracle probe into .refbuild/libprobe.so (gitignored).
#
# -ffp-contract=off keeps the compiled reference at strict per-op IEEE
# rounding (no compiler-introduced FMA) so python/numpy arithmetic can match
# it BITWISE in tests/test_replay_parity.py; the reference SOURCE semantics
# are unchanged. -fopenmp parallelizes render_run's row loop (per-row
# deterministic RNG — see probe.cpp).
REF=${REF:-/root/reference}
OUT=${OUT:-/root/repo/.refbuild}
mkdir -p "$OUT"
g++ -std=c++20 -O2 -fPIC -shared -fopenmp -ffp-contract=off \
    -I"$REF/include" "$(dirname "$0")/probe.cpp" \
    "$REF/include/Sphere.cpp" "$REF/include/Vector.cpp" "$REF/include/Ray.cpp" \
    -o "$OUT/libprobe.so"
echo "built $OUT/libprobe.so"
