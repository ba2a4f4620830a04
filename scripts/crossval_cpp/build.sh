#!/bin/sh
# Build the cross-validation driver against the (read-only) reference tree.
# Objects and the binary land in $OUT (default /root/repo/build/crossval);
# nothing is written into /root/reference. Exits non-zero if the reference
# tree is absent — callers (tests) treat that as "skip".
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/root/repo/build/crossval}
HERE=$(dirname "$(readlink -f "$0")")

[ -d "$REF/src" ] || { echo "no reference tree at $REF" >&2; exit 3; }
mkdir -p "$OUT"

CXXFLAGS="-std=c++17 -O2 -march=native -fopenmp \
  -I$HERE/shim -I$REF/include -I$REF/thirdparty/robin-map/include"

for src in "$REF/src/index.cpp" "$REF/src/index_bipartite.cpp"; do
    obj="$OUT/$(basename "$src" .cpp).o"
    if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
        g++ $CXXFLAGS -c "$src" -o "$obj"
    fi
done
g++ $CXXFLAGS "$HERE/crossval.cpp" "$OUT/index.o" "$OUT/index_bipartite.o" \
    -o "$OUT/crossval" -fopenmp -Wl,--allow-multiple-definition
echo "$OUT/crossval"
