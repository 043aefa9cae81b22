#!/bin/sh
# Build the native host-side helpers into stereotracking_tpu/_native/.
set -e
cd "$(dirname "$0")"
OUT=../stereotracking_tpu/_native
mkdir -p "$OUT"
g++ -O3 -march=native -shared -fPIC -std=c++17 lapjv.cpp -o "$OUT/liblapjv.so"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread stem_pack.cpp -o "$OUT/libstempack.so"
echo "built $OUT/liblapjv.so $OUT/libstempack.so"
