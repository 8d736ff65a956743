#!/bin/sh
# Build libnp2native.so (requires g++, zlib headers).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -fPIC -shared -o libnp2native.so np2native.cc -lz
echo "built $(pwd)/libnp2native.so"
