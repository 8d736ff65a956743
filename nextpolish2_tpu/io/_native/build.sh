#!/bin/sh
# Build libnp2native.so (ctypes C ABI) and np2obj.so (CPython extension).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -fPIC -shared -o libnp2native.so np2native.cc -lz
PYINC=$(python3 -c "import sysconfig; print(sysconfig.get_paths()['include'])")
gcc -O3 -march=native -fPIC -shared -I"$PYINC" -o np2obj.so np2obj.c
echo "built $(pwd)/libnp2native.so + np2obj.so"
