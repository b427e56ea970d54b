#!/bin/sh
# Build the native kernels into optiland_tpu/_native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../optiland_tpu/_native
g++ -O3 -march=native -ffast-math -fopenmp -shared -fPIC -o \
    ../optiland_tpu/_native/libhuygens.so huygens.cpp -lmvec -lm
echo built ../optiland_tpu/_native/libhuygens.so
