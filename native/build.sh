#!/bin/sh
# Build the native helpers into tpu_pt/_native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../tpu_pt/_native
g++ -O3 -march=native -shared -fPIC -std=c++17 bvh_builder.cpp -o ../tpu_pt/_native/libbvh.so
echo "built tpu_pt/_native/libbvh.so"
