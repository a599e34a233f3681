#!/bin/sh
# Build the native helpers into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -shared -fPIC -o lib/libyhair_native.so \
    cluster_builder.cpp
echo "built lib/libyhair_native.so"
