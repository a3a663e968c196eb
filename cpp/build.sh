#!/bin/sh
# Build the native host library.  No external deps; -O3 + native arch.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libvpho_native.so vpho_native.cpp
echo "built $(pwd)/libvpho_native.so"
