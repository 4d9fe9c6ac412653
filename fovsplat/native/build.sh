#!/bin/sh
# Build the native IO library. Run from anywhere; artifacts land next to
# the sources. No external deps beyond a C++17 toolchain.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libfastio.so fastio.cpp
echo "built $(pwd)/libfastio.so"
