#!/usr/bin/env bash
# Build the native host-side data-plane library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -pthread -o libgar_native.so rle.cc resize.cc
echo "built $(pwd)/libgar_native.so"
