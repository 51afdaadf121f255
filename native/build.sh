#!/bin/bash
# Build the native host library -> native/libdefuse_host.so
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
g++ -O3 -g -march=native -std=c++17 -shared -fPIC -pthread \
    -o "$HERE/libdefuse_host.so" "$HERE/defuse_host.cpp" -lz
echo "OK: $HERE/libdefuse_host.so"
