#!/bin/bash
# Build the native host library -> native/libdefuse_host.so
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
# libdeflate (fast gzip) is optional: used when header+lib are present
EXTRA=""
if echo '#include <libdeflate.h>' | g++ -E -x c++ - >/dev/null 2>&1 \
   && ldconfig -p | grep -q libdeflate.so; then
  EXTRA="-DHAVE_LIBDEFLATE -ldeflate"
fi
g++ -O3 -g -march=native -std=c++17 -shared -fPIC -pthread \
    -o "$HERE/libdefuse_host.so" "$HERE/defuse_host.cpp" -lz $EXTRA
echo "OK: $HERE/libdefuse_host.so"
