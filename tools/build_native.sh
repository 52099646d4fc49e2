#!/usr/bin/env bash
# Build the native entropy coder: native/libtpuhevc_entropy.so
set -e
cd "$(dirname "$0")/.."
python tools/gen_ctx_header.py native/ctx_tables.inc
# build to a temp name + atomic rename: overwriting the .so in place
# corrupts the mapping of any process that already dlopened it
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -o native/libtpuhevc_entropy.so.tmp native/entropy_enc.cpp \
    native/intra_walk.cpp \
    native/decision_walk.cpp
mv native/libtpuhevc_entropy.so.tmp native/libtpuhevc_entropy.so
echo "built native/libtpuhevc_entropy.so"
