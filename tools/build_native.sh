#!/usr/bin/env bash
# Build the native entropy coder: native/libtpuhevc_entropy.so
set -e
cd "$(dirname "$0")/.."
python tools/gen_ctx_header.py native/ctx_tables.inc
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -o native/libtpuhevc_entropy.so native/entropy_enc.cpp \
    native/intra_walk.cpp \
    native/decision_walk.cpp
echo "built native/libtpuhevc_entropy.so"
