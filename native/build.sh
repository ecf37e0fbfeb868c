#!/bin/sh
# Build the native runtime pieces into powerpaint_tpu/native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../powerpaint_tpu/native
g++ -O3 -shared -fPIC -std=c++17 -o ../powerpaint_tpu/native/libppt_bpe.so \
    bpe_tokenizer.cpp
g++ -O3 -shared -fPIC -std=c++17 -march=native -o \
    ../powerpaint_tpu/native/libppt_image.so image_ops.cpp
echo "built powerpaint_tpu/native/"
