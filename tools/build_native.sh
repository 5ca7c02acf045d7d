#!/bin/sh
# Build the native runtime shared library (see native/sobfu_runtime.cpp).
set -e
cd "$(dirname "$0")/.."
mkdir -p sobfu_tpu/lib
g++ -O3 -std=c++17 -shared -fPIC -Wall \
    native/sobfu_runtime.cpp \
    -o sobfu_tpu/lib/libsobfu_runtime.so \
    -lpng -lpthread
echo "built sobfu_tpu/lib/libsobfu_runtime.so"
