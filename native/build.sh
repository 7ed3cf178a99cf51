#!/bin/sh
# Build the native host-side streaming DSP library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libseedvc_native.so seedvc_native.cpp
echo "built native/libseedvc_native.so"
