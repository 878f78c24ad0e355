#!/bin/sh
# Build the native preprocessing library.
set -e
cd "$(dirname "$0")/.."
mkdir -p native/build
g++ -O3 -shared -fPIC -std=c++17 -o native/build/libsatpreproc.so native/preproc.cpp
echo "built native/build/libsatpreproc.so"
