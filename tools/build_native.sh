#!/bin/sh
# Build the native preprocessing library (with in-native JPEG/PNG decode
# when libjpeg/libpng are linkable; plain resize tier otherwise).
set -e
cd "$(dirname "$0")/.."
mkdir -p native/build
OUT=native/build/libsatpreproc.so
if g++ -O3 -shared -fPIC -std=c++17 -o "$OUT" native/preproc.cpp \
      -lpthread -ljpeg -lpng 2>/dev/null; then
  echo "built $OUT (with JPEG/PNG decode)"
else
  g++ -O3 -shared -fPIC -std=c++17 -DSAT_NO_CODECS -o "$OUT" \
      native/preproc.cpp -lpthread
  echo "built $OUT (resize tier only; codec libs not linkable)"
fi
