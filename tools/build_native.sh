#!/bin/sh
# Build the native preprocessing library. Codec tiers drop independently:
# full JPEG+PNG decode where both libs link, single-codec where only one
# does, plain resize tier otherwise.
set -e
cd "$(dirname "$0")/.."
mkdir -p native/build
OUT=native/build/libsatpreproc.so
TMP="$OUT.build$$"
try() {
  if g++ -O3 -shared -fPIC -std=c++17 -o "$TMP" native/preproc.cpp \
        -lpthread "$@" 2>/dev/null; then
    mv "$TMP" "$OUT"
    return 0
  fi
  return 1
}
if try -ljpeg -lpng; then
  echo "built $OUT (JPEG+PNG decode)"
elif try -ljpeg -DSAT_NO_PNG; then
  echo "built $OUT (JPEG decode only)"
elif try -lpng -DSAT_NO_JPEG; then
  echo "built $OUT (PNG decode only)"
else
  g++ -O3 -shared -fPIC -std=c++17 -DSAT_NO_CODECS -o "$TMP" \
      native/preproc.cpp -lpthread
  mv "$TMP" "$OUT"
  echo "built $OUT (resize tier only; codec libs not linkable)"
fi
