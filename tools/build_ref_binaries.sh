#!/usr/bin/env bash
# Build the reference HM-16.9 encoder/decoder (from the read-only mount at
# /root/reference) into /tmp/hmref. These binaries are used ONLY as test
# oracles (bit-exact conformance: our encoder's bitstream must decode with
# "MD5: OK" in the reference decoder). Nothing from the reference is copied
# into this repo.
set -e
OUT=${1:-/tmp/hmref}
SRC=/root/reference/source
mkdir -p "$OUT/inc"
# The NN-FME fork needs Eigen; tensorflow's bundled copy satisfies it.
EIG=$(python - <<'PY'
import glob; cands=glob.glob('/opt/venv/lib/python3.12/site-packages/tensorflow/include')
print(cands[0] if cands else '')
PY
)
[ -n "$EIG" ] && ln -sfn "$EIG" "$OUT/inc/eigen3"
if [ ! -x "$OUT/TAppDecoder" ]; then
  g++ -O2 -w -std=gnu++17 -I$SRC/Lib -I$SRC/App/TAppDecoder -o "$OUT/TAppDecoder" \
    $SRC/App/TAppDecoder/*.cpp $SRC/Lib/TLibDecoder/*.cpp $SRC/Lib/TLibCommon/*.cpp \
    $SRC/Lib/TLibVideoIO/*.cpp $SRC/Lib/TAppCommon/*.cpp $SRC/Lib/libmd5/*.c
fi
if [ ! -x "$OUT/TAppEncoder" ] && [ -n "$EIG" ]; then
  g++ -O2 -w -std=gnu++17 -I"$OUT/inc" -I"$EIG" -I$SRC/Lib -I$SRC/App/TAppEncoder -o "$OUT/TAppEncoder" \
    $SRC/App/TAppEncoder/*.cpp $SRC/Lib/TLibEncoder/*.cpp $SRC/Lib/TLibCommon/*.cpp \
    $SRC/Lib/TLibVideoIO/*.cpp $SRC/Lib/TAppCommon/*.cpp $SRC/Lib/libmd5/*.c
fi
echo "oracles in $OUT:"; ls -la "$OUT" | grep TApp
