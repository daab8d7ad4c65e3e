#!/bin/bash
# Compile the reference's own checked-in C kernels (/root/reference,
# read-only) into a shared library for differential testing and baseline
# measurement.  Nothing is copied into this repo — the build output goes
# to /tmp/zikkurat_ref.
set -e
REF=/root/reference/lib/cbits
OUT=${1:-/tmp/zikkurat_ref}
mkdir -p "$OUT/patched"
# The reference's PORTABLE addcarry_u128_inplace (platform.h) overwrites
# the correct high word with an UNINITIALIZED variable (`*tgt_hi = v;` —
# v is never assigned), and its x86-intrinsic path passes a dereferenced
# value where _addcarry_u64 expects a pointer (segfaults under gcc).
# The reference's own cabal build masks this; for a working baseline we
# drop the two dead-variable lines from the portable path:
sed -e '/uint64_t u,v;/s/u,v/u/' -e '/\*tgt_hi = v;/d' \
    "$REF/platform.h" > "$OUT/patched/platform.h"
SRCS=$(ls $REF/bigint/*.c $REF/curves/fields/std/*.c $REF/curves/fields/mont/*.c \
          $REF/curves/g1/affine/*.c $REF/curves/g1/proj/*.c $REF/curves/g1/jac/*.c \
          $REF/curves/g2/affine/*.c $REF/curves/g2/proj/*.c \
          $REF/curves/pairing/*.c $REF/curves/poly/mont/*.c \
          $REF/curves/array/mont/*.c $REF/platform.c 2>/dev/null)
INC="-I$OUT/patched -I$REF -I$REF/bigint -I$REF/curves/fields/std -I$REF/curves/fields/mont \
     -I$REF/curves/g1/affine -I$REF/curves/g1/proj -I$REF/curves/g1/jac \
     -I$REF/curves/g2/affine -I$REF/curves/g2/proj -I$REF/curves/pairing \
     -I$REF/curves/poly/mont -I$REF/curves/array/mont"
gcc -O2 -shared -fPIC $INC -lm -o "$OUT/libzikkurat_ref.so" $SRCS
echo "built $OUT/libzikkurat_ref.so"
