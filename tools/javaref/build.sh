#!/bin/bash
# Compile the UNMODIFIED reference sources + compile-only stubs + Driver
# into /tmp/javaref_classes.  Only the subset reachable from
# relpro.TempRelPro / relpro.CauseRelPro / javaref.Driver is compiled
# (javac pulls dependencies in via -sourcepath).
set -e
REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT=/tmp/javaref_classes
mkdir -p "$OUT"
javac -nowarn -encoding UTF-8 \
  -cp "$REF/lib/*" \
  -sourcepath "$REF/src:$HERE/stubs:$HERE/driver" \
  -d "$OUT" \
  "$HERE/driver/javaref/Driver.java"
echo "compiled -> $OUT"
