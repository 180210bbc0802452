#!/bin/sh
# Rebuild lib/graft-simd.jar from src/simd/ (the JDK Vector API kernels).
#
# The kernel is compiled OUTSIDE sbt: sbt's in-process javac cannot host
# the incubator module (loading jdk.incubator.vector classes into the
# unnamed module trips an IllegalAccessError on jdk.internal.vm.vector),
# so the class ships as a prebuilt unmanaged jar and sbt only links
# against it. Runtime fork options add the module; VectorKernels falls
# back to the scalar kernel when it is absent.
set -e
cd "$(dirname "$0")/.."
out=$(mktemp -d)
javac -encoding UTF-8 --release 17 --add-modules jdk.incubator.vector \
  -d "$out" src/simd/java/graft/functions/SimdKernels.java
jar cf lib/graft-simd.jar -C "$out" .
rm -rf "$out"
echo "rebuilt lib/graft-simd.jar"
