package graft.functions;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD vector kernels on the JDK Vector API (incubator) — the JVM
 * analogue of the reference's Gonum/AVX build-tag fast path (its README
 * claims a ×10 cosine speedup over the naive loop; we measure the same
 * shape in the Bench micro). Written in Java because scalac cannot
 * resolve incubator-module types; only primitive signatures are exposed,
 * so Scala callers never see them. Compiled with
 * {@code --add-modules jdk.incubator.vector}; callers must dispatch
 * through {@code VectorKernels.cosineFast}, which falls back to the
 * scalar double-precision kernel when the module is absent at runtime.
 *
 * Accumulates in float (Lucene-style): ~1e-5 relative error vs the
 * scalar f64 kernel. Use ONLY where small FP drift is acceptable
 * (centroid probe argmax, micro benchmarks) — oracle-parity paths keep
 * {@code VectorKernels.cosine}.
 */
public final class SimdKernels {
    private SimdKernels() {}

    private static final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;

    /** Cosine similarity, float-accumulated, zero-norm-safe. */
    public static double cosine(float[] a, float[] b) {
        int n = Math.min(a.length, b.length);
        int upper = S.loopBound(n);
        FloatVector dot = FloatVector.zero(S);
        FloatVector na = FloatVector.zero(S);
        FloatVector nb = FloatVector.zero(S);
        int i = 0;
        for (; i < upper; i += S.length()) {
            FloatVector va = FloatVector.fromArray(S, a, i);
            FloatVector vb = FloatVector.fromArray(S, b, i);
            dot = va.fma(vb, dot);
            na = va.fma(va, na);
            nb = vb.fma(vb, nb);
        }
        double d = dot.reduceLanes(VectorOperators.ADD);
        double x = na.reduceLanes(VectorOperators.ADD);
        double y = nb.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            double xa = a[i], yb = b[i];
            d += xa * yb;
            x += xa * xa;
            y += yb * yb;
        }
        double denom = Math.sqrt(x) * Math.sqrt(y);
        return denom == 0.0 ? 0.0 : d / denom;
    }

    /** Dot product, float-accumulated. */
    public static double dot(float[] a, float[] b) {
        int n = Math.min(a.length, b.length);
        int upper = S.loopBound(n);
        FloatVector acc = FloatVector.zero(S);
        int i = 0;
        for (; i < upper; i += S.length()) {
            acc = FloatVector.fromArray(S, a, i)
                .fma(FloatVector.fromArray(S, b, i), acc);
        }
        double d = acc.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) d += (double) a[i] * b[i];
        return d;
    }
}
