package graft.candidates;

import java.lang.invoke.MethodHandle;
import java.lang.invoke.MethodHandles;
import java.lang.invoke.MethodType;

/**
 * Binding shim for the optional SIMD quantized-dot kernel. DotSimd
 * (Panama vector API) is compiled ONLY when the build JVM exposes the
 * jdk.incubator.vector incubator module (see build.sbt; .jvmopts adds
 * it to sbt's own JVM) and is reached here strictly via a
 * static-final MethodHandle — no compile-time reference — so every
 * combination degrades cleanly:
 *   - module in build + run JVM  -> SIMD kernel (invokeExact inlines);
 *   - module missing at build    -> DotSimd excluded, AVAILABLE=false;
 *   - module missing at run      -> class init fails the probe,
 *                                   AVAILABLE=false;
 * and the caller (LshTopK.dotQ) keeps the scalar loop, bit-identically
 * (the kernels return the same exact integer).
 */
public final class DotQ {
    private static final MethodHandle H = bind();
    public static final boolean AVAILABLE = H != null;

    private DotQ() {}

    private static MethodHandle bind() {
        try {
            Class<?> cls = Class.forName("graft.candidates.DotSimd");
            MethodHandle h = MethodHandles.lookup().findStatic(
                cls, "dotQInt",
                MethodType.methodType(int.class, short[].class, short[].class));
            // smoke the whole path once (loads the vector classes)
            short[] p = new short[67];
            for (int i = 0; i < p.length; i++) p[i] = (short) ((i * 37) % 123 - 61);
            int got = (int) h.invokeExact(p, p);
            int want = 0;
            for (int i = 0; i < p.length; i++) want += p[i] * p[i];
            return got == want ? h : null;
        } catch (Throwable t) {
            return null;
        }
    }

    /** SIMD dot; only call when {@link #AVAILABLE}. */
    public static int dot(short[] a, short[] b) {
        try {
            return (int) H.invokeExact(a, b);
        } catch (Throwable t) {
            throw new AssertionError(t);
        }
    }
}
