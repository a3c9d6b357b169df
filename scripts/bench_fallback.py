"""Quantify the XLA fallback path's performance on TPU (VERDICT r2 #5).

Geometries outside the Pallas fast-path envelope fall back to
ops.xla_resize.  This script measures, on the real chip, each fallback
mode the dispatcher can select:

* dense f32 (HIGHEST-precision dots) — e.g. area extreme downscales with
  > 258 taps (the s8 envelope is lanczos-only);
* dense int — pathological plans whose |coef| row sums exceed 65535;
* banded lax.scan of gathers — axes whose dense matrix would exceed
  _DENSE_LIMIT elements.

Per case: ms/frame via the two-point in-jit slope (cancels the tunnel
sync RTT), byte-checked against the golden oracle first.  Record results
in BASELINE.md ("fallback path" rows).

Usage: python scripts/bench_fallback.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

CASES = [
    # name, algorithm, sw, sh, dw, dh, kwargs
    # The one geometry class still outside the kernel envelope after the
    # round-3 s8/single-plane generalizations: a 65536-wide 4096-tap area
    # downscale whose X band blows the VMEM tile budget.
    ("area 64K wide, 4096 taps (real fallback)", "area",
     65536, 16, 16, 16, {}),
    # In-envelope geometries forced through XLA, to quantify the cliff a
    # user would hit by passing backend="xla" explicitly:
    ("area 512-tap X (in envelope now)", "area", 8192, 256, 16, 256, {}),
    ("lanczos3 16K wide (in envelope now)", "lanczos", 16384, 512,
     4096, 512, dict(degree=3)),
    ("lanczos3 4K->1080p (the headline config)", "lanczos", 3840, 2160,
     1920, 1080, dict(degree=3)),
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libiqo_tpu.api import _configure_compilation_cache
    from libiqo_tpu.core.plan import build_plan
    from libiqo_tpu.golden import numpy_ref
    from libiqo_tpu.ops import pallas_resize, xla_resize

    _configure_compilation_cache()
    assert jax.devices()[0].platform == "tpu", "needs the real chip"
    rng = np.random.default_rng(0)

    for name, alg, sw, sh, dw, dh, kw in CASES:
        plan = build_plan(alg, sw, sh, dw, dh, **kw)
        t = xla_resize.build_tables(plan)
        sup = pallas_resize.supports_plan(plan)
        fn, ops = xla_resize.make_resize_fn(plan, t)
        dops = tuple(jax.device_put(o) for o in ops)
        src = rng.integers(0, 256, (sh, sw), np.uint8)
        out = np.asarray(jax.jit(fn)(*dops, src))
        exact = np.array_equal(out, numpy_ref.resize_u8(plan, src))

        fh, fw = min(4, dh), min(64, dw)

        def make_run(inner):
            def run(x):
                def body(i, carry):
                    x, acc = carry
                    x = jax.lax.dynamic_update_slice(
                        x, i.astype(jnp.uint8).reshape(1, 1), (0, 0))
                    o = fn(*dops, x)
                    return x, acc ^ o[:fh, :fw]
                _, acc = jax.lax.fori_loop(
                    0, inner, body, (x, jnp.zeros((fh, fw), jnp.uint8)))
                return acc[0, 0]
            return jax.jit(run)

        dsrc = jax.device_put(src)
        times = {}
        for inner in (4, 20):
            r = make_run(inner)
            int(r(dsrc))           # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                int(r(dsrc))
                best = min(best, time.perf_counter() - t0)
            times[inner] = best
        ms = (times[20] - times[4]) / 16 * 1e3
        mpix = sw * sh / (ms * 1e-3) / 1e6
        print(f"{name}: modes y={t.y_mode}/x={t.x_mode} "
              f"pallas_envelope={sup} exact={exact} "
              f"{ms:.3f} ms/frame  {mpix:,.0f} Mpix/s-in")


if __name__ == "__main__":
    main()
