"""Measure all graded BASELINE.md configs on the chip (kernel throughput).

Per config: in-jit fori_loop over a batch (loop-carried 1-byte perturbation,
xor-fold, single sync), timed at two inner counts; the reported ms/frame is
the SLOPE between them, which cancels the ~30 ms tunnel sync RTT exactly.
Outputs are byte-compared against the golden oracle first.

Usage: python scripts/bench_configs.py [--relaxed] [config ...]
(--relaxed measures the opt-in relaxed-precision kernels and reports the
max LSB error instead of the exact flag)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

CONFIGS = {
    "linear": ("linear", 640, 480, 320, 240, {}),
    "area": ("area", 1920, 1080, 480, 270, {}),
    "upsample": ("lanczos", 1280, 720, 1920, 1080, dict(degree=2)),
    "luma4k": ("lanczos", 3840, 2160, 1920, 1080, dict(degree=3)),
    "chroma": ("lanczos", 1920, 1080, 960, 540, dict(degree=3, px_scale=2)),
}

BASELINES = {  # reference AVX512 1-core Mpix/s-in, this host (BASELINE.md)
    "linear": 1689.0, "area": 6562.0, "upsample": 400.0, "luma4k": 1222.0,
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libiqo_tpu.api import _configure_compilation_cache
    from libiqo_tpu.core.plan import build_plan
    from libiqo_tpu.golden import numpy_ref
    from libiqo_tpu.ops import pallas_resize

    _configure_compilation_cache()
    argv = sys.argv[1:]
    relaxed = "--relaxed" in argv
    argv = [a for a in argv if a != "--relaxed"]
    names = argv or list(CONFIGS)
    batch, reps = 8, 3
    for name in names:
        alg, sw, sh, dw, dh, kw = CONFIGS[name]
        plan = build_plan(alg, sw, sh, dw, dh, **kw)
        fn, ops = pallas_resize.make_resize_fn(plan, relaxed=relaxed)
        dops = tuple(jax.device_put(o) for o in ops)
        rng = np.random.default_rng(0)
        src = jax.device_put(rng.integers(0, 256, (batch, sh, sw), np.uint8))
        out = np.asarray(jax.jit(fn)(*dops, np.asarray(src[0])))
        want = numpy_ref.resize_u8(plan, np.asarray(src[0]))
        max_lsb = int(np.abs(out.astype(int) - want.astype(int)).max())
        exact = max_lsb == 0

        def make_run(inner):
            def run(x):
                def body(i, carry):
                    x, acc = carry
                    x = jax.lax.dynamic_update_slice(
                        x, i.astype(jnp.uint8).reshape(1, 1, 1), (0, 0, 0))
                    o = fn(*dops, x)
                    return x, acc ^ o[:, :8, :128]
                _, acc = jax.lax.fori_loop(
                    0, inner, body,
                    (x, jnp.zeros((batch, 8, 128), jnp.uint8)))
                return acc[0, 0, 0]
            return jax.jit(run)

        # calibrate inner counts so the slope delta dwarfs the ~1-2 ms
        # sync-RTT jitter (>= 40 ms of marginal work between the two)
        probe = make_run(48)
        int(probe(src))
        t0 = time.perf_counter(); int(probe(src))
        est = max((time.perf_counter() - t0 - 0.024) / (48 * batch), 2e-7)
        i_lo = max(48, int(0.013 / (est * batch) / 48 + 1) * 48)
        i_hi = 4 * i_lo

        r_lo, r_hi = make_run(i_lo), make_run(i_hi)
        int(r_lo(src)); int(r_hi(src))
        t_lo = t_hi = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); int(r_lo(src))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter(); int(r_hi(src))
            t_hi = min(t_hi, time.perf_counter() - t0)
        ms = (t_hi - t_lo) / ((i_hi - i_lo) * batch) * 1e3
        mpix = sw * sh / (ms * 1e-3) / 1e6
        base = BASELINES.get(name)
        vs = f"  {mpix / base:6.1f}x vs ref {base:.0f}" if base else ""
        print(f"{name:9s} {alg}{kw.get('degree','')} {sw}x{sh}->{dw}x{dh}: "
              f"{ms:8.4f} ms/frame  {mpix:9.0f} Mpix/s-in{vs}  "
              f"{'exact' if exact else ('max %d LSB' % max_lsb) if relaxed else 'WRONG!'}"
              f"  tiles={fn.tiles}")


if __name__ == "__main__":
    main()
