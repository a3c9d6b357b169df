"""On-chip (th, tw) sweep for the RELAXED-precision padless kernel on the
4K luma config, two-point-slope timed (cancels the tunnel sync RTT).

The relaxed auto-tuner picked (64, 1920) -> 0.0661 ms/frame, barely under
the exact kernel's 0.0686 even though the X MXU work drops ~3.2x; this
sweep checks whether the tuner's tile pick (its cost model was calibrated
on the 4-dot scheme) is what's eating the gain.

Usage: python scripts/exp_relaxed_sweep.py [luma|chroma|upsample|area] [--exact]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

GEOMS = {
    "luma": ("lanczos", 3840, 2160, 1920, 1080, dict(degree=3)),
    "chroma": ("lanczos", 1920, 1080, 960, 540, dict(degree=3, px_scale=2)),
    "upsample": ("lanczos", 1280, 720, 1920, 1080, dict(degree=2)),
    "area": ("area", 1920, 1080, 480, 270, {}),
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libiqo_tpu.api import _configure_compilation_cache
    from libiqo_tpu.core.plan import build_plan
    from libiqo_tpu.golden import numpy_ref
    from libiqo_tpu.ops import pallas_resize as pr

    _configure_compilation_cache()
    args = [a for a in sys.argv[1:]]
    relaxed = "--exact" not in args
    args = [a for a in args if not a.startswith("--")]
    which = args[0] if args else "luma"
    alg, sw, sh, dw, dh, kw = GEOMS[which]
    plan = build_plan(alg, sw, sh, dw, dh, **kw)

    batch = 8
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.integers(0, 256, (batch, sh, sw), np.uint8))
    gold = numpy_ref.resize_u8(plan, np.asarray(src[0]))

    def slope_ms(fn, dops, i_lo=24, reps=3):
        def make(inner):
            def run(x):
                def body(i, carry):
                    x, acc = carry
                    x = jax.lax.dynamic_update_slice(
                        x, i.astype(jnp.uint8).reshape(1, 1, 1), (0, 0, 0))
                    o = fn(*dops, x)
                    return x, acc ^ o[:, :8, :128]
                _, acc = jax.lax.fori_loop(
                    0, inner, body, (x, jnp.zeros((batch, 8, 128), jnp.uint8)))
                return acc[0, 0, 0]
            return jax.jit(run)
        r_lo, r_hi = make(i_lo), make(4 * i_lo)
        int(r_lo(src)); int(r_hi(src))
        t_lo = t_hi = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); int(r_lo(src))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter(); int(r_hi(src))
            t_hi = min(t_hi, time.perf_counter() - t0)
        return (t_hi - t_lo) / (3 * i_lo * batch) * 1e3

    results = []
    w_full = -(-plan.x.n_dst // 128) * 128
    for th in (32, 64, 96, 128, 160, 192, 256):
        for tw in sorted({min(w_full, t) for t in (256, 512, w_full)}):
            try:
                built = pr._make_padless_fn(plan, th_target=th, tw_target=tw,
                                            relaxed=relaxed)
            except Exception as e:  # noqa: BLE001
                print(f"th={th:3d} tw={tw:4d}: build failed "
                      f"{type(e).__name__}: {e}", flush=True)
                continue
            if built is None:
                print(f"th={th:3d} tw={tw:4d}: infeasible", flush=True)
                continue
            fn, ops = built
            dops = tuple(jax.device_put(o) for o in ops)
            try:
                out = np.asarray(jax.jit(fn)(*dops, np.asarray(src[0])))
            except Exception as e:  # noqa: BLE001
                print(f"th={th:3d} tw={tw:4d}: RUN FAILED "
                      f"{type(e).__name__}", flush=True)
                continue
            err = int(np.abs(out.astype(int) - gold.astype(int)).max())
            ms = slope_ms(fn, dops)
            results.append((ms, th, tw, err))
            print(f"th={th:3d} tw={tw:4d}: {ms:7.4f} ms/frame  "
                  f"max {err} LSB", flush=True)
    results.sort()
    print("\nbest:", results[:3])


if __name__ == "__main__":
    main()
