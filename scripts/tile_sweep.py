"""On-chip (th, tw) tile sweep for the padless kernel.

Measures honest marginal ms/frame (loop-carried perturbed input, xor-fold,
single sync) for each tile choice on a given geometry.

Usage: python scripts/tile_sweep.py [luma|chroma|upsample|area]
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
    which = sys.argv[1] if len(sys.argv) > 1 else "luma"
    alg, sw, sh, dw, dh, kw = GEOMS[which]
    plan = build_plan(alg, sw, sh, dw, dh, **kw)

    batch, inner, reps = 8, 24, 3
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.integers(0, 256, (batch, sh, sw), np.uint8))
    gold = numpy_ref.resize_u8(plan, np.asarray(src[0]))

    results = []
    w_full = -(-plan.x.n_dst // 128) * 128
    for th in (32, 64, 96, 128, 160, 192, 256):
        for tw in sorted({min(w_full, t) for t in (128, 256, 384, 512, w_full)}):
            try:
                built = pr._make_padless_fn(plan, th_target=th, tw_target=tw)
            except Exception as e:  # noqa: BLE001
                print(f"th={th:3d} tw={tw:3d}: build failed {type(e).__name__}")
                continue
            if built is None:
                print(f"th={th:3d} tw={tw:3d}: infeasible")
                continue
            fn, ops = built
            dops = tuple(jax.device_put(o) for o in ops)

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

            jr = jax.jit(run)
            try:
                int(jr(src))
            except Exception as e:  # noqa: BLE001
                print(f"th={th:3d} tw={tw:3d}: RUN FAILED {type(e).__name__}")
                continue
            # correctness spot check
            out = np.asarray(jax.jit(fn)(*dops, np.asarray(src[0])))
            exact = np.array_equal(out, gold)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                int(jr(src))
                best = min(best, time.perf_counter() - t0)
            ms = best / (batch * inner) * 1e3
            results.append((ms, th, tw, exact))
            print(f"th={th:3d} tw={tw:3d}: {ms:6.3f} ms/frame  "
                  f"{'exact' if exact else 'WRONG!'}")
    results.sort()
    print("\nbest:", results[:3])


if __name__ == "__main__":
    main()
