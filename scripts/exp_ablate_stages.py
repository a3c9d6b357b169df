"""Decompose the padless kernel's per-frame cost by stage, on chip.

Builds the same tuned kernel with LIBIQO_TPU_ABLATE cutting it after each
stage (see pallas_resize._make_padless_fn) and measures the two-point
slope for each, so the deltas are the EXPOSED marginal cost of every
stage with DMA overlap in effect:

    dma    band DMA + u8 load (pipeline floor)
    y      + s8 Y dots, corr, wrap16, border renorm
    split  + the s8 X work split (w >> 8 / & 255 / int8 casts)
    x      + the 4 s8 X dots (or 1 bf16 dot with --relaxed) + corr
    full   + rounding/border/clip/pack epilogue (production kernel)

Ablated outputs are garbage by design; only 'full' is byte-checked.

Usage: python scripts/exp_ablate_stages.py [luma|chroma|upsample|area]
                                           [--relaxed] [--tiles TH TW]
"""

import os
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

STAGES = ("dma", "y", "split", "x", "full")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libiqo_tpu.api import _configure_compilation_cache
    from libiqo_tpu.core.plan import build_plan
    from libiqo_tpu.golden import numpy_ref
    from libiqo_tpu.ops import pallas_resize as pr

    _configure_compilation_cache()
    argv = sys.argv[1:]
    relaxed = "--relaxed" in argv
    argv = [a for a in argv if a != "--relaxed"]
    th = tw = 0
    if "--tiles" in argv:
        i = argv.index("--tiles")
        th, tw = int(argv[i + 1]), int(argv[i + 2])
        del argv[i:i + 3]
    which = argv[0] if argv else "luma"
    alg, sw, sh, dw, dh, kw = GEOMS[which]
    plan = build_plan(alg, sw, sh, dw, dh, **kw)

    batch, reps = 8, 3
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.integers(0, 256, (batch, sh, sw), np.uint8))
    gold = numpy_ref.resize_u8(plan, np.asarray(src[0]))

    # the relaxed X pass has no s8 work split (one bf16 dot straight off
    # the work tile), so the 'split' cut does not exist in that kernel —
    # running it would silently measure the full kernel
    stages = tuple(s for s in STAGES if not (relaxed and s == "split"))
    prev_ms = None
    for stage in stages:
        os.environ["LIBIQO_TPU_ABLATE"] = "" if stage == "full" else stage
        try:
            built = pr._make_padless_fn(plan, th_target=th, tw_target=tw,
                                        relaxed=relaxed)
        finally:
            os.environ.pop("LIBIQO_TPU_ABLATE", None)
        if built is None:
            print(f"{stage:6s}: build infeasible")
            continue
        fn, ops = built
        dops = tuple(jax.device_put(o) for o in ops)
        note = f"tiles={fn.tiles}"
        if stage == "full":
            out = np.asarray(jax.jit(fn)(*dops, np.asarray(src[0])))
            lsb = int(np.abs(out.astype(int) - gold.astype(int)).max())
            note += "  exact" if lsb == 0 else f"  max {lsb} LSB"

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
        delta = "" if prev_ms is None else f"  (+{(ms - prev_ms) * 1e3:6.1f} us)"
        prev_ms = ms
        print(f"{stage:6s}: {ms:8.4f} ms/frame{delta}  {note}")


if __name__ == "__main__":
    main()
