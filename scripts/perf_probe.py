"""Decompose the YUV420 benchmark time on the real TPU chip.

Measures, per frame, with the same in-jit fori_loop harness bench.py uses:
  floor   — loop + xor-fold only (no resize, no perturbation)
  dus     — + the 1-byte CSE-defeating dynamic_update_slice
  pad     — + jnp.pad of the luma batch (the kernel's input padding)
  luma    — dus + luma resize
  chroma  — dus + chroma resize (U+V batch)
  full    — the bench.py body (dus + luma + chroma)

Each is run at inner=12 and inner=48 to separate per-sync cost (the ~30 ms
axon RTT amortizes over frames) from true per-iteration cost.

Usage: python scripts/perf_probe.py [--quick]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SRC_W, SRC_H, DST_W, DST_H = 3840, 2160, 1920, 1080


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libiqo_tpu.yuv import YUV420Resizer

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    batch = args.batch
    inners = (12,) if args.quick else (12, 48)
    reps = 3

    r = YUV420Resizer("lanczos3", SRC_W, SRC_H, DST_W, DST_H, backend="auto")
    luma, chroma = r._luma, r._chroma
    luma._ensure_compiled(luma.resolved_backend())
    chroma._ensure_compiled(chroma.resolved_backend())
    lfn, lops = luma._jitted, luma._operands
    cfn, cops = chroma._jitted, chroma._operands

    rng = np.random.default_rng(0)
    y = jax.device_put(rng.integers(0, 256, (batch, SRC_H, SRC_W), np.uint8))
    u = jax.device_put(rng.integers(0, 256, (batch, SRC_H // 2, SRC_W // 2), np.uint8))
    v = jax.device_put(rng.integers(0, 256, (batch, SRC_H // 2, SRC_W // 2), np.uint8))

    def perturb(y, i):
        return jax.lax.dynamic_update_slice(
            y, i.astype(jnp.uint8).reshape(1, 1, 1), (0, 0, 0))

    def make(kind, inner):
        def run(y, u, v):
            uv = jnp.concatenate([u, v])

            def body(i, carry):
                # both inputs stay loop-carried + perturbed: XLA hoists any
                # resize whose input is loop-invariant out of the loop
                y, uv, acc = carry
                if kind != "floor":
                    y = perturb(y, i)
                    uv = perturb(uv, i)
                if kind == "pad":
                    p = jnp.pad(y, ((0, 0), (32, 40), (128, 384)))
                    acc = acc ^ p[:, :8, :128] ^ p[:, -8:, -128:]
                elif kind in ("luma", "full"):
                    oy = lfn(*lops, y)
                    acc = acc ^ oy[:, :8, :128]
                if kind in ("chroma", "full"):
                    ouv = cfn(*cops, uv)
                    acc = acc ^ ouv[:batch, :8, :128] ^ ouv[batch:, :8, :128]
                if kind in ("floor", "dus"):
                    acc = acc ^ y[:, :8, :128]
                return y, uv, acc

            _, _, acc = jax.lax.fori_loop(
                0, inner, body, (y, uv, jnp.zeros((batch, 8, 128), jnp.uint8)))
            return acc[0, 0, 0]

        return jax.jit(run)

    # sync RTT alone
    f0 = jax.jit(lambda y: y[0, 0, 0] ^ jnp.uint8(1))
    int(f0(y))
    t0 = time.perf_counter()
    for _ in range(5):
        int(f0(y))
    rtt = (time.perf_counter() - t0) / 5
    print(f"sync RTT               : {rtt * 1e3:8.3f} ms")

    results = {}
    for kind in ("floor", "dus", "pad", "luma", "chroma", "full"):
        for inner in inners:
            jr = make(kind, inner)
            int(jr(y, u, v))  # compile + warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                int(jr(y, u, v))
                best = min(best, time.perf_counter() - t0)
            frames = batch * inner
            results[(kind, inner)] = best / frames
            print(f"{kind:7s} inner={inner:3d}    : {best * 1e3:8.2f} ms total, "
                  f"{best / frames * 1e3:6.3f} ms/frame")

    if len(inners) == 2:
        i0, i1 = inners
        print("\nper-iteration cost (slope between inner counts):")
        for kind in ("floor", "dus", "pad", "luma", "chroma", "full"):
            a = results[(kind, i0)] * batch * i0
            b = results[(kind, i1)] * batch * i1
            slope = (b - a) / (batch * (i1 - i0))
            print(f"  {kind:7s}: {slope * 1e3:6.3f} ms/frame marginal")


if __name__ == "__main__":
    main()
