"""Decompose the full-YUV bench loop (bench.py) into its cost terms.

Round-2 recorded full-YUV = 0.143 ms/frame vs 0.120 of plane sums; before
attacking "fusion overhead" this measures what the gap actually is:

  full    — the bench.py loop body (dus y + dus uv + luma + chroma + xor)
  luma    — dus y + luma call + xor only
  chroma  — dus uv + chroma call + xor only
  empty   — dus y + dus uv + xor only (harness floor: if the loop-carried
            dynamic_update_slice fails to alias in place, XLA copies the
            66/127 MB carried buffers every iteration and it shows here)

All timed as the slope between two inner counts (cancels the sync RTT).

Usage: python scripts/bench_decomp.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

SRC_W, SRC_H, DST_W, DST_H = 3840, 2160, 1920, 1080
BATCH = 16


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libiqo_tpu.api import _configure_compilation_cache
    from libiqo_tpu.yuv import YUV420Resizer

    _configure_compilation_cache()
    assert jax.devices()[0].platform == "tpu"

    r = YUV420Resizer("lanczos3", SRC_W, SRC_H, DST_W, DST_H, backend="auto")
    luma, chroma = r._luma, r._chroma
    luma._ensure_compiled(luma.resolved_backend())
    chroma._ensure_compiled(chroma.resolved_backend())
    lfn, lops = luma._jitted, luma._operands
    cfn, cops = chroma._jitted, chroma._operands

    rng = np.random.default_rng(0)
    y = jax.device_put(rng.integers(0, 256, (BATCH, SRC_H, SRC_W), np.uint8))
    u = jax.device_put(
        rng.integers(0, 256, (BATCH, SRC_H // 2, SRC_W // 2), np.uint8))
    v = jax.device_put(
        rng.integers(0, 256, (BATCH, SRC_H // 2, SRC_W // 2), np.uint8))

    def make_run(mode, inner):
        def run(y, u, v):
            uv = jnp.concatenate([u, v])

            def body(i, carry):
                y, uv, acc = carry
                ib = i.astype(jnp.uint8).reshape(1, 1, 1)
                y = jax.lax.dynamic_update_slice(y, ib, (0, 0, 0))
                uv = jax.lax.dynamic_update_slice(uv, ib, (0, 0, 0))
                if mode in ("full", "luma"):
                    acc = acc ^ lfn(*lops, y)[:, :8, :128]
                if mode in ("full", "chroma"):
                    ouv = cfn(*cops, uv)
                    acc = acc ^ ouv[:BATCH, :8, :128] ^ ouv[BATCH:, :8, :128]
                if mode == "empty":
                    acc = acc ^ y[:, :8, :128] ^ uv[:BATCH, :8, :128]
                return y, uv, acc

            _, _, acc = jax.lax.fori_loop(
                0, inner, body,
                (y, uv, jnp.zeros((BATCH, 8, 128), jnp.uint8)))
            return acc[0, 0, 0]

        return jax.jit(run)

    for mode in ("empty", "luma", "chroma", "full"):
        lo, hi = (24, 96) if mode != "empty" else (24, 384)
        r_lo, r_hi = make_run(mode, lo), make_run(mode, hi)
        int(r_lo(y, u, v)); int(r_hi(y, u, v))
        t_lo = t_hi = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); int(r_lo(y, u, v))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter(); int(r_hi(y, u, v))
            t_hi = min(t_hi, time.perf_counter() - t0)
        ms = (t_hi - t_lo) / ((hi - lo) * BATCH) * 1e3
        print(f"{mode:7s}: {ms:8.4f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
