"""Graded config 5: batched 64-frame 4K->1080p lanczos3 video pipeline.

Measures the device-resident batched throughput (the config's subject is
"grid-parallel tiles replacing OpenMP striping" — a throughput run, per
BASELINE.json configs[4]): all 64 frames resident in HBM, the full YUV
triple (Y + U + V px_scale=2) resized per frame, timed as the in-jit
two-point slope (cancels the tunnel sync RTT; every plane perturbed per
iteration to defeat LICM).

Frames are generated ON DEVICE (jax PRNG): staging 1.2 GB of host frames
through the 1.25 GB/s axon tunnel (measured, scripts/exp_link_bw.py)
would take ~16 min and is pure environment; resize timing is
data-independent.  The host-I/O-bound serving number lives in
cli/benchmark.py --stream and BASELINE.md documents the link ceiling.

Usage: python scripts/bench_video64.py [batch]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

SRC_W, SRC_H, DST_W, DST_H = 3840, 2160, 1920, 1080


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libiqo_tpu.api import _configure_compilation_cache
    from libiqo_tpu.yuv import YUV420Resizer

    _configure_compilation_cache()
    assert jax.devices()[0].platform == "tpu"
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    r = YUV420Resizer("lanczos3", SRC_W, SRC_H, DST_W, DST_H,
                      backend="auto")
    luma, chroma = r._luma, r._chroma
    luma._ensure_compiled(luma.resolved_backend())
    chroma._ensure_compiled(chroma.resolved_backend())
    lfn, lops = luma._jitted, luma._operands
    cfn, cops = chroma._jitted, chroma._operands

    @jax.jit
    def gen(key):
        ky, ku, kv = jax.random.split(key, 3)
        mk = lambda k, h, w: jax.random.randint(
            k, (batch, h, w), 0, 256, jnp.int32).astype(jnp.uint8)
        return (mk(ky, SRC_H, SRC_W), mk(ku, SRC_H // 2, SRC_W // 2),
                mk(kv, SRC_H // 2, SRC_W // 2))

    y, u, v = gen(jax.random.PRNGKey(0))
    jax.block_until_ready((y, u, v))

    def make_run(inner):
        def run(y, u, v):
            uv = jnp.concatenate([u, v])

            def body(i, carry):
                y, uv, acc = carry
                ib = i.astype(jnp.uint8).reshape(1, 1, 1)
                y = jax.lax.dynamic_update_slice(y, ib, (0, 0, 0))
                uv = jax.lax.dynamic_update_slice(uv, ib, (0, 0, 0))
                oy = lfn(*lops, y)
                ouv = cfn(*cops, uv)
                return y, uv, (acc ^ oy[:, :8, :128] ^ ouv[:batch, :8, :128]
                               ^ ouv[batch:, :8, :128])
            _, _, acc = jax.lax.fori_loop(
                0, inner, body,
                (y, uv, jnp.zeros((batch, 8, 128), jnp.uint8)))
            return acc[0, 0, 0]
        return jax.jit(run)

    best = {}
    for inner in (8, 32):
        jrun = make_run(inner)
        int(jrun(y, u, v))
        t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(jrun(y, u, v))
            t = min(t, time.perf_counter() - t0)
        best[inner] = t
    per_frame = (best[32] - best[8]) / ((32 - 8) * batch)
    mpix = SRC_W * SRC_H / per_frame / 1e6
    print(f"batched x{batch} 4K->1080p lanczos3 YUV (device-resident): "
          f"{per_frame * 1e3:.4f} ms/frame  {mpix:,.0f} Mpix/s-in  "
          f"{mpix / 1222.0:.1f}x vs ref")


if __name__ == "__main__":
    main()
