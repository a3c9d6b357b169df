"""Do 64-aligned lane slices of a VMEM value cost extra in MXU dots?

The X group windows are 512 wide instead of 384 because taps start at
2c-5 while k0 must stay 128-aligned (a 64-aligned k0 would cover the
span with 384).  If Mosaic lane-slices values at 64-element offsets
without a relayout penalty, switching k_align to 64 cuts X-dot work 25%.

Times a tile-shaped kernel doing 15 grouped Karatsuba dots per step:
  a) k0 multiples of 128, kl=512
  b) k0 multiples of 64,  kl=384
  c) k0 multiples of 32,  kl=384  (finer still)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, BW, TWF = 32, 3840, 1920   # full-width luma row tile
GRID = 34
BF = jnp.bfloat16
F32 = jnp.float32


def make(align, kl):
    groups = []
    for g in range(15):
        want = max(0, 2 * 128 * g - 5)
        k0 = min(want // align * align, BW - kl)
        groups.append((g * 128, 128, k0, kl))

    def kernel(w_ref, c0, c1, c2, out_ref):
        w = w_ref[...].astype(jnp.int32)
        b = ((w + 128) & 255) - 128
        a = (w - b) >> 8
        ab, bb, gb = a.astype(BF), b.astype(BF), (a + b).astype(BF)
        parts = []
        for (o0, ol, k0, kl_) in groups:
            d1 = jnp.dot(ab[:, k0:k0 + kl_], c0[k0:k0 + kl_, o0:o0 + ol],
                         preferred_element_type=F32).astype(jnp.int32)
            d2 = jnp.dot(bb[:, k0:k0 + kl_], c1[k0:k0 + kl_, o0:o0 + ol],
                         preferred_element_type=F32).astype(jnp.int32)
            d3 = jnp.dot(gb[:, k0:k0 + kl_], c2[k0:k0 + kl_, o0:o0 + ol],
                         preferred_element_type=F32).astype(jnp.int32)
            parts.append(d1 * 65280 - d2 * 255 + d3 * 256)
        s = jnp.concatenate(parts, axis=1)
        out_ref[...] = jnp.clip((s + (1 << 19)) >> 20, 0, 255).astype(jnp.uint8)

    return pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[
            pl.BlockSpec((None, TH, BW), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BW, TWF), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BW, TWF), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BW, TWF), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, TH, TWF), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID, TH, TWF), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )


def bench(name, call, reps=3, inner=192):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-30000, 30000, (GRID, TH, BW)).astype(np.int16))
    cs = [jnp.asarray(rng.integers(-100, 100, (BW, TWF)).astype(np.float32),
                      dtype=BF) for _ in range(3)]
    jc = jax.jit(call)

    def run(w):
        def body(i, carry):
            w, acc = carry
            w = jax.lax.dynamic_update_slice(
                w, i.astype(jnp.int16).reshape(1, 1, 1), (0, 0, 0))
            o = jc(w, *cs)
            return w, acc ^ o[0, :8, :128]
        _, acc = jax.lax.fori_loop(
            0, inner, body, (w, jnp.zeros((8, 128), jnp.uint8)))
        return acc[0, 0]

    jr = jax.jit(run)
    int(jr(w))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(jr(w))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s}: {best/inner*1e3:7.3f} ms/frame-equivalent")
    return best / inner


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    a = bench("k0%128, kl=512", make(128, 512))
    b = bench("k0%64,  kl=384", make(64, 384))
    c = bench("k0%32,  kl=384", make(32, 384))
    print(f"64-align speedup: {a/b:.2f}x   32-align: {a/c:.2f}x")
