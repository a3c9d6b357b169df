"""Is block-banded dot decomposition faster than monolithic band dots?

The padless kernel's per-tile dots contract over the FULL band (X: K=896,
Y: K=336 for 4K lanczos3 at th=160/tw=384) although each output column/row
only touches ~numCoefs source positions.  Splitting outputs into aligned
groups lets each group contract over just its sub-window:

  Y mono : (160,336)@(336,896)            grouped: 4 x (40,96)@(96,896)
  X mono : 3 x (160,896)@(896,384)        grouped: 3 x 3 x (160,384)@(384,128)

Times several kernel variants shaped like the real tile loop (grid of 35
steps = 7x5 tiles/frame, coef blocks DMA'd once into VMEM scratch exactly
like the production kernel) to locate where the time actually goes.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, BH, BW, TW = 160, 336, 896, 384
GRID = 35  # 7x5 tiles per 4K->1080p frame
BF = jnp.bfloat16
F32 = jnp.float32


def dot(a, b):
    return jnp.dot(a, b, preferred_element_type=F32)


def make(ymode, xmode):
    ygrp = [(g * 40, 40, min(g * 80, BH - 96), 96) for g in range(4)]
    xgrp = [(g * 128, 128, max(0, 256 * g - 128), 384) for g in range(3)]

    def kernel(band_ref, cy_in, cx0_in, cx1_in, cx2_in, out_ref,
               cy_s, cx0_s, cx1_s, cx2_s, sem):
        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            for k, (s, d) in enumerate([(cy_in, cy_s), (cx0_in, cx0_s),
                                        (cx1_in, cx1_s), (cx2_in, cx2_s)]):
                cp = pltpu.make_async_copy(s, d, sem.at[k])
                cp.start()
                cp.wait()

        band = band_ref[...].astype(jnp.int32).astype(BF)
        cy = cy_s[...]
        if ymode == "mono":
            w = dot(cy, band).astype(jnp.int32)
        elif ymode == "grouped":
            parts = []
            for (o0, ol, k0, kl) in ygrp:
                parts.append(dot(cy[o0:o0 + ol, k0:k0 + kl],
                                 band[k0:k0 + kl, :]).astype(jnp.int32))
            w = jnp.concatenate(parts, axis=0)
        else:  # "skip": fake w from band slice, no Y dot
            w = band[:TH, :].astype(jnp.int32) * 37
        w = ((w + 32768) & 65535) - 32768
        b = ((w + 128) & 255) - 128
        a = (w - b) >> 8
        ab, bb, gb = a.astype(BF), b.astype(BF), (a + b).astype(BF)
        if xmode == "mono":
            sums = (dot(ab, cx0_s[...]).astype(jnp.int32) * 65280
                    - dot(bb, cx1_s[...]).astype(jnp.int32) * 255
                    + dot(gb, cx2_s[...]).astype(jnp.int32) * 256)
        elif xmode == "grouped":
            cx0, cx1, cx2 = cx0_s[...], cx1_s[...], cx2_s[...]
            parts = []
            for (o0, ol, k0, kl) in xgrp:
                s = (dot(ab[:, k0:k0 + kl], cx0[k0:k0 + kl, o0:o0 + ol])
                     .astype(jnp.int32) * 65280
                     - dot(bb[:, k0:k0 + kl], cx1[k0:k0 + kl, o0:o0 + ol])
                     .astype(jnp.int32) * 255
                     + dot(gb[:, k0:k0 + kl], cx2[k0:k0 + kl, o0:o0 + ol])
                     .astype(jnp.int32) * 256)
                parts.append(s)
            sums = jnp.concatenate(parts, axis=1)
        else:  # "skip"
            sums = (a[:, :TW] * 65280 + b[:, :TW] * 256)
        v = (sums + (1 << 19)) >> 20
        out_ref[...] = jnp.clip(((v + 32768) & 65535) - 32768,
                                0, 255).astype(jnp.uint8)

    return pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[
            pl.BlockSpec((None, BH, BW), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, TH, TW), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID, TH, TW), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((TH, BH), BF), pltpu.VMEM((BW, TW), BF),
            pltpu.VMEM((BW, TW), BF), pltpu.VMEM((BW, TW), BF),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def bench(name, call, reps=3, inner=256):
    rng = np.random.default_rng(0)
    band = jnp.asarray(rng.integers(0, 256, (GRID, BH, BW), np.uint8))
    cy = jnp.asarray(rng.integers(-64, 64, (TH, BH)).astype(np.float32),
                     dtype=BF)
    cxs = [jnp.asarray(rng.integers(-128, 128, (BW, TW)).astype(np.float32),
                       dtype=BF) for _ in range(3)]
    jc = jax.jit(call)

    def run(band):
        def body(i, carry):
            band, acc = carry
            band = jax.lax.dynamic_update_slice(
                band, i.astype(jnp.uint8).reshape(1, 1, 1), (0, 0, 0))
            o = jc(band, cy, *cxs)
            return band, acc ^ o[0, :8, :128]
        _, acc = jax.lax.fori_loop(
            0, inner, body, (band, jnp.zeros((8, 128), jnp.uint8)))
        return acc[0, 0]

    jr = jax.jit(run)
    int(jr(band))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(jr(band))
        best = min(best, time.perf_counter() - t0)
    per_frame = best / inner
    print(f"{name:22s}: {per_frame*1e3:7.3f} ms/frame-equivalent")
    return per_frame


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    for ym, xm in [("mono", "mono"), ("grouped", "mono"),
                   ("mono", "grouped"), ("grouped", "grouped"),
                   ("skip", "mono"), ("skip", "grouped"),
                   ("mono", "skip"), ("grouped", "skip"),
                   ("skip", "skip")]:
        bench(f"y={ym} x={xm}", make(ym, xm))
