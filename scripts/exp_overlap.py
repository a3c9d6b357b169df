"""Does Mosaic overlap windowed-band DMA with MXU compute?

The round-4 luma stage account is ADDITIVE (dma 18.7 + Y 5.6 + X 12.0 +
epi 2.7 us ~= the 38.7 us total), which is the signature of a pipeline
with NO DMA/compute overlap.  If the band-window fetch double-buffered
properly, the frame should cost ~max(DMA, compute) + ramp instead of the
sum — nearly 2x on the headline config.

This experiment isolates the question with a minimal band-windowed kernel
(same all-Element specs as the real one, luma-like sizes) and a compute
knob P = number of repeated s8 MXU dots per grid step:

  time(P) ~ DMA + P*dot   -> serial pipeline (no overlap)
  time(P) ~ max(DMA, P*dot) -> overlapping pipeline

Variants probe what controls it:
  elem      all-Element band window, default pipeline_mode (the real
            kernel's configuration today)
  elem-b2   same + explicit pl.Buffered(buffer_count=2)
  blocked   non-overlapping Blocked band (no halo: WRONG for resize, but
            a control for Element-vs-Blocked pipelining)
  parallel  elem + dimension_semantics=("parallel",) instead of arbitrary

Measurement: in-jit fori_loop, src perturbed per iteration (defeats LICM),
slope between inner=24 and inner=72 (cancels the ~31 ms tunnel RTT).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax._src.pallas.core as pallas_core

E = pallas_core.Element

H, W = 2160, 3840          # luma-like source (8.3 MB u8)
TH = 96                    # out rows per step
STEP = 192                 # 2:1 vertical
BAND_H = 208               # 2*TH + 12 taps, like lanczos3, ceiled to 8
KD, ND = 128, 1920         # per-dot shape: (TH, KD) @ (KD, ND) s8 -> i32
N_TY = (1080 + TH - 1) // TH   # 12 row tiles (out rows padded to 1152)
CLAMP_HI = (H - BAND_H) // 32 * 32


def build(variant: str, p_dots: int):
    if variant == "blocked":
        band_h = STEP                 # halo-free control (not a resize)
        band_spec = pl.BlockSpec((band_h, W), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM)
    else:
        band_h = BAND_H

        def imap(t):
            o = jnp.maximum(0, jnp.minimum(CLAMP_HI, t * STEP))
            return (pl.multiple_of(o, 32), 0)

        band_spec = pl.BlockSpec(
            (E(band_h), E(W)), imap, memory_space=pltpu.VMEM,
            pipeline_mode=(pl.Buffered(2) if variant == "elem-b2" else None))

    def kernel(band_ref, coef_ref, out_ref):
        if p_dots == 0:
            out_ref[...] = band_ref[:TH, :ND]
            return
        acc = jnp.zeros((TH, ND), jnp.int32)
        c = coef_ref[...]
        for i in range(p_dots):
            w = band_ref[pl.ds(i * 8, KD), :ND].astype(jnp.int8)
            acc += jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        out_ref[...] = (acc & 255).astype(jnp.uint8)

    sem = "parallel" if variant == "parallel" else "arbitrary"
    return pl.pallas_call(
        kernel,
        grid=(N_TY,),
        in_specs=[band_spec,
                  pl.BlockSpec((TH, KD), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, ND), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TY * TH, ND), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(sem,),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def measure(call, src, coef):
    def run(n):
        def step(i, carry):
            x, acc = carry
            x = jax.lax.dynamic_update_slice(
                x, i.astype(jnp.uint8).reshape(1, 1), (0, 0))
            o = call(x, coef)
            return x, acc ^ o[:8, :128]

        def fn(x):
            _, acc = jax.lax.fori_loop(
                0, n, step, (x, jnp.zeros((8, 128), jnp.uint8)))
            return acc[0, 0]

        jf = jax.jit(fn)
        int(jf(src))                       # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            int(jf(src))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(256), run(1024)
    return (t_hi - t_lo) / 768 * 1e6       # us/frame


def main():
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.integers(0, 256, (H, W), np.uint8))
    coef = jax.device_put(
        rng.integers(-64, 64, (TH, KD)).astype(np.int8))
    variants = sys.argv[1:] or ["elem", "elem-b2", "blocked", "parallel"]
    for variant in variants:
        base = None
        for p in (0, 1, 2, 4, 8):
            try:
                us = measure(build(variant, p), src, coef)
            except Exception as e:  # noqa: BLE001
                print(f"{variant:9s} P={p}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")
                break
            if base is None:
                base = us
            print(f"{variant:9s} P={p}: {us:7.1f} us/frame"
                  f"  (+{us - base:6.1f} vs P=0)")


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    main()
