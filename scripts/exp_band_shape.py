"""Bisect the real kernel's band-fetch overhead (round-5 lead).

`exp_i32_band.py`'s u8 baseline (2-D Element band window, default
semantics, static offsets, 1-D grid) runs the full Y pass — same band
bytes, same s8 dot — in ~7 us/frame, while the production kernel's
ablation attributes ~18.7 us to its band DMA stage alone.  The
production band spec differs in four ways; this synthetic adds them one
at a time to find which one(s) pay:

  base     : 2-D src, 2-D Element window, default semantics, static offs
  arb      : + dimension_semantics=("arbitrary",)
  grid3    : 3-D src (1,H,W), 3-D window (E(1),E(band),E(W)), 3-D grid
             (1,1,n_t), arbitrary x3   [the frame-stacking shape at bf=1]
  clamp    : grid3 + clamped offsets (jnp.minimum/maximum + multiple_of,
             exactly the production band_map)
  u8out    : clamp + u8 (1,th,W) output tile instead of i32 (th,W)
             [the production store dtype; i32 stores 4x the bytes]
  streams  : u8out + the production kernel's six tiny per-tile operand
             streams (three (th,1) i32 row blocks = 128 B DMAs, three
             (1,tw) i32 col blocks = 7.5 KB DMAs) — the suspect: tiny
             window DMAs may stall the pipeline far beyond their bytes

All variants compute the same Y-pass values (value-checked against
base).  Run on the real chip: python scripts/exp_band_shape.py
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

H, W = 2160, 3840
TH = 32
STEP = 64
BAND = 96
N_T = (H - BAND) // STEP + 1
CLAMP_HI = H - BAND            # last valid window start, 32-multiple here


def _body(c, band_u8, out_dtype):
    band = (band_u8 ^ jnp.uint8(0x80)).astype(jnp.int8)
    r = jnp.dot(c, band, preferred_element_type=jnp.int32)
    if out_dtype == jnp.uint8:
        r = (r & 255).astype(jnp.uint8)
    return r


def build(variant, coef):
    arb1 = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    arb3 = pltpu.CompilerParams(dimension_semantics=("arbitrary",) * 3)

    if variant in ("base", "arb"):
        def kernel(c_ref, b_ref, o_ref):
            o_ref[...] = _body(c_ref[...], b_ref[...], jnp.int32)

        return pl.pallas_call(
            kernel, grid=(N_T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((E(BAND), E(W)),
                             lambda t: (pl.multiple_of(t * STEP, 32), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TH, W), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_T * TH, W), jnp.int32),
            compiler_params=arb1 if variant == "arb" else None), 2

    # 3-D variants: src (1, H, W), grid (1, 1, N_T), t = program_id(2)
    def off(t):
        if variant == "grid3":
            return pl.multiple_of(t * STEP, 32)
        o = jnp.minimum(CLAMP_HI, t * STEP)
        o = jnp.maximum(0, o)
        return pl.multiple_of(o, 32)

    u8out = variant in ("u8out", "streams")
    odt = jnp.uint8 if u8out else jnp.int32

    if variant in ("streams", "vmem"):
        TW = 1920
        res_mb = 0 if variant == "streams" else 4718592  # 4.5 MB resident

        def kernel_s(*refs):
            if res_mb:
                (c_ref, b_ref, big_ref, r0, r1, r2, c0, c1, c2,
                 o_ref, big_sc, sem) = refs
                first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                         & (pl.program_id(2) == 0))

                @pl.when(first)
                def _():
                    cp = pltpu.make_async_copy(big_ref, big_sc, sem)
                    cp.start()
                    cp.wait()
            else:
                c_ref, b_ref, r0, r1, r2, c0, c1, c2, o_ref = refs
            r = _body(c_ref[...], b_ref[0], jnp.int32)
            # consume every streamed operand so none is dead
            r = r + r0[...] + r1[...] + r2[...]
            r = r + jnp.concatenate([c0[...]] * 2, axis=1)[:1, :W]
            r = r + jnp.concatenate([c1[...]] * 2, axis=1)[:1, :W]
            r = r + jnp.concatenate([c2[...]] * 2, axis=1)[:1, :W]
            if res_mb:
                # consume one row of the resident slab so it stays live
                r = r + jnp.concatenate(
                    [big_sc[0:1, :].astype(jnp.int32)] * 30, axis=1)[:1, :W]
            o_ref[0] = (r & 255).astype(jnp.uint8)

        row_spec = pl.BlockSpec((TH, 1), lambda bg, tx, ty: (ty, 0),
                                memory_space=pltpu.VMEM)
        col_spec = pl.BlockSpec((1, TW), lambda bg, tx, ty: (0, tx),
                                memory_space=pltpu.VMEM)
        big_shape = (res_mb // 128, 128) if res_mb else None
        return pl.pallas_call(
            kernel_s, grid=(1, 1, N_T),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((E(1), E(BAND), E(W)),
                             lambda bg, tx, ty: (bg, off(ty), 0),
                             memory_space=pltpu.VMEM),
                *([pl.BlockSpec(memory_space=pl.ANY)] if res_mb else []),
                row_spec, row_spec, row_spec,
                col_spec, col_spec, col_spec,
            ],
            out_specs=pl.BlockSpec((1, TH, W),
                                   lambda bg, tx, ty: (bg, ty, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N_T * TH, W), odt),
            scratch_shapes=([pltpu.VMEM(big_shape, jnp.int8),
                             pltpu.SemaphoreType.DMA]
                            if res_mb else []),
            compiler_params=arb3), 3

    def kernel3(c_ref, b_ref, o_ref):
        o_ref[0] = _body(c_ref[...], b_ref[0], odt)

    return pl.pallas_call(
        kernel3, grid=(1, 1, N_T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((E(1), E(BAND), E(W)),
                         lambda bg, tx, ty: (bg, off(ty), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W), lambda bg, tx, ty: (bg, ty, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N_T * TH, W), odt),
        compiler_params=arb3), 3


def measure(call, coef_dev, src):
    def run(n):
        def step_fn(i, carry):
            x, acc = carry
            upd = (i & 255).astype(jnp.uint8).reshape((1,) * x.ndim)
            x = jax.lax.dynamic_update_slice(x, upd, (0,) * x.ndim)
            o = call(coef_dev, x)
            o2 = o[0] if o.ndim == 3 else o
            return x, acc ^ o2[:8, :128].astype(jnp.int32)

        def fn(x):
            _, acc = jax.lax.fori_loop(
                0, n, step_fn, (x, jnp.zeros((8, 128), jnp.int32)))
            return acc[0, 0]

        jf = jax.jit(fn)
        int(jf(src))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            int(jf(src))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(64), run(2112)
    return (t_hi - t_lo) / 2048


def main():
    rng = np.random.default_rng(0)
    coef = rng.integers(-64, 64, (TH, BAND), np.int8)
    src = rng.integers(0, 256, (H, W), np.uint8)
    coef_dev = jax.device_put(coef)
    d2 = jax.device_put(src)
    d3 = jax.device_put(src[None])

    # zero-valued streamed operands: the streams variant stays
    # value-identical to u8out while still forcing six per-tile DMAs
    zr = [jax.device_put(np.zeros((N_T * TH, 1), np.int32))
          for _ in range(3)]
    zc = [jax.device_put(np.zeros((1, 1920), np.int32)) for _ in range(3)]
    zbig = jax.device_put(np.zeros((4718592 // 128, 128), np.int8))

    ref = None
    for variant in ("base", "arb", "grid3", "clamp", "u8out", "streams",
                    "vmem"):
        call, ndim = build(variant, coef)
        raw = call
        if variant == "streams":
            call = jax.jit(lambda c, x, _raw=raw: _raw(c, x, *zr, *zc))
        elif variant == "vmem":
            call = jax.jit(lambda c, x, _raw=raw: _raw(c, x, zbig,
                                                       *zr, *zc))
        else:
            call = jax.jit(raw)
        arg = d2 if ndim == 2 else d3
        out = np.asarray(call(coef_dev, arg))
        out2 = out[0] if out.ndim == 3 else out
        if ref is None:
            ref = out2
            bad = 0
        else:
            want = ((ref & 255).astype(np.uint8)
                    if out2.dtype == np.uint8 else ref)
            bad = int((out2 != want).sum())
        dt = measure(call, coef_dev, arg)
        mb = N_T * BAND * W / 1e6
        print(f"{variant:6s}: {dt*1e6:7.1f} us/frame "
              f"({mb:5.1f} MB band, "
              f"{'values ok' if bad == 0 else f'{bad} MISMATCHES'})",
              flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    main()
