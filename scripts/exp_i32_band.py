"""Round-5 DMA lead: fetch the Y-pass band i32-aliased instead of u8.

Why this could win: `exp_dma_ceiling.py` (round 5, checksum-verified)
measures u8 streams at ~0.5 TB/s r+w but i32 streams at ~3.2-4 TB/s —
the u8 wall is the DMA engine's narrow-element tiling (each 32-bit VMEM
word of the native i8 layout gathers bytes from 4 strided HBM rows), not
HBM itself.  The 4K-luma kernel's band fetch (u8 Element windows, ~12 MB
at 642 GB/s effective = 18.7 us of the 38.7 us frame) therefore sits at a
*u8* wall that an i32-aliased fetch could break.

The candidate design (no extra relayout anywhere):

  * band source aliased as (H, W/4) i32; the Element window moves the
    same bytes 4-per-lane-word (the fast DMA shape);
  * in-kernel unpack to 4 s8 planes p in {0,1,2,3}, plane p = source
    columns ≡ p (mod 4), via xor 0x80808080 + shifts + i8 casts;
  * Y dot per plane: C @ plane_p -> work in PERMUTED column order
    [c%4==0 | c%4==1 | ...] — never re-interleaved, because the X pass
    contracts over source columns and its dense blocks are built
    host-side: permuting their row indexing is free at build time.

This synthetic measures the full Y-pass chain for both forms (fetch +
convert + dot), value-checked against each other, so the decision number
includes the unpack VPU cost and any dot-shape effects:

  u8   : Element (band, W) u8 window,  xor 0x80, 1 s8 dot C@(band, W)
  i32  : Element (band, W/4) i32 window, packed xor, 4 plane extracts,
         4 s8 dots C@(band, W/4)  [outputs compared permuted]

Run: python scripts/exp_i32_band.py
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
TH = 32          # output rows per tile (the tuned luma tile height)
STEP = 64        # source rows per tile at 2:1
BAND = 96        # fetched band rows (taps=12 overlap, 32-aligned)
N_T = (H - BAND) // STEP + 1   # full-fit tiles only (synthetic)


def _mk_coef(rng):
    # lanczos3-like s8 Y taps: dense (TH, BAND) block, values in s8 range
    return rng.integers(-64, 64, (TH, BAND), np.int8)


def build_u8(coef):
    def kernel(c_ref, b_ref, o_ref):
        band = (b_ref[...] ^ jnp.uint8(0x80)).astype(jnp.int8)
        o_ref[...] = jnp.dot(c_ref[...], band,
                             preferred_element_type=jnp.int32)

    return pl.pallas_call(
        kernel, grid=(N_T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # resident coef
            pl.BlockSpec((E(BAND), E(W)),
                         lambda t: (pl.multiple_of(t * STEP, 32), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, W), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_T * TH, W), jnp.int32))


def build_i32(coef):
    W4 = W // 4

    def kernel(c_ref, b_ref, o_ref):
        # ^ 0x80808080 flips every byte's sign bit in one packed op
        # (0x80808080 as signed i32 == -0x7F7F7F80)
        y = b_ref[...] ^ jnp.int32(-0x7F7F7F80)
        for p in range(4):
            if p == 3:
                v = y >> 24                        # arithmetic: sign ok
            else:
                v = (y << (24 - 8 * p)) >> 24      # sign-extended byte p
            plane = v.astype(jnp.int8)
            o_ref[:, p * W4:(p + 1) * W4] = jnp.dot(
                c_ref[...], plane, preferred_element_type=jnp.int32)

    return pl.pallas_call(
        kernel, grid=(N_T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((E(BAND), E(W4)),
                         lambda t: (pl.multiple_of(t * STEP, 32), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, W), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_T * TH, W), jnp.int32))


def measure(call, *args):
    def run(n):
        def step_fn(i, carry):
            x, acc = carry
            x = jax.lax.dynamic_update_slice(
                x, (i & 255).astype(jnp.uint8).reshape(1, 1), (0, 0))
            o = call(*args[:-1], x)
            return x, acc ^ o[:8, :128]

        def fn(x):
            _, acc = jax.lax.fori_loop(
                0, n, step_fn, (x, jnp.zeros((8, 128), jnp.int32)))
            return acc[0, 0]

        jf = jax.jit(fn)
        int(jf(args[-1]))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            int(jf(args[-1]))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(64), run(2112)
    return (t_hi - t_lo) / 2048


def measure_i32(call, coef_dev, src_u8):
    # the perturbed loop input must stay the i32 alias; perturb a byte of
    # the first word via int32 xor instead
    def run(n):
        def step_fn(i, carry):
            x, acc = carry
            x = jax.lax.dynamic_update_slice(
                x, (x[0:1, 0:1] ^ (i & 255)), (0, 0))
            o = call(coef_dev, x)
            return x, acc ^ o[:8, :128]

        def fn(x):
            _, acc = jax.lax.fori_loop(
                0, n, step_fn, (x, jnp.zeros((8, 128), jnp.int32)))
            return acc[0, 0]

        jf = jax.jit(fn)
        int(jf(src_u8))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            int(jf(src_u8))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(64), run(2112)
    return (t_hi - t_lo) / 2048


def main():
    rng = np.random.default_rng(0)
    coef = _mk_coef(rng)
    src = rng.integers(0, 256, (H, W), np.uint8)
    src32 = src.reshape(H, W // 4, 4).astype(np.uint32)
    src32 = (src32[..., 0] | (src32[..., 1] << 8) | (src32[..., 2] << 16)
             | (src32[..., 3] << 24)).astype(np.int64)
    src32 = ((src32 + 2**31) % 2**32 - 2**31).astype(np.int32)

    coef_dev = jax.device_put(coef)
    d_u8 = jax.device_put(src)
    d_i32 = jax.device_put(src32)

    f_u8 = jax.jit(build_u8(coef))
    f_i32 = jax.jit(build_i32(coef))

    # value check: i32 output in permuted order == u8 output permuted
    o_u8 = np.asarray(f_u8(coef_dev, d_u8))
    o_i32 = np.asarray(f_i32(coef_dev, d_i32))
    W4 = W // 4
    perm = np.concatenate([np.arange(p, W, 4) for p in range(4)])
    ok = (o_i32 == o_u8[:, perm]).all()
    print(f"value check (i32 permuted == u8): {bool(ok)}", flush=True)
    assert ok

    dt_u8 = measure(f_u8, coef_dev, d_u8)
    mb = N_T * BAND * W / 1e6
    print(f"u8  band Y pass: {dt_u8*1e6:7.1f} us/frame "
          f"({mb:5.1f} MB band fetch)", flush=True)
    dt_i32 = measure_i32(f_i32, coef_dev, d_i32)
    print(f"i32 band Y pass: {dt_i32*1e6:7.1f} us/frame "
          f"(same bytes, 4-plane unpack + 4 dots)", flush=True)
    print(f"ratio u8/i32 = {dt_u8/dt_i32:.2f}x "
          f"({'i32 WINS' if dt_i32 < dt_u8 else 'u8 stays'})", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind, flush=True)
    main()
