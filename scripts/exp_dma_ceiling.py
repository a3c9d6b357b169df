"""Measure this chip's practical HBM streaming ceiling for the resize
kernel's access pattern (u8 tiles in, u8 tiles out).

The resize kernel's wall is max(MXU, DMA); knowing the DMA ceiling tells
us whether further MXU-side work can pay off.  Kernels:

  inc      — (th, W) u8 tiles in -> x+1 out (read+write symmetric)
  inc_i32  — same bytes as (H, W/4) int32 tiles (is u8 streaming
             element/tiling-limited rather than byte-limited?)
  readsum  — (th, W) u8 in -> (th, 128) u8 out, folding ALL W columns
             into the output (read-dominated, the resize kernel's shape:
             8.3 MB read, 0.3 MB written).  Every column is consumed —
             Mosaic narrows window fetches to what the kernel touches
             (NOTES round-4 item 9), so a kernel that uses a slice
             measures nothing.
  resize4k — the actual 4K lanczos3 kernel, for reference

**Elision-proof harness** (two rounds of lessons: the round-4 XLA elided
independent fori_loop iterations outright; a round-5 rewrite chained the
iterations but could not distinguish real traffic from narrowed fetches):
every iteration is a SERIAL CHAIN — each kernel's full output is the next
iteration's input — and the chain's final value is ASSERTED against the
arithmetic the chain must have performed (x+1 applied `inner` times wraps
u8/i32 deterministically), so a fast number from skipped work is
impossible by construction.  Timed via the two-point in-jit slope with
>= 40 ms of marginal work (harness rules, NOTES.md).

Run: python scripts/exp_dma_ceiling.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 2160, 3840
TH = 216


def make_inc(dtype, w, h=H):
    def kernel(x_ref, o_ref):
        if dtype == jnp.uint8:
            # Mosaic has no i8 vector add; hop through i16 (mask keeps
            # the u8 wrap semantics the value check expects)
            v = x_ref[...].astype(jnp.int16)
            o_ref[...] = ((v + 1) & 255).astype(jnp.uint8)
        else:
            o_ref[...] = x_ref[...] + dtype(1)

    return pl.pallas_call(
        kernel, grid=(h // TH,),
        in_specs=[pl.BlockSpec((TH, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), dtype))


def make_readsum():
    def kernel(x_ref, o_ref):
        v = x_ref[...].astype(jnp.int32)
        # consume EVERY column: fold W into 128-lane chunks
        s = v.reshape(TH, W // 128, 128).sum(axis=1)
        o_ref[...] = (s & 255).astype(jnp.uint8)

    return pl.pallas_call(
        kernel, grid=(H // TH,),
        in_specs=[pl.BlockSpec((TH, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, 128), jnp.uint8))


def slope_time(call, x, bytes_per_app, fold, expect=None,
               lo=32, hi=4128):
    """Two-point slope of a SERIAL chain: body i+1's input depends on
    body i's output via ``fold(x, o) -> next x``, so no application can
    be reordered or dropped; ``expect(x0, inner)`` asserts the chain's
    final probe value, proving the work actually ran."""
    def make_run(inner):
        def run(x):
            def body(_, x):
                return fold(x, call(x))
            x = jax.lax.fori_loop(0, inner, body, x)
            # full-array checksum: passing it requires EVERY element of
            # the final chain value, so no slice/narrowing shortcut can
            # fake the timing (3-corner probes proved too weak a claim)
            return jnp.sum(x.astype(jnp.uint32)).astype(jnp.int32)
        return jax.jit(run)

    # the two-point slope needs >= 40 ms of marginal work or the tunnel
    # RTT jitter (+-1-2 ms) swamps it (harness rules); at the ~10-50
    # us/app scale that means >= 4096 marginal apps (callers with slower
    # kernels pass smaller lo/hi)
    times = {}
    for inner in (lo, hi):
        r = make_run(inner)
        got = int(r(x))
        if expect is not None:
            want = expect(np.asarray(x), inner)
            assert got == want, (inner, got, want)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(r(x))
            best = min(best, time.perf_counter() - t0)
        times[inner] = best
    dt = (times[hi] - times[lo]) / (hi - lo)
    print(f"           [abs: {lo} apps = {times[lo]*1e3:.1f} ms, "
          f"{hi} apps = {times[hi]*1e3:.1f} ms]", flush=True)
    return dt, bytes_per_app / dt / 1e9


def _fold_chain(x, o):
    return o                       # output IS the next input (same shape)


def _fold_slice(x, o):
    # fold a small output slice back into the input: forces the serial
    # dependency (pallas_call is opaque to XLA, so consuming any slice
    # forces the whole application; the kernel itself consumes all bytes)
    return jax.lax.dynamic_update_slice(x, o[:8, :128].astype(x.dtype),
                                        (0, 0))


def _expect_inc(dtype):
    def expect(x0, inner):
        fin = x0.astype(np.int64) + inner
        if dtype == np.uint8:
            fin &= 0xFF
        else:
            fin %= 2**32            # device views the sum through uint32
        # the device checksum accumulates in uint32 then views as int32
        total = int(fin.sum() % 2**32)
        return ((total + 2**31) % 2**32) - 2**31
    return expect


def main() -> None:
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 256, (H, W), np.uint8))

    dt, gbs = slope_time(jax.jit(make_inc(jnp.uint8, W)), x, 2 * H * W,
                         _fold_chain, _expect_inc(np.uint8))
    print(f"inc      : {dt*1e6:8.1f} us  {gbs:6.1f} GB/s (r+w, "
          f"value-verified)", flush=True)

    x32 = jax.device_put(
        rng.integers(0, 100, (H, W // 4), np.int32))
    dt, gbs = slope_time(jax.jit(make_inc(jnp.int32, W // 4)), x32,
                         2 * H * W, _fold_chain, _expect_inc(np.int32))
    print(f"inc_i32  : {dt*1e6:8.1f} us  {gbs:6.1f} GB/s (r+w, "
          f"value-verified; 8.3 MB chain — XLA may keep the aliased "
          f"loop buffer in VMEM (~16 MB), so above-HBM rates here mean "
          f"VMEM-resident, not HBM)", flush=True)

    # the rows that pin the actual HBM rate: 33 MB buffers (4x height)
    # CANNOT be VMEM-resident on a ~16 MB-VMEM core, so the chain is
    # forced through HBM every application
    H4 = 4 * H
    xb = jax.device_put(rng.integers(0, 256, (H4, W), np.uint8))
    dt, gbs = slope_time(jax.jit(make_inc(jnp.uint8, W, H4)), xb,
                         2 * H4 * W, _fold_chain, _expect_inc(np.uint8),
                         lo=32, hi=544)
    print(f"inc33MB  : {dt*1e6:8.1f} us  {gbs:6.1f} GB/s (u8 r+w, "
          f"value-verified, over-VMEM => true HBM)", flush=True)

    xb32 = jax.device_put(rng.integers(0, 100, (H4, W // 4), np.int32))
    dt, gbs = slope_time(jax.jit(make_inc(jnp.int32, W // 4, H4)), xb32,
                         2 * H4 * W, _fold_chain, _expect_inc(np.int32),
                         lo=32, hi=544)
    print(f"inc33MB32: {dt*1e6:8.1f} us  {gbs:6.1f} GB/s (i32 r+w, "
          f"value-verified, over-VMEM => true HBM)", flush=True)

    # discriminator: f(x) = (x ^ C) + 1 has no algebraic shortcut across
    # applications (f^n is not g(n) for any cheap g) and no delta/constant
    # structure a smart memory path could exploit, yet costs only 2 VPU
    # ops/elem — if THIS also beats nominal HBM SoL, the chip genuinely
    # streams i32 that fast; if it collapses to ~HBM rates, the +1 rows
    # were special-cased somewhere below XLA
    C = 0x5A5A5A5A

    def mix_kernel(x_ref, o_ref):
        o_ref[...] = (x_ref[...] ^ jnp.int32(C)) + jnp.int32(1)

    mix_call = pl.pallas_call(
        mix_kernel, grid=(H4 // TH,),
        in_specs=[pl.BlockSpec((TH, W // 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, W // 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H4, W // 4), jnp.int32))

    def expect_mix(x0, inner):
        v = x0.astype(np.uint32)
        for _ in range(inner):
            v = (v ^ np.uint32(C)) + np.uint32(1)
        total = int(v.astype(np.uint64).sum() % 2**32)
        return ((total + 2**31) % 2**32) - 2**31

    dt, gbs = slope_time(jax.jit(mix_call), xb32, 2 * H4 * W,
                         _fold_chain, expect_mix, lo=32, hi=544)
    print(f"mix33MB32: {dt*1e6:8.1f} us  {gbs:6.1f} GB/s (i32 xor+add "
          f"chain, checksum-verified, no algebraic shortcut possible)",
          flush=True)

    # pure u8 copy chain: zero VPU work, so this is the uncontaminated
    # u8 DMA r+w rate for the kernel's block shape.  The chain of opaque
    # custom calls cannot be elided (XLA does not know the kernel body is
    # a copy; each call's output buffer feeds the next call and the final
    # checksum), though the value check only pins copy-correctness.
    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    copy_call = pl.pallas_call(
        copy_kernel, grid=(H4 // TH,),
        in_specs=[pl.BlockSpec((TH, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H4, W), jnp.uint8))

    def expect_copy(x0, inner):
        total = int(x0.astype(np.int64).sum() % 2**32)
        return ((total + 2**31) % 2**32) - 2**31

    dt, gbs = slope_time(jax.jit(copy_call), xb, 2 * H4 * W,
                         _fold_chain, expect_copy, lo=32, hi=544)
    print(f"copy33MB : {dt*1e6:8.1f} us  {gbs:6.1f} GB/s (u8 pure-copy "
          f"chain: uncontaminated u8 DMA r+w rate)", flush=True)

    dt, gbs = slope_time(jax.jit(make_readsum()), x, H * W, _fold_slice)
    print(f"readsum  : {dt*1e6:8.1f} us  {gbs:6.1f} GB/s (read, "
          f"all columns consumed)", flush=True)

    from libiqo_tpu.core.plan import build_plan
    from libiqo_tpu.ops import pallas_resize
    plan = build_plan("lanczos", 3840, 2160, 1920, 1080, degree=3)
    fn, ops = pallas_resize.make_resize_fn(plan)
    dops = tuple(jax.device_put(o) for o in ops)
    io_bytes = H * W + 1920 * 1080
    dt, gbs = slope_time(jax.jit(lambda s: fn(*dops, s)), x, io_bytes,
                         _fold_slice)
    print(f"resize4k : {dt*1e6:8.1f} us  {gbs:6.1f} GB/s (io est; serial "
          f"chain — the configs bench allows inter-call overlap and is "
          f"the frame-time source of truth)", flush=True)


if __name__ == "__main__":
    main()
