"""Can the X pass run on the VPU for single-phase (rDst==1) geometries?

For 4K->1080p lanczos3 (the headline config) the reduced X ratio is 2/1:
every output column uses the SAME 12 consecutive taps at stride-2 starts,
so the X pass is a 12-tap correlation + stride-2 subsample:

    out[d] = sum_i c_i * w[2d + s0 + i]

Round-2 probe findings baked in here:
  * lax.slice with stride 2 does NOT compile (Mosaic extract_strided_slice
    only allows stride 1) -> any subsample must come from pre-deinterleaved
    inputs (w_e = w[:, ::2] built outside the kernel / via separate bands).
  * A naive one-op-per-grid-step probe is DMA-bound (~63 us/step for a
    573 KB i32 block) and says nothing about compute.

This probe therefore repeats each variant R times in-kernel over resident
VMEM data (loop-carried +r perturbation defeats CSE) and reports the
marginal cost per application vs an empty loop.

Variants (all produce (TH, TW)):
  dense4   : current X pass - 4 bf16 dots over the full band + recombine
  corr_i32 : deinterleaved 2x 6-tap i32 correlation (exact, no byte split)
  corr_f32 : deinterleaved byte-split f32 correlation (2 planes x 12 taps)
  muls_i32 / muls_f32 : raw multiply-add rate without shifts

MEASURED (v5e via axon, slope between R=10 and R=110 in-kernel repeats,
loop-carried dus perturbation, single sync — the only trustworthy harness;
naive per-call timing reads the ~24 ms tunnel sync floor):

  empty       0.37 us/app      (loop overhead)
  dense4      2.29 us/app      <- current X pass per (160,384) tile
  muls_i32    1.03 us/app      (i32 multiply ~1 T/s — slow but not fatal)
  muls_f32    0.38 us/app      (~free; hidden under loop overhead)
  corr_i32    0.87 us/app      <- 2.6x cheaper than dense4, exact
  corr_f32    1.75 us/app      (byte splits cost more than i32 muls)

So a VPU correlation X pass beats the MXU dense-block X pass for
single-phase geometries — IF the work rows arrive deinterleaved
(w_e = w[:, ::2]), because Mosaic cannot stride-2-slice anything
(extract_strided_slice requires stride 1; same for subsampling a
full-rate correlation).  Deinterleaving the source in HBM costs ~91
us/frame of bandwidth (> the ~50 us/frame saved) and the Y dot cannot
emit split lanes, so this is parked unless a cheap in-kernel
deinterleave shows up.

Run on the real chip: python scripts/exp_vpu_xpass.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW, TAPS = 160, 384, 12
HALF = TAPS // 2
BAND = 2 * TW + 128          # dense band width
WDI = TW + 128               # deinterleaved plane width
R = 24                       # in-kernel repeats

rng = np.random.default_rng(0)
W_DENSE = rng.integers(-32768, 32768, (TH, BAND)).astype(np.int32)
W_E = rng.integers(-32768, 32768, (TH, WDI)).astype(np.int32)
W_O = rng.integers(-32768, 32768, (TH, WDI)).astype(np.int32)
C = [int(v) for v in rng.integers(-2000, 16384, TAPS)]
CX_HI = rng.integers(-128, 128, (BAND, TW)).astype(np.float32)
CX_LO = rng.integers(0, 256, (BAND, TW)).astype(np.float32)


def gold_corr(we, wo):
    acc = np.zeros((TH, TW), np.int64)
    for k in range(HALF):
        acc += C[2 * k] * we[:, k:k + TW].astype(np.int64)
        acc += C[2 * k + 1] * wo[:, k:k + TW].astype(np.int64)
    return (acc & 0xFFFFFFFF).astype(np.uint32).view(np.int32)


def body_of(variant, we, wo, wd, cxh, cxl):
    if variant == "empty":
        return we[:, :TW]
    if variant == "dense4":
        dt = jnp.bfloat16
        w_lo = (wd & 255).astype(dt)
        w_hi = (wd >> 8).astype(dt)
        s = None
        for cc in (cxh, cxl):
            hi = jnp.dot(w_hi, cc, preferred_element_type=jnp.float32)
            lo = jnp.dot(w_lo, cc, preferred_element_type=jnp.float32)
            part = hi.astype(jnp.int32) * 256 + lo.astype(jnp.int32)
            s = part if s is None else s + part
        return s[:, :TW]
    if variant == "corr_i32":
        acc = None
        for k in range(HALF):
            t = (C[2 * k] * jax.lax.slice(we, (0, k), (TH, k + TW))
                 + C[2 * k + 1] * jax.lax.slice(wo, (0, k), (TH, k + TW)))
            acc = t if acc is None else acc + t
        return acc
    if variant == "corr_f32":
        acc_h = acc_l = None
        for w in (we, wo):
            pass
        we_h = (we >> 8).astype(jnp.float32)
        we_l = (we & 255).astype(jnp.float32)
        wo_h = (wo >> 8).astype(jnp.float32)
        wo_l = (wo & 255).astype(jnp.float32)
        for k in range(HALF):
            ce, co = float(C[2 * k]), float(C[2 * k + 1])
            th_ = (ce * jax.lax.slice(we_h, (0, k), (TH, k + TW))
                   + co * jax.lax.slice(wo_h, (0, k), (TH, k + TW)))
            tl_ = (ce * jax.lax.slice(we_l, (0, k), (TH, k + TW))
                   + co * jax.lax.slice(wo_l, (0, k), (TH, k + TW)))
            acc_h = th_ if acc_h is None else acc_h + th_
            acc_l = tl_ if acc_l is None else acc_l + tl_
        return acc_h.astype(jnp.int32) * 256 + acc_l.astype(jnp.int32)
    if variant == "muls_i32":
        acc = None
        a = we[:, :TW]
        b = wo[:, :TW]
        for k in range(HALF):
            t = C[2 * k] * a + C[2 * k + 1] * b
            acc = t if acc is None else acc + t
        return acc
    if variant == "muls_f32":
        a = we[:, :TW].astype(jnp.float32)
        b = wo[:, :TW].astype(jnp.float32)
        acc = None
        for k in range(HALF):
            t = float(C[2 * k]) * a + float(C[2 * k + 1]) * b
            acc = t if acc is None else acc + t
        return acc.astype(jnp.int32)
    raise ValueError(variant)


def make(variant):
    def kernel(we_ref, wo_ref, wd_ref, cxh_ref, cxl_ref, out_ref):
        we0, wo0, wd0 = we_ref[...], wo_ref[...], wd_ref[...]
        cxh = cxh_ref[...].astype(jnp.bfloat16)
        cxl = cxl_ref[...].astype(jnp.bfloat16)

        def body(r, acc):
            we = we0 + r
            wo = wo0 + r
            wd = wd0 + r
            return acc + body_of(variant, we, wo, wd, cxh, cxl)

        out_ref[...] = jax.lax.fori_loop(0, R, body,
                                         jnp.zeros((TH, TW), jnp.int32))

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TH, TW), jnp.int32),
    )


def bench(variant, reps=5):
    try:
        call = jax.jit(make(variant))
        args = (jnp.asarray(W_E), jnp.asarray(W_O), jnp.asarray(W_DENSE),
                jnp.asarray(CX_HI, jnp.bfloat16), jnp.asarray(CX_LO, jnp.bfloat16))
        call(*args).block_until_ready()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(32):
                o = call(*args)
            o.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        us = best / (32 * R) * 1e6
        print(f"{variant:10s}: {us:8.3f} us/application")
        return us
    except Exception as e:  # noqa: BLE001
        print(f"{variant:10s}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None


def check_exact():
    """corr_i32 single application == numpy int32-wrap correlation."""
    def kernel(we_ref, wo_ref, out_ref):
        out_ref[...] = body_of("corr_i32", we_ref[...], wo_ref[...],
                               None, None, None)

    call = pl.pallas_call(
        kernel, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TH, TW), jnp.int32))
    got = np.asarray(jax.jit(call)(jnp.asarray(W_E), jnp.asarray(W_O)))
    print("corr_i32 exact vs numpy:", np.array_equal(got, gold_corr(W_E, W_O)))


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    base = bench("empty")
    for v in ("dense4", "muls_i32", "muls_f32", "corr_i32", "corr_f32"):
        bench(v)
    check_exact()
