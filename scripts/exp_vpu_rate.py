"""Measure the v5e in-pallas VPU elementwise rate for the op mixes the
resize kernels actually use, to anchor the 'VPU-bound' claim.

Three kernels on a (96, 1920) i32 tile, P repetitions per grid step
(slope over P isolates the per-op cost from load/store):
  mix=mad    : v = v * 3 + 7                       (2 ops/elem/rep)
  mix=epi    : the exact rounding epilogue sequence — (v+half)>>6,
               int16 wrap, clip, u8 cast, xor-accumulate (8 ops)
  mix=split  : the s8 work split — a=(v*65536)>>24, b=(v&255)-128,
               int8 casts, xor-accumulate (6 ops)

Rates are reported in Gop/s (ops = the per-elem counts above).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 96, 1920
STEPS = 12


def build(mix, p):
    def kernel(x_ref, o_ref):
        v = x_ref[...]
        acc = jnp.zeros((TH, TW), jnp.int32)
        for i in range(p):
            if mix == "mad":
                v = v * 3 + 7
                acc ^= v
            elif mix == "epi":
                m = (v + 32) >> 6
                m = ((m + 32768) & 65535) - 32768
                u = jnp.clip(m, 0, 255).astype(jnp.uint8)
                acc ^= u.astype(jnp.int32)
                v = v + 1
            elif mix == "split":
                a = ((v * 65536) >> 24).astype(jnp.int8)
                b = ((v & 255) - 128).astype(jnp.int8)
                acc ^= (a ^ b).astype(jnp.int32)
                v = v + 1
        o_ref[...] = acc

    return pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((TH, TW), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, TW), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS * TH, TW), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))


OPS = {"mad": 2, "epi": 8, "split": 6}


def measure(call, src):
    def run(n):
        def step(i, carry):
            x, acc = carry
            x = jax.lax.dynamic_update_slice(
                x, i.reshape(1, 1), (0, 0))
            o = call(x)
            return x, acc ^ o[:8, :128]

        def fn(x):
            _, acc = jax.lax.fori_loop(
                0, n, step, (x, jnp.zeros((8, 128), jnp.int32)))
            return acc[0, 0]

        jf = jax.jit(fn)
        int(jf(src))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            int(jf(src))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(96), run(384)
    return (t_hi - t_lo) / 288          # s per call


def main():
    rng = np.random.default_rng(0)
    src = jax.device_put(
        rng.integers(-2**20, 2**20, (STEPS * TH, TW)).astype(np.int32))
    for mix in ("mad", "epi", "split"):
        ts = {}
        for p in (1, 4, 8):
            ts[p] = measure(build(mix, p), src)
        per_rep = (ts[8] - ts[1]) / 7            # s per extra rep per call
        elems = STEPS * TH * TW
        rate = OPS[mix] * elems / per_rep / 1e9
        print(f"{mix:6s}: t(P=1)={ts[1]*1e6:6.1f}us t(4)={ts[4]*1e6:6.1f} "
              f"t(8)={ts[8]*1e6:6.1f}  -> {per_rep*1e6:5.2f} us/rep "
              f"= {rate:6.0f} Gop/s ({OPS[mix]} ops/elem)")


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    main()
