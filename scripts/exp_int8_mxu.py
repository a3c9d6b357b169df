"""Does the MXU double-pump int8 through current Mosaic?

Times a grid of pure matmul kernels: bf16xbf16->f32, s8xs8->i32, and
s8xs8->f32, same shapes, measuring effective MAC/s.  If s8 runs ~2x bf16,
the X pass can switch to balanced-s8 byte planes.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 256, 1024, 512
STEPS = 64


def make(in_dt, acc_dt):
    def kernel(a_ref, b_ref, out_ref):
        out_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                               preferred_element_type=acc_dt)

    return pl.pallas_call(
        kernel, grid=(STEPS,),
        in_specs=[pl.BlockSpec((None, M, K), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, N), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, M, N), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS, M, N), acc_dt),
    )


def bench(name, in_dt, acc_dt, reps=3):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-100, 100, (STEPS, M, K)).astype(in_dt))
    b = jnp.asarray(rng.integers(-100, 100, (K, N)).astype(in_dt))
    call = jax.jit(make(jnp.dtype(in_dt).name, acc_dt))

    def run(a, b):
        def body(i, carry):
            a, acc = carry
            a = jax.lax.dynamic_update_slice(
                a, i.astype(a.dtype).reshape(1, 1, 1), (0, 0, 0))
            o = call(a, b)
            return a, acc + o[0, 0, 0].astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, 8, body, (a, jnp.float32(0)))
        return acc

    jr = jax.jit(run)
    float(jr(a, b))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jr(a, b))
        best = min(best, time.perf_counter() - t0)
    macs = 8 * STEPS * M * K * N
    print(f"{name:18s}: {best*1e3:7.2f} ms  {macs/best/1e12:6.2f} Tmac/s")


if __name__ == "__main__":
    import numpy as np
    print("platform:", jax.devices()[0].platform)
    bench("bf16 -> f32", np.float32, jnp.float32)  # cast below
    # real dtypes:
    rngnote = None
    for name, in_np, acc in [
        ("bf16xbf16->f32", "bfloat16", jnp.float32),
        ("s8xs8->i32", "int8", jnp.int32),
        ("s8xs8->f32", "int8", jnp.float32),
    ]:
        try:
            bench(name, in_np, acc)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s}: FAILED {type(e).__name__}: {str(e)[:160]}")
