"""Blocked main+halo band decomposition vs the Element band window
(VERDICT r4 #7): the last unexplored DMA idea from the legacy padded mode.

Hypothesis under test: splitting the kernel's overlapping Y band window
into a disjoint Blocked ``step`` window plus a small Blocked ``halo``
window (halo | step, so both offsets are index*shape) lowers through
Mosaic's Blocked pipeline emitter, which the legacy-era notes claimed was
~4x cheaper per grid step than the Element path.  Both variants move the
SAME bytes per step (step + halo == band — the halo must cover the
overlap), so any difference is pure pipeline-emitter / scheduling cost,
NOT bandwidth: this synthetic isolates exactly that before investing in a
kernel variant.

Three kernels, identical compute (full-band row-sum, so every fetched row
is read — Mosaic narrows window fetches to what the kernel touches,
NOTES.md round-4 item 9), identical stores:

  element  : one Element window (band, W) at offset t*step   [current form]
  blocked2 : Blocked (step, W) idx t  +  Blocked (halo, W) idx
             (t*step+step)/halo, concatenated in VMEM          [candidate]
  blocked1 : Blocked (step, W) idx t only — fetches step rows/step, the
             no-overlap lower bound (calibrates bytes vs emitter cost)

Timing: in-jit fori_loop with per-iteration 1-byte input perturbation,
two-point slope (harness rules, NOTES.md).  Run on the real chip.
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


def build(variant, n_t, step, halo, w):
    band = step + halo
    n_rows = n_t * step + halo          # covers the last tile's halo
    out_shape = jax.ShapeDtypeStruct((n_t * 8, w), jnp.int32)
    out_spec = pl.BlockSpec((8, w), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)

    def body(rows):
        s = jnp.sum(rows.astype(jnp.int32), axis=0, keepdims=True)
        return jnp.broadcast_to(s, (8, w))

    if variant == "element":
        def kernel(b_ref, o_ref):
            o_ref[...] = body(b_ref[...])
        in_specs = [pl.BlockSpec(
            (E(band), E(w)),
            lambda t: (pl.multiple_of(t * step, 32), 0),
            memory_space=pltpu.VMEM)]
    elif variant == "blocked2":
        assert step % halo == 0
        def kernel(m_ref, h_ref, o_ref):
            o_ref[...] = body(
                jnp.concatenate([m_ref[...], h_ref[...]], axis=0))
        in_specs = [
            pl.BlockSpec((step, w), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((halo, w),
                         lambda t: ((t + 1) * (step // halo), 0),
                         memory_space=pltpu.VMEM),
        ]
    elif variant == "blocked1":
        def kernel(m_ref, o_ref):
            o_ref[...] = body(m_ref[...])
        in_specs = [pl.BlockSpec((step, w), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM)]
    else:
        raise ValueError(variant)

    n_in = len(in_specs)
    call = pl.pallas_call(
        kernel, grid=(n_t,), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))
    if variant == "blocked2":
        return lambda x: call(x, x), n_rows
    return call, n_rows


def measure(call, src):
    def run(n):
        def step_fn(i, carry):
            x, acc = carry
            x = jax.lax.dynamic_update_slice(
                x, (i & 255).astype(jnp.uint8).reshape(1, 1), (0, 0))
            o = call(x)
            return x, acc ^ o[:8, :128]

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

    # >= 80 ms of marginal work at the ~15-30 us/call scale (2x the
    # harness-rule floor: runs 1-2 at the 40 ms floor disagreed by ~25%
    # on the blocked2 rows, so the tiebreaker run buys more SNR)
    t_lo, t_hi = run(64), run(4160)
    return (t_hi - t_lo) / 4096         # s per call


def main():
    rng = np.random.default_rng(0)
    # (name, n_t, step, halo, w): luma-like DMA-heavy, then a narrow
    # config where per-step overhead dominates DMA
    configs = [
        ("luma-like  ", 64, 64, 64, 3840),
        ("luma-halo32", 64, 64, 32, 3840),
        ("narrow     ", 256, 64, 64, 512),
    ]
    for name, n_t, step, halo, w in configs:
        row = [name]
        for variant in ("element", "blocked2", "blocked1"):
            call, n_rows = build(variant, n_t, step, halo, w)
            src = jax.device_put(
                rng.integers(0, 256, (n_rows, w), np.uint8))
            dt = measure(call, src)
            mb = n_t * (step + (halo if variant != "blocked1" else 0)) \
                * w / 1e6
            row.append(f"{variant}={dt*1e6:7.1f}us ({mb:5.1f}MB "
                       f"{mb/1e3/max(dt,1e-9):5.0f}GB/s)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    main()
