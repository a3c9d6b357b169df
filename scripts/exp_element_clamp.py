"""Mosaic legality experiments for the padless kernel design.

X1: Element-mode band windows whose index_map clamps offsets with
    min/max (stays in bounds) — compile + value check, 2D and vmapped.
X2: Element-mode window extending past the array end (garbage tail) —
    legality only.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax._src.pallas.core as pallas_core

E = pallas_core.Element

H, W = 160, 640          # source
TH, TW = 32, 128         # out tile
BAND_H, BAND_W = 64, 256  # window
STEP_H, STEP_W = 32, 128
PAD_LO_H, PAD_LO_W = 32, 128   # ideal offsets start negative


def run_x1(batch=None):
    n_ty, n_tx = 4, 4
    hi_h = (H - BAND_H) // 32 * 32
    hi_w = (W - BAND_W) // 128 * 128

    def imap(tx, ty):
        oy = jnp.maximum(0, jnp.minimum(hi_h, ty * STEP_H - PAD_LO_H))
        ox = jnp.maximum(0, jnp.minimum(hi_w, tx * STEP_W - PAD_LO_W))
        return (pl.multiple_of(oy, 32), pl.multiple_of(ox, 128))

    def kernel(src_ref, out_ref):
        # write the window's top-left THxTW corner so we can check offsets
        out_ref[...] = src_ref[:TH, :TW]

    call = pl.pallas_call(
        kernel,
        grid=(n_tx, n_ty),
        in_specs=[pl.BlockSpec((E(BAND_H), E(BAND_W)), imap,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, TW), lambda tx, ty: (ty, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ty * TH, n_tx * TW), jnp.int32),
    )

    rng = np.random.default_rng(0)
    if batch:
        src = rng.integers(0, 1 << 20, (batch, H, W)).astype(np.int32)
        out = jax.jit(jax.vmap(call))(src)
    else:
        src = rng.integers(0, 1 << 20, (H, W)).astype(np.int32)
        out = jax.jit(call)(src)
    out = np.asarray(out)

    expect = np.zeros_like(out)
    for ty in range(n_ty):
        for tx in range(n_tx):
            oy = min(max(0, ty * STEP_H - PAD_LO_H), hi_h)
            ox = min(max(0, tx * STEP_W - PAD_LO_W), hi_w)
            expect[..., ty * TH:(ty + 1) * TH, tx * TW:(tx + 1) * TW] = \
                src[..., oy:oy + TH, ox:ox + TW]
    ok = np.array_equal(out, expect)
    print(f"X1 batch={batch}: {'OK' if ok else 'VALUE MISMATCH'}")
    return ok


def run_x2():
    # window deliberately past the end: offset fixed at H-32 with BAND_H=64
    def imap(t):
        return (pl.multiple_of((H - 32) // 32 * 32, 32), 0)

    def kernel(src_ref, out_ref):
        out_ref[...] = src_ref[:32, :TW]

    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((E(BAND_H), E(256)), imap,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, TW), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, TW), jnp.int32),
    )
    src = np.arange(H * W, dtype=np.int32).reshape(H, W)
    try:
        out = np.asarray(jax.jit(call)(src))
        ok = np.array_equal(out, src[H - 32:H - 32 + 32, :TW])
        print(f"X2 (OOB-high Element window): ran, in-bounds part "
              f"{'OK' if ok else 'WRONG'}")
    except Exception as e:  # noqa: BLE001
        print(f"X2 (OOB-high Element window): REJECTED: {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    run_x1()
    run_x1(batch=3)
    run_x2()


def run_x3():
    """Dynamic leading-dim index into a 3-D VMEM scratch ref (variant
    selection without pl.when)."""
    n_var, A, B = 3, 64, 256

    def kernel(var_hbm, out_ref, sc_ref, sem):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            cp = pltpu.make_async_copy(var_hbm, sc_ref, sem)
            cp.start()
            cp.wait()

        v = jnp.where(t == 0, 0, jnp.where(t == 3, 2, 1))
        out_ref[...] = sc_ref[v]

    call = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((None, A, B), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, A, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_var, A, B), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    var = np.arange(n_var * A * B, dtype=np.float32).reshape(n_var, A, B)
    try:
        out = np.asarray(jax.jit(call)(var))
        expect = var[[0, 1, 1, 2]]
        print(f"X3 (dynamic scratch leading index): ran, "
              f"{'OK' if np.array_equal(out, expect) else 'WRONG VALUES'}")
    except Exception as e:  # noqa: BLE001
        print(f"X3 (dynamic scratch leading index): REJECTED: "
              f"{type(e).__name__}: {str(e)[:300]}")
