"""On-chip check + perf probe for the opt-in relaxed-precision kernel
(precision="relaxed"): compiled error vs the golden oracle on the graded
configs, and the two-point-slope ms/frame vs the exact kernel.

Run on the real TPU (no JAX_PLATFORMS override).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libiqo_tpu.core.plan import build_plan
from libiqo_tpu.golden import numpy_ref
from libiqo_tpu.ops import pallas_resize

RNG = np.random.default_rng(31)

CASES = [
    ("lanczos", dict(degree=3), 3840, 2160, 1920, 1080),   # headline luma
    ("lanczos", dict(degree=3, px_scale=2), 1920, 1080, 960, 540),  # chroma
    ("lanczos", dict(degree=2), 1280, 720, 1920, 1080),    # upsample
    ("area", {}, 1920, 1080, 480, 270),
    ("linear", {}, 640, 480, 320, 240),
]


def slope_ms(fn, ops, src, n0=16, n1=64):
    """Two-point-slope ms/application (cancels the tunnel sync RTT)."""

    def loop(n, s):
        def body(i, carry):
            s, acc = carry
            s = jax.lax.dynamic_update_slice(
                s, (i & 0xFF).astype(jnp.uint8)[None, None], (0, 0))
            out = fn(*ops, s)
            return s, acc ^ out[0, 0]
        return jax.lax.fori_loop(0, n, body, (s, jnp.uint8(0)))[1]

    l0 = jax.jit(lambda s: loop(n0, s))
    l1 = jax.jit(lambda s: loop(n1, s))
    sd = jnp.asarray(src)
    for l in (l0, l1):
        l(sd).block_until_ready()
    t0 = time.perf_counter(); l0(sd).block_until_ready()
    t1 = time.perf_counter(); l1(sd).block_until_ready()
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n1 - n0) * 1e3


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rows = []
    for algo, kw, sw, sh, dw, dh in CASES:
        plan = build_plan(algo, sw, sh, dw, dh, **kw)
        src = RNG.integers(0, 256, (sh, sw), np.uint8)
        want = numpy_ref.resize_u8(plan, src)
        row = {"case": f"{algo}{kw.get('degree','')} {sw}x{sh}->{dw}x{dh}"
                       + (" px2" if kw.get("px_scale") == 2 else "")}
        for name, relaxed in (("exact", False), ("relaxed", True)):
            if not pallas_resize.supports_plan(plan, relaxed=relaxed):
                row[name] = "unsupported"
                continue
            try:
                fn, ops = pallas_resize.make_resize_fn(plan, relaxed=relaxed)
            except ValueError as e:
                row[name] = f"refused: {e}"
                continue
            got = np.asarray(jax.jit(fn)(*ops, jnp.asarray(src)))
            err = int(np.abs(got.astype(int) - want.astype(int)).max())
            ms = slope_ms(fn, ops, src)
            row[name] = {"max_lsb": err, "ms": round(ms, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("scripts/check_relaxed_result.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
