"""On-chip error-bound artifact for the opt-in relaxed-precision kernel
(precision="relaxed"): compiles each graded config's relaxed kernel on the
real TPU and records max/mean LSB error vs the golden oracle, plus the
flat-field invariant.  Perf numbers come from
``scripts/bench_configs.py --relaxed`` (calibrated two-point slope) — a
naive short slope through the axon tunnel produces impossible numbers.

Writes scripts/check_relaxed_result.json; exits nonzero if any case
exceeds MAX_LSB or a flat field drifts.
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libiqo_tpu.core.plan import build_plan
from libiqo_tpu.golden import numpy_ref
from libiqo_tpu.ops import pallas_resize

RNG = np.random.default_rng(31)
MAX_LSB = 3  # measured ceiling (chroma px2's pathological 4-tap phases)

CASES = [
    ("lanczos", dict(degree=3), 3840, 2160, 1920, 1080),   # headline luma
    ("lanczos", dict(degree=3, px_scale=2), 1920, 1080, 960, 540),  # chroma
    ("lanczos", dict(degree=2), 1280, 720, 1920, 1080),    # upsample
    ("area", {}, 1920, 1080, 480, 270),
    ("linear", {}, 640, 480, 320, 240),
]


def main() -> int:
    assert jax.devices()[0].platform == "tpu", jax.devices()
    rows, bad = [], 0
    for algo, kw, sw, sh, dw, dh in CASES:
        plan = build_plan(algo, sw, sh, dw, dh, **kw)
        src = RNG.integers(0, 256, (sh, sw), np.uint8)
        want = numpy_ref.resize_u8(plan, src)
        fn, ops = pallas_resize.make_resize_fn(plan, relaxed=True)
        jfn = jax.jit(fn)
        got = np.asarray(jfn(*ops, jnp.asarray(src)))
        err = np.abs(got.astype(int) - want.astype(int))
        # flat-field invariant is "matches the oracle on a flat field" —
        # the reference Generic itself is non-uniform on flat px2 chroma
        # (125 at the X border for flat 128), and that IS the contract
        flat_src = np.full((sh, sw), 128, np.uint8)
        flat = np.asarray(jfn(*ops, jnp.asarray(flat_src)))
        row = {
            "case": f"{algo}{kw.get('degree', '')} {sw}x{sh}->{dw}x{dh}"
                    + (" px2" if kw.get("px_scale") == 2 else ""),
            "max_lsb": int(err.max()),
            "mean_lsb": round(float(err.mean()), 4),
            "flat128_ok": bool(
                (flat == numpy_ref.resize_u8(plan, flat_src)).all()),
        }
        if row["max_lsb"] > MAX_LSB or not row["flat128_ok"]:
            bad += 1
            row["FAIL"] = True
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("scripts/check_relaxed_result.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(f"{len(rows)} cases, {bad} failures -> "
          "scripts/check_relaxed_result.json")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
