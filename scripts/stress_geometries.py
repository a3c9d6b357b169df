"""On-chip stress: nasty geometries (odd/prime dims, 8K, tall/skinny)
compiled on the real chip and byte-compared against the golden oracle.

Usage: python scripts/stress_geometries.py  (run in background: ~8 compiles)
"""
import sys; sys.path.insert(0, ".")
import numpy as np, jax
from libiqo_tpu.api import _configure_compilation_cache
from libiqo_tpu.core.plan import build_plan
from libiqo_tpu.golden import numpy_ref
from libiqo_tpu.ops import pallas_resize
_configure_compilation_cache()
rng = np.random.default_rng(42)
CASES = [
    ("lanczos", 3839, 2161, 1919, 1081, dict(degree=3)),   # gcd=1 4K, odd dims
    ("lanczos", 7680, 4320, 3840, 2160, dict(degree=3)),   # 8K -> 4K
    ("area", 7680, 120, 640, 40, {}),                      # wide & flat
    ("lanczos", 120, 4320, 60, 2160, dict(degree=2)),      # tall & skinny
    ("linear", 8191, 33, 4093, 17, {}),                    # prime-ish wide
    ("lanczos", 257, 8191, 129, 4099, dict(degree=3)),     # prime tall
    ("area", 5120, 2880, 1280, 720, {}),                   # 5K 4:1
    ("lanczos", 640, 480, 1920, 1440, dict(degree=4)),     # 3x upsample deg4
]
fails = 0
for alg, sw, sh, dw, dh, kw in CASES:
    tag = f"{alg}{kw.get('degree','')} {sw}x{sh}->{dw}x{dh}"
    try:
        plan = build_plan(alg, sw, sh, dw, dh, **kw)
        if not pallas_resize.supports_plan(plan):
            print(f"SKIP {tag}: outside pallas envelope (xla fallback)"); continue
        fn, ops = pallas_resize.make_resize_fn(plan)
        dops = tuple(jax.device_put(o) for o in ops)
        src = rng.integers(0, 256, (sh, sw), np.uint8)
        got = np.asarray(jax.jit(fn)(*dops, src))
        want = numpy_ref.resize_u8(plan, src)
        ok = np.array_equal(got, want)
        print(f"{'OK  ' if ok else 'FAIL'} {tag}  tiles={fn.tiles}")
        fails += 0 if ok else 1
    except Exception as e:
        print(f"ERR  {tag}: {type(e).__name__}: {str(e)[:140]}")
        fails += 1
print("failures:", fails)
