"""One feasibility model for the Pallas fast path (VERDICT r4 weak #3).

``supports_plan`` used to pre-gate with a legacy pre-padless estimator
(`_plan_ok`/`_tile_axis`/`_auto_tiles`) while the actual builder used its
own operand-shape VMEM check — a plan the crude estimate rejected but the
padless build would serve was silently routed to the ~12x slower XLA path.
The estimator is gone; supports_plan now attempts the (cached) build, and
this fuzz pins the invariant: the predicate can never disagree with
``_make_padless_fn``, and ``make_resize_fn`` is loud (ValueError) exactly
when the predicate says no — the NULL-factory dispatch contract
(ref: src/IQOLanczosResizer.cpp:15-37).
"""

import numpy as np
import pytest

from libiqo_tpu.core.plan import build_plan
from libiqo_tpu.ops import pallas_resize


def _fuzz_cases(n, seed=20260819):
    rng = np.random.default_rng(seed)
    cases = []
    while len(cases) < n:
        alg = rng.choice(["lanczos", "area", "linear"])
        sw, sh = int(rng.integers(16, 700)), int(rng.integers(16, 500))
        if alg == "area":
            dw = int(rng.integers(4, max(5, sw)))
            dh = int(rng.integers(4, max(5, sh)))
        elif alg == "linear":
            dw = int(rng.integers(max(4, sw // 3 + 1), sw * 3))
            dh = int(rng.integers(max(4, sh // 3 + 1), sh * 3))
        else:
            dw, dh = int(rng.integers(4, sw * 2)), int(rng.integers(4, sh * 2))
        kw = {}
        if alg == "lanczos":
            kw = dict(degree=int(rng.integers(1, 10)))
            if rng.integers(0, 3) == 0:
                kw["px_scale"] = 2
        cases.append((alg, sw, sh, dw, dh, kw))
    return cases


CASES = _fuzz_cases(24) + [
    # the one geometry class designed to fall outside the kernel envelope:
    # a >4K-tap X band that blows the VMEM tile budget (BASELINE.md
    # fallback table) — must be REJECTED by predicate and builder alike
    ("area", 65536, 16, 16, 16, {}),
    # graded configs: must be accepted (they are the product)
    ("lanczos", 3840, 2160, 1920, 1080, dict(degree=3)),
    ("lanczos", 1920, 1080, 960, 540, dict(degree=3, px_scale=2)),
    ("area", 1920, 1080, 480, 270, {}),
    ("linear", 640, 480, 320, 240, {}),
]


@pytest.mark.parametrize(
    "case", CASES,
    ids=[f"{a}{k.get('degree', '')}-{sw}x{sh}-{dw}x{dh}"
         + ("-px2" if k.get("px_scale") else "")
         for a, sw, sh, dw, dh, k in CASES])
def test_supports_plan_equals_buildable(case):
    alg, sw, sh, dw, dh, kw = case
    plan = build_plan(alg, sw, sh, dw, dh, **kw)
    sup = pallas_resize.supports_plan(plan)
    # direct build, bypassing the cache: the real consistency check
    built = pallas_resize._make_padless_fn(plan, interpret=True)
    assert sup == (built is not None), (
        f"supports_plan={sup} but direct build "
        f"{'succeeded' if built is not None else 'returned None'}")
    if sup:
        fn, ops = pallas_resize.make_resize_fn(plan, interpret=True)
        assert callable(fn) and len(ops) > 0
    else:
        # rejected plans must fail LOUDLY so api.py's ladder falls back
        with pytest.raises(ValueError):
            pallas_resize.make_resize_fn(plan, interpret=True)


def test_known_envelope_buster_rejected():
    plan = build_plan("area", 65536, 16, 16, 16)
    assert not pallas_resize.supports_plan(plan)


def test_graded_configs_accepted():
    for alg, sw, sh, dw, dh, kw in [
            ("lanczos", 3840, 2160, 1920, 1080, dict(degree=3)),
            ("lanczos", 1280, 720, 1920, 1080, dict(degree=2)),
            ("area", 1920, 1080, 480, 270, {}),
            ("linear", 640, 480, 320, 240, {})]:
        assert pallas_resize.supports_plan(build_plan(alg, sw, sh, dw, dh,
                                                      **kw))


def test_build_cache_serves_repeat_calls():
    """supports_plan's build is reused by make_resize_fn (same object)."""
    plan = build_plan("linear", 320, 240, 160, 120)
    assert pallas_resize.supports_plan(plan)
    a = pallas_resize.make_resize_fn(plan)
    b = pallas_resize.make_resize_fn(plan)
    assert a[0] is b[0]
