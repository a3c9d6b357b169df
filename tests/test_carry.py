"""Byte-exactness of the row-halo carry mode (LIBIQO_TPU_CARRY).

The carry kernel replaces the overlapped Y band windows with a manual-DMA
3-slot VMEM ring (see pallas_resize._Carry) — different fetch schedule,
different Y coefficient block layout, same output contract: byte parity
with the reference Generic impls (the oracle).  Both the 32-aligned mode
(=1) and the tight-fetch mode (=2) are covered, plus the batched
frame-stacked grid and the engagement gates.
"""

import numpy as np
import pytest

from libiqo_tpu.core.plan import build_plan
from libiqo_tpu.golden import numpy_ref
from libiqo_tpu.ops import pallas_resize as pr

# quarter/half-scale versions of the graded configs (compile time) plus
# carry-specific corners: clamped tail tiles, px2 chroma, upsample
GEOMS = [
    ("lanczos", 960, 540, 480, 270, dict(degree=3)),
    ("lanczos", 640, 360, 960, 540, dict(degree=2)),
    ("lanczos", 482, 270, 240, 134, dict(degree=3, px_scale=2)),
    ("lanczos", 512, 520, 256, 130, dict(degree=4)),   # taps past last fetch
    ("area", 640, 720, 160, 240, {}),
    ("linear", 160, 480, 321, 960, {}),
]


def _build_with_carry(plan, mode, interpret=True):
    import os

    old = os.environ.get("LIBIQO_TPU_CARRY")
    os.environ["LIBIQO_TPU_CARRY"] = mode
    try:
        return pr.make_resize_fn(plan, interpret=interpret)
    finally:
        if old is None:
            os.environ.pop("LIBIQO_TPU_CARRY", None)
        else:
            os.environ["LIBIQO_TPU_CARRY"] = old


@pytest.mark.parametrize("mode", ["1", "2"])
@pytest.mark.parametrize("geom", GEOMS, ids=lambda g: f"{g[0]}{g[1]}x{g[2]}")
def test_carry_byte_exact(geom, mode):
    alg, sw, sh, dw, dh, kw = geom
    plan = build_plan(alg, sw, sh, dw, dh, **kw)
    fn, ops = _build_with_carry(plan, mode)
    rng = np.random.default_rng(hash((alg, sw, mode)) % 2**31)
    src = rng.integers(0, 256, (sh, sw), np.uint8)
    got = np.asarray(fn(*ops, src))
    want = numpy_ref.resize_u8(plan, src)
    assert (got == want).all(), (
        f"max err {np.abs(got.astype(int) - want.astype(int)).max()}")


@pytest.mark.parametrize("mode", ["1", "2"])
def test_carry_batched_stacked(mode):
    """bf-stacked grid: the ring gets a frame dimension and the t==0 seed
    must rerun per batch group (stale slots of a previous group must never
    leak)."""
    plan = build_plan("lanczos", 960, 540, 480, 270, degree=3)
    fn, ops = _build_with_carry(plan, mode)
    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, (8, 540, 960), np.uint8)
    got = np.asarray(fn(*ops, src))
    for i in range(8):
        want = numpy_ref.resize_u8(plan, src[i])
        assert (got[i] == want).all(), f"frame {i}"


def test_carry_engages_on_hot_configs(monkeypatch):
    """The tuned luma/chroma/upsample kernels must actually take the carry
    path (the whole point), and its fetch must beat the windowed band."""
    monkeypatch.setenv("LIBIQO_TPU_CARRY", "1")
    calls = []
    orig = pr._build_blocks_carry
    monkeypatch.setattr(pr, "_build_blocks_carry",
                        lambda *a, **k: (calls.append(a), orig(*a, **k))[1])
    for alg, sw, sh, dw, dh, kw in [
        ("lanczos", 3840, 2160, 1920, 1080, dict(degree=3)),
        ("lanczos", 1920, 1080, 960, 540, dict(degree=3, px_scale=2)),
        ("lanczos", 1280, 720, 1920, 1080, dict(degree=2)),
    ]:
        plan = build_plan(alg, sw, sh, dw, dh, **kw)
        n = len(calls)
        fn, _ops = pr.make_resize_fn(plan, interpret=True)
        assert len(calls) > n, f"carry did not engage on {alg} {sw}x{sh}"
        c = calls[-1][2]
        assert c.fetch < fn.py.band, (c.fetch, fn.py.band)


def test_carry_layout_refuses_no_saving():
    """Geometries whose fetch would not beat the band (big steps, small
    halo) must return None and stay on the windowed mode."""
    plan = build_plan("area", 1920, 1080, 480, 270)
    py = pr._tile_axis_padless(plan.y, 96, 32)
    assert pr._carry_layout(plan.y, py, max_band=py.band) is None


def test_carry_tight_fetch_is_smaller():
    plan = build_plan("lanczos", 3840, 2160, 1920, 1080, degree=3)
    py = pr._tile_axis_padless(plan.y, 32, 32)
    c1 = pr._carry_layout(plan.y, py, max_band=py.band, tight=False)
    c2 = pr._carry_layout(plan.y, py, max_band=py.band, tight=True)
    assert c1 is not None and c2 is not None
    assert c2.fetch <= c1.fetch
    # slot bases must land on u8 sublane tile rows in both modes
    assert c2.stride % 32 == 0 and c1.stride % 32 == 0
    # aligned mode keeps every source offset 32-aligned incl. the clamp
    assert all(v % 32 == 0 for v in c1.f)
