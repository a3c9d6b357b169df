"""Byte-exactness of the row-halo carry mode (LIBIQO_TPU_CARRY).

The carry kernel materializes the Y band windows in a manually-DMA'd
double buffer (fresh rows from HBM, halo rows VMEM-copied from the other
buffer — see pallas_resize._Carry) instead of Mosaic's pipelined
overlapping windows.  Same windows, same coefficient blocks, same output
contract: byte parity with the reference Generic impls (the oracle).
Covers the batched frame-stacked grid (per-batch-group reseed) and the
engagement gates.
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
    ("lanczos", 512, 520, 256, 130, dict(degree=4)),   # clamped tail tiles
    ("area", 640, 720, 160, 240, {}),
    ("linear", 160, 480, 321, 960, {}),
]


def _build_with_carry(plan, interpret=True):
    import os

    old = os.environ.get("LIBIQO_TPU_CARRY")
    os.environ["LIBIQO_TPU_CARRY"] = "1"
    try:
        return pr.make_resize_fn(plan, interpret=interpret)
    finally:
        if old is None:
            os.environ.pop("LIBIQO_TPU_CARRY", None)
        else:
            os.environ["LIBIQO_TPU_CARRY"] = old


@pytest.mark.parametrize("geom", GEOMS, ids=lambda g: f"{g[0]}{g[1]}x{g[2]}")
def test_carry_byte_exact(geom):
    alg, sw, sh, dw, dh, kw = geom
    plan = build_plan(alg, sw, sh, dw, dh, **kw)
    fn, ops = _build_with_carry(plan)
    rng = np.random.default_rng(hash((alg, sw)) % 2**31)
    src = rng.integers(0, 256, (sh, sw), np.uint8)
    got = np.asarray(fn(*ops, src))
    want = numpy_ref.resize_u8(plan, src)
    assert (got == want).all(), (
        f"carry={fn.carry} max err "
        f"{np.abs(got.astype(int) - want.astype(int)).max()}")


def test_carry_batched_stacked():
    """bf-stacked grid: the band buffers gain a frame dimension and the
    t==0 seed must rerun per batch group (stale buffers of a previous
    group must never leak)."""
    plan = build_plan("lanczos", 960, 540, 480, 270, degree=3)
    fn, ops = _build_with_carry(plan)
    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, (8, 540, 960), np.uint8)
    got = np.asarray(fn(*ops, src))
    for i in range(8):
        want = numpy_ref.resize_u8(plan, src[i])
        assert (got[i] == want).all(), f"frame {i}"


def test_carry_engages_on_hot_configs():
    """The tuned luma/chroma/upsample kernels must actually take the carry
    path (the whole point), and its fetch must beat the windowed band."""
    for alg, sw, sh, dw, dh, kw in [
        ("lanczos", 3840, 2160, 1920, 1080, dict(degree=3)),
        ("lanczos", 1920, 1080, 960, 540, dict(degree=3, px_scale=2)),
        ("lanczos", 1280, 720, 1920, 1080, dict(degree=2)),
    ]:
        plan = build_plan(alg, sw, sh, dw, dh, **kw)
        fn, _ops = _build_with_carry(plan)
        assert fn.carry is not None, f"carry did not engage on {alg} {sw}x{sh}"
        assert fn.carry.fetch < fn.py.band
        assert fn.carry.halo % 32 == 0 and fn.carry.halo >= 32
        assert fn.carry.fetch == fn.py.band - fn.carry.halo
        assert fn.carry.fetch >= fn.py.step


def test_carry_layout_refuses_no_saving():
    """Geometries without a 32-row halo to save (big steps) must return
    None and stay on the windowed mode."""
    plan = build_plan("area", 1920, 1080, 480, 270)
    py = pr._tile_axis_padless(plan.y, 96, 32)
    assert pr._carry_layout(py, 1920) is None


def test_carry_layout_refuses_odd_lane_width():
    """Non-128-multiple band lane dims must refuse carry: the current
    Mosaic rejects sublane slices of VMEM memrefs whose lane dim is not
    128-aligned (seen on chip: area 618x699->97x503)."""
    plan = build_plan("lanczos", 1280, 720, 640, 360, degree=3)
    py = pr._tile_axis_padless(plan.y, 32, 32)
    assert pr._carry_layout(py, 1280) is not None
    assert pr._carry_layout(py, 618) is None


def test_carry_off_by_default():
    plan = build_plan("lanczos", 960, 540, 480, 270, degree=3)
    fn, _ops = pr.make_resize_fn(plan, interpret=True)
    assert fn.carry is None
