"""Unit tests for pallas kernel internals: window layout invariants,
coefficient-block construction (padless + legacy extrapolation), variant
dedup, and the compiled-executable LRU cache."""

import numpy as np
import pytest

from libiqo_tpu.core.plan import build_plan
from libiqo_tpu.ops import pallas_resize as pr

RNG = np.random.default_rng(9)

GEOMS = [
    ("lanczos", 3840, 2160, 1920, 1080, dict(degree=3)),
    ("lanczos", 1920, 1080, 960, 540, dict(degree=3, px_scale=2)),
    ("area", 1920, 1080, 480, 270, {}),
    ("lanczos", 1280, 720, 1920, 1080, dict(degree=2)),
    ("linear", 254, 358, 556, 76, {}),
    ("lanczos", 333, 257, 175, 131, dict(degree=2)),
    ("lanczos", 1079, 333, 555, 111, dict(degree=3)),  # height % 8 != 0
    ("linear", 300, 200, 899, 601, {}),
]


@pytest.mark.parametrize("case", GEOMS)
def test_padless_windows_in_bounds_and_covering(case):
    """Every padless window must (a) stay fully inside the source array —
    Mosaic crashes on OOB lane windows and on large OOB sublane windows —
    (b) keep offsets align-multiples, (c) have a legal length (divisor
    multiple or the full dim), and (d) cover every in-range tap of its
    tile (asserted independently by _build_blocks_padless)."""
    alg, sw, sh, dw, dh, kw = case
    plan = build_plan(alg, sw, sh, dw, dh, **kw)
    for ax, tile, align, ldiv in ((plan.y, 128, 32, 8), (plan.x, 256, 128, 128)):
        p = pr._tile_axis_padless(ax, tile, align)
        assert (p.off >= 0).all()
        assert (p.off + p.band <= ax.n_src).all(), (alg, ax.n_src, p)
        assert (p.off % align == 0).all()
        assert p.band % ldiv == 0 or p.band == ax.n_src
        # kernel index_map must reproduce the host offsets exactly
        ideal = p.base + p.step * np.arange(p.n_tiles)
        if p.clamp_hi >= 0:
            ideal = np.minimum(p.clamp_hi, ideal)
        np.testing.assert_array_equal(np.maximum(0, ideal), p.off)
        # (d): raises internally if a tap falls outside its window
        pr._build_blocks_padless(ax, p, transpose=ax is plan.x)


def test_padless_variant_dedup():
    plan = build_plan("lanczos", 3840, 2160, 1920, 1080, degree=3)
    p = pr._tile_axis_padless(plan.x, 384, 128)
    blocks = pr._build_blocks_padless(plan.x, p, transpose=True)
    v = pr._dedup_blocks(blocks)
    # exact 2:1 affine geometry: few variants, and the mapping must invert
    assert len(v.uniq) <= 4
    var_of = np.full(p.n_tiles, v.interior)
    for t, vv in v.exceptions:
        var_of[t] = vv
    for t in range(p.n_tiles):
        np.testing.assert_array_equal(v.uniq[var_of[t]], blocks[t])


def test_legacy_unclipped_extrapolation_consistency():
    """Legacy padded mode: _build_blocks' phase-affine extrapolation past
    n_dst and the _unclipped_coef sibling search must reproduce, for every
    REAL output row, exactly the plan's taps at window positions
    (zero-padding supplies the clipped zeros)."""
    plan = build_plan("lanczos", 640, 480, 512, 384, degree=3)
    y = plan.y
    t_ax, base = pr._tile_axis(y, 96, 32)
    blocks = pr._build_blocks(y, t_ax, base, transpose=False)
    for t in range(t_ax.n_tiles):
        off = base + t_ax.step * t
        for k in range(t_ax.tile):
            d = t * t_ax.tile + k
            if d >= y.n_dst:
                continue  # padded rows: masked on store, anything goes
            row = np.zeros(t_ax.band, np.int64)
            for i in range(y.num_coefs):
                j = int(y.start[d]) + t_ax.pad_lo - off + i
                if 0 <= j < t_ax.band:
                    src = int(y.start[d]) + i
                    if 0 <= src < y.n_src:
                        row[j] += int(y.coef[d, i])
                    else:
                        row[j] += pr._unclipped_coef(y, d, i)
            np.testing.assert_array_equal(blocks[t, k], row, err_msg=f"t{t} k{k}")


def test_unclipped_coef_fallback_when_no_interior_sibling():
    """When no fully-interior sibling phase exists, _unclipped_coef falls
    back to the clipped tap — safe only because such rows' padded reads are
    never stored; assert the fallback path is exercised and returns the
    stored (clipped) value."""
    # tiny geometry: every output window touches a border
    plan = build_plan("lanczos", 8, 8, 4, 4, degree=3)
    y = plan.y
    d = 0
    assert int(y.start[d]) < 0  # row 0's window starts OOB
    assert pr._unclipped_coef(y, d, 0) == int(y.coef[d, 0])


def test_compiled_cache_lru_bound():
    from libiqo_tpu import api

    api.clear_compiled_cache()
    old_max = api._COMPILED_CACHE_MAX
    api._COMPILED_CACHE_MAX = 3
    try:
        src = RNG.integers(0, 256, (32, 32), np.uint8)
        for i in range(5):
            r = api.AreaResizer(32, 32, 8 + i, 8, backend="xla")
            r.resize(src)
        assert len(api._COMPILED_CACHE) == 3
        # most recent geometries survive
        keys = [k[0][6] for k in api._COMPILED_CACHE]  # dst_w of geometry
        assert keys == [10, 11, 12]
    finally:
        api._COMPILED_CACHE_MAX = old_max
        api.clear_compiled_cache()
