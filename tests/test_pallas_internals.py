"""Unit tests for pallas kernel internals: window layout invariants,
coefficient-block construction, variant
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
        n_eff = ax.n_src + p.pad       # wrapper zero-pads the source
        assert 0 <= p.pad < ldiv
        assert (p.off >= 0).all()
        assert (p.off + p.band <= n_eff).all(), (alg, ax.n_src, p)
        assert (p.off % align == 0).all()
        assert p.band % ldiv == 0 or p.band == n_eff
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


@pytest.mark.parametrize("case", GEOMS)
def test_dot_group_windows_cover_and_partition(case):
    """Block-banded group invariants: groups partition the output dim,
    k-windows are align-multiples inside [0, K), and every nonzero tap of
    a group's outputs lies inside its window (the exactness condition:
    contracting only over the window must equal the full dot)."""
    alg, sw, sh, dw, dh, kw = case
    plan = build_plan(alg, sw, sh, dw, dh, **kw)
    for ax, tile, align, k_align, transpose in (
            (plan.y, 128, 32, 8, False), (plan.x, 256, 128, 64, True)):
        p = pr._tile_axis_padless(ax, tile, align)
        blocks = pr._build_blocks_padless(ax, p, transpose=transpose)
        nz = (blocks != 0).any(axis=0)
        if not transpose:
            nz = nz.T                          # -> (K, out)
        for grp in (64, 128):
            groups = pr._dot_groups(nz, grp, k_align)
            # partition of [0, out)
            assert [g[0] for g in groups] == list(range(0, nz.shape[1], grp))
            assert sum(g[1] for g in groups) == nz.shape[1]
            for (o0, ol, k0, kl) in groups:
                assert k0 % k_align == 0 and k0 >= 0
                assert k0 + kl <= nz.shape[0]
                rows = np.nonzero(nz[:, o0:o0 + ol].any(axis=1))[0]
                if rows.size:
                    assert k0 <= rows.min() and rows.max() < k0 + kl


def test_grouped_dot_equals_monolithic():
    """Computing each output group against only its k-window reproduces
    the full banded matmul exactly (random banded matrix, int values)."""
    rng = np.random.default_rng(3)
    K, out, taps = 384, 256, 9
    C = np.zeros((K, out), np.int64)
    starts = np.minimum(rng.integers(0, K - taps, out),
                        np.maximum(0, np.arange(out) * K // out - 4))
    for d in range(out):
        C[starts[d]:starts[d] + taps, d] = rng.integers(-100, 100, taps)
    w = rng.integers(-1000, 1000, (17, K))
    full = w @ C
    groups = pr._dot_groups(C != 0, 64, 16)
    got = np.concatenate(
        [w[:, k0:k0 + kl] @ C[k0:k0 + kl, o0:o0 + ol]
         for (o0, ol, k0, kl) in groups], axis=1)
    np.testing.assert_array_equal(got, full)


def test_tuner_default_rates_build_valid_kernels(monkeypatch):
    """Unknown device kinds fall back to conservative tuner rates; the
    cost model only ranks tile candidates, so kernels stay exact."""
    from libiqo_tpu.golden import numpy_ref

    monkeypatch.setattr(pr, "_tuner_rates", lambda: pr._TUNER_DEFAULT)
    plan = build_plan("lanczos", 480, 360, 240, 180, degree=3)
    fn, ops = pr.make_resize_fn(plan, interpret=True)
    src = RNG.integers(0, 256, (360, 480), np.uint8)
    import jax

    got = np.asarray(jax.jit(fn)(*ops, src))
    np.testing.assert_array_equal(got, numpy_ref.resize_u8(plan, src))


def test_pick_groups_declines_when_band_is_tight():
    """When the monolithic contraction is already one MXU K-chunk, no
    grouping can win and _pick_groups returns None."""
    nz = np.ones((128, 512), bool)
    assert pr._pick_groups(nz[None] * 1, out_is_m=False, other_dim=32,
                           grp_choices=(128, 256), k_align=64) is None


def test_kalign32_stops_upsample_window_straddles():
    """The measured −13% on the upsample config (xpack_kalign_2x2.log)
    comes from k_align=32 letting every 4-tap group window fit one 128-K
    MXU chunk: at 64-alignment the same windows straddle two.  Pin the
    structural fact so a k_align regression is caught on CPU."""
    plan = build_plan("lanczos", 1280, 720, 1920, 1080, degree=2)
    px = pr._tile_axis_padless(plan.x, 1920, 128)
    blocks = pr._build_blocks_padless(plan.x, px, transpose=True)
    nz = (blocks != 0).any(axis=0)
    chunks = {ka: sum(-(-kl // 128) for (_o0, _ol, _k0, kl)
                      in pr._dot_groups(nz, 128, ka)) for ka in (32, 64)}
    assert chunks[32] == 15          # one chunk per group
    assert chunks[64] > chunks[32]   # 64-alignment pays straddles (23)
