"""Edge cases and error paths."""

import numpy as np
import pytest

from libiqo_tpu import AreaResizer, LanczosResizer
from libiqo_tpu.core.plan import build_plan
from libiqo_tpu.golden import numpy_ref
from libiqo_tpu.yuv import YUV420Frame, read_yuv420, write_yuv420

RNG = np.random.default_rng(55)


def test_multi_batch_dims():
    r = AreaResizer(64, 48, 32, 24, backend="xla")
    src = RNG.integers(0, 256, (2, 3, 48, 64), np.uint8)
    out = r.resize(src)
    assert out.shape == (2, 3, 24, 32)
    np.testing.assert_array_equal(
        out[1, 2], numpy_ref.resize_u8(r.plan, src[1, 2]))


def test_one_pixel_dst():
    plan = build_plan("area", 64, 64, 1, 1)
    src = np.full((64, 64), 200, np.uint8)
    out = numpy_ref.resize_u8(plan, src)
    assert out.shape == (1, 1) and out[0, 0] == 200


def test_one_pixel_src():
    for algo in ("area", "linear"):
        plan = build_plan(algo, 1, 1, 4, 4)
        src = np.full((1, 1), 77, np.uint8)
        out = numpy_ref.resize_u8(plan, src)
        assert (out == 77).all(), algo


def test_degree_extremes():
    src = RNG.integers(0, 256, (64, 96), np.uint8)
    for degree in (1, 9):
        r = LanczosResizer(degree, 96, 64, 48, 32, backend="xla")
        np.testing.assert_array_equal(
            r.resize(src), numpy_ref.resize_u8(r.plan, src))


def test_truncated_yuv_file(tmp_path):
    f = YUV420Frame(
        y=RNG.integers(0, 256, (16, 16), np.uint8),
        u=RNG.integers(0, 256, (8, 8), np.uint8),
        v=RNG.integers(0, 256, (8, 8), np.uint8))
    p = tmp_path / "t.yuv"
    write_yuv420(p, [f])
    # truncate mid-frame: only complete frames are returned
    data = p.read_bytes()
    p.write_bytes(data + data[: len(data) // 2])
    frames = read_yuv420(str(p), 16, 16)
    assert len(frames) == 1


def test_bad_plan_params():
    with pytest.raises(ValueError):
        build_plan("lanczos", 64, 64, 32, 32, degree=0)
    with pytest.raises(ValueError):
        build_plan("lanczos", 64, 64, 32, 32, degree=3, px_scale=0)
    with pytest.raises(ValueError):
        build_plan("area", 64, -1, 32, 32)


def test_plan_cache_key_distinct():
    a = build_plan("lanczos", 64, 64, 32, 32, degree=2)
    b = build_plan("lanczos", 64, 64, 32, 32, degree=3)
    c = build_plan("lanczos", 64, 64, 32, 32, degree=3, px_scale=2)
    assert len({a.cache_key(), b.cache_key(), c.cache_key()}) == 3


def test_linear_dst1_matches_reference():
    """dst==1 linear: the reference's border loops overlap (mainBegin=1 >
    mainEnd=0) and the SECOND loop wins, replicating the LAST source pixel
    (ref: IQOLinearResizerImpl_Generic.cpp:274-281,343-345) — well-defined
    behavior, not UB."""
    from libiqo_tpu.golden import cref

    if not cref.available():
        pytest.skip("reference build unavailable")
    for (sw, sh, dw, dh) in [(8, 8, 1, 1), (8, 8, 2, 1), (8, 8, 1, 2),
                             (16, 12, 1, 1), (7, 9, 1, 3), (640, 480, 1, 1),
                             (2, 2, 1, 1), (1, 1, 1, 1), (3, 1, 1, 1),
                             (9, 7, 2, 2)]:
        src = RNG.integers(0, 256, (sh, sw), np.uint8)
        plan = build_plan("linear", sw, sh, dw, dh)
        if plan.y.reference_oob or plan.x.reference_oob:
            continue
        np.testing.assert_array_equal(
            numpy_ref.resize_u8(plan, src), cref.linear(src, dw, dh),
            err_msg=f"linear {sw}x{sh}->{dw}x{dh}")


def test_yuv_odd_dimensions_match_reference():
    """Odd-dimension YUV frames: the reference sample resizes luma at its
    TRUE dims (strides only evened) and chroma at stride-derived dims, with
    output padding zero-initialized (ref: sample/resize_yuv420p.cpp:66-69,
    88,125-159)."""
    from libiqo_tpu.golden import cref
    from libiqo_tpu.yuv import YUV420Resizer

    if not cref.available():
        pytest.skip("reference build unavailable")
    iw, ih, ow, oh = 99, 77, 51, 41
    stw, sth = iw + 1, ih + 1
    dtw, dth = ow + 1, oh + 1
    y = RNG.integers(0, 256, (sth, stw), np.uint8)
    u = RNG.integers(0, 256, (sth // 2, stw // 2), np.uint8)
    v = RNG.integers(0, 256, (sth // 2, stw // 2), np.uint8)
    r = YUV420Resizer("lanczos3", iw, ih, ow, oh, backend="numpy")
    f = r.resize(YUV420Frame(y, u, v))
    ry = cref.lanczos(3, np.ascontiguousarray(y[:ih, :iw]), ow, oh)
    ru = cref.lanczos(3, u, dtw // 2, dth // 2, px_scale=2)
    rv = cref.lanczos(3, v, dtw // 2, dth // 2, px_scale=2)
    np.testing.assert_array_equal(f.y[:oh, :ow], ry)
    assert (f.y[oh:, :] == 0).all() and (f.y[:, ow:] == 0).all()
    np.testing.assert_array_equal(f.u, ru)
    np.testing.assert_array_equal(f.v, rv)
