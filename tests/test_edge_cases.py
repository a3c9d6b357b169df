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
