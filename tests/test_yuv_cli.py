"""YUV420 pipeline + CLI parity tests (CPU, numpy/xla backends)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from libiqo_tpu.core.plan import build_plan
from libiqo_tpu.golden import numpy_ref
from libiqo_tpu.yuv import YUV420Frame, YUV420Resizer, read_yuv420, write_yuv420

RNG = np.random.default_rng(21)


def _frame(w, h):
    return YUV420Frame(
        y=RNG.integers(0, 256, (h, w), np.uint8),
        u=RNG.integers(0, 256, (h // 2, w // 2), np.uint8),
        v=RNG.integers(0, 256, (h // 2, w // 2), np.uint8),
    )


@pytest.mark.parametrize("method,algo,kw,ckw", [
    ("lanczos3", "lanczos", dict(degree=3), dict(degree=3, px_scale=2)),
    ("lanczos2", "lanczos", dict(degree=2), dict(degree=2, px_scale=2)),
    ("area", "area", {}, {}),
    ("linear", "linear", {}, {}),
])
def test_yuv_resizer_matches_oracle(method, algo, kw, ckw):
    sw, sh, dw, dh = 128, 96, 64, 48
    f = _frame(sw, sh)
    r = YUV420Resizer(method, sw, sh, dw, dh, backend="xla")
    out = r.resize(f)
    pl = build_plan(algo, sw, sh, dw, dh, **kw)
    pc = build_plan(algo, sw // 2, sh // 2, dw // 2, dh // 2, **ckw)
    np.testing.assert_array_equal(out.y, numpy_ref.resize_u8(pl, f.y))
    np.testing.assert_array_equal(out.u, numpy_ref.resize_u8(pc, f.u))
    np.testing.assert_array_equal(out.v, numpy_ref.resize_u8(pc, f.v))


def test_yuv_file_roundtrip(tmp_path):
    f = _frame(64, 48)
    p = tmp_path / "a.yuv"
    write_yuv420(p, [f, f])
    frames = read_yuv420(str(p), 64, 48)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0].y, f.y)
    np.testing.assert_array_equal(frames[1].v, f.v)


def test_cli_resize_yuv420p(tmp_path):
    f = _frame(64, 48)
    src = tmp_path / "in.yuv"
    dst = tmp_path / "out.yuv"
    write_yuv420(src, [f])
    rc = subprocess.run(
        [sys.executable, "-m", "libiqo_tpu.cli.resize_yuv420p",
         "-m", "lanczos3", "-i", str(src), "-iw", "64", "-ih", "48",
         "-o", str(dst), "-ow", "32", "-oh", "24", "--backend", "numpy"],
        capture_output=True, text=True,
        cwd=Path(__file__).resolve().parents[1])
    assert rc.returncode == 0, rc.stderr
    out = read_yuv420(str(dst), 32, 24)[0]
    pl = build_plan("lanczos", 64, 48, 32, 24, degree=3)
    np.testing.assert_array_equal(out.y, numpy_ref.resize_u8(pl, f.y))


def test_cli_bad_method(tmp_path):
    src = tmp_path / "in.yuv"
    write_yuv420(src, [_frame(16, 16)])
    rc = subprocess.run(
        [sys.executable, "-m", "libiqo_tpu.cli.resize_yuv420p",
         "-m", "cubic", "-i", str(src), "-iw", "16", "-ih", "16",
         "-o", str(tmp_path / "o.yuv"), "-ow", "8", "-oh", "8"],
        capture_output=True, text=True,
        cwd=Path(__file__).resolve().parents[1])
    assert rc.returncode == 2
    assert "unknown method" in rc.stderr

def test_cli_bad_input_preserves_output(tmp_path):
    """A missing/short input must not create or truncate the output file
    (the input is validated before the output path is opened)."""
    dst = tmp_path / "out.yuv"
    dst.write_bytes(b"PRECIOUS")
    rc = subprocess.run(
        [sys.executable, "-m", "libiqo_tpu.cli.resize_yuv420p",
         "-m", "area", "-i", str(tmp_path / "missing.yuv"),
         "-iw", "64", "-ih", "48",
         "-o", str(dst), "-ow", "32", "-oh", "24", "--backend", "numpy"],
        capture_output=True, text=True,
        cwd=Path(__file__).resolve().parents[1])
    assert rc.returncode == 1
    assert "could not read" in rc.stderr
    assert dst.read_bytes() == b"PRECIOUS"
    # short input (half a frame): same guarantee
    (tmp_path / "short.yuv").write_bytes(b"\x00" * 100)
    rc = subprocess.run(
        [sys.executable, "-m", "libiqo_tpu.cli.resize_yuv420p",
         "-m", "area", "-i", str(tmp_path / "short.yuv"),
         "-iw", "64", "-ih", "48",
         "-o", str(dst), "-ow", "32", "-oh", "24", "--backend", "numpy"],
        capture_output=True, text=True,
        cwd=Path(__file__).resolve().parents[1])
    assert rc.returncode == 1
    assert "no complete frames" in rc.stderr
    assert dst.read_bytes() == b"PRECIOUS"
