"""End-to-end distribution validation (VERDICT r4 weak #6).

Builds the wheel, asserts the native table-builder source ships inside it,
installs it into a scratch venv (offline: --no-index, deps from the system
site-packages), and runs BOTH console entry points from the installed dist
— `iqo-tpu-resize-yuv420p` on a generated YUV420 file (output byte-compared
against the in-repo golden oracle) and `iqo-tpu-benchmark` for a short
protocol run — all from a cwd OUTSIDE the repo so nothing resolves from the
source tree.  Also asserts the installed dist compiles its packaged
native/iqo_tables.cpp on demand.

This is the proof behind SURVEY §2.4's build-system row: the per-ISA CMake
matrix "dissolves" into one installable package only if that package
actually installs and serves.

Writes scripts/check_wheel_result.json; exits nonzero on any failure.
Usage: python scripts/check_wheel.py
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run(cmd, **kw):
    print("+", " ".join(str(c) for c in cmd), flush=True)
    return subprocess.run([str(c) for c in cmd], check=True,
                          capture_output=True, text=True, **kw)


def main() -> int:
    results = {}
    work = Path(tempfile.mkdtemp(prefix="iqo_wheel_"))
    try:
        # ---- 1. build the wheel ------------------------------------------
        wheelhouse = work / "wheelhouse"
        run([sys.executable, "-m", "pip", "wheel", "--no-deps",
             "--no-build-isolation", "--no-index", "-w", wheelhouse, REPO])
        wheels = list(wheelhouse.glob("libiqo_tpu-*.whl"))
        assert len(wheels) == 1, f"expected one wheel, got {wheels}"
        wheel = wheels[0]
        results["wheel"] = wheel.name

        # ---- 2. the native source must ship inside ----------------------
        names = zipfile.ZipFile(wheel).namelist()
        assert "libiqo_tpu/native/iqo_tables.cpp" in names, \
            f"native source missing from wheel: {names[:20]}..."
        results["native_cpp_in_wheel"] = True

        # ---- 3. scratch venv, offline install ---------------------------
        # deps (numpy/jax) resolve from the CURRENT interpreter's
        # site-packages via a .pth (zero egress: nothing can be fetched;
        # --system-site-packages would miss them when the running
        # interpreter is itself a venv).  The scratch venv's own
        # site-packages comes first on sys.path, so libiqo_tpu resolves
        # from the installed wheel.
        import sysconfig
        venv = work / "venv"
        run([sys.executable, "-m", "venv", venv])
        vpy = venv / "bin" / "python"
        vsite = run([vpy, "-c", "import sysconfig; "
                     "print(sysconfig.get_paths()['purelib'])"]).stdout.strip()
        (Path(vsite) / "_host_deps.pth").write_text(
            sysconfig.get_paths()["purelib"] + "\n")
        run([vpy, "-m", "pip", "install", "--no-deps", "--no-index", wheel])
        results["installed"] = True

        # every subsequent command runs OUTSIDE the repo on CPU
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   LIBIQO_TPU_CACHE=str(work / "native_cache"))
        env.pop("PYTHONPATH", None)
        cwd = work

        # the installed dist must import from site-packages, not the tree
        loc = run([vpy, "-c", "import libiqo_tpu, os; "
                   "print(os.path.dirname(libiqo_tpu.__file__))"],
                  env=env, cwd=cwd).stdout.strip()
        assert str(REPO) not in loc, f"imported from the source tree: {loc}"
        results["import_path"] = loc

        # ---- 4. on-demand native compile from the packaged source -------
        out = run([vpy, "-c", "from libiqo_tpu.coeffs import native; "
                   "print(native.available())"], env=env, cwd=cwd).stdout
        assert out.strip() == "True", f"native builder unavailable: {out!r}"
        so = list((work / "native_cache").glob("*.so"))
        assert so, "native cache holds no compiled library"
        results["native_compiles_from_wheel"] = True

        # ---- 5. entry point: iqo-tpu-resize-yuv420p ----------------------
        import numpy as np

        from libiqo_tpu.core.plan import build_plan
        from libiqo_tpu.golden import numpy_ref

        sw, sh, dw, dh = 320, 240, 160, 120
        rng = np.random.default_rng(7)
        y = rng.integers(0, 256, (sh, sw), np.uint8)
        u = rng.integers(0, 256, (sh // 2, sw // 2), np.uint8)
        v = rng.integers(0, 256, (sh // 2, sw // 2), np.uint8)
        (work / "in.yuv").write_bytes(
            y.tobytes() + u.tobytes() + v.tobytes())
        run([venv / "bin" / "iqo-tpu-resize-yuv420p", "-m", "lanczos3",
             "-i", work / "in.yuv", "-iw", sw, "-ih", sh,
             "-o", work / "out.yuv", "-ow", dw, "-oh", dh],
            env=env, cwd=cwd)
        got = np.fromfile(work / "out.yuv", np.uint8)
        pl = build_plan("lanczos", sw, sh, dw, dh, degree=3)
        pc = build_plan("lanczos", sw // 2, sh // 2, dw // 2, dh // 2,
                        degree=3, px_scale=2)
        want = np.concatenate([
            numpy_ref.resize_u8(pl, y).ravel(),
            numpy_ref.resize_u8(pc, u).ravel(),
            numpy_ref.resize_u8(pc, v).ravel()])
        assert got.shape == want.shape and (got == want).all(), \
            "installed CLI output diverges from the golden oracle"
        results["resize_cli_byte_exact"] = True

        # ---- 6. entry point: iqo-tpu-benchmark ---------------------------
        out = run([venv / "bin" / "iqo-tpu-benchmark", "-m", "linear",
                   "-iw", 64, "-ih", 48, "-ow", 32, "-oh", 24,
                   "--cycles", 3], env=env, cwd=cwd).stdout
        assert "ms/cycle" in out, f"benchmark entry point output: {out!r}"
        results["benchmark_cli_runs"] = True

        results["ok"] = True
        return 0
    except (AssertionError, subprocess.CalledProcessError) as e:
        if isinstance(e, subprocess.CalledProcessError):
            print(e.stdout, e.stderr, file=sys.stderr)
        results["ok"] = False
        results["error"] = str(e)
        return 1
    finally:
        with open(REPO / "scripts" / "check_wheel_result.json", "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results, indent=1))
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
