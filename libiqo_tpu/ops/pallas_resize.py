"""Fused Pallas TPU kernel: banded separable resize, one pass over HBM.

This is the performance path (the analog of the reference's 12 hand-written
SIMD translation units, ref: src/IQO*ResizerImpl_{SSE4_1,AVX2FMA,AVX512,
NEON}.cpp) — designed for the TPU memory hierarchy instead of
transliterating CPU intrinsics.

Formulation (SURVEY §7): a separable resize is two banded matmuls.  Per
output tile, the banded coefficient matrices restricted to the tile's
source band are small dense blocks, so both passes run on the MXU:

    work = Cy_block @ band          (band: the tile's source rows x cols)
    out  = epilogue(work @ Cx_block)

* Every dot is *exactly* integer: operands split into 8-bit byte planes
  (hi = c >> 8, lo = c & 255), so each single-pass bf16 MXU product is
  exact and every partial sum stays < 2**24 (f32's exact range); int32
  recombination wraps exactly like the reference's C accumulator
  (ref: Generic.cpp:555,598).  When Y coefficients fit 8 bits (the common
  case: Q6 Lanczos taps) the Y pass is a single dot per byte plane of the
  source — i.e. one dot total.
* The per-tile coefficient blocks are built host-side from the exact plan
  tables — the TPU equivalent of the reference's lane-planar coefficient
  unroll (ref: src/IQOLanczosResizerImpl_AVX512.cpp:187-215).  Because the
  blocks encode per-output-row taps directly, *any* geometry works: no
  phase-affinity requirements, no special cases for linear's edge
  replication or lanczos' stale-iterator rows.
* Borders cost nothing at runtime: zero padding makes out-of-range taps
  contribute zero (== the reference dropping them, Generic.cpp:563-570);
  border renormalization is a masked integer divide from per-row/column
  tables.  The reference's per-thread work row (ref: ...AVX512.cpp:227-229)
  becomes a VMEM tile that never touches HBM.
* Source band windows are Element-mode block specs at affine offsets
  ``base + t*step`` (128/32-aligned by construction); non-divisible
  geometries absorb the drift between the affine step and the true window
  into extra band slack, computed exactly per tile at plan time.

Geometries whose bands would blow VMEM, or whose tap sums exceed the bf16
exactness bounds, fall back to ops.xla_resize (see :func:`supports_plan`).

The kernel is **padless**: band windows are Element-mode slices of the raw,
unpadded source — offsets ``max(0, min(hi, base + t*step))``, clamped
fully in bounds on both sides (see :func:`_tile_axis_padless` for the
measured Mosaic rules that force this).  Edge tiles whose clamped window
is shifted relative to the affine ideal get their own coefficient-block
*variant*; the few variants sit VMEM-resident and each grid step selects
its variant by a dynamic leading index.  This avoids materializing a
padded copy of every frame (~2 full-frame HBM round trips that dominated
the removed legacy padded mode's runtime on bandwidth-limited chips).
"""

from __future__ import annotations

import collections
import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax._src.pallas.core as pallas_core

from ..core.plan import AxisPlan, ResizePlan

__all__ = ["supports_plan", "make_resize_fn"]

_F32_EXACT_COEF_SUM = 65535     # per-row sum(|coef|) bound for exact dots
_VMEM_TILE_BUDGET = 10 << 20    # rough per-tile VMEM budget (bytes)


def _reduced(ax: AxisPlan):
    g = math.gcd(ax.n_src, ax.n_dst)
    return ax.n_src // g, ax.n_dst // g


def _exact_trunc_div(n, d_small, shape):
    """Exact C-style (truncate-toward-zero) int32 division ``n / d`` with
    the VPU divide strength-reduced to f32-reciprocal multiplies plus
    integer corrections.

    Why: the border-renorm epilogues divide whole (th x 128)+ slabs every
    grid step, and the VPU integer divide is the kernel's most expensive
    op by far (measured ~1.6e10 divides/s on v5e, NOTES.md — ~250x a basic
    VPU op; the reference pays the same cost class in its scalar
    ``roundedDiv``, ref: src/IQOLanczosResizerImpl_Generic.cpp:216-220).
    This scheme is ~10-20x cheaper: ~6 multiplies + casts + selects.

    Exactness (required — the divide feeds byte-exact output):
    * ``d_small`` (the pre-broadcast deno row/column) is reciprocated ONCE
      per element, then broadcast; 1/f32(d) and f32(n) carry <= 2**-24
      relative error each, so q0 = trunc(f32(n) * inv) is within
      ~3*2**-24 * |n/d| + 1 of the true quotient (<= 385 at |n| < 2**31).
    * Two refinement rounds against the EXACT int32 remainder r = n - q*d
      (i32 wrap keeps r exact whenever |true r| < 2**31) shrink the error
      to < 2 quotient units; two conditional +-1 rounds and a final
      sign-fix land exactly on C trunc semantics for every int32 dividend
      (including -2**31) and every nonzero divisor.
    * |d| == 1 short-circuits to n * sign(d): it is the one divisor class
      where |n/d| can reach 2**31 and make the f32->i32 cast saturate.

    ``LIBIQO_TPU_REAL_DIV=1`` keeps jax.lax.div (measurement A/B only).
    """
    import os

    if os.environ.get("LIBIQO_TPU_REAL_DIV"):    # read at trace time
        return jax.lax.div(n, jnp.broadcast_to(d_small, shape))
    f32, i32 = jnp.float32, jnp.int32
    sgn_d = jnp.where(d_small < 0, i32(-1), i32(1))
    absd = d_small * sgn_d
    inv = 1.0 / d_small.astype(f32)
    sgn_d = jnp.broadcast_to(sgn_d, shape)
    absd = jnp.broadcast_to(absd, shape)
    inv = jnp.broadcast_to(inv, shape)
    d = jnp.broadcast_to(d_small, shape)
    q = (n.astype(f32) * inv).astype(i32)
    r = n - q * d
    for _ in range(2):                    # refine: |q - n/d| -> < 2
        q = q + (r.astype(f32) * inv).astype(i32)
        r = n - q * d
    for _ in range(2):                    # push r into (-|d|, |d|)
        q = q + jnp.where(r >= absd, sgn_d, 0) - jnp.where(r <= -absd, sgn_d, 0)
        r = n - q * d
    # trunc-toward-zero: the remainder's sign must follow the dividend's
    q = (q - jnp.where((n >= 0) & (r < 0), sgn_d, 0)
         + jnp.where((n < 0) & (r > 0), sgn_d, 0))
    return jnp.where(absd == 1, n * sgn_d, q)


def _single_plane_ok(blocks: np.ndarray, axis: int) -> bool:
    """True when one bf16 plane represents ``blocks`` exactly AND every dot
    against 8-bit operands stays within f32's exact integer range.

    The gate is exact bf16 REPRESENTABILITY, not a magnitude range: every
    integer in [-256, 256] qualifies (8-bit mantissa, sign free) — Q6
    Lanczos Y taps and Q8 Area Y taps — but so do larger values with <= 8
    significant bits, e.g. the 2**15 full-weight tap of an identity axis
    or the 8192s of an exact-4:1 Area axis.  bf16 x bf16 products are
    always f32-exact (16 mantissa bits), so accumulation exactness only
    needs per-output |tap|-sums (along the contraction ``axis``)
    <= 2**24/255 (8-bit other operand)."""
    bf = blocks.astype(np.float32).astype(jnp.bfloat16)
    if not np.array_equal(np.asarray(bf, np.float32),
                          blocks.astype(np.float32)):
        return False
    return int(np.abs(blocks.astype(np.int64)).sum(axis=axis).max()) \
        <= (1 << 24) // 255


def _byte_planes(blocks: np.ndarray, axis: int = -1):
    """Split int blocks into exact bf16 byte planes; single plane when the
    values fit bf16's exact signed range (see _single_plane_ok).  ``axis``
    is the contraction axis of the dot the planes will feed."""
    if _single_plane_ok(blocks, axis):
        return ((blocks.astype(np.float32).astype(jnp.bfloat16)), ), (1,)
    hi = (blocks >> 8).astype(np.float32).astype(jnp.bfloat16)
    lo = (blocks & 255).astype(np.float32).astype(jnp.bfloat16)
    return (hi, lo), (256, 1)


def _bf16_relaxed_plane(blocks: np.ndarray) -> np.ndarray:
    """Round an int16-scale coefficient slab to ONE bf16 plane for the
    relaxed-precision X scheme (precision="relaxed"): values keep 8
    significant bits (error <= 2**-9 relative), then each output COLUMN's
    sum is repaired toward its exact integer sum by nudging the
    largest-magnitude tap (re-rounded to bf16 each iteration) — the bf16
    analog of adjustCoefs' exact-sum repair (ref:
    src/IQOLanczosResizerImpl_Generic.cpp:341-367), which keeps flat
    fields ~drift-free (residual column-sum error <= ~1 ulp of the
    largest tap, < 0.15 LSB at Q14 scale).  Contraction axis is -2
    (K x N slabs, outputs on the last axis)."""
    target = blocks.astype(np.float64).sum(axis=-2)
    bf = blocks.astype(np.float32).astype(jnp.bfloat16)
    # Greedy multi-tap repair: nudging only the largest tap converges to
    # half-ulp of THAT tap — for pathological int16-wrapped px2 chroma
    # taps (|c| ~ 2^15, ulp 256) that leaves a ~1.5-LSB flat-field drift.
    # Walking the taps largest-to-smallest pushes the residual floor to
    # half-ulp of the smallest nudged tap (measured: flat fields exact on
    # all graded configs incl. px2 chroma).  The walk must reach the
    # SMALL taps: bf16 represents integers <= 256 exactly, so a tail tap
    # under 256 absorbs any small residual exactly (4K luma's 12-tap
    # columns converge at their 247/60 taps — a cap of 8 stopped short
    # and forced the residual plane on every build).
    order = np.argsort(-np.abs(blocks), axis=-2, kind="stable")
    for k in range(min(blocks.shape[-2], 24)):
        f = bf.astype(np.float64)
        resid = target - f.sum(axis=-2)
        if not resid.any():
            break
        idx = order[..., k: k + 1, :]
        np.put_along_axis(
            f, idx, np.take_along_axis(f, idx, axis=-2)
            + resid[..., None, :], axis=-2)
        bf = f.astype(np.float32).astype(jnp.bfloat16)
    return bf


def _y_bytes_exact_ok(blocks: np.ndarray) -> bool:
    """Exactness of the hi/lo byte-plane Y dot (the non-s8, non-single
    fallback): plane values are always bf16-exact (hi in [-128, 127], lo in
    [0, 255]), so exactness only needs each plane's per-row |tap| sums
    against a 255-max u8 band to keep every f32 partial sum < 2**24."""
    b = blocks.astype(np.int64)
    hi = int(np.abs(b >> 8).sum(axis=-1).max())
    lo = int((b & 255).sum(axis=-1).max())
    return max(hi, lo) <= (1 << 24) // 255


def _kara_ok(blocks: np.ndarray, axis: int) -> bool:
    """Whether the balanced Karatsuba split (see _kara_planes) is exact for
    these coefficient blocks.  Fails for pathological px_scale phases whose
    quantized taps exceed the balanced hi plane's [-128, 128] range (the
    observed surface includes |coef| > 2**15, golden/numpy_ref.py:41-43);
    callers then use the hi/lo byte split, exact for any _exact_f32_ok plan."""
    f = ((blocks + 128) & 255) - 128
    e = (blocks - f) >> 8
    g = e + f
    cap = 1 << 24
    return (int(e.min()) >= -128 and int(e.max()) <= 128
            and int(g.min()) >= -256 and int(g.max()) <= 256
            and 128 * int(np.abs(e).sum(axis=axis).max()) < cap
            and 128 * int(np.abs(f).sum(axis=axis).max()) < cap
            and 256 * int(np.abs(g).sum(axis=axis).max()) < cap)


def _kara_planes(blocks: np.ndarray, axis: int):
    """Balanced-split Karatsuba operands for 16-bit coefficient blocks.

    With c = e*256 + f balanced (f in [-128, 127], e in [-128, 128]) and
    the work rows split likewise (w = a*256 + b), e+f and a+b stay inside
    bf16's exact signed range [-256, 256], so

        sum w*c = 65280*D1 - 255*D2 + 256*D3
        D1 = a @ e,  D2 = b @ f,  D3 = (a+b) @ (e+f)

    needs THREE exact dots instead of the hi/lo split's four.  (The round-1
    note that Karatsuba "fails the 8-bit bound" assumed unsigned planes;
    the signed 9-bit exact range makes the middle term representable.)
    Exactness: |a|<=128, |b|<=128, |a+b|<=256 and per-output sums along
    ``axis`` satisfy 128*sum|e|, 128*sum|f|, 256*sum|e+f| < 2**24 —
    callers must gate on :func:`_kara_ok` (raises ValueError, not assert,
    so the api.py/sharding fallback chains engage and the check survives
    ``python -O``).
    """
    if not _kara_ok(blocks, axis):
        raise ValueError("coefficient blocks exceed the Karatsuba "
                         "exactness bounds; use the hi/lo byte split")
    f = ((blocks + 128) & 255) - 128
    e = (blocks - f) >> 8
    g = e + f
    return tuple(p.astype(np.float32).astype(jnp.bfloat16)
                 for p in (e, f, g))


def _dot_groups(nz: np.ndarray, grp: int, k_align: int):
    """Block-banded decomposition of a banded dot: split the output dim
    into groups of ``grp`` and give each group the aligned sub-window of
    the contraction dim that covers its nonzero taps.

    ``nz``: (K, out) bool — True where any variant's block has a tap.
    Returns [(o0, o_len, k0, k_len), ...] with k0 an exact multiple of
    ``k_align`` and k0 + k_len <= K (K is an align multiple by
    construction of the band).  The groups partition [0, out); every
    nonzero tap of group g lies inside its window, so computing each
    output group against only its window is exact.
    """
    K, out = nz.shape
    groups = []
    for o0 in range(0, out, grp):
        o1 = min(o0 + grp, out)
        rows = np.nonzero(nz[:, o0:o1].any(axis=1))[0]
        if len(rows) == 0:
            k0, kl = 0, min(k_align, K)
        else:
            k0 = int(rows.min()) // k_align * k_align
            kl = min(-(-(int(rows.max()) + 1 - k0) // k_align) * k_align,
                     K - k0)
        groups.append((o0, o1 - o0, k0, kl))
    return groups


def _pick_groups(blocks: np.ndarray, *, out_is_m: bool, other_dim: int,
                 grp_choices, k_align: int):
    """Choose the group size minimizing the ceil-model MXU cost of the
    banded dot against ``blocks``.

    ``blocks`` is (n_var, out, K) for the Y dot (out_is_m=True: groups
    split the dot's M dim, cost ~ sum of o_len * ceil(k_len/128) * N_128
    with other_dim = ceil(N/128)) or (n_var, K, out) for the X dot
    (out_is_m=False: groups split N, cost ~ sum of M * ceil(k_len/128) *
    ceil(o_len/128) with other_dim = M).  Returns the best group list or
    None when no choice beats the monolithic dot by >= 10%.
    """
    nz = (blocks != 0).any(axis=0)
    if out_is_m:
        nz = nz.T                      # -> (K, out)
    K, out = nz.shape

    def cost(groups):
        if out_is_m:
            return sum(max(8, ol) * (-(-kl // 128)) * other_dim
                       for (_o0, ol, _k0, kl) in groups)
        return sum(other_dim * (-(-kl // 128)) * (-(-ol // 128))
                   for (_o0, ol, _k0, kl) in groups)

    best, best_cost = None, cost([(0, out, 0, K)]) * 0.9
    for grp in grp_choices:
        if grp >= out:
            continue
        groups = _dot_groups(nz, grp, k_align)
        c = cost(groups)
        if c < best_cost:
            best, best_cost = groups, c
    return best


# Auto-tuner cost-model rates, keyed by jax device_kind (prefix match).
# Measured on the chips we have run on; unknown kinds take the
# deliberately conservative default, which still yields valid kernels
# (the model only RANKS tile candidates — every candidate is exact).
# Re-measure with scripts/tile_sweep.py when bringing up a new TPU
# generation and add a row here.
_TUNER_RATES = {
    # device_kind prefix: (mxu flops/s, per-grid-step s, dma bytes/s,
    #                      vpu int32 divides/s)
    "TPU v5 lite": (75e12, 0.3e-6, 1.9e11, 1.6e10),   # measured (NOTES.md)
}
_TUNER_DEFAULT = (50e12, 0.5e-6, 1.2e11, 1.0e10)      # conservative


def _tuner_rates():
    """(mxu, step, dma, div) rates for the current device."""
    try:
        import jax

        kind = jax.devices()[0].device_kind
    except Exception:
        kind = ""
    for prefix, rates in _TUNER_RATES.items():
        if kind.startswith(prefix):
            return rates
    return _TUNER_DEFAULT


def _est_coef_single(ax: AxisPlan) -> bool:
    """Cost-model estimate of _single_plane_ok from the plan's coefficient
    table (the dense blocks carry the same values)."""
    return _single_plane_ok(ax.coef.astype(np.int64), axis=1)


def _u16_work_ok(plan: ResizePlan) -> bool:
    """Whether a non-wrap16 plan's work rows provably stay in u16:
    unsigned Y taps with per-row sums <= 256 give w <= 255*256 = 65280
    (area/linear Q8 sums are exactly 256 by adjustCoefs,
    ref: src/IQOAreaResizerImpl_Generic.cpp:222-248).  The u16 range is
    what makes the X work-side u8 byte split exact for the s8 scheme."""
    y = plan.y
    return (int(y.coef.min()) >= 0
            and int(y.coef.astype(np.int64).sum(axis=1).max()) <= 256)


def _exact_f32_ok(plan: ResizePlan) -> bool:
    """Exactness bounds of the bf16 byte-plane / Karatsuba schemes."""
    for ax in (plan.y, plan.x):
        if int(np.abs(ax.coef.astype(np.int64)).sum(axis=1).max()) > _F32_EXACT_COEF_SUM:
            return False
        # byte-plane exactness: rows with > 258 taps can overflow the lo
        # plane's 2**24 sum bound
        if ax.num_coefs > 258:
            return False
    return True


# One feasibility model: the padless builder itself.  supports_plan used
# to pre-gate with a separate cost estimator (_plan_ok/_tile_axis/_auto_tiles,
# a pre-padless relic): a plan whose crude estimate busted the VMEM budget
# but whose actual padless build (pre-sliced X group windows, much smaller
# operands) would fit was silently routed to the ~12x slower XLA path.
# Now supports_plan simply attempts the build and caches the result, so the
# predicate can never disagree with make_resize_fn
# (tests/test_supports_plan.py fuzzes this consistency).
_BUILD_CACHE: collections.OrderedDict = collections.OrderedDict()
_BUILD_CACHE_MAX = 6


def _plan_key(plan: ResizePlan):
    """Content fingerprint of a plan plus every build-shaping env knob
    (LIBIQO_TPU_* flags change tiling/scheme choices at build time, so two
    builds under different knobs must not share a cache slot)."""
    def ax(a: AxisPlan):
        return (a.n_src, a.n_dst, a.num_coefs, a.num_tables, a.bias_bit,
                a.coef.tobytes(), a.start.tobytes(), a.deno.tobytes(),
                a.is_border.tobytes())
    env = tuple(sorted((k, v) for k, v in os.environ.items()
                       if k.startswith("LIBIQO_TPU_")))
    return (ax(plan.y), ax(plan.x), plan.wrap16, plan.out_shift, env)


def _cached_build(plan: ResizePlan, *, interpret: bool, th_target: int,
                  tw_target: int, grid_order: str, relaxed: bool):
    """LRU-cached _make_padless_fn: one host-side build per distinct
    (plan, knobs) serves both the supports_plan predicate and the actual
    make_resize_fn call (builds are pure; returning the same (fn, operands)
    is safe).  None results (infeasible) are cached too — they ARE the
    feasibility answer."""
    key = (_plan_key(plan), interpret, th_target, tw_target, grid_order,
           relaxed)
    if key in _BUILD_CACHE:
        _BUILD_CACHE.move_to_end(key)
        return _BUILD_CACHE[key]
    built = _make_padless_fn(plan, interpret=interpret, th_target=th_target,
                             tw_target=tw_target, grid_order=grid_order,
                             relaxed=relaxed)
    _BUILD_CACHE[key] = built
    if len(_BUILD_CACHE) > _BUILD_CACHE_MAX:
        _BUILD_CACHE.popitem(last=False)
    return built


def supports_plan(plan: ResizePlan, th_target: int = 0,
                  tw_target: int = 0, relaxed: bool = False) -> bool:
    """True when the fused kernel path handles this plan exactly; otherwise
    callers use ops.xla_resize.  th/tw_target of 0 = auto-tuned tiles.

    The answer is the padless builder's own: supports_plan attempts the
    (cached) build, so it cannot disagree with make_resize_fn — the
    NULL-factory dispatch analog (ref: src/IQOLanczosResizer.cpp:15-37,
    where a factory compiled without ISA support returns NULL and the
    facade walks to the next arch).

    ``relaxed`` plans answer True unconditionally (the documented fallback
    seam, tests/test_fallback_seams.py): their envelope is wider and only
    the build itself knows it — api.py's retry ladder catches the
    ValueError and walks relaxed -> exact -> XLA."""
    if relaxed:
        return True
    return _cached_build(plan, interpret=False, th_target=th_target,
                         tw_target=tw_target, grid_order="xy",
                         relaxed=False) is not None


# ---------------------------------------------------------------------------
# Padless mode: Element windows over the raw source + coefficient variants
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class _PAxis:
    """Padless tiling of one axis.

    Window of tile t is ``[off[t], off[t] + band)`` over the *unpadded*
    source, with ``off[t] = max(0, base + t*step)`` — aligned by
    construction (base, step, 0 are all align-multiples).  The high side may
    exceed n_src; those positions are garbage in VMEM and every stored
    output's taps there are zero (the plan ships clipped taps,
    ref: src/IQOLanczosResizerImpl_Generic.cpp:563-570 drops them).
    """
    tile: int
    n_tiles: int
    step: int
    base: int                # may be negative (first windows clamp to 0)
    band: int
    off: np.ndarray          # (n_tiles,) actual window offsets, >= 0
    clamp_hi: int = -1       # >= 0: off = max(0, min(clamp_hi, base+t*step))
    #                          (lane axis in-bounds clamp); -1: max only
    pad: int = 0             # source zero-padding (see _tile_axis_padless)


def _tile_axis_padless(ax: AxisPlan, tile: int, align: int) -> _PAxis:
    """Window layout for one axis.

    Mosaic constraints this encodes (measured on this chip):

    * window offsets must be provable ``align``-multiples — ``max``/``min``
      of aligned values stays aligned;
    * windows must never read out of bounds: OOB lane windows crash
      compiled kernels (and silently shift in interpret mode); OOB sublane
      windows crash once the overshoot grows past a few tiles (measured:
      16 rows tolerated, 104 rows -> TPU INTERNAL error) — so both axes are
      clamped fully in range;
    * window lengths must be divisible by the block divisor (8 sublane /
      128 lane) or equal the full array dim.  In-bounds clamping needs the
      uncovered tail ``n_src - band`` to stay an offset-align multiple, so
      we pick ``band ≡ n_src (mod align)``; when that band can't satisfy
      the length divisor (n_src % 8 != 0 sublane / n_src % 128 != 0 lane)
      the axis is zero-PADDED up to the divisor (``pad`` <= 7 rows / 127
      cols; the wrapper pads the source per call — a small copy, vs the
      full-length-window fallback blowing the VMEM band for every tile).
      Padded positions hold zeros and every tap beyond the true n_src is
      already clipped to zero in the plan, so results are unchanged.
      Single-tile axes skip the pad: one full-length window is legal and
      clamp-free as-is.
    """
    n_tiles = -(-ax.n_dst // tile)
    start = ax.start.astype(np.int64)
    n_src = ax.n_src
    len_div0 = 8 if align == 32 else 128
    pad = 0
    if n_tiles > 1 and (n_src % align) % len_div0 != 0:
        pad = -n_src % len_div0
        n_src += pad
    # in-range source span per output, then per tile
    lo_d = np.clip(start, 0, n_src)
    hi_d = np.clip(start + ax.num_coefs, 0, n_src)
    lo = np.empty(n_tiles, np.int64)
    hi = np.empty(n_tiles, np.int64)
    for t in range(n_tiles):
        d0, d1 = t * tile, min((t + 1) * tile, ax.n_dst)
        lo[t] = lo_d[d0:d1].min()
        hi[t] = max(hi_d[d0:d1].max(), lo[t])
    step = max(align, (tile * n_src // max(1, ax.n_dst)) // align * align)
    ts = step * np.arange(n_tiles)
    base = int(np.floor_divide((lo - ts).min(), align)) * align

    len_div = 8 if align == 32 else 128
    r = n_src % align
    if r % len_div == 0:
        def fit(need):
            # smallest band >= need with band ≡ n_src (mod align); such a
            # band is automatically a len_div multiple since r is
            b = -(-max(need - r, 0) // align) * align + r
            return max(b, len_div)

        band = fit(int((hi - np.maximum(0, base + ts)).max()))
        # clamping edge windows into range can raise the coverage need;
        # the monotone iteration converges or degrades to one full window
        while band < n_src:
            hi_bound = n_src - band          # align-multiple by construction
            off = np.minimum(np.maximum(0, base + ts), hi_bound)
            need = fit(int((hi - off).max()))
            if need <= band:
                return _PAxis(tile, n_tiles, step, base, band, off,
                              clamp_hi=hi_bound, pad=pad)
            band = need
    # full-length window (offsets all 0): always in bounds; length == n_src
    # satisfies the "equal to the array dim" escape of the divisibility rule
    return _PAxis(tile, n_tiles, step, base, n_src,
                  np.zeros(n_tiles, np.int64), clamp_hi=0, pad=pad)


@dataclasses.dataclass(frozen=True)
class _Carry:
    """Row-halo carry layout (opt-in, LIBIQO_TPU_CARRY=1): the Y-axis band
    windows of the tuned kernels overlap by ``band - step`` rows, so the
    pipelined window fetch re-reads the source 1.76-1.89x (measured
    band/step at th=32..96).  Carry mode materializes the SAME windows in
    a double-buffered VMEM scratch itself: per grid step one manual DMA
    brings only the ``fetch = band - halo`` fresh rows, and the halo rows
    are copied VMEM->VMEM from the other buffer (<= a couple of 32-row
    granules — sub-us against the HBM traffic it replaces).  Everything
    downstream — coefficient blocks, variants, dot groups, epilogues — is
    identical to the windowed mode, because the buffer holds exactly the
    windowed band [off(t), off(t)+band).

    Schedule at step t (sequential grid, "arbitrary" semantics):
      1. wait the fetch DMA issued for t at t-1 (buffer t%2 rows
         [halo, band) now hold source rows [off(t)+halo, off(t)+band));
      2. halo-copy: buf[t%2][0:halo] = buf[(t-1)%2][d : d+halo] where
         d = off(t) - off(t-1)  (32-aligned; the other buffer holds
         [off(t-1), off(t-1)+band) ⊇ the halo since d <= step <= fetch);
      3. issue the fetch DMA for t+1 into buf[(t+1)%2] — safe ONLY now:
         the halo copy above was the last read of that buffer;
      4. compute from buf[t%2][0:band].
    t == 0 instead DMAs halo and fetch both, synchronously (and per batch
    group, so no buffer ever leaks a previous group's rows).
    """
    halo: int                # VMEM-carried rows, 32-multiple >= 32
    fetch: int               # rows per manual DMA ( == band - halo )


def _carry_layout(p: _PAxis, lane_w: int):
    """Carry feasibility/sizing for the row axis: the largest 32-multiple
    halo that keeps fetch >= step (so the buffer advance never exceeds
    one fetch).  None when there is no 32-row halo to save (then the
    windowed mode is used).

    ``lane_w`` is the band buffer's lane (last) dim: the current Mosaic
    requires every sublane-sliced VMEM memref to have a 128-multiple lane
    dim (``Slice shape along dimension 2 must be aligned to tiling
    (128)``), so carry refuses odd-width sources and the windowed mode —
    whose full-block windows don't slice — covers them."""
    if lane_w % 128 != 0:
        return None
    halo = (p.band - p.step) // 32 * 32
    if halo < 32:
        return None
    fetch = p.band - halo
    if fetch >= 0.9 * p.band:        # no real DMA saving
        return None
    return _Carry(halo, fetch)


def _build_blocks_padless(ax: AxisPlan, p: _PAxis, transpose: bool) -> np.ndarray:
    """Per-tile dense coefficient blocks over the clamped windows.

    Taps stay clipped exactly as the plan stores them (OOB source => 0 ==
    the reference dropping them at runtime).  Output rows past n_dst (tile
    padding, masked on store) are all-zero.
    """
    n, tile, band = p.n_tiles, p.tile, p.band
    shape = (n, band, tile) if transpose else (n, tile, band)
    blocks = np.zeros(shape, np.int32)   # Q14/Q15 taps; int32 ample
    d_all = np.arange(ax.n_dst)
    t_idx = d_all // tile
    k_idx = d_all % tile
    base_j = ax.start.astype(np.int64) - p.off[t_idx]
    for i in range(ax.num_coefs):
        c = ax.coef[:, i].astype(np.int32)
        sel = c != 0
        j = base_j + i
        if ((j < 0) | (j >= band))[sel].any():
            bad = int(np.nonzero(sel & ((j < 0) | (j >= band)))[0][0])
            raise AssertionError(
                f"padless window misses tap: tile {t_idx[bad]} d {bad} "
                f"j {j[bad]} band {band}")
        if transpose:
            np.add.at(blocks, (t_idx[sel], j[sel], k_idx[sel]), c[sel])
        else:
            np.add.at(blocks, (t_idx[sel], k_idx[sel], j[sel]), c[sel])
    return blocks


@dataclasses.dataclass(frozen=True)
class _Variants:
    uniq: np.ndarray          # (n_var, A, B) deduped blocks
    interior: int             # most common variant id
    exceptions: tuple         # ((tile, variant), ...) where != interior


def _dedup_blocks(blocks: np.ndarray) -> _Variants:
    if blocks.shape[0] == 1:   # single tile — np.unique would sort ~60 MB
        return _Variants(blocks, 0, ())
    uniq, inv = np.unique(blocks, axis=0, return_inverse=True)
    inv = inv.ravel()
    interior = int(np.bincount(inv).argmax())
    exceptions = tuple((int(t), int(v)) for t, v in enumerate(inv)
                       if v != interior)
    return _Variants(uniq, interior, exceptions)


_MAX_RESIDENT_VARS = 4
_MAX_EXCEPTIONS = 8


def _padless_vmem(th, tw, band_h, band_w, n_cy, n_cx,
                  y_res, x_res, n_var_y, n_var_x,
                  x_band_eff: int = 0) -> int:
    est = (2 * band_h * band_w          # u8 band, double buffered
           + 2 * th * tw                # u8 out, double buffered
           + 4 * th * band_w * 3        # i32 work + bf16 byte splits
           + 4 * th * tw * 4)           # f32 dot temps
    est += n_cy * 2 * th * band_h * (n_var_y if y_res else 2)
    # X blocks are pre-sliced to their group windows (x_band_eff per 128
    # output columns) — only the sub-windows are VMEM-resident
    xb = min(band_w, x_band_eff) if x_band_eff else band_w
    est += n_cx * 2 * xb * tw * (n_var_x if x_res else 2)
    return est


def _auto_tiles_padless(plan: ResizePlan, relaxed: bool = False):
    """Tile choice for the padless kernel: minimize max(MXU, DMA) time with
    exact-coverage and phase-affinity preferences (affine tiles collapse to
    ~3 resident variants; others stream per-tile blocks)."""
    y, x = plan.y, plan.x
    r_sh, r_dh = _reduced(y)
    r_sw, r_dw = _reduced(x)
    n_cy = 1 if _est_coef_single(y) else 2
    # X: single exact plane -> 2 dots over 1 plane; s8 4-dot (the
    # default for 16-bit taps, wrap16 or u16-work) -> 4 dots over 2 int8
    # planes; Karatsuba bf16 / hi-lo split otherwise.  Relaxed keeps ONE
    # resident bf16 plane (n_px, the VMEM side) but ranks time with the
    # exact scheme's dot count: measured on chip
    # (scripts/exp_relaxed_sweep.py) the X dots overlap DMA/VPU off the
    # critical path and the relaxed kernel prefers the same tiles as the
    # exact one — ranking with n_dx=1 flipped 4K luma to th=64 (0.0661
    # ms/frame vs 0.0579 at the exact pick th=32).
    if relaxed:
        n_dx = 2 if _est_coef_single(x) else 4
        n_px = 1
    elif _est_coef_single(x):
        n_dx, n_px = 2, 1
    else:
        n_dx, n_px = 4, 2
    cands = []
    mxu_r, step_r, dma_r, div_r = _tuner_rates()
    w_full = -(-x.n_dst // 128) * 128
    import os as _os
    _carry_env = _os.environ.get("LIBIQO_TPU_CARRY", "")
    for th in (32, 64, 96, 128, 160, 192, 224, 256):
        th_eff = min(-(-y.n_dst // 32) * 32, th)
        for tw in sorted({min(w_full, t) for t in (256, 384, 512, w_full)}):
            tw_eff = tw
            py = _tile_axis_padless(y, th_eff, 32)
            px = _tile_axis_padless(x, tw_eff, 128)
            # carry mode fetches only ~step fresh rows per grid step; rank
            # candidates with the DMA its builder will actually pay
            band_h_dma = py.band
            if (_carry_env in ("1", "2") and px.n_tiles == 1
                    and py.n_tiles >= 3):
                c = _carry_layout(py, px.band)
                if c is not None:
                    band_h_dma = c.fetch
            y_aff = (th_eff * r_sh) % (r_dh * 32) == 0
            x_aff = (tw_eff * r_sw) % (r_dw * 128) == 0
            # a single tile along an axis has exactly one window => one
            # variant and no clamp-shift union growth in the group windows
            nvy = 1 if py.n_tiles == 1 else (3 if y_aff else py.n_tiles)
            nvx = 1 if px.n_tiles == 1 else (3 if x_aff else px.n_tiles)
            y_res = y_aff or nvy <= _MAX_RESIDENT_VARS
            x_res = x_aff or nvx <= _MAX_RESIDENT_VARS
            n_tiles = py.n_tiles * px.n_tiles
            rows_pad = py.n_tiles * th_eff
            cols_pad = px.n_tiles * tw_eff
            # block-banded grouping caps the effective contraction dim at
            # ~(group * src/dst + taps) ceiled to the MXU's 128 K-chunks
            # (groups of 32 output rows for Y, 128 output columns for X).
            # Multi-tile axes pay a union penalty: edge tiles' clamped
            # windows shift tap positions, and the static group windows
            # must cover every variant (measured +128..384 on 4K lanczos3
            # — what makes single-column-tile layouts win).
            x_union = 256 if px.n_tiles > 1 else 0
            y_union = 32 if py.n_tiles > 1 else 0
            y_eff = min(py.band, -(-(32 * r_sh + y.num_coefs * r_dh)
                                   // (128 * r_dh)) * 128 + y_union)
            x_eff = min(px.band, -(-(128 * r_sw + x.num_coefs * r_dw)
                                   // (128 * r_dw)) * 128 + x_union)
            flops = 2 * (rows_pad * px.n_tiles * px.band * y_eff * n_cy
                         + rows_pad * cols_pad * x_eff * n_dx)
            dma = n_tiles * band_h_dma * px.band + rows_pad * cols_pad
            dma += (min(nvx, px.n_tiles) if x_res else n_tiles) \
                * n_px * x_eff * tw_eff * 2
            dma += (min(nvy, py.n_tiles) if y_res else n_tiles) \
                * n_cy * th_eff * py.band * 2
            est = _padless_vmem(th_eff, tw_eff, py.band, px.band,
                                n_cy, n_px, y_res, x_res, nvy, nvx,
                                x_band_eff=x_eff)
            if est > _VMEM_TILE_BUDGET:
                continue
            cost = max(flops / mxu_r, dma / dma_r) + n_tiles * step_r
            # Y-border renorm divide: runs on the 2 edge tiles' full
            # (th, band_w) work — VPU int32 divide is slow enough
            # (~1.6e10/s measured on v5e) that tall tiles pay measurably
            if plan.wrap16 and bool(y.is_border.any()) and py.n_tiles > 2:
                cost += 2 * th_eff * px.band / div_r
            cands.append((cost, th_eff, tw_eff))
    cands.sort()
    seen, ranked = set(), []
    for _c, th_eff, tw_eff in cands:
        if (th_eff, tw_eff) not in seen:
            seen.add((th_eff, tw_eff))
            ranked.append((th_eff, tw_eff))
    return ranked[:6]


def _pick_bf(nb: int, bf_cap: int, force: int = 0) -> int:
    """Frames stacked per grid step: the largest of (4, 2, 1) that divides
    the batch and fits the VMEM headroom cap.  ``force`` (the LIBIQO_TPU_BF
    measurement override) wins when it divides the batch — it deliberately
    ignores the cap so A/B runs can push past the tuner's choice."""
    if force:
        return force if nb % force == 0 else 1
    return next(b for b in (4, 2, 1) if b <= bf_cap and nb % b == 0)


def _make_padless_fn(plan: ResizePlan, *, interpret: bool = False,
                     th_target: int = 0, tw_target: int = 0,
                     grid_order: str = "xy", force_streamed_y: bool = False,
                     relaxed: bool = False):
    """Padless-mode builder (see module docstring).  Returns None when the
    geometry doesn't fit this mode's VMEM envelope (caller falls back).

    ``force_streamed_y`` keeps the Y coefficient blocks as per-tile
    streamed operands (no resident variant dedup) so callers can substitute
    per-device block values under shard_map (parallel/sharding.py); the
    returned ``fn`` carries layout metadata attributes for that use.

    ``relaxed`` builds the opt-in relaxed-precision X scheme (one rounded
    bf16 dot instead of 4 exact s8 dots; ~2 LSB max error — see the
    x_relaxed comment below).  The Y pass stays exact.
    """
    y, x = plan.y, plan.x
    if th_target and tw_target:
        th = min(-(-y.n_dst // 32) * 32, -(-th_target // 32) * 32)
        tw = min(-(-x.n_dst // 128) * 128, -(-tw_target // 128) * 128)
    else:
        # the tuner's VMEM model is approximate — walk its ranked
        # candidates until one actually builds
        for th_c, tw_c in _auto_tiles_padless(plan, relaxed=relaxed):
            built = _make_padless_fn(plan, interpret=interpret,
                                     th_target=th_c, tw_target=tw_c,
                                     grid_order=grid_order,
                                     force_streamed_y=force_streamed_y,
                                     relaxed=relaxed)
            if built is not None:
                return built
        return None
    py = _tile_axis_padless(y, th, 32)
    px = _tile_axis_padless(x, tw, 128)
    n_ty, n_tx = py.n_tiles, px.n_tiles
    band_h, band_w = py.band, px.band

    import os as _os
    # Row-halo carry (opt-in until the on-chip A/B lands): manual-DMA ring
    # replaces the overlapped band windows — see _Carry.  Single-column-
    # tile row grids only (every tuned hot config); sharded builds keep
    # the windowed mode (their per-device band substitution assumes it).
    carry = None
    if (_os.environ.get("LIBIQO_TPU_CARRY", "") in ("1", "2")
            and n_tx == 1 and n_ty >= 3 and not force_streamed_y
            and grid_order == "xy"):
        carry = _carry_layout(py, band_w)

    # Measurement knob (exp_band_shape follow-up): force the per-tile
    # streamed coefficient path instead of resident scratch + first-step
    # copies, to expose what the resident copy costs per call.
    # "1" streams both sides, "y"/"x" streams only that side (an X-only
    # stream with n_tx == 1 has a constant block index, which Mosaic
    # fetches once — resident semantics without the manual copy)
    _no_res = _os.environ.get("LIBIQO_TPU_NO_RESIDENT", "")
    blocks_y = _build_blocks_padless(y, py, transpose=False)
    vy = _dedup_blocks(blocks_y)
    y_res = (not force_streamed_y and _no_res not in ("1", "y")
             and len(vy.uniq) <= _MAX_RESIDENT_VARS
             and len(vy.exceptions) <= _MAX_EXCEPTIONS)
    blocks_x = _build_blocks_padless(x, px, transpose=True)
    vx = _dedup_blocks(blocks_x)
    x_res = (_no_res not in ("1", "x")
             and len(vx.uniq) <= _MAX_RESIDENT_VARS
             and len(vx.exceptions) <= _MAX_EXCEPTIONS)

    cy_src = vy.uniq if y_res else blocks_y
    cx_src = vx.uniq if x_res else blocks_x
    # Y scheme: when the taps fit s8 (lanczos Q6: |tap| <= 64ish), the Y
    # dot runs as s8 x s8 -> i32 on the band rebased to signed range
    # ((u8 ^ 0x80) reinterpret == v - 128; the -128 folds into a per-row
    # correction 128 * sum(taps), exact in int32) — no u8->bf16 band
    # conversion, a slightly faster MXU rate, and exactness independent of
    # f32 (measured ~7 us/frame on 4K luma).  Disabled for
    # force_streamed_y: sharding substitutes bf16 byte-plane values.
    s8_y = (not force_streamed_y
            and int(cy_src.min()) >= -128 and int(cy_src.max()) <= 127)
    if s8_y:
        cy_planes, cy_scale = (cy_src.astype(np.int8),), (1,)
    else:
        cy_planes, cy_scale = _byte_planes(cy_src, axis=-1)
    n_cy = len(cy_planes)

    # Block-banded group decomposition (_dot_groups): each output group's
    # dot contracts only over its aligned band sub-window — the dense-band
    # dots otherwise do ceil(band/128)/ceil(taps/128) times the needed MXU
    # work (measured 2.3x faster X pass on 4K lanczos3).  Y grouping is
    # skipped for force_streamed_y builds: sharding substitutes per-device
    # Y block VALUES whose nonzero taps could fall outside windows computed
    # from this build's blocks.  For s8_y the group/window alignments honor
    # the i8 layout granules (M-dim slices at 32-sublane multiples, K
    # windows at 64 — Mosaic slices lanes at 64-offsets and i8 sublanes at
    # 32-granularity without relayout).
    import os as _os
    _no_ygroup = bool(_os.environ.get("LIBIQO_TPU_NO_YGROUP"))
    # Measurement-only stage ablation (scripts/exp_ablate_stages.py): cut
    # the kernel after a stage and write a cheap slice of its result, so
    # on-chip slopes isolate each stage's EXPOSED cost (DMA overlap
    # included).  Never set in production; outputs are garbage.
    _ablate = _os.environ.get("LIBIQO_TPU_ABLATE", "")
    # Measurement override for the frame-stacking factor (A/B the stacked
    # grid): LIBIQO_TPU_BF=1 disables stacking, =2/4 forces that factor
    # when the batch divides by it.  Outputs stay byte-exact either way.
    _bf_force = int(_os.environ.get("LIBIQO_TPU_BF", "0") or 0)
    if force_streamed_y or _no_ygroup:
        y_groups = None
    elif s8_y:
        y_groups = _pick_groups(
            cy_src, out_is_m=True, other_dim=-(-band_w // 128),
            grp_choices=(32, 64, 96), k_align=64)
    else:
        y_groups = _pick_groups(
            cy_src, out_is_m=True, other_dim=-(-band_w // 128),
            grp_choices=(32, 64, 96), k_align=8)
    # X K-window alignment: 32 is the finest offset Mosaic lowers for
    # lane slices of the i8 work planes (verified exact on chip); finer
    # alignment stops band-straddle windows from paying a second 128-K
    # MXU chunk (upsample grp=128 windows: 23 -> 15 chunks at 32).
    # LIBIQO_TPU_KALIGN overrides for A/B measurement.
    _x_kalign = int(_os.environ.get("LIBIQO_TPU_KALIGN", "0") or 0) or 32
    x_groups = _pick_groups(
        cx_src, out_is_m=False, other_dim=th,
        grp_choices=(128, 256), k_align=_x_kalign)

    cy_ops = [np.asarray(p) for p in cy_planes]
    # X operands are pre-sliced to their group windows (plane-major, then
    # group) BEFORE the exact-plane split: VMEM holds only the band
    # sub-windows the dots read (~2.3x less resident coefficient VMEM at
    # 2:1 — what lets large tiles fit the budget at 3 Karatsuba planes),
    # and the plane split touches slab-sized arrays instead of the full
    # dense block (construction time).  Every output's taps lie inside its
    # slab, so per-slab plane values and exactness bounds equal the
    # full-block ones.
    xg = x_groups if x_groups is not None else [(0, tw, 0, band_w)]
    n_xg = len(xg)
    slabs = [np.ascontiguousarray(cx_src[:, k0:k0 + kl, o0:o0 + ol])
             for (o0, ol, k0, kl) in xg]
    # X scheme, in preference order (uniform across slabs):
    # * s8 4-dot (wrap16 plans whose taps split into s8 planes — lanczos
    #   Q14 always does): the work rows split FLOOR-wise, w = 256a + b'
    #   with a = w >> 8 (arithmetic shift: always in [-128, 127] for int16
    #   w — the balanced split's hi plane hits +128 for w in [32640, 32767],
    #   which an int8 cast wraps to -128, corrupting border rows whose
    #   renorm wrap lands there) and b = b' - 128 rebased to s8; the
    #   constant +128 contributes the static per-output-column correction
    #   128 * colsum(c), folded in as the corr_x operand.  With c = 256e +
    #   f balanced, sums = 65536(a@e) + 256(a@f + b@e) + b@f + corr_x,
    #   exact in int32 (i32 wraps == the C accumulator).  Measured 1.3x
    #   faster than Karatsuba-bf16 (cheaper casts + s8 MXU rate) and needs
    #   no f32 exactness bounds at all.
    # * single exact bf16 plane (2 dots) when taps fit [-256, 256];
    # * balanced Karatsuba bf16 (3 dots; wrap16 only: the w-side balanced
    #   split needs |a+b| <= 256 ⇔ |w| <= 32768, and the coef-side bounds
    #   of _kara_ok);
    # * hi/lo bf16 4-dot split otherwise (area/linear 16-bit work rows,
    #   and wrap16 plans whose pathological taps break the Karatsuba
    #   coef bounds).
    # NOTE: a 2-dot "f32-unsplit" X scheme (split only the work side,
    # keep the 15-bit int coefficients whole as f32 operands) was built
    # and then measured on chip to be (a) SLOWER than the 4 s8 dots
    # (1.00 vs 0.65 us per application — Mosaic's default-precision f32
    # dot runs as bf16 passes, not a cheap native f32) and (b) INEXACT:
    # the bf16 truncation of the f32 operands drops the coefficients'
    # low 7 bits (scripts/exp_x_schemes.py, f32_2dot exact: False).  A
    # native s16 MXU dot does not compile either (Mosaic INTERNAL
    # error).  The s8 4-dot scheme is the endgame for 16-bit X taps.
    # RELAXED precision (opt-in, precision="relaxed"): ONE bf16 dot per
    # group — w and the 16-bit coefs both rounded to bf16 (8-bit
    # mantissa), f32 accumulation.  Not byte-exact: measured max error
    # 2.2 LSB / mean 0.35 on the shootout harness
    # (scripts/exp_x_schemes.py bf16_1dot) — the TPU analog of the
    # reference's own SIMD float paths, which also diverge from Generic
    # (up to ~13 LSB, SURVEY §3.3; they normalize float taps by division,
    # ref: src/IQOLanczosResizerImpl_AVX512.cpp:177-185).  Measured ~FREE
    # on the MXU relative to the 4 s8 dots (0.32 vs 0.72 us/application
    # incl. harness floor 0.33).  Coefficient planes get a per-output
    # column-sum repair so flat fields stay ~drift-free.
    x_relaxed = bool(relaxed)
    if x_relaxed:
        # the relaxed epilogue casts the f32 sums to i32: refuse plans
        # whose worst-case |w| * per-output sum|c| could overflow 2**31
        # (and plans with unbounded work rows) — they fall back to the
        # exact schemes / XLA instead of silently corrupting
        wmax = 32768 if plan.wrap16 else (   # wrapped w reaches -32768
            65280 if _u16_work_ok(plan) else None)
        csum = int(np.abs(x.coef.astype(np.int64)).sum(axis=1).max())
        if wmax is None or wmax * csum >= 2**31:
            return None
    x_single = (not x_relaxed
                and all(_single_plane_ok(s, axis=-2) for s in slabs))
    # u16-work plans (area/linear, see _u16_work_ok) take the same s8
    # scheme with BOTH work planes rebased u8 -> s8; the extra constant
    # folds into the static per-column correction (factor 257 vs 1).
    x_u8work = not plan.wrap16 and _u16_work_ok(plan)
    x_s8 = (not x_relaxed and (plan.wrap16 or x_u8work)
            and int(cx_src.min()) >= -32768 and int(cx_src.max()) <= 32639
            and not x_single)
    x_kara = (not x_relaxed and not x_s8 and plan.wrap16
              and not x_single
              and all(_kara_ok(s, axis=-2) for s in slabs))
    # A mixed 3-dot s8/bf16 variant (Karatsuba middle term in bf16) was
    # measured 10% SLOWER than the 4 s8 dots on 4K lanczos3 (0.0753 vs
    # 0.0684 ms/frame): the (a+b) i32->bf16 cast of the full work tile
    # costs more than the saved s8 dot at the tuned short tiles.  The
    # unconditional 4-dot form stays the only s8 X scheme.
    # exactness guard: the bf16 schemes need _exact_f32_ok's bounds;
    # plans admitted via the _exact_s8*_ok gates alone must land on
    # self-contained exact schemes: the all-integer s8 X (or a single
    # exact bf16 X plane) plus a self-contained exact Y (s8, single
    # bf16 plane, or bounded hi/lo byte planes)
    # (force_streamed_y disables s8_y, so such builds refuse)
    if not _exact_f32_ok(plan):
        y_self_exact = (s8_y or _single_plane_ok(cy_src, axis=-1)
                        or _y_bytes_exact_ok(cy_src))
        if x_relaxed:
            # the docstring contract is "The Y pass stays exact": a
            # relaxed plan outside _exact_f32_ok (e.g. a >258-tap extreme
            # downscale admitted only by the wmax*csum guard above) whose
            # Y scheme is not self-contained exact would get an
            # f32-inexact lo-plane Y dot, silently exceeding the
            # documented ~2 LSB bound — refuse so the exact/XLA fallback
            # ladder engages instead
            if not y_self_exact:
                return None
        else:
            if not (x_s8 or x_single) or not y_self_exact:
                return None

    if x_relaxed:
        c0s = [_bf16_relaxed_plane(s) for s in slabs]
        # One rounded plane suffices when the column-sum repair CONVERGED
        # (sums exact => flat fields exact; random error is the work-side
        # + per-tap bf16 rounding, <= ~2 LSB).  Per-tap residuals are
        # nonzero for virtually any Q14 tap set, so they must NOT be the
        # trigger — gating on them silently doubled every relaxed X pass.
        sums_exact = all(
            (c0.astype(np.float64).sum(axis=-2)
             == s.astype(np.float64).sum(axis=-2)).all()
            for s, c0 in zip(slabs, c0s))
        if not sums_exact:
            # Some column's taps cannot round to bf16 with an exact sum
            # (pathological int16-wrapped px2 taps: all 4 are ~2**15, so
            # the repair floor is half their ulp, and the X-border renorm
            # divide then amplifies it — measured -3 LSB on a flat field
            # at the px2 chroma right border).  Add the residual plane
            # dc = c - bf16(c): an integer with |dc| <= half-ulp <= 128,
            # hence exactly representable in bf16; a second dot against
            # it removes the coefficient-rounding error entirely, leaving
            # only the work-side bf16 rounding.
            resid = [s.astype(np.float64) - c.astype(np.float64)
                     for s, c in zip(slabs, c0s)]
            dps = [r.astype(np.float32).astype(jnp.bfloat16) for r in resid]
            if any(not (d.astype(np.float64) == r).all()
                   for r, d in zip(resid, dps)):
                return None     # taps beyond the scheme's envelope
            slab_planes = [(c0, d) for c0, d in zip(c0s, dps)]
        else:
            slab_planes = [(c0,) for c0 in c0s]
        cx_scale = None
    elif x_s8:
        def s8_split(s):
            f = ((s + 128) & 255) - 128
            e = (s - f) >> 8
            if e.min() < -128 or e.max() > 127:   # guaranteed by the gate
                raise ValueError("s8 coef hi plane out of range")
            return (e.astype(np.int8), f.astype(np.int8))
        # An N-packed variant ([e | f] concatenated along the output dim,
        # halving the dot invocations at N=2*ol) was built and A/B'd on
        # chip (xpack_kalign_2x2.log): no payoff — noise-level at
        # k_align=32 (luma 0.0382 vs 0.0379) and WORSE at 64 (0.0404 vs
        # 0.0385).  Mosaic evidently pipelines the four small dots as
        # well as two wide ones; the 4-dot form stays.
        slab_planes = [s8_split(s) for s in slabs]
        cx_scale = None
    elif x_kara:
        slab_planes = [_kara_planes(s, axis=-2) for s in slabs]
        cx_scale = None
    else:
        splits = [_byte_planes(s, axis=-2) for s in slabs]
        # a uniform scheme needs every slab split the same way
        if any(len(pl_) != len(splits[0][0]) for pl_, _sc in splits):
            splits = [((  # force hi/lo on all slabs
                (s >> 8).astype(np.float32).astype(jnp.bfloat16),
                (s & 255).astype(np.float32).astype(jnp.bfloat16)),
                (256, 1)) for s in slabs]
        slab_planes = [pl_ for pl_, _sc in splits]
        cx_scale = splits[0][1]
    n_cx = len(slab_planes[0])
    # plane-major, then group: operand index = p * n_xg + g
    cx_ops = [np.asarray(slab_planes[g][p])
              for p in range(n_cx) for g in range(n_xg)]
    n_cx_ops = len(cx_ops)

    # VMEM feasibility from the ACTUAL operand shapes: resident blocks sit
    # whole in scratch; streamed ones are double-buffered per-tile slices.
    # (Carry mode's two manual band buffers cost the same bytes as the
    # windowed mode's double-buffered band window.)
    est = (2 * band_h * band_w          # u8 band, double buffered
           + 2 * th * tw                # u8 out, double buffered
           + 4 * th * band_w * 3        # i32 work + bf16 byte splits
           + 4 * th * tw * 4)           # f32 dot temps
    est += sum(int(np.prod(o.shape[(0 if y_res else 1):]))
               * o.dtype.itemsize * (1 if y_res else 2) for o in cy_ops)
    est += sum(int(np.prod(o.shape[(0 if x_res else 1):]))
               * o.dtype.itemsize * (1 if x_res else 2) for o in cx_ops)
    if est > _VMEM_TILE_BUDGET:
        return None
    # batch-stacking headroom: each extra frame per grid step costs one
    # more double-buffered band block + out block (compute temps are
    # reused across the sequential per-frame loop)
    _bf_frame = 2 * band_h * band_w + 2 * th * tw
    bf_cap = min(4, 1 + (_VMEM_TILE_BUDGET - est) // _bf_frame)

    wrap16 = plan.wrap16
    y_bias = y.bias
    out_shift = plan.out_shift
    half = 1 << (out_shift - 1)
    y_has_border = bool(y.is_border.any())
    x_has_border = bool(x.is_border.any())

    n_rows_pad = n_ty * th
    deno_y = np.ones((n_rows_pad, 1), np.int32)
    deno_y[: y.n_dst, 0] = np.where(y.deno == 0, 1, y.deno)
    border_y = np.zeros((n_rows_pad, 1), np.int32)
    border_y[: y.n_dst, 0] = y.is_border.astype(np.int32)
    # s8 Y rebase correction: +128 * (row tap sum), exact i32; rows past
    # n_dst are masked on store so 0 is fine (plan.coef carries clipped
    # taps, matching the blocks)
    corr_y = np.zeros((n_rows_pad, 1), np.int32)
    corr_y[: y.n_dst, 0] = 128 * y.coef.astype(np.int64).sum(axis=1)
    n_cols_pad = n_tx * tw
    deno_x = np.ones((1, n_cols_pad), np.int32)
    deno_x[0, : x.n_dst] = np.where(x.deno == 0, 1, x.deno)
    border_x = np.zeros((1, n_cols_pad), np.int32)
    border_x[0, : x.n_dst] = x.is_border.astype(np.int32)
    # s8 X floor-split correction: +128 * (column tap sum) per output,
    # wrapped to i32 (mod-2**32 arithmetic throughout).  Columns past n_dst
    # are masked on store, so 0 is fine.  Every nonzero tap of an output
    # lands inside its window (asserted by _build_blocks_padless), so the
    # block column sums equal the plan row sums.
    corr_x = np.zeros((1, n_cols_pad), np.int32)
    if x_s8:
        # wrap16: only the low work plane is rebased (-128) => +128*colsum;
        # u16-work: both planes rebased => +128*(256+1)*colsum.  Wrapped to
        # i32 (mod-2**32 arithmetic throughout).
        factor = 128 * 257 if x_u8work else 128
        cs = factor * x.coef.astype(np.int64).sum(axis=1)
        corr_x[0, : x.n_dst] = ((cs + 2**31) & (2**32 - 1)) - 2**31

    # Pack the per-tile epilogue operands into ONE row block and ONE col
    # block: six separate (th,1)/(1,tw) streams cost six tiny window DMAs
    # per grid step, measured ~2-4 us/frame on 4K luma (round-5
    # exp_band_shape 'streams' bisection).  The kernel slices the packed
    # lanes/sublanes back out — static sub-vreg slices, near-free.
    y_epi = np.concatenate(
        [deno_y, border_y] + ([corr_y] if s8_y else []), axis=1)
    x_epi = np.concatenate(
        [deno_x, border_x] + ([corr_x] if x_s8 else []), axis=0)
    n_ye, n_xe = y_epi.shape[1], x_epi.shape[0]

    f32 = jnp.float32
    # dot operand dtype: bf16 on real TPU silicon; f32 under interpret
    # (XLA:CPU's emulated bf16 matmul corrupts the heap on odd-width
    # operands; CPU f32 dots are exact for all our 8-bit operand bounds)
    dot_dt = jnp.float32 if interpret else jnp.bfloat16
    n_sc = (n_cy if y_res else 0) + (n_cx_ops if x_res else 0)
    y_exc, x_exc = vy.exceptions, vx.exceptions
    y_int, x_int = vy.interior, vx.interior

    # Border-renormalization divides are the kernel's most expensive VPU op
    # by far (measured: the Y-border integer divide alone cost 0.31 of 0.57
    # ms/frame on 4K lanczos3 when run on every tile).  Border rows/columns
    # only exist in a few tiles, so run the divide under pl.when on exactly
    # those tiles.  The Y pass then stages its result through a VMEM work
    # buffer (values can't cross a pl.when).
    y_btiles = tuple(t for t in range(n_ty)
                     if border_y[t * th:(t + 1) * th].any())
    x_btiles = tuple(t for t in range(n_tx)
                     if border_x[0, t * tw:(t + 1) * tw].any())
    y_cond = (wrap16 and y_has_border
              and 0 < len(y_btiles) < n_ty and len(y_btiles) <= 4)
    x_cond = (x_has_border and 0 < len(x_btiles) < n_tx
              and len(x_btiles) <= 4)
    # Single-column-tile alternative: border columns are the leading /
    # trailing outputs only, so when they fit in 128-wide edge slabs the
    # divide runs on static lane slices instead of the full tile (the
    # tile-conditional x_cond trick degenerates when n_tx == 1).
    bx_cols = np.nonzero(border_x[0])[0]
    # LIBIQO_TPU_XSLAB=0 disables the slab mode for A/B: the slab's
    # 3-segment lane concat materializes an extra full i32 tile, which
    # predates the strength-reduced divide — the full-tile where+divide
    # may now be cheaper.
    _x_slab_env = _os.environ.get("LIBIQO_TPU_XSLAB", "") != "0"
    x_slab = (_x_slab_env
              and x_has_border and not x_cond and n_tx == 1 and tw >= 384
              and not ((bx_cols >= 128) & (bx_cols < tw - 128)).any())
    x_slab_lo = bool((bx_cols < 128).any())
    x_slab_hi = bool((bx_cols >= tw - 128).any())

    # The batch rides as the OUTERMOST grid dimension of one pallas_call
    # (not jax.vmap): a vmapped call remaps the kernel's program_ids per
    # batch element, so the one-time resident-slab DMA below would re-run
    # for EVERY frame in the batch.  One launch = one slab copy, and the
    # whole batch shares one pipeline ramp.
    if grid_order == "xy":
        tile_grid = (n_tx, n_ty)
        g_y, g_x = 2, 1       # program_id dims for the row / col tile index
    else:
        tile_grid = (n_ty, n_tx)
        g_y, g_x = 1, 2

    def _variant(idx_dim, interior, exceptions):
        v = jnp.int32(interior)
        t = pl.program_id(idx_dim)
        for tt, vv in exceptions:
            v = jnp.where(t == tt, jnp.int32(vv), v)
        return v

    def make_kernel(bf):
        # ``bf`` frames share one grid step: per-step fixed costs (window
        # setup, pipeline bookkeeping, resident-variant selects — measured
        # ~0.25 us/step) amortize bf-fold, and the band/out DMAs issue as
        # bf-deep blocks.  The per-frame compute is unchanged (same dots,
        # same VPU work); frames are processed sequentially so VMEM temps
        # are reused.
        def kernel(*refs):
            band_ref = refs[0]
            cy_in = refs[1:1 + n_cy]
            cx_in = refs[1 + n_cy:1 + n_cy + n_cx_ops]
            k0_ = 1 + n_cy + n_cx_ops
            ye_ref, xe_ref, out_ref = refs[k0_:k0_ + 3]
            scratch = refs[k0_ + 3:]

            # unpack the packed epilogue blocks: lane slices of (th, n_ye)
            # and sublane slices of (n_xe, tw) — static sub-vreg selects
            class _Col:
                def __init__(self, j):
                    self._j = j

                def __getitem__(self, _):
                    return ye_ref[...][:, self._j:self._j + 1]

            class _Row:
                def __init__(self, i):
                    self._i = i

                def __getitem__(self, _):
                    return xe_ref[...][self._i:self._i + 1, :]

            dy_ref, by_ref = _Col(0), _Col(1)
            cr_ref = _Col(2) if s8_y else None
            dx_ref, bx_ref = _Row(0), _Row(1)
            cxc_ref = _Row(2) if x_s8 else None

            if n_sc:
                sem = scratch[n_sc]
                first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                         & (pl.program_id(2) == 0))

                @pl.when(first)
                def _():
                    srcs = (tuple(cy_in) if y_res else ()) + \
                           (tuple(cx_in) if x_res else ())
                    # start every copy before waiting on any: the
                    # serialized start/wait form paid one DMA round-trip
                    # latency PER SLAB (~30 slabs on 4K luma) every call,
                    # i.e. every frame in construct-per-frame serving
                    # (round-5 exp_band_shape bisection)
                    cps = [pltpu.make_async_copy(s, d, sem.at[k])
                           for k, (s, d) in
                           enumerate(zip(srcs, scratch[:n_sc]))]
                    for cp in cps:
                        cp.start()
                    for cp in cps:
                        cp.wait()

            if carry is not None:
                # manual band double-buffer (see _Carry): wait this step's
                # fresh-row DMA, VMEM-copy the halo from the other buffer,
                # only THEN issue the next step's DMA into that buffer,
                # compute from buf[t%2] — which holds exactly the windowed
                # band [off(t), off(t)+band).
                bb = scratch[n_sc + (1 if n_sc else 0)]    # (2, bf, bh, bw)
                dsem = scratch[n_sc + (1 if n_sc else 0) + 1]
                t_r = pl.program_id(g_y)
                bg = pl.program_id(0)
                halo, fetch = carry.halo, carry.fetch

                def off_of(tt):
                    # base/step/clamp_hi are all 32-multiples; the hint is
                    # re-asserted after the clamp ops because Mosaic must
                    # prove HBM slice offsets divisible by the sublane
                    # tiling and jnp.minimum/maximum launder the property
                    o = py.base + tt * py.step
                    if py.clamp_hi >= 0:
                        o = jnp.minimum(py.clamp_hi, o)
                    return pl.multiple_of(jnp.maximum(0, o), 32)

                def mk_fetch(tt, p):
                    # fresh rows [off(tt)+halo, off(tt)+band) -> buffer p
                    return pltpu.make_async_copy(
                        band_ref.at[pl.ds(bg * bf, bf),
                                    pl.ds(pl.multiple_of(
                                        off_of(tt) + halo, 32), fetch), :],
                        bb.at[p, :, pl.ds(halo, fetch), :],
                        dsem.at[p])

                @pl.when(t_r == 0)
                def _():
                    seed = pltpu.make_async_copy(
                        band_ref.at[pl.ds(bg * bf, bf),
                                    pl.ds(off_of(0), halo), :],
                        bb.at[0, :, pl.ds(0, halo), :], dsem.at[0])
                    seed.start()
                    seed.wait()
                    cp = mk_fetch(0, 0)
                    cp.start()
                    cp.wait()

                for p in range(2):
                    @pl.when((t_r > 0) & (t_r % 2 == p))
                    def _(p=p):
                        mk_fetch(t_r, p).wait()
                        # halo rows [off(t), off(t)+halo) live in the other
                        # buffer at offset d = off(t) - off(t-1) (<= step
                        # <= fetch, 32-aligned by window construction)
                        d = pl.multiple_of(
                            off_of(t_r) - off_of(t_r - 1), 32)
                        bb[p, :, 0:halo, :] = bb[1 - p, :,
                                                 pl.ds(d, halo), :]

                for p in range(2):
                    @pl.when((t_r + 1 < n_ty) & ((t_r + 1) % 2 == p))
                    def _(p=p):
                        mk_fetch(t_r + 1, p).start()

                t_par = t_r % 2

                class _BufView:    # _frame reads band values per frame
                    def __getitem__(self, fi):
                        return bb[t_par, fi]

                band_view = _BufView()
            else:
                band_view = band_ref

            # frame-invariant coefficient loads, hoisted out of the loop
            if y_res:
                vy_i = _variant(g_y, y_int, y_exc)
                cy_vals = [scratch[p][vy_i] for p in range(n_cy)]
            else:
                cy_vals = [r[...] for r in cy_in]
            if x_res:
                vx_i = _variant(g_x, x_int, x_exc)
                cx_vals = [scratch[n_cy * int(y_res) + j][vx_i]
                           for j in range(n_cx_ops)]
            else:
                cx_vals = [r[...] for r in cx_in]

            for fi in range(bf):
                _frame(fi, band_view, out_ref, cy_vals, cx_vals, dy_ref,
                       by_ref, cr_ref, dx_ref, bx_ref, cxc_ref, scratch)

        return kernel

    def _frame(fi, band_ref, out_ref, cy_vals, cx_vals, dy_ref, by_ref,
               cr_ref, dx_ref, bx_ref, cxc_ref, scratch):
        if s8_y:
            # rebase u8 -> s8 ((v ^ 0x80) reinterpret == v - 128); the
            # -128 bias is undone by cr_ref below, exactly, in int32
            band_bf = (band_ref[fi] ^ jnp.uint8(0x80)).astype(jnp.int8)
        else:
            band_bf = band_ref[fi].astype(jnp.int32).astype(dot_dt)

        def _fill_tile(v):
            # measurement-only: spread a (possibly smaller) value tile over
            # (th, tw) so the band DMA cannot be elided.  Tiling by concat
            # instead of broadcast_to: Mosaic has no 2-D scalar broadcast
            # ("Not implemented: Broadcast in both sublanes and lanes").
            rr = -(-th // v.shape[0])
            if rr > 1:
                v = jnp.concatenate([v] * rr, axis=0)
            rc = -(-tw // v.shape[1])
            if rc > 1:
                v = jnp.concatenate([v] * rc, axis=1)
            return v[:th, :tw]

        if _ablate == "dma":    # band DMA + load only
            out_ref[fi] = _fill_tile(band_ref[fi])
            return

        # ---- Y pass: work = sum_p Cy_p @ band ---------------------------
        if s8_y:
            if y_groups is not None:
                # block-banded s8 Y: each 32-row-multiple output group
                # contracts only its 64-aligned band sub-window (i8 slices
                # at these granules are relayout-free)
                parts = []
                for (o0, ol, k0, kl) in y_groups:
                    parts.append(jnp.dot(
                        cy_vals[0][o0:o0 + ol, k0:k0 + kl],
                        band_bf[k0:k0 + kl, :],
                        preferred_element_type=jnp.int32))
                nume = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                        else parts[0]) + cr_ref[...]
            else:
                nume = jnp.dot(cy_vals[0], band_bf,
                               preferred_element_type=jnp.int32) + cr_ref[...]
        elif y_groups is not None:
            # block-banded: output-row group g contracts only over its
            # band sub-window [k0, k0+kl)
            parts = []
            for (o0, ol, k0, kl) in y_groups:
                acc = None
                for p in range(n_cy):
                    d = jnp.dot(
                        cy_vals[p][o0:o0 + ol, k0:k0 + kl].astype(dot_dt),
                        band_bf[k0:k0 + kl, :],
                        preferred_element_type=f32).astype(jnp.int32)
                    d = d * cy_scale[p]
                    acc = d if acc is None else acc + d
                parts.append(acc)
            nume = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                    else parts[0])
        else:
            nume = None
            for p in range(n_cy):
                d = jnp.dot(cy_vals[p].astype(dot_dt), band_bf,
                            preferred_element_type=f32).astype(jnp.int32)
                d = d * cy_scale[p]
                nume = d if nume is None else nume + d
        if wrap16:
            # The s8 X split reads only the low 16 bits of w ((w * 65536)
            # >> 24 and (w & 255) are invariant under +-k*65536), so for
            # x_s8 the int16 wrap is needed only where the border-renorm
            # divide reads the VALUE — fold it into those paths and keep
            # the main flow on the raw i32 accumulator (saves 3 full-tile
            # VPU ops per non-border tile).
            w = nume if x_s8 else ((nume + 32768) & 65535) - 32768
            if y_has_border and y_cond:
                work_ref = scratch[-1]
                work_ref[...] = w
                gy_id = pl.program_id(g_y)
                hit = gy_id == y_btiles[0]
                for t in y_btiles[1:]:
                    hit = hit | (gy_id == t)

                @pl.when(hit)
                def _():
                    ww = work_ref[...]
                    if x_s8:
                        ww = ((ww + 32768) & 65535) - 32768
                    bval = _exact_trunc_div(ww * y_bias, dy_ref[...],
                                            ww.shape)
                    bval = ((bval + 32768) & 65535) - 32768
                    work_ref[...] = jnp.where(by_ref[...] > 0, bval, ww)

                w = work_ref[...]
            elif y_has_border:
                ww = ((w + 32768) & 65535) - 32768 if x_s8 else w
                bval = _exact_trunc_div(ww * y_bias, dy_ref[...], ww.shape)
                bval = ((bval + 32768) & 65535) - 32768
                w = jnp.where(by_ref[...] > 0, bval, ww)
        else:
            w = nume

        if _ablate == "y":      # Y pass done, X pass cut
            out_ref[fi] = (_fill_tile(w) & 255).astype(jnp.uint8)
            return

        # ---- X pass ------------------------------------------------------
        # (cx_vals: operand index for plane p, group gi is p * n_xg + gi —
        # operands pre-sliced to the group window, plane-major layout)
        if x_s8:
            # 4 exact s8 dots (see scheme comment at build time); i32
            # accumulation wraps mod 2**32 exactly like the reference's C
            # arithmetic, so no floating-point bounds apply.  Work split is
            # FLOOR-wise: a = w >> 8 is always in [-128, 127] for int16 w
            # (the balanced split's hi plane hits +128 for w in
            # [32640, 32767] — reachable via the Y-border renorm wrap —
            # and the int8 cast would wrap it to -128); the rebased low
            # plane's +128 constant is the static cxc_ref correction.
            # u16-work plans (x_u8work) rebase BOTH planes: a = (w>>8) -
            # 128 with the extra 128*256*colsum folded into cxc_ref.
            # wrap16 w may be the RAW i32 accumulator (wrap elided above):
            # (w * 65536) >> 24 sign-extends bit 15 (i32 multiply wraps
            # mod 2**32, == w << 16) so a == wrap16(w) >> 8, always in
            # [-128, 127]; u16-work w is a true [0, 65280] value
            a = (w >> 8) - 128 if x_u8work else (w * 65536) >> 24
            b = (w & 255) - 128
            a8, b8 = a.astype(jnp.int8), b.astype(jnp.int8)
            if _ablate == "split":   # Y + s8 work split, X dots cut
                out_ref[fi] = _fill_tile(a8 ^ b8).astype(jnp.uint8)
                return

            def _s8_group(gi, k0, kl):
                ce = cx_vals[0 * n_xg + gi]
                cf = cx_vals[1 * n_xg + gi]
                ae = jnp.dot(a8[:, k0:k0 + kl], ce,
                             preferred_element_type=jnp.int32)
                af = jnp.dot(a8[:, k0:k0 + kl], cf,
                             preferred_element_type=jnp.int32)
                be = jnp.dot(b8[:, k0:k0 + kl], ce,
                             preferred_element_type=jnp.int32)
                bf_ = jnp.dot(b8[:, k0:k0 + kl], cf,
                              preferred_element_type=jnp.int32)
                return ae * 65536 + (af + be) * 256 + bf_

            # A per-group epilogue with direct out_ref slice writes
            # (eliding the parts concat + the slab segment concat) was
            # built and A/B'd on chip (xpart_ab.log): chroma +23%,
            # upsample +15%, luma noise — running the epilogue on small
            # (th, 128) parts defeats the VPU's full-tile vectorization,
            # and the concats it saved are evidently near-free.  The
            # concat-then-one-epilogue form stays.
            parts = [_s8_group(gi, k0, kl)
                     for gi, (_o0, _ol, k0, kl) in enumerate(xg)]
            sums = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                    else parts[0])
            sums = sums + cxc_ref[...]
        elif x_relaxed:
            # relaxed precision: one rounded-bf16 dot per group (plus a
            # second dot against the exact residual plane when the bf16
            # column-sum repair could not converge — see the build-side
            # comment), f32 accumulation per dot; |sums| < 2**31 so the
            # i32 casts are safe and the shared rounding/border epilogue
            # below applies unchanged
            wb = w.astype(dot_dt)
            parts = []
            for gi, (_o0, _ol, k0, kl) in enumerate(xg):
                acc = None
                for p in range(n_cx):
                    cc = cx_vals[p * n_xg + gi].astype(dot_dt)
                    d = jnp.dot(wb[:, k0:k0 + kl], cc,
                                preferred_element_type=f32
                                ).astype(jnp.int32)
                    acc = d if acc is None else acc + d
                parts.append(acc)
            sums = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                    else parts[0])
        elif x_kara:
            # balanced Karatsuba: w = a*256 + b (b in [-128,127]),
            # sum w*c = 65280*(a@e) - 255*(b@f) + 256*((a+b)@(e+f));
            # every operand is bf16-exact (|a+b| <= 256), every partial sum
            # < 2**24 (asserted at plane build) — 3 dots instead of 4.
            # Block-banded when x_groups: each output-column group
            # contracts only over its band sub-window.
            b = ((w + 128) & 255) - 128
            a = (w - b) >> 8
            ab, bb, gb = (a.astype(dot_dt), b.astype(dot_dt),
                          (a + b).astype(dot_dt))
            parts = []
            for gi, (_o0, _ol, k0, kl) in enumerate(xg):
                ce = cx_vals[0 * n_xg + gi].astype(dot_dt)
                cf = cx_vals[1 * n_xg + gi].astype(dot_dt)
                cg = cx_vals[2 * n_xg + gi].astype(dot_dt)
                d1 = jnp.dot(ab[:, k0:k0 + kl], ce,
                             preferred_element_type=f32).astype(jnp.int32)
                d2 = jnp.dot(bb[:, k0:k0 + kl], cf,
                             preferred_element_type=f32).astype(jnp.int32)
                d3 = jnp.dot(gb[:, k0:k0 + kl], cg,
                             preferred_element_type=f32).astype(jnp.int32)
                parts.append(d1 * 65280 - d2 * 255 + d3 * 256)
            sums = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                    else parts[0])
        else:
            # single exact coef plane: sums = (w_hi@c)*256 + w_lo@c
            w_lo = (w & 255).astype(dot_dt)
            w_hi = (w >> 8).astype(dot_dt)
            parts = []
            for gi, (_o0, _ol, k0, kl) in enumerate(xg):
                s = None
                for p in range(n_cx):
                    cc = cx_vals[p * n_xg + gi].astype(dot_dt)
                    hi = jnp.dot(w_hi[:, k0:k0 + kl], cc,
                                 preferred_element_type=f32).astype(jnp.int32)
                    lo = jnp.dot(w_lo[:, k0:k0 + kl], cc,
                                 preferred_element_type=f32).astype(jnp.int32)
                    part = (hi * 256 + lo) * cx_scale[p]
                    s = part if s is None else s + part
                parts.append(s)
            sums = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                    else parts[0])

        if _ablate == "x":      # full compute, rounding epilogue cut
            out_ref[fi] = (sums & 255).astype(jnp.uint8)
            return

        # ---- rounding epilogue ------------------------------------------
        main = (sums + half) >> out_shift
        if x_slab:
            # border divide on the static 128-wide edge slabs only
            dxv = dx_ref[...]
            bxv = bx_ref[...]

            def seg(a, b, with_div):
                m = main[:, a:b]
                if with_div:
                    bval = _exact_trunc_div(
                        sums[:, a:b] + half, dxv[:, a:b] * y_bias, m.shape)
                    m = jnp.where(bxv[:, a:b] > 0, bval, m)
                return m

            v = jnp.concatenate(
                [seg(0, 128, x_slab_lo), seg(128, tw - 128, False),
                 seg(tw - 128, tw, x_slab_hi)], axis=1)
            v = ((v + 32768) & 65535) - 32768
            out_ref[fi] = jnp.clip(v, 0, 255).astype(jnp.uint8)
            return
        if x_has_border and x_cond:
            vm = ((main + 32768) & 65535) - 32768
            out_ref[fi] = jnp.clip(vm, 0, 255).astype(jnp.uint8)
            gx_id = pl.program_id(g_x)
            hit = gx_id == x_btiles[0]
            for t in x_btiles[1:]:
                hit = hit | (gx_id == t)

            @pl.when(hit)
            def _():
                bval = _exact_trunc_div(sums + half, dx_ref[...] * y_bias,
                                        sums.shape)
                vv = jnp.where(bx_ref[...] > 0, bval, main)
                vv = ((vv + 32768) & 65535) - 32768
                out_ref[fi] = jnp.clip(vv, 0, 255).astype(jnp.uint8)

            return
        if x_has_border:
            bval = _exact_trunc_div(sums + half, dx_ref[...] * y_bias,
                                    sums.shape)
            v = jnp.where(bx_ref[...] > 0, bval, main)
        else:
            v = main
        v = ((v + 32768) & 65535) - 32768
        out_ref[fi] = jnp.clip(v, 0, 255).astype(jnp.uint8)

    E = pallas_core.Element
    y_base, y_step = py.base, py.step
    x_base, x_step = px.base, px.step

    def band_map(*g):
        # must mirror _tile_axis_padless's host-side off[] exactly
        oy = y_base + g[g_y] * y_step
        if py.clamp_hi >= 0:
            oy = jnp.minimum(py.clamp_hi, oy)
        oy = jnp.maximum(0, oy)
        ox = x_base + g[g_x] * x_step
        if px.clamp_hi >= 0:
            ox = jnp.minimum(px.clamp_hi, ox)
        ox = jnp.maximum(0, ox)
        return (pl.multiple_of(oy, 32), pl.multiple_of(ox, 128))

    def _coef_spec(res, ops, i, idx_dim):
        if res:
            return pl.BlockSpec(memory_space=pl.ANY)
        return pl.BlockSpec((None,) + ops[i].shape[1:],
                            lambda *g, _d=idx_dim: (g[_d], 0, 0),
                            memory_space=pltpu.VMEM)

    def make_band_map3(bf):
        def band_map3(*g):
            oy, ox = band_map(*g)
            return (g[0] * bf, oy, ox)
        return band_map3

    def make_specs(bf):
        # Mosaic refuses blocks that MIX Blocked and Element dims ("All
        # block dimensions must be Elements or none of them can be
        # Elements" — interpret mode does not enforce this, so it only
        # fires on real silicon).  The band block therefore makes the
        # leading (frame) dim an Element window too: size bf, element
        # offset g[0]*bf (identical window to a Blocked dim of size bf).
        # Carry mode takes the raw source in HBM (ANY) and fetches rows
        # itself (see the kernel prologue).
        # Measurement knob (scripts/exp_overlap.py): explicitly request
        # double- (2) or single- (1) buffered pipelining for the band
        # window; unset = Mosaic's default for element windows.
        _band_buf = _os.environ.get("LIBIQO_TPU_BAND_BUF", "")
        _band_mode = pl.Buffered(int(_band_buf)) if _band_buf else None
        return [
            (pl.BlockSpec(memory_space=pl.ANY) if carry is not None else
             pl.BlockSpec((E(bf), E(band_h), E(band_w)), make_band_map3(bf),
                          memory_space=pltpu.VMEM,
                          pipeline_mode=_band_mode)),
            *[_coef_spec(y_res, cy_ops, i, g_y) for i in range(n_cy)],
            *[_coef_spec(x_res, cx_ops, i, g_x) for i in range(n_cx_ops)],
            pl.BlockSpec((th, n_ye), lambda *g: (g[g_y], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_xe, tw), lambda *g: (0, g[g_x]),
                         memory_space=pltpu.VMEM),
        ]

    def make_out_spec(bf):
        return pl.BlockSpec((bf, th, tw),
                            lambda *g: (g[0], g[g_y], g[g_x]),
                            memory_space=pltpu.VMEM)

    def make_scratch(bf):
        shapes = []
        if n_sc:
            # dtype per operand: s8 schemes carry int8 planes, bf16 schemes
            # bf16 planes, and the mixed s8 X scheme a bf16 (e+f) plane
            # next to its two int8 planes
            if y_res:
                shapes += [pltpu.VMEM(o.shape, o.dtype) for o in cy_ops]
            if x_res:
                shapes += [pltpu.VMEM(o.shape, o.dtype) for o in cx_ops]
            shapes.append(pltpu.SemaphoreType.DMA((n_sc,)))
        if carry is not None:
            shapes.append(pltpu.VMEM((2, bf, band_h, band_w), jnp.uint8))
            shapes.append(pltpu.SemaphoreType.DMA((2,)))
        if y_cond:
            # work staging for the conditional Y-border epilogue (always
            # last — the kernel reads it as scratch[-1])
            shapes.append(pltpu.VMEM((th, band_w), jnp.int32))
        return shapes

    calls = {}

    def get_call(nb: int):
        if nb not in calls:
            bf = _pick_bf(nb, bf_cap, _bf_force)
            calls[nb] = pl.pallas_call(
                make_kernel(bf), grid=(nb // bf,) + tile_grid,
                out_shape=jax.ShapeDtypeStruct((nb, y.n_dst, x.n_dst),
                                               jnp.uint8),
                in_specs=make_specs(bf), out_specs=make_out_spec(bf),
                interpret=interpret,
                scratch_shapes=make_scratch(bf),
                compiler_params=None if interpret else pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",) * 3,
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )
        return calls[nb]

    pad_h, pad_w = py.pad, px.pad

    def fn(*args):
        *ops, src = args
        if pad_h or pad_w:
            # zero-pad to the window divisor (see _tile_axis_padless);
            # padded positions pair only with zero-clipped taps
            src = jnp.pad(src, [(0, 0)] * (src.ndim - 2)
                          + [(0, pad_h), (0, pad_w)])
        if src.ndim == 2:
            return get_call(1)(src[None], *ops)[0]
        batch_shape = src.shape[:-2]
        flat = src.reshape((-1,) + src.shape[-2:])
        out = get_call(flat.shape[0])(flat, *ops)
        return out.reshape(batch_shape + out.shape[-2:])

    operands = (*cy_ops, *cx_ops, y_epi, x_epi)
    # layout metadata for shard_map callers (parallel/sharding.py):
    # n_cy/n_cx count OPERAND ARRAYS (X planes are pre-sliced per group)
    fn.n_cy, fn.n_cx = n_cy, n_cx_ops
    fn.tiles = (th, tw)
    fn.py, fn.px = py, px
    fn.carry = carry
    return fn, operands


def make_resize_fn(plan: ResizePlan, *, interpret: bool = False,
                   th_target: int = 0, tw_target: int = 0,
                   grid_order: str = "xy", mode: str = "auto",
                   relaxed: bool = False):
    """Build (fn, host_operands): fn(*operands, src) jittable over
    (..., src_h, src_w) u8 arrays (same contract as xla_resize).

    There is exactly one kernel mode (padless); geometries it cannot build
    raise ValueError and callers fall back to ops.xla_resize (api.py and
    parallel/sharding.py catch it).  The legacy padded mode was removed in
    round 3: it lacked the s8 schemes and an on-chip byte gate, and every
    kernel the padless builder rejects is served exactly by the XLA path.
    ``mode`` is kept for compatibility ("auto"/"padless" accepted).

    ``relaxed`` builds the opt-in relaxed-precision variant (~2 LSB max
    error, ~2x faster X pass — the analog of the reference's SIMD float
    paths; see _make_padless_fn).
    """
    if mode not in ("auto", "padless"):
        raise ValueError(f"unknown pallas mode {mode!r} (padded mode was "
                         "removed; use the xla backend instead)")
    built = _cached_build(plan, interpret=interpret, th_target=th_target,
                          tw_target=tw_target, grid_order=grid_order,
                          relaxed=relaxed)
    if built is None:
        raise ValueError("pallas padless build infeasible for this plan "
                         "(exactness scheme or VMEM envelope); use xla_resize")
    return built
