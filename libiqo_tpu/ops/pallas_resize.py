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
"""

from __future__ import annotations

import dataclasses
import math

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


@dataclasses.dataclass(frozen=True)
class _Axis:
    """Tiling of one axis: output tile, affine band window, slack."""
    tile: int            # output elements per tile
    n_tiles: int
    step: int            # band window offset step per tile (aligned)
    band: int            # band window length (aligned)
    pad_lo: int
    pad_hi: int
    n_pad: int           # padded source length


def _tile_axis(ax: AxisPlan, tile: int, align: int):
    """Pick the affine band window ``base + t*step`` covering every tile's
    true source range [min start, max start + taps), with any drift between
    the affine step and the true windows folded into the band length.
    Offsets and lengths are ``align``-multiples (Mosaic's divisibility
    prover needs it).  Returns (_Axis, base) with base in padded coords."""
    n_tiles = -(-ax.n_dst // tile)
    start = ax.start.astype(np.int64)
    lo = np.empty(n_tiles, np.int64)
    hi = np.empty(n_tiles, np.int64)
    for t in range(n_tiles):
        d0, d1 = t * tile, min((t + 1) * tile, ax.n_dst)
        lo[t] = start[d0:d1].min()
        hi[t] = start[d0:d1].max() + ax.num_coefs
    # affine step ~ tile * src/dst, rounded down to alignment
    step = (tile * ax.n_src // ax.n_dst) // align * align
    base = int((lo - step * np.arange(n_tiles)).min())
    base = base // align * align                  # align down, extend band
    pad_lo = -(-max(0, -base) // align) * align   # shift base into >= 0
    band = int((hi - (base + step * np.arange(n_tiles))).max())
    band = -(-band // align) * align
    base_padded = base + pad_lo
    n_pad = base_padded + step * (n_tiles - 1) + band
    n_pad = max(n_pad, pad_lo + ax.n_src)
    n_pad = -(-n_pad // align) * align
    pad_hi = n_pad - pad_lo - ax.n_src
    return _Axis(tile, n_tiles, step, band, pad_lo, pad_hi, n_pad), base_padded


def _byte_planes(blocks: np.ndarray):
    """Split int blocks into exact bf16 byte planes; single plane when the
    values already fit 8 bits."""
    if blocks.min() >= 0 and blocks.max() <= 255:
        return ((blocks.astype(np.float32).astype(jnp.bfloat16)), ), (1,)
    hi = (blocks >> 8).astype(np.float32).astype(jnp.bfloat16)
    lo = (blocks & 255).astype(np.float32).astype(jnp.bfloat16)
    return (hi, lo), (256, 1)


def _unclipped_coef(ax: AxisPlan, d: int, i: int) -> int:
    """Tap value with OOB clipping undone (zero padding supplies the zeros
    the reference's tap-dropping would)."""
    if 0 <= int(ax.start[d]) + i < ax.n_src:
        return int(ax.coef[d, i])
    p = d % ax.num_tables
    for dd in range(p, ax.n_dst, ax.num_tables):
        if ax.start[dd] >= 0 and ax.start[dd] + ax.num_coefs <= ax.n_src:
            return int(ax.coef[dd, i])
    return int(ax.coef[d, i])


def _build_blocks(ax: AxisPlan, t_ax: _Axis, base: int, transpose: bool):
    """Dense per-tile coefficient blocks.

    Y (transpose=False): (n_tiles, tile, band) so w = block @ band_rows.
    X (transpose=True):  (n_tiles, band, tile) so out = work @ block.
    """
    n, tile, band = t_ax.n_tiles, t_ax.tile, t_ax.band
    shape = (n, band, tile) if transpose else (n, tile, band)
    blocks = np.zeros(shape, np.int64)
    for t in range(n):
        off = base + t_ax.step * t
        for k in range(tile):
            d = t * tile + k
            if d >= ax.n_dst:
                break
            s0 = int(ax.start[d]) + t_ax.pad_lo - off
            for i in range(ax.num_coefs):
                j = s0 + i
                if 0 <= j < band:
                    v = _unclipped_coef(ax, d, i)
                    if transpose:
                        blocks[t, j, k] += v
                    else:
                        blocks[t, k, j] += v
    return blocks


def _tiles(plan: ResizePlan, th_target: int, tw_target: int):
    if th_target == 0 or tw_target == 0:
        return _auto_tiles(plan)
    th = min(-(-plan.y.n_dst // 32) * 32, -(-th_target // 32) * 32)
    tw = min(-(-plan.x.n_dst // 128) * 128, -(-tw_target // 128) * 128)
    return th, tw


_MXU_RATE = 48e12      # measured effective bf16 MAC*2/s on this chip
_STEP_OVERHEAD = 5e-6  # per grid step
_DMA_RATE = 6e11


def _auto_tiles(plan: ResizePlan):
    """Pick (th, tw) minimizing a simple cost model: MXU flops (band
    over-fetch scales X flops), per-grid-step overhead, and band DMA."""
    y, x = plan.y, plan.x
    n_cy = 1 if (y.coef.min() >= 0 and y.coef.max() <= 255) else 2
    best, best_cost = None, float("inf")
    for th in (128, 256):
        th_eff = min(-(-y.n_dst // 32) * 32, th)
        for tw in (128, 256, 384, 512):
            tw_eff = min(-(-x.n_dst // 128) * 128, tw)
            ty, _ = _tile_axis(y, th_eff, 32)
            tx, _ = _tile_axis(x, tw_eff, 128)
            n_tiles = ty.n_tiles * tx.n_tiles
            rows_pad = ty.n_tiles * th_eff
            cols_pad = tx.n_tiles * tw_eff
            flops = 2 * (rows_pad * tx.n_tiles * tx.band * ty.band * n_cy  # Y
                         + rows_pad * cols_pad * tx.band * 4)              # X
            dma = n_tiles * (ty.band * tx.band             # u8 band
                             + 2 * tx.band * tw_eff * 2)   # X blocks (bf16)
            cost = flops / _MXU_RATE + n_tiles * _STEP_OVERHEAD + dma / _DMA_RATE
            # VMEM feasibility
            est = (ty.band * tx.band + 4 * th_eff * tx.band
                   + 2 * 2 * th_eff * ty.band + 2 * 2 * tx.band * tw_eff
                   + 4 * 4 * th_eff * tw_eff)
            if est > _VMEM_TILE_BUDGET:
                continue
            if cost < best_cost:
                best, best_cost = (th_eff, tw_eff), cost
    return best if best else (128, 128)


def _plan_ok(plan: ResizePlan, th_target: int, tw_target: int) -> bool:
    y, x = plan.y, plan.x
    for ax in (y, x):
        if int(np.abs(ax.coef.astype(np.int64)).sum(axis=1).max()) > _F32_EXACT_COEF_SUM:
            return False
        # byte-plane exactness: rows with > 258 taps can overflow the lo
        # plane's 2**24 sum bound
        if ax.num_coefs > 258:
            return False
    th, tw = _tiles(plan, th_target, tw_target)
    ty, _ = _tile_axis(y, th, 32)
    tx, _ = _tile_axis(x, tw, 128)
    # rough VMEM estimate: band + work + coef blocks + dot temps
    est = (ty.band * tx.band            # u8 band
           + 4 * th * tx.band           # i32 work
           + 2 * 2 * th * ty.band       # Y blocks (<=2 planes)
           + 2 * 2 * tx.band * tw       # X blocks
           + 4 * 4 * th * tw)           # dot temps
    return est <= _VMEM_TILE_BUDGET


def supports_plan(plan: ResizePlan, th_target: int = 0,
                  tw_target: int = 0) -> bool:
    """True when the fused kernel path handles this plan exactly (see
    module docstring); otherwise callers use ops.xla_resize.
    th/tw_target of 0 = auto-tuned tile sizes."""
    return _plan_ok(plan, th_target, tw_target)


def make_resize_fn(plan: ResizePlan, *, interpret: bool = False,
                   th_target: int = 0, tw_target: int = 0,
                   grid_order: str = "xy"):
    """Build (fn, host_operands): fn(*operands, src) jittable over
    (..., src_h, src_w) u8 arrays (same contract as xla_resize).

    ``grid_order="xy"`` iterates column tiles in the outer grid dimension so
    the X coefficient blocks stay VMEM-resident across the row sweep.
    """
    if not _plan_ok(plan, th_target, tw_target):
        raise ValueError("plan not supported by the pallas path; use xla_resize")

    y, x = plan.y, plan.x
    th, tw = _tiles(plan, th_target, tw_target)
    ty_ax, y_base = _tile_axis(y, th, 32)
    tx_ax, x_base = _tile_axis(x, tw, 128)
    n_ty, n_tx = ty_ax.n_tiles, tx_ax.n_tiles
    band_h, band_w = ty_ax.band, tx_ax.band

    cy_planes, cy_scale = _byte_planes(_build_blocks(y, ty_ax, y_base, False))
    cx_planes, cx_scale = _byte_planes(_build_blocks(x, tx_ax, x_base, True))
    n_cy, n_cx = len(cy_planes), len(cx_planes)

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
    n_cols_pad = n_tx * tw
    deno_x = np.ones((1, n_cols_pad), np.int32)
    deno_x[0, : x.n_dst] = np.where(x.deno == 0, 1, x.deno)
    border_x = np.zeros((1, n_cols_pad), np.int32)
    border_x[0, : x.n_dst] = x.is_border.astype(np.int32)

    f32 = jnp.float32

    def kernel(*refs):
        band_ref = refs[0]
        cy_refs = refs[1:1 + n_cy]
        cx_refs = refs[1 + n_cy:1 + n_cy + n_cx]
        dy_ref, by_ref, dx_ref, bx_ref, out_ref = refs[1 + n_cy + n_cx:]

        # u8 -> bf16 must route through i32 (Mosaic has no direct cast)
        band = band_ref[...].astype(jnp.int32).astype(jnp.bfloat16)

        # ---- Y pass: work = Cy @ band -----------------------------------
        nume = None
        for cref, s in zip(cy_refs, cy_scale):
            d = jnp.dot(cref[...], band, preferred_element_type=f32).astype(jnp.int32)
            nume = d * s if nume is None else nume + d * s
        if wrap16:
            w = ((nume + 32768) & 65535) - 32768
            if y_has_border:
                bval = jax.lax.div(w * y_bias,
                                   jnp.broadcast_to(dy_ref[...], w.shape))
                bval = ((bval + 32768) & 65535) - 32768
                w = jnp.where(by_ref[...] > 0, bval, w)
        else:
            w = nume

        # ---- X pass: sums = work @ Cx (byte-plane split of work) --------
        w_lo = (w & 255).astype(jnp.bfloat16)
        w_hi = (w >> 8).astype(jnp.bfloat16)
        sums = None
        for cref, s in zip(cx_refs, cx_scale):
            c = cref[...]
            hi = jnp.dot(w_hi, c, preferred_element_type=f32).astype(jnp.int32)
            lo = jnp.dot(w_lo, c, preferred_element_type=f32).astype(jnp.int32)
            part = hi * 256 + lo
            sums = part * s if sums is None else sums + part * s

        # ---- rounding epilogue ------------------------------------------
        main = (sums + half) >> out_shift
        if x_has_border:
            bval = jax.lax.div(sums + half,
                               jnp.broadcast_to(dx_ref[...] * y_bias, sums.shape))
            v = jnp.where(bx_ref[...] > 0, bval, main)
        else:
            v = main
        v = ((v + 32768) & 65535) - 32768
        out_ref[...] = jnp.clip(v, 0, 255).astype(jnp.uint8)

    E = pallas_core.Element
    if grid_order == "xy":
        grid = (n_tx, n_ty)
        gy = lambda tx, ty: ty
        gx = lambda tx, ty: tx
    else:
        grid = (n_ty, n_tx)
        gy = lambda ty, tx: ty
        gx = lambda ty, tx: tx

    specs = [
        pl.BlockSpec(
            (E(band_h), E(band_w)),
            lambda *g: (pl.multiple_of(y_base + gy(*g) * ty_ax.step, 32),
                        pl.multiple_of(x_base + gx(*g) * tx_ax.step, 128)),
            memory_space=pltpu.VMEM),
        *[pl.BlockSpec((None, th, band_h), lambda *g: (gy(*g), 0, 0),
                       memory_space=pltpu.VMEM)] * n_cy,
        *[pl.BlockSpec((None, band_w, tw), lambda *g: (gx(*g), 0, 0),
                       memory_space=pltpu.VMEM)] * n_cx,
        pl.BlockSpec((th, 1), lambda *g: (gy(*g), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((th, 1), lambda *g: (gy(*g), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tw), lambda *g: (0, gx(*g)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tw), lambda *g: (0, gx(*g)), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((th, tw), lambda *g: (gy(*g), gx(*g)),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel, grid=grid,
        out_shape=jax.ShapeDtypeStruct((y.n_dst, x.n_dst), jnp.uint8),
        in_specs=specs, out_specs=out_spec, interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    def fn(*args):
        *ops, src = args

        def one(im):
            v = jnp.pad(im, ((ty_ax.pad_lo, ty_ax.pad_hi),
                             (tx_ax.pad_lo, tx_ax.pad_hi)))
            return call(v, *ops)

        if src.ndim == 2:
            return one(src)
        batch_shape = src.shape[:-2]
        flat = src.reshape((-1,) + src.shape[-2:])
        out = jax.vmap(one)(flat)
        return out.reshape(batch_shape + out.shape[-2:])

    operands = (*cy_planes, *cx_planes, deno_y, border_y, deno_x, border_x)
    return fn, operands
