"""On-TPU compiled-kernel byte-exactness gate.

Compiles the Pallas kernel on the real chip for the 5 graded configs
(BASELINE.md) plus a seeded fuzz set, and byte-compares every output
against the golden NumPy oracle (proven byte-identical to the reference
C++ Generic impls by tests/test_golden_vs_cref.py).  This is the committed,
re-runnable artifact behind the "byte-exact on TPU" claim: interpret-mode
equality (tests/test_pallas.py) does not cover the real Mosaic lowering.

Writes scripts/tpu_check_result.json and exits nonzero on any mismatch.

Usage: python scripts/tpu_check.py [--fuzz N]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

GRADED = [
    ("linear", 640, 480, 320, 240, {}),
    ("area", 1920, 1080, 480, 270, {}),
    ("lanczos", 1280, 720, 1920, 1080, dict(degree=2)),
    ("lanczos", 3840, 2160, 1920, 1080, dict(degree=3)),
    ("lanczos", 1920, 1080, 960, 540, dict(degree=3, px_scale=2)),  # chroma
]

# Stress set: the public contract allows arbitrary degree
# (ref: include/libiqo/LanczosResizer.hpp:26-33), pathological px_scale
# phases, 8K frames, and the s8 envelope's huge tap counts.  These MUST
# build through the compiled kernel — a skip here is a failure (VERDICT
# r2 weak #3: silent skips hid envelope regressions).
STRESS = [
    ("lanczos", 1024, 768, 512, 384, dict(degree=7)),
    ("lanczos", 640, 480, 320, 240, dict(degree=9)),
    ("lanczos", 7680, 4320, 1920, 1080, dict(degree=3)),            # 8K
    ("lanczos", 1920, 1080, 960, 540, dict(degree=9, px_scale=2)),
    ("lanczos", 363, 614, 364, 18, dict(degree=4)),                 # 274 taps
    ("lanczos", 256, 70, 256, 5, dict(degree=3)),   # border-wrap w hi-range
    ("area", 4096, 2160, 1024, 540, {}),            # 4K-wide area 4:1
    ("linear", 97, 61, 291, 183, {}),
    ("area", 8192, 4, 16, 4, {}),        # 512-tap s8x (u16-work s8 X)
    ("area", 16, 4096, 16, 31, {}),      # identity X: single 2**15 bf16 tap
    ("linear", 640, 480, 321, 241, {}),  # odd linear up: messy Q15 s8x taps
]
# NOT in STRESS: area 4096x4096->128x128 (32:1) — its per-tile band blows
# the Pallas VMEM envelope by design; it takes the exact XLA fallback,
# measured in scripts/bench_fallback.py.


def fuzz_cases(n, seed=20260816):
    rng = np.random.default_rng(seed)
    cases = []
    while len(cases) < n:
        alg = rng.choice(["lanczos", "area", "linear"])
        sw, sh = int(rng.integers(16, 1200)), int(rng.integers(16, 900))
        if alg == "area":
            dw = int(rng.integers(4, max(5, sw)))
            dh = int(rng.integers(4, max(5, sh)))
        elif alg == "linear":
            dw = int(rng.integers(max(4, sw // 3 + 1), sw * 3))
            dh = int(rng.integers(max(4, sh // 3 + 1), sh * 3))
        else:
            dw, dh = int(rng.integers(4, sw * 2)), int(rng.integers(4, sh * 2))
        kw = {}
        if alg == "lanczos":
            # full public degree range (ref: LanczosResizer.hpp:26-33)
            kw = dict(degree=int(rng.integers(1, 10)))
        cases.append((alg, sw, sh, dw, dh, kw))
    return cases


def div_sweep():
    """Compiled on-chip gate for _exact_trunc_div (the strength-reduced
    border-renorm division, round 4): its exactness argument leans on
    f32 reciprocal rounding and f32->i32 cast behavior, both of which
    Mosaic may lower differently than the CPU path the unit fuzz
    (tests/test_exact_div.py) runs on — the same interpret-mode trap
    that broke the f32_2dot X scheme (NOTES.md).  Re-runs the hard
    vector classes on the real chip against jax.lax.div."""
    import jax
    import jax.numpy as jnp

    from libiqo_tpu.ops.pallas_resize import _exact_trunc_div

    rng = np.random.default_rng(20260818)
    I32_MIN, I32_MAX = -2**31, 2**31 - 1

    vecs = []
    # full-range random over every divisor magnitude class
    n = rng.integers(I32_MIN, I32_MAX + 1, 1 << 16, dtype=np.int64)
    mag = np.concatenate([rng.integers(1, 1 << 8, 1 << 14),
                          rng.integers(1, 1 << 16, 1 << 14),
                          rng.integers(1, 1 << 22, 1 << 14),
                          rng.integers(1, 1 << 29, 1 << 13)])
    d = rng.choice(mag, n.size) * rng.choice([-1, 1], n.size)
    vecs.append(("random", n, d))
    # exact multiples and +-1 neighbors: where trunc flips value
    d2 = rng.integers(2, 1 << 21, 3 << 14, dtype=np.int64) \
        * rng.choice([-1, 1], 3 << 14)
    k = rng.integers(-(1 << 20), 1 << 20, d2.size, dtype=np.int64)
    base = np.clip(k * d2, I32_MIN + 1, I32_MAX - 1)
    off = np.tile([-1, 0, 1], d2.size // 3)
    vecs.append(("multiples", base + off, d2))
    # extremes
    ne = np.array([I32_MIN, I32_MIN + 1, I32_MAX, I32_MAX - 1,
                   0, 1, -1, 2**30, -2**30] * 9)
    de = np.repeat([1, -1, 2, -2, 3, 64, -64, 65535, 2**21 - 1], 9)
    vecs.append(("extremes", ne, de))

    rows, n_fail = [], 0
    jf = jax.jit(lambda a, b: (_exact_trunc_div(a, b, a.shape),
                               jax.lax.div(a, jnp.broadcast_to(b, a.shape))))
    for name, n, d in vecs:
        n = n.astype(np.int32).reshape(1, -1)
        d = d.astype(np.int32).reshape(1, -1)
        got, want = (np.asarray(v) for v in jf(n, d))
        bad = int((got != want).sum())
        ok = bad == 0
        n_fail += not ok
        rows.append({"case": f"div {name}", "status": "ok" if ok else "FAIL",
                     "n": int(n.size), "mismatches": bad})
        print(f"{'OK  ' if ok else 'FAIL'} div {name}  "
              f"({n.size} vectors, {bad} mismatches)", flush=True)
    return rows, n_fail


def carry_sweep(n_fuzz: int):
    """Compiled on-chip byte gate for the row-halo carry kernel (round 4,
    LIBIQO_TPU_CARRY): manually double-buffered band with fresh-row DMAs
    and VMEM halo copies — a different Mosaic program from the windowed
    mode (async copies with traced offsets, dynamic-offset sublane
    slices).  Graded configs plus fuzz; cases where the carry layout
    doesn't engage are recorded as skips (the windowed mode covers them
    and is gated by the main sweep)."""
    import os

    import jax

    from libiqo_tpu.core.plan import build_plan
    from libiqo_tpu.golden import numpy_ref
    from libiqo_tpu.ops import pallas_resize

    rng = np.random.default_rng(11)
    cases = GRADED + [
        ("lanczos", 512, 520, 256, 130, dict(degree=4)),  # clamped tail
        ("lanczos", 7680, 4320, 1920, 1080, dict(degree=3)),
    ] + fuzz_cases(n_fuzz, seed=20260819)
    rows, n_fail, n_skip = [], 0, 0
    old_env = os.environ.get("LIBIQO_TPU_CARRY")
    try:
        for mode in ("1",):
            os.environ["LIBIQO_TPU_CARRY"] = mode
            for (alg, sw, sh, dw, dh, kw) in cases:
                name = (f"{alg}{kw.get('degree', '')} {sw}x{sh}->{dw}x{dh}"
                        + (" px2" if kw.get("px_scale") else "")
                        + f" [carry{mode}]")
                plan = build_plan(alg, sw, sh, dw, dh, **kw)
                if not pallas_resize.supports_plan(plan):
                    n_skip += 1
                    continue
                try:
                    fn, ops = pallas_resize.make_resize_fn(plan)
                except ValueError:
                    n_skip += 1
                    continue
                if getattr(fn, "carry", None) is None:   # didn't engage
                    required = (alg, sw, sh, dw, dh, kw) in GRADED[2:]
                    # the 3 hot lanczos configs MUST take the carry path
                    if required and alg == "lanczos":
                        rows.append({"case": name,
                                     "status": "FAIL-not-engaged"})
                        n_fail += 1
                    else:
                        n_skip += 1
                    continue
                dops = tuple(jax.device_put(o) for o in ops)
                jf = jax.jit(fn)
                src = rng.integers(0, 256, (sh, sw), np.uint8)
                for attempt in range(2):
                    try:
                        got = np.asarray(jf(*dops, src))
                        break
                    except Exception as e:  # noqa: BLE001
                        if attempt == 1:
                            raise
                        print(f"  retrying {name} after {type(e).__name__}",
                              flush=True)
                        time.sleep(2)
                want = numpy_ref.resize_u8(plan, src)
                err = int(np.abs(got.astype(np.int32)
                                 - want.astype(np.int32)).max())
                # batched: the ring gains a frame dim + per-group reseed
                srcb = rng.integers(0, 256, (4, sh, sw), np.uint8)
                gotb = np.asarray(jf(*dops, srcb))
                errb = max(int(np.abs(gotb[i].astype(np.int32)
                                      - numpy_ref.resize_u8(plan, srcb[i])
                                      .astype(np.int32)).max())
                           for i in range(4))
                ok = err == 0 and errb == 0
                n_fail += not ok
                rows.append({"case": name, "status": "ok" if ok else "FAIL",
                             "max_lsb_err": max(err, errb)})
                print(f"{'OK  ' if ok else 'FAIL'} {name}  "
                      f"(err {err}, batch {errb})", flush=True)
    finally:
        if old_env is None:
            os.environ.pop("LIBIQO_TPU_CARRY", None)
        else:
            os.environ["LIBIQO_TPU_CARRY"] = old_env
    return rows, n_fail, n_skip


def sharded_sweep():
    """Compiled on-chip gate for the row-sharded Pallas kernel (VERDICT r4
    weak #1): ``_make_row_sharded_pallas`` builds a DIFFERENT kernel
    configuration (``force_streamed_y=True`` -> per-tile streamed Y
    BlockSpecs + per-device block-value substitution,
    parallel/sharding.py:197-199) that until round 5 had only ever run in
    interpret mode / on the dryrun's virtual CPU mesh — the exact trap of
    round 4's Blocked/Element toolchain break.  A 1-device (and 1x1 dp x
    sp) mesh forces the same per-device Mosaic program through the real
    toolchain under shard_map partitioning.  What a 1-device mesh cannot
    exercise is the ppermute halo traffic itself (no second chip exists;
    n=1 emits no collective) — that stays covered by the 8-device virtual
    dryrun — but the kernel lowering, the streamed-Y window pipeline, and
    the sharded operand plumbing are the real thing.

    The lanczos rows are REQUIRED (a None build = FAIL): they are the
    OpenMP row-striping analog the sharding module exists for
    (ref: src/IQOLanczosResizerImpl_AVX512.cpp:269-308)."""
    import jax
    from jax.sharding import Mesh

    from libiqo_tpu.core.plan import build_plan
    from libiqo_tpu.golden import numpy_ref
    from libiqo_tpu.parallel import sharding

    rng = np.random.default_rng(5)
    rows, n_fail, n_skip = [], 0, 0
    dev = jax.devices()[:1]
    mesh_row = Mesh(np.array(dev), ("row",))
    mesh_2d = Mesh(np.array(dev).reshape(1, 1), ("data", "row"))

    # (case, required, batched)
    cases = [
        (("lanczos", 1280, 720, 640, 360, dict(degree=3)), True, False),
        (("lanczos", 3840, 2160, 1920, 1080, dict(degree=3)), True, False),
        (("lanczos", 1280, 720, 640, 360, dict(degree=3)), True, True),
        (("area", 1920, 1080, 480, 270, {}), False, False),
        (("linear", 640, 480, 320, 240, {}), False, False),
    ]
    for (alg, sw, sh, dw, dh, kw), required, batched in cases:
        name = (f"sharded {alg}{kw.get('degree', '')} {sw}x{sh}->{dw}x{dh}"
                + (" [dpxsp batch3]" if batched else " [row n=1]"))
        plan = build_plan(alg, sw, sh, dw, dh, **kw)
        if batched:
            built = sharding._make_row_sharded_pallas(
                plan, mesh_2d, "row", interpret=False, data_axis="data")
        else:
            built = sharding._make_row_sharded_pallas(
                plan, mesh_row, "row", interpret=False)
        if built is None:
            # the streamed-Y layout declined (e.g. per-device byte-plane
            # count mismatch); make_row_sharded_fn falls back to the dense
            # body — only the required lanczos rows must take the kernel
            rows.append({"case": name,
                         "status": "FAIL-no-pallas-layout" if required
                         else "skip-no-pallas-layout"})
            n_fail += required
            n_skip += not required
            continue
        fn, ops = built
        if batched:
            src = rng.integers(0, 256, (3, sh, sw), np.uint8)
        else:
            src = rng.integers(0, 256, (sh, sw), np.uint8)
        t0 = time.perf_counter()
        for attempt in range(2):
            try:
                got = np.asarray(fn(*ops, src))
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 1:
                    raise
                print(f"  retrying {name} after {type(e).__name__}",
                      flush=True)
                time.sleep(2)
        dt = time.perf_counter() - t0
        if batched:
            err = max(int(np.abs(got[i].astype(np.int32)
                                 - numpy_ref.resize_u8(plan, src[i])
                                 .astype(np.int32)).max())
                      for i in range(src.shape[0]))
        else:
            want = numpy_ref.resize_u8(plan, src)
            err = int(np.abs(got.astype(np.int32)
                             - want.astype(np.int32)).max())
        ok = err == 0
        n_fail += not ok
        rows.append({"case": name, "status": "ok" if ok else "FAIL",
                     "max_lsb_err": err, "compile_plus_run_s": round(dt, 2)})
        print(f"{'OK  ' if ok else 'FAIL'} {name}  (max LSB err {err}, "
              f"{dt:.0f}s)", flush=True)
    return rows, n_fail, n_skip


def relaxed_sweep(n_fuzz: int):
    """Compiled on-chip gate for the relaxed-precision kernel (VERDICT r3
    #5): the graded configs, a seeded fuzz set (distinct seed from the
    exact sweep, incl. px2 chroma draws), and a FORCED residual-plane case
    (the second-dot Mosaic program otherwise never compiles: the bf16
    column-sum repair converges for every natural geometry).  Contract:
    max error <= MAX_RELAXED_LSB and flat fields byte-match the oracle."""
    import jax
    import numpy as np

    from libiqo_tpu.core.plan import build_plan
    from libiqo_tpu.golden import numpy_ref
    from libiqo_tpu.ops import pallas_resize

    MAX_RELAXED_LSB = 3    # measured ceiling 2.2 (scripts/exp_x_schemes.py)
    rng = np.random.default_rng(7)
    cases = [(c, False) for c in GRADED]
    # px2 chroma fuzz: the pathological int16-wrapped tap phases live here
    px2 = [("lanczos", 482, 270, 240, 134, dict(degree=3, px_scale=2)),
           ("lanczos", 638, 360, 320, 178, dict(degree=2, px_scale=2))]
    cases += [(c, False) for c in px2]
    cases += [(c, False) for c in fuzz_cases(n_fuzz, seed=20260818)]
    # forced residual plane: stub the repair with plain rounding so the
    # build adds the exact residual plane (tests/test_relaxed.py pins the
    # interpret-mode behavior; this compiles the real Mosaic program)
    cases.append((GRADED[3], True))

    rows, n_fail, n_skip = [], 0, 0
    real_repair = pallas_resize._bf16_relaxed_plane
    for (alg, sw, sh, dw, dh, kw), force_resid in cases:
        name = f"{alg}{kw.get('degree', '')} {sw}x{sh}->{dw}x{dh}" + \
            (" px2" if kw.get("px_scale") else "") + \
            (" [resid]" if force_resid else "")
        plan = build_plan(alg, sw, sh, dw, dh, **kw)
        if force_resid:
            import jax.numpy as jnp
            pallas_resize._bf16_relaxed_plane = \
                lambda b: b.astype(np.float32).astype(jnp.bfloat16)
        try:
            fn, ops = pallas_resize.make_resize_fn(plan, relaxed=True)
        except ValueError:
            required = force_resid or (alg, sw, sh, dw, dh, kw) in GRADED
            rows.append({"case": name,
                         "status": "FAIL-infeasible" if required
                         else "skip-infeasible"})
            n_fail += required
            n_skip += not required
            continue
        finally:
            pallas_resize._bf16_relaxed_plane = real_repair
        dops = tuple(jax.device_put(o) for o in ops)
        jf = jax.jit(fn)
        src = rng.integers(0, 256, (sh, sw), np.uint8)
        for attempt in range(2):
            try:
                got = np.asarray(jf(*dops, src))
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 1:
                    raise
                print(f"  retrying {name} after {type(e).__name__}",
                      flush=True)
                time.sleep(2)
        want = numpy_ref.resize_u8(plan, src)
        err = int(np.abs(got.astype(np.int32) - want.astype(np.int32)).max())
        flat_src = np.full((sh, sw), 128, np.uint8)
        flat_ok = bool((np.asarray(jf(*dops, flat_src))
                        == numpy_ref.resize_u8(plan, flat_src)).all())
        ok = err <= MAX_RELAXED_LSB and flat_ok
        n_fail += not ok
        rows.append({"case": name, "status": "ok" if ok else "FAIL",
                     "max_lsb_err": err, "flat128_ok": flat_ok})
        print(f"{'OK  ' if ok else 'FAIL'} relaxed {name}  "
              f"(max LSB err {err}, flat {flat_ok})", flush=True)
    return rows, n_fail, n_skip


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fuzz", type=int, default=20)
    ap.add_argument("--relaxed-fuzz", type=int, default=8)
    ap.add_argument("--carry-fuzz", type=int, default=6)
    ap.add_argument("--no-relaxed", action="store_true")
    ap.add_argument("--no-carry", action="store_true")
    ap.add_argument("--no-sharded", action="store_true")
    ap.add_argument("--only-sharded", action="store_true",
                    help="run just the sharded section (merges into an "
                         "existing result json)")
    ap.add_argument("--mode", default="auto", choices=["auto", "padless"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libiqo_tpu.api import _configure_compilation_cache
    from libiqo_tpu.core.plan import build_plan
    from libiqo_tpu.golden import numpy_ref
    from libiqo_tpu.ops import pallas_resize

    _configure_compilation_cache()
    platform = jax.devices()[0].platform
    if platform != "tpu":
        print(f"ERROR: need a real TPU, got platform={platform}")
        sys.exit(2)

    if args.only_sharded:
        sharded_rows, sf, ss = sharded_sweep()
        import os
        path = "scripts/tpu_check_result.json"
        summary = json.load(open(path)) if os.path.exists(path) else {
            "platform": platform, "mode": args.mode, "n_cases": 0,
            "n_fail": 0, "n_skip": 0, "results": []}
        summary["n_cases"] = (summary["n_cases"]
                              - len(summary.get("sharded", []))
                              + len(sharded_rows))
        prev = summary.get("sharded_fail", 0), summary.get("sharded_skip", 0)
        summary["n_fail"] += sf - prev[0]
        summary["n_skip"] += ss - prev[1]
        summary["sharded"] = sharded_rows
        summary["sharded_fail"], summary["sharded_skip"] = sf, ss
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"\n{len(sharded_rows)} sharded cases: {sf} failures, "
              f"{ss} skipped -> {path}")
        sys.exit(1 if sf else 0)

    rng = np.random.default_rng(0)
    div_rows, div_fail = div_sweep()
    results = []
    n_fail, n_skip = div_fail, 0
    must_build = {id(c) for c in GRADED + STRESS}
    for case in GRADED + STRESS + fuzz_cases(args.fuzz):
        alg, sw, sh, dw, dh, kw = case
        name = f"{alg}{kw.get('degree', '')} {sw}x{sh}->{dw}x{dh}" + \
            (" px2" if kw.get("px_scale") else "")
        required = id(case) in must_build
        plan = build_plan(alg, sw, sh, dw, dh, **kw)
        if not pallas_resize.supports_plan(plan):
            status = "FAIL-unsupported" if required else "skip-unsupported"
            results.append({"case": name, "status": status})
            n_fail += required
            n_skip += not required
            continue
        try:
            fn, ops = pallas_resize.make_resize_fn(plan, mode=args.mode)
        except ValueError:
            status = ("FAIL-infeasible" if required
                      else f"skip-{args.mode}-infeasible")
            results.append({"case": name, "status": status})
            n_fail += required
            n_skip += not required
            continue
        dops = tuple(jax.device_put(o) for o in ops)
        jf = jax.jit(fn)
        src = rng.integers(0, 256, (sh, sw), np.uint8)
        t0 = time.perf_counter()
        # the tunneled compile service occasionally drops the first request;
        # retry once before declaring failure
        for attempt in range(2):
            try:
                out = np.asarray(jf(*dops, src))
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 1:
                    raise
                print(f"  retrying {name} after {type(e).__name__}", flush=True)
                time.sleep(2)
        dt = time.perf_counter() - t0
        gold = numpy_ref.resize_u8(plan, src)
        err = int(np.abs(out.astype(np.int32) - gold.astype(np.int32)).max()) \
            if out.shape == gold.shape else 999
        ok = err == 0
        n_fail += not ok
        results.append({"case": name, "status": "ok" if ok else "FAIL",
                        "max_lsb_err": err, "compile_plus_run_s": round(dt, 2)})
        print(f"{'OK  ' if ok else 'FAIL'} {name}  (max LSB err {err})",
              flush=True)
        # batched kernels take the frame-stacked grid (bf frames per grid
        # step) — a DIFFERENT Mosaic program than the single-frame call;
        # gate it per-frame on a few cheap graded geometries (bf=4 and the
        # bf=2 path; each batch size is its own compile, so keep the list
        # short)
        if case in (GRADED[0], GRADED[2], GRADED[4]):
            for b in (4, 2):
                srcb = rng.integers(0, 256, (b, sh, sw), np.uint8)
                outb = np.asarray(jf(*dops, srcb))
                errb = max(int(np.abs(outb[i].astype(np.int32)
                                      - numpy_ref.resize_u8(plan, srcb[i])
                                      .astype(np.int32)).max())
                           for i in range(b))
                okb = errb == 0
                n_fail += not okb
                results.append({"case": f"{name} [batch{b}]",
                                "status": "ok" if okb else "FAIL",
                                "max_lsb_err": errb})
                print(f"{'OK  ' if okb else 'FAIL'} {name} [batch{b}]  "
                      f"(max LSB err {errb})", flush=True)

    relaxed_rows = []
    if not args.no_relaxed:
        relaxed_rows, rf, rs = relaxed_sweep(args.relaxed_fuzz)
        n_fail += rf
        n_skip += rs

    carry_rows = []
    if not args.no_carry:
        carry_rows, cf, cs = carry_sweep(args.carry_fuzz)
        n_fail += cf
        n_skip += cs

    sharded_rows, sharded_fail, sharded_skip = [], 0, 0
    if not args.no_sharded:
        sharded_rows, sharded_fail, sharded_skip = sharded_sweep()
        n_fail += sharded_fail
        n_skip += sharded_skip

    summary = {
        "platform": platform,
        "mode": args.mode,
        "n_cases": (len(results) + len(relaxed_rows) + len(carry_rows)
                    + len(div_rows) + len(sharded_rows)),
        "n_fail": n_fail,
        "n_skip": n_skip,
        "results": results,
        "relaxed": relaxed_rows,
        "carry": carry_rows,
        "div": div_rows,
        "sharded": sharded_rows,
        "sharded_fail": sharded_fail,
        "sharded_skip": sharded_skip,
    }
    with open("scripts/tpu_check_result.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{len(results)} exact + {len(relaxed_rows)} relaxed + "
          f"{len(carry_rows)} carry + {len(sharded_rows)} sharded cases: "
          f"{n_fail} failures, {n_skip} skipped "
          f"-> scripts/tpu_check_result.json")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
