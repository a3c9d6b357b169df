"""Exactness fuzz for _exact_trunc_div (the strength-reduced border-renorm
division, round 4): must equal C trunc-toward-zero division (jax.lax.div)
for every int32 dividend and every nonzero divisor the plans can produce.

The divide feeds byte-exact output (the reference's border renorm,
ref: src/IQOLanczosResizerImpl_Generic.cpp:216-220,487-489), so this is a
correctness gate, not a numerics tolerance test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libiqo_tpu.ops.pallas_resize import _exact_trunc_div

RNG = np.random.default_rng(17)
I32_MIN, I32_MAX = -2**31, 2**31 - 1


def _check(n: np.ndarray, d: np.ndarray):
    n = n.astype(np.int32).reshape(1, -1)
    d = d.astype(np.int32).reshape(1, -1)
    got = np.asarray(jax.jit(
        lambda a, b: _exact_trunc_div(a, b, a.shape))(n, d))
    want = np.asarray(jax.lax.div(jnp.asarray(n), jnp.asarray(d)))
    bad = got != want
    assert not bad.any(), (
        f"{bad.sum()} mismatches, first: n={n[bad][0]} d={d[bad][0]} "
        f"got={got[bad][0]} want={want[bad][0]}")


def test_random_full_range():
    n = RNG.integers(I32_MIN, I32_MAX + 1, 1 << 16, dtype=np.int64)
    # divisor magnitudes spanning every plan class: y deno (wrapped int16),
    # x deno * y_bias (up to ~2**21 for f32-exact plans, larger for s8)
    mag = np.unique(np.concatenate([
        RNG.integers(1, 1 << 8, 1 << 14),
        RNG.integers(1, 1 << 16, 1 << 14),
        RNG.integers(1, 1 << 22, 1 << 14),
        RNG.integers(1, 1 << 29, 1 << 13),
    ]))
    d = RNG.choice(mag, n.size) * RNG.choice([-1, 1], n.size)
    _check(n, d)


def test_exact_multiples_and_neighbors():
    """The hard cases: n = k*d and k*d +- 1, where trunc flips value —
    a half-ulp reciprocal error shows up exactly here."""
    for _ in range(8):
        d = RNG.integers(2, 1 << 21, 1 << 12, dtype=np.int64) \
            * RNG.choice([-1, 1], 1 << 12)
        k = RNG.integers(-(1 << 20), 1 << 20, d.size, dtype=np.int64)
        base = np.clip(k * d, I32_MIN + 1, I32_MAX - 1)
        for off in (-1, 0, 1):
            _check(base + off, d)


def test_extreme_dividends():
    n = np.array([I32_MIN, I32_MIN + 1, I32_MAX, I32_MAX - 1,
                  0, 1, -1, 2**30, -2**30, 2**19, -2**19] * 9)
    d = np.repeat([1, -1, 2, -2, 3, 64, -64, 65535, 2**21 - 1], 11)
    _check(n, d)


def test_small_divisors_exhaustive_quotient_edges():
    """Every divisor 1..512 against dividends straddling all its multiples
    within a window, both signs."""
    ds = np.arange(1, 513, dtype=np.int64)
    for sign in (1, -1):
        d = np.repeat(ds * sign, 9)
        k = np.tile(np.array([-3, -2, -1, 0, 1, 2, 3, 1000, -1000]), ds.size)
        for off in (-1, 0, 1):
            _check(k * np.abs(d) + off, d)


def test_plan_denominator_population():
    """The divisors that actually occur: every deno value of a set of
    pathological plans (px2 chroma int16 wraps, extreme downscales),
    against adversarial dividends near their multiples."""
    from libiqo_tpu.core.plan import build_plan

    plans = [
        build_plan("lanczos", 1920, 1080, 960, 540, degree=3, px_scale=2),
        build_plan("lanczos", 256, 70, 256, 5, degree=3),
        build_plan("lanczos", 363, 614, 364, 18, degree=4),
        build_plan("lanczos", 1280, 720, 1920, 1080, degree=2),
    ]
    denos = set()
    for p in plans:
        denos.update(int(v) for v in np.unique(p.y.coef.sum(axis=1)))
        denos.update(int(v) for v in np.unique(p.y.deno))
        denos.update(int(v) * 64 for v in np.unique(p.x.deno))
    denos.discard(0)
    d = np.array(sorted(denos), np.int64)
    d = np.repeat(d, 12)
    k = np.tile(np.array([-5000, -1, 0, 1, 5000, 32767] * 2), d.size // 12)
    for off in (-1, 0, 1):
        _check(np.clip(k * np.abs(d) + off, I32_MIN + 1, I32_MAX - 1), d)


def test_real_div_escape_hatch(monkeypatch):
    monkeypatch.setenv("LIBIQO_TPU_REAL_DIV", "1")
    n = RNG.integers(I32_MIN, I32_MAX, 4096, dtype=np.int64)
    d = RNG.integers(1, 1 << 20, 4096, dtype=np.int64)
    _check(n, d)
