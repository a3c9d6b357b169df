"""Benchmark: 4K -> 1080p Lanczos3 YUV420 throughput on one chip.

Reproduces the reference benchmark workload (benchmark/benchmark.cpp:
1019-1031 — resize Y at full size, U and V at half size with px_scale=2,
seeded random planes) and reports input-luma Mpix/s.

Measurement notes for this environment:
* the axon tunnel adds ~30 ms latency per host sync and u8 host reductions
  are slow, so the timed region is an in-jit fori_loop over K batched
  resizes (each iteration's input perturbed by one byte to defeat CSE,
  outputs xor-folded into a tiny slice), synced once by a 1-byte transfer;
* the reported value is the SLOPE between two inner iteration counts
  (each the best of 3 reps, matching the reference's min-of-cycles
  convention): the slope cancels the tunnel-sync RTT, which is an
  environment artifact, not framework cost — `ms_per_frame_with_sync`
  in the JSON keeps the single-sync raw number;
* baseline = the reference built on this host (AVX512, single core,
  6.786 ms/YUV-frame => 1222 Mpix/s luma-in; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import subprocess
import sys
import time

import numpy as np

BASELINE_LUMA_MPIX_S = 1222.0  # reference AVX512 1-core, this host (BASELINE.md)

SRC_W, SRC_H, DST_W, DST_H = 3840, 2160, 1920, 1080

_METRIC = "4K->1080p lanczos3 YUV420 luma-input Mpix/s/chip"


def _emit_unavailable(detail: str) -> None:
    """One parseable JSON line instead of a stack trace when the TPU
    backend cannot be reached (the axon tunnel has two observed failure
    modes: fail-fast errors and a black-hole mode where even `import jax`
    sleeps in a retry loop — see NOTES.md).  rc stays 0 so the driver
    records the line."""
    print(json.dumps({
        "metric": _METRIC, "value": None, "unit": "Mpix/s",
        "vs_baseline": None, "error": "tpu-unavailable",
        "detail": detail[:500],
    }))


def _probe_backend(tries: int = 3, timeout_s: int = 120) -> str | None:
    """Bounded subprocess probe of the jax backend.

    A subprocess (killed on timeout) is mandatory: in the tunnel's
    black-hole failure mode jax's backend init sleeps indefinitely
    in-process, so an in-process try/except would hang this script rather
    than fail it.  Returns the platform string or None."""
    code = "import jax; print(jax.devices()[0].platform)"
    last = ""
    for i in range(tries):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
        except subprocess.TimeoutExpired:
            last = f"probe {i + 1}/{tries}: timeout after {timeout_s}s"
            continue
        if r.returncode == 0 and r.stdout.strip():
            return r.stdout.strip().splitlines()[-1]
        last = (r.stderr.strip().splitlines() or ["unknown error"])[-1]
        time.sleep(min(30, 5 * (i + 1)))
    sys.stderr.write(last + "\n")
    return None


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libiqo_tpu.yuv import YUV420Resizer

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    batch = 16 if on_tpu else 1
    # two-point slope: the single host sync costs ~31 ms through the axon
    # tunnel (measured, scripts/perf_probe.py); timing the loop at two
    # inner counts and taking the slope cancels it exactly.  The count
    # delta (72 iterations x 16 frames x ~0.12 ms) dwarfs RTT jitter.
    inner_lo, inner_hi = (24, 96) if on_tpu else (1, 2)
    reps = 3 if on_tpu else 1

    r = YUV420Resizer("lanczos3", SRC_W, SRC_H, DST_W, DST_H,
                      backend="auto")
    # touch the compiled paths once so backend resolution happens up front
    rng = np.random.default_rng(0)  # seeded planes, as benchmark.cpp:51-59
    y = jax.device_put(rng.integers(0, 256, (batch, SRC_H, SRC_W), np.uint8))
    u = jax.device_put(rng.integers(0, 256, (batch, SRC_H // 2, SRC_W // 2), np.uint8))
    v = jax.device_put(rng.integers(0, 256, (batch, SRC_H // 2, SRC_W // 2), np.uint8))

    luma = r._luma
    chroma = r._chroma
    luma._ensure_compiled(luma.resolved_backend())
    chroma._ensure_compiled(chroma.resolved_backend())

    lfn, lops = luma._jitted, luma._operands
    cfn, cops = chroma._jitted, chroma._operands

    def make_run(inner):
        def run(y, u, v):
            # y and uv are loop-carried and perturbed by one byte per
            # iteration: the in-place dynamic_update_slice is free, and the
            # data dependency keeps EVERY plane's resize inside the loop —
            # without it XLA hoists the loop-invariant calls and the chroma
            # cost silently vanishes from the measurement (observed once
            # the padless kernel landed).
            uv = jnp.concatenate([u, v])  # U+V share a plan: one fused call

            def body(i, carry):
                y, uv, acc = carry
                ib = i.astype(jnp.uint8).reshape(1, 1, 1)
                y = jax.lax.dynamic_update_slice(y, ib, (0, 0, 0))
                uv = jax.lax.dynamic_update_slice(uv, ib, (0, 0, 0))
                oy = lfn(*lops, y)
                ouv = cfn(*cops, uv)
                return y, uv, (acc ^ oy[:, :8, :128] ^ ouv[:batch, :8, :128]
                               ^ ouv[batch:, :8, :128])
            _, _, acc = jax.lax.fori_loop(
                0, inner, body,
                (y, uv, jnp.zeros((batch, 8, 128), jnp.uint8)))
            return acc[0, 0, 0]

        return jax.jit(run)

    best = {}
    for inner in (inner_lo, inner_hi):
        jrun = make_run(inner)
        int(jrun(y, u, v))  # compile + warm
        t = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            int(jrun(y, u, v))
            t = min(t, time.perf_counter() - t0)
        best[inner] = t
    per_frame = ((best[inner_hi] - best[inner_lo])
                 / ((inner_hi - inner_lo) * batch))
    with_sync = best[inner_hi] / (inner_hi * batch)

    luma_mpix_s = SRC_W * SRC_H / per_frame / 1e6
    print(json.dumps({
        "metric": _METRIC,
        "value": round(luma_mpix_s, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(luma_mpix_s / BASELINE_LUMA_MPIX_S, 2),
        "ms_per_frame": round(per_frame * 1e3, 4),
        "ms_per_frame_with_sync": round(with_sync * 1e3, 4),
        "batch": batch,
        "platform": platform,
        "backend": luma.resolved_backend(),
    }))


if __name__ == "__main__":
    if _probe_backend() is None:
        _emit_unavailable("jax backend probe failed (3 x 120 s)")
        sys.exit(0)
    try:
        main()
    except Exception as e:  # tunnel died between probe and run
        msg = f"{type(e).__name__}: {e}"
        if "UNAVAILABLE" in msg or "backend" in msg.lower():
            _emit_unavailable(msg)
            sys.exit(0)
        raise
