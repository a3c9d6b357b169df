"""Measure the host<->device transfer ceiling through the axon tunnel.

The streaming benchmark (cli/benchmark.py --stream) moves 12.4 MB up and
3.1 MB down per 4K YUV frame; whether its ms/frame can improve depends on
whether it is link-bound.  This times:

  upload   — N async jax.device_put calls of distinct frame-sized numpy
             buffers, one final sync (overlapped pipeline ceiling)
  download — N device arrays copy_to_host_async + np.asarray drain
  roundtrip— upload + download interleaved

Usage: python scripts/exp_link_bw.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax

    assert jax.devices()[0].platform == "tpu"
    n = 24
    mb = 12.4416  # one 4K YUV420 frame in MB (Y + U + V)
    bufs = [np.random.default_rng(s).integers(
        0, 256, (3840 * 2160 * 3 // 2,), np.uint8) for s in range(n)]

    # upload ceiling
    dev = [jax.device_put(bufs[0])]  # warm path
    jax.block_until_ready(dev)
    t0 = time.perf_counter()
    dev = [jax.device_put(b) for b in bufs]
    jax.block_until_ready(dev)
    dt = time.perf_counter() - t0
    print(f"upload  : {dt / n * 1e3:7.3f} ms/frame  "
          f"{n * mb / dt / 1e3:6.2f} GB/s")

    # download ceiling
    for d in dev:
        d.copy_to_host_async()
    t0 = time.perf_counter()
    got = [np.asarray(d) for d in dev]
    dt = time.perf_counter() - t0
    assert got[-1][0] == bufs[-1][0]
    print(f"download: {dt / n * 1e3:7.3f} ms/frame  "
          f"{n * mb / dt / 1e3:6.2f} GB/s")

    # interleaved roundtrip (the streaming pipeline's transfer pattern)
    t0 = time.perf_counter()
    outs = []
    for b in bufs:
        d = jax.device_put(b)
        d.copy_to_host_async()
        outs.append(d)
    got = [np.asarray(d) for d in outs]
    dt = time.perf_counter() - t0
    print(f"updown  : {dt / n * 1e3:7.3f} ms/frame  "
          f"{2 * n * mb / dt / 1e3:6.2f} GB/s (both ways)")


if __name__ == "__main__":
    main()
