"""Device capability queries — the TPU analog of the reference's HWCap
(ref: src/IQOHWCap.hpp:6-57, src/IQOHWCap.cpp:14-66).

Where HWCap probes CPUID leaves to pick a SIMD implementation and counts
OpenMP processors, this module reports the JAX platform, per-device kind
and memory, and the parallel widths that replace thread counts: device
count (the dp axis) and per-device core/grid characteristics.
"""

from __future__ import annotations

import dataclasses
import functools

__all__ = ["DeviceCaps", "caps", "describe"]


@dataclasses.dataclass(frozen=True)
class DeviceCaps:
    platform: str            # "tpu" | "cpu" | "gpu"
    device_kind: str         # e.g. "TPU v5 lite"
    num_devices: int         # dp width (HWCap::getNumberOfProcs analog)
    memory_per_device: int | None   # bytes of HBM/host mem, if reported
    supports_pallas: bool    # fused-kernel path available

    @property
    def is_tpu(self) -> bool:
        return self.platform == "tpu"


@functools.lru_cache(maxsize=1)
def caps() -> DeviceCaps:
    import jax

    devs = jax.devices()
    d0 = devs[0]
    mem = None
    try:
        stats = d0.memory_stats()
        if stats:
            mem = stats.get("bytes_limit")
    except Exception:
        pass
    return DeviceCaps(
        platform=d0.platform,
        device_kind=getattr(d0, "device_kind", d0.platform),
        num_devices=len(devs),
        memory_per_device=mem,
        supports_pallas=d0.platform == "tpu",
    )


def describe() -> str:
    c = caps()
    mem = f"{c.memory_per_device / 2**30:.1f} GiB" if c.memory_per_device else "?"
    return (f"{c.num_devices}x {c.device_kind} ({c.platform}), "
            f"{mem}/device, pallas={'yes' if c.supports_pallas else 'no'}")
