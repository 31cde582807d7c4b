"""Environment diagnostics (reference: MinkowskiEngine/diagnostics.py:19-70)."""

from __future__ import annotations

import platform
import sys


def print_diagnostics():
    print("==========System==========")
    print(platform.platform())
    print(sys.version)

    print("==========JAX==========")
    try:
        import jax
        import jaxlib

        print(f"jax=={jax.__version__}")
        print(f"jaxlib=={jaxlib.__version__}")
        print(f"default backend: {jax.default_backend()}")
        print("==========Devices==========")
        for d in jax.devices():
            print(f"  {d} (platform={d.platform})")
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                print("==========Device memory==========")
                for k in ("bytes_in_use", "bytes_limit", "peak_bytes_in_use"):
                    if k in stats:
                        print(f"  {k}: {stats[k]:,}")
        except Exception:
            pass
    except ImportError:
        print("jax not installed")

    print("==========Flax / Optax==========")
    for mod in ("flax", "optax", "orbax.checkpoint"):
        try:
            m = __import__(mod)
            print(f"{mod}=={getattr(m, '__version__', 'unknown')}")
        except ImportError:
            print(f"{mod} not installed")

    print("==========minkowskiengine_tpu==========")
    from . import __version__
    from .cpp import load

    print(f"minkowskiengine_tpu=={__version__}")
    print(f"native host engine: {'loaded' if load() is not None else 'unavailable'}")


def get_device_memory_info():
    """(free, total) bytes of the first accelerator — TPU analogue of
    cudaMemGetInfo (reference: pybind/extern.hpp:832-838)."""
    import jax

    stats = jax.devices()[0].memory_stats() or {}
    total = stats.get("bytes_limit", 0)
    used = stats.get("bytes_in_use", 0)
    return total - used, total


# --- reference backend-info API (pybind/extern.hpp:808-838) ---------------
# This is a TPU framework: there is no CUDA anywhere, and these functions
# say so honestly rather than pretending.


def is_cuda_available() -> bool:
    """Always False — compute runs on TPU/XLA, not CUDA."""
    return False


def cuda_version() -> int:
    """-1: built without CUDA (matches the reference's CPU-only build)."""
    return -1


def cudart_version() -> int:
    """-1: built without CUDA."""
    return -1


def get_gpu_memory_info():
    """(free, total) accelerator memory — aliases the device-agnostic
    :func:`get_device_memory_info` so reference callers keep working."""
    return get_device_memory_info()
