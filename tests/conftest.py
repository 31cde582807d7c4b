"""Test configuration: force an 8-virtual-device CPU platform.

Tests run on a simulated 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the reference had no equivalent — its
multi-GPU paths were untested examples only).

NOTE: the axon TPU plugin ignores the JAX_PLATFORMS *env var*; only
``jax.config.update("jax_platforms", ...)`` reliably overrides it, so we set
both (the env var for subprocesses, the config for this process).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: first-contact XLA compiles dominate the
# suite's wall time (a single k=7 kernel-map build compiles ~29 s cold,
# ~1 s warm).  The cache is keyed on program + flags, so the 8-device CPU
# programs never collide with the TPU cache entries in bench runs.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
