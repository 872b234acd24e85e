"""Test configuration: force an 8-virtual-device CPU platform so the
multi-chip sharding paths run without TPU hardware (the reference had no
analogue for distributed tests; see SURVEY.md section 4).

NOTE: the axon sitecustomize imports jax machinery at interpreter start,
so env vars set here are too late for jax.config's env snapshot — the
platform must be forced through jax.config.update AFTER importing jax.
"""

import os

# XLA_FLAGS is read lazily when the CPU client is created — setting it
# here (before any backend is instantiated) still works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: ResNet-50 graphs take minutes to compile on
# the single-core CPU test runner; cache them across test sessions.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/paa_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"expected the 8-virtual-device CPU mesh, got {jax.devices()}"
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full-model compiles)"
    )
