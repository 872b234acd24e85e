"""Test configuration: force an 8-virtual-device CPU platform so the
multi-chip sharding paths run without TPU hardware (the reference had no
analogue for distributed tests; see SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: ResNet-50 graphs take minutes to compile on
# the single-core CPU test runner; cache them across test sessions.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/paa_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
