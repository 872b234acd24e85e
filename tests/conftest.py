"""Test configuration: force an 8-virtual-device CPU platform so the
multi-chip sharding paths run without TPU hardware (the reference had no
analogue for distributed tests; see SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
