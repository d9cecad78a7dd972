"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path).  float64 is enabled so the JAX engine can be compared bit-for-bit
against the numpy host layer (the reference, Total-RD/pymgrid, is float64
numpy end-to-end).
"""
import os
import sys

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.path.dirname(__file__))
