"""Test configuration: force CPU jax with an 8-device virtual mesh.

The driver validates real-TPU execution separately (bench.py,
__graft_entry__.py); unit tests must be hermetic and exercise multi-device
sharding on virtual CPU devices.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
