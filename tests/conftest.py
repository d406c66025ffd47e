"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; tests must
run hermetically on CPU with a multi-device mesh for sharding coverage.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
