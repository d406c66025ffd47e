"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; tests must
run hermetically on CPU with a multi-device mesh for sharding coverage.
"""

import os

# FORCE cpu: the ambient environment sets JAX_PLATFORMS=axon (the shared
# remote-TPU tunnel); tests must not touch it — concurrent processes on the
# tunnel serialize and can deadlock, and remote compiles are slow.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize hook imports jax at interpreter start and pins
# jax_platforms to "axon,cpu", which silently overrides the env var above.
# Re-pin via the config API (legal until the first backend initializes).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: kernel graphs are large; re-runs hit cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
