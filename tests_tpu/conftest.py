"""TPU-only kernel tests: run under the real device (axon tunnel), NOT the
hermetic CPU suite. `tests/conftest.py` deliberately forces JAX_PLATFORMS=cpu;
this directory does the opposite — it must see the real backend, because its
whole purpose is catching Pallas/XLA-TPU lowering regressions that the CPU
path (which routes around pallas_call) can never hit.

Run:  timeout 3600 python -m pytest tests_tpu/ -q
Skips itself entirely when the default backend is not a TPU.
"""

import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="requires a real TPU backend")
    for item in items:
        item.add_marker(skip)
