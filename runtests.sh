#!/bin/bash
# Hermetic CPU test run: disable the axon remote-TPU plugin (its sitecustomize
# registration dials the shared tunnel at interpreter startup and can block),
# force the CPU backend with an 8-device virtual mesh.
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
if [ "$#" -eq 0 ]; then
    set -- tests/ -x -q
fi
exec python -m pytest "$@"
