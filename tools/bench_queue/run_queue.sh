#!/bin/bash
# Launch the resumable queue runner WITHOUT claiming the TPU chip.
# (Every python process with PALLAS_AXON_POOL_IPS set claims the single chip
# at interpreter start; the runner must stay off it so queue items can use
# it.) The real pool IP is forwarded via TPU_POOL_IPS_REAL for the runner's
# TPU children.
cd "$(dirname "$0")/../.." || exit 1
# 127.0.0.1 is the GENUINE pool IP in this container (loopback relay to
# the TPU host — see /root/.axon_site/sitecustomize.py), so the fallback
# also covers launches from a CPU-env shell where the variable was
# cleared.  On a differently-tunneled box, export PALLAS_AXON_POOL_IPS
# before launching.
export TPU_POOL_IPS_REAL="${PALLAS_AXON_POOL_IPS:-127.0.0.1}"
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  PYTHONPATH="/root/repo:/root/.axon_site" \
  python tools/bench_queue/run_queue.py "$@"
