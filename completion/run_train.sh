#!/usr/bin/env bash
# Launch completion training: ./run_train.sh <config-name>
# (the reference wraps this in SLURM `srun`; TPU VMs run one process per host
# and jax.distributed.initialize handles rendezvous -- set JAX_COORDINATOR_*)
set -e
cd "$(dirname "$0")"
exec python train.py --config "cfgs/$1.yaml"
