#!/bin/bash
# Launch training on a TPU VM / pod slice (replaces the reference's
# torchrun Slurm wrappers, slurm/*.slrm).
#
# Single host (one VM, all local chips form the mesh automatically):
#   ./scripts/launch_tpu.sh configs/small-tpu-4.yaml
#
# Multi-host pod slice (run on every worker via gcloud; JAX's TPU
# auto-bootstrap provides the rendezvous — no MASTER_ADDR/torchrun):
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd view-fusion-tpu && ./scripts/launch_tpu.sh configs/small-tpu-8.yaml"
#
# Resume: add "-r -s logs/<run-dir>" in place of "-c <config>".
set -e
CONFIG=${1:-configs/small-tpu-4.yaml}
shift || true
exec python main.py -c "$CONFIG" -g -t "$@"
