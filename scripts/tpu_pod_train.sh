#!/bin/sh
# Multi-host SPMD training on a TPU pod slice (replaces the reference's
# spotty/AWS scripts). Run THIS SAME command on every host of the slice, e.g.:
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all -- \
#     "cd convasr-tpu && sh scripts/tpu_pod_train.sh --train-data-path ..."
# jax.distributed.initialize() picks up the TPU topology automatically; each
# host feeds its jax.process_index() shard of the batch.
set -e
python - "$@" <<'PYEOF'
import sys
import jax
jax.distributed.initialize()
from convasr_tpu.cli.train import build_parser, main
main(build_parser().parse_args(sys.argv[1:]))
PYEOF
