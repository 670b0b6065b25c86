#!/bin/sh
# Export + parity-validate a checkpoint (spec: reference scripts/export*.sh)
set -e
python -m convasr_tpu.cli.export --checkpoint "$1" -o "${2:-model.stablehlo}" --fuse-bn --validate
