#!/usr/bin/env bash
# Run the tmrnet-tpu container on a TPU VM with the data tree mounted.
# Usage: docker/run.sh <data-dir> [tmrnet-tpu subcommand args...]
set -euo pipefail

DATA_DIR=${1:?usage: run.sh <data-dir> [args...]}
shift

exec docker run --rm -it \
    --privileged \
    -v "${DATA_DIR}":/data \
    -v "$(pwd)":/workspace \
    -w /workspace \
    tmrnet-tpu "$@"
