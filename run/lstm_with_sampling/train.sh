#!/bin/bash
# Train the lstm_with_sampling model (reference run/lstm_with_sampling/train.sh contract).
cd "$(dirname "$0")/../.." || exit 1
python -m multimodalreactiongeneration_tpu.train.cli \
    --config configs/lstm_with_sampling.yaml \
    name="${NAME:-cradle-01}" \
    no_cache_build=false \
    clear_cache=false \
    "$@"
