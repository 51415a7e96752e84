#!/bin/bash
# Train the simple_lstm model (reference run/simple_lstm/train.sh contract).
cd "$(dirname "$0")/../.." || exit 1
python -m multimodalreactiongeneration_tpu.train.cli \
    --config configs/simple_lstm.yaml \
    name="${NAME:-cradle-01}" \
    no_cache_build=false \
    clear_cache=false \
    "$@"
