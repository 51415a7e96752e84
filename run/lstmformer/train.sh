#!/bin/bash
# Train the metaformer (reference run/lstmformer/train.sh contract).
cd "$(dirname "$0")/../.." || exit 1
python -m multimodalreactiongeneration_tpu.train.cli \
    --config configs/lstmformer.yaml \
    name="${NAME:-cradle-01}" \
    no_cache_build=false \
    clear_cache=false \
    "$@"
