#!/bin/bash
# End-to-end: quantize + pack an OPT model, then run zero-shot tasks
# (the analogue of the reference's scripts/opt_end_to_end_evaluation.sh).
#
# Usage: scripts/opt_end_to_end_evaluation.sh <model_size> [target_bit]
#   e.g. scripts/opt_end_to_end_evaluation.sh 125m 3.01
# Requires a local HF checkpoint at $MODELS/opt-<size> (or set MODEL_PATH).

set -euo pipefail
cd "$(dirname "$0")/.."

SIZE=${1:-125m}
TARGET_BIT=${2:-3.01}
WBITS=${TARGET_BIT%%.*}
MODEL_PATH=${MODEL_PATH:-${MODELS:-./models}/opt-${SIZE}}
CKPT=${CKPT:-./ckpt/opt-${SIZE}_${TARGET_BIT}bit}

mkdir -p "$(dirname "$CKPT")"

python -m owq_tpu.cli.quantize "$MODEL_PATH" c4 \
    --wbits "$WBITS" --target_bit "$TARGET_BIT" \
    --save "$CKPT" --packing --no-eval

python -m owq_tpu.cli.zeroshot \
    --model owq \
    --model_args "pretrained=$MODEL_PATH,load=$CKPT" \
    --tasks lambada_openai,piqa \
    --output_path "$CKPT/zeroshot.json"
