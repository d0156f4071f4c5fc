#!/bin/bash
# A3VLM inference/eval recipe (the reference's scripts/a3vlm_infer.sh:36-43).
# SPMD: one process drives the mesh; no torchrun / NCCL env tweaks needed.

PRETRAINED=${PRETRAINED:?set PRETRAINED to the checkpoint dir}
DATASET=${DATASET:?set DATASET to a task JSON}
OUTPUT_DIR=${OUTPUT_DIR:-eval_out}

python -m a3vlm_tpu.eval_affordance \
  --llama_type llama_ens5 \
  --pretrained_path "$PRETRAINED" \
  --dataset "$DATASET" \
  --output_dir "$OUTPUT_DIR" \
  --input_size 448 \
  --max_seq_len 4096 \
  --max_gen_len 2048 \
  --temperature 0.1 \
  --top_p 0.75 \
  --batch_size 4 \
  "$@"
