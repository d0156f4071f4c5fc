#!/bin/bash
# The released 7B InternLM variant (reference scripts/a3vlm_7B_infer.sh:24-31):
# llama_type internlm_ems5_light, 1024px inputs, MP=1.

PRETRAINED=${PRETRAINED:?set PRETRAINED to the checkpoint dir}
DATASET=${DATASET:?set DATASET to a task JSON}

python -m a3vlm_tpu.eval_affordance \
  --llama_type internlm_ems5_light \
  --pretrained_path "$PRETRAINED" \
  --dataset "$DATASET" \
  --output_dir "${OUTPUT_DIR:-eval_out_7b}" \
  --input_size 1024 \
  --max_seq_len 4096 \
  --max_gen_len 2048 \
  --temperature 0.1 \
  --top_p 0.75 \
  "$@"
