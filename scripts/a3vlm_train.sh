#!/bin/bash
# A3VLM fine-tuning recipe (the reference's scripts/a3vlm_train.sh:15-56
# hyperparameters on the TPU-native CLI). One controller process drives the
# whole mesh — no srun/torchrun per-rank launching.

DATA_CONFIG=${DATA_CONFIG:-configs/a3vlm.yaml}
TOKENIZER=${TOKENIZER:?set TOKENIZER to an HF tokenizer dir}
PRETRAINED=${PRETRAINED:-}
OUTPUT_DIR=${OUTPUT_DIR:-output/a3vlm_finetune}

PRETRAINED_ARG=""
if [ -n "$PRETRAINED" ]; then
  PRETRAINED_ARG="--pretrained_path $PRETRAINED"
fi

python -m a3vlm_tpu.main_finetune \
  --llama_type llama_ens5 \
  $PRETRAINED_ARG \
  --tokenizer_path "$TOKENIZER" \
  --data_config "$DATA_CONFIG" \
  --dialog \
  --batch_size 2 \
  --accum_iter 8 \
  --epochs 3 \
  --warmup_epochs 0.03 \
  --lr 2e-5 \
  --min_lr 0 \
  --weight_decay 0 \
  --clip_grad 8 \
  --max_words 2048 \
  --image_transform padded_resize \
  --input_size 448 \
  --model_parallel_size 2 \
  --data_parallel sdp \
  --checkpointing \
  --precision bf16 \
  --cache_ann_on_disk \
  --save_iteration_interval 5000 \
  --output_dir "$OUTPUT_DIR" \
  "$@"
