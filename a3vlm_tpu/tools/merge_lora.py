"""Merge a trained LoRA adapter checkpoint into dense base weights and
export a servable consolidated checkpoint.

The reference ships the same capability as delta checkpoints:
``tools/weight_operate.py:17-58`` extracts/applies ``fine-tuned - base``
diffs and ``util/tensor_parallel.py:425-485`` loads [base, delta] lists.
Here the "delta" is a trainable-only train checkpoint from a
``--lora_rank`` (optionally ``--quant``) run: dense trainables (norms,
biases, projectors) overlay the base and the rank-r adapters fold in as
``W + A @ B``.

For quantized serving, prefer ``eval_affordance --adapter_path`` (attaches
the side-path, exact on packed/padded bases); this tool is the dense
export path (e.g. to feed convert_weights_to_hf.py).

Usage:
  python -m a3vlm_tpu.tools.merge_lora \
      --base /ckpts/base --adapter /runs/qlora/epoch_2 \
      --output_dir /ckpts/merged [--llama_type llama] [--mp_size 2]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser("merge LoRA adapters into dense weights")
    p.add_argument("--base", nargs="+", required=True,
                   help="pretrained dir(s) for the dense base "
                   "(consolidated; diff ckpts apply in order)")
    p.add_argument("--adapter", required=True,
                   help="train checkpoint dir (orbax, only_save_trainable)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--llama_type", default=None)
    p.add_argument("--llama_config", nargs="*", default=None)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--with_visual", action="store_true",
                   help="build the full ens5 tree (towers exported too)")
    p.add_argument("--mp_size", type=int, default=1,
                   help="export TP shard count (consolidated.XX-of-YY)")
    p.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"],
                   help="merge precision (fp32 default: the fold W + A@B "
                   "should not round through bf16)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from a3vlm_tpu.meta import MetaModel

    model = MetaModel.from_pretrained(
        args.base,
        llama_type=args.llama_type,
        llama_config=args.llama_config,
        tokenizer_path=args.tokenizer_path,
        with_visual=args.with_visual,
        dtype=jnp.float32 if args.dtype == "fp32" else jnp.bfloat16,
    )
    model.load_adapter_checkpoint(args.adapter, merge=True)

    from a3vlm_tpu.checkpoint.export import (
        ens5_params_to_consolidated,
        export_consolidated,
        split_consolidated_shards,
    )

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if model.llama_type.startswith("llama_ens5"):
        import numpy as np
        import torch

        sd = ens5_params_to_consolidated(model.params, model.cfg)
        shards = split_consolidated_shards(sd, args.mp_size)
        for rank, shard in enumerate(shards):
            torch.save(
                {"model": {
                    k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in shard.items()
                }},
                out_dir / (
                    f"consolidated.{rank:02d}-of-{args.mp_size:02d}"
                    ".model.pth"
                ),
            )
    else:
        export_consolidated(model.params, str(out_dir), args.mp_size)

    # self-describing sidecars so from_pretrained can probe the result
    with open(out_dir / "meta.json", "w") as f:
        json.dump({"llama_type": model.llama_type}, f)
    model.tokenizer.save(str(out_dir))
    print(f"merged checkpoint written to {out_dir}")
    return str(out_dir)


if __name__ == "__main__":
    main()
