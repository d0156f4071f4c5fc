"""Training CLI (reference model/accessory/main_finetune.py).

The reference's per-rank torchrun/SLURM processes, NCCL init, FSDP wrap,
activation-checkpoint wrapper, and grad scaler collapse into: one controller
process, a ("data","model") mesh, sharded params, and a jitted train step
(remat inside the layer scan, bf16 params + f32 optimizer moments).

Flag surface mirrors main_finetune.py:55-138; parallelism flags map as:
  --model_parallel_size  -> mesh "model" axis size
  --data_parallel sdp|fsdp|ddp -> optimizer-state sharding policy (ZeRO-ish)
     (ddp = replicate; sdp/fsdp = shard optimizer state over "data")
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("A3VLM finetune", add_help=False)
    p.add_argument("--llama_type", default="llama_ens5")
    p.add_argument("--llama_config", nargs="*", default=None)
    p.add_argument("--tokenizer_path", required=True)
    p.add_argument("--pretrained_path", nargs="*", default=None)
    p.add_argument("--data_config", required=True)
    p.add_argument("--dialog", action="store_true")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--accum_iter", type=int, default=1)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--warmup_epochs", type=float, default=0.03)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--clip_grad", type=float, default=8.0)
    p.add_argument("--max_words", type=int, default=2048)
    p.add_argument("--image_transform", default="padded_resize")
    p.add_argument("--input_size", type=int, default=448)
    p.add_argument("--model_parallel_size", type=int, default=1)
    p.add_argument("--data_parallel", default="sdp",
                   choices=["sdp", "fsdp", "ddp"])
    p.add_argument("--checkpointing", action="store_true",
                   help="activation checkpointing (remat)")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--save_interval", type=int, default=1)
    p.add_argument("--save_iteration_interval", type=int, default=5000)
    p.add_argument("--only_save_trainable", action="store_true")
    p.add_argument("--cache_ann_on_disk", action="store_true")
    p.add_argument("--cache_tower_features", action="store_true",
                   help="compute the frozen vision towers once per image "
                   "(epoch 0) and replay the features afterwards — the "
                   "towers are ~50%% of the multimodal step "
                   "(train/feature_cache.py); ens5-family only")
    p.add_argument("--feature_cache_dir", default=None,
                   help="spill tower features to disk (default: RAM)")
    p.add_argument("--num_workers", type=int, default=0,
                   help="thread-pool item fetching inside each batch "
                   "(the torch num_workers role; decode/transforms "
                   "release the GIL)")
    p.add_argument("--lora_rank", type=int, default=0,
                   help="train rank-r LoRA adapters on the decoder linears "
                   "(targeted base weights freeze; norms/biases/projectors "
                   "keep training — the reference's peft.py placement)")
    p.add_argument("--quant", action="store_true",
                   help="quantize the (frozen) decoder base to "
                   "--quant_bits before training — the QLoRA recipe "
                   "(reference main_finetune.py:172-210); matmuls run "
                   "through the fused dequant kernels, gradients flow "
                   "through LoRA + dense trainables only")
    p.add_argument("--quant_bits", type=int, default=4, choices=[4, 8])
    p.add_argument("--output_dir", default="./output")
    p.add_argument("--resume", default="", help="'' | auto | ckpt dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--num_devices", type=int, default=None,
                   help="use only the first N devices")
    p.add_argument("--tiny_random_model", action="store_true")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of the first steps "
                   "(the observability the reference lacks, SURVEY.md §5)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (race/NaN detection mode)")
    return p


def build_model(args):
    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.models import ens5 as ens5_mod

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    if args.tiny_random_model:
        cfg = ens5_mod.tiny_ens5_config()
        model = MetaModel(
            llama_type="llama_ens5",
            tokenizer_path=args.tokenizer_path,
            with_visual=True,
            max_seq_len=args.max_words,
            dtype=dtype,
            model_cfg=cfg,
            seed=args.seed,
        )
    elif args.pretrained_path:
        model = MetaModel.from_pretrained(
            args.pretrained_path,
            llama_type=args.llama_type,
            llama_config=args.llama_config,
            tokenizer_path=args.tokenizer_path,
            with_visual=True,
            max_seq_len=args.max_words,
            dtype=dtype,
        )
    else:
        model = MetaModel(
            llama_type=args.llama_type,
            llama_config=args.llama_config,
            tokenizer_path=args.tokenizer_path,
            with_visual=True,
            max_seq_len=args.max_words,
            dtype=dtype,
            seed=args.seed,
        )
    return model


def main(argv=None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from a3vlm_tpu.checkpoint.manager import (
        CheckpointManager,
        find_latest_checkpoint,
    )
    from a3vlm_tpu.data.dialog import FinetuneDialogDataset
    from a3vlm_tpu.data.alpaca import FinetuneDataset
    from a3vlm_tpu.data.loader import DataLoader
    from a3vlm_tpu.data.sampler import FinetuneDistSampler
    from a3vlm_tpu.data.transforms import get_transform
    from a3vlm_tpu.models import ens5 as ens5_mod
    from a3vlm_tpu.parallel import create_mesh, shard_params
    from a3vlm_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_step,
        next_token_loss,
    )
    from a3vlm_tpu.train.engine import train_one_epoch
    from a3vlm_tpu.train.lr_sched import make_epoch_schedule
    from a3vlm_tpu.utils.logging import JsonlLogger, TensorBoardLogger

    args = get_args_parser().parse_args(argv)
    print(f"args: {args}")
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    devices = jax.devices()
    if args.num_devices:
        devices = devices[: args.num_devices]
    mesh = create_mesh(args.model_parallel_size, devices=devices)
    dp_size = mesh.shape["data"]
    print(f"mesh: data={dp_size} model={args.model_parallel_size}")

    model = build_model(args)
    cfg = model.cfg

    if args.quant:
        # the reference gates quantized training the same way: packed
        # bases are frozen, so full-tree checkpoints would waste space on
        # weights the run cannot change (main_finetune.py:172-174)
        assert args.only_save_trainable, (
            "--only_save_trainable is required with --quant"
        )
        model.quantize(
            bits=args.quant_bits,
            tp_align=args.model_parallel_size * 128
            if args.model_parallel_size > 1
            else 0,
        )
        print(f"quantized decoder base to int{args.quant_bits}")

    # -- data ---------------------------------------------------------------
    transform = get_transform(
        args.image_transform,
        cfg.image_size if hasattr(cfg, "image_size") else args.input_size,
    )
    ds_cls = FinetuneDialogDataset if args.dialog else FinetuneDataset
    dataset = ds_cls(
        args.data_config,
        transform=transform,
        max_words=args.max_words,
        image_words=model.get_image_words(),
        tokenizer=model.tokenizer,
        cache_on_disk=args.cache_ann_on_disk,
    )
    # one controller process drives the whole mesh: the sampler runs with a
    # single logical replica and the global batch is sharded over "data"
    global_bs = args.batch_size * dp_size
    sampler = FinetuneDistSampler(
        dataset, num_replicas=1, rank=0, batch_size=global_bs,
        acc_grad=args.accum_iter, seed=args.seed,
    )
    loader = DataLoader(
        dataset, sampler, batch_size=global_bs, accum_steps=args.accum_iter,
        workers=args.num_workers,
        with_indices=args.cache_tower_features,
    )
    updates_per_epoch = max(len(loader), 1)

    # -- optimizer / train step ----------------------------------------------
    is_ens = model.llama_type.startswith("llama_ens5")
    trainable = model.get_trainable_params()
    if args.quant:
        from a3vlm_tpu.quant import freeze_quantized_mask

        trainable = freeze_quantized_mask(model.params, trainable)
    compute_dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    if args.precision == "bf16":
        # fp32 master weights for trainables, bf16 frozen towers; the
        # forward casts to bf16 (reference recipe: bf16 autocast over fp32
        # trainables, tensor_type.py:60-66 + engine_finetune.py:44-48)
        from a3vlm_tpu.utils.tensor_type import mixed_precision_policy

        model.params = mixed_precision_policy(
            model.params, trainable, compute_dtype=jnp.bfloat16
        )

    if args.cache_tower_features:
        assert is_ens, "--cache_tower_features is ens5-family only"
        from a3vlm_tpu.train.feature_cache import (
            FeatureCachingLoader,
            TowerFeatureCache,
        )

        feat_cache = TowerFeatureCache(
            model.params, cfg, cache_dir=args.feature_cache_dir
        )
        depth_cache = None
        if args.llama_type == "llama_ens5_2images":
            # the depth stream runs the same frozen towers — cache it in
            # its own namespace (indices collide with the rgb stream's)
            depth_cache = TowerFeatureCache(
                model.params, cfg,
                cache_dir=os.path.join(args.feature_cache_dir, "depth")
                if args.feature_cache_dir else None,
            )
        loader = FeatureCachingLoader(loader, feat_cache,
                                      depth_cache=depth_cache)
        print("tower-feature cache on: towers run once per image, "
              "later epochs are tower-free")

    lora = None
    if args.lora_rank > 0:
        from a3vlm_tpu.train.lora import (
            attach_lora,
            attach_lora_into_model,
            init_lora_params,
            lora_base_trainable_mask,
            lora_partition_specs,
        )

        decoder = model.params["llama"] if is_ens else model.params
        lora = init_lora_params(
            jax.random.PRNGKey(args.seed + 17), decoder,
            rank=args.lora_rank,
        )
        # decoder trainability collapses to norms/biases (peft rule);
        # non-decoder trainables (projectors, image tags) are untouched
        base_mask = lora_base_trainable_mask(decoder)
        if is_ens:
            trainable = {**trainable, "llama": base_mask}
        else:
            trainable = base_mask
        trainable = {
            **trainable,
            "lora": jax.tree_util.tree_map(lambda _: True, lora),
        }
        print(f"lora rank {args.lora_rank} on the decoder linears")

    full_params = (
        {**model.params, "lora": lora} if lora is not None else model.params
    )

    schedule = make_epoch_schedule(
        lr=args.lr, min_lr=args.min_lr, warmup_epochs=args.warmup_epochs,
        epochs=args.epochs, updates_per_epoch=updates_per_epoch,
    )
    # freezing rides the partitioned train step (frozen subtrees get no
    # backward pass and no optimizer state), not a multi_transform wrapper
    optimizer = make_optimizer(
        schedule,
        max_grad_norm=args.clip_grad,
        weight_decay=args.weight_decay,
    )

    remat = args.checkpointing

    def loss_fn(params, batch):
        if compute_dtype != jnp.float32:
            from a3vlm_tpu.quant import QuantizedWeight

            # bf16 compute over fp32 masters (autocast); packed bases and
            # their f32 group scales pass through untouched
            params = jax.tree_util.tree_map(
                lambda p: p
                if isinstance(p, QuantizedWeight)
                or not (hasattr(p, "dtype") and p.dtype == jnp.float32)
                else p.astype(compute_dtype),
                params,
                is_leaf=lambda x: isinstance(x, QuantizedWeight),
            )
        if "lora" in params:
            lora_p = params["lora"]
            params = {k: v for k, v in params.items() if k != "lora"}
            params = (
                attach_lora_into_model(params, lora_p)
                if is_ens
                else attach_lora(params, lora_p)
            )
        if is_ens:
            imf = None
            if "image_feat_q" in batch:
                imf = {"q": batch["image_feat_q"],
                       "ens": batch["image_feat_ens"]}
            kwargs = {}
            if args.llama_type == "llama_ens5_2images":
                # the 2-images forward needs BOTH streams (raw or cached)
                kwargs["depth_image"] = batch.get("depth_image")
                if "depth_feat_q" in batch:
                    kwargs["depth_features"] = {
                        "q": batch["depth_feat_q"],
                        "ens": batch["depth_feat_ens"],
                    }
            logits = model._mod.forward(
                params, cfg, batch["examples"], image=batch.get("image"),
                image_features=imf, remat=remat, **kwargs,
            )
        else:
            from a3vlm_tpu.models import llama as llama_mod

            logits = llama_mod.forward_train(
                params, cfg, batch["examples"], remat=remat
            )
        return next_token_loss(
            logits, batch["labels"], vocab_size=model.true_vocab
        )

    train_step = jax.jit(
        make_train_step(
            loss_fn, optimizer, accum_steps=args.accum_iter,
            trainable_mask=trainable,
        ),
        donate_argnums=0,
    )

    # -- placement ------------------------------------------------------------
    from a3vlm_tpu.models import llama as llama_mod

    specs = (
        ens5_mod.ens5_partition_specs(cfg, model.params)
        if is_ens
        else llama_mod.llama_partition_specs(cfg)
    )
    if args.quant:
        # also needed at mp=1: the spec tree must mirror the packed
        # QuantizedWeight nodes structurally for shard_params
        from a3vlm_tpu.quant import quantized_partition_specs

        if is_ens:
            specs["llama"] = quantized_partition_specs(
                specs["llama"], model.params["llama"],
                args.model_parallel_size,
            )
        else:
            specs = quantized_partition_specs(
                specs, model.params, args.model_parallel_size
            )
    if lora is not None:
        specs = {**specs, "lora": lora_partition_specs(lora)}
    params = shard_params(full_params, mesh, specs)

    ckpt_mgr = CheckpointManager(args.output_dir)
    tb = TensorBoardLogger(str(Path(args.output_dir) / "tb"))
    jsonl = JsonlLogger(args.output_dir)

    start_epoch, start_iter = 0, 0
    resume_dir = None
    if args.resume == "auto":
        resume_dir = find_latest_checkpoint(args.output_dir)
    elif args.resume:
        resume_dir = args.resume

    with mesh:
        state = jax.jit(
            lambda p: TrainState.create(p, optimizer, trainable)
        )(params)
        if resume_dir:
            print(f"resuming from {resume_dir}")
            state = state._replace(
                params=ckpt_mgr.restore_params(resume_dir, state.params)
            )
            extra = ckpt_mgr.restore_train_state(
                resume_dir,
                jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(
                        np.shape(x), np.asarray(x).dtype
                    ),
                    state.opt_state,
                ),
            )
            if "opt_state" in extra:
                state = state._replace(opt_state=extra["opt_state"])
            start_epoch = extra.get("epoch", 0)
            start_iter = extra.get("iter", 0)
            if start_iter == 0:
                start_epoch += 1

        def shard_batch(batch):
            def put(x):
                spec = (
                    P(None, "data") if x.ndim >= 2 and args.accum_iter > 1
                    else P("data")
                )
                ndim_prefix = 2 if args.accum_iter > 1 else 1
                full = P(*spec, *([None] * (x.ndim - ndim_prefix)))
                return jax.device_put(x, NamedSharding(mesh, full))

            return {k: put(v) for k, v in batch.items()}

        def save_fn(state, epoch, it=None):
            ckpt_mgr.save(
                epoch,
                it,
                params=state.params,
                opt_state=state.opt_state,
                step=state.step,
                dataset_state={"epoch": epoch, "start_iter": it or 0},
                tokenizer=model.tokenizer,
                llama_type=model.llama_type,
                llama_config={"max_seq_len": args.max_words},
                trainable_mask=trainable if args.only_save_trainable else None,
                # in-epoch saves are ASYNC: training continues while orbax
                # writes; finalized by the next save / end-of-train barrier
                wait=it is None,
            )

        def _run_epochs(state):
            for epoch in range(start_epoch, args.epochs):
                sampler.set_epoch(epoch, start_iter if epoch == start_epoch else 0)

                def stepper(st, batch):
                    return train_step(st, shard_batch(batch))

                state, stats = train_one_epoch(
                    stepper,
                    state,
                    loader,
                    epoch,
                    lr=args.lr,
                    min_lr=args.min_lr,
                    warmup_epochs=args.warmup_epochs,
                    epochs=args.epochs,
                    print_freq=args.print_freq,
                    tb_logger=tb,
                    save_fn=save_fn,
                    save_iteration_interval=args.save_iteration_interval,
                )
                if (epoch + 1) % args.save_interval == 0 or (
                    epoch + 1 == args.epochs
                ):
                    save_fn(state, epoch)
                jsonl.write({"epoch": epoch, **stats})
            return state

        try:
            state = _run_epochs(state)
        finally:
            # async in-epoch saves: finalize even on crash/interrupt so a
            # fully-written checkpoint gets its _DONE marker for resume
            ckpt_mgr.wait_until_finished()
    if args.profile_dir:
        jax.profiler.stop_trace()
    print("training done")
    return state


if __name__ == "__main__":
    main()
