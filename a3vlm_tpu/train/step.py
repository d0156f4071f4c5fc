"""The pjit train step.

Collapses the reference's L0-L1 training machinery — FSDP wrap
(main_finetune.py:241-263), fairscale TP, ShardedGradScaler + ``no_sync``
grad accumulation (util/misc.py:296-321), and the FSDP×TP grad-norm clip
(util/clip_grad.py:58-210) — into one jitted function over the
("data","model") mesh:

- grad accumulation = ``lax.scan`` over microbatches (engine_finetune.py
  :41-77's accum_iter loop), averaging grads.
- the DP/MP two-stage all-reduce of clip_grad.py becomes a single global
  norm: under SPMD the gradient pytree is already logically global.
- LR schedule is a function of the update step (one update == one grad-accum
  boundary, where the reference calls adjust_learning_rate,
  engine_finetune.py:41-42).
- mixed precision: params may be bf16 with fp32 optimizer state; no loss
  scaler needed in bf16 on TPU.
- activation checkpointing per block via ``remat`` (main_finetune.py:268-276
  -> jax.checkpoint in the layer scan).
- frozen parameters (the vision towers, llama_ens5.py:345-352) get zero
  updates via optax.multi_transform and carry no optimizer state.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from a3vlm_tpu.train.losses import next_token_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(
        cls,
        params,
        optimizer: optax.GradientTransformation,
        trainable_mask: Optional[Any] = None,
    ):
        """With ``trainable_mask`` the optimizer state covers ONLY the
        trainable leaves (the partitioned-step path below) — frozen towers
        carry no moments at all, vs. the multi_transform route that still
        walks them with ``set_to_zero``."""
        opt_params = (
            partition_params(params, trainable_mask)[0]
            if trainable_mask is not None
            else params
        )
        return cls(params, optimizer.init(opt_params), jnp.int32(0))


def partition_params(params: Any, mask: Any) -> tuple[Any, Any]:
    """Split a params tree into (trainable, frozen) trees of the same
    structure, with ``None`` at the holes. The trainable tree is the ONLY
    differentiated argument of the partitioned train step, which

    - skips the backward pass through frozen subtrees entirely (the
      monolithic tree + ``optax.set_to_zero`` route still computed tower
      gradients because the grad-norm consumed them), matching the
      reference's clip over requires-grad params only
      (util/clip_grad.py:112-149 collects ``p.grad is not None``), and
    - admits integer leaves (packed ``QuantizedWeight`` bases) in the
      frozen half, which ``jax.grad`` would reject as differentiation
      targets — the QLoRA path (reference main_finetune.py:172-210).
    """
    t = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)
    f = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return t, f


def combine_params(trainable: Any, frozen: Any) -> Any:
    """Inverse of ``partition_params`` (leaves are never None)."""
    return jax.tree_util.tree_map(
        lambda a, b: b if a is None else a,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def make_optimizer(
    learning_rate,  # float or optax schedule (step -> lr)
    *,
    max_grad_norm: float = 8.0,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.95,
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW with global-norm clip (train recipe of a3vlm_train.sh:25-26:
    clip 8, wd 0). Weight decay skips 1-D params (bias / norm weights) — the
    reference's ``add_weight_decay`` grouping (util/misc.py:586-599)."""

    def decay_mask(params):
        return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)

    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            learning_rate=learning_rate,
            b1=b1,
            b2=b2,
            weight_decay=weight_decay,
            mask=decay_mask,
        ),
    )
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            param_labels=jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", trainable_mask
            ),
        )
    return tx


def make_train_step(
    loss_fn: Callable[..., jnp.ndarray],
    optimizer: optax.GradientTransformation,
    accum_steps: int = 1,
    trainable_mask: Optional[Any] = None,
) -> Callable:
    """Build the jittable train step.

    ``loss_fn(params, batch) -> scalar loss``. ``batch`` leaves carry leading
    dims [accum_steps, micro_bs, ...] when accum_steps > 1, else [bs, ...].
    Returns ``step(state, batch) -> (state, metrics)``.

    With ``trainable_mask`` (True = trainable), the step differentiates only
    the trainable partition (see ``partition_params``): frozen subtrees get
    no backward pass, no grad-accum buffers, and no optimizer state, and the
    clipped grad norm covers trainable params only (the reference's
    behavior — clip_grad.py walks params with grads). The optimizer must
    then have been built WITHOUT a multi_transform freeze wrapper, and
    ``TrainState.create`` given the same mask.
    """

    def step(state: TrainState, batch):
        if trainable_mask is not None:
            t_params, f_params = partition_params(
                state.params, trainable_mask
            )
            diff_fn = lambda t, b: loss_fn(combine_params(t, f_params), b)
        else:
            t_params, f_params = state.params, None
            diff_fn = loss_fn

        if accum_steps == 1:
            loss, grads = jax.value_and_grad(diff_fn)(t_params, batch)
        else:

            def body(carry, micro):
                loss_sum, grad_sum = carry
                loss, grads = jax.value_and_grad(diff_fn)(t_params, micro)
                return (
                    loss_sum + loss,
                    jax.tree_util.tree_map(jnp.add, grad_sum, grads),
                ), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), t_params
            )
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body, (jnp.float32(0.0), zeros), batch
            )
            loss = loss_sum / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grad_sum)

        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, t_params)
        t_params = optax.apply_updates(t_params, updates)
        params = (
            combine_params(t_params, f_params)
            if trainable_mask is not None
            else t_params
        )
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def default_llm_loss(args, remat: bool = True, impl: str = "auto"):
    """Loss over {examples, labels[, image_tokens]} batches for the plain
    decoder (the text-only training path)."""
    from a3vlm_tpu.models import llama

    def loss_fn(params, batch):
        image_tokens = batch.get("image_tokens")
        logits = llama.forward_train(
            params, args, batch["examples"], image_tokens=image_tokens,
            remat=remat, impl=impl,
        )
        return next_token_loss(logits, batch["labels"])

    return loss_fn
