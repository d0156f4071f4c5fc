"""Training stack tests: optimizer/step semantics, LoRA, schedules, loader,
and the full finetune CLI end-to-end on the 8-device CPU mesh."""

import json

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.models import llama
from a3vlm_tpu.train import (
    TrainState,
    default_llm_loss,
    make_optimizer,
    make_train_step,
)
from a3vlm_tpu.train.lora import (
    init_lora_params,
    lora_partition_specs,
    merge_lora,
)
from a3vlm_tpu.train.lr_sched import (
    adjust_learning_rate_epoch,
    cosine_lr,
    make_epoch_schedule,
)

TINY = ModelArgs(
    dim=32, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=64,
    multiple_of=8, max_seq_len=32,
)


def _batch(accum=1, bs=2, seq=8):
    rng = np.random.default_rng(0)
    shape = (accum, bs, seq) if accum > 1 else (bs, seq)
    toks = rng.integers(1, 60, shape).astype(np.int32)
    return {"examples": jnp.asarray(toks), "labels": jnp.asarray(toks)}


def test_train_step_reduces_loss():
    params = llama.init_llama_params(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(1e-2)
    step = jax.jit(make_train_step(default_llm_loss(TINY, remat=False), opt))
    state = TrainState.create(params, opt)
    batch = _batch()
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_grad_accum_matches_large_batch():
    """accum=2 over two micro-batches == one batch of both (same grads)."""
    params = llama.init_llama_params(jax.random.PRNGKey(1), TINY)
    opt = make_optimizer(1e-3)
    loss_fn = default_llm_loss(TINY, remat=False)

    big = _batch(bs=4)
    micro = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in big.items()}

    s_big = TrainState.create(params, opt)
    s_acc = TrainState.create(params, opt)
    s_big, m_big = jax.jit(make_train_step(loss_fn, opt, accum_steps=1))(
        s_big, big
    )
    s_acc, m_acc = jax.jit(make_train_step(loss_fn, opt, accum_steps=2))(
        s_acc, micro
    )
    # same per-token loss (all sequences same length / same valid counts)
    np.testing.assert_allclose(
        float(m_big["loss"]), float(m_acc["loss"]), rtol=1e-5
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        s_big.params,
        s_acc.params,
    )


def test_frozen_mask_zero_updates():
    params = llama.init_llama_params(jax.random.PRNGKey(2), TINY)
    mask = jax.tree_util.tree_map(lambda _: True, params)
    mask["tok_embeddings"]["weight"] = False
    opt = make_optimizer(1e-2, trainable_mask=mask)
    step = jax.jit(make_train_step(default_llm_loss(TINY, remat=False), opt))
    state = TrainState.create(params, opt)
    state, _ = step(state, _batch())
    np.testing.assert_array_equal(
        np.asarray(state.params["tok_embeddings"]["weight"]),
        np.asarray(params["tok_embeddings"]["weight"]),
    )
    assert not np.allclose(
        np.asarray(state.params["norm"]["weight"]),
        np.asarray(params["norm"]["weight"]),
    )


def test_lora_zero_init_is_identity_and_trains():
    params = llama.init_llama_params(jax.random.PRNGKey(3), TINY)
    lora = init_lora_params(jax.random.PRNGKey(4), params, rank=4)
    toks = _batch()["examples"]
    base = llama.forward_train(params, TINY, toks)
    merged = merge_lora(params, lora)
    out = llama.forward_train(merged, TINY, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)

    # training only the lora tree moves the logits
    def loss(lora_p):
        m = merge_lora(params, lora_p)
        logits = llama.forward_train(m, TINY, toks)
        from a3vlm_tpu.train.losses import next_token_loss

        return next_token_loss(logits, toks)

    g = jax.grad(loss)(lora)
    norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    assert any(n > 0 for n in norms)
    specs = lora_partition_specs(lora)
    assert (
        jax.tree_util.tree_structure(specs).num_leaves
        == jax.tree_util.tree_structure(lora).num_leaves
    )


def test_epoch_schedule_matches_reference_fn():
    sched = make_epoch_schedule(
        lr=1e-3, min_lr=1e-5, warmup_epochs=0.5, epochs=3,
        updates_per_epoch=10,
    )
    for count in [0, 2, 5, 10, 25]:
        want = adjust_learning_rate_epoch(
            count / 10, lr=1e-3, min_lr=1e-5, warmup_epochs=0.5, epochs=3
        )
        got = float(sched(jnp.int32(count)))
        assert abs(got - want) < 1e-9


def test_cosine_lr_endpoints():
    kw = dict(lr=1.0, min_lr=0.1, warmup_iters=10, total_iters=110)
    assert cosine_lr(0, **kw) == 0.0
    assert cosine_lr(5, **kw) == 0.5
    assert abs(cosine_lr(110, **kw) - 0.1) < 1e-9


def test_finetune_cli_end_to_end(tmp_path, tiny_tokenizer_dir, devices8):
    """Full training CLI on a tiny random ens5 model, 2x4 mesh, dialog data
    with images; then resume from the saved checkpoint."""
    from a3vlm_tpu import main_finetune

    img_path = tmp_path / "img.png"
    Image.new("RGB", (64, 48), (10, 200, 30)).save(img_path)
    records = [
        {
            "image": str(img_path),
            "conversations": [
                {"from": "human", "value": f"Where is door {i}?"},
                {"from": "gpt", "value": f"door {i} here"},
            ],
        }
        for i in range(16)
    ]
    meta = tmp_path / "tasks.json"
    meta.write_text(json.dumps(records))
    cfg = tmp_path / "data.yaml"
    cfg.write_text(f"META:\n - path: {meta}\n   type: image_text\n")
    out_dir = tmp_path / "out"

    argv = [
        "--tokenizer_path", tiny_tokenizer_dir,
        "--data_config", str(cfg),
        "--dialog",
        "--tiny_random_model",
        "--batch_size", "2",
        "--accum_iter", "2",
        "--epochs", "1",
        "--warmup_epochs", "0",
        "--lr", "1e-4",
        "--max_words", "256",
        "--model_parallel_size", "2",
        "--num_devices", "4",
        "--checkpointing",
        "--precision", "fp32",
        "--output_dir", str(out_dir),
        "--print_freq", "1",
    ]
    state = main_finetune.main(argv)
    assert int(state.step) >= 1
    from a3vlm_tpu.checkpoint.manager import find_latest_checkpoint

    latest = find_latest_checkpoint(str(out_dir))
    assert latest is not None and latest.endswith("epoch_0")
    assert (tmp_path / "out" / "log.txt").exists()

    # resume: runs epoch 1
    state2 = main_finetune.main(argv + ["--resume", "auto", "--epochs", "2"])
    assert int(state2.step) >= int(state.step)


def test_mixed_precision_master_weights(tmp_path, tiny_tokenizer_dir, devices8):
    """--precision bf16 keeps fp32 masters for trainables (optimizer
    moments fp32) while frozen towers are bf16."""
    import json as _json

    from PIL import Image as _Image

    from a3vlm_tpu import main_finetune

    img_path = tmp_path / "img.png"
    _Image.new("RGB", (64, 48), (10, 200, 30)).save(img_path)
    records = [
        {"image": str(img_path), "conversations": [
            {"from": "human", "value": f"Where is door {i}?"},
            {"from": "gpt", "value": f"door {i} here"}]}
        for i in range(8)
    ]
    (tmp_path / "tasks.json").write_text(_json.dumps(records))
    (tmp_path / "data.yaml").write_text(
        f"META:\n - path: {tmp_path/'tasks.json'}\n   type: image_text\n"
    )
    state = main_finetune.main([
        "--tokenizer_path", tiny_tokenizer_dir,
        "--data_config", str(tmp_path / "data.yaml"),
        "--dialog", "--tiny_random_model", "--batch_size", "2",
        "--epochs", "1", "--warmup_epochs", "0", "--lr", "1e-4",
        "--max_words", "256", "--precision", "bf16", "--num_devices", "1",
        "--output_dir", str(tmp_path / "out"), "--print_freq", "10",
    ])
    # trainable decoder weights are fp32 masters; frozen clip tower bf16
    assert state.params["llama"]["norm"]["weight"].dtype == jnp.float32
    assert state.params["clip"]["class_embedding"].dtype == jnp.bfloat16
