"""QLoRA path (reference main_finetune.py:172-210): quantized frozen base +
LoRA side-path + the partitioned train step that differentiates only the
trainable leaves."""

import json

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.models import llama
from a3vlm_tpu.ops.quant_matmul import qmat
from a3vlm_tpu.quant import (
    LoraWeight,
    QuantizedWeight,
    freeze_quantized_mask,
    quantize_params,
)
from a3vlm_tpu.train import TrainState, make_optimizer, make_train_step
from a3vlm_tpu.train.lora import (
    attach_lora,
    init_lora_params,
    lora_base_trainable_mask,
)
from a3vlm_tpu.train.losses import next_token_loss
from a3vlm_tpu.train.step import combine_params, partition_params

TINY = ModelArgs(
    dim=32, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=64,
    multiple_of=8, max_seq_len=32,
)


def _batch(bs=2, seq=8, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.integers(1, 60, (bs, seq)).astype(np.int32)
    return {"examples": jnp.asarray(toks), "labels": jnp.asarray(toks)}


# -- LoraWeight dispatch ------------------------------------------------------


def test_lora_weight_sidepath_dense_and_quant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    w = rng.normal(size=(16, 24)).astype(np.float32)
    a = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 24)).astype(np.float32))

    dense = qmat(x, LoraWeight(jnp.asarray(w), a, b))
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(x @ w + (x @ a) @ b), rtol=1e-5
    )

    for bits in (8, 4):
        qtree = quantize_params({"m": {"w": {"weight": w}}}, bits=bits)
        qw = qtree["m"]["w"]["weight"]
        assert isinstance(qw, QuantizedWeight)
        got = qmat(x, LoraWeight(qw, a, b))
        want = qmat(x, qw) + (x @ a) @ b
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_lora_weight_zero_b_is_base_identity():
    """Fresh adapters (b == 0) leave the quantized forward unchanged."""
    params = llama.init_llama_params(jax.random.PRNGKey(0), TINY)
    qparams = quantize_params(params, bits=8)
    lora = init_lora_params(jax.random.PRNGKey(1), qparams, rank=4)
    toks = _batch()["examples"]
    base = llama.forward_train(qparams, TINY, toks)
    out = llama.forward_train(attach_lora(qparams, lora), TINY, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


# -- partitioned train step ---------------------------------------------------


def test_partition_combine_roundtrip():
    params = llama.init_llama_params(jax.random.PRNGKey(2), TINY)
    mask = jax.tree_util.tree_map(lambda _: True, params)
    mask["tok_embeddings"]["weight"] = False
    mask["output"]["weight"] = False
    t, f = partition_params(params, mask)
    back = combine_params(t, f)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params,
        back,
    )
    # trainable tree has exactly the True leaves
    n_true = sum(jax.tree_util.tree_leaves(mask))
    assert len(jax.tree_util.tree_leaves(t)) == n_true


def test_partitioned_step_matches_multi_transform():
    """The partitioned step's trainable updates equal the monolithic
    multi_transform route (clipping disabled so the trainable-only grad
    norm cannot change update magnitudes)."""
    from a3vlm_tpu.train import default_llm_loss

    params = llama.init_llama_params(jax.random.PRNGKey(3), TINY)
    mask = jax.tree_util.tree_map(lambda _: True, params)
    mask["tok_embeddings"]["weight"] = False
    loss_fn = default_llm_loss(TINY, remat=False)
    batch = _batch()

    opt_old = make_optimizer(1e-2, max_grad_norm=1e9, trainable_mask=mask)
    s_old = TrainState.create(params, opt_old)
    s_old, m_old = jax.jit(make_train_step(loss_fn, opt_old))(s_old, batch)

    opt_new = make_optimizer(1e-2, max_grad_norm=1e9)
    s_new = TrainState.create(params, opt_new, trainable_mask=mask)
    step_new = jax.jit(
        make_train_step(loss_fn, opt_new, trainable_mask=mask)
    )
    s_new, m_new = step_new(s_new, batch)

    np.testing.assert_allclose(
        float(m_old["loss"]), float(m_new["loss"]), rtol=1e-6
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        s_old.params,
        s_new.params,
    )
    # frozen leaves carry no optimizer state in the partitioned route
    # (multi_transform's masked inner adamw also skips them, so the counts
    # only need to not regress)
    n_old = len(jax.tree_util.tree_leaves(s_old.opt_state))
    n_new = len(jax.tree_util.tree_leaves(s_new.opt_state))
    assert n_new <= n_old


def test_partitioned_step_grad_accum():
    """accum=2 with a mask: frozen leaves stay bit-identical, trainables
    move, and the loss matches the single-batch step."""
    from a3vlm_tpu.train import default_llm_loss

    params = llama.init_llama_params(jax.random.PRNGKey(4), TINY)
    mask = jax.tree_util.tree_map(lambda _: True, params)
    mask["tok_embeddings"]["weight"] = False
    loss_fn = default_llm_loss(TINY, remat=False)
    opt = make_optimizer(1e-3)

    big = _batch(bs=4)
    micro = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in big.items()}
    s1 = TrainState.create(params, opt, trainable_mask=mask)
    s2 = TrainState.create(params, opt, trainable_mask=mask)
    s1, m1 = jax.jit(
        make_train_step(loss_fn, opt, accum_steps=1, trainable_mask=mask)
    )(s1, big)
    s2, m2 = jax.jit(
        make_train_step(loss_fn, opt, accum_steps=2, trainable_mask=mask)
    )(s2, micro)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(s2.params["tok_embeddings"]["weight"]),
        np.asarray(params["tok_embeddings"]["weight"]),
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        s1.params,
        s2.params,
    )


# -- QLoRA training -----------------------------------------------------------


def _qlora_setup(bits):
    params = llama.init_llama_params(jax.random.PRNGKey(5), TINY)
    qparams = quantize_params(params, bits=bits)
    lora = init_lora_params(jax.random.PRNGKey(6), qparams, rank=4)
    full = {**qparams, "lora": lora}
    mask = lora_base_trainable_mask(qparams)
    mask = freeze_quantized_mask(qparams, mask)
    mask = {**mask, "lora": jax.tree_util.tree_map(lambda _: True, lora)}

    def loss_fn(p, batch):
        lora_p = p["lora"]
        base = {k: v for k, v in p.items() if k != "lora"}
        logits = llama.forward_train(
            attach_lora(base, lora_p), TINY, batch["examples"]
        )
        return next_token_loss(logits, batch["labels"])

    return full, mask, loss_fn


def test_qlora_step_trains_lora_only():
    full, mask, loss_fn = _qlora_setup(bits=8)
    opt = make_optimizer(5e-2)
    state = TrainState.create(full, opt, trainable_mask=mask)
    step = jax.jit(
        make_train_step(loss_fn, opt, trainable_mask=mask), donate_argnums=0
    )
    before_q = np.asarray(
        full["layers"]["attention"]["wq"]["weight"].q
    ).copy()
    before_b = np.asarray(
        full["lora"]["layers"]["attention"]["wq"]["b"]
    ).copy()

    losses = []
    batch = _batch(seed=7)
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # packed base is untouched; adapters moved
    np.testing.assert_array_equal(
        np.asarray(state.params["layers"]["attention"]["wq"]["weight"].q),
        before_q,
    )
    assert not np.allclose(
        np.asarray(state.params["lora"]["layers"]["attention"]["wq"]["b"]),
        before_b,
    )


def test_qlora_int4_grads_flow():
    """int4 packed base: grads exist for every adapter leaf and none are
    NaN (the packed ints never enter jax.grad)."""
    full, mask, loss_fn = _qlora_setup(bits=4)
    t, f = partition_params(full, mask)
    g = jax.grad(lambda tp, b: loss_fn(combine_params(tp, f), b))(
        t, _batch(seed=8)
    )
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # at init b == 0, so d/da == 0 by construction; d/db carries signal
    b_g = g["lora"]["layers"]["attention"]["wq"]["b"]
    assert float(jnp.abs(b_g).max()) > 0


def test_lora_base_trainable_mask_rule():
    params = llama.init_llama_params(jax.random.PRNGKey(9), TINY)
    mask = lora_base_trainable_mask(params)
    assert mask["norm"]["weight"] is True
    assert mask["layers"]["attention_norm"]["weight"] is True
    assert mask["layers"]["attention"]["wq"]["weight"] is False
    assert mask["tok_embeddings"]["weight"] is False
    assert mask["output"]["weight"] is False


# -- adapter checkpoint serving ----------------------------------------------


def _tiny_llama_meta(tiny_tokenizer_dir, tmp_path):
    from a3vlm_tpu.meta import MetaModel

    cfg = tmp_path / "config.json"
    if not cfg.exists():
        cfg.write_text(json.dumps({
            "dim": 32, "n_layers": 2, "n_heads": 4, "n_kv_heads": 4,
            "multiple_of": 8,
        }))
    return MetaModel(
        "llama", llama_config=[str(cfg)],
        tokenizer_path=tiny_tokenizer_dir, max_seq_len=64,
    )


def _randomized_lora(params, rank=4, seed=11):
    lora = init_lora_params(jax.random.PRNGKey(seed), params, rank=rank)
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.normal(scale=0.05, size=x.shape).astype(np.float32)
        ),
        lora,
    )


def test_adapter_checkpoint_serving_roundtrip(tmp_path, tiny_tokenizer_dir):
    """Train-side save (only_save_trainable over a quantized+lora tree) ->
    eval-side load_adapter_checkpoint -> identical forward to the in-memory
    attached model."""
    from a3vlm_tpu.checkpoint.manager import CheckpointManager

    m = _tiny_llama_meta(tiny_tokenizer_dir, tmp_path)
    m.quantize(bits=8)
    lora = _randomized_lora(m.params)
    mask = freeze_quantized_mask(m.params, lora_base_trainable_mask(m.params))
    mask = {**mask, "lora": jax.tree_util.tree_map(lambda _: True, lora)}

    mgr = CheckpointManager(str(tmp_path / "run"))
    ckpt = mgr.save(
        0, params={**m.params, "lora": lora}, trainable_mask=mask,
        llama_type="llama",
    )

    toks = _batch(seed=12)["examples"] % m.true_vocab
    m.load_lora(lora)
    want = float(m.forward(toks, toks))

    m2 = _tiny_llama_meta(tiny_tokenizer_dir, tmp_path)
    m2.quantize(bits=8)
    base_loss = float(m2.forward(toks, toks))
    m2.load_adapter_checkpoint(ckpt)
    got = float(m2.forward(toks, toks))
    assert abs(got - want) < 1e-5
    assert abs(got - base_loss) > 1e-6  # adapters actually change behavior


def test_merge_lora_tool_roundtrip(tmp_path, tiny_tokenizer_dir):
    """merge_lora CLI: base consolidated + adapter ckpt -> merged export
    that from_pretrained serves with the same function as the attached
    adapters."""
    from a3vlm_tpu.checkpoint.export import export_consolidated
    from a3vlm_tpu.checkpoint.manager import CheckpointManager
    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.tools import merge_lora as merge_tool

    m = _tiny_llama_meta(tiny_tokenizer_dir, tmp_path)
    lora = _randomized_lora(m.params)
    mask = lora_base_trainable_mask(m.params)
    mask = {**mask, "lora": jax.tree_util.tree_map(lambda _: True, lora)}

    base_dir = tmp_path / "base"
    base_dir.mkdir()
    export_consolidated(m.params, str(base_dir), 1)
    (base_dir / "meta.json").write_text(json.dumps({"llama_type": "llama"}))
    m.tokenizer.save(str(base_dir))

    mgr = CheckpointManager(str(tmp_path / "run"))
    ckpt = mgr.save(
        0, params={**m.params, "lora": lora}, trainable_mask=mask,
    )

    merged_dir = tmp_path / "merged"
    merge_tool.main([
        "--base", str(base_dir),
        "--adapter", str(ckpt),
        "--output_dir", str(merged_dir),
        "--llama_config", str(tmp_path / "config.json"),
    ])

    m3 = MetaModel.from_pretrained(
        [str(merged_dir)],
        llama_config=[str(tmp_path / "config.json")],
        tokenizer_path=tiny_tokenizer_dir,
        dtype=jnp.float32,
    )
    toks = _batch(seed=13)["examples"] % m.true_vocab
    m.load_lora(lora)
    want = float(m.forward(toks, toks))
    got = float(m3.forward(toks, toks))
    assert abs(got - want) < 1e-4


# -- CLI end-to-end -----------------------------------------------------------


def test_finetune_cli_qlora(tmp_path, tiny_tokenizer_dir, devices8):
    """--quant --lora_rank on the tiny ens5: runs on a 2x2 mesh, trains,
    and the saved checkpoint holds only trainables (adapters included)."""
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
        for i in range(8)
    ]
    (tmp_path / "tasks.json").write_text(json.dumps(records))
    cfg = tmp_path / "data.yaml"
    cfg.write_text(
        f"META:\n - path: {tmp_path / 'tasks.json'}\n   type: image_text\n"
    )
    out_dir = tmp_path / "out"

    state = main_finetune.main([
        "--tokenizer_path", tiny_tokenizer_dir,
        "--data_config", str(cfg),
        "--dialog", "--tiny_random_model",
        "--batch_size", "2", "--epochs", "1", "--warmup_epochs", "0",
        "--lr", "1e-3", "--max_words", "256",
        "--model_parallel_size", "2", "--num_devices", "4",
        "--precision", "bf16",
        "--quant", "--quant_bits", "8", "--lora_rank", "4",
        "--only_save_trainable",
        "--output_dir", str(out_dir), "--print_freq", "1",
    ])
    assert int(state.step) >= 1
    # base stayed packed through training
    wq = state.params["llama"]["layers"]["attention"]["wq"]["weight"]
    assert isinstance(wq, QuantizedWeight)
    # adapters exist and are fp32 masters
    a = state.params["lora"]["layers"]["attention"]["wq"]["a"]
    assert a.dtype == jnp.float32
