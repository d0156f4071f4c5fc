"""Checkpoint subsystem tests: orbax save/restore with cross-mesh resharding
(the TP reshard semantics of util/tensor_parallel.py:83-161), latest-ckpt
discovery, 2-stage resume, trainable-only saves, torch-format export
round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a3vlm_tpu.checkpoint import torch_import as ti
from a3vlm_tpu.checkpoint.export import (
    decoder_params_to_consolidated,
    export_consolidated,
    export_hf_llama,
    extract_diff,
)
from a3vlm_tpu.checkpoint.manager import (
    CheckpointManager,
    find_latest_checkpoint,
)
from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.models import llama

TINY = ModelArgs(
    dim=32, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=64,
    multiple_of=8, max_seq_len=32,
)


@pytest.fixture(scope="module")
def params():
    return llama.init_llama_params(jax.random.PRNGKey(0), TINY)


def test_save_restore_roundtrip(tmp_path, params):
    mgr = CheckpointManager(str(tmp_path))
    ckpt = mgr.save(epoch=0, params=params, step=jnp.int32(5))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    restored = mgr.restore_params(ckpt, abstract)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        restored,
    )


def test_restore_onto_tp_sharding(tmp_path, params, devices8):
    """Save unsharded, restore onto a TP=8 mesh — the reshard-on-load that
    replaces the reference's merge/split resharder."""
    from jax.sharding import NamedSharding

    from a3vlm_tpu.parallel import create_mesh

    mgr = CheckpointManager(str(tmp_path))
    ckpt = mgr.save(epoch=0, params=params)

    mesh = create_mesh(model_parallel_size=8)
    specs = llama.llama_partition_specs(TINY)
    abstract = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)
        ),
        params,
        specs,
    )
    restored = mgr.restore_params(ckpt, abstract)
    wq = restored["layers"]["attention"]["wq"]["weight"]
    assert wq.sharding.spec == specs["layers"]["attention"]["wq"]["weight"]
    np.testing.assert_array_equal(
        np.asarray(wq), np.asarray(params["layers"]["attention"]["wq"]["weight"])
    )


def test_latest_checkpoint_discovery(tmp_path, params):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(epoch=0, params=params)
    mgr.save(epoch=1, it=100, params=params)
    latest = find_latest_checkpoint(str(tmp_path))
    assert latest.endswith("epoch_1-iter_100")
    mgr.save(epoch=1, params=params)
    latest = find_latest_checkpoint(str(tmp_path))
    assert latest.endswith("epoch_1")  # full epoch beats in-epoch


def test_two_stage_resume(tmp_path, params):
    import optax

    from a3vlm_tpu.train import TrainState, make_optimizer

    opt = make_optimizer(1e-3)
    state = TrainState.create(params, opt)
    mgr = CheckpointManager(str(tmp_path))
    ckpt = mgr.save(
        epoch=2,
        it=7,
        params=state.params,
        opt_state=state.opt_state,
        step=jnp.int32(42),
        dataset_state={"start_iter": 7, "epoch": 2},
        llama_type="llama",
        llama_config={"dim": TINY.dim},
    )
    abstract_opt = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        state.opt_state,
    )
    resumed = mgr.restore_train_state(ckpt, abstract_opt)
    assert resumed["epoch"] == 2 and resumed["iter"] == 7
    assert resumed["step"] == 42
    assert resumed["dataset_state"]["start_iter"] == 7
    assert "opt_state" in resumed
    # sidecars
    import json
    from pathlib import Path

    assert json.load(open(Path(ckpt) / "meta.json"))["llama_type"] == "llama"


def test_trainable_only_save_and_merge(tmp_path, params):
    mask = jax.tree_util.tree_map(lambda _: True, params)
    mask["tok_embeddings"]["weight"] = False  # pretend frozen
    mgr = CheckpointManager(str(tmp_path))
    ckpt = mgr.save(epoch=0, params=params, trainable_mask=mask)

    base = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), params)
    restored = mgr.restore_params(ckpt, base)
    # frozen leaf falls back to the provided base (zeros)
    assert float(jnp.abs(restored["tok_embeddings"]["weight"]).max()) == 0.0
    np.testing.assert_array_equal(
        np.asarray(restored["norm"]["weight"]),
        np.asarray(params["norm"]["weight"]),
    )


def test_consolidated_export_import_roundtrip(tmp_path, params):
    paths = export_consolidated(params, str(tmp_path / "ckpt"), mp_size=2)
    assert len(paths) == 2
    merged, fmt = ti.load_consolidated_dir(str(tmp_path / "ckpt"))
    assert fmt == "consolidated"
    re_imported = ti.import_llama_consolidated(merged, n_layers=TINY.n_layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        params,
        jax.tree_util.tree_map(jnp.asarray, re_imported),
    )


def test_hf_export_matches_hf_forward(params):
    """Export to HF naming, load into a real HF LlamaForCausalLM, and check
    logits parity — validates the inverse rotary permutation."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=TINY.ffn_hidden_dim,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        rms_norm_eps=1e-5, tie_word_embeddings=False, attention_bias=False,
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    sd = export_hf_llama(params, n_heads=4, n_kv_heads=4)
    hf.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    tokens = np.array([[1, 5, 9, 23, 46]], dtype=np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(
        llama.forward_train(params, TINY, jnp.asarray(tokens, jnp.int32))
    )
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_extract_apply_diff_roundtrip():
    rng = np.random.default_rng(0)
    base = {"a": rng.standard_normal(4).astype(np.float32)}
    ft = {"a": base["a"] + 1.0, "b": rng.standard_normal(2).astype(np.float32)}
    diff = extract_diff(ft, base)
    restored = ti.apply_diff_checkpoint(base, diff)
    np.testing.assert_allclose(restored["a"], ft["a"], atol=1e-6)
    np.testing.assert_array_equal(restored["b"], ft["b"])


def test_async_save_finalizes_and_resumes(tmp_path):
    """wait=False saves return before finalization: _DONE (the latest()
    gate) appears only after wait_until_finished, and the checkpoint then
    restores bit-exact."""
    import jax
    import jax.numpy as jnp

    from a3vlm_tpu.checkpoint.manager import (
        CheckpointManager,
        find_latest_checkpoint,
    )

    params = {"w": jnp.arange(8.0), "b": jnp.ones((4,))}
    mgr = CheckpointManager(str(tmp_path))
    d = mgr.save(0, 5, params=params, step=5, wait=False)
    import os

    # not finalized -> invisible to resume discovery
    assert not os.path.exists(os.path.join(d, "_DONE"))
    assert find_latest_checkpoint(str(tmp_path)) is None
    mgr.wait_until_finished()
    assert os.path.exists(os.path.join(d, "_DONE"))
    assert find_latest_checkpoint(str(tmp_path)) == d
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    restored = mgr.restore_params(d, abstract)
    assert float(jnp.sum(restored["w"])) == float(jnp.sum(params["w"]))

    # a second save finalizes any outstanding one implicitly
    d2 = mgr.save(1, None, params=params, step=9, wait=False)
    d3 = mgr.save(2, None, params=params, step=10)
    assert os.path.exists(os.path.join(d2, "_DONE"))
    assert os.path.exists(os.path.join(d3, "_DONE"))
