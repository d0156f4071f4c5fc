"""Reference-format checkpoint ingestion driven from the TORCH side.

These tests deliberately do NOT use our exporter to author the files: the
state dicts are hand-built with the reference's fairscale module names and
torch [out, in] layouts, TP-split by an in-test reimplementation of the
reference's split rules (util/tensor_parallel.py:34-38 —
ColumnParallelLinear weight dim 0, RowParallelLinear weight dim 1,
ParallelEmbedding weight dim 1), and saved as real
``consolidated.XX-of-YY.model.pth`` files (meta.py:88-222 save format).
That breaks the exporter-feeds-importer self-consistency loop the
round-2 review flagged: if our importer and exporter shared a wrong
transpose or a wrong shard axis, these fixtures would catch it.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from a3vlm_tpu.checkpoint.torch_import import (  # noqa: E402
    import_llama_consolidated,
    load_consolidated_dir,
)
from a3vlm_tpu.config import ModelArgs  # noqa: E402
from a3vlm_tpu.models import llama  # noqa: E402


# --- in-test reimplementation of the reference's TP shard rules ------------
# (util/tensor_parallel.py:34-38). Keyed by fairscale module class of each
# decoder weight (llama.py upstream + llama_ens5.py:63-90):
#   wq/wk/wv/w1/w3/output : ColumnParallelLinear -> torch weight dim 0
#   wo/w2                 : RowParallelLinear    -> torch weight dim 1
#   tok_embeddings        : ParallelEmbedding    -> torch weight dim 1
_REF_SHARD_DIM = {
    "wq": 0, "wk": 0, "wv": 0, "w1": 0, "w3": 0, "output": 0,
    "wo": 1, "w2": 1, "tok_embeddings": 1,
}


def _ref_split(full: dict, mp: int) -> list[dict]:
    """Split a full state dict the way the reference saves per-rank shards
    (util/tensor_parallel.py:133-161): sharded weights chunked along their
    module's dim, everything else replicated."""
    shards = [dict() for _ in range(mp)]
    for key, val in full.items():
        leaf = key.split(".")[-2] if key.endswith(".weight") else None
        dim = _REF_SHARD_DIM.get(leaf)
        if dim is None:
            pieces = [val] * mp
        else:
            pieces = torch.chunk(val, mp, dim=dim)
        for r in range(mp):
            shards[r][key] = pieces[r].clone()
    return shards


def _torch_llama_sd(args: ModelArgs, seed: int = 0) -> dict:
    """Hand-built fairscale-named decoder state dict, torch [out, in]
    layouts (upstream llama.py Transformer naming, under no prefix)."""
    g = torch.Generator().manual_seed(seed)
    D, V = args.dim, args.vocab_size
    H, Hkv, hd = args.n_heads, args.kv_heads, args.head_dim
    F = args.ffn_hidden_dim

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "tok_embeddings.weight": t(V, D),
        "norm.weight": torch.ones(D),
        "output.weight": t(V, D),
    }
    for i in range(args.n_layers):
        p = f"layers.{i}"
        sd[f"{p}.attention.wq.weight"] = t(H * hd, D)
        sd[f"{p}.attention.wk.weight"] = t(Hkv * hd, D)
        sd[f"{p}.attention.wv.weight"] = t(Hkv * hd, D)
        sd[f"{p}.attention.wo.weight"] = t(D, H * hd)
        sd[f"{p}.feed_forward.w1.weight"] = t(F, D)
        sd[f"{p}.feed_forward.w2.weight"] = t(D, F)
        sd[f"{p}.feed_forward.w3.weight"] = t(F, D)
        sd[f"{p}.attention_norm.weight"] = torch.ones(D)
        sd[f"{p}.ffn_norm.weight"] = torch.ones(D)
    return sd


def _args():
    return ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=128, multiple_of=16, max_seq_len=64)


def test_reference_tp_shards_roundtrip_exact(tmp_path):
    """2-rank reference-style shards -> load_consolidated_dir merge ->
    import: every imported leaf equals the hand-authored full tensor."""
    args = _args()
    full = _torch_llama_sd(args)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    for r, shard in enumerate(_ref_split(full, 2)):
        torch.save(
            {"model": shard}, ckpt / f"consolidated.{r:02d}-of-02.model.pth"
        )

    merged, fmt = load_consolidated_dir(str(ckpt))
    assert fmt == "consolidated"
    params = import_llama_consolidated(merged, n_layers=args.n_layers,
                                       prefix="")

    # linear weights import transposed ([out,in] torch -> [in,out] ours);
    # the embedding keeps [vocab, dim]
    np.testing.assert_array_equal(
        params["tok_embeddings"]["weight"],
        full["tok_embeddings.weight"].numpy(),
    )
    np.testing.assert_array_equal(
        params["output"]["weight"], full["output.weight"].numpy().T
    )
    for i in range(args.n_layers):
        for mod, names in (("attention", ("wq", "wk", "wv", "wo")),
                           ("feed_forward", ("w1", "w2", "w3"))):
            for w in names:
                np.testing.assert_array_equal(
                    params["layers"][mod][w]["weight"][i],
                    full[f"layers.{i}.{mod}.{w}.weight"].numpy().T,
                    err_msg=f"layers.{i}.{mod}.{w}",
                )

    # and the imported tree actually runs
    p = jax.tree_util.tree_map(jnp.asarray, params)
    logits = llama.forward_train(
        p, args, jnp.ones((2, 8), jnp.int32)
    )
    assert logits.shape == (2, 8, args.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_reference_shard_rules_differ_from_replication(tmp_path):
    """Sanity: the sharded fixture is a REAL split — loading rank-0 alone
    must NOT reproduce the full weights (guards against a fixture that
    accidentally replicates everything, which would vacuously pass)."""
    args = _args()
    full = _torch_llama_sd(args)
    shard0 = _ref_split(full, 2)[0]
    assert shard0["layers.0.attention.wq.weight"].shape[0] \
        == full["layers.0.attention.wq.weight"].shape[0] // 2
    assert shard0["layers.0.attention.wo.weight"].shape[1] \
        == full["layers.0.attention.wo.weight"].shape[1] // 2
    assert shard0["tok_embeddings.weight"].shape[1] \
        == full["tok_embeddings.weight"].shape[1] // 2
    assert shard0["norm.weight"].shape[0] == args.dim  # replicated


def test_reference_ens5_tp_shards_from_pretrained(tmp_path,
                                                  tiny_tokenizer_dir):
    """Full llama_ens5 tree: decoder hand-authored + TP-split with the
    reference rules (towers replicated — they are plain nn.Modules in the
    reference, not fairscale layers, llama_ens5.py:284-322), saved as two
    rank files with ``llma.`` prefixes and loaded through the
    MetaModel-style path into a generate call."""
    from a3vlm_tpu.checkpoint.ens5_import import import_ens5_consolidated
    from a3vlm_tpu.checkpoint.export import ens5_params_to_consolidated
    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.models import ens5

    cfg = ens5.tiny_ens5_config()
    params = ens5.init_ens5_params(jax.random.PRNGKey(0), cfg)
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
        for k, v in ens5_params_to_consolidated(params, cfg).items()
    }
    # overwrite the DECODER subtree with hand-authored fairscale tensors so
    # the sharded portion of the fixture is not exporter-written
    dec = _torch_llama_sd(cfg.llama, seed=7)
    for k, v in dec.items():
        assert f"llma.{k}" in sd, k
        assert sd[f"llma.{k}"].shape == v.shape, k
        sd[f"llma.{k}"] = v

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    # reference split: strip the llma. prefix for rule lookup, shard the
    # decoder keys only (tower keys have library names and stay replicated)
    full = {k: v for k, v in sd.items()}
    shards = [dict() for _ in range(2)]
    for key, val in full.items():
        stem = key[len("llma."):] if key.startswith("llma.") else key
        leaf = stem.split(".")[-2] if stem.endswith(".weight") else None
        is_decoder = not stem.startswith(
            ("clip.", "openclip_convnext_xxl.", "dinov2_vitg14.", "qformer",
             "visual_proj", "start_img", "end_img")
        )
        dim = _REF_SHARD_DIM.get(leaf) if is_decoder else None
        pieces = (
            torch.chunk(val, 2, dim=dim) if dim is not None else [val] * 2
        )
        for r in range(2):
            shards[r][key] = pieces[r].clone()
    for r in range(2):
        torch.save(
            {"model": shards[r]},
            ckpt / f"consolidated.{r:02d}-of-02.model.pth",
        )
    (ckpt / "meta.json").write_text(json.dumps({"llama_type": "llama_ens5"}))
    import shutil

    for fn in ("tokenizer.json", "tokenizer_config.json",
               "special_tokens_map.json"):
        try:
            shutil.copy(f"{tiny_tokenizer_dir}/{fn}", ckpt / fn)
        except FileNotFoundError:
            pass

    merged, fmt = load_consolidated_dir(str(ckpt))
    assert fmt == "consolidated"
    restored = import_ens5_consolidated(merged, cfg)
    # decoder leaves == the hand-authored tensors
    np.testing.assert_allclose(
        np.asarray(restored["llama"]["layers"]["attention"]["wq"]["weight"][0]),
        dec["layers.0.attention.wq.weight"].numpy().T, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(restored["llama"]["layers"]["feed_forward"]["w2"]["weight"][1]),
        dec["layers.1.feed_forward.w2.weight"].numpy().T, atol=1e-6,
    )
    # tower leaves survive the shard/merge unchanged
    np.testing.assert_allclose(
        np.asarray(restored["clip"]["positional_embedding"]),
        np.asarray(params["clip"]["positional_embedding"]), atol=1e-6,
    )

    model = MetaModel(
        llama_type="llama_ens5", tokenizer_path=str(ckpt), with_visual=True,
        max_seq_len=384, model_cfg=cfg, dtype=jnp.float32,
    )
    model.params = jax.tree_util.tree_map(jnp.asarray, restored)
    out = model.generate(["hello"], max_gen_len=4, temperature=0.0)
    assert isinstance(out[0], str)


def test_from_pretrained_vocab_align_pads_imported_weights(tmp_path,
                                                           tiny_tokenizer_dir):
    """vocab_align > 128 (mp*128 for mp>2 serving): the config's vocab
    rounds up and IMPORTED checkpoint weights (true-vocab sized) are
    zero-padded — embedding rows and lm-head columns — with generation
    still working (tail masked via true_vocab)."""
    import shutil

    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.tokenizer import Tokenizer

    tok = Tokenizer(tiny_tokenizer_dir)
    v128 = -(-tok.n_words // 128) * 128
    v512 = -(-tok.n_words // 512) * 512
    assert v512 != v128, "tokenizer must exercise a real align difference"

    args = ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     vocab_size=v128, multiple_of=16, max_seq_len=64)
    full = _torch_llama_sd(args, seed=9)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    torch.save({"model": full}, ckpt / "consolidated.00-of-01.model.pth")
    (ckpt / "meta.json").write_text(json.dumps({"llama_type": "llama"}))
    (ckpt / "config.json").write_text(json.dumps(
        {"dim": 64, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
         "multiple_of": 16}
    ))
    for fn in ("tokenizer.json", "tokenizer_config.json",
               "special_tokens_map.json"):
        try:
            shutil.copy(f"{tiny_tokenizer_dir}/{fn}", ckpt / fn)
        except FileNotFoundError:
            pass

    model = MetaModel.from_pretrained(
        str(ckpt), llama_type="llama", tokenizer_path=tiny_tokenizer_dir,
        max_seq_len=64, dtype=jnp.float32, vocab_align=512,
    )
    assert model.args.vocab_size == v512
    assert model.params["tok_embeddings"]["weight"].shape == (v512, 64)
    assert model.params["output"]["weight"].shape == (64, v512)
    # pad tail is zeros; real region intact
    np.testing.assert_array_equal(
        np.asarray(model.params["output"]["weight"])[:, :v128],
        full["output.weight"].numpy().T,
    )
    assert not np.asarray(
        model.params["output"]["weight"])[:, v128:].any()
    out = model.generate(["hello"], max_gen_len=4, temperature=0.0)
    assert isinstance(out[0], str)
