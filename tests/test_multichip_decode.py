"""Multi-chip DECODE parity: generation over a ("data","model") mesh must
produce the same tokens as the single-device run — the serving configuration
the reference uses (MP=2 TP-lockstep generation, eval_affordance_v2.py:330-384
+ scripts/a3vlm_infer.sh:36-43), here expressed as NamedShardings on the
params, the KV cache (batch on "data", kv heads on "model"), and the token
buffers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from a3vlm_tpu.config import ModelArgs
from a3vlm_tpu.generation import Generator
from a3vlm_tpu.models import llama
from a3vlm_tpu.parallel import create_mesh, shard_params


def _tiny_args(vocab: int) -> ModelArgs:
    return ModelArgs(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=4, vocab_size=vocab,
        multiple_of=16, max_seq_len=128, max_batch_size=4,
    )


def _padded_vocab(tok) -> int:
    return -(-tok.n_words // 128) * 128


def test_mp2_generation_parity(devices8, tiny_tokenizer):
    """Greedy generate on a (data=4, model=2) mesh == single-device tokens."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    params = llama.init_llama_params(jax.random.PRNGKey(3), args)

    prompts = [
        "### Human: detect all manipulable object parts",
        "provide the joint's type",
        "the answer is",
        "rotated bounding box",
    ]
    kw = dict(max_gen_len=8, temperature=0.0)

    base = Generator(params, args, tok, vocab_limit=tok.n_words)
    ref = base.generate(prompts, **kw)

    mesh = create_mesh(2, devices=devices8)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    sharded = shard_params(params, mesh, llama.llama_partition_specs(args))
    gen = Generator(sharded, args, tok, vocab_limit=tok.n_words, mesh=mesh)
    out = gen.generate(prompts, **kw)

    assert out == ref


def test_mp2_cache_actually_sharded(devices8, tiny_tokenizer):
    """decode_cache_specs shards kv heads over "model" and batch over
    "data" when divisible, and degrades to unsharded axes otherwise."""
    tok = tiny_tokenizer
    args = _tiny_args(_padded_vocab(tok))
    mesh = create_mesh(2, devices=devices8)
    specs = llama.decode_cache_specs(args, mesh, batch=4)
    # layered decode buffers are [B, Hkv, S, D]
    assert specs.k[0] == jax.sharding.PartitionSpec("data", "model", None, None)
    # batch 3 does not divide data=4; kv_heads=4 still divides model=2
    specs = llama.decode_cache_specs(args, mesh, batch=3)
    assert specs.k[0] == jax.sharding.PartitionSpec(None, "model", None, None)
    # 1 kv head (MQA) cannot shard over model=2
    mqa = dataclasses.replace(args, n_kv_heads=1)
    specs = llama.decode_cache_specs(mqa, mesh, batch=4)
    assert specs.k[0] == jax.sharding.PartitionSpec("data", None, None, None)


def test_ens5_server_mp2_image_generation_parity(devices8, tiny_tokenizer_dir):
    """Full serving path: tiny ens5 (4 towers + image-token prefill) through
    ModelServer on an mp=2 mesh matches the single-device MetaModel,
    image-conditioned."""
    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.models import ens5
    from a3vlm_tpu.serving import ModelServer

    def build():
        return MetaModel(
            "llama_ens5",
            tokenizer_path=tiny_tokenizer_dir,
            with_visual=True,
            max_seq_len=512,
            model_cfg=ens5.tiny_ens5_config(),
            seed=11,
        )

    rng = np.random.default_rng(0)
    image = rng.uniform(size=(1, 56, 56, 3)).astype(np.float32)
    prompts = ["### Human: What is the status of the door?"]
    kw = dict(max_gen_len=6, temperature=0.0)

    ref = build().generate(prompts, images=image, **kw)

    server = ModelServer(meta_model=build(), model_parallel_size=2)
    out = server.generate(prompts, images=image, **kw)
    assert out == ref


def test_falcon_mp2_generation_parity(devices8, tiny_tokenizer):
    """The falcon GenOps path (own cache/prefill) also runs sharded."""
    from a3vlm_tpu.generation import FALCON_GEN_OPS
    from a3vlm_tpu.models import falcon

    tok = tiny_tokenizer
    args = falcon.FalconArgs(
        hidden_size=64, num_layers=2, num_attention_heads=4, num_kv_heads=2,
        vocab_size=_padded_vocab(tok), max_seq_len=128,
    )
    params = falcon.init_falcon_params(jax.random.PRNGKey(5), args)
    prompts = ["detect all parts", "### Human: hello"]
    kw = dict(max_gen_len=6, temperature=0.0)

    ref = Generator(
        params, args, tok, vocab_limit=tok.n_words, ops=FALCON_GEN_OPS
    ).generate(prompts, **kw)

    mesh = create_mesh(2, devices=devices8)
    sharded = shard_params(
        params, mesh, falcon.falcon_partition_specs(args)
    )
    out = Generator(
        sharded, args, tok, vocab_limit=tok.n_words, ops=FALCON_GEN_OPS,
        mesh=mesh,
    ).generate(prompts, **kw)
    assert out == ref


def test_mp2_quantized_generation_parity(devices8, tiny_tokenizer):
    """int4 decoder (tp_align-padded ffn, all-column-parallel TP via the
    quant SPMD wrappers) + int8 KV cache on a (data=4, model=2) mesh ==
    the single-device quantized run — the flagship quantized serving
    configuration at tiny scale."""
    from a3vlm_tpu.quant import quantize_params, quantized_partition_specs

    tok = tiny_tokenizer
    args = ModelArgs(
        dim=256, n_layers=2, n_heads=4, n_kv_heads=4,
        vocab_size=_padded_vocab(tok), multiple_of=16, max_seq_len=128,
        max_batch_size=4,
    )
    params = llama.init_llama_params(jax.random.PRNGKey(7), args)
    qparams = quantize_params(params, bits=4, tp_align=256)

    prompts = [
        "### Human: detect all manipulable object parts",
        "provide the joint's type",
        "the answer is",
        "rotated bounding box",
    ]
    kw = dict(max_gen_len=8, temperature=0.0)

    ref = Generator(
        qparams, args, tok, vocab_limit=tok.n_words, kv_cache_bits=8
    ).generate(prompts, **kw)

    mesh = create_mesh(2, devices=devices8)
    specs = quantized_partition_specs(
        llama.llama_partition_specs(args), qparams, 2
    )
    sharded = shard_params(qparams, mesh, specs)
    # the padded ffn dims must actually shard (the point of tp_align)
    w1s = specs["layers"]["feed_forward"]["w1"]["weight"]
    assert tuple(w1s.q) == (None, None, "model")
    out = Generator(
        sharded, args, tok, vocab_limit=tok.n_words, kv_cache_bits=8,
        mesh=mesh,
    ).generate(prompts, **kw)
    assert out == ref


def test_ens5_server_mp2_quantized_image_parity(devices8,
                                                tiny_tokenizer_dir):
    """ModelServer places a QUANTIZED ens5 tree on the mesh (the round-3
    _place_params branch: dense tower specs + N-sharded QuantizedWeight
    specs) and image-conditioned generation matches single-device."""
    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.models import ens5
    from a3vlm_tpu.quant import QuantizedWeight
    from a3vlm_tpu.serving import ModelServer

    def build():
        m = MetaModel(
            "llama_ens5",
            tokenizer_path=tiny_tokenizer_dir,
            with_visual=True,
            max_seq_len=512,
            model_cfg=ens5.tiny_ens5_config(),
            seed=13,
        )
        m.quantize(bits=8, tp_align=256)
        return m

    rng = np.random.default_rng(1)
    image = rng.uniform(size=(1, 56, 56, 3)).astype(np.float32)
    prompts = ["### Human: What is the status of the door?"]
    kw = dict(max_gen_len=6, temperature=0.0)

    ref = build().generate(prompts, images=image, **kw)

    server = ModelServer(meta_model=build(), model_parallel_size=2)
    # a quantized ffn weight (tp_align-padded) must actually be sharded
    w1 = server.model.params["llama"]["layers"]["feed_forward"]["w1"][
        "weight"
    ]
    assert isinstance(w1, QuantizedWeight)
    assert "model" in str(w1.q.sharding.spec)
    out = server.generate(prompts, images=image, **kw)
    assert out == ref


def test_mp2_row_parallel_quantized_generation_parity(
    devices8, tiny_tokenizer
):
    """int4 with row_parallel chunk-packing (quantize_params
    row_parallel=2): wo/w2 K-shard over "model" (a psum of partials
    through _spmd_int4_rowp) while wq..w3 stay column-parallel — the full
    Megatron layout of the dense path, now for packed weights. Generation
    on the (data=4, model=2) mesh matches single-device."""
    from a3vlm_tpu.quant import quantize_params, quantized_partition_specs

    tok = tiny_tokenizer
    # dim 1024 = the smallest wo that chunks at mp=2 (512*mp unit)
    args = ModelArgs(
        dim=1024, n_layers=2, n_heads=8, n_kv_heads=4,
        vocab_size=_padded_vocab(tok), multiple_of=16, max_seq_len=64,
        max_batch_size=2,
    )
    params = llama.init_llama_params(jax.random.PRNGKey(11), args)
    qparams = quantize_params(params, bits=4, tp_align=256, row_parallel=2)
    wo = qparams["layers"]["attention"]["wo"]["weight"]
    w2 = qparams["layers"]["feed_forward"]["w2"]["weight"]
    assert wo.k_chunks == 2 and wo.q.shape[1] == 2  # [L, c, halfc, N]
    assert w2.k_chunks == 2

    prompts = ["detect all parts", "the answer is"]
    kw = dict(max_gen_len=6, temperature=0.0)
    ref = Generator(
        qparams, args, tok, vocab_limit=tok.n_words
    ).generate(prompts, **kw)

    mesh = create_mesh(2, devices=devices8)
    specs = quantized_partition_specs(
        llama.llama_partition_specs(args), qparams, 2
    )
    wos = specs["layers"]["attention"]["wo"]["weight"]
    assert tuple(wos.q) == (None, "model", None, None)
    sharded = shard_params(qparams, mesh, specs)
    out = Generator(
        sharded, args, tok, vocab_limit=tok.n_words, mesh=mesh
    ).generate(prompts, **kw)
    assert out == ref
