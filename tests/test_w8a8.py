"""W8A8 tower quantization: the int8-MXU matmul (ops/quant_matmul.
w8a8_matmul), the device-side tower quantizer (ens5.quantize_tower_params),
and the end-to-end numerics envelope of int8 towers vs dense bf16.

W8A8 towers are OPT-IN (MetaModel.quantize(tower_bits=8) /
eval_affordance --tower_bits 8): per-channel int8 weights + per-token int8
activations contract as s8 x s8 -> s32 on the MXU at 2x the bf16 rate.
The int32 accumulation is exact (|a|,|w| <= 127, K <= 2^17), so the ONLY
divergence from a dense f32 forward is the two rounding steps — these
tests pin (a) the matmul against an exact f32 emulation of the same
integer math, (b) the quantizer's filter (norms/convs/embeddings stay
dense), (c) a tiny quantized ViT/ens5 forward staying within a small
relative envelope of dense, (d) the MetaModel plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from a3vlm_tpu.models import ens5, vit
from a3vlm_tpu.ops.quant_matmul import quantize_act_int8, w8a8_matmul
from a3vlm_tpu.quant import QuantizedWeight


def _rand(shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).normal(size=shape) * scale
            ).astype(np.float32)


def _q8_ref(w):
    s = np.maximum(np.abs(w).max(-2, keepdims=True), 1e-8) / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def test_w8a8_matmul_matches_f32_emulation():
    w = _rand((384, 256), seed=1)
    q, s = _q8_ref(w)
    qw = QuantizedWeight(jnp.asarray(q), jnp.asarray(s), bits=8)
    x = jnp.asarray(_rand((7, 384), seed=2))
    got = np.asarray(w8a8_matmul(x, qw))
    # exact f32 emulation of the integer math: int8 values are exact in
    # f32, the dot is exact integer arithmetic below 2^24
    a, ascale = quantize_act_int8(x)
    ref = (
        np.asarray(a, np.float32) @ np.asarray(q, np.float32)
        * np.asarray(ascale) * s.reshape(1, -1)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_w8a8_matmul_leading_dims_and_envelope():
    w = _rand((256, 128), seed=3)
    q, s = _q8_ref(w)
    qw = QuantizedWeight(jnp.asarray(q), jnp.asarray(s), bits=8)
    x = jnp.asarray(_rand((2, 5, 256), seed=4))
    got = np.asarray(w8a8_matmul(x, qw))
    assert got.shape == (2, 5, 128)
    dense = np.asarray(x).reshape(-1, 256) @ w
    rel = np.linalg.norm(got.reshape(-1, 128) - dense) / np.linalg.norm(dense)
    # two 8-bit roundings on gaussian data: ~0.5-1% relative RMS
    assert rel < 0.03, rel


def test_quantize_tower_params_filter():
    cfg = vit.ViTConfig(width=32, layers=2, heads=4, mlp_dim=64,
                        image_size=28, patch_size=14)
    p = vit.init_vit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qp = ens5.quantize_tower_params({"clip": p})["clip"]
    blocks = qp["blocks"]
    # matmul weights quantized (stacked [L, K, N] with [L, 1, N] scales)
    for leaf in (blocks["attn"]["wqkv"]["weight"],
                 blocks["attn"]["wo"]["weight"],
                 blocks["mlp"]["fc1"]["weight"],
                 blocks["mlp"]["fc2"]["weight"]):
        assert isinstance(leaf, QuantizedWeight) and leaf.bits == 8
        assert leaf.q.ndim == 3 and leaf.scale.shape[-2] == 1
    # norms, biases, embeddings, conv kernel stay dense
    assert not isinstance(blocks["ln1"]["weight"], QuantizedWeight)
    assert not isinstance(blocks["attn"]["wqkv"]["bias"], QuantizedWeight)
    assert not isinstance(qp["patch_embed"]["kernel"], QuantizedWeight)
    assert not isinstance(qp["positional_embedding"], QuantizedWeight)
    # quantization math matches the host-side rule (round-half-even absmax)
    w = np.asarray(p["blocks"]["attn"]["wqkv"]["weight"])
    q_ref, s_ref = _q8_ref(w.reshape(-1, *w.shape[-2:])[0])
    got = blocks["attn"]["wqkv"]["weight"]
    np.testing.assert_array_equal(np.asarray(got.q[0]), q_ref)
    np.testing.assert_allclose(np.asarray(got.scale[0]), s_ref, rtol=1e-6)


def test_vit_forward_w8a8_envelope():
    cfg = vit.ViTConfig(width=32, layers=2, heads=4, mlp_dim=64,
                        image_size=28, patch_size=14, attn_kernel=False)
    p = vit.init_vit_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    px = jnp.asarray(_rand((2, 28, 28, 3), seed=5, scale=0.5))
    dense = np.asarray(vit.vit_forward(p, cfg, px))
    qp = ens5.quantize_tower_params({"clip": p})["clip"]
    q8 = np.asarray(vit.vit_forward(qp, cfg, px))
    rel = np.linalg.norm(q8 - dense) / np.linalg.norm(dense)
    assert rel < 0.05, rel


def test_ens5_encode_w8a8_envelope_and_projection():
    """Full tiny-ens5 five-crop encode: int8 towers' projected image
    tokens stay close to dense, and the Q-Former / projectors are
    untouched by the tower quantizer."""
    cfg = ens5.tiny_ens5_config()
    params = ens5.init_ens5_params(jax.random.PRNGKey(2), cfg)
    image = jnp.asarray(_rand(
        (1, cfg.image_size, cfg.image_size, 3), seed=6, scale=0.5))
    dense = ens5.build_image_tokens(params, cfg, image)
    qparams = ens5.quantize_tower_params(params)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a is b, params["qformer"], qparams["qformer"]))
    got = ens5.build_image_tokens(qparams, cfg, image)
    d, g = np.asarray(dense), np.asarray(got)
    rel = np.linalg.norm(g - d) / max(np.linalg.norm(d), 1e-9)
    assert rel < 0.08, rel


def test_meta_quantize_tower_bits(tiny_tokenizer_dir):
    """MetaModel.quantize(bits=None, tower_bits=8): towers go int8, the
    decoder stays dense, and image-conditioned generation still runs."""
    from a3vlm_tpu.meta import MetaModel

    model = MetaModel(
        llama_type="llama_ens5",
        tokenizer_path=tiny_tokenizer_dir,
        with_visual=True,
        max_seq_len=384,
        model_cfg=ens5.tiny_ens5_config(),
    )
    model.quantize(bits=None, tower_bits=8)
    qkv = model.params["clip"]["blocks"]["attn"]["wqkv"]["weight"]
    assert isinstance(qkv, QuantizedWeight) and qkv.bits == 8
    assert not any(
        isinstance(leaf, QuantizedWeight)
        for leaf in jax.tree_util.tree_leaves(
            model.params["llama"],
            is_leaf=lambda x: isinstance(x, QuantizedWeight),
        )
    )
    sz = model.cfg.image_size
    out = model.generate(
        ["describe"], max_gen_len=4, temperature=0.0,
        images=np.zeros((1, sz, sz, 3), np.float32),
    )
    assert len(out) == 1 and isinstance(out[0], str)


def test_eval_cli_tower_bits_smoke(tmp_path, tiny_tokenizer_dir):
    """eval_affordance --tower_bits 8 (no --quant): the W8A8-tower serving
    mode plumbs through the CLI — towers quantize, the decoder stays
    dense, and the run produces reference-schema records."""
    import json

    from PIL import Image

    from a3vlm_tpu import eval_affordance

    img_path = tmp_path / "demo.png"
    Image.new("RGB", (96, 64), (20, 180, 90)).save(img_path)
    demo = [
        {
            "image": str(img_path),
            "conversations": [
                {"from": "human", "value": "Detect all manipulable object "
                 "parts and provide their 3D bounding boxes."},
                {"from": "gpt", "value": ""},
            ],
        }
    ]
    task_json = tmp_path / "demo.json"
    task_json.write_text(json.dumps(demo))

    results_file = eval_affordance.main(
        [
            "--dataset", str(task_json),
            "--output_dir", str(tmp_path / "out"),
            "--tokenizer_path", tiny_tokenizer_dir,
            "--tiny_random_model",
            "--tower_bits", "8",
            "--batch_size", "1",
            "--max_gen_len", "4",
            "--max_seq_len", "384",
            "--temperature", "0.0",
        ]
    )
    with open(results_file) as f:
        results = json.load(f)
    assert len(results) == 1 and isinstance(results[0]["fail"], bool)
