"""MetaModel across the full llama_type matrix: falcon (own gen ops),
ens5_2images (RGB+depth), internlm_ems5_light."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a3vlm_tpu.meta import MetaModel


def test_meta_falcon_generate_and_logits(tiny_tokenizer_dir):
    from a3vlm_tpu.models.falcon import FalconArgs

    args = FalconArgs(
        num_layers=2, hidden_size=64, num_attention_heads=4, num_kv_heads=2,
        vocab_size=-1, max_seq_len=128,
    )
    m = MetaModel(
        llama_type="falcon",
        tokenizer_path=tiny_tokenizer_dir,
        max_seq_len=128,
        model_cfg=args,
    )
    assert m.args.vocab_size % 128 == 0
    out = m.generate(["Hi my darling", "hello"], max_gen_len=6,
                     temperature=0.0)
    assert len(out) == 2 and all(isinstance(s, str) for s in out)
    logits = m.compute_logits(["Hi"])
    assert logits[0].shape[-1] == m.true_vocab
    loss = m.forward(
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )
    assert np.isfinite(float(loss))
    chunks = list(m.stream_generate("Hi", max_gen_len=4, temperature=0.0))
    assert chunks[-1]["end_of_content"]


def test_meta_2images_generate(tiny_tokenizer_dir):
    from a3vlm_tpu.models import ens5_2images as e2

    cfg = e2.tiny_config()
    m = MetaModel(
        llama_type="llama_ens5_2images",
        tokenizer_path=tiny_tokenizer_dir,
        with_visual=True,
        max_seq_len=448,
        model_cfg=cfg,
    )
    assert m.get_image_words() == 2 * cfg.image_words
    assert "start_depth_img" in m.params
    B = 1
    img = np.zeros((B, cfg.image_size, cfg.image_size, 3), np.float32)
    dep = np.ones((B, cfg.image_size, cfg.image_size, 3), np.float32)
    out = m.generate(
        ["what moves?"], images=img, depth_images=dep, max_gen_len=4,
        temperature=0.0,
    )
    assert len(out) == 1
    with pytest.raises(AssertionError):
        m.generate(["x"], images=img, max_gen_len=2)  # depth required


def test_meta_internlm_generate(tiny_tokenizer_dir):
    from a3vlm_tpu.models import internlm_ems5_light as il

    cfg = il.tiny_config()
    m = MetaModel(
        llama_type="internlm_ems5_light",
        tokenizer_path=tiny_tokenizer_dir,
        with_visual=True,
        max_seq_len=384,
        model_cfg=cfg,
    )
    assert m.get_image_words() == cfg.image_words
    img = np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32)
    out = m.generate(["what is this?"], images=img, max_gen_len=4,
                     temperature=0.0)
    assert len(out) == 1
