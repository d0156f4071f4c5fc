"""Golden parity tests: each JAX vision tower + its torch-weight importer vs
the HuggingFace torch implementation of the same architecture, on tiny
randomly-initialized configs. Passing means both the architecture math and
the weight mapping are right — the two highest-parity-risk pieces
(SURVEY.md §7 hard part #1)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from a3vlm_tpu.checkpoint import torch_import as ti  # noqa: E402
from a3vlm_tpu.models import convnext as cnx  # noqa: E402
from a3vlm_tpu.models import qformer as qf  # noqa: E402
from a3vlm_tpu.models import vit  # noqa: E402

ATOL = 2e-4


def _rand_pixels(b, size):
    rng = np.random.default_rng(0)
    return rng.standard_normal((b, size, size, 3)).astype(np.float32)


def test_clip_vit_matches_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=28,
        patch_size=7,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = vit.ViTConfig(
        image_size=28, patch_size=7, width=64, layers=3, heads=4, mlp_dim=128,
        act="quick_gelu", ln_pre=True, ln_post=True, patch_bias=False,
        norm_eps=hf_cfg.layer_norm_eps,
    )
    params = ti.import_clip_vision(ti.state_dict_numpy(hf), layers=3)

    pixels = _rand_pixels(2, 28)
    with torch.no_grad():
        out = hf.vision_model(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).last_hidden_state
        # A3VLM applies ln_post to ALL tokens (llama_ens5.py:371); HF's
        # post_layernorm only feeds the pooler, so apply it manually.
        want = hf.vision_model.post_layernorm(out).numpy()

    got = np.asarray(vit.vit_forward(params, cfg, pixels))
    assert got.shape == want.shape == (2, 17, 64)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_blip2_vision_matches_hf():
    from transformers import Blip2VisionConfig, Blip2VisionModel

    hf_cfg = Blip2VisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=28,
        patch_size=7,
    )
    torch.manual_seed(1)
    hf = Blip2VisionModel(hf_cfg).eval()

    cfg = vit.ViTConfig(
        image_size=28, patch_size=7, width=64, layers=3, heads=4, mlp_dim=128,
        act="gelu", ln_pre=False, ln_post=True,
        norm_eps=hf_cfg.layer_norm_eps,
    )
    params = ti.import_blip2_vision(ti.state_dict_numpy(hf), layers=3)

    pixels = _rand_pixels(2, 28)
    with torch.no_grad():
        want = hf(torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
        want = want.last_hidden_state.numpy()

    got = np.asarray(vit.vit_forward(params, cfg, pixels))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_dinov2_swiglu_matches_hf():
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        mlp_ratio=2,
        image_size=28,
        patch_size=7,
        use_swiglu_ffn=True,
        layerscale_value=0.5,
    )
    torch.manual_seed(2)
    hf = Dinov2Model(hf_cfg).eval()

    # HF swiglu hidden = int(mlp_ratio * hidden * 2/3 rounded to 8)
    swiglu_hidden = (int(64 * 2 * 2 / 3) + 7) // 8 * 8
    cfg = vit.ViTConfig(
        image_size=28, patch_size=7, width=64, layers=3, heads=4,
        mlp_dim=swiglu_hidden, act="gelu", ln_pre=False, ln_post=True,
        use_swiglu=True, layer_scale=True, pos_grid_size=4,
        norm_eps=hf_cfg.layer_norm_eps,
    )
    params = ti.import_dinov2(ti.state_dict_numpy(hf), layers=3, swiglu=True)

    pixels = _rand_pixels(2, 28)
    with torch.no_grad():
        want = hf(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    got = np.asarray(vit.vit_forward(params, cfg, pixels))
    assert got.shape == want.shape == (2, 17, 64)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_convnext_matches_hf():
    from transformers import ConvNextConfig, ConvNextModel

    hf_cfg = ConvNextConfig(
        num_channels=3,
        depths=[2, 2],
        hidden_sizes=[32, 64],
        num_stages=2,
        layer_scale_init_value=0.5,
    )
    torch.manual_seed(3)
    hf = ConvNextModel(hf_cfg).eval()

    cfg = cnx.ConvNeXtConfig(
        depths=(2, 2), dims=(32, 64), head_norm=False,
        norm_eps=1e-12,  # HF ConvNextLayerNorm uses 1e-6? see below
    )
    # HF ConvNext uses eps=1e-6 in LayerNorms
    cfg = cnx.ConvNeXtConfig(depths=(2, 2), dims=(32, 64), head_norm=False,
                             norm_eps=1e-6)
    params = ti.import_convnext(ti.state_dict_numpy(hf), depths=(2, 2))

    pixels = _rand_pixels(2, 32)
    with torch.no_grad():
        want = hf(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()  # [B, C, H, W]

    got = np.asarray(cnx.convnext_forward(params, cfg, pixels))
    got_nchw = got.transpose(0, 3, 1, 2)
    assert got_nchw.shape == want.shape
    np.testing.assert_allclose(got_nchw, want, atol=ATOL)


def test_qformer_matches_hf():
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    hf_cfg = Blip2QFormerConfig(
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        encoder_hidden_size=48,
        cross_attention_frequency=2,
    )
    torch.manual_seed(4)
    hf = Blip2QFormerModel(hf_cfg).eval()

    cfg = qf.QFormerConfig(
        hidden=64, layers=4, heads=4, intermediate=128, num_queries=8,
        cross_attention_frequency=2, encoder_width=48,
        norm_eps=hf_cfg.layer_norm_eps,
    )
    rng = np.random.default_rng(5)
    query_tokens = rng.standard_normal((8, 64)).astype(np.float32) * 0.02
    image_feats = rng.standard_normal((2, 10, 48)).astype(np.float32)

    params = ti.import_qformer(
        ti.state_dict_numpy(hf), layers=4, cross_attention_frequency=2,
        query_tokens=query_tokens,
    )

    with torch.no_grad():
        want = hf(
            query_embeds=torch.from_numpy(query_tokens)[None].expand(2, -1, -1),
            encoder_hidden_states=torch.from_numpy(image_feats),
        ).last_hidden_state.numpy()

    got = np.asarray(qf.qformer_forward(params, cfg, image_feats))
    assert got.shape == want.shape == (2, 8, 64)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_pos_embed_interpolation_identity():
    pos = np.random.default_rng(6).standard_normal((17, 8)).astype(np.float32)
    import jax.numpy as jnp

    same = vit.interpolate_pos_embed(jnp.asarray(pos), 4, 4)
    np.testing.assert_array_equal(np.asarray(same), pos)
    up = vit.interpolate_pos_embed(jnp.asarray(pos), 4, 8)
    assert up.shape == (65, 8)
    np.testing.assert_allclose(np.asarray(up[0]), pos[0])  # cls row kept
