"""Full ens5 checkpoint ingestion roundtrip: our params -> the reference's
consolidated torch-naming state dict (open_clip/timm/hub/HF trees) -> import
back -> numerically identical forward. Exercises every transpose/reshape of
the highest-parity-risk mapping, plus MetaModel.from_pretrained on a saved
consolidated checkpoint with towers."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from a3vlm_tpu.checkpoint.ens5_import import (
    has_ens5_towers,
    import_ens5_consolidated,
)
from a3vlm_tpu.checkpoint.export import ens5_params_to_consolidated
from a3vlm_tpu.models import ens5


@pytest.fixture(scope="module")
def cfg_and_params():
    cfg = ens5.tiny_ens5_config()
    params = ens5.init_ens5_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_consolidated_roundtrip_tree(cfg_and_params):
    cfg, params = cfg_and_params
    sd = ens5_params_to_consolidated(params, cfg)
    assert has_ens5_towers(sd)
    # spot-check torch layouts
    W = cfg.clip.width
    assert sd["llma.clip.visual.conv1.weight"].shape == (
        W, 3, cfg.clip.patch_size, cfg.clip.patch_size
    )
    assert sd["llma.clip.visual.transformer.resblocks.0.attn.in_proj_weight"
              ].shape == (3 * W, W)
    assert sd["llma.dinov2_vitg14.cls_token"].shape == (1, 1, cfg.dinov2.width)
    assert sd["llma.qformer.query_tokens"].ndim == 3

    restored = import_ens5_consolidated(sd, cfg)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(jnp.asarray, restored)
    )
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-6
        )


def test_roundtrip_forward_parity(cfg_and_params):
    cfg, params = cfg_and_params
    sd = ens5_params_to_consolidated(params, cfg)
    restored = jax.tree_util.tree_map(
        jnp.asarray, import_ens5_consolidated(sd, cfg)
    )
    tokens = jnp.ones((1, 5), jnp.int32)
    img = jax.random.normal(
        jax.random.PRNGKey(1), (1, cfg.image_size, cfg.image_size, 3)
    )
    want = ens5.forward(params, cfg, tokens, image=img)
    got = ens5.forward(restored, cfg, tokens, image=img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_from_pretrained_full_ens5(tmp_path, cfg_and_params,
                                   tiny_tokenizer_dir):
    """Save a consolidated checkpoint with towers + sidecars, load through
    MetaModel.from_pretrained, generate."""
    torch = pytest.importorskip("torch")

    cfg, params = cfg_and_params
    sd = ens5_params_to_consolidated(params, cfg)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    torch.save(
        {"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in sd.items()}},
        ckpt / "consolidated.00-of-01.model.pth",
    )
    (ckpt / "meta.json").write_text(json.dumps({"llama_type": "llama_ens5"}))
    # tokenizer sidecar
    import shutil

    for fn in ("tokenizer.json", "tokenizer_config.json",
               "special_tokens_map.json"):
        src = f"{tiny_tokenizer_dir}/{fn}"
        try:
            shutil.copy(src, ckpt / fn)
        except FileNotFoundError:
            pass

    from a3vlm_tpu.meta import MetaModel

    # from_pretrained builds the REAL-size Ens5Config by default; for the
    # tiny test config, construct the model then load through the same path
    model = MetaModel(
        llama_type="llama_ens5",
        tokenizer_path=str(ckpt),
        with_visual=True,
        max_seq_len=384,
        model_cfg=cfg,
        dtype=jnp.float32,
    )
    from a3vlm_tpu.checkpoint.torch_import import load_consolidated_dir

    merged, fmt = load_consolidated_dir(str(ckpt))
    assert fmt == "consolidated"
    model.params = jax.tree_util.tree_map(
        jnp.asarray, import_ens5_consolidated(merged, cfg)
    )
    out = model.generate(["hello"], max_gen_len=4, temperature=0.0)
    assert isinstance(out[0], str)
