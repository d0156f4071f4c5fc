"""On-chip numerics gate for W8A8 int8 vision towers
(ens5.quantize_tower_params / MetaModel.quantize(tower_bits=8)).

The CPU tests (tests/test_w8a8.py) bound one matmul and a tiny-config
encode; this script measures how the two 8-bit roundings (per-channel
weights + per-token activations) COMPOUND through the FULL-SCALE tower
stack — EVA ViT-g (39L), CLIP-L (24L), DINOv2-g (40L), ConvNeXt-XXL —
on the real chip, with RANDOM-content weights (the bench's constant
fabricated weights are useless for numerics).

Builds the full towers with init_ens5_params' trained-like truncated-
normal init (one jit per tower to bound compile shapes), runs the
five-crop encode dense-bf16 and W8A8 on the same random image, and
reports the relative RMS + cosine similarity of the PROJECTED image
tokens (the decoder's actual input) and of each pre-projection feature.

Decision rule (mirrors w4a8_accuracy): ship as opt-in if the projected-
token rel-RMS sits at/below the bf16-vs-f32 noise scale (~1%) and cosine
similarity is ~1. Note the baseline itself is bf16, which already rounds
mantissas to 8 bits — W8A8's activation rounding is the same granularity
applied once more per linear.

    python scripts/w8a8_tower_accuracy.py [--seed 0]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from a3vlm_tpu.models import ens5


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
    cos = float(
        (a * b).sum() / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
    )
    return rel, cos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()

    import bench  # noqa: F401  (sets up relay-safe sync helpers on import)

    cfg = ens5.Ens5Config(llama=bench._7b_args(), crop_shard_axes=None)
    key = jax.random.PRNGKey(a.seed)
    ks = jax.random.split(key, 8)
    ks = np.asarray(ks)  # host table: no per-element relay trips

    # one jit per tower: random trained-like content in bf16
    from a3vlm_tpu.models import convnext as cnx
    from a3vlm_tpu.models import qformer, vit

    builders = {
        "clip": lambda k: vit.init_vit_params(k, cfg.clip, jnp.bfloat16),
        "blip2_vision": lambda k: vit.init_vit_params(
            k, cfg.blip2_vision, jnp.bfloat16),
        "dinov2": lambda k: vit.init_vit_params(k, cfg.dinov2, jnp.bfloat16),
        "convnext": lambda k: cnx.init_convnext_params(
            k, cfg.convnext, jnp.bfloat16),
        "qformer": lambda k: qformer.init_qformer_params(
            k, cfg.qformer, jnp.bfloat16),
    }
    params = {}
    for i, (name, fn) in enumerate(builders.items()):
        params[name] = jax.jit(fn)(jnp.asarray(ks[i]))
        print(f"built {name}", flush=True)
    # projectors + tags (small)
    D = cfg.llama.dim

    @jax.jit
    def _projs(k):
        kk = jax.random.split(k, 4)
        init = jax.nn.initializers.truncated_normal(0.02)
        return {
            "qformer_proj": {
                "linear": {"weight": init(kk[0], (cfg.qformer.hidden, D),
                                          jnp.bfloat16),
                           "bias": jnp.zeros((D,), jnp.bfloat16)},
                "ln": {"weight": jnp.ones((D,), jnp.bfloat16),
                       "bias": jnp.zeros((D,), jnp.bfloat16)},
            },
            "visual_proj": {
                "linear": {"weight": init(kk[1], (cfg.ens_dim, D),
                                          jnp.bfloat16),
                           "bias": jnp.zeros((D,), jnp.bfloat16)},
                "ln": {"weight": jnp.ones((D,), jnp.bfloat16),
                       "bias": jnp.zeros((D,), jnp.bfloat16)},
            },
            "start_img": jax.random.uniform(kk[2], (1, 1, D), jnp.bfloat16),
            "end_img": jax.random.uniform(kk[3], (1, 1, D), jnp.bfloat16),
        }

    params.update(_projs(jnp.asarray(ks[5])))
    q8 = jax.jit(ens5.quantize_tower_params)(params)

    image = jax.random.normal(
        jax.random.PRNGKey(a.seed + 1), (1, 448, 448, 3), jnp.bfloat16
    ) * 0.7  # CLIP-normalized pixels are roughly unit-scale

    @jax.jit
    def feats(p, im):
        return ens5.encode_image_features(p, cfg, im)

    @jax.jit
    def tokens(p, im):
        return ens5.build_image_tokens(p, cfg, im)

    fd = feats(params, image)
    fq = feats(q8, image)
    for name in ("q", "ens"):
        rel, cos = _rel(fq[name], fd[name])
        print(f"feature {name:3s}: rel RMS {rel * 100:.3f}%  cos {cos:.6f}",
              flush=True)
    td = tokens(params, image)
    tq = tokens(q8, image)
    rel, cos = _rel(tq, td)
    print(f"PROJECTED image tokens: rel RMS {rel * 100:.3f}%  cos {cos:.6f}")
    verdict = "PASS" if rel < 0.03 and cos > 0.999 else "REVIEW"
    print(f"gate: {verdict} (ship opt-in if rel<3% and cos>0.999)")


if __name__ == "__main__":
    main()
