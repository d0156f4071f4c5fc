"""At-scale eval benchmark: eval_affordance over >=500 synthetic
PartNet-style queries (SURVEY §7 hard-part 4 — ragged multimodal batching
under static shapes; reference serving loop eval_affordance_v2.py:305-401).

Uses the REAL eval path (VQADataset -> conversation prompts -> MetaModel
.generate with prefill bucketing) at full scale: 4 full bf16 towers +
int4 7B decoder (fabricated content-free weights — values don't affect
timing), int8 KV cache, and a tiny in-script BPE tokenizer (the real
sentencepiece model isn't present in this env; prompt LENGTH distribution
is what matters for bucketing).

Reports queries/s, the prompt-token histogram, distinct generate-loop
compilations (recompile count), and the failure-flag rate of the repair
pipeline on the (random-weight) outputs.

Run on chip:  timeout 3000 python scripts/eval_at_scale.py [--n 512]
CPU smoke:    JAX_PLATFORMS=cpu python scripts/eval_at_scale.py --tiny --n 24
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- synthetic PartNet-style queries ---------------------------------------

PARTS = [
    "door", "drawer", "lid", "handle", "knob", "button", "switch", "wheel",
    "tray", "shelf", "rotation door", "sliding drawer", "cabinet door",
    "oven door", "washing machine door", "laptop screen", "box lid",
]
TEMPLATES = [
    "Please provide the joint's type and its 3D bounding box linked to the "
    "object part {p}.",
    "Detect all manipulable object parts and provide their 3D bounding "
    "boxes and joint types.",
    "What is the articulation status of the {p}? Answer with Opened or "
    "Closed.",
    "Please provide the 3D bounding box of the region this sentence "
    "describes: the {p} of the object.",
    "To {v} the {p}, what action should be taken? Choose from slide_open, "
    "flap_open, cap, slide.",
    "Describe the object in the image and list every manipulable part "
    "with its joint type, its 3D rotated bounding box, and the normalized "
    "axis endpoints; then explain how a robot arm should approach the {p} "
    "in order to {v} it without colliding with the neighboring parts.",
]
VERBS = ["open", "close", "push", "pull", "rotate", "slide"]


def make_dataset(path: str, n: int, img_dir: str, n_images: int = 16):
    rng = np.random.default_rng(0)
    # a handful of distinct point-cloud "images" (the .npy route of
    # VQADataset renders them depth-colored; avoids PNG generation cost)
    img_paths = []
    for i in range(n_images):
        pc = rng.normal(size=(1024, 6)).astype(np.float32)
        pc[:, 3:] = rng.uniform(0, 1, size=(1024, 3))
        p = os.path.join(img_dir, f"pc_{i}.npy")
        np.save(p, pc)
        img_paths.append(p)
    data = []
    for i in range(n):
        t = TEMPLATES[i % len(TEMPLATES)]
        q = t.format(p=PARTS[i % len(PARTS)], v=VERBS[i % len(VERBS)])
        if i % 7 == 0:  # long-tail prompts stress the bucket ladder
            q = q + " " + TEMPLATES[5].format(p=PARTS[(i + 3) % len(PARTS)],
                                              v=VERBS[(i + 1) % len(VERBS)])
        data.append(
            {
                "image": img_paths[i % n_images],
                "conversations": [
                    {"from": "human", "value": "<image>\n" + q},
                    {"from": "gpt", "value": "<rb>revolute</rb>"},
                ],
            }
        )
    with open(path, "w") as f:
        json.dump(data, f)
    return path


def make_tokenizer(dir_: str) -> str:
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = [t.format(p=p, v=v) for t in TEMPLATES for p in PARTS
              for v in VERBS[:2]] + [
        "### Human: Assistant: <rb></rb><rbd></rbd><box></box><axis></axis>"
        " 0123456789 .,[]<>/# Opened Closed slide_open flap_open",
    ] * 20
    tok = HFTok(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    trainer = trainers.BpeTrainer(
        vocab_size=800, special_tokens=["<unk>", "<s>", "</s>"]
    )
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>",
    )
    fast.save_pretrained(dir_)
    return dir_


def build_model(tok_dir: str, tiny: bool, batch: int, max_gen_len: int):
    import jax.numpy as jnp

    import bench
    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.models import ens5

    if tiny:
        cfg = ens5.tiny_ens5_config()
        model = MetaModel(
            llama_type="llama_ens5", tokenizer_path=tok_dir,
            with_visual=True, max_seq_len=256, model_cfg=cfg,
            dtype=jnp.float32,
        )
        return model, cfg.image_size
    import jax

    largs = bench._7b_args()
    probe = ens5.Ens5Config(llama=largs, crop_shard_axes=None)
    total = probe.image_words + 256 + max_gen_len
    largs = largs.replace(
        max_batch_size=batch, max_seq_len=-(-total // 8) * 8
    )
    cfg = ens5.Ens5Config(llama=largs, crop_shard_axes=None)
    tower_shapes = jax.eval_shape(
        lambda: ens5.init_ens5_params(jax.random.PRNGKey(0), cfg)
    )
    params = {
        k: bench.fabricate(v) for k, v in tower_shapes.items()
        if k != "llama"
    }
    params["llama"] = bench.fabricate_llama(largs, bits=4)
    model = MetaModel(
        llama_type="llama_ens5", tokenizer_path=tok_dir, with_visual=True,
        max_seq_len=largs.max_seq_len, model_cfg=cfg, params=params,
    )
    model.kv_cache_bits = 8  # bf16 cache at batch 16 x ~1.8k would OOM
    # one-shot unrolled prefill at batch 16 x ~1.5k spliced tokens OOMed
    # v5e-1 with multi-GB [B*S, K] int4-matmul activation temps
    model.prefill_chunk = 512
    return model, cfg.image_size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--max_gen_len", type=int, default=64)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--continuous_batching", action="store_true",
                    help="slot pool + per-image KV-prefix reuse")
    ap.add_argument("--draft_k", type=int, default=0,
                    help="prompt-lookup speculation per slot (CB only)")
    a = ap.parse_args()

    if a.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from a3vlm_tpu import eval_affordance, generation

    tmp = tempfile.mkdtemp(prefix="eval_scale_")
    task_json = make_dataset(os.path.join(tmp, "tasks.json"), a.n, tmp)
    tok_dir = make_tokenizer(os.path.join(tmp, "tok"))
    model, input_size = build_model(
        tok_dir, a.tiny, a.batch_size, a.max_gen_len
    )

    ds = eval_affordance.VQADataset(task_json, input_size=input_size)
    print(f"{len(ds)} queries, batch {a.batch_size}", flush=True)

    # prompt-token histogram (the ragged lengths the bucketing must absorb)
    lengths = [
        len(model.tokenizer.encode(ds[i]["prompt"], bos=True, eos=False))
        for i in range(len(ds))
    ]
    hist = collections.Counter(
        generation._prefill_bucket(ln) for ln in lengths
    )
    print(f"prompt tokens: min={min(lengths)} max={max(lengths)} "
          f"bucket histogram={dict(sorted(hist.items()))}", flush=True)

    t0 = time.perf_counter()
    if a.continuous_batching:
        outputs = eval_affordance.run_eval_continuous(
            model, ds, batch_size=a.batch_size, max_gen_len=a.max_gen_len,
            temperature=0.0, draft_k=a.draft_k,
        )
    else:
        outputs = eval_affordance.run_eval(
            model, ds, batch_size=a.batch_size, max_gen_len=a.max_gen_len,
            temperature=0.0,
        )
    wall = time.perf_counter() - t0
    fails = sum(o["fail"] for o in outputs)
    recompiles = generation._generate_loop._cache_size()
    print(
        json.dumps(
            {
                "queries": len(outputs),
                "wall_s": round(wall, 1),
                "queries_per_sec": round(len(outputs) / wall, 3),
                "generate_loop_compilations": recompiles,
                "prompt_buckets": {str(k): v for k, v in sorted(hist.items())},
                "repair_fail_rate": round(fails / max(len(outputs), 1), 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
