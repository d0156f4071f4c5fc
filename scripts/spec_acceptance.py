"""REALIZED speculative acceptance on real triad content (round 4).

The bench's lookup-speculation p50 leg runs on fabricated content-free
weights that emit constant tokens — near-perfect draft acceptance, i.e.
an UPPER BOUND on the speedup. This script measures the realized number
the honest way the environment allows (released 7B checkpoints are
absent): the closed-loop accuracy-gate pipeline
(tests/test_accuracy_gate.py) — datagen -> tiny ens5 trained to
memorization -> REAL eval questions through the production prompt/eval
path — decoded with prompt-lookup speculation (`draft_k`), counting the
verify forwards actually spent per emitted token.

Why this transfers to 7B: for greedy speculative decoding that is
bit-identical to vanilla (pinned by tests/test_lookup_decode.py), the
round count is a function of the CONTENT (the greedy token sequence +
prompt) and the drafting rule only — not of model size. A memorized
model emits exactly the ground-truth triads, so the acceptance measured
here is that of correct triad-format answers to the reference's eval
questions (eval_affordance_v2.py task streams). The 7B cost model then
is: realized_decode ~= rounds_per_answer x verify_round_cost, with
verify_round_cost/plain_step measured on-chip by bench.py
(lookup_verify_overhead).

Run (CPU, ~10 min, dominated by memorization training):
    python scripts/spec_acceptance.py [--draft_k 8] [--max_epochs 400]

Output: one JSON line with per-task and aggregate stats:
tokens_per_round (emitted tokens per verify forward), mean
accepted-per-round, and the implied 7B decode speedup at the measured
verify overhead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402


def build_tokenizer(tmp: str) -> str:
    """The test suite's tiny LLaMA-ish BPE tokenizer (tests/conftest.py),
    trained on the triad/conversation vocabulary."""
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = [
        "A chat between a curious human and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the human's questions.",
        "### Human: Assistant: please provide the joint's type and its 2D "
        "rotated bounding box linked to the object part door drawer lid",
        "<rb>revolute</rb><rbd></rbd><box></box><axis>prismatic</axis>",
        "[0.12,0.34,0.56,0.78,0.90] the answer is Opened Closed",
        "0123456789 .,[]<>/# Hi my darling detect all manipulable object "
        "parts and provide their rotated bounding boxes",
        "There are two manipulable object parts with their 3d bounding "
        "boxes slide_open flap_close StatusComplete",
    ] * 50
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
    d = os.path.join(tmp, "tok")
    fast.save_pretrained(d)
    return d


def build_tasks(tmp: str):
    """Datagen -> VQA task files for one synthetic object (the accuracy
    gate's corpus: real render, real labeler, real codecs)."""
    from a3vlm_tpu.datagen.labeler import label_one_data, save_annotations
    from a3vlm_tpu.datagen.point_render import process_one_data
    from a3vlm_tpu.datagen.render_robot import render_data_item

    from tests.test_datagen_pipeline import (
        CAMERA_INFO,
        MOBILITY_V2,
        SEMANTICS,
        URDF_XML,
    )

    data_dir = os.path.join(tmp, "dataset")
    out_dir = os.path.join(tmp, "render")
    obj = os.path.join(data_dir, "101")
    os.makedirs(obj)
    open(os.path.join(obj, "mobility.urdf"), "w").write(URDF_XML)
    open(os.path.join(obj, "meta.json"), "w").write(
        json.dumps({"model_cat": "Box"})
    )
    open(os.path.join(obj, "semantics.txt"), "w").write(SEMANTICS)
    open(os.path.join(obj, "mobility_v2.json"), "w").write(
        json.dumps(MOBILITY_V2)
    )
    assert render_data_item(
        "101", data_dir, out_dir, num_poses=2, camera_info=CAMERA_INFO,
        num_joint_value=2, cam_radius_min=3.0, cam_radius_max=4.0, seed=0,
    )
    assert process_one_data(
        "101", out_dir, sample_size=4096, gaussian_noise=0.0, seed=0
    )
    tasks = label_one_data("101", None, data_dir, out_dir, vis_thresh=100)
    files = save_annotations(tasks, os.path.join(tmp, "vqa"), "Box")
    rec = next(f for f in files if "single_link_rec" in f)
    joint = next(
        f for f in files
        if "joint_rec_tasks" in f and "ext" not in f and "sep" not in f
        and "3d" not in f
    )
    rec3d = next(f for f in files if "single_link_3d_rec" in f)
    joint3d = next(f for f in files if "joint_3d_rec_tasks" in f)
    return rec, joint, rec3d, joint3d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--draft_k", type=str, default="8",
        help="comma-separated list; the expensive memorization training "
        "runs once and every K is measured on the same model",
    )
    ap.add_argument(
        "--max_n", type=str, default="4",
        help="comma-separated longest-suffix n-gram lengths to sweep "
        "(lookup_decode find_draft max_n); one jit per value",
    )
    ap.add_argument("--max_epochs", type=int, default=400)
    ap.add_argument("--max_gen_len", type=int, default=48)
    ap.add_argument(
        "--verify_overhead", type=float, default=None,
        help="verify-round cost / plain decode-step cost at 7B (bench.py "
        "lookup_verify_overhead; when given, the implied 7B decode "
        "speedup is printed)",
    )
    args = ap.parse_args()

    import tempfile

    from a3vlm_tpu.data.conversation import conv_templates
    from a3vlm_tpu.eval_affordance import VQADataset
    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.models import ens5 as ens5_mod
    from tests.test_accuracy_gate import _train_to_memorization

    tmp = tempfile.mkdtemp(prefix="spec_acc_")
    tok_dir = build_tokenizer(tmp)
    rec_file, joint_file, rec3d_file, joint3d_file = build_tasks(tmp)
    yaml_cfg = os.path.join(tmp, "data.yaml")
    open(yaml_cfg, "w").write(
        "META:\n" + "".join(
            f" - path: {f}\n   type: image_text\n"
            for f in (rec_file, joint_file, rec3d_file, joint3d_file)
        )
    )
    cfg = ens5_mod.tiny_ens5_config()
    model = MetaModel(
        "llama_ens5", tokenizer_path=tok_dir, with_visual=True,
        max_seq_len=448, model_cfg=cfg, seed=0,
    )
    model = _train_to_memorization(model, yaml_cfg,
                                   max_epochs=args.max_epochs)

    conv_sep = conv_templates["v1"]().response_end_signal
    ks = [int(k) for k in args.draft_k.split(",")]
    ns = [int(n) for n in args.max_n.split(",")]
    by_k = {}
    for K in ks:
      for N in ns:
        per_task = {}
        agg_emitted = agg_rounds = 0
        for name, task_file in (("single_link_rec", rec_file),
                                ("joint_rec", joint_file),
                                ("single_link_3d_rec", rec3d_file),
                                ("joint_3d_rec", joint3d_file)):
            ds = VQADataset(task_file, input_size=cfg.image_size)
            items = [ds[i] for i in range(len(ds))]
            stats = []
            for it in items:
                # batch-1 greedy through the production lookup path; the
                # vanilla path is the exactness oracle
                spec = model.generate(
                    [it["prompt"]], images=np.stack([it["image"]]),
                    max_gen_len=args.max_gen_len, temperature=0.0,
                    additional_stop_symbols=[conv_sep],
                    draft_k=K, lookup_max_n=N,
                )[0]
                s = dict(model._generator.last_spec_stats)
                vanilla = model.generate(
                    [it["prompt"]], images=np.stack([it["image"]]),
                    max_gen_len=args.max_gen_len, temperature=0.0,
                    additional_stop_symbols=[conv_sep],
                )[0]
                assert spec == vanilla, (spec, vanilla)
                stats.append(s)
                agg_emitted += s["emitted"]
                agg_rounds += s["verify_rounds"]
            per_task[name] = {
                "n": len(stats),
                "emitted": sum(s["emitted"] for s in stats),
                "verify_rounds": sum(s["verify_rounds"] for s in stats),
                "tokens_per_round": round(
                    sum(s["emitted"] for s in stats)
                    / max(sum(s["verify_rounds"] for s in stats), 1), 3
                ),
            }
            print(f"K={K} n={N} {name}: {per_task[name]}", flush=True)

        out = {
            "draft_k": K,
            "max_n": N,
            "per_task": per_task,
            "emitted": agg_emitted,
            "verify_rounds": agg_rounds,
            "tokens_per_round": round(agg_emitted / max(agg_rounds, 1), 3),
            "mean_accepted_per_round": round(
                agg_emitted / max(agg_rounds, 1) - 1.0, 3
            ),
            "exactness": "every speculative output equaled vanilla greedy",
        }
        if args.verify_overhead:
            out["implied_7b_decode_speedup"] = round(
                out["tokens_per_round"] / args.verify_overhead, 3
            )
        by_k[(K, N)] = out
        print(json.dumps(out), flush=True)
    if len(ks) > 1 or len(ns) > 1:
        print(json.dumps({
            f"K{k}_n{n}": v["tokens_per_round"]
            for (k, n), v in by_k.items()
        }))


if __name__ == "__main__":
    main()
