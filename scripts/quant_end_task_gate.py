"""End-task numerics gate for the opt-in quantized serving modes (W4A8
int-dot decode, W8A8 prefill) — metric DELTAS on the closed accuracy loop,
not logit RMS (round-4 verdict weak #5).

Pipeline: datagen -> tiny ens5 trained to memorization (the accuracy-gate
corpus: real renders, real codecs, real eval path) -> score the 2D rec IoU
and the 3D box corner-dist/exact-IoU four ways:

  dense       bf16 decoder (what training produced)
  int4        exact fused dequant path (the serving default)
  int4+w4a8   per-token int8 activations on decode steps
  int4+w8a8p  scale-folded int8 weights on prefill rows

The gate is the DELTA of each opt-in mode vs the int4-exact base — the
int4 quantization of a barely-memorized tiny model costs whatever it
costs (shared by all three arms); the A8 modes must not degrade the
end-task metrics beyond tolerance. CPU run uses the XLA emulations of
both kernels (bit-matching the TPU integer math).

    python scripts/quant_end_task_gate.py [--max_epochs 400]
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

from spec_acceptance import build_tasks, build_tokenizer  # noqa: E402


def score_2d(model, task_file, conv_sep):
    import math

    from a3vlm_tpu.codecs.triad import parse_rotated_box
    from a3vlm_tpu.datagen.utils import rotated_box_iou
    from a3vlm_tpu.eval_affordance import VQADataset

    ds = VQADataset(task_file, input_size=model.cfg.image_size)
    items = [ds[i] for i in range(len(ds))]
    raws = model.generate(
        [it["prompt"] for it in items],
        images=np.stack([it["image"] for it in items]),
        max_gen_len=48, temperature=0.0,
        additional_stop_symbols=[conv_sep],
    )
    ious = []
    for it, raw in zip(items, raws):
        pb = parse_rotated_box(raw.split("###")[0])
        gb = parse_rotated_box(it["annotation"])
        if pb is None or gb is None:
            ious.append(0.0)
            continue

        def px(b):
            return (b[0] * 100, b[1] * 100, b[2] * 100, b[3] * 100,
                    math.degrees(b[4]))

        ious.append(rotated_box_iou(px(pb), px(gb)))
    return float(np.mean(ious))


def score_3d(model, task_file, conv_sep):
    from a3vlm_tpu.codecs.triad import parse_bbox_3d_eight_points
    from a3vlm_tpu.datagen.utils import obb_iou_3d
    from a3vlm_tpu.eval_affordance import VQADataset

    ds = VQADataset(task_file, input_size=model.cfg.image_size)
    items = [ds[i] for i in range(len(ds))]
    raws = model.generate(
        [it["prompt"] for it in items],
        images=np.stack([it["image"] for it in items]),
        max_gen_len=170, temperature=0.0,
        additional_stop_symbols=[conv_sep],
    )
    ious = []
    for it, raw in zip(items, raws):
        pa = parse_bbox_3d_eight_points(raw.split("###")[0])
        ga = parse_bbox_3d_eight_points(it["annotation"])
        ious.append(0.0 if pa is None or ga is None else obb_iou_3d(pa, ga))
    return float(np.mean(ious))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_epochs", type=int, default=400)
    ap.add_argument("--tol", type=float, default=0.05,
                    help="max allowed end-task metric drop of an A8 mode "
                    "vs the int4-exact base")
    args = ap.parse_args()

    import tempfile

    from a3vlm_tpu.data.conversation import conv_templates
    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.models import ens5 as ens5_mod
    from a3vlm_tpu.ops import quant_matmul as qm
    from tests.test_accuracy_gate import _train_to_memorization

    tmp = tempfile.mkdtemp(prefix="quant_gate_")
    tok_dir = build_tokenizer(tmp)
    rec_file, _, rec3d_file, _ = build_tasks(tmp)
    yaml_cfg = os.path.join(tmp, "data.yaml")
    open(yaml_cfg, "w").write(
        "META:\n" + "".join(
            f" - path: {f}\n   type: image_text\n"
            for f in (rec_file, rec3d_file)
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

    def run(label):
        # fresh traces per arm: the W4A8/W8A8P knobs are trace-time
        jax.clear_caches()
        model._generator = None
        out = {
            "rec_2d_miou": round(score_2d(model, rec_file, conv_sep), 4),
            "rec_3d_miou3d": round(score_3d(model, rec3d_file, conv_sep), 4),
        }
        print(f"{label}: {out}", flush=True)
        return out

    results = {"dense": run("dense")}
    model.quantize(bits=4)
    results["int4"] = run("int4")
    qm.W4A8_DECODE = True
    results["int4_w4a8"] = run("int4_w4a8")
    qm.W4A8_DECODE = False
    min_m0 = qm.W8A8_PREFILL_MIN_M
    qm.W8A8_PREFILL = True
    # tiny prompts are ~220 rows; engage the path at the tiny scale
    qm.W8A8_PREFILL_MIN_M = 64
    results["int4_w8a8p"] = run("int4_w8a8p")
    qm.W8A8_PREFILL = False
    qm.W8A8_PREFILL_MIN_M = min_m0

    base = results["int4"]
    verdicts = {}
    for mode in ("int4_w4a8", "int4_w8a8p"):
        deltas = {
            k: round(results[mode][k] - base[k], 4) for k in base
        }
        ok = all(d >= -args.tol for d in deltas.values())
        verdicts[mode] = {"deltas_vs_int4": deltas, "pass": ok}
    print(json.dumps({"results": results, "verdicts": verdicts}))
    assert all(v["pass"] for v in verdicts.values()), verdicts


if __name__ == "__main__":
    main()
