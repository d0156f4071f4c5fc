"""Full-pipeline smoke (run from the repo root): synthetic URDF -> C++
rasterizer renders -> 3D triads -> VQA task streams -> tiny ens5 finetune ->
eval CLI. The strongest single end-to-end check of the framework; used by
the verify skill. Runs on whatever backend jax selects (TPU or CPU)."""

import json, os
from pathlib import Path

import tempfile
root = Path(tempfile.mkdtemp(prefix="a3vlm_e2e_"))
data_dir, render_dir = root/"dataset", root/"render"
obj = data_dir/"101"; obj.mkdir(parents=True, exist_ok=True)

from tests.test_datagen_pipeline import URDF_XML as URDF
obj.joinpath("mobility.urdf").write_text(URDF)
obj.joinpath("meta.json").write_text(json.dumps({"model_cat": "Box"}))
obj.joinpath("semantics.txt").write_text("link_0 heavy box_body\nlink_1 hinge rotation_lid\n")
obj.joinpath("mobility_v2.json").write_text(json.dumps([
  {"id": 0, "parent": -1, "joint": "heavy", "name": "box_body", "jointData": {}},
  {"id": 1, "parent": 0, "joint": "hinge", "name": "rotation_lid",
   "jointData": {"axis": {"origin": [0.5, 0.0, -0.5], "direction": [0.0, 0.0, -1.0]}}}]))

from a3vlm_tpu.datagen.render_robot import render_data_item
from a3vlm_tpu.datagen.point_render import process_one_data
from a3vlm_tpu.datagen.labeler import label_one_data, save_annotations

cam = {"fx": 200.0, "fy": 200.0, "cx": 96.0, "cy": 96.0, "width": 192, "height": 192}
assert render_data_item("101", str(data_dir), str(render_dir), num_poses=3,
                        camera_info=cam, num_joint_value=2, seed=0)
assert process_one_data("101", str(render_dir), sample_size=4096, gaussian_noise=0.0)
tasks = label_one_data("101", None, str(data_dir), str(render_dir), vis_thresh=100)
assert isinstance(tasks, dict)
files = save_annotations(tasks, str(root/"vqa_tasks"), "Box")
print("datagen OK:", len(files), "task files,",
      sum(len(json.load(open(f))) for f in files), "records")

# data config over two produced streams
train_files = [f for f in files if "joint_rec_tasks" in f or "single_link_rec" in f]
cfg = root/"data.yaml"
cfg.write_text("META:\n" + "".join(f" - path: {f}\n   type: image_text\n" for f in train_files))

# train a tiny offline tokenizer
from tokenizers import Tokenizer as HFTok
from tokenizers import decoders, models as tkm, pre_tokenizers, trainers
from transformers import PreTrainedTokenizerFast
corpus = [
    "A chat between a curious human and an artificial intelligence assistant. The assistant gives helpful, detailed, and polite answers to the human's questions.",
    "### Human: Assistant: please provide the joint's type and its 2D rotated bounding box linked to the object part rotation_lid box_body",
    "<rb>revolute</rb><axis>revolute</axis>[0.12,0.34,0.56,0.78,0.90] detect all manipulable object parts 0123456789 .,[]<>#",
] * 50
_t = HFTok(tkm.BPE(unk_token="<unk>"))
_t.pre_tokenizer = pre_tokenizers.Metaspace(); _t.decoder = decoders.Metaspace()
_t.train_from_iterator(corpus, trainers.BpeTrainer(vocab_size=800, special_tokens=["<unk>", "<s>", "</s>"]))
_fast = PreTrainedTokenizerFast(tokenizer_object=_t, unk_token="<unk>", bos_token="<s>", eos_token="</s>")
tok_dir = str(root / "tok"); _fast.save_pretrained(tok_dir)

from a3vlm_tpu import main_finetune
state = main_finetune.main([
  "--tokenizer_path", tok_dir, "--data_config", str(cfg),
  "--dialog", "--tiny_random_model", "--batch_size", "2", "--accum_iter", "1",
  "--epochs", "1", "--warmup_epochs", "0", "--lr", "1e-4", "--max_words", "512",
  "--model_parallel_size", "1", "--checkpointing", "--precision", "bf16",
  "--output_dir", str(root/"train_out"), "--print_freq", "2"])
print("train OK: step", int(state.step))

from a3vlm_tpu import eval_affordance
results_file = eval_affordance.main([
  "--dataset", train_files[0], "--output_dir", str(root/"eval_out"),
  "--tokenizer_path", tok_dir, "--tiny_random_model",
  "--batch_size", "2", "--max_gen_len", "6", "--max_seq_len", "512",
  "--temperature", "0.0", "--max_samples", "2"])
results = json.load(open(results_file))
print("eval OK:", len(results), "results; fail flags:", [r["fail"] for r in results])
print("E2E PIPELINE COMPLETE")