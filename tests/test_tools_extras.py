"""Tests for tools CLIs, streaming datasets, datagen utils/extras, and the
two-stage demo builder + grounding banks + visualizer."""

import json
import os
import pickle

import numpy as np
import pytest

import jax


# -- tools ---------------------------------------------------------------------


def test_convert_weights_to_hf_cli(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from a3vlm_tpu.checkpoint.export import export_consolidated
    from a3vlm_tpu.config import ModelArgs
    from a3vlm_tpu.models import llama
    from a3vlm_tpu.tools.convert_weights_to_hf import convert

    tiny = ModelArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=4,
                     vocab_size=64, multiple_of=8, max_seq_len=32)
    params = llama.init_llama_params(jax.random.PRNGKey(0), tiny)
    ckpt = tmp_path / "ckpt"
    export_consolidated(params, str(ckpt), mp_size=2)

    out = convert([str(ckpt)], str(tmp_path / "hf"), n_layers=2, n_heads=4)
    cfg = json.load(open(tmp_path / "hf" / "config.json"))
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        tie_word_embeddings=False, attention_bias=False,
    ))
    sd = torch.load(out, weights_only=True)
    hf.load_state_dict(sd, strict=True)
    # logits parity with the source params
    import jax.numpy as jnp

    tokens = np.array([[1, 5, 9]], np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(tokens)).logits.numpy()
    got = np.asarray(
        llama.forward_train(params, tiny, jnp.asarray(tokens, jnp.int32))
    )
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_weight_operate_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from a3vlm_tpu.tools.weight_operate import operate

    base_dir = tmp_path / "base"
    ft_dir = tmp_path / "ft"
    base_dir.mkdir()
    ft_dir.mkdir()
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 4)).astype(np.float32)
    fn = "consolidated.00-of-01.model.pth"
    torch.save({"model": {"llma.x.weight": torch.from_numpy(w)}},
               base_dir / fn)
    torch.save({"model": {"llma.x.weight": torch.from_numpy(w + 1.0)}},
               ft_dir / fn)

    operate(str(base_dir), str(ft_dir), str(tmp_path / "diff"), "extract")
    diff = torch.load(
        tmp_path / "diff" / "consolidated.00-of-01.model-diff.pth",
        weights_only=True,
    )
    np.testing.assert_allclose(
        diff["model"]["llma.x.weight"].numpy(), np.ones((4, 4)), atol=1e-6
    )
    operate(str(base_dir), str(tmp_path / "diff"), str(tmp_path / "restored"),
            "apply")
    restored = torch.load(
        tmp_path / "restored" / fn, weights_only=True
    )
    np.testing.assert_allclose(
        restored["model"]["llma.x.weight"].numpy(), w + 1.0, atol=1e-6
    )


def test_generate_packed_data_and_stream(tmp_path, tiny_tokenizer):
    from a3vlm_tpu.data.falcon_stream import (
        FalconPackedDataset,
        FalconStreamDataset,
    )
    from a3vlm_tpu.tools.generate_packed_data import pack_file

    text = tmp_path / "docs.txt"
    text.write_text("\n".join(["Hi my darling " * 5] * 20))
    out = tmp_path / "packed.pkl"
    n = pack_file(str(text), str(out), tiny_tokenizer, block_size=32)
    assert n > 0
    with open(out, "rb") as f:
        blocks = pickle.load(f)
    assert all(len(b) == 32 for b in blocks)

    ds = FalconPackedDataset([str(out)])
    rows = list(ds)
    assert len(rows) == n and rows[0].shape == (32,)

    # resume from mid-state skips consumed rows
    ds2 = FalconPackedDataset([str(out)])
    ds2.set_state({"file_idx": 0, "row_idx": 2})
    rows2 = list(ds2)
    assert len(rows2) == n - 2
    np.testing.assert_array_equal(rows2[0], rows[2])

    # streaming (jsonl) variant with 2-process sharding
    jl = tmp_path / "docs.jsonl"
    jl.write_text(
        "\n".join(json.dumps({"content": "Hi my darling " * 3}) for _ in range(6))
    )
    s0 = FalconStreamDataset([str(jl), str(text)], tiny_tokenizer,
                             seq_len=16, process_rank=0, num_processes=2)
    s1 = FalconStreamDataset([str(jl), str(text)], tiny_tokenizer,
                             seq_len=16, process_rank=1, num_processes=2)
    assert [f for _, f in s0.own_files()] != [f for _, f in s1.own_files()]
    assert next(iter(s0)).shape == (16,)


def test_data_conversion_recipes():
    from a3vlm_tpu.tools.data_conversion import (
        gorilla_to_alpaca,
        llava_to_single_turn,
    )

    recs = [
        {
            "image": "x.png",
            "conversations": [
                {"from": "human", "value": "<image> what?"},
                {"from": "gpt", "value": "a box"},
                {"from": "human", "value": "sure?"},
                {"from": "gpt", "value": "yes"},
            ],
        }
    ]
    out = llava_to_single_turn(recs)
    assert len(out) == 2
    assert out[0] == {"instruction": "what?", "input": "", "output": "a box",
                      "image": "x.png"}

    g = gorilla_to_alpaca(
        [{"code": "###Instruction: call api ###Output: x",
          "api_call": "api.call()"}]
    )
    assert g[0]["instruction"] == "call api"
    assert g[0]["output"] == "api.call()"


# -- datagen utils -----------------------------------------------------------------


def test_rotated_box_iou():
    from a3vlm_tpu.datagen.utils import rotated_box_iou

    same = rotated_box_iou([50, 50, 20, 10, 0], [50, 50, 20, 10, 0])
    assert same == pytest.approx(1.0, abs=1e-3)
    # identical box rotated 90deg: w x h swaps -> IoU = 10*10/ (2*200-100)
    rot = rotated_box_iou([50, 50, 20, 10, 0], [50, 50, 20, 10, 90])
    assert rot == pytest.approx(100 / 300, abs=0.02)
    assert rotated_box_iou([0, 0, 10, 10, 0], [100, 100, 10, 10, 0]) == 0.0


def test_intersect_line_bbox():
    from a3vlm_tpu.datagen.utils import intersect_line_bbox

    hit = intersect_line_bbox([0, 0], [1, 0], [10, 0, 4, 4])
    assert hit is not None and hit[0] == pytest.approx(8.0)
    assert intersect_line_bbox([0, 10], [1, 0], [10, 0, 4, 4]) is None


def test_depth_colorize_and_ply(tmp_path):
    from a3vlm_tpu.datagen.utils import convert_depth_to_color, read_ply_ascii

    depth = np.zeros((8, 8), np.uint16)
    depth[2:6, 2:6] = 1000
    color = convert_depth_to_color(depth)
    assert color.shape == (8, 8, 3)
    assert (color[0, 0] == 0).all()

    from a3vlm_tpu.datagen.point_render import _save_ply

    pts = np.random.default_rng(0).standard_normal((5, 3))
    _save_ply(str(tmp_path / "x.ply"), pts, np.zeros((5, 3)),
              np.full((5, 3), 128.0))
    back = read_ply_ascii(str(tmp_path / "x.ply"))
    assert back.shape == (5, 9)
    np.testing.assert_allclose(back[:, :3], pts, atol=1e-4)


# -- demo builder --------------------------------------------------------------------


def test_two_stage_demo_builder(tmp_path):
    from a3vlm_tpu.datagen.create_demo_json import (
        create_json_step1,
        create_json_step2,
        parse_boxes_from_answer,
    )

    root = tmp_path
    img_dir = root / "eval_prepare" / "obj1"
    img_dir.mkdir(parents=True)
    from PIL import Image

    Image.new("RGB", (32, 32)).save(img_dir / "color.png")
    step1 = create_json_step1(str(root))
    tasks = json.load(open(step1))
    assert len(tasks) == 1
    assert tasks[0]["conversations"][0]["value"].startswith(
        "Detect all manipulable"
    )

    # fake a stage-1 result with two 8-point boxes
    one_box = "[" + ",".join(["[10.00,20.00,30.00]"] * 8) + "]"
    results = [{"image": tasks[0]["image"],
                "answer": f"<box>door</box>{one_box},<box>lid</box>{one_box}"}]
    res_file = root / "step1.json"
    res_file.write_text(json.dumps(results))
    step2 = create_json_step2(str(res_file), str(root / "step2.json"))
    t2 = json.load(open(step2))
    assert len(t2) == 2
    assert "3D axis" in t2[0]["conversations"][0]["value"]
    assert len(parse_boxes_from_answer(results[0]["answer"])) == 2


# -- grounding banks ----------------------------------------------------------------


def test_grounding_bank_generation_and_labeler_key(tmp_path):
    from a3vlm_tpu.datagen.grounding_tasks import generate_bank_for_object

    obj = tmp_path / "obj" / "101"
    obj.mkdir(parents=True)
    (obj / "mobility.urdf").write_text(
        '<robot name="b"><link name="link_0"/><link name="link_1"/>'
        '<joint name="j" type="revolute"><parent link="link_0"/>'
        '<child link="link_1"/><axis xyz="1 0 0"/>'
        '<limit lower="0" upper="1"/></joint></robot>'
    )
    (obj / "semantics.txt").write_text(
        "link_0 heavy box_body\nlink_1 hinge rotation_lid\n"
    )
    (obj / "meta.json").write_text(json.dumps({"model_cat": "Box"}))
    path = generate_bank_for_object(
        str(tmp_path / "obj"), "101", str(tmp_path / "banks")
    )
    assert path is not None
    bank = json.load(open(path))
    assert "Box" in bank and len(bank["Box"]) > 0
    task = next(iter(bank["Box"].values()))
    assert {"description", "actions"} <= set(task)
    assert any("closed_rotation_lid" in a for t in bank["Box"].values()
               for a in t["actions"])

    # the labeler must find the bank by its idx_str key
    from a3vlm_tpu.datagen.labeler import PartNetLabeler

    labeler = PartNetLabeler(str(tmp_path / "banks"))
    labeler.semantic_data = [
        {"link_name": "link_0", "joint_type": "heavy",
         "semantic": "box_body"},
        {"link_name": "link_1", "joint_type": "hinge",
         "semantic": "rotation_lid"},
    ]
    labeler.object_cato = "Box"
    found = labeler._load_grounding_tasks()
    assert found is not None and len(found) > 0


# -- visualizer --------------------------------------------------------------------


def test_annotation_visualizer(tmp_path):
    from PIL import Image

    from a3vlm_tpu.datagen.annotation_visualizer import visualize_task_file

    img = tmp_path / "img.png"
    Image.new("RGB", (64, 64), (10, 10, 10)).save(img)
    one_box = "[" + ",".join(["[50.00,50.00,40.00]"] * 8) + "]"
    tasks = [
        {"image": str(img), "conversations": [
            {"from": "human", "value": "q"},
            {"from": "gpt", "value": "<axis>revolute</axis>"
             "[10.00,10.00,50.00,90.00,90.00,50.00]"}]},
        {"image": str(img), "conversations": [
            {"from": "human", "value": "q"},
            {"from": "gpt", "value": one_box}]},
        {"image": str(img), "conversations": [
            {"from": "human", "value": "q"},
            {"from": "gpt", "value": "[0.50,0.50,0.30,0.20,0.00]"}]},
    ]
    tf = tmp_path / "tasks.json"
    tf.write_text(json.dumps(tasks))
    written = visualize_task_file(str(tf), str(tmp_path / "vis"),
                                  sample_num=3)
    assert len(written) == 3
    for w in written:
        assert os.path.getsize(w) > 0


def test_colorize_seg_and_csv_index(tmp_path):
    import cv2

    from a3vlm_tpu.datagen.texture_aug import (
        colorize_seg_ade,
        construct_dataset_index,
    )

    mask = np.zeros((16, 16), np.uint8)
    mask[4:8] = 1
    mask[8:12] = 2
    seg = colorize_seg_ade(mask)
    assert seg.shape == (16, 16, 3)
    assert not (seg[5, 5] == seg[9, 9]).all()

    obj = tmp_path / "render" / "101"
    (obj / "depth_images").mkdir(parents=True)
    (obj / "mask").mkdir()
    (obj / "meta.json").write_text(json.dumps({"model_cat": "Box"}))
    cv2.imwrite(str(obj / "depth_images" / "000000.png"), mask)
    cv2.imwrite(str(obj / "mask" / "000000.png"), mask)
    prompts = tmp_path / "prompts.json"
    prompts.write_text(json.dumps({"Box": ["a wooden box", "a metal box"]}))
    n = construct_dataset_index(
        str(tmp_path / "render"), str(prompts), str(tmp_path / "index.csv")
    )
    assert n == 1
    import csv as _csv

    rows = list(_csv.DictReader(open(tmp_path / "index.csv")))
    assert rows[0]["category"] == "Box"
    assert "box" in rows[0]["prompt"]


def test_run_controlnet_loop_with_stub_pipeline(tmp_path):
    """The SD+ControlNet generation LOOP (controlnet_render.py:122-194)
    executes end-to-end with an injected stub pipeline: reads the CSV
    index, conditions on the depth/seg image, writes
    {object}/controlnet_images*/{frame}_{i}.png."""
    import cv2

    from a3vlm_tpu.datagen.texture_aug import (
        construct_dataset_index,
        run_controlnet,
    )

    mask = np.zeros((16, 16), np.uint8)
    mask[4:12] = 3
    obj = tmp_path / "render" / "202"
    (obj / "depth_images").mkdir(parents=True)
    (obj / "mask").mkdir()
    (obj / "meta.json").write_text(json.dumps({"model_cat": "Door"}))
    cv2.imwrite(str(obj / "depth_images" / "000001.png"), mask)
    cv2.imwrite(str(obj / "mask" / "000001.png"), mask)
    prompts = tmp_path / "prompts.json"
    prompts.write_text(json.dumps({"Door": ["a red door"]}))
    csv_path = tmp_path / "index.csv"
    construct_dataset_index(
        str(tmp_path / "render"), str(prompts), str(csv_path)
    )

    from PIL import Image

    class StubResult:
        def __init__(self, images):
            self.images = images

    calls = []

    def stub_pipe(prompt, image=None, num_images_per_prompt=1):
        calls.append((prompt, image.size))
        return StubResult(
            [Image.new("RGB", (16, 16), (i * 40, 0, 0))
             for i in range(num_images_per_prompt)]
        )

    out_root = tmp_path / "out"
    run_controlnet(str(csv_path), str(out_root), control="depth",
                   images_per_prompt=2, pipe=stub_pipe)
    assert calls and calls[0][0] == "a red door"
    outs = sorted((out_root / "202" / "controlnet_images").iterdir())
    assert [p.name for p in outs] == ["1_0.png", "1_1.png"]

    run_controlnet(str(csv_path), str(out_root), control="seg",
                   images_per_prompt=1, pipe=stub_pipe)
    segs = sorted((out_root / "202" / "controlnet_images_seg").iterdir())
    assert [p.name for p in segs] == ["1_0.png"]


def test_read_img_general_s3_route(tmp_path):
    """The ceph/petrel s3:// route (reference data_reader.py:7-28) through
    a registered object-store client."""
    import io

    from PIL import Image

    from a3vlm_tpu.data import data_reader

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (0, 128, 0)).save(buf, format="PNG")

    class FakeClient:
        def get(self, path):
            assert path.startswith("s3://")
            return buf.getvalue()

    data_reader.set_object_store_client(FakeClient())
    try:
        img = data_reader.read_img_general("s3://bucket/img.png")
        assert img.size == (8, 8)
        # local paths never touch the client
        p = tmp_path / "local.png"
        Image.new("RGB", (4, 4)).save(p)
        assert data_reader.read_img_general(str(p)).size == (4, 4)
    finally:
        data_reader.set_object_store_client(None)


def test_generate_openai_tasks_with_stub_client(tmp_path):
    """The GPT-4 grounding path (openai_grounding_tasks.py:104-151) with an
    injected chat client: prompt substitution, ```json fence stripping,
    history merge, max_tasks skip, and failure capture."""
    from a3vlm_tpu.datagen.grounding_tasks import generate_openai_tasks

    obj = tmp_path / "obj" / "102"
    obj.mkdir(parents=True)
    (obj / "mobility.urdf").write_text(
        '<robot name="b"><link name="link_0"/><link name="link_1"/>'
        '<joint name="j" type="revolute"><parent link="link_0"/>'
        '<child link="link_1"/><axis xyz="1 0 0"/>'
        '<limit lower="0" upper="1"/></joint></robot>'
    )
    (obj / "semantics.txt").write_text(
        "link_0 heavy box_body\nlink_1 hinge rotation_lid\n"
    )
    (obj / "meta.json").write_text(json.dumps({"model_cat": "Box"}))

    prompts = []

    def stub(system_msg, user_msg):
        prompts.append(user_msg)
        return (
            "```json\n"
            + json.dumps({"Box": {"open_lid": {
                "description": "Open the lid.",
                "actions": ["flap_open[rotation_lid]", "StatusComplete"],
            }}})
            + "\n```"
        )

    banks = tmp_path / "banks"
    st = generate_openai_tasks(str(tmp_path / "obj"), "102", str(banks),
                               client=stub)
    assert st == "Success"
    assert "Box" in prompts[0] and "rotation_lid" in prompts[0]
    out = json.load(open(next(banks.glob("Box_*.json"))))
    assert out["Box"]["open_lid"]["actions"][0] == "flap_open[rotation_lid]"

    # second call: history merge keeps the old task alongside the new one
    def stub2(system_msg, user_msg):
        assert "open_lid" in user_msg  # history surfaced in the prompt
        return json.dumps({"Box": {"close_lid": {
            "description": "Close the lid.",
            "actions": ["flap_close[rotation_lid]", "StatusComplete"],
        }}})

    st = generate_openai_tasks(str(tmp_path / "obj"), "102", str(banks),
                               client=stub2)
    assert st == "Success"
    out = json.load(open(next(banks.glob("Box_*.json"))))
    assert {"open_lid", "close_lid"} <= set(out["Box"])

    # max_tasks reached -> SKIP without calling the client
    st = generate_openai_tasks(
        str(tmp_path / "obj"), "102", str(banks),
        client=lambda *a: (_ for _ in ()).throw(AssertionError("called")),
        max_tasks=2,
    )
    assert st == "SKIP"

    # unparseable response -> Fail + captured raw text
    st = generate_openai_tasks(
        str(tmp_path / "obj"), "102", str(tmp_path / "banks2"),
        client=lambda *a: "not json at all",
    )
    assert st == "Fail"
    fails = list((tmp_path / "banks2" / "failures").iterdir())
    assert len(fails) == 1 and "not json" in fails[0].read_text()


def test_score_results_metrics(tmp_path):
    """The scoring CLI computes the paper-style metric families from a
    results JSON: perfect predictions score 1.0/0.0-error; off predictions
    degrade; parse failures are counted."""
    from a3vlm_tpu.tools.score_results import main as score_main

    box = "[0.50,0.50,0.30,0.20,0.00]"
    box_shift = "[0.80,0.80,0.30,0.20,0.00]"
    corners = "[" + ",".join(["[50.00,50.00,40.00]"] * 8) + "]"
    axis = "[10.00,10.00,50.00,90.00,90.00,50.00]"
    axis_rot = "[10.00,10.00,50.00,10.00,90.00,50.00]"
    records = [
        # 2D REC exact + tagged type
        {"question": "Please provide the joint's type and its 2D rotated "
         "bounding box", "answer": f"<rb>revolute</rb>{box}",
         "format_answer": f"<rb>revolute</rb>{box}",
         "annotation": f"<rb>revolute</rb>{box}", "image": "a",
         "fail": False},
        # 2D REC miss
        {"question": "2D rotated bounding box of the door",
         "answer": box_shift, "format_answer": box_shift,
         "annotation": box, "image": "a", "fail": False},
        # 3D box exact
        {"question": "provide the 3D bounding box",
         "answer": corners, "format_answer": corners,
         "annotation": corners, "image": "a", "fail": False},
        # axis: rotated prediction
        {"question": "provide the 3D axis", "answer": axis_rot,
         "format_answer": axis_rot, "annotation": axis, "image": "a",
         "fail": False},
        # status correct
        {"question": "What is the articulation status? Opened or Closed",
         "answer": "Opened", "format_answer": "Opened",
         "annotation": "Opened", "image": "a", "fail": False},
        # detection: one of two boxes found
        {"question": "Detect all manipulable object parts",
         "answer": box, "format_answer": box,
         "annotation": f"{box}{box_shift}", "image": "a", "fail": False},
        # 2D parse failure
        {"question": "2D rotated bounding box", "answer": "garbage",
         "format_answer": "garbage", "annotation": box, "image": "a",
         "fail": True},
    ]
    f = tmp_path / "results.json"
    f.write_text(json.dumps(records))
    summary = score_main([str(f), "--out", str(tmp_path / "sum.json")])

    b2 = summary["box2d"]
    assert b2["n"] == 3 and b2["parse_fail"] == 1
    assert b2["acc_at_50"] == pytest.approx(1 / 3, abs=1e-3)
    assert b2["joint_type_acc"] == 1.0
    b3 = summary["box3d"]
    assert b3["mean_corner_dist"] == 0.0 and b3["mean_center_err"] == 0.0
    ax = summary["axis"]
    assert 30.0 < ax["mean_axis_angle_deg"] < 60.0
    assert summary["status"]["status_acc"] == 1.0
    det = summary["detection"]
    assert det["precision_at_50"] == 1.0 and det["recall_at_50"] == 0.5
    assert (tmp_path / "sum.json").exists()


def test_score_results_detection3d_and_parse_fail_consistency(tmp_path):
    """The 3D detect-all task must NOT leak into the 2D detection bucket
    (its 8-corner answers would corrupt the shared precision/recall), and
    parse failures count as misses in every threshold accuracy."""
    from a3vlm_tpu.tools.score_results import main as score_main

    def corners8(v):
        return "[" + ",".join([f"[{v:.2f},{v:.2f},{v:.2f}]"] * 8) + "]"

    q3d = ("Detect all manipulable object parts and provide their 3D "
           "bounding boxes.")
    records = [
        # detection3d: one of two GT boxes matched (corner dist 0 vs huge)
        {"question": q3d,
         "answer": f"<box>door</box>{corners8(50.0)}",
         "format_answer": f"<box>door</box>{corners8(50.0)}",
         "annotation": f"<box>door</box>{corners8(50.0)},"
                       f"<box>drawer</box>{corners8(90.0)}.",
         "image": "a", "fail": False},
        # box3d parse failure — must drag acc_corner_at_0p25 to 0.5
        {"question": "provide the 3D bounding box", "answer": "garbage",
         "format_answer": "garbage", "annotation": corners8(50.0),
         "image": "a", "fail": True},
        # box3d exact
        {"question": "provide the 3D bounding box",
         "answer": corners8(50.0), "format_answer": corners8(50.0),
         "annotation": corners8(50.0), "image": "a", "fail": False},
        # axis degenerate direction — parse_fail, no mean contamination
        {"question": "provide the 3D axis",
         "answer": "[10.00,10.00,50.00,10.00,10.00,50.00]",
         "format_answer": "[10.00,10.00,50.00,10.00,10.00,50.00]",
         "annotation": "[10.00,10.00,50.00,90.00,90.00,50.00]",
         "image": "a", "fail": False},
        # axis exact
        {"question": "provide the 3D axis",
         "answer": "[10.00,10.00,50.00,90.00,90.00,50.00]",
         "format_answer": "[10.00,10.00,50.00,90.00,90.00,50.00]",
         "annotation": "[10.00,10.00,50.00,90.00,90.00,50.00]",
         "image": "a", "fail": False},
    ]
    f = tmp_path / "r3d.json"
    f.write_text(json.dumps(records))
    summary = score_main([str(f)])

    assert "detection" not in summary  # nothing misrouted to the 2D bucket
    d3 = summary["detection3d"]
    assert d3["precision_cd0p25"] == 1.0 and d3["recall_cd0p25"] == 0.5
    b3 = summary["box3d"]
    assert b3["parse_fail"] == 1
    assert b3["acc_corner_at_0p25"] == 0.5  # failure charged as a miss
    assert b3["mean_corner_dist"] == 0.0  # means over parseable only
    ax = summary["axis"]
    assert ax["parse_fail"] == 1
    assert ax["acc_axis_at_10deg"] == 0.5
    assert ax["mean_axis_angle_deg"] == 0.0  # degenerate rec excluded
    assert ax["mean_endpoint_err"] == 0.0


def _box_corners_3d(center, axes, half):
    import numpy as np

    out = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                out.append(center + axes @ (np.array([sx, sy, sz]) * half))
    return np.array(out)


def test_obb_iou_3d_exact_vs_monte_carlo():
    """Exact convex-polytope 3D OBB IoU pinned against Monte-Carlo
    sampling within 1% (the paper's 3D detection metric family is
    IoU-based; corner-distance stays as a proxy alongside)."""
    import numpy as np

    from a3vlm_tpu.datagen.utils import _box_halfspaces, obb_iou_3d

    def rand_rot(rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)],
        ])

    I = np.eye(3)
    a = _box_corners_3d(np.zeros(3), I, np.array([0.5, 0.5, 0.5]))
    assert obb_iou_3d(a, a) == pytest.approx(1.0, abs=1e-9)
    b = _box_corners_3d(np.array([0.5, 0, 0]), I, np.array([0.5, 0.5, 0.5]))
    assert obb_iou_3d(a, b) == pytest.approx(1 / 3, abs=1e-9)
    far = _box_corners_3d(np.full(3, 5.0), I, np.array([0.5, 0.5, 0.5]))
    assert obb_iou_3d(a, far) == 0.0
    # corner-order invariance (parsers provide no canonical order)
    import numpy.random as npr

    perm = np.random.default_rng(1).permutation(8)
    th = np.pi / 4
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    c = _box_corners_3d(np.zeros(3), R, np.array([0.5, 0.5, 0.5]))
    assert obb_iou_3d(a[perm], c) == pytest.approx(obb_iou_3d(a, c))
    # 45-deg z-rotation of a unit cube: analytic octagon overlap
    assert obb_iou_3d(a, c) == pytest.approx(np.sqrt(2) / 2, abs=1e-9)

    pts = np.random.default_rng(0).uniform(-1.5, 1.5, (400000, 3))
    for seed in range(6):
        rng = np.random.default_rng(seed + 10)
        # elongated extents included — they broke the naive nearest-3
        # corner adjacency this implementation replaces
        b1 = _box_corners_3d(rng.uniform(-0.2, 0.2, 3), rand_rot(rng),
                             rng.uniform(0.1, 0.6, 3))
        b2 = _box_corners_3d(rng.uniform(-0.2, 0.2, 3), rand_rot(rng),
                             rng.uniform(0.1, 0.6, 3))
        exact = obb_iou_3d(b1, b2)
        A1, c1 = _box_halfspaces(b1)
        A2, c2 = _box_halfspaces(b2)
        in1 = (pts @ A1.T <= c1).all(1)
        in2 = (pts @ A2.T <= c2).all(1)
        mc = (in1 & in2).sum() / max((in1 | in2).sum(), 1)
        assert exact == pytest.approx(mc, abs=0.01), (seed, exact, mc)


def test_score_results_3d_iou_metrics(tmp_path):
    """box3d reports exact-IoU metrics; detection3d reports IoU-matched
    precision/recall alongside the corner-distance proxies."""
    import numpy as np

    from a3vlm_tpu.tools.score_results import main as score_main

    def fmt(corners):
        return "[" + ",".join(
            f"[{x:.2f},{y:.2f},{z:.2f}]" for x, y, z in corners
        ) + "]"

    I = np.eye(3)
    g = _box_corners_3d(np.array([0.5, 0.5, 0.5]), I, np.full(3, 0.2))
    # shifted by one full extent along x: IoU = 0 but corner dist 0.4
    p_shift = _box_corners_3d(np.array([0.9, 0.5, 0.5]), I, np.full(3, 0.2))
    records = [
        {"question": "provide the 3D bounding box", "answer": fmt(g),
         "format_answer": fmt(g), "annotation": fmt(g), "image": "a",
         "fail": False},
        {"question": "provide the 3D bounding box", "answer": fmt(p_shift),
         "format_answer": fmt(p_shift), "annotation": fmt(g), "image": "a",
         "fail": False},
        {"question": "Detect all manipulable object parts and provide "
         "their 3D bounding boxes.",
         "answer": fmt(g) + fmt(p_shift), "format_answer": None,
         "annotation": fmt(g) + fmt(
             _box_corners_3d(np.full(3, 3.0), I, np.full(3, 0.2))
         ), "image": "a", "fail": False},
    ]
    f = tmp_path / "r.json"
    f.write_text(json.dumps(records))
    summary = score_main([str(f)])
    b3 = summary["box3d"]
    assert b3["miou3d"] == pytest.approx(0.5, abs=1e-6)
    assert b3["acc_iou3d_at_50"] == 0.5 and b3["acc_iou3d_at_25"] == 0.5
    d3 = summary["detection3d"]
    assert d3["precision_iou0p25"] == 0.5  # 1 of 2 predictions matched
    assert d3["recall_iou0p25"] == 0.5     # 1 of 2 GT boxes found


def test_obb_iou_3d_continuity_on_warped_hexahedra():
    """Near-identical warped 8-corner sets (the perspective-projected 3D
    answers are hexahedra, not exact boxes) must keep IoU ~= 1: the axis
    recovery prefers the continuous PCA candidate unless the greedy edge
    set is substantially (>10%) tighter, so a 1e-4 corner perturbation
    cannot flip the chosen axes (a hard argmin measured IoU as low as
    0.76 on such twins)."""
    import numpy as np

    from a3vlm_tpu.datagen.utils import obb_iou_3d

    worst = 1.0
    for s in range(60):
        r = np.random.default_rng(s)
        base = _box_corners_3d(
            r.uniform(-0.2, 0.2, 3), np.eye(3), r.uniform(0.2, 0.6, 3)
        )
        warp = base + r.normal(size=base.shape) * 0.03
        twin = warp + 1e-4 * r.normal(size=base.shape)
        worst = min(worst, obb_iou_3d(warp, twin))
    assert worst >= 0.97, worst
