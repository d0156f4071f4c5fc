"""Closed-loop accuracy gate (the reference's implicit quality gate:
eval_affordance_v2.py generation + downstream rotated-IoU scoring of parsed
triads, approximated on synthetic data since released weights are absent).

datagen -> train a tiny ens5 until it memorizes the triad answers for its
training images -> greedy-generate through the real prompt/eval path ->
parse the predictions with the production codecs -> rotated-IoU + joint-type
accuracy against ground truth. This closes the loop over label alignment,
conversation templating, image keying, generation, and the string codecs:
a regression in ANY of them makes exact memorization impossible, which no
format-only golden test can catch.
"""

import json
import math

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def task_files(tmp_path_factory):
    from a3vlm_tpu.datagen.labeler import label_one_data, save_annotations
    from a3vlm_tpu.datagen.point_render import process_one_data
    from a3vlm_tpu.datagen.render_robot import render_data_item

    from tests.test_datagen_pipeline import (
        CAMERA_INFO,
        MOBILITY_V2,
        SEMANTICS,
        URDF_XML,
    )

    tmp = tmp_path_factory.mktemp("gate")
    data_dir, out_dir = tmp / "dataset", tmp / "render"
    obj = data_dir / "101"
    obj.mkdir(parents=True)
    obj.joinpath("mobility.urdf").write_text(URDF_XML)
    obj.joinpath("meta.json").write_text(json.dumps({"model_cat": "Box"}))
    obj.joinpath("semantics.txt").write_text(SEMANTICS)
    obj.joinpath("mobility_v2.json").write_text(json.dumps(MOBILITY_V2))
    assert render_data_item(
        "101", str(data_dir), str(out_dir), num_poses=2,
        camera_info=CAMERA_INFO, num_joint_value=2,
        cam_radius_min=3.0, cam_radius_max=4.0, seed=0,
    )
    assert process_one_data(
        "101", str(out_dir), sample_size=4096, gaussian_noise=0.0, seed=0
    )
    tasks = label_one_data(
        "101", None, str(data_dir), str(out_dir), vis_thresh=100
    )
    files = save_annotations(tasks, str(tmp / "vqa"), "Box")
    rec_file = next(f for f in files if "single_link_rec" in f)
    joint_file = next(
        f for f in files
        if "joint_rec_tasks" in f and "ext" not in f and "sep" not in f
        and "3d" not in f
    )
    rec3d_file = next(f for f in files if "single_link_3d_rec" in f)
    joint3d_file = next(f for f in files if "joint_3d_rec_tasks" in f)
    return tmp, rec_file, joint_file, rec3d_file, joint3d_file


def _train_to_memorization(model, yaml_cfg, max_epochs=400):
    import jax

    from a3vlm_tpu.data.dialog import FinetuneDialogDataset
    from a3vlm_tpu.data.loader import DataLoader
    from a3vlm_tpu.data.sampler import FinetuneDistSampler
    from a3vlm_tpu.data.transforms import get_transform
    from a3vlm_tpu.models import ens5 as ens5_mod
    from a3vlm_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_step,
        next_token_loss,
    )

    cfg = model.cfg
    dataset = FinetuneDialogDataset(
        str(yaml_cfg),
        transform=get_transform("padded_resize", cfg.image_size),
        # 8-corner 3D box answers are ~141 tokens under the tiny BPE —
        # max_words must leave them untruncated after the 135 image words
        max_words=448,
        image_words=model.get_image_words(),
        tokenizer=model.tokenizer,
    )
    bs = 4
    sampler = FinetuneDistSampler(
        dataset, num_replicas=1, rank=0, batch_size=bs, acc_grad=1, seed=0
    )
    loader = DataLoader(dataset, sampler, batch_size=bs, accum_steps=1)
    opt = make_optimizer(
        2e-3, max_grad_norm=8.0, trainable_mask=model.get_trainable_params()
    )

    def loss_fn(params, batch):
        logits = ens5_mod.forward(
            params, cfg, batch["examples"], image=batch.get("image")
        )
        return next_token_loss(
            logits, batch["labels"], vocab_size=model.true_vocab
        )

    step = jax.jit(make_train_step(loss_fn, opt), donate_argnums=0)
    state = TrainState.create(model.params, opt)
    loss = float("inf")
    for epoch in range(max_epochs):
        sampler.set_epoch(epoch, 0)
        # the sampler groups type-homogeneous batches, so convergence must
        # gate on the epoch MAX batch loss — breaking on whichever batch
        # lands last silently under-trains the other task streams (the
        # long 3D answers memorize much later than the 2D boxes; observed
        # as run-to-run 3D parse failures with 2D fully memorized)
        losses = []
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, m = step(state, batch)
            losses.append(m["loss"])
        loss = max(float(v) for v in losses)
        if epoch % 20 == 0:
            print(f"gate train epoch {epoch} max loss {loss:.4f}")
        if loss < 0.002:
            break
    print(f"gate train done: epoch {epoch} max loss {loss:.4f}")
    # deeper memorization margin: the IoU gate sits near its 0.6
    # threshold and XLA-CPU thread scheduling makes reductions only
    # approximately run-to-run deterministic under suite load
    assert loss < 0.03, f"tiny ens5 failed to memorize (final loss {loss})"
    model.params = state.params
    return model


def _score(model, task_file, input_size, with_tag):
    from a3vlm_tpu.codecs.triad import parse_rotated_box, parse_tagged_answer
    from a3vlm_tpu.data.conversation import conv_templates
    from a3vlm_tpu.datagen.utils import rotated_box_iou
    from a3vlm_tpu.eval_affordance import VQADataset

    ds = VQADataset(task_file, input_size=input_size)
    items = [ds[i] for i in range(len(ds))]
    images = np.stack([it["image"] for it in items])
    conv_sep = conv_templates["v1"]().response_end_signal
    raws = model.generate(
        [it["prompt"] for it in items],
        images=images,
        max_gen_len=48,
        temperature=0.0,
        additional_stop_symbols=[conv_sep],
    )
    print("sample raw:", repr(raws[0][:90]))
    print("sample gt :", repr(items[0]["annotation"][:90]))
    ious, types_ok = [], []
    for it, raw in zip(items, raws):
        ans, gt = raw.split("###")[0], it["annotation"]
        if with_tag:
            _, plabel, ans = parse_tagged_answer(ans)
            _, glabel, gt = parse_tagged_answer(gt)
            types_ok.append(plabel == glabel)
        pb, gb = parse_rotated_box(ans), parse_rotated_box(gt)
        if pb is None or gb is None or len(pb) != len(gb):
            ious.append(0.0)
            continue

        def to_px(b):
            return (
                b[0] * 100, b[1] * 100, b[2] * 100, b[3] * 100,
                math.degrees(b[4]),
            )

        ious.append(rotated_box_iou(to_px(pb), to_px(gb)))
    return ious, types_ok


@pytest.fixture(scope="module")
def memorized_model(task_files, tiny_tokenizer_dir):
    """One tiny ens5 trained to memorize BOTH the 2D and the 3D task
    streams — the 2D and 3D gates then score the same closed loop."""
    from a3vlm_tpu.meta import MetaModel
    from a3vlm_tpu.models import ens5 as ens5_mod

    tmp, rec_file, joint_file, rec3d_file, joint3d_file = task_files
    yaml_cfg = tmp / "data.yaml"
    yaml_cfg.write_text(
        "META:\n"
        + "".join(
            f" - path: {f}\n   type: image_text\n"
            for f in (rec_file, joint_file, rec3d_file, joint3d_file)
        )
    )
    cfg = ens5_mod.tiny_ens5_config()
    model = MetaModel(
        "llama_ens5",
        tokenizer_path=tiny_tokenizer_dir,
        with_visual=True,
        max_seq_len=448,
        model_cfg=cfg,
        seed=0,
    )
    return _train_to_memorization(model, yaml_cfg)


def test_closed_loop_triad_accuracy(task_files, memorized_model):
    model = memorized_model
    _, rec_file, joint_file, _, _ = task_files

    ious, _ = _score(model, rec_file, model.cfg.image_size, with_tag=False)
    assert len(ious) >= 4
    assert np.mean(ious) >= 0.6, f"single_link_rec IoU {ious}"

    ious_j, types_ok = _score(
        model, joint_file, model.cfg.image_size, with_tag=True
    )
    assert np.mean(ious_j) >= 0.6, f"joint_rec IoU {ious_j}"
    assert np.mean(types_ok) == 1.0, "joint type mispredicted"


def test_closed_loop_3d_triad_accuracy(task_files, memorized_model):
    """The product of A3VLM is the 3D (B, A, S) triad
    (vqa_task_construction.py:441-501) — close the loop on the 3D box
    (8-corner codec, exact OBB IoU + corner distance) and the 3D axis +
    joint type, through the SAME datagen -> train -> generate -> parse
    path the 2D gate runs."""
    from a3vlm_tpu.codecs.triad import (
        parse_axis_3d,
        parse_bbox_3d_eight_points,
        parse_tagged_answer,
    )
    from a3vlm_tpu.data.conversation import conv_templates
    from a3vlm_tpu.datagen.utils import obb_iou_3d
    from a3vlm_tpu.eval_affordance import VQADataset

    model = memorized_model
    _, _, _, rec3d_file, joint3d_file = task_files
    conv_sep = conv_templates["v1"]().response_end_signal

    def raws_for(task_file):
        ds = VQADataset(task_file, input_size=model.cfg.image_size)
        items = [ds[i] for i in range(len(ds))]
        raws = model.generate(
            [it["prompt"] for it in items],
            images=np.stack([it["image"] for it in items]),
            max_gen_len=170,  # 8-corner answers are ~141 tiny-BPE tokens
            temperature=0.0,
            additional_stop_symbols=[conv_sep],
        )
        return items, [r.split("###")[0] for r in raws]

    # -- 3D box stream: 8-corner parse, corner distance + exact OBB IoU
    items, answers = raws_for(rec3d_file)
    assert len(items) >= 4
    corner_dists, ious3d = [], []
    for it, ans in zip(items, answers):
        pa = parse_bbox_3d_eight_points(ans)
        ga = parse_bbox_3d_eight_points(it["annotation"])
        assert ga is not None
        if pa is None:
            corner_dists.append(np.inf)
            ious3d.append(0.0)
            continue
        corner_dists.append(
            float(np.linalg.norm(pa - ga, axis=-1).mean())
        )
        ious3d.append(obb_iou_3d(pa, ga))
    # median, not mean: at 56-px tiny-tower scale two renders of the same
    # object at nearby joint values can be indistinguishable after the
    # resize, so ONE item may memorize the wrong render's box (observed:
    # dists [23.7, 0, 0, 0] — three exact, one image-confused). The 2D
    # gate absorbs the same effect inside its 0.6 mean-IoU threshold;
    # 3D corner distance has no such slack, so gate on the majority.
    assert np.median(corner_dists) <= 0.1, f"3d corner dists {corner_dists}"
    assert np.median(ious3d) >= 0.5, f"3d box IoU {ious3d}"
    assert np.mean([d <= 0.1 for d in corner_dists]) >= 0.5, corner_dists

    # -- 3D joint stream: tagged joint type + axis endpoints/direction
    items_j, answers_j = raws_for(joint3d_file)
    types_ok, angles = [], []
    for it, ans in zip(items_j, answers_j):
        _, ptype, ans_s = parse_tagged_answer(ans)
        _, gtype, gt_s = parse_tagged_answer(it["annotation"])
        types_ok.append(ptype == gtype)
        pa, ga = parse_axis_3d(ans_s), parse_axis_3d(gt_s)
        if pa is None or ga is None:
            angles.append(180.0)
            continue
        dp, dg = pa[1] - pa[0], ga[1] - ga[0]
        denom = np.linalg.norm(dp) * np.linalg.norm(dg)
        if denom < 1e-9:
            angles.append(180.0)
            continue
        cos = abs(float(np.dot(dp, dg) / denom))
        angles.append(math.degrees(math.acos(min(cos, 1.0))))
    assert np.mean(types_ok) == 1.0, "3d joint type mispredicted"
    # median for the same render-confusion reason as the box stream (a
    # confused item still names the right joint type — same link — but
    # its axis endpoints belong to the other render's camera)
    assert np.median(angles) <= 10.0, f"3d axis angle errors {angles}"
