"""End-to-end datagen pipeline on a synthetic PartNet-Mobility-style object:
urdf_fixer -> render_robot -> point_render -> labeler -> VQA task JSONs,
checking artifact structure and the task-string formats."""

import json
import os

import numpy as np
import pytest

from a3vlm_tpu.datagen.labeler import (
    label_one_data,
    save_annotations,
    split_train_val,
)
from a3vlm_tpu.datagen.point_render import process_one_data
from a3vlm_tpu.datagen.render_robot import render_data_item

URDF_XML = """<?xml version="1.0"?>
<robot name="box_object">
  <link name="link_0">
    <visual><geometry><box size="1 1 1"/></geometry></visual>
    <collision><geometry><box size="1 1 1"/></geometry></collision>
  </link>
  <link name="link_1">
    <visual><origin xyz="0 0.5 0.1"/><geometry><box size="1 1 0.2"/></geometry></visual>
    <collision><origin xyz="0 0.5 0.1"/><geometry><box size="1 1 0.2"/></geometry></collision>
  </link>
  <joint name="joint_1" type="revolute">
    <origin xyz="0 -0.5 0.5"/>
    <axis xyz="1 0 0"/>
    <parent link="link_0"/>
    <child link="link_1"/>
    <limit lower="0" upper="1.2"/>
  </joint>
</robot>
"""

MOBILITY_V2 = [
    {"id": 0, "parent": -1, "joint": "heavy", "name": "box_body",
     "jointData": {}},
    {"id": 1, "parent": 0, "joint": "hinge", "name": "rotation_lid",
     "jointData": {"axis": {"origin": [0.5, 0.0, -0.5],
                            "direction": [0.0, 0.0, -1.0]}}},
]

SEMANTICS = "link_0 heavy box_body\nlink_1 hinge rotation_lid\n"

CAMERA_INFO = {
    "fx": 200.0, "fy": 200.0, "cx": 96.0, "cy": 96.0,
    "width": 192, "height": 192,
}


@pytest.fixture(scope="module")
def rendered_object(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("datagen")
    data_dir = tmp / "dataset"
    out_dir = tmp / "render_out"
    obj_dir = data_dir / "101"
    obj_dir.mkdir(parents=True)
    (obj_dir / "mobility.urdf").write_text(URDF_XML)
    (obj_dir / "meta.json").write_text(json.dumps({"model_cat": "Box"}))
    (obj_dir / "semantics.txt").write_text(SEMANTICS)
    (obj_dir / "mobility_v2.json").write_text(json.dumps(MOBILITY_V2))

    ok = render_data_item(
        "101", str(data_dir), str(out_dir),
        num_poses=2, camera_info=CAMERA_INFO, num_joint_value=2,
        cam_radius_min=3.0, cam_radius_max=4.0, seed=0,
    )
    assert ok
    return str(data_dir), str(out_dir)


def test_render_outputs(rendered_object):
    _, out_dir = rendered_object
    obj = os.path.join(out_dir, "101")
    for sub in ("raw_images", "depth_images", "real_depth_images", "mask"):
        files = os.listdir(os.path.join(obj, sub))
        assert len(files) == 4, (sub, files)  # 2 joint values x 2 poses
    with open(os.path.join(obj, "info.json")) as f:
        info = json.load(f)
    assert len(info["camera_poses"]) == 4
    assert "link_1" in info and len(info["link_1"]) == 4
    with open(os.path.join(obj, "annotations.json")) as f:
        annos = json.load(f)
    assert len(annos) > 0
    a = annos[0]
    assert {"bbox", "rot_bbox", "area", "vis_ratio", "center_3d",
            "image_id", "id", "name", "camera_pose"} <= set(a)

    # rendered depth/mask sanity
    import cv2

    depth = cv2.imread(
        os.path.join(obj, "real_depth_images", "000000.png"),
        cv2.IMREAD_ANYDEPTH,
    )
    mask = cv2.imread(
        os.path.join(obj, "mask", "000000.png"), cv2.IMREAD_UNCHANGED
    )
    assert (depth > 0).sum() > 100  # object visible
    assert set(np.unique(mask)) <= {0, 1, 2}
    assert (mask > 0).sum() > 100
    # mask and depth footprints coincide
    np.testing.assert_array_equal(mask > 0, depth > 0)


def test_point_render_labels(rendered_object):
    _, out_dir = rendered_object
    ok = process_one_data(
        "101", out_dir, sample_size=4096, gaussian_noise=0.0,
        export_npy=True, npy_points=512, seed=0,
    )
    assert ok
    obj = os.path.join(out_dir, "101")
    with open(os.path.join(obj, "annotations_3d.json")) as f:
        labels = json.load(f)
    assert len(labels) == 4
    found = [l for l in labels if "1" in l]
    assert found, "movable joint 1 never labeled"
    rec = found[0]["1"]
    assert set(rec) == {"joint_T", "bbox_3d", "itp_points", "name"}
    bbox = np.asarray(rec["bbox_3d"])
    assert bbox.shape == (9,)
    assert np.isfinite(bbox).all()
    extent = bbox[3:6]
    assert (extent > 0.01).all() and (extent < 3.0).all()
    itp = np.asarray(rec["itp_points"])
    assert itp.shape == (2, 3)
    npys = os.listdir(os.path.join(obj, "npy_512"))
    assert len(npys) == 4
    pc = np.load(os.path.join(obj, "npy_512", npys[0]))
    assert pc.shape == (512, 6)


def test_labeler_task_streams(rendered_object):
    data_dir, out_dir = rendered_object
    result = label_one_data(
        "101", None, data_dir, out_dir, vis_thresh=100,
        use_eight_points=True, normalize_output=True,
    )
    assert isinstance(result, dict), result
    # the movable lid must produce the core streams
    assert len(result["single_link_rec_tasks"]) > 0
    assert len(result["joint_rec_tasks"]) > 0
    assert len(result["all_parts_det_tasks"]) > 0
    assert len(result["single_link_3d_rec_tasks"]) > 0
    assert len(result["joint_3d_rec_tasks"]) > 0
    # lid semantic "rotation_lid" is in Box's open/close list -> status tasks
    assert len(result["status_joint_reg_tasks"]) > 0

    rec = result["joint_rec_tasks"][0]
    answer = rec["conversations"][1]["value"]
    assert answer.startswith("<rb>revolute</rb>[")
    rec3d = result["joint_3d_rec_tasks"][0]
    assert "<axis>revolute</axis>[" in rec3d["conversations"][1]["value"]
    det = result["all_parts_det_tasks"][0]["conversations"][1]["value"]
    assert "manipulable object part" in det

    # 8-point 3D box answers parse back to an [8,3] grid in [0,100]
    from a3vlm_tpu.codecs.triad import parse_bbox_3d_eight_points

    box_answer = result["single_link_3d_rec_tasks"][0]["conversations"][1][
        "value"
    ]
    pts = parse_bbox_3d_eight_points(box_answer)
    assert pts is not None and pts.shape == (8, 3)
    assert (pts >= 0).all() and (pts <= 100).all()

    # joint_annotations.json written
    with open(os.path.join(out_dir, "101", "joint_annotations.json")) as f:
        annos = json.load(f)
    assert len(annos) > 0
    assert {"axis_rot_bbox", "child_rot_bbox", "bbox_3d_cam", "closed",
            "joint_type"} <= set(annos[0])


def test_save_annotations_and_split(tmp_path, rendered_object):
    data_dir, out_dir = rendered_object
    result = label_one_data("101", None, data_dir, out_dir, vis_thresh=100)
    files = save_annotations(result, str(tmp_path / "tasks"), "Box")
    assert files
    for f in files:
        with open(f) as fh:
            recs = json.load(fh)
        assert all(
            set(r) == {"image", "conversations"} for r in recs
        )
        n = int(os.path.basename(f).rsplit("_", 1)[1].split(".")[0])
        assert n == len(recs)

    classname = tmp_path / "classes.json"
    classname.write_text(
        json.dumps({"Box": [101, 102], "Oven": [201], "Table": [301]})
    )
    splits = split_train_val(str(classname))
    assert splits["val"] == [201]  # Oven is a holdout class
    assert set(splits["train"]) == {101, 102, 301}
