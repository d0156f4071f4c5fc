"""Golden-value tests pinning the triad string codecs (SURVEY.md §2.3 —
byte-compatibility contract) and the eval-side repair functions."""

import numpy as np

from a3vlm_tpu.codecs import repair, triad
from a3vlm_tpu.codecs import vocab as V
from a3vlm_tpu.codecs.geometry import (
    BBox3D,
    matrix_to_rotvec,
    normalize_and_round_angle,
    project_points,
    rotvec_to_matrix,
)


def test_rotated_box_string():
    # 960x960, no padding: [cx,cy,w,h,angle] / 960, 2 decimals
    s = triad.format_rotated_box([480, 240, 96, 48, 0.7853981])
    assert s == "[0.50,0.25,0.10,0.05,0.79]"


def test_rotated_box_with_padding():
    # pad offsets added to the center only (vqa_task_construction.py:127-139)
    s = triad.format_rotated_box(
        [100, 100, 50, 50, 0.0], image_width=200, image_height=200,
        pad_x0=50, pad_y0=0,
    )
    assert s == "[0.75,0.50,0.25,0.25,0.00]"


def test_joint_answer_string():
    box = triad.format_rotated_box([480, 480, 96, 96, 0.0])
    s = triad.format_joint_answer("revolute", box)
    assert s == "<rb>revolute</rb>[0.50,0.50,0.10,0.10,0.00]"


def test_depth_ext_string():
    assert triad.format_depth_ext(0.125, 0.875) == "[0.12,0.88]"


def test_bbox_3d_9dof_string():
    s = triad.format_bbox_3d([0.1, -0.2, 0.3, 0.4, 0.5, 0.6, 0.0, 0.0, 1.5708])
    assert s == "[0.10,-0.20,0.30,0.40,0.50,0.60,0.00,0.00,1.57]"


def test_bbox_3d_9dof_normalized():
    # center in [-1,1]->[0,100] ints; size [0,2]; rot [-pi,pi]
    s = triad.format_bbox_3d(
        [0.0, 1.0, -1.0, 1.0, 0.0, 2.0, 0.0, np.pi, -np.pi], normalize=True
    )
    assert s == "[50.00,100.00,0.00,50.00,0.00,100.00,50.00,100.00,0.00]"


def _anno_meta():
    intr = np.array([[1000.0, 0, 480], [0, 1000.0, 480], [0, 0, 1]])
    return {
        "intrinsics": intr,
        "camera_pose": np.eye(4),
        "depth_min": 0.5,
        "depth_max": 2.5,
        "img_width": 960,
        "img_height": 960,
    }


def test_bbox_3d_eight_points_roundtrip():
    meta = _anno_meta()
    # unit cube centered 2m in front of the camera (camera looks along +z
    # here since pose=identity and the projection negates x)
    s = triad.format_bbox_3d(
        [0.0, 0.0, 2.0, 0.5, 0.5, 0.5, 0.0, 0.0, 0.0],
        anno_meta=meta, use_eight_points=True,
    )
    pts = triad.parse_bbox_3d_eight_points(s)
    assert pts is not None and pts.shape == (8, 3)
    # all coords in [0,1], centered near (0.5, 0.5)
    assert ((pts >= 0) & (pts <= 1)).all()
    assert abs(pts[:, 0].mean() - 0.5) < 0.02
    assert abs(pts[:, 1].mean() - 0.5) < 0.02
    # depth: cube spans z in [1.75, 2.25] -> normalized (z-0.5)/2
    assert abs(pts[:, 2].min() - (1.75 - 0.5) / 2) < 0.01


def test_axis_string_format():
    meta = _anno_meta()
    s = triad.format_axis_3d(
        np.array([[0.0, 0.0, 2.0], [0.0, 0.5, 2.0]]), meta, normalize=False
    )
    parsed = triad.parse_axis_3d(s)
    assert parsed is not None and parsed.shape == (2, 3)
    full = triad.format_axis_answer("revolute", s)
    assert full.startswith("<axis>revolute</axis>[")
    tag, label, rest = triad.parse_tagged_answer(full)
    assert tag == "axis" and label == "revolute"
    assert rest == s


def test_det_all_answer_counts_and_cap():
    items = [
        {"bbox": [480, 480, 100, 50, 0.0], "link_name": "door"},
        {"bbox": [240, 240, 10, 10, 0.0], "link_name": "knob"},
    ]
    s = triad.det_all_rotated_answer(items)
    assert s.startswith(
        "There are two manipulable object parts with their rotated bounding "
        "boxes: "
    )
    assert "<rb>door</rb>[0.50,0.50,0.10,0.05,0.00]," in s
    assert s.endswith("<rb>knob</rb>[0.25,0.25,0.01,0.01,0.00].")

    one = triad.det_all_rotated_answer(items[:1])
    assert one.startswith(
        "There is one manipulable object part with its rotated bounding box: "
    )

    # cap at the 10 largest by w*h
    many = [
        {"bbox": [480, 480, i + 1, 1, 0.0], "link_name": f"l{i}"}
        for i in range(12)
    ]
    s = triad.det_all_rotated_answer(many)
    assert "l0" not in s and "l1" not in s.replace("l10", "").replace("l11", "")
    assert "ten manipulable" in s


def test_vqa_record_schema():
    rec = triad.vqa_record("img.png", "Q?", "A.")
    assert rec == {
        "image": "img.png",
        "conversations": [
            {"from": "human", "value": "Q?"},
            {"from": "gpt", "value": "A."},
        ],
    }


def test_pad_helper():
    assert triad.get_pad(100, 200) == (50, 0)
    assert triad.get_pad(200, 100) == (0, 50)
    assert triad.get_pad(100, 100) == (0, 0)


# -- repair (eval) ----------------------------------------------------------


def test_format_bounding_box_repair():
    # digit runs >= 4 get a decimal before the last 3 digits; magnitude
    # renormalization brings values into [0,1]
    # decimals are stripped to digit runs first, then renormalized
    assert repair.format_bounding_box("[0.25,0.50,0.75,1.00]") == [
        0.25, 0.5, 0.75, 1.0
    ]
    # >=4-digit runs get a dot before the last 3 digits; 1.0 then >= 1 -> /10
    out = repair.format_bounding_box("0250,0500,0750,1000")
    assert out == [0.25, 0.5, 0.75, 0.1]


def test_extract_answer():
    assert repair.extract_answer("foo bar###Human: x") == "foo bar"
    assert repair.extract_answer("the answer is Opened### junk") == "Opened"


def test_check_box_failed():
    assert repair.check_box_failed([0.1, 0.1, 0.5])  # len != 4
    assert repair.check_box_failed([0.6, 0.1, 0.5, 0.9])  # x0 > x1
    assert not repair.check_box_failed([0.1, 0.1, 0.5, 0.9])


def test_normalize_number():
    assert repair.normalize_number(250) == 0.25
    assert repair.normalize_number(25) == 0.25
    assert repair.normalize_number(2.5) == 0.25
    assert repair.normalize_number(0.25) == 0.25


# -- geometry ----------------------------------------------------------------


def test_rotvec_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        v = rng.standard_normal(3)
        R = rotvec_to_matrix(v)
        # R must be orthonormal
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        v2 = matrix_to_rotvec(R)
        np.testing.assert_allclose(rotvec_to_matrix(v2), R, atol=1e-8)


def test_bbox3d_corner_order():
    box = BBox3D([0, 0, 0], [2, 4, 6], [0, 0, 0])
    pts = box.get_points()
    # reference enumeration (point_render.py:138-153)
    np.testing.assert_allclose(pts[0], [-1, -2, -3])
    np.testing.assert_allclose(pts[1], [1, -2, -3])
    np.testing.assert_allclose(pts[2], [-1, 2, -3])
    np.testing.assert_allclose(pts[3], [-1, -2, 3])
    np.testing.assert_allclose(pts[4], [1, 2, 3])
    np.testing.assert_allclose(pts[5], [-1, 2, 3])
    np.testing.assert_allclose(pts[6], [1, -2, 3])
    np.testing.assert_allclose(pts[7], [1, 2, -3])


def test_min_projected_bbox_recovers_rotated_rect():
    rng = np.random.default_rng(1)
    # points on a 2x1 rectangle rotated 30deg, z in [0, 0.5]
    theta = np.pi / 6
    R2 = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    xy = rng.uniform([-1, -0.5], [1, 0.5], size=(500, 2))
    # ensure corners present so the min rect is exact
    corners = np.array([[-1, -0.5], [1, -0.5], [1, 0.5], [-1, 0.5]])
    xy = np.concatenate([xy, corners]) @ R2.T
    z = rng.uniform(0, 0.5, size=(len(xy), 1))
    pts = np.concatenate([xy, z], axis=1)

    box = BBox3D()
    box.create_minimum_projected_bbox(pts)
    assert abs(box.extent[0] - 2.0) < 0.05
    assert abs(box.extent[1] - 1.0) < 0.05
    assert abs(box.extent[2] - 0.5) < 0.02
    # x axis of the box aligns with the rotated long edge (up to sign)
    x_axis = box.R[:, 0][:2]
    want = R2 @ np.array([1.0, 0.0])
    assert min(
        np.linalg.norm(x_axis - want), np.linalg.norm(x_axis + want)
    ) < 0.05


def test_near_square_falls_back_axis_aligned():
    rng = np.random.default_rng(2)
    # axis-aligned square footprint -> fallback branch
    xy = rng.uniform(-1, 1, size=(400, 2))
    corners = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=float)
    pts = np.concatenate(
        [np.concatenate([xy, corners]),], axis=0
    )
    pts = np.concatenate([pts, rng.uniform(0, 1, (len(pts), 1))], axis=1)
    box = BBox3D()
    box.create_minimum_projected_bbox(pts)
    np.testing.assert_allclose(box.R, np.eye(3), atol=1e-9)


def test_projection_convention():
    meta_intr = np.array([[1000.0, 0, 480], [0, 1000.0, 480], [0, 0, 1]])
    # point left of optical axis (negative x) -> the -x/z convention puts it
    # RIGHT of center in pixel space (point_render.py:170)
    pts = project_points(
        np.array([[-0.5, 0.0, 2.0]]), meta_intr, np.eye(4), 0.5, 2.5, 960, 960
    )
    assert pts[0, 0] > 0.5
    assert abs(pts[0, 1] - 0.5) < 1e-9
    assert abs(pts[0, 2] - (2.0 - 0.5) / 2.0) < 1e-6


def test_angle_quantization():
    # 5-degree grid, radians out (partnet_label.py:139-147)
    assert normalize_and_round_angle(93.0) == 95 / 180 * np.pi
    assert normalize_and_round_angle(-2.0) == 0.0
    assert normalize_and_round_angle(358.0) == 0.0  # wraps to range_start
    assert normalize_and_round_angle(182.4) == 180 / 180 * np.pi
