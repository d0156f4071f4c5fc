"""Datagen core tests: URDF parse/FK/fixer, OBJ IO, and the native
rasterizer (C++ vs numpy parity, depth/id correctness)."""

import numpy as np
import pytest

from a3vlm_tpu.datagen import mesh as M
from a3vlm_tpu.datagen import urdf as U
from a3vlm_tpu.datagen.rasterizer import _load_native, rasterize

URDF_XML = """<?xml version="1.0"?>
<robot name="test_box">
  <link name="base">
    <visual><geometry><box size="1 1 1"/></geometry></visual>
    <collision><geometry><box size="1 1 1"/></geometry></collision>
  </link>
  <link name="lid">
    <visual><origin xyz="0 0 0.1"/><geometry><box size="1 1 0.2"/></geometry></visual>
    <collision><origin xyz="0 0 0.1"/><geometry><box size="1 1 0.2"/></geometry></collision>
  </link>
  <joint name="joint_0" type="revolute">
    <origin xyz="0 -0.5 0.5"/>
    <axis xyz="1 0 0"/>
    <parent link="base"/>
    <child link="lid"/>
    <limit lower="0" upper="1.5708"/>
  </joint>
</robot>
"""


@pytest.fixture()
def robot(tmp_path):
    p = tmp_path / "mobility.urdf"
    p.write_text(URDF_XML)
    return U.URDF.load(str(p))


def test_urdf_parse(robot):
    assert robot.base_link == "base"
    assert len(robot.links) == 2 and len(robot.joints) == 1
    j = robot.joints[0]
    assert j.joint_type == "revolute"
    assert j.limit.upper == pytest.approx(1.5708)
    assert len(robot.actuated_joints) == 1


def test_fk_revolute(robot):
    poses = robot.link_fk({"joint_0": np.pi / 2})
    np.testing.assert_allclose(poses["base"], np.eye(4))
    T = poses["lid"]
    # rotation about +x by 90deg at origin (0,-0.5,0.5)
    np.testing.assert_allclose(T[:3, 3], [0, -0.5, 0.5], atol=1e-9)
    np.testing.assert_allclose(
        T[:3, :3] @ np.array([0, 1, 0]), [0, 0, 1], atol=1e-9
    )


def test_fk_prismatic(tmp_path):
    xml = URDF_XML.replace('type="revolute"', 'type="prismatic"')
    p = tmp_path / "m.urdf"
    p.write_text(xml)
    r = U.URDF.load(str(p))
    poses = r.link_fk({"joint_0": 0.3})
    np.testing.assert_allclose(poses["lid"][:3, 3], [0.3, -0.5, 0.5], atol=1e-9)
    np.testing.assert_allclose(poses["lid"][:3, :3], np.eye(3), atol=1e-9)


def test_kinematic_level(robot):
    assert U.compute_kinematic_level(robot) == 1


def test_urdf_fixer(tmp_path):
    p = tmp_path / "broken.urdf"
    p.write_text(
        '<robot name="x">\n'
        '<joint name="j" type="revolute">\n'
        '<limit lower="None" upper="1"/>\n'
        '<parent link="a"/><child link="b"/>\n'
        "</joint>\n"
        '<link name="a"/><link name="b"/>\n'
        "</robot>\n"
    )
    assert U.modify_urdf(str(p))
    text = p.read_text()
    assert 'effort="30"' in text and "None" not in text
    U.URDF.load(str(p))  # now parses with numeric limits


def test_obj_roundtrip(tmp_path):
    m = M.box_mesh([1, 2, 3])
    path = tmp_path / "box.obj"
    m.export_obj(str(path))
    m2 = M.load_obj(str(path))
    np.testing.assert_allclose(m2.vertices, m.vertices)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_obj_mtl_colors(tmp_path):
    (tmp_path / "mat.mtl").write_text("newmtl red\nKd 1.0 0.0 0.0\n")
    (tmp_path / "tri.obj").write_text(
        "mtllib mat.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "usemtl red\nf 1 2 3 4\n"  # quad -> 2 triangles
    )
    m = M.load_obj(str(tmp_path / "tri.obj"))
    assert m.faces.shape == (2, 3)
    np.testing.assert_allclose(m.face_colors, [[1, 0, 0], [1, 0, 0]])


def _quad_scene(z=2.0):
    # unit quad centered on the optical axis at camera-space Z=-z
    v = np.array(
        [[-0.5, -0.5, -z], [0.5, -0.5, -z], [0.5, 0.5, -z], [-0.5, 0.5, -z]],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


@pytest.mark.parametrize("force_numpy", [True, False])
def test_rasterize_quad_depth(force_numpy):
    if not force_numpy and _load_native() is None:
        pytest.skip("no native rasterizer")
    v, f = _quad_scene(z=2.0)
    depth, face, ids = rasterize(
        v, f, np.array([7, 7], np.int32),
        fx=100, fy=100, cx=32, cy=32, width=64, height=64,
        force_numpy=force_numpy,
    )
    # quad spans 50px around center: x in [32-25, 32+25]
    assert depth[32, 32] == pytest.approx(2.0, abs=1e-4)
    assert ids[32, 32] == 7
    assert depth[32, 60] == 0.0 and ids[32, 60] == -1
    hit = depth > 0
    assert 2000 < hit.sum() < 2700  # ~50x50 box


def test_rasterize_native_matches_numpy():
    if _load_native() is None:
        pytest.skip("no native rasterizer")
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
    v[:, 2] = -rng.uniform(1.5, 3.0, 30)  # in front of camera
    f = rng.integers(0, 30, (40, 3)).astype(np.int32)
    ids = rng.integers(0, 5, 40).astype(np.int32)
    kw = dict(fx=80, fy=80, cx=32, cy=32, width=64, height=64)
    d1, f1, i1 = rasterize(v, f, ids, **kw)
    d2, f2, i2 = rasterize(v, f, ids, **kw, force_numpy=True)
    np.testing.assert_allclose(d1, d2, atol=1e-3)
    # face/id maps may differ on exact z-ties at triangle seams; compare
    # depth (the physical output) and the hit footprint
    np.testing.assert_array_equal(d1 > 0, d2 > 0)


def test_zbuffer_occlusion():
    v1, f1 = _quad_scene(z=2.0)
    v2, f2 = _quad_scene(z=1.0)  # closer quad occludes
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + 4])
    ids = np.array([0, 0, 1, 1], np.int32)
    depth, face, out_ids = rasterize(
        v, f, ids, fx=100, fy=100, cx=32, cy=32, width=64, height=64,
        force_numpy=True,
    )
    assert out_ids[32, 32] == 1
    assert depth[32, 32] == pytest.approx(1.0, abs=1e-4)
    # the near quad projects larger (half-width 50px vs 25px): a pixel
    # outside the far quad's footprint but inside the near one is id 1
    assert out_ids[32, 63] == 1


# -- textures (render_tools.py:166-185 textured visual pass) ------------------


def _textured_quad_obj(tmp_path, tex_colors=((255, 0, 0), (0, 0, 255))):
    """A quad with a 2x1 horizontal texture: left half one color, right half
    the other."""
    import cv2

    tex = np.zeros((8, 16, 3), np.uint8)
    tex[:, :8] = tex_colors[0]
    tex[:, 8:] = tex_colors[1]
    cv2.imwrite(str(tmp_path / "tex.png"), tex[:, :, ::-1])  # RGB->BGR
    (tmp_path / "mat.mtl").write_text(
        "newmtl painted\nKd 0.5 0.5 0.5\nmap_Kd tex.png\n"
    )
    (tmp_path / "quad.obj").write_text(
        "mtllib mat.mtl\n"
        "v -0.5 -0.5 0\nv 0.5 -0.5 0\nv 0.5 0.5 0\nv -0.5 0.5 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl painted\nf 1/1 2/2 3/3 4/4\n"
    )
    return str(tmp_path / "quad.obj")


def test_obj_texture_loading(tmp_path):
    pytest.importorskip("cv2")
    m = M.load_obj(_textured_quad_obj(tmp_path))
    assert m.has_textures
    assert m.face_uvs.shape == (2, 3, 2)
    assert m.face_texture.tolist() == [0, 0]
    assert m.textures[0].shape == (8, 16, 3)
    np.testing.assert_array_equal(m.textures[0][0, 0], [255, 0, 0])
    np.testing.assert_array_equal(m.textures[0][0, 15], [0, 0, 255])


@pytest.mark.parametrize("force_numpy", [True, False])
def test_rasterize_uv_texture_sampling(tmp_path, force_numpy):
    pytest.importorskip("cv2")
    from a3vlm_tpu.datagen.rasterizer import rasterize_uv, sample_textures

    if not force_numpy and _load_native() is None:
        pytest.skip("no native rasterizer")
    m = M.load_obj(_textured_quad_obj(tmp_path))
    v = m.vertices.copy().astype(np.float32)
    v[:, 2] = -2.0  # place in front of the camera
    depth, face_idx, ids, uv = rasterize_uv(
        v, m.faces, None, m.face_uvs,
        fx=100, fy=100, cx=32, cy=32, width=64, height=64,
        force_numpy=force_numpy,
    )
    assert depth[32, 32] == pytest.approx(2.0, abs=1e-3)
    albedo = sample_textures(
        face_idx, uv, m.face_texture, m.textures, m.face_colors
    )
    # u<0.5 (left of the quad in texture space) is red, u>0.5 blue
    np.testing.assert_allclose(albedo[32, 20], [1, 0, 0], atol=0.02)
    np.testing.assert_allclose(albedo[32, 44], [0, 0, 1], atol=0.02)


def test_rasterize_uv_native_matches_numpy(tmp_path):
    pytest.importorskip("cv2")
    from a3vlm_tpu.datagen.rasterizer import rasterize_uv

    if _load_native() is None:
        pytest.skip("no native rasterizer")
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
    v[:, 2] = -rng.uniform(1.5, 3.0, 30)
    f = rng.integers(0, 30, (40, 3)).astype(np.int32)
    uvs = rng.uniform(0, 1, (40, 3, 2)).astype(np.float32)
    kw = dict(fx=80, fy=80, cx=32, cy=32, width=64, height=64)
    d1, f1, i1, uv1 = rasterize_uv(v, f, None, uvs, **kw)
    d2, f2, i2, uv2 = rasterize_uv(v, f, None, uvs, **kw, force_numpy=True)
    np.testing.assert_allclose(d1, d2, atol=1e-3)
    same = f1 == f2  # ignore z-tie seams
    np.testing.assert_allclose(uv1[same], uv2[same], atol=1e-3)


def test_render_parts_textured_visual_pass(tmp_path):
    pytest.importorskip("cv2")
    from a3vlm_tpu.datagen.render import render_parts

    m = M.load_obj(_textured_quad_obj(tmp_path))
    pose = np.eye(4)
    cam = dict(fx=100.0, fy=100.0, cx=32.0, cy=32.0, width=64, height=64)
    # fixed camera 2 units out on +Z looking back at the quad
    cam_pose = np.eye(4)
    cam_pose[2, 3] = 2.0
    _, _, colors, _, _ = render_parts(
        {"quad_0": (m, pose)}, 1, cam, 2.0, 1.0,
        predefine_camera_poses=[cam_pose], is_link_map=False,
        rng=np.random.default_rng(0),
    )
    img = colors[0].astype(np.int32)
    left = img[32, 20]
    right = img[32, 44]
    # the two texture halves shade to clearly different colors
    assert abs(int(left[0]) - int(right[0])) > 60, (left, right)
    assert abs(int(left[2]) - int(right[2])) > 60, (left, right)
