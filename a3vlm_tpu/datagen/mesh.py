"""Triangle-mesh IO and ops — replaces the reference's trimesh dependency
(render_robot_pyrender.py:10, mesh concatenate/transform/export at :149-161).

Supports the PartNet-Mobility asset subset: Wavefront OBJ (+MTL diffuse
colors), fan triangulation, transforms, concatenation, OBJ export.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class TriMesh:
    vertices: np.ndarray  # [V, 3] float64
    faces: np.ndarray  # [F, 3] int32
    face_colors: Optional[np.ndarray] = None  # [F, 3] float in [0,1]

    @property
    def centroid(self) -> np.ndarray:
        return self.vertices.mean(axis=0)

    def copy(self) -> "TriMesh":
        return TriMesh(
            self.vertices.copy(),
            self.faces.copy(),
            None if self.face_colors is None else self.face_colors.copy(),
        )

    def apply_transform(self, T: np.ndarray) -> "TriMesh":
        self.vertices = self.vertices @ T[:3, :3].T + T[:3, 3]
        return self

    def apply_scale(self, scale) -> "TriMesh":
        self.vertices = self.vertices * np.asarray(scale, float)
        return self

    def face_normals(self) -> np.ndarray:
        v = self.vertices
        f = self.faces
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        norm = np.linalg.norm(n, axis=1, keepdims=True)
        return n / np.maximum(norm, 1e-12)

    def export_obj(self, path: str) -> None:
        with open(path, "w") as fh:
            for v in self.vertices:
                fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for f in self.faces + 1:
                fh.write(f"f {f[0]} {f[1]} {f[2]}\n")


def _parse_mtl(path: str) -> dict[str, np.ndarray]:
    colors: dict[str, np.ndarray] = {}
    if not os.path.isfile(path):
        return colors
    current = None
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "newmtl":
                current = parts[1]
            elif parts[0] == "Kd" and current:
                colors[current] = np.array([float(x) for x in parts[1:4]])
    return colors


def load_obj(path: str) -> TriMesh:
    """Minimal OBJ reader: v / f (fan-triangulated) / usemtl+mtllib diffuse
    colors. Ignores vt/vn indices (annotation pipeline needs geometry +
    flat colors only)."""
    vertices: list[list[float]] = []
    faces: list[list[int]] = []
    face_colors: list[np.ndarray] = []
    mtl_colors: dict[str, np.ndarray] = {}
    current_color = np.array([0.7, 0.7, 0.7])
    base = os.path.dirname(os.path.abspath(path))

    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            if tag == "v":
                vertices.append([float(x) for x in parts[1:4]])
            elif tag == "mtllib":
                mtl_colors.update(_parse_mtl(os.path.join(base, parts[1])))
            elif tag == "usemtl":
                current_color = mtl_colors.get(parts[1], current_color)
            elif tag == "f":
                idx = [int(p.split("/")[0]) for p in parts[1:]]
                idx = [i - 1 if i > 0 else len(vertices) + i for i in idx]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
                    face_colors.append(current_color)

    return TriMesh(
        np.asarray(vertices, np.float64),
        np.asarray(faces, np.int32).reshape(-1, 3),
        np.asarray(face_colors, np.float64).reshape(-1, 3),
    )


def box_mesh(size) -> TriMesh:
    """Axis-aligned box primitive (URDF <box> geometries)."""
    sx, sy, sz = np.asarray(size, float) / 2
    v = np.array(
        [
            [-sx, -sy, -sz], [sx, -sy, -sz], [sx, sy, -sz], [-sx, sy, -sz],
            [-sx, -sy, sz], [sx, -sy, sz], [sx, sy, sz], [-sx, sy, sz],
        ]
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom
            [4, 5, 6], [4, 6, 7],  # top
            [0, 1, 5], [0, 5, 4],
            [1, 2, 6], [1, 6, 5],
            [2, 3, 7], [2, 7, 6],
            [3, 0, 4], [3, 4, 7],
        ],
        np.int32,
    )
    colors = np.tile(np.array([0.7, 0.7, 0.7]), (len(f), 1))
    return TriMesh(v, f, colors)


def concatenate(meshes: list[TriMesh]) -> TriMesh:
    """(trimesh.util.concatenate at render_robot_pyrender.py:152-154)"""
    verts, faces, colors = [], [], []
    offset = 0
    for m in meshes:
        verts.append(m.vertices)
        faces.append(m.faces + offset)
        colors.append(
            m.face_colors
            if m.face_colors is not None
            else np.tile(np.array([0.7, 0.7, 0.7]), (len(m.faces), 1))
        )
        offset += len(m.vertices)
    return TriMesh(
        np.concatenate(verts), np.concatenate(faces), np.concatenate(colors)
    )


def load_link_mesh(geoms) -> Optional[TriMesh]:
    """Combined mesh of a link's geometry list (the urdfpy
    ``link.collision_mesh`` equivalent)."""
    parts = []
    for g in geoms:
        if g.mesh_file is not None:
            m = load_obj(g.mesh_file)
        elif g.box_size is not None:
            m = box_mesh(g.box_size)
        else:
            continue
        if g.scale is not None:
            m.apply_scale(g.scale)
        m.apply_transform(g.origin)
        parts.append(m)
    if not parts:
        return None
    return concatenate(parts)


YZ_SWAP = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]], np.float64
)  # the y/z swap applied before mesh export (render_robot_pyrender.py:156-158)
