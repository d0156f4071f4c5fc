"""2D geometry + visualization helpers (reference data_gen/utils.py), with
cv2 replacing shapely for rotated-box construction/IoU."""

from __future__ import annotations

import random

import numpy as np

COLORS = {
    "red": (0, 0, 255),
    "green": (0, 255, 0),
    "blue": (255, 0, 0),
    "yellow": (0, 255, 255),
    "cyan": (255, 255, 0),
    "magenta": (255, 0, 255),
    "gray": (128, 128, 128),
    "orange": (0, 165, 255),
    "purple": (128, 0, 128),
    "brown": (19, 69, 139),
    "pink": (147, 20, 255),
}


def get_rotated_box_points(cx, cy, w, h, angle_deg) -> np.ndarray:
    """Corner points of a rotated rect (shapely rotate+translate equivalent,
    utils.py:31-38)."""
    import cv2

    return cv2.boxPoints(((cx, cy), (w, h), angle_deg))


def rotated_box_iou(box1, box2) -> float:
    """IoU of two (cx, cy, w, h, angle_deg) rotated boxes
    (utils.py:41-48 via shapely -> cv2.rotatedRectangleIntersection)."""
    import cv2

    r1 = ((box1[0], box1[1]), (box1[2], box1[3]), box1[4])
    r2 = ((box2[0], box2[1]), (box2[2], box2[3]), box2[4])
    ret, region = cv2.rotatedRectangleIntersection(r1, r2)
    if ret == cv2.INTERSECT_NONE or region is None:
        inter = 0.0
    else:
        inter = cv2.contourArea(region)
    a1 = box1[2] * box1[3]
    a2 = box2[2] * box2[3]
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def draw_rotating_bbox(img, bbox, angle, color=(0, 255, 0), thickness=2,
                       text=None):
    """(utils.py:51-91: radians in, degrees to cv2, None-angle =
    'Perpendicular' convention)."""
    import cv2

    center, size = (int(bbox[0]), int(bbox[1])), (int(bbox[2]), int(bbox[3]))
    if angle is None or angle in ("none", "None"):
        angle = 0
        text = "None Angle" if text is None else "Perpendicular_" + text
    angle = angle * 180 / np.pi
    rect_coords = cv2.boxPoints(
        ((center[0], center[1]), (size[0], size[1]), angle)
    ).astype(np.int64)
    cv2.drawContours(img, [rect_coords], 0, color, thickness)
    if text is not None:
        bottom_left = (
            int(bbox[0] - bbox[2] / 2 - 5), int(bbox[1] + bbox[3] / 2 + 5)
        )
        cv2.putText(img, text, bottom_left, cv2.FONT_HERSHEY_SIMPLEX, 2.5,
                    color, 2, cv2.LINE_AA)
    return img


def draw_rotating_bboxs_with_text(img, list_bbox_name, thickness=2):
    for name, bbox in list_bbox_name:
        color = random.choice(list(COLORS.values()))
        img = draw_rotating_bbox(
            img, bbox[:4], bbox[4], color, thickness, text=name
        )
    return img


def intersect_line_bbox(origin, direction, bbox):
    """Slab-test line/axis-aligned-bbox intersection (utils.py:94-127)."""
    x_center, y_center, width, height = bbox
    x_min, x_max = x_center - width / 2, x_center + width / 2
    y_min, y_max = y_center - height / 2, y_center + height / 2
    origin = np.asarray(origin, float)
    direction = np.asarray(direction, float)

    tmin, tmax = float("-inf"), float("inf")
    bounds = [(x_min, x_max), (y_min, y_max)]
    for i in range(2):
        if direction[i] != 0:
            t1 = (bounds[i][0] - origin[i]) / direction[i]
            t2 = (bounds[i][1] - origin[i]) / direction[i]
            tmin = max(tmin, min(t1, t2))
            tmax = min(tmax, max(t1, t2))
        elif origin[i] < bounds[i][0] or origin[i] > bounds[i][1]:
            return None
    if tmin > tmax:
        return None
    intersection = origin + tmin * direction
    if intersection[1] < y_min or intersection[1] > y_max:
        return None
    return intersection


def convert_depth_to_color(depth_img, maintain_ratio=False):
    """uint16 depth -> JET colorized uint8 (utils.py:130-142)."""
    import cv2

    d = depth_img.astype(np.float32)
    valid = d > 0
    if valid.any():
        dmin, dmax = d[valid].min(), d[valid].max()
        norm = np.zeros_like(d)
        norm[valid] = (d[valid] - dmin) / (dmax - dmin + 1e-6)
    else:
        norm = np.zeros_like(d)
    u8 = (norm * 255).astype(np.uint8)
    color = cv2.applyColorMap(u8, cv2.COLORMAP_JET)
    color[~valid] = 0
    return color


def read_ply_ascii(path: str) -> np.ndarray:
    """Minimal ascii PLY reader (utils.py:146-165)."""
    with open(path) as f:
        lines = f.readlines()
    n = 0
    header_end = 0
    for i, line in enumerate(lines):
        if line.startswith("element vertex"):
            n = int(line.split()[-1])
        if line.strip() == "end_header":
            header_end = i + 1
            break
    data = [
        [float(v) for v in lines[header_end + i].split()] for i in range(n)
    ]
    return np.asarray(data, np.float32)
