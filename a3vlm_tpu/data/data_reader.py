"""Data routing: local image files / .npy point clouds (reference
model/accessory/data/data_reader.py; the ceph ``s3://`` petrel path is
dropped — plain filesystem + .npy covers the published pipeline)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def read_img_general(img_path: str):
    if img_path.endswith(".npy"):
        return np.load(img_path)
    return Image.open(img_path).convert("RGB")
