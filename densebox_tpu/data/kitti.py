"""KITTI-style annotation parsing (SURVEY.md C8; BASELINE config 5 trains on
a "KITTI-style vehicle set").

KITTI object-label format, one object per line:
  type truncated occluded alpha x1 y1 x2 y2 h w l X Y Z rot_y [score]
We consume the type + 2D bbox columns. Images and labels pair by stem:
  <image_dir>/<stem>.(png|jpg|jpeg)  <->  <label_dir>/<stem>.txt
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Sequence, Tuple

import numpy as np

VEHICLE_CLASSES = ("Car", "Van", "Truck")
_IMG_EXTS = (".png", ".jpg", ".jpeg")


@dataclasses.dataclass
class Sample:
    image_path: str
    boxes: np.ndarray        # (N, 4) xyxy float32, N >= 0
    landmarks: np.ndarray | None = None   # (N, L, 2) optional keypoints


def parse_label_file(path: str,
                     classes: Sequence[str] = VEHICLE_CLASSES) -> np.ndarray:
    """Parse one KITTI label txt -> (N, 4) xyxy boxes of the wanted classes."""
    boxes: List[Tuple[float, float, float, float]] = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 8 or parts[0] not in classes:
                continue
            x1, y1, x2, y2 = (float(v) for v in parts[4:8])
            if x2 > x1 and y2 > y1:
                boxes.append((x1, y1, x2, y2))
    return np.asarray(boxes, np.float32).reshape(-1, 4)


def load_dataset(image_dir: str, label_dir: str,
                 classes: Sequence[str] = VEHICLE_CLASSES) -> List[Sample]:
    """Enumerate (image, label) pairs. Samples without any wanted-class box
    are kept (they become pure-negative patches, paper §3.4)."""
    samples: List[Sample] = []
    for name in sorted(os.listdir(label_dir)):
        if not name.endswith(".txt"):
            continue
        stem = name[:-4]
        img = next((os.path.join(image_dir, stem + ext)
                    for ext in _IMG_EXTS
                    if os.path.exists(os.path.join(image_dir, stem + ext))),
                   None)
        if img is None:
            continue
        boxes = parse_label_file(os.path.join(label_dir, name), classes)
        samples.append(Sample(image_path=img, boxes=boxes))
    if not samples:
        raise FileNotFoundError(
            f"no (image, label) pairs under {image_dir} / {label_dir}")
    return samples
