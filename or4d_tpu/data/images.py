"""Full-image loading for the multimodal (`no_gt_image`) config.

Reference: `scene_graph_helpers/dataset/data_preparation_utils.py:296-310`
(`load_full_image_data`): for each of the 6 cameras, look up the color-frame
index for the scan's pcd index in `timestamp_to_pcd_and_frames_list.json`,
read `colorimage/camera0{c}_colorimage-{idx}.jpg`, and apply the timm
validation transform for `tf_efficientnet_b5_ns`
(`model_utils.py:17-19`: `create_transform(**resolve_data_config(model))`).

That resolved transform is, concretely:
  * Resize the shorter side to ``floor(input_size / crop_pct)`` =
    floor(456 / 0.934) = 488 with bicubic interpolation,
  * center-crop to 456 x 456,
  * scale to [0, 1] and normalize with the ImageNet mean/std
    (the official TF EfficientNet preprocessing normalizes with
    MEAN_RGB/STDDEV_RGB = imagenet default, which timm mirrors for the
    tf_* ports).

This module reimplements those steps with PIL + numpy (no torch/timm at
runtime), producing channels-last float32 — the layout the flax trunk eats.
``image_size`` is parameterized so tests can run the full path at tiny
resolutions; 456 is the paper setting.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)
B5_INPUT_SIZE = 456
B5_CROP_PCT = 0.934
NUM_CAMERAS = 6


def take_dir(root: str | Path, take_idx: int | str) -> Path:
    return Path(root) / f"export_holistic_take{take_idx}_processed"


def frames_list_path(root: str | Path, take_idx: int | str) -> Path:
    return take_dir(root, take_idx) / "timestamp_to_pcd_and_frames_list.json"


def has_images(root: str | Path, take_idx: int | str) -> bool:
    return frames_list_path(root, take_idx).exists()


def b5_transform(img, image_size: int = B5_INPUT_SIZE, crop_pct: float = B5_CROP_PCT) -> np.ndarray:
    """timm eval transform (resize-shorter-side -> center crop -> normalize)
    as numpy; returns (image_size, image_size, 3) float32."""
    from PIL import Image

    scale_size = int(math.floor(image_size / crop_pct))
    w, h = img.size
    if w <= h:
        new_w, new_h = scale_size, max(1, int(round(h * scale_size / w)))
    else:
        new_w, new_h = max(1, int(round(w * scale_size / h))), scale_size
    img = img.resize((new_w, new_h), Image.BICUBIC)
    left = (new_w - image_size) // 2
    top = (new_h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def load_full_image_data(
    root: str | Path,
    take_idx: int | str,
    pcd_idx: str,
    image_size: int = B5_INPUT_SIZE,
) -> np.ndarray:
    """(6, image_size, image_size, 3) float32 stack of the scan's six camera
    color frames (data_preparation_utils.py:296-310 semantics: the frames
    list is INDEXED by int(pcd_idx), not searched)."""
    from PIL import Image

    frames = json.load(open(frames_list_path(root, take_idx)))
    entry = frames[int(pcd_idx)][1]
    out = np.empty((NUM_CAMERAS, image_size, image_size, 3), dtype=np.float32)
    for c_idx in range(1, NUM_CAMERAS + 1):
        color_idx_str = entry[f"color_{c_idx}"]
        path = take_dir(root, take_idx) / "colorimage" / f"camera0{c_idx}_colorimage-{color_idx_str}.jpg"
        img = Image.open(path).convert("RGB")
        out[c_idx - 1] = b5_transform(img, image_size=image_size)
    return out
