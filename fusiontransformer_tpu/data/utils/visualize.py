"""Visualization helpers (reference ``data/utils/visualize.py``).

Color palettes for NuScenes (full + merged), A2D2, SemanticKITTI (raw-id and
train-id), plus scatter overlays: labels on image, depth with the Turbo
colormap, and bird's-eye-view.  matplotlib imports are deferred so headless
training never pays for them.
"""

from __future__ import annotations

import numpy as np

from fusiontransformer_tpu.data.semantic_kitti.labels import (COLOR_MAP_BGR,
                                                              LEARNING_MAP_INV)
from fusiontransformer_tpu.data.utils.turbo_cmap import (interpolate_or_clip,
                                                         turbo_colormap_data)

NUSCENES_COLOR_PALETTE = [
    (255, 158, 0), (255, 158, 0), (255, 158, 0), (255, 158, 0),
    (255, 158, 0), (0, 0, 230), (255, 61, 99), (255, 61, 99),
    (0, 0, 0), (0, 0, 0), (200, 200, 200),
]

NUSCENES_COLOR_PALETTE_SHORT = [
    (255, 158, 0), (0, 0, 230), (255, 61, 99), (0, 0, 0), (200, 200, 200),
]

A2D2_COLOR_PALETTE_SHORT = [
    (255, 0, 0), (255, 128, 0), (182, 89, 6), (204, 153, 255),
    (255, 0, 255), (150, 150, 200), (180, 150, 200), (241, 230, 255),
    (147, 253, 194), (255, 246, 143), (0, 0, 0),
]

# Raw-id BGR colors -> RGB palette indexed by raw id.
SEMANTIC_KITTI_ID_TO_BGR = {k: list(v) for k, v in COLOR_MAP_BGR.items()}
SEMANTIC_KITTI_COLOR_PALETTE = [
    SEMANTIC_KITTI_ID_TO_BGR[id_][::-1] if id_ in SEMANTIC_KITTI_ID_TO_BGR
    else [0, 0, 0]
    for id_ in range(max(SEMANTIC_KITTI_ID_TO_BGR) + 1)
]

# Train-id (20-class) palette via the inverse learning map.
SEMANTIC_KITTI_COLOR_PALETTE_SHORT_BGR = [
    SEMANTIC_KITTI_ID_TO_BGR[LEARNING_MAP_INV[i]]
    for i in range(len(LEARNING_MAP_INV))
]
SEMANTIC_KITTI_COLOR_PALETTE_SHORT = [
    (c[2], c[1], c[0]) for c in SEMANTIC_KITTI_COLOR_PALETTE_SHORT_BGR
]


def _palette(color_palette_type):
    return {
        "NuScenes": NUSCENES_COLOR_PALETTE_SHORT,
        "A2D2": A2D2_COLOR_PALETTE_SHORT,
        "SemanticKITTI": SEMANTIC_KITTI_COLOR_PALETTE,
        "SemanticKITTI_long": SEMANTIC_KITTI_COLOR_PALETTE,
        "SemanticKITTI_short": SEMANTIC_KITTI_COLOR_PALETTE_SHORT,
    }[color_palette_type]


def draw_points_image_labels(img, img_indices, seg_labels, show=True,
                             color_palette_type="NuScenes", point_size=0.5,
                             save_path=None):
    import matplotlib.pyplot as plt

    palette = np.asarray(_palette(color_palette_type)) / 255.0
    seg_labels = np.asarray(seg_labels).copy()
    seg_labels[seg_labels == -100] = len(palette) - 1
    colors = palette[seg_labels]

    plt.figure(figsize=(16, 9))
    plt.imshow(img)
    plt.scatter(img_indices[:, 1], img_indices[:, 0], c=colors, alpha=0.5,
                s=point_size)
    plt.axis("off")
    if save_path:
        plt.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close()


def normalize_depth(depth, d_min, d_max):
    return (np.asarray(depth) - d_min) / max(d_max - d_min, 1e-12)


def draw_points_image_depth(img, img_indices, depth, show=True,
                            point_size=0.5, save_path=None):
    import matplotlib.pyplot as plt

    depth = normalize_depth(depth, d_min=float(np.min(depth)),
                            d_max=float(np.max(depth)))
    colors = [interpolate_or_clip(turbo_colormap_data, d) for d in depth]
    plt.figure(figsize=(16, 9))
    plt.imshow(img)
    plt.scatter(img_indices[:, 1], img_indices[:, 0], c=colors, alpha=0.5,
                s=point_size)
    plt.axis("off")
    if save_path:
        plt.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close()


def draw_bird_eye_view(coords, full_scale=4096, show=True, save_path=None):
    import matplotlib.pyplot as plt

    plt.figure()
    plt.scatter(coords[:, 0], coords[:, 1], s=0.1)
    plt.xlim([0, full_scale])
    plt.ylim([0, full_scale])
    plt.gca().set_aspect("equal")
    if save_path:
        plt.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close()
