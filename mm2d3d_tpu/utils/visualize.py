"""Qualitative visualization: point-overlay figures, depth maps, PLY export.

Capability parity with ``lib/utils/visualize.py`` (turbo colormap, per-dataset
palettes, `draw_points_image_labels[_with_confidence]` multi-panel figures
logged during training, depth-figure variants, PLY point-cloud export).
Figures are written to disk and/or returned as arrays; the trainer hooks them
to the logging facade every `train_log_images_step` steps.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional, Sequence

import numpy as np

# per-dataset palettes (RGB 0-255), reference visualize.py:305-402
NUSCENES_PALETTE = np.array(
    [
        [255, 158, 0],  # vehicle
        [0, 207, 191],  # driveable_surface
        [75, 0, 75],  # sidewalk
        [112, 180, 60],  # terrain
        [222, 184, 135],  # manmade
        [0, 175, 0],  # vegetation
    ],
    np.uint8,
)

A2D2_PALETTE = np.array(
    [
        [255, 0, 0],  # car
        [255, 128, 0],  # truck
        [182, 89, 6],  # bike
        [204, 153, 255],  # person
        [255, 0, 255],  # road
        [150, 50, 4],  # parking
        [180, 150, 200],  # sidewalk
        [241, 230, 255],  # building
        [147, 253, 194],  # nature
        [0, 0, 0],  # other-objects
    ],
    np.uint8,
)

VKITTI_PALETTE = np.array(
    [
        [0, 175, 0],  # vegetation_terrain
        [222, 184, 135],  # building
        [0, 207, 191],  # road
        [128, 128, 128],  # object
        [255, 128, 0],  # truck
        [255, 158, 0],  # car
    ],
    np.uint8,
)

PALETTES = {
    "nuscenes": NUSCENES_PALETTE,
    "a2d2": A2D2_PALETTE,
    "virtual_kitti": VKITTI_PALETTE,
}


def turbo_colormap(values: np.ndarray, vmin=None, vmax=None) -> np.ndarray:
    """Map scalars to turbo RGB (uint8)."""
    import matplotlib

    v = np.asarray(values, np.float64)
    vmin = np.nanmin(v) if vmin is None else vmin
    vmax = np.nanmax(v) if vmax is None else vmax
    t = np.clip((v - vmin) / max(vmax - vmin, 1e-9), 0, 1)
    return (matplotlib.colormaps["turbo"](t)[..., :3] * 255).astype(np.uint8)


def colorize_labels(labels: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Labels (-100 = black) -> RGB."""
    out = np.zeros(labels.shape + (3,), np.uint8)
    valid = labels >= 0
    out[valid] = palette[np.clip(labels[valid], 0, len(palette) - 1)]
    return out


def draw_points_image_labels(
    image: np.ndarray,  # (H, W, 3) float [0,1] or uint8
    img_indices: np.ndarray,  # (N, 2)
    seg_labels: np.ndarray,  # (N,)
    color_palette: np.ndarray,
    point_size: int = 2,
    out_path: Optional[str] = None,
):
    """Scatter per-point class colors over the camera image (visualize.py:405+)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = image if image.dtype == np.uint8 else (np.clip(image, 0, 1) * 255).astype(np.uint8)
    colors = colorize_labels(seg_labels, np.asarray(color_palette, np.uint8)) / 255.0
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.imshow(img)
    ax.scatter(img_indices[:, 1], img_indices[:, 0], c=colors, s=point_size)
    ax.axis("off")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=100)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf


def draw_points_image_labels_with_confidence(
    image: np.ndarray,
    pred_2d_dense: np.ndarray,  # (H, W) argmax of the dense 2D logits
    pred_2d_points: np.ndarray,  # (N,)
    pred_3d_points: np.ndarray,  # (N,)
    confidence: np.ndarray,  # (N,) sigmoid gate
    gt_labels: np.ndarray,  # (N,)
    img_indices: np.ndarray,  # (N, 2)
    color_palette: np.ndarray,
    out_path: Optional[str] = None,
):
    """5-panel qualitative figure (visualize.py:474-553): dense 2D pred, GT
    points, 2D pred points, 3D pred points, per-point confidence."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    palette = np.asarray(color_palette, np.uint8)
    img = image if image.dtype == np.uint8 else (np.clip(image, 0, 1) * 255).astype(np.uint8)
    panels = [
        ("2D dense pred", colorize_labels(pred_2d_dense, palette), None),
        ("GT points", None, colorize_labels(gt_labels, palette) / 255.0),
        ("2D pred points", None, colorize_labels(pred_2d_points, palette) / 255.0),
        ("3D pred points", None, colorize_labels(pred_3d_points, palette) / 255.0),
        ("3D confidence", None, turbo_colormap(confidence.reshape(-1), 0, 1) / 255.0),
    ]
    fig, axes = plt.subplots(len(panels), 1, figsize=(8, 4 * len(panels)))
    for ax, (title, overlay, pt_colors) in zip(axes, panels):
        ax.imshow(overlay if overlay is not None else img)
        if pt_colors is not None:
            ax.scatter(img_indices[:, 1], img_indices[:, 0], c=pt_colors, s=2)
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    if out_path:
        os.makedirs(osp.dirname(out_path) or ".", exist_ok=True)
        fig.savefig(out_path, bbox_inches="tight", dpi=80)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf


def draw_points_image_depth(
    image: np.ndarray,
    img_indices: np.ndarray,
    depth: np.ndarray,  # (N,) per-point depth
    point_size: int = 2,
    out_path: Optional[str] = None,
):
    """Depth-colored point overlay (visualize.py:556-675)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = image if image.dtype == np.uint8 else (np.clip(image, 0, 1) * 255).astype(np.uint8)
    colors = turbo_colormap(depth) / 255.0
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.imshow(img)
    ax.scatter(img_indices[:, 1], img_indices[:, 0], c=colors, s=point_size)
    ax.axis("off")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=100)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf


def draw_bird_eye_view(coords: np.ndarray, full_scale: int = 4096,
                       out_path: Optional[str] = None):
    """Top-down voxel scatter (visualize.py BEV helper)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(coords[:, 0], coords[:, 1], s=0.3)
    ax.set_xlim(0, full_scale)
    ax.set_ylim(0, full_scale)
    if out_path:
        fig.savefig(out_path, dpi=100)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf


def save_point_cloud_ply(
    path: str,
    points: np.ndarray,  # (N, 3)
    colors: Optional[np.ndarray] = None,  # (N, 3) uint8
):
    """ASCII PLY export (visualize.py:692-733)."""
    n = len(points)
    has_color = colors is not None
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i, 0]:.4f} {points[i, 1]:.4f} {points[i, 2]:.4f}"
            if has_color:
                row += f" {int(colors[i, 0])} {int(colors[i, 1])} {int(colors[i, 2])}"
            f.write(row + "\n")
