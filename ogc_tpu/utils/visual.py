"""Point-cloud visualization helpers.

Parity with reference utils/visual_util.py (Open3D painting with a 20-color
palette + bbox line sets); Open3D is optional here — matplotlib 3D scatter is
the fallback for headless environments.
"""

from __future__ import annotations

import numpy as np

# 20-color object palette (tab20-style), background drawn in gray.
COLOR20 = (
    np.array(
        [
            [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
            [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
            [210, 245, 60], [250, 190, 190], [0, 128, 128], [230, 190, 255],
            [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
            [128, 128, 0], [255, 215, 180], [0, 0, 128], [128, 128, 128],
        ]
    )
    / 255.0
)


def segm_colors(segm: np.ndarray, with_background: bool = False) -> np.ndarray:
    """(N,) ids -> (N, 3) colors; id 0 is gray when with_background."""
    segm = np.asarray(segm).astype(int)
    colors = COLOR20[segm % len(COLOR20)]
    if with_background:
        colors = np.where(
            (segm == 0)[:, None], np.array([[0.75, 0.75, 0.75]]), colors
        )
    return colors


def build_pointcloud(pc, segm, with_background: bool = False):
    """Open3D PointCloud painted by segment id (reference
    utils/visual_util.py:13-42); raises if Open3D is unavailable."""
    import open3d as o3d

    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(np.asarray(pc, dtype=np.float64))
    pcd.colors = o3d.utility.Vector3dVector(segm_colors(segm, with_background))
    return pcd


def build_bbox3d(boxes_3d):
    """Open3D LineSets for a list of (8, 3) box corner arrays."""
    import open3d as o3d

    lines = [
        [0, 1], [1, 2], [2, 3], [3, 0],
        [4, 5], [5, 6], [6, 7], [7, 4],
        [0, 4], [1, 5], [2, 6], [3, 7],
    ]
    out = []
    for corners in boxes_3d:
        ls = o3d.geometry.LineSet()
        ls.points = o3d.utility.Vector3dVector(np.asarray(corners))
        ls.lines = o3d.utility.Vector2iVector(lines)
        ls.paint_uniform_color([0.9, 0.1, 0.1])
        out.append(ls)
    return out


def scatter_segm_png(pc, segm, path, with_background: bool = False,
                     elev: float = 20.0, azim: float = -60.0):
    """Headless fallback: save a matplotlib 3D scatter colored by segment."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    colors = segm_colors(segm, with_background)
    pc = np.asarray(pc)
    ax.scatter(pc[:, 0], pc[:, 2], pc[:, 1], c=colors, s=1)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
