"""Render single-view depth scans of OGC-DR object meshes (OGC-DRSV).

The reference (data_prepare/ogcdrsv/build_ogcdrsv.py) captures depth point
clouds through a hidden Open3D window; this version uses a self-contained
numpy z-buffer rasterizer with a documented pinhole camera (60-degree fov,
camera on the +Z axis fitted to the scene bounds, looking at the scene
center — Open3D's default fitted view), then back-projects valid depth
pixels to world coordinates.

Usage: python build_ogcdrsv.py --src_root <OGC_DR> --dest_root <OGC_DRSV>
"""

import argparse
import os
import os.path as osp
import pathlib
import sys

import numpy as np

sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parent.parent / "ogcdr")
)
from mesh_util import Mesh  # noqa: E402

WIDTH, HEIGHT = 640, 480
FOV_DEG = 60.0
N_FRAME = 4


def render_depth_pointcloud(meshes, width=WIDTH, height=HEIGHT):
    """Rasterize meshes into a z-buffer and back-project to world points."""
    verts = np.concatenate([m.vertices for m in meshes], 0)
    faces = []
    off = 0
    for m in meshes:
        faces.append(m.faces + off)
        off += m.vertices.shape[0]
    faces = np.concatenate(faces, 0)

    # Camera: on +Z axis, fitted so the scene subtends ~the field of view.
    center = (verts.min(0) + verts.max(0)) / 2
    radius = np.linalg.norm(verts - center, axis=1).max()
    f = 0.5 * height / np.tan(np.deg2rad(FOV_DEG) / 2)
    dist = max(2.5 * radius, 1e-3)
    cam_pos = center + np.array([0.0, 0.0, dist])

    # View transform: camera looks down -z (world +z towards camera).
    pts_cam = verts - cam_pos
    z = -pts_cam[:, 2]  # depth, positive in front of camera
    u = f * pts_cam[:, 0] / np.maximum(z, 1e-9) + width / 2
    v = -f * pts_cam[:, 1] / np.maximum(z, 1e-9) + height / 2

    zbuf = np.full((height, width), np.inf, dtype=np.float64)
    tri_uv = np.stack([u[faces], v[faces]], axis=-1)  # (F, 3, 2)
    tri_z = z[faces]  # (F, 3)

    for t in range(faces.shape[0]):
        uv = tri_uv[t]
        zz = tri_z[t]
        if (zz <= 0).any():
            continue
        x0, y0 = np.floor(uv.min(0)).astype(int)
        x1, y1 = np.ceil(uv.max(0)).astype(int)
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1 + 1, width), min(y1 + 1, height)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(
            np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5
        )
        # Barycentric coordinates.
        d = (uv[1, 1] - uv[2, 1]) * (uv[0, 0] - uv[2, 0]) + (
            uv[2, 0] - uv[1, 0]
        ) * (uv[0, 1] - uv[2, 1])
        if abs(d) < 1e-12:
            continue
        w0 = (
            (uv[1, 1] - uv[2, 1]) * (xs - uv[2, 0])
            + (uv[2, 0] - uv[1, 0]) * (ys - uv[2, 1])
        ) / d
        w1 = (
            (uv[2, 1] - uv[0, 1]) * (xs - uv[2, 0])
            + (uv[0, 0] - uv[2, 0]) * (ys - uv[2, 1])
        ) / d
        w2 = 1 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        # Perspective-correct depth interpolation (1/z linear in screen).
        zi = 1.0 / (w0 / zz[0] + w1 / zz[1] + w2 / zz[2])
        patch = zbuf[y0:y1, x0:x1]
        upd = inside & (zi < patch)
        patch[upd] = zi[upd]
        zbuf[y0:y1, x0:x1] = patch

    ys, xs = np.nonzero(np.isfinite(zbuf))
    zz = zbuf[ys, xs]
    xw = (xs + 0.5 - width / 2) * zz / f + cam_pos[0]
    yw = -(ys + 0.5 - height / 2) * zz / f + cam_pos[1]
    zw = cam_pos[2] - zz
    return np.stack([xw, yw, zw], 1).astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_root", type=str, required=True)
    parser.add_argument("--dest_root", type=str, required=True)
    args = parser.parse_args()

    data_root = osp.join(args.src_root, "mesh")
    data_ids = sorted(os.listdir(data_root))
    save_root = osp.join(args.dest_root, "pcd")
    os.makedirs(save_root, exist_ok=True)

    for data_id in data_ids:
        n_object = int(data_id[:2])
        data_path = osp.join(data_root, data_id)
        save_path = osp.join(save_root, data_id)
        os.makedirs(save_path, exist_ok=True)
        for fid in range(N_FRAME):
            meshes = [
                Mesh.load_obj(
                    osp.join(data_path, "object_%02d_%02d.obj" % (fid, oi))
                )
                for oi in range(n_object)
            ]
            pc = render_depth_pointcloud(meshes)
            np.save(osp.join(save_path, "pc_%02d.npy" % fid), pc)


if __name__ == "__main__":
    main()
