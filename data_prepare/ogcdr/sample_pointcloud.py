"""Re-sample point clouds at a different density from saved OGC-DR meshes.

Parity with reference data_prepare/ogcdr/sample_pointcloud.py.

Usage: python sample_pointcloud.py <data_root> --save_root <out>
           [--n_sample_point_fps 2048] [--keep_background]
"""

import argparse
import os
import os.path as osp
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

from mesh_util import Mesh  # noqa: E402
from build_ogcdr import (  # noqa: E402
    GROUND_LEVEL,
    N_SAMPLE_POINT,
    WALL_THICKNESS,
)
from ogc_tpu.utils.gpf import fps_downsample  # noqa: E402


def sample_pointcloud(meshes, walls, ground, xz_range, n_fps, keep_background):
    n_object = len(meshes)
    if keep_background:
        meshes = meshes + [ground] + walls
    areas = np.array([m.area for m in meshes])
    areas = areas / areas.sum()
    n_points = [int(a * N_SAMPLE_POINT) for a in areas]

    points, segms = [], []
    for i, mesh in enumerate(meshes):
        pi = mesh.sample_surface(n_points[i])
        segm = ((i + 1) if i < n_object else 0) * np.ones(pi.shape[0], np.int16)
        points.append(pi)
        segms.append(segm)
    points = np.concatenate(points, 0).astype(np.float32)
    segms = np.concatenate(segms, 0).astype(np.int16)

    mask = points[:, 1] > (GROUND_LEVEL - 1e-4)
    mask &= points[:, 2] > (-xz_range[1] / 2.0 + WALL_THICKNESS - 1e-4)
    mask &= points[:, 0] > (-xz_range[0] / 2.0 + WALL_THICKNESS - 1e-4)
    mask &= points[:, 2] < (xz_range[1] / 2.0 - WALL_THICKNESS + 1e-4)
    mask &= points[:, 0] < (xz_range[0] / 2.0 - WALL_THICKNESS + 1e-4)
    points, segms = points[mask], segms[mask]

    fps_idx = fps_downsample(points, n_sample_point=n_fps)
    return points[fps_idx], segms[fps_idx]


def main():
    import pickle

    parser = argparse.ArgumentParser()
    parser.add_argument("data_root", type=str)
    parser.add_argument("--save_root", type=str, required=True)
    parser.add_argument("--n_sample_point_fps", type=int, default=2048)
    parser.add_argument("--keep_background", default=False, action="store_true")
    args = parser.parse_args()

    mesh_root = osp.join(args.data_root, "mesh")
    data_ids = sorted(os.listdir(mesh_root))
    n_frame = 4
    os.makedirs(args.save_root, exist_ok=True)

    for data_id in data_ids:
        n_object = int(data_id[:2])
        data_path = osp.join(mesh_root, data_id)
        save_path = osp.join(args.save_root, data_id)
        os.makedirs(save_path, exist_ok=True)

        with open(osp.join(data_path, "meta.pkl"), "rb") as f:
            meta = pickle.load(f)
        xz_range = np.asarray(meta["xz_ground_range"])

        walls = [
            Mesh.load_obj(osp.join(data_path, "wall_%02d.obj" % i))
            for i in range(4)
        ]
        ground = Mesh.load_obj(osp.join(data_path, "ground.obj"))

        for fid in range(n_frame):
            meshes = [
                Mesh.load_obj(
                    osp.join(data_path, "object_%02d_%02d.obj" % (fid, oi))
                )
                for oi in range(n_object)
            ]
            points, segms = sample_pointcloud(
                meshes, walls, ground, xz_range,
                args.n_sample_point_fps, args.keep_background,
            )
            np.save(osp.join(save_path, "pc_%02d.npy" % fid), points)
            np.save(osp.join(save_path, "segm_%02d.npy" % fid), segms)


if __name__ == "__main__":
    main()
