"""Minimal KITTI 3D-detection utilities: calibration transforms, velodyne
IO, label parsing, 3D box geometry.

Compact re-implementation of the standard KITTI devkit math covering what
process_kittidet.py needs (the reference vendors a 669-line util; only the
calibration projections, label parser, and box corners are load-bearing).

KITTI coordinate systems:
  velodyne: x forward, y left, z up.
  rect (camera): x right, y down, z forward.
  P (3,4) projects rect -> image pixels.
"""

from __future__ import annotations

import numpy as np


def load_velo_scan(path, dtype=np.float32, n_vec=4):
    return np.fromfile(path, dtype=dtype).reshape(-1, n_vec)


def load_image(path):
    import cv2

    img = cv2.imread(path)
    return img[..., ::-1]  # BGR -> RGB


def roty(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _inverse_rigid_trans(Tr):
    inv = np.zeros_like(Tr)  # (3, 4)
    inv[:3, :3] = Tr[:3, :3].T
    inv[:3, 3] = -Tr[:3, :3].T @ Tr[:3, 3]
    return inv


class Calibration:
    """Parse a KITTI calib file and provide the projection chain
    velodyne -> reference camera -> rectified -> image."""

    def __init__(self, filepath):
        data = {}
        with open(filepath) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                key, value = line.split(":", 1)
                try:
                    data[key] = np.array([float(x) for x in value.split()])
                except ValueError:
                    pass
        self.P = data["P2"].reshape(3, 4)
        self.V2C = data["Tr_velo_to_cam"].reshape(3, 4)
        self.C2V = _inverse_rigid_trans(self.V2C)
        self.R0 = data["R0_rect"].reshape(3, 3)

    @staticmethod
    def _homog(pts):
        return np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=1)

    def project_velo_to_ref(self, pts):
        return self._homog(pts) @ self.V2C.T

    def project_ref_to_rect(self, pts):
        return pts @ self.R0.T

    def project_velo_to_rect(self, pts):
        return self.project_ref_to_rect(self.project_velo_to_ref(pts))

    def project_rect_to_image(self, pts):
        """:return: (N, 3) [u, v, depth]."""
        uvw = self._homog(pts) @ self.P.T
        uv = uvw[:, :2] / uvw[:, 2:3]
        return np.concatenate([uv, pts[:, 2:3]], axis=1)


class Object3d:
    """One KITTI label line (rect-camera-frame 3D box)."""

    def __init__(self, line):
        parts = line.strip().split(" ")
        self.type = parts[0]
        self.truncation = float(parts[1])
        self.occlusion = int(float(parts[2]))
        self.alpha = float(parts[3])
        self.xmin, self.ymin, self.xmax, self.ymax = map(float, parts[4:8])
        self.h, self.w, self.l = map(float, parts[8:11])
        self.t = np.array([float(x) for x in parts[11:14]])
        self.ry = float(parts[14])


def read_label(path):
    with open(path) as f:
        return [Object3d(line) for line in f.readlines() if line.strip()]


def compute_box_3d(obj, P):
    """3D box corners in rect coordinates + image projection.

    :return: (corners_2d (8,2) or None, corners_3d (8,3)).
    """
    R = roty(obj.ry)
    l, w, h = obj.l, obj.w, obj.h
    x = [l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2]
    y = [0, 0, 0, 0, -h, -h, -h, -h]
    z = [w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2]
    corners = R @ np.vstack([x, y, z])
    corners = corners.T + obj.t  # (8, 3)
    if np.any(corners[:, 2] < 0.1):
        return None, corners
    uvw = np.concatenate([corners, np.ones((8, 1))], axis=1) @ P.T
    corners_2d = uvw[:, :2] / uvw[:, 2:3]
    return corners_2d, corners
