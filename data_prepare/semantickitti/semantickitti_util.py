"""Minimal SemanticKITTI calibration: odometry-format calib.txt (P0..P3 +
Tr velodyne->camera), velodyne->camera and camera->image projections."""

from __future__ import annotations

import numpy as np


class Calibration:
    def __init__(self, filepath):
        data = {}
        with open(filepath) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                key, value = line.split(":", 1)
                data[key] = np.array([float(x) for x in value.split()])
        self.P = data["P2"].reshape(3, 4)
        self.V2C = data["Tr"].reshape(3, 4)

    @staticmethod
    def _homog(pts):
        return np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=1)

    def project_velo_to_ref(self, pts):
        return self._homog(pts) @ self.V2C.T

    def project_ref_to_image(self, pts):
        """:return: (N, 3) [u, v, depth]."""
        uvw = self._homog(pts) @ self.P.T
        uv = uvw[:, :2] / uvw[:, 2:3]
        return np.concatenate([uv, pts[:, 2:3]], axis=1)
