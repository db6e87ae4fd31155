"""Minimal numpy triangle-mesh utilities (OBJ load/export, transforms,
bounds, area-weighted surface sampling, boxes).

Replaces the reference's trimesh dependency (unavailable here) for the
OGC-DR/OGC-DRSV procedural generators.  Surface sampling is area-weighted
uniform (the reference uses trimesh's rejection-based "even" sampling; after
the 100k->2048 FPS downsample the distributions are equivalent in practice).
"""

from __future__ import annotations

import numpy as np


class Mesh:
    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.faces = np.asarray(faces, dtype=np.int64)

    # ------------------------------------------------------------------
    @classmethod
    def load_obj(cls, path: str) -> "Mesh":
        verts, faces = [], []
        with open(path, errors="ignore") as f:
            for line in f:
                if line.startswith("v "):
                    parts = line.split()
                    verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
                elif line.startswith("f "):
                    idx = [p.split("/")[0] for p in line.split()[1:]]
                    idx = [int(i) - 1 if int(i) > 0 else len(verts) + int(i)
                           for i in idx]
                    # fan-triangulate polygons
                    for k in range(1, len(idx) - 1):
                        faces.append([idx[0], idx[k], idx[k + 1]])
        return cls(np.array(verts), np.array(faces))

    def export(self, path: str) -> None:
        with open(path, "w") as f:
            for v in self.vertices:
                f.write("v %.6f %.6f %.6f\n" % tuple(v))
            for face in self.faces:
                f.write("f %d %d %d\n" % tuple(face + 1))

    # ------------------------------------------------------------------
    def copy(self) -> "Mesh":
        return Mesh(self.vertices.copy(), self.faces.copy())

    @property
    def bounds(self) -> np.ndarray:
        """(2, 3): [min; max]."""
        return np.stack([self.vertices.min(0), self.vertices.max(0)])

    def apply_transform(self, mat: np.ndarray) -> "Mesh":
        """In-place 4x4 homogeneous transform (trimesh-compatible)."""
        self.vertices = self.vertices @ mat[:3, :3].T + mat[:3, 3]
        return self

    @property
    def _face_areas(self) -> np.ndarray:
        v = self.vertices
        a = v[self.faces[:, 1]] - v[self.faces[:, 0]]
        b = v[self.faces[:, 2]] - v[self.faces[:, 0]]
        return 0.5 * np.linalg.norm(np.cross(a, b), axis=1)

    @property
    def area(self) -> float:
        return float(self._face_areas.sum())

    def sample_surface(self, n: int, rng=np.random) -> np.ndarray:
        """Area-weighted uniform surface samples: (n, 3)."""
        areas = self._face_areas
        total = areas.sum()
        if total <= 0 or n <= 0:
            return np.zeros((0, 3))
        probs = areas / total
        face_idx = rng.choice(len(areas), size=n, p=probs)
        v = self.vertices
        f = self.faces[face_idx]
        # uniform barycentric coordinates
        r1 = np.sqrt(rng.rand(n, 1))
        r2 = rng.rand(n, 1)
        p = (
            (1 - r1) * v[f[:, 0]]
            + r1 * (1 - r2) * v[f[:, 1]]
            + r1 * r2 * v[f[:, 2]]
        )
        return p


def box(extents) -> Mesh:
    """Axis-aligned box centered at the origin (trimesh.creation.box)."""
    ex, ey, ez = np.asarray(extents, dtype=np.float64) / 2.0
    verts = np.array(
        [
            [-ex, -ey, -ez], [ex, -ey, -ez], [ex, ey, -ez], [-ex, ey, -ez],
            [-ex, -ey, ez], [ex, -ey, ez], [ex, ey, ez], [-ex, ey, ez],
        ]
    )
    faces = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # -z
            [4, 5, 6], [4, 6, 7],  # +z
            [0, 1, 5], [0, 5, 4],  # -y
            [3, 6, 2], [3, 7, 6],  # +y
            [0, 7, 3], [0, 4, 7],  # -x
            [1, 2, 6], [1, 6, 5],  # +x
        ]
    )
    return Mesh(verts, faces)
