"""Tests for the offline data-prep tooling (mesh utils, rasterizer,
calibration math)."""

import sys
import os.path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "data_prepare", "ogcdr"))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "data_prepare", "ogcdrsv"))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "data_prepare", "kittidet"))

from mesh_util import Mesh, box  # noqa: E402


def test_box_geometry():
    b = box((1.0, 0.5, 2.0))
    np.testing.assert_allclose(
        b.bounds, [[-0.5, -0.25, -1.0], [0.5, 0.25, 1.0]]
    )
    np.testing.assert_allclose(b.area, 2 * (0.5 + 1.0 + 2.0), rtol=1e-9)


def test_surface_sampling_on_surface():
    b = box((2.0, 2.0, 2.0))
    pts = b.sample_surface(500, np.random.RandomState(0))
    # every sample must lie on one of the six faces
    on_face = np.isclose(np.abs(pts), 1.0, atol=1e-9).any(axis=1)
    assert on_face.all()


def test_obj_roundtrip(tmp_path):
    b = box((1.0, 1.0, 1.0))
    p = str(tmp_path / "b.obj")
    b.export(p)
    m = Mesh.load_obj(p)
    np.testing.assert_allclose(m.bounds, b.bounds)
    np.testing.assert_allclose(m.area, b.area, rtol=1e-9)


def test_apply_transform():
    b = box((1.0, 1.0, 1.0))
    mat = np.eye(4)
    mat[:3, 3] = [1.0, 2.0, 3.0]
    b.apply_transform(mat)
    np.testing.assert_allclose(b.bounds.sum(0) / 2, [1.0, 2.0, 3.0])


def test_depth_rasterizer_sees_front_face():
    from build_ogcdrsv import render_depth_pointcloud

    b = box((1.0, 1.0, 1.0))
    pc = render_depth_pointcloud([b], width=160, height=120)
    assert pc.shape[0] > 100
    # Camera is on +z: visible points must be on (or near) the +z face.
    assert pc[:, 2].min() > -0.51
    assert np.isclose(pc[:, 2].max(), 0.5, atol=0.02)
    # Single view: the -z face must NOT appear.
    assert (pc[:, 2] > -0.45).all()


def test_kitti_calibration_projection(tmp_path):
    import kittidet_util as utils

    calib_txt = """P2: 700 0 600 40 0 700 200 1 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0
"""
    p = str(tmp_path / "calib.txt")
    with open(p, "w") as f:
        f.write(calib_txt)
    calib = utils.Calibration(p)
    # A point 10m ahead in velodyne frame -> (0, 0, 10) in camera frame.
    velo = np.array([[10.0, 0.0, 0.0]])
    rect = calib.project_velo_to_rect(velo)
    np.testing.assert_allclose(rect, [[0.0, 0.0, 10.0]], atol=1e-9)
    uvd = calib.project_rect_to_image(rect)
    np.testing.assert_allclose(uvd[0, 2], 10.0)
    np.testing.assert_allclose(uvd[0, 0], 600 + 40 / 10.0, atol=1e-6)
