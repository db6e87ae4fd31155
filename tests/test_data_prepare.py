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


def test_ogcdr_generator_dry_run(tmp_path):
    """End-to-end dry run of the OGC-DR room generator on synthetic box
    'ShapeNet' meshes: placement, dynamics, walls/ground, surface sampling,
    FPS — the full pipeline minus the real meshes (reference:
    data_prepare/ogcdr/build_ogcdr.py)."""
    import build_ogcdr as G

    # Fake ShapeNet: one box model per class, plus matching split lists.
    splits = tmp_path / "splits"
    src = tmp_path / "root" / "ShapeNet_mesh"
    rng = np.random.RandomState(0)
    for cl in G.CLASSES:
        (splits / cl).mkdir(parents=True)
        for split in G.SPLIT_NAMES:
            (splits / cl / f"{split}.lst").write_text("m0\n")
        d = src / cl / "m0"
        d.mkdir(parents=True)
        b = box(tuple(0.5 + 0.5 * rng.rand(3)))
        b.export(str(d / "model.obj"))

    G.main([
        str(tmp_path / "root"),
        "--dataset_size", "2",
        "--room_types", "4",          # n_object = 4 (fastest type)
        "--n_sample_point", "4096",
        "--splits_root", str(splits),
    ])

    data = tmp_path / "root" / "data"
    names = (data / "train.lst").read_text().strip().split("\n")
    assert names and names[0]
    for fid in range(G.N_FRAME):
        pc = np.load(str(data / names[0] / f"pc_{fid:02d}.npy"))
        segm = np.load(str(data / names[0] / f"segm_{fid:02d}.npy"))
        pose = np.load(str(data / names[0] / f"pose_{fid:02d}.npy"))
        assert pc.shape == (G.N_SAMPLE_POINT_FPS, 3)
        assert segm.shape == (G.N_SAMPLE_POINT_FPS,)
        assert set(np.unique(segm)) <= set(range(1, 5))
        assert pose.shape == (4, 4, 4)
        assert np.isfinite(pc).all()
    # meshes + meta saved too
    mesh_dir = tmp_path / "root" / "mesh" / names[0]
    assert (mesh_dir / "meta.pkl").exists()
    assert (mesh_dir / "ground.obj").exists()
