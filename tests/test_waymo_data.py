"""Waymo dataset reader tests on a synthetic fixture in the reference's
on-disk layout (pc_%04d / segm_%04d / semantic_segm_%04d / flow_%04d_%04d /
pose_%04d npy files)."""

import json
import os
import os.path as osp

import numpy as np
import pytest

from ogc_tpu.data.waymo import WaymoOpenDataset, WaymoOpenSingleFrameDataset


@pytest.fixture(scope="module")
def waymo_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("waymo"))
    rng = np.random.RandomState(0)
    seqs = ["seq_a", "seq_b"]
    n_frames, n = 3, 64
    for seq in seqs:
        d = osp.join(root, "data", seq)
        os.makedirs(d, exist_ok=True)
        for t in range(n_frames):
            pc = rng.rand(n, 3).astype(np.float32) * 30
            segm = rng.randint(0, 4, n).astype(np.int32)
            sem = np.where(segm > 0, rng.randint(1, 4, n), 0).astype(np.int32)
            np.save(osp.join(d, "pc_%04d.npy" % t), pc)
            np.save(osp.join(d, "segm_%04d.npy" % t), segm)
            np.save(osp.join(d, "semantic_segm_%04d.npy" % t), sem)
            np.save(osp.join(d, "pose_%04d.npy" % t), np.eye(4))
            if t > 0:
                np.save(
                    osp.join(d, "flow_%04d_%04d.npy" % (t, t - 1)),
                    0.1 * rng.randn(n, 3).astype(np.float32),
                )
    mapping = osp.join(root, "train.txt")
    with open(mapping, "w") as f:
        f.write("\n".join(s + ".tfrecord" for s in seqs))
    return root, mapping


def test_waymo_two_frame(waymo_root):
    root, mapping = waymo_root
    ds = WaymoOpenDataset(
        data_root=root, mapping_path=mapping, downsampled=True,
        ignore_class_ids=[2, 3], ignore_npoint_thresh=5,
    )
    assert len(ds) == 4  # 2 seqs x (3 frames - 1) backward pairs
    pcs, segms, flows, valids = ds[0]
    assert pcs.shape == (2, 64, 3)
    assert segms.min() == 0
    # Points of ignored classes must be invalid and relabeled background.
    assert set(np.unique(valids)) <= {0.0, 1.0}


def test_waymo_single_frame(waymo_root):
    root, mapping = waymo_root
    ds = WaymoOpenSingleFrameDataset(
        data_root=root, mapping_path=mapping, downsampled=True,
        ignore_class_ids=[2, 3], ignore_npoint_thresh=5,
    )
    assert len(ds) == 6  # 2 seqs x 3 frames
    pcs, segms, valids = ds[0]  # 3-tuple (no flow)
    assert pcs.shape == (1, 64, 3)
    assert segms.shape == (1, 64)


def test_waymo_select_frame(waymo_root, tmp_path):
    root, mapping = waymo_root
    sel = [["seq_a", 1, 0], ["seq_b", 2, 1]]
    sel_path = str(tmp_path / "sel.json")
    with open(sel_path, "w") as f:
        json.dump(sel, f)
    ds = WaymoOpenDataset(
        data_root=root, mapping_path=mapping, downsampled=True,
        select_frame=sel_path,
    )
    assert len(ds) == 2
    assert ds.data_ids[0] == ("seq_a", 1, 0)


def test_waymo_shipped_protocol_splits(waymo_root):
    """The shipped Waymo protocol split JSONs (reference
    data_prepare/waymo/splits/*.json) must exist and resolve through
    WaymoOpenDataset's select_frame loader (ogc_tpu/data/waymo.py)."""
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    splits = osp.join(repo, "data_prepare", "waymo", "splits")
    root, mapping = waymo_root
    # Two-frame (unsup) splits hold (seq, t, t-1) backward pairs; the sup
    # splits hold single-frame (seq, t) ids for WaymoOpenSingleFrameDataset.
    for name, n in {"train_unsup.json": 6187, "val_unsup.json": 1393}.items():
        path = osp.join(splits, name)
        assert osp.isfile(path), "missing shipped split %s" % name
        ds = WaymoOpenDataset(
            data_root=root, mapping_path=mapping, downsampled=True,
            select_frame=path,
        )
        assert len(ds) == n
        seq, v1, v2 = ds.data_ids[0]
        assert seq.startswith("segment-") and v2 == v1 - 1  # backward pairs
    for name, n in {"train_sup.json": 31605, "val_sup.json": 7998}.items():
        path = osp.join(splits, name)
        assert osp.isfile(path), "missing shipped split %s" % name
        ds = WaymoOpenSingleFrameDataset(
            data_root=root, mapping_path=mapping, downsampled=True,
            select_frame=path,
        )
        assert len(ds) == n
        seq, t = ds.data_ids[0]
        assert seq.startswith("segment-") and t >= 0
    # The raw-layout yaml data constants must be present too.
    import yaml
    with open(osp.join(repo, "data_prepare", "waymo", "waymo_dataset.yaml")) as f:
        cfg = yaml.safe_load(f)
    assert cfg["SAMPLED_INTERVAL"] == {"train": 20, "test": 1}
    assert cfg["DATA_SPLIT"] == {"train": "train", "test": "val"}


def test_waymo_save_predflow(waymo_root, tmp_path):
    root, mapping = waymo_root
    ds = WaymoOpenDataset(data_root=root, mapping_path=mapping, downsampled=True)
    flow = np.random.RandomState(1).randn(1, 64, 3).astype(np.float32)
    ds._save_predflow(flow, str(tmp_path), batch_size=1, n_frame=1, offset=0)
    seq, v1, v2 = ds.data_ids[0]
    saved = np.load(tmp_path / seq / ("flow_%04d_%04d.npy" % (v1, v2)))
    np.testing.assert_allclose(saved, flow[0])
