"""Data-layer tests on synthetic SAPIEN / OGC-DR fixtures."""

import numpy as np
import pytest

from ogc_tpu.data.sapien import SapienDataset
from ogc_tpu.data.ogcdr import OGCDynamicRoomDataset
from ogc_tpu.data.base import DataLoader
from tests.synth import make_sapien_root, make_ogcdr_root


@pytest.fixture(scope="module")
def sapien_root(tmp_path_factory):
    return make_sapien_root(str(tmp_path_factory.mktemp("sapien")))


@pytest.fixture(scope="module")
def ogcdr_root(tmp_path_factory):
    return make_ogcdr_root(str(tmp_path_factory.mktemp("ogcdr")))


def test_sapien_item_shapes(sapien_root):
    ds = SapienDataset(sapien_root, split="train", view_sels=[[0, 1], [1, 2]])
    assert len(ds) == 3 * 2
    pcs, segms, flows, valids = ds[0]
    assert pcs.shape == (2, 128, 3)
    assert segms.shape == (2, 128)
    assert flows.shape == (2, 128, 3)
    assert valids.shape == (2, 128)
    assert segms.min() == 0  # compressed ids


def test_sapien_flow_is_consistent(sapien_root):
    # GT flow must warp frame1 exactly onto frame2 (same underlying points).
    ds = SapienDataset(sapien_root, split="train", view_sels=[[0, 1]])
    pcs, segms, flows, _ = ds[0]
    np.testing.assert_allclose(pcs[0] + flows[0], pcs[1], atol=1e-5)
    np.testing.assert_allclose(pcs[1] + flows[1], pcs[0], atol=1e-5)


def test_ogcdr_flow_is_consistent(ogcdr_root):
    ds = OGCDynamicRoomDataset(ogcdr_root, split="train", view_sels=[[0, 1]])
    pcs, segms, flows, _ = ds[0]
    np.testing.assert_allclose(pcs[0] + flows[0], pcs[1], atol=1e-5)


def test_aug_transform_doubles_frames(sapien_root):
    ds = SapienDataset(
        sapien_root,
        split="train",
        view_sels=[[0, 1]],
        aug_transform=True,
        aug_transform_args={
            "scale_low": 0.95,
            "scale_high": 1.05,
            "degree_range": [0, 180, 0],
            "shift_range": [0, 0, 0],
        },
    )
    pcs, segms, flows, valids = ds[0]
    assert pcs.shape == (4, 128, 3)
    assert segms.shape == (4, 128)
    # Augmented views also keep flow consistency.
    np.testing.assert_allclose(pcs[2] + flows[2], pcs[3], atol=1e-4)


def test_onehot_label(sapien_root):
    ds = SapienDataset(
        sapien_root, split="train", view_sels=[[0, 1]], onehot_label=True,
        max_n_object=8,
    )
    pcs, segms, flows, valids = ds[0]
    assert segms.shape == (2, 128, 8)
    np.testing.assert_allclose(segms.sum(-1), 1.0)


def test_dataloader_batching(sapien_root):
    ds = SapienDataset(sapien_root, split="train", view_sels=[[0, 1], [1, 2]])
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader)
    pcs, segms, flows, valids = batches[0]
    assert pcs.shape == (4, 2, 128, 3)
    total = sum(b[0].shape[0] for b in batches)
    assert total == len(ds)


def test_save_predflow_roundtrip(sapien_root, tmp_path):
    ds = SapienDataset(sapien_root, split="train", view_sels=[[0, 1]])
    flow = np.random.RandomState(0).randn(2, 128, 3).astype(np.float32)
    ds._save_predflow(flow, str(tmp_path), batch_size=2, n_frame=2, offset=0)
    saved = np.load(tmp_path / "000000.npy")
    np.testing.assert_allclose(saved, flow)


def test_kittisf_dataset_loads(tmp_path):
    """KITTI-SF downsampled layout end-to-end incl. the native npy batch
    loader path (round-2 gap: no kittisf fixture existed)."""
    from ogc_tpu.data.kittisf import KITTISceneFlowDataset
    from tests.synth import make_kittisf_root

    root, train_map, _ = make_kittisf_root(str(tmp_path / "ksf"))
    ds = KITTISceneFlowDataset(
        data_root=root, mapping_path=train_map, downsampled=True,
        view_sels=[[0, 1], [1, 0]], decentralize=True,
    )
    assert len(ds) == 6  # 3 train scenes x 2 view pairs
    pcs, segms, flows, valids = ds[0]
    assert pcs.shape == (2, 256, 3) and flows.shape == (2, 256, 3)
    assert np.isfinite(pcs).all() and np.isfinite(flows).all()
    # forward/backward flow symmetry of the fixture survives the pipeline
    np.testing.assert_allclose(flows[0], -flows[1], atol=1e-6)
    # decentralize removed the global mean
    assert abs(pcs.mean()) < 1.0
