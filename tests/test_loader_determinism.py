"""DataLoader determinism and epoch-reshuffling tests."""

import numpy as np

from ogc_tpu.data.base import DataLoader
from ogc_tpu.data.sapien import SapienDataset
from tests.synth import make_sapien_root


def batches_signature(loader):
    return [tuple(b[0].sum(axis=(1, 2, 3)).round(4)) for b in loader]


def test_same_seed_same_order(tmp_path):
    root = make_sapien_root(str(tmp_path / "s"), n_scenes=4, n_points=32)
    ds = SapienDataset(root, split="train", view_sels=[[0, 1], [1, 2]])
    l1 = DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=1)
    l2 = DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=1)
    assert batches_signature(l1) == batches_signature(l2)


def test_epochs_reshuffle(tmp_path):
    root = make_sapien_root(str(tmp_path / "s2"), n_scenes=6, n_points=32)
    ds = SapienDataset(root, split="train", view_sels=[[0, 1], [1, 2]])
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=3, num_workers=1)
    e1 = batches_signature(loader)
    e2 = batches_signature(loader)  # advances the internal RNG
    assert e1 != e2
    # but the multiset of samples is identical
    assert sorted(sum(e1, ())) == sorted(sum(e2, ()))


def test_drop_last(tmp_path):
    root = make_sapien_root(str(tmp_path / "s3"), n_scenes=4, n_points=32)
    ds = SapienDataset(root, split="train", view_sels=[[0, 1]])  # 3 items
    keep = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    drop = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                      num_workers=1)
    assert sum(b[0].shape[0] for b in keep) == 3
    assert sum(b[0].shape[0] for b in drop) == 2


def test_loader_propagates_worker_exceptions():
    """A dataset error inside a loader worker must fail the epoch loudly
    (round-2 finding: a missing predflow file crashed the worker but the
    epoch silently completed empty, feeding val loss 0.0 into
    best-checkpoint selection)."""
    import pytest
    from ogc_tpu.data.base import DataLoader

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise FileNotFoundError("missing 000005.npy")
            import numpy as np
            return (np.zeros((2, 4, 3), np.float32),) * 4

    loader = DataLoader(Broken(), batch_size=4, num_workers=2)
    with pytest.raises(FileNotFoundError, match="000005"):
        for _ in loader:
            pass
