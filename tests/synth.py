"""Synthetic dataset builders shared by tests: tiny SAPIEN- and OGC-DR-format
scenes with exact rigid GT, written in the reference's on-disk layouts."""

import json
import os
import os.path as osp

import numpy as np
from scipy.spatial.transform import Rotation


def rand_se3(rng, max_deg=30.0, max_shift=0.3):
    R = Rotation.from_euler(
        "zyx", rng.uniform(-max_deg, max_deg, 3), degrees=True
    ).as_matrix()
    t = rng.uniform(-max_shift, max_shift, 3)
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = t
    return M


def make_sapien_root_coherent(root, n_scenes=60, n_views=4, n_points=512,
                              max_parts=5, seed=0, test_frac=0.2):
    """MBS-SAPIEN-format dataset with SPATIALLY COHERENT parts.

    make_sapien_root assigns part labels iid per point, which interleaves
    every part through the whole cloud — fine as a smoke fixture, but it
    makes the smoothness prior ADVERSARIAL to the motion signal.  Real
    SAPIEN scenes are articulated objects whose parts are compact regions.
    Here each part is an anisotropic Gaussian blob around a distinct
    center (parts per scene uniform in [2, max_parts]), moved by per-part
    SE(3)s with moderate articulation — the geometry class the reference
    protocol actually trains on.  Used by tools/protocol_sapien.py for
    reference-length protocol runs."""
    rng = np.random.RandomState(seed)
    os.makedirs(osp.join(root, "data"), exist_ok=True)
    ids = list(range(n_scenes))
    for i in ids:
        n_parts = rng.randint(2, max_parts + 1)
        centers = rng.uniform(-0.6, 0.6, (n_parts, 3))
        scales = rng.uniform(0.08, 0.3, (n_parts, 3))
        # Points per part: roughly balanced with jitter.
        w = rng.dirichlet(np.full(n_parts, 5.0))
        counts = np.maximum(1, (w * n_points).astype(int))
        counts[0] += n_points - counts.sum()
        base, segm = [], []
        for p in range(n_parts):
            base.append(centers[p]
                        + scales[p] * rng.randn(counts[p], 3))
            segm.append(np.full(counts[p], p + 1))
        base = np.concatenate(base).astype(np.float32)
        segm = np.concatenate(segm)
        perm = rng.permutation(n_points)  # no part-sorted point order
        base, segm = base[perm], segm[perm]
        cams = [rand_se3(rng, max_deg=10.0, max_shift=0.1)
                for _ in range(n_views)]
        motions = {
            str(p): [rand_se3(rng, max_deg=25.0, max_shift=0.25)
                     for _ in range(n_views)]
            for p in range(1, n_parts + 1)
        }
        pcs = np.zeros((n_views, n_points, 3), dtype=np.float32)
        for v in range(n_views):
            for p in range(1, n_parts + 1):
                sel = segm == p
                M = np.linalg.inv(cams[v]) @ motions[str(p)][v]
                pcs[v, sel] = base[sel] @ M[:3, :3].T + M[:3, 3]
        trans = {"cam": [cams[v] for v in range(n_views)]}
        for p in range(1, n_parts + 1):
            trans[p] = motions[str(p)]
        np.savez(
            osp.join(root, "data", "%06d.npz" % i),
            pc=pcs,
            segm=np.tile(segm, (n_views, 1)),
            trans=np.array(trans, dtype=object),
        )
    n_test = max(1, int(n_scenes * test_frac))
    meta = {"train": ids[:-n_test], "val": ids[-n_test:], "test": ids[-n_test:]}
    with open(osp.join(root, "meta.json"), "w") as f:
        json.dump(meta, f)
    return root


def make_sapien_root(root, n_scenes=4, n_views=4, n_points=128, n_parts=2, seed=0):
    """Write a tiny MBS-SAPIEN-format dataset: data/%06d.npz + meta.json."""
    rng = np.random.RandomState(seed)
    os.makedirs(osp.join(root, "data"), exist_ok=True)
    ids = list(range(n_scenes))
    for i in ids:
        # Canonical (world) points per part.
        base = rng.rand(n_points, 3).astype(np.float32)
        segm = rng.randint(1, n_parts + 1, size=n_points)
        cams = [rand_se3(rng) for _ in range(n_views)]
        motions = {
            str(p): [rand_se3(rng) for _ in range(n_views)]
            for p in range(1, n_parts + 1)
        }
        pcs = np.zeros((n_views, n_points, 3), dtype=np.float32)
        for v in range(n_views):
            for p in range(1, n_parts + 1):
                sel = segm == p
                M = np.linalg.inv(cams[v]) @ motions[str(p)][v]
                pcs[v, sel] = base[sel] @ M[:3, :3].T + M[:3, 3]
        trans = {"cam": [cams[v] for v in range(n_views)]}
        for p in range(1, n_parts + 1):
            trans[p] = motions[str(p)]
        np.savez(
            osp.join(root, "data", "%06d.npz" % i),
            pc=pcs,
            segm=np.tile(segm, (n_views, 1)),
            trans=np.array(trans, dtype=object),
        )
    meta = {"train": ids[: max(1, n_scenes - 1)], "val": ids[max(1, n_scenes - 1):],
            "test": ids}
    with open(osp.join(root, "meta.json"), "w") as f:
        json.dump(meta, f)
    return root


def make_ogcdr_root(root, n_scenes=3, n_views=4, n_points=96, n_objects=3, seed=0):
    """Write a tiny OGC-DR-format dataset: data/<id>/pc_%02d.npy etc."""
    rng = np.random.RandomState(seed)
    data_dir = osp.join(root, "data")
    os.makedirs(data_dir, exist_ok=True)
    ids = ["scene%03d" % i for i in range(n_scenes)]
    for sid in ids:
        sdir = osp.join(data_dir, sid)
        os.makedirs(sdir, exist_ok=True)
        base = rng.rand(n_points, 3).astype(np.float32)
        # ids: 0 = background (static), 1..n_objects = moving objects
        segm = rng.randint(0, n_objects + 1, size=n_points)
        poses0 = np.stack([np.eye(4) for _ in range(n_objects)], 0)
        for v in range(n_views):
            poses = np.stack([rand_se3(rng) for _ in range(n_objects)], 0)
            if v == 0:
                poses = poses0
            pc = base.copy()
            for k in range(n_objects):
                sel = segm == (k + 1)
                pc[sel] = base[sel] @ poses[k][:3, :3].T + poses[k][:3, 3]
            np.save(osp.join(sdir, "pc_%02d.npy" % v), pc.astype(np.float32))
            np.save(osp.join(sdir, "segm_%02d.npy" % v), segm)
            np.save(osp.join(sdir, "pose_%02d.npy" % v), poses)
    for split in ["train", "val", "test"]:
        with open(osp.join(data_dir, split + ".lst"), "w") as f:
            f.write("\n".join(ids))
    return root


def make_kittisf_root(base, n_scenes=4, n_points=256, seed=0):
    """Write a tiny downsampled-KITTI-SF-format dataset plus split files.

    Layout (reference data_prepare/kittisf): data/<id>/{pc1,pc2,flow1,flow2,
    segm1,segm2}.npy; mapping files list ids one per line.
    :return: (data_root, train_mapping_path, val_mapping_path).
    """
    rng = np.random.RandomState(seed)
    ids = ["%06d" % i for i in range(n_scenes)]
    for i in ids:
        d = osp.join(base, "data", i)
        os.makedirs(d, exist_ok=True)
        pc1 = (20 * rng.rand(n_points, 3)).astype(np.float32)
        flow1 = (0.3 * rng.randn(n_points, 3)).astype(np.float32)
        np.save(osp.join(d, "pc1.npy"), pc1)
        np.save(osp.join(d, "pc2.npy"), pc1 + flow1)
        np.save(osp.join(d, "flow1.npy"), flow1)
        np.save(osp.join(d, "flow2.npy"), -flow1)
        np.save(osp.join(d, "segm1.npy"), rng.randint(0, 3, n_points))
        np.save(osp.join(d, "segm2.npy"), rng.randint(0, 3, n_points))
    os.makedirs(osp.join(base, "splits"), exist_ok=True)
    train_map = osp.join(base, "splits", "train.txt")
    val_map = osp.join(base, "splits", "val.txt")
    with open(train_map, "w") as f:
        f.write("\n".join(ids[:-1]))
    with open(val_map, "w") as f:
        f.write(ids[-1])
    return base, train_map, val_map


def scene_like_cloud(rng, n, extent=30.0):
    """Surface-like outdoor cloud: ground plane + a few clusters — the
    regime where Morton blocking / spatial locality is informative (used
    by the pruned-KNN tests and the on-chip KNN A/B bench)."""
    ground = np.c_[extent * rng.rand(n // 2, 2), 0.2 * rng.rand(n // 2, 1)]
    ks = [
        extent * rng.rand(3) * np.array([1, 1, 0.1])
        + rng.randn(n // 14, 3) * np.array([1.5, 1.5, 0.8])
        for _ in range(8)
    ]
    return np.vstack([ground] + ks)[:n].astype(np.float32)
