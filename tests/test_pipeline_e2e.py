"""Full alternation pipeline on synthetic SAPIEN data:
round-1 training -> OA-ICP flow refinement (--save) -> round-2 training from
the saved predicted flows.  Exercises the flow_preds/<name>_R1 directory +
view_sel JSON plumbing end to end (reference README.md:178-334 protocol).
"""

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
import yaml

from tests.synth import make_sapien_root

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.slow
def test_round_alternation(tmp_path):
    env = dict(os.environ)
    env["OGC_PLATFORM"] = "cpu"

    root = str(tmp_path / "MBS_SAPIEN")
    make_sapien_root(osp.join(root, "mbs-shapepart"), n_scenes=3, n_points=64)

    # Seed the "flowstep3d" predictions with GT flows in the reference's
    # on-disk format (what test_flow.py --save would produce).
    from ogc_tpu.data.sapien import SapienDataset

    view_sels = [[0, 1], [1, 0], [1, 2], [2, 1], [2, 3], [3, 2]]
    pf_dir = osp.join(root, "mbs-shapepart", "flow_preds", "flowstep3d")
    os.makedirs(pf_dir, exist_ok=True)
    with open(pf_dir + ".json", "w") as f:
        json.dump({"view_sel": view_sels}, f)
    # Seed BOTH splits (train_seg's val loader reads predflows too; the
    # loader now fails loudly on missing files instead of silently
    # yielding an empty epoch).
    for split in ("train", "val"):
        seed_set = SapienDataset(
            osp.join(root, "mbs-shapepart"), split=split, view_sels=view_sels
        )
        for sid in range(0, len(seed_set), len(view_sels)):
            flows = []
            for k in range(len(view_sels)):
                _, _, fl, _ = seed_set[sid + k]
                flows.append(fl[0])
            seed_set._save_predflow(
                np.stack(flows, 0), save_root=pf_dir,
                batch_size=len(view_sels), n_frame=len(view_sels),
                offset=sid // len(view_sels),
            )

    cfg = {
        "dataset": "sapien",
        "save_path": str(tmp_path / "ckpt" / "sapien_unsup"),
        "random_seed": 10,
        "data": {"root": root, "decentralize": False, "aug_transform_args": None},
        "predflow_path": "flowstep3d",
        "aug_transform_epoch": 9999,
        "ignore_npoint_thresh": 0,
        "epochs": 1,
        "batch_size": 2,
        "lr": 1.0e-3, "lr_decay": 0.7, "lr_clip": 1.0e-5,
        "decay_step": 200000, "weight_decay": 0.0,
        "segnet": {"n_slot": 4, "n_point": 64, "use_xyz": True,
                   "n_transformer_layer": 1, "transformer_embed_dim": 64,
                   "transformer_input_pos_enc": False},
        "loss": {
            "weights": [10.0, 0.1, 0.0], "start_steps": [0, 0, 0],
            "dynamic_loss_params": {"loss_norm": 2},
            "smooth_loss_params": {
                "w_knn": 3.0, "w_ball_q": 1.0,
                "knn_loss_params": {"k": 4, "radius": 0.1, "loss_norm": 1},
                "ball_q_loss_params": {"k": 8, "radius": 0.2, "loss_norm": 1},
            },
            "invariance_loss_params": {"loss_norm": 2},
        },
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    def run(*cmd):
        r = subprocess.run(
            [sys.executable, *cmd], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
        return r

    # Round 1: train on seeded flows.
    run("train_seg.py", cfg_path, "--round", "1")
    assert osp.exists(cfg["save_path"] + "_R1/best.ckpt")

    # OA-ICP: refine flows with the round-1 segmentation, save _R1 flows.
    # Both splits, like the reference protocol (README.md:220, run per
    # ${SPLIT}) — round-2 training reads R1 flows for train AND val.
    r = run("oa_icp.py", cfg_path, "--split", "train", "--round", "1",
            "--test_batch_size", "6", "--save")
    assert "Object-Aware ICP flow" in r.stdout
    # val split additionally exercises --dp data-parallel refinement over
    # the 8-device virtual mesh (per-sample independent -> exact).
    run("oa_icp.py", cfg_path, "--split", "val", "--round", "1",
        "--test_batch_size", "6", "--save", "--dp", "0")
    r1_dir = osp.join(root, "mbs-shapepart", "flow_preds", "flowstep3d_R1")
    assert osp.exists(r1_dir + ".json")
    assert len(os.listdir(r1_dir)) > 0

    # Round 2: train against the refined flows.
    run("train_seg.py", cfg_path, "--round", "2")
    assert osp.exists(cfg["save_path"] + "_R2/best.ckpt")
