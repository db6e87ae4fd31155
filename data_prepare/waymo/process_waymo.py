"""Convert OpenPCDet-preprocessed Waymo raw data + DCA-SRSFE scene flow into
the per-sequence pc/segm/semantic_segm/flow/pose npy layout.

Parity with reference data_prepare/waymo/process_waymo.py: FOV + range
filtering of labeled points, velocity->flow ego-motion compensation, tracked
object ids from box annotations, y-up axis permutation.

Usage: python process_waymo.py --data_root <raw> --save_root <out> --split train
"""

import argparse
import os
import os.path as osp
import pathlib
import pickle
import sys

import numpy as np
import yaml
from scipy.spatial.transform import Rotation

CLASS_NAMES = ["Vehicle", "Pedestrian", "Cyclist"]
# Axis permutation to the OGC convention (y up): (x,y,z) -> (y,z,x).
PERM = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], dtype=np.float32)


def process_flow(flow, pc2, pose1, pose2):
    """Velocity (10 Hz) -> per-frame flow with ego-motion composition
    (process_waymo.py:28-45)."""
    flow = flow * 0.1
    rot1, transl1 = pose1[:3, :3], pose1[:3, 3]
    rot2, transl2 = pose2[:3, :3], pose2[:3, 3]
    inv_rot2 = np.linalg.inv(rot2)
    return pc2 - ((pc2 - flow) @ inv_rot2 + transl2 - transl1) @ rot1


def box_to_segm(points, boxes, object_ids, class_ids, relax=0.01):
    """Per-point instance + semantic ids from 7-DoF lidar boxes
    (process_waymo.py:48-85)."""
    n = points.shape[0]
    segm = np.zeros(n, dtype=np.int32)
    semantic = np.zeros(n, dtype=np.int32)
    pc = points[:, :3]
    for k in range(boxes.shape[0]):
        box = boxes[k]
        center, (l, w, h) = box[:3], box[3:6]
        rot = Rotation.from_euler("zyx", [-box[6], 0, 0]).as_matrix()
        pc_tr = (pc - center) @ rot.T
        inside = (
            (pc_tr[:, 0] > -l / 2 - relax) & (pc_tr[:, 0] < l / 2 + relax)
            & (pc_tr[:, 1] > -h / 2 - relax) & (pc_tr[:, 1] < h / 2 + relax)
            & (pc_tr[:, 2] > -w / 2 - relax) & (pc_tr[:, 2] < w / 2 + relax)
        )
        segm[inside] = object_ids[k]
        semantic[inside] = class_ids[k]
    return segm, semantic


def find_sequence_info(path):
    """Tolerate the several Waymo file-naming versions
    (process_waymo.py:233-247)."""
    if osp.exists(path):
        return path
    for pre in ["training", "validation", "testing"]:
        cand = str(path).replace("segment", pre + "_segment")
        if osp.exists(cand):
            return cand
    cand = str(path).replace("_with_camera_labels", "")
    return cand if osp.exists(cand) else path


def process_sequence(infos, data_path, flow_path, save_path,
                     filter_empty_boxes=True):
    os.makedirs(save_path, exist_ok=True)
    tracking_to_idx, next_obj_id = {}, 1
    prev_pose = None

    for t, info in enumerate(infos):
        pc_info = info["point_cloud"]
        sequence_name = pc_info["lidar_sequence"]
        sample_idx = pc_info["sample_idx"]

        points = np.load(
            osp.join(data_path, sequence_name, "%04d.npy" % sample_idx)
        )  # (N, 6): x y z intensity elongation NLZ
        pc, nlz = points[:, :3], points[:, 5]

        labeled = nlz == -1
        front = pc[:, 0] > np.abs(pc[:, 1])
        in_range = (pc**2).sum(1) < 60 * 60
        in_bound = np.abs(pc[:, 1]) < 50
        in_depth = pc[:, 0] < 35
        select = labeled & front & in_range & in_bound & in_depth
        pc = pc[select]

        if t > 0:
            flow = np.load(
                osp.join(flow_path, sequence_name, "%04d.npy" % sample_idx)
            )[:, :3][select]
            flow = -process_flow(flow, pc, prev_pose, info["pose"])
        else:
            flow = None
        prev_pose = np.copy(info["pose"])

        annos = info["annos"]
        keep = [i for i, nm in enumerate(annos["name"]) if nm != "unknown"]
        boxes = annos["gt_boxes_lidar"][keep]
        names = annos["name"][keep]
        trackings = annos["obj_ids"][keep]
        n_in_gt = annos["num_points_in_gt"][keep]
        if filter_empty_boxes:
            mask = n_in_gt > 0
            boxes, names, trackings = boxes[mask], names[mask], trackings[mask]
            sel = [i for i, nm in enumerate(names) if nm in CLASS_NAMES]
            boxes, names, trackings = boxes[sel], names[sel], trackings[sel]

        for tr in trackings:
            if tr not in tracking_to_idx:
                tracking_to_idx[tr] = next_obj_id
                next_obj_id += 1
        object_ids = np.array([tracking_to_idx[tr] for tr in trackings], np.int32)
        class_ids = np.array(
            [CLASS_NAMES.index(nm) + 1 for nm in names], np.int32
        )
        segm, semantic = box_to_segm(pc, boxes, object_ids, class_ids)

        pc = pc @ PERM.T
        if flow is not None:
            flow = flow @ PERM.T

        pose_t = np.copy(info["pose"])
        pose_t[:3, :3] = PERM @ pose_t[:3, :3] @ PERM.T
        pose_t[:3, 3] = PERM @ pose_t[:3, 3]

        np.save(osp.join(save_path, "pose_%04d.npy" % sample_idx), pose_t)
        np.save(osp.join(save_path, "pc_%04d.npy" % sample_idx), pc)
        np.save(osp.join(save_path, "segm_%04d.npy" % sample_idx), segm)
        np.save(
            osp.join(save_path, "semantic_segm_%04d.npy" % sample_idx), semantic
        )
        if flow is not None:
            np.save(
                osp.join(
                    save_path, "flow_%04d_%04d.npy" % (sample_idx, sample_idx - 1)
                ),
                flow,
            )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--save_root", type=str, required=True)
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument(
        "--cfg_file", type=str,
        default=osp.join(osp.dirname(__file__), "waymo_dataset.yaml"),
    )
    args = parser.parse_args()

    cfg = yaml.safe_load(open(args.cfg_file))
    data_path = osp.join(args.data_root, cfg["PROCESSED_DATA_TAG"])
    flow_path = osp.join(args.data_root, cfg["SCENE_FLOW_TAG"])

    split_file = osp.join(osp.dirname(__file__), "splits", args.split + ".txt")
    sequences = [x.strip() for x in open(split_file).readlines()]

    save_root = osp.join(args.save_root, "data")
    os.makedirs(save_root, exist_ok=True)
    num_skipped = 0
    for k, seq in enumerate(sequences):
        sequence_name = osp.splitext(seq)[0]
        info_path = find_sequence_info(
            osp.join(data_path, sequence_name, sequence_name + ".pkl")
        )
        if not osp.exists(info_path):
            num_skipped += 1
            continue
        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        print("--- %d/%d %s" % (k, len(sequences), sequence_name))
        process_sequence(
            infos, data_path, flow_path, osp.join(save_root, sequence_name),
            filter_empty_boxes=cfg.get("FILTER_EMPTY_BOXES", True),
        )
    print("Done. Skipped (unavailable) sequences: %d" % num_skipped)


if __name__ == "__main__":
    main()
