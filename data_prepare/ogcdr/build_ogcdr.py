"""Procedurally generate the OGC-DR (Dynamic Room) dataset: 4-8 ShapeNet
objects per room, collision-free placement, 4 frames of random rigid motion,
2048-point clouds sampled per frame.

Parity with reference data_prepare/ogcdr/build_ogcdr.py (same hyperparams,
placement/rejection logic, dynamics distribution, and output layout), built
on the numpy mesh utilities instead of trimesh.

Usage: python build_ogcdr.py <data_root> [--keep_background]
"""

import argparse
import os
import os.path as osp
import pathlib
import pickle
import random
import sys

import numpy as np
from scipy.spatial.transform import Rotation as R

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent.parent))

from mesh_util import Mesh, box  # noqa: E402
from ogc_tpu.utils.gpf import fps_downsample  # noqa: E402

# ShapeNet classes: bench, cabinet, chair, display, lamp, sofa, table.
CLASSES = [
    "02828884", "02933112", "03001627", "03211117", "03636649",
    "04256520", "04379243",
]

# Room types (number of objects) and per-type object scales.
N_OBJECTS = [8, 7, 6, 5, 4]
SCALE_INTERVALS = [
    [0.2, 0.3], [0.2, 0.35], [0.25, 0.35], [0.25, 0.40], [0.25, 0.45],
]
DATASET_SIZE = 1000
SPLIT_PERCENTAGES = [0.75, 0.05, 0.2]
SPLIT_NAMES = ["train", "val", "test"]
Y_ANGLE_RANGE = [0.0, 360.0]

XZ_GROUND_RANGE = [0.6, 1.0]
GROUND_THICKNESS = 0.01
GROUND_HEIGHT = -0.5
GROUND_LEVEL = GROUND_HEIGHT + GROUND_THICKNESS
WALL_THICKNESS = 0.01
WALL_HEIGHT_RANGE = [0.2, 0.4]

N_FRAME = 4
PROB_ROTATION = 1.0
PROB_ROTATION_Y = 0.6
MOT_Y_ANGLE_RANGE = [-10.0, 10.0]
MOT_XZ_ANGLE_RANGE = [-10.0, 10.0]
MOT_TRANSL_RANGE = [0.02, 0.04]  # lower bound enforces visible motion

N_SAMPLE_POINT = 100000
N_SAMPLE_POINT_FPS = 2048


def get_class_models(cl, split_name, splits_root):
    with open(osp.join(splits_root, cl, "%s.lst" % split_name)) as f:
        return [m for m in f.read().split("\n") if m]


def sample_models(model_dict, n_object):
    classes = sorted(model_dict.keys())
    out_list, cl_list = [], []
    for _ in range(n_object):
        cl = random.choice(classes)
        cl_list.append(cl)
        out_list.append("%s/%s" % (cl, random.choice(model_dict[cl])))
    return out_list, cl_list


def sample_scales(n_object, type_id):
    lo, hi = SCALE_INTERVALS[type_id]
    return [lo + np.random.rand() * (hi - lo) for _ in range(n_object)]


def load_meshes(model_list, scale_list, src_dir):
    """Load, normalize to the given max-extent scale, center at origin."""
    out = []
    for i, model in enumerate(model_list):
        cl, m = model.split("/")
        mesh = Mesh.load_obj(osp.join(src_dir, cl, m, "model.obj"))
        bbox = mesh.bounds
        cur = (bbox[1] - bbox[0]).max()
        mesh.vertices = mesh.vertices / cur * scale_list[i]
        mesh.vertices = mesh.vertices - bbox.sum(0) / 2
        out.append(mesh)
    return out


def sample_poses(mesh_list, y_angles):
    """Random yaw + drop onto the ground plane."""
    out, poses = [], []
    for i, mesh in enumerate(mesh_list):
        mat = np.eye(4)
        mat[:3, :3] = R.from_euler("y", [y_angles[i]], degrees=True).as_matrix()
        m = mesh.copy().apply_transform(mat)
        y_transl = GROUND_LEVEL - m.vertices[:, 1].min()
        m.vertices[:, 1] += y_transl
        mat[1, 3] = y_transl
        out.append(m)
        poses.append(mat)
    return out, poses


def check_intersection_interval(i1, i2):
    c1, c2 = i1.sum(0) / 2, i2.sum(0) / 2
    w1, w2 = i1[1] - i1[0], i2[1] - i2[0]
    return np.all(np.abs(c1 - c2) < (w1 + w2) / 2)


def sample_locations(mesh_list, xz_range, poses, max_iter=1000):
    """Collision-free uniform placement by AABB rejection."""
    meshes, bboxes, out_poses = [], [], []
    for i, mesh in enumerate(mesh_list):
        bounds = (mesh.bounds[1] - mesh.bounds[0])[[0, 2]]
        for it in range(max_iter + 1):
            if it == max_iter:
                raise ValueError("Maximum number of iterations exceeded!")
            loc0 = (
                -xz_range / 2.0 + WALL_THICKNESS
                + np.random.rand(2) * (xz_range - bounds - 2 * WALL_THICKNESS)
            )
            bbox_i = np.array([loc0, loc0 + bounds])
            if not any(check_intersection_interval(bbox_i, b) for b in bboxes):
                break
        bboxes.append(bbox_i)
        xz_transl = loc0 - mesh.vertices[:, [0, 2]].min(0)
        mesh.vertices[:, [0, 2]] += xz_transl
        meshes.append(mesh)
        pose = poses[i]
        pose[[0, 2], 3] = xz_transl
        out_poses.append(pose)
    return meshes, out_poses


def dynamic_poses(canonical_meshes, poses):
    """Per-frame random small rotation (around y, or x/z) re-grounded."""
    out, out_poses = [], []
    for mesh, pose in zip(canonical_meshes, poses):
        if np.random.rand() < PROB_ROTATION:
            if np.random.rand() < PROB_ROTATION_Y:
                angle = np.random.uniform(*MOT_Y_ANGLE_RANGE)
                r = R.from_euler("y", [angle], degrees=True).as_matrix()
            else:
                angle = np.random.uniform(*MOT_XZ_ANGLE_RANGE)
                axis = "x" if np.random.rand() < 0.5 else "z"
                r = R.from_euler(axis, [angle], degrees=True).as_matrix()
            mat = np.eye(4)
            mat[:3, :3] = r @ pose[:3, :3]
            m = mesh.copy().apply_transform(mat)
            transl = pose[:3, 3].copy()
            transl[1] = GROUND_LEVEL - m.vertices[:, 1].min()
            m.vertices += transl
            mat[:3, 3] = transl
        else:
            mat = pose.copy()
            m = mesh.copy().apply_transform(mat)
        out.append(m)
        out_poses.append(mat)
    return out, out_poses


def draw_dynamic_transl():
    transl = np.random.uniform(MOT_TRANSL_RANGE[0], MOT_TRANSL_RANGE[1], 2)
    pn = np.random.choice([True, False], 2)
    return np.where(pn, transl, -transl)


def dynamic_locations(mesh_list, xz_range, poses, max_iter=1000):
    """Collision-free small displacement per frame."""
    meshes, bboxes, out_poses = [], [], []
    for i, mesh in enumerate(mesh_list):
        bounds = (mesh.bounds[1] - mesh.bounds[0])[[0, 2]]
        last = mesh.bounds[0][[0, 2]]
        lo = -xz_range / 2.0 + WALL_THICKNESS
        hi = xz_range / 2.0 - WALL_THICKNESS - bounds
        for it in range(max_iter + 1):
            if it == max_iter:
                raise ValueError("Maximum number of iterations exceeded!")
            xz_transl = draw_dynamic_transl()
            loc0 = last + xz_transl
            if np.logical_or(loc0 < lo, loc0 > hi).any():
                continue
            bbox_i = np.array([loc0, loc0 + bounds])
            if not any(check_intersection_interval(bbox_i, b) for b in bboxes):
                break
        bboxes.append(bbox_i)
        mesh.vertices[:, [0, 2]] += xz_transl
        meshes.append(mesh)
        pose = poses[i]
        pose[[0, 2], 3] += xz_transl
        out_poses.append(pose)
    return meshes, out_poses


def get_walls(xz_range, wall_height):
    out = []
    for axis in range(2):  # 0: z walls, 1: x walls
        for side in range(2):
            if axis == 0:
                w = box((xz_range[0], wall_height, WALL_THICKNESS))
            else:
                w = box((WALL_THICKNESS, wall_height, xz_range[1]))
            w.vertices[:, 1] += GROUND_LEVEL - w.vertices[:, 1].min()
            # Coordinate axis the wall moves along (z for the xz_range[0]-wide
            # walls, x otherwise) vs its extent index in the 2-vector
            # xz_range ([x_extent, z_extent] — reference build_ogcdr.py
            # get_walls moves by xz_range[1] along z, xz_range[0] along x).
            move_ax = 2 if axis == 0 else 0
            extent = xz_range[1 - axis]
            if side == 0:
                w.vertices[:, move_ax] += (
                    -w.vertices[:, move_ax].min() - extent / 2.0
                )
            else:
                w.vertices[:, move_ax] += (
                    -w.vertices[:, move_ax].max() + extent / 2.0
                )
            out.append(w)
    return out


def get_ground(xz_range):
    g = box((xz_range[0], GROUND_THICKNESS, xz_range[1]))
    g.vertices = g.vertices - g.bounds.sum(0) / 2
    g.vertices[:, 1] += GROUND_HEIGHT - g.vertices[:, 1].min()
    return g


def sample_pointcloud(meshes, walls, ground, xz_range, keep_background,
                      n_point=N_SAMPLE_POINT):
    n_object = len(meshes)
    if keep_background:
        meshes = meshes + [ground] + walls
    areas = np.array([m.area for m in meshes])
    areas = areas / areas.sum()
    n_points = [int(a * n_point) for a in areas]

    points, segms = [], []
    for i, mesh in enumerate(meshes):
        pi = mesh.sample_surface(n_points[i])
        segm = ((i + 1) if i < n_object else 0) * np.ones(pi.shape[0], np.int16)
        points.append(pi)
        segms.append(segm)
    points = np.concatenate(points, 0).astype(np.float32)
    segms = np.concatenate(segms, 0).astype(np.int16)

    # Clip wall/ground thickness out of the cloud.
    mask = points[:, 1] > (GROUND_LEVEL - 1e-4)
    mask &= points[:, 2] > (-xz_range[1] / 2.0 + WALL_THICKNESS - 1e-4)
    mask &= points[:, 0] > (-xz_range[0] / 2.0 + WALL_THICKNESS - 1e-4)
    mask &= points[:, 2] < (xz_range[1] / 2.0 - WALL_THICKNESS + 1e-4)
    mask &= points[:, 0] < (xz_range[0] / 2.0 - WALL_THICKNESS + 1e-4)
    points, segms = points[mask], segms[mask]

    fps_idx = fps_downsample(points, n_sample_point=N_SAMPLE_POINT_FPS)
    return points[fps_idx], segms[fps_idx]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("data_root", type=str)
    parser.add_argument("--keep_background", default=False, action="store_true")
    # Dry-run / smoke overrides (not in the reference): generate a tiny
    # subset to validate the full pipeline without the real ShapeNet meshes.
    parser.add_argument("--dataset_size", type=int, default=DATASET_SIZE,
                        help="rooms per room type (default %d)" % DATASET_SIZE)
    parser.add_argument("--room_types", type=str, default=None,
                        help="comma-separated indices into N_OBJECTS "
                             "(default: all)")
    parser.add_argument("--n_sample_point", type=int, default=N_SAMPLE_POINT,
                        help="surface samples before FPS")
    parser.add_argument("--splits_root", type=str, default=None,
                        help="override the raw_splits directory")
    args = parser.parse_args(argv)

    src_dir = osp.join(args.data_root, "ShapeNet_mesh")
    save_dir = osp.join(args.data_root, "data")
    save_mesh_dir = osp.join(args.data_root, "mesh")
    os.makedirs(save_dir, exist_ok=True)
    os.makedirs(save_mesh_dir, exist_ok=True)
    splits_root = args.splits_root or osp.join(
        osp.dirname(osp.abspath(__file__)), "raw_splits"
    )
    room_types = (
        [int(t) for t in args.room_types.split(",")]
        if args.room_types else range(len(N_OBJECTS))
    )

    np.random.seed(0)
    random.seed(0)
    n_rooms = [max(int(p * args.dataset_size), 1 if p else 0)
               for p in SPLIT_PERCENTAGES]
    split_lsts = {s: [] for s in SPLIT_NAMES}

    for type_id in room_types:
        n_object = N_OBJECTS[type_id]
        room_id = 0
        for split_id, split_name in enumerate(SPLIT_NAMES):
            model_files = {
                cl: get_class_models(cl, split_name, splits_root)
                for cl in CLASSES
            }
            split_item_id = 0
            while split_item_id < n_rooms[split_id]:
                item = {"room_id": room_id, "split": split_name,
                        "n_object": n_object}
                item["objects"], item["classes"] = sample_models(
                    model_files, n_object
                )
                item["scales"] = sample_scales(n_object, type_id)
                axis0 = np.random.rand() > 0.5
                scale_axis = np.random.uniform(*XZ_GROUND_RANGE)
                item["xz_ground_range"] = np.array(
                    [1.0, scale_axis] if axis0 else [scale_axis, 1.0]
                )
                item["wall_height"] = np.random.uniform(*WALL_HEIGHT_RANGE)

                mesh_seq, pose_seq = [], []
                canonical = load_meshes(item["objects"], item["scales"], src_dir)
                meshes, poses = sample_poses(canonical, np.random.uniform(
                    Y_ANGLE_RANGE[0], Y_ANGLE_RANGE[1], n_object))
                try:
                    meshes, poses = sample_locations(
                        meshes, item["xz_ground_range"], poses
                    )
                    mesh_seq.append(meshes)
                    pose_seq.append(poses)
                except ValueError:
                    continue

                frame_id, it = 1, 0
                while frame_id < N_FRAME and it <= 20:
                    try:
                        meshes, poses = dynamic_poses(canonical, poses)
                        meshes, poses = dynamic_locations(
                            meshes, item["xz_ground_range"], poses
                        )
                        frame_id += 1
                        mesh_seq.append(meshes)
                        pose_seq.append(poses)
                    except ValueError:
                        it += 1
                if len(mesh_seq) < N_FRAME:
                    continue

                walls = get_walls(item["xz_ground_range"], item["wall_height"])
                ground = get_ground(item["xz_ground_range"])

                sample_name = "%02d_%06d" % (n_object, room_id)
                save_path = osp.join(save_dir, sample_name)
                save_mesh_path = osp.join(save_mesh_dir, sample_name)
                os.makedirs(save_path, exist_ok=True)
                os.makedirs(save_mesh_path, exist_ok=True)

                with open(osp.join(save_mesh_path, "meta.pkl"), "wb") as f:
                    pickle.dump(item, f, protocol=pickle.HIGHEST_PROTOCOL)
                for i, wall in enumerate(walls):
                    wall.export(osp.join(save_mesh_path, "wall_%02d.obj" % i))
                ground.export(osp.join(save_mesh_path, "ground.obj"))
                for fid in range(N_FRAME):
                    for mi, m in enumerate(mesh_seq[fid]):
                        m.export(
                            osp.join(save_mesh_path,
                                     "object_%02d_%02d.obj" % (fid, mi))
                        )

                for fid in range(N_FRAME):
                    points, segms = sample_pointcloud(
                        mesh_seq[fid], walls, ground, item["xz_ground_range"],
                        args.keep_background, n_point=args.n_sample_point,
                    )
                    np.save(osp.join(save_path, "pc_%02d.npy" % fid), points)
                    np.save(osp.join(save_path, "segm_%02d.npy" % fid), segms)
                    np.save(
                        osp.join(save_path, "pose_%02d.npy" % fid),
                        np.stack(pose_seq[fid]),
                    )

                split_lsts[split_name].append(sample_name)
                room_id += 1
                split_item_id += 1

    for split_name in SPLIT_NAMES:
        with open(osp.join(save_dir, split_name + ".lst"), "w") as f:
            f.write("\n".join(split_lsts[split_name]))


if __name__ == "__main__":
    main()
