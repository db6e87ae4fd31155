"""KITTI Scene Flow unprojection utilities.

Parity with reference data_prepare/kittisf/kittisf_util.py: 16-bit PNG
decoding of disparity / optical-flow / instance maps (KITTI devkit
conventions) and pinhole unprojection.  Uses cv2 for 16-bit PNG IO (the
reference uses pypng, unavailable here).
"""

import cv2
import numpy as np
from PIL import Image


def pixel2xyz(depth, P_rect, px=None, py=None):
    """Unproject a depth map through the rectified camera matrix.

    KITTI camera convention: x right, y down; the reference flips x/y to get
    the pointcloud frame (kittisf_util.py:26).
    """
    assert P_rect[0, 1] == 0 and P_rect[1, 0] == 0
    assert P_rect[2, 0] == 0 and P_rect[2, 1] == 0
    assert P_rect[0, 0] == P_rect[1, 1]
    focal = P_rect[0, 0]

    height, width = depth.shape[:2]
    if px is None:
        px = np.tile(np.arange(width, dtype=np.float32)[None, :], (height, 1))
    if py is None:
        py = np.tile(np.arange(height, dtype=np.float32)[:, None], (1, width))
    const_x = P_rect[0, 2] * depth + P_rect[0, 3]
    const_y = P_rect[1, 2] * depth + P_rect[1, 3]

    x = ((px * (depth + P_rect[2, 3]) - const_x) / focal)[:, :, None]
    y = ((py * (depth + P_rect[2, 3]) - const_y) / focal)[:, :, None]
    pc = np.concatenate((x, y, depth[:, :, None]), axis=-1)
    pc[..., :2] *= -1.0
    return pc


def load_uint16_png(fpath):
    """Load a KITTI 16-bit PNG; multi-channel images come back in RGB
    channel order (cv2 loads BGR, we flip)."""
    arr = cv2.imread(fpath, cv2.IMREAD_UNCHANGED)
    if arr is None:
        raise IOError(f"cannot read {fpath}")
    if arr.ndim == 3:
        arr = arr[..., ::-1]  # BGR -> RGB
    return arr.astype(np.uint16)


def load_disp(fpath):
    """Disparity map: value/256 pixels; 0 marks invalid (KITTI devkit)."""
    arr = load_uint16_png(fpath)
    valid = arr > 0
    disp = arr.astype(np.float32) / 256.0
    disp[~valid] = -1.0
    return disp, valid


def load_op_flow(fpath):
    """Optical flow: (value - 2^15)/64 pixels in channels 0/1, validity in
    channel 2 (KITTI devkit)."""
    arr = load_uint16_png(fpath)
    valid = arr[..., -1] == 1
    flow = (arr.astype(np.float32)[..., :-1] - 2**15) / 64.0
    return flow, valid


def disp_2_depth(disparity, valid_disp, focal_length_pixel, baseline=0.54):
    depth = focal_length_pixel * baseline / (disparity + 1e-5)
    depth[~valid_disp] = -1.0
    return depth


def load_segm(fpath):
    return np.array(Image.open(fpath))


def filter_segm(segm, select_semantics=()):
    """Keep instances of the selected semantic classes, relabeling them to
    1..K (instance id = semantic*256 + instance in KITTI instance maps)."""
    out = np.zeros(segm.shape[0], dtype=int)
    next_id = 1
    for inst_id in np.unique(segm):
        if inst_id // 256 in select_semantics:
            out[segm == inst_id] = next_id
            next_id += 1
    return out
