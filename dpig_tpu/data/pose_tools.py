"""Offline pose utilities for the tfrecord converters (numpy).

Re-implements the reference converter algorithms:
  * _getSparseKeypoint / _getSparsePose / _sparse2dense
    (datasets/convert_market.py:286-330, utils.py:406-457)
  * _getPoseMask — limb-segment interpolated discs over the 23-limb
    limbSeq + dilation(square(5)) + erosion(square(5))
    (datasets/convert_market.py:229-281)
  * get_part_bbox37 — 37 body-part region proposals
    (datasets/convert_market.py:640-728)
  * _get_valid_peaks — best-scored OpenPose subset selection
    (utils.py:459-490)

Morphology uses scipy.ndimage grey_dilation/erosion (mode='reflect',
matching skimage.morphology's defaults).
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np
from scipy.ndimage import grey_dilation, grey_erosion
from scipy.stats import norm as _norm

# MSCOCO part order: [nose, neck, Rsho, Relb, Rwri, Lsho, Lelb, Lwri, Rhip,
#   Rkne, Rank, Lhip, Lkne, Lank, Leye, Reye, Lear, Rear]
LIMB_SEQ = [[2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
            [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
            [1, 16], [16, 18], [2, 17], [2, 18], [9, 12], [12, 6], [9, 3],
            [17, 18]]  # 1-based (convert_market.py:233-235)

_RATIO_0_4 = 1.0 / _norm(0, 4).pdf(0)
_GAUSS_0_4 = _norm(0, 4)

# 37 part definitions (convert_market.py:665-682)
PART_IDX_LIST_37: List[List[int]] = (
    [[0, 1, 2, 5, 14, 15, 16, 17],
     [2, 3, 4, 5, 6, 7, 8, 11],
     [8, 9, 10, 11, 12, 13],
     [5, 6, 7],
     [2, 3, 4],
     [11, 12, 13],
     [8, 9, 10],
     [2, 5, 8, 11],
     [5, 6], [6, 7], [2, 3], [3, 4], [11, 12], [12, 13], [8, 9], [9, 10],
     list(range(0, 18))]
    + [[i] for i in range(0, 18)]
    + [[2, 3, 4, 8, 9, 10], [5, 6, 7, 11, 12, 13]])


def get_sparse_keypoint(r, c, k, height, width, radius=4, var=4,
                        mode="Solid"):
    """Disc indices/values around one keypoint (utils.py:406-425)."""
    r, c, k = int(r), int(c), int(k)
    indices, values = [], []
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            distance = math.sqrt(float(i ** 2 + j ** 2))
            if 0 <= r + i < height and 0 <= c + j < width \
                    and distance <= radius:
                indices.append([r + i, c + j, k])
                if mode == "Solid":
                    values.append(1)
                else:  # Gaussian, var==4 only (utils.py:419-424)
                    values.append(_GAUSS_0_4.pdf(distance) * _RATIO_0_4)
    return indices, values


def get_sparse_pose(peaks, height, width, channel, radius=4, var=4,
                    mode="Solid"):
    """All-keypoint sparse pose (utils.py:427-439)."""
    indices, values = [], []
    for k in range(len(peaks)):
        p = peaks[k]
        if len(p) != 0:
            ind, val = get_sparse_keypoint(p[0][1], p[0][0], k, height,
                                           width, radius, var, mode)
            indices.extend(ind)
            values.extend(val)
    return indices, values, [height, width, channel]


def one_dim_sparse(indices, shape):
    """Row-major flattening of sparse indices (utils.py:441-448)."""
    out = [ind[0] * shape[2] * shape[1] + ind[1] * shape[2] + ind[2]
           for ind in indices]
    return out, int(np.prod(shape))


def sparse2dense(indices, values, shape) -> np.ndarray:
    dense = np.zeros(shape)
    for ind, v in zip(indices, values):
        dense[ind[0], ind[1], ind[2]] = v
    return dense


def get_pose_mask(peaks, height, width, radius=4, var=4,
                  mode="Solid") -> np.ndarray:
    """Limb-rasterized body mask + 5x5 closing (convert_market.py:229-281)."""
    indices, values = [], []
    for limb in LIMB_SEQ:
        p0 = peaks[limb[0] - 1]
        p1 = peaks[limb[1] - 1]
        if len(p0) != 0 and len(p1) != 0:
            r0, c0 = p0[0][1], p0[0][0]
            r1, c1 = p1[0][1], p1[0][0]
            for (rr, cc) in ((r0, c0), (r1, c1)):
                ind, val = get_sparse_keypoint(rr, cc, 0, height, width,
                                               radius, var, mode)
                indices.extend(ind)
                values.extend(val)
            distance = np.sqrt((r0 - r1) ** 2 + (c0 - c1) ** 2)
            sample_n = int(distance / radius)
            if sample_n > 1:
                for i in range(1, sample_n):
                    rr = r0 + (r1 - r0) * i / sample_n
                    cc = c0 + (c1 - c0) * i / sample_n
                    ind, val = get_sparse_keypoint(rr, cc, 0, height, width,
                                                   radius, var, mode)
                    indices.extend(ind)
                    values.extend(val)
    dense = np.squeeze(sparse2dense(indices, values, [height, width, 1]))
    dense = grey_dilation(dense, size=(5, 5))
    dense = grey_erosion(dense, size=(5, 5))
    return dense


def get_part_bbox37(peaks, height=128, width=64, radius=6
                    ) -> Tuple[List[List[int]], List[int]]:
    """37 body-part bboxes [y1,x1,y2,x2] + visibility
    (convert_market.py:640-728; r=6 at the call site :490,:509,
    r_single=10 for single-keypoint parts)."""
    part_bbox_list, visibility_list = [], []
    r, r_single = radius, 10
    for part_idx in PART_IDX_LIST_37:
        xs, ys = [], []
        for i in part_idx:
            p = peaks[i]
            if len(p) != 0:
                xs.append(p[0][0])
                ys.append(p[0][1])
        if not xs:
            visibility_list.append(0)
            part_bbox_list.append([0, 0, 1, 1])
            continue
        visibility_list.append(1)
        y1, x1 = int(np.min(ys)), int(np.min(xs))
        y2, x2 = int(np.max(ys)), int(np.max(xs))
        rr = r if len(xs) > 1 else r_single
        part_bbox_list.append([max(0, y1 - rr), max(0, x1 - rr),
                               min(height - 1, y2 + rr),
                               min(width - 1, x2 + rr)])
    return part_bbox_list, visibility_list


def get_valid_peaks(all_peaks, subsets) -> Optional[list]:
    """Select the best-scored OpenPose subset (utils.py:459-490)."""
    try:
        subsets = subsets.tolist() if hasattr(subsets, "tolist") else subsets
        valid_idx, valid_score = -1, -1
        for i, subset in enumerate(subsets):
            score = subset[-2]
            if score > valid_score:
                valid_idx, valid_score = i, score
        if valid_idx < 0:
            return None
        peaks = []
        cand_id_list = subsets[valid_idx][:18]
        for ap in all_peaks:
            valid_p = []
            for p in ap:
                if p[-1] in cand_id_list:
                    valid_p = p
            peaks.append([valid_p] if len(valid_p) > 0 else [])
        return peaks
    except Exception:
        return None


def peaks_from_rcv(rcv: np.ndarray) -> list:
    """Inverse adapter: [K,3] (row,col,vis) -> peaks structure
    ([(x, y, score, id)] per keypoint) used by the mask/bbox tools."""
    peaks = []
    for k in range(rcv.shape[0]):
        r, c, v = rcv[k]
        peaks.append([(float(c), float(r), 1.0, k)] if v > 0 else [])
    return peaks


# MaskRCNN(COCO-17) -> OpenPose(18) keypoint index map
# (datasets/mat2dic_maskrcnn.py:28). OpenPose's neck (idx 1) is synthesized
# as the shoulder midpoint.
OPENPOSE_FROM_MASKRCNN = {0: 0, 1: None, 2: 6, 3: 8, 4: 10, 5: 5, 6: 7,
                          7: 9, 8: 12, 9: 14, 10: 16, 11: 11, 12: 13,
                          13: 15, 14: 1, 15: 2, 16: 3, 17: 4}


def maskrcnn_to_openpose_rcv(crs: np.ndarray, keypoint_num: int = 18
                             ) -> np.ndarray:
    """[2, 17] MaskRCNN (col,row) joints -> [18, 3] OpenPose-order rcv,
    with the neck made up from the shoulder midpoint
    (datasets/mat2dic_maskrcnn.py:29-53)."""
    rcv = np.zeros([keypoint_num, 3], np.float32)
    for k in range(keypoint_num):
        k_idx = OPENPOSE_FROM_MASKRCNN[k]
        if k_idx is not None:
            c, r = crs[:, k_idx]
            if not (c == 0 and r == 0):
                rcv[k] = [r, c, 1]
    r0, c0, v0 = rcv[2]
    r1, c1, v1 = rcv[5]
    if v0 and v1:
        rcv[1] = [(r0 + r1) / 2, (c0 + c1) / 2, 1]
    return rcv


# DF 10-ROI body-region proposal masks (convert_DF.py:658-764). The five
# small + five big region index sets select entries of the 37-part bbox
# list; WholeBody (knee+ankle visible) switches the sets and the head/limb
# margins. Missing regions are back-filled by the reference's
# `np.random.choice(len)-1` index quirk (kept for bit parity).
ROI10_SMALL_WHOLE = [[0], [3], [4], [5], [6]]
ROI10_BIG_WHOLE = [[1], [2], [35], [36], [0, 1]]
ROI10_SMALL_PART = [[0], [3], [4], [3], [4]]
ROI10_BIG_PART = [[1], [35], [36], [35], [36]]


def get_roi_mask10(part_bbox_list, visibility_list, img_h=256, img_w=256,
                   rng=None) -> np.ndarray:
    """[H, W, 10] 0/1 masks (1 = outside the region), convert_DF.py:658-764;
    stacked in small+big order like roi10_mask_* (convert_DF.py:417)."""
    rng = rng or np.random
    whole = bool(visibility_list[13] and visibility_list[15])
    sets = ((ROI10_SMALL_WHOLE, ROI10_BIG_WHOLE) if whole else
            (ROI10_SMALL_PART, ROI10_BIG_PART))

    def region_masks(idx_sets):
        masks = []
        for bbox_idxs in idx_sets:
            y1, x1, y2, x2 = img_h - 1, img_w - 1, 0, 0
            valid = False
            for part_idx in bbox_idxs:
                if not visibility_list[part_idx]:
                    continue
                valid = True
                y1_t, x1_t, y2_t, x2_t = part_bbox_list[part_idx]
                if part_idx == 0:  # enlarge the head roi
                    y1_t = max(0, y1_t - (10 if whole else 20))
                elif part_idx in (3, 4, 5, 6, 2, 35, 36):  # wrist/ankle
                    y2_t = min(img_h - 1, y2_t + 20)
                if not whole:
                    y1_t = max(0, y1_t - 5)
                    x1_t = max(0, x1_t - 5)
                    y2_t = min(img_h - 1, y2_t + 5)
                    x2_t = min(img_w - 1, x2_t + 5)
                y1, x1 = min(y1, y1_t), min(x1, x1_t)
                y2, x2 = max(y2, y2_t), max(x2, x2_t)
            if valid:
                m = np.ones([img_h, img_w], np.float32)
                m[int(y1):int(y2), int(x1):int(x2)] = 0
                masks.append(m)
        while len(masks) < 5:
            masks.append(masks[int(rng.choice(len(masks), 1) - 1)])
        return masks

    small, big = (region_masks(s) for s in sets)
    return np.stack(small + big, axis=-1)
