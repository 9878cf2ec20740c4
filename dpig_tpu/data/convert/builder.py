"""Shared tfrecord Example builder for the converters
(reference datasets/convert_market.py:394-576 `_format_data`,
convert_DF.py:356-520).

Schema notes preserved from the reference:
  * 'pose_mask_r6_*' for Market actually stores the RADIUS-7 mask
    (convert_market.py:479-480 writes pose_mask_r7 into the r6 key).
  * sparse keypoints are stored row-major one-dim (utils.py:441-448).
  * attrs are zero-filled when no attribute .mat is supplied.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .. import pose_tools as pt
from ..proto import example_pb2 as pb


def _bytes(f, name, v: bytes):
    f[name].bytes_list.value.append(v)


def _int64s(f, name, vals):
    f[name].int64_list.value.extend(int(x) for x in np.asarray(vals).flatten())


def _floats(f, name, vals):
    f[name].float_list.value.extend(float(x) for x in np.asarray(vals).flatten())


def build_pair_example(
    *,
    name_0: str, name_1: str,
    image_raw_0: bytes, image_raw_1: bytes,
    peaks_0: list, peaks_1: list,
    height: int, width: int,
    label: int, id_0: int, id_1: int, cam_0: int = 0, cam_1: int = 0,
    attrs_0: Optional[Sequence[int]] = None,
    attrs_1: Optional[Sequence[int]] = None,
    attrs_w2v_0: Optional[dict] = None,    # dim -> floats (attrs.py)
    attrs_w2v_1: Optional[dict] = None,
    mask_radii: Sequence[int] = (4, 7),    # Market: r4 + r7-as-'r6'
    mask_keys: Sequence[str] = ("pose_mask_r4", "pose_mask_r6"),
    part_bbox_fn=None,
    roi10_masks: bool = False,             # DF roi10_mask_* (convert_DF.py:416-435)
    keypoint_num: int = 18,
    image_format: str = "jpg",
) -> Optional[bytes]:
    """Returns a serialized Example, or None if a pose is missing."""
    if peaks_0 is None or peaks_1 is None:
        return None
    part_bbox_fn = part_bbox_fn or (
        lambda peaks: pt.get_part_bbox37(peaks, height, width, radius=6))

    ex = pb.Example()
    f = ex.features.feature
    _bytes(f, "image_name_0", name_0.encode())
    _bytes(f, "image_name_1", name_1.encode())
    _bytes(f, "image_raw_0", image_raw_0)
    _bytes(f, "image_raw_1", image_raw_1)
    _int64s(f, "label", [label])
    _int64s(f, "id_0", [id_0])
    _int64s(f, "id_1", [id_1])
    _int64s(f, "cam_0", [cam_0])
    _int64s(f, "cam_1", [cam_1])
    _bytes(f, "image_format", image_format.encode())
    _int64s(f, "image_height", [height])
    _int64s(f, "image_width", [width])
    _int64s(f, "real_data", [1])
    _int64s(f, "attrs_0", attrs_0 if attrs_0 is not None else [0] * 27)
    _int64s(f, "attrs_1", attrs_1 if attrs_1 is not None else [0] * 27)
    for suffix, w2v in (("_0", attrs_w2v_0), ("_1", attrs_w2v_1)):
        for dim, vals in (w2v or {}).items():
            _floats(f, f"attrs_w2v{dim}{suffix}", vals)

    shape_flat = None
    for suffix, peaks in (("_0", peaks_0), ("_1", peaks_1)):
        # rcv coords + 16x8-grid one-hot (convert_market.py:465-492)
        rcv = np.zeros([keypoint_num, 3], np.float32)
        grid = np.zeros([16, 8, keypoint_num], np.float32)
        h_unit, w_unit = height / 16, width / 8
        for k, p in enumerate(peaks):
            if len(p) != 0:
                rcv[k] = [p[0][1], p[0][0], 1]
                grid[int(p[0][1] / h_unit), int(p[0][0] / w_unit), k] = 1
        _floats(f, f"pose_peaks{suffix}", grid)
        _floats(f, f"pose_peaks{suffix}_rcv", rcv)

        indices, values, shape = pt.get_sparse_pose(
            peaks, height, width, keypoint_num, radius=4, mode="Solid")
        ind_1d, shape_flat = pt.one_dim_sparse(indices, shape)
        _int64s(f, f"indices_r4{suffix}", ind_1d)
        _floats(f, f"values_r4{suffix}", values)

        for radius, key in zip(mask_radii, mask_keys):
            mask = pt.get_pose_mask(peaks, height, width, radius=radius,
                                    mode="Solid")
            _int64s(f, f"{key}{suffix}", mask.astype(np.int64))

        bboxes, vis = part_bbox_fn(peaks)
        _int64s(f, f"part_bbox{suffix}", np.asarray(bboxes, np.int64))
        _int64s(f, f"part_vis{suffix}", np.asarray(vis, np.int64))
        if roi10_masks:
            roi10 = pt.get_roi_mask10(bboxes, vis, height, width)
            _int64s(f, f"roi10_mask{suffix}", roi10.astype(np.int64))

    _int64s(f, "shape", [shape_flat])
    return ex.SerializeToString()
