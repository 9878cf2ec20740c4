"""One-off demo inference from raw images + OpenPose pickles
(reference trainer.py:429-512 `test_one_by_one`).

Computes pose discs, pose masks and part bboxes on the fly with the
converter toolbox and runs conditional pose transfer. One deliberate fix
over the reference: trainer.py:493 feeds only {x, pose_target} and silently
lets part_bbox come from the *training queue* (mismatched images!); here
the bboxes are derived from the demo image's own OpenPose peaks.
"""
from __future__ import annotations

import os
import pickle
import random
import numpy as np
import jax.numpy as jnp
from PIL import Image

from ..config import Config
from ..data import pose_tools as pt
from ..ops.pose import render_pose_maps
from .testers import ConditionalTransferTester, _save_dir_tree


def _rcv_from_peaks(peaks, keypoint_num=18) -> np.ndarray:
    rcv = np.zeros((keypoint_num, 3), np.float32)
    for k, p in enumerate(peaks):
        if len(p) != 0:
            rcv[k] = [p[0][1], p[0][0], 1.0]
    return rcv


def run_one_by_one(cfg: Config, img_dir: str, pair_path: str,
                   all_peaks_path: str, subsets_path: str,
                   pair_num: int = 500, shuffle: bool = True,
                   result_dir_name: str = "test_demo") -> str:
    with open(pair_path, "rb") as f:
        pairs = pickle.load(f, encoding="latin1")
    with open(all_peaks_path, "rb") as f:
        all_peaks_dic = pickle.load(f, encoding="latin1")
    with open(subsets_path, "rb") as f:
        subsets_dic = pickle.load(f, encoding="latin1")

    if shuffle:
        rng = np.random.RandomState(0)  # trainer.py:461
        idx_all = rng.permutation(len(pairs))
    else:
        idx_all = np.arange(len(pairs))

    tester = ConditionalTransferTester(cfg)
    out_root = os.path.join(cfg.model_dir, result_dir_name)
    dirs = _save_dir_tree(out_root, ["x", "x_target", "G", "pose",
                                     "pose_target", "mask", "mask_target"])
    h, w = cfg.img_H, cfg.img_W
    cnt = -1
    for i in idx_all:
        if cnt >= pair_num - 1:
            break
        a, b = pairs[i][0], pairs[i][1]
        if a not in all_peaks_dic or b not in all_peaks_dic:
            continue
        cnt += 1
        peaks_a = pt.get_valid_peaks(all_peaks_dic[a], subsets_dic[a])
        peaks_b = pt.get_valid_peaks(all_peaks_dic[b], subsets_dic[b])
        if peaks_a is None or peaks_b is None:
            continue
        img_a = np.asarray(Image.open(os.path.join(img_dir, a)).convert(
            "RGB"), np.float32)
        img_b = np.asarray(Image.open(os.path.join(img_dir, b)).convert(
            "RGB"), np.float32)

        rcv_a = _rcv_from_peaks(peaks_a)
        rcv_b = _rcv_from_peaks(peaks_b)
        mask_a = pt.get_pose_mask(peaks_a, h, w, radius=7)[..., None]
        mask_b = pt.get_pose_mask(peaks_b, h, w, radius=7)[..., None]
        bbox_a, vis_a = pt.get_part_bbox37(peaks_a, h, w, radius=6)

        batch = {
            "x": jnp.asarray(img_a[None] / 127.5 - 1.0),
            "pose_rcv": jnp.asarray(rcv_a[None]),
            "pose_rcv_target": jnp.asarray(rcv_b[None]),
            "mask_r6": jnp.asarray(mask_a[None].astype(np.float32)),
            "part_bbox": jnp.asarray(np.asarray(bbox_a, np.int32)[None]),
            "part_vis": jnp.asarray(np.asarray(vis_a, np.int32)[None]),
        }
        g, pose_t, _score = tester.transfer_step(tester.params, batch)
        g = np.asarray(g)[0]

        Image.fromarray(img_a.astype(np.uint8)).save(
            os.path.join(dirs["x"], f"pair{cnt:05d}-{a}.png"))
        Image.fromarray(img_b.astype(np.uint8)).save(
            os.path.join(dirs["x_target"], f"pair{cnt:05d}-{b}.png"))
        Image.fromarray(np.clip(g, 0, 255).astype(np.uint8)).save(
            os.path.join(dirs["G"], f"pair{cnt:05d}-{a}-{b}.png"))
        pose_a_img = np.asarray(render_pose_maps(
            jnp.asarray(rcv_a[None]), h, w, normalized=False))[0]
        Image.fromarray(((pose_a_img.max(-1) + 1) * 127.5).astype(
            np.uint8)).save(os.path.join(dirs["pose"],
                                         f"pair{cnt:05d}-{a}.png"))
        pose_b_img = np.asarray(pose_t)[0]
        Image.fromarray(((pose_b_img.max(-1) + 1) * 127.5).astype(
            np.uint8)).save(os.path.join(dirs["pose_target"],
                                         f"pair{cnt:05d}-{b}.png"))
        Image.fromarray((mask_a[..., 0] * 255).astype(np.uint8)).save(
            os.path.join(dirs["mask"], f"pair{cnt:05d}-{a}.png"))
        Image.fromarray((mask_b[..., 0] * 255).astype(np.uint8)).save(
            os.path.join(dirs["mask_target"], f"pair{cnt:05d}-{b}.png"))
    return out_root
