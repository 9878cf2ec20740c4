"""Converter end-to-end: synthetic mini-dataset -> tfrecords -> loader.
Pose-tool goldens transcribed from the reference converter algorithms."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from dpig_tpu.data import pose_tools as pt


def _mk_peaks(rng, h, w, missing=()):
    """OpenPose-style peaks: [[(x, y, score, id)], ...] x18."""
    peaks = []
    for k in range(18):
        if k in missing:
            peaks.append([])
        else:
            peaks.append([(float(rng.integers(2, w - 2)),
                           float(rng.integers(2, h - 2)), 0.9, k)])
    return peaks


def test_sparse_keypoint_disc(rng):
    ind, val = pt.get_sparse_keypoint(5, 5, 0, 32, 16, radius=4)
    # radius-4 Euclidean disc has 49 pixels
    assert len(ind) == 49
    assert all(v == 1 for v in val)
    # clipped at border
    ind2, _ = pt.get_sparse_keypoint(0, 0, 0, 32, 16, radius=4)
    assert len(ind2) < 49
    assert all(r >= 0 and c >= 0 for r, c, _k in ind2)


def test_pose_mask_covers_limbs(rng):
    h, w = 64, 32
    peaks = _mk_peaks(rng, h, w)
    mask = pt.get_pose_mask(peaks, h, w, radius=4)
    assert mask.shape == (h, w)
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    # every visible keypoint is inside the mask
    for p in peaks:
        if p:
            x, y = int(p[0][0]), int(p[0][1])
            assert mask[y, x] == 1.0, (y, x)


def test_part_bbox37_structure(rng):
    peaks = _mk_peaks(rng, 128, 64, missing=(9, 10))
    bboxes, vis = pt.get_part_bbox37(peaks, 128, 64, radius=6)
    assert len(bboxes) == 37 and len(vis) == 37
    # part 28 (single keypoint index 10) missing -> vis 0, bbox [0,0,1,1]
    assert vis[17 + 10] == 0 and bboxes[17 + 10] == [0, 0, 1, 1]
    for (y1, x1, y2, x2), v in zip(bboxes, vis):
        assert 0 <= y1 <= y2 <= 127 and 0 <= x1 <= x2 <= 63


def test_valid_peaks_selects_best_subset():
    all_peaks = [[(5.0, 6.0, 0.9, 0), (7.0, 8.0, 0.8, 100)]] + [[]] * 17
    subsets = np.zeros((2, 20))
    subsets[0, 0] = 100   # candidate id 100 in subset 0
    subsets[0, -2] = 5.0  # lower score
    subsets[1, 0] = 0     # candidate id 0 in subset 1
    subsets[1, -2] = 9.0  # higher score -> selected
    peaks = pt.get_valid_peaks(all_peaks, subsets)
    assert peaks[0][0][3] == 0


def test_converter_end_to_end(tmp_path, rng):
    h, w = 64, 32
    img_dir = tmp_path / "imgs"
    pose_dir = tmp_path / "pose"
    out_dir = tmp_path / "out"
    os.makedirs(img_dir)
    os.makedirs(pose_dir)
    # 2 ids x 2 cams, market-style names: '0001_c1s1_000000_00.jpg'
    names = ["0001_c1s1_000001_00.jpg", "0001_c2s1_000002_00.jpg",
             "0002_c1s1_000003_00.jpg", "0002_c2s1_000004_00.jpg"]
    all_peaks, subsets = {}, {}
    for n in names:
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / n)
        pk = _mk_peaks(rng, h, w)
        all_peaks[n] = [[p[0]] if p else [] for p in pk]
        s = np.zeros((1, 20))
        s[0, :18] = np.arange(18)
        s[0, -2] = 1.0
        subsets[n] = s
    with open(pose_dir / "all_peaks_dic.p", "wb") as f:
        pickle.dump(all_peaks, f)
    with open(pose_dir / "subsets_dic.p", "wb") as f:
        pickle.dump(subsets, f)

    from dpig_tpu.data.convert.run import run
    total = run("market", str(img_dir), str(pose_dir), str(out_dir),
                split="train", height=h, width=w, flip_augment=True)
    assert total > 0

    from dpig_tpu.data.loader import TFRecordPairLoader
    loader = TFRecordPairLoader(str(out_dir), "train", batch_size=2,
                                img_h=h, img_w=w, dataset="market",
                                shuffle=False)
    batch = next(loader)
    assert batch["x"].shape == (2, h, w, 3)
    assert batch["part_bbox"].shape == (2, 37, 4)
    assert batch["mask_r4"].max() == 1.0
    # rcv coords are raw pixels within bounds
    assert batch["pose_rcv"][..., 0].max() < h
    assert batch["pose_rcv"][..., 1].max() < w
    assert loader.num_samples == total


def test_maskrcnn_remap_and_neck_synthesis():
    crs = np.zeros((2, 17))
    crs[:, 5] = [10, 20]   # left shoulder (col=10, row=20) -> OP idx 5
    crs[:, 6] = [30, 24]   # right shoulder -> OP idx 2
    crs[:, 0] = [20, 5]    # nose -> OP idx 0
    rcv = pt.maskrcnn_to_openpose_rcv(crs)
    np.testing.assert_allclose(rcv[0], [5, 20, 1])
    np.testing.assert_allclose(rcv[2], [24, 30, 1])
    np.testing.assert_allclose(rcv[5], [20, 10, 1])
    # neck = shoulder midpoint
    np.testing.assert_allclose(rcv[1], [22, 20, 1])
    # absent joints invisible
    assert rcv[10, 2] == 0


def test_rcv_converter(tmp_path, rng):
    import pickle
    from PIL import Image
    from dpig_tpu.data.convert.run import run
    h, w = 32, 16
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    names = ["0001_c1s1_000001_00.jpg", "0001_c2s1_000002_00.jpg"]
    rcv_dic = {}
    for n in names:
        Image.fromarray(rng.integers(0, 255, (h, w, 3),
                                     dtype=np.uint8)).save(img_dir / n)
        rcv = np.zeros((18, 3), np.float32)
        rcv[:, 0] = rng.integers(2, h - 2, 18)
        rcv[:, 1] = rng.integers(2, w - 2, 18)
        rcv[:, 2] = 1
        rcv_dic[n] = rcv
    pkl = tmp_path / "rcv.p"
    with open(pkl, "wb") as f:
        pickle.dump(rcv_dic, f)
    total = run("rcv", str(img_dir), str(pkl), str(tmp_path / "out"),
                split="train", height=h, width=w, flip_augment=False)
    assert total > 0


def test_roi_mask10_structure(rng):
    from dpig_tpu.data import pose_tools as pt
    peaks = _mk_peaks(rng, 64, 32)
    peaks = [[p[0]] if p else [] for p in peaks]
    bboxes, vis = pt.get_part_bbox37(peaks, 64, 32, radius=6)
    roi10 = pt.get_roi_mask10(bboxes, vis, 64, 32,
                              rng=np.random.RandomState(0))
    assert roi10.shape == (64, 32, 10)
    assert set(np.unique(roi10)) <= {0.0, 1.0}
    # each mask zeroes out a region (unless no part was visible at all)
    if any(vis):
        assert roi10.min() == 0.0


def test_attrs_ingestion(tmp_path):
    """Round-trip the market_attribute .mat layout through
    MarketAttributes (convert_market.py:755-800,411-434)."""
    import scipy.io
    from dpig_tpu.data.convert.attrs import MarketAttributes, build_id_map

    files = ["0002_c1s1_000001_00.jpg", "0001_c1s1_000002_00.jpg",
             "0001_c2s1_000003_00.jpg"]
    id_map = build_id_map(files)
    assert id_map == {"0001": 0, "0002": 1}

    # market_attribute.mat: nested struct; the reference reads
    # mat[split][0][0][name][0][0][0][id_idx] (convert_market.py:425-427)
    n_ids = 2
    mat_path = str(tmp_path / "market_attribute.mat")
    scipy.io.savemat(mat_path, {"market_attribute": {
        "train": {"age": np.array([[1, 3]]), "up": np.array([[2, 4]])},
        "test": {"age": np.array([[1, 3]]), "up": np.array([[2, 4]])}}})

    # w2v: [1] object array of n_attr rows, each [n_ids, dim]
    w2v = np.empty((1, 2), dtype=object)
    w2v[0, 0] = np.arange(n_ids * 3).reshape(n_ids, 3).astype(np.float32)
    w2v[0, 1] = np.arange(n_ids * 3).reshape(n_ids, 3).astype(
        np.float32) + 100
    scipy.io.savemat(str(tmp_path / "train_att_wordvec_dim25.mat"),
                     {"train_att": w2v})

    attrs = MarketAttributes(mat_path, str(tmp_path), split="train",
                             filenames=files)
    assert attrs.onehot_for("0001") == [1, 2]
    assert attrs.onehot_for("0002") == [3, 4]
    v = attrs.w2v_for("0002")
    assert list(v) == [25]
    assert v[25] == [3.0, 4.0, 5.0, 103.0, 104.0, 105.0]
