"""End-to-end: tester output tree -> scoring CLI; IS protocol math."""
import os

import numpy as np
from PIL import Image

from dpig_tpu.eval.inception import inception_score_from_probs
from dpig_tpu.eval.score import score_stage1


def test_inception_score_uniform_probs():
    # uniform predictions -> KL 0 -> IS exactly 1
    preds = np.full((100, 10), 0.1)
    mean, std = inception_score_from_probs(preds, splits=10)
    assert abs(mean - 1.0) < 1e-9 and std < 1e-9


def test_inception_score_onehot_varied():
    # each sample confidently a different class -> IS ~= num_classes
    n, c = 100, 10
    preds = np.full((n, c), 1e-9)
    for i in range(n):
        preds[i, i % c] = 1.0 - 1e-9 * (c - 1)
    mean, _ = inception_score_from_probs(preds, splits=10)
    assert abs(mean - c) < 0.5


def test_score_cli_on_generated_tree(tmp_path, rng):
    root = tmp_path / "test_result"
    for sub in ("G", "x_target", "mask"):
        os.makedirs(root / sub)
    for i in range(6):
        x = rng.integers(0, 255, (32, 16, 3), dtype=np.uint8)
        g = np.clip(x + rng.integers(-20, 20, x.shape), 0, 255).astype(
            np.uint8)
        m = np.zeros((32, 16), np.uint8)
        m[8:24, 4:12] = 255
        Image.fromarray(x).save(root / "x_target" / f"{i:05d}.png")
        Image.fromarray(g).save(root / "G" / f"{i:05d}.png")
        Image.fromarray(m).save(root / "mask" / f"{i:05d}.png")

    out = score_stage1(str(tmp_path), "test_result")
    assert 0 < out["ssim_G_x_mean"] <= 1.0
    assert out["psnr_G_x_mean"] > 10
    assert os.path.exists(root / "score.txt")

    out_m = score_stage1(str(tmp_path), "test_result", masked=True)
    assert 0 < out_m["ssim_G_x_mean"] <= 1.0
    assert os.path.exists(root / "score_mask.txt")

    # identical images -> perfect scores
    for i in range(6):
        img = Image.open(root / "x_target" / f"{i:05d}.png")
        img.save(root / "G" / f"{i:05d}.png")
    out2 = score_stage1(str(tmp_path), "test_result")
    assert out2["ssim_G_x_mean"] > 0.9999
    assert out2["l1_G_x_mean"] == 0.0


def test_score_stage2_g1_g2(tmp_path, rng):
    """score.py:115-223 two-stage branch: G1/ and G2/ both scored vs
    x_target in one invocation."""
    from dpig_tpu.eval.score import score_stage2
    root = tmp_path / "test_result"
    for sub in ("G1", "G2", "x_target"):
        os.makedirs(root / sub)
    for i in range(4):
        x = rng.integers(0, 255, (32, 16, 3), dtype=np.uint8)
        g1 = np.clip(x + rng.integers(-30, 30, x.shape), 0, 255)
        Image.fromarray(x).save(root / "x_target" / f"{i:05d}.png")
        Image.fromarray(g1.astype(np.uint8)).save(root / "G1" / f"{i:05d}.png")
        Image.fromarray(x).save(root / "G2" / f"{i:05d}.png")  # identical
    out = score_stage2(str(tmp_path), "test_result")
    assert 0 < out["ssim_G1_x_mean"] <= 1.0
    assert out["ssim_G2_x_mean"] > 0.9999  # G2 == x_target
    assert out["l1_G2_x_mean"] == 0.0
    txt = (root / "score.txt").read_text()
    assert "ssimG1" in txt and "ssimG2" in txt


def test_score_stage2_masked(tmp_path, rng):
    """score_mask.py:138-282 two-stage masked branch: graded-mask uint8
    multiplication, data_range 255, score_mask.txt output."""
    from dpig_tpu.eval.score import score_stage2
    root = tmp_path / "test_result"
    for sub in ("G1", "G2", "x_target", "mask"):
        os.makedirs(root / sub)
    for i in range(4):
        x = rng.integers(0, 255, (32, 16, 3), dtype=np.uint8)
        g1 = np.clip(x + rng.integers(-30, 30, x.shape), 0, 255)
        m = rng.integers(0, 256, (32, 16)).astype(np.uint8)
        Image.fromarray(x).save(root / "x_target" / f"{i:05d}.png")
        Image.fromarray(g1.astype(np.uint8)).save(root / "G1" / f"{i:05d}.png")
        Image.fromarray(x).save(root / "G2" / f"{i:05d}.png")
        Image.fromarray(m).save(root / "mask" / f"{i:05d}.png")
    out = score_stage2(str(tmp_path), "test_result", masked=True)
    assert 0 < out["ssim_G1_x_mean"] <= 1.0
    assert out["ssim_G2_x_mean"] > 0.9999
    assert os.path.exists(root / "score_mask.txt")


def test_no_is_overrides_inception_pb(tmp_path, rng, monkeypatch):
    """--no_is must skip Inception Score even when --inception_pb is
    also given (the documented 'skip entirely' contract)."""
    import sys
    from dpig_tpu.eval import score as score_mod

    seen = {}

    def spy(model_dir, test_dir, masked=False, inception_pb=None):
        seen["inception_pb"] = inception_pb
    monkeypatch.setattr(score_mod, "score_stage1", spy)
    monkeypatch.setattr(sys, "argv",
                        ["score", "1", str(tmp_path), "test_result",
                         "--inception_pb", "/some/graph.pb", "--no_is"])
    score_mod.main()
    assert seen["inception_pb"] is None


def test_score_pairing_mispair_raises(tmp_path, rng):
    """Sorted-filename pairing is only valid when the index prefixes
    line up (VERDICT weak #6): a decoy G file with a foreign index, or a
    duplicated index, must raise instead of silently mispairing."""
    import pytest

    root = tmp_path / "test_result"
    for sub in ("G", "x_target"):
        os.makedirs(root / sub)
    for i in range(3):
        x = rng.integers(0, 255, (32, 16, 3), dtype=np.uint8)
        Image.fromarray(x).save(root / "x_target" / f"{i:05d}.png")
        # G files carry the tester's _score suffix (testers.py:397)
        Image.fromarray(x).save(root / "G" / f"{i:05d}_score1.234.png")
    out = score_stage1(str(tmp_path), "test_result")  # aligned: fine
    assert out["ssim_G_x_mean"] > 0.9999

    # decoy: index 7 in G instead of 2 -> disjoint index sets
    os.rename(root / "G" / "00002_score1.234.png",
              root / "G" / "00007_score1.234.png")
    with pytest.raises(AssertionError, match="index prefixes disagree"):
        score_stage1(str(tmp_path), "test_result")
    os.rename(root / "G" / "00007_score1.234.png",
              root / "G" / "00002_score1.234.png")

    # duplicate index inside one dir -> refuse before pairing
    Image.fromarray(np.zeros((32, 16, 3), np.uint8)).save(
        root / "G" / "00001_score9.999.png")
    with pytest.raises(AssertionError, match="duplicate sample indices"):
        score_stage1(str(tmp_path), "test_result")
