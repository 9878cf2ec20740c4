"""Scoring CLI — mirrors score.py / score_mask.py.

  python -m dpig_tpu.eval.score <stage> <model_dir> <test_dir> [--mask]
         [--inception_pb path/to/classify_image_graph_def.pb]

stage 1: compare <test_dir>/G vs <test_dir>/x_target (score.py:33-105);
         --mask multiplies both by <test_dir>/mask first (score_mask.py).
Writes score.txt in the test dir and prints all metrics.
"""
from __future__ import annotations

import argparse
import glob
import os
import re
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from . import metrics
from .inception import (ensure_inception_graph, frozen_graph_logits_fn,
                        get_inception_score)


def _index_key(path: str) -> str:
    """Leading digit run of the basename — the sample index the tester
    wrote (testers.py: x_target/ files are bare `00012.png`, G/ files
    carry suffixes `00012_score1.234.png`)."""
    m = re.match(r"(\d+)", os.path.basename(path))
    return m.group(1) if m else os.path.basename(path)


def _load_dir(d: str):
    files = sorted(sum((glob.glob(os.path.join(d, pat))
                        for pat in ("*.jpg", "*.png")), []))
    keys = [_index_key(f) for f in files]
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, (
        f"{d}: duplicate sample indices {sorted(dupes)[:5]} — sorted-name "
        "pairing would silently mispair; clean the directory")
    return [np.asarray(Image.open(f)) for f in files], keys


def _assert_paired(dirs_keys: Sequence[tuple]) -> None:
    """Every dir must cover the SAME index set in the same sorted order —
    pairing by sorted filename is only protocol-valid then."""
    (ref_name, ref_keys) = dirs_keys[0]
    for name, keys in dirs_keys[1:]:
        if keys != ref_keys:
            diff = sorted(set(keys) ^ set(ref_keys))
            raise AssertionError(
                f"{name}/ and {ref_name}/ index prefixes disagree "
                f"(first diffs: {diff[:5]}) — refusing to pair by sort "
                "order")


def score_stage1(model_dir: str, test_dir: str, masked: bool = False,
                 inception_pb: Optional[str] = None) -> dict:
    root = os.path.join(model_dir, test_dir)
    g_list, g_keys = _load_dir(os.path.join(root, "G"))
    x_list, x_keys = _load_dir(os.path.join(root, "x_target"))
    assert len(g_list) == len(x_list) and g_list, (
        f"need matching G/ and x_target/ PNG dirs under {root}")
    pairing = [("G", g_keys), ("x_target", x_keys)]
    masks = None
    if masked:
        masks, m_keys = _load_dir(os.path.join(root, "mask"))
        assert len(masks) == len(g_list), (
            f"mask/ has {len(masks)} images but G/ has {len(g_list)}")
        pairing.append(("mask", m_keys))
    _assert_paired(pairing)

    per = []
    for i, (g, x) in enumerate(zip(g_list, x_list)):
        if masked:
            per.append(metrics.score_pair_masked(g, x, masks[i]))
        else:
            per.append(metrics.score_pair_gray(g, x))
    out = {}
    for k in ("ssim", "psnr", "l1", "l2"):
        vals = [p[k] for p in per]
        out[f"{k}_G_x_mean"] = float(np.mean(vals))
        out[f"{k}_G_x_std"] = float(np.std(vals))

    if inception_pb:
        # Masked protocol feeds the masked generations to IS
        # (score_mask.py:121-122): np.uint8(mask/255. * G).
        is_input = ([metrics.apply_mask_uint8(g, m)
                     for g, m in zip(g_list, masks)]
                    if masked else g_list)
        is_mean, is_std = get_inception_score(
            is_input, frozen_graph_logits_fn(inception_pb))
        out["IS_G_mean"], out["IS_G_std"] = is_mean, is_std

    score_path = os.path.join(root, "score_mask.txt" if masked
                              else "score.txt")
    with open(score_path, "w") as f:
        f.write(f"Image number: {len(g_list)}\n")
        for k, v in out.items():
            f.write(f"{k}: {v:.5f}\n")
    for k, v in out.items():
        print(f"{k}: {v:.6f}")
    return out


def score_stage2(model_dir: str, test_dir: str, masked: bool = False,
                 inception_pb: Optional[str] = None) -> dict:
    """Two-stage (PG2-style G1/G2) scoring: both generated trees vs
    x_target in one invocation (score.py:115-223); --mask applies the
    score_mask.py:176-282 protocol (uint8 mask/255 multiplication,
    multichannel SSIM at data_range 255, masked IS)."""
    root = os.path.join(model_dir, test_dir)
    x_list, x_keys = _load_dir(os.path.join(root, "x_target"))
    masks = None
    if masked:
        masks, m_keys = _load_dir(os.path.join(root, "mask"))
        assert len(masks) == len(x_list), (
            f"mask/ has {len(masks)} images but x_target/ has {len(x_list)}")
        _assert_paired([("x_target", x_keys), ("mask", m_keys)])
    out = {}
    lines = [f"N: {len(x_list)}   "]
    for gen in ("G1", "G2"):
        g_list, g_keys = _load_dir(os.path.join(root, gen))
        assert len(g_list) == len(x_list) and g_list, (
            f"need matching {gen}/ and x_target/ PNG dirs under {root}")
        _assert_paired([(gen, g_keys), ("x_target", x_keys)])
        if masked:
            per = [metrics.score_pair_masked(g, x, m)
                   for g, x, m in zip(g_list, x_list, masks)]
        else:
            per = [metrics.score_pair_gray(g, x)
                   for g, x in zip(g_list, x_list)]
        for k in ("ssim", "psnr", "l1", "l2"):
            vals = [p[k] for p in per]
            out[f"{k}_{gen}_x_mean"] = float(np.mean(vals))
            out[f"{k}_{gen}_x_std"] = float(np.std(vals))
            lines.append(f"{k}{gen}: {np.mean(vals):.5f} "
                         f"+- {np.std(vals):.5f}   ")
        if inception_pb:
            is_input = ([metrics.apply_mask_uint8(g, m)
                         for g, m in zip(g_list, masks)]
                        if masked else g_list)
            is_mean, is_std = get_inception_score(
                is_input, frozen_graph_logits_fn(inception_pb))
            out[f"IS_{gen}_mean"], out[f"IS_{gen}_std"] = is_mean, is_std
            lines.append(f"IS{gen}: {is_mean:.5f} +- {is_std:.5f}   ")
    score_name = "score_mask.txt" if masked else "score.txt"
    with open(os.path.join(root, score_name), "w") as f:
        f.write("".join(lines).rstrip() + "\n")
    for k, v in out.items():
        print(f"{k}: {v:.6f}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", type=int)
    ap.add_argument("model_dir")
    ap.add_argument("test_dir")
    ap.add_argument("--mask", action="store_true")
    ap.add_argument("--inception_pb", default=None,
                    help="frozen classify_image_graph_def.pb; omitted -> "
                         "reuse /tmp/imagenet cache or download like the "
                         "reference (tflib/inception_score.py:12-20); IS "
                         "is skipped when neither is available")
    ap.add_argument("--no_is", action="store_true",
                    help="skip the Inception Score entirely")
    a = ap.parse_args()
    if a.no_is:
        a.inception_pb = None  # skip IS even when a graph was given
    elif a.inception_pb is None:
        a.inception_pb = ensure_inception_graph()
    if a.stage == 2:
        score_stage2(a.model_dir, a.test_dir, masked=a.mask,
                     inception_pb=a.inception_pb)
    elif a.stage == 1:
        score_stage1(a.model_dir, a.test_dir, masked=a.mask,
                     inception_pb=a.inception_pb)
    else:
        raise SystemExit(f"unknown stage {a.stage} (expected 1 or 2, "
                         "matching the reference score.py CLI)")


if __name__ == "__main__":
    main()
