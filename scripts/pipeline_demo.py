"""End-to-end pipeline demo on a procedurally generated mini-dataset.

Draws "stick people" (per-identity colors, pose-consistent skeletons,
per-camera backgrounds), converts them with the real tfrecord converter,
trains all four stages (Stage-I appearance, pose AE, Stage-II app + pose
samplers), runs the three testers, and scores the transfer output —
exercising every subsystem with a real quality signal (SSIM should rise
well above the random-init baseline because the data is learnable).

Usage: PYTHONPATH=. python scripts/pipeline_demo.py [workdir] [steps_scale]
"""
from __future__ import annotations

import json
import os
import pickle
import sys

import numpy as np
from PIL import Image, ImageDraw

H, W = 64, 32
N_IDS, N_CAMS, N_POSES = 8, 2, 12

LIMBS = [(1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8), (8, 9),
         (9, 10), (1, 11), (11, 12), (12, 13), (1, 0)]


def make_pose(rng):
    """Plausible 18-kp stick pose in pixel coords (row, col)."""
    cx = W / 2 + rng.uniform(-4, 4)
    top = 8 + rng.uniform(-2, 2)
    kp = np.zeros((18, 2))
    kp[0] = [top, cx]                      # nose
    kp[1] = [top + 6, cx]                  # neck
    sw = 5 + rng.uniform(-1, 1)
    kp[2] = [top + 7, cx - sw]             # Rsho
    kp[5] = [top + 7, cx + sw]             # Lsho
    for base, sign in ((2, -1), (5, 1)):
        ang = rng.uniform(-0.5, 0.5)
        kp[base + 1] = kp[base] + [9, sign * 2 + ang * 4]   # elbow
        kp[base + 2] = kp[base + 1] + [9, sign * 1 + ang * 4]  # wrist
    hw = 4
    kp[8] = [top + 24, cx - hw]            # Rhip
    kp[11] = [top + 24, cx + hw]           # Lhip
    for base, sign in ((8, -1), (11, 1)):
        ang = rng.uniform(-0.3, 0.3)
        kp[base + 1] = kp[base] + [11, ang * 5]
        kp[base + 2] = kp[base + 1] + [11, ang * 5]
    kp[14] = kp[0] + [-1, 2]               # eyes/ears
    kp[15] = kp[0] + [-1, -2]
    kp[16] = kp[0] + [0, 3]
    kp[17] = kp[0] + [0, -3]
    return np.clip(kp, 2, [H - 3, W - 3])


def draw_person(kp, pid, cam, rng):
    bg = [(40 + 20 * cam) % 255, (80 + 60 * cam) % 255, 120]
    img = Image.new("RGB", (W, H), tuple(bg))
    d = ImageDraw.Draw(img)
    col = tuple(int(c) for c in np.array(
        [50 + pid * 25 % 200, 200 - pid * 20 % 180, 60 + pid * 35 % 190]))
    for a, b in LIMBS:
        d.line([(kp[a][1], kp[a][0]), (kp[b][1], kp[b][0])], fill=col,
               width=3)
    d.ellipse([kp[0][1] - 3, kp[0][0] - 3, kp[0][1] + 3, kp[0][0] + 3],
              fill=col)
    return img


def generate_dataset(root, seed=0):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imgs")
    pose_dir = os.path.join(root, "pose")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pose_dir, exist_ok=True)
    all_peaks, subsets = {}, {}
    i = 0
    for pid in range(1, N_IDS + 1):
        for cam in range(1, N_CAMS + 1):
            for _ in range(N_POSES):
                i += 1
                name = f"{pid:04d}_c{cam}s1_{i:06d}_00.jpg"
                kp = make_pose(rng)
                draw_person(kp, pid, cam, rng).save(
                    os.path.join(img_dir, name), quality=95)
                peaks = [[(float(kp[k][1]), float(kp[k][0]), 0.9, k)]
                         for k in range(18)]
                all_peaks[name] = peaks
                s = np.zeros((1, 20))
                s[0, :18] = np.arange(18)
                s[0, -2] = 1.0
                subsets[name] = s
    with open(os.path.join(pose_dir, "all_peaks_dic.p"), "wb") as f:
        pickle.dump(all_peaks, f)
    with open(os.path.join(pose_dir, "subsets_dic.p"), "wb") as f:
        pickle.dump(subsets, f)
    return img_dir, pose_dir


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipeline_demo"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    os.makedirs(root, exist_ok=True)

    data_dir = os.path.join(root, "Market_demo")
    if not os.path.exists(os.path.join(data_dir, "pn_pairs_num_train.p")):
        print("== generating dataset ==", flush=True)
        img_dir, pose_dir = generate_dataset(root)
        from dpig_tpu.data.convert.run import run as convert
        n_train = convert("market", img_dir, pose_dir, data_dir,
                          split="train", height=H, width=W,
                          flip_augment=False, max_pairs=800)
        n_test = convert("market", img_dir, pose_dir, data_dir, split="test",
                         height=H, width=W, flip_augment=False, test_cap=192,
                         max_pairs=192)
        print(f"train={n_train} test={n_test}", flush=True)

    import jax
    from dpig_tpu.config import Config
    from dpig_tpu.data.loader import TFRecordPairLoader
    from dpig_tpu.train.harness import Trainer
    from dpig_tpu.train import checkpoint as ckpt

    def cfg_for(name, model, steps, bs, **kw):
        return Config(model=model, img_H=H, img_W=W, batch_size=bs,
                      conv_hidden_num=32, z_num=32,
                      g_lr=2e-4, d_lr=2e-4, lr_update_step=100000,
                      max_step=int(steps * scale), log_step=50,
                      model_dir=os.path.join(root, name),
                      dataset="Market_demo", data_dir=root, **kw)

    def loader_for(cfg, split="train"):
        return TFRecordPairLoader(data_dir, split, cfg.batch_size, H, W,
                                  dataset="market", shuffle=split == "train",
                                  seed=0)

    results = {}

    print("== stage 1: appearance ==", flush=True)
    from dpig_tpu.apps.stage1_app import Stage1App
    cfg1 = cfg_for("stage1", 1, 1200, 16)
    app1 = Stage1App(cfg1)
    t1 = Trainer(cfg1, app1, loader_for(cfg1))
    t1.train()
    stage1_ckpt = ckpt.latest_checkpoint(cfg1.model_dir)

    print("== stage 1: pose AE ==", flush=True)
    from dpig_tpu.apps.stage1_pose import Stage1PoseApp
    cfg2 = cfg_for("poseae", 2, 800, 64)
    t2 = Trainer(cfg2, Stage1PoseApp(cfg2), loader_for(cfg2))
    s2 = t2.train()
    results["pose_ae_final_mse"] = float(
        json.loads(open(f"{cfg2.model_dir}/metrics.jsonl").readlines()[-1]
                   )["reconstruct_loss"])
    poseae_ckpt = ckpt.latest_checkpoint(cfg2.model_dir)

    print("== stage 2: appearance samplers ==", flush=True)
    from dpig_tpu.apps.stage2_app import Stage2AppApp
    cfg3 = cfg_for("appsample", 3, 400, 16, pretrained_path=stage1_ckpt)
    frozen3 = ckpt.restore_subtrees(stage1_ckpt, ["Encoder", "ID_AE"])
    t3 = Trainer(cfg3, Stage2AppApp(cfg3), loader_for(cfg3))
    t3.train(frozen_params=frozen3)
    appsample_ckpt = ckpt.latest_checkpoint(cfg3.model_dir)

    print("== stage 2: pose sampler ==", flush=True)
    from dpig_tpu.apps.stage2_pose import Stage2PoseApp
    cfg4 = cfg_for("posesample", 4, 400, 32)
    frozen4 = dict(ckpt.restore_subtrees(poseae_ckpt, ["PoseAE"]))
    frozen4.update(frozen3)
    t4 = Trainer(cfg4, Stage2PoseApp(cfg4), loader_for(cfg4))
    t4.train(frozen_params=frozen4)
    posesample_ckpt = ckpt.latest_checkpoint(cfg4.model_dir)

    print("== testers ==", flush=True)
    from dpig_tpu.apps import testers
    common = dict(pretrained_path=stage1_ckpt,
                  pretrained_poseAE_path=poseae_ckpt,
                  pretrained_appSample_path=appsample_ckpt,
                  pretrained_poseSample_path=posesample_ckpt,
                  is_train=False)
    cfg12 = cfg_for("test12", 12, 0, 16, **common)
    out12 = testers.ConditionalTransferTester(cfg12).run(
        loader_for(cfg12, "test"), test_batch_num=8)
    cfg11 = cfg_for("test11", 11, 0, 16, sample_app=True,
                    one_app_per_batch=True, **common)
    testers.FullSamplingTester(cfg11).run(loader_for(cfg11, "test"),
                                          test_batch_num=4)
    cfg13 = cfg_for("test13", 13, 0, 16, sample_fg=True, **common)
    testers.FactorSamplingTester(cfg13).run(loader_for(cfg13, "test"),
                                            test_batch_num=4)

    print("== scoring ==", flush=True)
    from dpig_tpu.eval.score import score_stage1
    scores = score_stage1(cfg12.model_dir, os.path.basename(out12))
    results.update(scores)

    stage1_metrics = [json.loads(l) for l in
                      open(f"{cfg1.model_dir}/metrics.jsonl")]
    results["stage1_first_L1"] = stage1_metrics[0]["L1Loss"]
    results["stage1_final_L1"] = stage1_metrics[-1]["L1Loss"]
    with open(os.path.join(root, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
