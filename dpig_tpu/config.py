"""Configuration (mirrors reference config.py:1-102 flag surface).

One dataclass replaces the argparse namespace; `get_config()` still parses
the same CLI flags (plus TPU-specific extras) so run scripts translate 1:1.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from datetime import datetime
from typing import Optional


def str2bool(v: str) -> bool:
    return str(v).lower() in ("true", "1")


@dataclass
class Config:
    # Network (reference config.py:16-27)
    img_H: int = 128
    img_W: int = 64
    conv_hidden_num: int = 128
    z_num: int = 64

    # Data (config.py:30-36)
    dataset: str = "Market_train_data"
    split: str = "train"
    batch_size: int = 16
    grayscale: bool = False
    num_worker: int = 4
    # Parallel-decode executor: 'thread' (default; PIL/ctypes/numpy release
    # the GIL so threads scale on multi-core hosts) or 'process' (a
    # ProcessPoolExecutor fallback for GIL-bound codecs — pays ~300 KB/sample
    # result pickling; see scripts/loader_bench.py for the measured table).
    worker_mode: str = "thread"

    # Training / test (config.py:38-79)
    is_train: bool = True
    test_one_by_one: bool = False
    optimizer: str = "adam"
    start_step: int = 0
    ckpt_path: Optional[str] = None
    pretrained_path: Optional[str] = None
    pretrained_appSample_path: Optional[str] = None
    pretrained_poseAE_path: Optional[str] = None
    pretrained_poseSample_path: Optional[str] = None
    z_emb_dir: Optional[str] = None
    max_step: int = 500000
    lr_update_step: int = 100000
    L1Loss_weight: float = 20.0
    d_lr: float = 0.00008
    g_lr: float = 0.00008
    beta1: float = 0.5
    beta2: float = 0.999
    gamma: float = 0.5
    lambda_k: float = 0.001
    model: int = 0
    D_arch: str = "DCGAN"
    sample_app: bool = False
    sample_fg: bool = False
    sample_bg: bool = False
    sample_pose: bool = False
    one_app_per_batch: bool = False
    interpolate_fg: bool = False
    interpolate_fg_up: bool = False
    interpolate_fg_down: bool = False
    interpolate_bg: bool = False
    interpolate_pose: bool = False
    inverse_fg: bool = False
    inverse_bg: bool = False
    inverse_pose: bool = False

    # Misc (config.py:81-94)
    load_path: str = ""
    log_step: int = 200
    save_model_secs: int = 1000
    num_log_samples: int = 3
    log_level: str = "INFO"
    log_dir: str = "logs"
    model_dir: Optional[str] = None
    data_dir: str = "data"
    test_data_path: Optional[str] = None
    sample_per_image: int = 64
    random_seed: int = 123

    # TPU-native extras (no reference equivalent)
    compute_dtype: str = "float32"      # 'bfloat16' for the fast path
    mesh_axis: str = "data"
    test_batch_num: int = 0             # 0 -> model-specific default
    keypoint_num: int = 18
    part_num: int = 37                  # bboxes stored per sample
    roi_part_num: int = 7               # parts actually encoded (trainer.py:576)
    roi_z_num: int = 32                 # trainer.py:581 hardcodes 32
    synthetic_data: bool = False        # run on generated fixtures (no tfrecords)
    platform: str = ""                  # pin jax platform ('cpu' for smokes
    # that must not take the TPU; '' = backend default)
    # Multi-host (jax.distributed over DCN; SURVEY §2.8 TPU-native row)
    coordinator_address: str = ""       # e.g. 'host0:1234'; '' = single-host
    num_processes: int = 1
    process_id: int = -1                # -1 = auto (from env)
    remat: bool = False                 # rematerialize generator activations
    pose_raster: str = "xla"            # 'xla' closed form | 'pallas' kernel
    # Inference numerics for the testers (models 11/12/13...): 'bf16'
    # runs the flax modules; 'int8' runs the PTQ encoder+generator
    # (models/quant.py), calibrated on the first test batch — the
    # production serving path (~2.3x bf16 on the v5e, SSIM delta ~1e-4).
    inference_dtype: str = "bf16"       # 'bf16' | 'int8'
    # Comma-separated generator layers to keep in exact bf16 inside the
    # int8 graph ('enc/Conv_0'..'dec/Conv_13','to_rgb') — a selective
    # quality fallback; rank candidates with scripts/int8_quality.py
    # check --per_layer. Ignored unless inference_dtype=int8.
    int8_fallback_layers: str = ""
    # How fallback layers are routed: 'legacy' re-routes the whole
    # generator through the per-layer-quant graph (bf16 inter-layer
    # tensors, ~10% slower); 'island' keeps the s8-chained graph and runs
    # the fallback layers as exact-bf16 islands inside it (chained
    # throughput; consecutive fallback layers pass bf16 between them).
    # 'island' is the default: at the 20k-step quality sweep the island
    # tail-fallback matched legacy-routed quality (SSIM(int8,float)
    # 0.9634 vs 0.9641, to-target delta -0.0005 vs -0.0006), and it keeps
    # a single (chained) graph. Throughput between the two routings is
    # neutral for the decoder-tail fallback (3294 vs 3373 img/s bs512 —
    # the bf16 fallback convs dominate, not the routing); island wins
    # when the fallback names are CHEAP layers, since full legacy routing
    # costs ~19% even all-int8 (3614 vs 4452, bench.py legacy mode).
    int8_fallback_mode: str = "island"  # 'island' | 'legacy'
    # Activation-calibration scheme for the int8 generator: 'channel'
    # (per-input-channel absmax folded into the weights — same chained
    # graph and throughput; the measured default: SSIM(int8,float)
    # 0.9941@2k / 0.9865@20k training steps vs absmax 0.9457/0.7758,
    # to-target delta +0.0000 at both depths), 'absmax',
    # 'percentile:99.9', or 'entropy' (KL threshold search; measured
    # worse than absmax at every depth).
    int8_calibration: str = "channel"
    # One-time PTQ fidelity print at tester startup: SSIM(int8,float) on
    # the calibration batch (one extra float forward, outside the
    # serving loop). The operator-facing twin of int8_quality.py gate.
    int8_selfcheck: bool = True
    # Model-11 pose selection override. '' derives from --sample_pose:
    # False -> 'real', True -> 'reconstructed' (the reference quirk:
    # tester.py:93-95/341-343 decodes the AE embedding of the real pose,
    # never the Gaussian sample). 'sampled' decodes PoseGaussian(z) — the
    # paper's intended sampler, reachable only via this flag.
    pose_source: str = ""               # '' | 'real' | 'reconstructed' | 'sampled'
    # Reference-faithful GAN stepping re-runs the generator forward with
    # the POST-G-update params to build the D batch (two separate
    # sess.run's, trainer.py:337-345). fast_gan_step=true feeds D the
    # pre-update G output from the G step instead — one full
    # generator+encoder forward less per step (~17% on the v5e), with
    # slightly different (standard simultaneous-GAN) dynamics.
    fast_gan_step: bool = False
    # Stage-II WGAN critic batching (models 3/4/103). The reference pulls
    # a FRESH queue batch for every critic sess.run (trainer.py:821-845);
    # 'fresh' replicates that — the harness feeds 1+CRITIC_ITERS batches
    # per step. 'reused' is the fused single-batch step (critic
    # iterations reuse the G step's batch with fresh mapper noise) —
    # 6x fewer frozen-encoder forwards per step. Measured A/B
    # (scripts/critic_batch_ab.py 2000 32, docs/critic_ab_r5.json):
    # fresh wins the fg sampler's moment match (std gap 0.0083 vs
    # 0.0294, mean gap 0.0178 vs 0.0238, Wasserstein tail 0.070 vs
    # 0.318) and ties bg — reference semantics is therefore the default.
    critic_batch_mode: str = "fresh"    # 'fresh' | 'reused'
    # NOTE a deleted experiment: --train_pin_layouts (pin every train-graph
    # activation to the fast conv layout) was A/B'd twice on chip — r3
    # (degraded window): 306 vs 304 img/s; r4: 324.6/327.9 pinned vs
    # 323.8/309.3 unpinned at bs128 fast — neutral both times (XLA already
    # picks fast layouts in the train graph; the oracle's estimated win was
    # layout-assignment pessimism). Removed rather than shipped dead.
    demo_img_dir: Optional[str] = None  # test_one_by_one inputs
    demo_pair_path: Optional[str] = None
    demo_all_peaks_path: Optional[str] = None
    demo_subsets_path: Optional[str] = None

    # Derived
    data_path: str = ""

    @property
    def repeat_num(self) -> int:
        """log2(H) - 2 (trainer.py:75): 5 at 128px, 6 at 256px."""
        import math
        return int(math.log2(self.img_H)) - 2

    def finalize(self) -> "Config":
        """Resolve model_dir / data_path (reference utils.py:111-141)."""
        if not self.model_dir:
            stamp = datetime.now().strftime("%m%d_%H%M%S")
            self.model_dir = os.path.join(self.log_dir, f"{self.dataset}_{stamp}")
        if not self.data_path:
            self.data_path = os.path.join(self.data_dir, self.dataset)
        return self

    def save(self, path: Optional[str] = None) -> None:
        """Persist params.json (reference utils.py:145-152)."""
        assert self.model_dir
        os.makedirs(self.model_dir, exist_ok=True)
        path = path or os.path.join(self.model_dir, "params.json")
        with open(path, "w") as fp:
            json.dump(dataclasses.asdict(self), fp, indent=4, sort_keys=True)


def get_config(argv=None) -> Config:
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        if f.name in ("data_path",):
            continue
        typ = f.type if isinstance(f.type, type) else None
        default = f.default
        if isinstance(default, bool):
            parser.add_argument(f"--{f.name}", type=str2bool, default=default)
        elif default is None:
            parser.add_argument(f"--{f.name}", type=str, default=None)
        elif isinstance(default, int):
            parser.add_argument(f"--{f.name}", type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(f"--{f.name}", type=float, default=default)
        else:
            parser.add_argument(f"--{f.name}", type=str, default=default)
    args, _unknown = parser.parse_known_args(argv)
    cfg = Config(**{k: v for k, v in vars(args).items()})
    return cfg.finalize()
