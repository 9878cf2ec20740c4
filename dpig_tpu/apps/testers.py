"""Inference testers (reference tester.py models 11/12/13, plus the 256
variants 1001/1002 via the same classes at 256x256).

All compose the 4 pretrained subnets (train/checkpoint.py) and write the
PNG directory trees that score.py / score_mask.py consume.

Reference quirk (replicated as an option): in tester.py the PoseDecoder
always decodes `pose_embs` (the AE-encoding of the *real* input pose) —
tester.py:93-95/341-343 — so `--sample_pose=true` yields AE
*reconstructions*, and the PoseGaussian output G_pose_embs is built but
never decoded. `pose_source` selects:
  'real'          — inflate the dataset pose (reference sample_pose=False)
  'reconstructed' — decode(pose_embs)        (reference sample_pose=True)
  'sampled'       — decode(PoseGaussian(z))  (the paper's intended sampler,
                    matching the model-4 training preview, trainer.py:894-904)
"""
from __future__ import annotations

import functools
import itertools
import os
from typing import Dict, Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ..config import Config
from ..eval.metrics import ssim_images
from ..models.mappers import GaussianMapper, sample_mapper_noise
from ..ops.pose import pose_rcv_normalize, render_pose_maps
from ..train import checkpoint as ckpt
from ..utils.viz import pose_to_gray, save_image
from .common import select_parts
from .stage1_app import Stage1App
from .stage1_pose import Stage1PoseApp
from .stage2_app import Stage2AppApp
from .stage2_pose import POSE_Z


def _parse_int8_calibration(cfg):
    """--int8_calibration -> QuantizedGenerator calibration kwargs."""
    spec = getattr(cfg, "int8_calibration", "channel") or "channel"
    if spec.startswith("percentile:"):
        return {"calib_method": "percentile",
                "calib_percentile": float(spec.split(":", 1)[1])}
    if spec == "channel":
        return {"calib_granularity": "channel"}
    if spec in ("absmax", "entropy"):
        return {"calib_method": spec}
    raise ValueError(f"unknown --int8_calibration {spec!r} (expected "
                     "absmax | percentile:<p> | entropy | channel)")


def _parse_int8_fallback(cfg):
    """Split --int8_fallback_layers into (encoder, generator) name sets:
    'stem/fg/bg' prefixes are QuantizedEncoder layers, everything else
    ('enc/…', 'dec/…', 'to_rgb') goes to the generator."""
    names = frozenset(
        n.strip() for n in
        getattr(cfg, "int8_fallback_layers", "").split(",") if n.strip())
    enc = frozenset(n for n in names
                    if n.split("/")[0] in ("stem", "fg", "bg"))
    return enc, names - enc


def _save_dir_tree(root: str, names) -> Dict[str, str]:
    dirs = {}
    for n in names:
        d = os.path.join(root, n)
        os.makedirs(d, exist_ok=True)
        dirs[n] = d
    return dirs


def _save_batch_pngs(dirs: Dict[str, str], arrays: Dict[str, np.ndarray],
                     start_idx: int) -> None:
    for name, arr in arrays.items():
        for j in range(arr.shape[0]):
            img = np.clip(arr[j], 0, 255).astype(np.uint8)
            if img.ndim == 3 and img.shape[-1] == 1:
                img = img[..., 0]
            Image.fromarray(img).save(
                os.path.join(dirs[name], f"{start_idx + j:05d}.png"))


class _TesterBase:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.stage1 = Stage1App(cfg, fg_bg=cfg.img_H < 256)
        self.params = self._restore_params()

    def _restore_params(self):
        cfg = self.cfg
        merged = ckpt.compose_pretrained(cfg)
        missing = self.REQUIRED - set(merged)
        if missing:
            # Cold start (tests / smoke runs): init fresh nets for the
            # missing parts — loudly, so a production run with forgotten
            # --pretrained_* flags is obvious.
            print(f"[!] {type(self).__name__}: no pretrained weights for "
                  f"{sorted(missing)} — using RANDOM init (pass the "
                  "--pretrained_* flags for real inference)", flush=True)
            merged = {**self._fresh_params(), **merged}
        return merged

    def _fresh_params(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.random_seed)
        params = dict(self.stage1.init_state(rng).g_params)
        pose_ae = Stage1PoseApp(cfg)
        params.update(pose_ae.init_state(rng).g_params)
        s2 = Stage2AppApp(cfg)
        st = s2.init_state(rng, frozen_params=params)
        params.update(st.g_params)
        mapper = GaussianMapper(out_dim=POSE_Z, hidden_num=512)
        params["PoseGaussian"] = jax.jit(mapper.init)(
            rng, jnp.zeros((2, POSE_Z)))["params"]
        app_dim = cfg.roi_part_num * cfg.roi_z_num
        single = GaussianMapper(out_dim=app_dim, hidden_num=512)
        params["Gaussian_FC"] = jax.jit(single.init)(
            rng, jnp.zeros((2, app_dim)))["params"]
        disc = self.stage1.disc
        dv = jax.jit(functools.partial(disc.init, train=True))(
            rng, jnp.zeros((2, cfg.img_H, cfg.img_W, 3)))
        params["Discriminator"] = dv["params"]
        params["Discriminator_stats"] = dv.get("batch_stats", {})
        return params

    # shared forward pieces ------------------------------------------------
    # NOTE: all jitted steps take `params` as a traced ARGUMENT — closing
    # over self.params would embed ~0.5GB of constants in the compiled
    # graph, which exceeds remote-compile payload limits at full scale.
    def _encode_app(self, params, batch):
        cfg = self.cfg
        bbox, vis = select_parts(batch["part_bbox"], batch["part_vis"],
                                 cfg.roi_part_num)
        if "_quant_enc" in params:
            from ..models import quant as quant_mod
            return quant_mod.roi_fgbg_forward(
                params["Encoder"], batch["x"], batch["mask_r6"], bbox, vis,
                cfg.repeat_num, cfg.conv_hidden_num,
                part_num=cfg.roi_part_num, quant=params["_quant_enc"])
        return self.stage1._encode(params["Encoder"], batch["x"],
                                   batch["mask_r6"], bbox, vis)

    def _generate(self, params, embs, pose_maps):
        from ..models import quant as quant_mod
        gen_repeat = (self.cfg.repeat_num - 1 if self.cfg.img_H >= 256
                      else self.cfg.repeat_num)
        if "_quant_gen" in params:
            # a selective bf16 fallback routes through the legacy
            # per-layer-quant graph unless --int8_fallback_mode=island
            # keeps the chained graph with exact-bf16 islands
            # (QuantizedGenerator docstring)
            _, gen_fb = _parse_int8_fallback(self.cfg)
            island = (getattr(self.cfg, "int8_fallback_mode", "island")
                      == "island")
            g_raw, _ = quant_mod.uae_forward(
                params["ID_AE"], embs, pose_maps, gen_repeat,
                self.cfg.conv_hidden_num, quant=params["_quant_gen"],
                chained=not gen_fb or island)
            return g_raw.astype(jnp.float32)
        if self.stage1.dtype == jnp.bfloat16:
            # layout-pinned bf16 raw-param forward: same math as the flax
            # module (exactly — layout pins don't change arithmetic, and
            # the 1x1/NN-upsample commute is bitwise), ~20% faster on the
            # v5e (quant.uae_forward_bf16 docstring)
            g_raw, _ = quant_mod.uae_forward_bf16(
                params["ID_AE"], embs, pose_maps, gen_repeat,
                self.cfg.conv_hidden_num)
            return g_raw.astype(jnp.float32)
        g_raw, _ = self.stage1.generator.apply(
            {"params": params["ID_AE"]}, None, pose_maps,
            embs_const=embs)
        return g_raw.astype(jnp.float32)

    def _inference_params(self, first_batch):
        """Params for the jitted steps, honoring cfg.inference_dtype.

        'int8': PTQ-calibrate the generator (and, for the 128x64 FgBg
        family, the ROI encoder) on the first test batch and return
        self.params augmented with the quant tables under '_quant_gen' /
        '_quant_enc' (plain pytrees of arrays — traced jit args)."""
        cfg = self.cfg
        if getattr(cfg, "inference_dtype", "bf16") != "int8":
            return self.params
        from ..models import quant as quant_mod
        params = dict(self.params)
        jb = {k: jnp.asarray(v) for k, v in first_batch.items()}
        bbox, vis = select_parts(jb["part_bbox"], jb["part_vis"],
                                 cfg.roi_part_num)
        enc_fallback, gen_fallback = _parse_int8_fallback(cfg)
        calib = _parse_int8_calibration(cfg)
        is_256 = cfg.img_H >= 256
        if self.stage1.fg_bg and not is_256:
            qe = quant_mod.QuantizedEncoder(
                params["Encoder"], cfg.repeat_num, cfg.conv_hidden_num,
                part_num=cfg.roi_part_num, bf16_layers=enc_fallback,
                calib_granularity=calib.get("calib_granularity", "tensor"))
            qe.calibrate([(jb["x"], jb["mask_r6"], bbox, vis)])
            params["_quant_enc"] = qe.quant
        elif enc_fallback:
            # no int8 encoder exists on this path — fail loudly rather
            # than silently ignoring the user's fallback request
            raise ValueError(
                f"--int8_fallback_layers names {sorted(enc_fallback)} "
                "target the int8 encoder, but this tester "
                f"({type(self).__name__}, img_H={cfg.img_H}, "
                f"fg_bg={self.stage1.fg_bg}) runs its encoder in bf16 "
                "already; drop the stem/fg/bg names")
        embs = jax.jit(functools.partial(self._encode_app))(params, jb)
        pose = render_pose_maps(jb["pose_rcv"], cfg.img_H, cfg.img_W,
                                cfg.keypoint_num, radius=4, normalized=False)
        gen_repeat = cfg.repeat_num - 1 if is_256 else cfg.repeat_num
        qg = quant_mod.QuantizedGenerator(params["ID_AE"], gen_repeat,
                                          cfg.conv_hidden_num,
                                          bf16_layers=gen_fallback, **calib)
        # When this tester will feed Gaussian-mapper-SAMPLED embeddings
        # (sample_app/sample_fg/sample_bg), calibrate on a sampled batch
        # too: sampled embeddings can exceed the encoder-derived absmax
        # and would otherwise be clipped to the int8 range.
        calib_embs, calib_pose = [embs], [pose]
        sampled = self._sampled_calib_embs(
            params, int(jb["x"].shape[0]),
            jax.random.PRNGKey(cfg.random_seed))
        if sampled is not None:
            calib_embs.append(sampled)
            calib_pose.append(pose)
        qg.calibrate(calib_embs, calib_pose)
        params["_quant_gen"] = qg.quant
        print(f"[*] {type(self).__name__}: int8 PTQ inference "
              f"(calibrated on the first batch)", flush=True)
        if getattr(cfg, "int8_selfcheck", True):
            # one-time PTQ fidelity print on the calibration batch, so a
            # serving operator sees int8-vs-float SSIM on THEIR checkpoint
            # at startup (the deploy gate's metric — README calibration
            # table; disable with --int8_selfcheck=false). Costs one float
            # forward outside the serving loop.
            from ..models.quant import uae_forward
            # both forwards jitted: eager op dispatch is pathological on
            # the lazy remote backend (CLAUDE.md) — an un-jitted ~50-conv
            # graph would pay per-op remote compiles at every startup
            g_q = np.asarray(jax.jit(self._generate)(params, embs, pose))
            g_f = np.asarray(jax.jit(functools.partial(
                uae_forward, repeat_num=gen_repeat,
                hidden_num=cfg.conv_hidden_num))(
                    params["ID_AE"], embs, pose)[0])
            to255 = lambda a: np.clip((a + 1.0) * 127.5, 0, 255)  # noqa: E731
            fidelity = float(ssim_images(to255(g_q), to255(g_f)).mean())
            print(f"[*] int8 self-check: SSIM(int8,float)={fidelity:.4f} "
                  f"on the calibration batch "
                  f"(shipping-default reference: >=0.98; see README "
                  f"calibration table / scripts/int8_quality.py gate)",
                  flush=True)
        return params

    def _sampled_calib_embs(self, params, b: int, rng):
        """Optional extra int8-calibration batch: mapper-sampled app
        embeddings, when this tester can feed them at inference (overridden
        by the sampling testers). None = encoder-only calibration."""
        return None

    def _market_mapper_embs(self, params, b: int, rng):
        """Mapper-sampled fg+bg app embedding batch (Market FgBg path).
        Requires the subclass to define mapper_fg/mapper_bg/fg_dim."""
        r_fg, r_bg = jax.random.split(rng)
        fg = self.mapper_fg.apply(
            {"params": params["Gaussian_FC_Fg"]},
            sample_mapper_noise(r_fg, b, self.fg_dim))
        bg = self.mapper_bg.apply(
            {"params": params["Gaussian_FC_Bg"]},
            sample_mapper_noise(r_bg, b, self.cfg.roi_z_num * 4))
        return jnp.concatenate([fg, bg], -1)

    def _disc_score(self, params, g_raw):
        if "Discriminator" not in params:
            return jnp.zeros((g_raw.shape[0],))
        out, _ = self.stage1.disc.apply(
            {"params": params["Discriminator"],
             "batch_stats": params.get("Discriminator_stats", {})},
            g_raw, train=True, mutable=["batch_stats"])
        return out.astype(jnp.float32)

    def _pose_maps(self, params, batch, rng, pose_source: str):
        """Returns (pose_maps [-1,1] inflated, pose_rcv used)."""
        cfg = self.cfg
        pose_ae = Stage1PoseApp(cfg)
        if pose_source == "real":
            rcv = batch["pose_rcv"]
            maps = render_pose_maps(rcv, cfg.img_H, cfg.img_W,
                                    cfg.keypoint_num, radius=4,
                                    normalized=False)
            return maps, rcv
        if pose_source == "reconstructed":
            rcv_norm = pose_rcv_normalize(batch["pose_rcv"], cfg.img_H,
                                          cfg.img_W)
            flat = rcv_norm.reshape(rcv_norm.shape[0], -1)
            z = pose_ae.encoder.apply(
                {"params": params["PoseAE"]["G_Pose_Encoder"]}, flat)
        elif pose_source == "sampled":
            mapper = GaussianMapper(out_dim=POSE_Z, hidden_num=512)
            noise = sample_mapper_noise(rng, batch["pose_rcv"].shape[0],
                                        POSE_Z)
            z = mapper.apply({"params": params["PoseGaussian"]}, noise)
        else:
            raise ValueError(pose_source)
        rcv, _ = pose_ae.decode_pose({"PoseAE": params["PoseAE"]}, z)
        maps = render_pose_maps(rcv, cfg.img_H, cfg.img_W, cfg.keypoint_num,
                                radius=4, normalized=True)
        return maps, rcv


class FullSamplingTester(_TesterBase):
    """Model 11 (tester.py:256-416): sample FG/BG appearance (+ pose),
    generate, write PNG trees + discriminator scores."""

    REQUIRED = {"Encoder", "ID_AE", "PoseAE", "PoseGaussian",
                "Gaussian_FC_Fg", "Gaussian_FC_Bg"}
    DEFAULT_BATCHES = 751  # tester.py:311

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.fg_dim = cfg.roi_part_num * cfg.roi_z_num
        self.mapper_fg = GaussianMapper(out_dim=self.fg_dim, hidden_num=512)
        self.mapper_bg = GaussianMapper(out_dim=cfg.roi_z_num * 4,
                                        hidden_num=256)

    def _sampled_calib_embs(self, params, b, rng):
        if not (self.cfg.sample_app or self.cfg.one_app_per_batch):
            return None
        return self._market_mapper_embs(params, b, rng)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def sample_step(self, params, batch, rng, pose_source: str = "real"):
        cfg = self.cfg
        b = batch["x"].shape[0]
        r_fg, r_bg, r_pose = jax.random.split(rng, 3)
        embs = self._encode_app(params, batch)
        fg_embs, bg_embs = embs[:, :self.fg_dim], embs[:, self.fg_dim:]

        app_fg = self.mapper_fg.apply(
            {"params": params["Gaussian_FC_Fg"]},
            sample_mapper_noise(r_fg, b, self.fg_dim))
        app_bg = self.mapper_bg.apply(
            {"params": params["Gaussian_FC_Bg"]},
            sample_mapper_noise(r_bg, b, cfg.roi_z_num * 4))

        if cfg.one_app_per_batch:  # fix FG, vary BG (tester.py:381-387)
            app = jnp.concatenate([jnp.tile(app_fg[:1], (b, 1)), app_bg], -1)
        else:
            app = jnp.concatenate([app_fg, app_bg], -1)
        if cfg.sample_app:
            embs = app
        elif cfg.one_app_per_batch:  # real FG of sample 0, real BGs
            embs = jnp.concatenate(
                [jnp.tile(fg_embs[:1], (b, 1)), bg_embs], -1)

        pose_maps, rcv = self._pose_maps(params, batch, r_pose, pose_source)
        g_raw = self._generate(params, embs, pose_maps)
        score = self._disc_score(params, g_raw)
        return jnp.clip((g_raw + 1) * 127.5, 0, 255), pose_maps, score, rcv

    def run(self, loader: Iterator, test_batch_num: Optional[int] = None,
            pose_source: str = "real") -> str:
        cfg = self.cfg
        n = test_batch_num or cfg.test_batch_num or self.DEFAULT_BATCHES
        out_root = os.path.join(
            cfg.model_dir,
            f"test_result_SampleApp{cfg.sample_app}Pose-{pose_source}"
            f"_{n}x{cfg.batch_size}")
        # Full reference output tree (tester.py:139-147,178-195): input
        # pair + masks + input/target/generated pose renderings.
        dirs = _save_dir_tree(out_root, ["x", "x_target", "G", "pose",
                                         "pose_target", "G_pose", "mask",
                                         "mask_target"])
        rng = jax.random.PRNGKey(0)  # tf.set_random_seed(0), tester.py:372
        first = next(loader)
        params = self._inference_params(first)
        batches = itertools.chain([first], loader)
        for i in range(n):
            batch = next(batches)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, sub = jax.random.split(rng)
            g, pose_maps, score, g_rcv = self.sample_step(params, jb, sub,
                                                          pose_source)
            arrays = {
                "x": (np.asarray(batch["x"]) + 1) * 127.5,
                "pose": pose_to_gray(np.asarray(render_pose_maps(
                    jb["pose_rcv"], cfg.img_H, cfg.img_W, cfg.keypoint_num,
                    radius=4, normalized=False))),
                "G_pose": pose_to_gray(np.asarray(pose_maps)),
            }
            if "x_target" in batch:
                arrays["x_target"] = (np.asarray(batch["x_target"]) + 1) * 127.5
            if "pose_rcv_target" in batch:
                arrays["pose_target"] = pose_to_gray(np.asarray(
                    render_pose_maps(jb["pose_rcv_target"], cfg.img_H,
                                     cfg.img_W, cfg.keypoint_num, radius=4,
                                     normalized=False)))
            if "mask_r6" in batch:
                arrays["mask"] = np.asarray(batch["mask_r6"]) * 255.0
            if "mask_r6_target" in batch:
                arrays["mask_target"] = \
                    np.asarray(batch["mask_r6_target"]) * 255.0
            _save_batch_pngs(dirs, arrays, i * cfg.batch_size)
            # pose_rcv dumps alongside the renderings (tester.py generate()
            # keeps the coordinates; scoring/re-id tooling reads them
            # back). These are the coordinates the G_pose renderings were
            # actually built from — the AE-decoded/sampled rcv, not the
            # input batch's.
            if i < 4:
                np.save(os.path.join(dirs["G_pose"], f"pose_rcv_{i:04d}.npy"),
                        np.asarray(g_rcv))
            # G filenames carry the discriminator score (tester.py:185)
            g_np = np.asarray(g)
            s_np = np.asarray(score)
            for j in range(g_np.shape[0]):
                idx = i * cfg.batch_size + j
                Image.fromarray(np.clip(g_np[j], 0, 255).astype(
                    np.uint8)).save(os.path.join(
                        dirs["G"], f"{idx:05d}_score{float(s_np[j]):.3f}.png"))
        return out_root


class FactorSamplingTester(_TesterBase):
    """Model 13 / 1002 (tester.py:419-613): independently toggle
    sample_fg / sample_bg / sample_pose; non-sampled factors are fixed to
    sample 0's embedding across the batch."""

    DEFAULT_BATCHES = 400  # tester.py:475

    def __init__(self, cfg: Config):
        self.is_256 = cfg.img_H >= 256
        # DF (model 1002) has one 7*32-d app mapper 'Gaussian_FC'
        # (tester.py:917-1161); Market splits FG/BG.
        self.REQUIRED = ({"Encoder", "ID_AE", "PoseAE", "PoseGaussian",
                          "Gaussian_FC"} if self.is_256 else
                         {"Encoder", "ID_AE", "PoseAE", "PoseGaussian",
                          "Gaussian_FC_Fg", "Gaussian_FC_Bg"})
        super().__init__(cfg)
        self.fg_dim = cfg.roi_part_num * cfg.roi_z_num
        self.mapper_fg = GaussianMapper(out_dim=self.fg_dim, hidden_num=512)
        self.mapper_bg = GaussianMapper(out_dim=cfg.roi_z_num * 4,
                                        hidden_num=256)

    def _sampled_calib_embs(self, params, b, rng):
        cfg = self.cfg
        if not (cfg.sample_fg or cfg.sample_bg or cfg.sample_app):
            return None
        if self.is_256:
            r_fg, _ = jax.random.split(rng)
            return self.mapper_fg.apply(
                {"params": params["Gaussian_FC"]},
                sample_mapper_noise(r_fg, b, self.fg_dim))
        return self._market_mapper_embs(params, b, rng)

    @functools.partial(jax.jit, static_argnums=0)
    def sample_step(self, params, batch, rng):
        cfg = self.cfg
        b = batch["x"].shape[0]
        r_fg, r_bg, r_pose = jax.random.split(rng, 3)
        embs = self._encode_app(params, batch)

        if self.is_256:
            if cfg.sample_fg or cfg.sample_app:
                embs = self.mapper_fg.apply(
                    {"params": params["Gaussian_FC"]},
                    sample_mapper_noise(r_fg, b, self.fg_dim))
            else:
                embs = jnp.tile(embs[:1], (b, 1))
        else:
            fg_embs, bg_embs = embs[:, :self.fg_dim], embs[:, self.fg_dim:]
            if cfg.sample_fg:
                fg = self.mapper_fg.apply(
                    {"params": params["Gaussian_FC_Fg"]},
                    sample_mapper_noise(r_fg, b, self.fg_dim))
            else:
                fg = jnp.tile(fg_embs[:1], (b, 1))  # tester.py:541-543
            if cfg.sample_bg:
                bg = self.mapper_bg.apply(
                    {"params": params["Gaussian_FC_Bg"]},
                    sample_mapper_noise(r_bg, b, cfg.roi_z_num * 4))
            else:
                bg = jnp.tile(bg_embs[:1], (b, 1))
            embs = jnp.concatenate([fg, bg], -1)

        if cfg.sample_pose:
            pose_maps, _ = self._pose_maps(params, batch, r_pose,
                                           "reconstructed")
        else:
            # one real pose tiled across the batch (tester.py:506-508)
            rcv_norm = pose_rcv_normalize(batch["pose_rcv"], cfg.img_H,
                                          cfg.img_W)
            rcv_one = jnp.tile(rcv_norm[:1], (b, 1, 1))
            pose_maps = render_pose_maps(rcv_one, cfg.img_H, cfg.img_W,
                                         cfg.keypoint_num, radius=4,
                                         normalized=True)
        g_raw = self._generate(params, embs, pose_maps)
        score = self._disc_score(params, g_raw)
        return jnp.clip((g_raw + 1) * 127.5, 0, 255), pose_maps, score

    def run(self, loader: Iterator, test_batch_num: Optional[int] = None) -> str:
        cfg = self.cfg
        n = test_batch_num or cfg.test_batch_num or self.DEFAULT_BATCHES
        out_root = os.path.join(
            cfg.model_dir,
            f"test_result_ROI7_SampleFg{cfg.sample_fg}SampleBg{cfg.sample_bg}"
            f"SamplePose{cfg.sample_pose}_pretrain_{n}x{cfg.batch_size}")
        dirs = _save_dir_tree(out_root, ["x", "G", "pose"])
        rng = jax.random.PRNGKey(0)
        first = next(loader)
        params = self._inference_params(first)
        batches = itertools.chain([first], loader)
        for i in range(n):
            batch = next(batches)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, sub = jax.random.split(rng)
            g, pose_maps, score = self.sample_step(params, jb, sub)
            _save_batch_pngs(dirs, {
                "x": (np.asarray(batch["x"]) + 1) * 127.5,
                "G": np.asarray(g),
                "pose": pose_to_gray(np.asarray(pose_maps)),
            }, i * cfg.batch_size)
        return out_root


class ConditionalTransferTester(_TesterBase):
    """Model 12 / 1001 (tester.py:616-767): PG2-style pose transfer —
    source appearance + target pose -> image; writes the directory tree
    score.py consumes (x, x_target, G, pose, pose_target, mask,
    mask_target)."""

    REQUIRED = {"Encoder", "ID_AE"}
    DEFAULT_BATCHES = 600  # tester.py:650

    @functools.partial(jax.jit, static_argnums=0)
    def transfer_step(self, params, batch):
        cfg = self.cfg
        embs = self._encode_app(params, batch)
        pose_t = render_pose_maps(batch["pose_rcv_target"], cfg.img_H,
                                  cfg.img_W, cfg.keypoint_num, radius=4,
                                  normalized=False)
        g_raw = self._generate(params, embs, pose_t)
        score = self._disc_score(params, g_raw)
        return jnp.clip((g_raw + 1) * 127.5, 0, 255), pose_t, score

    def run(self, loader: Iterator, test_batch_num: Optional[int] = None) -> str:
        cfg = self.cfg
        n = test_batch_num or cfg.test_batch_num or self.DEFAULT_BATCHES
        out_root = os.path.join(cfg.model_dir, "test_result")
        dirs = _save_dir_tree(out_root, ["x", "x_target", "G", "pose",
                                         "pose_target", "mask", "mask_target"])
        ssims = []
        first = next(loader)
        params = self._inference_params(first)
        batches = itertools.chain([first], loader)
        for i in range(n):
            batch = next(batches)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            g, pose_t, score = self.transfer_step(params, jb)
            g = np.asarray(g)
            pose_s = render_pose_maps(jb["pose_rcv"], cfg.img_H, cfg.img_W,
                                      cfg.keypoint_num, radius=4,
                                      normalized=False)
            _save_batch_pngs(dirs, {
                "x": (np.asarray(batch["x"]) + 1) * 127.5,
                "x_target": (np.asarray(batch["x_target"]) + 1) * 127.5,
                "G": g,
                "pose": pose_to_gray(np.asarray(pose_s)),
                "pose_target": pose_to_gray(np.asarray(pose_t)),
                "mask": np.asarray(batch["mask_r4"]) * 255.0,
                "mask_target": np.asarray(batch["mask_r4_target"]) * 255.0,
            }, i * cfg.batch_size)
            ssims.extend(ssim_images(
                g, (np.asarray(batch["x_target"]) + 1) * 127.5))
        print(f"[*] transfer SSIM vs x_target: {np.mean(ssims):.4f} "
              f"over {len(ssims)} images")
        return out_root


class InterpolationTester(_TesterBase):
    """Factor interpolation (the capability behind the reference's
    interpolate_fg/bg/pose flags, config.py:70-77 — captured at
    trainer.py:96-103 but never wired there; implemented here properly
    with utils.py:91-97 slerp in embedding space).

    Interpolates the toggled factor between sample 0 and sample 1 of a
    batch over `n_steps`, holding the other factors at sample 0's values,
    and writes one image row per interpolation step.
    """

    REQUIRED = {"Encoder", "ID_AE", "PoseAE"}

    @functools.partial(jax.jit, static_argnums=0)
    def _embed(self, params, batch):
        cfg = self.cfg
        embs = self._encode_app(params, batch)
        rcv_norm = pose_rcv_normalize(batch["pose_rcv"], cfg.img_H, cfg.img_W)
        from .stage1_pose import Stage1PoseApp
        pose_ae = Stage1PoseApp(cfg)
        pose_z = pose_ae.encoder.apply(
            {"params": params["PoseAE"]["G_Pose_Encoder"]},
            rcv_norm.reshape(rcv_norm.shape[0], -1))
        return embs, pose_z

    @functools.partial(jax.jit, static_argnums=0)
    def _decode(self, params, embs, pose_z):
        cfg = self.cfg
        from .stage1_pose import Stage1PoseApp
        pose_ae = Stage1PoseApp(cfg)
        rcv, _ = pose_ae.decode_pose({"PoseAE": params["PoseAE"]},
                                     pose_z)
        pose_maps = render_pose_maps(rcv, cfg.img_H, cfg.img_W,
                                     cfg.keypoint_num, radius=4,
                                     normalized=True)
        g_raw = self._generate(params, embs, pose_maps)
        return jnp.clip((g_raw + 1) * 127.5, 0, 255)

    def run(self, loader: Iterator, n_steps: int = 8,
            use_slerp: bool = True) -> str:
        from ..ops.image import slerp as _slerp
        cfg = self.cfg
        fg_dim = cfg.roi_part_num * cfg.roi_z_num
        batch = next(loader)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        embs, pose_z = self._embed(self.params, jb)
        embs = np.asarray(embs)
        pose_z = np.asarray(pose_z)

        lerp = (lambda t, a, b: _slerp(t, a, b)) if use_slerp else (
            lambda t, a, b: (1 - t) * a + t * b)
        rows = []
        for i in range(n_steps):
            t = i / max(n_steps - 1, 1)
            e = embs[0].copy()
            pz = pose_z[0].copy()
            if cfg.interpolate_fg or cfg.interpolate_fg_up \
                    or cfg.interpolate_fg_down:
                e[:fg_dim] = lerp(t, embs[0, :fg_dim], embs[1, :fg_dim])
            if cfg.interpolate_bg:
                e[fg_dim:] = lerp(t, embs[0, fg_dim:], embs[1, fg_dim:])
            if cfg.interpolate_pose:
                pz = lerp(t, pose_z[0], pose_z[1])
            rows.append((e, pz))
        e_all = jnp.asarray(np.stack([r[0] for r in rows]))
        pz_all = jnp.asarray(np.stack([r[1] for r in rows]))
        imgs = np.asarray(self._decode(self.params, e_all, pz_all))

        out_root = os.path.join(cfg.model_dir, "test_result_interpolate")
        os.makedirs(out_root, exist_ok=True)
        save_image(imgs, os.path.join(out_root, "interpolation.png"),
                   nrow=n_steps)
        return out_root
