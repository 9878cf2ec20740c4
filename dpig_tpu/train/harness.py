"""Training harness — the reference's train() loop machinery
(trainer.py:326-366): fixed-batch previews, periodic metrics logging,
LR schedule (inside the optax schedule), periodic checkpoints, resume.

Observability: metrics stream to `<model_dir>/metrics.jsonl` (+ stdout)
and previews to PNG grids with SSIM embedded in the filename
(trainer.py:522-524). No TensorBoard dependency.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np
import jax

from ..config import Config
from ..eval.metrics import ssim_images
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..utils.viz import pose_to_gray, save_image
from . import checkpoint as ckpt


class Trainer:
    """Drives any app bundle exposing init_state/train_step (+ previews)."""

    def __init__(self, cfg: Config, app: Any, loader: Iterator[Dict[str, np.ndarray]],
                 use_mesh: bool = True):
        self.cfg = cfg
        self.app = app
        self.loader = loader
        self.mesh = make_mesh() if use_mesh else None
        os.makedirs(cfg.model_dir, exist_ok=True)
        self._metrics_f = open(os.path.join(cfg.model_dir, "metrics.jsonl"), "a")
        self._tb = self._make_tb_writer(cfg.model_dir)

    @staticmethod
    def _make_tb_writer(model_dir: str):
        """Real TensorBoard events (reference trainer.py:310-319) when TF
        is importable; JSONL remains the primary sink either way."""
        try:
            import tensorflow as tf  # optional dependency
            return tf.summary.create_file_writer(model_dir)
        except Exception:
            return None

    # ------------------------------------------------------------- state
    def init_state(self, rng: jax.Array, frozen_params=None):
        if frozen_params is not None:
            state = self.app.init_state(rng, frozen_params=frozen_params)
        else:
            state = self.app.init_state(rng)
        if self.cfg.ckpt_path:
            state = ckpt.restore_into_state(self.cfg.ckpt_path, state)
        else:
            # Preemption-safe auto-resume: pick up the newest checkpoint in
            # model_dir (the reference requires manual --ckpt_path +
            # --start_step; SURVEY §5.3 lists elastic recovery as absent).
            latest = ckpt.latest_checkpoint(self.cfg.model_dir)
            if latest:
                state = ckpt.restore_into_state(latest, state)
                print(f"[*] auto-resumed from {latest} "
                      f"(step {int(state.step)})", flush=True)
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    # --------------------------------------------------------------- log
    def log_metrics(self, step: int, metrics: Dict[str, Any],
                    hists: Optional[Dict[str, np.ndarray]] = None) -> None:
        """Scalars -> metrics.jsonl + TB scalars; array-valued `hists`
        (embedding distributions, reference trainer.py:956-958) ->
        summary stats in the JSONL + real TB histograms."""
        rec = {"step": step,
               **{k: float(v) for k, v in metrics.items()}}
        for name, arr in (hists or {}).items():
            flat = np.asarray(arr, np.float64).ravel()
            rec[f"{name}_mean"] = float(flat.mean())
            rec[f"{name}_std"] = float(flat.std())
        self._metrics_f.write(json.dumps(rec) + "\n")
        self._metrics_f.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in rec.items():
                    if k != "step":
                        tf.summary.scalar(f"loss/{k}", v, step=step)
                for name, arr in (hists or {}).items():
                    tf.summary.histogram(name, np.asarray(arr), step=step)
            self._tb.flush()
        print(f"[{step}] " + " ".join(f"{k}={v:.4f}" for k, v in rec.items()
                                      if k != "step"), flush=True)

    # ------------------------------------------------------------ loop
    def train(self, rng: Optional[jax.Array] = None, frozen_params=None,
              preview_fn: Optional[Callable] = None):
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.random_seed)
        rng, init_rng = jax.random.split(rng)
        state = self.init_state(init_rng, frozen_params)

        fixed_batch = next(self.loader)
        self._save_fixed_previews(fixed_batch)

        start = int(state.step)
        t_last = time.time()
        last_logged = start - 1  # so the first interval divides by the
        # actual number of steps it covers (a single step at step==0), not
        # by log_step — the reference-style batch*log_step/elapsed formula
        # overstated the first reading by ~log_step x.
        # Stage-II WGAN apps under --critic_batch_mode=fresh declare
        # batches_per_step=1+CRITIC_ITERS: every critic iteration gets its
        # own loader batch (reference queue semantics, trainer.py:821-845).
        n_batches = getattr(self.app, "batches_per_step", 1)
        for step in range(start, cfg.max_step):
            if n_batches > 1:
                batch = tuple(next(self.loader) for _ in range(n_batches))
                if self.mesh is not None:
                    batch = tuple(shard_batch(b, self.mesh) for b in batch)
            else:
                batch = next(self.loader)
                if self.mesh is not None:
                    batch = shard_batch(batch, self.mesh)
            rng, sub = jax.random.split(rng)
            state, metrics = self.app.train_step(state, batch, sub)

            if step == 0 or step % cfg.log_step == cfg.log_step - 1:
                # Force execution BEFORE timing: on lazy/remote backends
                # block_until_ready does not guarantee the queued steps ran
                # (see CLAUDE.md); demanding host floats does.
                vals, hists = {}, {}
                for k, v in metrics.items():
                    if k.startswith("hist/"):
                        hists[k[5:]] = np.asarray(v)
                    else:
                        vals[k] = float(v)
                now = time.time()
                ips = (cfg.batch_size * (step - last_logged)
                       / max(now - t_last, 1e-9))
                t_last = now
                last_logged = step
                self.log_metrics(step, {**vals, "imgs_per_sec": ips},
                                 hists=hists)

            if preview_fn is not None and (
                    step == 0 or step % (cfg.log_step * 3) == cfg.log_step * 3 - 1):
                rng, prng = jax.random.split(rng)
                preview_fn(state, fixed_batch, prng, step)

            if step % (cfg.log_step * 30) == cfg.log_step * 30 - 1:
                ckpt.save_checkpoint(cfg.model_dir, step, state)

        ckpt.save_checkpoint(cfg.model_dir, cfg.max_step, state)
        return state

    # ------------------------------------------------------- previews
    def _save_fixed_previews(self, batch: Dict[str, np.ndarray]) -> None:
        d = self.cfg.model_dir
        from ..ops.pose import render_pose_maps
        x = (np.asarray(batch["x"]) + 1.0) * 127.5
        save_image(x, f"{d}/x_fixed.png")
        if "x_target" in batch:
            save_image((np.asarray(batch["x_target"]) + 1.0) * 127.5,
                       f"{d}/x_target_fixed.png")
        pose = np.asarray(render_pose_maps(
            batch["pose_rcv"], self.cfg.img_H, self.cfg.img_W,
            self.cfg.keypoint_num, radius=4, normalized=False))
        save_image(pose_to_gray(pose), f"{d}/pose_fixed.png")
        if "mask_r6" in batch:
            save_image(np.asarray(batch["mask_r6"]) * 255.0, f"{d}/mask_fixed.png")

    def preview_with_ssim(self, images_0_255: np.ndarray,
                          x_ref: np.ndarray, step: int, tag: str = "G") -> str:
        """Save a preview grid with mean grayscale SSIM vs x in the filename."""
        ssim_mean = float(np.mean(ssim_images(
            images_0_255, (x_ref + 1.0) * 127.5)))
        path = os.path.join(self.cfg.model_dir,
                            f"{step}_{tag}_ssim{ssim_mean:.4f}.png")
        save_image(images_0_255, path)
        print(f"[*] Samples saved: {path}", flush=True)
        return path
