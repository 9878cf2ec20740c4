"""CLI dispatcher (reference main.py:12-90): integer --model selects the
trainer/tester app.

  Market 128x64:  1 Stage-I appearance | 2 pose AE | 3 app samplers
                  | 4 pose sampler | 11 full sampling | 12 pose transfer
                  | 13 per-factor sampling
  DeepFashion 256x256: 101/102/103/104 training | 1001 transfer
                  | 1002 factor sampling

Data: real tfrecords from --data_dir/--dataset, or --synthetic_data=true.
"""
from __future__ import annotations

import numpy as np
import jax

from dpig_tpu.config import Config, get_config
from dpig_tpu.data.synthetic import SyntheticLoader


def make_loader(cfg: Config):
    # Per-host loader: under multi-host each process reads a disjoint
    # shard subset and a per-host slice of the global batch.
    host_id, host_count = jax.process_index(), jax.process_count()
    if cfg.batch_size % host_count:
        raise ValueError(
            f"--batch_size={cfg.batch_size} must be divisible by the "
            f"process count ({host_count}): a truncated per-host batch "
            "would silently shrink the global batch and break sharding")
    local_bs = cfg.batch_size // host_count
    if cfg.synthetic_data:
        return SyntheticLoader(local_bs, cfg.img_H, cfg.img_W,
                               seed=cfg.random_seed + host_id)
    from dpig_tpu.data.loader import TFRecordPairLoader
    return TFRecordPairLoader(
        cfg.data_path, cfg.split if cfg.is_train else "test",
        local_bs, cfg.img_H, cfg.img_W, dataset=cfg.dataset,
        shuffle=cfg.is_train, seed=cfg.random_seed,
        num_workers=cfg.num_worker, worker_mode=cfg.worker_mode,
        host_id=host_id, host_count=host_count)


def train_model(cfg: Config) -> None:
    from dpig_tpu.train.harness import Trainer
    from dpig_tpu.train import checkpoint as ckpt

    model = cfg.model
    loader = make_loader(cfg)
    frozen = None

    if model in (1, 101):
        from dpig_tpu.apps.stage1_app import Stage1App
        app = Stage1App(cfg, fg_bg=model == 1)
        trainer = Trainer(cfg, app, loader)

        def preview(state, batch, rng, step):
            import jax.numpy as jnp
            from dpig_tpu.apps.common import pose_maps_from_batch, select_parts
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            pose = pose_maps_from_batch(jb, cfg)
            bbox, vis = select_parts(jb["part_bbox"], jb["part_vis"],
                                     cfg.roi_part_num)
            imgs = app.generate_step(state.g_params, jb["x"], pose,
                                     jb["mask_r6"], bbox, vis)
            trainer.preview_with_ssim(np.asarray(imgs), batch["x"], step)

        trainer.train(preview_fn=preview)

    elif model in (2, 102):
        from dpig_tpu.apps.stage1_pose import Stage1PoseApp
        app = Stage1PoseApp(cfg)
        Trainer(cfg, app, loader).train()

    elif model in (3, 103):
        if model == 3:
            from dpig_tpu.apps.stage2_app import Stage2AppApp
            app = Stage2AppApp(cfg)
        else:  # DF: single 7*32-d mapper (trainer_256.py:266-403)
            from dpig_tpu.apps.stage2_app_single import Stage2AppSingleApp
            app = Stage2AppSingleApp(cfg)
        if cfg.pretrained_path:
            frozen = ckpt.restore_subtrees(cfg.pretrained_path,
                                           ["Encoder", "ID_AE"])
        trainer = Trainer(cfg, app, loader)

        def preview(state, batch, rng, step):
            import jax.numpy as jnp
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            imgs = app.preview_step(state, jb, rng)
            trainer.preview_with_ssim(np.asarray(imgs), batch["x"], step)

        trainer.train(frozen_params=frozen, preview_fn=preview)

    elif model in (4, 104):
        from dpig_tpu.apps.stage2_pose import Stage2PoseApp
        app = Stage2PoseApp(cfg)
        frozen = {}
        if cfg.pretrained_poseAE_path:
            frozen.update(ckpt.restore_subtrees(cfg.pretrained_poseAE_path,
                                                ["PoseAE"]))
        if cfg.pretrained_path:
            frozen.update(ckpt.restore_subtrees(cfg.pretrained_path,
                                                ["Encoder", "ID_AE"]))
        trainer = Trainer(cfg, app, loader)

        def preview(state, batch, rng, step):
            import jax.numpy as jnp
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            imgs = app.preview_step(state, jb, rng)
            trainer.preview_with_ssim(np.asarray(imgs), batch["x"], step)

        trainer.train(frozen_params=frozen or None, preview_fn=preview)

    else:
        raise ValueError(f"unknown training model {model}")


def test_model(cfg: Config) -> None:
    from dpig_tpu.apps import testers

    model = cfg.model
    if cfg.test_one_by_one:
        from dpig_tpu.apps.demo import run_one_by_one
        run_one_by_one(cfg, cfg.demo_img_dir, cfg.demo_pair_path,
                       cfg.demo_all_peaks_path, cfg.demo_subsets_path)
        return
    loader = make_loader(cfg)
    if cfg.inverse_fg or cfg.inverse_bg or cfg.inverse_pose:
        import jax
        import jax.numpy as jnp
        from dpig_tpu.apps.inversion import InversionTool
        tool = InversionTool(cfg)
        batch = next(loader)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        zf, zb, loss = tool.invert(jb, jax.random.PRNGKey(cfg.random_seed),
                                   invert_bg=cfg.inverse_bg)
        import numpy as np
        out = f"{cfg.model_dir}/inverted_z.npz"
        np.savez(out, z_fg=np.asarray(zf), z_bg=np.asarray(zb))
        print(f"[*] inversion loss {float(loss):.6f}; saved {out}")
    elif (cfg.interpolate_fg or cfg.interpolate_fg_up or cfg.interpolate_fg_down
            or cfg.interpolate_bg or cfg.interpolate_pose):
        testers.InterpolationTester(cfg).run(loader)
    elif model in (11,):
        # --sample_pose maps to the reference behavior (tester.py:93-95):
        # True decodes the AE embedding of the real pose ('reconstructed');
        # --pose_source overrides (incl. 'sampled', the paper's sampler).
        pose_source = cfg.pose_source or (
            "reconstructed" if cfg.sample_pose else "real")
        testers.FullSamplingTester(cfg).run(loader, pose_source=pose_source)
    elif model in (12, 1001):
        testers.ConditionalTransferTester(cfg).run(loader)
    elif model in (13, 1002):
        testers.FactorSamplingTester(cfg).run(loader)
    else:
        raise ValueError(f"unknown test model {model}")


def main() -> None:
    cfg = get_config()
    if cfg.platform:
        # Must happen before first device use; the sitecustomize pins
        # jax_platforms to 'axon,cpu' so the env var alone is ignored.
        jax.config.update("jax_platforms", cfg.platform)
    if cfg.num_processes > 1 or cfg.coordinator_address:
        from dpig_tpu.parallel.mesh import init_distributed
        init_distributed(
            coordinator_address=cfg.coordinator_address or None,
            num_processes=cfg.num_processes if cfg.num_processes > 1 else None,
            process_id=cfg.process_id if cfg.process_id >= 0 else None)
    cfg.save()
    print(f"[*] MODEL dir: {cfg.model_dir}")
    if cfg.model in (1, 2, 3, 4, 101, 102, 103, 104):
        train_model(cfg)
    else:
        test_model(cfg)


if __name__ == "__main__":
    main()
