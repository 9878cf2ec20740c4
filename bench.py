"""Headline benchmark: generated 128x64 images/sec/chip on the Stage-I
Market generator path (encode -> U-net decode), bf16 compute.

North star (BASELINE.md): >= 5,000 img/s/chip on TPU v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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

    from dpig_tpu.apps.common import pose_maps_from_batch, select_parts
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import synthetic_batch

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = Config(img_H=128, img_W=64, batch_size=batch_size,
                 compute_dtype="bfloat16", model_dir="/tmp/bench")
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))

    b = synthetic_batch(np.random.default_rng(0), batch_size, cfg.img_H,
                        cfg.img_W)
    jb = {k: jnp.asarray(v) for k, v in b.items()}

    import functools

    from dpig_tpu.ops.pose import render_pose_maps

    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    # N chained generator applications inside ONE jit: iteration i's output
    # feeds iteration i+1's input, so every iteration is data-dependent and
    # must execute (lazy/remote backends cannot elide any of them), and
    # dispatch overhead is excluded — this measures device throughput.
    @jax.jit  # n is a traced fori_loop bound: one compile serves all n
    def gen_chain(g_params, x, pose_rcv, mask, bbox, vis, n):
        pose = render_pose_maps(pose_rcv, cfg.img_H, cfg.img_W,
                                cfg.keypoint_num, radius=4, normalized=False)

        def body(_, x_in):
            g_raw, _z = app.g_forward(g_params, x_in, pose, mask, bbox, vis)
            return jnp.clip(g_raw, -1.0, 1.0)

        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.clip((out + 1.0) * 127.5, 0.0, 255.0).astype(jnp.uint8)

    bbox, vis = select_parts(jb["part_bbox"], jb["part_vis"], cfg.roi_part_num)
    args = (state.g_params, jb["x"], jb["pose_rcv"], jb["mask_r6"], bbox, vis)

    # Warmup / compile. np.asarray (not block_until_ready) — remote/lazy
    # backends only execute when a result is actually demanded.
    _ = np.asarray(gen_chain(*args, 1)[0, 0, 0])

    t0 = time.perf_counter()
    out = gen_chain(*args, n_iters)
    _ = np.asarray(out[0, 0, 0])  # force full execution on remote backends
    dt = time.perf_counter() - t0

    imgs_per_sec = n_iters * batch_size / dt
    print(json.dumps({
        "metric": "stage1_gen_throughput_128x64",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
