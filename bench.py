"""Headline benchmark: virtual-person GENERATION throughput — the north
star metric (BASELINE.md: >= 5,000 generated 128x64 images/sec/chip).

Measures the model-11 sampling path (Gaussian mappers -> pose rasterizer
-> U-net generator -> uint8 images) on one chip, using the int8
post-training-quantized generator (models/quant.py; measured 2.3% mean
relative error / 0.9996 correlation vs the bf16 path — calibration runs
outside the timed region). The pose rasterizer runs INSIDE the timed
loop (a fresh render per iteration, as the model-11 server does).
`python bench.py B N bf16` measures the bf16 path instead.

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

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dtype = sys.argv[3] if len(sys.argv) > 3 else "int8"
    mode = sys.argv[4] if len(sys.argv) > 4 else "gen"
    if mode == "transfer":
        bench_transfer(batch_size, n_iters, dtype)
        return

    if mode == "df":
        # DeepFashion 256x256 generation (model 1002 shape: repeat-1
        # generator at 256, trainer_256.py:597-614); ~12.3x the 128x64
        # FLOPs per image.
        h, w, metric = 256, 256, f"virtual_person_generation_256x256_{dtype}"
        baseline = BASELINE_IMGS_PER_SEC / 12.3  # FLOP-scaled north star
    else:
        h, w, metric = 128, 64, f"virtual_person_generation_128x64_{dtype}"
        baseline = BASELINE_IMGS_PER_SEC
    cfg = Config(img_H=h, img_W=w, batch_size=batch_size,
                 compute_dtype="bfloat16", model_dir="/tmp/bench")
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    gen_params = state.g_params["ID_AE"]
    gen_repeat = cfg.repeat_num - 1 if h >= 256 else cfg.repeat_num
    # total embedding width the generator stem was built for
    emb_dim = gen_params["stem_kernel"].shape[2] - cfg.keypoint_num

    if mode == "df":  # model 1002: ONE app mapper (tester.py:917-1161)
        fg_dim, bg_dim = emb_dim, 0
    else:
        fg_dim = cfg.roi_part_num * cfg.roi_z_num
        bg_dim = emb_dim - fg_dim
    mapper_fg = GaussianMapper(out_dim=fg_dim, hidden_num=512)
    mapper_bg = GaussianMapper(out_dim=max(bg_dim, 1), hidden_num=256)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    mf = jax.jit(mapper_fg.init)(k1, jnp.zeros((2, fg_dim)))["params"]
    mb = jax.jit(mapper_bg.init)(k2, jnp.zeros((2, max(bg_dim, 1))))["params"]

    b = synthetic_batch(np.random.default_rng(0), batch_size, cfg.img_H,
                        cfg.img_W)
    pose_rcv = jnp.asarray(b["pose_rcv"])

    quant_tables = None
    chained = True
    if dtype == "int8":
        from dpig_tpu.models import quant as quant_mod
        # Calibration runs a full-precision forward with abs-max stat
        # collection; its scales are batch-size independent, so cap the
        # calibration batch — at 256x256 the f32 stats graph OOMs HBM at
        # the full benchmark batch.
        cb = min(batch_size, 64)
        pose0 = render_pose_maps(pose_rcv[:cb], cfg.img_H, cfg.img_W,
                                 cfg.keypoint_num, radius=4, normalized=False)
        embs0 = jax.random.normal(jax.random.PRNGKey(9),
                                  (cb, emb_dim)) * 0.2
        # optional 5th arg: calibration granularity/scheme ('channel'
        # folds per-input-channel scales into the weights — same chained
        # graph, measures whether the fold is throughput-neutral), or a
        # routing A/B mode: 'legacy' runs the legacy per-layer-quant
        # graph (bf16 inter-layer tensors) instead of the s8-chained one.
        # default matches the shipping default (--int8_calibration=channel:
        # per-input-channel absmax folded into the weights — graph-identical
        # to per-tensor, measured throughput-neutral 4512 vs 4456 img/s,
        # and the measured quality winner at training depth)
        # 'island_tail' / 'legacy_tail' run the decoder-tail bf16 fallback
        # (dec/Conv_{last-1}, dec/Conv_{last}, to_rgb — the quality-sweep
        # configuration) through each routing, measuring the island mode's
        # claimed chained-throughput retention vs the legacy tax.
        calib = sys.argv[5] if len(sys.argv) > 5 else "channel"
        assert calib in ("absmax", "entropy", "channel", "legacy",
                         "island_tail", "legacy_tail"), \
            f"unknown calibration scheme {calib!r}"
        last = 3 * gen_repeat - 2
        tail = frozenset([f"dec/Conv_{last - 1}", f"dec/Conv_{last}",
                          "to_rgb"])
        q = quant_mod.QuantizedGenerator(
            gen_params, gen_repeat, cfg.conv_hidden_num,
            calib_granularity="channel" if calib == "channel" else "tensor",
            calib_method=calib if calib in ("absmax", "entropy") else "absmax",
            bf16_layers=tail if calib.endswith("_tail") else frozenset())
        q.calibrate([embs0], [pose0])
        quant_tables = q.quant
        chained = calib not in ("legacy", "legacy_tail")

    # NOTE: params/quant tables are jit ARGUMENTS, not closure constants —
    # constant-embedded weights exceed remote-compile payload limits.
    @jax.jit
    def gen_chain(gen_params, quant_tables, mf, mb, pose_rcv, rng, n):
        def body(i, carry):
            # chain through ONE pixel of the previous uint8 images so the
            # lazy backend cannot elide or reorder iterations, without a
            # full-tensor feedback pass
            feedback = carry[0, 0, 0, 0].astype(jnp.int32)
            r = jax.random.fold_in(rng, i + feedback)
            rf, rb = jax.random.split(r)
            # pose rasterization is part of the serving path (model 11
            # renders the batch's pose coordinates every step), so it runs
            # INSIDE the timed loop; the sub-pixel jitter depends on the
            # previous iteration's output so loop-invariant code motion
            # cannot hoist it (CLAUDE.md pitfall).
            jitter = (feedback.astype(jnp.float32) % 2.0) * 1e-3
            rcv = pose_rcv.at[..., :2].add(jitter)  # coords only, not vis
            pose = render_pose_maps(rcv, cfg.img_H, cfg.img_W,
                                    cfg.keypoint_num, radius=4,
                                    normalized=False)
            fg = mapper_fg.apply({"params": mf},
                                 sample_mapper_noise(rf, batch_size, fg_dim))
            if bg_dim:
                bg = mapper_bg.apply(
                    {"params": mb},
                    sample_mapper_noise(rb, batch_size, bg_dim))
                embs = jnp.concatenate([fg, bg], -1)
            else:
                embs = fg
            from dpig_tpu.models import quant as quant_mod
            if quant_tables is not None:
                g_raw, _ = quant_mod.uae_forward(
                    gen_params, embs, pose, gen_repeat,
                    cfg.conv_hidden_num, quant=quant_tables,
                    chained=chained)
            else:
                g_raw, _ = quant_mod.uae_forward_bf16(
                    gen_params, embs, pose, gen_repeat,
                    cfg.conv_hidden_num)
            return jnp.clip((g_raw.astype(jnp.float32) + 1.0) * 127.5,
                            0.0, 255.0).astype(jnp.uint8)

        return jax.lax.fori_loop(0, n, body,
                                 jnp.zeros((batch_size, cfg.img_H,
                                            cfg.img_W, 3), jnp.uint8))

    args = (gen_params, quant_tables, mf, mb, pose_rcv,
            jax.random.PRNGKey(2))
    _ = np.asarray(gen_chain(*args, 1)[0, 0, 0])  # compile + force
    # MEDIAN of 3 timed windows: each window is a self-contained chained
    # fori_loop of n_iters full serving steps (nothing elidable). The
    # measured run-to-run spread on this remote-tunnel host is +-3%
    # (docs/BENCH_NOTES.md), far above the device's own variance; the
    # median makes the driver's round-over-round record stable, and the
    # three raw window rates ride along in the JSON tail.
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = gen_chain(*args, n_iters)
        _ = np.asarray(out[0, 0, 0])
        rates.append(n_iters * batch_size / (time.perf_counter() - t0))

    imgs_per_sec = float(np.median(rates))
    print(json.dumps({
        "metric": metric,
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
        "runs": [round(r, 1) for r in rates],
    }))


def bench_transfer(batch_size: int, n_iters: int, dtype: str) -> None:
    """Pose-transfer path (model 12, tester.py:616-767): int8 encoder
    (models/quant.py roi_fgbg_forward) + int8 generator, chained."""
    import jax
    import jax.numpy as jnp

    from dpig_tpu.apps.common import select_parts
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import synthetic_batch
    from dpig_tpu.models import quant as quant_mod
    from dpig_tpu.ops.pose import render_pose_maps

    cfg = Config(img_H=128, img_W=64, batch_size=batch_size,
                 compute_dtype="bfloat16", model_dir="/tmp/bench")
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    enc_params = state.g_params["Encoder"]
    gen_params = state.g_params["ID_AE"]

    b = synthetic_batch(np.random.default_rng(0), batch_size, cfg.img_H,
                        cfg.img_W)
    x = jnp.asarray(b["x"])
    mask = jnp.asarray(b["mask_r6"])
    bbox, vis = select_parts(jnp.asarray(b["part_bbox"]),
                             jnp.asarray(b["part_vis"]), cfg.roi_part_num)
    pose_t = render_pose_maps(jnp.asarray(b["pose_rcv_target"]), cfg.img_H,
                              cfg.img_W, cfg.keypoint_num, radius=4,
                              normalized=False)

    enc_quant = gen_quant = None
    if dtype == "int8":
        qe = quant_mod.QuantizedEncoder(enc_params, cfg.repeat_num,
                                        cfg.conv_hidden_num)
        qe.calibrate([(x, mask, bbox, vis)])
        enc_quant = qe.quant
        embs0 = quant_mod.roi_fgbg_forward(
            enc_params, x, mask, bbox, vis, cfg.repeat_num,
            cfg.conv_hidden_num)
        qg = quant_mod.QuantizedGenerator(gen_params, cfg.repeat_num,
                                          cfg.conv_hidden_num)
        qg.calibrate([embs0], [pose_t])
        gen_quant = qg.quant

    @jax.jit
    def transfer_chain(enc_params, gen_params, enc_quant, gen_quant,
                       x0, mask, bbox, vis, pose_t, n):
        def body(i, x):
            if enc_quant is not None:
                embs = quant_mod.roi_fgbg_forward(
                    enc_params, x, mask, bbox, vis, cfg.repeat_num,
                    cfg.conv_hidden_num, quant=enc_quant)
                g_raw, _ = quant_mod.uae_forward(
                    gen_params, embs, pose_t, cfg.repeat_num,
                    cfg.conv_hidden_num, quant=gen_quant)
            else:
                embs = app._encode(enc_params, x, mask, bbox, vis)
                g_raw, _ = quant_mod.uae_forward_bf16(
                    gen_params, embs, pose_t, cfg.repeat_num,
                    cfg.conv_hidden_num)
            # feed the generated image back as the next source
            return jnp.clip(g_raw.astype(jnp.float32), -1.0, 1.0)

        out = jax.lax.fori_loop(0, n, body, x0)
        return jnp.clip((out + 1.0) * 127.5, 0.0, 255.0).astype(jnp.uint8)

    args = (enc_params, gen_params, enc_quant, gen_quant, x, mask, bbox,
            vis, pose_t)
    _ = np.asarray(transfer_chain(*args, 1)[0, 0, 0])
    t0 = time.perf_counter()
    out = transfer_chain(*args, n_iters)
    _ = np.asarray(out[0, 0, 0])
    dt = time.perf_counter() - t0

    imgs_per_sec = n_iters * batch_size / dt
    print(json.dumps({
        "metric": f"pose_transfer_128x64_{dtype}",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    # The remote TPU backend occasionally has transient outages
    # ("UNAVAILABLE: TPU backend setup/compile error"); retry a couple of
    # times before giving up so a blip doesn't zero the benchmark.
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            transient = any(s in str(e) for s in
                            ("UNAVAILABLE", "DEADLINE_EXCEEDED",
                             "backend setup/compile error"))
            if attempt == 2 or not transient:
                raise
            print(f"[bench] transient backend error (attempt {attempt + 1}),"
                  f" retrying in 120s: {str(e)[:200]}", file=sys.stderr)
            time.sleep(120)
