"""int8 PTQ quality gate at deeper checkpoints (VERDICT r2 item 5).

  python scripts/int8_quality.py train <steps> [model_dir] [--size=256]
      [--lr=...] [--pool=N]
  python scripts/int8_quality.py check <model_dir> [--per_layer]
      [--percentile=99.9] [--method=entropy|channel] [--transfer]
      [--fallback=dec/Conv_13,to_rgb] [--size=256]
  python scripts/int8_quality.py sweep <model_dir> [--size=256]
  python scripts/int8_quality.py gate <model_dir>    # CI/deploy gate:
      [--max_delta=0.002] [--min_ssim=0.9] [--size=256] [--transfer]

`--transfer` gates the model-12 conditional-transfer pipeline instead of
the sampling one: the int8 side runs QuantizedEncoder (stem + both ROI
towers int8) feeding the chained-int8 generator — the tester's
--inference_dtype=int8 wiring — against the all-float pipeline, and
additionally reports the int8 encoder's embedding rel-error. 128x64
FgBg family only (no int8 encoder exists at 256 by design).

`train` runs Stage-I (Market 128x64 bs64, or with --size=256 the
DeepFashion model-101 shape: 256x256, RoiEncoder repeat+1, generator
repeat-1, bs16; synthetic data, fixed seed) to <steps> on the TPU and
checkpoints. `check` loads the newest checkpoint and compares float vs
chained-int8 generation on held-out synthetic batches:

  * SSIM(int8, float)            — direct PTQ fidelity
  * SSIM-to-target delta         — the protocol metric's sensitivity
                                   (score.py grayscale SSIM vs x_target)

--per_layer additionally ranks layers by their contribution to the int8
error (leave-one-layer-out in bf16), the input for a selective-bf16
fallback if drift ever exceeds the gate.
"""
from __future__ import annotations

import os
import sys

import numpy as np

# DF-shape (model 101) overrides for --size=256: generator at
# repeat_num-1, RoiEncoder at repeat_num+1 (Stage1App handles both from
# img_H); bs16 keeps the full G+D train step inside HBM without remat,
# and the quality batches at bs32 keep the f32 stats graph under the
# calibration OOM ceiling (bench.py caps calibration at 64 for the same
# reason).
DF256 = dict(img_H=256, img_W=256, batch_size=16)


def _gen_repeat(cfg) -> int:
    """Generator tower depth: repeat_num-1 at 256 (trainer_256.py:597)."""
    return cfg.repeat_num - 1 if cfg.img_H >= 256 else cfg.repeat_num


def train(steps: int, model_dir: str, pool_size: int = 64,
          cfg_overrides: dict = None) -> None:
    """Raw train loop for the gate: a device-resident pool of synthetic
    batches cycled round-robin, metrics forced only every 200 steps — the
    harness's per-step host roundtrips cap the lazy remote backend at
    ~88 img/s where the step itself runs at ~226 (train_bench)."""
    import time
    import jax
    import jax.numpy as jnp
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import SyntheticLoader
    from dpig_tpu.train import checkpoint as ckpt

    base = dict(img_H=128, img_W=64, batch_size=64,
                compute_dtype="bfloat16", model_dir=model_dir,
                max_step=steps,
                fast_gan_step=True)  # ~18% faster; gate only needs depth
    base.update(cfg_overrides or {})
    cfg = Config(**base)
    print(f"[*] train config: {cfg.img_H}x{cfg.img_W} bs{cfg.batch_size} "
          f"g_lr={cfg.g_lr} pool={pool_size}", flush=True)
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    # resume from the newest checkpoint if one exists — long gate runs
    # (20k steps ≈ 70 min on chip) must survive TPU outages / VM restarts
    start = 0
    path = ckpt.latest_checkpoint(model_dir)
    if path is not None:
        state = ckpt.restore_into_state(path, state)
        start = int(path.rsplit("_", 1)[-1])
        print(f"[*] resuming from {path} (step {start})", flush=True)
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=123)
    pool = [{k: jnp.asarray(v) for k, v in next(loader).items()}
            for _ in range(pool_size)]
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(start, steps):
        state, m = app.train_step(state, pool[i % pool_size],
                                  jax.random.fold_in(rng, i))
        if i % 200 == 199 or i == steps - 1:
            g = float(m["g_loss"])
            assert np.isfinite(g), (i, m)
            rate = ((i + 1 - start) * cfg.batch_size
                    / (time.perf_counter() - t0))
            print(f"[{i}] g_loss={g:.4f} "
                  f"L1={float(m['L1Loss']):.4f} "
                  f"d={float(m['d_loss']):.4f} {rate:.0f} img/s",
                  flush=True)
        if (i + 1) % 4000 == 0 and i + 1 < steps:
            ckpt.save_checkpoint(model_dir, i + 1, state)
            print(f"[*] periodic checkpoint at step {i + 1}", flush=True)
    if start >= steps:
        # the resumed checkpoint is already at/past the target: saving a
        # step_{steps} file here would MISLABEL later-step weights
        print(f"[*] nothing to do: resumed step {start} >= target {steps}")
        return
    ckpt.save_checkpoint(model_dir, steps, state)
    print(f"[*] saved step-{steps} checkpoint under {model_dir}")


def _gate_context(model_dir: str, n_batches: int,
                  cfg_overrides: dict = None) -> dict:
    """Shared setup for check()/sweep(): checkpoint restore, held-out
    batches, encoded embeddings, and the jitted forwards — built ONCE so
    a 5-scheme sweep doesn't recompile the identical float forward five
    times on the remote-compile backend."""
    import jax
    import jax.numpy as jnp
    from dpig_tpu.apps.common import pose_maps_from_batch, select_parts
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import SyntheticLoader
    from dpig_tpu.models import quant as quant_mod
    from dpig_tpu.train import checkpoint as ckpt

    # the gate config; cfg_overrides shrinks it for CPU smoke tests or
    # switches to the DF-256 shape (DF256). At 256 the quality batches
    # run at bs32: calibration's f32 stats graph OOMs HBM above ~64.
    base = dict(img_H=128, img_W=64, batch_size=64,
                compute_dtype="bfloat16", model_dir=model_dir)
    base.update(cfg_overrides or {})
    if base["img_H"] >= 256:
        base["batch_size"] = min(base["batch_size"], 32)
    cfg = Config(**base)
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    path = ckpt.latest_checkpoint(model_dir)
    assert path is not None, f"no checkpoint under {model_dir}"
    state = ckpt.restore_into_state(path, state)
    gen_params = state.g_params["ID_AE"]
    enc_params = state.g_params["Encoder"]
    print(f"[*] checking {path}")

    # held-out batches (different seed than training's 123)
    loader = SyntheticLoader(cfg.batch_size, cfg.img_H, cfg.img_W, seed=999)
    batches = [next(loader) for _ in range(n_batches)]

    def embs_pose(b):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        bbox, vis = select_parts(jb["part_bbox"], jb["part_vis"],
                                 cfg.roi_part_num)
        embs = app._encode(enc_params, jb["x"], jb["mask_r6"], bbox, vis)
        pose = pose_maps_from_batch(jb, cfg)
        return embs, pose, jb

    def enc_inputs(b):
        """(x, fg_mask, bbox, vis) — the QuantizedEncoder batch tuple."""
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        bbox, vis = select_parts(jb["part_bbox"], jb["part_vis"],
                                 cfg.roi_part_num)
        return jb["x"], jb["mask_r6"], bbox, vis

    rep = _gen_repeat(cfg)
    fwds = {
        True: jax.jit(lambda p, e, po, q: quant_mod.uae_forward(
            p, e, po, rep, cfg.conv_hidden_num, quant=q,
            chained=True)[0]),
        False: jax.jit(lambda p, e, po, q: quant_mod.uae_forward(
            p, e, po, rep, cfg.conv_hidden_num, quant=q,
            chained=False)[0]),
    }
    fwd_f = jax.jit(lambda p, e, po: quant_mod.uae_forward(
        p, e, po, rep, cfg.conv_hidden_num)[0])
    return dict(cfg=cfg, gen_params=gen_params, enc_params=enc_params,
                batches=batches, embs_pose=embs_pose,
                enc_inputs=enc_inputs, fwds=fwds, fwd_f=fwd_f)


def check(model_dir: str, per_layer: bool = False, n_batches: int = 4,
          percentile=None, fallback: str = "", method: str = "channel",
          fallback_mode: str = "island", transfer: bool = False,
          cfg_overrides: dict = None, ctx: dict = None) -> dict:
    import jax
    from dpig_tpu.models import quant as quant_mod

    if transfer:
        # checked BEFORE the checkpoint restore so a 256 config fails on
        # the real reason, not on a shape mismatch inside the restore
        h = ctx["cfg"].img_H if ctx else (cfg_overrides or {}).get(
            "img_H", 128)
        assert h < 256, \
            "--transfer gates the FgBg int8 encoder; no int8 encoder " \
            "exists at 256 (it runs bf16 — testers._inference_params)"
    ctx = ctx or _gate_context(model_dir, n_batches, cfg_overrides)
    cfg, gen_params = ctx["cfg"], ctx["gen_params"]
    batches, embs_pose, fwd_f = ctx["batches"], ctx["embs_pose"], ctx["fwd_f"]

    enc_q = None
    if transfer:
        # model-12 conditional-transfer semantics: the int8 side runs the
        # FULL pipeline quantized — QuantizedEncoder (stem + both ROI
        # towers int8) feeding the chained-int8 generator, exactly the
        # tester's --inference_dtype=int8 wiring (testers.py
        # _inference_params). Only the 128x64 FgBg family has an int8
        # encoder (the 256 path's encoder runs bf16 by design).
        granularity = "channel" if method == "channel" else "tensor"
        qe = quant_mod.QuantizedEncoder(
            ctx["enc_params"], cfg.repeat_num, cfg.conv_hidden_num,
            part_num=cfg.roi_part_num, calib_granularity=granularity)
        qe.calibrate([ctx["enc_inputs"](batches[0])])
        enc_fwd = jax.jit(lambda p, x, m, bb, vv, qt:
                          quant_mod.roi_fgbg_forward(
                              p, x, m, bb, vv, cfg.repeat_num,
                              cfg.conv_hidden_num,
                              part_num=cfg.roi_part_num, quant=qt))
        enc_q = lambda b: enc_fwd(ctx["enc_params"], *ctx["enc_inputs"](b),
                                  qe.quant)  # noqa: E731

    bf16_layers = frozenset(n for n in fallback.split(",") if n)
    if bf16_layers:
        print(f"[*] selective bf16 fallback: {sorted(bf16_layers)} "
              f"({'exact-bf16 islands in the chained graph' if fallback_mode == 'island' else 'legacy per-layer-quant routing'})")
    fwd = ctx["fwds"][not bf16_layers or fallback_mode == "island"]

    e0, p0, _ = embs_pose(batches[0])
    if enc_q is not None:
        # serving-parity calibration: the generator's activation stats
        # come from the int8 encoder's embeddings, as they do at runtime
        e0 = enc_q(batches[0])
    if method != "absmax":
        print(f"[*] calibration method: {method}")
    granularity = "tensor"
    if method == "channel":
        method, granularity = "absmax", "channel"
    q = quant_mod.QuantizedGenerator(gen_params, _gen_repeat(cfg),
                                     cfg.conv_hidden_num,
                                     calib_percentile=percentile,
                                     bf16_layers=bf16_layers,
                                     calib_method=method,
                                     calib_granularity=granularity)
    q.calibrate([e0], [p0])

    from dpig_tpu.eval.metrics import ssim_images
    ssim_if, d_float, d_int8, emb_err = [], [], [], []
    for b in batches[1:]:
        e, po, jb = embs_pose(b)
        eq = e
        if enc_q is not None:
            eq = enc_q(b)
            ef, eqn = np.asarray(e), np.asarray(eq)
            emb_err.append(np.abs(eqn - ef).mean()
                           / max(np.abs(ef).mean(), 1e-12))
        gf = np.asarray(fwd_f(gen_params, e, po))
        gq = np.asarray(fwd(gen_params, eq, po, q.quant))
        to255 = lambda a: np.clip((a + 1) * 127.5, 0, 255)  # noqa: E731
        x255 = to255(np.asarray(jb["x"]))
        ssim_if.append(ssim_images(to255(gq), to255(gf)).mean())
        d_float.append(ssim_images(to255(gf), x255).mean())
        d_int8.append(ssim_images(to255(gq), x255).mean())
    out = {"ssim_int8_float": float(np.mean(ssim_if)),
           "ssim_to_target_float": float(np.mean(d_float)),
           "ssim_to_target_int8": float(np.mean(d_int8)),
           "delta": float(np.mean(d_int8) - np.mean(d_float))}
    if emb_err:
        out["emb_rel_err"] = float(np.mean(emb_err))
        print(f"[transfer] int8-encoder embedding rel.err = "
              f"{out['emb_rel_err']:.4f}")
    print(f"SSIM(int8,float)      = {out['ssim_int8_float']:.4f}")
    print(f"SSIM-to-target float  = {out['ssim_to_target_float']:.4f}")
    print(f"SSIM-to-target int8   = {out['ssim_to_target_int8']:.4f}")
    print(f"SSIM-to-target delta  = {out['delta']:+.4f}")

    if per_layer:
        # leave-one-layer-out: run the LEGACY (unchained) quant path with
        # one conv dropped from the int8 weight set (falls back to bf16)
        # and rank the recovery — the candidates for selective fallback.
        e, po, jb = embs_pose(batches[1])
        gf = np.asarray(fwd_f(gen_params, e, po))
        base = None
        rows = []
        names = sorted(q.quant["weights"])
        for drop in [None] + names:
            qq = {"weights": {k: v for k, v in q.quant["weights"].items()
                              if k != drop},
                  "act_scales": q.quant["act_scales"]}
            if "act_folded" in q.quant:  # keep folded-dequant semantics
                qq["act_folded"] = q.quant["act_folded"]
            # one shared jitted fn: jax caches per quant-dict STRUCTURE,
            # so consecutive drops reuse the trace machinery instead of
            # compiling a fresh lambda per layer
            g = np.asarray(ctx["fwds"][False](gen_params, e, po, qq))
            err = float(np.abs(g - gf).mean())
            if drop is None:
                base = err
                print(f"  all-int8 (unchained) mean|err| = {err:.5f}")
            else:
                rows.append((base - err, drop))
        rows.sort(reverse=True)
        print("  top error contributors (bf16-fallback recovery):")
        for rec, name in rows[:6]:
            print(f"    {name:16s} {rec:+.5f}")
    return out


def sweep(model_dir: str, n_batches: int = 4,
          cfg_overrides: dict = None) -> dict:
    """One-command quality table over every calibration scheme plus the
    decoder-tail bf16 fallback, for the newest checkpoint in model_dir."""
    from dpig_tpu.config import Config
    repeat = _gen_repeat(Config(**(cfg_overrides or {})))
    last = 3 * repeat - 2  # final decoder res-pair Conv_{last-1},Conv_{last}
    configs = [
        ("absmax", {"method": "absmax"}),
        ("percentile 99.9", {"percentile": 99.9, "method": "percentile"}),
        ("per-channel (default)", {"method": "channel"}),
        ("tail-fallback (legacy)",
         {"fallback": f"dec/Conv_{last - 1},dec/Conv_{last},to_rgb",
          "method": "absmax", "fallback_mode": "legacy"}),
        ("tail-fallback (island)",
         {"fallback": f"dec/Conv_{last - 1},dec/Conv_{last},to_rgb",
          "method": "absmax", "fallback_mode": "island"}),
        # entropy LAST: its histogram pass once kernel-faulted the TPU
        # worker (fixed in quant.py r4, but a crash here must not cost
        # the other rows)
        ("entropy", {"method": "entropy"}),
    ]
    ctx = _gate_context(model_dir, n_batches, cfg_overrides)
    rows = []
    for label, kw in configs:
        print(f"\n=== {label}")
        try:
            rows.append((label, check(model_dir, n_batches=n_batches,
                                      cfg_overrides=cfg_overrides, ctx=ctx,
                                      **kw)))
        except Exception as e:  # noqa: BLE001 — one scheme must not
            print(f"[!] {label} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")  # kill the rest of the sweep
    print(f"\n{'scheme':24s} {'SSIM(int8,float)':>17s} {'to-target Δ':>12s}")
    for label, r in rows:
        print(f"{label:24s} {r['ssim_int8_float']:17.4f} "
              f"{r['delta']:+12.4f}")
    return dict(rows)


def gate(model_dir: str, max_delta: float = 0.002, min_ssim: float = 0.9,
         transfer: bool = False, cfg_overrides: dict = None) -> bool:
    """Deploy/CI regression gate for the shipping int8 defaults
    (per-channel folded calibration, chained graph). Passes iff the
    protocol metric (SSIM-to-target delta vs float, score.py semantics)
    stays within max_delta AND direct int8-vs-float fidelity stays
    above min_ssim. Thresholds leave >4x margin over the measured
    defaults at the adversarial 20k-step checkpoint (delta +0.0000,
    SSIM 0.9865 — README calibration table)."""
    r = check(model_dir, transfer=transfer, cfg_overrides=cfg_overrides)
    ok = abs(r["delta"]) <= max_delta and r["ssim_int8_float"] >= min_ssim
    print(f"[{'PASS' if ok else 'FAIL'}] |delta|={abs(r['delta']):.4f} "
          f"(max {max_delta}) SSIM(int8,float)={r['ssim_int8_float']:.4f} "
          f"(min {min_ssim})")
    if not ok:
        print("    remedy order: 1) rank layers with `check --per_layer`;"
              " 2) --int8_fallback_layers=<top names> (island mode keeps"
              " chained throughput); 3) --inference_dtype=bf16")
    return ok


if __name__ == "__main__":
    # --size=256 switches every subcommand to the DF-256 (model 101)
    # shape; the train/check configs otherwise match the Market gate.
    overrides = dict(DF256) if "--size=256" in sys.argv else {}
    if sys.argv[1] == "train":
        pool = 64
        for a in sys.argv[3:]:
            if a.startswith("--lr="):
                lr = float(a.split("=")[1])
                overrides["g_lr"] = lr
                overrides["d_lr"] = lr
            if a.startswith("--pool="):
                pool = int(a.split("=")[1])
            if a.startswith("--batch_size="):
                overrides["batch_size"] = int(a.split("=")[1])
        train(int(sys.argv[2]),
              sys.argv[3] if len(sys.argv) > 3
              and not sys.argv[3].startswith("--") else "/tmp/q20k",
              pool_size=pool, cfg_overrides=overrides)
    elif sys.argv[1] == "sweep":
        sweep(sys.argv[2], cfg_overrides=overrides)
    elif sys.argv[1] == "gate":
        kw = {"transfer": "--transfer" in sys.argv}
        for a in sys.argv[3:]:
            if a.startswith("--max_delta="):
                kw["max_delta"] = float(a.split("=")[1])
            if a.startswith("--min_ssim="):
                kw["min_ssim"] = float(a.split("=")[1])
        sys.exit(0 if gate(sys.argv[2], cfg_overrides=overrides, **kw)
                 else 1)
    else:
        pct = None
        fb = ""
        method = "channel"   # shipping default (--int8_calibration)
        fb_mode = "island"   # shipping default (--int8_fallback_mode)
        for a in sys.argv[3:]:
            if a.startswith("--percentile="):
                pct = float(a.split("=")[1])
            if a.startswith("--fallback="):
                fb = a.split("=", 1)[1]
            if a.startswith("--method="):
                method = a.split("=", 1)[1]
            if a.startswith("--fallback_mode="):
                fb_mode = a.split("=", 1)[1]
        check(sys.argv[2], per_layer="--per_layer" in sys.argv,
              percentile=pct, fallback=fb, method=method,
              fallback_mode=fb_mode, transfer="--transfer" in sys.argv,
              cfg_overrides=overrides)
