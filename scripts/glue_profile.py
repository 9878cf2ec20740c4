"""Decompose the generation path's NON-CONV time (VERDICT r4 item 3).

Traces the exact bench.py int8 serving chain (channel-calibrated,
rasterizer inside the loop) with jax.profiler on the real chip, parses
the trace's per-HLO 'X' events, and prints (a) every op's per-iteration
wall-clock, bucketed conv / glue / dense / raster / rng-mapper / other,
and (b) the bucket totals — the measured version of docs/ROOFLINE.md's
"remaining ~6%" so each row can be marked mandatory vs attackable.

  python scripts/glue_profile.py [batch] [iters]
  python scripts/glue_profile.py train [batch] [steps] [fast]

The `train` mode applies the same attribution to the Stage-I G+D train
step (the ROOFLINE.md training row: 80% of its conv roofline at bs128
fast — this decomposes the other 20%). Convs split fwd vs bwd by the
autodiff `transpose(` scope in their HLO op_name metadata.

The per-HLO durations in the trace are REAL (CLAUDE.md profiling
workflow) — unlike the compile oracle's estimated_cycles, which is 3-6x
pessimistic on memory ops.
"""
from __future__ import annotations

import glob
import gzip
import json
import sys


def build_chain(batch_size: int):
    """The bench.py model-11 int8 serving chain (shipping defaults)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import synthetic_batch
    from dpig_tpu.models import quant as quant_mod
    from dpig_tpu.models.mappers import GaussianMapper, sample_mapper_noise
    from dpig_tpu.ops.pose import render_pose_maps

    cfg = Config(img_H=128, img_W=64, batch_size=batch_size,
                 compute_dtype="bfloat16", model_dir="/tmp/glueprof")
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    gen_params = state.g_params["ID_AE"]
    emb_dim = gen_params["stem_kernel"].shape[2] - cfg.keypoint_num
    fg_dim = cfg.roi_part_num * cfg.roi_z_num
    bg_dim = emb_dim - fg_dim
    mapper_fg = GaussianMapper(out_dim=fg_dim, hidden_num=512)
    mapper_bg = GaussianMapper(out_dim=bg_dim, hidden_num=256)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    mf = jax.jit(mapper_fg.init)(k1, jnp.zeros((2, fg_dim)))["params"]
    mb = jax.jit(mapper_bg.init)(k2, jnp.zeros((2, bg_dim)))["params"]

    b = synthetic_batch(np.random.default_rng(0), batch_size,
                        cfg.img_H, cfg.img_W)
    pose_rcv = jnp.asarray(b["pose_rcv"])
    cb = min(batch_size, 64)
    pose0 = render_pose_maps(pose_rcv[:cb], cfg.img_H, cfg.img_W,
                             cfg.keypoint_num, radius=4, normalized=False)
    embs0 = jax.random.normal(jax.random.PRNGKey(9), (cb, emb_dim)) * 0.2
    q = quant_mod.QuantizedGenerator(gen_params, cfg.repeat_num,
                                     cfg.conv_hidden_num,
                                     calib_granularity="channel")
    q.calibrate([embs0], [pose0])

    @jax.jit
    def gen_chain(gen_params, quant_tables, mf, mb, pose_rcv, rng, n):
        def body(i, carry):
            feedback = carry[0, 0, 0, 0].astype(jnp.int32)
            r = jax.random.fold_in(rng, i + feedback)
            rf, rb = jax.random.split(r)
            jitter = (feedback.astype(jnp.float32) % 2.0) * 1e-3
            rcv = pose_rcv.at[..., :2].add(jitter)
            pose = render_pose_maps(rcv, cfg.img_H, cfg.img_W,
                                    cfg.keypoint_num, radius=4,
                                    normalized=False)
            fg = mapper_fg.apply({"params": mf},
                                 sample_mapper_noise(rf, batch_size, fg_dim))
            bg = mapper_bg.apply({"params": mb},
                                 sample_mapper_noise(rb, batch_size, bg_dim))
            embs = jnp.concatenate([fg, bg], -1)
            g_raw, _ = quant_mod.uae_forward(
                gen_params, embs, pose, cfg.repeat_num,
                cfg.conv_hidden_num, quant=quant_tables)
            return jnp.clip((g_raw.astype(jnp.float32) + 1.0) * 127.5,
                            0.0, 255.0).astype(jnp.uint8)

        return jax.lax.fori_loop(0, n, body,
                                 jnp.zeros((batch_size, cfg.img_H,
                                            cfg.img_W, 3), jnp.uint8))

    args = (gen_params, q.quant, mf, mb, pose_rcv, jax.random.PRNGKey(2))
    return gen_chain, args


def build_train_step(batch_size: int, fast: bool):
    """The Stage-I full G+D jitted train step (train_bench.py config)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import synthetic_batch

    cfg = Config(img_H=128, img_W=64, batch_size=batch_size,
                 compute_dtype="bfloat16", fast_gan_step=fast,
                 model_dir="/tmp/glueprof_train")
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    b = synthetic_batch(np.random.default_rng(0), batch_size, 128, 64)
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    return app, state, jb


def hlo_attribution(compiled_text: str, train: bool = False) -> dict:
    """name -> (bucket, shape, jaxpr op_name tail) from the compiled HLO.

    A trace fusion's *name* carries its epilogue op (CLAUDE.md: convs show
    up as clamp_convert_fusion), so bucketing by name alone mislabels.
    The HLO line has the truth: a fusion whose computation contains a
    convolution/dot feeds the MXU; its metadata op_name says which jaxpr
    op (conv_general_dilated / GaussianMapper dot_general / raster iota)
    it came from.
    """
    import re

    attr: dict = {}
    for ln in compiled_text.splitlines():
        ln = ln.strip()
        if not ln.startswith(("%", "ROOT %")) or " = " not in ln:
            continue
        name = ln.split(" = ", 1)[0].lstrip("ROOT ").lstrip("%")
        rhs = ln.split(" = ", 1)[1]
        toks = rhs.split(None, 2)
        shape, opcode = toks[0], toks[1].split("(")[0]
        m = re.search(r'op_name="([^"]+)"', ln)
        op_name = m.group(1) if m else ""
        is_conv_emit = '"emitter"' in ln or "convolution_algorithm" in ln
        jaxpr_op = op_name.rsplit("/", 1)[-1]
        if (opcode == "convolution" or is_conv_emit
                or jaxpr_op.startswith("conv_general_dilated")):
            if train:
                bucket = ("conv-bwd(d/wgrad)" if "transpose(" in op_name
                          else "conv-fwd(+epilogue)")
            else:
                bucket = "conv(+fused epilogue)"
        elif "dot_general" in jaxpr_op or opcode == "dot":
            bucket = "dense(D-head)" if train else "dense(mapper)"
        elif any(k in op_name for k in ("iota", "erf_inv", "threefry",
                                        "random", "fold_in")):
            bucket = "raster/rng"
        elif opcode in ("reduce", "reduce-window") or jaxpr_op.startswith(
                ("reduce_", "cumsum", "argmax", "argmin")):
            bucket = "reduce(loss/stats)"
        elif "concatenate" in jaxpr_op:
            bucket = "glue:concat"
        elif any(k in jaxpr_op for k in ("convert_element_type", "clamp",
                                         "round")):
            bucket = "glue:quant"
        elif opcode in ("copy", "copy-start", "copy-done", "broadcast",
                        "slice", "dynamic-slice", "dynamic-update-slice",
                        "transpose", "reshape", "bitcast", "pad") or any(
                k in jaxpr_op for k in ("broadcast", "slice", "squeeze",
                                        "transpose", "reshape", "pad")):
            bucket = "glue:copy"
        else:
            bucket = "glue:other"
        tail = "/".join(op_name.split("/")[-2:])
        attr[name] = (bucket, shape, tail)
    return attr


def main() -> None:
    import numpy as np
    import jax

    train = len(sys.argv) > 1 and sys.argv[1] == "train"
    argv = sys.argv[2:] if train else sys.argv[1:]
    batch = int(argv[0]) if len(argv) > 0 else (128 if train else 256)
    iters = int(argv[1]) if len(argv) > 1 else 10
    fast = "fast" in argv[2:]
    logdir = "/tmp/glue_trace"

    if train:
        import jax.random as jrandom
        app, state, jb = build_train_step(batch, fast)
        rng = jrandom.PRNGKey(1)
        attr = hlo_attribution(
            type(app).train_step.lower(app, state, jb, rng).compile()
            .as_text(), train=True)
        state, m = app.train_step(state, jb, rng)       # warm
        _ = np.asarray(m["g_loss"])
        jax.profiler.start_trace(logdir)
        for i in range(iters):
            state, m = app.train_step(state, jb, jrandom.fold_in(rng, i))
        _ = np.asarray(m["g_loss"])
        jax.profiler.stop_trace()
    else:
        gen_chain, args = build_chain(batch)
        compiled = jax.jit(gen_chain).lower(*args, iters).compile()
        attr = hlo_attribution(compiled.as_text())
        _ = np.asarray(gen_chain(*args, 1)[0, 0, 0])  # warm (same exec.)
        jax.profiler.start_trace(logdir)
        out = gen_chain(*args, iters)
        _ = np.asarray(out[0, 0, 0])
        jax.profiler.stop_trace()

    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    assert files, f"no trace written under {logdir}"
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    # device compute lane = the "XLA Ops" thread of the /device:* process
    dev_pid, ops_tid = None, None
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "M":
            continue
        if (ev.get("name") == "process_name"
                and "/device:" in ev["args"].get("name", "")):
            dev_pid = ev["pid"]
        if (ev.get("name") == "thread_name"
                and ev["args"].get("name") == "XLA Ops"):
            ops_tid = (ev["pid"], ev.get("tid"))
    per_op: dict = {}
    loop_ms = 0.0
    for ev in trace.get("traceEvents", []):
        if (ev.get("ph") != "X" or "dur" not in ev
                or ev.get("pid") != dev_pid
                or (ev.get("pid"), ev.get("tid")) != ops_tid):
            continue
        name = ev.get("name", "")
        if name.startswith("while."):       # the enclosing fori_loop event
            loop_ms += ev["dur"] / 1e3 / iters
            continue
        per_op[name] = per_op.get(name, 0.0) + ev["dur"]

    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    totals: dict = {}
    print(f"{'op (per-iter ms)':34s} {'ms':>8s}  {'bucket':22s} "
          f"shape / jaxpr op")
    for name, us in rows:
        ms = us / 1e3 / iters
        b, shape, tail = attr.get(name, ("other", "?", ""))
        totals[b] = totals.get(b, 0.0) + ms
        if ms >= 0.02:
            print(f"{name[:34]:34s} {ms:8.3f}  {b:22s} "
                  f"{shape[:28]:28s} {tail[:40]}")
    kind = (f"train step (fast={fast})" if train else "loop body")
    head = (f"\nbucket totals (ms/step @ bs{batch}, {kind}):" if train else
            f"\nbucket totals (ms/iter @ bs{batch}, "
            f"loop body total {loop_ms:.3f} ms):")
    print(head)
    grand = sum(totals.values())
    for b, ms in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"  {b:22s} {ms:8.3f}  ({100 * ms / grand:4.1f}%)")
    tail = ("" if train else
            f"  (scheduling gaps: {loop_ms - grand:+.3f})")
    print(f"  {'TOTAL':22s} {grand:8.3f}{tail}")


if __name__ == "__main__":
    main()
