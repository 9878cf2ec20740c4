"""Perf probes for the int8 generation path (round-2 optimization work).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe.py <probe> [batch]

Probes:
  flops      - print the exact per-image MAC budget per stage
  convchain  - all generator int8 convs chained back-to-back with requant
               feedback but NO concat/residual/upsample glue (compute ceiling)
  winomm     - transform-domain batched matmul at Winograd F(2x2,3x3) shapes
               (16 x [N,Cin]@[Cin,Cout] int8) for the big stride-1 convs

Timing methodology: chained lax.fori_loop so the lazy remote backend cannot
elide iterations; values demanded to host (CLAUDE.md).
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

HIDDEN, REPEAT = 128, 5


def generator_convs():
    """(label, h_out, w_out, cin, cout, stride, ksize) for every conv in the
    128x64 generator (hidden=128, repeat=5), in execution order."""
    t = []
    hh, ww = 128, 64
    t.append(("stem", hh, ww, 18, HIDDEN, 1, 3))
    for idx in range(REPEAT):
        ch = HIDDEN * (idx + 1)
        t.append((f"enc{idx}a", hh, ww, ch, ch, 1, 3))
        t.append((f"enc{idx}b", hh, ww, ch, ch, 1, 3))
        if idx < REPEAT - 1:
            t.append((f"enc{idx}d", hh // 2, ww // 2, ch,
                      HIDDEN * (idx + 2), 2, 3))
            hh, ww = hh // 2, ww // 2
    x_ch = HIDDEN
    for idx in range(REPEAT):
        cat = x_ch + HIDDEN * (REPEAT - idx)
        t.append((f"dec{idx}a", hh, ww, cat, cat, 1, 3))
        t.append((f"dec{idx}b", hh, ww, cat, cat, 1, 3))
        if idx < REPEAT - 1:
            x_ch = HIDDEN * (REPEAT - idx - 1)
            # 1x1 conv applied BEFORE upsample on the int8 path
            t.append((f"dec{idx}u", hh, ww, cat, x_ch, 1, 1))
            hh, ww = hh * 2, ww * 2
    t.append(("to_rgb", 128, 64, 2 * HIDDEN, 3, 1, 3))
    return t


def probe_flops():
    total = 0
    for (n, h, w, ci, co, s, k) in generator_convs():
        mac = h * w * k * k * ci * co
        total += mac
        print(f"{n:10s} {h:4d}x{w:<4d} {ci:4d}->{co:<4d} k{k} "
              f"{mac/1e9:8.3f} GMAC")
    print(f"{'TOTAL':10s} {total/1e9:32.3f} GMAC/img = "
          f"{2*total/1e9:.1f} GOP/img")
    print(f"5000 img/s needs {5000*2*total/1e12:.0f} TOPS effective; "
          f"3106 img/s = {3106*2*total/1e12:.0f} TOPS effective")


def _force(out):
    """Demand ONE scalar to force execution — device_get of the full
    tensor would time the slow host tunnel, not the chip (a 256MB pull
    dwarfs any compute; see bench.py methodology)."""
    x = out
    while hasattr(x, "ndim") and x.ndim > 0:
        x = x[0]
    return np.asarray(x)


def _time_chain(fn, args, n, label, ops_per_iter):
    f = jax.jit(fn)  # n is TRACED: one compile per shape, no recompile
    _force(f(*args, jnp.int32(1)))  # compile+force
    t0 = time.perf_counter()
    out = f(*args, jnp.int32(n))
    _force(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:28s} {dt*1e3:8.2f} ms/iter   "
          f"{ops_per_iter/dt/1e12:7.1f} TOPS", flush=True)
    return dt


def probe_convchain(batch):
    """Per-stage isolated int8 conv rate: each stride-1 same-width conv
    chained with itself (requant feedback). This is the compute ceiling the
    real network's stages should approach."""
    stages = [(name, h, w, ci) for (name, h, w, ci, co, s, k)
              in generator_convs() if s == 1 and k == 3 and ci == co]
    for (name, h, w, ch) in stages:
        # device-side init: host->device transfer through the remote
        # tunnel is slow/limited for big arrays
        kk, x0 = jax.jit(lambda: (
            jax.random.randint(jax.random.PRNGKey(0), (3, 3, ch, ch),
                               -8, 8, dtype=jnp.int8),
            jax.random.randint(jax.random.PRNGKey(1), (batch, h, w, ch),
                               -127, 127, dtype=jnp.int8)))()

        def step(x0, kk, n):
            def body(i, x):
                acc = jax.lax.conv_general_dilated(
                    x, kk, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return jnp.clip(jnp.round(acc.astype(jnp.float32) * 2e-4),
                                -127, 127).astype(jnp.int8)
            return jax.lax.fori_loop(0, n, body, x0)

        ops = 2 * batch * h * w * 9 * ch * ch
        _time_chain(step, (x0, kk), 20, f"conv {name} {ch}ch @{h}x{w}", ops)


def probe_winomm(batch):
    for (label, h, w, cin, cout) in [
        ("dec4 256->256 @128x64", 128, 64, 256, 256),
        ("dec3 512->512 @64x32", 64, 32, 512, 512),
        ("dec2 768->768 @32x16", 32, 16, 768, 768),
        ("enc0 128->128 @128x64", 128, 64, 128, 128),
    ]:
        n = batch * (h // 2) * (w // 2)
        u, wk = jax.jit(lambda: (
            jax.random.randint(jax.random.PRNGKey(0), (16, n, cin),
                               -127, 127, dtype=jnp.int8),
            jax.random.randint(jax.random.PRNGKey(1), (16, cin, cout),
                               -127, 127, dtype=jnp.int8)))()

        def mm(u0, wk, nn, cin=cin, cout=cout):
            def body(i, uu):
                m = jnp.einsum("pnc,pcd->pnd", uu, wk,
                               preferred_element_type=jnp.int32)
                if cout >= cin:
                    m = m[:, :, :cin]
                else:
                    m = jnp.pad(m, ((0, 0), (0, 0), (0, cin - cout)))
                return jnp.clip(jnp.round(m.astype(jnp.float32) * 2e-4),
                                -127, 127).astype(jnp.int8)
            return jax.lax.fori_loop(0, nn, body, u0)

        ops = 2 * 16 * n * cin * cout
        direct = 2 * batch * h * w * 9 * cin * cout
        per = _time_chain(mm, (u, wk), 10, f"winomm {label}", ops)
        print(f"    -> replaces a direct conv of "
              f"{direct/1e12:.2f} TOP: effective {direct/per/1e12:7.1f} "
              f"TOPS-eq", flush=True)


def _emitter_histogram(compiled_text, clock_ghz=1.5):
    """{emitter: (est ms summed, n ops)} over every HLO that reports both
    an estimated_cycles and a conv emitter in its backend_config."""
    per_emitter = {}
    for line in compiled_text.splitlines():
        m = re.search(r'"estimated_cycles":"(\d+)"', line)
        e = re.search(r'"emitter":"(\w+)"', line)
        if m and e:
            per_emitter.setdefault(e.group(1), [0, 0])
            per_emitter[e.group(1)][0] += int(m.group(1))
            per_emitter[e.group(1)][1] += 1
    return {k: (round(v[0] / (clock_ghz * 1e6), 2), v[1])
            for k, v in per_emitter.items()}


def _cycles_table(compiled_text, clock_ghz=1.5, min_us=5.0):
    """Parse estimated_cycles out of compiled HLO text.

    Returns [(name, cycles, us)] sorted by cycles desc. The backend's
    estimated_cycles matched measured per-HLO trace durations at ~1.5 GHz
    on this stack (CLAUDE.md profiling workflow), so this is a
    no-hardware cost oracle.
    """
    import re
    rows = []
    for line in compiled_text.splitlines():
        m = re.search(r'"estimated_cycles":\s*"?(\d+)"?', line)
        if not m:
            continue
        cyc = int(m.group(1))
        nm = re.search(r'%?([\w\.\-]+)\s*=', line)
        name = nm.group(1) if nm else "?"
        rows.append((name, cyc, cyc / (clock_ghz * 1e3)))  # us
    rows.sort(key=lambda r: -r[1])
    total_us = sum(r[2] for r in rows)
    print(f"total estimated: {total_us/1e3:.2f} ms over {len(rows)} "
          f"costed HLOs")
    for (name, cyc, us) in rows:
        if us < min_us:
            break
        print(f"  {us:9.1f} us  {name}")
    return rows


def probe_oracle(batch):
    """Compile the full int8 generator (bench configuration) and dump the
    per-HLO estimated_cycles table — exact accounting of the serving
    graph's cost without running it."""
    from dpig_tpu.models import quant as quant_mod

    ch = HIDDEN
    fg_dim, bg_dim = 7 * 32, 32 * 4
    params, quant_tables, _, _ = _synthetic_generator_tables()

    embs = jnp.zeros((batch, fg_dim + bg_dim), jnp.float32)
    pose = jnp.zeros((batch, 128, 64, 18), jnp.float32)

    def fwd(params, quant_tables, embs, pose):
        out, z = quant_mod.uae_forward(params, embs, pose, REPEAT, ch,
                                       quant=quant_tables)
        return out

    lowered = jax.jit(fwd).lower(params, quant_tables, embs, pose)
    txt = lowered.compile().as_text()
    _cycles_table(txt)


def _synthetic_generator_tables(h=128, w=64):
    """Random generator params + quant tables at the bench config, built
    host-side (no TPU needed for compile-only probes)."""
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.models import quant as quant_mod
    from dpig_tpu.ops.pose import render_pose_maps

    cfg = Config(img_H=h, img_W=w, batch_size=8,
                 compute_dtype="bfloat16", model_dir="/tmp/bench")
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    gen_params = state.g_params["ID_AE"]
    gen_repeat = cfg.repeat_num - 1 if h >= 256 else cfg.repeat_num
    emb_dim = gen_params["stem_kernel"].shape[2] - cfg.keypoint_num
    pose0 = render_pose_maps(
        jnp.concatenate([
            jax.random.uniform(jax.random.PRNGKey(0), (8, 18, 1)) * (h - 1),
            jax.random.uniform(jax.random.PRNGKey(1), (8, 18, 1)) * (w - 1),
            jnp.ones((8, 18, 1))], -1),
        h, w, 18, radius=4, normalized=False)
    embs0 = jax.random.normal(jax.random.PRNGKey(9), (8, emb_dim)) * 0.2
    q = quant_mod.QuantizedGenerator(gen_params, gen_repeat,
                                     cfg.conv_hidden_num)
    q.calibrate([embs0], [pose0])
    return gen_params, q.quant, gen_repeat, emb_dim


def probe_oracle_df(batch):
    """Compile the full 256x256 int8 generator (bench `df` mode: model-1002
    shape, repeat-1 generator, trainer_256.py:597-614) and dump the
    estimated_cycles table + a conv-emitter histogram — verifies the
    layout pin still lands the fast EmitAllBatchInSublanes emitter at
    256x256 shapes and bounds the df path's conv floor."""
    import re
    from dpig_tpu.models import quant as quant_mod

    params, quant_tables, gen_repeat, emb_dim = \
        _synthetic_generator_tables(256, 256)
    embs = jnp.zeros((batch, emb_dim), jnp.float32)
    pose = jnp.zeros((batch, 256, 256, 18), jnp.float32)

    def fwd(params, quant_tables, embs, pose):
        out, z = quant_mod.uae_forward(params, embs, pose, gen_repeat,
                                       HIDDEN, quant=quant_tables)
        return out

    txt = jax.jit(fwd).lower(params, quant_tables, embs, pose) \
        .compile().as_text()
    rows = _cycles_table(txt, min_us=50.0)
    total_ms = sum(r[1] for r in rows) / 1.5e6
    print(f"conv emitters (ms, n): { _emitter_histogram(txt) }")
    print(f"oracle total {total_ms:.2f} ms/batch{batch} => "
          f"{batch / total_ms * 1e3:.0f} img/s ceiling-est")


def probe_oracle_transfer(batch):
    """Compile the int8 pose-transfer body (model-12 path: int8 FgBg
    encoder + int8 generator, bench.py bench_transfer) and dump the
    estimated_cycles table + conv-emitter histogram — locates the
    encoder's share of the 2,060 img/s transfer path."""
    import re
    from dpig_tpu.apps.common import select_parts
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import synthetic_batch
    from dpig_tpu.models import quant as quant_mod
    from dpig_tpu.ops.pose import render_pose_maps

    cfg = Config(img_H=128, img_W=64, batch_size=8,
                 compute_dtype="bfloat16", model_dir="/tmp/bench")
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    enc_params = state.g_params["Encoder"]
    gen_params = state.g_params["ID_AE"]

    b = synthetic_batch(np.random.default_rng(0), 8, 128, 64)
    x = jnp.asarray(b["x"])
    mask = jnp.asarray(b["mask_r6"])
    bbox, vis = select_parts(jnp.asarray(b["part_bbox"]),
                             jnp.asarray(b["part_vis"]), cfg.roi_part_num)
    pose_t = render_pose_maps(jnp.asarray(b["pose_rcv_target"]), 128, 64,
                              18, radius=4, normalized=False)
    qe = quant_mod.QuantizedEncoder(enc_params, REPEAT, HIDDEN)
    qe.calibrate([(x, mask, bbox, vis)])
    embs0 = jax.jit(lambda p, x, m, bb, vv: quant_mod.roi_fgbg_forward(
        p, x, m, bb, vv, REPEAT, HIDDEN))(enc_params, x, mask, bbox, vis)
    qg = quant_mod.QuantizedGenerator(gen_params, REPEAT, HIDDEN)
    qg.calibrate([embs0], [pose_t])

    B = batch
    xb = jnp.zeros((B, 128, 64, 3), jnp.float32)
    mb = jnp.zeros((B, 128, 64, 1), jnp.float32)
    bb = jnp.zeros((B,) + bbox.shape[1:], bbox.dtype)
    vb = jnp.zeros((B,) + vis.shape[1:], vis.dtype)
    pb_ = jnp.zeros((B, 128, 64, 18), jnp.float32)

    def enc_only(enc_params, eq, x, m, bb, vv):
        return quant_mod.roi_fgbg_forward(enc_params, x, m, bb, vv,
                                          REPEAT, HIDDEN, quant=eq)

    def full(enc_params, gen_params, eq, gq, x, m, bb, vv, pose):
        embs = quant_mod.roi_fgbg_forward(enc_params, x, m, bb, vv,
                                          REPEAT, HIDDEN, quant=eq)
        out, _ = quant_mod.uae_forward(gen_params, embs, pose, REPEAT,
                                       HIDDEN, quant=gq)
        return out

    for label, fn, args in (
            ("encoder-only", enc_only,
             (enc_params, qe.quant, xb, mb, bb, vb)),
            ("full transfer", full,
             (enc_params, gen_params, qe.quant, qg.quant, xb, mb, bb, vb,
              pb_))):
        txt = jax.jit(fn).lower(*args).compile().as_text()
        print(f"== {label} (bs{B})")
        rows = _cycles_table(txt, min_us=200.0)
        total_ms = sum(r[1] for r in rows) / 1.5e6
        print(f"  conv emitters (ms, n): { _emitter_histogram(txt) }")
        print(f"  oracle total {total_ms:.2f} ms/bs{B} => "
              f"{B / total_ms * 1e3:.0f} img/s est", flush=True)


def probe_oracle_conv(batch):
    """estimated_cycles for single-conv layout/shape variants — the enc0
    (Ci=Co=128 @128x64) emitter-tax experiments."""
    from jax.experimental.layout import Layout, with_layout_constraint

    def compile_cycles(fn, *args):
        txt = jax.jit(fn).lower(*args).compile().as_text()
        rows = []
        import re
        for line in txt.splitlines():
            m = re.search(r'"estimated_cycles":\s*"?(\d+)"?', line)
            if m:
                rows.append(int(m.group(1)))
        return sum(rows), txt

    h, w = 128, 64
    variants = []
    x8 = jnp.zeros((batch, h, w, 128), jnp.int8)
    k8 = jnp.zeros((3, 3, 128, 128), jnp.int8)

    def conv_pinned(mtm):
        def f(x, k):
            x = with_layout_constraint(x, Layout(major_to_minor=mtm))
            acc = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return jnp.clip(acc, -127, 127).astype(jnp.int8)
        return f

    gop = 2 * batch * h * w * 9 * 128 * 128 / 1e9
    for mtm in [(1, 2, 0, 3), (0, 1, 2, 3), (1, 2, 3, 0), (2, 1, 0, 3),
                (0, 2, 1, 3)]:
        cyc, txt = compile_cycles(conv_pinned(mtm), x8, k8)
        us = cyc / 1.5e3
        tops = gop / us * 1e3 if us else 0
        emitters = sorted(set(
            s for s in ("EmitAllBatchInSublanes", "EmitInputBatchInLanes",
                        "EmitGeneric") if s in txt))
        print(f"  mtm={mtm}  {us:8.1f} us  {tops:6.1f} TOPS  {emitters}")


def probe_oracle_shapes(batch):
    """Compile-only TOPS estimate for chained s8 convs at in-graph-like
    shapes (quantize->conv->epilogue->conv, pinned layouts) — isolates
    the Ci/Co/spatial emitter behavior behind the enc0 tax."""
    from dpig_tpu.models.quant import _pin_layout

    def chain(shape_in, ci, co, n_convs=2):
        h, w = shape_in

        def f(x8, ks):
            x = x8
            for i in range(n_convs):
                k = ks[i]
                acc = jax.lax.conv_general_dilated(
                    _pin_layout(x), k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                x = _pin_layout(jnp.clip(
                    jnp.round(acc.astype(jnp.float32) * 2e-4),
                    -127, 127).astype(jnp.int8))
            return x
        x8 = jnp.zeros((batch, h, w, ci), jnp.int8)
        ks = [jnp.zeros((3, 3, ci if i == 0 else co, co), jnp.int8)
              for i in range(n_convs)]
        txt = jax.jit(f).lower(x8, ks).compile().as_text()
        import re
        conv_cyc = []
        for line in txt.splitlines():
            if '"emitter"' not in line:
                continue
            m = re.search(r'"estimated_cycles":"(\d+)"', line)
            e = re.search(r'"emitter":"(\w+)"', line)
            if m:
                conv_cyc.append((int(m.group(1)), e.group(1) if e else "?"))
        us = sum(c for c, _ in conv_cyc) / 1.5e3
        gop = sum(2 * batch * h * w * 9 * (ci if i == 0 else co) * co
                  for i in range(n_convs)) / 1e9
        emitters = sorted({e for _, e in conv_cyc})
        print(f"  {h}x{w} ci{ci} co{co} x{n_convs}: {us:8.1f} us "
              f"{gop/us*1e3:6.1f} TOPS  {emitters}", flush=True)

    def rowfold(h, w, ci, co):
        """3x3 conv expressed as row-concat + 1x3 conv with Ci=3*ci
        (identical MACs) — tests whether tripling the input-channel
        tiles escapes the Ci=128 emitter tax."""
        from dpig_tpu.models.quant import _pin_layout

        def f(x8, k):
            pad = jnp.pad(x8, ((0, 0), (1, 1), (0, 0), (0, 0)))
            rows = jnp.concatenate(
                [pad[:, :-2], pad[:, 1:-1], pad[:, 2:]], axis=-1)
            acc = jax.lax.conv_general_dilated(
                _pin_layout(rows), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return _pin_layout(jnp.clip(
                jnp.round(acc.astype(jnp.float32) * 2e-4),
                -127, 127).astype(jnp.int8))
        x8 = jnp.zeros((batch, h, w, ci), jnp.int8)
        k = jnp.zeros((1, 3, 3 * ci, co), jnp.int8)
        txt = jax.jit(f).lower(x8, k).compile().as_text()
        import re
        tot_conv = tot_other = 0
        for line in txt.splitlines():
            m = re.search(r'"estimated_cycles":"(\d+)"', line)
            if not m:
                continue
            if '"emitter"' in line:
                tot_conv += int(m.group(1))
            else:
                tot_other += int(m.group(1))
        us, ous = tot_conv / 1.5e3, tot_other / 1.5e3
        gop = 2 * batch * h * w * 9 * ci * co / 1e9
        print(f"  rowfold {h}x{w} ci{ci} co{co}: conv {us:8.1f} us "
              f"{gop/us*1e3:6.1f} TOPS + glue {ous:8.1f} us", flush=True)

    chain((128, 64), 128, 128)   # enc0 shape
    chain((128, 64), 256, 256)   # dec4 shape (the 366-TOPS norm)
    chain((64, 64), 128, 128)    # spatial-independence check
    chain((128, 64), 128, 256)   # Co doubled
    chain((128, 64), 256, 128)   # Ci doubled
    chain((64, 32), 256, 256)    # enc1 shape
    rowfold(128, 64, 128, 128)   # enc0 via 1x3 Ci=384


def probe_to_rgb(batch):
    """Compile-only A/B for the to_rgb Co=3 emitter tax: the in-graph
    to_rgb (s8 conv Ci=128->Co=3 @128x64 + f32 dequant/bias epilogue)
    lands on EmitOutputBatchInLanes at ~2.2x its input-read BW floor.
    Variants pad Co to a lane-friendly width (zero out-channels) and
    slice the 3 live channels after — extra MACs are negligible next to
    the input read, so a better emitter should win if one exists."""
    import re
    from dpig_tpu.models.quant import _pin_layout
    h, w, ci = 128, 64, 128

    def build(co, do_slice):
        def f(x8, k, b):
            acc = jax.lax.conv_general_dilated(
                _pin_layout(x8), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * 2e-4 + b
            if do_slice:
                y = y[..., :3]
            return y
        x8 = jnp.zeros((batch, h, w, ci), jnp.int8)
        k = jnp.zeros((3, 3, ci, co), jnp.int8)
        b = jnp.zeros((co,), jnp.float32)
        return f, (x8, k, b)

    for co, do_slice in [(3, False), (8, True), (16, True), (128, True),
                         (8, False)]:
        f, args = build(co, do_slice)
        txt = jax.jit(f).lower(*args).compile().as_text()
        conv_us = other_us = 0.0
        emitters = []
        for line in txt.splitlines():
            m = re.search(r'"estimated_cycles":"(\d+)"', line)
            if not m:
                continue
            if '"emitter"' in line:
                conv_us += int(m.group(1)) / 1.5e3
                e = re.search(r'"emitter":"(\w+)"', line)
                emitters.append(e.group(1) if e else "?")
            else:
                other_us += int(m.group(1)) / 1.5e3
        print(f"  co{co}{'+slice' if do_slice else ''}: conv "
              f"{conv_us:8.1f} us + other {other_us:8.1f} us  {emitters}",
              flush=True)


def probe_stem(batch):
    """Compile-only A/B for the g_stem conv (s8, Ci=18 pose maps ->
    Co=128 @128x64): Ci=18 is a fraction of one 32-wide lane tile, so the
    emitter may charge full tiles. Variants pad Ci with zero channels
    (rasterizer could emit any of these widths for free)."""
    import re
    from dpig_tpu.models.quant import _pin_layout
    h, w, co = 128, 64, 128

    for ci in [18, 32, 64, 128]:
        def f(x8, k):
            acc = jax.lax.conv_general_dilated(
                _pin_layout(x8), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return jnp.clip(jnp.round(acc.astype(jnp.float32) * 2e-4),
                            -127, 127).astype(jnp.int8)
        x8 = jnp.zeros((batch, h, w, ci), jnp.int8)
        k = jnp.zeros((3, 3, ci, co), jnp.int8)
        txt = jax.jit(f).lower(x8, k).compile().as_text()
        conv_us = 0.0
        emitters = []
        for line in txt.splitlines():
            m = re.search(r'"estimated_cycles":"(\d+)"', line)
            if m and '"emitter"' in line:
                conv_us += int(m.group(1)) / 1.5e3
                e = re.search(r'"emitter":"(\w+)"', line)
                emitters.append(e.group(1) if e else "?")
        print(f"  ci{ci}: conv {conv_us:8.1f} us  {emitters}", flush=True)


def probe_oracle_train(batch):
    """Compile the FULL Stage-I jitted G+D train step (bf16, Market
    128x64, trainer.py:326-366 anchor) and bucket estimated_cycles into
    conv categories (fwd / input-grad / weight-grad, split by dim_labels
    + lhs_dilation) vs everything else — locates the gap between the
    measured step time and the analytic conv roofline in train_bench.py.

    Conv estimates match measured trace times at 1.5 GHz (CLAUDE.md);
    memory-op estimates are 3-6x pessimistic, so the non-conv bucket is
    an upper bound and `measured - conv_sum` is the honest residual.

    usage: perf_probe.py oracle_train [batch] [fast|parity[,remat][,pin]]
    """
    import re
    import numpy as np
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import synthetic_batch

    flags = sys.argv[3].split(",") if len(sys.argv) > 3 else ["fast"]
    fast = "parity" not in flags
    cfg = Config(img_H=128, img_W=64, batch_size=batch,
                 compute_dtype="bfloat16", fast_gan_step=fast,
                 remat="remat" in flags,
                 model_dir="/tmp/oracle_train")
    app = Stage1App(cfg)
    state = app.init_state(jax.random.PRNGKey(0))
    b = synthetic_batch(np.random.default_rng(0), batch, 128, 64)
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    lowered = app.train_step.lower(app, state, jb, jax.random.PRNGKey(1))
    txt = lowered.compile().as_text()

    # fused_computation body -> (has_conv, window, dim_labels)
    conv_info = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"%?(\S*fused_computation[\w\.\-]*)\s*\(", line)
        if m:
            cur = m.group(1)
            continue
        if cur and " convolution(" in line:
            w = re.search(r"window=\{([^}]*)\}", line)
            d = re.search(r"dim_labels=(\S+?)[,\s]", line)
            conv_info[cur] = (w.group(1) if w else "",
                              d.group(1) if d else "")

    def conv_category(window, labels):
        # fwd: b01f_01io->b01f ; dgrad: lhs-dilated (stride-2 fwd) or
        # kernel-reversed b01f_01io ; wgrad: batch is the contracting dim
        # => labels like f01b_i01o->01bf
        if labels.startswith("f") or "->01" in labels:
            return "wgrad"
        if "lhs_dilate" in window or "rhs_reversal" in window:
            return "dgrad"
        return "fwd_or_dgrad1"  # stride-1 dgrad is shape-identical to fwd

    buckets = {}
    emitters = {}
    other_rows = []
    total_cyc = 0
    for line in txt.splitlines():
        m = re.search(r'"estimated_cycles":"?(\d+)"?', line)
        if not m:
            continue
        cyc = int(m.group(1))
        total_cyc += cyc
        call = re.search(r"calls=%?([\w\.\-]+)", line)
        body = call.group(1) if call else None
        em = re.search(r'"emitter":"(\w+)"', line)
        if body in conv_info or em:
            window, labels = conv_info.get(body, ("", ""))
            cat = conv_category(window, labels)
            buckets[cat] = buckets.get(cat, 0) + cyc
            if em:
                key = (cat, em.group(1))
                emitters[key] = emitters.get(key, [0, 0])
                emitters[key][0] += cyc
                emitters[key][1] += 1
        else:
            nm = re.search(r"%?([\w\.\-]+)\s*=", line)
            other_rows.append((cyc, nm.group(1) if nm else "?"))

    ms = 1.5e6  # cycles per ms at 1.5 GHz
    conv_cyc = sum(buckets.values())
    print(f"mode={'fast' if fast else 'parity'} bs{batch} "
          f"remat={cfg.remat}")
    print(f"total estimated {total_cyc/ms:.1f} ms  "
          f"(convs {conv_cyc/ms:.1f} ms, other {(total_cyc-conv_cyc)/ms:.1f}"
          f" ms -- other is 3-6x pessimistic, see docstring)")
    for cat, cyc in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  conv[{cat}]: {cyc/ms:7.2f} ms")
    for (cat, em), (cyc, n) in sorted(emitters.items(), key=lambda kv: -kv[1][0]):
        print(f"    {cat:14s} {em:28s} {cyc/ms:7.2f} ms  x{n}")
    other_rows.sort(key=lambda r: -r[0])
    print("  top non-conv fusions (pessimistic estimates):")
    for cyc, name in other_rows[:25]:
        print(f"    {cyc/ms:7.3f} ms  {name}")


def main():
    probe = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    if probe == "flops":
        probe_flops()
    elif probe == "convchain":
        probe_convchain(batch)
    elif probe == "winomm":
        probe_winomm(batch)
    elif probe == "raster":
        probe_raster(batch)
    elif probe == "oracle":
        probe_oracle(batch)
    elif probe == "oracle_conv":
        probe_oracle_conv(batch)
    elif probe == "oracle_shapes":
        probe_oracle_shapes(batch)
    elif probe == "oracle_df":
        probe_oracle_df(batch)
    elif probe == "oracle_transfer":
        probe_oracle_transfer(batch)
    elif probe == "oracle_train":
        probe_oracle_train(batch)
    elif probe == "to_rgb":
        probe_to_rgb(batch)
    elif probe == "stem":
        probe_stem(batch)
    else:
        raise SystemExit(f"unknown probe {probe}")




def probe_raster(batch):
    """Pose rasterizer: jnp closed form vs Pallas kernel at bs `batch`."""
    from dpig_tpu.ops.pose import render_pose_maps
    from dpig_tpu.ops.pose_pallas import render_pose_maps_pallas
    rcv = jax.jit(lambda: jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(0), (batch, 18, 1)) * 127,
        jax.random.uniform(jax.random.PRNGKey(1), (batch, 18, 1)) * 63,
        jnp.ones((batch, 18, 1))], -1))()

    for (label, fn) in (("xla closed form", render_pose_maps),
                        ("pallas kernel", render_pose_maps_pallas)):
        def chain(rcv, n, fn=fn):
            def body(i, carry):
                m = fn(carry, 128, 64, 18, radius=4, normalized=False)
                # feed a reduction back so iterations can't be elided
                return carry + m.mean() * 0.0
            return jax.lax.fori_loop(0, n, body, rcv)
        _time_chain(chain, (rcv,), 50, f"raster {label} bs{batch}",
                    batch * 128 * 64 * 18)


if __name__ == "__main__":
    main()
