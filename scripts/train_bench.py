"""Stage-I training-throughput bench (VERDICT r2 item 2).

  python scripts/train_bench.py [bs1,bs2,...] [steps] [fast]

Times the full jitted G+D train step (Market 128x64 config, synthetic
batch held on device) at each batch size and prints img/s + the
%-of-roofline figure. `fast` enables --fast_gan_step (D consumes the
G-step's output instead of a post-update re-forward).

Roofline model (bf16 peak ~197 TOPS on the v5e, the measured ceiling of
the step's own conv emitters — see CLAUDE.md): conv FLOPs per image
counted for G fwd (generator 72.9 GOP + encoder ~59 GOP), G bwd (2x
fwd), the D-batch re-forward (parity mode only), D fwd on x and G, and
D bwd (2x fwd, D fwd ~4.5 GOP incl. both inputs).
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from dpig_tpu.apps.stage1_app import Stage1App
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import synthetic_batch

    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1
                              else "64,128,256").split(",")]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    flags = sys.argv[3].split(",") if len(sys.argv) > 3 else []
    fast = "fast" in flags
    remat = "remat" in flags
    # res256: DF Stage-I config (model 101, 256x256, run_DF_train.sh:20-30;
    # reference trains it at batch 6). The GOP/roofline model below is
    # derived for the 128x64 tower shapes only, so 256 reports raw img/s.
    h, w = (256, 256) if "res256" in flags else (128, 64)

    # conv GOP per image (scripts/perf_probe.py flops + encoder/D tallies)
    G_FWD_GOP = 72.9 + 59.0
    D_FWD_GOP = 4.5
    per_img_gop = (3 * G_FWD_GOP            # G fwd + bwd
                   + (0 if fast else G_FWD_GOP)  # D-batch re-forward
                   + 3 * D_FWD_GOP)         # D fwd(x,G) + bwd
    PEAK_TOPS = 197.0

    for bs in sizes:
        cfg = Config(img_H=h, img_W=w, batch_size=bs,
                     compute_dtype="bfloat16", fast_gan_step=fast,
                     remat=remat,
                     model_dir="/tmp/train_bench")
        app = Stage1App(cfg)
        state = app.init_state(jax.random.PRNGKey(0))
        b = synthetic_batch(np.random.default_rng(0), bs, h, w)
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        rng = jax.random.PRNGKey(1)
        state, m = app.train_step(state, jb, rng)  # compile
        np.asarray(m["g_loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = app.train_step(state, jb, jax.random.fold_in(rng, i))
        np.asarray(m["g_loss"])
        dt = (time.perf_counter() - t0) / steps
        rate = bs / dt
        if (h, w) != (128, 64):
            print(f"bs{bs:4d} {h}x{w} fast={fast} remat={remat}: "
                  f"{dt*1e3:7.1f} ms/step  {rate:7.1f} img/s", flush=True)
            continue
        floor_ms = bs * per_img_gop / PEAK_TOPS  # GOP/TOPS = ms per 1e3 img
        print(f"bs{bs:4d} fast={fast} remat={remat}: {dt*1e3:7.1f} ms/step  "
              f"{rate:7.1f} img/s  conv-roofline {floor_ms:6.1f} ms "
              f"({100*floor_ms/(dt*1e3):.0f}% of step)", flush=True)


if __name__ == "__main__":
    main()
