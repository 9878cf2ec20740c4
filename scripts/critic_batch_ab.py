"""Stage-2 critic-batch equivalence A/B (VERDICT r3 weak #4).

The reference pulls a FRESH queue batch for every critic sess.run
(trainer.py:821-845); our fused step reuses the step's batch across the
5 critic iterations (fresh mapper noise each). This script trains the
WGAN embedding samplers both ways from identical init/seeds and compares
the critic's Wasserstein estimate and the fake-vs-real embedding moment
match — the evidence behind PARITY.md's "measured: equivalent" note.

  python scripts/critic_batch_ab.py [steps] [batch_size] [seed]

`seed` (default 0) offsets every PRNG stream (init, loader, step noise)
so independent replications of the A/B are cheap.

CPU-friendly: tiny image config; all cost is in the frozen-encoder
forward (6x/step in fresh mode vs 1x reused).
"""
from __future__ import annotations

import json
import sys

import numpy as np


def run(mode: str, steps: int, batch_size: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    from dpig_tpu.apps.stage2_app import Stage2AppApp
    from dpig_tpu.config import Config
    from dpig_tpu.data.synthetic import SyntheticLoader
    from dpig_tpu.losses import gan

    cfg = Config(img_H=32, img_W=16, batch_size=batch_size,
                 conv_hidden_num=16, z_num=16, synthetic_data=True)
    app = Stage2AppApp(cfg)
    state = app.init_state(jax.random.PRNGKey(100 * seed))
    loader = SyntheticLoader(batch_size, cfg.img_H, cfg.img_W, seed=7 + seed)
    rng = jax.random.PRNGKey(100 * seed + 1)

    n_per_step = 1 + gan.CRITIC_ITERS if mode == "fresh" else 1
    curve = []
    for i in range(steps):
        bs = [{k: jnp.asarray(v) for k, v in next(loader).items()}
              for _ in range(n_per_step)]
        r = jax.random.fold_in(rng, i)
        if mode == "fresh":
            state, m = app.train_step_fresh(state, bs, r)
        else:
            state, m = app.train_step(state, bs[0], r)
        # WGAN critic loss = E[D(fake)] - E[D(real)]; its negative is the
        # Wasserstein estimate the reference logs per critic.
        curve.append((float(m["d_loss_embs_fg"]), float(m["d_loss_embs_bg"])))
        if i % 200 == 199:
            w = np.asarray(curve[-200:])
            print(f"  [{i}] W_fg={-w[:, 0].mean():.4f} "
                  f"W_bg={-w[:, 1].mean():.4f}", flush=True)

    # moment match: 512 fake embeddings vs 512 real embeddings
    n = max(1, -(-512 // batch_size))  # ceil — robust to any batch size
    fakes_fg, fakes_bg, reals_fg, reals_bg = [], [], [], []
    for i in range(n):
        fg, bg = app.sample_embs(state.g_params,
                                 jax.random.fold_in(rng, 10_000 + i),
                                 batch_size)
        b = {k: jnp.asarray(v) for k, v in next(loader).items()}
        rfg, rbg = app.real_embs(state.frozen_params, b)
        fakes_fg.append(np.asarray(fg)), fakes_bg.append(np.asarray(bg))
        reals_fg.append(np.asarray(rfg)), reals_bg.append(np.asarray(rbg))
    out = {}
    for name, fk, rl in [("fg", fakes_fg, reals_fg),
                         ("bg", fakes_bg, reals_bg)]:
        fk, rl = np.concatenate(fk)[:512], np.concatenate(rl)[:512]
        out[f"mean_gap_{name}"] = float(
            np.abs(fk.mean(0) - rl.mean(0)).mean())
        out[f"std_gap_{name}"] = float(
            np.abs(fk.std(0) - rl.std(0)).mean())
    w = np.asarray(curve[-max(200, steps // 4):])
    out["W_fg_tail"] = float(-w[:, 0].mean())
    out["W_bg_tail"] = float(-w[:, 1].mean())
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    results = {}
    for mode in ("reused", "fresh"):
        print(f"=== mode={mode} ({steps} steps, bs{batch_size}, seed{seed})")
        results[mode] = run(mode, steps, batch_size, seed)
    print(f"\n{'metric':16s} {'reused':>10s} {'fresh':>10s}")
    for k in results["reused"]:
        print(f"{k:16s} {results['reused'][k]:10.4f} "
              f"{results['fresh'][k]:10.4f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
