"""Virtual-mesh scaling curve (VERDICT r2 item 9).

Times the full Stage-I GAN train step over 1/2/4/8-device data-parallel
meshes (virtual CPU devices, same mechanism as the driver's
dryrun_multichip) with a FIXED per-device batch, and reports the
per-image step cost at each width.

On this 1-core host all virtual devices share one core, so wall-clock
cannot show speedup; what the curve DOES measure is the sharding +
collective overhead: with perfect SPMD scaling the per-image cost is
flat as devices double (the work doubles with the global batch), and
any inflation is the cost of psum/all-reduce + partitioning glue.

Usage: python scripts/scaling_curve.py [steps] [per_dev_batch]
Parent process re-execs itself once per device count (XLA device-count
flags are read exactly once at backend init).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(n_devices: int, steps: int, per_dev_batch: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, REPO)
    import __graft_entry__ as g
    from dpig_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from dpig_tpu.data.synthetic import synthetic_batch

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (len(devices), n_devices)
    app, cfg = g._flagship(img_h=32, img_w=16,
                           batch=per_dev_batch * n_devices,
                           hidden=16, z=16)
    mesh = make_mesh(devices)
    state = replicate(app.init_state(jax.random.PRNGKey(0)), mesh)
    batch = shard_batch(
        synthetic_batch(np.random.default_rng(0), cfg.batch_size,
                        cfg.img_H, cfg.img_W), mesh)
    rng = jax.random.PRNGKey(1)
    # compile + warmup
    state, m = app.train_step(state, batch, rng)
    jax.block_until_ready(m["g_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = app.train_step(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(m["g_loss"])
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "devices": n_devices,
        "global_batch": cfg.batch_size,
        "step_ms": round(dt * 1e3, 2),
        "us_per_image": round(dt * 1e6 / cfg.batch_size, 1),
    }), flush=True)


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    per_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    results = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                         if "xla_force_host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={n}".strip())
        env["JAX_PLATFORMS"] = "cpu"
        code = (f"import sys; sys.path.insert(0, {REPO!r}); "
                f"from scripts.scaling_curve import child; "
                f"child({n}, {steps}, {per_dev})")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             cwd=REPO, capture_output=True, text=True)
        if out.returncode != 0:
            raise RuntimeError(f"n={n} failed:\n{out.stderr[-2000:]}")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        print(line, flush=True)
    base = results[0]["us_per_image"]
    print("\nparallel efficiency (per-image cost vs 1 device; 1-core host "
          "=> flat = zero sharding overhead):")
    for r in results:
        print(f"  {r['devices']} dev: {r['us_per_image']:8.1f} us/img  "
              f"efficiency {base / r['us_per_image']:.3f}")


if __name__ == "__main__":
    main()
