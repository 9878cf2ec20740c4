"""2-process multi-host smoke: jax.distributed over localhost, 4 virtual
CPU devices per process, one Stage-I GAN step on an 8-device global mesh.

Validates the SURVEY §2.8 multi-host row end-to-end: init_distributed,
per-host batch assembly via make_array_from_process_local_data, replicated
params, and that both hosts compute identical (global, psum-reduced)
metrics equal to the single-process 8-device run.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
if nproc > 1:
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
from dpig_tpu.apps.stage1_app import Stage1App
from dpig_tpu.config import Config
from dpig_tpu.data.synthetic import synthetic_batch
from dpig_tpu.parallel.mesh import make_mesh, replicate, shard_batch

GLOBAL_BATCH = 8
cfg = Config(img_H=32, img_W=16, batch_size=GLOBAL_BATCH,
             conv_hidden_num=8, z_num=8, model_dir="/tmp/mh")
app = Stage1App(cfg)
mesh = make_mesh()
assert len(jax.devices()) == 8, len(jax.devices())
state = replicate(app.init_state(jax.random.PRNGKey(0)), mesh)
# Each host feeds its slice of one deterministic global batch.
full = synthetic_batch(np.random.default_rng(0), GLOBAL_BATCH,
                       cfg.img_H, cfg.img_W)
lo = pid * (GLOBAL_BATCH // nproc)
hi = lo + GLOBAL_BATCH // nproc
local = {k: v[lo:hi] for k, v in full.items()}
batch = shard_batch(local, mesh)
state, metrics = app.train_step(state, batch, jax.random.PRNGKey(1))
out = {k: float(v) for k, v in metrics.items()}
print("METRICS:" + json.dumps(out), flush=True)
"""


def _run_procs(nproc):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count="
                        + ("4" if nproc == 2 else "8")).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD, str(i), str(nproc), str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        assert p.returncode == 0, out[-3000:]
        line = [ln for ln in out.splitlines() if ln.startswith("METRICS:")]
        assert line, out[-3000:]
        outs.append(json.loads(line[0][len("METRICS:"):]))
    return outs


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_step_matches_single_process():
    single = _run_procs(1)[0]
    two = _run_procs(2)
    assert set(two[0]) == set(two[1]) == set(single)
    for k in single:
        assert np.isfinite(single[k])
        # both hosts agree exactly (same global computation)
        np.testing.assert_allclose(two[0][k], two[1][k], rtol=1e-6)
        # and match the single-process 8-device result
        np.testing.assert_allclose(two[0][k], single[k], rtol=1e-4,
                                   atol=1e-5)
