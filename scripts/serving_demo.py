"""Real-data serving demo (VERDICT r2 item 8): model-11 generation on the
TPU fed by the real tfrecord loader, end to end.

  python scripts/serving_demo.py build [n_samples]   # write tfrecords
  python scripts/serving_demo.py serve [batch] [n_batches] [workers]

`build` writes a converter-shaped Market tfrecord set (synthetic imagery,
real schema: jpeg pairs, rcv poses, r4/r6 masks, 37-part bboxes) to
/tmp/serving_data. `serve` runs the int8 model-11 sampling path from the
real loader and reports (a) loader-only throughput, (b) end-to-end
throughput with the device consuming batches, (c) loader/device
occupancy. Run on the TPU host.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

OUT_DIR = "/tmp/serving_data"
H, W = 128, 64


def build(n_samples: int = 25600, shard_size: int = 6400) -> None:
    import io
    from PIL import Image
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from dpig_tpu.data import tfrecord
    from dpig_tpu.data.proto import example_pb2 as pb

    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    wi = 0
    writer = None
    for i in range(n_samples):
        if i % shard_size == 0:
            if writer:
                writer.close()
            writer = tfrecord.TFRecordWriter(os.path.join(
                OUT_DIR, f"Market1501_test_{wi:05d}.tfrecord"))
            wi += 1
        ex = pb.Example()
        f = ex.features.feature
        for s in ("_0", "_1"):
            arr = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            f[f"image_raw{s}"].bytes_list.value.append(buf.getvalue())
            rcv = np.stack([rng.uniform(0, H - 1, 18),
                            rng.uniform(0, W - 1, 18),
                            np.ones(18)], -1).astype(np.float32)
            f[f"pose_peaks{s}_rcv"].float_list.value.extend(rcv.ravel())
            for key in ("pose_mask_r4", "pose_mask_r6"):
                f[f"{key}{s}"].int64_list.value.extend(
                    rng.integers(0, 2, H * W).tolist())
            f[f"part_bbox{s}"].int64_list.value.extend(
                rng.integers(0, H // 2, 37 * 4).tolist())
            f[f"part_vis{s}"].int64_list.value.extend(
                rng.integers(0, 2, 37).tolist())
        writer.write(ex.SerializeToString())
    writer.close()
    dt = time.perf_counter() - t0
    print(f"built {n_samples} samples in {dt:.1f}s "
          f"({n_samples / dt:.0f}/s) -> {OUT_DIR}")


def serve(batch_size: int = 256, n_batches: int = 40,
          num_workers: int = 0, fields: str = "all") -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    from dpig_tpu.apps import testers
    from dpig_tpu.config import Config
    from dpig_tpu.data.loader import TFRecordPairLoader

    cfg = Config(img_H=H, img_W=W, batch_size=batch_size,
                 compute_dtype="bfloat16", inference_dtype="int8",
                 sample_app=True, model_dir="/tmp/serving_model")
    t = testers.FullSamplingTester(cfg)

    def make_loader(f=fields):
        return TFRecordPairLoader(OUT_DIR, "test", batch_size, H, W,
                                  dataset="market", shuffle=False,
                                  num_workers=num_workers, fields=f)

    # (a) loader-only throughput
    loader = make_loader()
    first = next(loader)  # warm the parse path
    t0 = time.perf_counter()
    probe = min(n_batches // 2, 10)
    for _ in range(probe):
        next(loader)
    loader_rate = probe * batch_size / (time.perf_counter() - t0)

    # (b) end-to-end: loader feeds the jitted int8 sampling step.
    # int8 calibration always sees one REAL decoded batch (pose_only
    # zero-fills the image branch; its encoder path is dead code at
    # inference but calibration must not run on zeros).
    loader = make_loader()
    first = next(make_loader("all")) if fields != "all" else next(loader)
    params = t._inference_params(first)
    if fields != "all":
        first = next(loader)
    rng = jax.random.PRNGKey(0)
    jb = {k: jnp.asarray(v) for k, v in first.items()}
    out = t.sample_step(params, jb, rng, "real")  # compile
    np.asarray(out[0][0, 0, 0])

    # pose_only serving ships ONLY the pose coordinates per batch (54
    # floats/sample) and reuses device-resident zero buffers for the
    # dead image-branch keys — the whole point of on-device pose
    # rasterization (ops/pose.py docstring). fields=all ships the full
    # decoded batch, as a scoring tester must.
    static_dev = None
    if fields == "pose_only":
        static_dev = {k: jax.device_put(jnp.asarray(v))
                      for k, v in first.items() if k != "pose_rcv"}

    host_busy = 0.0
    t0 = time.perf_counter()
    done = 0
    pending = None
    for i in range(n_batches - 1):
        h0 = time.perf_counter()
        try:
            b = next(loader)
        except StopIteration:
            break
        if static_dev is not None:
            jb = dict(static_dev, pose_rcv=jnp.asarray(b["pose_rcv"]))
        else:
            jb = {k: jnp.asarray(v) for k, v in b.items()}
        host_busy += time.perf_counter() - h0
        rng, sub = jax.random.split(rng)
        if pending is not None:
            np.asarray(pending[0][0, 0, 0])  # drain previous (overlap 1)
        pending = t.sample_step(params, jb, sub, "real")
        done += 1
    if pending is not None:
        np.asarray(pending[0][0, 0, 0])
    dt = time.perf_counter() - t0
    e2e_rate = done * batch_size / dt
    print(f"loader-only: {loader_rate:.0f} img/s "
          f"(num_workers={num_workers}, fields={fields})")
    print(f"end-to-end:  {e2e_rate:.0f} img/s over {done} batches of "
          f"{batch_size} (host busy {100 * host_busy / dt:.0f}% of wall)")
    print(f"device demand at 4400 img/s vs loader supply: "
          f"{loader_rate / 4400:.2f} cores-equivalent ratio")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "build":
        build(int(sys.argv[2]) if len(sys.argv) > 2 else 25600)
    elif cmd == "serve":
        serve(int(sys.argv[2]) if len(sys.argv) > 2 else 256,
              int(sys.argv[3]) if len(sys.argv) > 3 else 40,
              int(sys.argv[4]) if len(sys.argv) > 4 else 0,
              sys.argv[5] if len(sys.argv) > 5 else "all")
    else:
        raise SystemExit("build|serve")
