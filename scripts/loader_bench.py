"""Loader worker-scaling measurement (VERDICT r3 weak #5).

  python scripts/loader_bench.py [n_samples] [img_H img_W]

Builds a Market-schema tfrecord fixture (natural-ish gradient+noise JPEGs
— pure-noise images are worst-case JPEG decode entropy and inflate decode
cost ~4x vs natural imagery) and measures full-decode samples/s through
TFRecordPairLoader for: sequential, thread pool x{1,2,4}, process pool
x{1,2}. Prints a table plus the feeding math (loader cores needed to
saturate each serving/training path at its measured chip rate).

On a 1-core host the pools can only show their OVERHEAD (threads ≈
sequential, processes pay submit/result pickling); thread SCALING needs a
multi-core host — PIL decode, the native ctypes wire parser, and numpy
conversions all release the GIL. Run this script on the multi-core
deployment host to verify scaling there; the process pool is the escape
hatch if a codec turns out to hold the GIL.
"""
from __future__ import annotations

import io
import os
import sys
import time

import numpy as np


def build_fixture(out_dir: str, n: int, h: int, w: int) -> None:
    from PIL import Image
    from dpig_tpu.data import tfrecord
    from dpig_tpu.data.proto import example_pb2 as pb

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    path = os.path.join(out_dir, "Market1501_train_00000.tfrecord")

    def jpeg():
        base = (128 + 100 * np.sin(xx / 7.0 + rng.uniform(0, 6))
                + 20 * rng.standard_normal((h, w)))  # gradient + mild noise
        arr = np.clip(base[..., None] + rng.integers(-30, 30, 3), 0,
                      255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        return buf.getvalue()

    with tfrecord.TFRecordWriter(path) as wr:
        for _ in range(n):
            ex = pb.Example()
            f = ex.features.feature
            for s in ("_0", "_1"):
                f[f"image_raw{s}"].bytes_list.value.append(jpeg())
                f[f"pose_peaks{s}_rcv"].float_list.value.extend(
                    rng.uniform(0, h - 1, 18 * 3).astype(np.float32))
                for key in ("pose_mask_r4", "pose_mask_r6"):
                    f[f"{key}{s}"].int64_list.value.extend(
                        rng.integers(0, 2, h * w).tolist())
                f[f"part_bbox{s}"].int64_list.value.extend(
                    rng.integers(0, h // 2, 37 * 4).tolist())
                f[f"part_vis{s}"].int64_list.value.extend(
                    rng.integers(0, 2, 37).tolist())
            wr.write(ex.SerializeToString())


def measure(out_dir: str, n: int, h: int, w: int, num_workers: int,
            worker_mode: str) -> float:
    from dpig_tpu.data.loader import TFRecordPairLoader
    loader = TFRecordPairLoader(out_dir, "train", batch_size=16,
                                img_h=h, img_w=w, shuffle=False,
                                num_workers=num_workers,
                                worker_mode=worker_mode,
                                prefetch_batches=0)
    it = iter(loader)
    next(it)  # warm up (pool spawn, native lib load)
    t0 = time.perf_counter()
    seen = 16
    for b in it:
        seen += b["x"].shape[0]
    return (seen - 16) / (time.perf_counter() - t0)


def main() -> None:
    import tempfile
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    cores = len(os.sched_getaffinity(0))
    with tempfile.TemporaryDirectory() as d:
        print(f"[*] building fixture: {n} samples {h}x{w} "
              f"(host cores: {cores})")
        build_fixture(d, n, h, w)
        rows = [("sequential", 0, "thread")]
        rows += [(f"thread x{k}", k, "thread") for k in (1, 2, 4)]
        rows += [(f"process x{k}", k, "process") for k in (1, 2)]
        results = {}
        for label, k, mode in rows:
            rate = measure(d, n, h, w, k, mode)
            results[label] = rate
            print(f"{label:12s} {rate:8.1f} samples/s", flush=True)

    seq = results["sequential"]
    print("\nFeeding math (cores needed = chip rate / per-core loader rate,"
          " using this host's sequential full-decode rate):")
    for path, chip in [("training bs128 fast (383 img/s)", 383),
                       ("transfer-path scoring (2060 img/s)", 2060),
                       ("int8 generation serving (4456 img/s)", 4456)]:
        print(f"  {path:36s} -> {chip / seq:5.1f} cores "
              f"(pose_only serving: ~0 — 54 floats/sample)")


if __name__ == "__main__":
    main()
