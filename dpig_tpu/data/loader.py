"""TFRecord pair-dataset reader (reference datasets/market1501.py:50-162,
datasets/deepfashion.py:50-171 + trainer.py:537-564 input pipeline).

Parses the published tfrecord schema into numpy batch dicts:
  x, x_target              [B,H,W,3] float32 in [-1,1]  (jpeg -> PIL)
  pose_rcv(_target)        [B,18,3]  float32 raw pixel coords
  mask_r4/r6(_target)      [B,H,W,1] float32 {0,1}
  part_bbox(_target)       [B,37,4]  int32
  part_vis(_target)        [B,37]    int32

Pose maps are NOT rendered here — they rasterize on-device inside the
jitted step (see dpig_tpu/ops/pose.py), so the host->device transfer per
sample is ~54 floats instead of a 147k-element map.

Determinism: test iteration is single-stream file order (the reference
forces num_threads=1 at test, trainer.py:108-110); training uses a
shuffle buffer with a seeded RNG.
"""
from __future__ import annotations

import io
import os
import pickle
import queue
import random
import threading
import functools
from collections import deque
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np
from PIL import Image

from . import tfrecord
from .proto import example_pb2 as pb

# mask_a fills the batch's primary "mask_r6" slot (the mask the trainers
# consume): r6 for Market (trainer.py:548-549), r4 for DF
# (trainer_256.py:240-247 reads pose_mask_r4 as `self.mask`).
MARKET_KEYS = dict(mask_b="pose_mask_r4", mask_a="pose_mask_r6")
DF_KEYS = dict(mask_b="pose_mask_r8", mask_a="pose_mask_r4")


def _feat(ex, name):
    return ex.features.feature[name]


def parse_example(record: bytes, img_h: int, img_w: int, part_num: int = 37,
                  keypoint_num: int = 18, mask_a: str = "pose_mask_r6",
                  mask_b: str = "pose_mask_r4",
                  fields: str = "all") -> Dict[str, np.ndarray]:
    """One tfrecord Example -> numpy sample dict (un-batched).

    Uses the native single-pass wire parser (data/_native tfr_parse) when
    available — the pure-Python path spends ~70% of its time crossing the
    HxW int64 mask lists into numpy (measured 270 samples/s/core vs ~2k
    native); falls back to the protobuf path bit-identically.

    fields="pose_only" parses ONLY the pose keypoint coordinates and fills
    images/masks/bboxes with zeros. Exact for the sampled-appearance
    serving path (model 11 `--sample_app`): the generator consumes
    mapper-sampled embeddings and on-device-rasterized pose maps, so the
    encoder inputs are dead code XLA eliminates — decoding the JPEGs on
    the host would burn the serving core for nothing (~4x loader speedup,
    scripts/serving_demo.py)."""
    if fields == "pose_only":
        return _parse_pose_only(record, img_h, img_w, part_num,
                                keypoint_num)
    native = _parse_example_native(record, img_h, img_w, part_num,
                                   keypoint_num, mask_a, mask_b)
    if native is not None:
        return native
    ex = pb.Example.FromString(record)
    out: Dict[str, np.ndarray] = {}
    for suffix, tag in (("_0", ""), ("_1", "_target")):
        raw = _feat(ex, f"image_raw{suffix}").bytes_list.value[0]
        img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"),
                         np.float32)
        out[f"x{tag}"] = img / 127.5 - 1.0
        rcv = np.asarray(_feat(ex, f"pose_peaks{suffix}_rcv").float_list.value,
                         np.float32).reshape(keypoint_num, 3)
        out[f"pose_rcv{tag}"] = rcv
        for store, key in (("mask_r6", mask_a), ("mask_r4", mask_b)):
            vals = _feat(ex, f"{key}{suffix}").int64_list.value
            if len(vals) != img_h * img_w:
                raise KeyError(
                    f"feature {key}{suffix} has {len(vals)} values, expected "
                    f"{img_h}x{img_w} — wrong dataset flavor? (Market stores "
                    "pose_mask_r4/r6, DF stores pose_mask_r4/r8; the flavor "
                    "is chosen by whether 'market' is in the dataset name, "
                    "as in the reference trainer.py:35)")
            out[f"{store}{tag}"] = np.asarray(vals, np.float32).reshape(
                img_h, img_w, 1)
        out[f"part_bbox{tag}"] = np.asarray(
            _feat(ex, f"part_bbox{suffix}").int64_list.value,
            np.int32).reshape(part_num, 4)
        out[f"part_vis{tag}"] = np.asarray(
            _feat(ex, f"part_vis{suffix}").int64_list.value, np.int32)
    return out


_POSE_ONLY_ZEROS: Dict[tuple, tuple] = {}


def _parse_pose_only(record: bytes, img_h: int, img_w: int,
                     part_num: int, keypoint_num: int
                     ) -> Dict[str, np.ndarray]:
    """fields="pose_only" parse: real pose_rcv(+_target), zero fillers for
    the image-branch keys (same dict schema, so jitted step signatures are
    unchanged)."""
    from . import _native
    rcvs = {}
    wanted = [(f"pose_peaks{s}_rcv", keypoint_num * 3) for s in ("_0", "_1")]
    feats = None
    try:
        feats = _native.parse_example_features(record, wanted)
    except IOError:
        feats = None
    if feats is not None:
        for (name, cap) in wanted:
            v = feats[name]
            if not isinstance(v, np.ndarray) or v.size != cap:
                feats = None
                break
            rcvs[name] = v.reshape(keypoint_num, 3)
    if feats is None:  # no native lib / malformed: protobuf fallback
        ex = pb.Example.FromString(record)
        for s in ("_0", "_1"):
            rcvs[f"pose_peaks{s}_rcv"] = np.asarray(
                _feat(ex, f"pose_peaks{s}_rcv").float_list.value,
                np.float32).reshape(keypoint_num, 3)
    # shared read-only zero fillers (one allocation per shape per process —
    # consumers treat loader output as immutable; jnp.asarray copies)
    key = (img_h, img_w, part_num)
    if key not in _POSE_ONLY_ZEROS:
        _POSE_ONLY_ZEROS[key] = (
            np.zeros((img_h, img_w, 3), np.float32),
            np.zeros((img_h, img_w, 1), np.float32),
            np.zeros((part_num, 4), np.int32),
            np.zeros((part_num,), np.int32))
    zero_img, zero_mask, zero_bbox, zero_vis = _POSE_ONLY_ZEROS[key]
    out: Dict[str, np.ndarray] = {}
    for suffix, tag in (("_0", ""), ("_1", "_target")):
        out[f"x{tag}"] = zero_img
        out[f"pose_rcv{tag}"] = rcvs[f"pose_peaks{suffix}_rcv"]
        out[f"mask_r6{tag}"] = zero_mask
        out[f"mask_r4{tag}"] = zero_mask
        out[f"part_bbox{tag}"] = zero_bbox
        out[f"part_vis{tag}"] = zero_vis
    return out


def _parse_example_native(record: bytes, img_h: int, img_w: int,
                          part_num: int, keypoint_num: int,
                          mask_a: str, mask_b: str
                          ) -> Optional[Dict[str, np.ndarray]]:
    from . import _native
    px = img_h * img_w
    wanted = []
    for s in ("_0", "_1"):
        wanted += [(f"image_raw{s}", 0),
                   (f"pose_peaks{s}_rcv", keypoint_num * 3),
                   (f"{mask_a}{s}", px), (f"{mask_b}{s}", px),
                   (f"part_bbox{s}", part_num * 4),
                   (f"part_vis{s}", part_num)]
    try:
        feats = _native.parse_example_features(record, wanted)
    except IOError:
        return None  # malformed under the fast path: let protobuf report
    if feats is None:
        return None  # no native library (no g++); protobuf fallback
    out: Dict[str, np.ndarray] = {}
    for suffix, tag in (("_0", ""), ("_1", "_target")):
        raw = feats[f"image_raw{suffix}"]
        if not isinstance(raw, tuple):
            return None
        off, ln = raw
        img = np.asarray(Image.open(io.BytesIO(record[off:off + ln]))
                         .convert("RGB"), np.float32)
        out[f"x{tag}"] = img / 127.5 - 1.0
        rcv = feats[f"pose_peaks{suffix}_rcv"]
        if not isinstance(rcv, np.ndarray) or rcv.size != keypoint_num * 3:
            return None  # absent/oversized: let the protobuf path report
        out[f"pose_rcv{tag}"] = rcv.reshape(keypoint_num, 3)
        for store, key in (("mask_r6", mask_a), ("mask_r4", mask_b)):
            vals = feats[f"{key}{suffix}"]
            # an int means the feature exceeded the expected capacity (the
            # native parser reports the TRUE count instead of truncating)
            n_vals = (0 if vals is None else
                      vals if isinstance(vals, int) else vals.size)
            if not isinstance(vals, np.ndarray) or vals.size != px:
                raise KeyError(
                    f"feature {key}{suffix} has {n_vals} values, expected "
                    f"{img_h}x{img_w} — wrong dataset flavor? (Market stores "
                    "pose_mask_r4/r6, DF stores pose_mask_r4/r8; the flavor "
                    "is chosen by whether 'market' is in the dataset name, "
                    "as in the reference trainer.py:35)")
            out[f"{store}{tag}"] = vals.reshape(img_h, img_w, 1)
        bbox = feats[f"part_bbox{suffix}"]
        vis = feats[f"part_vis{suffix}"]
        if (not isinstance(bbox, np.ndarray) or bbox.size != part_num * 4
                or not isinstance(vis, np.ndarray)
                or vis.size != part_num):
            return None
        out[f"part_bbox{tag}"] = bbox.astype(np.int32).reshape(part_num, 4)
        out[f"part_vis{tag}"] = vis.astype(np.int32)
    return out


def iter_records(shards: List[str], repeat: bool = False) -> Iterator[bytes]:
    while True:
        for shard in shards:
            yield from tfrecord.read_records(shard)
        if not repeat:
            return


def iter_examples(shards: List[str], img_h: int, img_w: int,
                  mask_keys: Dict[str, str], part_num: int = 37,
                  repeat: bool = False,
                  num_workers: int = 0, stride: int = 1,
                  offset: int = 0,
                  fields: str = "all",
                  worker_mode: str = "thread"
                  ) -> Iterator[Dict[str, np.ndarray]]:
    """Parsed-sample stream. num_workers > 0 parses/decodes on an executor
    with an ordered in-flight window, so the output ORDER is identical
    to the sequential path for any worker count (the reference pins test
    readers to 1 thread for order, trainer.py:108-110 — here order is
    deterministic even with workers). stride/offset select every
    `stride`-th record starting at `offset` (multi-host round-robin when
    there are fewer shards than hosts).

    worker_mode: 'thread' (default — PIL decode, the native ctypes parser,
    and numpy conversions all release the GIL, so threads scale on
    multi-core hosts with zero copy overhead) or 'process' (a
    ProcessPoolExecutor fallback for GIL-bound decode paths; each sample
    pays record-submit + ~300 KB result pickling, so prefer threads unless
    a profiler shows GIL serialization)."""
    if worker_mode not in ("thread", "process"):
        raise ValueError(f"unknown worker_mode {worker_mode!r}")
    records = iter_records(shards, repeat)
    if stride > 1:
        records = (r for i, r in enumerate(records)
                   if i % stride == offset)

    # module-level partial (not a closure) so the process pool can pickle it
    parse = functools.partial(parse_example, img_h=img_h, img_w=img_w,
                              part_num=part_num,
                              mask_a=mask_keys["mask_a"],
                              mask_b=mask_keys["mask_b"], fields=fields)

    if num_workers <= 0:
        for rec in records:
            yield parse(rec)
        return

    if worker_mode == "process":
        # forkserver: plain fork() from a thread-carrying parent (the
        # loader's own prefetch thread, JAX's runtime threads) can deadlock
        # the child on inherited lock state
        import multiprocessing
        pool = ProcessPoolExecutor(
            num_workers, mp_context=multiprocessing.get_context("forkserver"))
    else:
        pool = ThreadPoolExecutor(num_workers)
    with pool:
        pending: deque = deque()
        window = num_workers * 4
        for rec in records:
            pending.append(pool.submit(parse, rec))
            if len(pending) >= window:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()


class TFRecordPairLoader:
    """Batched iterator over a DPIG pair dataset directory.

    dataset_dir layout mirrors the published bundles:
      <dir>/<name>_<split>_*.tfrecord  +  pn_pairs_num_<split>.p
    """

    def __init__(self, dataset_dir: str, split: str, batch_size: int,
                 img_h: int, img_w: int, dataset: str = "market",
                 shuffle: bool = True, seed: int = 0,
                 shuffle_buffer: int = 512,
                 host_id: int = 0, host_count: int = 1,
                 num_workers: int = 0, prefetch_batches: int = 2,
                 fields: str = "all", part_num: int = 37,
                 worker_mode: str = "thread"):
        self.dataset_dir = dataset_dir
        self.batch_size = batch_size
        self.img_h, self.img_w = img_h, img_w
        self.part_num = part_num
        self.mask_keys = MARKET_KEYS if "market" in dataset.lower() else DF_KEYS
        self.shuffle = shuffle
        self._fields = fields
        self._rng = random.Random(seed)
        self._buffer: List[Dict[str, np.ndarray]] = []
        self._buffer_size = shuffle_buffer if shuffle else 0

        shards = [os.path.join(dataset_dir, f) for f in
                  sorted(os.listdir(dataset_dir)) if ".tfrecord" in f
                  and split in f]
        if not shards:
            raise FileNotFoundError(
                f"no *{split}*.tfrecord shards in {dataset_dir}")
        # Multi-host: each host reads a disjoint shard subset (pass
        # host_id=jax.process_index(), host_count=jax.process_count()).
        self._record_stride = 1
        self._record_offset = 0
        if host_count > 1:
            if len(shards) >= host_count:
                shards = shards[host_id::host_count]
            else:
                # Fewer shards than hosts: every host must still see a
                # DISJOINT record stream (a reseeded shuffle only
                # decorrelates orders; with shuffle=False it would feed
                # every host identical records and silently duplicate the
                # global batch). Round-robin records by host instead.
                self._record_stride = host_count
                self._record_offset = host_id
                self._rng = random.Random(seed * host_count + host_id)
        self.shards = shards
        self.num_samples = self._load_pair_count(split)
        # num_samples is PER-HOST in every multi-host configuration, so
        # callers sizing iteration from it never hit StopIteration early
        # with shuffle=False (single-host: == the global pair count).
        if host_count > 1:
            from .tfrecord import count_records
            if self._record_stride > 1:
                # Round-robin record striding over UN-split shards: this
                # host only sees records with index ≡ offset (mod stride)
                total = self.num_samples
                if total is None:
                    total = sum(count_records(s) for s in shards)
                self.num_samples = (
                    total - self._record_offset
                    + self._record_stride - 1) // self._record_stride
            else:
                # Shard-split path: shards may hold uneven record counts,
                # so count this host's records exactly (header-seek scan,
                # no payload reads — one-time init cost)
                self.num_samples = sum(count_records(s) for s in shards)
        self._it = iter_examples(shards, img_h, img_w, self.mask_keys,
                                 part_num=part_num,
                                 repeat=shuffle, num_workers=num_workers,
                                 stride=self._record_stride,
                                 offset=self._record_offset, fields=fields,
                                 worker_mode=worker_mode)
        # Batch prefetch: a daemon thread keeps `prefetch_batches` assembled
        # batches ahead so host decode overlaps device compute (the
        # reference's tf.train.batch queue runners, trainer.py:553-555).
        self._queue: Optional[queue.Queue] = None
        self._terminal = None  # sticky _END / producer exception
        if num_workers > 0 and prefetch_batches > 0:
            self._queue = queue.Queue(maxsize=prefetch_batches)
            self._thread = threading.Thread(target=self._producer,
                                            daemon=True)
            self._thread.start()

    _END = object()

    def _producer(self) -> None:
        try:
            while True:
                self._queue.put(self._assemble_batch())
        except StopIteration:
            self._queue.put(self._END)
        except Exception as e:  # surface loader crashes to the consumer
            self._queue.put(e)

    def _load_pair_count(self, split: str) -> Optional[int]:
        p = os.path.join(self.dataset_dir, f"pn_pairs_num_{split}.p")
        if os.path.exists(p):
            with open(p, "rb") as f:
                # py2 pickle (reference datasets/market1501.py:150-153)
                return int(pickle.load(f, encoding="latin1"))
        return None

    def _next_sample(self) -> Dict[str, np.ndarray]:
        if not self.shuffle:
            return next(self._it)
        while len(self._buffer) < self._buffer_size:
            try:
                self._buffer.append(next(self._it))
            except StopIteration:
                break
        if not self._buffer:
            raise StopIteration
        idx = self._rng.randrange(len(self._buffer))
        self._buffer[idx], self._buffer[-1] = self._buffer[-1], self._buffer[idx]
        return self._buffer.pop()

    def _assemble_batch(self) -> Dict[str, np.ndarray]:
        samples = [self._next_sample() for _ in range(self.batch_size)]
        if self._fields == "pose_only":
            # Stack only the live pose keys; the image-branch keys are
            # all-zero fillers — share one cached zero BATCH instead of
            # re-copying ~70 MB of zeros per batch (~9x assembly speedup).
            out = dict(self._pose_only_zero_batch(len(samples)))
            for k in ("pose_rcv", "pose_rcv_target"):
                out[k] = np.stack([s[k] for s in samples])
            return out
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    def _pose_only_zero_batch(self, b: int) -> Dict[str, np.ndarray]:
        zb = getattr(self, "_zb", None)
        if zb is None or zb["x"].shape[0] != b:
            h, w = self.img_h, self.img_w
            zi = np.zeros((b, h, w, 3), np.float32)
            zm = np.zeros((b, h, w, 1), np.float32)
            zbx = np.zeros((b, self.part_num, 4), np.int32)
            zv = np.zeros((b, self.part_num), np.int32)
            zb = {}
            for tag in ("", "_target"):
                zb[f"x{tag}"] = zi
                zb[f"mask_r6{tag}"] = zm
                zb[f"mask_r4{tag}"] = zm
                zb[f"part_bbox{tag}"] = zbx
                zb[f"part_vis{tag}"] = zv
            self._zb = zb
        return zb

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        if self._queue is None:
            return self._assemble_batch()
        # The producer puts its _END/exception sentinel exactly once and
        # exits; remember it so every LATER call re-raises instead of
        # blocking forever on an empty queue.
        if self._terminal is not None:
            raise (StopIteration() if self._terminal is self._END
                   else self._terminal)
        item = self._queue.get()
        if item is self._END or isinstance(item, Exception):
            self._terminal = item
            if item is self._END:
                raise StopIteration
            raise item
        return item
