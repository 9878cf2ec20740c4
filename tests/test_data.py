"""TFRecord codec + loader round-trips, cross-checked against TF's own
reader/writer where available."""
import io
import os

import numpy as np
import pytest

from dpig_tpu.data import tfrecord
from dpig_tpu.data.proto import example_pb2 as pb


def _jpeg_bytes(rng, h, w):
    from PIL import Image
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def make_example(rng, h=32, w=16, part_num=37, kp=18) -> bytes:
    ex = pb.Example()
    f = ex.features.feature
    for s in ("_0", "_1"):
        f[f"image_raw{s}"].bytes_list.value.append(_jpeg_bytes(rng, h, w))
        f[f"pose_peaks{s}_rcv"].float_list.value.extend(
            rng.uniform(0, h - 1, kp * 3).astype(np.float32))
        for key in ("pose_mask_r4", "pose_mask_r6"):
            f[f"{key}{s}"].int64_list.value.extend(
                rng.integers(0, 2, h * w).tolist())
        f[f"part_bbox{s}"].int64_list.value.extend(
            rng.integers(0, h // 2, part_num * 4).tolist())
        f[f"part_vis{s}"].int64_list.value.extend(
            rng.integers(0, 2, part_num).tolist())
    f["label"].int64_list.value.append(1)
    return ex.SerializeToString()


def test_tfrecord_roundtrip(tmp_path, rng):
    recs = [make_example(rng) for _ in range(5)]
    path = str(tmp_path / "t.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        for r in recs:
            w.write(r)
    got = list(tfrecord.read_records(path, verify_crc=True))
    assert got == recs


def test_tfrecord_tf_interop(tmp_path, rng):
    tf = pytest.importorskip("tensorflow")
    recs = [make_example(rng) for _ in range(3)]
    ours = str(tmp_path / "ours.tfrecord")
    with tfrecord.TFRecordWriter(ours) as w:
        for r in recs:
            w.write(r)
    # TF reads ours (with CRC checking on TF's side)
    got_tf = [bytes(x.numpy()) for x in tf.data.TFRecordDataset([ours])]
    assert got_tf == recs
    # we read TF's
    theirs = str(tmp_path / "theirs.tfrecord")
    with tf.io.TFRecordWriter(theirs) as w:
        for r in recs:
            w.write(r)
    assert list(tfrecord.read_records(theirs, verify_crc=True)) == recs


def test_native_parser_duplicate_keys_last_wins(rng):
    """proto3 map semantics: a duplicate map-entry key replaces the earlier
    value. Concatenating two serialized Examples with the same feature key
    produces exactly that wire form; the native parser must agree with
    protobuf (last entry wins, no cross-entry accumulation)."""
    from dpig_tpu.data import _native
    if _native.get_lib() is None:
        pytest.skip("no g++ available")

    def one(vals, bts=None):
        ex = pb.Example()
        ex.features.feature["f"].float_list.value.extend(vals)
        if bts is not None:
            ex.features.feature["b"].bytes_list.value.append(bts)
        return ex.SerializeToString()

    rec = one([1.0, 2.0], b"first") + one([7.0, 8.0, 9.0], b"second")
    # protobuf ground truth
    merged = pb.Example.FromString(rec)
    assert list(merged.features.feature["f"].float_list.value) == [7, 8, 9]
    assert merged.features.feature["b"].bytes_list.value[0] == b"second"

    out = _native.parse_example_features(rec, [("f", 8), ("b", 0)])
    np.testing.assert_array_equal(out["f"], [7.0, 8.0, 9.0])
    boff, blen = out["b"]
    assert rec[boff:boff + blen] == b"second"


def test_pair_loader_batches(tmp_path, rng):
    from dpig_tpu.data.loader import TFRecordPairLoader
    h, w = 32, 16
    path = str(tmp_path / "Market1501_train_00000.tfrecord")
    with tfrecord.TFRecordWriter(path) as wr:
        for _ in range(10):
            wr.write(make_example(rng, h, w))
    loader = TFRecordPairLoader(str(tmp_path), "train", batch_size=4,
                                img_h=h, img_w=w, dataset="market",
                                shuffle=False)
    batch = next(loader)
    assert batch["x"].shape == (4, h, w, 3)
    assert batch["x"].dtype == np.float32
    assert batch["x"].min() >= -1.0 and batch["x"].max() <= 1.0
    assert batch["pose_rcv"].shape == (4, 18, 3)
    assert batch["mask_r6"].shape == (4, h, w, 1)
    assert batch["part_bbox"].shape == (4, 37, 4)
    assert batch["part_vis"].shape == (4, 37)

    # deterministic order when shuffle=False
    loader2 = TFRecordPairLoader(str(tmp_path), "train", batch_size=4,
                                 img_h=h, img_w=w, dataset="market",
                                 shuffle=False)
    np.testing.assert_array_equal(batch["x"], next(loader2)["x"])


def test_pair_loader_pose_only(tmp_path, rng):
    """fields='pose_only' yields the SAME pose_rcv stream as the full
    parse (native and protobuf paths), same dict schema, zero fillers
    for the image branch."""
    from dpig_tpu.data import _native
    from dpig_tpu.data.loader import TFRecordPairLoader
    h, w = 32, 16
    path = str(tmp_path / "Market1501_test_00000.tfrecord")
    with tfrecord.TFRecordWriter(path) as wr:
        for _ in range(8):
            wr.write(make_example(rng, h, w))

    def batches(fields):
        loader = TFRecordPairLoader(str(tmp_path), "test", batch_size=4,
                                    img_h=h, img_w=w, dataset="market",
                                    shuffle=False, fields=fields)
        return next(loader)

    full, pose = batches("all"), batches("pose_only")
    assert set(pose) == set(full)
    for tag in ("", "_target"):
        np.testing.assert_array_equal(pose[f"pose_rcv{tag}"],
                                      full[f"pose_rcv{tag}"])
        assert pose[f"x{tag}"].shape == full[f"x{tag}"].shape
        assert not pose[f"x{tag}"].any()
        assert not pose[f"part_bbox{tag}"].any()

    if _native.get_lib() is not None:  # protobuf fallback agrees
        from dpig_tpu.data import loader as loader_mod
        rec = make_example(rng, h, w)
        native = loader_mod._parse_pose_only(rec, h, w, 37, 18)
        orig = _native.get_lib
        _native.get_lib = lambda: None
        try:
            fallback = loader_mod._parse_pose_only(rec, h, w, 37, 18)
        finally:
            _native.get_lib = orig
        np.testing.assert_array_equal(native["pose_rcv"],
                                      fallback["pose_rcv"])


def test_native_scanner_matches_python(tmp_path, rng):
    from dpig_tpu.data import _native
    if _native.get_lib() is None:
        import pytest
        pytest.skip("no g++ available")
    recs = [make_example(rng) for _ in range(4)]
    path = str(tmp_path / "n.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        for r in recs:
            w.write(r)
    offs, lens = _native.scan_tfrecord(path, verify_crc=True)
    assert len(offs) == 4
    mf = _native.MmapRecordFile(path)
    assert [mf[i] for i in range(4)] == recs
    # reader fast path produces identical records
    assert list(tfrecord.read_records(path, verify_crc=True)) == recs


def test_pair_loader_workers_order_identical(tmp_path, rng):
    """Worker-pool path must produce byte-identical batches in the same
    order as the sequential path (test-order determinism, reference
    trainer.py:108-110)."""
    from dpig_tpu.data.loader import TFRecordPairLoader
    path = str(tmp_path / "d_train_0.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        for _ in range(12):
            w.write(make_example(rng))

    def batches(num_workers, shuffle, worker_mode="thread"):
        loader = TFRecordPairLoader(str(tmp_path), "train", batch_size=4,
                                    img_h=32, img_w=16, shuffle=shuffle,
                                    seed=7, num_workers=num_workers,
                                    worker_mode=worker_mode)
        return [next(loader) for _ in range(3)]

    for shuffle in (False, True):
        seq = batches(0, shuffle)
        for mode in ("thread", "process"):
            par = batches(2, shuffle, worker_mode=mode)
            for b0, b1 in zip(seq, par):
                assert set(b0) == set(b1)
                for k in b0:
                    np.testing.assert_array_equal(b0[k], b1[k])


def test_pair_loader_worker_throughput(tmp_path, rng):
    """Measured sanity only (1-core CI box): the worker path must not be
    slower than ~2x sequential, and it reports img/s for the record."""
    import time
    from dpig_tpu.data.loader import TFRecordPairLoader
    path = str(tmp_path / "d_train_0.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        for _ in range(64):
            w.write(make_example(rng))

    def measure(num_workers):
        loader = TFRecordPairLoader(str(tmp_path), "train", batch_size=16,
                                    img_h=32, img_w=16, shuffle=True,
                                    seed=1, num_workers=num_workers)
        next(loader)  # warm the pipeline
        t0 = time.perf_counter()
        for _ in range(6):
            next(loader)
        return 6 * 16 / (time.perf_counter() - t0)

    seq = measure(0)
    par = measure(2)
    print(f"loader img/s: sequential={seq:.0f} workers2={par:.0f}")
    assert par > seq * 0.5


def test_native_example_parser_matches_protobuf(tmp_path, rng, monkeypatch):
    """The C++ single-pass wire parser must be bit-identical to the
    protobuf path on every field, for both flavors and odd shapes."""
    from dpig_tpu.data import loader as L
    from dpig_tpu.data import _native
    assert _native.get_lib() is not None, "native scanner failed to build"
    for (h, w) in ((32, 16), (48, 24)):
        for _ in range(5):
            rec = make_example(rng, h, w)
            got = L.parse_example(rec, h, w)
            monkeypatch.setattr(L, "_parse_example_native",
                                lambda *a, **k: None)
            want = L.parse_example(rec, h, w)
            monkeypatch.undo()
            assert set(got) == set(want)
            for k in want:
                np.testing.assert_array_equal(got[k], want[k], err_msg=k)
                assert got[k].dtype == want[k].dtype, k


def test_multihost_few_shards_round_robin(tmp_path, rng):
    """With fewer shards than hosts and shuffle=False, hosts must see
    DISJOINT record streams (round-robin), not identical copies."""
    from dpig_tpu.data.loader import TFRecordPairLoader
    h, w = 32, 16
    path = str(tmp_path / "Market1501_train_00000.tfrecord")
    with tfrecord.TFRecordWriter(path) as wr:
        for _ in range(8):
            wr.write(make_example(rng, h, w))
    batches = []
    for hid in range(2):
        loader = TFRecordPairLoader(str(tmp_path), "train", batch_size=4,
                                    img_h=h, img_w=w, dataset="market",
                                    shuffle=False, host_id=hid, host_count=2)
        batches.append(next(loader))
    assert not np.allclose(batches[0]["x"], batches[1]["x"])
    # together the two hosts cover all 8 records exactly once
    loader_all = TFRecordPairLoader(str(tmp_path), "train", batch_size=8,
                                    img_h=h, img_w=w, dataset="market",
                                    shuffle=False)
    full = next(loader_all)["x"]
    got = np.concatenate([batches[0]["x"], batches[1]["x"]])
    assert np.allclose(np.sort(got.reshape(8, -1), axis=0),
                       np.sort(full.reshape(8, -1), axis=0))


def test_round_robin_num_samples_is_per_host(tmp_path, rng):
    """In the fewer-shards-than-hosts path num_samples must report the
    per-host strided count, not the global pair count, so shuffle=False
    callers sizing iteration from it don't hit StopIteration early."""
    import pickle
    from dpig_tpu.data.loader import TFRecordPairLoader
    h, w = 32, 16
    path = str(tmp_path / "Market1501_train_00000.tfrecord")
    with tfrecord.TFRecordWriter(path) as wr:
        for _ in range(7):
            wr.write(make_example(rng, h, w))
    with open(tmp_path / "pn_pairs_num_train.p", "wb") as f:
        pickle.dump(7, f, protocol=2)
    counts = []
    for hid in range(2):
        loader = TFRecordPairLoader(str(tmp_path), "train", batch_size=1,
                                    img_h=h, img_w=w, dataset="market",
                                    shuffle=False, host_id=hid, host_count=2)
        counts.append(loader.num_samples)
        # the loader must actually yield that many samples
        got = 0
        try:
            for _ in range(10):
                next(loader)
                got += 1
        except StopIteration:
            pass
        assert got == loader.num_samples, (hid, got, loader.num_samples)
    assert counts == [4, 3]


def test_prefetch_queue_sticky_stop(tmp_path, rng):
    """After the producer's StopIteration sentinel, every further next()
    must re-raise StopIteration instead of hanging on the empty queue."""
    from dpig_tpu.data.loader import TFRecordPairLoader
    h, w = 32, 16
    path = str(tmp_path / "Market1501_test_00000.tfrecord")
    with tfrecord.TFRecordWriter(path) as wr:
        for _ in range(4):
            wr.write(make_example(rng, h, w))
    loader = TFRecordPairLoader(str(tmp_path), "test", batch_size=4,
                                img_h=h, img_w=w, dataset="market",
                                shuffle=False, num_workers=1,
                                prefetch_batches=2)
    assert next(loader)["x"].shape == (4, h, w, 3)
    import pytest
    for _ in range(3):  # repeated calls after exhaustion must NOT hang
        with pytest.raises(StopIteration):
            next(loader)


def test_shard_split_num_samples_is_per_host(tmp_path, rng):
    """In the shards>=hosts path num_samples must also be per-host —
    counted exactly from this host's shards (they can be uneven), not
    the global sidecar pair count."""
    import pickle
    from dpig_tpu.data.loader import TFRecordPairLoader
    h, w = 32, 16
    # two UNEVEN shards: 5 + 2 records
    for i, n in enumerate((5, 2)):
        p = str(tmp_path / f"Market1501_train_{i:05d}.tfrecord")
        with tfrecord.TFRecordWriter(p) as wr:
            for _ in range(n):
                wr.write(make_example(rng, h, w))
    with open(tmp_path / "pn_pairs_num_train.p", "wb") as f:
        pickle.dump(7, f, protocol=2)
    counts = []
    for hid in range(2):
        loader = TFRecordPairLoader(str(tmp_path), "train", batch_size=1,
                                    img_h=h, img_w=w, dataset="market",
                                    shuffle=False, host_id=hid, host_count=2)
        counts.append(loader.num_samples)
        got = 0
        try:
            for _ in range(10):
                next(loader)
                got += 1
        except StopIteration:
            pass
        assert got == loader.num_samples, (hid, got, loader.num_samples)
    assert counts == [5, 2]


def test_count_records_matches_read_records(tmp_path, rng):
    p = str(tmp_path / "c.tfrecord")
    with tfrecord.TFRecordWriter(p) as wr:
        for _ in range(9):
            wr.write(make_example(rng, 32, 16))
    assert tfrecord.count_records(p) == 9
    assert sum(1 for _ in tfrecord.read_records(p)) == 9


def test_multihost_num_samples_without_sidecar(tmp_path, rng):
    """With no pn_pairs_num sidecar, multi-host loaders count records by
    header-seek scan — per-host in both the striding and shard-split
    branches."""
    from dpig_tpu.data.loader import TFRecordPairLoader
    h, w = 32, 16
    # one shard, 5 records -> striding branch
    p = str(tmp_path / "Market1501_train_00000.tfrecord")
    with tfrecord.TFRecordWriter(p) as wr:
        for _ in range(5):
            wr.write(make_example(rng, h, w))
    counts = [TFRecordPairLoader(str(tmp_path), "train", batch_size=1,
                                 img_h=h, img_w=w, dataset="market",
                                 shuffle=False, host_id=hid, host_count=2
                                 ).num_samples for hid in range(2)]
    assert counts == [3, 2]
    # second shard (2 records) -> shard-split branch
    p2 = str(tmp_path / "Market1501_train_00001.tfrecord")
    with tfrecord.TFRecordWriter(p2) as wr:
        for _ in range(2):
            wr.write(make_example(rng, h, w))
    counts = [TFRecordPairLoader(str(tmp_path), "train", batch_size=1,
                                 img_h=h, img_w=w, dataset="market",
                                 shuffle=False, host_id=hid, host_count=2
                                 ).num_samples for hid in range(2)]
    assert counts == [5, 2]


def test_native_parser_fuzz_no_crash(rng):
    """Byte-mutated records must never crash the C++ wire parser: every
    mutation either parses (possibly to different values) or fails
    cleanly into the protobuf fallback inside parse_example."""
    from dpig_tpu.data import _native
    from dpig_tpu.data.loader import parse_example
    rec = bytearray(make_example(rng, 32, 16))
    wanted = [("pose_peaks_0_rcv", 54), ("pose_peaks_1_rcv", 54)]
    for trial in range(60):
        mut = bytearray(rec)
        for _ in range(rng.integers(1, 8)):
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        mut = bytes(mut)
        try:
            _native.parse_example_features(mut, wanted)
        except (IOError, OSError, ValueError):
            pass  # clean native rejection
        try:
            parse_example(mut, 32, 16, fields="pose_only")
        except Exception:
            pass  # fallback may reject malformed protos — fine, no crash
    # truncations at every prefix length class
    for cut in (0, 1, 7, len(rec) // 2, len(rec) - 1):
        try:
            _native.parse_example_features(bytes(rec[:cut]), wanted)
        except (IOError, OSError, ValueError):
            pass
