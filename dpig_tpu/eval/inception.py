"""Inception Score — exact protocol parity with
tflib/inception_score.py:25-55: batch 100, 10 splits,
IS = exp(mean_split KL(p(y|x) || p(y))).

The classifier is pluggable because the 2015-12-05 frozen Inception graph
cannot be downloaded in a zero-egress environment:
  * `logits_fn`: any callable [N,H,W,3] uint8 -> [N,1008] logits/probs.
  * `frozen_graph_logits_fn(pb_path)`: loads the reference's exact frozen
    GraphDef via TF if the file is present locally (the reference downloads
    it to /tmp/imagenet, tflib/inception_score.py:12-20).
"""
from __future__ import annotations

import os
from typing import Callable, Sequence, Tuple

import numpy as np

SPLITS = 10       # tflib/inception_score.py:25
BATCH_SIZE = 100  # tflib/inception_score.py:35


def inception_score_from_probs(preds: np.ndarray,
                               splits: int = SPLITS) -> Tuple[float, float]:
    """exp(mean KL) over `splits` chunks (tflib/inception_score.py:44-55)."""
    preds = np.asarray(preds, np.float64)
    scores = []
    n = preds.shape[0]
    for i in range(splits):
        part = preds[(i * n // splits):((i + 1) * n // splits)]
        kl = part * (np.log(part) - np.log(
            np.expand_dims(np.mean(part, 0), 0)))
        kl = np.mean(np.sum(kl, 1))
        scores.append(np.exp(kl))
    return float(np.mean(scores)), float(np.std(scores))


def get_inception_score(images: Sequence[np.ndarray],
                        logits_fn: Callable[[np.ndarray], np.ndarray],
                        splits: int = SPLITS,
                        batch_size: int = BATCH_SIZE) -> Tuple[float, float]:
    """images: list of [H,W,3] uint8-range arrays (the protocol's input)."""
    assert isinstance(images, (list, tuple)) or images.ndim == 4
    preds = []
    n = len(images)
    n_batches = int(np.ceil(n / batch_size))
    for i in range(n_batches):
        batch = np.stack(images[i * batch_size:(i + 1) * batch_size]).astype(
            np.float32)
        p = np.asarray(logits_fn(batch), np.float64)
        if (p < 0).any() or not np.allclose(p.sum(-1), 1.0, atol=1e-3):
            # logits -> softmax
            p = np.exp(p - p.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
        preds.append(p)
    return inception_score_from_probs(np.concatenate(preds, 0), splits)


INCEPTION_URL = ("http://download.tensorflow.org/models/image/imagenet/"
                 "inception-2015-12-05.tgz")
INCEPTION_PB = "classify_image_graph_def.pb"
DEFAULT_CACHE = "/tmp/imagenet"  # the reference's MODEL_DIR (inception_score.py:12)


def ensure_inception_graph(cache_dir: str = DEFAULT_CACHE,
                           sha256: str = "") -> "str | None":
    """Bootstrap the 2015-12-05 frozen Inception graph like the reference
    (tflib/inception_score.py:12-20): reuse a cached copy, else download
    + extract if the network is reachable. Returns the .pb path, or None
    when unreachable (callers then require --inception_pb).

    Integrity: if `sha256` is given (or env DPIG_INCEPTION_SHA256), the
    tarball is checked against it; the extracted GraphDef is always
    structurally validated by parsing it before use.
    """
    import hashlib
    import tarfile
    import urllib.request

    pb_path = os.path.join(cache_dir, INCEPTION_PB)
    if os.path.exists(pb_path):
        return pb_path
    os.makedirs(cache_dir, exist_ok=True)
    tgz = os.path.join(cache_dir, os.path.basename(INCEPTION_URL))
    try:
        if not os.path.exists(tgz):
            print(f"[*] downloading {INCEPTION_URL} ...", flush=True)
            urllib.request.urlretrieve(INCEPTION_URL, tgz)
    except Exception as e:  # zero-egress / offline: degrade loudly
        print(f"[!] inception graph download failed ({e}); pass "
              "--inception_pb to score with the protocol classifier",
              flush=True)
        return None
    want = sha256 or os.environ.get("DPIG_INCEPTION_SHA256", "")
    if want:
        h = hashlib.sha256()
        with open(tgz, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != want:
            raise IOError(f"{tgz}: sha256 {h.hexdigest()} != expected {want}")
    try:
        with tarfile.open(tgz, "r:gz") as tar:
            member = tar.getmember(INCEPTION_PB)
            tar.extract(member, cache_dir)
    except (tarfile.TarError, EOFError, KeyError) as e:
        # a truncated/corrupt download must not poison the cache: drop it
        # so the next run re-downloads instead of crashing forever
        os.remove(tgz)
        print(f"[!] cached inception tarball was corrupt ({e}); removed "
              f"{tgz} — rerun to re-download, or pass --inception_pb",
              flush=True)
        return None
    # structural validation: a frozen GraphDef must parse
    try:
        import tensorflow as tf
        gd = tf.compat.v1.GraphDef()
        with open(pb_path, "rb") as f:
            gd.ParseFromString(f.read())
    except ImportError:
        pass  # no TF: frozen_graph_logits_fn will fail loudly later anyway
    return pb_path


def frozen_graph_logits_fn(pb_path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Load the reference's frozen Inception graph (requires TF + the local
    classify_image_graph_def.pb; same tensor endpoints as
    tflib/inception_score.py:58-100)."""
    if not os.path.exists(pb_path):
        raise FileNotFoundError(
            f"{pb_path} not found. The reference downloads "
            "http://download.tensorflow.org/models/image/imagenet/"
            "inception-2015-12-05.tgz; place classify_image_graph_def.pb "
            "locally to score with the exact protocol classifier.")
    import tensorflow as tf  # local import: TF only needed for this path

    graph_def = tf.compat.v1.GraphDef()
    with open(pb_path, "rb") as f:
        graph_def.ParseFromString(f.read())

    graph = tf.Graph()
    with graph.as_default():
        tf.import_graph_def(graph_def, name="")
    sess = tf.compat.v1.Session(graph=graph)
    softmax = graph.get_tensor_by_name("softmax:0")

    def logits_fn(batch: np.ndarray) -> np.ndarray:
        # the reference feeds ExpandDims:0 one batch at a time with patched
        # batch dims; modern TF accepts dynamic batch through the same node
        return sess.run(softmax,
                        {"ExpandDims:0": batch}).reshape(batch.shape[0], -1)

    return logits_fn
