"""ensure_inception_graph: cache reuse + offline degradation."""
import os

from dpig_tpu.eval.inception import ensure_inception_graph, INCEPTION_PB


def test_cached_pb_reused(tmp_path):
    pb = tmp_path / INCEPTION_PB
    pb.write_bytes(b"cached")
    assert ensure_inception_graph(cache_dir=str(tmp_path)) == str(pb)


def test_offline_returns_none(tmp_path, monkeypatch):
    """Zero-egress: the download fails -> None (callers skip IS loudly)."""
    import urllib.request

    def boom(*a, **k):
        raise OSError("no egress")
    monkeypatch.setattr(urllib.request, "urlretrieve", boom)
    assert ensure_inception_graph(cache_dir=str(tmp_path / "x")) is None


def test_corrupt_cached_tarball_is_removed(tmp_path):
    """A truncated/corrupt cached tarball must not poison the cache: the
    bootstrap removes it and degrades to None instead of crashing every
    subsequent run on tarfile.ReadError."""
    from dpig_tpu.eval import inception
    cache = tmp_path / "imagenet"
    cache.mkdir()
    tgz = cache / os.path.basename(inception.INCEPTION_URL)
    tgz.write_bytes(b"\x1f\x8b not actually a gzip tarball")
    assert ensure_inception_graph(cache_dir=str(cache)) is None
    assert not tgz.exists()


def test_sha_mismatch_raises(tmp_path):
    from dpig_tpu.eval import inception
    cache = tmp_path / "imagenet"
    cache.mkdir()
    tgz = cache / os.path.basename(inception.INCEPTION_URL)
    tgz.write_bytes(b"whatever bytes")
    import pytest
    with pytest.raises(IOError, match="sha256"):
        ensure_inception_graph(cache_dir=str(cache), sha256="0" * 64)
