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
