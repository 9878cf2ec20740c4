"""Smoke-test the int8 quality-gate script at a tiny config so the
sweep/check/train plumbing can't bitrot between TPU quality runs."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_quality_sweep_smoke(tmp_path):
    import int8_quality as q

    tiny = dict(img_H=32, img_W=16, batch_size=4, conv_hidden_num=16,
                z_num=16, compute_dtype="float32")
    q.train(3, str(tmp_path), pool_size=2, cfg_overrides=tiny)
    rows = q.sweep(str(tmp_path), n_batches=2, cfg_overrides=tiny)
    assert set(rows) == {"absmax", "percentile 99.9", "entropy",
                         "per-channel (default)", "tail-fallback (legacy)",
                         "tail-fallback (island)"}
    for label, r in rows.items():
        assert 0.0 <= r["ssim_int8_float"] <= 1.0, (label, r)
        assert abs(r["delta"]) < 0.5, (label, r)

    # deploy gate: passes at generous thresholds on the 3-step ckpt
    # (near-init net, int8 tracks float tightly), fails when impossibly
    # strict — and returns rather than raises either way.
    assert q.gate(str(tmp_path), max_delta=0.5, min_ssim=0.0,
                  cfg_overrides=tiny) is True
    assert q.gate(str(tmp_path), max_delta=0.5, min_ssim=1.1,
                  cfg_overrides=tiny) is False
