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

    # resume guard: re-running train with a target at/below the restored
    # step must NOT write a mislabeled checkpoint (ADVICE r4)
    from dpig_tpu.train import checkpoint as ckpt
    before = ckpt.latest_checkpoint(str(tmp_path))
    q.train(2, str(tmp_path), pool_size=2, cfg_overrides=tiny)
    assert ckpt.latest_checkpoint(str(tmp_path)) == before
    assert not os.path.exists(os.path.join(str(tmp_path), "ckpt", "step_00000002"))


def test_transfer_gate_smoke(tmp_path):
    """--transfer runs the full int8 pipeline (QuantizedEncoder ->
    chained-int8 generator, the model-12 tester wiring) against the
    all-float one and reports the encoder embedding rel-error."""
    import pytest
    import int8_quality as q

    tiny = dict(img_H=32, img_W=16, batch_size=4, conv_hidden_num=16,
                z_num=16, compute_dtype="float32")
    q.train(3, str(tmp_path), pool_size=2, cfg_overrides=tiny)
    r = q.check(str(tmp_path), n_batches=2, transfer=True,
                cfg_overrides=tiny)
    assert 0.0 <= r["ssim_int8_float"] <= 1.0
    assert 0.0 <= r["emb_rel_err"] < 1.0  # int8 encoder tracks float
    assert abs(r["delta"]) < 0.5
    assert q.gate(str(tmp_path), max_delta=0.5, min_ssim=0.0,
                  transfer=True, cfg_overrides=tiny) is True

    # no int8 encoder exists at 256 — the flag must fail loudly there
    with pytest.raises(AssertionError, match="256"):
        q.check(str(tmp_path), n_batches=2, transfer=True,
                cfg_overrides=dict(tiny, img_H=256, img_W=256))


def test_gen_repeat_df256_shape():
    """--size=256 must check the generator at repeat_num-1 (the DF
    model-101 generator depth, trainer_256.py:597) and keep quality
    batches under the 256^2 calibration OOM ceiling."""
    import int8_quality as q
    from dpig_tpu.config import Config

    assert q._gen_repeat(Config(img_H=128, img_W=64)) == 5
    assert q._gen_repeat(Config(**q.DF256)) == 5  # 256: repeat 6 -> gen 5
    assert Config(**q.DF256).repeat_num == 6
    assert q.DF256["batch_size"] <= 32
