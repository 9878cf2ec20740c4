"""DF-256 family structure: encoder at repeat_num+1 (roi 64), generator at
repeat_num-1, 5-stage discriminator (trainer_256.py:10-265). Run at 64x64
(repeat_num=4) to keep CPU cost sane while exercising the same branching.
"""
import numpy as np
import jax

from dpig_tpu.apps.stage1_app import Stage1App
from dpig_tpu.config import Config
from dpig_tpu.data.synthetic import SyntheticLoader


def test_stage1_256_branching_flags():
    cfg = Config(img_H=256, img_W=256, batch_size=2, conv_hidden_num=8,
                 z_num=8, model_dir="/tmp/t256")
    app = Stage1App(cfg, fg_bg=False)
    # 256 path: single-branch vis encoder, deeper encoder, shallower gen
    assert app.encoder.__class__.__name__ == "RoiEncoder"
    assert app.encoder.repeat_num == cfg.repeat_num + 1 == 7
    assert app.encoder.roi_size == 64
    assert app.generator.repeat_num == cfg.repeat_num - 1 == 5
    assert app.disc.n_stages == 5


def test_stage1_64_square_trains():
    # same code path shape-wise (square images, fg_bg=False like model 101)
    cfg = Config(img_H=64, img_W=64, batch_size=2, conv_hidden_num=8,
                 z_num=8, g_lr=2e-4, d_lr=2e-4, model_dir="/tmp/t64")
    app = Stage1App(cfg, fg_bg=False)
    state = app.init_state(jax.random.PRNGKey(0))
    batch = next(SyntheticLoader(2, 64, 64, seed=1))
    state, m = app.train_step(state, dict(batch), jax.random.PRNGKey(1))
    for v in m.values():
        assert np.isfinite(float(v))
    assert int(state.step) == 1
