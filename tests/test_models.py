"""Shape/dtype goldens for every network module (SURVEY §4 test plan)."""
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from dpig_tpu.models.discriminators import DCGANDiscriminator, FCDiscriminator
from dpig_tpu.models.encoders import (PlainEncoder, RoiEncoder, RoiEncoderFgBg,
                                      tile_embedding)
from dpig_tpu.models.generator import UAEGenerator
from dpig_tpu.models.mappers import GaussianMapper, sample_mapper_noise
from dpig_tpu.models.pose_ae import (PoseDecoderFC, PoseEncoderFC,
                                     assemble_pose_rcv)

KEY = jax.random.PRNGKey(0)
B, H, W = 2, 32, 16  # small but same repeat structure (repeat=3)
REPEAT = 3
HID = 32


def test_roi_encoder_fgbg_emb_dims():
    enc = RoiEncoderFgBg(part_num=7, z_num=32, repeat_num=REPEAT,
                         hidden_num=HID, roi_size=16)
    x = jnp.zeros((B, H, W, 3))
    m = jnp.ones((B, H, W, 1))
    bbox = jnp.tile(jnp.array([[0, 0, 8, 8]], jnp.int32), (B, 7, 1))[..., :4]
    vis = jnp.ones((B, 7))
    vars_ = enc.init(KEY, x, m, bbox, vis)
    out = enc.apply(vars_, x, m, bbox, vis)
    # 7 parts * 32 + 4*32 BG = 352 (reference 352-dim embedding)
    assert out.shape == (B, 7 * 32 + 128)


def test_roi_encoder_vis_zeroing():
    enc = RoiEncoder(part_num=3, z_num=8, repeat_num=2, hidden_num=8,
                     roi_size=8)
    x = jnp.ones((B, H, W, 3))
    bbox = jnp.tile(jnp.array([[2, 2, 10, 10]], jnp.int32), (B, 3, 1))
    vis = jnp.asarray([[1.0, 0.0, 1.0]] * B)
    vars_ = enc.init(KEY, x, bbox, vis)
    out = enc.apply(vars_, x, bbox, vis)
    assert out.shape == (B, 24)
    # part 1 features zeroed by visibility
    np.testing.assert_array_equal(np.asarray(out[:, 8:16]), 0.0)
    assert np.abs(np.asarray(out[:, :8])).sum() > 0


def test_uae_generator_shapes_and_bottleneck():
    gen = UAEGenerator(out_channels=3, z_num=16, repeat_num=REPEAT,
                       hidden_num=HID)
    embs = jnp.zeros((B, 52))
    x = tile_embedding(embs, H, W)
    pose = jnp.zeros((B, H, W, 18))
    vars_ = gen.init(KEY, x, pose)
    out, z = gen.apply(vars_, x, pose)
    assert out.shape == (B, H, W, 3)
    assert z.shape == (B, 16)


def test_dcgan_discriminator_output():
    d = DCGANDiscriminator(dim=16, n_stages=4, mode="dcgan")
    x = jnp.zeros((B, 128, 64, 3))
    vars_ = d.init(KEY, x, train=True)
    out, _ = d.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert out.shape == (B,)


def test_dcgan_discriminator_wgan_gp_has_no_batchstats():
    d = DCGANDiscriminator(dim=8, n_stages=4, mode="wgan-gp")
    vars_ = d.init(KEY, jnp.zeros((B, 128, 64, 3)), train=True)
    assert "batch_stats" not in vars_


def test_fc_discriminator():
    d = FCDiscriminator(fc_dim=64, n_layers=3)
    vars_ = d.init(KEY, jnp.zeros((B, 352)))
    out = d.apply(vars_, jnp.zeros((B, 352)))
    assert out.shape == (B,)


def test_pose_ae_roundtrip_shapes():
    enc = PoseEncoderFC(z_num=32, repeat_num=4, hidden_num=64)
    dec = PoseDecoderFC(keypoint_num=18, repeat_num=4, hidden_num=64)
    pose_flat = jnp.zeros((B, 54))
    ev = enc.init(KEY, pose_flat)
    z = enc.apply(ev, pose_flat)
    assert z.shape == (B, 32)
    dv = dec.init(KEY, z)
    coords, vis = dec.apply(dv, z)
    assert coords.shape == (B, 36) and vis.shape == (B, 18)
    # STE visibility is exactly binary
    v = np.asarray(vis)
    assert set(np.unique(v)).issubset({0.0, 1.0})
    rcv = assemble_pose_rcv(coords, vis)
    assert rcv.shape == (B, 18, 3)


def test_gaussian_mapper():
    m = GaussianMapper(out_dim=224, repeat_num=4, hidden_num=64)
    z = sample_mapper_noise(KEY, B, 224)
    assert z.shape == (B, 224)
    vars_ = m.init(KEY, z)
    out = m.apply(vars_, z)
    assert out.shape == (B, 224)


def test_plain_encoder():
    enc = PlainEncoder(z_num=16, repeat_num=REPEAT, hidden_num=HID)
    x = jnp.zeros((B, H, W, 3))
    vars_ = enc.init(KEY, x)
    out = enc.apply(vars_, x)
    assert out.shape == (B, 16)


def test_region_and_patch_discriminators():
    from dpig_tpu.models.discriminators import (PatchDiscriminator,
                                                RegionDiscriminator,
                                                get_discriminator)
    x = jnp.zeros((2, 64, 32, 3))
    d = RegionDiscriminator(dim=8)
    v = d.init(KEY, x, train=True)
    out, _ = d.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 8, 4)
    p = PatchDiscriminator(dim=8, n_layers=2)
    v = p.init(KEY, x, train=True)
    out, _ = p.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.ndim == 3 and out.shape[0] == 2
    assert get_discriminator("DCGAN").__class__.__name__ == "DCGANDiscriminator"
    assert get_discriminator("FCDis").__class__.__name__ == "FCDiscriminator"
    import pytest
    with pytest.raises(ValueError):
        get_discriminator("nope")


def test_zoo_modules():
    from dpig_tpu.models.zoo import (ConvBnLeakyReLU, DCGANGenerator,
                                     FCGenerator, InstanceNorm, ResBlock,
                                     ResBottleneckBlock)
    noise = jnp.zeros((2, 128))
    g = FCGenerator(out_dim=32 * 16 * 3)
    out = g.apply(g.init(KEY, noise), noise)
    assert out.shape == (2, 32 * 16 * 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0
    dg = DCGANGenerator(out_h=32, out_w=32, dim=8)
    v = dg.init(KEY, noise, train=True)
    out, _ = dg.apply(v, noise, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 32, 32, 3)
    x = jnp.ones((2, 8, 8, 4))
    for mod in (InstanceNorm(), ResBlock(n2=4, n3=8),
                ResBottleneckBlock(n2=2, n3=8)):
        v = mod.init(KEY, x)
        y = mod.apply(v, x)
        assert y.shape[0] == 2
    cb = ConvBnLeakyReLU(out_channel=6)
    v = cb.init(KEY, x, train=True)
    y, _ = cb.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 8, 8, 6)


def test_uae_generator_constant_stem_equivalence():
    """embs_const path == tiled-map path (exact stem decomposition)."""
    import numpy as np
    gen = UAEGenerator(out_channels=3, z_num=16, repeat_num=REPEAT,
                       hidden_num=HID)
    rng = np.random.default_rng(0)
    embs = jnp.asarray(rng.standard_normal((B, 52)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((B, H, W, 18)).astype(np.float32))
    x = tile_embedding(embs, H, W)
    vars_ = gen.init(KEY, x, pose)
    out_a, z_a = gen.apply(vars_, x, pose)
    out_b, z_b = gen.apply(vars_, None, pose, embs_const=embs)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_a), np.asarray(z_b),
                               rtol=1e-4, atol=1e-4)


def test_alt_discriminators_and_resnet_zoo():
    """Optional-parity archs (wgan_gp.py:347-576, selector
    trainer.py:151-158): shapes + finiteness on tiny inputs."""
    import jax
    import jax.numpy as jnp
    from dpig_tpu.models.discriminators import (
        DCGANDiscriminatorAttr, MultiplicativeDCGANDiscriminator,
        ResnetDiscriminator)
    from dpig_tpu.models.zoo import ResnetGenerator, SubpixelConv

    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 32, 16, 3))

    d_attr = DCGANDiscriminatorAttr(attr_num=5, dim=4)
    v = jax.jit(lambda r, x: d_attr.init(r, x, train=True))(rng, x)
    out = d_attr.apply(v, x, train=True, mutable=["batch_stats"])[0]
    assert out.shape == (2, 5)

    d_mult = MultiplicativeDCGANDiscriminator(dim=4, n_stages=3)
    v = jax.jit(lambda r, x: d_mult.init(r, x, train=True))(rng, x)
    out = d_mult.apply(v, x, train=True, mutable=["batch_stats"])[0]
    assert out.shape == (2,)

    d_res = ResnetDiscriminator(dim=8, blocks_per_scale=1)
    v = jax.jit(lambda r, x: d_res.init(r, x, train=True))(rng, x)
    out = d_res.apply(v, x, train=True, mutable=["batch_stats"])[0]
    assert out.shape == (2,)

    g_res = ResnetGenerator(out_h=32, out_w=16, dim=8, blocks_per_scale=1)
    z = jnp.ones((2, 16))
    v = jax.jit(lambda r, z: g_res.init(r, z, train=True))(rng, z)
    img = g_res.apply(v, z, train=True, mutable=["batch_stats"])[0]
    assert img.shape == (2, 32, 16, 3)
    assert bool(jnp.all(jnp.isfinite(img)))

    sp = SubpixelConv(out_channels=4)
    v = jax.jit(sp.init)(rng, x)
    y = sp.apply(v, x)
    assert y.shape == (2, 64, 32, 4)
