"""Analytic GAN-loss checks (trainer.py:217-252 semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from dpig_tpu.losses import gan
from dpig_tpu.ops.ste import bernoulli_sample, binary_round

KEY = jax.random.PRNGKey(0)


def test_wgan_losses():
    fake = jnp.asarray([1.0, 3.0])
    real = jnp.asarray([2.0, 4.0])
    assert np.isclose(gan.g_loss("wgan", fake), -2.0)
    assert np.isclose(gan.d_loss("wgan", real, fake), 2.0 - 3.0)


def test_dcgan_losses_at_zero_logits():
    z = jnp.zeros((4,))
    # CE(0, any label) = log 2
    assert np.isclose(gan.g_loss("dcgan", z), np.log(2.0), atol=1e-6)
    assert np.isclose(gan.d_loss("dcgan", z, z), np.log(2.0), atol=1e-6)


def test_lsgan_losses():
    fake = jnp.asarray([0.0])
    real = jnp.asarray([1.0])
    assert np.isclose(gan.g_loss("lsgan", fake), 1.0)
    assert np.isclose(gan.d_loss("lsgan", real, fake), 0.0)


def test_gradient_penalty_linear_critic():
    # critic(x) = w.x with |w| = 3 -> slope 3 everywhere -> GP = (3-1)^2 = 4
    w = jnp.asarray([3.0, 0.0])
    critic = lambda x: x @ w  # noqa: E731
    real = jnp.zeros((8, 2))
    fake = jnp.ones((8, 2))
    gp = gan.gradient_penalty(critic, real, fake, KEY)
    assert np.isclose(gp, 4.0, atol=1e-4)


def test_wgan_gp_d_loss_includes_penalty():
    w = jnp.asarray([1.0])
    critic = lambda x: x @ w  # slope exactly 1 -> zero penalty  # noqa: E731
    real = jnp.zeros((4, 1))
    fake = jnp.ones((4, 1))
    d = gan.d_loss("wgan-gp", critic(real), critic(fake), critic_fn=critic,
                   real_data=real, fake_data=fake, rng=KEY)
    assert np.isclose(d, 1.0, atol=1e-4)  # mean fake - mean real = 1, gp=0


def test_clip_params():
    tree = {"a": jnp.asarray([-1.0, 0.005, 1.0])}
    out = gan.clip_params(tree, 0.01)
    np.testing.assert_allclose(np.asarray(out["a"]), [-0.01, 0.005, 0.01])


def test_binary_round_ste_gradient():
    g = jax.grad(lambda x: jnp.sum(binary_round(x) * 3.0))(jnp.asarray([0.3, 0.7]))
    np.testing.assert_allclose(np.asarray(g), [3.0, 3.0])
    np.testing.assert_array_equal(
        np.asarray(binary_round(jnp.asarray([0.3, 0.7]))), [0.0, 1.0])


def test_bernoulli_sample_ste():
    x = jnp.full((10000,), 0.6)
    s = bernoulli_sample(x, KEY)
    vals = np.unique(np.asarray(s))
    assert set(vals).issubset({0.0, 1.0})
    assert abs(np.asarray(s).mean() - 0.6) < 0.03
    g = jax.grad(lambda p: jnp.sum(bernoulli_sample(p, KEY)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_wgan_gp_double_backward_through_conv_critic():
    """SURVEY §7 risk item: GP needs grad-of-grad through a LayerNorm conv
    discriminator. Verify d_loss('wgan-gp') is differentiable w.r.t. D
    params with an image critic."""
    from dpig_tpu.models.discriminators import DCGANDiscriminator
    d = DCGANDiscriminator(dim=4, n_stages=4, mode="wgan-gp")
    x_real = jax.random.normal(KEY, (2, 64, 32, 3))
    x_fake = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32, 3))
    params = d.init(KEY, x_real, train=True)["params"]

    def d_loss_fn(p):
        critic = lambda z: d.apply({"params": p}, z, train=True)  # noqa: E731
        return gan.d_loss("wgan-gp", critic(x_real), critic(x_fake),
                          critic_fn=critic, real_data=x_real,
                          fake_data=x_fake, rng=KEY)

    loss, grads = jax.value_and_grad(d_loss_fn)(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
