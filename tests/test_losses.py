"""Losses: Charbonnier, TV, contrastive CR math."""

import jax
import jax.numpy as jnp
import numpy as np

from dehaze_tpu.ops import losses as L


def test_charbonnier_value():
    x = jnp.asarray([[0.5, 0.2]])
    y = jnp.asarray([[0.1, 0.2]])
    got = float(L.charbonnier_loss(x, y, eps=1e-3))
    expect = np.mean(np.sqrt((np.array([0.4, 0.0])) ** 2 + 1e-6))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_charbonnier_at_zero_is_eps():
    x = jnp.zeros((2, 4, 4, 3))
    assert abs(float(L.charbonnier_loss(x, x, eps=1e-3)) - 1e-3) < 1e-9


def test_tv_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 5, 6, 3)).astype(np.float32)
    got = float(L.tv_loss(jnp.asarray(x)))
    b, h, w, c = x.shape
    h_tv = np.sum((x[:, 1:] - x[:, :-1]) ** 2)
    w_tv = np.sum((x[:, :, 1:] - x[:, :, :-1]) ** 2)
    expect = 2 * (h_tv / ((h - 1) * w * c) + w_tv / (h * (w - 1) * c)) / b
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def _fake_feats(rng, n=5):
    return [rng.normal(size=(1, 4, 4, 2)).astype(np.float32) for _ in range(n)]


def test_contrast_loss_math():
    rng = np.random.default_rng(1)
    a, p, n = _fake_feats(rng), _fake_feats(rng), _fake_feats(rng)
    weights = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)
    loss, ap, an = L.contrast_loss_from_features(
        [jnp.asarray(t) for t in a], [jnp.asarray(t) for t in p],
        [jnp.asarray(t) for t in n], weights=weights)
    expect = 0.0
    eap = ean = 0.0
    for i in range(5):
        d_ap = np.abs(a[i] - p[i]).mean()
        d_an = np.abs(a[i] - n[i]).mean()
        eap += d_ap
        ean += d_an
        expect += weights[i] * d_ap / (d_an + 1e-7)
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)
    np.testing.assert_allclose(float(ap), eap, rtol=1e-5)
    np.testing.assert_allclose(float(an), ean, rtol=1e-5)


def test_contrast_ablation_drops_negative():
    rng = np.random.default_rng(2)
    a, p, n = _fake_feats(rng), _fake_feats(rng), _fake_feats(rng)
    loss, _, an = L.contrast_loss_from_features(
        [jnp.asarray(t) for t in a], [jnp.asarray(t) for t in p],
        [jnp.asarray(t) for t in n], ablation=True)
    assert float(an) == 0.0
    expect = sum(
        w * np.abs(ai - pi).mean()
        for w, ai, pi in zip((1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0), a, p)
    )
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_contrast_gradient_stops_at_pos_neg():
    """Positive/negative are detached (My_CR.py:112,115): d loss/d p = 0."""
    a = [jnp.ones((1, 2, 2, 1)) * 0.5]
    p = [jnp.ones((1, 2, 2, 1)) * 0.2]
    n = [jnp.ones((1, 2, 2, 1)) * 0.9]

    def wrt_p(pv):
        loss, _, _ = L.contrast_loss_from_features(a, [pv], n, weights=(1.0,))
        return loss

    g = jax.grad(wrt_p)(p[0])
    assert float(jnp.abs(g).max()) == 0.0

    def wrt_a(av):
        loss, _, _ = L.contrast_loss_from_features([av], p, n, weights=(1.0,))
        return loss

    g = jax.grad(wrt_a)(a[0])
    assert float(jnp.abs(g).max()) > 0.0


def test_perceptual_loss():
    rng = np.random.default_rng(3)
    x = _fake_feats(rng, 3)
    y = _fake_feats(rng, 3)
    got = float(L.perceptual_loss_from_features(
        [jnp.asarray(t) for t in x], [jnp.asarray(t) for t in y]))
    expect = np.mean([np.mean((a - b) ** 2) for a, b in zip(x, y)])
    np.testing.assert_allclose(got, expect, rtol=1e-5)
