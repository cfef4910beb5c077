"""Adversarial attacks (SURVEY #38, `ops/adversarial.py`).

FGSM / PGD / Random / FreqAttack with the reference's exact loss surface:
CrossEntropyLoss applied to the LOG of the n_ff-averaged softmax (i.e.
log_softmax(log p̂), `adversarial.py:32-38`). jax.grad replaces the
autograd bookkeeping; each attack is a pure function of (variables, xs, ys,
rng).

Reference quirks preserved: PGD clamps xs_adv to [0,1] only at the random
start, NOT inside the iteration (`adversarial.py:74-96`); Random ignores
the model entirely.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from dehaze_tpu.zoo.evaluate import make_predict_fn
from dehaze_tpu.zoo.train import soft_ce


def _attack_loss(model, variables, n_ff, xs, ys, rng):
    def one(key):
        return jax.nn.softmax(model.apply(
            variables, xs, train=False, rngs={"dropout": key}), axis=-1)

    p = jnp.mean(jax.vmap(one)(jax.random.split(rng, n_ff)), axis=0)
    logits = jnp.log(p)  # re-log-softmaxed inside soft_ce == reference CE(log p)
    t = jax.nn.one_hot(ys, p.shape[-1])
    return soft_ce(logits, t)


def fgsm(model, variables, xs, ys, *, eps: float = 0.007, n_ff: int = 1,
         rng=None):
    """`FGSM` (`adversarial.py:11-45`)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    grad = jax.grad(
        lambda x: _attack_loss(model, variables, n_ff, x, ys, rng))(xs)
    return xs + eps * jnp.sign(grad), ys


def pgd(model, variables, xs, ys, *, eps: float = 0.3, alpha: float = 2 / 255,
        steps: int = 40, random_start: bool = True, n_ff: int = 1, rng=None):
    """`PGD` (`adversarial.py:48-96`)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    k0, rng = jax.random.split(rng)
    xs_adv = xs
    if random_start:
        xs_adv = xs + jax.random.uniform(k0, xs.shape, minval=-eps,
                                         maxval=eps)
        xs_adv = jnp.clip(xs_adv, 0.0, 1.0)

    def body(i, adv):
        g = jax.grad(lambda x: _attack_loss(
            model, variables, n_ff, x, ys, jax.random.fold_in(rng, i)))(adv)
        adv = adv + alpha * jnp.sign(g)
        delta = jnp.clip(adv - xs, -eps, eps)
        return xs + delta

    return jax.lax.fori_loop(0, steps, body, xs_adv), ys


def random_attack(xs, ys, *, eps: float = 0.007, rng=None):
    """`Random` (`adversarial.py:99-119`): model-free sign-noise."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    noise = jax.random.normal(rng, xs.shape)
    return xs + eps * jnp.sign(noise), ys


def freq_mask(x: jnp.ndarray, f: float, s: float = 0.2) -> jnp.ndarray:
    """`FreqAttack._fourier_mask` (`adversarial.py:131-169`): band-pass the
    perturbation around radial frequency f (NHWC in, real part out)."""
    b, h, w, c = x.shape
    x = jnp.moveaxis(x, -1, 1)
    z = jnp.fft.fft2(x)
    z = jnp.roll(z, (h // 2, w // 2), axis=(2, 3))
    mag, ang = jnp.abs(z), jnp.angle(z)

    def center_mask(w1, w2):
        w1 = min(max(w1, 0), w2)
        m = jnp.zeros((1, 1, w2, w2))
        pad = (w2 - w1) // 2
        return m.at[:, :, pad:pad + w1, pad:pad + w1].set(1.0)

    m1 = center_mask(int(((f + s) * h) / (2 * math.pi)) * 2, h)
    m2 = center_mask(int(((f - s) * h) / (2 * math.pi)) * 2, h)
    mag = (m1 - m2) * mag
    z = mag * jnp.exp(1j * ang)
    z = jnp.roll(z, (h // 2, w // 2), axis=(2, 3))
    out = jnp.fft.ifft2(z).real
    return jnp.moveaxis(out, 1, -1)


def freq_attack(attack_fn, xs, ys, *, f: float, s: float = 0.2):
    """`FreqAttack` (`adversarial.py:122-129`): run any attack, keep only
    the band-passed component of its perturbation."""
    xs_adv, ys = attack_fn(xs, ys)
    return xs + freq_mask(xs_adv - xs, f, s), ys
