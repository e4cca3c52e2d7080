"""Adversarial loss zoo, temperature schedules, gradient penalty.

Counterpart of reference model/utils/helpers.py:62-141 plus the WGAN-GP
gradient penalty (model/transformer_gan.py:203-230). The reference's
'hinge' and 'tv' branches construct ``nn.ReLU(...)``/``nn.Tanh(...)`` as
losses and would crash if selected (helpers.py:110-125); here they are
implemented correctly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bce_with_logits(logits, targets):
    """Mean binary cross-entropy on logits (nn.BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def get_losses(d_out_real, d_out_fake, loss_type: str = "JS"):
    """(g_loss, d_loss) per family (reference helpers.py:85-141):
    standard / JS / KL / hinge / wgan(-gp) / tv / rsgan(-gp) / ppo(-gp)."""
    ones_r = jnp.ones_like(d_out_real)
    zeros_f = jnp.zeros_like(d_out_fake)
    ones_f = jnp.ones_like(d_out_fake)

    if loss_type == "standard":  # non-saturating GAN loss
        d_loss = (bce_with_logits(d_out_real, ones_r)
                  + bce_with_logits(d_out_fake, zeros_f))
        g_loss = bce_with_logits(d_out_fake, ones_f)
    elif loss_type == "JS":  # vanilla GAN
        d_loss_fake = bce_with_logits(d_out_fake, zeros_f)
        d_loss = bce_with_logits(d_out_real, ones_r) + d_loss_fake
        g_loss = -d_loss_fake
    elif loss_type == "KL":
        d_loss = (bce_with_logits(d_out_real, ones_r)
                  + bce_with_logits(d_out_fake, zeros_f))
        g_loss = jnp.mean(-d_out_fake)
    elif loss_type == "hinge":
        d_loss = (jnp.mean(jax.nn.relu(1.0 - d_out_real))
                  + jnp.mean(jax.nn.relu(1.0 + d_out_fake)))
        g_loss = -jnp.mean(d_out_fake)
    elif "wgan" in loss_type:  # wgan / wgan-gp
        d_loss = -jnp.mean(d_out_real) + jnp.mean(d_out_fake)
        g_loss = -jnp.mean(d_out_fake)
    elif loss_type == "tv":  # total variation
        d_loss = jnp.mean(jnp.tanh(d_out_fake) - jnp.tanh(d_out_real))
        g_loss = jnp.mean(-jnp.tanh(d_out_fake))
    elif "rsgan" in loss_type:  # relativistic standard GAN
        d_loss = bce_with_logits(d_out_real - d_out_fake, ones_r)
        g_loss = bce_with_logits(d_out_fake - d_out_real, ones_f)
    elif "ppo" in loss_type:
        W = d_out_fake.shape[0] * jax.lax.stop_gradient(
            jax.nn.softmax(d_out_fake.astype(jnp.float32), axis=0))
        d_loss = jnp.mean(W * d_out_fake - d_out_real)
        g_loss = -jnp.mean(d_out_fake)
    else:
        raise NotImplementedError(
            f"Divergence '{loss_type}' is not implemented")

    return g_loss, d_loss


def get_fixed_temperature(temper: float, i: int, N: int, adapt: str) -> float:
    """Beta annealing policies (reference helpers.py:62-82); generator
    temperature is 1/beta (train.py:862-868)."""
    if adapt == "no":
        return 1.0
    elif adapt == "lin":
        return 1 + i / (N - 1) * (temper - 1)
    elif adapt == "exp":
        return temper ** (i / N)
    elif adapt == "log":
        return 1 + (temper - 1) / np.log(N) * np.log(i + 1)
    elif adapt == "sigmoid":
        return (temper - 1) * 1 / (1 + np.exp((N / 2 - i) * 20 / N)) + 1
    elif adapt == "quad":
        return (temper - 1) / (N - 1) ** 2 * i ** 2 + 1
    elif adapt == "sqrt":
        return (temper - 1) / np.sqrt(N - 1) * np.sqrt(i) + 1
    raise ValueError(f"Unknown adapt type: {adapt}")


def gradient_penalty(disc_fn, real_data, fake_data, rng, lam: float = 10.0):
    """WGAN-GP on vocab-distribution interpolates (reference
    transformer_gan.py:203-230): slope = ||grad D(x_interp)||_2 per sample,
    penalty = lam * mean((slope - 1)^2).

    disc_fn: interpolates [bsz, seq, vocab] -> logits (any shape with
    leading bsz or flattened rep dim).
    """
    bsz = real_data.shape[0]
    alpha = jax.random.uniform(rng, (bsz, 1, 1), dtype=real_data.dtype)
    interpolates = alpha * real_data + (1 - alpha) * fake_data

    def sum_disc(x):
        return jnp.sum(disc_fn(x).astype(jnp.float32))

    grads = jax.grad(sum_disc)(interpolates)
    grads = grads.reshape(bsz, -1).astype(jnp.float32)
    slopes = jnp.sqrt(jnp.sum(jnp.square(grads), axis=1) + 1e-12)
    return jnp.mean(jnp.square(slopes - 1.0)) * lam
