"""GAN training phases (discriminator / generator / PPO classifier).

Placeholder wired into Trainer; the full adversarial stack (gumbel sampling
scan, RelGAN-CNN and BERT discriminators, loss zoo dispatch, gradient
penalty, three-optimizer schedule) lands with transformer_gan_tpu.models.gan.
"""

from __future__ import annotations


class GanPhases:
    def __init__(self, trainer, cfg):
        raise NotImplementedError(
            "GAN phases are implemented in the gan milestone; "
            "set DISCRIMINATOR.type: Null for MLE-only training")
