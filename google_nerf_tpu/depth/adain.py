"""AdaIN latent-code modulation for cIMLE depth models.

TPU-native rebuild of the style modules in
`AdelaiDepth/LeReS/Train/lib/models/Resnext_torch.py:243-330`:
  * `EqualizedDense` — linear layer with equalized learning rate (StyleGAN
    convention; weights ~N(0, (init_std)^2) scaled at call time by w_mul).
  * `StyleMod` — latent -> (scale, shift) per channel via one equalized
    linear (`Resnext_torch.py:269-283`).
  * `AdaInMod` — latent -> per-channel (scale, shift) through a 4-layer
    LeakyReLU MLP (512 -> 256 -> 128 -> 2C), applied as
    `x * (style_scale + 1 - var_shift) + (style_shift - mean_shift)`
    (`Resnext_torch.py:287-330`).  The mean/var calibration shifts are flax
    variables in the "adain_stats" collection (zero by default), set by the
    AdaIN-stat calibration pass (`set_mean_var_shifts`,
    `Resnext_torch.py:464-476`).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class EqualizedDense(nn.Module):
    features: int
    gain: float = 2.0 ** 0.5
    use_wscale: bool = False
    lrmul: float = 1.0

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        he_std = self.gain * in_dim ** (-0.5)
        if self.use_wscale:
            init_std, w_mul = 1.0 / self.lrmul, he_std * self.lrmul
        else:
            init_std, w_mul = he_std / self.lrmul, self.lrmul
        w = self.param("kernel", nn.initializers.normal(init_std),
                       (in_dim, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ (w * w_mul) + b * self.lrmul


class StyleMod(nn.Module):
    """Single-linear style modulation (`Resnext_torch.py:269-283`)."""
    channels: int
    use_wscale: bool = False

    @nn.compact
    def __call__(self, x, z):
        style = EqualizedDense(self.channels * 2, gain=1.0,
                               use_wscale=self.use_wscale, name="lin")(z)
        scale, shift = jnp.split(style, 2, axis=-1)
        bc = (slice(None),) + (None,) * (x.ndim - 2)
        return x * (scale[bc] + 1.0) + shift[bc]


class AdaInMod(nn.Module):
    """MLP-style AdaIN with calibratable mean/var shifts.

    x: (B, ..., C) NHWC activations; z: (B, d_latent).
    """
    d_latent: int
    channels: int

    @nn.compact
    def __call__(self, x, z):
        h = nn.leaky_relu(nn.Dense(512, name="mlp0")(z), 0.01)
        h = nn.leaky_relu(nn.Dense(256, name="mlp1")(h), 0.01)
        h = nn.leaky_relu(nn.Dense(128, name="mlp2")(h), 0.01)
        style = nn.Dense(self.channels * 2, name="mlp3")(h)
        scale, shift = jnp.split(style, 2, axis=-1)

        mean_shift = self.variable("adain_stats", "mean_shift",
                                   jnp.zeros, (self.channels,))
        var_shift = self.variable("adain_stats", "var_shift",
                                  jnp.zeros, (self.channels,))
        bc = (slice(None),) + (None,) * (x.ndim - 2)
        st = (None,) * (x.ndim - 1)
        var = scale[bc] + 1.0 - var_shift.value[st]
        mean = shift[bc] - mean_shift.value[st]
        return x * var + mean
