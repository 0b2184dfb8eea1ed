"""Time-domain score model: STFT frontend + spectrogram backbone.

Capability parity with `ScoreModelNCSNpp` (models/score_models.py:10-138):
the score network consumes the concatenation of the diffused state x_t and
the mixture, maps it through STFT -> magnitude-compression transform ->
real/imag channel stacking -> frame padding -> backbone -> the inverse
chain, and returns a *time-domain* score with the input's length.

TPU-first notes
---------------
* The STFT is the matmul-based kernel in ops/stft.py; the whole frontend
  stays channels-last so the NHWC backbone needs no transposes.
* `pad_frames` pads the frame axis to a multiple of 64 = 2^(levels-1) so
  all U-Net resolutions divide evenly (score_models.py:83-97).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stft import istft, stft, hann_window

Array = jax.Array


class ScoreModelNCSNpp(nn.Module):
    """Frontend + backbone wrapper. Callable as (x_t, time_cond, mix)."""

    backbone: nn.Module
    num_sources: int = 2
    n_fft: int = 510
    hop_length: int = 128
    center: bool = True
    transform: str = "exponent"
    spec_abs_exponent: float = 0.5
    spec_factor: float = 3.0
    spec_trans_learnable: bool = False
    frame_pad_multiple: int = 64

    def setup(self):
        if self.spec_trans_learnable:
            self._exp_param = self.param(
                "spec_abs_exponent",
                lambda k: jnp.asarray(self.spec_abs_exponent, jnp.float32),
            )
            self._factor_param = self.param(
                "spec_factor",
                lambda k: jnp.asarray(self.spec_factor, jnp.float32),
            )

    def _transform_consts(self):
        """(|exponent|, factor) — params when learnable, else static floats.

        Static methods stay usable on an unbound module (the reference's
        transforms are likewise plain methods, score_models.py:41-70)."""
        if self.spec_trans_learnable:
            return jnp.abs(self._exp_param), self._factor_param
        return abs(self.spec_abs_exponent), self.spec_factor

    @property
    def window(self) -> Array:
        return jnp.asarray(hann_window(self.n_fft))

    # --- magnitude-compression transforms (score_models.py:41-70) ---
    def transform_forward(self, spec: Array) -> Array:
        e, factor = self._transform_consts()
        if self.transform == "exponent":
            if self.spec_trans_learnable or self.spec_abs_exponent != 1:
                mag = jnp.abs(spec)
                phase = jnp.where(mag > 0, spec / jnp.maximum(mag, 1e-37), 1.0 + 0j)
                spec = mag**e * phase
            return spec * factor
        if self.transform == "log":
            mag = jnp.abs(spec)
            phase = jnp.where(mag > 0, spec / jnp.maximum(mag, 1e-37), 1.0 + 0j)
            return jnp.log1p(mag) * phase * jnp.abs(factor)
        if self.transform == "none":
            return spec
        raise ValueError("transform must be one of 'exponent'|'log'|'none'")

    def transform_backward(self, spec: Array) -> Array:
        e, factor = self._transform_consts()
        if self.transform == "exponent":
            spec = spec / jnp.abs(factor) if self.spec_trans_learnable else spec / abs(factor)
            if self.spec_trans_learnable or self.spec_abs_exponent != 1:
                mag = jnp.abs(spec)
                phase = jnp.where(mag > 0, spec / jnp.maximum(mag, 1e-37), 1.0 + 0j)
                spec = mag ** (1.0 / e) * phase
            return spec
        if self.transform == "log":
            spec = spec / jnp.abs(factor)
            mag = jnp.abs(spec)
            phase = jnp.where(mag > 0, spec / jnp.maximum(mag, 1e-37), 1.0 + 0j)
            return (jnp.exp(mag) - 1.0) * phase
        return spec

    # --- complex <-> stacked-real (score_models.py:72-81), channels-last ---
    @staticmethod
    def complex_to_real(x: Array) -> Array:
        """(batch, chan, freq, frames) complex ->
        (batch, freq, frames, 2*chan) real, ordered [re_c0..re_cn, im_c0..]"""
        x = jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=1)
        return jnp.transpose(x, (0, 2, 3, 1))

    @staticmethod
    def real_to_complex(x: Array) -> Array:
        """Inverse of complex_to_real."""
        x = jnp.transpose(x, (0, 3, 1, 2))
        c = x.shape[1] // 2
        return jax.lax.complex(x[:, :c], x[:, c:])

    def pad_frames(self, x: Array):
        n_frames = x.shape[-2]
        rem = n_frames % self.frame_pad_multiple
        if rem == 0:
            return x, 0
        pad = self.frame_pad_multiple - rem
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x, pad

    def pre_process(self, x: Array):
        """(batch, chan, samples) -> (batch, freq, frames(padded), 2*chan)."""
        n_samples = x.shape[-1]
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, self.n_fft - self.hop_length))
        )  # score_models.py:109-111
        spec = stft(x, self.n_fft, self.hop_length, self.window, self.center)
        spec = self.transform_forward(spec)
        xr = self.complex_to_real(spec)
        xr, n_pad = self.pad_frames(xr)
        return xr, n_samples, n_pad

    def post_process(self, x: Array, n_samples: int, n_pad: int) -> Array:
        if n_pad:
            x = x[:, :, :-n_pad, :]
        spec = self.real_to_complex(x)
        spec = self.transform_backward(spec)
        y = istft(
            spec, self.n_fft, self.hop_length, self.window, self.center,
            length=n_samples,
        )
        return y

    def __call__(
        self, xt: Array, time_cond: Array, mix: Array, train: bool = False
    ) -> Array:
        """Score in the time domain (score_models.py:126-138).

        xt:   (batch, num_sources, samples)
        time_cond: (batch,)
        mix:  (batch, 1, samples)
        """
        x = jnp.concatenate((xt, mix), axis=1)
        h, n_samples, n_pad = self.pre_process(x)
        h = self.backbone(h, time_cond, train)
        return self.post_process(h, n_samples, n_pad)
