"""NCSN++ score-network backbone in Flax (channels-last, TPU-native).

Capability parity with the reference's `NCSNpp` (models/ncsnpp.py:37-478),
including its audio-specific edit: attention fires when the *frequency*
dimension (axis -2 in NCHW, axis 1 here in NHWC) matches `attn_resolutions`
(ncsnpp.py:367-369, 414-416).

Design notes
------------
* Tensors are NHWC: (batch, freq, frames, channels) — the layout XLA's TPU
  convolutions want. The `ScoreModel` wrapper produces this directly from
  the STFT, so no per-layer transposes occur.
* Submodules are built in `setup()` with exactly the constructor walk of the
  reference (ncsnpp.py:107-308) and stored in a list, so parameters get
  deterministic names `all_modules_<i>` that map 1:1 onto the reference's
  `all_modules.<i>` checkpoint keys — this makes HF checkpoint conversion a
  mechanical rename (SURVEY.md §7.3 hard part 3).
* The forward pass mirrors the reference's moving-index module walk
  (ncsnpp.py:319-478) with the same asserts, so structural drift fails
  loudly at trace time rather than silently misassigning weights.
"""
from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import layers

Array = jax.Array


class NCSNpp(nn.Module):
    """NCSN++ U-Net. Input x: (batch, freq, frames, channels_in)."""

    scale_by_sigma: bool = True
    nonlinearity: str = "swish"
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = True
    fir_kernel: Tuple[float, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "output_skip"
    progressive_input: str = "input_skip"
    progressive_combine: str = "sum"
    init_scale: float = 0.0
    fourier_scale: float = 16.0
    image_size: int = 256
    num_channels_in: int = 4
    num_channels_out: int = 4
    embedding_type: str = "fourier"
    dropout: float = 0.0
    centered: bool = False
    # compute dtype: "float32" or "bfloat16". Params always stay float32;
    # with bfloat16 the conv/attention compute runs on the MXU in bf16
    # while GroupNorm statistics, the time embedding, scale_by_sigma and
    # the output projection remain float32.
    dtype: str = "float32"
    # rematerialize residual/attention blocks in the backward pass
    # (jax.checkpoint): trades ~1/3 more FLOPs for the activation memory
    # that otherwise OOMs HBM when training nf=128 on 5 s batches.
    # Parameter names are unchanged, so checkpoints are interchangeable.
    remat: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype in ("bfloat16", "bf16") else jnp.float32

    def setup(self):
        assert self.progressive in ["none", "output_skip", "residual"]
        assert self.progressive_input in ["none", "input_skip", "residual"]
        assert self.embedding_type in ["fourier", "positional"]
        combine_method = self.progressive_combine.lower()

        nf = self.nf
        act = layers.get_act(self.nonlinearity)
        num_resolutions = len(self.ch_mult)
        all_resolutions = [
            self.image_size // (2**i) for i in range(num_resolutions)
        ]

        attn_cls = layers.AttnBlockpp
        ddpm_cls = layers.ResnetBlockDDPMpp
        biggan_cls = layers.ResnetBlockBigGANpp
        if self.remat:
            # flax remat args: (module, x, temb, train) -> train is arg 3
            attn_cls = nn.remat(attn_cls)
            ddpm_cls = nn.remat(ddpm_cls, static_argnums=(3,))
            biggan_cls = nn.remat(biggan_cls, static_argnums=(3,))

        AttnBlock = functools.partial(
            attn_cls,
            init_scale=self.init_scale,
            skip_rescale=self.skip_rescale,
        )
        Up = functools.partial(
            layers.Upsample,
            with_conv=self.resamp_with_conv,
            fir=self.fir,
            fir_kernel=self.fir_kernel,
        )
        Down = functools.partial(
            layers.Downsample,
            with_conv=self.resamp_with_conv,
            fir=self.fir,
            fir_kernel=self.fir_kernel,
        )
        if self.resblock_type == "ddpm":
            ResnetBlock = functools.partial(
                ddpm_cls,
                act=act,
                dropout=self.dropout,
                init_scale=self.init_scale,
                skip_rescale=self.skip_rescale,
            )
        elif self.resblock_type == "biggan":
            ResnetBlock = functools.partial(
                biggan_cls,
                act=act,
                dropout=self.dropout,
                fir=self.fir,
                fir_kernel=self.fir_kernel,
                init_scale=self.init_scale,
                skip_rescale=self.skip_rescale,
            )
        else:
            raise ValueError(f"resblock type {self.resblock_type} unrecognized.")

        modules = []
        # --- timestep / noise-level embedding ---
        if self.embedding_type == "fourier":
            modules.append(
                layers.GaussianFourierProjection(
                    embedding_size=nf, scale=self.fourier_scale
                )
            )
        if self.conditional:
            dense = functools.partial(
                nn.Dense,
                kernel_init=layers.default_init(),
                bias_init=nn.initializers.zeros,
            )
            modules.append(dense(nf * 4))
            modules.append(dense(nf * 4))

        if self.progressive == "output_skip":
            self.pyramid_upsample = layers.Upsample(
                fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False
            )
        if self.progressive_input == "input_skip":
            self.pyramid_downsample = layers.Downsample(
                fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False
            )

        # --- downsampling block ---
        cdtype = self.compute_dtype
        channels = self.num_channels_in
        input_pyramid_ch = channels
        modules.append(layers.conv3x3(nf, dtype=cdtype))
        hs_c = [nf]
        in_ch = nf
        for i_level in range(num_resolutions):
            for _ in range(self.num_res_blocks):
                out_ch = nf * self.ch_mult[i_level]
                modules.append(ResnetBlock(out_ch=out_ch))
                in_ch = out_ch
                if all_resolutions[i_level] in self.attn_resolutions:
                    modules.append(AttnBlock())
                hs_c.append(in_ch)
            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    modules.append(Down())
                else:
                    modules.append(ResnetBlock(down=True, out_ch=in_ch))
                if self.progressive_input == "input_skip":
                    modules.append(
                        layers.Combine(
                            dim2=in_ch, method=combine_method, dtype=cdtype
                        )
                    )
                    if combine_method == "cat":
                        in_ch *= 2
                elif self.progressive_input == "residual":
                    # residual pyramids always use the fused conv resampler
                    # (ncsnpp.py:161-164)
                    modules.append(
                        layers.Downsample(
                            out_ch=in_ch,
                            with_conv=True,
                            fir=self.fir,
                            fir_kernel=self.fir_kernel,
                        )
                    )
                    input_pyramid_ch = in_ch
                hs_c.append(in_ch)

        # --- bottleneck ---
        in_ch = hs_c[-1]
        modules.append(ResnetBlock(out_ch=in_ch))
        modules.append(AttnBlock())
        modules.append(ResnetBlock(out_ch=in_ch))

        # --- upsampling block ---
        pyramid_ch = 0
        for i_level in reversed(range(num_resolutions)):
            for _ in range(self.num_res_blocks + 1):
                out_ch = nf * self.ch_mult[i_level]
                hs_c.pop()
                modules.append(ResnetBlock(out_ch=out_ch))
                in_ch = out_ch
            if all_resolutions[i_level] in self.attn_resolutions:
                modules.append(AttnBlock())
            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        modules.append(layers.group_norm(in_ch))
                        modules.append(
                            layers.conv3x3(
                                channels, init_scale=self.init_scale,
                                dtype=cdtype,
                            )
                        )
                        pyramid_ch = channels
                    elif self.progressive == "residual":
                        modules.append(layers.group_norm(in_ch))
                        modules.append(layers.conv3x3(in_ch, dtype=cdtype))
                        pyramid_ch = in_ch
                else:
                    if self.progressive == "output_skip":
                        modules.append(layers.group_norm(in_ch))
                        modules.append(
                            layers.conv3x3(
                                channels, init_scale=self.init_scale,
                                dtype=cdtype,
                            )
                        )
                        pyramid_ch = channels
                    elif self.progressive == "residual":
                        # (ncsnpp.py:146-148): with_conv=True pyramid upsample
                        modules.append(
                            layers.Upsample(
                                out_ch=in_ch,
                                with_conv=True,
                                fir=self.fir,
                                fir_kernel=self.fir_kernel,
                            )
                        )
                        pyramid_ch = in_ch
            if i_level != 0:
                if self.resblock_type == "ddpm":
                    modules.append(Up())
                else:
                    modules.append(ResnetBlock(up=True, out_ch=in_ch))

        assert not hs_c, "skip-channel bookkeeping mismatch (ncsnpp.py:298)"

        if self.progressive != "output_skip":
            modules.append(layers.group_norm(in_ch))
            modules.append(
                layers.conv3x3(channels, init_scale=self.init_scale)
            )

        self.all_modules = modules
        # final 1x1 projection back to the score channels (ncsnpp.py:105,477)
        self.output_layer = nn.Conv(self.num_channels_out, (1, 1))

    def __call__(self, x: Array, time_cond: Array, train: bool = False) -> Array:
        modules = self.all_modules
        m_idx = 0
        act = layers.get_act(self.nonlinearity)
        num_resolutions = len(self.ch_mult)

        # --- embedding ---
        if self.embedding_type == "fourier":
            used_sigmas = time_cond
            temb = modules[m_idx](jnp.log(used_sigmas))
            m_idx += 1
        else:
            used_sigmas = time_cond
            temb = layers.get_timestep_embedding(time_cond, self.nf)

        if self.conditional:
            temb = modules[m_idx](temb)
            m_idx += 1
            temb = modules[m_idx](act(temb))
            m_idx += 1
            temb = temb.astype(self.compute_dtype)
        else:
            temb = None

        if not self.centered:
            # reference keeps the [0, 1] -> [-1, 1] affine even for audio
            # spectrograms (ncsnpp.py:347-349); kept for checkpoint parity
            x = 2 * x - 1.0
        x = x.astype(self.compute_dtype)

        # --- down path ---
        input_pyramid = None
        if self.progressive_input != "none":
            input_pyramid = x

        hs = [modules[m_idx](x)]
        m_idx += 1
        for i_level in range(num_resolutions):
            for _ in range(self.num_res_blocks):
                h = modules[m_idx](hs[-1], temb, train)
                m_idx += 1
                # audio edit: attend when the *frequency* axis matches
                if h.shape[1] in self.attn_resolutions:
                    h = modules[m_idx](h)
                    m_idx += 1
                hs.append(h)
            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    h = modules[m_idx](hs[-1])
                    m_idx += 1
                else:
                    h = modules[m_idx](hs[-1], temb, train)
                    m_idx += 1
                if self.progressive_input == "input_skip":
                    input_pyramid = self.pyramid_downsample(input_pyramid)
                    h = modules[m_idx](input_pyramid, h)
                    m_idx += 1
                elif self.progressive_input == "residual":
                    input_pyramid = modules[m_idx](input_pyramid)
                    m_idx += 1
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) / np.sqrt(2.0)
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # --- bottleneck ---
        h = hs[-1]
        h = modules[m_idx](h, temb, train)
        m_idx += 1
        h = modules[m_idx](h)
        m_idx += 1
        h = modules[m_idx](h, temb, train)
        m_idx += 1

        # --- up path ---
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for _ in range(self.num_res_blocks + 1):
                h = modules[m_idx](
                    jnp.concatenate([h, hs.pop()], axis=-1), temb, train
                )
                m_idx += 1
            if h.shape[1] in self.attn_resolutions:
                h = modules[m_idx](h)
                m_idx += 1
            cdtype = self.compute_dtype
            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        # GroupNorm stats in f32, activations back in cdtype
                        pyramid = act(modules[m_idx](h)).astype(cdtype)
                        m_idx += 1
                        pyramid = modules[m_idx](pyramid)
                        m_idx += 1
                    elif self.progressive == "residual":
                        pyramid = act(modules[m_idx](h)).astype(cdtype)
                        m_idx += 1
                        pyramid = modules[m_idx](pyramid)
                        m_idx += 1
                else:
                    if self.progressive == "output_skip":
                        pyramid = self.pyramid_upsample(pyramid)
                        pyramid_h = act(modules[m_idx](h)).astype(cdtype)
                        m_idx += 1
                        pyramid_h = modules[m_idx](pyramid_h)
                        m_idx += 1
                        pyramid = pyramid + pyramid_h
                    elif self.progressive == "residual":
                        pyramid = modules[m_idx](pyramid)
                        m_idx += 1
                        if self.skip_rescale:
                            pyramid = (pyramid + h) / np.sqrt(2.0)
                        else:
                            pyramid = pyramid + h
                        h = pyramid
            if i_level != 0:
                if self.resblock_type == "ddpm":
                    h = modules[m_idx](h)
                    m_idx += 1
                else:
                    h = modules[m_idx](h, temb, train)
                    m_idx += 1

        assert not hs, "skip stack must be exhausted (ncsnpp.py:461)"

        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = act(modules[m_idx](h)).astype(self.compute_dtype)
            m_idx += 1
            h = modules[m_idx](h)
            m_idx += 1

        assert m_idx == len(modules), "module walk mismatch (ncsnpp.py:471)"

        # score scaling + output projection in float32
        h = h.astype(jnp.float32)
        if self.scale_by_sigma:
            h = h / used_sigmas.reshape((-1,) + (1,) * (h.ndim - 1))

        return self.output_layer(h)
