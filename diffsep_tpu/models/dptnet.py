"""Dual-path transformer network (DPTNet).

Capability parity with models/dptnet.py:14-181 (ImprovedTransformerLayer:
self-attention + RNN feed-forward; DPTNet dual-path intra/inter chunk
processing). Library model, not wired into any recipe — same status as the
reference (SURVEY.md §2.3).

TPU notes: the multi-head attention is flax's fused dot-product attention;
the RNN feed-forward uses `nn.RNN` over scan-compiled LSTM/GRU cells (with
`nn.Bidirectional` when requested).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .model_utils import get_activation
from .tcn import choose_norm

Array = jax.Array


def _make_rnn(rnn_type: str, hidden_size: int, bidirectional: bool):
    rnn_type = rnn_type.upper()
    cells = {
        "RNN": nn.SimpleCell,
        "LSTM": nn.OptimizedLSTMCell,
        "GRU": nn.GRUCell,
    }
    if rnn_type not in cells:
        raise ValueError(
            f"Only 'RNN', 'LSTM' and 'GRU' are supported, got {rnn_type}"
        )
    cell = cells[rnn_type](features=hidden_size)
    rnn = nn.RNN(cell)
    if bidirectional:
        bcell = cells[rnn_type](features=hidden_size)
        return nn.Bidirectional(nn.RNN(cell), nn.RNN(bcell))
    return rnn


class ImprovedTransformerLayer(nn.Module):
    """Attention + RNN feed-forward transformer block (dptnet.py:14-84)."""

    rnn_type: str
    input_size: int
    att_heads: int
    hidden_size: int
    dropout: float = 0.0
    activation: str = "relu"
    bidirectional: bool = True
    norm: str = "gLN"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # x: (batch, seq, input_size)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.att_heads,
            qkv_features=self.input_size,
            dropout_rate=self.dropout,
            deterministic=not train,
            name="self_attn",
        )(x, x)
        out = nn.Dropout(self.dropout, deterministic=not train)(attn) + x
        out = choose_norm(self.norm, self.input_size)(out)

        rnn_out = _make_rnn(self.rnn_type, self.hidden_size, self.bidirectional)(out)
        if isinstance(rnn_out, tuple):
            rnn_out = jnp.concatenate(rnn_out, axis=-1)
        act = get_activation(self.activation)
        ff = nn.Dense(self.input_size, name="feed_forward")(
            nn.Dropout(self.dropout, deterministic=not train)(act(rnn_out))
        )
        out2 = nn.Dropout(self.dropout, deterministic=not train)(ff) + out
        return choose_norm(self.norm, self.input_size)(out2)


class DPTNet(nn.Module):
    """Dual-path transformer (dptnet.py:87-181).

    __call__(x): (batch, N, chunk_size, n_chunks) ->
                 (batch, output_size, chunk_size, n_chunks).
    """

    rnn_type: str
    input_size: int
    hidden_size: int
    output_size: int
    att_heads: int = 4
    dropout: float = 0.0
    activation: str = "relu"
    num_layers: int = 1
    bidirectional: bool = True
    norm_type: str = "gLN"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        b, n, chunk, n_chunks = x.shape
        for i in range(self.num_layers):
            # intra-chunk (rows): sequence axis = chunk_size
            h = jnp.transpose(x, (0, 3, 2, 1)).reshape(b * n_chunks, chunk, n)
            h = ImprovedTransformerLayer(
                self.rnn_type, self.input_size, self.att_heads,
                self.hidden_size, self.dropout, self.activation,
                True, self.norm_type, name=f"row_transformer_{i}",
            )(h, train)
            x = jnp.transpose(
                h.reshape(b, n_chunks, chunk, n), (0, 3, 2, 1)
            )
            # inter-chunk (cols): sequence axis = n_chunks
            h = jnp.transpose(x, (0, 2, 3, 1)).reshape(b * chunk, n_chunks, n)
            h = ImprovedTransformerLayer(
                self.rnn_type, self.input_size, self.att_heads,
                self.hidden_size, self.dropout, self.activation,
                self.bidirectional, self.norm_type,
                name=f"col_transformer_{i}",
            )(h, train)
            x = jnp.transpose(
                h.reshape(b, chunk, n_chunks, n), (0, 3, 1, 2)
            )

        # output head: PReLU + 1x1 conv over channels
        from .tcn import PReLU

        h = jnp.transpose(x, (0, 2, 3, 1))  # (b, chunk, n_chunks, N)
        h = PReLU(name="output_prelu")(h)
        h = nn.Conv(self.output_size, (1, 1), name="output_conv")(h)
        return jnp.transpose(h, (0, 3, 1, 2))
