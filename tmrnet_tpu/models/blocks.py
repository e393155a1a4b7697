"""TMRNet temporal-memory blocks: NLBlock and multi-scale TimeConv.

Semantics match the reference (`Training TMRNet/NLBlock_MutiConv6_3.py:10-79`)
with two generalizations: the memory window length is a free dimension (the
reference hard-codes 30 in TimeConv's reshapes, SURVEY.md 2.9-10) and the
feature dim is configurable. An optional Pallas fused path
(`tmrnet_tpu.ops`) replaces the attention chain on TPU.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_xavier = nn.initializers.xavier_uniform()


class NLBlock(nn.Module):
    """Non-local memory read: the current-clip embedding St queries the memory
    window Lt; the attended value is layer-normed, ReLU'd, projected, and added
    residually to St (reference `NLBlock_MutiConv6_3.py:25-40`).

    Scale is multiplicative 1/sqrt(feature_dim) applied to the QK^T logits
    (`:31`); LayerNorm([1,512]) over a singleton query dim reduces to LayerNorm
    over the feature axis.
    """

    feature_dim: int = 512
    dropout: float = 0.2
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, st: jax.Array, lt: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """st: (B, F) current-clip embedding; lt: (B, W, F) memory window."""
        f = self.feature_dim
        cdt = self.compute_dtype
        dense = lambda name: nn.Dense(f, kernel_init=_xavier, dtype=cdt,
                                      param_dtype=jnp.float32, name=name)
        q = dense("query")(st.astype(cdt))[:, None, :]          # (B, 1, F)
        k = dense("key")(lt.astype(cdt))                        # (B, W, F)
        v = dense("value")(lt.astype(cdt))                      # (B, W, F)

        if self.use_pallas:
            from tmrnet_tpu.ops.nl_attention import nl_attention

            attended = nl_attention(q[:, 0, :], k, v)[:, None, :]
        else:
            logits = jnp.einsum("bqf,bwf->bqw", q, k) * (1.0 / f) ** 0.5
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(cdt)
            attended = jnp.einsum("bqw,bwf->bqf", attn, v)      # (B, 1, F)

        out = nn.LayerNorm(dtype=cdt, param_dtype=jnp.float32,
                           name="layer_norm")(attended)
        out = nn.relu(out)
        out = dense("out")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return st + out[:, 0, :].astype(st.dtype)


class TimeConv(nn.Module):
    """Multi-scale temporal conv pyramid over the memory window: parallel
    Conv1d branches with kernels {3,5,7}, a causal 2-max-pool branch, and the
    identity, reduced by elementwise max (reference `NLBlock_MutiConv6_3.py:43-79`,
    where the AdaptiveMaxPool2d((F,1)) over stacked branches is exactly a
    branch-wise max).
    """

    feature_dim: int = 512
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, W, F) -> (B, W, F)."""
        cdt = self.compute_dtype
        xc = x.astype(cdt)
        conv = lambda k, name: nn.Conv(
            self.feature_dim, kernel_size=(k,), padding="SAME", dtype=cdt,
            param_dtype=jnp.float32, name=name)
        b1 = conv(3, "conv_k3")(xc)
        b2 = conv(5, "conv_k5")(xc)
        b3 = conv(7, "conv_k7")(xc)
        # Causal 2-window max: out[t] = max(x[t-1], x[t]) with x[-1] = 0
        # (F.pad left + MaxPool1d(2, stride=1) in the reference, `:67-68`).
        shifted = jnp.pad(xc, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        b4 = jnp.maximum(xc, shifted)
        y = jnp.maximum(jnp.maximum(jnp.maximum(xc, b1), jnp.maximum(b2, b3)), b4)
        return y.astype(x.dtype)
