"""Unidirectional LSTM as a `lax.scan`, weight-compatible with torch.nn.LSTM.

TPU-first structure: the input projection for ALL timesteps is one large matmul
(B*T, In) @ (In, 4H) that XLA tiles onto the MXU; only the (B, H) @ (H, 4H)
recurrent half lives inside the scan. Gate order is PyTorch's (i, f, g, o) and
parameters mirror torch's (weight_ih_l0, weight_hh_l0, bias_ih_l0, bias_hh_l0)
so reference checkpoints import losslessly (reference model:
`train_singlenet_phase_1fc.py:214` nn.LSTM(2048, 512, batch_first=True)).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSTM(nn.Module):
    hidden_dim: int
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        initial_state: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        """x: (batch, time, input_dim) -> (outputs (batch, time, hidden), (h, c))."""
        b, t, d = x.shape
        h = self.hidden_dim
        # torch layout: (4H, In) and (4H, H), gates ordered i, f, g, o.
        w_ih = self.param("weight_ih", nn.initializers.xavier_normal(), (4 * h, d),
                          self.param_dtype)
        w_hh = self.param("weight_hh", nn.initializers.xavier_normal(), (4 * h, h),
                          self.param_dtype)
        b_ih = self.param("bias_ih", nn.initializers.zeros, (4 * h,), self.param_dtype)
        b_hh = self.param("bias_hh", nn.initializers.zeros, (4 * h,), self.param_dtype)

        cdt = self.compute_dtype
        xc = x.astype(cdt)
        # One MXU-sized matmul for every timestep's input projection.
        x_proj = jnp.einsum("btd,gd->btg", xc, w_ih.astype(cdt))
        x_proj = x_proj + (b_ih + b_hh).astype(cdt)

        if initial_state is None:
            h0 = jnp.zeros((b, h), cdt)
            c0 = jnp.zeros((b, h), cdt)
        else:
            h0, c0 = (s.astype(cdt) for s in initial_state)

        w_hh_c = w_hh.astype(cdt)

        def step(carry, xp):
            h_prev, c_prev = carry
            gates = xp + h_prev @ w_hh_c.T
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c_prev + i * g
            hh = o * jnp.tanh(c)
            return (hh, c), hh

        (hT, cT), ys = jax.lax.scan(step, (h0, c0), x_proj.swapaxes(0, 1))
        return ys.swapaxes(0, 1), (hT, cT)
