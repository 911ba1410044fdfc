"""Non-local block (residual self-attention variant).

Re-design of `SelfAttention_residual` (`/root/reference/models/attention.py:
51-170`): a 1-D non-local block with the four pairwise functions of
Wang et al. (gaussian / embedded / dot / concatenate), a BN-terminated W_z
projection initialised to zero so the block starts as the identity, and a
residual connection.  Unused by the reference pipeline (kept for API
completeness) but fully functional here.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class NonLocalBlock(nn.Module):
    in_channels: int
    inter_channels: Optional[int] = None
    mode: str = "embedded"       # gaussian | embedded | dot | concatenate
    bn_layer: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        """x: (B, N, C) -> (z, attention) with z = W_z(y) + x."""
        if self.mode not in ("gaussian", "embedded", "dot", "concatenate"):
            raise ValueError(
                "`mode` must be one of `gaussian`, `embedded`, `dot` or "
                "`concatenate`")
        inter = self.inter_channels or self.in_channels

        g_x = nn.Dense(inter, name="g")(x)                       # (B, N, d)

        if self.mode == "gaussian":
            f = jnp.einsum("bnc,bmc->bnm", x, x,
                           preferred_element_type=jnp.float32)
        elif self.mode in ("embedded", "dot"):
            theta = nn.Dense(inter, name="theta")(x)
            phi = nn.Dense(inter, name="phi")(x)
            f = jnp.einsum("bnd,bmd->bnm", theta, phi,
                           preferred_element_type=jnp.float32)
        else:  # concatenate
            theta = nn.Dense(inter, name="theta")(x)[:, :, None, :]
            phi = nn.Dense(inter, name="phi")(x)[:, None, :, :]
            n = x.shape[1]
            cat = jnp.concatenate([
                jnp.broadcast_to(theta, (*theta.shape[:2], n, inter)),
                jnp.broadcast_to(phi, (phi.shape[0], n, n, inter)),
            ], axis=-1)
            f = nn.relu(nn.Dense(1, name="W_f")(cat))[..., 0]    # (B, N, N)

        if self.mode in ("gaussian", "embedded"):
            f_div = jax.nn.softmax(f, axis=-1)
        else:
            f_div = f / f.shape[-1]

        y = jnp.einsum("bnm,bmd->bnd", f_div.astype(g_x.dtype), g_x)
        w = nn.Dense(self.in_channels, name="W_z",
                     kernel_init=nn.initializers.zeros if not self.bn_layer
                     else nn.initializers.lecun_normal())(y)
        if self.bn_layer:
            # zero-init BN scale: block starts as identity (attention.py:99-101)
            w = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, use_fast_variance=False,
                             scale_init=nn.initializers.zeros,
                             name="bn")(w)
        return w + x, f_div
