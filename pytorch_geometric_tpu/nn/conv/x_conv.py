"""XConv — PointCNN's X-transformed convolution (reference
``torch_geometric/nn/conv/x_conv.py``).

For each point: lift the K nearest neighbors' features, learn a K x K
transform X from their relative positions, and convolve X-permuted
features. All dense per-point [K, C] work — batched matmuls on the MXU.
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp


class XConv(fnn.Module):
    out_channels: int
    dim: int = 3
    kernel_size: int = 8      # K neighbors
    hidden_channels: Optional[int] = None
    dilation: int = 1

    @fnn.compact
    def __call__(self, x: Optional[jnp.ndarray], pos: jnp.ndarray,
                 batch: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..pool.point import knn
        n = pos.shape[0]
        K = self.kernel_size
        hid = self.hidden_channels or self.out_channels // 4 or 1

        ei, valid = knn(pos, pos, K * self.dilation, batch, batch, mask,
                        mask)
        # dilated selection: every dilation-th neighbor
        idx = ei[1].reshape(n, K * self.dilation)[:, ::self.dilation]
        vmask = valid.reshape(n, K * self.dilation)[:, ::self.dilation]
        idx = jnp.minimum(idx, n - 1)

        rel = pos[idx] - pos[:, None, :]              # [N, K, dim]
        # lift positions to features (MLP over rel)
        h_pos = fnn.Dense(hid, name='mlp1_0')(rel)
        h_pos = fnn.elu(h_pos)
        h_pos = fnn.Dense(hid, name='mlp1_1')(h_pos)
        h_pos = fnn.elu(h_pos)

        feats = [h_pos]
        if x is not None:
            feats.append(x[idx])
        h = jnp.concatenate(feats, -1)                # [N, K, C_in]
        h = jnp.where(vmask[..., None], h, 0)

        # learned X-transform [N, K, K] from the relative positions
        t = rel.reshape(n, K * self.dim)
        t = fnn.elu(fnn.Dense(K * K, name='x_trans_0')(t))
        t = fnn.elu(fnn.Dense(K * K, name='x_trans_1')(t))
        t = fnn.Dense(K * K, name='x_trans_2')(t).reshape(n, K, K)

        h = jnp.einsum('nkj,njc->nkc', t, h)          # X-permute
        h = h.reshape(n, -1)
        return fnn.Dense(self.out_channels, name='lin_out')(h)
