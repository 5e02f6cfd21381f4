"""Relational GCN (reference ``nn/conv/rgcn_conv.py:29,302``).

The reference loops relations with masked propagates, or uses
``pyg_lib.ops.segment_matmul`` on CUDA (``rgcn_conv.py:288``). TPU-native
design: the per-relation transform is a single batched einsum
``x @ W[R]`` (one [R, F, F'] MXU pass — dense grouped GEMM), followed by a
per-edge gather of the relation-specific row and one segment-sum. For
basis decomposition the weight bank is composed first (tiny einsum).
FastRGCNConv in the reference gathers per-edge weights; here both paths
share the batched-GEMM formulation (identical math, no gather of F x F'
matrices per edge).
"""

from typing import Optional

import flax.linen as fnn
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...ops import scatter


class RGCNConv(MessagePassing):
    """x'_i = W_root x_i + sum_r sum_{j in N_r(i)} 1/c_{i,r} W_r x_j."""
    out_channels: int
    num_relations: int = 1
    num_bases: Optional[int] = None
    num_blocks: Optional[int] = None
    aggr: str = 'mean'
    root_weight: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index, edge_type: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None,
                 typed_layout=None) -> jnp.ndarray:
        """``typed_layout``: optional host-built
        ``ops.build_ragged_layout(edge_type, num_relations)`` — switches
        the relation transform from the dense [R, N, F'] einsum
        (R x N x F' FLOPs/memory) to an edge-wise ``lax.ragged_dot``
        grouped GEMM (E x F' — wins when E << R*N, i.e. many
        relations)."""
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n_src, n_dst = x_src.shape[0], x_dst.shape[0]
        f_in = x_src.shape[-1]
        R = self.num_relations

        if self.num_bases is not None:
            basis = self.param('basis', fnn.initializers.glorot_uniform(),
                               (self.num_bases, f_in, self.out_channels))
            comp = self.param('comp', fnn.initializers.glorot_uniform(),
                              (R, self.num_bases))
            weight = jnp.einsum('rb,bio->rio', comp, basis)
        elif self.num_blocks is not None:
            B = self.num_blocks
            assert f_in % B == 0 and self.out_channels % B == 0
            blocks = self.param('blocks', fnn.initializers.glorot_uniform(),
                                (R, B, f_in // B, self.out_channels // B))
            # Block-diagonal transform applied below on reshaped features.
            weight = None
        else:
            weight = self.param('weight', fnn.initializers.glorot_uniform(),
                                (R, f_in, self.out_channels))

        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n_src - 1)
        dst = jnp.minimum(coo[1], n_dst - 1)
        et = jnp.minimum(edge_type, R - 1)

        if typed_layout is not None and weight is not None:
            # Edge-wise grouped GEMM (the segment_matmul formulation):
            # gather source rows, one ragged MXU pass over relation runs.
            from ...ops.grouped import typed_matmul
            msg = typed_matmul(x_src[src], et, weight, typed_layout)
        else:
            # Batched typed GEMM: h[r] = x @ W_r (single MXU einsum).
            if weight is not None:
                h = jnp.einsum('nf,rfo->rno', x_src, weight)  # [R, N, F']
            else:
                B = self.num_blocks
                xb = x_src.reshape(n_src, B, f_in // B)
                h = jnp.einsum('nbf,rbfo->rnbo', xb, blocks).reshape(
                    R, n_src, self.out_channels)
            msg = h[et, src]                                  # [E, F']

        # Per (dst, relation) normalisation when aggr == 'mean'
        if self._aggr() == 'mean':
            flat = dst * R + et
            cnt = scatter(jnp.ones_like(flat, jnp.float32), flat, n_dst * R,
                          'sum', mask=edge_mask)
            norm = 1.0 / jnp.maximum(cnt[flat], 1.0)
            msg = msg * norm[:, None]
            out = scatter(msg, dst, n_dst, 'sum', mask=edge_mask)
        else:
            out = scatter(msg, dst, n_dst, self._aggr(), mask=edge_mask)

        if self.root_weight and x_dst is not None:
            out = out + fnn.Dense(self.out_channels, use_bias=False,
                                  name='root')(x_dst)
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (self.out_channels,))
        return out


class FastRGCNConv(RGCNConv):
    """Single-pass variant (reference ``rgcn_conv.py:302``) — on TPU the
    base class already computes all relations in one batched GEMM, so this
    is an alias kept for API parity."""
    pass
