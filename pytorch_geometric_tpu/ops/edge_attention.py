"""Fused heterogeneous edge attention — the HGT hot path.

The MAG-shape HGT step attribution (``bench_windows.jsonl``
``hgt_step_attribution``) showed the train-step wall is many medium
``[E_r, H*D]`` gather/scatter passes — 7 relations x 2 layers x ~6
passes each, doubled again by full-layer ``fnn.remat`` recompute. This
op collapses ALL relations sharing a destination type into:

* ONE wide gather from a concatenated ``[M, H, 2D]`` K|V node table
  (512-byte rows at f32 instead of two 256-byte gathers — fatter DMA,
  half the passes),
* ONE union segment-softmax over the destination type and ONE wide
  scatter for the aggregation,
* a ``jax.custom_vjp`` that saves only ``alpha`` ``[E, H]`` plus the
  node-level tables it was handed (which autodiff would keep live
  anyway) instead of rematerialising the whole layer: the backward is
  three gathers + two wide scatters with NO forward recompute, and the
  per-edge ``[E, H, D]`` k/v intermediates are never residuals — HGT
  at full MAG scale fits a 16 GB chip without ``remat``.

Reference boundary: ``torch_geometric/nn/conv/hgt_conv.py:17`` computes
the same union softmax with per-relation ``scatter`` buffers; pyg-lib's
``softmax_csr`` is the CUDA analogue of the fused normalisation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .scatter import scatter
from .softmax import _softmax_xla

__all__ = ['hetero_edge_attention']


def _float0(x):
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attention(num_dst, kv_table, q_table, p_edge, src, dst):
    """out[n] = sum_{e: dst_e == n} softmax_n(p_e * <q[n], k[src_e]>) v[src_e].

    kv_table: [M, H, 2D] — k rows in [..., :D], v rows in [..., D:];
    per-relation tables concatenated along M with ``src`` pre-offset.
    q_table: [num_dst, H, D]. p_edge: [E, H] per-edge prior (already
    divided by sqrt(D)). src: [E] in-range into M. dst: [E]; entries
    ``>= num_dst`` mark padded/invalid edges and are dropped.
    """
    out, _ = _attention_fwd(num_dst, kv_table, q_table, p_edge, src, dst)
    return out


def _attention_fwd(num_dst, kv_table, q_table, p_edge, src, dst):
    d2 = kv_table.shape[2]
    d = d2 // 2
    kve = kv_table[src]                              # [E, H, 2D] one wide gather
    k, v = kve[..., :d], kve[..., d:]
    dsafe = jnp.minimum(dst, num_dst - 1)
    qe = q_table[dsafe]                              # [E, H, D]
    logit = (qe * k).sum(-1) * p_edge                # [E, H]
    valid = dst < num_dst
    alpha = _softmax_xla(logit, dst, num_dst, mask=valid)
    e, h = alpha.shape
    msg = (v * alpha[..., None]).reshape(e, h * d)
    out = scatter(msg, dst, num_dst, 'sum')          # OOB dst rows drop
    out = out.reshape(num_dst, h, d)
    return out, (kv_table, q_table, p_edge, src, dst, alpha)


def _attention_bwd(num_dst, res, g):
    kv_table, q_table, p_edge, src, dst, alpha = res
    m = kv_table.shape[0]
    e, h = alpha.shape
    d2 = kv_table.shape[2]
    d = d2 // 2
    valid = dst < num_dst
    dsafe = jnp.minimum(dst, num_dst - 1)
    kve = kv_table[src]                              # regather (not a residual)
    k, v = kve[..., :d], kve[..., d:]
    qe = q_table[dsafe]
    ge = jnp.where(valid[:, None, None], g[dsafe], 0)    # [E, H, D]
    # out = sum alpha * v
    dalpha = (ge * v).sum(-1)                        # [E, H]
    dv = ge * alpha[..., None]
    # softmax VJP: dlogit = alpha * (dalpha - sum_seg(alpha * dalpha))
    seg = scatter(alpha * dalpha, dst, num_dst, 'sum', mask=valid)
    dlogit = alpha * (dalpha - jnp.where(valid[:, None], seg[dsafe], 0))
    base = (qe * k).sum(-1)                          # recompute: 0 extra passes
    dp = jnp.where(valid[:, None], dlogit * base, 0)
    dbase = dlogit * p_edge
    dqe = dbase[..., None] * k
    dk = dbase[..., None] * qe
    dkv_e = jnp.where(valid[:, None, None],
                      jnp.concatenate([dk, dv], axis=-1), 0)
    # two wide scatters: [E, H*2D] and [E, H*D]
    dkv = scatter(dkv_e.reshape(e, h * d2), jnp.where(valid, src, m), m,
                  'sum').reshape(m, h, d2)
    dq = scatter(dqe.reshape(e, h * d), dst, num_dst, 'sum',
                 mask=valid).reshape(num_dst, h, d)
    return dkv, dq, dp, _float0(src), _float0(dst)


_attention.defvjp(_attention_fwd, _attention_bwd)


def hetero_edge_attention(kv_table: jnp.ndarray, q_table: jnp.ndarray,
                          p_edge: jnp.ndarray, src: jnp.ndarray,
                          dst: jnp.ndarray, num_dst: int) -> jnp.ndarray:
    """Union-softmax edge attention over one destination node set.

    See :func:`_attention`; ``num_dst`` must be static under ``jit``.
    ``src`` must be in-range (clamp before offsetting); invalid /
    padded edges are flagged by ``dst >= num_dst``.
    """
    return _attention(int(num_dst), kv_table, q_table, p_edge, src, dst)
