"""Node2Vec + MetaPath2Vec (reference ``nn/models/node2vec.py:14`` and
``metapath2vec.py:15``).

The reference's random walks run in pyg-lib/torch-cluster C++; here the
walk sampler is a host-side numpy routine (vectorised alias-free p=q=1
fast path and a rejection-sampled general case) feeding fixed-shape
(walks_per_node x walk_length) batches into a jitted skip-gram step.
"""

from typing import Dict, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-15


class _CSR:
    def __init__(self, edge_index, num_nodes: int):
        coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                         else edge_index)
        order = np.argsort(coo[0], kind='stable')
        self.col = coo[1][order]
        self.ptr = np.searchsorted(coo[0][order],
                                   np.arange(num_nodes + 1))
        self.num_nodes = num_nodes

    def sample_neighbor(self, rng, nodes):
        deg = self.ptr[nodes + 1] - self.ptr[nodes]
        off = rng.integers(0, np.maximum(deg, 1))
        nbr = self.col[self.ptr[nodes] + np.minimum(off, deg - 1)]
        return np.where(deg > 0, nbr, nodes)   # dead end: stay


def random_walk(rng: np.random.Generator, edge_index, num_nodes: int,
                start: np.ndarray, walk_length: int,
                p: float = 1.0, q: float = 1.0) -> np.ndarray:
    """[S, walk_length+1] node2vec walks (reference
    ``torch.ops.pyg.random_walk``; p/q biases via rejection sampling).
    Uses the C++ kernel (csrc/sampler.cpp) when available."""
    from ...csrc import load
    lib = load()
    if lib is not None:
        import ctypes
        csr = _CSR(edge_index, num_nodes)
        rowptr = np.ascontiguousarray(csr.ptr, np.int64)
        col = np.ascontiguousarray(csr.col, np.int64)
        start_c = np.ascontiguousarray(start, np.int64)
        out = np.zeros((len(start), walk_length + 1), np.int64)

        def p64(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

        lib.random_walk(p64(rowptr), p64(col),
                        ctypes.c_int64(num_nodes), p64(start_c),
                        ctypes.c_int64(len(start_c)),
                        ctypes.c_int64(walk_length),
                        ctypes.c_double(p), ctypes.c_double(q),
                        ctypes.c_uint64(int(rng.integers(0, 2 ** 62))),
                        p64(out))
        return out
    csr = _CSR(edge_index, num_nodes)
    walks = np.empty((len(start), walk_length + 1), np.int64)
    walks[:, 0] = start
    cur = np.asarray(start)
    prev = cur.copy()
    for t in range(1, walk_length + 1):
        nxt = csr.sample_neighbor(rng, cur)
        if p != 1.0 or q != 1.0:
            # rejection sampling on the biased transition
            for _ in range(3):
                accept_prob = np.where(nxt == prev, 1.0 / p, 1.0 / q)
                accept_prob = np.maximum(accept_prob, 0.0)
                redo = rng.random(len(nxt)) > accept_prob
                if not redo.any():
                    break
                nxt = np.where(redo, csr.sample_neighbor(rng, cur), nxt)
        prev, cur = cur, nxt
        walks[:, t] = cur
    return walks


class Node2Vec(fnn.Module):
    """Skip-gram over random walks (reference ``node2vec.py:14``)."""
    num_nodes: int
    embedding_dim: int
    walk_length: int = 20
    context_size: int = 10
    walks_per_node: int = 1
    p: float = 1.0
    q: float = 1.0
    num_negative_samples: int = 1

    @fnn.compact
    def __call__(self, batch: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        emb = self.param('embedding', fnn.initializers.normal(0.1),
                         (self.num_nodes, self.embedding_dim))
        return emb if batch is None else emb[batch]

    def pos_sample(self, rng: np.random.Generator, edge_index,
                   batch: np.ndarray) -> np.ndarray:
        """Host: walks -> sliding context windows [W, context_size]."""
        start = np.repeat(batch, self.walks_per_node)
        walks = random_walk(rng, edge_index, self.num_nodes, start,
                            self.walk_length, self.p, self.q)
        wins = []
        num_ctx = self.walk_length + 2 - self.context_size
        for j in range(max(num_ctx, 1)):
            wins.append(walks[:, j:j + self.context_size])
        return np.concatenate(wins, 0)

    def neg_sample(self, rng: np.random.Generator,
                   batch: np.ndarray) -> np.ndarray:
        size = (len(batch) * self.walks_per_node
                * self.num_negative_samples)
        neg = rng.integers(0, self.num_nodes,
                           (size, self.context_size))
        num_ctx = self.walk_length + 2 - self.context_size
        return np.tile(neg, (max(num_ctx, 1), 1))

    @staticmethod
    def loss(params, pos_rw: jnp.ndarray, neg_rw: jnp.ndarray
             ) -> jnp.ndarray:
        """Skip-gram with negative sampling (reference ``node2vec.py:loss``)."""
        emb = params['params']['embedding']
        start_p, rest_p = pos_rw[:, 0], pos_rw[:, 1:]
        h_start = emb[start_p][:, None, :]
        h_rest = emb[rest_p]
        out = (h_start * h_rest).sum(-1)
        pos_loss = -jnp.log(jax.nn.sigmoid(out) + EPS).mean()
        start_n, rest_n = neg_rw[:, 0], neg_rw[:, 1:]
        out = (emb[start_n][:, None, :] * emb[rest_n]).sum(-1)
        neg_loss = -jnp.log(1 - jax.nn.sigmoid(out) + EPS).mean()
        return pos_loss + neg_loss


class MetaPath2Vec(fnn.Module):
    """Heterogeneous skip-gram over metapath-guided walks
    (reference ``metapath2vec.py:15``). Node embeddings of all types share
    one table with per-type offsets."""
    num_nodes_dict: Tuple[Tuple[str, int], ...]
    metapath: Tuple[Tuple[str, str, str], ...]
    embedding_dim: int
    walk_length: int = 20
    context_size: int = 10
    walks_per_node: int = 1
    num_negative_samples: int = 1

    def _offsets(self) -> Dict[str, int]:
        off, cur = {}, 0
        for t, n in self.num_nodes_dict:
            off[t] = cur
            cur += n
        return off

    @property
    def total_nodes(self) -> int:
        return sum(n for _, n in self.num_nodes_dict)

    @fnn.compact
    def __call__(self, node_type: Optional[str] = None,
                 batch: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        emb = self.param('embedding', fnn.initializers.normal(0.1),
                         (self.total_nodes, self.embedding_dim))
        if node_type is None:
            return emb
        off = self._offsets()[node_type]
        n = dict(self.num_nodes_dict)[node_type]
        rows = emb[off:off + n]
        return rows if batch is None else rows[batch]

    def pos_sample(self, rng: np.random.Generator,
                   edge_index_dict, batch: np.ndarray) -> np.ndarray:
        """Walks following the metapath edge types cyclically (host)."""
        off = self._offsets()
        sizes = dict(self.num_nodes_dict)
        csrs = []
        for et in self.metapath:
            ei = edge_index_dict[et]
            coo = np.asarray(ei.coo if hasattr(ei, 'coo') else ei)
            csrs.append((_CSR(coo, sizes[et[0]]), et))
        start = np.repeat(batch, self.walks_per_node)
        cur = np.asarray(start)
        walks = [cur + off[self.metapath[0][0]]]
        for t in range(self.walk_length):
            csr, et = csrs[t % len(csrs)]
            cur = csr.sample_neighbor(rng, cur)
            walks.append(cur + off[et[2]])
            # note: metapath must chain (dst type == next src type)
        walks = np.stack(walks, 1)
        wins = []
        num_ctx = self.walk_length + 2 - self.context_size
        for j in range(max(num_ctx, 1)):
            wins.append(walks[:, j:j + self.context_size])
        return np.concatenate(wins, 0)

    def neg_sample(self, rng: np.random.Generator,
                   batch: np.ndarray) -> np.ndarray:
        size = (len(batch) * self.walks_per_node
                * self.num_negative_samples)
        neg = rng.integers(0, self.total_nodes,
                           (size, self.context_size))
        num_ctx = self.walk_length + 2 - self.context_size
        return np.tile(neg, (max(num_ctx, 1), 1))

    loss = staticmethod(Node2Vec.loss)
