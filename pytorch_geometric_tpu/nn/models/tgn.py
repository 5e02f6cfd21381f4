"""TGN — temporal graph network memory (reference
``torch_geometric/nn/models/tgn.py:15``) + TemporalData container
(reference ``torch_geometric/data/temporal.py``) + LastNeighborLoader
(reference ``tgn.py:228``).

TPU redesign: memory is an explicit pytree state ``(memory [N, D],
last_update [N])`` threaded through jitted update steps (the reference
mutates registered buffers); the identity/GRU message-update pipeline is
one segment-reduce + GRU cell application per batch.
"""

from typing import NamedTuple, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from ..encoding import TimeEncoder
from ...ops import scatter
from ...data.temporal import TemporalData  # noqa: F401 (canonical home)


class TGNMemoryState(NamedTuple):
    memory: jnp.ndarray       # [N, D]
    last_update: jnp.ndarray  # [N]


class TGNMemory(fnn.Module):
    """GRU memory with identity message function (reference
    ``tgn.py:15``: IdentityMessage + LastAggregator + GRU updater)."""
    num_nodes: int
    raw_msg_dim: int
    memory_dim: int
    time_dim: int

    def init_state(self) -> TGNMemoryState:
        return TGNMemoryState(
            memory=jnp.zeros((self.num_nodes, self.memory_dim)),
            last_update=jnp.zeros((self.num_nodes,)))

    @fnn.compact
    def __call__(self, state: TGNMemoryState, src: jnp.ndarray,
                 dst: jnp.ndarray, t: jnp.ndarray,
                 raw_msg: jnp.ndarray
                 ) -> Tuple[TGNMemoryState, jnp.ndarray]:
        """Process one event batch; returns (new_state, z_src_dst)."""
        n, d = self.num_nodes, self.memory_dim
        # Learned cos(W t + b) encoder (reference tgn.py:215 TimeEncoder)
        enc = TimeEncoder(self.time_dim, name='time_enc')
        rel_t_src = t - state.last_update[src]
        rel_t_dst = t - state.last_update[dst]
        # identity message: [mem_src, mem_dst, raw_msg, time_enc]
        msg_s = jnp.concatenate([state.memory[src], state.memory[dst],
                                 raw_msg, enc(rel_t_src)], -1)
        msg_d = jnp.concatenate([state.memory[dst], state.memory[src],
                                 raw_msg, enc(rel_t_dst)], -1)
        idx = jnp.concatenate([src, dst])
        msgs = jnp.concatenate([msg_s, msg_d], 0)
        ts = jnp.concatenate([t, t])
        # last-message aggregation per node: argmax over time
        order_val = ts + jnp.arange(len(ts)) * 1e-9  # stable tie-break
        latest = scatter(order_val, idx, n, 'max')
        is_last = order_val >= latest[idx] - 1e-12
        agg = scatter(jnp.where(is_last[:, None], msgs, 0), idx, n,
                      'sum')
        count = scatter(is_last.astype(jnp.float32), idx, n, 'sum')
        agg = agg / jnp.maximum(count, 1)[:, None]
        touched = count > 0
        cell = fnn.GRUCell(features=d, name='gru')
        new_mem, _ = cell(state.memory, agg)
        memory = jnp.where(touched[:, None], new_mem, state.memory)
        last_t = scatter(ts, idx, n, 'max')
        last_update = jnp.where(touched, last_t, state.last_update)
        new_state = TGNMemoryState(memory, last_update)
        return new_state, (memory[src], memory[dst])


class LastNeighborLoader:
    """Rolling most-recent-neighbor store (reference ``tgn.py:228``).
    Host-side ring buffers of the last ``size`` temporal neighbors."""

    def __init__(self, num_nodes: int, size: int):
        self.size = size
        self.neighbors = np.full((num_nodes, size), -1, np.int64)
        self.e_id = np.full((num_nodes, size), -1, np.int64)
        self.cursor = np.zeros(num_nodes, np.int64)

    def insert(self, src: np.ndarray, dst: np.ndarray,
               e_id0: Optional[int] = None):
        base = e_id0 if e_id0 is not None else 0
        for k, (s, d) in enumerate(zip(src, dst)):
            for a, b in ((s, d), (d, s)):
                c = self.cursor[a] % self.size
                self.neighbors[a, c] = b
                self.e_id[a, c] = base + k
                self.cursor[a] += 1

    def __call__(self, nodes: np.ndarray):
        """Returns (n_id, edge_index, e_id) of each node's last
        neighbors, statically padded to ``len(nodes) * size`` edges."""
        nbrs = self.neighbors[nodes]          # [B, size]
        eids = self.e_id[nodes]
        valid = nbrs >= 0
        uniq = {int(v): i for i, v in enumerate(nodes)}
        extra = []
        for v in nbrs[valid]:
            if int(v) not in uniq:
                uniq[int(v)] = len(nodes) + len(extra)
                extra.append(int(v))
        n_id = np.concatenate([nodes, np.array(extra, np.int64)]) \
            if extra else np.asarray(nodes)
        b, s = nbrs.shape
        rows = np.array([uniq.get(int(v), 0) for v in nbrs.reshape(-1)],
                        np.int64)
        cols = np.repeat(np.arange(b), s)
        mask = valid.reshape(-1)
        return n_id, np.stack([rows, cols]), eids.reshape(-1), mask
