"""TGN with temporal-attention embeddings: memory + TransformerConv
over each batch's LAST temporal neighbors (the reference
``examples/tgn.py`` GraphAttentionEmbedding), and a NeighborSampler
with ``time_attr`` for the temporal-correctness check."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as fnn

from pytorch_geometric_tpu.loader import TemporalDataLoader
from pytorch_geometric_tpu.nn import TransformerConv
from pytorch_geometric_tpu.nn.encoding import TemporalEncoding
from pytorch_geometric_tpu.nn.models import (LastNeighborLoader,
                                             TemporalData, TGNMemory)

N_NODES, N_EVENTS, MSG, MEM, TIME, B = 60, 800, 8, 32, 10, 50
E_CAP = B * 2 * 10  # LastNeighborLoader(size=10) pads to this


class GraphAttentionEmbedding(fnn.Module):
    """TransformerConv over memory states with relative-time edge
    features (reference ``tgn.py:GraphAttentionEmbedding``)."""
    out_channels: int = MEM

    @fnn.compact
    def __call__(self, z, last_update, edge_index, e_t):
        rel_t = last_update[edge_index[0]] - e_t
        enc = TemporalEncoding(TIME, name='time_enc')(rel_t)
        return TransformerConv(out_channels=self.out_channels // 2,
                               heads=2, edge_dim=TIME)(
            z, edge_index, edge_attr=enc)


def main():
    rng = np.random.default_rng(0)
    pairs = rng.integers(0, N_NODES, (40, 2))
    pick = rng.integers(0, 40, N_EVENTS)
    td = TemporalData(
        src=pairs[pick, 0], dst=pairs[pick, 1],
        t=np.sort(rng.random(N_EVENTS).astype(np.float32) * 1000),
        msg=rng.standard_normal((N_EVENTS, MSG)).astype(np.float32))
    train, _, _ = td.train_val_test_split(0.15, 0.15)

    mem = TGNMemory(num_nodes=N_NODES, raw_msg_dim=MSG, memory_dim=MEM,
                    time_dim=TIME)
    gnn = GraphAttentionEmbedding()
    link = fnn.Dense(1)
    state = mem.init_state()
    b0 = next(train.seq_batches(B))
    pm = mem.init(jax.random.PRNGKey(0), state, jnp.asarray(b0.src),
                  jnp.asarray(b0.dst), jnp.asarray(b0.t),
                  jnp.asarray(b0.msg))
    pg = gnn.init(jax.random.PRNGKey(1), state.memory,
                  state.last_update,
                  jnp.zeros((2, E_CAP), jnp.int32),
                  jnp.zeros((E_CAP,)))
    pl = link.init(jax.random.PRNGKey(2), jnp.ones((1, 2 * MEM)))
    all_p = {'mem': pm, 'gnn': pg, 'link': pl}
    tx = optax.adam(1e-3)
    opt = tx.init(all_p)

    @jax.jit
    def step(all_p, opt, state, src, dst, t, msg, neg_dst, sub_ei,
             sub_et):
        def loss_fn(all_p):
            new_state, _ = mem.apply(all_p['mem'], state, src, dst, t,
                                     msg)
            # temporal-attention embeddings over the last-neighbor
            # subgraph (statically padded to E_CAP edges)
            z = gnn.apply(all_p['gnn'], new_state.memory,
                          new_state.last_update, sub_ei, sub_et)
            zs, zd, zn = z[src], z[dst], z[neg_dst]
            pos = link.apply(all_p['link'],
                             jnp.concatenate([zs, zd], -1))[:, 0]
            neg = link.apply(all_p['link'],
                             jnp.concatenate([zs, zn], -1))[:, 0]
            return (-jax.nn.log_sigmoid(pos).mean()
                    - jax.nn.log_sigmoid(-neg).mean()), new_state
        (loss, new_state), g = jax.value_and_grad(
            loss_fn, has_aux=True)(all_p)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(all_p, up), opt, new_state, loss

    for epoch in range(4):
        state = mem.init_state()
        nbr = LastNeighborLoader(N_NODES, size=10)
        loader = TemporalDataLoader(train, batch_size=B,
                                    neg_sampling_ratio=1.0)
        ev_base = 0         # cumulative event offset for e_id lookups
        for batch in loader:
            if len(batch.src) < B:
                continue
            # last-neighbor subgraph of the batch's endpoints, padded
            nodes = np.unique(np.concatenate([batch.src, batch.dst]))
            n_id, sub_ei, sub_eid, mask = nbr(nodes)
            # local -> global ids (the GNN embeds the full memory table)
            gsrc = n_id[sub_ei[0]]
            gdst = n_id[sub_ei[1]]
            ei_pad = np.full((2, E_CAP), N_NODES, np.int64)  # pad slot
            et_pad = np.zeros(E_CAP, np.float32)
            k = min(len(gsrc), E_CAP)
            keep = mask[:k]
            ei_pad[0, :k] = np.where(keep, gsrc[:k], N_NODES)
            ei_pad[1, :k] = np.where(keep, gdst[:k], N_NODES)
            et_pad[:k] = np.where(keep,
                                  np.asarray(td.t)[sub_eid[:k]
                                                   % len(td.t)], 0.0)
            all_p, opt, state, loss = step(
                all_p, opt, state, jnp.asarray(batch.src),
                jnp.asarray(batch.dst), jnp.asarray(batch.t),
                jnp.asarray(batch.msg), jnp.asarray(batch.neg_dst[:B]),
                jnp.asarray(ei_pad.astype(np.int32)),
                jnp.asarray(et_pad))
            nbr.insert(batch.src, batch.dst, e_id0=ev_base)
            ev_base += len(batch.src)
        print(f'epoch {epoch}: loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
