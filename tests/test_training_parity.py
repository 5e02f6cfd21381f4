"""Training-trajectory parity vs the reference (BASELINE configs).

The offline-feasible form of "accuracy parity on Planetoid/OGB"
(BASELINE.md): same weights, same data, same optimizer — N SGD steps in
both frameworks must produce allclose loss curves. Covers the 5
BASELINE configs: full-batch GCN, GAT, RGCN, SAGE + NeighborLoader
batches, and Cluster-GCN cluster batches. Oracle:
``/root/reference/torch_geometric`` (imported for numerics only).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import flax.linen as fnn
import jax
import jax.numpy as jnp
import optax

import pytorch_geometric_tpu.nn as pgnn
from pytorch_geometric_tpu.data import Data

N, E, F_IN, HID, C = 60, 240, 8, 16, 4
STEPS = 10
LR = 0.05
rng = np.random.default_rng(3)
X = rng.standard_normal((N, F_IN)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int64)
Y = rng.integers(0, C, N).astype(np.int64)


def t(x):
    return torch.from_numpy(np.asarray(x))


def j32(x):
    return jnp.asarray(np.asarray(x).astype(np.int32))


def _snap(a):
    # jnp.asarray on the CPU backend may ZERO-COPY a torch-tensor view;
    # torch's in-place SGD would then mutate the "transplanted" jax
    # params. Force a real copy.
    return jnp.asarray(np.array(a, copy=True))


def _lin(tl, bias=True):
    p = {'kernel': _snap(tl.weight.detach().numpy().T)}
    if bias and tl.bias is not None:
        p['bias'] = _snap(tl.bias.detach().numpy())
    return p


def _gcn_tree(conv):
    return {'lin': {'kernel': _snap(
        conv.lin.weight.detach().numpy().T)},
        'bias': _snap(conv.bias.detach().numpy())}


def _sage_tree(conv):
    return {'lin_l': _lin(conv.lin_l),
            'lin_r': _lin(conv.lin_r, bias=False)}


def _gat_tree(conv):
    return {'lin_src': {'kernel': _snap(
        conv.lin.weight.detach().numpy().T)},
        'att_src': _snap(conv.att_src.detach().numpy()),
        'att_dst': _snap(conv.att_dst.detach().numpy()),
        'bias': _snap(conv.bias.detach().numpy())}


def _rgcn_tree(conv):
    return {'weight': _snap(conv.weight.detach().numpy()),
            'root': {'kernel': _snap(conv.root.detach().numpy())},
            'bias': _snap(conv.bias.detach().numpy())}


def _torch_trajectory(convs, batches, act=torch.relu, conv_kw=None):
    """N SGD steps over (x, edge_index, y, loss_rows, kw) batches."""
    params = [p for c in convs for p in c.parameters()]
    opt = torch.optim.SGD(params, lr=LR)
    losses = []
    for i in range(STEPS):
        x, ei, y, rows, kw = batches[i % len(batches)]
        h = t(x)
        for li, conv in enumerate(convs):
            h = conv(h, t(ei), **{k: t(v) for k, v in (kw or {}).items()})
            if li < len(convs) - 1:
                h = act(h)
        loss = torch.nn.functional.cross_entropy(h[t(rows)], t(y[rows]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return np.asarray(losses)


def _jax_trajectory(model, params, batches, static_shapes=True):
    tx = optax.sgd(LR)
    opt_state = tx.init(params)

    def loss_fn(params, x, ei, y, rows, kw):
        logits = model.apply(params, jnp.asarray(x), ei, **kw)
        ll = optax.softmax_cross_entropy_with_integer_labels(
            logits[rows], jnp.asarray(y[rows]))
        return ll.mean()

    losses = []
    grad_fn = jax.value_and_grad(loss_fn)
    for i in range(STEPS):
        x, ei, y, rows, kw = batches[i % len(batches)]
        loss, grads = grad_fn(params, x, ei, y, rows, kw)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return np.asarray(losses)


class TwoLayer(fnn.Module):
    conv1: fnn.Module
    conv2: fnn.Module

    @fnn.compact
    def __call__(self, x, edge_index, **kw):
        h = self.conv1(x, edge_index, **kw)
        h = fnn.relu(h)
        return self.conv2(h, edge_index, **kw)


def _check(ref, ours):
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-4)


def test_gcn_full_batch_trajectory():
    """BASELINE config 1 (2-layer GCN, full batch)."""
    tc1 = tg.nn.GCNConv(F_IN, HID)
    tc2 = tg.nn.GCNConv(HID, C)
    rows = np.arange(N)
    model = TwoLayer(pgnn.GCNConv(out_channels=HID),
                     pgnn.GCNConv(out_channels=C))
    params = {'params': {'conv1': _gcn_tree(tc1),
                         'conv2': _gcn_tree(tc2)}}
    ref = _torch_trajectory([tc1, tc2], [(X, COO, Y, rows, None)])
    ours = _jax_trajectory(model, params,
                           [(X, j32(COO), Y, rows, {})])
    _check(ref, ours)


def test_gat_full_batch_trajectory():
    """BASELINE config 3 (2-layer GAT, heads=2 -> 1)."""
    tc1 = tg.nn.GATConv(F_IN, HID, heads=2)
    tc2 = tg.nn.GATConv(2 * HID, C, heads=1)
    rows = np.arange(N)
    model = TwoLayer(pgnn.GATConv(out_channels=HID, heads=2),
                     pgnn.GATConv(out_channels=C, heads=1))
    params = {'params': {'conv1': _gat_tree(tc1),
                         'conv2': _gat_tree(tc2)}}
    ref = _torch_trajectory([tc1, tc2], [(X, COO, Y, rows, None)])
    ours = _jax_trajectory(model, params,
                           [(X, j32(COO), Y, rows, {})])
    _check(ref, ours)


def test_rgcn_full_batch_trajectory():
    """BASELINE config 4 (2-layer RGCN, 3 relations)."""
    R = 3
    et = rng.integers(0, R, E).astype(np.int64)
    tc1 = tg.nn.RGCNConv(F_IN, HID, num_relations=R)
    tc2 = tg.nn.RGCNConv(HID, C, num_relations=R)
    rows = np.arange(N)
    model = TwoLayer(pgnn.RGCNConv(out_channels=HID, num_relations=R),
                     pgnn.RGCNConv(out_channels=C, num_relations=R))
    params = {'params': {'conv1': _rgcn_tree(tc1),
                         'conv2': _rgcn_tree(tc2)}}
    ref = _torch_trajectory([tc1, tc2],
                            [(X, COO, Y, rows, {'edge_type': et})])
    ours = _jax_trajectory(
        model, params, [(X, j32(COO), Y, rows, {'edge_type': j32(et)})])
    _check(ref, ours)


def test_sage_neighbor_loader_trajectory():
    """BASELINE config 2 (SAGE + NeighborLoader): OUR loader produces
    the batch stream; both frameworks train on the identical stream."""
    from pytorch_geometric_tpu.loader import NeighborLoader
    data = Data(x=X, edge_index=COO.astype(np.int32), y=Y, num_nodes=N)
    loader = NeighborLoader(data, num_neighbors=[5, 3], batch_size=16,
                            shuffle=False, seed=0)
    tc1 = tg.nn.SAGEConv(F_IN, HID)
    tc2 = tg.nn.SAGEConv(HID, C)
    model = TwoLayer(pgnn.SAGEConv(out_channels=HID),
                     pgnn.SAGEConv(out_channels=C))
    params = {'params': {'conv1': _sage_tree(tc1),
                         'conv2': _sage_tree(tc2)}}

    ref_batches, our_batches = [], []
    for b in loader:
        em = np.asarray(b.edge_mask)
        coo_b = np.asarray(b.edge_index)
        bs = int(b.batch_size)
        rows = np.arange(bs)
        xb = np.asarray(b.x)
        yb = np.asarray(b.y).astype(np.int64)
        # torch consumes only the REAL edges; ours gets the padded set
        # + mask — both must see the same subgraph
        ref_batches.append((xb, coo_b[:, em].astype(np.int64), yb,
                            rows, None))
        our_batches.append((xb, j32(coo_b), yb, rows,
                            {'edge_mask': jnp.asarray(em)}))
    ref = _torch_trajectory([tc1, tc2], ref_batches)
    ours = _jax_trajectory(model, params, our_batches)
    _check(ref, ours)


def test_cluster_gcn_trajectory():
    """BASELINE config 5 (Cluster-GCN): OUR ClusterLoader's cluster
    batches feed both frameworks."""
    from pytorch_geometric_tpu.loader import ClusterData, ClusterLoader
    data = Data(x=X, edge_index=COO.astype(np.int32), y=Y, num_nodes=N)
    cd = ClusterData(data, num_parts=3, seed=0)
    loader = ClusterLoader(cd, batch_size=1, shuffle=False, seed=0)
    tc1 = tg.nn.GCNConv(F_IN, HID)
    tc2 = tg.nn.GCNConv(HID, C)
    model = TwoLayer(pgnn.GCNConv(out_channels=HID),
                     pgnn.GCNConv(out_channels=C))
    params = {'params': {'conv1': _gcn_tree(tc1),
                         'conv2': _gcn_tree(tc2)}}

    ref_batches, our_batches = [], []
    for b in loader:
        xb = np.asarray(b.x)
        yb = np.asarray(b.y).astype(np.int64)
        coo_b = np.asarray(b.edge_index)
        rows = np.arange(xb.shape[0])
        ref_batches.append((xb, coo_b.astype(np.int64), yb, rows, None))
        our_batches.append((xb, j32(coo_b), yb, rows, {}))
    ref = _torch_trajectory([tc1, tc2], ref_batches)
    ours = _jax_trajectory(model, params, our_batches)
    _check(ref, ours)
