"""Full-fidelity IBMB (VERDICT r3 missing #5): PPR-pair merging, heap
post-process, per-output top-k aux sets, topic-sensitive PPR power
method, KL-based batch ordering (reference ``loader/ibmb_loader.py``)."""
import numpy as np

from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.loader import IBMBBatchLoader, IBMBNodeLoader
from pytorch_geometric_tpu.loader.ibmb import (get_pair_wise_distance,
                                               get_pairs,
                                               ppr_power_method,
                                               prime_orient_merge,
                                               prime_post_process)

rng = np.random.default_rng(3)


def _graph(n=60, e=240, classes=3):
    half = np.stack([rng.integers(0, n, e // 2),
                     rng.integers(0, n, e // 2)])
    coo = np.concatenate([half, half[::-1]], 1).astype(np.int32)
    return Data(x=rng.standard_normal((n, 4)).astype(np.float32),
                edge_index=coo, y=rng.integers(0, classes, n),
                num_nodes=n)


def test_prime_orient_merge_respects_cap():
    pairs = np.array([[0, 1], [1, 2], [2, 3], [4, 5], [0, 4]])
    groups = prime_orient_merge(pairs, primes_per_batch=2, num_nodes=6)
    assert sorted(len(g) for g in groups) == [2, 2, 2]
    flat = sorted(v for g in groups for v in g)
    assert flat == list(range(6))


def test_prime_post_process_merges_small_groups():
    groups = [[0], [1], [2, 3], [4, 5, 6]]
    out = prime_post_process([list(g) for g in groups],
                             merge_max_size=3)
    flat = sorted(v for g in out for v in g)
    assert flat == list(range(7))
    assert all(len(g) <= 3 for g in out)
    assert len(out) < len(groups)


def test_get_pairs_sorted_heaviest_first():
    m = np.array([[0.0, 0.5, 0.0], [0.0, 0.0, 0.9], [0.1, 0.0, 0.0]])
    pairs = get_pairs(m)
    # symmetrized: (1,2)=0.9 > (0,1)=0.5 > (0,2)=0.1
    assert pairs[0].tolist() == [1, 2]
    assert pairs[1].tolist() == [0, 1]


def test_ppr_power_method_concentrates_on_teleport_set():
    n = 12
    A = np.zeros((n, n))
    ring = np.arange(n)
    A[ring, (ring + 1) % n] = 1
    A[(ring + 1) % n, ring] = 1
    adj_rw = A / A.sum(1, keepdims=True)
    sets = [np.array([0]), np.array([6])]
    out = ppr_power_method(adj_rw, sets, topk=3, num_iter=60, alpha=0.3)
    assert 0 in out[0] and 6 in out[1]


def test_kl_distance_symmetric_zero_diag():
    ys = [np.array([0, 0, 1]), np.array([1, 1, 2]), np.array([0, 2])]
    d = get_pair_wise_distance(ys, 3)
    assert np.allclose(d, d.T)
    assert np.allclose(np.diag(d), 0)
    assert (d[np.triu_indices(3, 1)] > 0).all()


def test_node_loader_order_modes_cover_outputs():
    data = _graph()
    for order in ('order', 'sample', 'rand'):
        loader = IBMBNodeLoader(data, batch_order=order,
                                output_indices=np.arange(40),
                                num_nodes_per_batch=10,
                                num_auxiliary_nodes=5)
        outs = []
        for b in loader:
            m = np.asarray(b.output_node_mask)
            outs.extend(np.asarray(b.n_id)[m].tolist())
            # per-output aux sets pulled in beyond the outputs
            assert b.num_nodes >= m.sum()
        assert sorted(outs) == list(range(40))


def test_node_loader_batches_group_ppr_similar_outputs():
    """Two disconnected cliques: merging by PPR mass must never mix
    them within a batch (batch size == clique size)."""
    k = 8
    blocks = []
    for off in (0, k):
        a, b = np.meshgrid(np.arange(k), np.arange(k))
        sel = a != b
        blocks.append(np.stack([a[sel] + off, b[sel] + off]))
    coo = np.concatenate(blocks, 1).astype(np.int32)
    data = Data(x=np.ones((2 * k, 2), np.float32), edge_index=coo,
                y=np.zeros(2 * k, np.int64), num_nodes=2 * k)
    loader = IBMBNodeLoader(data, batch_order='rand',
                            output_indices=np.arange(2 * k),
                            num_nodes_per_batch=k,
                            num_auxiliary_nodes=4)
    for b in loader:
        outs = np.asarray(b.n_id)[np.asarray(b.output_node_mask)]
        assert (outs < k).all() or (outs >= k).all()


def test_batch_loader_expand_ratio_and_coverage():
    data = _graph()
    loader = IBMBBatchLoader(data, batch_order='order',
                             num_partitions=4,
                             input_nodes=np.arange(50),
                             batch_expand_ratio=1.5)
    outs = []
    for b in loader:
        m = np.asarray(b.output_node_mask)
        outs.extend(np.asarray(b.n_id)[m].tolist())
    assert sorted(outs) == list(range(50))
    # bigger expand ratio -> at least as many auxiliary nodes
    small = IBMBBatchLoader(data, batch_order='rand', num_partitions=4,
                            input_nodes=np.arange(50),
                            batch_expand_ratio=0.5)
    tot_big = sum(b.num_nodes for b in loader)
    tot_small = sum(b.num_nodes for b in small)
    assert tot_big >= tot_small
