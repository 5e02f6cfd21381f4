"""LinkPred retrieval metrics parity vs the reference PyG oracle."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.metrics as RM

import pytorch_geometric_tpu.metrics as M

rng = np.random.default_rng(6)
Q, K, NDST = 12, 5, 30
PRED = np.stack([rng.choice(NDST, K, replace=False) for _ in range(Q)])
# ground truth: 0-4 true destinations per query
rows, cols = [], []
for q in range(Q):
    for d in rng.choice(NDST, rng.integers(0, 5), replace=False):
        rows.append(q)
        cols.append(int(d))
ELI = np.stack([np.array(rows), np.array(cols)]).astype(np.int64)


def t(x):
    return torch.from_numpy(np.asarray(x))


CASES = [
    'LinkPredPrecision', 'LinkPredRecall', 'LinkPredF1', 'LinkPredMAP',
    'LinkPredNDCG', 'LinkPredMRR', 'LinkPredHitRatio',
]


@pytest.mark.parametrize('name', CASES)
def test_ranking_metrics(name):
    ref = getattr(RM, name)(k=K)
    ref.update(t(PRED), t(ELI))
    r = float(ref.compute())
    ours = getattr(M, name)(k=K)
    ours.update(PRED, ELI)
    o = float(ours.compute())
    assert abs(o - r) < 1e-5, (name, o, r)


def test_coverage_diversity_personalization():
    ref = RM.LinkPredCoverage(k=K, num_dst_nodes=NDST)
    ref.update(t(PRED), t(ELI))
    r = float(ref.compute())
    ours = M.LinkPredCoverage(k=K, num_dst_nodes=NDST)
    ours.update(PRED, ELI)
    assert abs(float(ours.compute()) - r) < 1e-5

    ref = RM.LinkPredPersonalization(k=K)
    ref.update(t(PRED), t(ELI))
    r = float(ref.compute())
    ours = M.LinkPredPersonalization(k=K)
    ours.update(PRED, ELI)
    assert abs(float(ours.compute()) - r) < 1e-5


def test_average_popularity():
    pop = rng.integers(1, 50, NDST)
    ref = RM.LinkPredAveragePopularity(k=K, popularity=t(pop))
    ref.update(t(PRED), t(ELI))
    r = float(ref.compute())
    ours = M.LinkPredAveragePopularity(k=K, popularity=pop)
    ours.update(PRED, ELI)
    assert abs(float(ours.compute()) - r) < 1e-4


def test_streaming_updates_accumulate():
    """Two updates == one concatenated update (both frameworks)."""
    half = Q // 2
    m1 = ELI[:, ELI[0] < half]
    m2 = ELI[:, ELI[0] >= half]
    m2 = np.stack([m2[0] - half, m2[1]])
    ref = RM.LinkPredMAP(k=K)
    ref.update(t(PRED[:half]), t(m1))
    ref.update(t(PRED[half:]), t(m2))
    r = float(ref.compute())
    ours = M.LinkPredMAP(k=K)
    ours.update(PRED[:half], m1)
    ours.update(PRED[half:], m2)
    assert abs(float(ours.compute()) - r) < 1e-5
