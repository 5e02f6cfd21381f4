"""2-D (data x graph) mesh training test."""
import jax
import numpy as np
import pytest

from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.parallel.mesh2d import make_mesh2d, train_2d

rng = np.random.default_rng(0)


def make_graph(n, e):
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    return Data(x=rng.standard_normal((n, 8)).astype(np.float32),
                edge_index=coo, y=rng.integers(0, 3, n), num_nodes=n)


def test_train_2d_mesh():
    devs = jax.devices('cpu')
    if len(devs) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = make_mesh2d(2, 4, devices=devs[:8])
    datas = [make_graph(60, 260), make_graph(72, 300)]
    params, losses = train_2d(datas, num_graph_parts=4, mesh=mesh,
                              hidden=16, num_steps=25, lr=5e-2)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
