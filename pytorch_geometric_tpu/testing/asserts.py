"""Module-correctness assertion helper (reference
``torch_geometric/testing/asserts.py:16``).

Checks a flax conv/module for: (1) expected output shape, (2) edge-
permutation invariance, (3) optional node-permutation equivariance.
Layout invariance (the reference's torch_sparse/CSC/COO matrix) maps to
checking the module against a blocked-cache :class:`EdgeIndex` — the
only alternate layout that changes our dispatch.
"""

from typing import Any, Optional, Tuple

import jax
import numpy as np

from ..edge_index import EdgeIndex

__all__ = ['assert_module']


def _apply(module, params, x, ei, **kwargs):
    return np.asarray(module.apply(params, x, ei, **kwargs))


def assert_module(module, x, edge_index, *,
                  expected_size: Tuple[int, ...],
                  test_edge_permutation: bool = True,
                  test_node_permutation: bool = False,
                  test_sparse_layouts: bool = True,
                  sparse_size: Optional[Tuple[int, int]] = None,
                  atol: float = 1e-6, rtol: float = 1e-5,
                  seed: int = 0, **kwargs) -> Any:
    """Initializes ``module`` and asserts shape + invariances; returns
    the baseline output."""
    coo = np.asarray(edge_index.coo if isinstance(edge_index, EdgeIndex)
                     else edge_index)
    n = sparse_size or (int(np.asarray(x).shape[0]),) * 2
    ei = (edge_index if isinstance(edge_index, EdgeIndex)
          else EdgeIndex(coo, n))
    params = module.init(jax.random.PRNGKey(seed), x, ei, **kwargs)
    out = _apply(module, params, x, ei, **kwargs)
    assert out.shape == tuple(expected_size), \
        f'output shape {out.shape} != expected {tuple(expected_size)}'

    if test_edge_permutation:
        perm = np.random.default_rng(seed).permutation(coo.shape[1])
        ei_p = EdgeIndex(coo[:, perm], n)
        out_p = _apply(module, params, x, ei_p, **kwargs)
        np.testing.assert_allclose(out, out_p, atol=atol, rtol=rtol,
                                   err_msg='not edge-permutation '
                                           'invariant')

    if test_sparse_layouts:
        ei_c = EdgeIndex(coo, n).fill_cache()
        out_c = _apply(module, params, x, ei_c, **kwargs)
        np.testing.assert_allclose(out, out_c, atol=atol, rtol=rtol,
                                   err_msg='cached-layout output differs')

    if test_node_permutation:
        rng = np.random.default_rng(seed + 1)
        pi = rng.permutation(n[0])
        inv = np.empty_like(pi)
        inv[pi] = np.arange(len(pi))
        x_p = np.asarray(x)[pi]
        ei_n = EdgeIndex(inv[coo], n)
        out_n = _apply(module, params, x_p, ei_n, **kwargs)
        np.testing.assert_allclose(out[pi], out_n, atol=atol, rtol=rtol,
                                   err_msg='not node-permutation '
                                           'equivariant')
    return out
