"""Long-tail graph utilities.

Reference: ``torch_geometric/utils/`` — ``mask.py`` (index_to_mask /
mask_to_index / mask_select), ``augmentation.py`` (add_random_edge),
``dropout.py:dropout_path``, ``random.py`` (erdos_renyi / BA / SBM
generators), ``_negative_sampling.py:structured_negative_sampling``,
``loop.py`` (get_self_loop_attr / segregate_self_loops), ``grid.py``,
``num_hops.py``, ``_tree_decomposition.py``, ``geodesic.py``,
``mesh_laplacian.py``, ``nested.py``, ``smiles.py``, ``influence.py``,
``embedding.py`` (get_embeddings), ``sparse.py`` (to_edge_index /
to_torch_*), ``convert.py`` (dgl/cugraph/networkit/trimesh bridges).

JAX analogs throughout: sparse "tensors" are (coo, values, shape)
triples or scipy matrices; "nested tensors" are Python lists of arrays;
torch-only bridges are gated like the reference's optional deps.
"""

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import degree, maybe_num_nodes


def _coo(edge_index):
    return edge_index.coo if hasattr(edge_index, 'coo') else edge_index


# -- masks (reference ``utils/mask.py``) --------------------------------
def index_to_mask(index, size: Optional[int] = None) -> jnp.ndarray:
    index = jnp.asarray(index)
    size = size if size is not None else int(index.max()) + 1
    return jnp.zeros((size,), bool).at[index].set(True)


def mask_to_index(mask) -> jnp.ndarray:
    return jnp.nonzero(jnp.asarray(mask))[0]


def mask_select(src, dim: int, mask) -> jnp.ndarray:
    src = jnp.asarray(src)
    return jnp.compress(np.asarray(mask), src, axis=dim)


def narrow(src, dim: int, start: int, length: int):
    if isinstance(src, (tuple, list)):
        if dim != 0:
            raise ValueError("Cannot narrow a list along dim != 0")
        return list(src)[start:start + length]
    return jax.lax.slice_in_dim(jnp.asarray(src), start, start + length,
                                axis=dim)


def select(src, index_or_mask, dim: int):
    """Select rows of a tensor or list by an index or boolean-mask vector
    (reference ``utils/_select.py::select``). Mask selection is
    host-side (data-dependent output shape)."""
    iom = np.asarray(index_or_mask)
    if isinstance(src, (tuple, list)):
        if dim != 0:
            raise ValueError("Cannot select a list along dim != 0")
        if iom.dtype == bool:
            return [s for s, m in zip(src, iom) if m]
        return [src[int(i)] for i in iom]
    if iom.dtype == bool:
        return mask_select(src, dim, iom)
    return jnp.take(jnp.asarray(src), jnp.asarray(index_or_mask),
                    axis=dim)


# -- structure edits (reference ``augmentation.py`` / ``loop.py``) ------
def add_random_edge(edge_index, p: float = 0.5, force_undirected=False,
                    num_nodes: Optional[int] = None, seed: int = 0):
    """(reference ``augmentation.py:add_random_edge``)."""
    coo = np.asarray(_coo(edge_index))
    n = maybe_num_nodes(coo, num_nodes)
    rng = np.random.default_rng(seed)
    num_new = round(coo.shape[1] * p)
    new = rng.integers(0, n, (2, num_new))
    if force_undirected:
        new = np.concatenate([new, new[::-1]], 1)
    return np.concatenate([coo, new], 1), new


def dropout_path(edge_index, p: float = 0.2, walks_per_node: int = 1,
                 walk_length: int = 3, num_nodes: Optional[int] = None,
                 seed: int = 0):
    """Drop edges along random walks (reference ``dropout.py:212``).
    Returns (edge_index, edge_mask) with static shape."""
    coo = np.asarray(_coo(edge_index))
    n = maybe_num_nodes(coo, num_nodes)
    e = coo.shape[1]
    rng = np.random.default_rng(seed)
    order = np.argsort(coo[0], kind='stable')
    rowptr = np.searchsorted(coo[0][order], np.arange(n + 1))
    start = np.nonzero(rng.random(n) < p)[0]
    start = np.repeat(start, walks_per_node)
    drop = np.zeros(e, bool)
    for s in start:
        cur = s
        for _ in range(walk_length):
            lo, hi = rowptr[cur], rowptr[cur + 1]
            if hi == lo:
                break
            k = order[rng.integers(lo, hi)]
            drop[k] = True
            cur = int(coo[1][k])
    return coo, ~drop


def get_self_loop_attr(edge_index, edge_attr=None,
                       num_nodes: Optional[int] = None) -> jnp.ndarray:
    """(reference ``loop.py:get_self_loop_attr``)."""
    coo = jnp.asarray(_coo(edge_index))
    n = maybe_num_nodes(coo, num_nodes)
    e = coo.shape[1]
    is_loop = coo[0] == coo[1]
    vals = (jnp.ones(e) if edge_attr is None
            else jnp.asarray(edge_attr))
    # reference loop.py assigns loop_attr by index_put: for duplicate
    # self-loops the LAST occurrence wins (not a sum)
    idx = jnp.where(is_loop, coo[0], n)
    pos = jnp.where(is_loop, jnp.arange(e), -1)
    last = jnp.full((n + 1,), -1, jnp.int32).at[idx].max(
        pos.astype(jnp.int32))[:n]
    out = jnp.where(last >= 0, 1.0, 0.0).reshape(
        (n,) + (1,) * (vals.ndim - 1)) * vals[jnp.maximum(last, 0)]
    return out


def segregate_self_loops(edge_index, edge_attr=None):
    """(reference ``loop.py:segregate_self_loops``)."""
    coo = np.asarray(_coo(edge_index))
    loop = coo[0] == coo[1]
    ea = None if edge_attr is None else np.asarray(edge_attr)
    return (coo[:, ~loop], None if ea is None else ea[~loop],
            coo[:, loop], None if ea is None else ea[loop])


def normalize_edge_index(edge_index, num_nodes: Optional[int] = None,
                         add_self_loops: bool = True,
                         symmetric: bool = True):
    """Degree normalization of the edge set (reference
    ``utils/_normalize_edge_index.py:10``): optional self-loop append,
    then ``D^-1/2 A D^-1/2`` (symmetric) or ``D^-1 A`` with the
    ROW (source) degree."""
    coo = jnp.asarray(_coo(edge_index))
    n = maybe_num_nodes(coo, num_nodes)
    if add_self_loops:
        loops = jnp.arange(n, dtype=coo.dtype)
        coo = jnp.concatenate([coo, jnp.stack([loops, loops])], axis=1)
    row, col = coo[0], coo[1]
    deg = jnp.zeros(n, jnp.float32).at[row].add(1.0)
    if symmetric:
        dinv = jnp.where(deg > 0, 1.0 / jnp.sqrt(deg), 0)
        w = dinv[row] * dinv[col]
    else:
        dinv = jnp.where(deg > 0, 1.0 / deg, 0)
        w = dinv[row]
    return coo, w


def get_num_hops(model) -> int:
    """Number of MessagePassing layers in a flax model (reference
    ``utils/num_hops.py`` — counts MP submodules)."""
    from ..nn.message_passing import MessagePassing
    count = 0
    stack = [model]
    while stack:
        m = stack.pop()
        if isinstance(m, MessagePassing):
            count += 1
        for name in getattr(m, '__dataclass_fields__', {}):
            v = getattr(m, name, None)
            if hasattr(v, '__dataclass_fields__'):
                stack.append(v)
    return count


# -- graph generators (reference ``utils/random.py``) -------------------
def erdos_renyi_graph(num_nodes: int, edge_prob: float,
                      directed: bool = False, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    mask = rng.random((num_nodes, num_nodes)) < edge_prob
    np.fill_diagonal(mask, False)
    if not directed:
        mask = np.triu(mask)
        r, c = np.nonzero(mask)
        return np.concatenate([np.stack([r, c]), np.stack([c, r])], 1)
    r, c = np.nonzero(mask)
    return np.stack([r, c])


def barabasi_albert_graph(num_nodes: int, num_edges: int,
                          seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    row, col = [], []
    targets = list(range(num_edges))
    repeated = []
    for v in range(num_edges, num_nodes):
        for t in targets:
            row += [v, t]
            col += [t, v]
        repeated += targets + [v] * num_edges
        targets = list(rng.choice(repeated, num_edges, replace=False))
    return np.stack([np.asarray(row), np.asarray(col)])


def stochastic_blockmodel_graph(block_sizes: Sequence[int],
                                edge_probs, directed: bool = False,
                                seed: int = 0) -> np.ndarray:
    sizes = np.asarray(block_sizes)
    probs = np.asarray(edge_probs)
    n = int(sizes.sum())
    block = np.repeat(np.arange(len(sizes)), sizes)
    rng = np.random.default_rng(seed)
    p = probs[block[:, None], block[None, :]]
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    if not directed:
        mask = np.triu(mask)
        r, c = np.nonzero(mask)
        return np.concatenate([np.stack([r, c]), np.stack([c, r])], 1)
    r, c = np.nonzero(mask)
    return np.stack([r, c])


# -- negative sampling (reference ``_negative_sampling.py:210``) --------
def structured_negative_sampling(edge_index,
                                 num_nodes: Optional[int] = None,
                                 contains_neg_self_loops: bool = True,
                                 seed: int = 0):
    """Per-edge corrupt tail (i, j, k) triples."""
    coo = np.asarray(_coo(edge_index))
    n = maybe_num_nodes(coo, num_nodes)
    rng = np.random.default_rng(seed)
    existing = set(map(tuple, coo.T.tolist()))
    k = rng.integers(0, n, coo.shape[1])
    for idx in range(coo.shape[1]):
        tries = 0
        while tries < 100 and (
                (int(coo[0, idx]), int(k[idx])) in existing
                or (not contains_neg_self_loops
                    and k[idx] == coo[0, idx])):
            k[idx] = rng.integers(0, n)
            tries += 1
    return coo[0], coo[1], k


def structured_negative_sampling_feasible(
        edge_index, num_nodes: Optional[int] = None,
        contains_neg_self_loops: bool = True) -> bool:
    coo = np.asarray(_coo(edge_index))
    n = maybe_num_nodes(coo, num_nodes)
    max_deg = int(np.bincount(coo[0], minlength=n).max()) \
        if coo.size else 0
    return n - max_deg - (0 if contains_neg_self_loops else 1) > 0


# -- grid / mesh (reference ``grid.py``, ``mesh_laplacian.py``) ---------
def grid(height: int, width: int, dtype=np.int64):
    """8-neighbor grid graph + positions (reference ``utils/grid.py``)."""
    n = height * width
    row, col = [], []
    for r in range(height):
        for c in range(width):
            v = r * width + c
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < height and 0 <= cc < width:
                        row.append(v)
                        col.append(rr * width + cc)
    pos = np.stack([np.tile(np.arange(width), height),
                    (height - 1 - np.repeat(np.arange(height), width))
                    ], 1).astype(np.float32)
    return np.stack([np.asarray(row, dtype), np.asarray(col, dtype)]), pos


def get_mesh_laplacian(pos: np.ndarray, face: np.ndarray,
                       normalization: Optional[str] = None):
    """Cotangent mesh Laplacian (reference ``mesh_laplacian.py``):
    off-diagonal = half-cot weights, diagonal = -degree; ``sym``/``rw``
    normalize by the barycentric-area mass matrix."""
    pos, face = np.asarray(pos, np.float64), np.asarray(face)
    n = pos.shape[0]
    import scipy.sparse as sp

    def corner_vals(fn):
        """fn(left_vec, right_vec) per corner; undirected sym sum."""
        vals, rows, cols = [], [], []
        for left, centre, right in ((0, 2, 1), (1, 0, 2), (0, 1, 2)):
            lv = pos[face[left]] - pos[face[centre]]
            rv = pos[face[right]] - pos[face[centre]]
            w = fn(lv, rv)
            # the edge opposite the centre corner gets this weight
            i, j = face[left], face[right]
            rows += [i, j]; cols += [j, i]; vals += [w, w]
        m = sp.coo_matrix((np.concatenate(vals),
                           (np.concatenate(rows), np.concatenate(cols))),
                          shape=(n, n)).tocsr()
        m.sum_duplicates()
        return m

    # NOTE reference pairing: edge (f0,f1) <- cot at f2; (f1,f2) <- cot
    # at f0; (f0,f2) <- cot at f1. corner_vals iterates (left, centre,
    # right) accordingly and assigns to (left, right).
    def cot(lv, rv):
        dot = (lv * rv).sum(-1)
        cross = np.linalg.norm(np.cross(lv, rv), axis=-1)
        return dot / cross / 2.0

    W = corner_vals(cot)
    deg = np.asarray(W.sum(1)).ravel()
    Wc = W.tocoo()
    edge_index = np.concatenate(
        [np.stack([Wc.row, Wc.col]),
         np.stack([np.arange(n), np.arange(n)])], 1)
    weight = np.concatenate([Wc.data, -deg])

    if normalization is not None:
        def area(lv, rv):
            cross = np.linalg.norm(np.cross(lv, rv), axis=-1)
            return cross / 6.0 / 2.0

        area_deg = np.asarray(corner_vals(area).sum(1)).ravel()
        if normalization == 'sym':
            dis = np.where(area_deg > 0, area_deg ** -0.5, 0.0)
            weight = dis[edge_index[0]] * weight * dis[edge_index[1]]
        elif normalization == 'rw':
            di = np.where(area_deg > 0, 1.0 / area_deg, 0.0)
            weight = di[edge_index[0]] * weight
    return edge_index, weight.astype(np.float32)


def geodesic_distance(pos: np.ndarray, face: np.ndarray,
                      src: Optional[np.ndarray] = None,
                      dst: Optional[np.ndarray] = None) -> np.ndarray:
    """Graph-shortest-path approximation of mesh geodesics (the
    reference wraps gdist, ``utils/geodesic.py``)."""
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csg
    pos, face = np.asarray(pos), np.asarray(face)
    n = pos.shape[0]
    rows, cols, vals = [], [], []
    for k in range(3):
        i, j = face[k], face[(k + 1) % 3]
        w = np.linalg.norm(pos[i] - pos[j], axis=-1)
        rows += [i, j]
        cols += [j, i]
        vals += [w, w]
    W = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    if src is None:
        d = csg.dijkstra(W, directed=False)
        return d if dst is None else d[np.arange(n), np.asarray(dst)]
    d = csg.dijkstra(W, directed=False, indices=np.asarray(src))
    if dst is None:
        return d
    return d[np.arange(len(np.asarray(src))), np.asarray(dst)]


# -- nested / sparse conversions (reference ``nested.py``, ``sparse.py``)
def to_nested_tensor(x, batch=None, ptr=None) -> List[np.ndarray]:
    """Ragged views per graph (JAX analog: a list of arrays)."""
    x = np.asarray(x)
    if ptr is not None:
        ptr = np.asarray(ptr)
        return [x[ptr[i]:ptr[i + 1]] for i in range(len(ptr) - 1)]
    if batch is None:
        return [x]
    batch = np.asarray(batch)
    return [x[batch == b] for b in range(int(batch.max()) + 1)]


def from_nested_tensor(xs: List[np.ndarray],
                       return_batch: bool = False):
    cat = np.concatenate([np.asarray(x) for x in xs], 0)
    if not return_batch:
        return cat
    batch = np.repeat(np.arange(len(xs)),
                      [len(np.asarray(x)) for x in xs])
    return cat, batch


def to_edge_index(mat):
    """scipy / (coo, vals) -> (edge_index, edge_weight)
    (reference ``sparse.py:to_edge_index``)."""
    import scipy.sparse as sp
    if sp.issparse(mat):
        coo = mat.tocoo()
        return (np.stack([coo.row, coo.col]).astype(np.int64),
                coo.data)
    coo, vals = mat
    return np.asarray(coo), np.asarray(vals)


def to_scipy_coo(edge_index, edge_weight=None, size=None):
    """JAX analog of ``to_torch_coo_tensor`` (scipy COO)."""
    import scipy.sparse as sp
    coo = np.asarray(_coo(edge_index))
    n = size or (int(coo.max()) + 1 if coo.size else 0)
    shape = (n, n) if isinstance(n, int) else n
    w = np.ones(coo.shape[1]) if edge_weight is None \
        else np.asarray(edge_weight)
    return sp.coo_matrix((w, (coo[0], coo[1])), shape=shape)


def to_scipy_csr(edge_index, edge_weight=None, size=None):
    return to_scipy_coo(edge_index, edge_weight, size).tocsr()


def to_scipy_csc(edge_index, edge_weight=None, size=None):
    return to_scipy_coo(edge_index, edge_weight, size).tocsc()


# aliases matching the reference names (sparse tensors -> scipy)
to_torch_coo_tensor = to_scipy_coo
to_torch_csr_tensor = to_scipy_csr
to_torch_csc_tensor = to_scipy_csc
to_torch_sparse_tensor = to_scipy_coo


def is_sparse(x) -> bool:
    import scipy.sparse as sp
    from ..edge_index import EdgeIndex
    return sp.issparse(x) or isinstance(x, EdgeIndex)


def is_torch_sparse_tensor(x) -> bool:
    import scipy.sparse as sp
    return sp.issparse(x)


# -- embeddings / influence (reference ``embedding.py``, ``influence.py``)
def get_embeddings(model, params, *args, **kwargs) -> List[jnp.ndarray]:
    """Intermediate MessagePassing outputs via flax
    ``capture_intermediates`` (the reference registers torch forward
    hooks, ``utils/embedding.py:13``)."""
    from ..nn.message_passing import MessagePassing
    _, state = model.apply(params, *args, capture_intermediates=True,
                           **kwargs)
    outs = []

    def walk(tree):
        for k in sorted(tree):
            v = tree[k]
            if k == '__call__':
                outs.append(v[0] if isinstance(v, tuple) else v)
            elif isinstance(v, dict):
                walk(v)
    walk(dict(state.get('intermediates', {})))
    return [o for o in outs if hasattr(o, 'ndim') and o.ndim == 2]


def total_influence(grads_or_jac) -> jnp.ndarray:
    """Aggregate absolute influence scores (reference
    ``utils/influence.py``): sum |d out / d x_j| over features."""
    j = jnp.asarray(grads_or_jac)
    return jnp.abs(j).sum(tuple(range(1, j.ndim)))


# -- chemistry (reference ``smiles.py``; rdkit-gated) -------------------
def from_smiles(smiles: str, with_hydrogen: bool = False):
    try:
        from rdkit import Chem
    except ImportError as e:  # pragma: no cover - env without rdkit
        raise ImportError('from_smiles requires rdkit') from e
    mol = Chem.MolFromSmiles(smiles)
    return from_rdmol(mol)


def from_rdmol(mol):
    from ..data import Data
    z = np.asarray([a.GetAtomicNum() for a in mol.GetAtoms()])
    rows, cols = [], []
    for b in mol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        rows += [i, j]
        cols += [j, i]
    return Data(x=z[:, None].astype(np.float32),
                z=z, edge_index=np.stack([rows, cols]) if rows
                else np.zeros((2, 0), np.int64))


def to_smiles(data) -> str:  # pragma: no cover - rdkit-gated
    raise ImportError('to_smiles requires rdkit')


def to_rdmol(data):  # pragma: no cover - rdkit-gated
    raise ImportError('to_rdmol requires rdkit')


def tree_decomposition(mol):
    """Junction-tree decomposition of a molecule
    (reference ``_tree_decomposition.py``; rdkit-gated)."""
    raise ImportError('tree_decomposition requires rdkit')


# -- external bridges (gated like the reference's optional deps) --------
def _gated(name, pkg):
    def fn(*a, **k):
        raise ImportError(f'{name} requires {pkg} (not available)')
    fn.__name__ = name
    return fn


to_dgl = _gated('to_dgl', 'dgl')
from_dgl = _gated('from_dgl', 'dgl')
to_cugraph = _gated('to_cugraph', 'cugraph')
from_cugraph = _gated('from_cugraph', 'cugraph')
to_networkit = _gated('to_networkit', 'networkit')
from_networkit = _gated('from_networkit', 'networkit')
to_trimesh = _gated('to_trimesh', 'trimesh')
from_trimesh = _gated('from_trimesh', 'trimesh')


def group_cat(tensors, indices, dim: int = 0, return_index: bool = False):
    """Concatenate groups keeping per-group order
    (reference ``_scatter.py:group_cat``)."""
    cat = np.concatenate([np.asarray(t) for t in tensors], dim)
    idx = np.concatenate([np.asarray(i) for i in indices])
    order = np.argsort(idx, kind='stable')
    out = np.take(cat, order, axis=dim)
    return (out, idx[order]) if return_index else out


def get_embeddings_hetero(model, params, *args, **kwargs):
    """Per-type intermediate embeddings (reference
    ``utils/embedding.py:get_embeddings_hetero``) via flax
    ``capture_intermediates``; returns {node_type: [layer outputs]}
    when intermediates are dicts, else a flat list."""
    _, state = model.apply(params, *args, capture_intermediates=True,
                           **kwargs)
    per_type = {}

    def walk(tree, path):
        for k in sorted(tree):
            v = tree[k]
            if k == '__call__':
                out = v[0] if isinstance(v, tuple) else v
                if isinstance(out, dict):
                    for t, arr in out.items():
                        per_type.setdefault(t, []).append(arr)
            elif isinstance(v, dict):
                walk(v, path + (k,))
    walk(dict(state.get('intermediates', {})), ())
    return per_type
