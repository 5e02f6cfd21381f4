"""Real-TPU numerics validation for the lane-padded narrow segment
ops (ops/scatter.py::_pad_lanes, ops/softmax.py): the padded path is
TPU-only, so CPU tests exercise it via PGT_FORCE_LANE_PAD — this script
checks the actual TPU lowering against numpy (recorded r4: max abs err
<= 8e-6 across sum/mean/min/max + masked softmax).

Usage: python benchmarks/tpu_numerics_check.py   # on the TPU backend
"""
import json, sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
from pytorch_geometric_tpu.ops import scatter, softmax

rng = np.random.default_rng(4)
E, N, H = 5003, 37, 4
src = rng.standard_normal((E, H)).astype(np.float32)
idx = rng.integers(0, N, E).astype(np.int32)
mask = rng.random(E) < 0.8
rec = {}
for reduce in ('sum', 'mean', 'min', 'max'):
    out = np.asarray(scatter(jnp.asarray(src), jnp.asarray(idx), N,
                             reduce, mask=jnp.asarray(mask)))
    # numpy ref
    ref = np.zeros((N, H))
    s, i = src[mask], idx[mask]
    if reduce in ('sum', 'mean'):
        np.add.at(ref, i, s)
        if reduce == 'mean':
            ref /= np.maximum(np.bincount(i, minlength=N), 1)[:, None]
    else:
        fill = np.inf if reduce == 'min' else -np.inf
        ref[:] = fill
        op = np.minimum if reduce == 'min' else np.maximum
        for j, row in zip(i, s):
            ref[j] = op(ref[j], row)
        ref = np.where(np.isfinite(ref), ref, 0)
    rec[reduce] = float(np.abs(out - ref).max())
o = np.asarray(softmax(jnp.asarray(src), jnp.asarray(idx), N,
                       mask=jnp.asarray(mask)))
ref = np.zeros_like(src)
for seg in range(N):
    sel = (idx == seg) & mask
    if sel.any():
        v = src[sel] - src[sel].max(0)
        ref[sel] = np.exp(v) / (np.exp(v).sum(0) + 1e-16)
rec['softmax'] = float(np.abs(o - ref).max())

# windowed (sorted-chunk) SpMM vs numpy (r4 session 3)
from pytorch_geometric_tpu.edge_index import (EdgeIndex,
                                              build_windowed_csc)
from pytorch_geometric_tpu.ops import spmm
n_s, n_d, e2, f2 = 301, 257, 9001, 24
coo = np.stack([rng.integers(0, n_s, e2),
                rng.integers(0, n_d, e2)]).astype(np.int32)
x2 = rng.standard_normal((n_s, f2)).astype(np.float32)
w2 = rng.standard_normal(e2).astype(np.float32)
adj = EdgeIndex(coo, (n_s, n_d),
                win=build_windowed_csc(coo, n_d, n_s, chunk_edges=1024),
                win_t=build_windowed_csc(coo[::-1], n_s, n_d,
                                         chunk_edges=1024))
out = np.asarray(spmm(adj, jnp.asarray(x2), jnp.asarray(w2)))
ref2 = np.zeros((n_d, f2))
np.add.at(ref2, coo[1], w2[:, None] * x2[coo[0]])
rec['windowed_spmm'] = float(np.abs(out - ref2).max())

# fused hetero edge attention vs numpy union softmax
from pytorch_geometric_tpu.ops.edge_attention import hetero_edge_attention
H2, D2 = 4, 16
m = 211
k_t = rng.standard_normal((m, H2, D2)).astype(np.float32)
v_t = rng.standard_normal((m, H2, D2)).astype(np.float32)
kv = np.concatenate([k_t.reshape(m, -1), v_t.reshape(m, -1)], axis=1)
q = rng.standard_normal((n_d, H2, D2)).astype(np.float32)
R2 = 3
p_stack = rng.standard_normal((R2, H2)).astype(np.float32)
rel = rng.integers(0, R2, e2).astype(np.int32)
s_i = rng.integers(0, m, e2).astype(np.int32)
d_i = rng.integers(0, n_d, e2).astype(np.int32)
out = np.asarray(hetero_edge_attention(
    jnp.asarray(kv), jnp.asarray(q), jnp.asarray(p_stack),
    jnp.asarray(rel), jnp.asarray(s_i), jnp.asarray(d_i), n_d))
k_e, v_e = k_t[s_i], v_t[s_i]
logit = (q[d_i] * k_e).sum(-1) * p_stack[rel]
ref3 = np.zeros((n_d, H2, D2))
for seg in range(n_d):
    sel = d_i == seg
    if sel.any():
        a = np.exp(logit[sel] - logit[sel].max(0))
        a = a / (a.sum(0) + 1e-16)
        ref3[seg] = (a[..., None] * v_e[sel]).sum(0)
rec['hetero_edge_attention'] = float(np.abs(out - ref3).max())

import jax
rec['backend'] = jax.default_backend()
print(json.dumps(rec))
