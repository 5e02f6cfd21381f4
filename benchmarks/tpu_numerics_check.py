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
import jax
rec['backend'] = jax.default_backend()
print(json.dumps(rec))
