"""Component-level timing of the bench.py GCN step on the real chip.

Times each piece with K iterations inside one jitted fori_loop so
tunnel dispatch overhead is amortised; prints one JSON line per probe.
All tensors are passed as jit ARGUMENTS (closure-captured constants get
serialised into the remote-compile request body and 413 the tunnel).
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu import EdgeIndex
from pytorch_geometric_tpu.nn.models import GCN
from bench import _gcn_norm_np  # noqa: E402

N, E, F, H, C = 10_000, 200_000, 64, 64, 10
K = 100


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(json.dumps({'probe': name, 'ms_per_iter': round(dt * 1e3, 4)}),
          flush=True)
    return dt


def kloop(body):
    """K-iteration fori_loop with a data dependence to defeat CSE."""
    def run(x0, *rest):
        def step(i, acc):
            return acc + body(acc, *rest)[: x0.shape[0]] * 1e-9
        return jax.lax.fori_loop(0, K, step, x0)
    return run


def main():
    print(json.dumps({'backend': jax.default_backend()}), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    coo_np = rng.integers(0, N, (2, E)).astype(np.int32)
    y = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
    t0 = time.perf_counter()
    coo_n, w_np = _gcn_norm_np(coo_np, N)
    w = jnp.asarray(w_np)
    ei = EdgeIndex(coo_n, (N, N)).fill_cache()
    print(json.dumps({'probe': 'fill_cache_s',
                      'seconds': round(time.perf_counter() - t0, 2)}),
          flush=True)
    blk = ei.blocked
    e_pad = blk.src.shape[0]
    print(json.dumps({'e_pad': int(e_pad), 'chunks': int(e_pad // 1024)}),
          flush=True)

    from pytorch_geometric_tpu.ops.pallas_spmm import (
        segment_sum_blocked, spmm_pallas)

    # 1. dense matmul reference point: A[10k,10k] @ X (A built on host)
    A_np = np.zeros((N, N), np.float32)
    np.add.at(A_np, (coo_n[1], coo_n[0]), w_np)
    A = jnp.asarray(A_np)
    timed('dense_AX', kloop(lambda acc, A_: A_ @ acc), x, A)
    del A, A_np

    # 2. gather only (blocked src order)
    timed('gather_x_src', kloop(
        lambda acc, src: acc[src].sum(0, keepdims=True).repeat(N, 0)),
        x, blk.src)

    # 3. blocked kernel only (pre-gathered msg)
    msg = jnp.zeros((e_pad, F), jnp.float32) + 0.5

    def kern(acc, m, dst, base):
        out = segment_sum_blocked(m + acc[:1, :1] * 0, (dst, base), N)
        return out
    timed('kernel_only', kloop(kern), jnp.zeros((N, F)), msg,
          blk.dst, blk.chunk_base)

    # 4. full spmm fwd (gather + weight + kernel)
    timed('spmm_fwd', kloop(lambda acc, e: spmm_pallas(e, acc)), x, ei)

    # 5. spmm fwd+bwd
    def fb(acc, e):
        return jax.grad(lambda z: spmm_pallas(e, z).sum())(acc)
    timed('spmm_fwd_bwd', kloop(fb), x, ei)

    # 6. XLA segment-sum fwd+bwd A/B (no blocked cache -> plain path)
    import pytorch_geometric_tpu.backend as backend
    backend.use_pallas_spmm = False
    timed('spmm_fwd_bwd_xla', kloop(fb), x, ei)
    backend.use_pallas_spmm = None

    # 6b. cached-dense spmm (weights baked at fill_cache)
    from pytorch_geometric_tpu.ops.spmm import spmm as spmm_dispatch
    ei_d = EdgeIndex(coo_n, (N, N)).fill_cache(dense_weight=w_np)
    timed('spmm_dense_fwd', kloop(
        lambda acc, e: spmm_dispatch(e, acc)), x, ei_d)

    def fbd(acc, e):
        return jax.grad(lambda z: spmm_dispatch(e, z).sum())(acc)
    timed('spmm_dense_fwd_bwd', kloop(fbd), x, ei_d)

    # 7. full train step
    model = GCN(hidden_channels=H, num_layers=3, out_channels=C,
                conv_kwargs={'normalize': False, 'add_self_loops': False})
    params = model.init(jax.random.PRNGKey(0), x, ei, edge_weight=w)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    def train_loop(params, opt_state, x, ei, w, y):
        def loss_fn(p):
            logits = model.apply(p, x, ei, edge_weight=w)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        def step(i, carry):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state)
        return jax.lax.fori_loop(0, K, step, (params, opt_state))

    f = jax.jit(train_loop)
    outp = f(params, opt_state, x, ei, w, y)
    jax.block_until_ready(outp)
    t0 = time.perf_counter()
    jax.block_until_ready(f(params, opt_state, x, ei, w, y))
    print(json.dumps({'probe': 'train_step',
                      'ms_per_iter': round((time.perf_counter() - t0)
                                           / K * 1e3, 4)}), flush=True)

    # 8. train step over the cached-dense EdgeIndex (bench.py config)
    params_d = model.init(jax.random.PRNGKey(0), x, ei_d)
    opt_d = tx.init(params_d)
    outp = f(params_d, opt_d, x, ei_d, None, y)
    jax.block_until_ready(outp)
    t0 = time.perf_counter()
    jax.block_until_ready(f(params_d, opt_d, x, ei_d, None, y))
    print(json.dumps({'probe': 'train_step_dense',
                      'ms_per_iter': round((time.perf_counter() - t0)
                                           / K * 1e3, 4)}), flush=True)


if __name__ == '__main__':
    main()
