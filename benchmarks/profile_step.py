"""Component-level timing of the bench.py GCN step on the real chip.

Times each piece with K iterations inside one jitted fori_loop so
tunnel dispatch overhead is amortised; prints one JSON line per probe.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu import EdgeIndex
from pytorch_geometric_tpu.nn import gcn_norm
from pytorch_geometric_tpu.nn.models import GCN

N, E, F, H, C = 10_000, 200_000, 64, 64, 10
K = 100


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(json.dumps({'probe': name, 'ms_per_iter': round(dt * 1e3, 4)}),
          flush=True)
    return dt


def loop(body):
    """K-iteration loop with a data dependence to defeat CSE."""
    @jax.jit
    def run(x0):
        def step(i, acc):
            return acc + body(acc)[: x0.shape[0]] * 1e-9
        return jax.lax.fori_loop(0, K, step, x0)
    return run


def main():
    print(json.dumps({'backend': jax.default_backend()}), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    coo = jnp.asarray(rng.integers(0, N, (2, E)).astype(np.int32))
    y = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
    coo_n, w = gcn_norm(coo, None, N)
    ei = EdgeIndex(coo_n, (N, N)).fill_cache()
    blk, blk_t = ei.blocked, ei.blocked_t
    e_pad = blk.src.shape[0]
    print(json.dumps({'e_pad': int(e_pad), 'chunks': int(e_pad // 1024)}),
          flush=True)

    from pytorch_geometric_tpu.ops.pallas_spmm import (
        segment_sum_blocked, spmm_pallas, _spmm_blocked)

    # 1. dense matmul reference point: A[10k,10k] @ X
    A = jnp.zeros((N, N), jnp.float32).at[coo_n[1], coo_n[0]].add(
        jnp.asarray(w))
    timed('dense_AX', loop(lambda acc: A @ acc), x)

    # 2. gather only (blocked src order)
    src = blk.src
    timed('gather_x_src', loop(lambda acc: jnp.sum(
        acc[src], axis=0, keepdims=True).repeat(N, 0)), x)

    # 3. blocked kernel only (pre-gathered msg)
    msg = x[src] * jnp.ones((e_pad, 1), jnp.float32)
    meta = (blk.dst, blk.chunk_base)

    @jax.jit
    def kern_loop(m):
        def step(i, acc):
            out = segment_sum_blocked(m + acc[:1, :1] * 0, meta, N)
            return acc + out[:1, :1] * 1e-9
        return jax.lax.fori_loop(0, K, step, jnp.zeros((1, 1)))
    out = kern_loop(msg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(kern_loop(msg))
    print(json.dumps({'probe': 'kernel_only',
                      'ms_per_iter': round((time.perf_counter() - t0)
                                           / K * 1e3, 4)}), flush=True)

    # 4. full spmm fwd (gather + weight + kernel)
    timed('spmm_fwd', loop(lambda acc: spmm_pallas(ei, acc)), x)

    # 5. spmm fwd+bwd
    def fb(acc):
        val, grad = jax.value_and_grad(
            lambda z: spmm_pallas(ei, z).sum())(acc)
        return grad
    timed('spmm_fwd_bwd', loop(fb), x)

    # 6. XLA segment-sum fwd+bwd A/B
    import pytorch_geometric_tpu.backend as backend
    backend.use_pallas_spmm = False
    timed('spmm_fwd_bwd_xla', loop(fb), x)
    backend.use_pallas_spmm = None

    # 7. full train step
    model = GCN(hidden_channels=H, num_layers=3, out_channels=C,
                conv_kwargs={'normalize': False, 'add_self_loops': False})
    params = model.init(jax.random.PRNGKey(0), x, ei, edge_weight=w)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = model.apply(p, x, ei, edge_weight=w)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def train_loop(params, opt_state):
        def step(i, carry):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state)
        return jax.lax.fori_loop(0, K, step, (params, opt_state))
    outp = train_loop(params, opt_state)
    jax.block_until_ready(outp)
    t0 = time.perf_counter()
    jax.block_until_ready(train_loop(params, opt_state))
    print(json.dumps({'probe': 'train_step',
                      'ms_per_iter': round((time.perf_counter() - t0)
                                           / K * 1e3, 4)}), flush=True)


if __name__ == '__main__':
    main()
