"""Headline benchmark — GCN training throughput.

Mirrors the reference's torch.compile benchmark protocol
(``docs/source/advanced/compile.rst:95-117``): a GCN on a synthetic graph
with 10k nodes / 200k edges, hidden=64, timed over 500 optimisation steps.
Reference baseline: 4.8093 s eager / 1.6978 s compiled (unspecified GPU).

Prints ONE JSON line:
    {"metric": "gcn_train_500steps", "value": <seconds>, "unit": "s",
     "vs_baseline": <ref_eager_seconds / ours>}
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu import EdgeIndex
from pytorch_geometric_tpu.nn.models import GCN

N, E, F, H, C = 10_000, 200_000, 64, 64, 10
STEPS = 500
BASELINE_EAGER_S = 4.8093  # compile.rst:95-117


def _ensure_backend():
    try:
        jax.devices()
        return
    except RuntimeError:
        pass
    try:
        from jax._src import xla_bridge
        xla_bridge._clear_backends()
    except Exception:
        pass
    jax.config.update('jax_platforms', '')
    jax.devices()


def main():
    _ensure_backend()
    from pytorch_geometric_tpu.nn import gcn_norm
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    coo = jnp.asarray(rng.integers(0, N, (2, E)).astype(np.int32))
    y = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
    # cached normalisation (reference GCNConv(cached=True) protocol):
    # precompute D^-1/2(A+I)D^-1/2 once; the conv then runs the fused
    # SpMM path (Pallas MXU kernel on TPU).
    coo_n, w = gcn_norm(coo, None, N)
    edge_index = EdgeIndex(coo_n, (N, N)).fill_cache()

    model = GCN(hidden_channels=H, num_layers=3, out_channels=C,
                conv_kwargs={'normalize': False,
                             'add_self_loops': False})
    params = model.init(jax.random.PRNGKey(0), x, edge_index,
                        edge_weight=w)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    def loss_fn(params, x, edge_index, w, y):
        logits = model.apply(params, x, edge_index, edge_weight=w)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    def train_step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, x, edge_index,
                                                  w, y)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    # All STEPS inside one device call (lax.scan): the whole training
    # loop compiles to a single XLA program, so host<->device dispatch
    # overhead is paid once, not per step — the TPU-native analog of the
    # reference's 500-iteration python loop.
    @jax.jit
    def train_n(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            train_step, (params, opt_state), None, length=STEPS)
        return params, opt_state, losses[-1]

    # Warmup / compile.
    p1, o1, loss = train_n(params, opt_state)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    params, opt_state, loss = train_n(params, opt_state)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    print(json.dumps({
        'metric': 'gcn_train_500steps',
        'value': round(dt, 4),
        'unit': 's',
        'vs_baseline': round(BASELINE_EAGER_S / dt, 3),
        'backend': jax.default_backend(),
    }))


def _main_with_watchdog():
    """Run the bench in a child process with a timeout; if the default
    (TPU) backend is wedged, fall back to CPU so the driver always gets
    its JSON line."""
    import os
    import subprocess
    import sys

    if os.environ.get('PGT_BENCH_CHILD'):
        main()
        return

    env = {**os.environ, 'PGT_BENCH_CHILD': '1'}
    try:
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             timeout=480)
        line = [l for l in out.stdout.splitlines()
                if l.startswith('{')]
        if out.returncode == 0 and line:
            print(line[-1])
            return
    except subprocess.TimeoutExpired:
        pass
    # fallback: CPU backend (still one valid JSON line)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PGT_FORCE_CPU'] = '1'
    out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                         env=env, capture_output=True, text=True,
                         timeout=1200)
    line = [l for l in out.stdout.splitlines() if l.startswith('{')]
    print(line[-1] if line else json.dumps({
        'metric': 'gcn_train_500steps', 'value': -1.0, 'unit': 's',
        'vs_baseline': 0.0}))


if __name__ == '__main__':
    import os
    if os.environ.get('PGT_FORCE_CPU'):
        jax.config.update('jax_platforms', 'cpu')
    if os.environ.get('PGT_BENCH_CHILD'):
        main()
    else:
        _main_with_watchdog()
