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
# reference eager baselines, compile.rst:95-142 (unspecified GPU)
BASELINES = {'gcn': 4.8093, 'sage': 3.2451, 'gin': 3.3690}
MODEL = __import__('os').environ.get('PGT_BENCH_MODEL', 'gcn')
BASELINE_EAGER_S = BASELINES[MODEL]


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


def _gcn_norm_np(coo: np.ndarray, n: int):
    """Host-side D^-1/2 (A+I) D^-1/2 (same math as nn.gcn_norm) so the
    graph + blocked layout are built without any device round-trips —
    a device->host COO pull over the remote-TPU tunnel can cost
    minutes."""
    loops = np.arange(n, dtype=coo.dtype)
    row = np.concatenate([coo[0], loops])
    col = np.concatenate([coo[1], loops])
    w = np.ones(row.shape[0], np.float32)
    deg = np.bincount(col, weights=w, minlength=n)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    return np.stack([row, col]), (dinv[row] * w * dinv[col]).astype(
        np.float32)


def main():
    _ensure_backend()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    coo_np = rng.integers(0, N, (2, E)).astype(np.int32)
    y = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
    # cached normalisation (reference GCNConv(cached=True) protocol):
    # precompute D^-1/2(A+I)D^-1/2 once; the conv then runs the fused
    # SpMM path (Pallas MXU kernel on TPU). SAGE/GIN aggregate the raw
    # adjacency (unit weights).
    if MODEL == 'gcn':
        coo_n, w_np = _gcn_norm_np(coo_np, N)
    else:
        coo_n, w_np = coo_np, np.ones(E, np.float32)
    # bake the cached norm into a dense adjacency (the TPU analog of
    # GCNConv(cached=True)): spmm then runs as an MXU matmul at ~78% of
    # HBM roofline vs ~7% for the gather path (benchmarks/profile_step.py).
    # On the CPU fallback the [N,N] dense path is ~40 TFLOP of matmuls —
    # keep the sparse gather path there instead.
    on_cpu = jax.default_backend() == 'cpu'
    # bf16 adjacency storage + f32 accumulation: the [N,N] stream is the
    # bandwidth bottleneck; halving it is the TPU analog of the
    # reference baseline's TF32 matmuls (same "reduced-precision
    # storage, full-precision accumulate" trade). ~1e-2 rel error per
    # SpMM; loss trajectories stay within training noise
    # (tests/test_training_parity.py covers the f32 path).
    edge_index = EdgeIndex(coo_n, (N, N)).fill_cache(
        dense_weight=None if on_cpu else w_np,
        cache_dtype=None if on_cpu else jnp.bfloat16)
    edge_weight = jnp.asarray(w_np) if on_cpu else None

    if MODEL == 'gcn':
        model = GCN(hidden_channels=H, num_layers=3, out_channels=C,
                    conv_kwargs={'normalize': False,
                                 'add_self_loops': False})
        kw = ({} if edge_weight is None
              else {'edge_weight': edge_weight})
    elif MODEL == 'sage':
        from pytorch_geometric_tpu.nn.models import GraphSAGE
        model = GraphSAGE(hidden_channels=H, num_layers=3,
                          out_channels=C)
        kw = {}
    else:
        from pytorch_geometric_tpu.nn.models import GIN
        model = GIN(hidden_channels=H, num_layers=3, out_channels=C)
        kw = {}
    params = model.init(jax.random.PRNGKey(0), x, edge_index, **kw)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    def loss_fn(params, x, edge_index, y):
        logits = model.apply(params, x, edge_index, **kw)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    # All STEPS inside one device call (lax.scan): the whole training
    # loop compiles to a single XLA program, so host<->device dispatch
    # overhead is paid once, not per step — the TPU-native analog of the
    # reference's 500-iteration python loop. Data tensors are jit
    # ARGUMENTS: closure-captured constants get serialised into the
    # remote-compile request body (the cached dense adjacency alone is
    # 400 MB) and overflow the tunnel's request limit.
    @jax.jit
    def train_n(params, opt_state, x, edge_index, y):
        def train_step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, x, edge_index, y)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates),
                    opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            train_step, (params, opt_state), None, length=STEPS)
        return params, opt_state, losses[-1]

    # AOT-compile, then time ONE execution of the 500-step program:
    # separates compile from run without paying a full warmup execution
    # (matters on the CPU fallback, where one run is ~2 minutes).
    compiled = train_n.lower(params, opt_state, x, edge_index,
                             y).compile()
    jax.block_until_ready(jax.device_put(0.0))

    t0 = time.perf_counter()
    params, opt_state, loss = compiled(params, opt_state, x,
                                       edge_index, y)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    # roofline accounting for the active SpMM algorithm per step. Dense
    # cached-adjacency path: each pass reads the [N, N] adjacency (the
    # dominant stream) + x + out; backward is the mirrored A^T pass.
    # All three models run 3 fwd + 2 bwd passes: layer 1 aggregates the
    # leaf input (SAGE/GIN directly; GCN via propagate-first
    # reassociation A(xW)=(Ax)W), so its backward A^T pass is dead
    # code. Sparse path: gather/scatter bytes.
    passes = 5
    if edge_index.dense_adj is not None:
        adj_bytes = N * N * edge_index.dense_adj.dtype.itemsize
        pass_bytes = adj_bytes + 2 * N * F * 4
    else:
        pass_bytes = (1.5 * E * F * 4 + N * F * 4 + E * 4)
    total_gb = passes * STEPS * pass_bytes / 1e9
    gbps = total_gb / dt
    print(json.dumps({
        'metric': f'{MODEL}_train_500steps',
        'value': round(dt, 4),
        'unit': 's',
        'vs_baseline': round(BASELINE_EAGER_S / dt, 3),
        'backend': jax.default_backend(),
        'edges_per_s': round(passes / 2 * STEPS * E / dt),
        'spmm_gbps': round(gbps, 1),
        'pct_roofline': round(100 * gbps / 819.0, 1),  # v5e HBM
        'adj_dtype': str(edge_index.dense_adj.dtype)
        if edge_index.dense_adj is not None else 'sparse-f32',
    }))


def _probe_tpu(env, timeout=75) -> bool:
    """Cheap tunnel-health check: a child that lists devices and runs one
    tiny jitted op. The shared tunnel flaps between wedged-for-hours and
    open windows; probing avoids burning the whole watchdog budget on a
    wedged 500-step run."""
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp;"
            "d=jax.devices();"
            "assert d and d[0].platform != 'cpu', d;"
            "x=jax.jit(lambda a: a*2)(jnp.ones((128,128)));"
            "x.block_until_ready();print('TPU_OK')")
    try:
        out = subprocess.run([sys.executable, '-c', code], env=env,
                             capture_output=True, text=True,
                             timeout=timeout)
        return 'TPU_OK' in out.stdout
    except subprocess.TimeoutExpired:
        return False


def _main_with_watchdog():
    """Probe for a TPU tunnel window and retry the bench inside the
    budget; only surrender to CPU when no window opens at all, so the
    recorded number is a hardware number whenever the chip is reachable."""
    import os
    import subprocess
    import sys

    if os.environ.get('PGT_BENCH_CHILD'):
        main()
        return

    env = {**os.environ, 'PGT_BENCH_CHILD': '1'}
    budget = float(os.environ.get('PGT_BENCH_BUDGET_S', '540'))
    # always keep enough budget for the sparse CPU fallback (measured
    # ~190 s cold incl. jax import + compile + one 500-step run) so ONE
    # JSON line is guaranteed even if the tunnel never yields a window
    cpu_reserve = 240.0
    deadline = time.time() + budget
    tpu_deadline = deadline - cpu_reserve
    while time.time() < tpu_deadline - 60:
        if not _probe_tpu(env, timeout=min(75, tpu_deadline
                                           - time.time())):
            time.sleep(10)
            continue
        child_t = tpu_deadline - time.time()
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=child_t)
            lines = [l for l in out.stdout.splitlines()
                     if l.startswith('{')]
            if out.returncode == 0 and lines:
                rec = json.loads(lines[-1])
                if rec.get('backend') != 'cpu':
                    print(lines[-1])
                    return
        except subprocess.TimeoutExpired:
            break                # window too slow: save the fallback
    # fallback: CPU backend, sparse path (still one valid JSON line)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PGT_FORCE_CPU'] = '1'
    try:
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             timeout=max(deadline - time.time(), 120))
        line = [l for l in out.stdout.splitlines()
                if l.startswith('{')]
    except subprocess.TimeoutExpired:
        line = []
    print(line[-1] if line else json.dumps({
        'metric': f'{MODEL}_train_500steps', 'value': -1.0, 'unit': 's',
        'vs_baseline': 0.0}))


if __name__ == '__main__':
    import os
    if os.environ.get('PGT_FORCE_CPU'):
        jax.config.update('jax_platforms', 'cpu')
    if os.environ.get('PGT_BENCH_CHILD'):
        main()
    else:
        _main_with_watchdog()
