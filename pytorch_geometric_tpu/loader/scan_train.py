"""Multi-step-per-dispatch sampled training — the documented default.

Per-batch dispatch pays one host->device round trip per optimiser step;
on remote/tunneled chips that latency dominates the whole pipeline
(products-scale bench: host wait 4%, dispatch the rest). The fix is the
TPU-native one: stack K sampled batches and run K optimiser steps in
ONE device call (``lax.scan`` over the batch axis) — dispatch cost is
paid once per K steps (reference protocol being replaced:
``benchmark/training/README.md`` steps its python loop per batch).

Padding-bucket contract: all K stacked batches must share identical
padded shapes. ``NeighborLoader``'s fixed per-hop caps guarantee this;
if you enable bucketed padding, group batches by bucket before
stacking (a shape change would retrace ``scan_fn``).
"""

from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['stack_batches', 'make_device_train_step']


def stack_batches(batches: List) -> dict:
    """Stack K structure-only batches (``filter_features=False``) into
    ``[K, ...]`` device arrays for one scan dispatch."""
    n_cap = int(batches[0].num_nodes)

    def stk(key):
        return jnp.asarray(np.stack([np.asarray(getattr(b, key))
                                     for b in batches]))

    coos = np.stack([
        np.asarray(b.edge_index.coo
                   if hasattr(b.edge_index, 'coo') else b.edge_index)
        for b in batches])
    if n_cap < 2 ** 15 - 1:
        # batch-LOCAL endpoints (incl. the n_cap pad sentinel) fit
        # int16 — halves the dominant H2D stream of the scan group
        # (the coo upload is ~80% of the group's bytes at products
        # scale); the device step widens back to int32 before indexing
        coos = coos.astype(np.int16)
    seed = np.stack([np.arange(n_cap) < int(b.batch_size)
                     for b in batches])
    return {'n_id': stk('n_id'), 'node_mask': stk('node_mask'),
            'edge_index': jnp.asarray(coos), 'edge_mask': stk('edge_mask'),
            'seed_mask': jnp.asarray(seed)}


def make_device_train_step(model, tx, loss_fn: Callable = None):
    """Build the device-gather training pair ``(step_fn, scan_fn)``.

    ``step_fn(params, opt, X, Y, batch_dict)`` runs ONE optimiser step
    (per-batch dispatch); ``scan_fn(params, opt, X, Y, stacked)`` runs
    K steps in ONE dispatch over ``stack_batches`` output and returns
    ``(params, opt, last_loss)``. Both share the same body, so they are
    bit-identical given the same batches (tests/test_scan_train.py).

    ``X``/``Y`` are the device-resident feature/label tables; rows are
    gathered by ``n_id`` inside jit (only indices cross the link).
    ``loss_fn(model, params, x, coo, edge_mask, y, seed_mask)``
    defaults to seed-masked softmax cross-entropy.
    """
    import optax

    if loss_fn is None:
        def loss_fn(model, p, x, coo, emask, y, seed_mask):
            logits = model.apply(p, x, coo, edge_mask=emask)
            l = optax.softmax_cross_entropy_with_integer_labels(
                logits, y)
            return jnp.where(seed_mask, l, 0).sum() \
                / jnp.maximum(seed_mask.sum(), 1)

    def body(params, opt, X, Y, b):
        safe = jnp.where(b['node_mask'], b['n_id'], 0)
        x = jnp.where(b['node_mask'][:, None], X[safe], 0)
        y = Y[safe]
        # int16 wire format (stack_batches) widened on device — the
        # cast is free next to the H2D bytes it saves
        coo = b['edge_index'].astype(jnp.int32)
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, x, coo,
                              b['edge_mask'], y, b['seed_mask']))(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    @jax.jit
    def step_fn(params, opt, X, Y, b):
        return body(params, opt, X, Y, b)

    @jax.jit
    def scan_fn(params, opt, X, Y, stacked):
        def sbody(carry, b):
            params, opt = carry
            params, opt, loss = body(params, opt, X, Y, b)
            return (params, opt), loss
        (params, opt), losses = jax.lax.scan(sbody, (params, opt),
                                             stacked)
        return params, opt, losses[-1]

    return step_fn, scan_fn
