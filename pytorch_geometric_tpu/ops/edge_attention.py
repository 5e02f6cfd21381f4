"""Fused heterogeneous edge attention — the HGT hot path.

The MAG-shape HGT step attribution (``bench_windows.jsonl``
``hgt_step_attribution``) showed the train-step wall is many medium
``[E_r, H*D]`` gather/scatter passes — 7 relations x 2 layers x ~6
passes each, doubled again by full-layer ``fnn.remat`` recompute. This
module collapses ALL relations sharing a destination type into one
union-softmax attention with two execution strategies:

* **wide** (:func:`_attention`): ONE gather from a concatenated
  ``[M, 2*H*D]`` K|V node table + one union segment-softmax + one wide
  scatter; the ``custom_vjp`` saves only ``alpha`` (bit-packed, see
  below) — backward is three gathers + two wide scatters with NO
  forward recompute and no remat.
* **flash** (:func:`_attention_flash`): past the wide transient cap,
  an online-softmax ``lax.scan`` over fixed edge chunks (the graph
  analogue of flash attention) with running ``(max, normaliser,
  accumulator)`` carries — peak HBM is ONE chunk's transients, so
  full-MAG HGT (29M union edges) trains on a 16 GB chip. The backward
  is a single scan too: the softmax-VJP segment term needs no extra
  pass because ``sum_seg(alpha * dalpha) = <g, out>[seg]``.

TPU memory/layout rules learned the hard way (full-MAG OOM forensics):

* XLA:TPU tiles the minor dimension to 128 lanes — a ``[E, H=4]`` f32
  array is STORED at 32x its logical size, and a 3-D ``[E, H, D=16]``
  gather output at 8x. So every gather/scatter here runs on flat 2-D
  ``[E, H*D]`` operands (64 -> 128 lanes, 2x), per-edge ``[E, H]``
  priors are never materialised (per-relation ``[R, H]`` priors +
  int32 relation ids instead — the ``dp`` cotangent is ``[R, H]``,
  accumulated in-scan), and the saved ``alpha`` residual is bit-packed
  to ``[E*H/128, 128]`` (:func:`_pack`).
* ``optimization_barrier`` does NOT bound peak memory — execution on a
  TPU core is serial and buffer lifetimes are decided by buffer
  assignment; only loop structure (``lax.scan``) bounds them.

Reference boundary: ``torch_geometric/nn/conv/hgt_conv.py:17`` computes
the same union softmax with per-relation ``scatter`` buffers; pyg-lib's
``softmax_csr`` is the CUDA analogue of the fused normalisation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .scatter import scatter
from .softmax import _softmax_xla

__all__ = ['hetero_edge_attention', 'hetero_edge_attention_multi']


def _float0(x):
    return np.zeros(x.shape, jax.dtypes.float0)


def _rep(a, d):
    """[E, H] -> [E, H*D] by repeating each head's column D times
    (matches the head-major flat layout of ``reshape(e, h * d)``)."""
    return jnp.repeat(a, d, axis=1)


def _pack(x):
    """[E, H] -> [ceil(E*H/128), 128]: narrow arrays lane-pad 32x on
    TPU; packing the flat elements into full 128-lane rows stores them
    compactly (one relayout copy each way)."""
    flat = x.reshape(-1)
    pad = (-flat.shape[0]) % 128
    return jnp.pad(flat, (0, pad)).reshape(-1, 128), x.shape


def _unpack(packed, shape):
    e = shape[0] * shape[1]
    return packed.reshape(-1)[:e].reshape(shape)


# ---------------------------------------------------------------------------
# wide variant
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _attention(num_dst, sorted_dst, kv_table, q_table, p_stack, rel,
               src, dst):
    """out[n] = sum_{e: dst_e==n} softmax_n(p[rel_e] * <q[n], k[src_e]>) v[src_e].

    kv_table: [M, 2*H*D] FLAT — k rows in [:, :H*D], v rows in
    [:, H*D:], each half head-major; per-relation tables concatenated
    along M with ``src`` pre-offset. q_table: [num_dst, H, D].
    p_stack: [R, H] per-relation prior (already divided by sqrt(D));
    rel: [E] relation id per edge. src: [E] in-range into M. dst: [E];
    entries ``>= num_dst`` mark padded/invalid edges and are dropped.
    """
    out, _ = _attention_fwd(num_dst, sorted_dst, kv_table, q_table,
                            p_stack, rel, src, dst)
    return out


def _attention_fwd(num_dst, sorted_dst, kv_table, q_table, p_stack,
                   rel, src, dst):
    hd = kv_table.shape[1] // 2
    h = q_table.shape[1]
    d = hd // h
    e = src.shape[0]
    kve = kv_table[src]                        # [E, 2HD] one wide gather
    k, v = kve[:, :hd], kve[:, hd:]
    dsafe = jnp.minimum(dst, num_dst - 1)
    qe = q_table.reshape(num_dst, hd)[dsafe]   # [E, HD]
    logit = (qe * k).reshape(e, h, d).sum(-1) * p_stack[rel]   # [E, H]
    valid = dst < num_dst
    alpha = _softmax_xla(logit, dst, num_dst, mask=valid,
                         indices_are_sorted=sorted_dst)
    msg = v * _rep(alpha, d)
    out = scatter(msg, dst, num_dst, 'sum',    # OOB dst rows drop
                  indices_are_sorted=sorted_dst)
    out = out.reshape(num_dst, h, d)
    a_packed, a_shape = _pack(alpha)
    return out, (kv_table, q_table, p_stack, rel, src, dst, a_packed,
                 a_shape)


def _attention_bwd(num_dst, sorted_dst, res, g):
    (kv_table, q_table, p_stack, rel, src, dst, a_packed,
     a_shape) = res
    alpha = _unpack(a_packed, a_shape)
    m = kv_table.shape[0]
    e, h = alpha.shape
    hd = kv_table.shape[1] // 2
    d = hd // h
    valid = dst < num_dst
    dsafe = jnp.minimum(dst, num_dst - 1)
    kve = kv_table[src]                        # regather (not a residual)
    k, v = kve[:, :hd], kve[:, hd:]
    qe = q_table.reshape(num_dst, hd)[dsafe]
    ge = jnp.where(valid[:, None],
                   g.reshape(num_dst, hd)[dsafe], 0)     # [E, HD]
    # out = sum alpha * v
    dalpha = (ge * v).reshape(e, h, d).sum(-1)           # [E, H]
    dv = ge * _rep(alpha, d)
    # softmax VJP: dlogit = alpha * (dalpha - sum_seg(alpha * dalpha))
    seg = scatter(alpha * dalpha, dst, num_dst, 'sum', mask=valid,
                  indices_are_sorted=sorted_dst)
    dlogit = alpha * (dalpha - jnp.where(valid[:, None], seg[dsafe], 0))
    base = (qe * k).reshape(e, h, d).sum(-1)   # recompute: 0 extra passes
    dp = scatter(jnp.where(valid[:, None], dlogit * base, 0), rel,
                 p_stack.shape[0], 'sum')      # [R, H]
    dbase = _rep(dlogit * p_stack[rel], d)     # [E, HD]
    dqe = dbase * k
    dk = dbase * qe
    dkv_e = jnp.where(valid[:, None], jnp.concatenate([dk, dv], axis=1),
                      0)
    # two wide scatters: [E, 2HD] and [E, HD]
    dkv = scatter(dkv_e, jnp.where(valid, src, m), m, 'sum')
    dq = scatter(dqe, dst, num_dst, 'sum', mask=valid,
                 indices_are_sorted=sorted_dst).reshape(num_dst, h, d)
    return (dkv, dq, dp, _float0(rel), _float0(src), _float0(dst))


_attention.defvjp(_attention_fwd, _attention_bwd)


def hetero_edge_attention(kv_table: jnp.ndarray, q_table: jnp.ndarray,
                          p_stack: jnp.ndarray, rel: jnp.ndarray,
                          src: jnp.ndarray, dst: jnp.ndarray,
                          num_dst: int) -> jnp.ndarray:
    """Union-softmax edge attention over one destination node set.

    See :func:`_attention`; ``num_dst`` must be static under ``jit``.
    ``kv_table`` is FLAT ``[M, 2*H*D]`` (k half then v half, head-major
    — build with ``concatenate([k.reshape(m, -1), v.reshape(m, -1)],
    1)``). ``p_stack`` is the [R, H] per-relation prior and ``rel`` the
    per-edge relation id (single relation: ``p_stack=[1, H]``,
    ``rel=zeros``). ``src`` must be in-range; invalid / padded edges
    are flagged by ``dst >= num_dst``.
    """
    return _attention(int(num_dst), False, kv_table, q_table, p_stack,
                      rel, src, dst)


# ---------------------------------------------------------------------------
# flash variant: online-softmax scan over fixed-size edge chunks
# ---------------------------------------------------------------------------


def _pad128(x, fill):
    """Lane-pad [C, H<16] to [C, 128] (XLA:TPU serializes narrow
    scatters — ops/scatter.py _pad_lanes measurements)."""
    h = x.shape[1]
    if h >= 16:
        return x, h
    return jnp.pad(x, ((0, 0), (0, 128 - h)), constant_values=fill), h


def _seg_max(x, d, n, fill, sorted_=False):
    xp, h = _pad128(x, fill)
    return jax.ops.segment_max(xp, d, n,
                               indices_are_sorted=sorted_)[:, :h]


def _seg_sum(x, d, n, sorted_=False):
    if x.shape[1] < 16:
        xp, h = _pad128(x, 0.0)
        return jax.ops.segment_sum(xp, d, n,
                                   indices_are_sorted=sorted_)[:, :h]
    return jax.ops.segment_sum(x, d, n, indices_are_sorted=sorted_)


def _carry_w(h: int) -> int:
    """Scatter-carry lane width: 128 for narrow heads (narrow TPU
    scatters serialize — ops/scatter.py measurements), the natural
    width otherwise. ``PGT_ATTN_FLASH_W`` overrides the padded width
    (clamped to >= h) — the m/l carries are ``[num_dst+1, w]``, so at
    multi-million-node graphs dropping w from 128 to 16-32 trades some
    scatter throughput for ~2 GB of HBM per layer (what lets the
    123.7M-edge products GAT step fit on the 16 GB chip)."""
    import os
    w = 128 if h < 16 else h
    ov = os.environ.get('PGT_ATTN_FLASH_W')
    if ov is not None:
        w = max(int(ov), h)
    return w


def _scatter_mode() -> bool:
    """Default flash impl: in-place scatters on TPU (the sorted
    lowering + no full-carry traffic), segment ops on CPU (XLA:CPU
    scatters serialize — measured ~30% slower at 2M edges). Override
    with PGT_ATTN_FLASH_IMPL=scatter|segment."""
    import os
    mode = os.environ.get('PGT_ATTN_FLASH_IMPL')
    if mode is None:
        mode = ('segment' if jax.default_backend() == 'cpu'
                else 'scatter')
    return mode == 'scatter'


def _padw(x, fill, w):
    """Pad [C, h] to the carry lane width ``w``."""
    h = x.shape[1]
    if h >= w:
        return x
    return jnp.pad(x, ((0, 0), (0, w - h)), constant_values=fill)


def _scatter_online_update(m, l, acc, logit, valid, d, v_e, num_dst,
                           h, dh, w):
    """One chunk of online softmax as PURE in-place scatter updates.

    The segment-op formulation materializes a full ``[N, ·]`` output
    per chunk and rescales the whole accumulator
    (``acc * scale + seg_sum(...)``) — at full-MAG scale that is
    ~8 GB of carry traffic per 2M-edge chunk, the measured wall of the
    28 s/step (``bench_windows.jsonl`` ``hgt_step_attribution``). With
    dst-SORTED edges every update touches only the chunk's rows:

    * running max: one sorted scatter-max;
    * the per-row rescale ``exp(m_old - m_new)`` rides a sorted
      scatter-MULTIPLY whose value is the rescale at each row's FIRST
      edge in the chunk and exactly ``1.0`` at the duplicates (so the
      duplicate-combining multiply reproduces one application per row);
    * the accumulations are sorted scatter-adds.

    Everything is O(chunk) — no O(N) pass anywhere. Carries have
    ``num_dst + 1`` rows ([-1] collects pad/invalid garbage, sliced
    off by the caller) and lane width ``w`` (narrow [*, H] scatters
    serialize on TPU — ops/scatter.py measurements).

    REQUIRES dst-sorted chunks: the first-occurrence test
    ``d[i] != d[i-1]`` only finds every duplicate group's head when
    equal dsts are adjacent.
    """
    dseg = jnp.where(valid, d, num_dst)
    dsafe = jnp.minimum(d, num_dst - 1)
    m_old = m[dsafe][:, :h]
    m = m.at[dseg].max(_padw(logit, -jnp.inf, w),
                       indices_are_sorted=True)
    m_new = m[dsafe][:, :h]
    scale = jnp.where(jnp.isfinite(m_old),
                      jnp.exp(m_old - m_new), 0.0)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), d[1:] != d[:-1]])
    mul = jnp.where((first & valid)[:, None], scale, 1.0)
    l = l.at[dseg].multiply(_padw(mul, 1.0, w),
                            indices_are_sorted=True)
    z = jnp.where(valid[:, None],
                  jnp.exp(logit - jnp.where(jnp.isfinite(m_new),
                                            m_new, 0.0)), 0.0)
    l = l.at[dseg].add(_padw(z, 0.0, w), indices_are_sorted=True)
    acc = acc.at[dseg].multiply(_rep(mul, dh),
                                indices_are_sorted=True)
    acc = acc.at[dseg].add(v_e * _rep(z, dh),
                           indices_are_sorted=True)
    return m, l, acc


def _scatter_flash_scan(num_dst, h, dh, dtype, logit_fn, v_fn, xs):
    """Run the scatter-based online scan; returns ``(m, l, out)`` each
    sliced to ``[num_dst, ·]`` (h-wide m/l, h*dh-wide out)."""
    w = _carry_w(h)

    def step(carry, x):
        m, l, acc = carry
        logit, valid, d = logit_fn(x)
        v_e = v_fn(x)
        m, l, acc = _scatter_online_update(
            m, l, acc, logit, valid, d, v_e, num_dst, h, dh, w)
        return (m, l, acc), None

    m0 = jnp.full((num_dst + 1, w), -jnp.inf, dtype)
    l0 = jnp.zeros((num_dst + 1, w), dtype)
    a0 = jnp.zeros((num_dst + 1, h * dh), dtype)
    (m, l, acc), _ = jax.lax.scan(step, (m0, l0, a0), xs)
    m = m[:num_dst, :h]
    l = l[:num_dst, :h]
    out = acc[:num_dst] / _rep(jnp.maximum(l, 1e-16), dh)
    return m, l, out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _attention_flash(num_dst, sorted_dst, k_glob, v_glob, q_table,
                     p_stack, rel_ch, s_ch, d_ch):
    """Chunked online-softmax edge attention.

    k_glob/v_glob: [M, H*D] flat global tables (all relations
    concatenated, ``s_ch`` pre-offset). q_table: [num_dst, H, D].
    p_stack: [R, H]; rel_ch/s_ch/d_ch: [nc, C] (pad: d == num_dst).
    """
    out, _ = _attention_flash_fwd(num_dst, sorted_dst, k_glob, v_glob,
                                  q_table, p_stack, rel_ch, s_ch, d_ch)
    return out


def _flash_logit(q_flat, k_glob, p_stack, r, s, d, num_dst, h, dh):
    c = s.shape[0]
    dsafe = jnp.minimum(d, num_dst - 1)
    base = (q_flat[dsafe] * k_glob[s]).reshape(c, h, dh).sum(-1)
    logit = base * p_stack[r]
    valid = d < num_dst
    return jnp.where(valid[:, None], logit, -jnp.inf), base, valid, dsafe


def _attention_flash_fwd(num_dst, sorted_dst, k_glob, v_glob, q_table,
                         p_stack, rel_ch, s_ch, d_ch):
    h, dh = q_table.shape[1], q_table.shape[2]
    hd = h * dh
    q_flat = q_table.reshape(num_dst, hd)

    if sorted_dst and _scatter_mode():
        def logit_fn(x):
            s, d, r = x
            logit, _, valid, _ = _flash_logit(
                q_flat, k_glob, p_stack, r, s, d, num_dst, h, dh)
            return logit, valid, d

        m, l, out = _scatter_flash_scan(
            num_dst, h, dh, q_table.dtype, logit_fn,
            lambda x: v_glob[x[0]], (s_ch, d_ch, rel_ch))
        res = (k_glob, v_glob, q_table, p_stack, rel_ch, s_ch, d_ch,
               m, l, out)
        return out.reshape(num_dst, h, dh), res

    def step(carry, xs):
        m, l, acc = carry
        s, d, r = xs
        logit, _, valid, dsafe = _flash_logit(
            q_flat, k_glob, p_stack, r, s, d, num_dst, h, dh)
        dseg = jnp.where(valid, d, num_dst)
        cm = _seg_max(logit, dseg, num_dst + 1, -jnp.inf,
                      sorted_=sorted_dst)[:num_dst]
        m_new = jnp.maximum(m, cm)
        # rescale running sums from old max to new; -inf - -inf guards
        # (empty rows keep m = -inf until touched)
        scale = jnp.exp(jnp.where(m > m_new, 0.0, m - m_new))
        scale = jnp.where(jnp.isfinite(m), scale, 0.0)
        z = jnp.exp(logit - jnp.where(jnp.isfinite(m_new),
                                      m_new, 0.0)[dsafe])
        z = jnp.where(valid[:, None], z, 0.0)
        l = l * scale + _seg_sum(z, dseg, num_dst + 1,
                                 sorted_=sorted_dst)[:num_dst]
        msg = v_glob[s] * _rep(z, dh)
        acc = (acc * _rep(scale, dh)
               + _seg_sum(msg, dseg, num_dst + 1,
                          sorted_=sorted_dst)[:num_dst])
        return (m_new, l, acc), None

    m0 = jnp.full((num_dst, h), -jnp.inf, q_table.dtype)
    l0 = jnp.zeros((num_dst, h), q_table.dtype)
    a0 = jnp.zeros((num_dst, hd), q_table.dtype)
    (m, l, acc), _ = jax.lax.scan(step, (m0, l0, a0),
                                  (s_ch, d_ch, rel_ch))
    out = acc / _rep(jnp.maximum(l, 1e-16), dh)
    res = (k_glob, v_glob, q_table, p_stack, rel_ch, s_ch, d_ch, m, l,
           out)
    return out.reshape(num_dst, h, dh), res


def _attention_flash_bwd(num_dst, sorted_dst, res, g):
    (k_glob, v_glob, q_table, p_stack, rel_ch, s_ch, d_ch, m, l,
     out) = res
    h, dh = q_table.shape[1], q_table.shape[2]
    hd = h * dh
    q_flat = q_table.reshape(num_dst, hd)
    g_flat = g.reshape(num_dst, hd)
    l_safe = jnp.maximum(l, 1e-16)
    # sum_seg(alpha * dalpha) = <g, out>[seg] per head — node-level,
    # no extra scan needed
    gdot = (g_flat * out).reshape(num_dst, h, dh).sum(-1)   # [N, H]

    def step(carry, xs):
        dk, dv, dq, dp = carry
        s, d, r = xs
        c = s.shape[0]
        logit, base, valid, dsafe = _flash_logit(
            q_flat, k_glob, p_stack, r, s, d, num_dst, h, dh)
        alpha = jnp.exp(logit - jnp.where(jnp.isfinite(m),
                                          m, 0.0)[dsafe]) / l_safe[dsafe]
        alpha = jnp.where(valid[:, None], alpha, 0.0)
        g_e = g_flat[dsafe]
        v_e = v_glob[s]
        dalpha = (g_e * v_e).reshape(c, h, dh).sum(-1)
        dlogit = alpha * (dalpha - gdot[dsafe])
        dp = dp + _seg_sum(jnp.where(valid[:, None], dlogit * base, 0),
                           r, p_stack.shape[0])
        dbase = _rep(dlogit * p_stack[r], dh)
        k_e = k_glob[s]
        q_e = q_flat[dsafe]
        sdrop = jnp.where(valid, s, k_glob.shape[0])
        dv = dv.at[sdrop].add(g_e * _rep(alpha, dh), mode='drop')
        dk = dk.at[sdrop].add(dbase * q_e, mode='drop')
        dq = dq.at[jnp.where(valid, d, num_dst)].add(
            dbase * k_e, mode='drop', indices_are_sorted=sorted_dst)
        return (dk, dv, dq, dp), None

    dk0 = jnp.zeros_like(k_glob)
    dv0 = jnp.zeros_like(v_glob)
    dq0 = jnp.zeros((num_dst, hd), q_table.dtype)
    dp0 = jnp.zeros_like(p_stack)
    (dk, dv, dq, dp), _ = jax.lax.scan(step, (dk0, dv0, dq0, dp0),
                                       (s_ch, d_ch, rel_ch))
    return (dk, dv, dq.reshape(num_dst, h, dh), dp,
            _float0(rel_ch), _float0(s_ch), _float0(d_ch))


_attention_flash.defvjp(_attention_flash_fwd, _attention_flash_bwd)


# -- dual-layout variant: dst-sorted forward, SRC-sorted backward -----------
# The backward's two biggest scatters (dk/dv, [C, HD] each) index by
# SOURCE; with a second host-presorted copy of the chunks ordered by
# src (invalid edges carrying the table-size sentinel so they sort
# last) they take the 1.7x sorted lowering, while the dst-side gathers
# cost the same either way (random row gather is order-insensitive on
# v5e — tpu-layout-memory notes). dq's scatter loses its sorted flag;
# net win because it is one op vs two.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attention_flash_dual(num_dst, k_glob, v_glob, q_table, p_stack,
                          rel_f, s_f, d_f, rel_b, s_b, d_b):
    """rel_f/s_f/d_f: dst-sorted chunks (pad: d == num_dst);
    rel_b/s_b/d_b: the SAME edges src-sorted (pad: s == M)."""
    out, _ = _attention_flash_dual_fwd(num_dst, k_glob, v_glob,
                                       q_table, p_stack, rel_f, s_f,
                                       d_f, rel_b, s_b, d_b)
    return out


def _attention_flash_dual_fwd(num_dst, k_glob, v_glob, q_table,
                              p_stack, rel_f, s_f, d_f, rel_b, s_b,
                              d_b):
    h, dh = q_table.shape[1], q_table.shape[2]
    if not _scatter_mode():
        # honor PGT_ATTN_FLASH_IMPL / the CPU segment default: run the
        # segment-op forward and repack its residuals for the dual bwd
        out, res0 = _attention_flash_fwd(num_dst, True, k_glob, v_glob,
                                         q_table, p_stack, rel_f, s_f,
                                         d_f)
        m, l, out_flat = res0[7], res0[8], res0[9]
        return out, (k_glob, v_glob, q_table, p_stack, rel_b, s_b,
                     d_b, m, l, out_flat)
    q_flat = q_table.reshape(num_dst, h * dh)

    def logit_fn(x):
        s, d, r = x
        logit, _, valid, _ = _flash_logit(
            q_flat, k_glob, p_stack, r, s, d, num_dst, h, dh)
        return logit, valid, d

    m, l, out = _scatter_flash_scan(
        num_dst, h, dh, q_table.dtype, logit_fn,
        lambda x: v_glob[x[0]], (s_f, d_f, rel_f))
    res = (k_glob, v_glob, q_table, p_stack, rel_b, s_b, d_b, m, l,
           out)
    return out.reshape(num_dst, h, dh), res


def _attention_flash_dual_bwd(num_dst, res, g):
    (k_glob, v_glob, q_table, p_stack, rel_b, s_b, d_b, m, l,
     out) = res
    h, dh = q_table.shape[1], q_table.shape[2]
    hd = h * dh
    mrows = k_glob.shape[0]
    q_flat = q_table.reshape(num_dst, hd)
    g_flat = g.reshape(num_dst, hd)
    l_safe = jnp.maximum(l, 1e-16)
    gdot = (g_flat * out).reshape(num_dst, h, dh).sum(-1)

    def step(carry, xs):
        dk, dv, dq, dp = carry
        s, d, r = xs
        c = s.shape[0]
        valid = d < num_dst
        ssafe = jnp.minimum(s, mrows - 1)
        logit, base, _, dsafe = _flash_logit(
            q_flat, k_glob, p_stack, r, ssafe, d, num_dst, h, dh)
        alpha = jnp.exp(logit - jnp.where(jnp.isfinite(m),
                                          m, 0.0)[dsafe]) / l_safe[dsafe]
        alpha = jnp.where(valid[:, None], alpha, 0.0)
        g_e = g_flat[dsafe]
        v_e = v_glob[ssafe]
        dalpha = (g_e * v_e).reshape(c, h, dh).sum(-1)
        dlogit = alpha * (dalpha - gdot[dsafe])
        dp = dp + _seg_sum(jnp.where(valid[:, None], dlogit * base, 0),
                           r, p_stack.shape[0])
        dbase = _rep(dlogit * p_stack[r], dh)
        k_e = k_glob[ssafe]
        q_e = q_flat[dsafe]
        # src-sorted chunks: dk/dv take the sorted lowering (s == M
        # sentinel pads sort last and drop)
        dv = dv.at[s].add(g_e * _rep(alpha, dh), mode='drop',
                          indices_are_sorted=True)
        dk = dk.at[s].add(dbase * q_e, mode='drop',
                          indices_are_sorted=True)
        dq = dq.at[jnp.where(valid, d, num_dst)].add(
            dbase * k_e, mode='drop')
        return (dk, dv, dq, dp), None

    dk0 = jnp.zeros_like(k_glob)
    dv0 = jnp.zeros_like(v_glob)
    dq0 = jnp.zeros((num_dst, hd), q_table.dtype)
    dp0 = jnp.zeros_like(p_stack)
    (dk, dv, dq, dp), _ = jax.lax.scan(step, (dk0, dv0, dq0, dp0),
                                       (s_b, d_b, rel_b))
    return (dk, dv, dq.reshape(num_dst, h, dh), dp,
            _float0(rel_b), _float0(s_b), _float0(d_b),
            _float0(rel_b), _float0(s_b), _float0(d_b))


_attention_flash_dual.defvjp(_attention_flash_dual_fwd,
                             _attention_flash_dual_bwd)


# wide-gather transient cap: past this many union [E, 2HD] bytes the
# flash scan takes over. Several [E, 128-lane] buffers are live at the
# wide bwd peak, so the real footprint is ~4-6x this figure.
WIDE_BYTES_CAP = 1e9


class FlashLayout:
    """Host-precomputed dst-sorted chunked union edge layout for the
    flash scan: skips the per-call device argsort of multi-million-edge
    unions (~6 ns/edge per layer per step) and pins
    ``indices_are_sorted``. Build once per graph with
    :func:`build_union_flash_layout`; pass through
    :func:`hetero_edge_attention_multi` (a pytree — fine as a jit
    argument)."""

    def __init__(self, s_ch, d_ch, rel_ch, e_tot: int,
                 s_t=None, d_t=None, rel_t=None):
        self.s_ch = s_ch
        self.d_ch = d_ch
        self.rel_ch = rel_ch
        self.e_tot = int(e_tot)
        # optional SRC-sorted copy for the dual-layout backward
        self.s_t = s_t
        self.d_t = d_t
        self.rel_t = rel_t

    def tree_flatten(self):
        return ((self.s_ch, self.d_ch, self.rel_ch, self.s_t,
                 self.d_t, self.rel_t), (self.e_tot,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        s_ch, d_ch, rel_ch, s_t, d_t, rel_t = children
        return cls(s_ch, d_ch, rel_ch, aux[0], s_t, d_t, rel_t)


jax.tree_util.register_pytree_node(
    FlashLayout, FlashLayout.tree_flatten,
    lambda aux, ch: FlashLayout.tree_unflatten(aux, ch))


def build_union_flash_layout(s_list, d_list, table_sizes, num_dst: int,
                             chunk: int = None) -> FlashLayout:
    """Host pass: offset per-relation sources into the concatenated
    table (same accumulation order as
    :func:`hetero_edge_attention_multi`), dst-sort the union once
    (invalid edges carry the ``num_dst`` sentinel and sort last), pad
    to a chunk multiple, reshape. All numpy — call OUTSIDE jit."""
    import os
    if chunk is None:
        chunk = int(float(os.environ.get('PGT_ATTN_CHUNK_EDGES', 2e6)))
    off, s_parts, rel_parts = 0, [], []
    for i, (s, nrows) in enumerate(zip(s_list, table_sizes)):
        s = np.asarray(s, np.int64)
        s_parts.append(s + off)
        off += int(nrows)
        rel_parts.append(np.full(len(s), i, np.int32))
    s_glob = np.concatenate(s_parts) if s_parts else \
        np.zeros(0, np.int64)
    d_glob = np.concatenate([np.asarray(d, np.int64)
                             for d in d_list]) if d_list else \
        np.zeros(0, np.int64)
    rel_glob = np.concatenate(rel_parts) if rel_parts else \
        np.zeros(0, np.int32)
    e_tot = len(s_glob)
    c = max(min(chunk, max(e_tot, 1)), 1)
    nc = max(-(-e_tot // c), 1)
    pad = nc * c - e_tot
    m_total = int(off)

    def _chunked(s, d, r, s_pad, d_pad):
        return (jnp.asarray(np.pad(s, (0, pad),
                                   constant_values=s_pad)
                            .reshape(nc, c).astype(np.int32)),
                jnp.asarray(np.pad(d, (0, pad),
                                   constant_values=d_pad)
                            .reshape(nc, c).astype(np.int32)),
                jnp.asarray(np.pad(r, (0, pad)).reshape(nc, c)))

    order = np.argsort(d_glob, kind='stable')
    s_f, d_f, r_f = _chunked(s_glob[order], d_glob[order],
                             rel_glob[order], 0, num_dst)

    dual = os.environ.get('PGT_ATTN_BWD_SRC_SORTED', '1') != '0'
    if not dual:
        return FlashLayout(s_f, d_f, r_f, e_tot)
    # src-sorted copy for the backward's dk/dv scatters: invalid edges
    # take the table-size sentinel so they sort last AND drop
    s2 = np.where(d_glob >= num_dst, m_total, s_glob)
    order_t = np.argsort(s2, kind='stable')
    s_b, d_b, r_b = _chunked(s2[order_t], d_glob[order_t],
                             rel_glob[order_t], m_total, num_dst)
    return FlashLayout(s_f, d_f, r_f, e_tot, s_b, d_b, r_b)


def build_hgt_flash_layouts(metadata, edge_index_dict,
                            num_nodes_dict, chunk: int = None,
                            feature_types=None):
    """Per-dst-type :class:`FlashLayout` dict for
    :class:`~pytorch_geometric_tpu.nn.HGTConv` — replicates the conv's
    relation grouping/order and endpoint clamping exactly (see
    ``nn/conv/hetero_conv.py`` fused branch). ``feature_types``: the
    node types present in ``x_dict`` at call time (default: every type
    in ``num_nodes_dict``) — the conv DROPS relations whose endpoint
    type has no features, and the layout must drop the same ones or
    its relation ids / table offsets go stale (the conv cross-checks
    the edge totals and raises on mismatch)."""
    node_types, edge_types = metadata
    if feature_types is None:
        feature_types = set(num_nodes_dict)
    feature_types = set(feature_types)
    by_dst = {}
    for et in edge_types:
        src, rel, dst = et
        if (et not in edge_index_dict or src not in feature_types
                or dst not in feature_types):
            continue
        by_dst.setdefault(dst, []).append((src, et))
    out = {}
    for dst, rels in by_dst.items():
        n = int(num_nodes_dict[dst])
        s_list, d_list, sizes = [], [], []
        for src, et in rels:
            ei = edge_index_dict[et]
            coo = np.asarray(ei.coo if hasattr(ei, 'coo') else ei)
            n_src = int(num_nodes_dict[src])
            valid = (coo[0] < n_src) & (coo[1] < n)
            s_list.append(np.minimum(coo[0], n_src - 1))
            d_list.append(np.where(valid,
                                   np.minimum(coo[1], n - 1), n))
            sizes.append(n_src)
        out[dst] = build_union_flash_layout(s_list, d_list, sizes, n,
                                            chunk=chunk)
    return out


def hetero_edge_attention_multi(k_tabs, v_tabs, q_table, p_rels,
                                s_list, d_list, num_dst: int,
                                wide=None, token=None,
                                layout: FlashLayout = None
                                ) -> jnp.ndarray:
    """Union-softmax edge attention over per-relation node tables.

    k_tabs/v_tabs: per-relation ``[N_r, H, D]``; p_rels: per-relation
    ``[H]`` priors; s_list: per-relation in-range source ids into that
    relation's table; d_list: destination ids (``>= num_dst`` marks
    padded/invalid edges). Picks the single wide-gather op when the
    union transient fits (``wide=None`` auto), else the chunked flash
    scan whose peak memory is one ``PGT_ATTN_CHUNK_EDGES`` chunk.
    ``token`` (any array) sequences this call behind earlier work via
    an optimization barrier.
    """
    import os
    e_tot = sum(int(s.shape[0]) for s in s_list)
    h, d_hid = q_table.shape[1], q_table.shape[2]
    if token is not None:
        s_list, d_list = _seq((tuple(s_list), tuple(d_list)), token)
        s_list, d_list = list(s_list), list(d_list)
    if wide is None:
        cap = float(os.environ.get('PGT_ATTN_WIDE_BYTES',
                                   WIDE_BYTES_CAP))
        wide = e_tot * h * 2 * d_hid * 4 <= cap

    # global flat tables + offset sources serve both variants
    k_cat = jnp.concatenate(
        [k.reshape(k.shape[0], -1) for k in k_tabs], axis=0)
    v_cat = jnp.concatenate(
        [v.reshape(v.shape[0], -1) for v in v_tabs], axis=0)
    p_stack = jnp.stack(list(p_rels))

    if layout is not None:
        # host-presorted chunked union: no device argsort, no per-step
        # union build; always the flash scan (the layout exists for
        # giant graphs). With a src-sorted copy the backward's dk/dv
        # scatters take the sorted lowering too.
        if layout.e_tot != e_tot:
            raise ValueError(
                f'FlashLayout holds {layout.e_tot} union edges but '
                f'the call provides {e_tot}: the layout is stale or '
                f'was built with a different relation set (rebuild '
                f'with build_hgt_flash_layouts, passing the x_dict '
                f'key set as feature_types)')
        lay = _seq(layout, token)   # keep the cross-type sequencing
        if lay.s_t is not None:
            return _attention_flash_dual(
                int(num_dst), k_cat, v_cat, q_table, p_stack,
                lay.rel_ch, lay.s_ch, lay.d_ch,
                lay.rel_t, lay.s_t, lay.d_t)
        return _attention_flash(int(num_dst), True, k_cat, v_cat,
                                q_table, p_stack, lay.rel_ch,
                                lay.s_ch, lay.d_ch)
    off, s_off, rel_parts = 0, [], []
    for i, (k, s) in enumerate(zip(k_tabs, s_list)):
        s_off.append(s + off)
        off += k.shape[0]
        rel_parts.append(jnp.full((s.shape[0],), i, jnp.int32))
    s_glob = jnp.concatenate(s_off)
    d_glob = jnp.concatenate(d_list)
    rel_glob = jnp.concatenate(rel_parts)

    # dst-sort the union once (argsort is ~6 ns/edge on v5e) so every
    # dst-side segment op takes the indices_are_sorted lowering
    # (measured 1.6-1.7x on padded segment max/sum and scatter-add);
    # invalid edges carry the num_dst sentinel and sort last
    sort_min = int(float(os.environ.get('PGT_ATTN_SORT_MIN_EDGES',
                                        1 << 20)))
    sorted_dst = e_tot >= sort_min
    if sorted_dst:
        order = jnp.argsort(d_glob)
        s_glob = s_glob[order]
        d_glob = d_glob[order]
        rel_glob = rel_glob[order]

    if wide:
        kv = jnp.concatenate([k_cat, v_cat], axis=1)
        return _attention(int(num_dst), sorted_dst, kv, q_table,
                          p_stack, rel_glob, s_glob, d_glob)

    c = int(float(os.environ.get('PGT_ATTN_CHUNK_EDGES', 2e6)))
    c = max(min(c, max(e_tot, 1)), 1)
    nc = -(-e_tot // c)
    pad = nc * c - e_tot
    s_ch = jnp.pad(s_glob, (0, pad)).reshape(nc, c)
    d_ch = jnp.pad(d_glob, (0, pad),
                   constant_values=num_dst).reshape(nc, c)
    rel_ch = jnp.pad(rel_glob, (0, pad)).reshape(nc, c)
    return _attention_flash(int(num_dst), sorted_dst, k_cat, v_cat,
                            q_table, p_stack, rel_ch, s_ch, d_ch)


def _seq(xs, token):
    """Chain the pytree ``xs`` behind ``token`` with an optimization
    barrier (scheduling hint only — it does NOT bound buffer lifetimes;
    use the flash scan for hard memory bounds)."""
    if token is None:
        return xs
    xs, _ = jax.lax.optimization_barrier((xs, token))
    return xs


# ---------------------------------------------------------------------------
# GAT-form flash: additive node logits + leaky_relu, same online
# softmax scan — giant-graph GATConv (products scale) on one chip.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gat_flash(num_dst, slope, sorted_dst, a_src, a_dst, v_glob, s_ch,
               d_ch):
    """out[n] = sum_e softmax_n(leaky_relu(a_src[s_e] + a_dst[n])) v[s_e].

    a_src: [N_src, H]; a_dst: [num_dst, H]; v_glob: [N_src, H*C] flat.
    s_ch/d_ch: [nc, C] chunked edges (pad: d == num_dst).
    """
    out, _ = _gat_flash_fwd(num_dst, slope, sorted_dst, a_src, a_dst,
                            v_glob, s_ch, d_ch)
    return out


def _gat_logit(a_src, a_dst, slope, s, d, num_dst):
    dsafe = jnp.minimum(d, num_dst - 1)
    base = a_src[s] + a_dst[dsafe]                 # [C, H]
    logit = jnp.where(base >= 0, base, slope * base)
    valid = d < num_dst
    return jnp.where(valid[:, None], logit, -jnp.inf), base, valid, dsafe


def _gat_flash_fwd(num_dst, slope, sorted_dst, a_src, a_dst, v_glob,
                   s_ch, d_ch):
    h = a_src.shape[1]
    hd = v_glob.shape[1]
    dh = hd // h

    if sorted_dst and _scatter_mode():
        def logit_fn(x):
            s, d = x
            logit, _, valid, _ = _gat_logit(a_src, a_dst, slope, s, d,
                                            num_dst)
            return logit, valid, d

        m, l, out = _scatter_flash_scan(
            num_dst, h, dh, v_glob.dtype, logit_fn,
            lambda x: v_glob[x[0]], (s_ch, d_ch))
        return (out.reshape(num_dst, h, dh),
                (a_src, a_dst, v_glob, s_ch, d_ch, m, l, out))

    def step(carry, xs):
        m, l, acc = carry
        s, d = xs
        logit, _, valid, dsafe = _gat_logit(a_src, a_dst, slope, s, d,
                                            num_dst)
        dseg = jnp.where(valid, d, num_dst)
        cm = _seg_max(logit, dseg, num_dst + 1, -jnp.inf,
                      sorted_=sorted_dst)[:num_dst]
        m_new = jnp.maximum(m, cm)
        scale = jnp.exp(jnp.where(m > m_new, 0.0, m - m_new))
        scale = jnp.where(jnp.isfinite(m), scale, 0.0)
        z = jnp.exp(logit - jnp.where(jnp.isfinite(m_new),
                                      m_new, 0.0)[dsafe])
        z = jnp.where(valid[:, None], z, 0.0)
        l = l * scale + _seg_sum(z, dseg, num_dst + 1,
                                 sorted_=sorted_dst)[:num_dst]
        msg = v_glob[s] * _rep(z, dh)
        acc = (acc * _rep(scale, dh)
               + _seg_sum(msg, dseg, num_dst + 1,
                          sorted_=sorted_dst)[:num_dst])
        return (m_new, l, acc), None

    m0 = jnp.full((num_dst, h), -jnp.inf, v_glob.dtype)
    l0 = jnp.zeros((num_dst, h), v_glob.dtype)
    a0 = jnp.zeros((num_dst, hd), v_glob.dtype)
    (m, l, acc), _ = jax.lax.scan(step, (m0, l0, a0), (s_ch, d_ch))
    out = acc / _rep(jnp.maximum(l, 1e-16), dh)
    return (out.reshape(num_dst, h, dh),
            (a_src, a_dst, v_glob, s_ch, d_ch, m, l, out))


def _gat_flash_bwd(num_dst, slope, sorted_dst, res, g):
    a_src, a_dst, v_glob, s_ch, d_ch, m, l, out = res
    h = a_src.shape[1]
    hd = v_glob.shape[1]
    dh = hd // h
    g_flat = g.reshape(num_dst, hd)
    l_safe = jnp.maximum(l, 1e-16)
    gdot = (g_flat * out).reshape(num_dst, h, dh).sum(-1)   # [N, H]
    n_src = a_src.shape[0]
    # carry width: lane-pad narrow [*, H] grads to 128 (narrow scatters
    # serialize on TPU); H >= 16 scatters at its own width — the carry
    # MUST match whatever width dbase is padded to below
    w = _carry_w(h)

    def step(carry, xs):
        dsrc_p, ddst_p, dv = carry
        s, d = xs
        c = s.shape[0]
        logit, base, valid, dsafe = _gat_logit(a_src, a_dst, slope, s,
                                               d, num_dst)
        alpha = jnp.exp(logit - jnp.where(jnp.isfinite(m),
                                          m, 0.0)[dsafe]) / l_safe[dsafe]
        alpha = jnp.where(valid[:, None], alpha, 0.0)
        g_e = g_flat[dsafe]
        v_e = v_glob[s]
        dalpha = (g_e * v_e).reshape(c, h, dh).sum(-1)
        dlogit = alpha * (dalpha - gdot[dsafe])
        dbase = jnp.where(base >= 0, dlogit, slope * dlogit)
        dbase = jnp.where(valid[:, None], dbase, 0.0)
        dbase_p = (dbase if h >= w else
                   jnp.pad(dbase, ((0, 0), (0, w - h))))
        sdrop = jnp.where(valid, s, n_src)
        dsrc_p = dsrc_p.at[sdrop].add(dbase_p, mode='drop')
        ddst_p = ddst_p.at[jnp.where(valid, d, num_dst)].add(
            dbase_p, mode='drop', indices_are_sorted=sorted_dst)
        dv = dv.at[sdrop].add(g_e * _rep(alpha, dh), mode='drop')
        return (dsrc_p, ddst_p, dv), None

    dsrc0 = jnp.zeros((n_src, w), v_glob.dtype)
    ddst0 = jnp.zeros((num_dst, w), v_glob.dtype)
    dv0 = jnp.zeros_like(v_glob)
    (dsrc_p, ddst_p, dv), _ = jax.lax.scan(
        step, (dsrc0, ddst0, dv0), (s_ch, d_ch))
    return (dsrc_p[:, :h], ddst_p[:, :h], dv,
            _float0(s_ch), _float0(d_ch))


_gat_flash.defvjp(_gat_flash_fwd, _gat_flash_bwd)


# -- resumable block API ----------------------------------------------------
# The axon tunnel kills single dispatches past ~60-90 s; a products-
# scale-1.0 (124M-edge) GAT train step must therefore run as K
# dispatches with the scan carries as dispatch I/O (device-resident
# between calls). These blocks share the exact per-chunk math with the
# one-shot scans above; parity is pinned in tests/test_spmm_windowed.py.


def gat_flash_fwd_start(num_dst, h, dh, dtype=jnp.float32):
    """Initial (m, l, acc) carry in the scatter layout
    ([num_dst+1, w] rows; see :func:`_scatter_online_update`)."""
    w = _carry_w(h)
    return (jnp.full((num_dst + 1, w), -jnp.inf, dtype),
            jnp.zeros((num_dst + 1, w), dtype),
            jnp.zeros((num_dst + 1, h * dh), dtype))


def gat_flash_fwd_block(num_dst, slope, a_src, a_dst, v_glob, s_blk,
                        d_blk, carry):
    """Advance the forward scan over one ``[kb, C]`` chunk block.
    Chunks must be globally dst-sorted across ALL blocks."""
    h = a_src.shape[1]
    dh = v_glob.shape[1] // h
    w = carry[0].shape[1]

    def step(c, x):
        s, d = x
        logit, _, valid, _ = _gat_logit(a_src, a_dst, slope, s, d,
                                        num_dst)
        m, l, acc = _scatter_online_update(
            c[0], c[1], c[2], logit, valid, d, v_glob[s], num_dst, h,
            dh, w)
        return (m, l, acc), None

    carry, _ = jax.lax.scan(step, carry, (s_blk, d_blk))
    return carry


def gat_flash_fwd_finish(num_dst, h, dh, carry):
    """(m, l, out) from the final carry."""
    m, l, acc = carry
    m = m[:num_dst, :h]
    l = l[:num_dst, :h]
    out = acc[:num_dst] / _rep(jnp.maximum(l, 1e-16), dh)
    return m, l, out


def gat_flash_bwd_start(n_src, num_dst, h, hd, dtype=jnp.float32):
    w = _carry_w(h)
    return (jnp.zeros((n_src, w), dtype),
            jnp.zeros((num_dst + 1, w), dtype),
            jnp.zeros((n_src, hd), dtype))


def gat_flash_bwd_block(num_dst, slope, a_src, a_dst, v_glob, m, l,
                        out, g_flat, s_blk, d_blk, carry,
                        src_sorted: bool = False):
    """Advance the backward scan (dsrc, ddst, dv carries) over one
    chunk block; same math as ``_gat_flash_bwd``'s step.

    ``src_sorted=False``: chunks are dst-sorted (pad: d == num_dst) —
    ddst takes the sorted lowering. ``src_sorted=True``: chunks are
    SRC-sorted with invalid edges carrying ``s == n_src`` (so they
    sort last and drop) — the two src-side scatters (dsrc, dv) take
    the 1.7x sorted lowering instead; gathers cost the same either way
    (random row gather is order-insensitive on v5e)."""
    h = a_src.shape[1]
    hd = v_glob.shape[1]
    dh = hd // h
    l_safe = jnp.maximum(l, 1e-16)
    gdot = (g_flat * out).reshape(num_dst, h, dh).sum(-1)
    n_src = a_src.shape[0]
    w = carry[0].shape[1]

    def step(c, x):
        dsrc_p, ddst_p, dv = c
        s, d = x
        cc = s.shape[0]
        ssafe = jnp.minimum(s, n_src - 1) if src_sorted else s
        logit, base, valid, dsafe = _gat_logit(a_src, a_dst, slope,
                                               ssafe, d, num_dst)
        alpha = jnp.exp(logit - jnp.where(jnp.isfinite(m),
                                          m, 0.0)[dsafe]) / l_safe[dsafe]
        alpha = jnp.where(valid[:, None], alpha, 0.0)
        g_e = g_flat[dsafe]
        v_e = v_glob[ssafe]
        dalpha = (g_e * v_e).reshape(cc, h, dh).sum(-1)
        dlogit = alpha * (dalpha - gdot[dsafe])
        dbase = jnp.where(base >= 0, dlogit, slope * dlogit)
        dbase = jnp.where(valid[:, None], dbase, 0.0)
        dbase_p = _padw(dbase, 0.0, w)
        sdrop = s if src_sorted else jnp.where(valid, s, n_src)
        dsrc_p = dsrc_p.at[sdrop].add(dbase_p, mode='drop',
                                      indices_are_sorted=src_sorted)
        ddst_p = ddst_p.at[jnp.where(valid, d, num_dst)].add(
            dbase_p, indices_are_sorted=not src_sorted)
        dv = dv.at[sdrop].add(g_e * _rep(alpha, dh), mode='drop',
                              indices_are_sorted=src_sorted)
        return (dsrc_p, ddst_p, dv), None

    carry, _ = jax.lax.scan(step, carry, (s_blk, d_blk))
    return carry


def gat_flash_bwd_finish(num_dst, h, carry):
    dsrc_p, ddst_p, dv = carry
    return dsrc_p[:, :h], ddst_p[:num_dst, :h], dv


def gat_flash_attention(a_src, a_dst, v, src, dst, num_dst: int,
                        negative_slope: float = 0.2,
                        chunk: int = None) -> jnp.ndarray:
    """Giant-graph GAT aggregation: additive node logits + leaky_relu +
    segment softmax + weighted sum, as an online-softmax scan whose
    peak memory is one edge chunk (``PGT_ATTN_CHUNK_EDGES``).

    a_src: [N_src, H] source logit parts; a_dst: [num_dst, H]
    destination parts; v: [N_src, H, C] values; src in-range; invalid /
    padded edges flagged by ``dst >= num_dst``. Returns
    [num_dst, H, C].
    """
    import os
    e = src.shape[0]
    if chunk is None:
        chunk = int(float(os.environ.get('PGT_ATTN_CHUNK_EDGES', 2e6)))
    sort_min = int(float(os.environ.get('PGT_ATTN_SORT_MIN_EDGES',
                                        1 << 20)))
    sorted_dst = int(e) >= sort_min
    if sorted_dst:
        order = jnp.argsort(dst)
        src, dst = src[order], dst[order]
    c = max(min(chunk, max(int(e), 1)), 1)
    nc = -(-e // c)
    pad = nc * c - e
    s_ch = jnp.pad(src, (0, pad)).reshape(nc, c)
    d_ch = jnp.pad(dst, (0, pad),
                   constant_values=num_dst).reshape(nc, c)
    v_flat = v.reshape(v.shape[0], -1)
    return _gat_flash(int(num_dst), float(negative_slope), sorted_dst,
                      a_src, a_dst, v_flat, s_ch, d_ch)


# ---------------------------------------------------------------------------
# GATv2-form flash: the logit is att . leaky_relu(x_l[s] + x_r[d]) —
# per-edge [E, H, C] joint features, computed per chunk in the scan.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _gatv2_flash(num_dst, slope, heads, sorted_dst, x_l, x_r, att,
                 s_ch, d_ch):
    """x_l: [N_src, H*C] flat head-major (also the values);
    x_r: [num_dst, H*C]; att: [H*C]. s_ch/d_ch: [nc, C] chunked edges
    (pad: d == num_dst)."""
    out, _ = _gatv2_flash_fwd(num_dst, slope, heads, sorted_dst, x_l,
                              x_r, att, s_ch, d_ch)
    return out


def _gatv2_logit(x_l, x_r, att, slope, s, d, num_dst, h, dh):
    c = s.shape[0]
    dsafe = jnp.minimum(d, num_dst - 1)
    base = x_l[s] + x_r[dsafe]                       # [C, HC]
    joint = jnp.where(base >= 0, base, slope * base)
    logit = (joint * att).reshape(c, h, dh).sum(-1)  # [C, H]
    valid = d < num_dst
    return (jnp.where(valid[:, None], logit, -jnp.inf), joint, base,
            valid, dsafe)


def _gatv2_flash_fwd(num_dst, slope, heads, sorted_dst, x_l, x_r, att,
                     s_ch, d_ch):
    hd = x_l.shape[1]
    h = heads
    dh = hd // h

    if sorted_dst and _scatter_mode():
        def logit_fn(x):
            s, d = x
            logit, _, _, valid, _ = _gatv2_logit(
                x_l, x_r, att, slope, s, d, num_dst, h, dh)
            return logit, valid, d

        m, l, out = _scatter_flash_scan(
            num_dst, h, dh, x_l.dtype, logit_fn,
            lambda x: x_l[x[0]], (s_ch, d_ch))
        return (out.reshape(num_dst, h, dh),
                (x_l, x_r, att, s_ch, d_ch, m, l, out))

    def step(carry, xs):
        m, l, acc = carry
        s, d = xs
        logit, _, _, valid, dsafe = _gatv2_logit(
            x_l, x_r, att, slope, s, d, num_dst, h, dh)
        dseg = jnp.where(valid, d, num_dst)
        cm = _seg_max(logit, dseg, num_dst + 1, -jnp.inf,
                      sorted_=sorted_dst)[:num_dst]
        m_new = jnp.maximum(m, cm)
        scale = jnp.exp(jnp.where(m > m_new, 0.0, m - m_new))
        scale = jnp.where(jnp.isfinite(m), scale, 0.0)
        z = jnp.exp(logit - jnp.where(jnp.isfinite(m_new),
                                      m_new, 0.0)[dsafe])
        z = jnp.where(valid[:, None], z, 0.0)
        l = l * scale + _seg_sum(z, dseg, num_dst + 1,
                                 sorted_=sorted_dst)[:num_dst]
        msg = x_l[s] * _rep(z, dh)
        acc = (acc * _rep(scale, dh)
               + _seg_sum(msg, dseg, num_dst + 1,
                          sorted_=sorted_dst)[:num_dst])
        return (m_new, l, acc), None

    m0 = jnp.full((num_dst, h), -jnp.inf, x_l.dtype)
    l0 = jnp.zeros((num_dst, h), x_l.dtype)
    a0 = jnp.zeros((num_dst, hd), x_l.dtype)
    (m, l, acc), _ = jax.lax.scan(step, (m0, l0, a0), (s_ch, d_ch))
    out = acc / _rep(jnp.maximum(l, 1e-16), dh)
    return (out.reshape(num_dst, h, dh),
            (x_l, x_r, att, s_ch, d_ch, m, l, out))


def _gatv2_flash_bwd(num_dst, slope, heads, sorted_dst, res, g):
    x_l, x_r, att, s_ch, d_ch, m, l, out = res
    hd = x_l.shape[1]
    h = heads
    dh = hd // h
    g_flat = g.reshape(num_dst, hd)
    l_safe = jnp.maximum(l, 1e-16)
    gdot = (g_flat * out).reshape(num_dst, h, dh).sum(-1)
    n_src = x_l.shape[0]

    def step(carry, xs):
        dxl, dxr, datt = carry
        s, d = xs
        c = s.shape[0]
        logit, joint, base, valid, dsafe = _gatv2_logit(
            x_l, x_r, att, slope, s, d, num_dst, h, dh)
        alpha = jnp.exp(logit - jnp.where(jnp.isfinite(m),
                                          m, 0.0)[dsafe]) / l_safe[dsafe]
        alpha = jnp.where(valid[:, None], alpha, 0.0)
        g_e = g_flat[dsafe]
        v_e = x_l[s]
        dalpha = (g_e * v_e).reshape(c, h, dh).sum(-1)
        dlogit = alpha * (dalpha - gdot[dsafe])
        dlogit = jnp.where(valid[:, None], dlogit, 0.0)
        dl_rep = _rep(dlogit, dh)
        datt = datt + jnp.sum(joint * dl_rep, axis=0)
        djoint = dl_rep * att
        dbase = jnp.where(base >= 0, djoint, slope * djoint)
        sdrop = jnp.where(valid, s, n_src)
        dxl = dxl.at[sdrop].add(dbase + g_e * _rep(alpha, dh),
                                mode='drop')
        dxr = dxr.at[jnp.where(valid, d, num_dst)].add(
            dbase, mode='drop', indices_are_sorted=sorted_dst)
        return (dxl, dxr, datt), None

    dxl0 = jnp.zeros_like(x_l)
    dxr0 = jnp.zeros((num_dst, hd), x_l.dtype)
    datt0 = jnp.zeros_like(att)
    (dxl, dxr, datt), _ = jax.lax.scan(step, (dxl0, dxr0, datt0),
                                       (s_ch, d_ch))
    return (dxl, dxr, datt, _float0(s_ch), _float0(d_ch))


_gatv2_flash.defvjp(_gatv2_flash_fwd, _gatv2_flash_bwd)


def gatv2_flash_attention(x_l, x_r, att, src, dst, num_dst: int,
                          negative_slope: float = 0.2,
                          chunk: int = None) -> jnp.ndarray:
    """Giant-graph GATv2 aggregation (joint-feature logits) as an
    online-softmax scan. x_l: [N_src, H, C] (values AND source logit
    half); x_r: [num_dst, H, C]; att: [H, C]. Invalid / padded edges
    flagged by ``dst >= num_dst``. Returns [num_dst, H, C]."""
    import os
    e = src.shape[0]
    if chunk is None:
        chunk = int(float(os.environ.get('PGT_ATTN_CHUNK_EDGES', 2e6)))
    sort_min = int(float(os.environ.get('PGT_ATTN_SORT_MIN_EDGES',
                                        1 << 20)))
    sorted_dst = int(e) >= sort_min
    if sorted_dst:
        order = jnp.argsort(dst)
        src, dst = src[order], dst[order]
    c = max(min(chunk, max(int(e), 1)), 1)
    nc = -(-e // c)
    pad = nc * c - e
    s_ch = jnp.pad(src, (0, pad)).reshape(nc, c)
    d_ch = jnp.pad(dst, (0, pad),
                   constant_values=num_dst).reshape(nc, c)
    h = x_l.shape[1]
    return _gatv2_flash(int(num_dst), float(negative_slope), int(h),
                        sorted_dst,
                        x_l.reshape(x_l.shape[0], -1),
                        x_r.reshape(x_r.shape[0], -1),
                        att.reshape(-1), s_ch, d_ch)
