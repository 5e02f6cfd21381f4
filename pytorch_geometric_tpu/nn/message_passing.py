"""MessagePassing — the operator substrate (L5).

TPU-native redesign of reference
``torch_geometric/nn/conv/message_passing.py:39`` (1035 LoC). The
reference reflects user subclass signatures with a 541-LoC ``Inspector``
and regenerates ``propagate`` from jinja templates to escape Python
overhead; under JAX none of that is needed — ``propagate`` runs **once at
trace time**, so plain ``inspect.signature`` reflection is free, and XLA
fuses the gather -> message -> segment-reduce chain.

Semantics preserved from the reference:
  * ``flow='source_to_target'``: messages flow along edge_index[0] -> [1];
    gather suffix ``_j`` = source endpoint, ``_i`` = target endpoint
    (``message_passing.py:335-414``, ``_collect``).
  * ``message`` default: identity on ``x_j`` (``:565``).
  * ``aggregate``: segment reduce by destination with static ``dim_size``
    (``:577-595``).
  * ``message_and_aggregate`` fusion: if the subclass implements it and is
    handed an ``EdgeIndex``, the SpMM path is taken (``:479-497``).
  * ``update`` default: identity (``:597``).
  * ``edge_updater``/``edge_update`` for edge-level passes (GAT attention)
    (``:620-676``).

Padding: edges whose endpoints are ``>= num_nodes`` are dropped by the
segment ops; an explicit ``edge_mask`` can additionally zero messages.
"""

import inspect
from typing import Any, Dict, Optional, Tuple, Union

import flax.linen as fnn
import jax.numpy as jnp

from ..edge_index import EdgeIndex
from ..ops import scatter, softmax


def _endpoints(edge_index, flow: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    coo = edge_index.coo if isinstance(edge_index, EdgeIndex) else edge_index
    if flow == 'source_to_target':
        return coo[0], coo[1]  # j (gather), i (aggregate)
    return coo[1], coo[0]


def _debug_check_bounds(j_idx, i_idx, num_src: int, num_dst: int) -> None:
    """Debug-mode bounds check (reference ``message_passing.py:269-290``
    ``_index_select_safe``). The production kernels clamp out-of-range
    indices for padding safety — index ``== n`` is the pad sentinel — so
    a *corrupt* edge_index (negative, or past the sentinel) would
    otherwise be silently aggregated into the last row. Under
    ``pytorch_geometric_tpu.experimental.debug()`` (host-side, concrete
    arrays only — tracers can't be validated) it raises instead."""
    from ..experimental import is_debug_enabled
    if not is_debug_enabled():
        return
    import jax
    import numpy as np
    for idx, n, which in ((j_idx, num_src, 'source'),
                          (i_idx, num_dst, 'destination')):
        if isinstance(idx, jax.core.Tracer):
            continue  # tracer inside jit — cannot be checked on host
        arr = np.asarray(idx)
        if arr.size == 0:
            continue
        lo, hi = int(arr.min()), int(arr.max())
        if lo < 0:
            raise IndexError(
                f"Found negative {which} indices in 'edge_index' (got "
                f"{lo}). Please ensure that all indices point to valid "
                f"node indices in the interval [0, {n}) (index == {n} "
                f"is reserved for padding) and try again.")
        if hi > n:
            raise IndexError(
                f"Found {which} indices in 'edge_index' that are larger "
                f"than {n} (got {hi}). Please ensure that all indices "
                f"point to valid node indices in the interval [0, {n}) "
                f"(index == {n} is reserved for padding) and try again.")


def _pair(x) -> Tuple[Any, Any]:
    if isinstance(x, tuple):
        return x
    return (x, x)


class MessagePassing(fnn.Module):
    """Base class for all graph convolutions.

    Subclasses set class attributes / dataclass fields ``aggr`` and
    ``flow`` as needed (defaults 'sum' / 'source_to_target') and override
    any of ``message`` / ``aggregate`` / ``message_and_aggregate`` /
    ``update`` / ``edge_update``.
    """

    def _aggr(self):
        a = getattr(self, 'aggr', 'sum')
        if isinstance(a, str):
            return {'add': 'sum'}.get(a, a)
        return a

    def _flow(self) -> str:
        return getattr(self, 'flow', 'source_to_target')

    # -- overridable stages ---------------------------------------------------
    def message(self, x_j, **kwargs):  # noqa: D401
        return x_j

    def aggregate(self, inputs: jnp.ndarray, index: jnp.ndarray,
                  dim_size: int, edge_mask=None) -> jnp.ndarray:
        aggr = self._aggr()
        # Aggregation-module path (reference resolves str/list/module via
        # aggr_resolver at message_passing.py:134).
        if not isinstance(aggr, (str, list, tuple)):
            return aggr(inputs, index, dim_size, mask=edge_mask)
        if isinstance(aggr, (list, tuple)):
            outs = [scatter(inputs, index, dim_size, reduce=a,
                            mask=edge_mask) for a in aggr]
            return jnp.concatenate(outs, axis=-1)
        return scatter(inputs, index, dim_size, reduce=aggr, mask=edge_mask)

    def update(self, inputs, **kwargs):
        return inputs

    # message_and_aggregate / edge_update intentionally absent by default;
    # their presence on a subclass enables the fused / edge-level paths.

    # -- driver ---------------------------------------------------------------
    def propagate(self, edge_index, size: Optional[Tuple[int, int]] = None,
                  edge_mask: Optional[jnp.ndarray] = None,
                  **kwargs) -> jnp.ndarray:
        """Run gather -> message -> aggregate -> update.

        Args:
            edge_index: ``EdgeIndex`` or raw ``[2, E]`` int array.
            size: static ``(num_src, num_dst)``; required when
                ``edge_index`` is a raw array and ``x`` is absent.
            edge_mask: optional bool ``[E]`` (padding/dropout).
            **kwargs: node tensors (gathered per-edge with ``_j``/``_i``
                suffixes in ``message``), edge tensors (passed through),
                e.g. ``x=x`` or ``x=(x_src, x_dst)``, ``edge_weight=w``.
        """
        size = self._infer_size(edge_index, size, kwargs)
        num_src, num_dst = size
        j_idx, i_idx = _endpoints(edge_index, self._flow())
        _debug_check_bounds(j_idx, i_idx, num_src, num_dst)

        # Fused SpMM path (reference message_passing.py:479-497).
        # edge_mask is not threaded through message_and_aggregate
        # (padding lives in the EdgeIndex's sentinel endpoints there),
        # so an explicit mask forces the gather path.
        if (hasattr(self, 'message_and_aggregate')
                and edge_mask is None
                and isinstance(edge_index, EdgeIndex)
                and self._aggr() in ('sum', 'mean', 'min', 'max')):
            out = self.message_and_aggregate(edge_index, **kwargs)
            if out is not NotImplemented:
                return self._run_update(out, kwargs)

        msg_kwargs = self._collect(self.message, j_idx, i_idx, num_src,
                                   num_dst, edge_mask, kwargs)
        out = self.message(**msg_kwargs)
        if edge_mask is not None:
            m = edge_mask.reshape((-1,) + (1,) * (out.ndim - 1))
            out = jnp.where(m, out, 0)
        out = self.aggregate(out, i_idx, dim_size=num_dst,
                             edge_mask=edge_mask)
        return self._run_update(out, kwargs)

    def edge_updater(self, edge_index,
                     size: Optional[Tuple[int, int]] = None,
                     edge_mask: Optional[jnp.ndarray] = None,
                     **kwargs) -> jnp.ndarray:
        """Edge-level pass -> per-edge outputs (reference ``:620-676``)."""
        size = self._infer_size(edge_index, size, kwargs)
        j_idx, i_idx = _endpoints(edge_index, self._flow())
        _debug_check_bounds(j_idx, i_idx, size[0], size[1])
        fn = getattr(self, 'edge_update')
        ekwargs = self._collect(fn, j_idx, i_idx, size[0], size[1],
                                edge_mask, kwargs)
        return fn(**ekwargs)

    # -- internals -------------------------------------------------------------
    def _infer_size(self, edge_index, size, kwargs) -> Tuple[int, int]:
        if size is not None:
            return size
        if isinstance(edge_index, EdgeIndex):
            return edge_index.sparse_size
        x = kwargs.get('x')
        if x is not None:
            src, dst = _pair(x)
            if src is not None and dst is not None:
                return (src.shape[0], dst.shape[0])
            if src is not None:
                return (src.shape[0], src.shape[0])
        raise ValueError(
            'propagate() needs static sizes: pass an EdgeIndex, size=(N,M), '
            'or node features x')

    def _collect(self, fn, j_idx, i_idx, num_src, num_dst, edge_mask,
                 kwargs) -> Dict[str, Any]:
        """Materialise exactly the args ``fn`` asks for (reference
        ``_collect``, ``message_passing.py:335``)."""
        params = inspect.signature(
            type(self).__dict__.get(fn.__name__, fn)).parameters
        out: Dict[str, Any] = {}
        # clamp gather indices so padded edges (idx == N) read row 0 safely;
        # their messages are dropped at aggregation.
        j_safe = jnp.minimum(j_idx, max(num_src - 1, 0))
        i_safe = jnp.minimum(i_idx, max(num_dst - 1, 0))
        for name in params:
            if name in ('self', 'kwargs'):
                continue
            if name.endswith('_j') or name.endswith('_i'):
                base = name[:-2]
                val = kwargs.get(base)
                if val is None:
                    raise ValueError(
                        f"message() wants '{name}' but '{base}' was not "
                        f"passed to propagate()")
                src_val, dst_val = _pair(val)
                if name.endswith('_j'):
                    out[name] = src_val[j_safe]
                else:
                    out[name] = dst_val[i_safe]
            elif name == 'index':
                out[name] = i_idx
            elif name == 'size_i' or name == 'dim_size':
                out[name] = num_dst
            elif name == 'size_j':
                out[name] = num_src
            elif name == 'edge_mask':
                out[name] = edge_mask
            elif name in kwargs:
                out[name] = kwargs[name]
            elif params[name].default is inspect.Parameter.empty:
                raise ValueError(
                    f"message() requires '{name}' but it was not passed to "
                    f"propagate()")
        return out

    def _run_update(self, out, kwargs):
        params = inspect.signature(
            type(self).__dict__.get('update', MessagePassing.update)
        ).parameters
        ukwargs = {k: kwargs[k] for k in params
                   if k not in ('self', 'inputs', 'kwargs') and k in kwargs}
        return self.update(out, **ukwargs)

    # convenience for attention convs
    @staticmethod
    def edge_softmax(alpha: jnp.ndarray, index: jnp.ndarray,
                     num_nodes: int,
                     edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return softmax(alpha, index, num_nodes, mask=edge_mask)
