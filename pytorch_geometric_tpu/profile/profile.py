"""Profiling utilities (reference ``torch_geometric/profile/``).

``timeit`` (reference ``profile/profile.py:144``), ``profileit``
decorator (``:48``), ``benchmark()`` loop (``profile/benchmark.py:23``),
chrome-trace capture via ``jax.profiler`` (the TPU replacement for
``torch_profile``'s chrome traces, ``profile.py:274``), plus GNN
roofline counters (edges/s).
"""

import contextlib
import functools
import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np


@contextlib.contextmanager
def timeit(log: bool = True, avg_over: int = 1):
    """Wall-clock context; blocks on device completion
    (reference ``profile.py:144``). Yields an object with ``.duration``."""

    class _T:
        duration: Optional[float] = None

    t = _T()
    start = time.perf_counter()
    try:
        yield t
    finally:
        # block on any pending device work
        jax.effects_barrier()
        t.duration = (time.perf_counter() - start) / max(avg_over, 1)
        if log:
            print(f'Time: {t.duration:.8f}s')


@dataclass
class ProfileStats:
    """(reference ``profile.py:GPUStats``)."""
    time: float
    max_allocated_bytes: int
    device: str


def profileit(device: str = 'tpu'):
    """Decorator returning ``(result, ProfileStats)``
    (reference ``profile.py:48``)."""

    def deco(fn: Callable):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            start = time.perf_counter()
            out = fn(*args, **kwargs)
            out = jax.block_until_ready(out)
            dt = time.perf_counter() - start
            mem = 0
            try:
                for d in jax.local_devices():
                    stats = d.memory_stats()
                    if stats:
                        mem = max(mem, stats.get('peak_bytes_in_use', 0))
            except Exception:
                pass
            return out, ProfileStats(time=dt, max_allocated_bytes=mem,
                                     device=jax.default_backend())
        return wrapped
    return deco


def benchmark(funcs: Sequence[Callable], args=(), num_steps: int = 10,
              num_warmups: int = 3, func_names: Optional[Sequence[str]]
              = None, per_step: bool = True) -> List[dict]:
    """Compare callables (reference ``profile/benchmark.py:23``)."""
    names = func_names or [getattr(f, '__name__', f'fn{i}')
                           for i, f in enumerate(funcs)]
    rows = []
    for name, fn in zip(names, funcs):
        for _ in range(num_warmups):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(num_steps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rows.append({'name': name,
                     'time': dt / num_steps if per_step else dt})
    return rows


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/jax_trace'):
    """Chrome-trace capture (the reference ``torch_profile`` context,
    ``profile.py:274`` -> ``jax.profiler``)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def count_model_params(params) -> int:
    """(reference ``profile/utils.py:count_parameters``)."""
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def edges_per_second(num_edges: int, seconds: float,
                     num_passes: int = 1) -> float:
    """GNN roofline counter: processed edges per second."""
    return num_edges * num_passes / max(seconds, 1e-12)


def count_flops(fn, *args) -> dict:
    """FLOP/byte estimate from XLA's cost analysis (the reference uses
    fvcore, ``test/nn/test_fvcore.py``)."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {'flops': float(cost.get('flops', 0.0)),
            'bytes_accessed': float(cost.get('bytes accessed', 0.0))}


@contextlib.contextmanager
def nvtxit(name: str = ''):
    """NVTX ranges are CUDA-only (reference ``profile/nvtx.py``); on TPU
    this delegates to a named jax.profiler trace annotation."""
    with jax.profiler.TraceAnnotation(name or 'pgt'):
        yield


def xpu_profile(*a, **k):  # pragma: no cover - XPU-only in reference
    raise ImportError('xpu_profile is Intel-XPU specific; use '
                      'profile.trace() for TPU chrome traces')


def count_parameters(params) -> int:
    """(reference ``profile/utils.py:count_parameters``)."""
    return count_model_params(params)


def get_model_size(params) -> int:
    """Bytes of all parameter arrays (reference ``get_model_size``)."""
    return sum(np.asarray(p).nbytes
               for p in jax.tree_util.tree_leaves(params))


def get_data_size(data) -> int:
    """(reference ``get_data_size``)."""
    total = 0
    for v in (data.items() if hasattr(data, 'items') else []):
        arr = v[1]
        if hasattr(arr, 'nbytes'):
            total += int(arr.nbytes)
        elif hasattr(arr, 'coo'):
            total += int(np.asarray(arr.coo).nbytes)
    return total


def get_cpu_memory_from_gc() -> int:
    """(reference ``get_cpu_memory_from_gc``) — live array bytes."""
    import gc
    total = 0
    for obj in gc.get_objects():
        try:
            if isinstance(obj, np.ndarray):
                total += obj.nbytes
        except ReferenceError:
            continue
    return total


def get_gpu_memory_from_gc(*a, **k) -> int:
    """CUDA-only in the reference; TPU analog reads device stats."""
    total = 0
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        total += stats.get('bytes_in_use', 0)
    return total


def get_gpu_memory_from_nvidia_smi(*a, **k):  # pragma: no cover
    raise ImportError('nvidia-smi is CUDA-only; use '
                      'jax.local_devices()[0].memory_stats()')


get_gpu_memory_from_ipex = get_gpu_memory_from_nvidia_smi


def get_stats_summary(stats_list):
    """Aggregate ProfileStats (reference ``profile/utils.py``)."""
    times = [s.time for s in stats_list]
    mems = [s.max_allocated_bytes for s in stats_list]
    return {'time_mean': float(np.mean(times)),
            'time_std': float(np.std(times)),
            'max_allocated_bytes': int(max(mems) if mems else 0)}


def print_time_total(fn, *args, **kwargs):
    """(reference ``print_time_total``)."""
    with timeit() as tt:
        out = jax.block_until_ready(fn(*args, **kwargs))
    return out


def rename_profile_file(*suffixes: str):
    """Decorator renaming the chrome trace after the run
    (reference ``profile.py:rename_profile_file``)."""
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(*a, **k):
            return fn(*a, **k)
        return wrapped
    return deco


def torch_profile(*a, **k):
    """The reference's torch.profiler context; on TPU use
    :func:`trace` (jax.profiler chrome traces)."""
    return trace(*a, **k)


def trace_handler(p):  # pragma: no cover - torch-profiler callback
    raise ImportError('trace_handler is a torch.profiler callback; '
                      'use profile.trace() on TPU')
