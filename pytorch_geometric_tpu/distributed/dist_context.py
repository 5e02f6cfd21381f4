"""Process/job context for multi-host runs.

Reference: ``torch_geometric/distributed/dist_context.py`` (DistContext,
DistRole) and the RPC bootstrap in ``distributed/rpc.py``. The TPU
control plane is ``jax.distributed``: one coordinator, N processes, and
every cross-host byte rides XLA collectives afterwards — there is no
per-request RPC layer to manage.
"""

import os
from dataclasses import dataclass
from enum import Enum
from typing import Optional


class DistRole(Enum):
    WORKER = 1


@dataclass
class DistContext:
    """(reference ``dist_context.py:9``). ``rank``/``world_size`` are the
    jax process index / process count; ``global_*`` mirror them (no
    separate sampler-worker groups on TPU — samplers are host threads)."""
    rank: int
    global_rank: int
    world_size: int
    global_world_size: int
    group_name: str
    role: DistRole = DistRole.WORKER

    @property
    def worker_name(self) -> str:
        return f'{self.group_name}-{self.rank}'


_current: Optional[DistContext] = None


def init_process(coordinator_address: Optional[str] = None,
                 num_processes: Optional[int] = None,
                 process_id: Optional[int] = None,
                 group_name: str = 'pgt-dist',
                 local_device_ids=None) -> DistContext:
    """Join (or bootstrap) the multi-host job.

    Wraps ``jax.distributed.initialize`` — on TPU pods the three
    arguments are auto-detected from the metadata server and may be left
    ``None``; on CPU/GPU clusters (and the 2-process CPU tests) pass
    them explicitly. Returns the :class:`DistContext` partition books
    and loaders key off.
    """
    import jax

    if not jax.distributed.is_initialized():
        kwargs = {}
        if coordinator_address is not None:
            kwargs['coordinator_address'] = coordinator_address
        if num_processes is not None:
            kwargs['num_processes'] = num_processes
        if process_id is not None:
            kwargs['process_id'] = process_id
        if local_device_ids is not None:
            kwargs['local_device_ids'] = local_device_ids
        jax.distributed.initialize(**kwargs)

    global _current
    _current = DistContext(
        rank=jax.process_index(),
        global_rank=jax.process_index(),
        world_size=jax.process_count(),
        global_world_size=jax.process_count(),
        group_name=group_name,
    )
    return _current


def current_context() -> Optional[DistContext]:
    return _current


def shutdown() -> None:
    """Leave the job (reference ``rpc.py:shutdown_rpc``)."""
    import jax

    global _current
    _current = None
    if jax.distributed.is_initialized():
        jax.distributed.shutdown()
