"""Backend knobs (reference ``torch_geometric/backend.py:16-55`` —
``use_segment_matmul`` global + heuristic).

Module-level flags consulted by the dispatch ladders; ``None`` means
"use the built-in heuristic".
"""

from typing import Optional

# Pallas SpMM dispatch (ops/spmm.py): None -> heuristic
# (TPU backend and E >= 2^14), True/False -> force.
use_pallas_spmm: Optional[bool] = None

# Typed-GEMM strategy for HeteroLinear/RGCN: batched einsum is the only
# implemented strategy today; the flag mirrors the reference's
# use_segment_matmul for API parity.
use_segment_matmul: Optional[bool] = None


# Determinism knob (reference torch_geometric.is_in_deterministic_mode /
# nn/aggr/base.py:65): XLA TPU segment reductions are deterministic by
# construction; this flag additionally seeds host-side samplers.
deterministic: bool = False


def set_deterministic(value: bool = True):
    global deterministic
    deterministic = value
