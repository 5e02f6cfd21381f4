"""Import-path parity for the reference's cugraph wrappers
(``torch_geometric/nn/conv/cugraph``). Those wrap NVIDIA cugraph-ops
CUDA kernels; on TPU the same layers run through the native fused
paths, so the names alias the regular convs (honest stand-ins, like
the reference's own fallback when cugraph-ops is absent)."""
from ..gat_conv import CuGraphGATConv
from .. import RGCNConv as CuGraphRGCNConv
from .. import SAGEConv as CuGraphSAGEConv

__all__ = ['CuGraphGATConv', 'CuGraphRGCNConv', 'CuGraphSAGEConv']
