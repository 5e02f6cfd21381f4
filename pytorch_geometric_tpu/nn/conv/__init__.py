from ..message_passing import MessagePassing
from .gcn_conv import GCNConv, gcn_norm
from .sage_conv import SAGEConv
from .gin_conv import GINConv, GINEConv
from .gat_conv import GATConv, GATv2Conv

__all__ = [
    'MessagePassing', 'GCNConv', 'gcn_norm', 'SAGEConv', 'GINConv',
    'GINEConv', 'GATConv', 'GATv2Conv',
]
