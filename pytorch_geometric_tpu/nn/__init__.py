from .message_passing import MessagePassing
from . import conv
from .conv import (GCNConv, gcn_norm, SAGEConv, GINConv, GINEConv, GATConv,
                   GATv2Conv)

__all__ = [
    'MessagePassing', 'conv', 'GCNConv', 'gcn_norm', 'SAGEConv', 'GINConv',
    'GINEConv', 'GATConv', 'GATv2Conv',
]
