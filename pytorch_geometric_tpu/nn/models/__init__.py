from .mlp import MLP
from .basic_gnn import BasicGNN, GCN, GraphSAGE, GIN, GAT

__all__ = ['MLP', 'BasicGNN', 'GCN', 'GraphSAGE', 'GIN', 'GAT']
