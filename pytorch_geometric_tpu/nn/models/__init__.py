from .mlp import MLP
from .basic_gnn import BasicGNN, GCN, GraphSAGE, GIN, GAT
from .autoencoder import (InnerProductDecoder, GAE, VGAE, ARGA, ARGVA)
from .misc_models import (JumpingKnowledge, DeepGraphInfomax, LightGCN,
                          LabelPropagation, CorrectAndSmooth, LINKX, PMLP,
                          MaskLabel, MetaLayer, NeuralFingerprint,
                          DeepGCNLayer, GraphUNet)
from .node2vec import Node2Vec, MetaPath2Vec, random_walk

__all__ = [
    'MLP', 'BasicGNN', 'GCN', 'GraphSAGE', 'GIN', 'GAT',
    'InnerProductDecoder', 'GAE', 'VGAE', 'ARGA', 'ARGVA',
    'JumpingKnowledge', 'DeepGraphInfomax', 'LightGCN', 'LabelPropagation',
    'CorrectAndSmooth', 'LINKX', 'PMLP', 'MaskLabel', 'MetaLayer',
    'NeuralFingerprint', 'DeepGCNLayer', 'GraphUNet',
    'Node2Vec', 'MetaPath2Vec', 'random_walk',
]
