from .mlp import MLP
from .basic_gnn import (BasicGNN, GCN, GraphSAGE, GIN, GAT, PNA,
                        EdgeCNN, basic_gnn_inference)
from .autoencoder import (InnerProductDecoder, GAE, VGAE, ARGA, ARGVA)
from .misc_models import (JumpingKnowledge, DeepGraphInfomax, LightGCN,
                          LabelPropagation, CorrectAndSmooth, LINKX, PMLP,
                          MaskLabel, MetaLayer, NeuralFingerprint,
                          DeepGCNLayer, GraphUNet)
from .node2vec import Node2Vec, MetaPath2Vec, random_walk
from .schnet import SchNet, GaussianSmearing
from .molecular import (AttentiveFP, SignedGCN, RECT_L, GroupAddRev)
from .dimenet import (DimeNet, DimeNetPlusPlus, BesselBasisLayer,
                      SphericalBasisLayer, Envelope)
from .force_field import GNNFF, RENet, GaussianFilter
from .visnet import ViSNet, ViSNetBlock, ViS_MP, EquivariantScalar
from .lpformer import LPFormer, LPAttLayer, build_link_context
from .gpse import GPSE, GPSENodeEncoder, AddGPSE, precompute_gpse
from .misc_models import (HeteroJumpingKnowledge, ARLinkPredictor,
                          to_captum_model, to_captum_input,
                          captum_output_to_dicts)
from .tgn import TGNMemory, TGNMemoryState, TemporalData, \
    LastNeighborLoader
from .transformers import SGFormer, Polynormer, GraphMixer

__all__ = [
    'GNNFF', 'RENet', 'GaussianFilter',
    'ViSNet', 'ViSNetBlock', 'ViS_MP', 'EquivariantScalar',
    'LPFormer', 'LPAttLayer', 'build_link_context',
    'GPSE', 'GPSENodeEncoder', 'AddGPSE', 'precompute_gpse',
    'HeteroJumpingKnowledge', 'ARLinkPredictor', 'DimeNet',
    'to_captum_model', 'to_captum_input', 'captum_output_to_dicts',
    'MLP', 'BasicGNN', 'GCN', 'GraphSAGE', 'GIN', 'GAT', 'PNA', 'EdgeCNN',
    'basic_gnn_inference',
    'InnerProductDecoder', 'GAE', 'VGAE', 'ARGA', 'ARGVA',
    'JumpingKnowledge', 'DeepGraphInfomax', 'LightGCN', 'LabelPropagation',
    'CorrectAndSmooth', 'LINKX', 'PMLP', 'MaskLabel', 'MetaLayer',
    'NeuralFingerprint', 'DeepGCNLayer', 'GraphUNet',
    'Node2Vec', 'MetaPath2Vec', 'random_walk',
    'SchNet', 'GaussianSmearing', 'AttentiveFP', 'DimeNetPlusPlus',
    'SignedGCN', 'RECT_L', 'GroupAddRev',
    'TGNMemory', 'TGNMemoryState', 'TemporalData', 'LastNeighborLoader',
    'SGFormer', 'Polynormer', 'GraphMixer',
]
