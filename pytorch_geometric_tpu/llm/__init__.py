from .models import LLM, SentenceTransformer, GRetriever, VisionTransformer
from .rag import (LargeGraphIndexer, MappedFeature, TripletLike,
                  get_features_for_triplets,
                  get_features_for_triplets_groups)
from .stores import (KNNRAGFeatureStore, NeighborSamplingRAGGraphStore,
                     RAGQueryLoader, batch_knn)
from .backend_utils import (preprocess_triplet, retrieval_via_pcst,
                            create_graph_from_triples,
                            create_remote_backend_from_graph_data,
                            RemoteGraphBackendLoader, make_pcst_filter)
from .glem import GLEM, glem_loss
from .protein_mpnn import ProteinMPNN
from .kg import (TXT2KG, LLMJudge, chunk_text, parse_n_check_triples,
                 merge_triples)
from .vectorrag import VectorRetriever, DocumentRetriever
from .multimodal import (MoleculeGPT, GITMol, GitMolGraphEncoder,
                         pad_or_truncate)

__all__ = [
    'GLEM', 'glem_loss', 'LLM', 'SentenceTransformer', 'GRetriever',
    'LargeGraphIndexer', 'MappedFeature', 'TripletLike',
    'get_features_for_triplets', 'get_features_for_triplets_groups',
    'KNNRAGFeatureStore', 'NeighborSamplingRAGGraphStore',
    'RAGQueryLoader', 'batch_knn', 'preprocess_triplet',
    'retrieval_via_pcst', 'create_graph_from_triples',
    'create_remote_backend_from_graph_data', 'RemoteGraphBackendLoader',
    'make_pcst_filter', 'ProteinMPNN',
    'TXT2KG', 'LLMJudge', 'chunk_text', 'parse_n_check_triples',
    'merge_triples', 'VectorRetriever', 'DocumentRetriever',
    'MoleculeGPT', 'GITMol', 'GitMolGraphEncoder', 'pad_or_truncate',
    'VisionTransformer',
]
