from .models import LLM, SentenceTransformer, GRetriever, VisionTransformer
from .rag import LargeGraphIndexer, RAGQueryLoader
from .glem import GLEM, glem_loss
from .protein_mpnn import ProteinMPNN
from .kg import (TXT2KG, LLMJudge, chunk_text, parse_n_check_triples,
                 merge_triples)
from .vectorrag import VectorRetriever, DocumentRetriever
from .multimodal import (MoleculeGPT, GITMol, GitMolGraphEncoder,
                         pad_or_truncate)

__all__ = [
    'GLEM', 'glem_loss', 'LLM', 'SentenceTransformer', 'GRetriever',
    'LargeGraphIndexer', 'RAGQueryLoader', 'ProteinMPNN',
    'TXT2KG', 'LLMJudge', 'chunk_text', 'parse_n_check_triples',
    'merge_triples', 'VectorRetriever', 'DocumentRetriever',
    'MoleculeGPT', 'GITMol', 'GitMolGraphEncoder', 'pad_or_truncate',
    'VisionTransformer',
]
