from .models import LLM, SentenceTransformer, GRetriever
from .rag import LargeGraphIndexer, RAGQueryLoader

__all__ = [
    'GLEM', 'glem_loss','LLM', 'SentenceTransformer', 'GRetriever',
           'LargeGraphIndexer', 'RAGQueryLoader']
from .glem import GLEM, glem_loss
