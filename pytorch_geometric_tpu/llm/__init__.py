from .models import LLM, SentenceTransformer, GRetriever
from .rag import LargeGraphIndexer, RAGQueryLoader

__all__ = ['LLM', 'SentenceTransformer', 'GRetriever',
           'LargeGraphIndexer', 'RAGQueryLoader']
