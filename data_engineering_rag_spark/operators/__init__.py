from .chunker import chunk_documents, sliding_window_starts_sql
from .tfidf import build_tfidf, search_topk

__all__ = [
    "chunk_documents",
    "sliding_window_starts_sql",
    "build_tfidf",
    "search_topk",
]
