"""data_engineering_rag_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``alexeygrigorev/data-engineering-rag``
(a RAG ingest/index/search/eval pipeline), widened into a general
large-scale analytics engine: relational operators over a star schema,
sliding-window chunking, TF-IDF lexical search, deduplication families,
embedding similarity search, text analysis, and Structured Streaming over
an events table.

Everything is declarative DataFrame/SQL so Catalyst owns the physical
plan; Python UDFs appear only where semantics genuinely require them
(notebook conversion, LLM enrichment — both stubbed deterministically).
"""

__version__ = "0.1.0"
