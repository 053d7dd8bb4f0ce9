"""PySpark-native analytics engine with the query and data-processing
capabilities of crosscore/rag-vertex-ai-vector-search.

The reference (see SURVEY.md) is a RAG vector store: a batch ingestion
pipeline (documents -> token-validated embeddings -> ANN index + metadata
store) plus a filtered / diversity-constrained top-k nearest-neighbor
query surface. This package re-expresses the whole surface Spark-first:

- ``sources``    -- table loaders and the markdown-directory scan
                    (reference: setup_vector_search.py:188-216).
- ``functions``  -- vector math, text analysis, deterministic hash
                    embedding (reference: embeddings.py).
- ``operators``  -- kNN search (exact + IVF-pruned), crowding, upsert,
                    dedup suite, ingestion pipeline
                    (reference: setup_vector_search.py, index_manager.py,
                    firestore_ops.py).
- ``plans``      -- index manifests (reference: INDEX_CONFIG,
                    common/config.py:30-41).
- ``streaming``  -- incremental ingest, the STREAM_UPDATE analog
                    (reference: index_manager.py:53).
- ``multimodal`` -- opaque-binary column plumbing for image/audio/video.
"""

__version__ = "0.1.0"
