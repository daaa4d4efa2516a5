"""Training-data-pipeline operators over generic corpora.

First-class components alongside the KG pipeline (driver brief): exact +
near deduplication, similarity search over embedding columns, text
analysis, and multimodal-column plumbing.  All operate on plain DataFrames
(e.g. the testdata ``documents`` / ``embeddings`` tables) and are exposed
as queries in ``__spark_entry__.py``.
"""
