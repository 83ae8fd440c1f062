from .incremental import append_batch, delete_docs, incremental_index, upsert_docs  # noqa: F401
