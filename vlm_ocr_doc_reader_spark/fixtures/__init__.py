from .generate import generate_documents, write_documents_parquet  # noqa: F401
