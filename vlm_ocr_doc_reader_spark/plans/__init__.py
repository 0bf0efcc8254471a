from .extract import extract, extract_flat  # noqa: F401
