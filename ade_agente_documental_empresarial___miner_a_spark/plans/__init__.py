from .pipeline import build_chunks, flagship_query  # noqa: F401
