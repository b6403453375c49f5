"""EXT queries — LLM-data-pipeline + relational surface (SURVEY §7 M4).

Placeholder module; populated incrementally (dedup, similarity search,
text analysis, relational/star-schema, streaming-batch mirrors).
"""
