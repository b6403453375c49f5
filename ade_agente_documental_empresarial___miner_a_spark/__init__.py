"""ADE (Agente Documental Empresarial) — PySpark-native document-analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo `nicoliberios/ADE-Agente-Documental-Empresarial---Miner-a`
(`micro-infobot/app.py`): multi-format document ingestion, text extraction,
hierarchical sectioning, recursive chunking, embedding, vector indexing,
top-k similarity search (plain / scored / metadata-filtered / two-phase
hierarchical), grouped inspection, chat-session analytics — plus the
LLM-data-pipeline extension surface (dedup, similarity join, text analysis,
multimodal columns, streaming) designed for horizontal scale.

Everything is DataFrame/SQL-first: Catalyst owns the physical plan, Python
appears only at the three genuine UDF boundaries (format extraction,
recursive chunker, embedder), always Arrow-batched.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
