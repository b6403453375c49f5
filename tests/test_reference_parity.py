"""Env-gated parity vs the reference's actual stack (SURVEY §5.5).

Runs only where the reference's libraries are installed (they are not in
the build container); the hermetic splitter tests in test_chunker.py are
the standing guarantee.
"""

import pytest


def test_splitter_matches_langchain():
    lc = pytest.importorskip("langchain_text_splitters")
    from ade_agente_documental_empresarial___miner_a_spark.operators.chunking import (
        RecursiveCharacterSplitter,
    )

    ref = lc.RecursiveCharacterTextSplitter(
        chunk_size=500,
        chunk_overlap=50,
        separators=["\n\n", "\n", ".", " "],
    )
    ours = RecursiveCharacterSplitter()
    samples = [
        "word " * 200,
        "para one here.\n\npara two follows\nline break. end",
        "a" * 600,
        ("sentence %d. " % i for i in range(80)).__class__ and " ".join(
            f"sentence {i}." for i in range(80)
        ),
    ]
    for text in samples:
        assert ours.split_text(text) == ref.split_text(text)
