"""The CLI glue (tools/infobot_cli.py) must drive the full reference
workflow — fixture ingest → index build → RAM-served turn → persisted
history + cost rollup — through the same public APIs MIGRATION.md
documents."""

from __future__ import annotations

import importlib.util
import os
import sys


def _cli():
    spec = importlib.util.spec_from_file_location(
        "infobot_cli",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "infobot_cli.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_one_shot_question_end_to_end(spark, sf_dir, tmp_path, capsys):
    cli = _cli()
    hist = str(tmp_path / "hist")
    rc = cli.main(
        [
            "--sf-dir",
            sf_dir,
            "--history",
            hist,
            "--user",
            "cli-test",
            "--ask",
            "pregunta de humo sobre pedidos",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr()
    assert out.out.strip()  # a non-empty answer on stdout
    assert "# index ready:" in out.err and "# history: 1 stored turns" in out.err

    from ade_agente_documental_empresarial___miner_a_spark.sources.sinks import (
        read_chat_history,
    )

    rows = read_chat_history(spark, hist).collect()
    assert len(rows) == 1 and rows[0].user == "cli-test"
    assert rows[0].response == out.out.strip()


def test_index_reuse_roundtrip(spark, sf_dir, tmp_path, capsys):
    cli = _cli()
    idx = str(tmp_path / "idx")
    for _ in range(2):  # second run loads the persisted index
        rc = cli.main(
            ["--sf-dir", sf_dir, "--index", idx, "--ask", "hola"],
            spark=spark,
        )
        assert rc == 0
    assert os.path.exists(os.path.join(idx, "_SUCCESS"))
    assert capsys.readouterr().out.strip()


def test_repl_reads_stdin(spark, sf_dir, monkeypatch, capsys):
    cli = _cli()
    feed = iter(["primera pregunta", ""])
    monkeypatch.setattr("builtins.input", lambda _="": next(feed))
    rc = cli.main(["--sf-dir", sf_dir], spark=spark)
    assert rc == 0
    assert capsys.readouterr().out.strip()


def test_index_kind_hnsw_serves_a_turn(spark, sf_dir, tmp_path, capsys):
    # --index-kind hnsw routes retrieval through the deterministic HNSW
    # graph (MIGRATION.md §3a guidance); the turn must complete and
    # announce the tier. Same build, approximate hits — on this tiny
    # fixture the graph search is exact-recall so the answer is
    # non-empty like the exact tier's.
    cli = _cli()
    rc = cli.main(
        [
            "--sf-dir",
            sf_dir,
            "--user",
            "cli-hnsw",
            "--index-kind",
            "hnsw",
            "--ask",
            "pregunta de humo sobre clientes",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr()
    assert out.out.strip()
    assert "hnsw)" in out.err


def test_hnsw_serving_index_matches_exact_on_tiny_frame(spark, sf_dir):
    # recall sanity at fixture scale: graph top-1 == exact top-1
    from ade_agente_documental_empresarial___miner_a_spark.operators.serving import (
        HnswServingIndex,
        RamServingIndex,
    )
    from ade_agente_documental_empresarial___miner_a_spark.plans.pipeline import (
        build_chunks,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    chunks = build_chunks(docs)
    exact = RamServingIndex.from_frame(chunks)
    hnsw = HnswServingIndex.from_frame(chunks)
    assert len(exact) == len(hnsw)
    q = [0.1] * 64
    e_top = exact.topk(q, k=1)[0]
    h_top = hnsw.topk(q, k=1)[0]
    assert e_top.chunk_id == h_top.chunk_id
    assert h_top.text == e_top.text


def test_real_pdf_corpus_end_to_end(spark, tmp_path, capsys):
    """VERDICT r9 task 7: drive ACTUAL PDF byte streams — not fixture
    parquet — through the full reference flow (S1 binary scan -> S3
    extract -> section -> chunk -> embed -> serve), for BOTH serving
    tiers, and assert the answered turn quotes chunk text that only
    exists inside one of the PDFs (app.py:191-205, 223 semantics, zero
    network). The PDFs are spec-valid (Flate-compressed content
    streams, multi-line Td/T* layout) built by the same generators the
    pdftext unit battery uses."""
    import zlib

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tests.test_pdftext import build_pdf, stream_obj

    def sectioned_pdf(title: str, lines: list[str]) -> bytes:
        ops = [f"BT /F1 12 Tf 72 720 Td ({title}) Tj"]
        for ln in lines:
            ops.append(f"T* ({ln}) Tj")
        ops.append("ET")
        content = " ".join(ops).encode()
        payload = zlib.compress(content)
        return build_pdf(
            [
                b"<< /Type /Catalog /Pages 2 0 R >>",
                b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Contents 4 0 R >>",
                stream_obj(payload, b"/Filter /FlateDecode"),
            ]
        )

    docs_dir = tmp_path / "pdfs"
    docs_dir.mkdir()
    (docs_dir / "turbine.pdf").write_bytes(
        sectioned_pdf(
            "TURBINE MANUAL",
            [
                "",
                "the zephyrine turbine spins at nine thousand rpm",
                "lubricate the zephyrine bearing every ten days",
            ],
        )
    )
    (docs_dir / "cookbook.pdf").write_bytes(
        sectioned_pdf(
            "SOUP RECIPES",
            ["", "simmer the broth gently for one hour"],
        )
    )
    # a garbage file must degrade to an error row, not kill the run
    (docs_dir / "broken.pdf").write_bytes(b"%PDF-1.4 not really a pdf")

    cli = _cli()
    for kind in ("exact", "hnsw"):
        idx = str(tmp_path / f"idx_{kind}")
        rc = cli.main(
            [
                "--docs",
                str(docs_dir),
                "--index",
                idx,
                "--index-kind",
                kind,
                "--user",
                f"pdf-{kind}",
                "--k",
                "2",
                "--ask",
                "zephyrine turbine lubrication schedule",
            ],
            spark=spark,
        )
        assert rc == 0
        out = capsys.readouterr()
        # retrieved chunk text really came from the turbine PDF bytes
        assert "zephyrine" in out.out.lower()
        assert "# index ready:" in out.err
        # the broken file degraded visibly instead of aborting
        assert "degraded to error rows" in out.err

    # and the extraction itself recovered the multi-line layout
    from ade_agente_documental_empresarial___miner_a_spark.sources.extract import (
        binary_scan,
        extract_text,
    )

    docs = extract_text(binary_scan(spark, str(docs_dir)))
    good = {r.path.rsplit("/", 1)[-1]: r.text
            for r in docs.where("error IS NULL").collect()}
    assert "TURBINE MANUAL" in good["turbine.pdf"]
    assert "lubricate the zephyrine bearing" in good["turbine.pdf"]
    assert "simmer the broth" in good["cookbook.pdf"]
