"""Runnable end-to-end analogue of the reference app (micro-infobot's
Streamlit loop, app.py:191-283) — the MIGRATION.md workflows glued into
one CLI so a reference user can drive ingest → index → chat → costs
without writing code.

    # one-shot question against the bundled fixtures
    python tools/infobot_cli.py --sf-dir /root/testdata/sf0.001 \
        --ask "¿Qué dice la política de vacaciones?"

    # ingest a directory of files instead (binaryFile scan, S1-S5)
    python tools/infobot_cli.py --docs /data/uploads --index /data/idx \
        --history /data/chat_history --user maria --ask "..."

    # interactive REPL (blank line exits)
    python tools/infobot_cli.py --sf-dir /root/testdata/sf0.001

Serving uses the RAM tier (operators/serving.RamServingIndex —
bit-identical hits to the distributed plan, zero Spark jobs per turn);
the index build and analytics stay distributed. The LLM is the
deterministic extractive stub unless you wire a callable in code
(plans/chat.py's ``llm=`` boundary) — this container has no network.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_or_load_chunks(spark, args):
    from ade_agente_documental_empresarial___miner_a_spark.plans.pipeline import (
        build_chunks,
    )

    if args.index and os.path.exists(os.path.join(args.index, "_SUCCESS")):
        return spark.read.parquet(args.index)
    if args.docs:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from ade_agente_documental_empresarial___miner_a_spark.sources.extract import (
            binary_scan,
            extract_text,
        )

        extracted = extract_text(binary_scan(spark, args.docs))
        bad = extracted.where("error IS NOT NULL")
        n_bad = bad.count()
        if n_bad:
            print(f"# {n_bad} file(s) degraded to error rows:", file=sys.stderr)
            for r in bad.select("path", "error").collect()[:10]:
                print(f"#   {r.path}: {r.error}", file=sys.stderr)
        # the chunk pipeline keys on doc_id (chunk_id = doc_id*1e6+seq):
        # assign dense deterministic ids in path order (ingest is a
        # one-time pass, so the global window is a deliberate cost)
        docs = (
            extracted.where("error IS NULL")
            .withColumn(
                "doc_id",
                F.row_number().over(Window.orderBy("path")).cast("long"),
            )
            .select("doc_id", "text", F.col("path").alias("source"))
        )
    else:
        docs = spark.read.parquet(
            os.path.join(args.sf_dir, "documents.parquet")
        )
    chunks = build_chunks(docs)
    if args.index:
        chunks.write.mode("overwrite").parquet(args.index)
        chunks = spark.read.parquet(args.index)
    return chunks


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--docs", help="directory of raw files to ingest (S1-S5)")
    src.add_argument("--sf-dir", help="fixture dir with documents.parquet")
    p.add_argument("--index", help="parquet index path (built if missing)")
    p.add_argument("--history", help="chat history store path (S6)")
    p.add_argument("--user", default="cli-user")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--ask", help="one-shot question (else: REPL)")
    p.add_argument(
        "--index-kind",
        choices=("exact", "hnsw"),
        default="exact",
        help="serving tier: exact RAM scan (default — fastest AND "
        "bit-identical at every shard size measured) or an HNSW graph "
        "(approximate, ~0.9 recall on <=100k clustered shards; see "
        "docs/MIGRATION.md section 3a for the measured guidance)",
    )
    p.add_argument(
        "--max-index-rows",
        type=int,
        default=1_000_000,
        help="RAM serving guard (shard the index beyond this)",
    )
    args = p.parse_args(argv)

    own_session = spark is None
    if own_session:
        from ade_agente_documental_empresarial___miner_a_spark.session import (
            get_spark,
        )

        spark = get_spark("infobot-cli")
        spark.sparkContext.setLogLevel("ERROR")

    from ade_agente_documental_empresarial___miner_a_spark.operators.serving import (
        HnswServingIndex,
        RamServingIndex,
    )
    from ade_agente_documental_empresarial___miner_a_spark.plans.chat import (
        ChatSession,
    )

    chunks = _build_or_load_chunks(spark, args)
    index_cls = (
        HnswServingIndex if args.index_kind == "hnsw" else RamServingIndex
    )
    ram = index_cls.from_frame(chunks, max_rows=args.max_index_rows)
    print(
        f"# index ready: {len(ram)} chunks"
        f" ({ram.nbytes / 1e6:.1f} MB resident, {args.index_kind})",
        file=sys.stderr,
    )
    sess = ChatSession(
        spark, ram, args.user, history_path=args.history, k=args.k
    )

    def one(question: str) -> None:
        turn = sess.ask(question)
        print(turn.answer)
        print(
            f"# tokens p={turn.prompt_tokens} c={turn.completion_tokens}"
            f" cost=${turn.cost_usd:.6f}",
            file=sys.stderr,
        )

    if args.ask:
        one(args.ask)
    else:
        print("# InfoBot REPL — blank line exits", file=sys.stderr)
        while True:
            try:
                q = input("? ").strip()
            except EOFError:
                break
            if not q:
                break
            one(q)

    if args.history:
        from ade_agente_documental_empresarial___miner_a_spark.sources.sinks import (
            read_chat_history,
            session_transcripts,
        )

        tot = (
            session_transcripts(read_chat_history(spark, args.history))
            .selectExpr(
                "sum(n_turns) AS turns", "round(sum(cost_usd), 6) AS usd"
            )
            .collect()[0]
        )
        print(
            f"# history: {tot.turns} stored turns, ${tot.usd} total",
            file=sys.stderr,
        )
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
