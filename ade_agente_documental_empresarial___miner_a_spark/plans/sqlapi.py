"""SQL API surface — ``spark.sql`` parity (SURVEY §4's optional polish:
"registering cosine_distance … for SQL-surface parity", done with Spark
4 SQL scalar functions instead of a Catalyst extension; they inline into
the plan and stay whole-stage-codegen'd, no Python boundary).

``register_sql_api(spark, sf_dir)`` installs temp views for every fixture
table (events nanos-normalized) plus the engine's scalar functions, after
which the entire retrieval surface is expressible in pure SQL:

    SELECT vec_id, cosine_sim(embedding, q.qvec) AS score ...
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .catalog import events_table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
]

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0.0D, (s, x) -> s + x)"
)
_NORM = (
    "sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "0.0D, (s, x) -> s + x))"
)

FUNCTIONS: dict[str, str] = {
    "cosine_sim": f"""(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
RETURN try_divide({_DOT.format(a='a', b='b')}, {_NORM.format(a='a')} * {_NORM.format(a='b')})""",
    "cosine_dist": """(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
RETURN 1.0D - cosine_sim(a, b)""",
    "l2_norm": f"""(a ARRAY<FLOAT>) RETURNS DOUBLE
RETURN {_NORM.format(a='a')}""",
    "is_title": r"""(line STRING) RETURNS BOOLEAN
RETURN trim(line) RLIKE '^[A-Z\\s]+$' AND length(trim(line)) > 5""",
    "ws_token_count": """(t STRING) RETURNS BIGINT
RETURN CAST(size(split(t, ' ')) AS BIGINT)""",
    "chat_cost_usd": """(prompt_tokens BIGINT, completion_tokens BIGINT) RETURNS DOUBLE
RETURN prompt_tokens * 0.00001D + completion_tokens * 0.00003D""",
}


def register_sql_api(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Install scalar functions and (optionally) fixture-table views."""
    for name, body in FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    if sf_dir:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                spark.read.parquet(path).createOrReplaceTempView(t)
        if os.path.exists(os.path.join(sf_dir, "events.parquet")):
            events_table(spark, sf_dir).createOrReplaceTempView("events")
