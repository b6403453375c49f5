"""Scalar text predicates/helpers mirrored from the reference.

Reference: ``micro-infobot/app.py:73-84`` — a line is a *title* when it
matches ``^[A-Z\\s]+$`` and its length is > 5 (after strip). All are pure
Catalyst column expressions (JVM-side, codegen-friendly); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# app.py:82 — re.match(r'^[A-Z\s]+$', line) and len(line) > 5
TITLE_REGEX = r"^[A-Z\s]+$"


def is_title(line: Column) -> Column:
    """Title predicate over a (raw) line; strips like app.py:81."""
    t = F.trim(line)
    return t.rlike(TITLE_REGEX) & (F.length(t) > 5)


def paragraphs(text: Column) -> Column:
    """``text.split("\\n\\n")`` (app.py:93) as an array column."""
    return F.split(text, r"\n\n")


def lines(text: Column) -> Column:
    """``text.split("\\n")`` (app.py:80) as an array column."""
    return F.split(text, r"\n")
