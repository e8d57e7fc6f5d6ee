"""Plan inspection helpers used by tests and the performance workflow."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_contains(df: DataFrame, fragment: str) -> bool:
    return fragment in explain_text(df)
