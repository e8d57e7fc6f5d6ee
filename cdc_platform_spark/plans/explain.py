"""Plan inspection helpers used by tests and the performance workflow."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """Formatted explain, following the ``_plan_child`` seam that
    ``functions.sorted_view`` attaches: a checkpointed tail explains as only
    ``Scan ExistingRDD``, so the pre-checkpoint subtree is appended as its
    own section.  NOTE (ADVICE r14): sections are concatenated — treat any
    assertion over this text as membership-only; occurrence counts can
    double across sections."""
    out = []
    seen = 0
    while df is not None and seen < 8:  # seam chains are short; bound anyway
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        if seen:
            out.append(f"\n== Pre-checkpoint subtree (depth {seen}) ==\n")
        out.append(buf.getvalue())
        df = getattr(df, "_plan_child", None)
        seen += 1
    return "".join(out)


def plan_contains(df: DataFrame, fragment: str) -> bool:
    return fragment in explain_text(df)
