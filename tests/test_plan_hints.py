"""Package-wide join-hint sweep.

A forced ``F.broadcast`` overrides AQE's size estimate.  That is safe only
when the hinted side is bounded by construction — a fixed-cardinality
dimension (nation/region: 25/5 rows at every TPC-H scale factor), a
literal/local relation, or the output of an aggregate/limit whose result
size does not grow with the fact tables.  A hint on a side *derived from* a
scale-proportional table (a filtered slice of part/supplier/customer, a
projected lineitem, ...) is a 100 TB scale-killer: correct and fast at
sf0.1, broadcast-abort or driver OOM at the design point.

This sweep walks the analyzed logical plan of EVERY registered batch query
and asserts that no ResolvedHint subtree reaches a scan of a
scale-proportional table without first passing through a bounding node
(Aggregate or Limit).  Grouped aggregates are accepted as bounding because
every hinted grouped aggregate in this package groups by a
bounded-domain key (quantity band, (lang, source) domain, k-means cell id,
shuffle-partition id) — a new hint on a grouped aggregate keyed by a
scale-proportional column (e.g. per-partkey stats) is exactly the bug this
test exists to catch early, so keep that list true when adding hints.

Mirrors tests/test_dedup_index.py::test_curated_suppression_join_carries_no_broadcast_hint,
which pins the same invariant for the streaming curation funnel.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

# Tables whose row count grows linearly with the scale factor.  nation and
# region are fixed-size at every SF and may always be hinted.
SCALE_TABLES = {
    "part",
    "supplier",
    "customer",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
}

# Logical nodes whose output cardinality is bounded regardless of input
# size (see module docstring for the grouped-Aggregate caveat).
BOUNDING_NODES = {"Aggregate", "GlobalLimit", "LocalLimit"}


def _leaf_table(node) -> str | None:
    """Name of the parquet table a LogicalRelation leaf scans, else None."""
    if node.getClass().getSimpleName() != "LogicalRelation":
        return None
    try:
        path = node.relation().location().rootPaths().head().toString()
    except Exception:
        return None
    base = path.rstrip("/").rsplit("/", 1)[-1]
    return base.removesuffix(".parquet")


def _collect_hints(node, out: list) -> None:
    if node.getClass().getSimpleName() == "ResolvedHint":
        out.append(node)
    it = node.children().iterator()
    while it.hasNext():
        _collect_hints(it.next(), out)


def _unbounded_scale_leaves(node, bounded: bool = False) -> list[str]:
    """Scale-proportional leaf scans reachable without crossing a bounding node."""
    if node.getClass().getSimpleName() in BOUNDING_NODES:
        bounded = True
    out: list[str] = []
    tbl = _leaf_table(node)
    if tbl in SCALE_TABLES and not bounded:
        out.append(tbl)
    it = node.children().iterator()
    while it.hasNext():
        out.extend(_unbounded_scale_leaves(it.next(), bounded))
    return out


@pytest.mark.parametrize("category_filter", ["batch"])
def test_no_forced_hint_on_scale_proportional_side(spark, category_filter):
    from cdc_platform_spark.operators import load_all

    reg = load_all()
    offenders: dict[str, list[str]] = {}
    for name in sorted(reg):
        q = reg[name]
        if q.category == "streaming":
            # streaming builders execute a real stream on build; their
            # maintained-state hint invariants are pinned per-sink
            # (test_dedup_index.py, test_ann_index.py).
            continue
        df = q.builder(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().analyzed()
        hints: list = []
        _collect_hints(plan, hints)
        for hint in hints:
            bad = _unbounded_scale_leaves(hint)
            if bad:
                offenders.setdefault(name, []).extend(bad)
    assert not offenders, (
        "forced join hints wrap scale-proportional sides (broadcast-abort / "
        f"driver OOM at the 100 TB design point): {offenders}. Remove the "
        "hint and let AQE choose — it still broadcasts while the side fits."
    )
