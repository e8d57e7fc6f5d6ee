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


def _unpartitioned_windows(node, out: list) -> None:
    """Window nodes with an EMPTY partition spec — each one is a
    single-partition stage whose cost is proportional to its input."""
    if node.getClass().getSimpleName() == "Window" and node.partitionSpec().isEmpty():
        out.append(node)
    it = node.children().iterator()
    while it.hasNext():
        _unpartitioned_windows(it.next(), out)


def _scale_leaves_limit_only(node, bounded: bool = False) -> list[str]:
    """Like _unbounded_scale_leaves but ONLY a Limit bounds — Aggregate does
    not.  The window sweep needs this stricter rule: q65's r11 bug was an
    unpartitioned window over a GROUPED aggregate keyed by a
    scale-proportional column (per-suppkey totals grow with SF), which the
    Aggregate-bounds rule would have waved through."""
    if node.getClass().getSimpleName() in {"GlobalLimit", "LocalLimit"}:
        bounded = True
    out: list[str] = []
    tbl = _leaf_table(node)
    if tbl in SCALE_TABLES and not bounded:
        out.append(tbl)
    it = node.children().iterator()
    while it.hasNext():
        out.extend(_scale_leaves_limit_only(it.next(), bounded))
    return out


# Queries adjudicated to legitimately run an unpartitioned window whose
# input reaches a scale table (VERDICT r11 "Adjudicated non-issues"): the
# window runs over an aggregate whose GROUPING DOMAIN is bounded by
# semantics, which the plan cannot express.  Every new entry here needs the
# same adjudication: state why the window's input cardinality is bounded at
# 100 TB, or use the broadcast-scalar pattern (tpch_like q65/q69/q78).
WINDOW_ALLOWLIST = {
    # cumulative mixture share over (lang, source) DOMAIN aggregates — the
    # domain taxonomy is bounded (~languages × source kinds), and a
    # cumulative share genuinely needs one global ordered prefix over it
    "text_domain_mix",
}


@pytest.fixture(scope="module")
def plan_sweep(spark):
    """ONE builder pass over every registered batch query, collecting both
    plan invariants (building every query takes ~2 min; the two sweeps
    share it rather than paying it twice)."""
    from cdc_platform_spark.operators import load_all

    reg = load_all()
    hint_offenders: dict[str, list[str]] = {}
    window_offenders: dict[str, int] = {}
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
                hint_offenders.setdefault(name, []).extend(bad)
        if name not in WINDOW_ALLOWLIST:
            wins: list = []
            _unpartitioned_windows(plan, wins)
            n_bad = sum(1 for w in wins if _scale_leaves_limit_only(w))
            if n_bad:
                window_offenders[name] = n_bad
    return hint_offenders, window_offenders


def test_no_forced_hint_on_scale_proportional_side(plan_sweep):
    offenders = plan_sweep[0]
    assert not offenders, (
        "forced join hints wrap scale-proportional sides (broadcast-abort / "
        f"driver OOM at the 100 TB design point): {offenders}. Remove the "
        "hint and let AQE choose — it still broadcasts while the side fits."
    )


def test_no_unpartitioned_window_over_unbounded_input(plan_sweep):
    """Package-wide single-partition-window sweep (verdict r11: q65 funneled
    the per-supplier aggregate through one task this way).

    An unpartitioned Window is a single-partition stage; that is fine over
    input whose cardinality is bounded by construction (a Limit, a
    fixed-K centroid ordering, a bounded-domain aggregate) and a 100 TB
    scale-killer over anything that grows with the fact tables.  The rule
    is deliberately STRICTER than the hint sweep's: only a Limit bounds —
    an Aggregate does not, because q65's bug was an unpartitioned window
    over per-suppkey totals (cardinality grows with SF) and an
    Aggregate-bounds rule would have accepted it.  Semantically-bounded
    aggregates go on WINDOW_ALLOWLIST with their adjudication instead."""
    offenders = plan_sweep[1]
    assert not offenders, (
        "unpartitioned Window over scale-proportional input (single-partition "
        f"stage at the 100 TB design point): {offenders}. Compute the global "
        "aggregate as a 1-row frame and broadcast it back (q65/q69/q78 "
        "pattern), or partition the window."
    )
