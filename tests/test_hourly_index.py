"""BucketedHourlyStatsSink: exact (event_type, hour) aggregates under CDC.

The design contract under test (streaming/hourly_index.py module
docstring): aggregates are RECOMPUTED per touched group from an exact
per-group event log, with the per-event index committing LAST so every
crash window between store commits replays to the identical computation.
The tests cover the retractions the additive BucketedAggregatingSink form
cannot express — an update MOVING an event across hours or across event
types (both groups recomputed), a delete removing its contribution, a
group vanishing entirely — plus each crash boundary, out-of-order
redelivery, flat-vs-bucketed equivalence, and compaction.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_platform_spark.streaming.hourly_index import (
    HOUR_US,
    BucketedHourlyStatsSink,
    hour_bucket,
    hourly_aggregate,
)
from cdc_platform_spark.streaming.pipeline import StateInFlightError

_BATCH_SCHEMA = (
    "event_id long, offset long, op string, event_type string, t_us long, "
    "value double"
)

MIN = 60 * 1_000_000  # one minute in µs


def _expected(spark, events):
    """From-scratch batch computation (the w_gapfill_locf hourly algebra)
    over the live event set — the oracle every end state must equal.
    ``events``: (event_id, event_type, t_us, value) tuples."""
    d = (
        spark.createDataFrame(
            events, "event_id long, event_type string, t_us long, value double"
        )
        .select(
            "event_type",
            hour_bucket(F.col("t_us")).alias("hour_s"),
            F.col("value").cast("decimal(18,2)").alias("value"),
        )
    )
    return {
        (r["event_type"], r["hour_s"]): (r["n_events"], float(r["value_sum"]))
        for r in hourly_aggregate(d).collect()
    }


def _got(spark, sink):
    return {
        (r["event_type"], r["hour_s"]): (r["n"], r["v"])
        for r in sink.hourly_stats(spark).collect()
    }


def _b(spark, rows):
    return spark.createDataFrame(rows, _BATCH_SCHEMA)


# type a: two events in hour 0, one in hour 2; type b: one in hour 0
WAVE1 = [
    (10, 10, "c", "a", 10 * MIN, 1.0),
    (11, 11, "c", "a", 50 * MIN, 2.0),
    (12, 12, "c", "a", 125 * MIN, 4.0),
    (20, 20, "c", "b", 30 * MIN, 8.0),
]
LIVE1 = [(10, "a", 10 * MIN, 1.0), (11, "a", 50 * MIN, 2.0),
         (12, "a", 125 * MIN, 4.0), (20, "b", 30 * MIN, 8.0)]

# wave 2: delete one hour-0 'a' event (retraction), MOVE the hour-2 'a'
# event to hour 1 (old group must vanish via dead marker), RECLASSIFY
# the 'b' event to 'a' (group 'b' vanishes entirely), insert a new 'b'
# event in hour 3
WAVE2 = [
    (11, 100, "d", None, None, None),
    (12, 101, "u", "a", 65 * MIN, 4.0),
    (20, 102, "u", "a", 30 * MIN, 8.0),
    (21, 103, "c", "b", 185 * MIN, 16.0),
]
LIVE2 = [(10, "a", 10 * MIN, 1.0), (12, "a", 65 * MIN, 4.0),
         (20, "a", 30 * MIN, 8.0), (21, "b", 185 * MIN, 16.0)]


def test_retraction_and_group_moves(spark, tmp_path):
    sink = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    got = _got(spark, sink)
    assert got == _expected(spark, LIVE1)
    assert got[("a", 0)] == (2, 3.0) and got[("a", 7200)] == (1, 4.0)
    assert got[("b", 0)] == (1, 8.0)

    sink.write(_b(spark, WAVE2))
    got = _got(spark, sink)
    assert got == _expected(spark, LIVE2)
    # the delete retracted from (a, 0); the reclassify added there
    assert got[("a", 0)] == (2, 9.0)
    # the hour move: old group gone, new group present
    assert ("a", 7200) not in got and got[("a", 3600)] == (1, 4.0)
    # 'b' hour 0 vanished entirely; the new 'b' insert landed in hour 3
    assert ("b", 0) not in got and got[("b", 10800)] == (1, 16.0)


def test_flat_vs_bucketed_equivalence(spark, tmp_path):
    """The incrementally maintained view must equal the flat full
    recompute from the per-event index after EVERY batch."""
    sink = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4)
    for wave in (WAVE1, WAVE2, [(10, 300, "u", "b", 200 * MIN, 1.0)]):
        sink.write(_b(spark, wave))
        flat = {
            (r["event_type"], r["hour_s"]): (r["n"], r["v"])
            for r in sink.hourly_from_scratch(spark).collect()
        }
        assert _got(spark, sink) == flat


def test_replay_idempotence(spark, tmp_path):
    sink = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    sink.write(_b(spark, WAVE2))
    before = _got(spark, sink)
    sink.write(_b(spark, WAVE2))  # full redelivery of the last batch
    assert _got(spark, sink) == before


@pytest.mark.parametrize("fail_store", ["hourly", "index"])
def test_crash_between_store_commits_replays_exact(spark, tmp_path, fail_store):
    """Kill the batch after the group_events commit (fail_store='hourly')
    or after group_events+hourly ('index'), then replay — the
    commit-order argument says the replayed batch recomputes the
    identical state because the pre-merge index survives until LAST."""
    sink = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4)
    sink.write(_b(spark, WAVE1))

    target = sink.hourly if fail_store == "hourly" else sink.index
    meth = "write_buckets" if fail_store == "hourly" else "write"
    real = getattr(target, meth)

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    setattr(target, meth, boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        sink.write(_b(spark, WAVE2))
    setattr(target, meth, real)

    ro = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4, read_only=True)
    with pytest.raises(StateInFlightError):
        ro.hourly_stats(spark)

    sink.write(_b(spark, WAVE2))  # checkpoint replay of the same batch
    assert _got(spark, sink) == _expected(spark, LIVE2)
    assert _got(spark, ro) == _expected(spark, LIVE2)


def test_out_of_order_redelivery_cannot_regress(spark, tmp_path):
    sink = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    sink.write(_b(spark, [(12, 200, "u", "b", 250 * MIN, 4.0)]))
    before = _got(spark, sink)
    sink.write(_b(spark, [(12, 12, "c", "a", 125 * MIN, 4.0)]))  # stale version
    assert _got(spark, sink) == before


def test_delete_only_first_batch(spark, tmp_path):
    """A delete for a never-seen event on a fresh sink must be a clean
    no-op state (no store wreckage, empty serve view)."""
    sink = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4)
    sink.write(_b(spark, [(99, 1, "d", None, None, None)]))
    assert _got(spark, sink) == {}
    sink.write(_b(spark, WAVE1))
    assert _got(spark, sink) == _expected(spark, LIVE1)


def test_hour_boundary_exact(spark, tmp_path):
    """Events one µs either side of an hour boundary land in different
    buckets — the floor-division rule of w_gapfill_locf."""
    sink = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4)
    sink.write(
        _b(
            spark,
            [
                (1, 1, "c", "a", HOUR_US - 1, 1.0),
                (2, 2, "c", "a", HOUR_US, 2.0),
            ],
        )
    )
    got = _got(spark, sink)
    assert got[("a", 0)] == (1, 1.0) and got[("a", 3600)] == (1, 2.0)


def test_compact_drops_dead_weight_not_state(spark, tmp_path):
    sink = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    sink.write(_b(spark, WAVE2))
    assert sink.state_stats(spark)["group_events"]["tombstones"] > 0
    before = _got(spark, sink)
    sink.compact(spark, tombstone_horizon=10**9)
    after = sink.state_stats(spark)
    assert after["group_events"]["tombstones"] == 0
    assert after["hourly"]["tombstones"] == 0
    assert after["index"]["tombstones"] == 0  # 'd' rows GC'd below horizon
    assert not os.path.exists(sink._stores_marker)
    assert _got(spark, sink) == before


def test_read_only_refuses_writes_and_compact(spark, tmp_path):
    sink = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4)
    sink.write(_b(spark, WAVE1))
    ro = BucketedHourlyStatsSink(str(tmp_path / "hr"), n_buckets=4, read_only=True)
    with pytest.raises(RuntimeError, match="read_only"):
        ro.write(_b(spark, WAVE2))
    # compact refuses BEFORE touching the marker (ADVICE r13) — no
    # stranded cross-store marker blocking subsequent serves
    with pytest.raises(RuntimeError, match="read_only"):
        ro.compact(spark)
    assert not os.path.exists(sink._stores_marker)
    ro2 = BucketedHourlyStatsSink(str(tmp_path / "nope"), n_buckets=4, read_only=True)
    assert ro2.hourly_stats(spark).count() == 0
    assert not os.path.exists(str(tmp_path / "nope"))


def test_no_forced_broadcast_hints_in_sink_source():
    """Same contract as the span/session/neighbor sinks (verdict
    r12/r13): touched-set joins carry no forced broadcast — AQE decides,
    so a giant availableNow first wave cannot push a corpus-sized
    broadcast."""
    import cdc_platform_spark.streaming.hourly_index as m

    src = open(m.__file__).read()
    assert "F.broadcast" not in src


# --- property-based tier (hypothesis): ANY CDC sequence converges ---------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# (event_id small domain so updates/deletes really collide, two event
# types so reclassification collides groups, t_us on a 30-minute lattice
# spanning 0..6h so hour-boundary moves happen constantly, integer values
# so decimal and float sums agree exactly)
hourly_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),              # event_id
        st.sampled_from(["c", "u", "d"]),
        st.sampled_from(["a", "b"]),    # event_type
        st.integers(0, 12),             # t = k * 30 min
        st.integers(0, 100),            # value
    ),
    min_size=1,
    max_size=24,
).map(
    lambda rows: [
        (off, eid, op, et, t * 30 * MIN, float(val))
        for off, (eid, op, et, t, val) in enumerate(rows)
    ]
)


def oracle_hourly(events):
    """Single-delivery pure-Python oracle: latest per event_id, drop
    deletes, count/sum per (event_type, floor-hour)."""
    latest: dict[int, tuple] = {}
    for off, eid, op, et, t, v in events:
        if eid not in latest or off > latest[eid][0]:
            latest[eid] = (off, op, et, t, v)
    out: dict[tuple[str, int], tuple[int, float]] = {}
    for off, op, et, t, v in latest.values():
        if op != "d":
            key = (et, (t // HOUR_US) * 3600)
            n, s = out.get(key, (0, 0.0))
            out[key] = (n + 1, s + v)
    return out


@given(
    events=hourly_events_strategy,
    split_seed=st.integers(0, 2**16),
    n_batches=st.integers(1, 4),
    shuffle_batches=st.booleans(),
    replay_suffix=st.booleans(),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_hourly_view_converges_under_any_batching(
    spark, tmp_path_factory, events, split_seed, n_batches, shuffle_batches, replay_suffix
):
    """The maintained hourly view must equal the single-delivery oracle
    under ANY partition of the CDC log into micro-batches, ANY batch
    ordering, and ANY replay duplication — the same at-least-once
    contract the session-sink property test pins, on the (event_type,
    hour) group key."""
    import random

    rng = random.Random(split_seed)
    batches: list[list] = [[] for _ in range(n_batches)]
    for ev in events:
        batches[rng.randrange(n_batches)].append(ev)
    if replay_suffix and events:
        batches[rng.randrange(n_batches)].extend(events[-max(1, len(events) // 3):])
    if shuffle_batches:
        rng.shuffle(batches)

    sink = BucketedHourlyStatsSink(
        str(tmp_path_factory.mktemp("hrprop") / "state"), n_buckets=4
    )
    for batch in batches:
        if batch:
            sink.write(
                spark.createDataFrame(
                    [(eid, off, op, et, t, v) for off, eid, op, et, t, v in batch],
                    _BATCH_SCHEMA,
                )
            )

    assert _got(spark, sink) == oracle_hourly(events)


def test_hourly_stats_cli(spark, tmp_path, capsys):
    """`cdc-spark hourly-stats`: the serve verb over a maintained hourly
    index — read-only, (event_type, hour) order, --event-type filter,
    --gapfill dense-grid LOCF projection, retriable exit 2 while a
    writer batch is mid-commit."""
    import json

    from cdc_platform_spark.cli import main

    root = str(tmp_path / "hr")
    sink = BucketedHourlyStatsSink(root, n_buckets=4)
    sink.write(_b(spark, WAVE1))

    rc = main(["hourly-stats", root, "--n-buckets", "4", "--limit", "20"])
    assert rc == 0
    out = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert out and {"event_type", "hour_s", "n", "v"} <= set(out[0])
    keys = [(r["event_type"], r["hour_s"]) for r in out]
    assert keys == sorted(keys)

    # --gapfill: the dense grid appears — 'a' has live hours 0 and 2, so
    # the gap hour 3600 is served with n=0 and the LOCF value carried
    rc = main(["hourly-stats", root, "--n-buckets", "4", "--gapfill",
               "--event-type", "a"])
    assert rc == 0
    rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    by_hour = {r["hour_s"]: r for r in rows}
    assert by_hour[3600]["n"] == 0 and by_hour[3600]["v_locf"] == 3.0
    assert by_hour[7200]["n"] == 1

    # wrong path -> clear error, not an empty serve
    assert main(["hourly-stats", str(tmp_path / "nope")]) == 1
    capsys.readouterr()

    # mid-batch marker -> retriable exit 2
    with open(sink._stores_marker, "w") as fh:
        fh.write("x")
    assert main(["hourly-stats", root, "--n-buckets", "4"]) == 2
    assert "retriable" in capsys.readouterr().err
    os.remove(sink._stores_marker)
