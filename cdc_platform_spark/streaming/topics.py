"""Per-source CDC topic naming (reference D1/P2: streaming/topics.py:21-60).

Debezium embeds the database identity differently per connector, so the
topic for a captured relation depends on the source type:

- postgres  ``<prefix>.<schema>.<table>``            (3-part)
- mysql     ``<prefix>.<db>.<table>``                (3-part; the
  qualified name's first segment is the database)
- mongodb   ``<prefix>.<db>.<collection>``           (3-part)
- sqlserver ``<prefix>.<database>.<schema>.<table>`` (4-part; Debezium
  2.x prepends ``database.names`` before schema+table)

DLQ topics append a suffix to the source topic. These are pure
functions; the router sink and lakehouse auto-create (D1) consume their
output, so naming is decided in exactly one place.
"""

from __future__ import annotations

SOURCE_TYPES = ("postgres", "mysql", "mongodb", "sqlserver")


def _split_qualified(qualified_name: str) -> tuple[str, str]:
    parts = qualified_name.split(".")
    if len(parts) != 2 or not all(parts):
        raise ValueError(
            f"qualified name must be '<namespace>.<name>', got {qualified_name!r}"
        )
    return parts[0], parts[1]


def cdc_topic(
    prefix: str,
    qualified_name: str,
    source_type: str = "postgres",
    database: str | None = None,
) -> str:
    """Topic for one captured relation.

    ``qualified_name`` is ``schema.table`` (postgres/sqlserver),
    ``db.table`` (mysql) or ``db.collection`` (mongodb). SQL Server
    additionally requires ``database`` for its 4-part name.
    """
    if source_type not in SOURCE_TYPES:
        raise ValueError(f"unknown source type {source_type!r}; one of {SOURCE_TYPES}")
    namespace, name = _split_qualified(qualified_name)
    if source_type == "sqlserver":
        if not database:
            raise ValueError("sqlserver topic naming requires the database name")
        return f"{prefix}.{database}.{namespace}.{name}"
    return f"{prefix}.{namespace}.{name}"


def dlq_topic(source_topic: str, suffix: str = "dlq") -> str:
    """DLQ topic for a source topic: ``<source_topic>.<suffix>``."""
    return f"{source_topic}.{suffix}"


def pipeline_topics(
    prefix: str,
    qualified_names: list[str],
    source_type: str = "postgres",
    database: str | None = None,
    dlq_enabled: bool = True,
    dlq_suffix: str = "dlq",
) -> list[str]:
    """All CDC (+ DLQ) topics a pipeline will produce, in capture order —
    the provisioning list (D1) a deployment pre-creates."""
    out: list[str] = []
    for qn in qualified_names:
        t = cdc_topic(prefix, qn, source_type=source_type, database=database)
        out.append(t)
        if dlq_enabled:
            out.append(dlq_topic(t, dlq_suffix))
    return out
