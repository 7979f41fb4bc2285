"""SQL exploration surface: register the materialized KG tables as views.

The engine's outputs are ordinary tables; an analyst's interface to them is
``spark.sql``. ``register_kg_views`` binds every stage table present in a
warehouse to a ``kg_<stage>`` temp view (snapshot-current reads through
TableIO, so bucketed tables keep their co-location metadata) and returns
the registered names — after which the full KG is one query away:

    register_kg_views(spark, "/path/to/wh")
    spark.sql("SELECT subj, count(*) FROM kg_triples GROUP BY subj ...")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.tables import TableIO

STAGE_TABLES = ("mentions", "entities", "edges", "triples", "analytics")


def register_kg_views(
    spark: SparkSession, warehouse: str, prefix: str = "kg_"
) -> list[str]:
    io = TableIO(spark, warehouse)
    registered = []
    for table in STAGE_TABLES:
        if not io.exists(table):
            continue
        name = f"{prefix}{table}"
        io.read(table).createOrReplaceTempView(name)
        registered.append(name)
    if f"{prefix}analytics" in registered:
        # staleness contract (VERDICT r6 item 6): an incremental fold that
        # merged triples marks the analytics tables suspect; surface that
        # to the analyst instead of serving silently stale centrality
        from ..streaming.incremental import analytics_stale_reason

        reason = analytics_stale_reason(warehouse)
        if reason is not None:
            import warnings

            warnings.warn(
                f"view {prefix}analytics may be STALE ({reason}): triples "
                "were folded after the analytics tables were materialized. "
                "Run streaming.incremental.refresh_analytics to re-establish "
                "exact freshness.",
                stacklevel=2,
            )
    return registered
