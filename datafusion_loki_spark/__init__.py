"""datafusion_loki_spark — a PySpark-native analytics engine with the
capabilities of ``systemxlabs/datafusion-loki``.

The reference is a DataFusion TableProvider for Grafana Loki
(``/root/reference/datafusion-loki/src/table.rs``). Here the host engine is
Spark SQL/Catalyst; the connector is a Python Data Source (format ``"loki"``)
with an expression→LogQL pushdown translator; plan distribution is Spark's
native task serialization (the reference's protobuf codec, ``src/codec.rs``,
has no Spark analogue because the framework ships plans itself).

Beyond the reference's surface the package provides an LLM-data-pipeline
operator library (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.
"""

from __future__ import annotations

__version__ = "0.1.0"


def register_loki(spark) -> None:
    """Register the ``loki`` data source format on a SparkSession.

    Mirrors the reference's ``SessionContext::register_table`` step
    (reference: datafusion-loki/examples/datafusion.rs:10-11).
    """
    from datafusion_loki_spark.sources.loki import LokiDataSource

    # Required for pushFilters to be consulted (off by default in Spark 4.1).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LokiDataSource)


def register_loki_endpoint(
    spark, name: str, endpoint: str, default_label: str | None = None, **options: str
) -> None:
    """Register an endpoint-BOUND loki format, enabling the full SQL
    surface: ``CREATE TABLE logs USING <name>`` then ``INSERT INTO logs
    VALUES (current_timestamp(), map('app','x'), 'line')`` and ``SELECT ...
    WHERE labels['app']='x'`` — the reference's SQL entry points
    (examples/datafusion.rs:10-32, integration-tests/testdata/init.sql).

    Needed because pyspark 4.1 does not forward CREATE TABLE OPTIONS to
    Python data sources; the connection options live on the registered
    class instead, and cloudpickle carries them to executors."""
    from datafusion_loki_spark.sources.loki import LokiDataSource

    defaults = {"endpoint": endpoint, **options}
    if default_label is not None:
        defaults["default_label"] = default_label
    bound = type(
        f"LokiDataSource_{name}",
        (LokiDataSource,),
        {"_default_options": defaults, "name": classmethod(lambda cls: name)},
    )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(bound)
