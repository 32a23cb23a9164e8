"""SparkSession factory and testdata catalog helpers.

Mirrors the reference's conf assembly (``setSparkIcebergConf`` at
/root/reference/src/main/python/spark_sql_merge_into_iceberg.py:51-63)
with open-source substitutions:

- Glue catalog + DynamoDB lock  -> local hadoop-type Iceberg catalog
  (single-writer, so no lock manager), gated behind jar availability.
- ``handle-timestamp-without-timezone`` flag -> pin session TZ to UTC.
- AQE on (off by default in the reference's Spark 3.1 / Glue 3.0 era).

Scale notes (100 TB): shuffle partitions default to the local core count
here, but ``build_session`` accepts overrides — on a 1000-executor
cluster you'd set ``spark.sql.shuffle.partitions`` to 2-3x total cores
and rely on AQE coalescing; nothing else in this module is local-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables materialized by the test harness (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _iceberg_jar_available() -> bool:
    """True when an iceberg-spark-runtime jar can be found on the classpath.

    The test image ships no Iceberg jar, so the lake layer falls back to
    the manual parquet merge (see ``lake.table``). Kept as a function so a
    real deployment with the jar gets Iceberg MERGE for free.
    """
    cp = os.environ.get("SPARK_CLASSPATH", "") + os.pathsep + os.environ.get("CLASSPATH", "")
    return "iceberg-spark-runtime" in cp


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Functions passed to pandas UDFs / applyInPandasWithState are
    cloudpickled BY REFERENCE (module path), so workers must be able to
    import the package. When the engine is used from a source checkout
    (sys.path manipulation, no pip install), workers can't — so zip the
    package once and addPyFile it. Idempotent per session.

    The zip is CONTENT-ADDRESSED and written atomically (r9): the old
    fixed ``/tmp/<pkg>.zip`` path was shared by every process on the
    box, so two concurrent sessions (the cross-process soaks spawn
    3-4) raced on the rewrite and an executor fetch could see a file
    that "exists and does not match contents" — the real root of the
    r8 'load-sensitive' soak flake. A hash-named immutable file makes
    concurrent identical builders converge and concurrent different
    builders (e.g. a source edit mid-run) never clash.
    """
    import hashlib
    import io
    import tempfile
    import zipfile

    sc = spark.sparkContext
    marker = "_tx_datalake_pkg_shipped"
    if getattr(sc, marker, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            _dirs.sort()  # deterministic walk -> deterministic digest
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    # pin the archive mtime so identical sources zip to
                    # identical bytes regardless of checkout times
                    info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
                    with open(full, "rb") as fh:
                        zf.writestr(info, fh.read())
    data = buf.getvalue()
    digest = hashlib.sha256(data).hexdigest()[:16]
    zpath = os.path.join(tempfile.gettempdir(),
                         f"{pkg_name}-{digest}.zip")
    if not os.path.exists(zpath):
        tmp = f"{zpath}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, zpath)  # atomic: readers see whole files only
    sc.addPyFile(zpath)
    setattr(sc, marker, True)


def build_session(
    app_name: str = "tx-datalake-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    enable_iceberg: bool | None = None,
    warehouse: str | None = None,
) -> SparkSession:
    """Create (or get) the engine SparkSession.

    Parameters mirror what the reference passes as Glue job args
    (spark_sql_merge_into_iceberg.py:26-49) minus the AWS-proprietary
    ones; all tuning is explicit conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~cores. Cluster mode callers should override upward.
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # dynamic mode: INSERT OVERWRITE rewrites only partitions present in
        # the incoming frame — the parquet-merge analogue of Iceberg's
        # partition-scoped copy-on-write (reference MERGE at :118-136).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # events.parquet stores ns-precision timestamps (FIXTURES.md);
        # Spark's reader rejects TIMESTAMP(NANOS) unless read as long.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write timestamps as annotated INT64 micros, not legacy INT96:
        # INT96 columns carry no parquet min/max statistics, which would
        # blind the lake manifest's scan planning (lake/scan.py) to
        # every timestamp predicate.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # plan-text metadata (PushedFilters / ReadSchema lines) truncates
        # at 100 chars by default, hiding pushed filters from the plan
        # introspection helpers (plans/explain.py) and from humans
        # debugging with .explain("formatted")
        .config("spark.sql.maxMetadataStringLength", "2000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )

    if enable_iceberg is None:
        enable_iceberg = _iceberg_jar_available()
    if enable_iceberg:
        wh = warehouse or os.path.join(os.getcwd(), ".warehouse")
        b = (
            b.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.lake.type", "hadoop")
            .config("spark.sql.catalog.lake.warehouse", wh)
        )

    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)

    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_package_shipped(spark)
    return spark


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one harness table; Catalyst handles pushdown/pruning.

    ``events.ts`` is ns-precision in the parquet file; with
    ``nanosAsLong`` it arrives as a long which we truncate to µs
    TimestampType (matching DuckDB's ``ts::TIMESTAMP`` truncation so
    oracle comparisons line up — SURVEY §7 hard-part 4).
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer div: float division would lose precision at ns epoch scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def rebalance(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Spread a poorly-split scan across the cluster before CPU-heavy
    narrow work.

    The harness parquet files are single-row-group, so Spark plans ONE
    scan task no matter how many cores exist; per-row string/array math
    then runs serially. A round-robin repartition to the default
    parallelism fixes that for a negligible shuffle of the small input.
    On a real multi-split 100 TB table the scan already has >= cores
    partitions and this is a no-op, so the helper is scale-safe.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_testdata_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every harness table as a temp view (the read-side catalog,
    replacing the reference's Athena/Glue-catalog query path,
    README.md:507-513)."""
    for name in TESTDATA_TABLES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
