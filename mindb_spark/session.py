"""SparkSession helpers: tuned builder + executor-side package shipping."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Make ``mindb_spark`` importable on executor Python workers.

    UDF closures reference this package by module path; unless the package
    is pip-installed (or the driver's cwd is the repo root), executors can't
    import it. Zipping the package once per session and ``addPyFile``-ing it
    covers every deployment, including ``spark-submit`` from anywhere.
    Idempotent and cheap (the package is a few hundred KB).
    """
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zip_path = tempfile.mkstemp(suffix=".zip", prefix="mindb_spark_")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join("mindb_spark", os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)


def widen(df, min_partitions: int | None = None):
    """Repartition up to driver parallelism IF the plan is under-partitioned.

    CPU-heavy per-row pipelines (shingling, hashing, decode UDFs) inherit
    the scan's split count; a small single-row-group file scans as ONE task
    and serializes the work. At cluster scale the scan is already wide and
    this is a no-op — the partition-count probe is plan metadata, no job
    runs. The repartition shuffles only the narrow projected input, which
    is exactly the case where the 32x CPU win dwarfs the shuffle.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _scaled_mem(mem: str, frac: float) -> str:
    """Scale a JVM memory string ("48g", "512m") by ``frac``, in MiB."""
    units = {"k": 1 / 1024, "m": 1, "g": 1024, "t": 1024 * 1024}
    s = mem.strip().lower()
    if s and s[-1] in units:
        mib = float(s[:-1]) * units[s[-1]]
    else:
        mib = float(s) / (1 << 20)  # bare bytes
    return f"{max(1, int(mib * frac))}m"


def get_spark(
    app_name: str = "mindb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Opinionated session builder: AQE + Arrow on, sane shuffle width.

    ``master``/partitions default from ``SPARK_GRAFT_CPUS`` (test harness
    convention) or fall back to all local cores.
    """
    # Executor-side numpy must not spawn its own BLAS thread pools: N
    # concurrent Python workers x N OpenBLAS threads oversubscribes the
    # box into scheduler thrash (measured ~90% kernel time in a 32-task
    # encode at k=35k — each worker's chunked GEMM tried to fan out over
    # every core). Spark supplies the parallelism; BLAS gets one thread
    # per worker. Set BEFORE the JVM launches so pyspark.daemon workers
    # inherit it; driver-side heavy fits pin/restore explicitly
    # (pq._single_threaded_blas) and are unaffected by this default.
    for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(_var, "1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = master or (f"local[{cpus}]" if cpus else "local[*]")
    parts = shuffle_partitions or int(cpus or os.cpu_count() or 8)
    # local-mode driver == executor: the default 1g heap OOMs with 32 task
    # threads; only effective for the first session in the process (the JVM
    # is sized at launch), which is every real entry point here.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        # whole-stage codegen emits one JIT-compiled class per distinct
        # plan; a long session (61 bench queries + side probes) overflows
        # the JVM's default 240m code cache, after which the JIT disables
        # itself and late queries run interpreted (measured: the MinHash
        # x8 probe degraded 5.4s -> 30-80s late in the bench session, data
        # size independent). 1g keeps every compiled stage hot. Only
        # effective for the first session in the process (JVM-launch flag),
        # which is every real entry point here.
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        # the resident serving snapshot is BY DESIGN a driver-side Arrow
        # collect of the whole covering index (budget-gated in bytes by
        # its caller) — at 3M x 768 that is a legitimate ~17 GiB result,
        # which the old 8g cap aborted mid-assemble. Arrow collects
        # stream batches to Python, so peak JVM retention stays well
        # under the accounted total — but the cap also guards ordinary
        # Row-based collects, where a runaway result OOMs the driver JVM
        # unrecoverably instead of raising a catchable SparkException.
        # 75% of the heap admits every legitimate Arrow assemble while
        # keeping that abort guard meaningful (round-8 ADVICE).
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", _scaled_mem(driver_mem, 0.75)),
        )
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # CPU-heavy text/hash pipelines shuffle few bytes (lz4 compresses
        # word text ~10x); the default 1m floor would coalesce them to 1-2
        # tasks and serialize the regex/md5 work. 16k keeps parallelism.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # default 10k-row Arrow batches fragment the vectorized ADC/encode
        # kernels (per-call setup amortizes over the batch). The setting is
        # SESSION-WIDE, so it must also be safe for kernels that carry
        # full-precision vectors (rerank, knn, encode): 16k rows x 1536-d
        # float64 is ~0.2 GB per task — bounded at wide embedding widths,
        # while still 1.6x the old default for the narrow codes scans
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
