package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver testdata layout
  * (`<dir>/<name>.parquet`, see TESTDATA.md).
  *
  * Engine dialect: the reference engine (petl, see SURVEY.md §2.2 P5)
  * swallows per-value conversion errors and yields null. Spark 4 defaults
  * to ANSI mode (cast/parse errors throw), so the engine pins the
  * permissive dialect at query-build time — every query built through
  * [[Tables.load]] runs with `spark.sql.ansi.enabled=false`, matching the
  * reference's error-as-null semantics without requiring callers to own
  * the session config.
  */
object Tables {

  /** Runtime session confs the engine requires regardless of who built
    * the SparkSession (the driver's Verify/Bench mains build their own).
    */
  def pinDialect(spark: SparkSession): SparkSession = {
    graft.functions.GraftFunctions.register(spark)
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RewriteRankingFilterToTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.RewriteRankingFilterToTopK
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Wide-string rows make the columnar cache's per-batch column
    // builders the peak-memory driver: at the default 10000 rows/batch,
    // a ~1.5 KB serialized-row column allocates 15 MB+ per builder with
    // doubling growth, and every core builds concurrently — measured
    // OOM on an 8 g heap caching a 20M-row beacon base. 1000-row
    // batches bound builder memory ~10× for a marginal compression cost.
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "1000")
    // the reference's calls CSV is windows-1252 (prepare_calls.py:32-34);
    // Spark 4 gates non-builtin charsets behind this legacy flag
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    // Some testdata vintages carry TIMESTAMP(NANOS), which Spark's µs
    // timestamps cannot represent; with this flag such columns surface as
    // raw LongType nanos (harmless for µs files) and [[normalizeTs]]
    // converts them. Other vintages are plain timestamp[us] — a 100 TB
    // lake has mixed writers and mixed file vintages, so the loader
    // adapts to whatever physical encoding the footer declares instead
    // of hard-coding one.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Normalize the `ts` column to session-UTC [[TimestampType]] regardless
    * of the file's physical encoding:
    *   - `LongType` (TIMESTAMP(NANOS) read via `nanosAsLong`) → truncate
    *     nanos→µs, identical to DuckDB's read of the same file;
    *   - `TimestampNTZType` (timestamp[us], isAdjustedToUTC=false) → cast
    *     to TimestampType; with the session timezone pinned to UTC this
    *     lands on the same instant DuckDB reads;
    *   - `TimestampType` → pass through.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!df.schema.fieldNames.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    pinDialect(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Streaming read of the same table: the file source needs an explicit
    * schema, taken from the parquet footer (one driver-side metadata
    * read), with the identical nanos→µs dialect as [[load]] so streaming
    * and batch plans see the same rows. At scale the path is a growing
    * directory of part files; here it is the driver's single file.
    */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    pinDialect(spark)
    val path = s"$dir/$name.parquet"
    // The driver testdata is one FILE per table. FileStreamSource injects
    // `basePath = <path>` for any NON-glob path (overriding an explicit
    // basePath option), and PartitioningAwareFileIndex rejects a file as
    // basePath — so stream a true glob, which skips the injection. A
    // directory of part files (the scale layout) also works through the
    // same glob.
    val df = spark.readStream
      .schema(spark.read.parquet(path).schema)
      .parquet(s"$dir/{$name.parquet}")
    if (name == "events") normalizeTs(df) else df
  }

  /** Local session factory for tests / CLI. local[*] with shuffle
    * partitions sized for one machine; AQE on (it is the scale path's
    * runtime re-planner — skew joins, dynamic coalescing).
    */
  def localSession(appName: String, cores: String = "*"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-" +
          ProcessHandle.current().pid())
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
