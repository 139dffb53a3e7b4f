package graft

import org.apache.spark.sql.functions._

/** Scale-cliff probe for the training-data layer: blows the synthetic
  * `documents`/`embeddings` tables up by an integer factor (distributed
  * generation — a crossJoin with a broadcast replica index, never a
  * driver loop) and runs every `td_*` registry query against the scaled
  * copy on the default heap, reporting cold/warm seconds and shuffle
  * volume per query.
  *
  * Replica semantics are chosen to stress the hard paths, not dodge
  * them: even replicas are EXACT text duplicates (exact-dedup groups of
  * scale/2; connected components gets clusters that many× bigger) and
  * odd replicas append a per-replica suffix (near-dup under shingle /
  * minhash / simhash metrics, so LSH bucket sizes and verify-join
  * fan-out grow quadratically with scale). Embedding replicas get a
  * deterministic per-replica perturbation, keeping ANN top-k
  * non-degenerate — and a per-replica LABEL suffix: the label column
  * stands in for the IVF cell id in td_embed_neardup's blocking, and
  * a production IVF re-trains its coarse quantizer as the corpus
  * grows, holding CELL SIZE roughly constant while cell COUNT scales
  * with n. Suffixing labels per replica models exactly that (cells ×
  * scale, size constant); holding labels constant instead would grow
  * each cell 50x and the in-cell pair volume 2500x — a fixture
  * artifact no production index exhibits, not a design property.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.StressSmoke 50" }}}
  */
object StressSmoke {

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(50)
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) args(2)
      else s"${System.getProperty("java.io.tmpdir")}/graft-stress-x$scale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.pinDialect(Tables.localSession("graft-stress", cpus))
    import spark.implicits._

    val docs = Tables.load(spark, src, "documents")
    val nDocs = docs.count()
    val reps = spark.range(scale).toDF("rep")
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("rep") * lit(nDocs)).as("doc_id"),
        when(col("rep") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" r"), col("rep"))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables.load(spark, src, "embeddings")
    val nVecs = emb.count()
    val nLabels = emb.agg(max(col("label"))).head().getInt(0) + 1
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("rep") * lit(nVecs)).as("vec_id"),
        transform(col("embedding"),
          x => x + (col("rep") % 7).cast("float") * lit(0.001f))
          .as("embedding"),
        // numeric so label arithmetic (PQ's label % 10 code) still works
        (col("label") + col("rep").cast("int") * lit(nLabels))
          .cast("int").as("label"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // td_* queries that touch other tables (events for the distinct
    // sketch) read them unscaled from the source dir
    for (name <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      val from = java.nio.file.Paths.get(s"$src/$name.parquet")
      if (java.nio.file.Files.exists(from))
        java.nio.file.Files.copy(from,
          java.nio.file.Paths.get(s"$out/$name.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    // fixture sizes on their own line (RelStress.sweep's JSON carries
    // metric/scale/queries; docs/vecs are td_-specific)
    println(s"""{"metric":"stress_fixture","scale":$scale,""" +
      s""""docs":${nDocs * scale},"vecs":${nVecs * scale}}""")
    // measurement delegates to the shared sweep harness: per-call
    // shuffle listener detached on exit, and the settled-warm
    // discipline (GC + re-measure on any warm > cold, min kept) —
    // this tool predates both and carried its own copy
    RelStress.sweep(spark, out, "td_", "stress_total", scale)
    spark.stop()
  }
}
