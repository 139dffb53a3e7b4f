package graft.tools

import graft.{BenchConfs, SparkEntry, Tables}
import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The closed drift→retrain loop (VERDICT r15 #5): the end-to-end story
  * the three round-15 pieces exist for — the streaming drift MONITOR
  * (st_embedding_drift) detects that arriving vectors no longer match
  * the corpus, that signal GATES a quantizer retrain (the ivf.train
  * lever), and the retrained index RECOVERS serving recall on the
  * shifted data.
  *
  * Fixture: a TWO-EPOCH derivative of the clustered AnnQualityAb
  * embeddings. Existing vectors (vec_id % 5 ≠ 4) cluster around
  * epoch-A per-label unit directions; arriving vectors (vec_id % 5 = 4)
  * around epoch-B directions (a different hash-seed prime — in 64-d
  * the two epochs' directions are near-orthogonal, the hard
  * distribution shift). Both epochs use the same noise scale, so the
  * ONLY difference the monitor can see is the direction shift.
  *
  * Measured legs, every one a JSON line:
  *   1. `st_embedding_drift` over the fixture — per-label
  *      mean-cosine drift of arrivals vs the corpus centroids. A
  *      drift << 0 on every label is the retrain trigger.
  *   2. Serving recall on the GROWN corpus (existing ∪ arrivals, the
  *      post-admission state) for arrival-batch queries, same Lloyd-2
  *      training and √n cell budget both legs:
  *        - STALE quantizer: trained on the pre-drift corpus only —
  *          the index that was current before the batch arrived;
  *        - RETRAINED quantizer: trained on the grown corpus.
  *      Truth is exact brute-force top-3 (self-excluded); recall@3 is
  *      the fraction of true edges the IVF serve path returns. The
  *      stale leg also reports its worst cell-occupancy share — the
  *      shifted mass piling into the few old cells nearest epoch B is
  *      WHY stale recall collapses.
  *
  * {{{ sbt "runMain graft.tools.DriftRetrain 10 /root/testdata/sf0.1 /tmp/graft-drift" }}}
  */
object DriftRetrain {

  private def recallAt3(served: DataFrame, truth: DataFrame): Double = {
    val hit = truth.join(served.select(col("q_id"), col("n_id")),
      Seq("q_id", "n_id")).count()
    hit.toDouble / truth.count()
  }

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) args(2)
      else s"${System.getProperty("java.io.tmpdir")}/graft-drift-x$scale"
    val noise = if (args.length > 3) args(3).toDouble else 1.2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.pinDialect(Tables.localSession("graft-drift", cpus))

    val emb = Tables.load(spark, src, "embeddings")
    val nBase = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val total = nBase * scale

    val marker = java.nio.file.Paths.get(
      s"$out/_graft_drift_${scale}x_${nBase}_s$noise")
    if (!java.nio.file.Files.exists(marker)) {
      val reps = spark.range(scale).toDF("rep")
      val js = sequence(lit(0), lit(dim - 1))
      // per-parity epoch seed: arrivals draw their label direction from
      // a different prime offset than the corpus (AnnQualityAb's mix,
      // second epoch keyed by 104729 — the 10000th prime)
      val withId = emb.crossJoin(broadcast(reps))
        .select((col("vec_id") + col("rep") * lit(nBase)).as("vec_id"),
          col("label"))
        .withColumn("ep",
          when(col("vec_id") % 5 === 4, lit(104729L)).otherwise(lit(7919L)))
      val mu = AnnQualityAb.mix(col("label") + col("ep"), _: org.apache.spark.sql.Column)
      val clustered = withId
        .withColumn("munorm", sqrt(aggregate(
          transform(js, j => mu(j) * mu(j)), lit(0.0), (a, x) => a + x)))
        .select(col("vec_id"),
          transform(js, j =>
            (mu(j) / col("munorm") +
              lit(noise) * AnnQualityAb.mix(col("vec_id"), j)).cast("float"))
            .as("embedding"),
          col("label"))
      clustered.repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      val listing = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      try listing.filter(p =>
          p.getFileName.toString.startsWith("_graft_drift_"))
        .forEach(java.nio.file.Files.delete(_))
      finally listing.close()
      java.nio.file.Files.createFile(marker)
    }

    // ---- leg 1: the monitor. Strongly negative drift on every label
    // is the retrain trigger (threshold here: mean drift < -0.05).
    val drift = SparkEntry.registry("st_embedding_drift")
      .build(spark, out).collect()
    val drifts = drift.map(_.getAs[Double]("drift"))
    val meanDrift = drifts.sum / drifts.length
    val trigger = meanDrift < -0.05
    println(f"""{"metric":"drift_signal","labels":${drifts.length},""" +
      f""""mean_drift":$meanDrift%.4f,"min_drift":${drifts.min}%.4f,""" +
      f""""max_drift":${drifts.max}%.4f,"retrain_triggered":$trigger}""")

    // ---- leg 2: serving recall, stale vs retrained quantizer, both
    // over the GROWN corpus (the post-admission state)
    val n = spark.read.parquet(s"$out/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("vd"))
      .withColumn("nrm", sqrt(aggregate(col("vd"), lit(0.0),
        (a, x) => a + x * x)))
      .select(col("vec_id"), transform(col("vd"), x => x / col("nrm"))
        .as("an"))
      .localCheckpoint(false)
    val grown = n
    val preDrift = n.filter(col("vec_id") % 5 =!= 4)
    val cells = math.max(16, math.round(math.sqrt(total / 2.0))).toInt

    // Lloyd-2 both legs (the ivf.train lever); the stale leg's seed
    // bound is widened 5/4 so BOTH quantizers train exactly `cells`
    // centroids (ivfCentroids seeds vec_id < bound, and the pre-drift
    // corpus holds 4 of every 5 ids)
    spark.conf.set(BenchConfs.IvfTrain, "2")
    val stale = graft.queries.SimilarityQueries
      .ivfCentroids(spark, preDrift, cells * 5 / 4)
      .localCheckpoint(false)
    val fresh = graft.queries.SimilarityQueries
      .ivfCentroids(spark, grown, cells)
      .localCheckpoint(false)
    spark.conf.unset(BenchConfs.IvfTrain)

    // fixed arrival-batch query set (1× id bound), exact brute truth
    val queries = n.filter(col("vec_id") % 5 === 4 && col("vec_id") < nBase)
      .select(col("vec_id").as("q_id"), col("an").as("qa"))
      .localCheckpoint(false)
    val truth = graft.plans.TopK.topKPerKey(
        grown.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"),
            graft.functions.GraftFunctions.dot(col("qa"), col("an"))
              .as("cosine")),
        keys = Seq(col("q_id")),
        order = Seq(col("cosine").desc, col("n_id").asc), k = 3)
      .select(col("q_id"), col("n_id"))
      .localCheckpoint(false)

    for ((tag, cents) <- Seq("stale" -> stale, "retrained" -> fresh)) {
      val t0 = System.nanoTime()
      val (_, postings) = IvfIndex.build(grown, cells, Some(cents))
      val served = IvfIndex.serve(queries, cents, postings)
      val rec = recallAt3(served, truth)
      val sec = (System.nanoTime() - t0) / 1e9
      // worst cell-occupancy share: the shifted mass concentrating
      // into few old cells is the stale quantizer's failure mode
      val occ = postings.groupBy(col("cell")).count()
        .agg(max(col("count"))).head().getLong(0)
      println(f"""{"metric":"drift_recall","quantizer":"$tag",""" +
        f""""recall_at_3":$rec%.4f,"cells":$cells,""" +
        f""""max_cell_share":${occ.toDouble / total}%.4f,"sec":$sec%.1f}""")
    }
    spark.stop()
  }
}
