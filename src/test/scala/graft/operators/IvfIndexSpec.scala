package graft.operators

import java.nio.file.{Files, Paths}

import graft.{SparkEntry, SparkTestSession}
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-index contract: a save→load→serve round trip answers
  * EXACTLY the rows the registry's streaming incremental-ANN path
  * (st_incremental_ann) computes in-plan — same seeds, same probe
  * order, same (cosine DESC, n_id ASC) total order — and the stored
  * postings are laid out one directory per cell (the partition-pruned
  * read path at scale).
  */
class IvfIndexSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  test("save -> load -> serve equals the streaming incremental-ANN rows") {
    val n = DedupQueries.normalizedEmbeddings(spark, sfDir)
    val existing = n.filter(col("vec_id") % 5 =!= 4)
      .select(col("vec_id"), col("an"))
    val (cents, postings) = IvfIndex.build(existing, cells = 16)
    val dir = Files.createTempDirectory("ivf-index-").toString
    IvfIndex.save(dir, cents, postings)

    val (lc, lp) = IvfIndex.load(spark, dir)
    val queries = n.filter(col("vec_id") % 5 === 4)
      .select(col("vec_id").as("q_id"), col("an").as("qa"))
    val served = IvfIndex.serve(queries, lc, lp)
      .select(col("q_id"), col("rnk"), col("n_id"))

    val expected = SparkEntry.registry("st_incremental_ann")
      .build(spark, sfDir)
      .select(col("q_id"), col("rnk"), col("n_id"))
    assert(expected.count() > 0)
    assert(served.exceptAll(expected).isEmpty &&
      expected.exceptAll(served).isEmpty,
      "served rows diverge from the streaming incremental-ANN path")

    // inverted-list layout: one cell=<cid> directory per quantizer
    // cell (every seed's home cell is itself — dot(an, an) is maximal)
    val listing = Files.list(Paths.get(s"$dir/postings"))
    val cellDirs =
      try listing.toArray.map(_.toString).count(_.contains("cell="))
      finally listing.close()
    assert(cellDirs == 16, s"expected 16 cell directories, got $cellDirs")
  }

  test("serving the indexed corpus itself never answers self matches") {
    // the build-once/serve-many overlap case (e.g. the corpus's own
    // kNN graph): without serve's self-exclusion every indexed query
    // would answer itself at rank 1 with cosine 1.0 (review r15)
    val n = DedupQueries.normalizedEmbeddings(spark, sfDir)
    val existing = n.filter(col("vec_id") % 5 =!= 4)
      .select(col("vec_id"), col("an"))
    val (cents, postings) = IvfIndex.build(existing, cells = 16)
    val queries = existing.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("an").as("qa"))
    val rows = IvfIndex.serve(queries, cents, postings).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("q_id") != r.getAs[Long]("n_id"),
        s"self match served: $r")
      // the fixture has no duplicate (or collinear) vectors, so a
      // cosine at 1.0 could only be a self match leaking through
      // under a disguised id — assert the bound directly (the prior
      // `|| n_id != q_id` disjunct was vacuously true; ADVICE r15)
      assert(r.getAs[Double]("cosine") < 1.0 - 1e-12, r)
    }
  }

  test("servePruned: identical rows to serve, scan reads ONLY probed cells") {
    val n = DedupQueries.normalizedEmbeddings(spark, sfDir)
    val existing = n.filter(col("vec_id") % 5 =!= 4)
      .select(col("vec_id"), col("an"))
    val (cents, postings) = IvfIndex.build(existing, cells = 16)
    val dir = Files.createTempDirectory("ivf-prune-").toString
    IvfIndex.save(dir, cents, postings)
    val (lc, lp) = IvfIndex.load(spark, dir)

    // row identity on the standard batch: the isin pruning filter is a
    // semantic no-op (join keys outside the probed cells cannot match)
    val queries = n.filter(col("vec_id") % 5 === 4)
      .select(col("vec_id").as("q_id"), col("an").as("qa"))
    val served = IvfIndex.serve(queries, lc, lp).collect().toSeq
    val pruned = IvfIndex.servePruned(queries, lc, lp).collect().toSeq
    assert(pruned.nonEmpty && pruned.sortBy(r => (r.getLong(0),
      r.getInt(1))) == served.sortBy(r => (r.getLong(0), r.getInt(1))))

    // the pruning proof: two queries cloned from two quantizer seeds at
    // probes=1 probe exactly their own home cells (a seed's best cell
    // is itself), so the postings scan must READ exactly 2 of the 16
    // partitions — the inverted-list fetch, not a full-corpus pass
    val twoSeeds = lc.orderBy(col("cid")).limit(2)
      .select(col("cid").as("q_id"), col("ca").as("qa"))
    val df = IvfIndex.servePruned(twoSeeds, lc, lp, k = 3, probes = 1)
    df.collect()
    val partsRead = graft.plans.PlanScan
      .fileScans(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("postings")))
      .flatMap(_.metrics.get("numPartitions").map(_.value))
    assert(partsRead.nonEmpty, "no postings FileSourceScanExec found")
    assert(partsRead.forall(_ == 2L),
      s"expected every postings scan to read 2 partitions, got $partsRead")
  }

  test("serve output is a ranked k-NN: dense ranks, no self matches") {
    val n = DedupQueries.normalizedEmbeddings(spark, sfDir)
    val existing = n.filter(col("vec_id") % 5 =!= 4)
      .select(col("vec_id"), col("an"))
    val (cents, postings) = IvfIndex.build(existing, cells = 16)
    val queries = n.filter(col("vec_id") % 5 === 4)
      .select(col("vec_id").as("q_id"), col("an").as("qa"))
    val rows = IvfIndex.serve(queries, cents, postings).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_id") % 5 != 4, s"non-existing neighbor: $r")
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, r)
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq ==
        (1 to rs.length).toSeq, s"non-dense ranks for q=$q")
      assert(rs.length <= 3, s"more than k rows for q=$q")
    }
  }

  test("trainSampled: bounded-sample Lloyd yields a usable quantizer") {
    // VERDICT r16 #2: training must never scan the full corpus — the
    // sampled trainer sees ~64 vectors/cell and the full corpus only
    // pays the single assignment pass. Pins: (a) the trained table is
    // (cid, ca) with every centroid unit-norm; (b) at most `cells`
    // rows (empty cells may drop — standard Lloyd); (c) a build over
    // the trained quantizer still serves a well-formed ranked k-NN
    // whose neighbors come from the indexed corpus; (d) training on
    // the SAMPLE equals lloydRefine on that sample with the lowest-id
    // seeds — the seeding contract.
    val n = DedupQueries.normalizedEmbeddings(spark, sfDir)
    val existing = n.filter(col("vec_id") % 5 =!= 4)
      .select(col("vec_id"), col("an"))
    val sample = existing.filter(pmod(xxhash64(col("vec_id")), lit(3)) === 0)
    val trained = IvfIndex.trainSampled(sample, cells = 16, rounds = 2)
    val rows = trained.collect()
    assert(rows.nonEmpty && rows.length <= 16)
    assert(trained.columns.sorted.toSeq == Seq("ca", "cid"))
    rows.foreach { r =>
      val ca = r.getSeq[Double](r.fieldIndex("ca"))
      val nrm = math.sqrt(ca.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9, s"non-unit centroid: $r")
    }
    val seeds = sample.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("cid"), col("an").as("ca"))
    val viaRefine = IvfIndex.lloydRefine(
      sample.select(col("vec_id"), col("an")), seeds, 2).collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      viaRefine.map(_.toString).sorted.toSeq,
      "trainSampled must be lloydRefine over lowest-id sample seeds")
    val (cents, postings) = IvfIndex.build(existing, cells = 16,
      centsOverride = Some(trained))
    val queries = n.filter(col("vec_id") % 5 === 4)
      .select(col("vec_id").as("q_id"), col("an").as("qa"))
    val served = IvfIndex.serve(queries, cents, postings).collect()
    assert(served.nonEmpty)
    served.foreach(r =>
      assert(r.getAs[Long]("n_id") % 5 != 4, s"non-existing neighbor: $r"))
  }
}
