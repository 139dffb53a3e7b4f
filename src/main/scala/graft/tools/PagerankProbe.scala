package graft.tools

import org.apache.spark.sql.functions._

/** Attribution probe for rel_graph_pagerank's warm wall (VERDICT r17
  * #4): times the SAME plan at 0..3 iterations on a warm JVM, so the
  * deltas split the query into (edge derivation + caches + node
  * count) vs per-iteration cost. Measurement tooling only.
  *
  * {{{ tools/runmain.sh graft.tools.PagerankProbe /root/testdata/sf0.1 }}}
  */
object PagerankProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.pinDialect(
      graft.Tables.localSession("graft-prprobe", cpus))
    def undirected = {
      val e0 = graft.Tables.load(spark, dir, "lineitem")
        .join(graft.Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    }
    // JIT/page-cache warmup
    graft.operators.PageRank.run(undirected, 3).count()
    for (iters <- Seq(0, 1, 2, 3, 3)) {
      val t0 = System.nanoTime()
      val n = graft.operators.PageRank.run(undirected, iters).count()
      println(f"[prprobe] iters=$iters rows=$n " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
