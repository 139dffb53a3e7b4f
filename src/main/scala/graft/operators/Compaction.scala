package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-files compaction for a hive-partitioned parquet table — the
  * maintenance operator every streaming/incremental ingest needs: each
  * micro-batch or per-ingest publish drops a few small files per
  * partition, and scan efficiency at scale dies by a thousand 2 MB
  * files (driver listing cost, per-file reader setup, tiny row groups
  * that defeat column-chunk IO).
  *
  * Strategy: read the table, hash-repartition on the partition columns
  * so each partition's rows land in one task, and rewrite with
  * `partitionBy` into a sibling staging directory; then swap each
  * rewritten partition directory into place with filesystem renames and
  * drop the staging dir. The swap is rename-only (metadata ops on
  * HDFS-like filesystems; object stores pay a copy — run during a
  * maintenance window there). Writing to a staging dir rather than
  * overwriting in place is required: Spark refuses to overwrite a path
  * that is also being read from, and a mid-job failure must leave the
  * live table intact (staging is simply deleted on retry).
  *
  * File sizing: one file per partition by default;
  * `spark.sql.files.maxRecordsPerFile` (set by the caller) splits
  * oversized partitions, so the operator composes with the standard
  * knob instead of inventing one.
  *
  * Readers racing the swap see each partition either whole-old or
  * whole-new (rename is atomic per partition directory) — the same
  * contract as dynamic partition overwrite.
  */
object Compaction {

  /** Compact `dir` (hive-partitioned by `partitionCols`) in place.
    * Returns (partitions swapped, data files before, data files after).
    */
  def compactPartitioned(spark: SparkSession, dir: String,
      partitionCols: Seq[String]): (Int, Int, Int) = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new Path(dir))
    val staging = new Path(root.getParent,
      s".${root.getName}-compact-${System.nanoTime()}")

    def dataFiles(p: Path): Int = {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) n += 1
      }
      n
    }

    val before = dataFiles(root)
    try {
      spark.read.parquet(root.toString)
        .repartition(partitionCols.map(col): _*)
        .write.partitionBy(partitionCols: _*)
        .parquet(staging.toString)

      // swap each rewritten leaf partition dir into place: delete old,
      // rename new. Leaf = the deepest partition level (k=v components).
      def leafDirs(p: Path, depth: Int): Seq[Path] =
        if (depth == partitionCols.length) Seq(p)
        else fs.listStatus(p).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.contains("="))
          .flatMap(s => leafDirs(s.getPath, depth + 1))

      val swapped = leafDirs(staging, 0).map { newLeaf =>
        val rel = newLeaf.toString.stripPrefix(staging.toString)
          .stripPrefix("/")
        val oldLeaf = new Path(root, rel)
        fs.delete(oldLeaf, true)
        fs.mkdirs(oldLeaf.getParent)
        require(fs.rename(newLeaf, oldLeaf),
          s"rename $newLeaf -> $oldLeaf failed")
        oldLeaf
      }
      (swapped.size, before, dataFiles(root))
    } finally fs.delete(staging, true)
  }
}
