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
  * Crash safety: the swap never deletes a copy before its replacement
  * is live. Each old leaf is renamed aside to a `.‹leaf›.compact-bak`
  * sibling, the new leaf renamed in, and the backups + staging dropped
  * only after EVERY swap has succeeded — so at any crash point each
  * partition has at least one complete copy on disk (live, backup, or
  * staging), and a retry first restores any orphaned backup whose live
  * leaf is missing. On failure staging is left in place for inspection
  * or retry. Readers racing a swap can observe a leaf briefly absent
  * between the two renames (rename itself is atomic; the pair is not) —
  * the no-lost-data guarantee is the contract, not snapshot isolation;
  * pause readers or use a table format with commit metadata for that.
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

    // recover from a previous crashed swap before reading
    recoverBackups(fs, root, 0, partitionCols.length)

    val before = dataFiles(root)
    spark.read.parquet(root.toString)
      .repartition(partitionCols.map(col): _*)
      .write.partitionBy(partitionCols: _*)
      .parquet(staging.toString)

    // Leaf = the deepest partition level (k=v components).
    def leafDirs(p: Path, depth: Int): Seq[Path] =
      if (depth == partitionCols.length) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(s => leafDirs(s.getPath, depth + 1))

    // Swap: rename old aside → rename new in. Nothing is deleted until
    // every leaf has swapped; a failure anywhere leaves backups and
    // staging on disk for recoverBackups/retry.
    val backups = Seq.newBuilder[Path]
    val swapped = leafDirs(staging, 0).map { newLeaf =>
      val rel = newLeaf.toString.stripPrefix(staging.toString)
        .stripPrefix("/")
      val oldLeaf = new Path(root, rel)
      fs.mkdirs(oldLeaf.getParent)
      if (fs.exists(oldLeaf)) {
        val bak = new Path(oldLeaf.getParent, s".${oldLeaf.getName}$bakSuffix")
        require(fs.rename(oldLeaf, bak), s"rename $oldLeaf -> $bak failed")
        backups += bak
      }
      require(fs.rename(newLeaf, oldLeaf),
        s"rename $newLeaf -> $oldLeaf failed")
      oldLeaf
    }
    backups.result().foreach(b => fs.delete(b, true))
    fs.delete(staging, true)
    (swapped.size, before, dataFiles(root))
  }

  /** Standalone repair entry point: heal a crashed swap WITHOUT
    * re-running the full rewrite. A `.‹leaf›.compact-bak` whose live
    * leaf is missing is that partition's only copy — restore it; a
    * stale backup whose live leaf exists is left over from a crash
    * after its swap completed — drop it. Returns
    * (backups restored, stale backups dropped). Idempotent; also runs
    * automatically at the start of every [[compactPartitioned]].
    */
  def repair(spark: SparkSession, dir: String,
      partitionCols: Seq[String]): (Int, Int) = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverBackups(fs, fs.makeQualified(new Path(dir)), 0,
      partitionCols.length)
  }

  /** Walk partition levels above the leaves restoring/dropping
    * `.compact-bak` dirs (see [[repair]] for the contract). */
  private def recoverBackups(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      depth: Int, leafDepth: Int): (Int, Int) = {
    var restored = 0
    var dropped = 0
    if (depth < leafDepth && fs.exists(p))
      fs.listStatus(p).foreach { s =>
        val n = s.getPath.getName
        if (s.isDirectory && n.startsWith(".") && n.endsWith(bakSuffix)) {
          val live = new Path(p, n.drop(1).dropRight(bakSuffix.length))
          if (!fs.exists(live)) {
            require(fs.rename(s.getPath, live), s"restore $live failed")
            restored += 1
          } else { fs.delete(s.getPath, true); dropped += 1 }
        } else if (s.isDirectory && n.contains("=")) {
          val (r, d) = recoverBackups(fs, s.getPath, depth + 1, leafDepth)
          restored += r; dropped += d
        }
      }
    (restored, dropped)
  }

  private val bakSuffix = ".compact-bak"
}
