package graft.beacon

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import scala.jdk.CollectionConverters._

/** CSV sink matching the reference's petl `.tocsv()` contract
  * (prepare_calls.py:176-191): one named file per table, header row,
  * null → empty cell, rows in source-file order.
  *
  * Order preservation is the deliberate engine decision petl gets for
  * free (SURVEY.md §7.3.1): every pipeline output carries an `_ord`
  * struct; the sink sorts on it, drops engine columns, and writes a
  * single part file that is renamed into place. `coalesce(1)` is a CLI
  * parity concession — the 100 TB path writes partitioned parquet and
  * never funnels through one task.
  */
object CsvIO {

  def writeCsv(df: DataFrame, outPath: String): Unit = {
    val tmpRoot = Files.createTempDirectory("graft-csv-")
    try {
      val tmpDir = tmpRoot.toString + "/out"
      val engineCols = df.columns.filter(_.startsWith("_"))
      df.coalesce(1)
        .sortWithinPartitions(col("_ord"))
        .drop(engineCols: _*)
        .write
        .option("header", true)
        .option("emptyValue", "")
        .option("nullValue", "")
        .mode("overwrite")
        .csv(tmpDir)
      val listing = Files.list(Paths.get(tmpDir))
      val part =
        try listing.iterator().asScala
          .find(_.getFileName.toString.startsWith("part-"))
          .getOrElse(throw new IllegalStateException(s"no part file in $tmpDir"))
        finally listing.close()
      val target = Paths.get(outPath)
      if (target.getParent != null) Files.createDirectories(target.getParent)
      Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    } finally {
      // drop the _SUCCESS/.crc droppings along with the temp root
      val walk = Files.walk(tmpRoot)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** Write to stdout (the prepare-contacts sink, prepare_contacts.py:44). */
  def writeStdout(df: DataFrame): Unit = {
    val tmp = Files.createTempFile("graft-stdout-", ".csv")
    writeCsv(df, tmp.toString)
    Files.lines(tmp).iterator().asScala.foreach(println)
    Files.deleteIfExists(tmp)
  }
}
