package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — match right rows whose time falls in a
  * per-left-row window [start, end) for the same key — implemented the
  * scale-correct way: equi-join on (key, time-bucket) with the left side
  * exploding only the buckets its window overlaps, then an exact refine
  * predicate. A naive theta join degenerates to a per-key cross join;
  * this shuffles on (key, bucket) and compares only same-bucket pairs.
  *
  * Bucket arithmetic is exact 64-bit integer math (`t - pmod(t, w)` then
  * an exact-multiple division), so boundary times never mis-bucket.
  */
object RangeJoin {

  /** Exact for the full long range: `t - pmod(t, w)` floors to a
    * multiple of w in integer math, and SQL `div` of an exact multiple
    * is exact — no double division anywhere (doubles lose integer
    * precision past 2^53, which nanosecond timestamps exceed). */
  private def bucketOf(t: Column, w: Long): Column =
    call_function("div", t - pmod(t, lit(w)), lit(w))

  /** @param left         probe side carrying the window
    * @param leftKey      join key on the left
    * @param start        window start (inclusive), e.g. unix micros
    * @param end          window end (exclusive), same scale
    * @param right        side whose `rightTime` must fall in the window
    * @param rightKey     join key on the right
    * @param rightTime    comparable time, same scale
    * @param bucketWidth  bucket size in the time unit; choose ≥ the
    *                     typical window so each left row explodes to ~2
    *                     buckets
    * @return inner-joined rows (all left + right columns)
    */
  def intervalJoin(
      left: DataFrame,
      leftKey: Column,
      start: Column,
      end: Column,
      right: DataFrame,
      rightKey: Column,
      rightTime: Column,
      bucketWidth: Long): DataFrame = {
    val l = left
      .withColumn("_lk", leftKey)
      .withColumn("_start", start)
      .withColumn("_end", end)
      // degenerate windows (end <= start) can match nothing but would
      // make sequence() count DOWNWARD and explode a huge bucket list
      .filter(col("_end") > col("_start"))
      .withColumn("_b", explode(sequence(
        bucketOf(col("_start"), bucketWidth),
        bucketOf(col("_end") - 1, bucketWidth))))
    val r = right
      .withColumn("_rk", rightKey)
      .withColumn("_rt", rightTime)
      .withColumn("_rb", bucketOf(col("_rt"), bucketWidth))
    l.join(r,
        col("_lk") === col("_rk") && col("_b") === col("_rb") &&
          col("_rt") >= col("_start") && col("_rt") < col("_end"))
      .drop("_lk", "_start", "_end", "_b", "_rk", "_rt", "_rb")
  }
}
