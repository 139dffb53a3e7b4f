package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's built-in joins don't
  * express directly. For each left row, attach the right-side payload of
  * the row with the greatest right time <= the left row's time, per key.
  *
  * Implementation is the scale-correct composition (SURVEY.md §7.1 step 9
  * preference order (a): compose existing ops): tag both sides, union by
  * name, and carry the right payload forward with
  * `last(_, ignoreNulls) OVER (PARTITION BY key ORDER BY time, side)` —
  * one shuffle on the key, O(n log n) per partition, no range-condition
  * pair explosion (a naive theta join is O(left × right) per key). At the
  * same instant the right row sorts first, so the match is inclusive
  * (right.time == left.time matches).
  *
  * `right` must be unique per (key, time) — pre-aggregate if not, or the
  * carried payload is ambiguous. Times must be non-null on both sides:
  * nulls sort first under the window order and would be carried as
  * "before everything" rows — filter them out upstream.
  */
object AsOfJoin {

  /** @param left        probe side
    * @param leftKey     join key on the left
    * @param leftTime    monotone comparable time (e.g. unix micros)
    * @param right       build side, unique per (key, time)
    * @param rightKey    join key on the right
    * @param rightTime   comparable time, same scale as leftTime
    * @param payload     right-side column names to attach (null when no
    *                    right row is at-or-before the left row)
    */
  def asofJoin(
      left: DataFrame,
      leftKey: Column,
      leftTime: Column,
      right: DataFrame,
      rightKey: Column,
      rightTime: Column,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val reserved = Seq("_k", "_t", "_side", "_payload")
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"payload names collide with left columns: " +
        payload.intersect(left.columns.toSeq).mkString(", "))
    require(reserved.intersect(left.columns.toSeq).isEmpty,
      s"left columns collide with internal names: " +
        reserved.intersect(left.columns.toSeq).mkString(", "))

    val taggedLeft = left
      .withColumn("_k", leftKey)
      .withColumn("_t", leftTime)
      .withColumn("_side", lit(1))
    // SQL equality semantics: a null right key matches nothing — drop it.
    // (Null-keyed left rows then share a partition containing no right
    // rows and correctly get a null payload.)
    // The payload travels as ONE struct so the carried values always
    // come from a single right row, even when individual payload fields
    // are null (a per-column last(ignoreNulls) would stitch a chimera
    // from different rows).
    val taggedRight = right
      .where(rightKey.isNotNull)
      .select(rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
        struct(payload.map(col): _*).as("_payload"))

    val unioned = taggedLeft.unionByName(taggedRight,
      allowMissingColumns = true)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col).toSeq ++
        payload.map(c => col(s"_payload.$c").as(c)): _*)
  }
}
