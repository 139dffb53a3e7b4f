package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Bridge into the `private[sql]` session identity — memo keys that
  * scope cached DataFrames to their owning session need an id that is
  * actually UNIQUE per live session (`System.identityHashCode` can
  * collide between two live sessions and hand one session a DataFrame
  * owned by another — ADVICE r10). `sessionUUID` is Spark's own
  * random-UUID-per-session, exposed here via the same qualified-private
  * access pattern as [[PlanShim]]; nothing else from the internal
  * surface is used.
  */
object SessionShim {

  /** The session's unique id: its `sessionUUID` for classic sessions
    * (every session this library constructs), an identity-hash
    * fallback for any other runtime. */
  def sessionId(spark: SparkSession): String = spark match {
    case c: ClassicSession => c.sessionUUID
    case other => s"ihc-${System.identityHashCode(other)}"
  }
}
