package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole (forked) test JVM. */
trait SparkTestSession {
  lazy val spark: SparkSession =
    Tables.pinDialect(Tables.localSession("graft-test", "4"))
}
