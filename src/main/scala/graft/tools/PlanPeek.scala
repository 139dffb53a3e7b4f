package graft.tools
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.localSession("planpeek", "8")
    for (n <- args) {
      println(s"===== $n")
      println(graft.SparkEntry.registry(n).build(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.take(sys.env.getOrElse("PLANPEEK_CHARS", "4000").toInt))
    }
    spark.stop()
  }
}
