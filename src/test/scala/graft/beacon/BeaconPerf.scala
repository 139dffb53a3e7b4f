package graft.beacon

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

import graft.Tables
import graft.beacon.CallsHeaderMap.{canonicalOrder, fields}

/** Manual perf probe (Test/runMain graft.beacon.BeaconPerf [nRows]):
  * synthesizes a large windows-1252 calls.csv by cycling the fixture row
  * patterns with unique nhs numbers, then times the full prepare-calls
  * pipeline including all seven CSV sinks. Numbers go to BASELINE.md.
  */
object BeaconPerf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val dir = Files.createTempDirectory("beacon-perf-")
    val csv = dir.resolve("calls.csv")

    val header = CallsFixture.toCsv(Seq(fields.map(_.original)))
    val patterns = CallsFixture.rows.map { r =>
      canonicalOrder.map(c => r.getOrElse(c, ""))
    }
    val w = Files.newBufferedWriter(csv, Charset.forName("windows-1252"))
    w.write(header)
    var i = 0
    while (i < n) {
      val p = patterns(i % patterns.size)
      val row = p.updated(0, (1000000L + i).toString) // unique nhs_number
      w.write(CallsFixture.toCsv(Seq(row)))
      i += 1
    }
    w.close()
    println(s"wrote $n rows, ${Files.size(csv) / 1024 / 1024} MiB")

    val spark = Tables.pinDialect(Tables.localSession("beacon-perf", "32"))
    val outDir = dir.resolve("out").toString
    val t0 = System.nanoTime()
    BeaconCli.run(spark, csv.toString, outDir,
      PrepareCalls.Users(101L, 102L, 103L, 104L))
    val secs = (System.nanoTime() - t0) / 1e9
    val outSizes = Files.list(Paths.get(outDir)).iterator()
    var total = 0L
    while (outSizes.hasNext) total += Files.size(outSizes.next())
    println(f"prepare-calls end-to-end: $secs%.1f s for $n rows " +
      f"(${n / secs}%.0f rows/s), ${total / 1024 / 1024} MiB written")
    spark.stop()
  }
}
