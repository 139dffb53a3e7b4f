package graft.tools

import graft.Tables
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** Deterministic WORK counter for td_incremental_dedup's in-stage
  * verification — the measurement the box cannot lie about. The
  * 1600×→3200× join-stage core-s pair could not be settled by timing:
  * identical-plan readings swing 2.8-5× with the VM's CPU phase
  * (BASELINE r18, "watch item for r19"), and a canary probe taken
  * BEFORE a run does not control the phase DURING it. So instead of
  * seconds this probe counts the work itself, exactly and
  * deterministically: it rebuilds the band frames the way
  * [[graft.queries.DedupQueries]]'s incrementalDedup does (class
  * contraction, shingle sort, delta-varint encode, packed-long band
  * keys), cogroups the two legs per band bucket, and counts BOTH
  * evaluation strategies over the same buckets:
  *   - `[verifywork]` — the pairwise LEFT SEMI scan the pre-r18-late
  *     plan ran (per new row, walk the bucket's existing side until
  *     first accept): pair evaluations, kernel merge-walk steps,
  *     accepts, bucket widths. THIS LINE IS WHAT PROVED THE OLD PLAN
  *     QUADRATIC (×3.99/octave at 800×/1600×/3200×) and stays as the
  *     contrast baseline.
  *   - `[verifywork-idx]` — the prefix-filter index evaluation that
  *     [[graft.plans.BucketAdmitJoin]] now ships (local-df order,
  *     floor(n/2)+1 prefixes, candidates verified exactly): index
  *     entries, evaluated candidate pairs, steps, accepts, plus
  *     `accept_match` asserting the two strategies agree — the
  *     production algorithm's work law in deterministic units.
  * Scan order inside a bucket is iterator order here vs the exec's
  * arrival order — both arbitrary interleavings of the same multiset;
  * EXISTS is order-independent so accepts match regardless.
  * Measurement tooling only.
  *
  * {{{ tools/runmain.sh graft.tools.VerifyWorkProbe /tmp/graft-stress-x1600 }}}
  */
object VerifyWorkProbe {

  /** Step-counting twin of [[graft.functions.DeltaVarint.geHalf]]:
    * same walk, same bounds, returns `(steps << 1) | verdict` where
    * steps counts loop-head bound checks (≥1 even for the immediate
    * length-ratio reject). Kept next to the kernel's semantics by the
    * same spec grid (VerifyWorkProbeSpec cross-checks verdicts). */
  def geHalfSteps(a: Array[Byte], b: Array[Byte]): Long = {
    var d = vdec(a, 0)
    val na = (d & 0xffffffffffL).toInt
    var pa = (d >>> 40).toInt
    d = vdec(b, 0)
    val nb = (d & 0xffffffffffL).toInt
    var pb = (d >>> 40).toInt
    val s = na + nb
    var i = 0; var j = 0; var found = 0
    var ax = 0L; var bx = 0L
    var steps = 0L
    if (na > 0) { d = vdec(a, pa); pa = (d >>> 40).toInt; ax = d & 0xffffffffffL }
    if (nb > 0) { d = vdec(b, pb); pb = (d >>> 40).toInt; bx = d & 0xffffffffffL }
    while (i < na && j < nb) {
      steps += 1
      val remA = na - i; val remB = nb - j
      val rem = if (remA < remB) remA else remB
      if (3 * (found + rem) < s) return (steps << 1) | 0L
      if (ax < bx) {
        i += 1
        if (i < na) { d = vdec(a, pa); pa = (d >>> 40).toInt; ax += d & 0xffffffffffL }
      } else if (ax > bx) {
        j += 1
        if (j < nb) { d = vdec(b, pb); pb = (d >>> 40).toInt; bx += d & 0xffffffffffL }
      } else {
        found += 1; i += 1; j += 1
        if (i < na) { d = vdec(a, pa); pa = (d >>> 40).toInt; ax += d & 0xffffffffffL }
        if (j < nb) { d = vdec(b, pb); pb = (d >>> 40).toInt; bx += d & 0xffffffffffL }
      }
      if (3 * found >= s) return (steps << 1) | 1L
    }
    if (steps == 0) steps = 1 // empty-side entry still costs the bound check
    (steps << 1) | (if (3 * found >= s) 1L else 0L)
  }

  @inline private def vdec(a: Array[Byte], pos0: Int): Long = {
    var pos = pos0; var v = 0L; var sh = 0; var bb = 0
    do {
      bb = a(pos); pos += 1
      v |= (bb & 0x7fL) << sh; sh += 7
    } while ((bb & 0x80) != 0)
    (pos.toLong << 40) | v
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.pinDialect(Tables.localSession("graft-verifywork", cpus))
    import spark.implicits._

    val docs = Tables.load(spark, dir, "documents")
    // band-frame construction, kept expression-for-expression in step
    // with incrementalDedup (DedupQueries.scala:270-360); the printed
    // accepted-digest count must equal the registry query's verDig
    // cardinality on the same fixture, which is the sync check
    val isNew = col("doc_id") % 5 === 4
    val dig = struct(unhex(md5(col("text").cast("binary"))),
      xxhash64(col("text")), length(col("text"))).as("_dig")
    val classes = docs.select(col("doc_id"), dig, col("text"))
      .groupBy(col("_dig"), col("text"))
      .agg(max(when(isNew, 1).otherwise(0)).as("has_new"),
        max(when(!isNew, 1).otherwise(0)).as("has_existing"))
    val sigd = classes
      .select(col("_dig"), col("has_new"), col("has_existing"),
        words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("_dig"), col("has_new"), col("has_existing"),
        array_sort(array_distinct(shingleHash60(col("ws"), 3, modP = true)))
          .as("hs"))
      .select(col("_dig"), col("has_new"), col("has_existing"),
        deltaVarint(col("hs")).as("hsb"), minhashSig(col("hs"), 8).as("sig"))
    val bandArr = transform(sequence(lit(0), lit(3)), b =>
      shiftleft(b.cast("long"), 60) +
        shiftleft(element_at(col("sig"), b * 2 + 1), 30) +
        element_at(col("sig"), b * 2 + 2))
    val nB = sigd.filter(col("has_new") === 1 && col("has_existing") === 0)
      .select(explode(bandArr).as("bkey"), col("hsb"))
      .as[(Long, Array[Byte])]
    val eB = sigd.filter(col("has_existing") === 1)
      .select(explode(bandArr).as("bkey"), col("hsb"))
      .as[(Long, Array[Byte])]

    val per = nB.groupByKey(_._1).cogroup(eB.groupByKey(_._1)) {
      (_, ns, es) =>
        val el = es.map(_._2).toArray
        var wn = 0L; var pe = 0L; var st = 0L; var acc = 0L
        val nl = ns.map(_._2).toArray
        nl.foreach { nh =>
          wn += 1
          var idx = 0; var done = false
          while (idx < el.length && !done) {
            pe += 1
            val r = geHalfSteps(nh, el(idx))
            st += (r >>> 1)
            if ((r & 1L) == 1L) { done = true; acc += 1 }
            idx += 1
          }
        }

        // ---- simulated per-bucket PREFIX INDEX (Bayardo WWW'07 /
        // Xiao VLDB'08, the machinery td_dedup_lsh_recall's lossless
        // ground truth already uses corpus-wide): order tokens by
        // (local df asc, token asc), index each existing set's
        // floor(n/2)+1-token prefix (J >= 1/2 with the size filter
        // b >= a/2 forces overlap >= ceil(a/2), so two qualifying
        // sets MUST share a prefix token under any shared total
        // order), probe each new set's prefix through the index, and
        // evaluate only candidates — exactness witnessed by iacc ==
        // acc below. Costs counted: index entries, probe hits,
        // evaluated candidate pairs and their kernel steps.
        var ie = 0L; var ipe = 0L; var ist = 0L; var iacc = 0L
        if (nl.nonEmpty && el.nonEmpty) {
          val eDec = el.map(graft.functions.DeltaVarint.decode)
          val nDec = nl.map(graft.functions.DeltaVarint.decode)
          val df = new java.util.HashMap[Long, Int]()
          eDec.foreach(_.foreach(t => df.merge(t, 1, Integer.sum _)))
          nDec.foreach(_.foreach(t => df.merge(t, 1, Integer.sum _)))
          val ord = new Ordering[Long] {
            def compare(x: Long, y: Long): Int = {
              val c = Integer.compare(df.get(x), df.get(y))
              if (c != 0) c else java.lang.Long.compare(x, y)
            }
          }
          def prefix(a: Array[Long]): Array[Long] = {
            val p = a.length / 2 + 1
            val s = a.sorted(ord)
            java.util.Arrays.copyOf(s, math.min(p, s.length))
          }
          val index = new java.util.HashMap[Long, java.util.ArrayList[Int]]()
          var i = 0
          while (i < eDec.length) {
            val pf = prefix(eDec(i))
            ie += pf.length
            pf.foreach { t =>
              index.computeIfAbsent(t, _ => new java.util.ArrayList[Int]())
                .add(i)
            }
            i += 1
          }
          var j = 0
          while (j < nDec.length) {
            val pf = prefix(nDec(j))
            val seen = new java.util.BitSet(el.length)
            var done = false
            var pi = 0
            while (pi < pf.length && !done) {
              val lst = index.get(pf(pi))
              if (lst != null) {
                var li = 0
                while (li < lst.size() && !done) {
                  val ei = lst.get(li)
                  if (!seen.get(ei)) {
                    seen.set(ei)
                    ipe += 1
                    val r = geHalfSteps(nl(j), el(ei))
                    ist += (r >>> 1)
                    if ((r & 1L) == 1L) { done = true; iacc += 1 }
                  }
                  li += 1
                }
              }
              pi += 1
            }
            j += 1
          }
        }

        if (wn == 0 && el.isEmpty) Iterator.empty
        else Iterator((el.length.toLong, wn, pe, st, acc, ie, ipe, ist, iacc))
    }.toDF("we", "wn", "pe", "st", "acc", "ie", "ipe", "ist", "iacc")

    val row = per.agg(
      count(lit(1)).as("buckets"),
      sum("we").as("e_rows"), sum("wn").as("n_rows"),
      sum("pe").as("pair_evals"), sum("st").as("steps"),
      sum("acc").as("accepts"),
      sum(col("we") * col("wn")).as("worst_pairs"),
      max("we").as("max_we"),
      expr("percentile_approx(we, 0.99)").as("p99_we"),
      expr("percentile_approx(we, 0.5)").as("p50_we"),
      sum("ie").as("idx_entries"), sum("ipe").as("idx_pair_evals"),
      sum("ist").as("idx_steps"), sum("iacc").as("idx_accepts")).head()

    println(s"[verifywork] dir=$dir buckets=${row.getLong(0)} " +
      s"e_rows=${row.getLong(1)} n_rows=${row.getLong(2)} " +
      s"pair_evals=${row.getLong(3)} steps=${row.getLong(4)} " +
      s"accepts=${row.getLong(5)} worst_pairs=${row.getLong(6)} " +
      s"we_max=${row.getLong(7)} we_p99=${row.getLong(8)} " +
      s"we_p50=${row.getLong(9)}")
    println(s"[verifywork-idx] dir=$dir idx_entries=${row.getLong(10)} " +
      s"idx_pair_evals=${row.getLong(11)} idx_steps=${row.getLong(12)} " +
      s"idx_accepts=${row.getLong(13)} " +
      s"accept_match=${row.getLong(13) == row.getLong(5)}")
    spark.stop()
  }
}
