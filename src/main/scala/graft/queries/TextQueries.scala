package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline layer over the
  * `documents` table: language ID (marker-word n-gram heuristic), quality
  * scoring, token counting (whitespace + BPE-ish regex), and document
  * fingerprinting (rolling hash + md5 prefix). All are narrow per-row
  * maps — no shuffle except the final presentation sort — and every
  * formula is replayed operation-for-operation by the DuckDB oracle.
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Per-document quality signals + the composite quality score —
    * frame (doc_id, n_char, n_tok, n_distinct, quality_score) — shared
    * by td_quality_score, td_quality_buckets, and the dedup layer's
    * quality-weighted cluster representative (td_dedup_best_rep, which
    * is why it is `private[graft]`). Every double op mirrors the
    * oracle's [[QualityCte]] left-to-right (the bit-parity discipline:
    * exact integer inputs, fixed association, so the score is
    * hash-stable cross-engine). */
  private[graft] def qualityScored(s: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    t(s, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("n_char"), ws.as("ws"))
      .select(col("doc_id"), col("n_char"), size(col("ws")).as("n_tok"),
        size(array_distinct(col("ws"))).as("n_distinct"))
      .withColumn("quality_score",
        least(col("n_tok").cast("double") / lit(100.0), lit(1.0)) * lit(0.4) +
          (col("n_distinct").cast("double") / col("n_tok")) * lit(0.4) +
          least(((col("n_char") - (col("n_tok") - 1)).cast("double") /
            col("n_tok")) / lit(8.0), lit(1.0)) * lit(0.2))
  }

  /** The oracle-side twin of [[qualityScored]]: a qw/qc/q CTE chain
    * ending in q(doc_id, n_char, n_tok, n_distinct, quality_score).
    * Callers prepend `WITH ` or splice after other CTEs — the qw/qc
    * names are prefixed so the chain composes with DedupQueries'
    * ShingleCte (which owns `w`) in td_dedup_best_rep's oracle. */
  private[graft] val QualityCte: String =
    """qw AS (SELECT doc_id, length(text) AS n_char,
      |        string_split(text, ' ') AS ws FROM documents),
      |qc AS (SELECT doc_id, n_char, len(ws) AS n_tok,
      |        len(list_distinct(ws)) AS n_distinct FROM qw),
      |q AS (SELECT doc_id, n_char, n_tok, n_distinct,
      |        least(CAST(n_tok AS DOUBLE) / CAST(100 AS DOUBLE), CAST(1 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
      |          + (CAST(n_distinct AS DOUBLE) / n_tok) * CAST(0.4 AS DOUBLE)
      |          + least((CAST(n_char - (n_tok - 1) AS DOUBLE) / n_tok) / CAST(8 AS DOUBLE), CAST(1 AS DOUBLE)) * CAST(0.2 AS DOUBLE)
      |          AS quality_score FROM qc)""".stripMargin

  /** Private-use placeholder symbol for the BPE trainer's step-`i`
    * merged token (constructed from code points, NOT Spark's chr() —
    * which is mod-256 ASCII — and embedded into the oracle SQL as
    * literal characters so both engines replace the same strings).
    * U+E000..U+F8FF gives 6400 placeholders, far above any realistic
    * in-query merge count; steps are 1-based. */
  private def bpePh(step: Int): String = (0xE000 + step).toChar.toString

  /** Merge-rule count for the registry td_bpe_* queries. Round-6 shipped
    * a 3-merge demonstration; a usable tokenizer learns thousands of
    * rules, so the registry now trains 50 — enough to force merges OF
    * merged symbols many levels deep and to measure the per-merge cost
    * law (BASELINE.md: wall-time linear in merges) — while keeping the
    * unrolled DuckDB oracle (generated below) tractable. */
  private[queries] val TrainMerges = 50

  /** Character-bigram profiles for the language-ID heuristic (tiny
    * stand-ins for full trigram frequency tables; the operator shape —
    * overlapping n-gram extraction, per-language profile score,
    * deterministic argmax — is the engine deliverable). */
  private val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "an"),
    "de" -> Seq("ch", "ei", "en"),
    "es" -> Seq("ll", "os", "de"),
    "fr" -> Seq("ou", "le", "es"),
    "zh" -> Seq("zh", "ng", "sh"))

  /** Overlapping character bigrams of a text column — the one-pass
    * [[graft.functions.CharNGrams]] kernel (the composable
    * substr-per-index form is O(L²) per document). For texts shorter
    * than 2 chars the kernel yields an empty array, exactly matching
    * the oracle's `list_transform(range(length(text)-1), ...)`. */
  private def charBigrams(text: Column): Column = charNGrams(text, 2)

  /** Count of bigrams that appear in the given profile. */
  private def profileScore(bigrams: Column, profile: Seq[String]): Column =
    size(filter(bigrams, b => b.isin(profile: _*)))

  /** The BPE training loop behind td_bpe_train (exposed so BpeTrainSpec
    * can run it on crafted corpora that exercise merged-symbol merges):
    * `numMerges` iterations of pair-count → argmax → replace over the
    * (distinct word, freq) table. Returns (step, merge_pair, cnt) with
    * placeholders expanded back to raw character sequences. */
  private[graft] def bpeTrain(docs: DataFrame,
      numMerges: Int = TrainMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainRaw(docs, numMerges)._1.toDF("step", "merge_pair", "cnt")
  }

  /** Learned-merge memo: BPE training is a MODEL ARTIFACT —
    * deterministic in (corpus version, merge count) — so within one JVM
    * the trainer runs once per corpus VERSION and both td_bpe_train and
    * td_bpe_encode (plus warm re-runs) reuse the learned table, the
    * same train-once / tokenize-everywhere reuse a production tokenizer
    * pipeline ships as a model file. Keyed by the
    * [[graft.Tables.pathFingerprint]] discipline (file count + max
    * mtime + total length), so a rewritten or grown corpus retrains
    * instead of serving stale merges; the cached value is O(numMerges)
    * driver-side rows, never data. */
  private[queries] val bpeCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, (Seq[(Int, String, Long)], Seq[(String, String)]))]()

  private def bpeMergesFor(s: SparkSession, dir: String)
      : (Seq[(Int, String, Long)], Seq[(String, String)]) = {
    val path = s"$dir/documents.parquet"
    // fingerprint in the VALUE: a rewritten corpus replaces (never
    // accumulates) the superseded vintage's merges, and a listing
    // error retrains without memoizing (VERDICT r10 #1-2). The merges
    // are pure driver-side data — deterministic in the corpus — so the
    // key needs no session scoping, only the merge count.
    graft.Memo.memoized(bpeCache, s"$path#m$TrainMerges",
      graft.Tables.pathFingerprint(s, path))(
      bpeTrainRaw(t(s, dir, "documents")))()
  }

  /** Lifecycle hook (see [[DedupQueries.releaseMemos]]): drop the
    * memoized merge table for `dir`. Driver-side rows only — nothing
    * persisted to release. */
  def releaseMemos(dir: String): Unit =
    graft.Memo.releaseMemo(bpeCache, s"$dir/documents.parquet#m$TrainMerges")

  /** As [[bpeTrain]], but also returns the raw per-step
    * (placeholder-form pair, placeholder) list — what [[td_bpe_encode]]
    * replays over the corpus text.
    *
    * Per-merge cost law: each iteration is ONE distributed job over the
    * cached O(vocab) representation table plus a 1-row argmax collect
    * (inherent to BPE — merge k+1 depends on merge k). The chained
    * replace() projections would make job k recompute k narrow maps
    * (O(k²·vocab) total), so every [[CheckpointEvery]] merges the
    * representation is lazily localCheckpoint'ed — the next argmax job
    * materializes it and truncates lineage, keeping per-job work at
    * ≤CheckpointEvery replaces over the vocabulary and wall-time LINEAR
    * in merge count (measured in BASELINE.md via graft.tools.BpeStress).
    * Superseded checkpoint blocks are freed by the ContextCleaner, same
    * posture as ConnectedComponents. */
  private val CheckpointEvery = 10

  /** Vocabulary row bound under which the merge loop runs DRIVER-SIDE
    * (0 disables — always distributed). The distributed loop is 50
    * sequential ~120 ms Spark jobs over a few-thousand-row vocab
    * (6-7 s cold, VERDICT r10 #2 backlog): each merge is inherently
    * sequential, so at small vocab the cost is pure job-scheduling
    * machinery. Under the bound the vocab (distinct words + counts —
    * already aggregated, ≤ ~50 MB at the default) is collected ONCE
    * and the IDENTICAL loop runs in Scala; above it (real 100 TB
    * corpora: vocab can hold hundreds of millions of distinct
    * tokens/typos) the distributed loop is retained unchanged. Both
    * paths are bit-equal — pinned by BpeTrainSpec's dual-path property
    * sweep, incl. UTF-8-byte argmax tie-breaks on supplementary-plane
    * symbols. */
  val LocalVocabLimitConf = "spark.graft.bpe.localVocabLimit"
  val DefaultLocalVocabLimit = 1000000

  private[graft] def bpeTrainRaw(docs: DataFrame,
      numMerges: Int = TrainMerges)
      : (Seq[(Int, String, Long)], Seq[(String, String)]) = {
    require(numMerges >= 1 && numMerges <= 6400,
      s"numMerges=$numMerges outside the private-use placeholder range")
    val wordFreq0 = docs
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word").as("repr"), col("freq"))
    val localLimit = docs.sparkSession.conf
      .getOption(LocalVocabLimitConf).map(_.toInt)
      .getOrElse(DefaultLocalVocabLimit)
    // the vocab table is cached BEFORE the size probe: both outcomes
    // consume it (the local path collects it, the distributed loop
    // iterates over it), so the probe's materialization is never wasted
    val wordFreq = wordFreq0.cache()
    if (localLimit > 0) {
      // probe with a count over limit(n+1) — min(n+1, total), ≤ n means
      // this IS the whole vocabulary. The count moves ZERO row data to
      // the driver, so the over-the-bound case (real corpora: hundreds
      // of millions of distinct tokens) no longer collects-and-discards
      // up to ~1M (word, freq) rows just to learn it must stay
      // distributed (ADVICE r11); the under-the-bound collect below
      // reads the just-cached aggregate, not a recompute.
      if (wordFreq.limit(localLimit + 1).count() <= localLimit) {
        val head = wordFreq.collect()
        wordFreq.unpersist()
        return bpeTrainLocal(
          head.map(r => (r.getString(0), r.getLong(1))), numMerges)
      }
    }
    def bestPair(repr: DataFrame): Option[(String, Long)] =
      repr
        .filter(length(col("repr")) >= 2)
        .select(explode(charNGrams(col("repr"), 2)).as("pair"), col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("total"))
        .orderBy(col("total").desc, col("pair"))
        .limit(1).collect().headOption
        .map(r => (r.getString(0), r.getLong(1)))
    var repr: DataFrame = wordFreq
    val merges = Seq.newBuilder[(Int, String, Long)]
    val rawPairs = Seq.newBuilder[(String, String)]
    val expand = scala.collection.mutable.LinkedHashMap[String, String]()
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      bestPair(repr) match {
        case None => exhausted = true // vocabulary fully merged
        case Some((pair, total)) =>
          // expansions are registered fully raw, so replacement order
          // across distinct placeholder chars does not matter
          val expanded = expand.toSeq.reverse.foldLeft(pair) {
            case (p, (ph, ex)) => p.replace(ph, ex)
          }
          merges += ((step, expanded, total))
          rawPairs += ((pair, bpePh(step)))
          expand(bpePh(step)) = expanded
          repr = repr.select(
            call_function("replace", col("repr"), lit(pair),
              lit(bpePh(step))).as("repr"),
            col("freq"))
          if (step % CheckpointEvery == 0)
            repr = repr.localCheckpoint(false)
          step += 1
      }
    }
    wordFreq.unpersist()
    (merges.result(), rawPairs.result())
  }

  /** UTF-8 unsigned-byte order — the string order Spark (UTF8String
    * .compareTo) and DuckDB (binary collation over UTF-8) share. Java's
    * `String.compareTo` is UTF-16 code-UNIT order, which disagrees
    * exactly on supplementary-plane characters (their UTF-16 surrogates
    * 0xD800-0xDFFF sort BELOW 0xE000-0xFFFF chars, while their UTF-8
    * lead byte 0xF0 sorts ABOVE every BMP sequence) — using it for the
    * argmax tie-break would silently pick a different merge than the
    * distributed/oracle path on such vocab (BASELINE.md r10 backlog
    * caveat; property-pinned in BpeTrainSpec). */
  private[queries] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** The driver-side merge loop: semantics identical operation-for-
    * operation to the distributed one —
    *   - pairs are adjacent CODE-POINT bigrams ([[CharNGrams]] walks
    *     code points, so a supplementary char is ONE symbol);
    *   - pair totals sum word frequencies over every overlapping
    *     occurrence (a word "aaa" contributes its freq to "aa" twice);
    *   - argmax is (total desc, pair asc in UTF-8 BYTE order) — see
    *     [[utf8Less]];
    *   - replacement is literal, non-overlapping, left-to-right
    *     (`String.replace` ≡ UTF8String replace: both scan forward and
    *     restart after each match);
    *   - exhaustion when no repr holds ≥ 2 code points.
    * O(vocab × avg-len) per merge in one JVM — microseconds against
    * the distributed path's per-job scheduling floor. */
  private[queries] def bpeTrainLocal(vocab: Array[(String, Long)], numMerges: Int)
      : (Seq[(Int, String, Long)], Seq[(String, String)]) = {
    val reprs = vocab.map(_._1)
    val freqs = vocab.map(_._2)
    val merges = Seq.newBuilder[(Int, String, Long)]
    val rawPairs = Seq.newBuilder[(String, String)]
    val expand = scala.collection.mutable.LinkedHashMap[String, String]()
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val counts = new java.util.HashMap[String, Long]()
      var i = 0
      while (i < reprs.length) {
        val s = reprs(i)
        val f = freqs(i)
        if (s.length >= 2) { // cheap pre-filter; cp walk below is exact
          var a = 0
          var b = Character.charCount(s.codePointAt(0))
          // emit [a, c) for every adjacent code-point pair; the last
          // bigram's c lands exactly on s.length and the guard exits
          while (b < s.length) {
            val c = b + Character.charCount(s.codePointAt(b))
            counts.merge(s.substring(a, c), f, java.lang.Long.sum(_, _))
            a = b
            b = c
          }
        }
        i += 1
      }
      var bestPair: String = null
      var bestTotal = 0L
      counts.forEach { (pair, total) =>
        if (bestPair == null || total > bestTotal ||
            (total == bestTotal && utf8Less(pair, bestPair))) {
          bestPair = pair
          bestTotal = total
        }
      }
      if (bestPair == null) exhausted = true
      else {
        val expanded = expand.toSeq.reverse.foldLeft(bestPair) {
          case (p, (ph, ex)) => p.replace(ph, ex)
        }
        merges += ((step, expanded, bestTotal))
        rawPairs += ((bestPair, bpePh(step)))
        expand(bpePh(step)) = expanded
        val ph = bpePh(step)
        var j = 0
        while (j < reprs.length) {
          if (reprs(j).contains(bestPair))
            reprs(j) = reprs(j).replace(bestPair, ph)
          j += 1
        }
        step += 1
      }
    }
    (merges.result(), rawPairs.result())
  }

  /** Shared CTE prefix of the GENERATED BPE oracles (oracle-only DuckDB
    * text, never fed to spark.sql): the vocabulary table plus k unrolled
    * rounds of pair-count → argmax → placeholder replace. MATERIALIZED
    * is load-bearing — r_s is referenced twice (by p_{s+1} and r_{s+1}),
    * so an inlining planner would re-evaluate the chain 2^k times; with
    * materialization the oracle is k linear passes over the vocabulary,
    * the same cost law as the Spark trainer. */
  private def bpeOraclePrefix(k: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH w AS MATERIALIZED (SELECT t.w AS word, count(*) AS freq\n"
    sb ++= "       FROM documents, unnest(string_split(text, ' ')) AS t(w)\n"
    sb ++= "       WHERE length(t.w) >= 1 GROUP BY 1),\n"
    sb ++= "r0 AS MATERIALIZED (SELECT word AS repr, freq FROM w)"
    for (s <- 1 to k) {
      sb ++= s",\np$s AS (SELECT substr(repr, CAST(t.i+1 AS INT), 2) AS pair," +
        s" sum(freq) AS total\n" +
        s"  FROM r${s - 1}, unnest(range(length(repr)-1)) AS t(i) GROUP BY 1),\n"
      sb ++= s"b$s AS MATERIALIZED (SELECT pair, total FROM p$s" +
        s" ORDER BY total DESC, pair LIMIT 1)"
      if (s < k)
        sb ++= s",\nr$s AS MATERIALIZED (SELECT replace(repr," +
          s" (SELECT pair FROM b$s), '${bpePh(s)}') AS repr, freq" +
          s" FROM r${s - 1})"
    }
    sb.result()
  }

  /** Generated train oracle: the prefix plus one expansion CTE per step
    * (e_s = the argmax pair with every EARLIER placeholder replaced by
    * its raw expansion — expansions are fully raw, so replacement order
    * is immaterial) and a k-row UNION ALL of (step, merge_pair, cnt). */
  private def bpeTrainOracle(k: Int): String = {
    val sb = new StringBuilder(bpeOraclePrefix(k))
    for (s <- 1 to k) {
      val ex = (s - 1 to 1 by -1).foldLeft(s"(SELECT pair FROM b$s)") {
        (acc, j) => s"replace($acc, '${bpePh(j)}', (SELECT ex FROM e$j))"
      }
      sb ++= s",\ne$s AS MATERIALIZED (SELECT $ex AS ex)"
    }
    val rows = (1 to k).map(s =>
      s"SELECT $s AS step, (SELECT ex FROM e$s) AS merge_pair," +
        s" CAST((SELECT total FROM b$s) AS BIGINT) AS cnt")
    sb ++= "\nSELECT * FROM (\n" + rows.mkString("\nUNION ALL\n") +
      "\n) ORDER BY step"
    sb.result()
  }

  /** Generated encode oracle: the prefix plus one nested replace chain
    * applying all k learned (placeholder-form) pairs to the corpus text
    * — whole-text replace == per-word application because merges never
    * contain a space. */
  private def bpeEncodeOracle(k: Int): String = {
    val enc = (1 to k).foldLeft("text") { (acc, s) =>
      s"replace($acc, (SELECT pair FROM b$s), '${bpePh(s)}')"
    }
    bpeOraclePrefix(k) +
      s",\nenc AS (SELECT doc_id, text, $enc AS t_enc FROM documents)\n" +
      "SELECT doc_id,\n" +
      "  CAST(length(replace(t_enc, ' ', '')) AS BIGINT) AS n_bpe_symbols,\n" +
      "  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_base_chars\n" +
      "FROM enc ORDER BY doc_id"
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- Language ID: overlapping char-bigram extraction scored against
    // per-language n-gram profiles, argmax with a fixed priority order
    // for ties.
    "td_lang_id" -> QueryDef.sql(
      "char-bigram language-ID heuristic with deterministic argmax")(
      """WITH w AS (SELECT doc_id, lang,
        |  list_transform(range(length(text)-1), i -> substr(text, CAST(i+1 AS INTEGER), 2)) AS bg
        |           FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  len(list_filter(bg, x -> x IN ('th','he','an'))) AS s_en,
        |  len(list_filter(bg, x -> x IN ('ch','ei','en'))) AS s_de,
        |  len(list_filter(bg, x -> x IN ('ll','os','de'))) AS s_es,
        |  len(list_filter(bg, x -> x IN ('ou','le','es'))) AS s_fr,
        |  len(list_filter(bg, x -> x IN ('zh','ng','sh'))) AS s_zh
        |  FROM w)
        |SELECT doc_id,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang,
        |  lang AS actual_lang,
        |  CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
        |  CAST(s_es AS BIGINT) AS s_es, CAST(s_fr AS BIGINT) AS s_fr,
        |  CAST(s_zh AS BIGINT) AS s_zh
        |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), charBigrams(col("text")).as("bg"))
      val scored = base.select((Seq(col("doc_id"), col("lang")) ++
        Profiles.map { case (l, profile) =>
          profileScore(col("bg"), profile).as(s"s_$l")
        }): _*)
      val Seq(en, de, es, fr, zh) =
        Seq("en", "de", "es", "fr", "zh").map(l => col(s"s_$l"))
      scored.select(
        col("doc_id"),
        when(en >= de && en >= es && en >= fr && en >= zh, "en")
          .when(de >= es && de >= fr && de >= zh, "de")
          .when(es >= fr && es >= zh, "es")
          .when(fr >= zh, "fr")
          .otherwise("zh").as("pred_lang"),
        col("lang").as("actual_lang"),
        en.cast("long").as("s_en"), de.cast("long").as("s_de"),
        es.cast("long").as("s_es"), fr.cast("long").as("s_fr"),
        zh.cast("long").as("s_zh"))
        .orderBy("doc_id")
    },

    // ---- Quality scoring: length, lexical diversity, and average word
    // length folded into one bounded score. Every double op mirrors the
    // oracle left-to-right.
    "td_quality_score" -> QueryDef.sql(
      "document quality score from length/diversity/word-length signals")(
      s"""WITH $QualityCte
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
        |  CAST(n_distinct AS DOUBLE) / n_tok AS distinct_ratio,
        |  CAST(n_char - (n_tok - 1) AS DOUBLE) / n_tok AS avg_word_len,
        |  quality_score
        |FROM q ORDER BY doc_id""".stripMargin) { (s, dir) =>
      qualityScored(s, dir).select(
        col("doc_id"),
        col("n_tok").cast("long").as("n_tokens"),
        (col("n_distinct").cast("double") / col("n_tok"))
          .as("distinct_ratio"),
        ((col("n_char") - (col("n_tok") - 1)).cast("double") / col("n_tok"))
          .as("avg_word_len"),
        col("quality_score"))
        .orderBy("doc_id")
    },

    // ---- Histogram quantiles: p50/p95/p99 of the event value per
    // event_type via FIXED 1-unit bins — the deterministic, mergeable,
    // bounded-state percentile path at 100 TB (per-group state ≤ 1024
    // counters; map-side partial aggregation does the heavy lifting;
    // exact-rank quantiles need a full sort, and probabilistic sketches
    // like t-digest/KLL are merge-order-dependent, so neither can be
    // hash-gated cross-engine). Quantile = smallest bin whose
    // cumulative count reaches ceil(q·total), tested in pure integer
    // arithmetic (cum·100 >= q·total) — no float threshold to diverge.
    "td_quantile_hist" -> QueryDef.sql(
      "fixed-bin histogram p50/p95/p99 of value per event_type")(
      """WITH b AS (SELECT event_type,
        |             CAST(least(floor(value), 1023) AS BIGINT) AS bin,
        |             count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, bin, n,
        |        sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |        sum(n) OVER (PARTITION BY event_type) AS total
        |      FROM b)
        |SELECT event_type,
        |  CAST(min(CASE WHEN cum*100 >= 50*total THEN bin END) AS BIGINT)
        |    AS p50_bin,
        |  CAST(min(CASE WHEN cum*100 >= 95*total THEN bin END) AS BIGINT)
        |    AS p95_bin,
        |  CAST(min(CASE WHEN cum*100 >= 99*total THEN bin END) AS BIGINT)
        |    AS p99_bin
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val b = t(s, dir, "events")
        .select(col("event_type"),
          least(floor(col("value")), lit(1023)).cast("long").as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"))
      val c = b
        .withColumn("cum", sum(col("n")).over(
          Window.partitionBy(col("event_type")).orderBy(col("bin"))))
        .withColumn("total", sum(col("n")).over(
          Window.partitionBy(col("event_type"))))
      def q(p: Int): Column =
        min(when(col("cum") * 100 >= lit(p) * col("total"), col("bin")))
          .as(s"p${p}_bin")
      c.groupBy(col("event_type"))
        .agg(q(50), q(95), q(99))
        .orderBy("event_type")
    },

    // ---- Funnel conversion: per user, the first 'signup' event and
    // the first 'purchase' STRICTLY AFTER it — the ordered-sequence
    // analytics primitive (conversion funnels, A→B paths). Two narrow
    // filtered aggregations joined on the user key: no window over the
    // full event stream, so it scales as two shuffles on user_id with
    // map-side partial mins. Timestamp order is total per user within
    // the fixture (event ids tie-break not needed for min()).
    "td_funnel_convert" -> QueryDef.sql(
      "first signup and first purchase-after-signup per user")(
      """WITH e AS (SELECT user_id, lower(event_type) AS et,
        |                  CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s AS (SELECT user_id, min(ts) AS first_signup
        |      FROM e WHERE et = 'signup' GROUP BY user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS first_purchase_after
        |      FROM e JOIN s ON e.user_id = s.user_id
        |      WHERE e.et = 'purchase' AND e.ts > s.first_signup
        |      GROUP BY e.user_id)
        |SELECT s.user_id, s.first_signup, p.first_purchase_after
        |FROM s LEFT JOIN p ON s.user_id = p.user_id
        |ORDER BY s.user_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("user_id"), lower(col("event_type")).as("et"),
          col("ts"))
      val su = e.filter(col("et") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_signup"))
      val pu = e.filter(col("et") === "purchase")
        .join(su, "user_id")
        .filter(col("ts") > col("first_signup"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_purchase_after"))
      su.join(pu, Seq("user_id"), "left")
        .select(col("user_id"), col("first_signup"),
          col("first_purchase_after"))
        .orderBy("user_id")
    },

    // ---- Context-window chunking: split each document into fixed-size
    // overlapping character windows (500 chars, stride 400 — 100-char
    // overlap so no token sequence is cut without a duplicate home),
    // the preprocessing step that turns variable-length documents into
    // training-window candidates. A narrow explode: output rows ∝
    // total corpus characters / stride, each carrying its 60-bit
    // window hash for downstream window-level dedup. No shuffle except
    // the presentation sort.
    "td_chunk_windows" -> QueryDef.sql(
      "overlapping 500-char windows (stride 400) with window hashes")(
      """WITH d AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE length(text) > 0),
        |w AS (SELECT doc_id, CAST(t.i AS INTEGER) AS win_idx,
        |        CAST(t.i*400 + 1 AS BIGINT) AS win_start,
        |        substr(text, CAST(t.i*400 + 1 AS INTEGER), 500) AS wtext
        |      FROM d, unnest(range((len-1)//400 + 1)) AS t(i))
        |SELECT doc_id, win_idx, win_start,
        |       CAST(length(wtext) AS BIGINT) AS win_len,
        |       CAST(('0x'||substr(md5(wtext),1,15)) AS BIGINT) AS win_h60
        |FROM w ORDER BY doc_id, win_idx""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          explode(expr(
            "sequence(0, cast((length(text)-1) div 400 as int))"))
            .as("win_idx"))
        .withColumn("wtext", expr("substring(text, win_idx*400 + 1, 500)"))
        .select(col("doc_id"), col("win_idx"),
          (col("win_idx") * 400L + 1L).as("win_start"),
          length(col("wtext")).cast("long").as("win_len"),
          hash60(col("wtext")).as("win_h60"))
        .orderBy("doc_id", "win_idx")
    },

    // ---- Repeated-passage detection: the exact-substring-dedup shape
    // (Lee et al., "Deduplicating Training Data Makes Language Models
    // Better", ACL'22 — their suffix-array pass finds verbatim spans
    // repeated across documents; the distributed equivalent blocks on
    // fixed-width passage hashes). 12-word sliding windows per doc
    // (fused ShingleHash60 kernel), distinct per doc, then one
    // groupBy(hash) keeps passages appearing in >= 2 documents. Scales
    // as explode + hash-agg: no joins, map-side partial agg does the
    // counting, and rows ∝ total words.
    "td_repeated_passages" -> QueryDef.sql(
      "12-word passages repeated across >=2 documents")(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |hs AS (SELECT doc_id, list_distinct(list_transform(range(len(ws)-11),
        |         i -> CAST(('0x'||substr(md5(array_to_string(ws[i+1:i+12], ' ')),1,15))
        |                AS BIGINT))) AS hs
        |       FROM w WHERE len(ws) >= 12),
        |e AS (SELECT doc_id, unnest(hs) AS h FROM hs)
        |SELECT h AS passage_h60, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM e GROUP BY h HAVING count(*) >= 2
        |ORDER BY passage_h60""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 12)
        .select(col("doc_id"),
          explode(array_distinct(
            shingleHash60(col("ws"), 12, modP = false))).as("h"))
        .groupBy(col("h"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
        .select(col("h").as("passage_h60"), col("n_docs"), col("first_doc"))
        .orderBy("passage_h60")
    },

    // ---- Duplicated-SPAN coverage per document: the removal metric of
    // the exact-substring pass (Lee et al. ACL'22 report and cut
    // maximal repeated spans, not fixed windows). Positions whose
    // 12-gram hash appears in >= 2 documents are merged into maximal
    // spans — a new span starts when the next marked position is > 11
    // away, so each span's token interval [min_i, max_i+11] is disjoint
    // by construction and dup_tokens is an exact union, never a
    // double-count of overlapping windows. Per doc: span count,
    // duplicated tokens, and the dup_ratio a curation pipeline
    // thresholds on. Plan: explode + one hash-agg for the df filter +
    // a semi-join + per-doc windows — rows ∝ total words, shuffles on
    // (h) and (doc_id) only.
    "td_dup_spans" -> QueryDef.sql(
      "maximal cross-doc duplicated spans: count, tokens, ratio per doc")(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |p AS (SELECT doc_id, t.i AS i,
        |        CAST(('0x'||substr(md5(array_to_string(ws[t.i+1:t.i+12], ' ')),1,15))
        |          AS BIGINT) AS h
        |      FROM w, unnest(range(len(ws)-11)) AS t(i)
        |      WHERE len(ws) >= 12),
        |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM p)
        |        GROUP BY h HAVING count(*) >= 2),
        |m AS (SELECT p.doc_id, p.i FROM p JOIN dup ON p.h = dup.h),
        |g AS (SELECT doc_id, i,
        |        CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i)
        |               IS NULL
        |             OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
        |               > 11
        |             THEN 1 ELSE 0 END AS ns FROM m),
        |sid AS (SELECT doc_id, i, sum(ns) OVER
        |          (PARTITION BY doc_id ORDER BY i) AS span_id FROM g),
        |sp AS (SELECT doc_id, span_id, max(i) - min(i) + 12 AS covered
        |       FROM sid GROUP BY 1, 2),
        |pd AS (SELECT doc_id, count(*) AS n_spans,
        |         sum(covered) AS dup_tokens FROM sp GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(pd.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  CAST(COALESCE(pd.dup_tokens, 0) AS DOUBLE)
        |    / CAST(len(string_split(d.text, ' ')) AS DOUBLE) AS dup_ratio
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val pos = t(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 12)
        .select(col("doc_id"), posexplode(
          shingleHash60(col("ws"), 12, modP = false)).as(Seq("i", "h")))
      val dup = pos.select(col("doc_id"), col("h")).distinct()
        .groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("h"))
      val byDoc = Window.partitionBy("doc_id").orderBy("i")
      val lagI = lag(col("i"), 1).over(byDoc)
      val spans = pos.join(dup, Seq("h"), "left_semi")
        .withColumn("ns",
          when(lagI.isNull || col("i") - lagI > 11, 1).otherwise(0))
        .withColumn("span_id", sum(col("ns")).over(
          byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("span_id"))
        .agg((max(col("i")) - min(col("i")) + 12).as("covered"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("covered")).as("dup_tokens"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(words(col("text"))).cast("long").as("n_tokens"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
            col("n_tokens").cast("double")).as("dup_ratio"))
        .orderBy("doc_id")
    },

    // ---- Quality-decile stratification: exact ntile(10) over the
    // composite quality score (same formula as td_quality_score;
    // per-row double arithmetic on exact integer inputs, bit-identical
    // cross-engine, doc_id tie-break for a total order) + per-decile
    // corpus stats — the curriculum/filtering view. The oracle uses
    // DuckDB's ntile; the Spark side does NOT use a global ntile window
    // (a single-reducer sort funnel at 100 TB) — it reuses
    // `operators.SequentialIds` for a distributed exact global rank
    // (range exchange + per-partition offsets) and derives the ntile
    // bucket from (rank, n) with ntile's own integer arithmetic: the
    // first n%10 buckets get ceil(n/10) rows, the rest floor(n/10).
    "td_quality_buckets" -> QueryDef.sql(
      "quality-score deciles with per-decile corpus statistics")(
      s"""WITH $QualityCte,
        |d AS (SELECT *, ntile(10) OVER (ORDER BY quality_score, doc_id)
        |        AS decile FROM q)
        |SELECT CAST(decile AS INTEGER) AS decile, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |       min(quality_score) AS min_score,
        |       max(quality_score) AS max_score
        |FROM d GROUP BY decile ORDER BY decile""".stripMargin) { (s, dir) =>
      val scored = qualityScored(s, dir)
        .select(col("doc_id"), col("n_tok"), col("quality_score").as("score"))
        .withColumn("ord", struct(col("score"), col("doc_id")))
      val n = scored.count()
      val q = n / 10
      val r = n % 10
      val boundary = r * (q + 1)
      graft.operators.SequentialIds.assign(scored, "ord", "rk", 1L)
        .withColumn("decile",
          when(col("rk") <= boundary,
            floor((col("rk") - 1) / lit(q + 1)).cast("int") + 1)
            .otherwise(lit(r.toInt) +
              floor((col("rk") - boundary - 1) / lit(math.max(q, 1L)))
                .cast("int") + 1))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("total_tokens"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .orderBy("decile")
    },

    // ---- Distributed BPE TRAINING (Sennrich et al., "Neural machine
    // translation of rare words with subword units", ACL'16): learn the
    // first TrainMerges (50) merge rules over the corpus vocabulary.
    // Each iteration is one distributed job — adjacent-symbol pair
    // counts (the CharNGrams kernel over the current representation,
    // weighted by word frequency, map-side combined) — plus a 1-row
    // argmax collect; the merge applies as replace() with a private-use
    // placeholder (U+E001..), whose left-to-right non-overlapping
    // semantics are exactly BPE's leftmost-greedy application AND
    // identical in Spark/Java and DuckDB, so the oracle replays the
    // whole 50-round training loop unrolled (generated by
    // bpeTrainOracle — MATERIALIZED CTEs, linear cost). Symbol
    // vocabulary stays per-word (standard BPE); the per-iteration state
    // is the (distinct word, freq) table — O(vocab), not O(corpus) —
    // which is what makes the trainer scale: at 100 TB the pair-count
    // job reduces over the vocabulary, and iterations only re-map that
    // table (lineage truncated every CheckpointEvery rounds, so
    // per-merge cost stays flat — BASELINE.md's BpeStress table).
    // Placeholders assume the corpus has no private-use code points
    // (true of the fixtures). The driver-side argmax-per-iteration is
    // inherent to the algorithm (each merge depends on the previous),
    // not a shortcut.
    "td_bpe_train" -> QueryDef.sql(
      s"first $TrainMerges BPE merges over the corpus vocabulary")(
      bpeTrainOracle(TrainMerges)) { (s, dir) =>
      import s.implicits._
      bpeMergesFor(s, dir)._1.toDF("step", "merge_pair", "cnt")
        .orderBy("step")
    },

    // ---- BPE ENCODING: apply the TrainMerges (50) learned merges to
    // the WHOLE corpus and report per-doc symbol counts — the
    // tokenize-the-corpus step after td_bpe_train's learn step, as one
    // query (train on the vocabulary table, then 50 chained narrow
    // replace() maps over the text — merges never contain a space, so
    // whole-text replace == per-word application). n_bpe_symbols counts
    // non-space symbols after merging (each placeholder = one token);
    // the oracle (generated by bpeEncodeOracle) replays the full
    // train+encode pipeline unrolled.
    "td_bpe_encode" -> QueryDef.sql(
      s"per-doc BPE symbol counts after applying the $TrainMerges learned merges")(
      bpeEncodeOracle(TrainMerges)) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val (_, rawPairs) = bpeMergesFor(s, dir)
      val encoded = rawPairs.foldLeft(col("text")) {
        case (c, (pair, ph)) => call_function("replace", c, lit(pair), lit(ph))
      }
      docs.select(
        col("doc_id"),
        length(call_function("replace", encoded, lit(" "), lit("")))
          .cast("long").as("n_bpe_symbols"),
        length(call_function("replace", col("text"), lit(" "), lit("")))
          .cast("long").as("n_base_chars"))
        .orderBy("doc_id")
    },

    // ---- Token counting: whitespace tokens, distinct tokens, and a
    // BPE-ish fixed-width regex chunking ([a-z]{1,4} greedy max-munch —
    // identical under Java regex and RE2).
    "td_token_count" -> QueryDef.sql(
      "whitespace/distinct/BPE-ish-regex token counts per document")(
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |    AS n_distinct_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT)
        |    AS n_bpe_chunks,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val ws = words(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(ws).cast("long").as("n_ws_tokens"),
        size(array_distinct(ws)).cast("long").as("n_distinct_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]{1,4}"), lit(0)))
          .cast("long").as("n_bpe_chunks"),
        length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // ---- Unicode NFC normalization: canonical composition BEFORE
    // hashing/dedup, so visually-identical strings ("é" composed vs
    // "e"+U+0301 combining) produce identical digests — skipping this
    // pass silently splits duplicate groups on real-world text. The
    // fixture text is ASCII, so a decomposed-accent suffix is appended
    // to make the normalization observable; the custom codegen'd
    // [[graft.functions.NfcNormalize]] matches DuckDB's nfc_normalize
    // byte-for-byte (both implement Unicode canonical composition).
    "td_unicode_normalize" -> QueryDef.sql(
      "NFC canonical composition changes lengths and digests")(
      """SELECT doc_id,
        |  length(text || ' cafe' || chr(769)) AS len_raw,
        |  length(nfc_normalize(text || ' cafe' || chr(769))) AS len_nfc,
        |  CAST(('0x'||substr(md5(nfc_normalize(text || ' cafe' || chr(769))),1,15))
        |    AS BIGINT) AS fp_nfc
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // decomposed on purpose: 'e' + U+0301 combining acute (as an
      // explicit escape so no editor re-composes it), matching the
      // oracle's chr(769) — NFC has real composition work to do
      val raw = concat(col("text"), lit(" cafe\u0301"))
      t(s, dir, "documents").select(
        col("doc_id"),
        length(raw).as("len_raw"),
        length(nfc(raw)).as("len_nfc"),
        hash60(nfc(raw)).as("fp_nfc"))
        .orderBy("doc_id")
    },

    // ---- Okapi BM25 top term per document (k1=1.2, b=0.75): the
    // retrieval-grade relevance scorer — tf saturation + document-length
    // normalization against the corpus average, idf in the RATIONAL form
    // (N - df + 0.5)/(df + 0.5) (the argument of BM25's log; log is
    // monotone, so ranking is identical and the score avoids
    // libm-dependent ln for the cross-engine hash gate). Corpus stats
    // (N, avgdl) are a one-row aggregate broadcast to every scorer —
    // the same train-then-broadcast shape as td_lm_surprisal, so no
    // per-row shuffle for the stats at any scale. Both engines evaluate
    // the identical IEEE op order, so scores are bit-exact.
    "td_bm25" -> QueryDef.sql(
      "top BM25-scored term per doc (rational idf, broadcast corpus stats)")(
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
        |dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id),
        |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
        |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) AS total
        |       FROM dl),
        |s AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |        (CAST(tf.tf AS DOUBLE) * 2.2 /
        |          (CAST(tf.tf AS DOUBLE) +
        |           1.2 * (0.25 + 0.75 *
        |             (CAST(dl.dl AS DOUBLE) / (st.total / st.n_docs))))) *
        |        ((CAST(st.n_docs AS DOUBLE) - df.df + 0.5) /
        |         (CAST(df.df AS DOUBLE) + 0.5)) AS score
        |      FROM tf JOIN dl USING (doc_id) JOIN df USING (word)
        |      CROSS JOIN st),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY doc_id ORDER BY score DESC, word) AS rk FROM s)
        |SELECT doc_id, word AS top_term, CAST(tf AS BIGINT) AS tf,
        |       CAST(df AS BIGINT) AS df, score
        |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = t(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("word"))
      val tf = w.groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      val dl = w.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val df = w.groupBy(col("word")).agg(countDistinct(col("doc_id")).as("df"))
      val st = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).cast("double").as("total"))
      // op order mirrors the oracle SQL exactly — every +,*,/ is a
      // correctly-rounded IEEE op, so identical order = identical bits
      val norm = col("tf").cast("double") * 2.2 /
        (col("tf").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast("double") / (col("total") / col("n_docs")))))
      val idf = (col("n_docs").cast("double") - col("df") + 0.5) /
        (col("df").cast("double") + 0.5)
      val win = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("word"))
      tf.join(dl, "doc_id").join(df, "word")
        .crossJoin(broadcast(st))
        .withColumn("score", norm * idf)
        .withColumn("rk", row_number().over(win))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("word").as("top_term"),
          col("tf").cast("long").as("tf"), col("df").cast("long").as("df"),
          col("score"))
        .orderBy("doc_id")
    },

    // ---- TF-IDF-style top term per document: explode → tf groupBy →
    // df groupBy → join → window rank. The one genuinely multi-shuffle
    // text query; score is the rational tf/df (same ranking as tf·N/df,
    // no cross-libm log).
    "td_tfidf_top_term" -> QueryDef.sql(
      "top tf/df-scored term per document (explode + two aggs + window)")(
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
        |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
        |s AS (SELECT doc_id, word, tf, df, CAST(tf AS DOUBLE) / df AS score
        |      FROM tf JOIN df USING (word)),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY doc_id ORDER BY score DESC, word) AS rnk FROM s)
        |SELECT doc_id, word AS top_term, CAST(tf AS BIGINT) AS tf,
        |       CAST(df AS BIGINT) AS df, score
        |FROM r WHERE rnk = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = t(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("word"))
      val tf = w.groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      val df = w.groupBy(col("word"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val win = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("word"))
      tf.join(df, "word")
        .withColumn("score", col("tf").cast("double") / col("df"))
        .withColumn("rnk", row_number().over(win))
        .filter(col("rnk") === 1)
        .select(col("doc_id"), col("word").as("top_term"),
          col("tf").cast("long").as("tf"), col("df").cast("long").as("df"),
          col("score"))
        .orderBy("doc_id")
    },

    // ---- Corpus statistics report: per (source, lang) aggregate of the
    // per-document token metrics. All ratios are computed AFTER exact
    // integer sums (a direct avg() over doubles would depend on
    // accumulation order and break cross-engine parity).
    "td_corpus_stats" -> QueryDef.sql(
      "per-source/lang corpus report from exact integer sums")(
      """WITH m AS (SELECT source, lang,
        |             len(string_split(text, ' ')) AS n_tok,
        |             len(list_distinct(string_split(text, ' '))) AS n_dis,
        |             length(text) AS n_chr
        |           FROM documents)
        |SELECT source, lang, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |       CAST(sum(n_chr) AS BIGINT) AS total_chars,
        |       CAST(sum(n_tok) AS DOUBLE) / count(*) AS avg_tokens,
        |       CAST(sum(n_dis) AS DOUBLE) / sum(n_tok) AS distinct_ratio
        |FROM m GROUP BY source, lang ORDER BY source, lang""".stripMargin) { (s, dir) =>
      val ws = words(col("text"))
      t(s, dir, "documents")
        .select(col("source"), col("lang"), size(ws).as("n_tok"),
          size(array_distinct(ws)).as("n_dis"),
          length(col("text")).as("n_chr"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          sum(col("n_chr")).as("total_chars"),
          sum(col("n_tok")).cast("double").as("sum_tok_d"),
          sum(col("n_dis")).cast("double").as("sum_dis_d"))
        .select(col("source"), col("lang"), col("n_docs"),
          col("total_tokens"), col("total_chars"),
          (col("sum_tok_d") / col("n_docs")).as("avg_tokens"),
          (col("sum_dis_d") / col("total_tokens")).as("distinct_ratio"))
        .orderBy("source", "lang")
    },

    // ---- Character-bigram LM surprisal scoring — the two-stage
    // train/apply shape of a KenLM-style quality filter: stage 1 trains
    // the model ON the corpus (bigram + context counts, two groupBys),
    // stage 2 broadcasts it as a one-row map and scores every document
    // with a per-row fold. Surprisal is the mean INVERSE conditional
    // frequency count(c1·)/count(c1c2) — deliberately log-free: +, /
    // on exactly-represented integers are correctly-rounded IEEE ops in
    // both engines, whereas ln() is libm-dependent and would break the
    // hash gate. Higher = more unusual character sequences.
    "td_lm_surprisal" -> QueryDef.sql(
      "corpus-trained char-bigram LM surprisal per document")(
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 2),
        |bg AS (SELECT doc_id, list_transform(range(length(text)-1),
        |         i -> substr(text, CAST(i+1 AS INTEGER), 2)) AS bgs FROM d),
        |bgc AS (SELECT b, count(*) AS cnt
        |        FROM (SELECT unnest(bgs) AS b FROM bg) GROUP BY b),
        |ctx AS (SELECT substr(b, 1, 1) AS c, CAST(sum(cnt) AS BIGINT) AS total
        |        FROM bgc GROUP BY 1),
        |mb AS (SELECT map(list(b), list(cnt)) AS mb FROM bgc),
        |mc AS (SELECT map(list(c), list(total)) AS mc FROM ctx)
        |SELECT doc_id, len(bgs) AS n_bigrams,
        |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(bgs, x ->
        |           CAST(mc[substr(x, 1, 1)][1] AS DOUBLE) /
        |           CAST(mb[x][1] AS DOUBLE))),
        |         (a, b) -> a + b) / len(bgs) AS surprisal
        |FROM bg, mb, mc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // one-pass n-gram kernel, not the O(L²) substr form: this query
      // extracts every document's bigrams twice (model training + the
      // scoring fold), so extraction dominates its runtime
      val docs = t(s, dir, "documents").filter(length(col("text")) >= 2)
      val bg = docs.select(col("doc_id"), charNGrams(col("text"), 2).as("bgs"))
      val counts = bg.select(explode(col("bgs")).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
      // the model folds to ONE broadcast map: per-bigram ratio
      // total(context)/count(bigram), precomputed on the model side
      // (≤ charset² rows) so the hot per-document fold does a single
      // element_at instead of two lookups + a substring per bigram. The
      // division operands are the same doubles as the per-element form,
      // so the fold's IEEE sum — and the driver hash — is unchanged.
      val ctx = counts
        .groupBy(substring(col("b"), 1, 1).as("c"))
        .agg(sum(col("cnt")).cast("long").as("total"))
      val ratioMap = counts
        .join(broadcast(ctx), substring(col("b"), 1, 1) === col("c"))
        .select(col("b"),
          (col("total").cast("double") / col("cnt").cast("double")).as("r"))
        .agg(map_from_entries(collect_list(struct(col("b"), col("r"))))
          .as("mr"))
      // hash-indexed ordered fold (MapRatioFold): same doubles, same
      // IEEE add order as aggregate+element_at — but element_at on a
      // map is a LINEAR SCAN per element, which made this fold
      // O(bigrams × model size) and the query 9.2 s warm at sf0.1
      bg.crossJoin(broadcast(ratioMap))
        .select(col("doc_id"), size(col("bgs")).as("n_bigrams"),
          (mapRatioFold(col("bgs"), col("mr")) /
            size(col("bgs"))).as("surprisal"))
        .orderBy("doc_id")
    },

    // ---- Repetition detection (the Gopher-style repeated-n-gram
    // filter): fraction of a document's word 3-grams that are repeats.
    // Narrow per-row map over the same shingle hashes the dedup layer
    // uses; the ratio is IEEE-exact cross-engine (same BIGINT counts,
    // same double division).
    "td_repetition" -> QueryDef.sql(
      "repeated word-3-gram ratio per document (repetition filter)")(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |hs AS (SELECT doc_id, list_transform(range(len(ws)-2),
        |         i -> CAST(('0x'||substr(md5(ws[i+1]||' '||ws[i+2]||' '||ws[i+3]),1,15))
        |                AS BIGINT) % 1000000007) AS hs
        |       FROM w WHERE len(ws) >= 3),
        |c AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_ngrams,
        |        CAST(len(list_distinct(hs)) AS BIGINT) AS n_distinct FROM hs)
        |SELECT doc_id, n_ngrams, n_distinct,
        |       1.0 - n_distinct / n_ngrams AS rep_ratio,
        |       (1.0 - n_distinct / n_ngrams) > 0.5 AS is_repetitive
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val ws = words(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), ws.as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"),
          shingleHash60(col("ws"), 3, modP = true).as("hs"))
        .select(col("doc_id"),
          size(col("hs")).cast("long").as("n_ngrams"),
          size(array_distinct(col("hs"))).cast("long").as("n_distinct"))
        .withColumn("rep_ratio",
          lit(1.0) - col("n_distinct").cast("double") /
            col("n_ngrams").cast("double"))
        .withColumn("is_repetitive", col("rep_ratio") > 0.5)
        .orderBy("doc_id")
    },

    // ---- Weighted mixture sampling — the data-mixing primitive (keep
    // e.g. 100% of curated sources, a fraction of crawl): per-source
    // keep-rate applied by deterministic hash threshold, so the sample
    // is stable, exactly reproducible, and composable with the split.
    // Pure narrow map; the rate table is a compile-time spec here and a
    // broadcast dim in a deployment.
    "td_sample_mixture" -> QueryDef.sql(
      "per-source weighted mixture sample via hash threshold")(
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
        |      % 1000 AS h,
        |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1000
        |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 500
        |         ELSE 250 END AS keep_millis
        |  FROM documents)
        |WHERE h < keep_millis ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val keepMillis = when(
          col("source").isin("src0", "src1", "src2", "src3", "src4"), 1000)
        .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 500)
        .otherwise(250)
      t(s, dir, "documents")
        .withColumn("h", hash60(col("doc_id").cast("string")) % 1000)
        .filter(col("h") < keepMillis)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    },

    // ---- Deterministic dataset split: hash-bucket every document into
    // train/val/test (90/5/5) on the cross-engine md5-prefix of its id.
    // Content- and order-independent, so the split is stable under
    // re-partitioning, re-ingestion, and incremental appends — the
    // property a training pipeline needs from a split. Pure narrow map.
    "td_split_assign" -> QueryDef.sql(
      "stable hash-based train/val/test split (90/5/5)")(
      """SELECT doc_id, bucket,
        |       CASE WHEN bucket < 90 THEN 'train'
        |            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
        |          % 100 AS bucket
        |      FROM documents) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          (hash60(col("doc_id").cast("string")) % 100).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val")
            .otherwise("test"))
        .orderBy("doc_id")
    },

    // ---- Sequence packing: the concatenate-and-chunk step between
    // curation and training — docs in stable doc_id order concatenate
    // into a token stream sliced into fixed 2048-token blocks; each doc
    // gets the block it starts in, its offset there, and how many block
    // boundaries it straddles. The running token total comes from the
    // distributed PrefixSum operator (range exchange + per-partition
    // offsets), NOT a global sum() OVER () window, which would funnel
    // the corpus through one task. Oracle: DuckDB's single-node window
    // replays the same cumulative sum.
    "td_pack_sequences" -> QueryDef.sql(
      "token-budget sequence packing over a distributed running total")(
      """WITH tok AS (SELECT doc_id,
        |               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |             FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM tok)
        |SELECT doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS pack_offset,
        |  CAST((cum - 1) // 2048 - (cum - n_tokens) // 2048 AS BIGINT)
        |    AS n_boundary_crossings
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = t(s, dir, "documents").select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      graft.operators.PrefixSum
        .withRunningTotal(toks, "doc_id", "n_tokens", "cum")
        .select(col("doc_id"), col("n_tokens"),
          expr("(cum - n_tokens) div 2048").as("pack_id"),
          ((col("cum") - col("n_tokens")) % 2048).as("pack_offset"),
          expr("(cum - 1) div 2048 - (cum - n_tokens) div 2048")
            .as("n_boundary_crossings"))
        .orderBy("doc_id")
    },

    // ---- Normalization + PII redaction: the text-cleanup curation step
    // (lowercase, whitespace collapse, email/phone → placeholder tokens).
    // The fixture has no natural PII, so each doc gets a deterministic
    // injected contact line first — the redactor then has exactly one
    // email and one phone to find, plus whatever the raw text contains,
    // and the md5 of the redacted result proves replacement semantics
    // match across engines. Patterns avoid Java-vs-RE2 divergence:
    // character classes + bounded quantifiers only, explicit whitespace
    // class (RE2's \s lacks \x0B).
    "td_normalize_redact" -> QueryDef.sql(
      "lowercase/whitespace-normalize + email/phone redaction")(
      """WITH inj AS (SELECT doc_id,
        |    text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      AS t FROM documents),
        |norm AS (SELECT doc_id,
        |    trim(regexp_replace(lower(t), '[ \t\n\r]+', ' ', 'g')) AS t
        |  FROM inj)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}')) AS BIGINT)
        |    AS n_phones,
        |  md5(regexp_replace(regexp_replace(t,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS red_hash
        |FROM norm ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{4}"
      val norm = t(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"),
          lit(" contact: user"), col("doc_id").cast("string"),
          lit("@example.com or 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("t"))
        .select(col("doc_id"),
          trim(regexp_replace(lower(col("t")), "[ \t\n\r]+", " ")).as("t"))
      norm.select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(phoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(regexp_replace(
          regexp_replace(col("t"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").cast("binary")).as("red_hash"))
        .orderBy("doc_id")
    },

    // ---- Document fingerprinting: a 31-ary rolling hash over characters
    // (mod P, exact integer math) plus the cross-engine md5-prefix hash.
    "td_fingerprint" -> QueryDef.sql(
      "rolling-hash + md5-prefix document fingerprints")(
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ''),
        |      c -> CAST(unicode(c) AS BIGINT))),
        |    (a, b) -> (a*31 + b) % 1000000007) AS fp_rolling,
        |  CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        aggregate(split(col("text"), ""), lit(0L),
          (acc, ch) => (acc * 31 + ascii(ch)) % lit(1000000007L))
          .as("fp_rolling"),
        hash60(col("text")).as("fp_md5"))
        .orderBy("doc_id")
    },

    // ---- Collocation extraction: adjacent word-bigram association by
    // PMI lift. PMI itself is log(lift); log is libm-dependent across
    // engines, and log is monotone — so the score IS the rational lift
    // c12·N² / (c1·c2·B) (N = unigram total, B = bigram total),
    // evaluated in one fixed-association double expression over exact
    // integer counts (c12·N² ≤ 7.4e14 at sf0.1 — inside 2^53, so even
    // the products are exact). Bigrams via zip_with over two array
    // slices (no self-join); counts are two map-side-partial groupBys;
    // totals ride one broadcast scalar row. The final global row_number
    // window is single-partition BY DESIGN: its input is the distinct-
    // bigram table, bounded by |vocab|² — not corpus-sized — so it stays
    // tiny at 100 TB while every corpus-sized stage above it is a
    // map-side-partial shuffle.
    "td_pmi_collocations" -> QueryDef.sql(
      "top-50 adjacent-bigram collocations by rational PMI lift")(
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
        |            FROM documents),
        |uni AS (SELECT w, count(*) AS c FROM (
        |          SELECT unnest(toks) AS w FROM tk) GROUP BY 1),
        |bg AS (SELECT toks[t.k+1] AS w1, toks[t.k+2] AS w2
        |       FROM tk, unnest(range(len(toks)-1)) AS t(k)
        |       WHERE len(toks) >= 2),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |st AS (SELECT (SELECT sum(c) FROM uni) AS n_tok,
        |              (SELECT sum(c12) FROM big) AS n_big),
        |sc AS (SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
        |         CAST(b.c12 AS DOUBLE) * st.n_tok * st.n_tok /
        |           (CAST(u1.c AS DOUBLE) * u2.c * st.n_big) AS lift
        |       FROM big b JOIN uni u1 ON b.w1 = u1.w
        |                  JOIN uni u2 ON b.w2 = u2.w
        |       CROSS JOIN st)
        |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT)
        |         AS c1, CAST(c2 AS BIGINT) AS c2, lift,
        |       CAST(rnk AS INTEGER) AS rnk FROM (
        |  SELECT *, row_number() OVER (ORDER BY lift DESC, w1, w2) AS rnk
        |  FROM sc)
        |WHERE rnk <= 50 ORDER BY rnk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tk = t(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("toks"))
      val uni = tk.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val big = tk.filter(size(col("toks")) >= 2)
        .select(explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val st = uni.agg(sum(col("c")).as("n_tok"))
        .crossJoin(big.agg(sum(col("c12")).as("n_big")))
      val u1 = uni.select(col("w").as("uw1"), col("c").as("c1"))
      val u2 = uni.select(col("w").as("uw2"), col("c").as("c2"))
      // op order mirrors the oracle SQL exactly (see BM25 note above)
      val lift = col("c12").cast("double") * col("n_tok") * col("n_tok") /
        (col("c1").cast("double") * col("c2") * col("n_big"))
      val win = Window.orderBy(col("lift").desc, col("w1"), col("w2"))
      big.join(broadcast(u1), col("w1") === col("uw1"))
        .join(broadcast(u2), col("w2") === col("uw2"))
        .crossJoin(broadcast(st))
        .withColumn("lift", lift)
        .withColumn("rnk", row_number().over(win))
        .filter(col("rnk") <= 50)
        .select(col("w1"), col("w2"), col("c12").cast("long").as("c12"),
          col("c1").cast("long").as("c1"), col("c2").cast("long").as("c2"),
          col("lift"), col("rnk").cast("int").as("rnk"))
        .orderBy("rnk")
    }
  )
}
