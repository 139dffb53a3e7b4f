package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline layer
  * (SURVEY.md §7.1 step 9): exact, n-gram Jaccard, MinHash-LSH, SimHash,
  * and embedding-cosine near-dup — each over the driver `documents` /
  * `embeddings` tables with a bit-exact DuckDB oracle.
  *
  * Scale design: no query here compares all O(n²) pairs. Candidate
  * generation is always an equi-join on a deterministic blocking key
  * (min-shingle-hash, LSH band, SimHash band, IVF-style label cell), so the
  * physical plan is shuffle-on-key + verify, which survives a 100×
  * scale-up. The oracles replay the same blocking, so Spark and DuckDB
  * produce identical rows.
  *
  * Determinism: all hashes are the cross-engine 60-bit md5 prefix
  * ([[graft.functions.GraftFunctions.hash60]]); all float folds are
  * ascending-index IEEE left folds (see [[graft.functions.DotProduct]]).
  */
object DedupQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Persist once per canonical plan (same guard discipline as
    * operators/Butterfly.scala): the verified-pair table is bounded by
    * the corpus's actual near-dup fraction, and persisting it lets the
    * warm rebuilds every harness performs (cold+warm bench runs, the
    * three cluster-consumer queries) read it instead of re-running the
    * shingle + minhash + band-join stages. Standard persisted-Dataset
    * staleness applies: a rewritten corpus path needs
    * `spark.catalog.clearCache()` (the label MEMO below re-keys itself
    * by fingerprint, but plan-keyed caches cannot). */
  private def cachedIfCold(df: DataFrame): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df

  /** DuckDB CTE prefix: distinct 3-shingle hashes (mod P), mirroring the
    * per-doc leg of [[shingleGroups]]. Dedup/Jaccard run over the
    * *hashed* shingles (long arrays, primitive hash-set set-ops, small
    * shuffle payload) — never over the raw shingle strings. */
  private val ShingleCte =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |hs AS (SELECT doc_id, list_distinct(list_transform(range(len(ws)-2),
      |         i -> CAST(('0x'||substr(md5(ws[i+1]||' '||ws[i+2]||' '||ws[i+3]),1,15))
      |                AS BIGINT) % 1000000007)) AS hs
      |       FROM w WHERE len(ws) >= 3)""".stripMargin

  /** DuckDB CTE prefix: L2-normalized double embeddings, norm computed as
    * the same ascending fold the codegen'd dot product uses. */
  private val NormCte =
    """WITH vd AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vd
      |            FROM embeddings),
      |nr AS (SELECT vec_id, label, vd,
      |         sqrt(list_reduce(list_transform(range(len(vd)),
      |           i -> vd[i+1]*vd[i+1]), (a,b) -> a+b)) AS nrm FROM vd),
      |n AS (SELECT vec_id, label,
      |        list_transform(vd, x -> x / nrm) AS an FROM nr)""".stripMargin

  /** Exact-duplicate contraction for the shingle-based near-dup queries.
    * Every similarity signal downstream (minhash signature, LSH band,
    * blocking key, Jaccard) is a pure function of the text, so docs with
    * identical text are fully interchangeable — the pair machinery runs
    * once per DISTINCT text and expands, instead of going quadratic
    * inside every duplicate group before verification (the dominant cost
    * on real corpora, where boilerplate pages duplicate millions of
    * times). Contraction is keyed on (md5, xxhash64, length) of the
    * text: the groupBy's map-side
    * partial keeps ONE text per digest per task, so the heavy payload
    * (text/shingles) shuffles once per distinct text while the
    * membership map shuffles only (doc_id, digest) pairs. Two distinct
    * texts with an identical shingle set stay separate reps and meet in
    * the band join as an ordinary jaccard-1.0 pair, so the contraction
    * is purely an optimization, never a semantic filter.
    *
    * Returns (repHs = (doc_id, hs) one row per distinct text that
    * passes the >=3-word gate, members = (doc_id, rep) for every doc in
    * such a group — exactly the docs the uncontracted machinery admits).
    */
  /** Scale gate for the materialize-once contraction pass (VERDICT r18
    * #1 / round 19). The shingleGroups/simhash contraction subtree is
    * referenced 5-10× per consumer plan, so without materialization the
    * corpus is re-scanned and re-shingled once per reference. The cost
    * model flips with corpus size:
    *
    *  - BELOW the gate (fixture scale), materializing LOSES — measured
    *    in round 18 (minhash_lsh cold 7.1→23.1 s with an unconditional
    *    checkpoint): the duplicate subtrees hide in idle cores as
    *    parallel broadcast-build jobs, ExistingRDD consumers lose
    *    pruning/fusion, and the barrier serializes the plan.
    *  - ABOVE it, the duplicated scan+shingle CPU dominates every one of
    *    those effects (there are no idle cores once one scan saturates
    *    the session), and one checkpointed pass wins — the round-19 rung
    *    study in OPTIMIZATION_r19.md locates the crossover.
    *
    * The threshold is SESSION-DERIVED, never a local constant: idle-core
    * hiding is what makes small corpora favor recompute, so the
    * crossover scales with core count — gate on documents bytes ≥
    * perCoreBytes × defaultParallelism (perCoreBytes from the rung
    * study, overridable via `spark.graft.dedup.materializePerCoreBytes`;
    * `spark.graft.dedup.materialize` = on/off forces either side for
    * A/B). A size-listing error fails CLOSED (pathBytes -1 < any gate).
    * Results are unchanged on both sides — localCheckpoint is
    * semantics-preserving and each query build re-materializes from the
    * parquet inputs (nothing is reused across runs). */
  private[graft] def materializeContraction(s: SparkSession, dir: String)
      : Boolean =
    s.conf.getOption("spark.graft.dedup.materialize").getOrElse("auto") match {
      case "on" => true
      case "off" => false
      case _ =>
        val perCore = s.conf
          .getOption("spark.graft.dedup.materializePerCoreBytes")
          .map(_.toLong).getOrElse(DefaultMaterializePerCoreBytes)
        Tables.pathBytes(s, s"$dir/documents.parquet") >=
          perCore * s.sparkContext.defaultParallelism
    }

  /** Crossover bytes-per-core for [[materializeContraction]], measured
    * by the round-19 StressSmoke rung study (OPTIMIZATION_r19.md
    * §materialize-once; 32 cores): recompute still won cold at the
    * 50×/28.8 MB rung (minhash_lsh 12.5 vs 20.1 s), the checkpoint won
    * at 100×/58.1 MB (87.2 vs 111.7 s, simhash a wash) and above —
    * the default sits at the bracket midpoint, 1.34 MiB/core ≈ 43 MB
    * on the 32-core study box. */
  private[graft] val DefaultMaterializePerCoreBytes = 1400000L

  private def shingleGroups(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // digest = (md5, xxhash64, length): an md5 collision between distinct
    // texts would silently merge their rep groups (fabricating jaccard-1.0
    // pairs); requiring a SIMULTANEOUS collision of two unrelated hash
    // families plus equal length puts that beyond even adversarial corpora,
    // while the key stays fixed-width for the shuffle (no full-text compare)
    val keyed = t(s, dir, "documents")
      .select(col("doc_id"),
        struct(md5(col("text").cast("binary")),
          xxhash64(col("text")), length(col("text"))).as("_dig"),
        col("text"))
    val reps = keyed.groupBy(col("_dig"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
    val ws = words(col("text"))
    val repHs0 = reps
      .select(col("_dig"), col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("_dig"), col("doc_id"),
        array_distinct(shingleHash60(col("ws"), 3, modP = true)).as("hs"))
    // Materialize-once above the scale gate (see materializeContraction):
    // one scan+shingle pass feeds every downstream reference instead of
    // one per reference. LAZY localCheckpoint — materialized by the
    // consuming query's own first action, re-done per build, never
    // shared across runs. `members` is checkpointed too ((doc_id, rep),
    // two longs/row): its digest scan of the corpus is otherwise
    // duplicated once per expansion join.
    val repHs = if (materializeContraction(s, dir))
      repHs0.localCheckpoint(false) else repHs0
    val members0 = keyed.select(col("doc_id"), col("_dig"))
      .join(repHs.select(col("_dig"), col("doc_id").as("rep")), "_dig")
      .select(col("doc_id"), col("rep"))
    val members = if (materializeContraction(s, dir))
      members0.localCheckpoint(false) else members0
    (repHs.select(col("doc_id"), col("hs")), members)
  }

  /** MinHash-LSH candidates verified at Jaccard >= 0.5 BETWEEN distinct
    * texts (rep level): band → bucket equi-join → exact verify.
    * Identical-text (within-group) pairs are jaccard 1.0 by construction
    * and handled at expansion time. */
  private def minhashVerifiedRepPairs(sh: DataFrame,
      persistPairs: Boolean = true): DataFrame = {
    val sig = sh.select(col("doc_id"), minhashSig(col("hs"), 8).as("sig"))
    val bandArr = transform(sequence(lit(0), lit(3)), b =>
      concat_ws("_", b, element_at(col("sig"), b * 2 + 1),
        element_at(col("sig"), b * 2 + 2)))
    val bands = sig.select(col("doc_id"), explode(bandArr).as("bkey"))
    val cand = bands.select(col("doc_id").as("a_id"), col("bkey"))
      .join(bands.select(col("doc_id").as("b_id"), col("bkey").as("bkey_y")),
        col("bkey") === col("bkey_y") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val pairs = cand
      .join(sh.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
      .select(col("a_id"), col("b_id"),
        jaccard(col("a_hs"), col("b_hs")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    // persistPairs=false rides the materialize-once gate: a checkpointed
    // `sh` makes this plan's canonical form unique PER BUILD (ExistingRDD
    // identity), so cachedIfCold would persist a never-hit new copy every
    // build — a storage leak with zero reuse. Above the gate each build
    // recomputes the pair join from the checkpointed contraction instead
    // (one linear band join; the corpus passes are already deduplicated
    // by the checkpoint).
    if (persistPairs) cachedIfCold(pairs) else pairs
  }

  /** All verified near-dup DOC pairs: rep-level pairs expanded to member
    * pairs across groups, plus the within-group pairs (identical sets,
    * jaccard exactly 1.0 in both engines). Provably the same set the
    * uncontracted machinery produces: band match and jaccard are
    * functions of `hs` alone. */
  private def minhashVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val (repHs, m) = shingleGroups(s, dir)
    val cross = minhashVerifiedRepPairs(repHs,
        persistPairs = !materializeContraction(s, dir))
      .join(m.select(col("rep").as("a_id"), col("doc_id").as("x")), "a_id")
      .join(m.select(col("rep").as("b_id"), col("doc_id").as("y")), "b_id")
      .select(least(col("x"), col("y")).as("a_id"),
        greatest(col("x"), col("y")).as("b_id"), col("jaccard"))
    val within = m.select(col("rep"), col("doc_id").as("a_id"))
      .join(m.select(col("rep").as("rep_y"), col("doc_id").as("b_id")),
        col("rep") === col("rep_y") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  /** The oracle CTE chain mirroring [[minhashVerifiedPairs]]. */
  private val VerifiedPairsCte =
    s"""$ShingleCte,
      |sig AS (SELECT doc_id, list_transform(range(8), k ->
      |          list_min(list_transform(hs,
      |            h -> ((2*k+3)*h + (5*k+7)) % 1000000007))) AS sig
      |        FROM hs),
      |bands AS (SELECT doc_id,
      |            b::VARCHAR || '_' || sig[2*b+1]::VARCHAR || '_' ||
      |            sig[2*b+2]::VARCHAR AS bkey
      |          FROM sig, (SELECT unnest([0,1,2,3]) AS b)),
      |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
      |         FROM bands x JOIN bands y
      |           ON x.bkey = y.bkey AND x.doc_id < y.doc_id),
      |verified AS (SELECT a_id, b_id, jaccard FROM (
      |  SELECT a_id, b_id,
      |         len(list_intersect(a.hs, b.hs)) /
      |           len(list_distinct(list_concat(a.hs, b.hs))) AS jaccard
      |  FROM cand JOIN hs a ON cand.a_id = a.doc_id
      |            JOIN hs b ON cand.b_id = b.doc_id)
      |  WHERE jaccard >= 0.5)""".stripMargin

  /** Connected-component labels (id, label = component min doc_id) over
    * the verified near-dup edge set (shared by the cluster and corpus
    * queries) — large-star/small-star contraction
    * ([[graft.operators.ConnectedComponents]]): O(log diameter) rounds,
    * flat lineage via per-round localCheckpoint, one action per round.
    */
  private[queries] val labelsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]()

  /** Stable per-session id for memo keys. `System.identityHashCode` is
    * NOT unique — a collision between two live sessions would hand one
    * session a DataFrame owned by another (ADVICE r10) — so use the
    * session's own UUID ([[org.apache.spark.sql.graft.SessionShim]]). */
  private def sessionId(s: SparkSession): String =
    org.apache.spark.sql.graft.SessionShim.sessionId(s)

  /** Memoized [[computeDupClusterLabels]]: the label table is a
    * deterministic artifact of the corpus version, but computing it
    * runs the large-star/small-star loop with one driver ACTION and a
    * localCheckpoint per round — work the cache manager cannot dedupe
    * across query builds (checkpointed plans are never canonically
    * equal). Without the memo every build of the three cluster
    * consumers (td_dedup_clusters / td_dedup_corpus /
    * td_curated_corpus), warm bench runs included, re-paid the whole
    * CC loop. Keyed by `<sessionUUID>/<path>` (a DataFrame must not
    * leak across sessions) with the per-file
    * [[graft.Tables.pathFingerprint]] digest validated in the VALUE: a
    * rewritten or grown corpus recomputes, never serves stale labels,
    * and the superseded vintage's persisted label table is unpersisted
    * and REPLACED, not accumulated (VERDICT r10 #1). A fingerprint
    * re-key also refreshes every plan-keyed cache layer BENEATH the
    * memo ([[minhashVerifiedRepPairs]]'s persisted pair table): an
    * externally rewritten corpus — no same-session write, so Spark's
    * own recacheByPath never fires — would otherwise rebuild fresh
    * labels from a stale persisted pair table (ADVICE r10). A listing
    * error computes WITHOUT memoizing (never-matching stamp, see
    * [[graft.Memo.isErrorFingerprint]]). The cached value is the
    * persisted label table, bounded by the corpus's duplicate subset —
    * the artifact a production pipeline would write between stages. */
  private def dupClusterLabels(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    graft.Memo.memoized(labelsCache, s"${sessionId(s)}/$path",
        graft.Tables.pathFingerprint(s, path))(
      cachedIfCold(computeDupClusterLabels(s, dir)))(
      onEvict = _.unpersist(),
      onMiss = () => s.catalog.refreshByPath(path))
  }

  /** Lifecycle hook mirroring [[graft.operators.Butterfly.releaseCaches]]:
    * drop and unpersist this session's memoized label table for `dir`
    * and the plan-keyed persisted verified-pairs table beneath it, so a
    * long-lived session iterating over many corpora reclaims executor
    * storage without `spark.catalog.clearCache()` (which would evict
    * unrelated caches). Blocking so storage is actually free on
    * return. */
  def releaseMemos(s: SparkSession, dir: String): Unit = {
    val path = s"$dir/documents.parquet"
    // releaseMemo drops the entry AND its per-key monitor (VERDICT r11
    // #6) — a long-lived session releasing many corpora must not retain
    // one Object per key it ever memoized
    graft.Memo.releaseMemo(labelsCache, s"${sessionId(s)}/$path")
      .foreach(_.unpersist(blocking = true))
    // same canonical-plan unpersist discipline as Butterfly: the lazy
    // re-persist inside the builder materializes nothing before the
    // unpersist drops the entry. Above the materialize gate nothing was
    // persisted (see minhashVerifiedRepPairs) and the canonical-plan
    // reconstruction could not match a checkpoint-built plan anyway, so
    // the unpersist is skipped rather than persisting a fresh no-op copy.
    if (!materializeContraction(s, dir))
      minhashVerifiedRepPairs(shingleGroups(s, dir)._1)
        .unpersist(blocking = true)
  }

  private def computeDupClusterLabels(s: SparkSession, dir: String)
      : DataFrame = {
    val (repHs, m) = shingleGroups(s, dir)
    // contraction keeps CC's input LINEAR in corpus size: within-group
    // edges collapse to the group node, so components form over distinct
    // texts; a group's rep id is its min doc_id, hence the
    // component-min label at rep level IS the component-min doc id
    val repLabels = graft.operators.ConnectedComponents.labels(
      minhashVerifiedRepPairs(repHs,
        persistPairs = !materializeContraction(s, dir)),
      srcCol = "a_id", dstCol = "b_id")
    val sizes = m.groupBy(col("rep")).agg(count(lit(1)).as("_n"))
    // labeled nodes = docs incident to >=1 verified pair: members of a
    // multi-doc group (within-group jaccard-1.0 edges) or of a group with
    // a cross-group edge (rep appears in repLabels)
    m.join(sizes, "rep")
      .join(repLabels.withColumnRenamed("id", "rep"), Seq("rep"), "left")
      .filter(col("label").isNotNull || col("_n") >= 2)
      .select(col("doc_id").as("id"),
        coalesce(col("label"), col("rep")).as("label"))
  }

  /** The linear-shuffle incremental-admission plan of
    * td_incremental_dedup (see the registry entry's SCALE SHAPE note
    * for the design argument; factored out so IncrementalDedupSpec can
    * run it against arbitrary constructed corpora).
    *
    * Input: `documents`-shaped frame (doc_id, text, lang, source).
    * Output: the admitted new docs (doc_id, lang, source) ordered by
    * doc_id — bit-identical to [[incrementalDedupDirect]]. */
  private[graft] def incrementalDedup(docs: DataFrame): DataFrame = {
    val isNew = col("doc_id") % 5 === 4
    // md5 rides as 16 raw bytes, not the 32-char hex string (round 18):
    // the digest crosses the corpus-wide class exchange once per doc
    // and the band-frame exchange 4× per all-new class, so the hex↔raw
    // bijection is 16 B/row of pure exchange savings with identical
    // class structure (unhex∘md5 collides iff md5 does)
    val dig = struct(unhex(md5(col("text").cast("binary"))),
      xxhash64(col("text")), length(col("text"))).as("_dig")
    // digest classes (the shingleGroups contraction, with parity flags
    // riding the agg): one row per distinct text, shuffled once with
    // map-side partials. `text` rides in the GROUPING KEY, not a
    // first() buffer (round 17, StagePeek): var-width aggregation
    // buffers are ineligible for hash aggregation, so first(text)
    // silently demoted this whole corpus-wide pass to sort-based
    // aggregation — the two class-agg stages cost 1600 core-s at the
    // 1600× rung, more than the band join itself. Var-width KEYS are
    // fine for the unsafe hash map, and _dig (md5 + xxhash64 + length)
    // determines text byte-exactly, so the classes are unchanged.
    val classes = docs.select(col("doc_id"), dig, col("text"))
      .groupBy(col("_dig"), col("text"))
      .agg(max(when(isNew, 1).otherwise(0)).as("has_new"),
        max(when(!isNew, 1).otherwise(0)).as("has_existing"))
    val ws = words(col("text"))
    // noPushdown pins the shingling precondition ABOVE the class
    // aggregation (round-17 ExchangePeek): pushed into the band legs'
    // scans it SPLIT the class exchange into two canonical forms —
    // filtered for the band legs, unfiltered for the exact leg, which
    // must see short texts — so the corpus-wide pass materialized
    // twice. Pinned here, all three consumers share ONE exchange (the
    // IncrementalDedupSpec plan-shape case asserts exactly one
    // canonical form), at the cost of carrying the few sub-3-word
    // classes through it.
    val sigd = classes
      .select(col("_dig"), col("has_new"), col("has_existing"), ws.as("ws"))
      .filter(noPushdown(size(col("ws")) >= 3))
      .select(col("_dig"), col("has_new"), col("has_existing"),
        array_sort(array_distinct(shingleHash60(col("ws"), 3, modP = true)))
          .as("hs"))
      // the shingle set crosses the band-frame exchange as a
      // delta-varint binary, NOT an array<long> (round 18, VERDICT r17
      // #1): values are P-reduced (< 2^30) and sorted, so each element
      // is a ~3-4-byte encoded gap instead of 8 B + UnsafeArrayData
      // header/bitmap — the dominant exchange payload at the top rungs
      // (4.1 GB of the 1600× band frame) roughly halves, and the
      // verify kernel walks the encoded form directly, so nothing
      // decodes back. Encoded once per class, here, above the fan-out.
      .select(col("_dig"), col("has_new"), col("has_existing"),
        deltaVarint(col("hs")).as("hsb"), minhashSig(col("hs"), 8).as("sig"))
    // band key packed into ONE long — injective since minhash values
    // are < P < 2^30 and the band index is < 4: (b << 60) | (h1 << 30)
    // | h2. Replaces the "b_h1_h2" string (~20 B UTF8 + offset word
    // per band row) with 8 fixed bytes, and the band-join's equi-key
    // becomes a primitive long compare.
    val bandArr = transform(sequence(lit(0), lit(3)), b =>
      shiftleft(b.cast("long"), 60) +
        shiftleft(element_at(col("sig"), b * 2 + 1), 30) +
        element_at(col("sig"), b * 2 + 2))
    // band frames CARRY the shingle set (linear payload: 4 rows × one
    // encoded set per class) so verification needs no post-join fetch.
    // hs is kept SORTED (order is free here — minhash and the set
    // predicate are order-blind) so the verification kernel below can
    // merge-walk instead of hash-building.
    // New side = all-new classes only: a mixed class's new members are
    // exact-dropped below, so banding them would be dead work — and
    // the oracle's ver-minus-ex difference never surfaces them either.
    // the encoding stays in place THROUGH the sort-merge join: the
    // SMJ's cost at the top rungs is dominated by row width (sort
    // memcpy + merge-buffer locality over 16M band rows at 1600×), so
    // the compact binary row wins even though a BinaryType join
    // condition re-copies the byte[] out of the row per pair
    // evaluation — measured same-phase at 1600×: 503 core-s for the
    // encoded join stage vs 599 for the r17 array rows vs 706 for
    // shuffle-binary-then-decode-above-the-exchange (widest sort).
    val nB = sigd.filter(col("has_new") === 1 && col("has_existing") === 0)
      .select(explode(bandArr).as("bkey"), col("_dig"), col("hsb"))
    // the vacuous has_new >= 0 conjunct is LOAD-BEARING: it keeps
    // has_new among this leg's required columns, so this leg's partial
    // aggregate prunes to the SAME column set as the others and its
    // exchange canonicalizes equal — measured at 400× (StagePeek r17):
    // three class-exchange materializations without it, two with it
    // (one pair unifies; the third consumer differs above the exchange
    // and stays separate — IncrementalDedupSpec pins the ≤2 count so a
    // future optimizer that folds the tautology, re-specializing the
    // aggregates back to three full corpus passes, fails a test
    // instead of silently regressing)
    val eB = sigd.filter(col("has_existing") === 1 && col("has_new") >= 0)
      .select(explode(bandArr).as("bkey"), col("hsb"))
    // Round 18 (the verify-CPU law, settled for real): the LEFT SEMI
    // band join that stood here evaluated the jaccard kernel on every
    // (new, existing) in-bucket pair until a probe's first accept —
    // and the deterministic work probe (tools/VerifyWorkProbe) showed
    // that to be GENUINELY QUADRATIC across octaves (pair evals ×3.99
    // at 800×/1600×/3200×): LSH buckets keyed by common shingles grow
    // linearly with the corpus, accepts are 0.03% of evaluations, so
    // the per-probe early exit cannot save the reject-only probes
    // that dominate. Making rejects cheap needs a per-bucket INDEX
    // built once and probed per row — bucket-level state a join
    // condition (pairwise by construction) cannot hold — so the band
    // legs now feed [[graft.plans.BucketAdmitJoin]]: the SAME two
    // flat band-frame exchanges and sorts (byte-identical physical
    // economics, Catalyst-inserted via the operator's distribution/
    // ordering requirements), with each aligned bucket evaluated by
    // BucketAdmit.admitCore — the AllPairs/PPJoin prefix-filter index
    // (local-df token order, floor(n/2)+1 prefixes, exact
    // DeltaVarint.geHalf on candidates, first-accept early exit;
    // direct scan under DirectPairCap pairs so the p50-width-1
    // buckets skip the index build). Candidates ⊇ all true matches is
    // the prefix theorem (BucketAdmit's scaladoc); measured work is
    // LINEAR: evaluated pairs == accepted pairs exactly on the stress
    // ladder, 596.6M → 176k evaluations at 1600×. Survivor identity
    // vs the literal pair-materializing plan stays pinned by
    // IncrementalDedupSpec (incl. the J = 0.5 boundary and the
    // size/overlap grid), and only verified digests leave the stage —
    // the distinct's input is bounded by the TRUE near-dup volume.
    val verDig = graft.plans.BucketAdmitJoinApi.admitJoin(nB, eB)
      .distinct()
    // exact leg: classes holding both parities — their new members are
    // text-equal to an existing doc (covers <3-word texts too)
    val exDig = classes
      .filter(col("has_new") === 1 && col("has_existing") === 1)
      .select(col("_dig"))
    docs.filter(isNew)
      .select(col("doc_id"), col("lang"), col("source"), dig)
      .join(exDig, Seq("_dig"), "left_anti")
      .join(verDig, Seq("_dig"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** The pre-round-16 pair-materializing plan, verbatim — doc-level
    * bands, candidate distinct, two hs joins, then verify. Kept ONLY as
    * IncrementalDedupSpec's equivalence reference: it IS the oracle
    * SQL's literal shape, so row-identity against it on adversarial
    * corpora is the admitted-pair-universe-preservation proof for
    * [[incrementalDedup]]'s contraction + in-stage verification. */
  private[graft] def incrementalDedupDirect(docs: DataFrame): DataFrame = {
    val isNew = col("doc_id") % 5 === 4
    val sh = docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"),
        array_distinct(shingleHash60(col("ws"), 3, modP = true)).as("hs"))
    val sig = sh.select(col("doc_id"), minhashSig(col("hs"), 8).as("sig"))
    val bandArr = transform(sequence(lit(0), lit(3)), b =>
      concat_ws("_", b, element_at(col("sig"), b * 2 + 1),
        element_at(col("sig"), b * 2 + 2)))
    val bands = sig.select(col("doc_id"), explode(bandArr).as("bkey"))
    val cand = bands.filter(isNew)
      .select(col("doc_id").as("n_id"), col("bkey"))
      .join(bands.filter(!isNew)
        .select(col("doc_id").as("e_id"), col("bkey").as("bkey_y")),
        col("bkey") === col("bkey_y"))
      .select(col("n_id"), col("e_id")).distinct()
    val ver = cand
      .join(sh.select(col("doc_id").as("n_id"), col("hs").as("a_hs")), "n_id")
      .join(sh.select(col("doc_id").as("e_id"), col("hs").as("b_hs")), "e_id")
      .filter(jaccard(col("a_hs"), col("b_hs")) >= 0.5)
      .select(col("n_id").as("doc_id")).distinct()
    val dig = struct(md5(col("text").cast("binary")),
      xxhash64(col("text")), length(col("text"))).as("_dig")
    val ex = docs.filter(isNew).select(col("doc_id"), dig)
      .join(docs.filter(!isNew).select(dig), "_dig")
      .select(col("doc_id")).distinct()
    docs.filter(isNew)
      .join(ver, Seq("doc_id"), "left_anti")
      .join(ex, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** vec_id, label, an (unit-normalized array<double>). */
  private[graft] def normalizedEmbeddings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("vd"))
      .withColumn("nrm", sqrt(dot(col("vd"), col("vd"))))
      .select(col("vec_id"), col("label"),
        transform(col("vd"), x => x / col("nrm")).as("an"))

  val defs: Map[String, QueryDef] = Map(

    // ---- Exact dedup: hash-groupBy on content digest. At 100 TB this is
    // one shuffle on a 128-bit key with map-side partial aggregation —
    // never a pairwise compare.
    "td_dedup_exact" -> QueryDef.sql(
      "exact dedup: group by md5(text), keep min doc_id per group")(
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy("keep_id")
    },

    // ---- n-gram Jaccard near-dup, blocked on the min shingle hash
    // (single-permutation MinHash LSH): docs with Jaccard j share the
    // blocking key with probability j, so ~equal pairs survive to the
    // exact verify. Equi-join on bkey — no cross join at any scale.
    "td_dedup_ngram_jaccard" -> QueryDef.sql(
      "3-gram Jaccard >= 0.5, candidates blocked on min shingle hash")(
      s"""$ShingleCte,
        |blk AS (SELECT doc_id, hs, list_min(hs) AS bkey FROM hs)
        |SELECT a_id, b_id, jaccard FROM (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
        |         len(list_intersect(x.hs, y.hs)) /
        |           len(list_distinct(list_concat(x.hs, y.hs))) AS jaccard
        |  FROM blk x JOIN blk y ON x.bkey = y.bkey AND x.doc_id < y.doc_id)
        |WHERE jaccard >= 0.5 ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      // blocking key and jaccard are functions of the text → contract
      // identical texts, pair at rep level, expand (see shingleGroups)
      val (repHs, m) = shingleGroups(s, dir)
      val blk = repHs
        .select(col("doc_id"), col("hs"), array_min(col("hs")).as("bkey"))
      val x = blk.select(col("doc_id").as("ra"), col("hs").as("a_hs"),
        col("bkey"))
      val y = blk.select(col("doc_id").as("rb"), col("hs").as("b_hs"),
        col("bkey").as("bkey_y"))
      val repPairs =
        x.join(y, col("bkey") === col("bkey_y") && col("ra") < col("rb"))
          .select(col("ra"), col("rb"),
            jaccard(col("a_hs"), col("b_hs")).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
      val cross = repPairs
        .join(m.select(col("rep").as("ra"), col("doc_id").as("x")), "ra")
        .join(m.select(col("rep").as("rb"), col("doc_id").as("y")), "rb")
        .select(least(col("x"), col("y")).as("a_id"),
          greatest(col("x"), col("y")).as("b_id"), col("jaccard"))
      val within = m.select(col("rep"), col("doc_id").as("a_id"))
        .join(m.select(col("rep").as("rep_y"), col("doc_id").as("b_id")),
          col("rep") === col("rep_y") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), lit(1.0).as("jaccard"))
      cross.unionByName(within).orderBy("a_id", "b_id")
    },

    // ---- MinHash + banded LSH (k=8 permutations, 4 bands × 2 rows):
    // shingle→minhash→band→bucket-equi-join→exact-Jaccard verify.
    // The signature kernel is the custom expression
    // graft.functions.MinHashSignature; the oracle replays the same
    // permutations ((2j+3)h + 5j+7 mod P) in SQL.
    "td_dedup_minhash_lsh" -> QueryDef.sql(
      "MinHash(8) banded LSH candidates, verified at Jaccard >= 0.5")(
      s"""$VerifiedPairsCte
        |SELECT a_id, b_id, jaccard FROM verified
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      minhashVerifiedPairs(s, dir).orderBy("a_id", "b_id")
    },

    // ---- LSH QUALITY GATE (VERDICT r14 #3 — the dedup analog of
    // td_ann_recall): candidate recall of the production 4-band×2-row
    // MinHash blocking, per exact-Jaccard band, plus its verified
    // precision — the numbers band/row sizing lives or dies by
    // (P[candidate] = 1-(1-j^r)^b: ≈0.27 at j=0.5, ≈0.94 at j=0.9 for
    // b=4, r=2 — the S-curve this gate measures empirically).
    // GROUND TRUTH is exact and complete above j >= 0.3 via PREFIX
    // FILTERING (Bayardo et al. WWW'07 / Chaudhuri et al. ICDE'06):
    // under a global token order, J(x,y) >= t forces the prefixes of
    // length |x| - ceil(t|x|) + 1 to intersect, so the prefix-token
    // equi-join is a LOSSLESS candidate superset — never all-pairs —
    // and the exact-Jaccard filter trims it to the true pair universe.
    // ceil(0.3·len) is computed as floor((3·len+9)/10) — exact in
    // doubles for any set size, so both engines slice identical
    // prefixes. This is a fixture-scale quality gate by definition
    // (truth must be exact, like td_knn_ann_recall's brute member);
    // at 100 TB the same query runs on a corpus SAMPLE — the metric,
    // not the blocking, is the deliverable. n_cand/precision are
    // properties of the whole candidate set, constant across band
    // rows by construction.
    "td_dedup_lsh_recall" -> QueryDef.sql(
      "MinHash(4x2) LSH candidate recall per exact-Jaccard band + precision")(
      s"""$ShingleCte,
        |sh2 AS (SELECT doc_id, hs, list_sort(hs) AS shs FROM hs),
        |pf AS (SELECT doc_id, unnest(list_slice(shs, 1,
        |         CAST(len(shs) - floor((3*len(shs)+9)/10.0) + 1 AS INT)))
        |         AS tok FROM sh2),
        |cp AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |       FROM pf x JOIN pf y ON x.tok = y.tok
        |         AND x.doc_id < y.doc_id),
        |truth AS (SELECT a_id, b_id,
        |            CAST(CASE WHEN j >= 0.9 THEN 0.9 WHEN j >= 0.7 THEN 0.7
        |                 WHEN j >= 0.5 THEN 0.5 ELSE 0.3 END AS DOUBLE)
        |              AS band_lo
        |          FROM (SELECT a_id, b_id,
        |                  len(list_intersect(a.hs, b.hs)) /
        |                    len(list_distinct(list_concat(a.hs, b.hs))) AS j
        |                FROM cp JOIN hs a ON cp.a_id = a.doc_id
        |                        JOIN hs b ON cp.b_id = b.doc_id)
        |          WHERE j >= 0.3),
        |sig AS (SELECT doc_id, list_transform(range(8), k ->
        |          list_min(list_transform(hs,
        |            h -> ((2*k+3)*h + (5*k+7)) % 1000000007))) AS sig
        |        FROM hs),
        |bands AS (SELECT doc_id,
        |            b::VARCHAR || '_' || sig[2*b+1]::VARCHAR || '_' ||
        |            sig[2*b+2]::VARCHAR AS bkey
        |          FROM sig, (SELECT unnest([0,1,2,3]) AS b)),
        |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |         FROM bands x JOIN bands y
        |           ON x.bkey = y.bkey AND x.doc_id < y.doc_id),
        |g AS (SELECT count(*) AS n_cand,
        |        count(*) FILTER (j >= 0.5) AS n_cand_verified
        |      FROM (SELECT len(list_intersect(a.hs, b.hs)) /
        |              len(list_distinct(list_concat(a.hs, b.hs))) AS j
        |            FROM cand JOIN hs a ON cand.a_id = a.doc_id
        |                      JOIN hs b ON cand.b_id = b.doc_id)),
        |hit AS (SELECT t.band_lo, count(*) AS n_true, count(c.a_id) AS n_hit
        |        FROM truth t LEFT JOIN cand c
        |          ON t.a_id = c.a_id AND t.b_id = c.b_id
        |        GROUP BY t.band_lo)
        |SELECT band_lo, CAST(n_true AS BIGINT) AS n_true,
        |  CAST(n_hit AS BIGINT) AS n_hit,
        |  n_hit / CAST(n_true AS DOUBLE) AS recall,
        |  CAST(g.n_cand AS BIGINT) AS n_cand,
        |  CAST(g.n_cand_verified AS BIGINT) AS n_cand_verified,
        |  CASE WHEN g.n_cand = 0 THEN NULL
        |       ELSE g.n_cand_verified / CAST(g.n_cand AS DOUBLE) END
        |    AS precision_at_05
        |FROM hit, g ORDER BY band_lo""".stripMargin) { (s, dir) =>
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"),
          array_distinct(shingleHash60(col("ws"), 3, modP = true)).as("hs"))
        .localCheckpoint(false) // 4 consumers (prefix, 2 verify sides, sig)
      // exact truth: prefix-filter candidates -> exact jaccard >= 0.3
      val shs = sh.select(col("doc_id"), col("hs"),
        array_sort(col("hs")).as("shs"))
      val pLen = (size(col("shs")) -
        floor((size(col("shs")) * 3 + lit(9)) / lit(10.0)).cast("int") + 1)
      val pf = shs.select(col("doc_id"),
        explode(slice(col("shs"), lit(1), pLen)).as("tok"))
      val cp = pf.select(col("doc_id").as("a_id"), col("tok"))
        .join(pf.select(col("doc_id").as("b_id"), col("tok").as("tok_y")),
          col("tok") === col("tok_y") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id")).distinct()
      // Pin the verify parallelism (StagePeek, round 18; the
      // relational fuzzy family's verifyWidth rationale): the pair
      // frame is cheap in bytes (~6 MB for 790K pairs at sf0.1), so
      // AQE coalesces its exchange to a handful of partitions while
      // the downstream hs-attach + exact jaccard is expensive per ROW
      // (15.6 CPU-s over 5 tasks measured). An EXPLICIT count is
      // exempt from coalescing and derives from the session, not a
      // constant; the exchange carries only the two long keys.
      val verifyWidth = VerifyWidth(sh)
      // Keyed on a DERIVED expression (round 19; see VerifyWidth's
      // scaladoc): a repartition BY the distinct's own keys at the same
      // width is collapsed as redundant and the coalesce returns
      // (measured, round 18); the keyless round-robin form shipped in
      // r18 is not collapsible but pays sortBeforeRepartition on every
      // input partition (measured +1.5 s warm on rel_fuzzy_join_sig's
      // sibling exchange). The hash expression differs from any child
      // partitioning — neither collapsible nor coalescible, at plain
      // hash-exchange cost.
      def withJ(pairs: DataFrame): DataFrame = pairs
        .repartition(verifyWidth, xxhash64(col("a_id"), col("b_id")))
        .join(sh.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), "a_id")
        .join(sh.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), "b_id")
        .select(col("a_id"), col("b_id"),
          jaccard(col("a_hs"), col("b_hs")).as("j"))
      val truth = withJ(cp).filter(col("j") >= 0.3)
        .select(col("a_id"), col("b_id"),
          when(col("j") >= 0.9, 0.9).when(col("j") >= 0.7, 0.7)
            .when(col("j") >= 0.5, 0.5).otherwise(0.3).as("band_lo"))
      // production candidate set: the identical 4x2 banding
      // td_dedup_minhash_lsh deploys
      val sig = sh.select(col("doc_id"), minhashSig(col("hs"), 8).as("sig"))
      val bandArr = transform(sequence(lit(0), lit(3)), b =>
        concat_ws("_", b, element_at(col("sig"), b * 2 + 1),
          element_at(col("sig"), b * 2 + 2)))
      val bands = sig.select(col("doc_id"), explode(bandArr).as("bkey"))
      val cand = bands.select(col("doc_id").as("a_id"), col("bkey"))
        .join(bands.select(col("doc_id").as("b_id"), col("bkey").as("bkey_y")),
          col("bkey") === col("bkey_y") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id")).distinct()
        .localCheckpoint(false) // 2 consumers: precision agg + hit join
      val g = withJ(cand).agg(count(lit(1)).as("n_cand"),
        count(when(col("j") >= 0.5, 1)).as("n_cand_verified"))
      val hit = truth
        .join(cand.withColumn("m", lit(1)), Seq("a_id", "b_id"), "left")
        .groupBy(col("band_lo"))
        .agg(count(lit(1)).as("n_true"), count(col("m")).as("n_hit"))
      hit.crossJoin(broadcast(g))
        .select(col("band_lo"), col("n_true"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_true").cast("double"))
            .as("recall"),
          col("n_cand"), col("n_cand_verified"),
          when(col("n_cand") === 0, lit(null).cast("double"))
            .otherwise(col("n_cand_verified").cast("double") /
              col("n_cand").cast("double")).as("precision_at_05"))
        .orderBy("band_lo")
    },

    // ---- Duplicate-cluster resolution: connected components over the
    // verified near-dup pairs (keep one representative per cluster — the
    // final step of a production dedup pipeline). Alternating
    // large-star/small-star contraction (O(log diameter) rounds,
    // checkpointed lineage — see graft.operators.ConnectedComponents);
    // min-label propagation kept as the in-repo cross-check. Oracle:
    // recursive-CTE transitive closure with min-reachable component ids.
    "td_dedup_clusters" -> QueryDef.sql(
      "connected components over near-dup pairs (cluster representative)")(
      s"""${VerifiedPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |bi AS (SELECT a_id AS s, b_id AS t FROM verified
        |       UNION ALL SELECT b_id, a_id FROM verified),
        |reach(s, t) AS (
        |  SELECT DISTINCT s, s FROM bi
        |  UNION
        |  SELECT r.s, b.t FROM reach r JOIN bi b ON r.t = b.s)
        |SELECT doc_id, component_id, count(*) OVER (PARTITION BY component_id)
        |         AS cluster_size
        |FROM (SELECT s AS doc_id, min(t) AS component_id
        |      FROM reach GROUP BY s)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val labels = dupClusterLabels(s, dir)
      val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      labels
        .join(sizes, "label")
        .select(col("id").as("doc_id"), col("label").as("component_id"),
          col("cluster_size"))
        .orderBy("doc_id")
    },

    // ---- QUALITY-WEIGHTED cluster representative (round 15): production
    // dedup keeps the BEST document per duplicate cluster, not the
    // lowest id — RefinedWeb/FineWeb pipelines rank cluster members by a
    // quality signal and drop the rest. Composition: the memoized CC
    // labels (shared with td_dedup_clusters/corpus — the cluster pass is
    // paid once per corpus) join the shared composite quality score
    // (TextQueries.qualityScored — the exact formula td_quality_score
    // gates on), and the representative is the per-cluster argmax by
    // (quality_score DESC, doc_id ASC) — a TopKPerKey k=1 map-side cut,
    // never a cluster-wide window over a global sort. Scale: clusters
    // are the CC output (linear in verified pairs), the quality frame is
    // a narrow per-row map, the rep join is an equi-join on
    // component_id — everything linear, nothing all-pairs.
    "td_dedup_best_rep" -> QueryDef.sql(
      "quality-weighted dup-cluster representative (keep the best doc)")(
      s"""${VerifiedPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |bi AS (SELECT a_id AS s, b_id AS t FROM verified
        |       UNION ALL SELECT b_id, a_id FROM verified),
        |reach(s, t) AS (
        |  SELECT DISTINCT s, s FROM bi
        |  UNION
        |  SELECT r.s, b.t FROM reach r JOIN bi b ON r.t = b.s),
        |lab AS (SELECT s AS doc_id, min(t) AS component_id
        |        FROM reach GROUP BY s),
        |${graft.queries.TextQueries.QualityCte},
        |m AS (SELECT l.doc_id, l.component_id, q.quality_score
        |      FROM lab l JOIN q ON l.doc_id = q.doc_id),
        |r AS (SELECT doc_id, component_id, quality_score,
        |        row_number() OVER (PARTITION BY component_id
        |          ORDER BY quality_score DESC, doc_id) AS rn FROM m)
        |SELECT doc_id, component_id, quality_score, rn = 1 AS is_rep
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val m = dupClusterLabels(s, dir)
        .select(col("id").as("doc_id"), col("label").as("component_id"))
        .join(TextQueries.qualityScored(s, dir)
          .select(col("doc_id"), col("quality_score")), "doc_id")
        .localCheckpoint(false) // 2 consumers: rep cut + final join
      val rep = graft.plans.TopK.topKPerKey(m,
          keys = Seq(col("component_id")),
          order = Seq(col("quality_score").desc, col("doc_id").asc), k = 1)
        .select(col("component_id"), col("doc_id").as("rep_id"))
      m.join(rep, "component_id")
        .select(col("doc_id"), col("component_id"), col("quality_score"),
          (col("doc_id") === col("rep_id")).as("is_rep"))
        .orderBy("doc_id")
    },

    // ---- SimHash near-dup: 32-bit frequency-weighted simhash, candidates
    // from 4×8-bit band equi-join. Pigeonhole: hamming <= 3 ⇒ at least one
    // of the 4 bands is identical, so band blocking is *exact* for this
    // radius — the all-pairs oracle provably returns the same set.
    "td_dedup_simhash" -> QueryDef.sql(
      "SimHash(32) pairs at hamming <= 3 via exact 4-band blocking")(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |wh AS (SELECT doc_id, list_transform(ws,
        |         t -> CAST(('0x'||substr(md5(t),1,15)) AS BIGINT)) AS wh
        |       FROM w WHERE len(ws) >= 3),
        |sim AS (SELECT doc_id, CAST(list_sum(list_transform(range(32), j ->
        |          CASE WHEN list_sum(list_transform(wh,
        |                 h -> ((h >> j) & 1)*2 - 1)) > 0
        |               THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT)
        |          AS sim FROM wh)
        |SELECT x.doc_id AS a_id, y.doc_id AS b_id,
        |       CAST(bit_count(xor(x.sim, y.sim)) AS INTEGER) AS hamming
        |FROM sim x JOIN sim y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.sim, y.sim)) <= 3
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val ws = words(col("text"))
      val wh = t(s, dir, "documents")
        .select(col("doc_id"), ws.as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), shingleHash60(col("ws"), 1, modP = false).as("wh"))
      val sims0 = wh.select(col("doc_id"), simhash(col("wh"), 32).as("sim"))
      // materialize-once above the scale gate (see materializeContraction):
      // sims is (doc_id, sim) — two longs/row — but its subtree re-scans
      // and re-hashes the corpus once per reference (reps agg + the m
      // join side + every m expansion: 8 document scans in the plan).
      // One checkpointed pass feeds them all; lazy, per-build.
      val sims = if (materializeContraction(s, dir))
        sims0.localCheckpoint(false) else sims0
      // hamming depends only on the fingerprint → contract identical
      // fingerprints to a representative, band-join the DISTINCT
      // fingerprints, and expand. Keeps the band join linear in distinct
      // fingerprints instead of quadratic inside duplicate groups.
      val reps = sims.groupBy(col("sim")).agg(min(col("doc_id")).as("rep"))
      val m = sims.join(reps, "sim") // doc_id, sim, rep
      val repSims = m.filter(col("doc_id") === col("rep"))
        .select(col("rep"), col("sim"))
      val bandArr = array((0 until 4).map(b => struct(
        lit(b).as("bi"),
        shiftright(col("sim"), 8 * b).bitwiseAND(lit(255L)).as("bv"))): _*)
      val bands = repSims
        .select(col("rep"), col("sim"), explode(bandArr).as("band"))
        .select(col("rep"), col("sim"),
          col("band.bi").as("bi"), col("band.bv").as("bv"))
      val x = bands.select(col("rep").as("ra"), col("sim").as("a_sim"),
        col("bi"), col("bv"))
      val y = bands.select(col("rep").as("rb"), col("sim").as("b_sim"),
        col("bi").as("bi_y"), col("bv").as("bv_y"))
      val repPairs =
        x.join(y, col("bi") === col("bi_y") && col("bv") === col("bv_y") &&
            col("ra") < col("rb"))
          .select(col("ra"), col("rb"), col("a_sim"), col("b_sim"))
          .distinct()
          .filter(bit_count(col("a_sim").bitwiseXOR(col("b_sim"))) <= 3)
      val cross = repPairs
        .join(m.select(col("rep").as("ra"), col("doc_id").as("x")), "ra")
        .join(m.select(col("rep").as("rb"), col("doc_id").as("y")), "rb")
        .select(least(col("x"), col("y")).as("a_id"),
          greatest(col("x"), col("y")).as("b_id"), col("a_sim"), col("b_sim"))
      val within = m.select(col("rep"), col("sim").as("a_sim"),
          col("doc_id").as("a_id"))
        .join(m.select(col("rep").as("rep_y"), col("sim").as("b_sim"),
          col("doc_id").as("b_id")),
          col("rep") === col("rep_y") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("a_sim"), col("b_sim"))
      cross.unionByName(within)
        .select(col("a_id"), col("b_id"),
          bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
        .orderBy("a_id", "b_id")
    },

    // ---- The end product of the dedup pipeline: the cleaned corpus —
    // every document except non-representative members of near-dup
    // clusters (cluster representative = min doc_id). This is the query
    // a training-data user actually runs; everything above is its
    // machinery.
    "td_dedup_corpus" -> QueryDef.sql(
      "deduplicated corpus: drop non-representative near-dup docs")(
      s"""${VerifiedPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |bi AS (SELECT a_id AS s, b_id AS t FROM verified
        |       UNION ALL SELECT b_id, a_id FROM verified),
        |reach(s, t) AS (
        |  SELECT DISTINCT s, s FROM bi
        |  UNION
        |  SELECT r.s, b.t FROM reach r JOIN bi b ON r.t = b.s),
        |comp AS (SELECT s AS doc_id, min(t) AS component_id
        |         FROM reach GROUP BY s),
        |drop_ids AS (SELECT doc_id FROM comp WHERE doc_id <> component_id)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_ids)
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val dropIds = dupClusterLabels(s, dir)
        .filter(col("id") =!= col("label"))
        .select(col("id").as("doc_id"))
      t(s, dir, "documents")
        .join(dropIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },

    // ---- Mergeable group sketch: element-wise min of per-doc MinHash
    // signatures (a custom TypedImperativeAggregate) = the signature of
    // each language's unioned shingle set. Map-side partial merge like
    // any sum — the sketch pattern that replaces exact distinct state at
    // 100 TB. Oracle: per-index min over the same signatures.
    "td_minhash_group_sketch" -> QueryDef.sql(
      "per-language union-MinHash via custom mergeable aggregate")(
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
        |           FROM documents),
        |hs AS (SELECT doc_id, lang,
        |         list_distinct(list_transform(range(len(ws)-2),
        |           i -> CAST(('0x'||substr(md5(ws[i+1]||' '||ws[i+2]||' '||ws[i+3]),1,15))
        |                  AS BIGINT) % 1000000007)) AS hs
        |       FROM w WHERE len(ws) >= 3),
        |sig AS (SELECT doc_id, lang, list_transform(range(8), k ->
        |          list_min(list_transform(hs,
        |            h -> ((2*k+3)*h + (5*k+7)) % 1000000007))) AS sig
        |        FROM hs)
        |SELECT lang, count(*) AS n_docs,
        |  min(sig[1]) AS mh0, min(sig[2]) AS mh1, min(sig[3]) AS mh2,
        |  min(sig[4]) AS mh3, min(sig[5]) AS mh4, min(sig[6]) AS mh5,
        |  min(sig[7]) AS mh6, min(sig[8]) AS mh7
        |FROM sig GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val ws = words(col("text"))
      val sig = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), ws.as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), col("lang"),
          array_distinct(shingleHash60(col("ws"), 3, modP = true)).as("hs"))
        .select(col("doc_id"), col("lang"),
          minhashSig(col("hs"), 8).as("sig"))
      sig.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          minhashUnion(col("sig"), 8).as("gsig"))
        .select(Seq(col("lang"), col("n_docs")) ++
          (0 until 8).map(i => element_at(col("gsig"), i + 1).as(s"mh$i")): _*)
        .orderBy("lang")
    },

    // ---- Bitmap distinct sketch (linear-counting machinery with an
    // exact oracle): occupied hash buckets per event_type, OR-mergeable
    // state of m/8 bytes per group vs an exact-distinct hash set.
    "td_distinct_sketch" -> QueryDef.sql(
      "bitmap distinct-bucket sketch vs exact distinct count")(
      """SELECT event_type,
        |  count(DISTINCT (CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))
        |    AS BIGINT) % 1024 + 1024) % 1024) AS sketch_buckets,
        |  count(DISTINCT user_id) AS exact_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          bitmapDistinct(hash60(col("user_id").cast("string")), 1024)
            .cast("long").as("sketch_buckets"),
          countDistinct(col("user_id")).as("exact_distinct"))
        .orderBy("event_type")
    },

    // ---- Incremental-ingest dedup: admit a NEW batch (doc_id % 5 = 4,
    // ~20% of the corpus) against the EXISTING corpus — the shape every
    // production pipeline actually runs per ingest, where the existing
    // side's shingles/signatures/bands are precomputed and stored. The
    // candidate band join is restricted to new×existing, so per-ingest
    // cost is |batch| × collision rate — it NEVER re-pairs
    // existing×existing (what td_dedup_* would do if re-run whole). A
    // new doc is dropped on an exact text match with an existing doc
    // (digest equi-join, catches <3-word texts too) or a verified
    // near-dup (Jaccard >= 0.5) against an existing doc. Within-batch
    // duplicates are the following full pass's job (td_dedup_corpus).
    //
    // SCALE SHAPE (round 16 — the r15 ladder's one superlinear rung,
    // 3.06× shuffle/octave at 400×): the old plan materialized the band
    // join's candidate PAIRS into a distinct + two hs joins, so the
    // shuffled volume was the pair count — quadratic in band-bucket
    // width (703 cross-parity colliding pairs at 1× become
    // width²-per-bucket under near-dup replication). The plan below
    // keeps shuffle linear in the corpus by construction:
    //
    //   1. EXACT-DUP CONTRACTION to digest classes (the shingleGroups
    //      discipline): every similarity signal is a pure function of
    //      the text, so docs with identical text are interchangeable —
    //      bands, signatures, and verification run once per DISTINCT
    //      text, and per-doc verdicts are recovered by a digest join.
    //      Classes with an existing member have all their new members
    //      dropped by the exact leg, so only ALL-NEW classes enter the
    //      near-dup machinery at all.
    //   2. IN-STAGE VERIFICATION: both band frames carry their class's
    //      hashed shingle set INTO the band equi-join, and the
    //      Jaccard >= 0.5 predicate runs PIPELINED in the join stage —
    //      candidate pairs are enumerated and discarded inside the
    //      task, and only VERIFIED class digests reach the next
    //      exchange. Shuffle = O(Σ|hs|) for the band frames (4 rows ×
    //      one shingle array per class) + the tiny verified set; the
    //      quadratic pair mass costs CPU (an array intersect per
    //      in-bucket pair), never a shuffle write. Admitted-pair
    //      universe is untouched: same band keys, same candidate
    //      predicate, same Jaccard threshold, evaluated earlier in the
    //      same plan (IncrementalDedupSpec pins equivalence against
    //      the direct pair-materializing plan, mixed/short/no-band
    //      classes included).
    "td_incremental_dedup" -> QueryDef.sql(
      "admit new batch vs existing corpus: exact + near-dup drops")(
      s"""$ShingleCte,
        |sig AS (SELECT doc_id, list_transform(range(8), k ->
        |          list_min(list_transform(hs,
        |            h -> ((2*k+3)*h + (5*k+7)) % 1000000007))) AS sig
        |        FROM hs),
        |bands AS (SELECT doc_id,
        |            b::VARCHAR || '_' || sig[2*b+1]::VARCHAR || '_' ||
        |            sig[2*b+2]::VARCHAR AS bkey
        |          FROM sig, (SELECT unnest([0,1,2,3]) AS b)),
        |cand AS (SELECT DISTINCT x.doc_id AS n_id, y.doc_id AS e_id
        |         FROM bands x JOIN bands y ON x.bkey = y.bkey
        |         WHERE x.doc_id % 5 = 4 AND y.doc_id % 5 <> 4),
        |ver AS (SELECT DISTINCT n_id FROM (
        |          SELECT n_id,
        |            len(list_intersect(a.hs, b.hs)) /
        |              len(list_distinct(list_concat(a.hs, b.hs))) AS j
        |          FROM cand JOIN hs a ON cand.n_id = a.doc_id
        |                    JOIN hs b ON cand.e_id = b.doc_id)
        |        WHERE j >= 0.5),
        |ex AS (SELECT DISTINCT n.doc_id AS n_id
        |       FROM documents n JOIN documents e
        |         ON n.text = e.text AND e.doc_id % 5 <> 4
        |       WHERE n.doc_id % 5 = 4)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id % 5 = 4
        |  AND d.doc_id NOT IN (SELECT n_id FROM ver)
        |  AND d.doc_id NOT IN (SELECT n_id FROM ex)
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      incrementalDedup(t(s, dir, "documents"))
    },

    // ---- Deterministic uniform sample via the bottom-k-by-hash sketch:
    // per language, the 5 docs with the smallest content hashes — the
    // distributed sample-without-replacement primitive (state = k pairs
    // per group, mergeable by union+trim; also the KMV distinct-
    // estimation core). Unlike rand()-based sampling the result is
    // reproducible across runs AND engines, which is what makes sampled
    // eval sets / debugging slices trustworthy; the oracle replays it
    // as a row_number over the same hash.
    "td_group_sample" -> QueryDef.sql(
      "per-language 5-doc deterministic sample via bottom-k hash sketch")(
      """WITH h AS (SELECT lang, doc_id,
        |             CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) AS h
        |           FROM documents),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY lang ORDER BY h, doc_id) AS rk FROM h)
        |SELECT lang, h AS sample_hash, doc_id
        |FROM r WHERE rk <= 5 ORDER BY lang, sample_hash, doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          hash60(col("text")).as("h"))
        .groupBy(col("lang"))
        .agg(bottomKSample(col("h"), col("doc_id"), 5).as("smp"))
        .select(col("lang"), explode(col("smp")).as("e"))
        .select(col("lang"), col("e.key").as("sample_hash"),
          col("e.payload").as("doc_id"))
        .orderBy("lang", "sample_hash", "doc_id")
    },

    // ---- SpaceSaving heavy hitters: per-language top-8 most frequent
    // words via the bounded-state mergeable sketch (state = `capacity`
    // counters per group, NOT one per distinct term — the 100-TB
    // replacement for exact term-frequency groupBys; see
    // [[graft.functions.SpaceSavingTopKAgg]] for the N/capacity error
    // bound). capacity=64 exceeds every group's distinct-word count at
    // test SF, so counts are exact and the plain-count oracle matches;
    // eviction semantics are spec-pinned at capacity 2.
    "td_heavy_hitters" -> QueryDef.sql(
      "per-language top-8 words via mergeable SpaceSaving sketch")(
      """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS term
        |           FROM documents),
        |c AS (SELECT lang, term, count(*) AS cnt FROM w GROUP BY lang, term),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY lang ORDER BY cnt DESC, term) AS rk FROM c)
        |SELECT lang, term, CAST(cnt AS BIGINT) AS cnt,
        |       CAST(0 AS BIGINT) AS err
        |FROM r WHERE rk <= 8 ORDER BY lang, cnt DESC, term""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), explode(words(col("text"))).as("term"))
        .groupBy(col("lang"))
        .agg(spaceSavingTopK(col("term"), 64, 8).as("top"))
        .select(col("lang"), explode(col("top")).as("e"))
        .select(col("lang"), col("e.term").as("term"),
          col("e.cnt").as("cnt"), col("e.err").as("err"))
        .orderBy(col("lang"), col("cnt").desc, col("term"))
    },

    // ---- Embedding-cosine near-dup, IVF-style: candidates restricted to
    // the same coarse cell (here the label column stands in for a centroid
    // assignment), cosine via the codegen'd dot-product kernel.
    // Scale note: work is quadratic in CELL size BY DEFINITION (the query
    // semantics are "all qualifying pairs within a cell", and perturbed
    // vectors offer no exact-duplicate contraction) — at production scale
    // the cell count grows with the corpus (real IVF centroids), and
    // approximate retrieval uses td_ann_lsh / td_ann_ivf instead of
    // exhaustive pair listing.
    "td_embed_neardup" -> QueryDef.sql(
      "cosine >= 0.4 near-dup pairs within label cell (IVF-style blocking)")(
      s"""$NormCte
        |SELECT a_id, b_id, label, cosine FROM (
        |  SELECT x.vec_id AS a_id, y.vec_id AS b_id, x.label AS label,
        |         list_reduce(list_transform(range(len(x.an)),
        |           i -> x.an[i+1]*y.an[i+1]), (a,b) -> a+b) AS cosine
        |  FROM n x JOIN n y ON x.label = y.label AND x.vec_id < y.vec_id)
        |WHERE cosine >= 0.4 ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val n = normalizedEmbeddings(s, dir)
      val x = n.select(col("vec_id").as("a_id"), col("label"),
        col("an").as("a_an"))
      val y = n.select(col("vec_id").as("b_id"), col("label").as("label_y"),
        col("an").as("b_an"))
      x.join(y, col("label") === col("label_y") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("label"),
          dot(col("a_an"), col("b_an")).as("cosine"))
        .filter(col("cosine") >= 0.4)
        .orderBy("a_id", "b_id")
    },

    // ---- SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding
    // near-dedup at corpus scale by clustering FIRST — the Lloyd(2)
    // cell assignment shared with td_kmeans_lloyd — then comparing
    // pairs only WITHIN a cell and keeping the lowest vec_id of each
    // qualifying pair. td_embed_neardup blocks on a GIVEN label; this
    // is the production shape when no label exists: the quantizer's own
    // cells are the blocking key, and k grows with the corpus so cell
    // population (and the within-cell quadratic term) stays bounded.
    // Plan at scale: the assignment is two broadcast-centroid scans
    // (no shuffle grows with the corpus); the within-cell self-join
    // shuffles on `cell` (AQE splits a skewed cell); cosine is the
    // codegen'd ascending-fold dot. The assignment subtree appears on
    // both join sides and under the final projection — three linear
    // scans here; a production pipeline materializes the assignment
    // once as a corpus column (an artifact write, not an engine
    // concern). Output: one row per vector, `kept` = survives pruning.
    //
    // `spark.graft.semdedup.cells` (BENCH-ONLY — the correctness gate
    // never sets it, so oracle hashes are untouched; default 8 matches
    // the oracle CTE) grows the cell count for the stress ladder: a
    // production SemDeDup re-trains its quantizer as the corpus grows,
    // holding cell SIZE roughly constant while cell COUNT scales with
    // n — which keeps the within-cell pair term linear in n. Fixed
    // k=8 at 100x would instead grow each cell 100x and the pair
    // volume 10000x, a fixture artifact no production index exhibits
    // (the same argument as StressSmoke's per-replica label suffix
    // for td_embed_neardup's blocking cells).
    "td_semdedup" -> QueryDef.sql(
      "SemDeDup: within-kmeans-cell cosine >= 0.4 prune, keep lowest id")(
      s"""WITH ${SimilarityQueries.KmeansSqlChain},
        |cells AS (SELECT vec_id, cell_lloyd AS cell FROM a2),
        |nr2 AS (SELECT vec_id, vd, sqrt(list_reduce(list_transform(
        |          range(len(vd)), i -> vd[i+1]*vd[i+1]), (a,b) -> a+b))
        |          AS nrm FROM vd),
        |nn AS (SELECT vec_id, list_transform(vd, x -> x / nrm) AS an
        |       FROM nr2),
        |cv AS (SELECT nn.vec_id, c.cell, nn.an
        |       FROM nn JOIN cells c ON nn.vec_id = c.vec_id),
        |dup AS (SELECT DISTINCT y.vec_id
        |        FROM cv x JOIN cv y
        |          ON x.cell = y.cell AND x.vec_id < y.vec_id
        |        WHERE list_reduce(list_transform(range(len(x.an)),
        |          i -> x.an[i+1]*y.an[i+1]), (a,b) -> a+b) >= 0.4)
        |SELECT c.vec_id, c.cell, d.vec_id IS NULL AS kept
        |FROM cv c LEFT JOIN dup d ON c.vec_id = d.vec_id
        |ORDER BY c.vec_id""".stripMargin) { (s, dir) =>
      val k = graft.BenchConfs.intOpt(s, graft.BenchConfs.SemdedupCells)
        .getOrElse(8)
      // the assignment subtree is referenced three times (both
      // self-join sides + the final projection); lazily localCheckpoint
      // it so the n x k distance evaluation — the query's dominant term
      // once k grows with the corpus — runs ONCE and the joins read the
      // materialized (vec_id, cell) pairs, exactly the "materialize the
      // assignment as a corpus column" step a production pipeline runs
      // (same per-stage localCheckpoint discipline as the graph family)
      val cells = SimilarityQueries.kmeansAssign(s, dir, k)
        .select(col("vec_id"), col("cell_lloyd").as("cell"))
        .localCheckpoint(false)
      val v = normalizedEmbeddings(s, dir)
        .join(cells, "vec_id")
        .select(col("vec_id"), col("cell"), col("an"))
      val x = v.select(col("vec_id").as("a_id"), col("cell"),
        col("an").as("a_an"))
      val y = v.select(col("vec_id").as("b_id"), col("cell").as("cell_b"),
        col("an").as("b_an"))
      val dups = x.join(y,
          col("cell") === col("cell_b") && col("a_id") < col("b_id"))
        .filter(dot(col("a_an"), col("b_an")) >= 0.4)
        .select(col("b_id").as("vec_id")).distinct()
      cells
        .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          col("dup").isNull.as("kept"))
        .orderBy("vec_id")
    },

    // ---- Benchmark-contamination check: flag corpus documents sharing
    // any word 8-gram with a held-out "benchmark" set (here: source
    // src0). The scan is an equi-join on the 60-bit shingle hash — the
    // benchmark's distinct-hash side is small relative to the corpus, so
    // AQE broadcasts it; never an n×m text comparison. This is the
    // decontamination primitive (8-gram overlap à la GPT-3/PaLM data
    // cards) every training pipeline runs before eval.
    "td_contamination" -> QueryDef.sql(
      "docs sharing >=1 word-8-gram with the benchmark source (src0)")(
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |           FROM documents),
        |hs AS (SELECT doc_id, source,
        |         list_distinct(list_transform(range(len(ws)-7),
        |           i -> CAST(('0x'||substr(md5(ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||
        |                  ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7]||' '||ws[i+8]),1,15))
        |                  AS BIGINT))) AS hs
        |       FROM w WHERE len(ws) >= 8),
        |b AS (SELECT DISTINCT unnest(hs) AS h FROM hs WHERE source = 'src0'),
        |c AS (SELECT doc_id, unnest(hs) AS h FROM hs WHERE source <> 'src0')
        |SELECT c.doc_id, count(*) AS n_shared_ngrams
        |FROM c JOIN b USING (h)
        |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val ws = words(col("text"))
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), ws.as("ws"))
        .filter(size(col("ws")) >= 8)
        .select(col("doc_id"), col("source"),
          array_distinct(shingleHash60(col("ws"), 8, modP = false)).as("hs"))
      val bench = sh.filter(col("source") === "src0")
        .select(explode(col("hs")).as("h")).distinct()
      val corpus = sh.filter(col("source") =!= "src0")
        .select(col("doc_id"), explode(col("hs")).as("h"))
      corpus.join(bench, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared_ngrams"))
        .orderBy("doc_id")
    },

    // ---- The curation capstone: the corpus a training run actually
    // reads. Composes the layer end-to-end — drop docs that are too
    // short (<3 words) or repetitive (repeated-3-gram ratio > 0.5),
    // drop non-representative members of near-dup clusters, then stamp
    // the stable hash split. Each stage is a semi/anti equi-join against
    // a filter relation, so the composition is exactly as scalable as
    // its parts (no new join shapes, no new shuffles beyond them).
    "td_curated_corpus" -> QueryDef.sql(
      "end-to-end curated corpus: quality + repetition + dedup + split")(
      s"""${VerifiedPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |bi AS (SELECT a_id AS s, b_id AS t FROM verified
        |       UNION ALL SELECT b_id, a_id FROM verified),
        |reach(s, t) AS (
        |  SELECT DISTINCT s, s FROM bi
        |  UNION
        |  SELECT r.s, b.t FROM reach r JOIN bi b ON r.t = b.s),
        |comp AS (SELECT s AS doc_id, min(t) AS component_id
        |         FROM reach GROUP BY s),
        |drop_ids AS (SELECT doc_id FROM comp WHERE doc_id <> component_id),
        |rawr AS (SELECT doc_id, list_transform(range(len(ws)-2),
        |           i -> CAST(('0x'||substr(md5(ws[i+1]||' '||ws[i+2]||' '||ws[i+3]),1,15))
        |                  AS BIGINT) % 1000000007) AS rhs
        |         FROM w WHERE len(ws) >= 3),
        |rep AS (SELECT doc_id,
        |          1.0 - len(list_distinct(rhs)) / len(rhs) AS rep_ratio
        |        FROM rawr),
        |keep AS (SELECT doc_id FROM rep WHERE rep_ratio <= 0.5)
        |SELECT d.doc_id, d.lang, d.source,
        |       CASE WHEN bucket < 90 THEN 'train'
        |            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT *,
        |        CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
        |          % 100 AS bucket
        |      FROM documents) d
        |WHERE d.doc_id IN (SELECT doc_id FROM keep)
        |  AND d.doc_id NOT IN (SELECT doc_id FROM drop_ids)
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val dropIds = dupClusterLabels(s, dir)
        .filter(col("id") =!= col("label"))
        .select(col("id").as("doc_id"))
      // raw (non-distinct) shingles: the ratio needs repeat counts; the
      // >=3-word filter doubles as the min-length gate
      val keep = t(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"),
          shingleHash60(col("ws"), 3, modP = true).as("rhs"))
        .select(col("doc_id"),
          (lit(1.0) - size(array_distinct(col("rhs"))).cast("double") /
            size(col("rhs")).cast("double")).as("rep_ratio"))
        .filter(col("rep_ratio") <= 0.5)
        .select(col("doc_id"))
      t(s, dir, "documents")
        .join(keep, Seq("doc_id"), "left_semi")
        .join(dropIds, Seq("doc_id"), "left_anti")
        .withColumn("bucket", hash60(col("doc_id").cast("string")) % 100)
        .select(col("doc_id"), col("lang"), col("source"),
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },

    // ---- DEDUP-GRAPH TRANSITIVITY: is near-duplication transitive on
    // this corpus? Build the shared-passage graph — docs joined by an
    // 8-word shingle whose document frequency is in [2, 50] (the df cap
    // is the standard "drop boilerplate shingles" guard: a shingle in
    // thousands of docs is template text, and capping df bounds every
    // bucket's pair fan-out at C(50,2), keeping the blocked join linear
    // like every other dedup family member) — then measure its global
    // clustering: wedges Σ C(deg,2), triangles via the degree-ordered
    // orientation of operators/Triangles.scala, transitivity
    // 3·triangles/wedges. High transitivity says single-link cluster
    // expansion (td_dedup_clusters) is safe; low says chains of
    // near-dups link unrelated docs. The oracle recomputes triangles
    // with the independent naive triple join.
    "td_dedup_transitivity" -> QueryDef.sql(
      "shared-passage graph: edges, wedges, triangles, transitivity")(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |hs AS (SELECT doc_id, list_distinct(list_transform(range(len(ws)-7),
        |         i -> CAST(('0x'||substr(md5(array_to_string(ws[i+1:i+8], ' ')),1,15))
        |                AS BIGINT))) AS hs
        |       FROM w WHERE len(ws) >= 8),
        |x AS (SELECT doc_id, unnest(hs) AS h FROM hs),
        |g AS (SELECT h FROM x GROUP BY h HAVING count(*) BETWEEN 2 AND 50),
        |xf AS (SELECT x.doc_id, x.h FROM x JOIN g ON x.h = g.h),
        |e AS (SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi
        |      FROM xf a JOIN xf b ON a.h = b.h AND a.doc_id < b.doc_id),
        |d AS (SELECT id, count(*) AS deg FROM (
        |        SELECT lo AS id FROM e UNION ALL SELECT hi AS id FROM e)
        |      GROUP BY id),
        |tr AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        |       FROM e e1 JOIN e e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
        |       JOIN e e3 ON e3.lo = e1.hi AND e3.hi = e2.hi)
        |SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_nodes,
        |  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
        |  CAST((SELECT COALESCE(sum(deg*(deg-1)//2), 0) FROM d) AS BIGINT)
        |    AS n_wedges,
        |  CAST((SELECT count(*) FROM tr) AS BIGINT) AS n_triangles,
        |  CASE WHEN (SELECT COALESCE(sum(deg*(deg-1)//2), 0) FROM d) = 0
        |       THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(3 * (SELECT count(*) FROM tr) AS DOUBLE)
        |          / CAST((SELECT sum(deg*(deg-1)//2) FROM d) AS DOUBLE)
        |  END AS transitivity""".stripMargin) { (s, dir) =>
      val x = t(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 8)
        .select(col("doc_id"), explode(array_distinct(
          shingleHash60(col("ws"), 8, modP = false))).as("h"))
      val g = x.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 50)
        .select(col("h"))
      val xf = x.join(g, Seq("h"), "left_semi")
      val e = xf.select(col("h"), col("doc_id").as("a_id"))
        .join(xf.select(col("h").as("h_b"), col("doc_id").as("b_id")),
          col("h") === col("h_b") && col("a_id") < col("b_id"))
        .select(col("a_id").as("lo"), col("b_id").as("hi"))
        .distinct()
        // read by three aggregates below; materialize the pair join once
        .localCheckpoint(false)
      val d = graft.operators.Triangles.degrees(e)
      val nodesWedges = d.agg(count(lit(1)).as("n_nodes"),
        expr("CAST(COALESCE(sum((deg*(deg-1)) div 2), 0) AS BIGINT)")
          .as("n_wedges"))
      val nEdges = e.agg(count(lit(1)).as("n_edges"))
      val nTri = graft.operators.Triangles.globalFromCanonical(e)
        .select(col("triangles").as("n_triangles"))
      nodesWedges.crossJoin(nEdges).crossJoin(nTri)
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          when(col("n_wedges") === 0, lit(0.0))
            .otherwise((col("n_triangles") * 3).cast("double") /
              col("n_wedges").cast("double")).as("transitivity"))
    }
  )
}
