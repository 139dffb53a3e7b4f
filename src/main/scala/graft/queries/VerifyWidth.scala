package graft.queries

import org.apache.spark.sql.DataFrame

/** Explicit partition width for cheap-bytes/expensive-rows verify
  * stages (candidate-pair verification), shared by the relational fuzzy
  * family and the dedup recall queries (ADVICE r18: the two inline
  * copies had already diverged in repartition style).
  *
  * Why it exists (StagePeek, round 18): a candidate-pair frame is tiny
  * in BYTES (~0.5-6 MB at sf0.1), so AQE's byte-based coalescing
  * collapses its exchange to one (or a handful of) partition(s) — and
  * the expensive-per-ROW verify downstream (name/hs attach + banded
  * levenshtein / exact jaccard) runs nearly single-task, twice when a
  * final orderBy's RangePartitioning samples its child by computing it.
  * An EXPLICIT repartition count is exempt from AQE coalescing.
  *
  * THE KEYED-COLLAPSE HAZARD (ADVICE r18, measured in round 18 on
  * td_dedup_lsh_recall): a repartition BY the frame's own distinct keys
  * at the same width is collapsed as redundant by the optimizer when
  * the child is already hash-partitioned on those keys at that width —
  * after which AQE's one-partition coalesce returns and the verify goes
  * single-task again. At fixture scale a broadcast candidate join can
  * hide this (the distinct has no exchange of its own); with a
  * shuffle-join plan shape at scale the pin silently vanishes. Callers
  * must therefore use the KEYLESS round-robin form
  * `.repartition(VerifyWidth(df))` (not collapsible), or key on an
  * expression distinct from the upstream partitioning.
  *
  * The width derives from the session (the bench's core-count
  * contract), never a constant; the max() keeps it from REDUCING
  * parallelism on clusters whose shuffle.partitions exceeds core count.
  */
object VerifyWidth {
  def apply(df: DataFrame): Int = {
    val s = df.sparkSession
    math.max(s.sparkContext.defaultParallelism,
      s.sessionState.conf.numShufflePartitions)
  }
}
