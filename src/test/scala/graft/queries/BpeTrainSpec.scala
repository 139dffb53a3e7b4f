package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The corners of the BPE trainer the registry corpus doesn't reach:
  * a merge OF a merged symbol (placeholder expansion back to raw
  * characters) and early vocabulary exhaustion.
  */
class BpeTrainSpec extends AnyFunSuite with SparkTestSession {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.toDF("text")
  }

  test("merging a merged symbol expands placeholders to raw chars") {
    // wordFreq: aaaa -> 4, bc -> 3
    // step 1: 'aa' (3 pairs x freq 4 = 12); aaaa -> P1 P1
    // step 2: P1P1 (4) -> must report the EXPANDED pair 'aaaa'
    // step 3: 'bc' (3)
    val out = TextQueries.bpeTrain(
      docs("aaaa aaaa aaaa", "aaaa bc bc", "bc"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "aa", 12L), (2, "aaaa", 4L), (3, "bc", 3L)))
  }

  test("vocabulary exhaustion stops early instead of throwing") {
    // 'ab' merges in step 1; after step 2 merges P1 (wait: single
    // symbol, no pairs) — only ONE merge is learnable here
    val out = TextQueries.bpeTrain(docs("ab ab", "ab"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "ab", 3L)))
  }
}
