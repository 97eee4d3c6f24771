package graft.planner

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's only real-corpus transcript (README.md:58-101) runs
  * the usenet pipeline over 20_newsgroups: 19,997 documents whose
  * tokenize step builds a 7,228,481-row token index. The corpus
  * directory ships EMPTY in the reference repo, so result parity is
  * impossible — this spec pins the closest verifiable stand-in
  * (round-13 verdict #8): a synthetic corpus with the EXACT transcript
  * shape (19,997 docs; exactly 7,228,481 qualifying tokens under the
  * same \W+ / lower / len>1 tokenizer) pushed through the PLANNED
  * top90 path — plan search, task unification, lazy execution — not a
  * hand-built query. Pass = the planner handles the real corpus scale
  * end-to-end and the token index it builds has the transcript's
  * cardinality.
  */
class UsenetShapeSpec extends SparkSpec {

  private val Docs = 19997L
  private val TokenIndex = 7228481L

  // 19997 * 361 = 7218917; the first 9564 docs carry one extra token
  // so the index total lands exactly on the transcript's 7,228,481
  private val Base = TokenIndex / Docs           // 361
  private val Extra = TokenIndex - Base * Docs   // 9564

  /** Deterministic synthetic corpus, built distributively (no driver
    * materialization): doc i holds Base(+1) tokens "wNNN" over a 30k
    * vocabulary with a position-dependent skew, every token length>1
    * and \W-free, so the planner's tokenizer keeps all of them.
    */
  private lazy val corpus = spark.range(Docs).select(
    col("id").as("doc_id"),
    concat_ws(" ", transform(
      sequence(lit(0L), lit(Base - 1) + when(col("id") < Extra, 1L).otherwise(0L)),
      j => concat(lit("w"), ((col("id") * 31 + j * 7) % ((j % 29) * 1000 + 97))
        .cast("string")))).as("text"))

  test("planned top90 over the 20_newsgroups-shaped corpus (19997 docs, 7.2M token index)") {
    // the corpus really has the transcript shape under the planner's
    // own tokenizer (split(lower, \W+), length > 1)
    val idx = corpus.select(explode(split(lower(col("text")), "\\W+")).as("tok"))
      .filter(length(col("tok")) > 1).count()
    assert(idx == TokenIndex, s"token index $idx != $TokenIndex")

    val t0 = System.nanoTime()
    val top = Library.plannedTop90(corpus).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"planned top90 over 19997 docs / ${idx}%,d tokens: $secs%.1f s")

    assert(top.nonEmpty)
    // top90 cuts at 90% of token mass: the kept counts must sum to
    // LESS than the full index and the list must be count-descending
    val counts = top.map(_.getLong(1))
    assert(counts.sum < TokenIndex)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }
}
