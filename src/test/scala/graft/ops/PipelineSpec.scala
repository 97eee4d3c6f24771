package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("contamination flags every deliberately-leaked eval variant") {
    val docs = T(spark, sf, "documents")
    val flagged = Pipeline.contamination(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the drop-first-token variant of each eval doc shares nearly all
    // its shingles with its original — it must be caught
    val evalIds = docs.filter(col("doc_id") % 25 === 0)
      .filter(size(split(col("text"), " ")) > 3)
      .select("doc_id").collect().map(_.getLong(0))
    assert(evalIds.nonEmpty)
    evalIds.foreach { id =>
      val leaked = id + Dedup.VariantIdOffset
      assert(flagged.contains(leaked), s"leak $leaked not flagged")
    }
  }

  test("seqPack keeps bin offsets inside the budget and bins monotone") {
    val budget = 64
    val rows = Pipeline.seqPack(T(spark, sf, "documents"), budget).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getLong(4)
      assert(off >= 0 && off < budget, s"offset $off outside [0, $budget)")
    }
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val bins = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b },
        "bin ids must be nondecreasing in doc order")
    }
  }

  test("crossDedup flags every incoming near-copy against the reference") {
    val docs = T(spark, sf, "documents")
    val flagged = Pipeline.crossDedup(docs, 0.5)
    val nIncoming = docs
      .filter(size(split(col("text"), " ")) > 3).count()
    // every incoming doc is a near-copy of its reference original;
    // banded LSH is probabilistic (a very short doc can escape every
    // band), so assert recall >= 99% rather than exactly-all
    assert(flagged.count() >= (nIncoming * 0.99).toLong,
      s"${flagged.count()} of $nIncoming flagged")
    assert(flagged.agg(min(col("best_sim"))).collect()(0).getDouble(0) >= 0.5)
  }

  test("span dedup catches the shifted variants that chunk hashing misses") {
    val rows = Dedup.spanDedup(T(spark, sf, "documents"), 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val variants = rows.filter(_._1 >= Dedup.VariantIdOffset)
    assert(variants.nonEmpty)
    // every window of a drop-first-token variant is a window of its
    // original at a shifted offset -> all its spans are duplicated
    variants.foreach { case (id, (n, dup)) =>
      assert(n == dup, s"variant $id: $dup of $n windows flagged")
    }
    // most originals' first window (contains the dropped token) exists
    // nowhere else; a minority share natural prefixes with other docs
    // (the corpus generator reuses templates), so assert majority, not
    // all
    val originals = rows.filter(_._1 < Dedup.VariantIdOffset)
    val partial = originals.count { case (_, (n, dup)) => dup < n }
    assert(partial * 2 > originals.size,
      s"only $partial of ${originals.size} originals partially duplicated")
  }

  test("sourceSample is deterministic with in-range rates") {
    val a = Pipeline.sourceSample(T(spark, sf, "documents")).collect()
    val b = Pipeline.sourceSample(T(spark, sf, "documents")).collect()
    assert(a.sameElements(b), "hash sampling must be reproducible")
    a.foreach { r =>
      val (total, kept, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(rate >= 0.1 && rate <= 0.9)
      assert(kept >= 0 && kept <= total)
    }
  }
}
