package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Runtime shuffle-volume invariants: the plan-audit claims in
  * PLANS.md ("this query never shuffles the big side") asserted with a
  * listener on real executions, so a refactor that silently introduces
  * a wide exchange fails the suite, not just the bench.
  */
class MeterSpec extends SparkSpec {

  private class Tally extends SparkListener {
    val sw = new LongAdder; val input = new LongAdder
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        sw.add(m.shuffleWriteMetrics.bytesWritten)
        input.add(m.inputMetrics.bytesRead)
      }
    }
  }

  private def measure(run: => Unit): (Long, Long) = {
    val t = new Tally
    spark.sparkContext.addSparkListener(t)
    try {
      run
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext, 30000)
    } finally spark.sparkContext.removeSparkListener(t)
    (t.sw.sum, t.input.sum)
  }

  test("seq packing is window-only: shuffle carries ids+counts, not text") {
    val (sw, input) = measure {
      SparkEntry.queries("ns_seq_pack")(spark, sf).count()
    }
    // only (source, doc_id, n_toks) rows cross the exchange — the
    // document text itself must never shuffle
    assert(sw < 64 * 1024, s"seq_pack shuffled $sw bytes")
  }

  test("the TPC-H join chain broadcasts every dimension: fact never shuffles") {
    val (sw, input) = measure {
      SparkEntry.queries("q5_region_volume")(spark, sf).count()
    }
    // only the 5-row aggregate's exchange may move — lineitem
    // shuffling would be orders of magnitude more
    assert(sw < 64 * 1024, s"q5 shuffled $sw bytes (input $input)")
  }

  test("top-p shuffles vocab partials, not the token stream") {
    val (sw, input) = measure {
      SparkEntry.queries("w2_top90")(spark, sf).count()
    }
    assert(sw < 256 * 1024, s"w2_top90 shuffled $sw bytes (input $input)")
  }
}
