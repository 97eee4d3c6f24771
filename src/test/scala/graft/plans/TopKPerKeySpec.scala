package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** The custom top-k operator must be (1) exact — same rows as the
  * window row_number form on a total order, (2) planned as
  * partial -> one exchange -> final, and (3) actually pruning: the
  * partial stage's output-row metric is bounded by
  * k * keys * partitions and far under the input row count. (3) is
  * the scale claim — the whole point of the operator — enforced as a
  * runtime assertion, not prose.
  */
class TopKPerKeySpec extends SparkSpec {

  private def withNoAqe[A](f: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("matches the window row_number form exactly") {
    val part = spark.read.parquet(s"$sf/part.parquet")
      .select("p_brand", "p_partkey", "p_retailprice")
    val viaExec = TopKPerKey.topK(part, Seq("p_brand"),
        Seq(col("p_retailprice").desc, col("p_partkey").asc), 3)
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    val viaWindow = part
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(viaExec == viaWindow,
      s"row sets differ: only-exec=${(viaExec -- viaWindow).take(3)} " +
        s"only-window=${(viaWindow -- viaExec).take(3)}")
  }

  test("plans as partial -> single exchange -> final, and prunes") {
    withNoAqe {
      val part = spark.read.parquet(s"$sf/part.parquet")
        .select("p_brand", "p_partkey", "p_retailprice")
        .repartition(4) // force multiple map partitions
      val df = TopKPerKey.topK(part, Seq("p_brand"),
        Seq(col("p_retailprice").desc, col("p_partkey").asc), 3)
      df.collect()
      val p = df.queryExecution.executedPlan
      val execs = p.collect { case e: TopKPerKeyExec => e }
      assert(execs.map(_.partial).sorted == Seq(false, true),
        s"expected partial+final TopKPerKeyExec, got:\n$p")
      def shuffles(n: org.apache.spark.sql.execution.SparkPlan) =
        n.collect { case s: ShuffleExchangeExec => s }.size
      val between = shuffles(execs.find(!_.partial).get) -
        shuffles(execs.find(_.partial).get)
      assert(between == 1,
        s"expected exactly one exchange between the stages:\n$p")

      val nInput = part.count()
      val nKeys = part.select("p_brand").distinct().count()
      val partialOut = execs.find(_.partial).get
        .metrics("numOutputRows").value
      assert(partialOut <= 3 * nKeys * 4,
        s"partial emitted $partialOut > k*keys*partitions")
      assert(partialOut < nInput,
        s"partial must prune ($partialOut vs $nInput input rows)")
    }
  }

  test("property: equals the window form on random data, keys, and k") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val rowGen = Gen.zip(Gen.choose(0, 5), Gen.choose(-100, 100),
      Gen.choose(0L, 1000L))
    val caseGen = Gen.zip(Gen.listOfN(120, rowGen), Gen.choose(1, 6))
    val prop = Prop.forAll(caseGen) { case (rows, k) =>
      rows.isEmpty || {
        val df = rows.toDF("key", "score", "id").repartition(3)
        val got = TopKPerKey.topK(df, Seq("key"),
            Seq(col("score").desc, col("id").asc, col("key").asc), k)
          .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length)
        val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("score").desc, col("id").asc, col("key").asc)
        val want = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn")
          .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length)
        got.toMap == want.toMap
      }
    }
    // duplicate input rows are legitimate here (the generator repeats
    // (key, score, id) triples), so compare row MULTISETS; the order
    // columns still totally order distinct rows
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("exact on skew: one heavy key, ties on the order column") {
    import spark.implicits._
    val rows = (1 to 1000).map(i => ("hot", i % 7, i)) ++
      Seq(("cold", 99, 1), ("cold", 99, 2))
    val df = rows.toDF("key", "score", "id")
    val got = TopKPerKey.topK(df, Seq("key"),
        Seq(col("score").desc, col("id").asc), 5)
      .orderBy("key", "id").collect().map(_.toSeq)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
      .orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("key", "id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("near-unique keys hit the unspillable-heap guard, loudly") {
    import spark.implicits._
    val confKey = "spark.graft.topkMaxKeysPerPartition"
    try {
      spark.conf.set(confKey, "10")
      // 500 distinct keys in few partitions: every partition crosses
      // the (test-sized) ceiling — the documented misuse of the
      // operator, which must fail fast with the WindowGroupLimit
      // guidance, not OOM an executor
      val df = (1 to 500).map(i => (s"user_$i", i)).toDF("key", "score")
        .repartition(2)
      val ex = intercept[Exception] {
        TopKPerKey.topK(df, Seq("key"), Seq(col("score").desc), 3).collect()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      val msgs = chain(ex).mkString(" | ")
      assert(msgs.contains("topkMaxKeysPerPartition"), msgs)
      assert(msgs.contains("row_number"), msgs)

      // the guarded queries themselves stay healthy: grouped
      // dimensions sit far under the real default
      spark.conf.unset(confKey)
      val ok = TopKPerKey.topK(df, Seq("key"), Seq(col("score").desc), 3)
      assert(ok.count() == 500)
    } finally spark.conf.unset(confKey)
  }

  test("topkFallback=sort crosses the guard and completes, identically") {
    import spark.implicits._
    val confKey = "spark.graft.topkMaxKeysPerPartition"
    val fbKey = "spark.graft.topkFallback"
    withNoAqe { try {
      // many keys (every partition crosses the test-sized ceiling),
      // several rows per key so the cut is non-trivial, k=2
      val df = (1 to 2000)
        .map(i => (s"user_${i % 400}", i % 37, i)).toDF("key", "score", "id")
        .repartition(3)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
        .orderBy(col("score").desc, col("id").asc)
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
        .collect().map(_.toSeq).toSet

      spark.conf.set(confKey, "10")
      spark.conf.set(fbKey, "sort")
      val viaFallback = TopKPerKey.topK(df, Seq("key"),
        Seq(col("score").desc, col("id").asc), 2)
      val got = viaFallback.collect().map(_.toSeq).toSet
      assert(got == want,
        s"fallback result differs: only-fb=${(got -- want).take(3)} " +
          s"only-window=${(want -- got).take(3)}")
      // the degrade actually fired (metric counted crossing partitions)
      val fb = viaFallback.queryExecution.executedPlan
        .collect { case e: TopKPerKeyExec => e }
        .map(_.metrics("sortFallbacks").value).sum
      assert(fb > 0, "expected at least one partition to degrade")

      // same data WITHOUT the config still fails fast (default contract)
      spark.conf.unset(fbKey)
      intercept[Exception] {
        TopKPerKey.topK(df, Seq("key"),
          Seq(col("score").desc, col("id").asc), 2).collect()
      }

      // and an in-bounds query under fallback=sort never degrades
      spark.conf.unset(confKey)
      spark.conf.set(fbKey, "sort")
      val healthy = TopKPerKey.topK(df, Seq("key"),
        Seq(col("score").desc, col("id").asc), 2)
      healthy.collect()
      val fb2 = healthy.queryExecution.executedPlan
        .collect { case e: TopKPerKeyExec => e }
        .map(_.metrics("sortFallbacks").value).sum
      assert(fb2 == 0, "in-bounds query must stay on the heap path")
    } finally {
      spark.conf.unset(confKey)
      spark.conf.unset(fbKey)
    } }
  }

  test("float keys: -0.0/0.0 and NaN group as one key on both paths") {
    import spark.implicits._
    val confKey = "spark.graft.topkMaxKeysPerPartition"
    val fbKey = "spark.graft.topkFallback"
    withNoAqe { try {
      // byte-distinct but comparator-equal doubles: -0.0 vs 0.0, and
      // two NaN bit patterns. Without key normalization the degrade
      // sort interleaves them (comparator order) while the group
      // detector compares bytes — emitting more than k per logical key.
      val nanA = java.lang.Double.longBitsToDouble(0x7ff8000000000000L)
      val nanB = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
      val rows = Seq.tabulate(40) { i =>
        val key = (i % 4) match {
          case 0 => 0.0
          case 1 => -0.0
          case 2 => nanA
          case _ => nanB
        }
        (key, i % 7, i)
      }
      val df = rows.toDF("key", "score", "id").repartition(2)
      // logical keys after normalization: {0.0, NaN} — k=2 each
      def check(tag: String, got: Array[org.apache.spark.sql.Row]): Unit = {
        val byKey = got.groupBy(r => {
          val d = r.getDouble(0)
          if (d.isNaN) "nan" else (d + 0.0).toString // +0.0 folds -0.0
        })
        assert(byKey.keySet == Set("nan", "0.0"), s"$tag keys: ${byKey.keySet}")
        byKey.foreach { case (k, rs) =>
          assert(rs.length == 2, s"$tag: key $k emitted ${rs.length} rows, want k=2")
        }
      }
      val heap = TopKPerKey.topK(df, Seq("key"),
        Seq(col("score").desc, col("id").asc), 2).collect()
      check("heap", heap)
      spark.conf.set(confKey, "1") // force every partition past the guard
      spark.conf.set(fbKey, "sort")
      val viaSort = TopKPerKey.topK(df, Seq("key"),
        Seq(col("score").desc, col("id").asc), 2)
      val sorted = viaSort.collect()
      check("sort", sorted)
      val fb = viaSort.queryExecution.executedPlan
        .collect { case e: TopKPerKeyExec => e }
        .map(_.metrics("sortFallbacks").value).sum
      assert(fb > 0, "expected the degrade path to fire")
      assert(heap.map(_.toSeq.drop(1)).toSet == sorted.map(_.toSeq.drop(1)).toSet,
        "heap and sort paths must retain the same (score, id) rows")
    } finally {
      spark.conf.unset(confKey)
      spark.conf.unset(fbKey)
    } }
  }

  test("the final stage's exchange hashes NORMALIZED float keys") {
    import spark.implicits._
    withNoAqe {
      // a child that satisfies clustering on the RAW key via range
      // partitioning: Double.compare orders -0.0 < 0.0, so without
      // normalization in requiredChildDistribution the planner would
      // accept this partitioning and comparator-equal float keys could
      // sit in different partitions — up to 2k rows for one logical
      // key (round-17 advisor). The normalized requirement forces one
      // exchange that hashes -0.0 and 0.0 together.
      val df = Seq.tabulate(64)(i =>
          (if (i % 2 == 0) 0.0 else -0.0, i % 5, i))
        .toDF("key", "score", "id")
        .repartitionByRange(4, col("key"))
      val top = TopKPerKey.topK(df, Seq("key"),
        Seq(col("score").desc, col("id").asc), 2)
      val got = top.collect()
      assert(got.length == 2,
        s"one logical key (0.0) must emit exactly k=2 rows, got ${got.length}")
      val plan = top.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("normalizenanandzero"),
        s"the exchange must partition on the normalized key:\n$plan")
    }
  }
}
