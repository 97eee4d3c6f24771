package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operator-library sanity specs. Deep correctness lives in the
  * DuckDB differential gate (Verify + oracle); these assert the
  * invariants the oracle can't see: plan shape, planted-fixture
  * recovery, entry contract.
  */
class OpsSpec extends SparkSpec {

  test("entry returns rows > 0 (driver smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly oracle-free") {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs))
    assert(qs.size >= 49)
  }

  test("top90 keeps under 90% of mass and is count-descending") {
    val docs = T(spark, sf, "documents")
    val top = Text.topPTokens(docs, 0.9).collect()
    val totals = Text.tokenize(docs).count()
    val kept = top.map(_.getAs[Long]("cnt")).sum
    assert(kept < 0.9 * totals)
    assert(top.map(_.getAs[Long]("cnt")).toSeq ==
      top.map(_.getAs[Long]("cnt")).sortBy(-_).toSeq)
  }

  test("minhash-LSH recovers every planted near-dup pair") {
    val docs = T(spark, sf, "documents")
    val pairs = Dedup.minhashLsh(docs, 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.select("doc_id").collect().map(_.getLong(0))
      .filter { id => // docs with > 3 tokens get a variant
        true
      }
    // spot-check: at least 90% of docs have their planted twin found
    val found = planted.count(id => pairs.contains((id, id + 1000000L)))
    assert(found >= planted.length * 9 / 10,
      s"found $found of ${planted.length} planted pairs")
  }

  test("exact dedup groups every planted copy") {
    val docs = T(spark, sf, "documents")
    val groups = Dedup.exactDedup(docs).collect()
    assert(groups.forall(_.getAs[Long]("n_copies") >= 2))
  }

  test("brute-force kNN neighbors are truly top-k (exhaustive check q0)") {
    val emb = T(spark, sf, "embeddings")
    val knn = Similarity.knnBruteForce(emb, 1, 5).collect()
    assert(knn.length == 5)
    val sims = knn.map(_.getAs[Double]("cos_sim"))
    assert(sims.toSeq == sims.sortBy(-_).toSeq)
  }

  test("lsh knn returns only same-bucket neighbors, subset of brute scores") {
    val emb = T(spark, sf, "embeddings")
    val lsh = Similarity.knnLsh(emb, 5, 3).collect()
    assert(lsh.nonEmpty)
    // every reported similarity must match the brute-force score for
    // that pair (the bucket restricts candidates, never alters scores)
    val brute = Similarity.knnBruteForce(emb, 5, 500).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    lsh.foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      assert(brute(k) == r.getDouble(3))
    }
  }

  test("approx aggregates land within tolerance of exact") {
    val r = Advanced.approxStats(T(spark, sf, "lineitem")).collect()(0)
    // the query itself folds the sketch-vs-exact comparison into
    // booleans (so the oracle can hash-check them); a false here means
    // a sketch drifted out of its error bound
    assert(r.getAs[Boolean]("approx_parts_ok"))
    assert(r.getAs[Boolean]("approx_median_ok"))
    assert(r.getAs[Long]("exact_parts") > 0)
    assert(r.getAs[Double]("median_price") > 0)
  }

  test("as-of join: prior click strictly precedes the purchase") {
    val rows = Advanced.asofPurchaseClick(T(spark, sf, "events")).collect()
    assert(rows.nonEmpty)
    val withPrev = rows.filter(!_.isNullAt(3))
    assert(withPrev.nonEmpty)
    assert(withPrev.forall(r => // ntz columns surface as LocalDateTime
      !r.getAs[java.time.LocalDateTime]("prev_click_ts")
        .isAfter(r.getAs[java.time.LocalDateTime]("ts"))))
  }

  test("dot_product is callable from the SQL surface") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
    // md5_prefix60 in SQL must bit-match the conv/substring formulation
    val h = spark.sql(
      """SELECT md5_prefix60('abc') AS a,
        |  conv(substring(md5('abc'), 1, 15), 16, 10) AS b""".stripMargin)
      .collect()(0)
    assert(h.getLong(0) == h.getString(1).toLong)
    // extensions installer is constructible and wires the same fn
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("session windows: event count is conserved") {
    val ev = T(spark, sf, "events")
    val sessions = Events.userSessions(ev)
    assert(sessions.agg(sum("n_events")).collect()(0).getLong(0) == ev.count())
  }

  test("media decode stub: mean byte value in [0, 255], bytes match n_chars") {
    val docs = T(spark, sf, "documents")
    val feats = Multimodal.decodeFeatures(spark, docs).collect()
    assert(feats.length == docs.count())
    assert(feats.forall(f => f.feat_mean >= 0 && f.feat_mean <= 255))
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(feats.forall(f => f.n_bytes == chars(f.doc_id)))
  }

  test("range join: bands partition the orders (each row in exactly one band)") {
    val orders = T(spark, sf, "orders")
    val bands = Advanced.rangeJoinPriceBands(orders).collect()
    assert(bands.map(_.getAs[Long]("n")).sum == orders.count())
  }

  test("ivf knn: reported similarities match brute-force scores") {
    val emb = T(spark, sf, "embeddings")
    val ivf = Similarity.knnIvf(emb, 5, 3, 2).collect()
    assert(ivf.nonEmpty)
    val brute = Similarity.knnBruteForce(emb, 5, 500).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivf.foreach { r =>
      assert(brute((r.getLong(0), r.getLong(2))) == r.getDouble(3))
    }
    // per-query results are rank-ordered
    ivf.groupBy(_.getLong(0)).values.foreach { rows =>
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.toSeq == sims.sortBy(-_).toSeq)
    }
  }

  test("cube/grouping-sets: ALL-ALL row equals the table count") {
    val li = T(spark, sf, "lineitem")
    val cube = Advanced.cubeAgg(li).collect()
    val allRow = cube.filter(r =>
      r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(allRow.length == 1 && allRow(0).getAs[Long]("n") == li.count())

    val orders = T(spark, sf, "orders")
    val gs = Advanced.groupingSetsAgg(orders).collect()
    val grand = gs.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1 && grand(0).getAs[Long]("n") == orders.count())
    // per-status counts (priority=ALL) re-sum to the grand total
    val perStatus = gs.filter(r => r.getString(0) != "ALL")
      .map(_.getAs[Long]("n")).sum
    assert(perStatus == orders.count())
  }

  test("typed Dataset aggregation equals the untyped groupBy form") {
    val li = T(spark, sf, "lineitem")
    val typed = Typed.typedRevenueByFlag(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val untyped = li.filter(col("l_quantity") > 10)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(typed.toSeq == untyped.toSeq)
  }

  test("watermark admission: nonempty strict subset, within the cutoff") {
    val ev = T(spark, sf, "events")
    val admitted = Events.watermarkAdmitted(ev)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(admitted > 0 && admitted < ev.count())
  }

  test("struct functions: max_len is the true longest-token length") {
    val docs = T(spark, sf, "documents").limit(50)
    val got = Functions.structFunctions(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      val expect = r.getString(1).split(" ").map(_.length).max
      assert(got(r.getLong(0)) == expect)
    }
  }

  test("Md5Prefix60 equals the conv/substring md5 formulation bit-for-bit") {
    val docs = T(spark, sf, "documents")
    def old(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val texts = docs.select(
      (old(col("text")) =!= H.hash60(col("text"))).as("d"))
    assert(texts.filter(col("d")).count() == 0)
    val toks = docs.select(explode(split(col("text"), " ")).as("w"))
      .select((old(col("w")) =!= H.hash60(col("w"))).as("d"))
    assert(toks.filter(col("d")).count() == 0)
    // empty string too
    val empty = spark.sql("SELECT '' AS s")
      .select(old(col("s")).as("a"), H.hash60(col("s")).as("b")).collect()(0)
    assert(empty.getLong(0) == empty.getLong(1))
  }

  test("df.stat sketches: bloom filter and count-min behave as sketches") {
    val li = T(spark, sf, "lineitem")
    val bf = li.stat.bloomFilter("l_orderkey", 10000, 0.03)
    val present = li.select("l_orderkey").distinct().limit(100)
      .collect().map(_.getLong(0))
    assert(present.forall(bf.mightContain)) // no false negatives ever
    val absent = (1 to 200).map(i => -i.toLong)
    assert(absent.count(bf.mightContain) < 20) // fpp ~3%
    val cms = li.stat.countMinSketch(col("l_returnflag"), 0.001, 0.99, 42)
    val exact = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n && est <= n + (0.001 * li.count()).toLong + n / 10)
    }
  }

  test("persist() reuses the materialized flagship across two actions") {
    val top = Text.topPTokens(T(spark, sf, "documents"), 0.9).persist()
    try {
      val n1 = top.count()
      assert(top.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan") || n1 >= 0)
      // second action must hit the cache, not re-derive the pipeline
      val plan2 = top.filter(col("cnt") > 0).queryExecution.executedPlan.toString
      assert(plan2.contains("InMemoryTableScan"), plan2.take(1500))
      assert(top.filter(col("cnt") > 0).count() == n1)
    } finally top.unpersist()
  }

  test("parameterized spark.sql binds named parameters") {
    T(spark, sf, "orders").createOrReplaceTempView("orders_p")
    val n = spark.sql(
      "SELECT count(*) AS n FROM orders_p WHERE o_totalprice > :lo",
      Map("lo" -> 300000)).collect()(0).getLong(0)
    val want = T(spark, sf, "orders")
      .filter(col("o_totalprice") > 300000).count()
    assert(n == want)
  }

  test("lateral top-2: at most two orders per customer, correctly ranked") {
    val rows = Advanced.sqlLateral(spark, sf).collect()
    val byCust = rows.groupBy(_.getLong(0))
    assert(byCust.nonEmpty)
    byCust.values.foreach { rs =>
      assert(rs.length <= 2)
      val prices = rs.map(_.getDouble(2))
      assert(prices.toSeq == prices.sortBy(-(_: Double)).toSeq)
    }
  }
}
