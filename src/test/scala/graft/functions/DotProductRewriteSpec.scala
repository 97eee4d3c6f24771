package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductRewriteSpec extends SparkSpec {

  test("the declarative HOF dot product rewrites to the codegen expression") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ DotProductRewrite
    try {
      // a real scan (a literal relation would constant-fold away
      // before the plan can be inspected)
      val df = graft.ops.T(spark, sf, "embeddings").limit(5)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val hof = df.select(col("vec_id"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, w) => acc + w).as("d"))
      val optimized = hof.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dotproduct("), optimized)
      assert(!optimized.contains("aggregate(zip_with"), optimized)
      // rewritten result == the interpreted fold, bit-identical
      val want = df.select(col("vec_id"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, w) => acc + w).as("d"))
      spark.experimental.extraOptimizations = prev
      val a = hof.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = want.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.experimental.extraOptimizations = prev :+ DotProductRewrite
      assert(a == b)

      // strictness: a non-multiply zip body must NOT be rewritten
      val sumZip = df.select(
        aggregate(zip_with(col("v"), col("v"), (x, y) => x + y),
          lit(0.0), (acc, w) => acc + w).as("d"))
      assert(!sumZip.queryExecution.optimizedPlan.toString
        .contains("dotproduct("))
    } finally spark.experimental.extraOptimizations = prev
  }
}
