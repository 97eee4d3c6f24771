package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, graftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col

/** Top-k rows per key as a first-class operator: custom logical node +
  * planner strategy + a TWO-STAGE physical operator, registered via
  * `extraStrategies` / [[graft.functions.GraftExtensions]].
  *
  * Why a custom operator (preference (c) of the project guide): the
  * declarative form — `row_number() OVER (PARTITION BY k ORDER BY o)
  * <= k` — shuffles EVERY row to its key's reducer and sorts it
  * there, because a window function cannot be partially evaluated.
  * But top-k per key is decomposable exactly like a partial
  * aggregate: a bounded heap per key on each input partition first
  * prunes locally to <= k rows per (key, partition), and only those
  * survivors shuffle. Shuffle volume drops from O(n) to
  * O(k * keys * partitions) — on a heavy-hitter key distribution at
  * 100 TB that is the difference between a full-corpus exchange and
  * kilobytes — while the final stage runs the same bounded heaps on
  * the clustered survivors for an exact answer.
  *
  * The caller's `ordering` must be a TOTAL order (include a tiebreak
  * column) for engine-reproducible results — the same contract every
  * window query in the repo already follows.
  */
case class TopKPerKey(keys: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** DataFrame-level entry point: top `k` rows per `keys` group in
    * `order` (give a total order — include a tiebreak). Installs the
    * strategy on the session if absent.
    */
  def topK(df: DataFrame, keys: Seq[String], order: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.exists(_ eq TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val childPlan = df.queryExecution.analyzed
    // resolve key names to the child's attributes directly — generic
    // analysis does not reach inside a custom node's ColumnNode wrappers
    val resolver = spark.sessionState.analyzer.resolver
    val keyExprs: Seq[Expression] = keys.map(n =>
      childPlan.output.find(a => resolver(a.name, n)).getOrElse(
        sys.error(s"topK key '$n' not in ${childPlan.output.map(_.name)}")))
    // Column-level sort specs are sql.internal nodes (not serializable
    // catalyst SortOrder); route them through an analyzed Sort so the
    // converter+analyzer produce the resolved catalyst form
    val sortOrders = df.sortWithinPartitions(order: _*)
      .queryExecution.analyzed.collectFirst {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.order
      }.getOrElse(sys.error("sort order did not analyze to a Sort node"))
    graftShims.ofRows(spark, TopKPerKey(keyExprs, sortOrders, k, childPlan))
  }
}

/** Plans [[TopKPerKey]] as partial-then-final [[TopKPerKeyExec]] —
  * the same shape Spark gives a decomposable aggregate.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ord, k, child) =>
      val partial = TopKPerKeyExec(keys, ord, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, ord, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key heaps over each partition. `partial = true` runs
  * on whatever partitioning arrives (the map-side prune);
  * `partial = false` demands clustering on `keys`, so
  * EnsureRequirements inserts the one (pruned) exchange between the
  * two stages. Both stages run identical heap logic; idempotence on
  * already-pruned input is what makes the decomposition exact.
  *
  * Memory bound — read before reaching for this on a new query: the
  * per-partition state is O(distinct keys in partition x k) rows in
  * an UNSPILLABLE hash map (unlike Spark's window/aggregate, which
  * spill). That is the right trade for the grouped-dimension keys it
  * serves (`o3_topk_exec`: suppliers, categories — key counts in the
  * thousands); for near-unique keys (top-k per user over billions)
  * use the WindowGroupLimit form, whose sort spills. The partial
  * stage bounds the exchange either way; the cardinality question is
  * only about executor heap.
  *
  * That assumption is ENFORCED at runtime (round-14 verdict #5): a
  * partition crossing `spark.graft.topkMaxKeysPerPartition` distinct
  * keys (default [[TopKPerKeyExec.MaxKeysPerPartition]]) fails fast
  * with the WindowGroupLimit guidance instead of quietly inflating
  * the unspillable map until the executor OOMs mid-shuffle.
  *
  * Since round 16 the operator is TOTAL under
  * `spark.graft.topkFallback=sort`: a partition that crosses the
  * guard DEGRADES — in that partition only — to a SPILLABLE
  * external sort ([[org.apache.spark.sql.execution.UnsafeExternalRowSorter]],
  * the machinery under SortExec/Window) ordered by (keys, caller
  * ordering), emitting the first k rows per key group in one
  * streaming pass. Rows already evicted by the heaps stay dropped —
  * an evicted row is worse than k retained rows of its key, so it
  * can never re-enter the top-k — and the retained rows + the rest
  * of the stream feed the sorter, so the result set is identical to
  * the heap path (TopKPerKeySpec pins both directions). The default
  * stays `fail`: fail-fast remains the guard's contract (a
  * near-unique-key plan should be REWRITTEN to the window form, not
  * silently absorbed), and the plans of every shipped query are
  * unchanged; the config turns the cliff into a degrade for
  * workloads whose key cardinality is only occasionally over.
  */
case class TopKPerKeyExec(keys: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning = child.outputPartitioning

  /** The final stage demands clustering on the NORMALIZED keys, not
    * the raw ones (round-17 advisor): doExecute's grouping projection
    * treats -0.0 == 0.0 and all NaN bit patterns as one value, so the
    * exchange that satisfies this distribution must agree — a child
    * satisfying ClusteredDistribution(raw keys) via range partitioning
    * orders -0.0 < 0.0 (Double.compare) and could land
    * comparator-equal float keys in DIFFERENT partitions, emitting up
    * to 2k rows for one logical key. Declaring the normalized
    * expressions here is exactly where Spark's own
    * NormalizeFloatingNumbers rule puts them for built-in aggregates:
    * below the exchange.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys.map(graftShims.normalizeFloats)) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "sortFallbacks" -> SQLMetrics.createMetric(sparkContext,
      "partitions degraded to spillable sort"))

  override protected def doExecute(): RDD[InternalRow] = {
    // Both stages key their state on RAW PROJECTED BYTES (the heap
    // path's LinkedHashMap and the degrade sort's group-boundary
    // compare), while the degrade sort ORDERS by a comparator — so a
    // float/double key whose comparator-equal values are byte-distinct
    // (-0.0 vs 0.0, NaN bit patterns) would interleave in the sorted
    // stream and reset the group counter mid-key. The custom node sits
    // outside the optimizer's NormalizeFloatingNumbers rule, so apply
    // the same normalization here: grouping treats -0.0 == 0.0 and all
    // NaNs as one value (Spark's GROUP BY contract), and the heap and
    // sort paths agree bit-for-bit.
    val keyExprs = keys.map(graftShims.normalizeFloats)
    val ord = ordering
    val kk = k
    val childOutput = child.output
    val numOutputRows = longMetric("numOutputRows")
    val sortFallbacks = longMetric("sortFallbacks")
    // (keys asc, caller ordering): any total order that CLUSTERS key
    // groups works for the degrade sort; within a group the caller's
    // ordering puts the top k first
    val groupOrd =
      keyExprs.map(SortOrder(_, Ascending)) ++ ord
    val schema = org.apache.spark.sql.types.StructType(childOutput.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
    // capture on the driver: executor-side tasks don't see session conf
    val maxKeys = session.conf
      .get("spark.graft.topkMaxKeysPerPartition",
        TopKPerKeyExec.MaxKeysPerPartition.toString).toLong
    val fallbackMode = session.conf.get("spark.graft.topkFallback", "fail")
    require(fallbackMode == "fail" || fallbackMode == "sort",
      s"spark.graft.topkFallback must be 'fail' or 'sort', got '$fallbackMode'")
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = GenerateOrdering.generate(ord, childOutput)
      // head of each queue = WORST retained row (reverse ordering), so
      // admission is one compare against the head
      val worstFirst = cmp.reverse
      val heaps = new java.util.LinkedHashMap[
        UnsafeRow, java.util.PriorityQueue[InternalRow]]()

      /** The config-selected degrade (round-16 verdict #4): spill the
        * retained rows + the rest of the stream through an external
        * sort on (keys, ordering), then keep the first k per key
        * group. Heap-evicted rows stay dropped — each is worse than k
        * retained rows of its own key.
        */
      def sortDegrade(pending: InternalRow,
          rest: Iterator[InternalRow]): Iterator[InternalRow] = {
        sortFallbacks += 1
        val fullCmp = GenerateOrdering.generate(groupOrd, childOutput)
        val prefixComputer =
          new org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer {
            private val p = new org.apache.spark.sql.execution
              .UnsafeExternalRowSorter.PrefixComputer.Prefix
            override def computePrefix(row: InternalRow) = {
              p.value = 0L; p.isNull = false; p
            }
          }
        val sorter = org.apache.spark.sql.execution.UnsafeExternalRowSorter
          .create(schema, fullCmp,
            org.apache.spark.util.collection.unsafe.sort
              .PrefixComparators.LONG,
            prefixComputer,
            org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes,
            false)
        // toUnsafe's buffer reuse is safe: the sorter copies each row
        // into its pages on insert (same contract SortExec relies on)
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        val retained = heaps.values().asScala.iterator
          .flatMap(_.iterator().asScala)
        val all = (retained ++ Iterator.single(pending) ++ rest).map {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        val sorted = sorter.sort(all)
        var curKey: UnsafeRow = null
        var inGroup = 0
        sorted.filter { r =>
          val key = keyProj(r)
          if (curKey == null || key != curKey) {
            curKey = key.copy(); inGroup = 0
          }
          inGroup += 1
          if (inGroup <= kk) { numOutputRows += 1; true } else false
        }
      }

      var degrade: Iterator[InternalRow] = null
      while (degrade == null && iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          if (heaps.size() >= maxKeys) {
            if (fallbackMode == "sort") degrade = sortDegrade(row, iter)
            else throw new IllegalStateException(
              s"TopKPerKeyExec: a partition crossed $maxKeys distinct " +
                "keys (spark.graft.topkMaxKeysPerPartition). The per-key " +
                "heaps are unspillable and sized for grouped-dimension " +
                "keys; for near-unique keys use the window form — " +
                s"row_number() OVER (PARTITION BY key ORDER BY ...) <= $kk" +
                " — whose WindowGroupLimit sort spills. Raise the config " +
                "only if the executors have heap for keys x k rows, or " +
                "set spark.graft.topkFallback=sort to degrade crossing " +
                "partitions to a spillable external sort.")
          } else {
            q = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
            heaps.put(key.copy(), q)
          }
        }
        if (degrade == null) {
          if (q.size < kk) q.add(row.copy())
          else if (cmp.compare(row, q.peek()) < 0) {
            q.poll()
            q.add(row.copy())
          }
        }
      }
      if (degrade != null) degrade
      else heaps.values().asScala.iterator.flatMap { q =>
        numOutputRows += q.size
        q.iterator().asScala
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Default per-partition distinct-key ceiling. At k=3 and ~150 B
    * per retained row, 1M keys is ~0.5 GB of unspillable map per
    * task — loud enough to stop before an OOM, far above any
    * grouped-dimension use (the repo's callers carry 10^2-10^4
    * keys). Override: `spark.graft.topkMaxKeysPerPartition`.
    */
  val MaxKeysPerPartition = 1000000L
}
