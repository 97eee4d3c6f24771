package graft.functions

import org.apache.spark.sql.{graftShims, Column}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom Catalyst expression for the similarity-search hot path.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are
  * INTERPRETED — every element goes through a lambda dispatch — which
  * dominates pairwise-cosine runtime. This expression participates in
  * whole-stage codegen with a tight primitive loop over the unsafe
  * array data (preference order per the project guide: compose
  * built-ins < custom Expression < custom physical operator).
  *
  * Summation is sequential left-to-right, matching both the
  * higher-order-function formulation and DuckDB's list_sum fold, so
  * swapping it in changes no result bit.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0.0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** All-permutation MinHash minima in one pass: for each (a_i, b_i)
  * pair, min over the input hash array of (a_i*h + b_i) % mod.
  *
  * Replaces k interpreted `array_min(transform(hs, ...))` higher-order
  * calls (k lambda dispatches per element) with a single codegen'd
  * k-wide inner loop — the hot path of MinHash signature derivation,
  * which at 100 TB runs once per shingle of every document. Math is
  * identical long arithmetic, so signatures are bit-equal to the
  * higher-order formulation (callers guarantee a*h+b stays < 2^63).
  * Empty input yields NULL (the composed form yields an array of
  * nulls; both only occur for shingle-less docs, which callers filter).
  */
case class MinHashSignature(child: Expression, ab: Seq[(Long, Long)], mod: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = true

  private lazy val aArr: Array[Long] = ab.map(_._1).toArray
  private lazy val bArr: Array[Long] = ab.map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    val k = aArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (aArr(j) * h + bArr(j)) % mod
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    val k = ab.length
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $c.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($aRef[$j] * $h + $bRef[$j]) % ${mod}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** First 60 bits of md5(input) as a non-negative long — bit-identical
  * to `conv(substring(md5(x), 1, 15), 16, 10)` (15 hex chars = the
  * first 7.5 digest bytes, big-endian) but without materializing the
  * hex string, substring, or base-16 parse per row. This hash is the
  * cross-engine contract shared with the DuckDB oracles
  * (`('0x' || substr(md5(x),1,15))::BIGINT`), so the digest itself
  * must stay md5.
  */
case class Md5Prefix60(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    Md5Prefix60.fromBytes(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix60.fromBytes($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  /** One digest instance per executor thread: `DigestUtils.md5`
    * runs `MessageDigest.getInstance("MD5")` per CALL — a synchronized
    * security-provider lookup plus an allocation — and this is the
    * single hottest function in the engine (every shingle of every
    * document on every minhash/simhash path lands here; ~85M calls in
    * one sf10 dedup query). `digest()` leaves the instance reset, so
    * reuse is safe.
    */
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** 60-bit big-endian prefix of the md5 digest: 7 full bytes plus
    * the high nibble of byte 8 — exactly the value of the first 15
    * hex characters parsed base-16.
    */
  def fromBytes(bytes: Array[Byte]): Long = {
    val d = tlMd.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }
}

/** Nearest coarse centroid per vector as ONE map-only codegen'd
  * expression: the centroid table (O(C) rows — collected once on the
  * driver, like any broadcast dimension) rides into codegen as a
  * reference object, and each row runs a tight primitive argmax loop.
  *
  * This replaces the `crossJoin(broadcast(cents)) + groupBy struct-max`
  * assignment, which MATERIALIZES n x C scored rows before the partial
  * aggregation collapses them — at 1M vectors x 1000 cells that is a
  * billion-row intermediate for a per-row reduction. Here the argmax
  * never leaves the register file: no shuffle, no intermediate rows,
  * whole-stage codegen intact, so corpus assignment is a genuinely
  * linear pass (per-row work O(C·d), the same FLOPs the scored stream
  * paid, minus all the row machinery).
  *
  * Semantics are bit-identical to the struct-max form (differential-
  * tested in NearestCellSpec): cosine = round6(dot(v,cv)/(nrm·cnrm))
  * with the same left-to-right summation as [[DotProduct]], Spark's
  * Round HALF_UP via the same BigDecimal path, winner = highest
  * rounded cosine with ties to the smallest centroid id, NaN ordered
  * greatest exactly as Spark's struct ordering does.
  */
case class NearestCell(vec: Expression, nrm: Expression,
    centIds: Array[Long], centVecs: Array[Array[Double]],
    centNrms: Array[Double]) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def left: Expression = vec
  override def right: Expression = nrm

  override def inputTypes: Seq[graftShims.AbsDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType), DoubleType)

  // structural equality over the array-valued centroid table (same
  // canonicalization rationale as [[LshTableBuckets]])
  override def equals(other: Any): Boolean = other match {
    case NearestCell(v, n, ids, vecs, nrms) =>
      v == vec && n == nrm &&
        java.util.Arrays.equals(centIds, ids) &&
        java.util.Arrays.deepEquals(
          centVecs.asInstanceOf[Array[AnyRef]], vecs.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(centNrms, nrms)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(vec, nrm,
      Integer.valueOf(java.util.Arrays.hashCode(centIds)),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        centVecs.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.hashCode(centNrms)))

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    NearestCell.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
      centIds, centVecs, centNrms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("ncIds", centIds, "long[]")
    val vecs = ctx.addReferenceObj("ncVecs", centVecs, "double[][]")
    val nrms = ctx.addReferenceObj("ncNrms", centNrms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = graft.functions.NearestCell.compute($v, $n, $ids, $vecs, $nrms);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(vec = newLeft, nrm = newRight)
}

object NearestCell {
  /** Spark's `round(x, 6)` for doubles, exactly: the BigDecimal
    * decimal-string path with HALF_UP — NOT `math.round`-style
    * binary rounding.
    */
  def round6(x: Double): Double =
    // NaN/Infinity pass through exactly as Spark's Round does
    // (BigDecimal.valueOf throws on them — a zero-norm vector's NaN
    // cosine must flow into the Double.compare ordering, not crash
    // the task); Double.compare then orders it greatest, same as the
    // struct-max formulation this expression replaces
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  // per-thread scratch for the raw cosines of one row — the argmax is
  // called 500k+ times per corpus pass; a fresh C-sized allocation per
  // row would be pure young-gen churn
  private val scratch = new ThreadLocal[Array[Double]] {
    override def initialValue(): Array[Double] = new Array[Double](0)
  }

  def compute(v: ArrayData, nrm: Double, ids: Array[Long],
      vecs: Array[Array[Double]], nrms: Array[Double]): Long = {
    // Round-13 profile: round6's BigDecimal round-trip per (row, cell)
    // was 2/3 of the whole media-corpus assignment (9 s of a 15 s
    // query at 500k x 488). round6 is MONOTONE, so the winning rounded
    // value is round6(rawMax), and round6 moves a value by at most
    // 5e-7 — only raws within 1e-6 of rawMax can round to it. Pass 1
    // finds raw cosines (no rounding); pass 2 rounds just the
    // near-top sliver and applies the exact original (rounded desc,
    // id asc) selection — bit-identical winners (NearestCellSpec
    // differential-covers this against the struct-max form).
    val C = ids.length
    var buf = scratch.get()
    if (buf.length < C) { buf = new Array[Double](C); scratch.set(buf) }
    val va = v.toDoubleArray()
    var rawMax = Double.NegativeInfinity
    var c = 0
    while (c < C) {
      val cv = vecs(c)
      val n = math.min(va.length, cv.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += va(i) * cv(i); i += 1 }
      val raw = s / (nrm * nrms(c))
      buf(c) = raw
      // Double.compare orders NaN greatest and -0.0 < 0.0, matching
      // Spark's struct-max double ordering
      if (java.lang.Double.compare(raw, rawMax) > 0) rawMax = raw
      c += 1
    }
    // NaN rawMax -> NaN threshold: compare(x, NaN) >= 0 only for NaN
    // raws, exactly the original candidate set (NaN beats everything).
    // Inf - 2e-6 = Inf keeps only Inf raws. 2e-6 doubles the proven
    // 1e-6 bound for margin; a few extra round6 calls are free.
    val threshold = rawMax - 2e-6
    var best = Double.NegativeInfinity
    var bestId = Long.MaxValue
    c = 0
    while (c < C) {
      if (java.lang.Double.compare(buf(c), threshold) >= 0) {
        val ccos = round6(buf(c))
        val cmp = java.lang.Double.compare(ccos, best)
        if (cmp > 0 || (cmp == 0 && ids(c) < bestId)) {
          best = ccos
          bestId = ids(c)
        }
      }
      c += 1
    }
    bestId
  }
}

/** Squared L2 distance of two ArrayType(DoubleType) columns, as one
  * codegen'd left-to-right loop: sum of (a_i - b_i)^2 in index order —
  * the elementwise form (NOT the |a|^2 - 2ab + |b|^2 expansion, which
  * is different IEEE arithmetic), mirrored exactly by the oracles'
  * `list_sum(list_transform(..., i -> (a[i]-b[i]) * (a[i]-b[i])))`.
  * The distance metric for the product-quantization path, where
  * codebook training, encoding, and the ADC lookup tables must all
  * derive from bit-identical distances in both engines.
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encoder: one map-only pass turning a d-dim
  * vector into `S` codebook ids (the 32x memory compression that makes
  * a 100 TB vector store fit a serving tier). For each of the `S`
  * contiguous subspaces of width `subDim`, the code is the codebook
  * entry minimizing squared L2 distance over that slice (same
  * left-to-right arithmetic as [[SqDist]]), ties to the smallest
  * codebook id — mirroring the oracle's
  * `row_number() OVER (ORDER BY d ASC, cid ASC) = 1`. The codebook
  * (S x C x subDim, collected once) rides in as a reference object;
  * no shuffle, no n x C scored stream, whole-stage codegen intact.
  */
case class PqEncode(child: Expression, codeIds: Array[Array[Long]],
    codeVecs: Array[Array[Array[Double]]], subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codeIds, codeVecs, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("pqIds", codeIds, "long[][]")
    val vecs = ctx.addReferenceObj("pqVecs", codeVecs, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqEncode.compute($c, $ids, $vecs, $subDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Subspace-major codebook: codeVecs(s)(c) is entry c's slice for
    * subspace s, aligned with codeIds(s)(c). Ids are per subspace
    * because a TRAINED codebook drops memberless entries
    * independently in each subspace (the stride codebook passes the
    * same id row for every s).
    */
  def compute(v: ArrayData, ids: Array[Array[Long]],
      vecs: Array[Array[Array[Double]]], subDim: Int): ArrayData = {
    val nSub = vecs.length
    val codes = new Array[Long](nSub)
    var s = 0
    while (s < nSub) {
      val off = s * subDim
      val cands = vecs(s)
      val candIds = ids(s)
      var best = Double.PositiveInfinity
      var bestId = Long.MaxValue
      var c = 0
      while (c < cands.length) {
        val cv = cands(c)
        var d2 = 0.0
        var i = 0
        while (i < subDim) {
          val d = v.getDouble(off + i) - cv(i)
          d2 += d * d
          i += 1
        }
        // Double.compare: NaN greatest, matching SQL ASC-last ordering
        val cmp = java.lang.Double.compare(d2, best)
        if (cmp < 0 || (cmp == 0 && candIds(c) < bestId)) {
          best = d2
          bestId = candIds(c)
        }
        c += 1
      }
      codes(s) = bestId
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }
}

/** Top-`nprobe` nearest coarse centroids per vector — the multi-probe
  * generalization of [[NearestCell]], returned as an array ordered by
  * (rounded cosine desc, centroid id asc). Same collected-centroid
  * reference object, same tight codegen'd loop, so probing a vector
  * into its `nprobe` best cells is STILL one map-only pass with zero
  * shuffle and no n x C intermediate rows — this is what lets
  * cell-bucketed pair generation (semantic near-dup) probe both sides
  * of a cell boundary without re-materializing a scored stream.
  *
  * Element 0 is always [[NearestCell]]'s answer (differential-tested
  * in NearestCellSpec); the selection mirrors the
  * `row_number() OVER (ORDER BY ccos DESC, cid ASC) <= nprobe` window
  * form bit-for-bit (same round6, same Double.compare ordering).
  */
case class NearestCells(vec: Expression, nrm: Expression,
    centIds: Array[Long], centVecs: Array[Array[Double]],
    centNrms: Array[Double], nprobe: Int) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def left: Expression = vec
  override def right: Expression = nrm

  override def inputTypes: Seq[graftShims.AbsDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType), DoubleType)

  // structural equality over the array-valued centroid table (same
  // canonicalization rationale as [[LshTableBuckets]])
  override def equals(other: Any): Boolean = other match {
    case NearestCells(v, n, ids, vecs, nrms, np) =>
      v == vec && n == nrm && np == nprobe &&
        java.util.Arrays.equals(centIds, ids) &&
        java.util.Arrays.deepEquals(
          centVecs.asInstanceOf[Array[AnyRef]], vecs.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(centNrms, nrms)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(vec, nrm, Integer.valueOf(nprobe),
      Integer.valueOf(java.util.Arrays.hashCode(centIds)),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        centVecs.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.hashCode(centNrms)))

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any =
    NearestCells.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
      centIds, centVecs, centNrms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("ncIds", centIds, "long[]")
    val vecs = ctx.addReferenceObj("ncVecs", centVecs, "double[][]")
    val nrms = ctx.addReferenceObj("ncNrms", centNrms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = graft.functions.NearestCells.compute(" +
        s"$v, $n, $ids, $vecs, $nrms, $nprobe);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCells =
    copy(vec = newLeft, nrm = newRight)
}

object NearestCells {
  /** Insertion-select the `nprobe` best (ccos desc, id asc) centroids.
    * O(C * nprobe) with nprobe tiny (2-8) — the same work the window
    * form pays, minus the n x C rows and the shuffle.
    */
  private val scratch = new ThreadLocal[Array[Double]] {
    override def initialValue(): Array[Double] = new Array[Double](0)
  }

  def compute(v: ArrayData, nrm: Double, ids: Array[Long],
      vecs: Array[Array[Double]], nrms: Array[Double],
      nprobe: Int): ArrayData = {
    // Same two-pass round6 elision as [[NearestCell.compute]]: the
    // rounded top-m can only contain cells whose RAW cosine is within
    // 1e-6 of the m-th largest raw (round6 monotone, moves a value by
    // at most 5e-7) — so pass 1 tracks raw values only, and the
    // BigDecimal rounding runs for the near-cutoff sliver instead of
    // every (row, cell). Selection semantics are unchanged
    // (NearestCellSpec differential-pins element 0 and the window
    // form pins the full array).
    val C = ids.length
    val m = math.min(nprobe, C)
    var buf = scratch.get()
    if (buf.length < C) { buf = new Array[Double](C); scratch.set(buf) }
    val va = v.toDoubleArray()
    // pass 1: raw cosines + the m-th largest raw (values only — the
    // id tiebreak doesn't change the cutoff VALUE)
    val topRaw = new Array[Double](m)
    var filled = 0
    var c = 0
    while (c < C) {
      val cv = vecs(c)
      val n = math.min(va.length, cv.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += va(i) * cv(i); i += 1 }
      val raw = s / (nrm * nrms(c))
      buf(c) = raw
      var pos = filled
      while (pos > 0 &&
          java.lang.Double.compare(raw, topRaw(pos - 1)) > 0) pos -= 1
      if (pos < m) {
        val last = math.min(filled, m - 1)
        var j = last
        while (j > pos) { topRaw(j) = topRaw(j - 1); j -= 1 }
        topRaw(pos) = raw
        if (filled < m) filled += 1
      }
      c += 1
    }
    val cutoff =
      if (filled < m) Double.NegativeInfinity else topRaw(m - 1) - 2e-6
    // pass 2: round the candidates and run the exact original
    // (rounded desc, id asc) insertion select over them
    val topCos = new Array[Double](m)
    val topId = new Array[Long](m)
    filled = 0
    c = 0
    while (c < C) {
      if (java.lang.Double.compare(buf(c), cutoff) >= 0) {
        val ccos = NearestCell.round6(buf(c))
        val id = ids(c)
        var pos = filled
        while (pos > 0 && {
          val cmp = java.lang.Double.compare(ccos, topCos(pos - 1))
          cmp > 0 || (cmp == 0 && id < topId(pos - 1))
        }) pos -= 1
        if (pos < m) {
          val last = math.min(filled, m - 1)
          var j = last
          while (j > pos) { topCos(j) = topCos(j - 1); topId(j) = topId(j - 1); j -= 1 }
          topCos(pos) = ccos
          topId(pos) = id
          if (filled < m) filled += 1
        }
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(topId, filled))
  }
}

/** Every hash table's sign-LSH bucket for one vector, in a single
  * tight loop over a driver-collected plane matrix (`planes(t)(p)(d)`
  * rides into codegen as a reference object, like [[NearestCell]]'s
  * centroid table).
  *
  * This exists because the Column composition — `array(tables x
  * (planes x when(DotProduct(v, lit64) > 0, 1L<<p)))` — inlines
  * `tables·planes` 64-element literal arrays into ONE generated
  * method: at the mult=100 corpus (4 tables x 13 planes = 52 literal
  * dots) the method blows past the JIT/codegen size budget and the
  * whole projection drops out of compiled execution (measured 105 s
  * for the corpus scan; this expression: the same scan in ~2 s).
  * Bit-identical to the composition: per-plane dot is the
  * left-to-right [[DotProduct]] sum, a bucket bit is set iff
  * dot > 0 strictly.
  */
case class LshTableBuckets(child: Expression,
    planes: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // analysis-time type contract (round-11 advisor, same gap MortonKey
  // closed): without it a non-double array child — e.g. the raw float
  // embedding column — passes analysis and then misreads through
  // ArrayData.getDouble at runtime; with it analysis inserts the cast
  // or rejects the query
  override def inputTypes: Seq[graftShims.AbsDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType))

  // the Java-array field would make case-class equality
  // reference-based, defeating plan canonicalization and common
  // subexpression elimination — compare the plane matrix structurally
  override def equals(other: Any): Boolean = other match {
    case LshTableBuckets(c, p) =>
      c == child && java.util.Arrays.deepEquals(
        planes.asInstanceOf[Array[AnyRef]], p.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    LshTableBuckets.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LshTableBuckets.compute($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshTableBuckets =
    copy(child = newChild)
}

object LshTableBuckets {
  def compute(v: ArrayData,
      planes: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val tp = planes(t)
      var bucket = 0L
      var p = 0
      while (p < tp.length) {
        val pl = tp(p)
        val n = math.min(v.numElements(), pl.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * pl(i); i += 1 }
        if (s > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

object VectorFunctions {
  /** Codegen'd dot product of two ArrayType(DoubleType) columns. */
  def dot_product(a: Column, b: Column): Column =
    graftShims.toColumn(
      DotProduct(graftShims.toExpression(a), graftShims.toExpression(b)))

  /** Codegen'd per-table sign-LSH buckets over a collected plane
    * matrix (`planes(t)(p)(d)`) — one ArrayType(LongType) of
    * `planes.length` bucket ids.
    */
  def lsh_table_buckets(v: Column,
      planes: Array[Array[Array[Double]]]): Column =
    graftShims.toColumn(
      LshTableBuckets(graftShims.toExpression(v), planes))

  /** Codegen'd nearest-centroid assignment over a collected centroid
    * table (ids/vectors/norms aligned by index).
    */
  def nearest_cell(v: Column, nrm: Column, ids: Array[Long],
      vecs: Array[Array[Double]], nrms: Array[Double]): Column =
    graftShims.toColumn(NearestCell(graftShims.toExpression(v),
      graftShims.toExpression(nrm), ids, vecs, nrms))

  /** Codegen'd top-`nprobe` nearest-centroid assignment (multi-probe),
    * as an array ordered by (rounded cosine desc, centroid id asc).
    */
  def nearest_cells(v: Column, nrm: Column, ids: Array[Long],
      vecs: Array[Array[Double]], nrms: Array[Double], nprobe: Int): Column =
    graftShims.toColumn(NearestCells(graftShims.toExpression(v),
      graftShims.toExpression(nrm), ids, vecs, nrms, nprobe))

  /** Codegen'd squared-L2 distance of two ArrayType(DoubleType)
    * columns (left-to-right elementwise sum).
    */
  def sq_dist(a: Column, b: Column): Column =
    graftShims.toColumn(
      SqDist(graftShims.toExpression(a), graftShims.toExpression(b)))

  /** Codegen'd product-quantization encoder over a subspace-major
    * codebook (ids(s) aligned with vecs(s)).
    */
  def pq_encode(v: Column, ids: Array[Array[Long]],
      vecs: Array[Array[Array[Double]]], subDim: Int): Column =
    graftShims.toColumn(
      PqEncode(graftShims.toExpression(v), ids, vecs, subDim))

  /** Codegen'd MinHash signature over an ArrayType(LongType) hash
    * column — one array of per-permutation minima.
    */
  def minhash_signature(hs: Column, ab: Seq[(Long, Long)], mod: Long): Column =
    graftShims.toColumn(
      MinHashSignature(graftShims.toExpression(hs), ab, mod))

  /** Codegen'd 60-bit md5 prefix of a string column. */
  def md5_prefix60(c: Column): Column =
    graftShims.toColumn(Md5Prefix60(graftShims.toExpression(c)))

  /** Codegen'd Hilbert-curve index of two coordinates on the 16-bit
    * grid (see [[HilbertCurve]]).
    */
  def hilbert_key(x: Column, y: Column): Column =
    graftShims.toColumn(HilbertKey(
      graftShims.toExpression(x.cast("bigint")),
      graftShims.toExpression(y.cast("bigint"))))

  /** Codegen'd d-dimensional Morton key (see [[MortonKey]]): one
    * static-loop call per coordinate instead of an O(bits*d)-node
    * Column tree per row.
    */
  def morton_key(cols: Seq[Column], bits: Int): Column =
    graftShims.toColumn(MortonKey(
      cols.map(c => graftShims.toExpression(c.cast("bigint"))), bits))
}
