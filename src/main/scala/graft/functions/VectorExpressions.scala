package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding-similarity hot paths.
  *
  * The pure-`functions._` formulations (`aggregate` ∘ `zip_with` for dot
  * products, an unrolled planes×dims multiply-add tree for LSH buckets)
  * are correct but hostile to execution at scale: Spark does not codegen
  * higher-order array functions, and a 512-term unrolled tree overflows
  * the codegen method-size limits, so both fall back to interpreted
  * per-row evaluation of thousands of Expression nodes. These operators
  * replace them with tight generated loops (plus an identical interpreted
  * `eval` for completeness), keeping the scan inside whole-stage codegen.
  *
  * Accumulation order is strictly sequential over dimensions — identical
  * to the left-assoc fold of the expression-tree versions — so results
  * are bit-for-bit unchanged.
  *
  * Null semantics (all three expressions, eval AND generated code):
  * a NULL input array, an array whose length differs from the expected
  * dimension, or an array containing a NULL element yields NULL — the
  * same propagation the `zip_with`-based Column formulation has.
  *
  * Reference behavior: hyperplane-LSH bucketing mirrors the banding
  * candidate generation the reference applies to record keys
  * (hudi bloom-index min/max pruning) transposed to vector space; the
  * reference has no vector operators, this is the training-data
  * extension surface.
  */
object VectorExpressions {

  /** splitmix64 finalizer — deterministic hyperplane seed, identical on
    * driver and executors with no Spark evaluation needed. SINGLE source
    * of truth: `Similarity` delegates here, so buckets stored at ingest
    * and buckets computed by [[LshBucketExpr]] can never diverge.
    */
  def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic hyperplane component for (plane, dim) in [-0.5, 0.5). */
  def planeComponent(plane: Int, dim: Int): Double =
    (java.lang.Math.floorMod(
      splitmix64(plane.toLong * 1000003L + dim), 1000L).toDouble / 1000.0) - 0.5

  def planeMatrix(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim)(planeComponent)

  /** Centroids scaled by their inverse norms — the single source of the
    * IVF scoring matrix, shared by [[IvfCellExpr]] (executors) and
    * `Similarity.ivfCellOf` (driver) so cell assignment is bit-for-bit
    * identical on both sides.
    */
  def scaledCentroids(centroids: Seq[Seq[Double]]): Array[Array[Double]] =
    centroids.map { c =>
      val a = c.toArray
      var s = 0.0; var d = 0
      while (d < a.length) { s += a(d) * a(d); d += 1 }
      val inv = 1.0 / math.max(math.sqrt(s), 1e-12)
      a.map(_ * inv)
    }.toArray

  private[functions] def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private[functions] def checkVectorType(
      dt: DataType, what: String, pretty: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$pretty requires $what to be array<float> or array<double>, got ${other.sql}")
  }

  /** `true` iff the first `n` elements are readable (array long enough,
    * no null elements) — the shared null gate for eval paths.
    */
  private[functions] def readable(arr: ArrayData, n: Int): Boolean = {
    if (arr.numElements() != n) return false
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) return false
      d += 1
    }
    true
  }

  /** Generated-code fragment: sets `okVar` false if `arr` is not exactly
    * `n` elements of non-null data. Mirrors [[readable]].
    */
  private[functions] def genReadable(
      ctx: CodegenContext, arr: String, n: String, okVar: String): String = {
    val d = ctx.freshName("d")
    s"""
      |boolean $okVar = ($arr.numElements() == $n);
      |if ($okVar) {
      |  for (int $d = 0; $d < $n; $d++) {
      |    if ($arr.isNullAt($d)) { $okVar = false; break; }
      |  }
      |}
      |""".stripMargin
  }
}

/** LSH bucket id of a vector column: sign bits of `numPlanes` hyperplane
  * projections packed into a long. Generated code is a planes×dims loop
  * over a referenced constant matrix — O(planes·dim) work with zero
  * expression-tree overhead, fully inside whole-stage codegen.
  */
case class LshBucketExpr(child: Expression, numPlanes: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVectorType(child.dataType, "its input", prettyName)

  @transient private lazy val mat: Array[Array[Double]] =
    VectorExpressions.planeMatrix(numPlanes, dim)
  @transient private lazy val isFloat =
    VectorExpressions.isFloatArray(child.dataType)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (!VectorExpressions.readable(arr, dim)) return null
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      val row = mat(p)
      var proj = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        proj += x * row(d)
        d += 1
      }
      if (proj > 0.0) bucket += (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("lshPlanes", mat, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val bucket = ctx.freshName("bucket")
    val proj = ctx.freshName("proj")
    val row = ctx.freshName("row")
    val ok = ctx.freshName("ok")
    val p = ctx.freshName("p")
    val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, arr => s"""
      |${VectorExpressions.genReadable(ctx, arr, dim.toString, ok)}
      |if (!$ok) {
      |  ${ev.isNull} = true;
      |} else {
      |  long $bucket = 0L;
      |  for (int $p = 0; $p < $numPlanes; $p++) {
      |    double $proj = 0.0;
      |    double[] $row = $matRef[$p];
      |    for (int $d = 0; $d < $dim; $d++) {
      |      $proj += ((double) $arr.$getter($d)) * $row[$d];
      |    }
      |    if ($proj > 0.0) $bucket += (1L << $p);
      |  }
      |  ${ev.value} = $bucket;
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** IVF coarse-quantizer cell of a vector column: the index of the
  * centroid with the largest cosine similarity (ties go to the lowest
  * index). Since the row vector's own norm is a common factor across
  * centroids, the argmax needs only dot(a, c_k) / |c_k| — the inverse
  * centroid norms are folded in driver-side, and the generated code is
  * one K×dim multiply-add loop over a referenced constant matrix, fully
  * inside whole-stage codegen. Must stay bit-for-bit identical to the
  * driver-side twin `Similarity.ivfCellOf` (same accumulation order),
  * so cells stored at ingest and query-time probe cells never diverge.
  */
case class IvfCellExpr(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_cell"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVectorType(child.dataType, "its input", prettyName)

  private def dim: Int = centroids.head.size

  /** Centroids scaled by their inverse norms — argmax of the plain dot
    * product against these equals argmax of cosine.
    */
  @transient private lazy val mat: Array[Array[Double]] =
    VectorExpressions.scaledCentroids(centroids)
  @transient private lazy val isFloat =
    VectorExpressions.isFloatArray(child.dataType)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (!VectorExpressions.readable(arr, dim)) return null
    var best = 0
    var bestScore = Double.NegativeInfinity
    var k = 0
    while (k < mat.length) {
      val row = mat(k)
      var dot = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        dot += x * row(d)
        d += 1
      }
      if (dot > bestScore) { bestScore = dot; best = k }
      k += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("ivfCentroids", mat, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val best = ctx.freshName("best")
    val bestScore = ctx.freshName("bestScore")
    val dot = ctx.freshName("dot")
    val row = ctx.freshName("row")
    val ok = ctx.freshName("ok")
    val k = ctx.freshName("k")
    val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, arr => s"""
      |${VectorExpressions.genReadable(ctx, arr, dim.toString, ok)}
      |if (!$ok) {
      |  ${ev.isNull} = true;
      |} else {
      |  int $best = 0;
      |  double $bestScore = Double.NEGATIVE_INFINITY;
      |  for (int $k = 0; $k < ${mat.length}; $k++) {
      |    double $dot = 0.0;
      |    double[] $row = $matRef[$k];
      |    for (int $d = 0; $d < $dim; $d++) {
      |      $dot += ((double) $arr.$getter($d)) * $row[$d];
      |    }
      |    if ($dot > $bestScore) { $bestScore = $dot; $best = $k; }
      |  }
      |  ${ev.value} = $best;
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of a vector column against a CONSTANT query vector,
  * computed in one pass (dot, |a|², with |q| folded in driver-side).
  * Semantics: dot(a,q) / (max(sqrt(dot(a,a)), 1e-12) *
  * max(sqrt(dot(q,q)), 1e-12)) — BOTH norms are clamped: an unguarded
  * row norm turns an all-zero embedding (the common missing-vector
  * sentinel) into 0/0 = NaN, and NaN sorts ABOVE every real value in a
  * descending order, putting zero vectors first in every top-k; clamped,
  * they score 0 and never rank —
  * the same guarded formula as the Column version, same accumulation
  * order, so rankings are unchanged.
  */
case class CosineConstExpr(child: Expression, query: Seq[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_const"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVectorType(child.dataType, "its input", prettyName)

  @transient private lazy val q: Array[Double] = query.toArray
  @transient private lazy val qNorm: Double = {
    var s = 0.0; var d = 0
    while (d < q.length) { s += q(d) * q(d); d += 1 }
    math.max(math.sqrt(s), 1e-12)
  }
  @transient private lazy val isFloat =
    VectorExpressions.isFloatArray(child.dataType)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = q.length
    if (!VectorExpressions.readable(arr, n)) return null
    var dot = 0.0
    var na = 0.0
    var d = 0
    while (d < n) {
      val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      dot += x * q(d)
      na += x * x
      d += 1
    }
    dot / (math.max(math.sqrt(na), 1e-12) * qNorm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("cosQuery", q, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val ok = ctx.freshName("ok")
    val x = ctx.freshName("x")
    val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, arr => s"""
      |${VectorExpressions.genReadable(ctx, arr, q.length.toString, ok)}
      |if (!$ok) {
      |  ${ev.isNull} = true;
      |} else {
      |  double $dot = 0.0;
      |  double $na = 0.0;
      |  for (int $d = 0; $d < ${q.length}; $d++) {
      |    double $x = (double) $arr.$getter($d);
      |    $dot += $x * $qRef[$d];
      |    $na += $x * $x;
      |  }
      |  ${ev.value} = $dot /
      |    (java.lang.Math.max(java.lang.Math.sqrt($na), 1e-12) * $qNorm);
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of two vector columns in one generated pass.
  * Same guarded formula, accumulation order, and null-on-length-mismatch
  * propagation as the `zip_with`-based Column version:
  * dot/(max(sqrt(na), 1e-12) * max(sqrt(nb), 1e-12)); NULL if the arrays differ in
  * length or contain NULL elements.
  */
case class CosineColsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_cols"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorExpressions.checkVectorType(left.dataType, "its left input", prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorExpressions.checkVectorType(right.dataType, "its right input", prettyName)
  }

  @transient private lazy val leftFloat =
    VectorExpressions.isFloatArray(left.dataType)
  @transient private lazy val rightFloat =
    VectorExpressions.isFloatArray(right.dataType)

  override protected def nullSafeEval(a0: Any, b0: Any): Any = {
    val a = a0.asInstanceOf[ArrayData]
    val b = b0.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (!VectorExpressions.readable(b, n) || !VectorExpressions.readable(a, n)) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var d = 0
    while (d < n) {
      val x = if (leftFloat) a.getFloat(d).toDouble else a.getDouble(d)
      val y = if (rightFloat) b.getFloat(d).toDouble else b.getDouble(d)
      dot += x * y; na += x * x; nb += y * y
      d += 1
    }
    dot / (math.max(math.sqrt(na), 1e-12) * math.max(math.sqrt(nb), 1e-12))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ga = if (leftFloat) "getFloat" else "getDouble"
    val gb = if (rightFloat) "getFloat" else "getDouble"
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val n = ctx.freshName("n")
    val okA = ctx.freshName("okA")
    val okB = ctx.freshName("okB")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |int $n = $a.numElements();
      |${VectorExpressions.genReadable(ctx, a, n, okA)}
      |${VectorExpressions.genReadable(ctx, b, n, okB)}
      |if (!$okA || !$okB) {
      |  ${ev.isNull} = true;
      |} else {
      |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
      |  for (int $d = 0; $d < $n; $d++) {
      |    double $x = (double) $a.$ga($d);
      |    double $y = (double) $b.$gb($d);
      |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
      |  }
      |  ${ev.value} = $dot / (java.lang.Math.max(java.lang.Math.sqrt($na), 1e-12) *
      |    java.lang.Math.max(java.lang.Math.sqrt($nb), 1e-12));
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
