package graft.udx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** First-match-only banding kernel (SURVEY §2 L2/L4b family; reference
  * README.md:299-381 motivates the annotation-era dedup surface).
  *
  * `first_match_band(xs, ys, stride)` returns the LOWEST band index b such
  * that the stride-sized slices xs[b*stride, (b+1)*stride) and
  * ys[b*stride, (b+1)*stride) are element-wise equal, or -1 when no band
  * matches. Both inputs are ARRAY<BIGINT>; bands beyond the shorter array
  * are ignored.
  *
  * Why an expression and not a HOF: this predicate runs once per band-join
  * CANDIDATE row — the hottest row count in every banded dedup kernel. The
  * round-15 `NOT exists(zip_with(slice(...), slice(...), ...))` form
  * allocates two sliced arrays plus a zipped boolean array per candidate;
  * at the sf10-distinct regime that allocation showed up as a 37% per-pair
  * cost rise (BENCH_sf10.json, s_per_pair 36.9 → 50.4 µs). This expression
  * is a fused long-compare loop inside WholeStageCodegen: zero allocation,
  * early exit at the first matching band, and the common candidate case
  * (the join's own band matches first) exits after `band` iterations.
  *
  * Semantics contract (asserted by BandingSpec): for rows joined on band
  * equality `x.band = y.band` plus slice equality, keeping only candidates
  * with `first_match_band(x.keys, y.keys, stride) = x.band` yields exactly
  * one surviving row per (x, y) pair that shares ≥1 band — the classic
  * stateless replacement for a global candidate `.distinct()`, which had
  * to HOLD the full candidate-pair set in a hash aggregate (the round-14
  * gate-config OOM class).
  */
case class FirstMatchBand(left: Expression, right: Expression, stride: Int)
    extends BinaryExpression {
  require(stride >= 1, s"stride must be >= 1, got $stride")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val xs = l.asInstanceOf[ArrayData]
    val ys = r.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements()) / stride
    var b = 0
    while (b < n) {
      var eq = true
      var k = b * stride
      val end = k + stride
      while (eq && k < end) {
        if (xs.getLong(k) != ys.getLong(k)) eq = false
        k += 1
      }
      if (eq) return b
      b += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("nBands")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val end = ctx.freshName("end")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements()) / $stride;
         |${ev.value} = -1;
         |for (int $b = 0; $b < $n; $b++) {
         |  boolean $eq = true;
         |  int $end = ($b + 1) * $stride;
         |  for (int $k = $b * $stride; $eq && $k < $end; $k++) {
         |    if ($x.getLong($k) != $y.getLong($k)) $eq = false;
         |  }
         |  if ($eq) { ${ev.value} = $b; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BandExpr {
  // Sessions already holding the registration — the builder closes over no
  // runtime data (unlike TextExpr's model-carrying expressions), so one
  // registration per session is complete and re-registering only spams a
  // SimpleFunctionRegistry replace-WARN into every bench/verify tail
  // (round-16 verdict task #5). Weak keys: a stopped session's entry must
  // not pin the SessionState graph.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Session-scoped SQL registration: first_match_band(xs, ys, stride).
    * stride must be an integer literal (it shapes the generated code).
    * Idempotent per session.
    */
  def register(s: SparkSession): Unit = {
    if (registered.putIfAbsent(s, java.lang.Boolean.TRUE) == null)
      registerAlways(s)
  }

  private def registerAlways(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "first_match_band",
      exprs => {
        val stride = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"first_match_band stride must be an int literal, got $other")
        }
        FirstMatchBand(exprs(0), exprs(1), stride)
      },
      "internal")
}
