package graft.opt

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}

/** SURVEY §4 — the one genuinely novel optimizer piece: rewrite string-date
  * predicates to use the spec's typed range-annotation columns
  * (reference README.md:301-330 — the annotations exist precisely so
  * engines can answer typed predicates without parsing strings).
  *
  *   cast(x AS timestamp) ⋈ literal   ⇒   __x_start ⋈ literal
  *
  * whenever a sibling `__x_start` TimestampType attribute is available in
  * the child plan. The rewritten predicate reads a typed column with parquet
  * min/max stats (pushable to the scan) instead of per-row string parsing.
  *
  * Soundness: for instant-valued (full-precision) data, cast(x) == __x_start
  * whenever the cast parses, so any comparison is equivalent — including
  * sub-millisecond fractional seconds, because bounds() keeps the start
  * instant at full µs precision rather than flooring to ms (a floored start
  * would flip e.g. cast(x) >= lit for a literal between the floor and the
  * true instant). Partial-precision values don't parse under cast (null ⇒
  * predicate false), so the rewrite widens only there — matching the spec's
  * intent that the range annotation, not the raw string, carries partial
  * values' query semantics.
  */
object AnnotationRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val available: Map[String, Attribute] =
        child.output.filter(a => a.name.startsWith("__") && a.dataType == TimestampType)
          .map(a => a.name -> a).toMap
      if (available.isEmpty) f
      else {
        def startFor(e: Expression): Option[Attribute] = e match {
          case Cast(a: AttributeReference, TimestampType, _, _) if a.dataType == StringType =>
            available.get(s"__${a.name}_start")
          case _ => None
        }
        val newCond = cond.transformUp {
          case cmp @ GreaterThanOrEqual(l, r) => startFor(l).map(GreaterThanOrEqual(_, r)).getOrElse(cmp)
          case cmp @ GreaterThan(l, r) => startFor(l).map(GreaterThan(_, r)).getOrElse(cmp)
          case cmp @ LessThanOrEqual(l, r) => startFor(l).map(LessThanOrEqual(_, r)).getOrElse(cmp)
          case cmp @ LessThan(l, r) => startFor(l).map(LessThan(_, r)).getOrElse(cmp)
        }
        if (newCond fastEquals cond) f else Filter(newCond, child)
      }
  }

  /** Install into a session via the sanctioned experimental hook. */
  def install(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(AnnotationRewrite)) {
      s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ AnnotationRewrite
    }
}
