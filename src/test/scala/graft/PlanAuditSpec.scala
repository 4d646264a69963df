package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface plan audit: no operator may *accidentally* plan a
  * Cartesian product or a nested-loop join — the two shapes that stop
  * scaling first. Keys where the shape is the documented intent (explicit
  * cross join; non-equi band/interval predicates) are allowlisted.
  *
  * Streaming keys are excluded: their QueryDef.run executes the stream and
  * returns a collected result table, so the interesting plan is the
  * streaming one (covered by StreamSpec behavior tests), not the result's.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  // documented exceptions (SURVEY §2.D): D7 is Cartesian by definition;
  // D8/D10 are non-equi predicates Spark can only express as BNLJ at this
  // dimension scale (the operators broadcast the small side on purpose)
  private val cartesianOk = Set("join_cross")
  private val bnljOk = Set("join_cross", "join_theta_range", "join_interval_overlap", "join_asof",
    // brute-force similarity baselines: the broadcast side is the FIXED
    // 5-row query set, so candidate×query NLJ is the intended plan — every
    // candidate partition streams once past an O(1) broadcast table
    "sim_cosine_topk", "knn_label_vote", "sim_topk_int8")

  test("no accidental CartesianProduct or BroadcastNestedLoopJoin anywhere") {
    val skip = (k: String) => k.startsWith("stream_") ||
      k == "opt_annotation_rewrite" || k == "opt_numeric_rewrite" || // install a session rule (+ temp table)
      k == "sink_partitioned_write" || k == "sink_parquet_roundtrip" ||
      k == "join_bucketed_colocated" // saveAsTable side effects; plan asserted in PlanSpec
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).flatMap { k =>
      val plan =
        try SparkEntry.queries(k)(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$k failed to plan: ${e.getMessage}") }
      val bad =
        (if (plan.contains("CartesianProduct") && !cartesianOk(k)) Seq(s"$k: CartesianProduct") else Nil) ++
          (if (plan.contains("BroadcastNestedLoopJoin") && !bnljOk(k)) Seq(s"$k: BroadcastNestedLoopJoin") else Nil)
      bad
    }
    assert(offenders.isEmpty, s"\nunplanned scale hazards:\n${offenders.mkString("\n")}")
  }
}
