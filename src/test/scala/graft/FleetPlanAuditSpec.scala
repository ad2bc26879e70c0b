package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** FLEET-WIDE plan-invariant sweep: [[PlanAuditSpec]] pins ~30
  * hand-picked plans in detail; this suite walks EVERY
  * `SparkEntry.queries` plan at sf0.001 once and asserts the global
  * invariants the repo enforces locally, so the next refactor's plan
  * drift fails at test time instead of at the next scale rung:
  *
  *  1. no `CartesianProductExec` anywhere — every deliberate cross
  *     join in the repo is a bounded BROADCAST nested-loop (1-row
  *     stats frames, small model dims), which plans as
  *     `BroadcastNestedLoopJoinExec`; a plain cartesian means a
  *     broadcast was lost;
  *  2. no unpartitioned `WindowExec` whose input is raw corpus grain —
  *     every sanctioned global window in the repo rides a
  *     HISTOGRAM/dim frame (an aggregate strictly between the scan
  *     and the window: the q255 df-histogram, the q256 milli-bits
  *     histogram, the q81 value dim...), so an empty partitionSpec
  *     with no aggregate beneath it would sort the corpus on one
  *     partition at scale;
  *  3. no `SortMergeJoinExec` whose one side reads ONLY the
  *     unambiguous sub-broadcast dims (region/nation/supplier — tiny
  *     at every SF by TPC-H construction): those must broadcast, a
  *     sort-merge there shuffles the corpus side for nothing.
  *
  * Plans are built with AQE off (concrete nodes for `collect`), never
  * executed — construction-eager queries (the funnel label-prop
  * rounds, the tokenizer trainers) run their bounded driver-side work
  * at sf0.001. Allowlists document today's sanctioned exceptions; an
  * addition to them needs a site comment in the query, not just a
  * name here. */
class FleetPlanAuditSpec extends SparkSpec {

  /** Sanctioned empty-partitionSpec windows with NO aggregate beneath
    * them in the PHYSICAL tree (invariant 2). Entries must justify
    * why the window's input is bounded anyway. */
  private val globalWindowAllow: Set[String] = Set.empty

  /** Sanctioned CartesianProductExec sites (invariant 1). */
  private val cartesianAllow: Set[String] = Set.empty

  /** Sanctioned dim-sided SortMergeJoin sites (invariant 3). */
  private val dimSmjAllow: Set[String] = Set.empty

  private val DimTables = Set("region.parquet", "nation.parquet", "supplier.parquet")

  private def hasAggBeneath(p: SparkPlan): Boolean =
    p.collectFirst {
      case a: HashAggregateExec => a
      case a: ObjectHashAggregateExec => a
      case a: SortAggregateExec => a
    }.isDefined

  private def scansOf(p: SparkPlan): Seq[String] =
    p.collect { case s: FileSourceScanExec =>
      s.relation.location.rootPaths.map(rp => rp.getName).mkString(",")
    }

  private def sweep(): Seq[String] = {
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan = q(spark, sfDir).queryExecution.executedPlan
      // 1. cartesian products
      if (!cartesianAllow.contains(name))
        plan.collect { case c: CartesianProductExec => c }.foreach { _ =>
          violations += s"$name: CartesianProductExec in plan"
        }
      // 2. unpartitioned windows over non-aggregated input
      if (!globalWindowAllow.contains(name))
        plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.foreach { w =>
          if (!hasAggBeneath(w.child))
            violations += s"$name: unpartitioned WindowExec with no aggregate beneath"
        }
      // 3. sort-merge joins against an unambiguous broadcast dim
      if (!dimSmjAllow.contains(name))
        plan.collect { case j: SortMergeJoinExec => j }.foreach { j =>
          Seq(j.left, j.right).foreach { side =>
            val scans = scansOf(side)
            if (scans.nonEmpty && scans.forall(s => DimTables.exists(s.contains)))
              violations += s"$name: SortMergeJoin against dim-only side (${scans.mkString("; ")})"
          }
        }
    }
    violations.toSeq
  }

  test("every query plan holds the fleet invariants (cartesian, global window, dim SMJ)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val violations = sweep()
      assert(violations.isEmpty, violations.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("the AT-SCALE plan shapes hold the same invariants (staging threshold forced to 0)") {
    // past StageMinInputBytes every dedup-family query switches to its
    // staged/dictionary-encoded shape and the dispatch probes fire —
    // the plans a 100 TB run actually executes; sweeping them at
    // sf0.001 catches drift in the scale path the gate-shape sweep
    // never builds
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set(graft.operators.Dedup.StageMinInputBytesConf, "0")
    try {
      val violations = sweep()
      assert(violations.isEmpty, violations.mkString("\n"))
    } finally {
      spark.conf.unset(graft.operators.Dedup.StageMinInputBytesConf)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
