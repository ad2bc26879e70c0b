package graft

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, LocalTableScanExec, RDDScanExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
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
  *     sort-merge there shuffles the corpus side for nothing;
  *  4. every `BroadcastNestedLoopJoinExec` broadcasts a BOUNDED side:
  *     an aggregate root (global ⇒ ≤1 row; grouped ⇒ a derived
  *     summary/model dim), a driver-materialized relation, or a
  *     dense-id-window filter (the broadcast query-set convention) —
  *     previously a per-round hand audit of the ~67 crossJoin sites,
  *     now mechanized (see [[boundedBnljBuild]]).
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

  /** Sanctioned unbounded-broadcast BNLJ sites (invariant 4). */
  private val bnljAllow: Set[String] = Set.empty

  private val DimTables = Set("region.parquet", "nation.parquet", "supplier.parquet")

  /** The dense-id columns of the corpus model (ids are assigned
    * 0..n-1 by the generators), so `id < K` / `id = K` / `id IN (...)`
    * against a LITERAL bounds the row count by the literal itself —
    * the convention every broadcast query-set frame in the repo uses
    * (`vec_id < QuerySetBound` etc.). */
  private val DenseIdCols = Set("vec_id", "doc_id", "q_vec_id")

  /** True iff the condition contains a literal id-window comparison
    * that bounds rows from above (attr </<= /= lit, or the mirrored
    * literal-first forms, or a literal IN list). */
  private def idWindow(cond: Expression): Boolean = cond.collectFirst {
    case LessThan(a: AttributeReference, _: Literal) if DenseIdCols(a.name) => ()
    case LessThanOrEqual(a: AttributeReference, _: Literal) if DenseIdCols(a.name) => ()
    case EqualTo(a: AttributeReference, _: Literal) if DenseIdCols(a.name) => ()
    case GreaterThan(_: Literal, a: AttributeReference) if DenseIdCols(a.name) => ()
    case GreaterThanOrEqual(_: Literal, a: AttributeReference) if DenseIdCols(a.name) => ()
    case In(a: AttributeReference, vs) if DenseIdCols(a.name) &&
      vs.forall(_.isInstanceOf[Literal]) => ()
  }.isDefined

  /** Invariant 4's boundedness predicate: a BNLJ broadcast side is
    * sanctioned iff (descending through unary wrappers — exchange,
    * codegen, project, sort — and resolving ReusedExchange to the
    * exchange it reuses) it roots in one of the repo's three bounded
    * shapes:
    *  - an AGGREGATE: a global one is ≤1 row; a grouped one is a
    *    derived summary/dim (histogram grains, per-source sketches,
    *    trained centroid models) whose cardinality is the group
    *    domain, not the corpus;
    *  - a driver-materialized relation (LocalTableScan literal frames,
    *    `Scan ExistingRDD` model frames from `createDataFrame` —
    *    bounded by what already fit on the driver);
    *  - a dense-id-WINDOW filter ([[idWindow]]) — the broadcast
    *    query-set convention, ≤ the literal bound rows at any corpus
    *    size.
    * Anything else (a raw scan, a filtered corpus scan without an id
    * window, a join) broadcasts data-scaled rows into an O(n·m)
    * nested loop — the shape that melts at 100 TB even when a 60k-row
    * gate run shrugs it off. */
  private def boundedBnljBuild(p: SparkPlan): Boolean = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec => true
    case _: LocalTableScanExec | _: RDDScanExec => true
    case f: FilterExec if idWindow(f.condition) => true
    case r: ReusedExchangeExec => boundedBnljBuild(r.child)
    // a cross of two bounded frames is bounded (the stats-frame ×
    // param-grid composites: q188/q189's purity/triangle harnesses)
    case b: BroadcastNestedLoopJoinExec =>
      boundedBnljBuild(b.left) && boundedBnljBuild(b.right)
    case u: UnaryExecNode => boundedBnljBuild(u.child)
    case _ => false
  }

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
      // 4. broadcast nested-loop joins must broadcast a BOUNDED side
      if (!bnljAllow.contains(name))
        plan.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
          val build = j.buildSide match {
            case BuildLeft => j.left
            case BuildRight => j.right
          }
          if (!boundedBnljBuild(build))
            violations += s"$name: BNLJ broadcasts an unbounded side " +
              s"(${build.collect { case n => n.nodeName }.mkString(" > ")})"
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
