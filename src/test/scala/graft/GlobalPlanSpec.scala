package graft

/** Whole-surface plan invariant: NO query may plan a non-broadcast
  * cartesian product — the one join shape that is never acceptable at
  * corpus scale. Every `SparkEntry.queries` entry is built (at the
  * sf0.001 smoke scale — eager operators materialize their tiny
  * inputs) and its optimized plan scanned. `BroadcastNestedLoopJoin`
  * is allowed: the engine uses it deliberately for one-row scalar
  * attachments and bounded probe×model crosses (q80's ADC LUTs), where
  * the broadcast side is bounded by contract; `CartesianProduct` (the
  * shuffle-based unbounded cross) is not.
  */
class GlobalPlanSpec extends SparkSpec {

  /** CartesianProduct is a PHYSICAL node — the logical plan prints cross
    * joins as "Join Cross", so a logical-plan scan can never fire (round-9
    * advice). `sparkPlan` (pre-AQE) is scanned: AQE's executedPlan wraps
    * stages lazily and would hide the join until execution. */
  private def plansCartesian(name: String, dir: String): Boolean =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.sparkPlan.toString.contains("CartesianProduct")

  test("no query plans a shuffle cartesian product (sf0.001, all queries)") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filter(plansCartesian(_, dir))
    assert(offenders.isEmpty, s"cartesian products planned by: $offenders")
  }

  test("the cartesian detector actually fires (negative self-test)") {
    // a large-large non-equi join that Spark MUST plan as CartesianProduct:
    // both sides over the 10 MB broadcast threshold (range stats are
    // 8 bytes/row, so 5M rows ≈ 40 MB), no equi keys. Plan-only — never
    // executed.
    val big = spark.range(0, 5000000).toDF("a")
    val big2 = spark.range(0, 5000000).toDF("b")
    val cross = big.join(big2, big("a") * 2 < big2("b"))
    assert(cross.queryExecution.sparkPlan.toString.contains("CartesianProduct"),
      "detector failed to flag a deliberate shuffle cartesian product")
  }

  test("q108's confirm runs the Myers kernel, not the builtin banded DP") {
    // the kernel swap that took q108 from the suite's most expensive
    // query (4.5 s) to 1.0 s — a future edit reverting to the builtin
    // (or planning the kernel per join side) fails here
    val plan = SparkEntry.queries("q108_edit_pairs")(
      spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan.toString
    // two instances is the optimized shape: the `>= 0` confirm filter is
    // pushed into the JOIN CONDITION (per candidate pair — the hot site),
    // and the survivor projection re-evaluates for the few confirmed
    // pairs. More than two means a planning regression re-ran the kernel
    // per census/guard leg
    val n = "graft_levenshtein".r.findAllMatchIn(plan).length
    assert(n >= 1 && n <= 2, s"$n kernel instances:\n$plan")
    assert("(?<!graft_)levenshtein\\(".r.findAllMatchIn(plan).isEmpty,
      s"builtin levenshtein re-appeared:\n$plan")
  }

  test("q167's final plan keeps ALL corpus work behind the retrieval checkpoints") {
    // the multi-consumer discipline that makes q167 affordable: lex, cov
    // and fused are each read twice, so the rendered plan must contain
    // ZERO file scans — every consumer reads a checkpoint (ExistingRDD).
    // A future edit that drops a checkpoint re-plans a full retrieval
    // pass per consumer (2x BM25 + 2x coverage) and fails here.
    val plan = SparkEntry.queries("q167_rank_agreement")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan") && !plan.contains("Scan parquet"),
      s"q167 re-planned a corpus scan past its checkpoints:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected checkpoint scans in q167's plan:\n$plan")
  }

  test("oracle contract: every query oracled (one documented sketch exception), every oracle ordered") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // the HLL estimator cannot match another engine — the ONE allowed gap
    assert((q -- o) === Set("q33_approx_distinct"), s"un-oracled: ${q -- o}")
    assert((o -- q) === Set.empty, s"orphan oracles: ${o -- q}")
    // the driver hash-compares row streams: every oracle must pin a total
    // order (the Spark side's orderBy is part of each query's contract)
    val unordered = SparkEntry.oracleSql.collect {
      case (name, sql) if !sql.toUpperCase.contains("ORDER BY") => name
    }.toSet
    // single-row scalar outputs: order is vacuous (1 row by construction)
    val singleRow = Set("q06_filter_agg", "q101_lsh_recall")
    assert((unordered -- singleRow).isEmpty,
      s"oracles without ORDER BY: ${unordered -- singleRow}")
  }

  // ---- round-20 optimization guards ----------------------------------

  test("q44/q92 expand SUBTOTALS, not fact rows (pre-aggregate-below-Expand)") {
    // Expand multiplies its input by the number of grouping sets BEFORE
    // the partial aggregate — the round-20 rewrite pre-aggregates by the
    // full key so Expand runs over <=|flag x status| rows (q44 -49%,
    // q92 -57% on clean A/B). A refactor that drops the base aggregate
    // re-expands the fact table and fails here.
    for (q <- Seq("q44_cube", "q92_grouping_sets")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan
      val expands = plan.collect {
        case e if e.getClass.getSimpleName == "ExpandExec" => e }
      assert(expands.nonEmpty, s"$q: Expand vanished — the shape changed")
      assert(expands.forall(_.collectFirst {
        case a if a.getClass.getSimpleName.contains("HashAggregate") => a
      }.nonEmpty), s"$q: Expand runs over fact rows (no aggregate below it)")
    }
  }

  test("q18 caches the COUNT table, not fact rows (aggregate-before-semi-join)") {
    // the round-20 rewrite aggregates the synthesized triples to
    // (lang, p, cnt) before the ranking/semi-join/rollup — the only
    // cached relation must therefore hold an aggregate. The old shape
    // cached the raw 600k-row fact projection (and streamed it through
    // the semi join and a second aggregate); caching fact rows again
    // fails here.
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val plan = SparkEntry.queries("q18_topk_pipeline")(
      spark, "/root/testdata/sf0.001").queryExecution.sparkPlan
    val cacheScans = plan.collect { case s: InMemoryTableScanExec => s }
    assert(cacheScans.nonEmpty, "q18's cnt cache vanished")
    // the cached plan is an AdaptiveSparkPlan wrapper (children = Nil, so
    // a tree collect sees nothing) — match the rendered tree instead
    assert(cacheScans.forall(
      _.relation.cachedPlan.toString.contains("HashAggregate")),
      "q18 caches un-aggregated fact rows again")
  }
}
