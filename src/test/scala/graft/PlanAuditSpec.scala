package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{ApiQueries, Relational, TrainPrep}

/** Physical-plan assertions for the round-2 scale-relevant queries — the
  * shapes SCALE.md promises must actually appear in the executed plan, not
  * just in comments. (Earlier rounds assert pushdown/codegen/no-exchange in
  * StreamMaintenanceSpec / CosineExprSpec / ConfigScaleSpec; this covers
  * the keyset-pagination and broadcast-marker additions.)
  */
class PlanAuditSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect() // finalize the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("o2b keyset pagination: predicate pushed to the scan, top-k not a global sort") {
    val plan = finalPlan(Relational.o2b_keyset_pagination.run(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
    assert(
      plan.contains("PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,1000)]") ||
        plan.contains("GreaterThan(o_orderkey,1000)"),
      s"keyset predicate not pushed to parquet:\n$plan")
    assert(!plan.contains("Window"), s"keyset path must not use a window:\n$plan")
  }

  test("j6 marker join broadcasts the registry-sized marker side") {
    val plan = finalPlan(ApiQueries.j6_marker_join.run(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"marker side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("f7 store filter pushes the project_id equality into the parquet scan") {
    val plan = finalPlan(ApiQueries.f7_automation_filters.run(spark, sf0001))
    assert(
      plan.contains("EqualTo(p_brand,Brand#13)"),
      s"project filter not pushed through the typed facade:\n$plan")
  }

  test("x19 curation plan: decontamination probe broadcast, no shuffle join anywhere") {
    // The flagship's promised shape (TrainPrep x19 comments): the eval
    // 8-gram set reaches the corpus side as a broadcast build, the dedup
    // semi-join is AQE-broadcast at this scale, and no stage degrades to a
    // SortMergeJoin. Locks the curation plan against regression.
    val plan = finalPlan(TrainPrep.x19_curation_pipeline.run(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"curation chain must not shuffle-join at this scale:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross products in the pipeline:\n$plan")
  }

  test("x26 near-dup plan: every join keyed (no cartesian/nested-loop), packing window partitioned") {
    // The flagship composition's promised shape (TrainPrep neardupReport
    // comments): LSH pair generation and every downstream join are KEYED
    // equi-joins — a cartesian or nested-loop anywhere means the n^2 trap
    // the banding exists to avoid. The label and canonical joins run over
    // checkpointed frames with no size stats and both sides grow with the
    // corpus, so a doc_id-keyed SortMergeJoin is the correct 100 TB shape
    // there (unlike x19, whose eval side is genuinely broadcast-small).
    // The only Window is packBins' — partitioned on the (lang, split)
    // stratum key, never global.
    val plan = finalPlan(TrainPrep.x26_fast_neardup.run(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), s"no cross products in the pipeline:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"every join must be keyed:\n$plan")
    assert(plan.contains("windowspecdefinition(lang"),
      s"packing window must partition on the stratum key:\n$plan")
  }

  test("x27 incremental probe plan: index side probed via left-semi, no window, no cartesian") {
    // The probe's promised shape (Dedup.incrementalNeardupFlags comments):
    // a keyed left-semi join against the band index — its output bounded
    // by batch band rows — then one left join to attach flags. Nothing in
    // the probe may window, nested-loop, or cross-product.
    val plan = finalPlan(operators.Dedup.x27_fast_incremental.run(spark, sf0001))
    assert(plan.contains("LeftSemi"), s"index probe must be a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross products:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"every join must be keyed:\n$plan")
    assert(!plan.contains("Window"), s"the probe must not use a window:\n$plan")
  }

  test("x23 canonical plan: selection is one hash aggregate, no per-cluster sort") {
    // canonicalPerCluster promises max_by (one keyed aggregation), not a
    // rank-window: the executed plan must aggregate on the component key
    // and never materialize a per-cluster Sort+Window.
    val plan = finalPlan(TrainPrep.x23_cluster_canonical.run(spark, sf0001))
    assert(plan.contains("max_by") || plan.contains("HashAggregate"),
      s"canonical selection must be an aggregate:\n$plan")
    assert(!plan.contains("Window"), s"selection must not use a rank window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross products:\n$plan")
  }

  test("x29 ingest plan: semi-join probe + map-side curation — no window, no cartesian, no nested loop") {
    // The ingest write path's promised shape (TrainPrep.ingestAdmit
    // comments): the dup decision is the x27 left-semi probe, and
    // everything after it — verdict gate, split hash, token count,
    // redaction hash — is pure map-side expression work. Nothing in the
    // chain may window, nested-loop, or cross-product; the only exchanges
    // are the banding aggregations and the presentation sort.
    val plan = finalPlan(TrainPrep.x29_fast_ingest.run(spark, sf0001))
    assert(plan.contains("LeftSemi"), s"dup decision must be a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross products:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"every join must be keyed:\n$plan")
    assert(!plan.contains("Window"), s"the admit chain must not use a window:\n$plan")
  }

  test("x30 mixture plan: rates frame broadcast onto the corpus, no shuffle join, no window") {
    // The admit pass's promised shape (Curation.admitByMixture comments):
    // the #strata-row rates frame reaches the corpus as a broadcast build;
    // the corpus itself never shuffles for the join (its only exchanges
    // are the two small reporting aggregations). A SortMergeJoin here
    // would mean the corpus is being shuffled to meet a 5-row table.
    val plan = finalPlan(TrainPrep.x30_mixture_budget.run(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"rates frame must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle-join the rates:\n$plan")
    assert(!plan.contains("Window"), s"the mixture op must not use a window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross products:\n$plan")
  }

  test("q19 disjunctive join: ONE equi-join, disjunct-common bounds pushed to both scans") {
    // The q19 comments' promise: the OR-of-conjuncts stays a residual on a
    // single equi-join (never a union of three joins), and Catalyst
    // extracts the disjunct-common quantity/size/brand bounds as pushable
    // scan filters on EACH side.
    // sf0.01, not sf0.001: at the tiniest sf the disjuncts match zero
    // rows and AQE correctly replaces the whole join with EmptyRelation —
    // a legitimate plan, but not the shape under audit. Formatted mode:
    // plain toString TRUNCATES the pushed OR-tree mid-list.
    val df = Relational.q19_disjunctive.run(spark, "/root/testdata/sf0.01")
    df.collect()
    val full = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // AdaptiveSparkPlan prints Final AND Initial sections — count joins
    // only in the final one
    val plan = full.split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 1,
      s"expected exactly one join:\n$plan")
    assert(full.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      full.contains("LessThanOrEqual(l_quantity,30.0)"),
      s"quantity OR-bounds not pushed to the lineitem scan:\n$full")
    assert(full.contains("EqualTo(p_brand,Brand#12)"),
      s"brand disjuncts not pushed to the part scan:\n$full")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"))
  }

  test("q13 order distribution: aggregate sits BELOW the outer join") {
    // The q13 comments' promise: orders collapse to (custkey, n) before
    // the LEFT join, so the join probes one row per customer. In the plan
    // that reads as a HashAggregate on the BUILD side of the outer
    // BroadcastHashJoin — i.e. an aggregate between the orders scan and
    // the join, not only above it.
    val plan = finalPlan(Relational.q13_order_dist.run(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"outer join must broadcast the collapsed side:\n$plan")
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val buildSide = plan.substring(joinIdx)
    assert(buildSide.contains("HashAggregate"),
      s"no aggregate below the outer join (orders streamed raw):\n$plan")
    assert(plan.contains("Not(EqualTo(o_orderpriority,1-URGENT))"),
      s"priority filter not pushed to the orders scan:\n$plan")
  }

  test("q2 decorrelated min-subquery: window min over l_partkey, no second aggregate joined back") {
    // r11 rendering (VERDICT r10 task 2): the per-part minimum is a window
    // min over l_partkey on the cost aggregate itself — no part-sized min
    // table, no broadcast of a corpus-growing frame, one fewer join. The
    // window's sort must be LOCAL (per-partition, `false` flag): the rows
    // arrive hash-partitioned by l_partkey, so no range exchange appears.
    val plan = finalPlan(Relational.q2_min_cost_supplier.run(spark, sf0001))
    assert(plan.contains("Window"), s"q2 must derive the per-part min as a window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q2 must stay equi-joined:\n$plan")
    assert("Sort \\[l_partkey#\\d+L ASC NULLS FIRST\\], false".r.findFirstIn(plan).isDefined,
      s"the window's l_partkey sort must be local (no global range exchange):\n$plan")
  }

  test("q11 scalar-subquery HAVING: one-row threshold broadcast, per-part aggregate runs once") {
    val plan = finalPlan(Relational.q11_important_value.run(spark, sf0001))
    // the one-row total side may appear as a broadcast nested-loop (the
    // degenerate cross join Spark uses for a 1-row build) — that is the
    // correct shape; what must NOT appear is a shuffled join for it
    assert(plan.contains("Broadcast"), s"threshold row must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the 1-row threshold must never sort-merge against the aggregate:\n$plan")
  }

  test("x69 PQ encode+ADC scan: zero joins, top-k window group-limited map-side") {
    val plan = finalPlan(graft.operators.Similarity.x69_pq_topk.run(spark, sf0001))
    assert(!plan.contains("Join"), s"PQ scan must have no join at all:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k must be pruned map-side via WindowGroupLimit:\n$plan")
  }

  test("x70 semdedup: pair join keyed on the cluster id, dup set anti-joined as a broadcast") {
    val plan = finalPlan(graft.operators.Similarity.x70_semdedup.run(spark, sf0001))
    assert(!plan.contains("CartesianProduct"),
      s"within-cluster pairing must never be all-pairs:\n$plan")
    assert(plan.contains("LeftAnti"), s"survivors must come from an anti-join:\n$plan")
  }

  test("x79 fuzzy decontam: shingle equi-join with the eval side broadcast, never all-pairs") {
    val plan = finalPlan(graft.operators.TrainPrep.x79_fuzzy_decontam.run(spark, sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"cross-set candidates must come from the shingle equi-join:\n$plan")
    // at test scale AQE broadcasts the (small) eval shingle side; the
    // corpus-side exploded shingles must NOT be the build side of anything
    assert(plan.contains("BroadcastHashJoin"),
      s"the eval shingle table should broadcast at this scale:\n$plan")
  }

  test("x87 LM scoring: model probe is a map literal (no join for it), no cartesian, scoring is one doc aggregate") {
    val plan = finalPlan(TrainPrep.x87_lm_quality.run(spark, sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"LM scoring must stay keyed:\n$plan")
    // the pruned model ships as a literal map inside the aggregate — the
    // only joins are the vocab-sized context probe and the lang re-join
    assert(plan.contains("keys: ["), s"expected map-literal probe in plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the scoring chain should shuffle-join at this scale:\n$plan")
  }

  test("x88 DSIR: zero joins in the scoring chain, selection is TakeOrdered (not a global sort)") {
    val plan = finalPlan(TrainPrep.x88_dsir_select.run(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection must be top-k, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop") &&
      !plan.contains("SortMergeJoin"),
      s"both distributions are literal maps — no join should appear before selection:\n$plan")
  }

  test("x89 audio fingerprint: candidates from the band equi-join, never all-pairs") {
    val plan = finalPlan(graft.operators.Multimodal.x89_audio_fingerprint.run(spark, sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"candidate generation must be the (band,value) equi-join:\n$plan")
  }

  test("x97 learned mixture: the corpus reduction is one join-free aggregate chain") {
    // The flat-decade claim (SCALE.md): everything corpus-sized is the
    // single (lang)-keyed aggregate feeding the driver loop; no join, no
    // window, no sort touches the corpus.
    val plan = finalPlan(TrainPrep.x97_doremi_weights.run(spark, sf0001))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
      !plan.contains("CartesianProduct"),
      s"the stats pass must be join-free:\n$plan")
    assert(!plan.contains("Window"), s"no window in the stats pass:\n$plan")
  }

  test("x97b admission: rates broadcast onto the corpus, corpus itself never shuffle-joined") {
    // admitByMixture's promised shape: the G-row rates frame reaches the
    // corpus as a broadcast build; a SortMergeJoin here would shuffle the
    // whole corpus to join against 5 rows.
    val plan = finalPlan(TrainPrep.x97b_mixture_from_learned.run(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle against the G-row rates:\n$plan")
  }

  test("x98 silhouette: centroids broadcast, no pairwise join, one k-key aggregate") {
    // The O(N·k) claim: the only join-like operator is the broadcast
    // nested-loop cross of corpus × 8 centroids (k-sized build side by
    // construction); the pairwise O(N²) shape this replaces would appear
    // as a corpus-sized join or exchange-heavy plan.
    val plan = finalPlan(operators.Similarity.x98_silhouette.run(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"centroids must reach the corpus as a broadcast build:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"no corpus-sized join may appear:\n$plan")
  }
}
