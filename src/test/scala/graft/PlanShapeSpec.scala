package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression tests: lock in the scale-critical physical
  * plan properties so a future change that silently regresses one
  * (lost pushdown, un-broadcast dim, a surprise cartesian product,
  * the VecDot rewrite not firing) fails the build instead of only
  * showing up at 100 TB. Complements ScaleSpec's bucketed-join
  * no-Exchange assertion.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf())
      .queryExecution.explainString(FormattedMode)

  /** Build the plan with size-based auto-broadcast OFF — the sf0.001
    * test tables all fit under the broadcast threshold, which would
    * make every join a broadcast join and hide the plan shape the
    * same query takes on 100 TB fact tables. Explicit broadcast()
    * hints are unaffected (that is exactly their at-scale contract). */
  private def planAtScaleStats(name: String): String = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try plan(name) finally spark.conf.set(key, prev)
  }

  test("q02: predicates reach the parquet scan as PushedFilters") {
    val p = plan("q02_scan_filter")
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(p)
      .map(_.group(1).trim).toList
    assert(pushed.nonEmpty, s"no PushedFilters section in:\n$p")
    assert(pushed.exists(_.nonEmpty),
      s"PushedFilters empty in every scan:\n$p")
  }

  test("q02: scan reads only the projected columns (pruned ReadSchema)") {
    val p = plan("q02_scan_filter")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p)
    assert(read.isDefined, s"no ReadSchema in:\n$p")
    val cols = read.get.group(1).split(",").length
    // lineitem has 16 columns; the query touches a handful
    assert(cols <= 8, s"scan reads $cols columns — pruning regressed:\n$p")
  }

  test("q12: all three dims join as explicit BroadcastHashJoin even with at-scale stats") {
    val p = planAtScaleStats("q12_join_broadcast_star")
    // count tree-form occurrences ("BroadcastHashJoin Inner"), not
    // the duplicate detail-section headers
    val n = "BroadcastHashJoin Inner".r.findAllIn(p).length
    assert(n == 3, s"expected 3 broadcast joins, got $n:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("q13: fact-to-fact join is sort-merge under at-scale stats") {
    val p = planAtScaleStats("q13_join_sortmerge_facts")
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    // the two-phase distinct rewrite must keep the Expand operator
    // (which triples shuffled rows under countDistinct) out, and the
    // per-order phase must reuse the join's orderkey partitioning:
    // exchanges = 2 join inputs + 1 final (priority, flag) + 1 sort
    assert(!p.contains("Expand"), s"Expand re-appeared:\n$p")
    val n = "\\+- Exchange|:- Exchange".r.findAllIn(p).length
    assert(n <= 4, s"expected <=4 shuffles, got $n:\n$p")
  }

  test("q01: aggregation is partial+final (map-side combine present)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert("partial_".r.findFirstIn(p).isDefined,
      s"no partial aggregation — all rows shuffle to the reducers:\n$p")
  }

  test("vec_dot kernel present post-rule in the similarity queries") {
    Seq("q31_cosine_topk", "q46_sql_vec_dot").foreach { q =>
      val p = plan(q)
      assert(p.toLowerCase.contains("vec_dot"),
        s"$q: VectorizeDotProduct rule did not fire:\n$p")
    }
  }

  test("q09: global top-k is TakeOrderedAndProject, not a full sort") {
    val p = plan("q09_global_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q84: repetition ratio stays map-side (no agg, no join, only the sort exchange)") {
    val p = plan("q84_repetition_ratio")
    assert(!p.contains("Join"), s"map-side query grew a join:\n$p")
    assert(!p.contains("HashAggregate"), s"map-side query grew an agg:\n$p")
    val n = "Exchange".r.findAllIn(p).length
    assert(n <= 2, s"expected only the final sort exchange, got $n:\n$p")
  }

  test("q87: packing is one window shuffle per stream, no join") {
    val p = plan("q87_pack_bins")
    assert(!p.contains("Join"), s"packing grew a join:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q81/q82: shingle df/leak passes are single-scan windows, no membership join") {
    Seq("q81_boilerplate_ngrams", "q82_contamination").foreach { q =>
      val p = planAtScaleStats(q)
      assert(!p.contains("Join"),
        s"$q: single-scan window shape grew a join (double explode):\n$p")
      assert(p.contains("Window"), s"$q:\n$p")
    }
  }

  test("q88: exact-moment stats are one partial+final aggregate, no Expand") {
    val p = plan("q88_corr_regression")
    assert("partial_".r.findFirstIn(p).isDefined,
      s"no map-side combine:\n$p")
    assert(!p.contains("Expand"),
      s"moments should be plain aggregates, not countDistinct Expand:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q90: co-purchase pairs expand map-side from per-order sets — no join at all") {
    val p = planAtScaleStats("q90_copurchase_pairs")
    assert(!p.contains("Join"),
      s"set expansion regressed to a self-join:\n$p")
    assert("partial_collect_set".r.findFirstIn(p).isDefined,
      s"per-order item sets lost map-side combine:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 should not be a full global sort:\n$p")
  }

  test("q94: every PageRank round joins edges against BROADCAST ranks") {
    val p = planAtScaleStats("q94_pagerank")
    // 3 rounds + the (broadcast) degree attach on the edge frame; the
    // fact-sized edge side must never re-shuffle for a rank join.
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 3, s"expected >=3 broadcast rank joins, got $n:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"a PageRank round re-shuffles the edge frame:\n$p")
  }

  test("q85/q86: corpus-total scalars ride a broadcast, never a cartesian") {
    Seq("q85_zipf_stats", "q86_source_mix").foreach { q =>
      val p = planAtScaleStats(q)
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"$q: scalar crossJoin lost its broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("q92/q93/q95: centroid/corpus-stat frames ride a broadcast; no shuffled join") {
    Seq("q92_kmeans_assign", "q93_kmeans_update", "q95_bm25_topk")
      .foreach { q =>
        val p = planAtScaleStats(q)
        assert(p.contains("BroadcastNestedLoopJoin"),
          s"$q: small-side crossJoin lost its broadcast:\n$p")
        assert(!p.contains("SortMergeJoin"),
          s"$q: grew a shuffled join — the vector/doc side must stay in place:\n$p")
      }
  }

  test("q95: top-15 is TakeOrderedAndProject with a partial aggregate upstream") {
    val p = planAtScaleStats("q95_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k became a full sort:\n$p")
    assert("partial_".r.findFirstIn(p).isDefined,
      s"corpus stats lost map-side combine:\n$p")
  }

  test("runtime bloom-filter pruning engages on a selective fact-fact join") {
    // Spark injects a bloom filter built from the selective join side
    // and applies might_contain() on the fact scan BEFORE the shuffle
    // — at 100 TB this prunes most of the shuffle input. It is gated
    // on a 10 GB application-side scan by default (the filter only
    // pays on big scans), so the size thresholds are scoped down to
    // demonstrate the mechanism on test-sized tables.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val orders = Tables.orders(spark, sf())
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = Tables.lineitem(spark, sf())
      val p = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg"),
        s"no bloom filter built from the selective side:\n$p")
      assert(p.contains("might_contain"),
        s"fact scan not pre-filtered with might_contain:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q105: interval merge runs entirely on the key partitioning") {
    val p = planAtScaleStats("q105_interval_merge")
    assert(!p.contains("Join"), s"interval merge grew a join:\n$p")
    assert(!p.contains("SinglePartition"),
      s"a window lost its user_id partitioning — global sort at scale:\n$p")
  }

  test("q106: z-order key is map-side; audit is one partial+final agg") {
    val p = plan("q106_zorder_layout")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert("partial_".r.findFirstIn(p).isDefined,
      s"bucket audit lost map-side combine:\n$p")
  }

  test("q108: only the survivor pass is single-partition; band phase is parallel") {
    val p = planAtScaleStats("q108_skyline")
    // two window phases: banded local (hash-partitioned) + global
    val wins = "\\+- Window".r.findAllIn(p).length
    assert(wins == 2, s"expected 2 window phases, got $wins:\n$p")
    val single = "Exchange SinglePartition".r.findAllIn(p).length
    assert(single <= 1,
      s"more than the survivor pass went single-partition:\n$p")
  }

  test("q110: LATERAL decorrelates to WindowGroupLimit, no per-row rescan") {
    val p = planAtScaleStats("q110_lateral_topk")
    assert(p.contains("WindowGroupLimit"),
      s"lateral top-k lost the group-limit rewrite:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"lateral join fell back to a cartesian rescan:\n$p")
  }

  test("q126: runtime bloom filter injected on the fact scan side") {
    val p = plan("q126_runtime_filter")
    assert(p.contains("might_contain"),
      s"InjectRuntimeFilter did not plant the bloom probe:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"join must stay shuffled (broadcast would bypass the filter):\n$p")
  }

  test("q125: band keys the local dominance join; one BNL over survivors only") {
    val p = planAtScaleStats("q125_skyline3d")
    // tree-form occurrences only (details section repeats the name)
    val bnl = "BroadcastNestedLoopJoin LeftAnti".r.findAllIn(p).length
    assert(bnl == 1,
      s"expected exactly 1 nested-loop join (the global survivor " +
        s"pass), got $bnl:\n$p")
    assert(!p.contains("CartesianProduct"), s"q125:\n$p")
    // the survivor set is checkpointed: the global pass must read the
    // materialized frontier, not re-run the banded phase twice
    assert(!p.contains("SortMergeJoin"),
      s"global pass re-plans phase 1 — survivor checkpoint lost:\n$p")
  }

  test("q129: MIN/MAX/COUNT answered by the scan (PushedAggregation)") {
    val p = plan("q129_agg_pushdown")
    assert(p.contains("PushedAggregation"),
      s"aggregate did not push into the parquet scan:\n$p")
    assert(p.contains("MIN(l_quantity)") && p.contains("COUNT(*)"),
      s"pushed aggregate list incomplete:\n$p")
  }

  test("q115: shard partials carry only sketch state — no Expand distinct path") {
    // Mixing countDistinct into the sketch partial would plan an
    // Expand (row tripling) + an extra exchange, all for a column the
    // rollup never reads. The exact verification leg is a LONE
    // countDistinct on its own scan, which plans as a plain two-phase
    // aggregate — so the whole query must be Expand-free.
    val p = planAtScaleStats("q115_hll_shard_merge")
    assert(!p.contains("Expand"),
      s"dead exact-distinct path re-appeared in the shard partials:\n$p")
  }

  test("join strategy hints are honored (merge, shuffle_hash, broadcast)") {
    // the user-facing escape hatch when the optimizer's choice is
    // wrong for a known workload — each hint must actually flip the
    // physical join operator
    import org.apache.spark.sql.functions._
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val a = Tables.orders(spark, sf())
      val b = Tables.customer(spark, sf())
      def planOf(hint: String) =
        a.join(b.hint(hint), a("o_custkey") === b("c_custkey"))
          .queryExecution.executedPlan.toString
      assert(planOf("merge").contains("SortMergeJoin"))
      assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
      assert(planOf("broadcast").contains("BroadcastHashJoin"))
    } finally spark.conf.set(key, prev)
  }

  test("CBO: ANALYZE-backed column stats alone flip a filtered join side to broadcast") {
    // The knob a warehouse user turns first: no hints anywhere — the
    // ONLY difference between the two plans is whether the optimizer
    // may use the ANALYZE TABLE statistics. A ~1%-selective filter on
    // o_orderkey makes the orders side broadcastable ONLY under
    // CBO's FilterEstimation (min/max column stats → range
    // selectivity); the size-only estimator propagates the full
    // table size through the filter, stays over the threshold, and
    // falls back to sort-merge. The query keeps orders' wide columns
    // flowing so projection-width scaling can't shrink the size-only
    // estimate by accident.
    val confKeys = Seq("spark.sql.cbo.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = confKeys.map(k => k -> spark.conf.getOption(k))
    try {
      graft.Tables.orders(spark, sf()).write
        .mode("overwrite").saveAsTable("orders_cbo")
      graft.Tables.lineitem(spark, sf()).write
        .mode("overwrite").saveAsTable("lineitem_cbo")
      spark.sql("ANALYZE TABLE orders_cbo COMPUTE STATISTICS")
      spark.sql(
        "ANALYZE TABLE orders_cbo COMPUTE STATISTICS FOR COLUMNS o_orderkey")
      spark.sql("ANALYZE TABLE lineitem_cbo COMPUTE STATISTICS")
      val raw = spark.sessionState.catalog
        .getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier("orders_cbo"))
        .stats.get.sizeInBytes.toLong
      val mm = spark.sql(
        """SELECT CAST(MIN(o_orderkey) AS BIGINT),
                  CAST(MAX(o_orderkey) AS BIGINT) FROM orders_cbo""").first()
      val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 100
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (raw / 4).toString)
      val q = s"""
        SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
               o.o_orderdate, o.o_orderpriority, o.o_totalprice,
               l.l_quantity
        FROM lineitem_cbo l JOIN orders_cbo o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey <= $cut"""
      def physical(cbo: Boolean): String = {
        spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
        spark.sql(q).queryExecution.executedPlan.toString
      }
      val sizeOnly = physical(false)
      assert(sizeOnly.contains("SortMergeJoin") &&
        !sizeOnly.contains("BroadcastHashJoin"),
        s"size-only estimator should NOT see through the filter:\n$sizeOnly")
      val withCbo = physical(true)
      assert(withCbo.contains("BroadcastHashJoin"),
        s"CBO did not pick broadcast from column stats:\n$withCbo")
    } finally {
      Seq("orders_cbo", "lineitem_cbo")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("q152: span extraction shuffles once on the window hash and once on the doc") {
    val p = SparkEntry.queries("q152_crossdoc_spans")(spark, sf())
      .queryExecution.executedPlan.toString
    // hash-flag exchange + doc exchange (reused by both interval
    // windows AND the per-doc aggregates) + the final orderBy range
    // exchange; the length join must broadcast, never shuffle
    val hashParts = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashParts <= 2, s"extra content shuffle in q152:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q152 length join fell back to SMJ:\n$p")
  }

  test("q153: packing offsets shuffle only on the shard key") {
    val p = SparkEntry.queries("q153_pack_sequences")(spark, sf())
      .queryExecution.executedPlan.toString
    // shard exchange for the prefix-sum window + (shard, seq) agg
    // exchange — a corpus-global offset would appear as an extra
    // SinglePartition exchange before the window
    val hashParts = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashParts <= 2, s"extra shuffle in q153:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"q153 offsets went through a global window:\n$p")
  }

  test("q162: CDC merge is a partial-aggregable struct-max, not a window sort") {
    val p = planAtScaleStats("q162_cdc_merge")
    assert(!p.contains("Window"),
      s"q162 merge regressed to a row_number window:\n$p")
    // partial + final SortAggregate around one key exchange
    val n = "SortAggregate".r.findAllIn(p).length
    assert(n >= 2, s"q162 lost map-side pre-collapse:\n$p")
  }

  test("q163: attribution windows reuse the pairing join's user exchange") {
    val p = planAtScaleStats("q163_attribution")
    val hashParts = "Exchange hashpartitioning".r.findAllIn(p).length
    // conv side + touch side + final channel rollup; the three
    // per-conversation windows must NOT add a fourth
    assert(hashParts <= 3, s"extra exchange in q163:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q163 pairing fell off the equi-join path:\n$p")
  }

  test("q168: proximity join is an equi-join on cells, never a nested loop") {
    val p = planAtScaleStats("q168_geo_proximity")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"q168 planned the quadratic theta-join:\n$p")
  }

  test("q174: global lift cut is a TakeOrdered, not a full sort") {
    val p = planAtScaleStats("q174_association_rules")
    assert(p.contains("TakeOrderedAndProject"),
      s"q174 top-30 planned as a global sort:\n$p")
  }

  test("q176: neighbor ranking never plans a cartesian product") {
    val p = planAtScaleStats("q176_item_neighbors")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q176 similarity graph fell off the equi-join path:\n$p")
  }

  test("q179: probe routing and query codes attach via BroadcastHashJoin; " +
      "the only nested loop is the bounded centroid assignment") {
    val p = planAtScaleStats("q179_sq8_ivf_routed")
    // count FormattedMode detail headers — one per operator instance
    // (the tree section repeats each operator name)
    val bhj = """\(\d+\) BroadcastHashJoin""".r.findAllIn(p).length
    assert(bhj >= 2,
      s"q179 expected 2+ BroadcastHashJoins (probe cell join + query " +
        s"code join), found $bhj:\n$p")
    val bnl = """\(\d+\) BroadcastNestedLoopJoin""".r
      .findAllIn(p).length
    assert(bnl <= 1,
      s"q179 candidate generation fell onto a nested loop (only the " +
        s"bounded query x centroid routing may BNL), found $bnl:\n$p")
    assert(!p.contains("CartesianProduct"), s"q179:\n$p")
  }

  test("q184: fingerprint overlap joins on the hash — no nested loop, " +
      "windows partitioned by document") {
    val p = planAtScaleStats("q184_winnow_fingerprints")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"winnow pair join fell onto a nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"q184:\n$p")
    // the winnowing min-window runs per document (window spec's
    // partition list in the formatted detail)
    assert("windowspecdefinition\\(doc_id".r.findFirstIn(p).isDefined,
      s"winnow window not partitioned by doc_id:\n$p")
  }

  test("q185: the anonymization ladder is two Window passes and the " +
      "broadcast dim join — no record-side shuffle join") {
    val p = planAtScaleStats("q185_k_anonymity")
    val windows = "\\(\\d+\\) Window".r.findAllIn(p).length
    assert(windows == 2, s"expected 2 Window ops, got $windows:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nation dim fell back to SMJ:\n$p")
  }

  test("Pca.covariance: the n*d^2 expansion collapses map-side") {
    import graft.operators.Pca
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val p = Pca.covariance(emb, "embedding", 64)
      .queryExecution.explainString(FormattedMode)
    assert("partial_".r.findFirstIn(p).isDefined,
      s"covariance moments not partially aggregated — the d^2 " +
        s"expansion would shuffle data-sized:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"covariance took a non-equi join:\n$p")
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // the 100 TB shuffle-join posture: with broadcast off (at-scale
    // stats) a selective dim filter must reach the fact scan as a
    // runtime bloom filter (might_contain), not wait for the join
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter." +
        "creationSideThreshold" -> "100MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf())
      val part = Tables.part(spark, sf())
        .filter(col("p_retailprice") > 1800)
      val p = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey")).count()
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("might_contain"),
        s"no runtime bloom filter on the fact scan:\n$p")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("no unexpected cartesian products across the whole query surface") {
    // Deliberate bounded cross joins (documented quadratic baselines
    // over bounded subsets): q30 brute-force Jaccard, q34 embedding
    // near-dup verification, q157's exact ground-truth leg.
    val bounded = Set("q30_ngram_jaccard", "q34_embed_neardup",
      "q157_lsh_recall_curve")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(bounded)
      .filter { q =>
        plan(q).contains("CartesianProduct")
      }
    assert(offenders.isEmpty,
      s"unexpected CartesianProduct in: ${offenders.mkString(", ")}")
  }

  test("chunkTokens is entirely map-side on a wide source (no exchange)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val p = graft.operators.Corpus
      .chunkTokens(docs, "doc_id", "text", 4, 2)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), p)
  }

  test("q194: item-frequency frames stay broadcast under at-scale stats") {
    val p = planAtScaleStats("q194_item_cooccur")
    // the two freq normalizer joins are explicit broadcasts (item-
    // cardinality); the per-basket pair self-join is the only
    // shuffled join
    assert(occurrences(p, "BroadcastHashJoin") >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q193: drift joins are broadcast-only (1-row scalars + bins frame)") {
    val p = planAtScaleStats("q193_hist_drift")
    assert(!p.contains("SortMergeJoin") &&
      !p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q197: IVM old-image lookup probes the base with a broadcast key side") {
    val p = planAtScaleStats("q197_ivm_agg")
    assert(occurrences(p, "BroadcastHashJoin") >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q214: window pairs are an equi-join — no theta join, no nested loop") {
    // the rank-band semantics must NOT plan as a range theta join:
    // pairs come from the bucket equi-join (bkt) with the distance
    // filter applied after
    val p = planAtScaleStats("q214_sorted_neighborhood")
    assert(!p.contains("CartesianProduct"), s"q214:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q214:\n$p")
    assert("SortMergeJoin|ShuffledHashJoin".r.findFirstIn(p).isDefined,
      s"q214 lost its equi-join:\n$p")
  }

  test("q216: assortativity is equi-joins plus one partial aggregate") {
    val p = planAtScaleStats("q216_assortativity")
    assert(!p.contains("CartesianProduct"), s"q216:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q216:\n$p")
    assert("partial_".r.findFirstIn(p).isDefined, s"q216:\n$p")
  }

  test("q217: rendezvous assignment is pure map-side — no join at all") {
    val p = plan("q217_rendezvous_sharding")
    assert(!p.contains("Join"), s"q217 grew a join:\n$p")
    assert("partial_".r.findFirstIn(p).isDefined,
      s"q217 lost its map-side combine:\n$p")
  }

  test("q233: the Bradley-Terry fixpoint joins ride broadcasts — " +
      "the raw log pays partial-agg exchanges, rounds never " +
      "shuffle log-sized data") {
    val p = planAtScaleStats("q233_bradley_terry")
    // strengths/wins frames join the pair frame via explicit
    // broadcast() hints — none may degrade to SMJ (the fixpoint's
    // interior is behind localCheckpoints; the final join is the
    // representative round shape)
    assert(!p.contains("SortMergeJoin"),
      s"q233 fixpoint join fell back to SMJ:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q233:\n$p")
    // the raw-log aggregation (pre-checkpoint) must map-side combine
    import org.apache.spark.sql.functions._
    val op = graft.operators.Evals.orientedPairs(
        Tables.events(spark, sf()).select(
          expr("event_id % 8").as("a"),
          expr("(event_id div 8) % 8").as("b"),
          (col("event_id") % 2 === 0).as("wa"))
          .filter(col("a") =!= col("b")),
        "a", "b", "wa")
      .queryExecution.explainString(FormattedMode)
    assert("partial_".r.findFirstIn(op).isDefined,
      s"orientedPairs lost map-side combine on the raw log:\n$op")
  }

  test("q234/q238: AUC aggregates the score histogram with " +
      "map-side combine; q238's window is slice-partitioned") {
    val p = plan("q234_exact_auc")
    assert("partial_".r.findFirstIn(p).isDefined, s"q234:\n$p")
    val p2 = plan("q238_auc_by_slice")
    // a partitioned window sorts within hash partitions of the
    // slice key — the single-partition Exchange form would carry
    // SinglePartition in the formatted plan
    assert(!p2.contains("SinglePartition"),
      s"q238 window collapsed to a single partition:\n$p2")
  }

  test("q249: the bloom probe filter sits below the join (fact " +
      "pruned pre-shuffle), and the join stays an equi-join") {
    val p = planAtScaleStats("q249_bloom_pruned_join")
    val probeAt = p.indexOf("might_contain")
    assert(probeAt >= 0, s"q249 lost the bloom probe:\n$p")
    assert(!p.contains("CartesianProduct"), s"q249:\n$p")
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(p).isDefined, s"q249 lost its equi-join:\n$p")
  }

  test("q244: target encoding is one category aggregate + broadcast " +
      "joins — the encode itself never shuffles rows") {
    val p = planAtScaleStats("q244_target_encoding")
    assert(!p.contains("SortMergeJoin"),
      s"q244 encode join fell back to SMJ:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q244:\n$p")
  }

  private def occurrences(hay: String, needle: String): Int =
    needle.r.findAllIn(hay).size
}
