package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: collapse an ordered change log
  * (insert/update/delete rows with a per-key monotone sequence
  * number) into the final snapshot — the MERGE INTO / upsert-apply
  * primitive of any incremental ingestion pipeline.
  *
  * Implementation is an AGGREGATE, not a window: the latest change
  * per key is `max(struct(seq, payload...))` — struct ordering
  * compares `seq` first, and seq is unique per key by contract, so
  * the max IS the last change. Unlike `row_number() = 1` (shuffle +
  * per-key SORT), the struct-max is partial-aggregable: every map
  * task pre-collapses its local changes before the key exchange, so
  * a 100 TB change log with hot keys ships one row per (task, key),
  * not the full history. Delete tombstones survive to the final
  * aggregate and are dropped AFTER the max — a delete followed by a
  * later re-insert resurrects the key, matching MERGE semantics.
  */
object Cdc {

  /** Keyed diff of two snapshots — the CHANGE FEED between two
    * versions of a table (Delta's `table_changes` / Iceberg's
    * incremental-read analogue; q175 inlines the same construction
    * for its round-trip law). One key-partitioned full-outer join:
    *
    *  - key only in `b`          → `insert` (b's row)
    *  - key only in `a`          → `delete` (a's row)
    *  - key in both, payload ≠   → `update` (b's row — postimage)
    *  - key in both, payload =   → no row
    *
    * Payload comparison is NULL-SAFE (`<=>` over the non-key struct:
    * a NULL→value or value→NULL transition is an update, NULL→NULL
    * is not a change). Both frames must share a schema; (key) must
    * be unique per snapshot — snapshots, not logs.
    *
    * Scale shape: both sides shuffle once on the key; output carries
    * `_change_type` last so the feed appends onto the source schema.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(a.columns.sameElements(b.columns),
      s"snapshotDiff: schemas differ (${a.columns.mkString(",")} vs " +
        s"${b.columns.mkString(",")})")
    require(keyCols.nonEmpty && keyCols.forall(a.columns.contains),
      s"snapshotDiff: key columns ${keyCols.mkString(",")} must " +
        "exist in both snapshots")
    require(!a.columns.contains("_change_type"),
      "snapshotDiff: column name _change_type is reserved for the " +
        "feed tag")
    require(!a.columns.exists(c => c.startsWith("__a_") ||
        c.startsWith("__b_")),
      "snapshotDiff: __a_/__b_ column prefixes are reserved")
    val payload = a.columns.filterNot(keyCols.contains).toSeq
    // presence markers rather than key-nullness tests, so a
    // legitimately NULL key value can't masquerade as side-absence
    val la = a.select(a.columns.map(c => col(c).as(s"__a_$c")).toSeq
      :+ lit(true).as("__a_present"): _*)
    val lb = b.select(b.columns.map(c => col(c).as(s"__b_$c")).toSeq
      :+ lit(true).as("__b_present"): _*)
    val keyEq = keyCols.map(k => col(s"__a_$k") <=> col(s"__b_$k"))
      .reduce(_ && _)
    def pstruct(p: String) =
      struct(payload.map(c => col(s"$p$c")): _*)
    val joined = la.join(lb, keyEq, "full_outer")
    val changeType =
      when(col("__a_present").isNull, lit("insert"))
        .when(col("__b_present").isNull, lit("delete"))
        .when(if (payload.isEmpty) lit(false)
          else !(pstruct("__a_") <=> pstruct("__b_")), lit("update"))
    joined
      .withColumn("_change_type", changeType)
      .filter(col("_change_type").isNotNull)
      .select(a.columns.toSeq.map(c =>
        when(col("_change_type") === "delete", col(s"__a_$c"))
          .otherwise(col(s"__b_$c")).as(c)) :+
        col("_change_type"): _*)
  }

  /** Final snapshot from a change log.
    *
    * @param log    change rows: `keyCols` ++ [[seqCol]] ++ [[opCol]]
    *               ++ payload columns. (key, seq) unique; higher seq
    *               = later change; op `"D"` = delete tombstone (its
    *               payload is ignored), anything else upserts.
    * @param keepTombstones when true, keys whose LAST change is a
    *               delete stay in the output with `last_op = "D"` —
    *               the persisted-snapshot form: an incremental apply
    *               that DROPPED tombstones would let a late-arriving
    *               lower-seq change resurrect a deleted key in a
    *               later batch. Readers filter `last_op != "D"`.
    * @return one row per live key: keyCols, payload columns, plus
    *         `last_seq` (the winning change's seq) and `last_op`.
    */
  def mergeLatest(log: DataFrame, keyCols: Seq[String], seqCol: String,
      opCol: String, keepTombstones: Boolean = false): DataFrame = {
    val payload = log.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == seqCol || c == opCol)
    val packed = struct(
      (col(seqCol) +: col(opCol) +: payload.map(col)): _*)
    val latest = log
      .groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("__last"))
    (if (keepTombstones) latest
     else latest.filter(col(s"__last.$opCol") =!= "D"))
      .select(keyCols.map(col) ++
        payload.map(c => col(s"__last.$c").as(c)) ++
        Seq(col(s"__last.$seqCol").as("last_seq"),
          col(s"__last.$opCol").as("last_op")): _*)
  }

  /** Incremental view maintenance for a (count, sum) aggregate: fold
    * a CDC batch into a pre-aggregated view WITHOUT rescanning the
    * base table — the materialized-view delta algebra
    * (maintain(viewOf(base), delta) == viewOf(apply(base, delta))).
    *
    * Per change row:
    *  - insert `i`: +1 count, +value to its group,
    *  - delete `d`: −1 count, −old value (old image looked up in
    *    base by `rowKey`),
    *  - update `u`: −old image, +new image — which transparently
    *    handles GROUP-moving updates (the −1/+1 land on different
    *    groups; a same-group update nets count 0).
    * Groups whose maintained count reaches 0 drop out of the view.
    *
    * Exactness: values are rounded to `scale` decimals and summed as
    * DECIMAL(18+10) — the [[graft.queries.Q.dsum]] contract — so
    * maintained sums match a from-scratch recompute bit-for-bit (a
    * float fold would drift under ±cancellation).
    *
    * Scale shape: the ONLY touch of the base table is the old-image
    * lookup — an equi-join of the (small) update/delete keys against
    * base's `rowKey` (broadcast the delta side; on real storage this
    * is a keyed point-lookup scan). Everything else is delta-sized
    * plus one group-cardinality outer merge. History is never
    * rescanned — the property that makes a 100 TB view maintainable
    * under a trickle of changes.
    *
    * @param baseAgg pre-aggregated view: (grpCol, cnt, s: decimal)
    *                — build with [[aggOf]]
    * @param base    the base table the view aggregates (only its
    *                update/delete keys are read)
    * @param cdc     change rows: rowKey, op ('i'|'u'|'d'), grpCol,
    *                valCol (payload ignored for 'd'); update/delete
    *                keys MUST exist in base, at most one change per
    *                key per batch
    * @return maintained view (grpCol, cnt, s) — same shape as
    *         [[aggOf]]'s output */
  def maintainAgg(baseAgg: DataFrame, base: DataFrame, cdc: DataFrame,
      rowKey: String, opCol: String, grpCol: String, valCol: String,
      scale: Int): DataFrame = {
    val dec = s"decimal(18,$scale)"
    // the delta is small BY CONTRACT (a trickle of changes against a
    // huge base), so the old-image lookup broadcasts the key side —
    // the base is probed in place, never exchanged
    val oldImg = broadcast(cdc.filter(col(opCol).isin("u", "d"))
        .select(col(rowKey)))
      .join(base, Seq(rowKey))
      .select(col(grpCol).as("__g"), lit(-1L).as("dc"),
        (-round(col(valCol), scale)).cast(dec).as("dv"))
    val newImg = cdc.filter(col(opCol).isin("u", "i"))
      .select(col(grpCol).as("__g"), lit(1L).as("dc"),
        round(col(valCol), scale).cast(dec).as("dv"))
    val delta = oldImg.unionByName(newImg)
      .groupBy(col("__g"))
      .agg(sum(col("dc")).as("dc"), sum(col("dv")).as("dv"))
    baseAgg
      .join(delta, baseAgg(grpCol) === delta("__g"), "full_outer")
      .select(
        coalesce(baseAgg(grpCol), col("__g")).as(grpCol),
        (coalesce(col("cnt"), lit(0L)) +
          coalesce(col("dc"), lit(0L))).as("cnt"),
        (coalesce(col("s"), lit(0).cast(dec)) +
          coalesce(col("dv"), lit(0).cast(dec))).as("s"))
      .filter(col("cnt") > 0)
  }

  /** The from-scratch (count, decimal-sum) view [[maintainAgg]]
    * maintains: group, exact rounded-decimal sum, row count. */
  def aggOf(rows: DataFrame, grpCol: String, valCol: String,
      scale: Int): DataFrame =
    rows.groupBy(col(grpCol))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col(valCol), scale).cast(s"decimal(18,$scale)"))
          .as("s"))
}
