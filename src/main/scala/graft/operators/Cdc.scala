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
}
