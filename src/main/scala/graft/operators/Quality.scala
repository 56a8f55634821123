package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate (the validation pass a production pipeline runs
  * before publishing a table): declarative violation checks compiled
  * into ONE conditional-aggregation scan — adding a check never adds
  * a scan — plus key-uniqueness and referential-orphan checks that
  * need their own (single-shuffle) shapes. Everything returns lazy
  * (check, n_violations) frames that union into one report; no
  * driver-side actions.
  */
object Quality {

  /** One named constraint; `violation` is TRUE for offending rows. */
  final case class Check(name: String, violation: Column)

  /** All row-level checks in one scan: conditional sums, then melted
    * to (check, n_violations) rows. Sums are coalesced to 0 so an
    * EMPTY input reports zero violations per check, not NULLs (SUM
    * over zero rows is NULL). */
  def rowChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val aggs = checks.map(c =>
      coalesce(sum(when(c.violation, 1L).otherwise(0L)), lit(0L))
        .as(c.name))
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty[Column],
        checks.map(c => col(c.name)).toArray,
        "check_name", "n_violations")
  }

  /** Uniqueness: number of key values appearing more than once. */
  def uniquenessCheck(df: DataFrame, keys: Seq[String],
      name: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Referential integrity: child keys with no parent (left-anti). */
  def referentialCheck(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Full report: row checks + extra check frames, one result. */
  def report(df: DataFrame, checks: Seq[Check],
      extra: Seq[DataFrame] = Nil): DataFrame =
    extra.foldLeft(rowChecks(df, checks))(_ unionByName _)
}
