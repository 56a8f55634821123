package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit Bloom-pruned equi-join — the pre-shuffle semi-join
  * reduction that makes selective fact⋈dim joins cheap at 100 TB:
  * build a Bloom filter over the dim keys (one small aggregate,
  * Spark's own `BloomFilterAggregate` runtime-filter kernel exposed
  * as `bloom_agg` by [[graft.GraftExtensions]]), broadcast the one
  * binary row, and drop fact rows that cannot match BEFORE the join
  * shuffle moves them. False positives only let extra rows through
  * to the exact join — the RESULT is identical to the plain join
  * (which is exactly how the oracle checks it); false negatives are
  * impossible.
  *
  * Spark's AQE injects this automatically in some shapes
  * (`InjectRuntimeFilter`), but only under its own heuristics and
  * never across the API seams where a user composes the two sides
  * separately — this operator is the explicit form, with the
  * expected-items dial exposed (FPP degrades gracefully if the dim
  * outgrows it; correctness never depends on it).
  *
  * Scale shape: one dim-sized aggregate, a 1-row broadcast, a
  * map-side codegen'd filter on the fact scan, then the exact join
  * over the surviving (typically tiny) fraction. The shuffle that
  * the plain join would pay on the full fact is paid only by
  * survivors.
  */
object BloomJoin {

  /** Inner equi-join of `fact` to `dim`, Bloom-pruned on the fact
    * side. Output = fact columns then dim columns (join keys kept
    * on both sides, like a plain inner join on an expression).
    *
    * `might_contain` requires its filter input to be a constant or
    * a SCALAR SUBQUERY (the shape Spark's own InjectRuntimeFilter
    * emits), so the dim-side aggregate rides `Dataset.scalar()` —
    * a catalog-free scalar subquery baked into the returned plan:
    * executed once, its one binary row broadcast into the fact
    * filter. No temp view is registered, so nothing leaks into the
    * session catalog and the returned (lazy) DataFrame is
    * self-contained — it stays executable no matter what the
    * caller does to the catalog afterwards. */
  def bloomPrunedEquiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be > 0")
    val bloom = dim.agg(
        expr(s"bloom_agg(xxhash64(`$dimKey`), $expectedItems)")
          .as("__bloom"))
      .scalar()
    fact
      .filter(call_function("bloom_might_contain", bloom,
        xxhash64(col(factKey))))
      .join(dim, col(factKey) === col(dimKey))
  }
}
