package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the reproducible train/val/test
  * assignment a training-data pipeline needs at corpus scale. The
  * split is a pure function of the row's id (first 16 bits of
  * md5(id) → bucket 0-99), so it is:
  *  - stable across runs, partitionings, and cluster sizes (unlike
  *    `randomSplit`, which depends on partition layout and seed),
  *  - shuffle-free (map-side expression, rides whole-stage codegen),
  *  - exactly reproducible by any engine with md5 (oracle-checkable).
  */
object Splits {

  private val HexDict = "0123456789abcdef"

  /** Value of hex nibble `i` (1-based) of `h`. */
  private def nibble(h: Column, i: Int): Column =
    instr(lit(HexDict), substring(h, i, 1)) - 1

  /** Percent bucket 0-99 from the first 16 bits of md5(id).
    *
    * Implementation note (r15): the first 4 hex nibbles weighted
    * 4096/256/16/1 ARE the first 4 hex digits read as one base-16
    * number, so parse them with a single substring + conv instead of
    * four nibble extractions — the nibble form replanted the md5
    * subexpression four times and measured ~2.3 µs/row on the
    * hot map-side filters (basket-graph bucket cuts evaluate it per
    * fact row at every scale). Bit-identical value: md5() emits
    * lowercase hex, conv(_, 16, 10) parses it case-insensitively,
    * and 4 nibbles ≤ 0xffff never overflow. */
  def hashBucket(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("int") % 100).cast("int")

  /** Rendezvous (highest-random-weight) shard assignment — the
    * data-placement scheme whose defining property is MINIMAL
    * RESHUFFLE: removing a shard moves ONLY that shard's rows
    * (every survivor keeps its argmax; q217 hashes the full 8→7
    * transition matrix to prove it), unlike mod-N hashing where
    * dropping a shard remaps nearly everything. Pure map-side
    * expression: per row, the shard with the greatest
    * md5(id ":" shard) — no ring state, no coordination, exactly
    * reproducible by any engine with md5.
    *
    * Tie-break (md5 collisions are astronomically unlikely but
    * determinism must not depend on luck): the single-digit shard id
    * is appended to the fixed-width 32-char score before GREATEST,
    * so equal scores resolve to the larger shard in every engine.
    * nShards ≤ 10 keeps the suffix fixed-width; wider fleets
    * zero-pad (documented, not needed here). */
  def hrwAssign(id: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 10,
      s"nShards must be in [1, 10]: $nShards")
    val scored = (0 until nShards).map(sh =>
      concat(md5(concat(id.cast("string"), lit(":"), lit(sh.toString))),
        lit(sh.toString)))
    substring(greatest(lit("") +: scored: _*), 33, 1).cast("int")
  }

  /** DuckDB rendering of [[hrwAssign]] — identical score/tie-break
    * algebra. */
  def hrwAssignSql(id: String, nShards: Int): String = {
    val scored = (0 until nShards).map(sh =>
      s"md5($id || ':$sh') || '$sh'")
    s"CAST(SUBSTR(GREATEST(${scored.mkString(", ")}), 33, 1) AS INT)"
  }

  /** Split assignment from cumulative percent cutoffs, e.g.
    * `Seq("train" -> 80, "val" -> 90, "test" -> 100)`:
    * bucket < 80 → train, < 90 → val, else test. */
  def splitAssign(id: Column, cutoffs: Seq[(String, Int)]): Column = {
    require(cutoffs.nonEmpty && cutoffs.last._2 == 100,
      "cutoffs must be cumulative and end at 100")
    val b = hashBucket(id)
    cutoffs.init.foldRight(lit(cutoffs.last._1): Column) {
      case ((name, cut), rest) => when(b < cut, name).otherwise(rest)
    }
  }

  /** Deterministic p-percent sample: keep rows whose bucket < p —
    * repeatable, engine-independent, and consistent between runs
    * over growing data (a row's membership never changes). */
  def hashSample(id: Column, percent: Int): Column =
    hashBucket(id) < percent

  /** Temperature-scaled mixture quotas — the data-mixing step of a
    * multi-source training corpus (GPT-3's α-weighted sampling; The
    * Pile's epoch weights): apportion a budget of `n` examples over
    * sources with weight count^α, as EXACT integer largest-remainder
    * apportionment (Hamilton's method — quotas sum to n by
    * construction, no float drift can gain or lose an example).
    *
    *  - α = 1.0: proportional (w = count, the no-op mix)
    *  - α = 0.5: square-root temperature (upweights small sources) —
    *    w = floor(sqrt(count)·1e6). IEEE `sqrt` is correctly rounded
    *    (unlike log/pow — the same reason q223 uses 1e6 div d over
    *    Adamic-Adar and q225 uses dyadic RBP over nDCG), so the
    *    micro-sqrt is bit-identical in any engine.
    *  - α = 0.0: uniform (w = 1)
    *
    * quota_i = (n·w_i) div W with W = Σw (decimal(38,0) — source
    * counts at 100 TB pass int64 products), then the n − Σquota
    * leftover seats go to the largest remainders (ties → smaller
    * key). The ranking window runs over SOURCE cardinality rows (a
    * dimension, not the data), so the single-partition window is
    * bounded by construction.
    *
    * @param counts one row per source: (keyCol, cntCol)
    * @return (keyCol, cnt, w, quota_floor, seat_rank, quota) with
    *         Σquota = n exactly */
  def temperatureQuotas(counts: DataFrame, keyCol: String,
      cntCol: String, n: Long, alpha: Double): DataFrame = {
    require(n >= 0, s"n must be >= 0: $n")
    val w = alpha match {
      case 1.0 => col("cnt") * lit(1000000L)
      case 0.5 => floor(sqrt(col("cnt").cast("double")) * 1e6)
        .cast("long")
      case 0.0 => lit(1000000L)
      case a => throw new IllegalArgumentException(
        s"alpha must be 1.0, 0.5 or 0.0 (exact cross-engine forms): $a")
    }
    val base = counts
      .select(col(keyCol).as("key"), col(cntCol).cast("long").as("cnt"))
      .withColumn("w", w.cast("decimal(38,0)"))
    val tot = base.agg(sum(col("w")).as("tw"))
    val scored = base.crossJoin(broadcast(tot))
      .withColumn("quota_floor",
        expr(s"(CAST($n AS DECIMAL(38,0)) * w) div tw"))
      .withColumn("rem", expr(s"(CAST($n AS DECIMAL(38,0)) * w) % tw"))
    val leftover = scored
      .agg((lit(n) - sum(col("quota_floor"))).as("lo"))
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("key"))
    scored.crossJoin(broadcast(leftover))
      .withColumn("seat_rank",
        org.apache.spark.sql.functions.row_number().over(rankW)
          .cast("long"))
      .withColumn("quota",
        col("quota_floor") +
          when(col("seat_rank") <= col("lo"), 1L).otherwise(0L))
      .select(col("key"), col("cnt"), col("w").cast("long").as("w"),
        col("quota_floor"), col("seat_rank"), col("quota"))
  }
}
