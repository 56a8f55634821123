package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE merge LEARNING (Sennrich et al. '16 training
  * loop): [[TextOps]] encodes with a given merge table; this learns
  * one. Each round counts all adjacent token pairs across the corpus
  * (one groupBy — the only exchange), picks the most frequent pair
  * (ties → lexicographically smallest), and applies it everywhere
  * with the leftmost-non-overlapping greedy rule, then recounts.
  *
  * Determinism: the greedy "aaa → (aa)a not a(aa)" rule is expressed
  * relationally — occurrences of the winning pair at consecutive
  * positions form runs (gap-grouped by pos − row_number), and only
  * EVEN offsets within a run merge; for a ≠ b runs are singletons,
  * so the one rule covers both cases. Any SQL engine replays the
  * full learning trajectory bit-for-bit.
  *
  * Scale shape: pair counting is a partial-aggregated groupBy over
  * the (doc, pos)-partitioned token relation; the arg-max is a
  * 1-row driver collect; application is a per-doc window + two
  * self-equi-joins, checkpointed per round (O(1) plan depth). State
  * on the driver: the merge table (rounds × 2 strings).
  */
object BpeTrain {

  /** One learned merge: round (1-based), the pair, its count at
    * selection time. */
  final case class Merge(round: Int, a: String, b: String, n: Long)

  /** Character-level token relation (doc, pos, tok) for a text
    * column: 1-based positions over `lower(substr(text, 1, limit))`. */
  def charTokens(docs: DataFrame, idCol: String, textCol: String,
      limit: Int): DataFrame =
    // NOT fanned out (r15, measured): unlike the corpus tokenizers,
    // the char-limited training relation is deliberately tiny and
    // the learning loop is round-overhead-bound — a 32-way fanOut
    // here tripled the per-round task count (131 -> 318 tasks,
    // 4.7 -> 6.3 s at sf0.1) without any compute to spread.
    docs
      .select(col(idCol).as("doc"),
        lower(substring(col(textCol), 1, limit)).as("t"))
      .select(col("doc"),
        explode(when(length(col("t")) >= 1,
          sequence(lit(1), length(col("t"))))
          .otherwise(array())).as("pos"),
        col("t"))
      .select(col("doc"), col("pos").cast("long").as("pos"),
        expr("substring(t, pos, 1)").as("tok"))

  /** Learn `rounds` merges over a (doc, pos, tok) relation; returns
    * the merge table and the final token relation (positions
    * re-indexed 1..n per doc each round). Stops early when no
    * adjacent pair remains. */
  def learnMerges(tokens: DataFrame, rounds: Int)
      : (Seq[Merge], DataFrame) = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    var toks = tokens.select(col("doc"), col("pos"), col("tok"))
      .transform(Ckpt.cut)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      r += 1
      val right = toks.select(col("doc"), (col("pos") - 1L).as("pos"),
        col("tok").as("tok_b"))
      val pairs = toks.join(right, Seq("doc", "pos"))
        .groupBy(col("tok").as("a"), col("tok_b").as("b"))
        .agg(count(lit(1)).as("n"))
      val top = pairs
        .orderBy(col("n").desc, col("a"), col("b")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, a, b, n)
        val occ = toks.filter(col("tok") === a)
          .join(right.filter(col("tok_b") === b)
            .select(col("doc"), col("pos")), Seq("doc", "pos"))
          .select(col("doc"), col("pos"))
        val wRun = Window.partitionBy(col("doc"))
          .orderBy(col("pos"))
        val sel = occ
          .withColumn("runid", col("pos") - row_number().over(wRun))
          .withColumn("idx", row_number().over(
            Window.partitionBy(col("doc"), col("runid"))
              .orderBy(col("pos"))) - 1)
          .filter(col("idx") % 2 === 0)
          .select(col("doc"), col("pos"))
        val merged = toks
          .join(sel.withColumn("m", lit(1)), Seq("doc", "pos"),
            "left")
          .join(sel.select(col("doc"), (col("pos") + 1L).as("pos"),
            lit(1).as("dropRight")), Seq("doc", "pos"), "left")
          // a row is consumed by a merge on its LEFT unless it is
          // itself a merge start (impossible by the parity rule,
          // kept explicit for clarity)
          .filter(col("dropRight").isNull || col("m").isNotNull)
          .select(col("doc"), col("pos"),
            when(col("m").isNotNull, lit(a + b))
              .otherwise(col("tok")).as("tok"))
        toks = merged
          .withColumn("pos",
            row_number().over(Window.partitionBy(col("doc"))
              .orderBy(col("pos"))).cast("long"))
          .transform(Ckpt.cut)
      }
    }
    (merges.toSeq, toks)
  }
}
