package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-journey mining over an event stream: the time-bounded
  * conversion funnel and frequent event-path extraction — the two
  * product-analytics staples that complement q89 (retention cohorts),
  * q109 (single-step transition matrix) and q37 (sessionization).
  *
  * Scale shape:
  *  - The funnel is one user-keyed aggregate per step plus one
  *    user-keyed join per step — every exchange is on the SAME key,
  *    so co-partitioning is reused stage to stage, and each stage's
  *    frame shrinks monotonically (users who reached step i). No
  *    window over the raw stream, no per-user state larger than one
  *    timestamp.
  *  - Path mining groups each user's events once (the per-user
  *    event list is the only super-row state — bounded by per-user
  *    activity), then n-grams the type sequence MAP-SIDE
  *    ([[TextOps.grams]]) and counts paths in one partial-aggregable
  *    shuffle. At 100 TB a lifetime-keyed list is the wrong state
  *    bound (one always-on user owns an unbounded super-row) —
  *    [[topPathsSessionized]] is that form: sessionize first, key
  *    the list by (user, session), so state is bounded by session
  *    length and paths never span an inactivity gap.
  *
  * Determinism: all time arithmetic is integer microseconds
  * (`unix_micros`), sequence order ties break on the event id, and
  * every emitted aggregate is integer-valued.
  */
object Journeys {

  /** Time-bounded funnel: step 1 anchors at the user's FIRST
    * occurrence of `steps.head`; each later step matches the user's
    * first occurrence of that type STRICTLY after the previous
    * step's match and within `windowSec` of it.
    * @return (userCol, stage, t) — stage 1-based; a user appears for
    *         exactly the prefix of stages they reached */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnelTimes: steps must be non-empty")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      val anchor = prev.select(col(userCol).as("__u"),
        unix_micros(col("t")).as("__pt"))
      events.filter(col(typeCol) === step)
        .join(anchor, col(userCol) === col("__u"))
        .filter(unix_micros(col(tsCol)) > col("__pt") &&
          unix_micros(col(tsCol)) <= col("__pt")
            + lit(windowSec * 1000000L))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    }
    stages.zipWithIndex
      .map { case (df, i) => df.select(col(userCol),
        lit(i + 1L).as("stage"), col("t")) }
      .reduce(_ unionByName _)
  }

  /** Top event paths: each user's type sequence (ordered by ts, ties
    * by `tiebreakCol`) n-grammed and counted corpus-wide.
    * @return (path, n) with path the '>'-joined type n-gram */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tiebreakCol: String, n: Int, k: Int): DataFrame = {
    val seqs = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(tiebreakCol).as("i"),
        col(typeCol).as("y")))).as("s"))
      .select(transform(col("s"), x => x.getField("y")).as("types"))
    seqs.select(explode(TextOps.grams(col("types"), n)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("g"))
      .limit(k)
      .select(translate(col("g"), "\u001f", ">").as("path"), col("n"))
  }

  /** Compile a MATCH_RECOGNIZE-style pattern — whitespace-separated
    * event-type steps, each optionally quantified with `+` (one or
    * more), `*` (zero or more) or `?` (optional) — into the Java/RE2
    * regex that matches it against a '>'-terminated type sequence
    * string ("view>click>click>purchase>"). At least one step must
    * be required (`name` or `name+`), so a match is never empty.
    * Step names are restricted to identifier characters: the pattern
    * parameterizes a regex, and this is what keeps it injection-free. */
  private[graft] def compilePattern(pattern: String): String = {
    val toks = pattern.trim.split("\\s+").toSeq
      .filter(_.nonEmpty)
    require(toks.nonEmpty, "matchRecognize: empty pattern")
    val steps = toks.map { t =>
      val (name, q) =
        if ("+*?".contains(t.takeRight(1))) (t.dropRight(1),
          t.takeRight(1))
        else (t, "")
      require(name.matches("[A-Za-z0-9_]+"),
        s"matchRecognize: step '$t' must be an identifier with an " +
          "optional trailing + * or ?")
      (s"(?:$name>)$q", q)
    }
    require(steps.exists(s => s._2 == "" || s._2 == "+"),
      "matchRecognize: pattern needs at least one required step " +
        "(a match of all-optional steps would be empty)")
    steps.map(_._1).mkString
  }

  /** Declarative row-pattern matching — the MATCH_RECOGNIZE shape
    * (SQL:2016 ch. 12; Trino/Flink ship the same surface) over
    * gap-sessionized per-key event sequences: find every
    * non-overlapping CONTIGUOUS run of events whose types match
    * `pattern` (steps + quantifiers, [[compilePattern]]), with the
    * standard AFTER MATCH SKIP PAST LAST ROW policy (a regex engine's
    * leftmost-then-continue scan IS that policy). Contiguity is what
    * the imperative funnel family ([[funnelTimes]] — first occurrence
    * after, gaps allowed) cannot express, and the gap policy is the
    * session bound: no match spans `gapSec` of inactivity.
    *
    * Execution is Spark-first and regex-shaped, not NFA-per-row: one
    * shuffle on the key serves session assignment AND the (key,
    * session) sequence collect (same plan shape as
    * [[topPathsSessionized]]); the session's type sequence folds to
    * a '>'-terminated string and `regexp_extract_all` (codegen'd,
    * no UDF) emits the matches. The largest intermediate is one
    * session's events — bounded by the gap contract, never a user's
    * lifetime.
    *
    * Data contract: type values must not contain '>' (the sequence
    * delimiter); step names are identifier-restricted so arbitrary
    * regex can't be injected through `pattern`.
    *
    * @return (keyCol, session_id, match_no, match_path, match_len):
    *         one row per match; match_no is 1-based in sequence
    *         order, match_path the '>'-joined matched types */
  def matchRecognize(events: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, typeCol: String, pattern: String,
      gapSec: Long): DataFrame = {
    val rx = compilePattern(pattern)
    val sess = Sessionize.withSessionId(
      events.select(col(keyCol), col(typeCol), col(tsCol),
        col(tiebreakCol)),
      keyCol, tsCol, gapSec)
    val seqs = sess
      .groupBy(col(keyCol), col("session_id"))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(tiebreakCol).as("i"),
        col(typeCol).as("y")))).as("s"))
      .select(col(keyCol), col("session_id"),
        concat(concat_ws(">",
          transform(col("s"), x => x.getField("y"))), lit(">"))
          .as("str"))
    seqs
      .select(col(keyCol), col("session_id"),
        posexplode(regexp_extract_all(col("str"), lit(rx), lit(0))))
      .select(col(keyCol), col("session_id"),
        (col("pos") + 1).cast("long").as("match_no"),
        expr("trim(TRAILING '>' FROM col)").as("match_path"),
        (length(col("col")) -
          length(regexp_replace(col("col"), ">", "")))
          .cast("long").as("match_len"))
  }

  /** [[topPaths]] with its 100 TB state bound made real: events are
    * gap-sessionized first ([[Sessionize.withSessionId]]) and the
    * collected type sequence is keyed by (user, SESSION), so the
    * largest super-row is one session's events — bounded by the gap
    * contract — instead of one user's lifetime activity, and no
    * n-gram ever spans an inactivity gap (a path interrupted by
    * `gapSec` of silence is two journeys, not one).
    *
    * Scale shape: ONE shuffle on the user key serves both the
    * session-id window and the (user, session) grouping — hash
    * partitioning on user already co-locates (user, session), so
    * Catalyst plans no second exchange; everything after the
    * collect_list is [[topPaths]]'s map-side gram + one
    * partial-aggregable count shuffle.
    * @return (path, n) with path the '>'-joined type n-gram */
  def topPathsSessionized(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tiebreakCol: String,
      gapSec: Long, n: Int, k: Int): DataFrame = {
    val sess = Sessionize.withSessionId(
      events.select(col(userCol), col(typeCol), col(tsCol),
        col(tiebreakCol)),
      userCol, tsCol, gapSec)
    val seqs = sess
      .groupBy(col(userCol), col("session_id"))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(tiebreakCol).as("i"),
        col(typeCol).as("y")))).as("s"))
      .select(transform(col("s"), x => x.getField("y")).as("types"))
    seqs.select(explode(TextOps.grams(col("types"), n)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("g"))
      .limit(k)
      .select(translate(col("g"), "\u001f", ">").as("path"), col("n"))
  }
}
