package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.TextOps

/** PII redaction (q180): the pre-training scrub pass. The synthetic
  * corpus carries no PII (a 31-token vocabulary), so — like q62's
  * language fixture — the masking semantics run over a literal
  * PII-laden fixture (multi-occurrence rows, adjacent-kind rows,
  * near-miss rows that must NOT mask), while a corpus leg scans the
  * real `documents` table and proves zero false positives at table
  * scale. Patterns are dialect-portable (Java regex == RE2), so the
  * oracle replays the masking itself, not just the counts.
  */
object Pii {

  // (id, text) — no apostrophes (rows embed into SQL literals)
  private[queries] val piiCorpus: Seq[(Long, String)] = Seq(
    (1L, "contact me at alice.smith+dev@example.com for details"),
    (2L, "two mails bob@corp.io and carol_99@mail.example.org here"),
    (3L, "my ssn is 123-45-6789 do not share"),
    (4L, "call 555-867-5309 today about the shipment"),
    (5L, "server at 192.168.0.1 and backup at 10.0.0.254"),
    (6L, "mixed bag 321-54-9876 reaches 777-123-4567 via 8.8.8.8"),
    (7L, "no pii here just plain text about parquet files"),
    (8L, "almost a ssn 1234-56-789 and almost phone 12-345-6789"),
    (9L, "email edge a@b.co plus ip edge 1.2.3.4"),
    (10L, "dot tail trap 1.2.3.4.5 still masks the first quad"),
    (11L, "repeat 9.9.9.9 then 9.9.9.9 again"),
    (12L, "sign up sam.o-neil@dev-site.example.net call " +
      "444-555-6666 box 10.1.1.1 ssn 987-65-4321"))

  /** q180 — PII masking + audit counts ([[TextOps.maskPii]] /
    * [[TextOps.piiCounts]]): per fixture row the per-kind counts
    * (from the ORIGINAL text) and the fully masked text; one corpus
    * row (id −1) sums every kind over the real `documents` table —
    * expected all-zero, computed honestly, so a false-positive
    * regression in any pattern breaks the hash. Masking is a pure
    * map-side regexp_replace chain: at 100 TB this is one more
    * projection on the ingest scan, no shuffle. */
  val q180 = Qry(
    "q180_pii_masking",
    (s: SparkSession, d: String) => {
      val session = s
      import session.implicits._
      val fixture = piiCorpus.toDF("id", "text")
        .select(col("id"), TextOps.piiCounts(col("text")).as("c"),
          TextOps.maskPii(col("text")).as("masked"))
        .select(col("id"), col("c.n_email"), col("c.n_ssn"),
          col("c.n_phone"), col("c.n_ipv4"), col("masked"))
      val corpus = Tables.documents(s, d)
        .select(TextOps.piiCounts(col("text")).as("c"))
        .agg(sum(col("c.n_email")).as("n_email"),
          sum(col("c.n_ssn")).as("n_ssn"),
          sum(col("c.n_phone")).as("n_phone"),
          sum(col("c.n_ipv4")).as("n_ipv4"))
        .select(lit(-1L).as("id"), col("n_email"), col("n_ssn"),
          col("n_phone"), col("n_ipv4"),
          lit(null).cast("string").as("masked"))
      fixture.unionByName(corpus).orderBy(col("id"))
    }, {
      val vals = piiCorpus.map { case (i, t) => s"($i, '$t')" }
        .mkString(",\n        ")
      val pats = TextOps.PiiPatterns
      def countSql(src: String, p: String) =
        s"CAST(len(regexp_extract_all($src, '$p')) AS BIGINT)"
      val maskSql = pats.foldLeft("text") { case (e, (_, p, repl)) =>
        s"regexp_replace($e, '$p', '$repl', 'g')"
      }
      val kinds = pats.map(_._1) // email, ssn, phone, ipv4
      Some(s"""
      WITH fixture(id, text) AS (VALUES
        $vals),
      fx AS (
        SELECT id,
               ${kinds.map(k => countSql("text",
                 pats.find(_._1 == k).get._2) + s" AS n_$k")
                 .mkString(",\n               ")},
               $maskSql AS masked
        FROM fixture),
      corpus AS (
        SELECT CAST(-1 AS BIGINT) AS id,
               ${kinds.map(k => s"CAST(SUM(${countSql("text",
                 pats.find(_._1 == k).get._2)}) AS BIGINT) AS n_$k")
                 .mkString(",\n               ")},
               CAST(NULL AS VARCHAR) AS masked
        FROM documents)
      SELECT * FROM fx
      UNION ALL SELECT * FROM corpus
      ORDER BY id""")
    })

  /** q181 — cascading subject erasure audit ([[graft.operators
    * .Erasure.audit]]): a deterministic ~2% md5-bucket of customers
    * is the erasure batch; the audit reports, per table, the purge
    * the right-to-be-forgotten sweep would execute — customers
    * directly, orders via the customer key, line items TRANSITIVELY
    * via erased orders — with a purged-key checksum (coverage
    * provable without retaining subject data) and the surviving row
    * count. Scale shape: the erased-key set is selectivity-bounded
    * and broadcast; each leg is one semi/anti join on the fact scan,
    * the grandchild hop re-broadcasts the purged order keys — never
    * a three-way join. */
  val q181 = Qry(
    "q181_erasure_cascade",
    (s: SparkSession, d: String) => {
      import graft.operators.{Erasure, Splits}
      val cust = Tables.customer(s, d)
      val erased = cust
        .filter(Splits.hashBucket(col("c_custkey")) < 2)
        .select(col("c_custkey"))
      val li = Tables.lineitem(s, d).withColumn("__lk",
        col("l_orderkey") * 10 + col("l_linenumber"))
      Erasure.audit(cust, "c_custkey", erased,
          Tables.orders(s, d), "o_custkey", "o_orderkey",
          li, "l_orderkey", "__lk")
        .select(col("table").as("tbl"), col("n_purged"),
          col("purged_key_sum"), col("n_retained"))
        .orderBy(col("tbl"))
    },
    Some(s"""
      WITH erased AS (
        SELECT c_custkey FROM customer
        WHERE ${Q.bucketSql("c_custkey")} < 2),
      eo AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM erased)),
      s_p AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS np,
               CAST(COALESCE(SUM(c_custkey), 0) AS BIGINT) AS ks
        FROM customer
        WHERE c_custkey IN (SELECT c_custkey FROM erased)),
      s_r AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM erased)),
      c_p AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS np,
               CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) AS ks
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM erased)),
      c_r AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM erased)),
      g_p AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS np,
               CAST(COALESCE(SUM(l_orderkey * 10 + l_linenumber), 0)
                 AS BIGINT) AS ks
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM eo)),
      g_r AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM eo))
      SELECT 'child' AS tbl, c_p.np AS n_purged,
             c_p.ks AS purged_key_sum, c_r.nr AS n_retained
      FROM c_p, c_r
      UNION ALL
      SELECT 'grand', g_p.np, g_p.ks, g_r.nr FROM g_p, g_r
      UNION ALL
      SELECT 'subjects', s_p.np, s_p.ks, s_r.nr FROM s_p, s_r
      ORDER BY tbl"""))

  /** q185 — k-anonymity generalization ladder ([[graft.operators
    * .Anonymize.generalizationLevels]], k=8): level-1 classes are the
    * fine quasi-identifier (nation, segment, 2000-wide balance band);
    * records in classes under k generalize to (region, segment);
    * classes still under k are suppressed. The digest publishes each
    * surviving class with its size and exact-decimal mean balance,
    * plus one suppressed-total row — levels keyed by sentinel g-cols
    * so the whole release is a single relation. The oracle replays
    * both window counts and the level CASE. */
  val q185 = Qry(
    "q185_k_anonymity",
    (s: SparkSession, d: String) => {
      import graft.operators.Anonymize
      val cust = Tables.customer(s, d)
      val nat = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))
      val recs = cust.join(broadcast(nat),
          col("c_nationkey") === col("n_nationkey"))
        .withColumn("band",
          floor(col("c_acctbal") / 2000d).cast("long"))
      val lev = Anonymize.generalizationLevels(recs,
        Seq(col("c_nationkey"), col("c_mktsegment"), col("band")),
        Seq(col("n_regionkey"), col("c_mktsegment")), k = 8)
      lev
        .withColumn("g1",
          when(col("anon_level") === 1, col("c_nationkey").cast("long"))
            .when(col("anon_level") === 2,
              col("n_regionkey").cast("long"))
            .otherwise(lit(-1L)))
        .withColumn("g2",
          when(col("anon_level") === 9, lit("*"))
            .otherwise(col("c_mktsegment")))
        .withColumn("g3",
          when(col("anon_level") === 1, col("band"))
            .otherwise(lit(-1L)))
        .groupBy(col("anon_level").as("level"), col("g1"), col("g2"),
          col("g3"))
        .agg(count(lit(1)).as("n"),
          Q.davg(col("c_acctbal"), 2).as("avg_bal"))
        .orderBy(col("level"), col("g1"), col("g2"), col("g3"))
    },
    Some(s"""
      WITH recs AS (
        SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
               n_regionkey,
               CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS band
        FROM customer JOIN nation ON c_nationkey = n_nationkey),
      lev0 AS (
        SELECT *,
               COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment,
                 band) AS c1
        FROM recs),
      lev1 AS (
        SELECT *,
               SUM(CASE WHEN c1 < 8 THEN 1 ELSE 0 END) OVER (
                 PARTITION BY n_regionkey, c_mktsegment) AS c2
        FROM lev0),
      lev AS (
        SELECT *,
               CASE WHEN c1 >= 8 THEN 1
                    WHEN c2 >= 8 THEN 2
                    ELSE 9 END AS level
        FROM lev1),
      keyed AS (
        SELECT level,
               CASE WHEN level = 1 THEN CAST(c_nationkey AS BIGINT)
                    WHEN level = 2 THEN CAST(n_regionkey AS BIGINT)
                    ELSE -1 END AS g1,
               CASE WHEN level = 9 THEN '*'
                    ELSE c_mktsegment END AS g2,
               CASE WHEN level = 1 THEN band ELSE -1 END AS g3,
               c_acctbal
        FROM lev)
      SELECT level, g1, g2, g3, COUNT(*) AS n,
             ${Q.davgSql("c_acctbal", 2)} AS avg_bal
      FROM keyed GROUP BY 1, 2, 3, 4
      ORDER BY level, g1, g2, g3"""))

  /** q205 — l-diversity audit ([[graft.operators.Anonymize
    * .lDiversity]], k=4, l=3): k-anonymity's homogeneity-attack fix —
    * a quasi-identifier class is publishable only when it ALSO spans
    * ≥ l distinct sensitive values (here the market segment). The QI
    * is a synthetic postcode (md5-derived 16-bit bucket of the
    * customer key, the q168 coordinate trick) whose DOMAIN scales
    * with the table (count div 5 classes, expected class size ~5), so
    * the publishable / homogeneous / too-small mix stays populated at
    * every SF instead of saturating. The digest groups the release by
    * (publishable, diversity) with class/record counts and the
    * exact-decimal mean balance.
    *
    * Scale shape: one QI-keyed window (state bounded by the sensitive
    * DOMAIN, not class size) + one digest aggregation; the domain
    * scalar is a broadcast 1-row count. */
  val q205 = Qry(
    "q205_l_diversity",
    (s: SparkSession, d: String) => {
      import graft.operators.Anonymize
      val nCls = Tables.customer(s, d)
        .agg(expr("GREATEST(CAST(1 AS BIGINT), COUNT(1) DIV 5)")
          .as("n_cls"))
      val recs = Tables.customer(s, d)
        .crossJoin(broadcast(nCls))
        .withColumn("zip",
          conv(substring(md5(col("c_custkey").cast("string")), 1, 4),
            16, 10).cast("long") % col("n_cls"))
      Anonymize.lDiversity(recs, Seq(col("zip")),
          col("c_mktsegment"), k = 4, l = 3)
        .groupBy(col("anon_ok"), col("anon_div"))
        .agg(countDistinct(col("zip")).as("n_classes"),
          count(lit(1)).as("n_records"),
          Q.davg(col("c_acctbal"), 2).as("avg_bal"))
        .orderBy(col("anon_ok"), col("anon_div"))
    },
    Some(s"""
      WITH dom AS (
        SELECT GREATEST(1, COUNT(*) // 5) AS n_cls FROM customer),
      r AS (
        SELECT c_custkey, c_acctbal, c_mktsegment,
               ${Q.md5Hex16Sql("c_custkey", 1)}
                 % (SELECT n_cls FROM dom) AS zip
        FROM customer),
      cls AS (
        SELECT zip, CAST(COUNT(*) AS BIGINT) AS an,
               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS adiv
        FROM r GROUP BY 1),
      ann AS (
        SELECT r.*, cls.an, cls.adiv,
               (cls.an >= 4 AND cls.adiv >= 3) AS aok
        FROM r JOIN cls USING (zip))
      SELECT aok AS anon_ok, adiv AS anon_div,
             CAST(COUNT(DISTINCT zip) AS BIGINT) AS n_classes,
             CAST(COUNT(*) AS BIGINT) AS n_records,
             ${Q.davgSql("c_acctbal", 2)} AS avg_bal
      FROM ann GROUP BY 1, 2 ORDER BY anon_ok, anon_div"""))

  /** q206 — randomized-response telemetry ([[graft.operators
    * .Anonymize.rrReported]], flip rate 1/4): the per-record
    * plausible-deniability mechanism (Warner 1965; the RAPPOR
    * 1-bit core) with its integer debias. Each event reports a
    * possibly-flipped "was this a click" bit; per day the aggregate
    * recovers 2·truth as est2 = 4·reported − n, graded against the
    * true count with a deterministic ~4σ band
    * (7·⌊√n⌋ + 7 in ×2 units; measured worst-case 0.62 of the band
    * at sf0.001/0.01/0.1). The derandomized md5 coin is what makes
    * the release oracle-replayable; production draws real client
    * coins and keeps the identical aggregate algebra.
    *
    * Scale shape: the flip and report are map-side projections; one
    * day-keyed partial-agg exchange; no raw bit survives the mapper
    * at any scale. */
  val q206 = Qry(
    "q206_randomized_response",
    (s: SparkSession, d: String) => {
      import graft.operators.Anonymize
      val isClick = col("event_type") === "click"
      val ev = Tables.events(s, d).select(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        isClick.cast("int").as("truth"),
        Anonymize.rrReported(isClick, col("event_id")).as("rep"))
      ev.groupBy(col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("truth")).as("true_clicks"),
          sum(col("rep")).as("reported"))
        .withColumn("est2", lit(4L) * col("reported") - col("n"))
        .withColumn("ok",
          abs(col("est2") - lit(2L) * col("true_clicks")) <=
            lit(7L) * floor(sqrt(col("n").cast("double"))).cast("long")
              + lit(7L))
        .orderBy(col("day"))
    },
    Some(s"""
      WITH r AS (
        SELECT STRFTIME(date_trunc('day', CAST(ts AS TIMESTAMP)),
                 '%Y-%m-%d') AS day,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                 AS truth,
               CASE WHEN (${Q.md5Hex32Sql("event_id", 1)}) % 4 = 0
                 THEN 1 ELSE 0 END AS flip
        FROM events),
      g AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(truth) AS BIGINT) AS true_clicks,
               CAST(SUM(CASE WHEN flip = 1 THEN 1 - truth
                             ELSE truth END) AS BIGINT) AS reported
        FROM r GROUP BY 1)
      SELECT day, n, true_clicks, reported,
             4 * reported - n AS est2,
             (ABS((4 * reported - n) - 2 * true_clicks) <=
              7 * CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) + 7)
               AS ok
      FROM g ORDER BY day"""))

  /** q211 — t-closeness audit ([[graft.operators.Anonymize
    * .tClosenessOrdered]], t = 1/5): the skewness-attack fix over
    * q205's l-diversity — a class whose account-balance distribution
    * sits far from the table-wide distribution leaks even when it is
    * diverse, so publishability requires the ordered-domain Earth
    * Mover's Distance to the global histogram to stay ≤ t. Same
    * scaling QI fixture as q205 (md5 zip over a domain of count div 5
    * classes); the ordered sensitive attribute is the account balance
    * in 1000-unit buckets (m = 11 at every SF). All EMD algebra is
    * exact integers (Cᵢ = Σ(c_j·N − g_j·n), emd_num = Σ|Cᵢ|,
    * emd_den = (m−1)·n·N); the digest buckets classes by the
    * overflow-safe ppb ratio decile and hashes class/record counts
    * plus the exact min/max ppb per cell.
    *
    * Scale shape: two partial-agg exchanges + one class-keyed window
    * over classes×m rows; global histogram and totals broadcast
    * (bounded by the 11-bucket domain). */
  val q211 = Qry(
    "q211_t_closeness",
    (s: SparkSession, d: String) => {
      import graft.operators.{Anonymize, Drift}
      val nCls = Tables.customer(s, d)
        .agg(expr("GREATEST(CAST(1 AS BIGINT), COUNT(1) DIV 5)")
          .as("n_cls"))
      val recs = Tables.customer(s, d)
        .crossJoin(broadcast(nCls))
        .select(
          (conv(substring(md5(col("c_custkey").cast("string")), 1, 4),
            16, 10).cast("long") % col("n_cls")).as("zip"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_kb"))
      Anonymize.tClosenessOrdered(recs, Seq("zip"), "bal_kb",
          tNum = 1L, tDen = 5L)
        .withColumn("emd_ppb", Drift.mulDivPpb("emd_num", "emd_den"))
        .groupBy(col("anon_ok"),
          expr("emd_ppb DIV CAST(100000000 AS BIGINT)").as("decile"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("anon_n")).as("n_records"),
          min(col("emd_ppb")).as("min_ppb"),
          max(col("emd_ppb")).as("max_ppb"))
        .orderBy(col("anon_ok"), col("decile"))
    },
    Some(s"""
      WITH dom AS (
        SELECT GREATEST(1, COUNT(*) // 5) AS n_cls FROM customer),
      r AS (
        SELECT ${Q.md5Hex16Sql("c_custkey", 1)}
                 % (SELECT n_cls FROM dom) AS zip,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_kb
        FROM customer),
      g AS (
        SELECT bal_kb, CAST(COUNT(*) AS BIGINT) AS g_cnt
        FROM r GROUP BY 1),
      tot AS (
        SELECT CAST(SUM(g_cnt) AS BIGINT) AS big_n,
               CAST(COUNT(*) AS BIGINT) AS m FROM g),
      cls AS (
        SELECT zip, CAST(COUNT(*) AS BIGINT) AS n FROM r GROUP BY 1),
      cv AS (
        SELECT zip, bal_kb, CAST(COUNT(*) AS BIGINT) AS c_cnt
        FROM r GROUP BY 1, 2),
      fullg AS (
        SELECT cls.zip, cls.n, g.bal_kb, g.g_cnt,
               COALESCE(cv.c_cnt, 0) AS c_cnt, tot.big_n, tot.m
        FROM cls CROSS JOIN g CROSS JOIN tot
        LEFT JOIN cv ON cv.zip = cls.zip AND cv.bal_kb = g.bal_kb),
      cum AS (
        SELECT zip, n, big_n, m,
               SUM(c_cnt * big_n - g_cnt * n)
                 OVER (PARTITION BY zip ORDER BY bal_kb) AS c
        FROM fullg),
      emd AS (
        SELECT zip, n,
               CAST(SUM(ABS(c)) AS BIGINT) AS num,
               (m - 1) * n * big_n AS den
        FROM cum GROUP BY zip, n, m, big_n),
      scored AS (
        SELECT n, (num * 5 <= den * 1) AS anon_ok,
               ${graft.operators.Drift.mulDivPpbSql("num", "den")} AS ppb
        FROM emd)
      SELECT anon_ok, ppb // 100000000 AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(SUM(n) AS BIGINT) AS n_records,
             MIN(ppb) AS min_ppb, MAX(ppb) AS max_ppb
      FROM scored GROUP BY 1, 2 ORDER BY anon_ok, decile"""))

  val all: Seq[Qry] = Seq(q180, q181, q185, q205, q206, q211)
}
