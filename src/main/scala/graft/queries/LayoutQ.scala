package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.{Frontier, ZOrder}

/** Physical-layout and dominance analytics: the Z-order clustering
  * key behind multi-dimensional data skipping, and the Pareto
  * frontier (skyline) operator.
  */
object LayoutQ {

  /** DuckDB rendering of [[ZOrder.spread16]] — the same shift/mask
    * ladder in plain integer SQL. */
  private def spreadSql(e: String): String = {
    val a = s"(($e) & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  private def mortonSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Z-order locality audit (q106): Morton-interleave two lineitem
    * key dimensions, bucket rows by the high 6 curve bits (64
    * contiguous key ranges), and measure each bucket's (x, y)
    * bounding box. Because fixing the top 3+3 interleaved bits pins
    * both coordinates to a 128-wide cell, every span comes back
    * ≤ 127 vs the 1023-wide global domain — the property that makes
    * a z-sorted file layout prunable on EITHER column from footer
    * min/max stats alone (a plain (x, y) sort gives y spans the full
    * domain). The write-time recipe is
    * `repartitionByRange(z).sortWithinPartitions(z)` → parquet
    * ([[ZOrder]] Scaladoc); this query verifies the curve arithmetic
    * and the locality bound cross-engine.
    *
    * Scale shape: the key is pure map-side bit arithmetic
    * (codegen'd); the audit is one groupBy on a 64-value key. */
  val q106 = Qry(
    "q106_zorder_layout",
    (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .select(
          (col("l_partkey").cast("long") % 1024).as("x"),
          (col("l_suppkey").cast("long") % 1024).as("y"))
        .withColumn("z",
          ZOrder.interleave16(col("x"), col("y")))
        .withColumn("zbucket", expr("z div 16384"))
        .groupBy(col("zbucket"))
        .agg(
          count(lit(1)).as("n"),
          (max(col("x")) - min(col("x"))).as("x_span"),
          (max(col("y")) - min(col("y"))).as("y_span"))
        .orderBy(col("zbucket"))
    },
    Some(s"""
      WITH pts AS (
        SELECT CAST(l_partkey AS BIGINT) % 1024 AS x,
               CAST(l_suppkey AS BIGINT) % 1024 AS y
        FROM lineitem),
      keyed AS (
        SELECT x, y, ${mortonSql("x", "y")} // 16384 AS zbucket
        FROM pts)
      SELECT zbucket, COUNT(*) AS n,
             MAX(x) - MIN(x) AS x_span,
             MAX(y) - MIN(y) AS y_span
      FROM keyed GROUP BY zbucket ORDER BY zbucket"""))

  /** Pareto frontier (q108): the parts no other part beats on both
    * price (lower) and size (higher) — [[Frontier.skyline]]'s
    * distributive two-phase plan (banded local frontiers, global
    * pass over the survivors only). The oracle computes the frontier
    * in one global pass; matching results proves the distributive
    * decomposition exact. */
  val q108 = Qry(
    "q108_skyline",
    (s: SparkSession, d: String) => {
      Frontier.skyline(
        Tables.part(s, d).select(
          col("p_retailprice").as("price"),
          col("p_size").cast("long").as("size")),
        "price", "size", "floor(price / 10.0)")
        .orderBy(col("price"))
    },
    Some("""
      WITH pp AS (
        SELECT p_retailprice AS price,
               CAST(MAX(p_size) AS BIGINT) AS size
        FROM part GROUP BY 1),
      f AS (
        SELECT price, size,
               MAX(size) OVER (ORDER BY price
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS pmax
        FROM pp)
      SELECT price, size FROM f
      WHERE pmax IS NULL OR size > pmax
      ORDER BY price"""))

  /** 3-D Pareto skyline (q125): parts no other part beats on price
    * (lower), size (higher) AND a third deterministic metric
    * (higher) — [[Frontier.skyline3]]'s band-partitioned dominance
    * plan, closing the d>2 contract the 2-D operator documents. The
    * oracle is the textbook NOT EXISTS dominance query over the
    * pre-reduced candidates; matching proves the banded two-phase
    * decomposition exact in three dimensions, including
    * incomparable-tie survival. */
  val q125 = Qry(
    "q125_skyline3d",
    (s: SparkSession, d: String) => {
      Frontier.skyline3(
        Tables.part(s, d).select(
          col("p_retailprice").as("price"),
          col("p_size").cast("long").as("size"),
          (col("p_partkey") % 97).cast("long").as("dur")),
        "price", "size", "dur", "floor(price / 10.0)")
        .orderBy(col("price"), col("size"))
    },
    Some("""
      WITH dims AS (
        SELECT p_retailprice AS price,
               CAST(p_size AS BIGINT) AS size,
               CAST(p_partkey % 97 AS BIGINT) AS dur
        FROM part),
      pp AS (
        SELECT price, size, MAX(dur) AS dur
        FROM dims GROUP BY price, size)
      SELECT price, size, dur FROM pp p
      WHERE NOT EXISTS (
        SELECT 1 FROM pp q
        WHERE q.price <= p.price AND q.size >= p.size
          AND q.dur >= p.dur
          AND (q.price < p.price OR q.size > p.size OR q.dur > p.dur))
      ORDER BY price, size"""))

  /** Grid-bucketed geo proximity join (q116): vehicle-position-shaped
    * points (the q39 synthetic coordinate scheme: Wellington-area
    * lat/lon derived from event values) paired within 100 m. The
    * spatial-join staple: assign each point a grid cell sized ≥ the
    * radius, explode the LEFT side into its 3×3 cell neighborhood,
    * equi-join on the cell key (each qualifying pair matches on
    * EXACTLY one offset — no dedup needed), then verify the exact
    * distance only on cell-collided candidates. Distance is the
    * equirectangular approximation (dx·K_LON, dy·K_LAT with the
    * documented cos≈0.75 mid-latitude constant) — pure multiply/add,
    * bit-identical across engines, valid at city scale where a
    * proximity join makes sense.
    *
    * Scale shape: candidates come from an equi-join with bounded 9×
    * key fan-out — never a cross join; at 100 TB the cell key is
    * also the natural partition/bucket column for the point table. */
  val q116 = Qry(
    "q116_geo_grid_join",
    (s: SparkSession, d: String) => {
      val kLat = 111320.0   // meters per degree latitude
      val kLon = 83490.0    // 111320 * 0.75 (cos of mid-latitude)
      val pts = Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(col("event_id").as("id"),
          round(lit(-41d) - col("value") / 1000d, 6).as("lat"),
          round(lit(174d) + col("value") / 1000d, 6).as("lon"))
        .withColumn("cx", floor(col("lon") / 0.0015).cast("long"))
        .withColumn("cy", floor(col("lat") / 0.001).cast("long"))
      val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
        struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
      val left = pts.select(col("id").as("a"), col("lat").as("lat_a"),
          col("lon").as("lon_a"), col("cx"), col("cy"),
          explode(offsets).as("o"))
        .select(col("a"), col("lat_a"), col("lon_a"),
          (col("cx") + col("o.dx")).as("jx"),
          (col("cy") + col("o.dy")).as("jy"))
      val right = pts.select(col("id").as("b"), col("lat").as("lat_b"),
        col("lon").as("lon_b"), col("cx").as("jx"), col("cy").as("jy"))
      left.join(right, Seq("jx", "jy"))
        .filter(col("a") < col("b"))
        .withColumn("d2",
          ((col("lon_b") - col("lon_a")) * kLon) *
            ((col("lon_b") - col("lon_a")) * kLon) +
          ((col("lat_b") - col("lat_a")) * kLat) *
            ((col("lat_b") - col("lat_a")) * kLat))
        .filter(col("d2") <= lit(10000.0))
        .select(col("a"), col("b"), Q.r6(sqrt(col("d2"))).as("dist_m"))
        .orderBy(col("a"), col("b"))
    },
    Some(s"""
      WITH pts AS (
        SELECT event_id AS id,
               ROUND(-41 - value / 1000, 6) AS lat,
               ROUND(174 + value / 1000, 6) AS lon
        FROM events WHERE event_id < 2000),
      p AS (
        SELECT id, lat, lon,
               CAST(FLOOR(lon / 0.0015) AS BIGINT) AS cx,
               CAST(FLOOR(lat / 0.001) AS BIGINT) AS cy
        FROM pts),
      lhs AS (
        SELECT id AS a, lat AS lat_a, lon AS lon_a,
               cx + dx.x AS jx, cy + dy.y AS jy
        FROM p,
             (SELECT unnest([-1, 0, 1]) AS x) dx,
             (SELECT unnest([-1, 0, 1]) AS y) dy),
      cand AS (
        SELECT a, lat_a, lon_a, r.id AS b, r.lat AS lat_b,
               r.lon AS lon_b
        FROM lhs JOIN p r ON lhs.jx = r.cx AND lhs.jy = r.cy
        WHERE a < r.id),
      verified AS (
        SELECT a, b,
               ((lon_b - lon_a) * 83490.0) * ((lon_b - lon_a) * 83490.0)
             + ((lat_b - lat_a) * 111320.0) * ((lat_b - lat_a) * 111320.0)
               AS d2
        FROM cand)
      SELECT a, b, ${Q.r6Sql("sqrt(d2)")} AS dist_m
      FROM verified WHERE d2 <= 10000.0
      ORDER BY a, b"""))

  /** DuckDB rendering of [[ZOrder.spreadBits]] at dims=3: explicit
    * per-bit shift/or, same arithmetic as the Spark expression. */
  private def spread3Sql(e: String, bits: Int): String =
    (0 until bits).map(i => s"(((($e) >> $i) & 1) << ${3 * i})")
      .mkString("(", " | ", ")")

  private def morton3Sql(x: String, y: String, w: String): String =
    s"(${spread3Sql(x, 10)} | (${spread3Sql(y, 10)} << 1) " +
      s"| (${spread3Sql(w, 10)} << 2))"

  /** 3-D Z-order locality audit (q132) — the q106 contract one
    * dimension up, closing the d>2 generalization the 2-D operator
    * documented (mirroring how q125 generalized the skyline).
    * Three 10-bit lineitem key dimensions interleave into a 30-bit
    * curve key; bucketing by the high 6 bits (64 contiguous curve
    * ranges) fixes the top 2 bits of EACH dimension, so every
    * bucket's (x, y, w) bounding box must span ≤ 255 per axis vs
    * the 1023-wide global domain — parquet footer min/max stats
    * prune on ANY of the three columns from a z-sorted layout.
    *
    * Scale shape: key is map-side bit arithmetic (codegen'd, no
    * exchange); the audit groupBy carries 64 keys. */
  val q132 = Qry(
    "q132_zorder3d",
    (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .select(
          (col("l_partkey").cast("long") % 1024).as("x"),
          (col("l_suppkey").cast("long") % 1024).as("y"),
          (col("l_orderkey").cast("long") % 1024).as("w"))
        .withColumn("z", ZOrder.interleave(
          Seq(col("x"), col("y"), col("w")), bits = 10))
        .withColumn("zbucket", expr("z div 16777216"))
        .groupBy(col("zbucket"))
        .agg(
          count(lit(1)).as("n"),
          (max(col("x")) - min(col("x"))).as("x_span"),
          (max(col("y")) - min(col("y"))).as("y_span"),
          (max(col("w")) - min(col("w"))).as("w_span"))
        .orderBy(col("zbucket"))
    },
    Some(s"""
      WITH pts AS (
        SELECT CAST(l_partkey AS BIGINT) % 1024 AS x,
               CAST(l_suppkey AS BIGINT) % 1024 AS y,
               CAST(l_orderkey AS BIGINT) % 1024 AS w
        FROM lineitem),
      keyed AS (
        SELECT x, y, w,
               ${morton3Sql("x", "y", "w")} // 16777216 AS zbucket
        FROM pts)
      SELECT zbucket, COUNT(*) AS n,
             MAX(x) - MIN(x) AS x_span,
             MAX(y) - MIN(y) AS y_span,
             MAX(w) - MIN(w) AS w_span
      FROM keyed GROUP BY zbucket ORDER BY zbucket"""))

  /** q141 — Hilbert-curve locality audit (the q106 audit on the
    * native [[graft.functions.Hilbert2D]] kernel): index lineitem
    * (partkey, suppkey) mod 1024 on the 10-bit Hilbert curve, bucket
    * by the high 6 index bits (64 contiguous key ranges), measure
    * each bucket's (x, y) bounding box. Every span comes back ≤ 127
    * vs the 1023 domain — Morton's bound — AND consecutive buckets
    * are edge-adjacent cells (the Hilbert upgrade; `HilbertSpec`
    * proves point-level adjacency exhaustively). The DuckDB oracle
    * replays the convert-and-rotate loop as a RECURSIVE CTE over the
    * 10 bit levels — the full curve arithmetic re-derived, not
    * trusted.
    *
    * Scale shape: the key is one codegen'd per-row loop (no
    * exchange); the audit groupBy carries 64 keys. */
  val q141 = Qry(
    "q141_hilbert_layout",
    (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .select(
          (col("l_partkey").cast("long") % 1024).as("x"),
          (col("l_suppkey").cast("long") % 1024).as("y"))
        .withColumn("h", ZOrder.hilbert2d(col("x"), col("y"), bits = 10))
        .withColumn("hbucket", expr("h div 16384"))
        .groupBy(col("hbucket"))
        .agg(
          count(lit(1)).as("n"),
          (max(col("x")) - min(col("x"))).as("x_span"),
          (max(col("y")) - min(col("y"))).as("y_span"))
        .orderBy(col("hbucket"))
    },
    Some("""
      WITH RECURSIVE pts AS (
        SELECT CAST(l_partkey AS BIGINT) % 1024 AS x,
               CAST(l_suppkey AS BIGINT) % 1024 AS y
        FROM lineitem),
      hil AS (
        SELECT x AS x0, y AS y0, x AS hx, y AS hy,
               CAST(0 AS BIGINT) AS hd, CAST(512 AS BIGINT) AS s
        FROM pts
        UNION ALL
        SELECT x0, y0,
               CASE WHEN (hy & s) = 0 THEN
                      CASE WHEN (hx & s) > 0 THEN 1023 - hy ELSE hy END
                    ELSE hx END,
               CASE WHEN (hy & s) = 0 THEN
                      CASE WHEN (hx & s) > 0 THEN 1023 - hx ELSE hx END
                    ELSE hy END,
               hd + s * s * xor(
                 CASE WHEN (hx & s) > 0 THEN 3 ELSE 0 END,
                 CASE WHEN (hy & s) > 0 THEN 1 ELSE 0 END),
               s // 2
        FROM hil WHERE s > 0),
      keyed AS (
        SELECT x0 AS x, y0 AS y, hd // 16384 AS hbucket
        FROM hil WHERE s = 0)
      SELECT hbucket, COUNT(*) AS n,
             MAX(x) - MIN(x) AS x_span,
             MAX(y) - MIN(y) AS y_span
      FROM keyed GROUP BY hbucket ORDER BY hbucket"""))

  /** q150 — 3-D Hilbert locality audit ([[graft.functions.HilbertN]],
    * Skilling's transpose algorithm): the q132 Morton-3D audit on the
    * Hilbert key — (partkey, suppkey, orderkey) mod 1024 indexed on
    * the 10-bit 3-D curve, bucketed by the high 6 index bits (64
    * contiguous key ranges = two full curve levels), each bucket's
    * per-axis span measured. Every span comes back ≤ 255 (the
    * 2^(10-2) cell bound) on all THREE axes at once, with Hilbert's
    * no-seam-jump adjacency on top (`HilbertSpec` proves point-level
    * 3-D adjacency exhaustively). The DuckDB oracle re-derives the
    * full Skilling arithmetic: the top-down undo pass as a recursive
    * CTE over bit levels (the sequential axis sweep unrolled into
    * nested derived tables), then Gray decode, the parity-fix XOR
    * fold, and the bit interleave as generated closed-form columns —
    * the entire curve recomputed, not trusted.
    *
    * Scale shape: the key is one codegen'd per-row loop (no
    * exchange); the audit groupBy carries 64 keys. */
  val q150 = Qry(
    "q150_hilbert3d",
    (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .select(
          (col("l_partkey").cast("long") % 1024).as("x"),
          (col("l_suppkey").cast("long") % 1024).as("y"),
          (col("l_orderkey").cast("long") % 1024).as("w"))
        .withColumn("h", ZOrder.hilbertN(
          Seq(col("x"), col("y"), col("w")), bits = 10))
        .withColumn("hbucket", expr("h div 16777216"))
        .groupBy(col("hbucket"))
        .agg(
          count(lit(1)).as("n"),
          (max(col("x")) - min(col("x"))).as("x_span"),
          (max(col("y")) - min(col("y"))).as("y_span"),
          (max(col("w")) - min(col("w"))).as("w_span"))
        .orderBy(col("hbucket"))
    },
    Some {
      // Skilling pass 1 at one level s, axes swept IN ORDER with
      // x0 threaded through: nested derived tables build a0 (after
      // axis 0), then b0/b1 (after axis 1), then c0/c2 (after axis 2)
      val undoStep = """
        SELECT px, py, pw, c0 AS hx0, b1 AS hx1, c2 AS hx2, s // 2 AS s
        FROM (
          SELECT px, py, pw, b1, s,
                 CASE WHEN (hx2 & s) > 0 THEN xor(b0, s - 1)
                      ELSE xor(b0, xor(b0, hx2) & (s - 1)) END AS c0,
                 CASE WHEN (hx2 & s) > 0 THEN hx2
                      ELSE xor(hx2, xor(b0, hx2) & (s - 1)) END AS c2
          FROM (
            SELECT px, py, pw, hx2, s,
                   CASE WHEN (hx1 & s) > 0 THEN xor(a0, s - 1)
                        ELSE xor(a0, xor(a0, hx1) & (s - 1)) END AS b0,
                   CASE WHEN (hx1 & s) > 0 THEN hx1
                        ELSE xor(hx1, xor(a0, hx1) & (s - 1)) END AS b1
            FROM (
              SELECT px, py, pw, hx1, hx2, s,
                     CASE WHEN (hx0 & s) > 0 THEN xor(hx0, s - 1)
                          ELSE hx0 END AS a0
              FROM hil WHERE s > 1)))"""
      // pass 3: t = XOR over set bits j>=1 of gray-decoded axis 2
      val tExpr = (1 to 9).map(j =>
        s"CASE WHEN (g2 & ${1L << j}) > 0 THEN ${(1L << j) - 1} ELSE 0 END")
        .reduce((a, b) => s"xor($a, $b)")
      // pass 4: interleave — axis i's bit j lands at 3*j + (2 - i)
      val dExpr = (0 until 10).flatMap(j => Seq(
        s"((f0 >> $j) & 1) * ${1L << (3 * j + 2)}",
        s"((f1 >> $j) & 1) * ${1L << (3 * j + 1)}",
        s"((f2 >> $j) & 1) * ${1L << (3 * j)}")).mkString(" + ")
      s"""
      WITH RECURSIVE pts AS (
        SELECT CAST(l_partkey AS BIGINT) % 1024 AS x,
               CAST(l_suppkey AS BIGINT) % 1024 AS y,
               CAST(l_orderkey AS BIGINT) % 1024 AS w
        FROM lineitem),
      hil AS (
        SELECT x AS px, y AS py, w AS pw,
               x AS hx0, y AS hx1, w AS hx2,
               CAST(512 AS BIGINT) AS s
        FROM pts
        UNION ALL
        $undoStep),
      graycoded AS (
        SELECT px, py, pw, hx0,
               xor(hx1, hx0) AS g1,
               xor(hx2, xor(hx1, hx0)) AS g2
        FROM hil WHERE s = 1),
      fixed AS (
        SELECT px, py, pw,
               xor(hx0, t) AS f0, xor(g1, t) AS f1, xor(g2, t) AS f2
        FROM (SELECT *, $tExpr AS t FROM graycoded)),
      keyed AS (
        SELECT px AS x, py AS y, pw AS w,
               CAST($dExpr AS BIGINT) // 16777216 AS hbucket
        FROM fixed)
      SELECT hbucket, COUNT(*) AS n,
             MAX(x) - MIN(x) AS x_span,
             MAX(y) - MIN(y) AS y_span,
             MAX(w) - MIN(w) AS w_span
      FROM keyed GROUP BY hbucket ORDER BY hbucket"""
    })

  /** q217 — rendezvous (HRW) shard placement
    * ([[graft.operators.Splits.hrwAssign]]): assign every document a
    * shard under an 8-shard fleet AND under the same fleet with
    * shard 7 removed, and hash the FULL 8→7 transition matrix
    * (a8, a7, count, id-sum). The defining minimal-reshuffle
    * property is the matrix SHAPE: diagonal rows for shards 0-6
    * (survivors keep their argmax — removing a candidate can only
    * promote the runner-up of the REMOVED shard's rows) plus the
    * (7 → s) redistribution rows; any off-diagonal row with a8 ≠ 7
    * is a property violation and breaks rows_match loudly. Pure
    * map-side expression both sides — the 100 TB data-placement
    * primitive (no ring state, no coordination, engine-portable
    * md5). */
  val q217 = Qry(
    "q217_rendezvous_sharding",
    (s: SparkSession, d: String) => {
      import graft.operators.Splits
      Tables.documents(s, d).select(col("doc_id"))
        .withColumn("a8", Splits.hrwAssign(col("doc_id"), 8))
        .withColumn("a7", Splits.hrwAssign(col("doc_id"), 7))
        .groupBy(col("a8"), col("a7"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("a8"), col("a7"))
    },
    Some(s"""
      WITH a AS (
        SELECT doc_id,
               ${graft.operators.Splits.hrwAssignSql("doc_id", 8)}
                 AS a8,
               ${graft.operators.Splits.hrwAssignSql("doc_id", 7)}
                 AS a7
        FROM documents)
      SELECT a8, a7, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      FROM a GROUP BY 1, 2 ORDER BY a8, a7"""))

  val all: Seq[Qry] =
    Seq(q106, q108, q116, q125, q132, q141, q150, q217)
}
