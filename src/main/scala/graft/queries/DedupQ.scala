package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}
import graft.operators.Dedup
import Q._

/** Near-dup detection queries (SURVEY.md §2.B G13) over `documents`,
  * driving [[graft.operators.Dedup]]. The corpus is unioned with a
  * shifted copy of itself so genuine duplicates exist to find.
  * The SQL oracles re-derive MinHash/SimHash with the same md5-hex
  * scheme — generated from the same (n, k, bands) parameters so the
  * two engines can't drift.
  */
object DedupQ {

  private val N = 3       // shingle n-gram size
  private val K = 6       // minhash signature length
  private val BANDS = 3   // LSH bands (K/BANDS rows each)

  private[queries] val toksSql =
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

  /** DuckDB shingle set (distinct word n-grams). */
  private[queries] def shinglesSql(n: Int): String =
    s"""CASE WHEN len($toksSql) < $n THEN []::VARCHAR[]
        ELSE list_distinct(list_transform(
          range(0, len($toksSql) - $n + 1),
          i -> array_to_string(list_slice($toksSql, i + 1, i + $n), ' ')))
        END"""

  private[queries] def minhashSql(k: Int): String =
    "[" + (0 until k).map(s =>
      s"list_min(list_transform(shingles, g -> md5('$s#' || g)))")
      .mkString(", ") + "]"

  private[queries] def bandKeysSql(bands: Int, rows: Int): String =
    "[" + (0 until bands).map { j =>
      val parts = ("'" + j + "'") +: (1 to rows).map(r =>
        s"sig[${j * rows + r}]")
      s"md5(${parts.mkString(" || '|' || ")})"
    }.mkString(", ") + "]"

  private[queries] val jaccardSql =
    """CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
       ELSE len(list_intersect(sh_a, sh_b)) * 1.0
            / len(list_distinct(list_concat(sh_a, sh_b))) END"""

  /** MinHash-LSH near-dup pairs on the doubled corpus: every doc and
    * its shifted twin must surface with jaccard 1.0; band-collision
    * candidates are verified exactly. */
  val q28 = Qry(
    "q28_minhash_lsh",
    (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + 1000000L))
      Dedup.lshNearDupPairs(doubled, "doc_id", "text",
          n = N, k = K, bands = BANDS, minJaccard = 0.9)
        .orderBy(col("a"), col("b"))
    },
    Some(s"""
      WITH docs AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 100
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 100),
      sh AS (
        SELECT doc_id AS id, ${shinglesSql(N)} AS shingles FROM docs),
      sigs AS (
        SELECT id, shingles, ${minhashSql(K)} AS sig FROM sh),
      banded AS (
        SELECT id, shingles,
               unnest(${bandKeysSql(BANDS, K / BANDS)}) AS band_key
        FROM sigs),
      pairs AS (
        SELECT l.id AS a, r.id AS b,
               FIRST(l.shingles) AS sh_a, FIRST(r.shingles) AS sh_b
        FROM banded l JOIN banded r
          ON l.band_key = r.band_key
        WHERE l.id < r.id
        GROUP BY l.id, r.id)
      SELECT a, b, ROUND($jaccardSql, 6) AS jaccard
      FROM pairs
      WHERE ROUND($jaccardSql, 6) >= 0.9
      ORDER BY a, b"""))

  /** Per-doc 16-bit SimHash (G13): identical docs collide; the
    * doubled corpus groups by hash and reports collision sizes. */
  val q29 = Qry(
    "q29_simhash",
    (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
      docs.select(col("doc_id"),
          Dedup.simhash16(col("text")).as("simhash"))
        .groupBy(col("simhash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("simhash"))
    }, {
      val bitSql = (0 until 16).map { b =>
        val weight = s"""list_reduce(list_prepend(0,
          list_transform($toksSql, t ->
            ((strpos('0123456789abcdef',
                substr(md5(t), ${b / 4 + 1}, 1)) - 1 >> ${b % 4}) & 1)
              * 2 - 1)), (a, x) -> a + x)"""
        s"CASE WHEN $weight > 0 THEN ${1 << b} ELSE 0 END"
      }.mkString(" + ")
      Some(s"""
      WITH h AS (
        SELECT doc_id, $bitSql AS simhash
        FROM documents WHERE doc_id < 200)
      SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc,
             MAX(doc_id) AS max_doc
      FROM h GROUP BY simhash ORDER BY simhash""")
    })

  /** Brute-force n-gram Jaccard over a bounded subset — the exact
    * quadratic baseline that q28's LSH approximates (kept small on
    * purpose; the scaladoc on [[Dedup.shingleJaccard]] spells out why
    * this shape must never run at corpus scale). */
  val q30 = Qry(
    "q30_ngram_jaccard",
    (s: SparkSession, d: String) =>
      Dedup.shingleJaccard(
          Tables.documents(s, d).filter(col("doc_id") < 60),
          "doc_id", "text", n = 2, minJaccard = 0.05)
        .orderBy(col("a"), col("b")),
    Some(s"""
      WITH sh AS (
        SELECT doc_id AS id, ${shinglesSql(2)} AS shingles
        FROM documents WHERE doc_id < 60),
      pairs AS (
        SELECT l.id AS a, r.id AS b, l.shingles AS sh_a,
               r.shingles AS sh_b
        FROM sh l CROSS JOIN sh r WHERE l.id < r.id)
      SELECT a, b, ROUND($jaccardSql, 6) AS jaccard
      FROM pairs WHERE ROUND($jaccardSql, 6) >= 0.05
      ORDER BY a, b"""))

  /** Incremental dedup against a historical index (q112): a fresh
    * batch (new crawl) is admitted only if it survives (1) an exact
    * content-hash anti-join against the index and (2) a cross-corpus
    * LSH near-dup pass ([[Dedup.lshNearDupPairsAcross]]) — batch
    * pairs with index only, never batch-with-batch (same-day dups
    * are q57's corpus-internal job). The fixture manufactures both
    * drop reasons: verbatim index copies (→ exact_dup) and
    * one-token-padded index copies (→ near_dup) alongside genuinely
    * fresh docs (→ kept). Emits the per-doc admission verdict.
    *
    * Scale shape: the exact pass shuffles 16-byte hashes, not text;
    * the LSH pass joins the batch's band keys against the index's
    * PRECOMPUTABLE banded projection. Nothing scans index text
    * except the bounded candidate verification. */
  val q112 = Qry(
    "q112_incremental_dedup",
    (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val index = docs.filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val batch = docs
        .filter(col("doc_id") >= 200 && col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") < 30).select(
          (col("doc_id") + 5000L).as("doc_id"),
          concat(col("text"), lit(" zz9")).as("text")))
        .unionByName(docs.filter(col("doc_id") < 20).select(
          (col("doc_id") + 6000L).as("doc_id"), col("text")))
      val idxHash = index.select(md5(col("text")).as("h")).distinct()
      val flagged = batch
        .join(idxHash, md5(col("text")) === col("h"), "left")
        .withColumn("is_exact", col("h").isNotNull)
        .drop("h")
      val nearIds = Dedup.lshNearDupPairsAcross(
          flagged.filter(!col("is_exact")), index,
          "doc_id", "text", n = N, k = K, bands = BANDS,
          minJaccard = 0.90)
        .select(col("a").as("doc_id")).distinct()
        .withColumn("is_near", lit(true))
      flagged.join(nearIds, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("is_exact"), lit("exact_dup"))
            .when(col("is_near"), lit("near_dup"))
            .otherwise(lit("kept")).as("status"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH idx AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 200),
      batch AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id >= 200 AND doc_id < 300
        UNION ALL
        SELECT doc_id + 5000, text || ' zz9'
        FROM documents WHERE doc_id < 30
        UNION ALL
        SELECT doc_id + 6000, text
        FROM documents WHERE doc_id < 20),
      idxh AS (SELECT DISTINCT md5(text) AS h FROM idx),
      flagged AS (
        SELECT b.doc_id, b.text, (h IS NOT NULL) AS is_exact
        FROM batch b LEFT JOIN idxh ON md5(b.text) = h),
      bsh AS (
        SELECT doc_id AS id, ${shinglesSql(N)} AS shingles
        FROM (SELECT doc_id, text FROM flagged WHERE NOT is_exact)),
      bsh2 AS (SELECT id, shingles FROM bsh WHERE len(shingles) > 0),
      bsig AS (
        SELECT id, shingles, ${minhashSql(K)} AS sig FROM bsh2),
      bband AS (
        SELECT id, shingles,
               unnest(${bandKeysSql(BANDS, K / BANDS)}) AS band_key
        FROM bsig),
      ish AS (
        SELECT doc_id AS id, ${shinglesSql(N)} AS shingles FROM idx),
      ish2 AS (SELECT id, shingles FROM ish WHERE len(shingles) > 0),
      isig AS (
        SELECT id, shingles, ${minhashSql(K)} AS sig FROM ish2),
      iband AS (
        SELECT id, shingles,
               unnest(${bandKeysSql(BANDS, K / BANDS)}) AS band_key
        FROM isig),
      cand AS (
        SELECT l.id AS a, r.id AS b,
               FIRST(l.shingles) AS sh_a, FIRST(r.shingles) AS sh_b
        FROM bband l JOIN iband r ON l.band_key = r.band_key
        GROUP BY l.id, r.id),
      nearm AS (
        SELECT DISTINCT a FROM cand
        WHERE ROUND($jaccardSql, 6) >= 0.90)
      SELECT f.doc_id,
             CASE WHEN is_exact THEN 'exact_dup'
                  WHEN a IS NOT NULL THEN 'near_dup'
                  ELSE 'kept' END AS status
      FROM flagged f LEFT JOIN nearm ON f.doc_id = nearm.a
      ORDER BY f.doc_id"""))

  /** Asymmetric containment dedup (q114): detects docs (nearly)
    * CONTAINED in a bigger doc — the boilerplate-wrapped copy /
    * superset case where Jaccard stays low (J = |A|/|B| for A ⊂ B)
    * and MinHash-LSH never fires. Containment C(A→B) =
    * |sh(A) ∩ sh(B)| / |sh(A)| is 1.0 for the planted originals
    * inside their padded copies while their Jaccard sits ≤ ~0.72 —
    * the emitted (containment, jaccard) pair shows exactly the gap.
    *
    * Candidate generation is DF-PREFIX FILTERING, not banding: each
    * doc nominates its 2 rarest shingles (document frequency
    * ascending, computed in the same single-scan window as q81);
    * candidates are (doc, other) pairs sharing a nominated-rare
    * shingle, found by joining the 2-per-doc prefix against the
    * full posting list (the q102 shuffle shape). Fan-out per
    * candidate-generating shingle = its df, which is small BY
    * CONSTRUCTION — common shingles never make a prefix. The
    * shared pad across all padded copies is deliberately high-df,
    * proving the filter routes around it.
    *
    * Scale shape: one (shingle, doc) shuffle for df + postings, a
    * prefix-to-postings equi-join bounded by rare-df fan-out, exact
    * verification only on surviving candidate pairs. */
  val q114 = Qry(
    "q114_containment_dedup",
    (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val padTokens = (0 until 40).map(i => s"x$i").mkString(" ")
      val docs0 = Tables.documents(s, d).filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
      val corpus = docs0.unionByName(docs0.select(
        (col("doc_id") + 3000L).as("doc_id"),
        concat(col("text"), lit(" " + padTokens)).as("text")))
      val sh = corpus.select(col("doc_id").as("id"),
          Dedup.shingleSet(col("text"), N).as("shingles"))
        .filter(size(col("shingles")) > 0)
      val posting = sh.select(col("id"),
        explode(col("shingles")).as("g"))
      val withDf = posting.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("g"))))
      val prefix = withDf.withColumn("rn",
          row_number().over(Window.partitionBy(col("id"))
            .orderBy(col("df"), col("g"))))
        .filter(col("rn") <= 2)
        .select(col("id").as("a"), col("g"))
      val cand = prefix
        .join(posting.select(col("id").as("b"), col("g")), Seq("g"))
        .filter(col("a") =!= col("b"))
        .select(col("a"), col("b")).distinct()
      cand
        .join(sh.select(col("id").as("a"), col("shingles").as("sh_a")),
          Seq("a"))
        .join(sh.select(col("id").as("b"), col("shingles").as("sh_b")),
          Seq("b"))
        .select(col("a"), col("b"),
          round(size(array_intersect(col("sh_a"), col("sh_b")))
            / size(col("sh_a")), 6).as("containment"),
          round(Dedup.setJaccard(col("sh_a"), col("sh_b")), 6)
            .as("jaccard"))
        .filter(col("containment") >= 0.9)
        .orderBy(col("a"), col("b"))
    }, {
      val padTokens = (0 until 40).map(i => s"x$i").mkString(" ")
      Some(s"""
      WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 60
        UNION ALL
        SELECT doc_id + 3000, text || ' $padTokens'
        FROM documents WHERE doc_id < 60),
      sh AS (
        SELECT doc_id AS id, ${shinglesSql(N)} AS shingles
        FROM corpus),
      sh2 AS (SELECT id, shingles FROM sh WHERE len(shingles) > 0),
      posting AS (
        SELECT id, unnest(shingles) AS g FROM sh2),
      with_df AS (
        SELECT id, g, COUNT(*) OVER (PARTITION BY g) AS df
        FROM posting),
      prefix AS (
        SELECT id AS a, g FROM (
          SELECT id, g,
                 ROW_NUMBER() OVER (PARTITION BY id
                   ORDER BY df, g) AS rn
          FROM with_df)
        WHERE rn <= 2),
      cand AS (
        SELECT DISTINCT a, p.id AS b
        FROM prefix JOIN posting p USING (g)
        WHERE a <> p.id),
      verified AS (
        SELECT a, b,
               ROUND(len(list_intersect(sa.shingles, sb.shingles))
                 / len(sa.shingles), 6) AS containment,
               ROUND(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                 / len(list_distinct(list_concat(sa.shingles,
                     sb.shingles))), 6) AS jaccard
        FROM cand
        JOIN sh2 sa ON sa.id = a
        JOIN sh2 sb ON sb.id = b)
      SELECT a, b, containment, jaccard FROM verified
      WHERE containment >= 0.9
      ORDER BY a, b""")
    })

  /** LSH recall S-curve (q157) — the dedup pipeline measured against
    * its own exact baseline: a perturbed-twin corpus (each doc joined
    * by a copy with its first 1-8 leading tokens replaced by junk, so
    * true pair similarity SPREADS across the Jaccard range instead of
    * pinning at 1.0), exact all-pairs 2-gram Jaccard as ground truth
    * on the bounded subset, and the q28 banding (k=6, 3 bands of 2)
    * as the candidate generator. Reports, per Jaccard decile, how
    * many true pairs exist and how many the bands surfaced — the
    * empirical 1-(1-j²)³ S-curve every bands/rows tuning decision
    * reads. Low deciles MUST show recall ≪ 1 (that is the curve
    * working, not a bug); the dedup threshold lives on the high
    * shoulder.
    *
    * Scale shape: the exact leg is the deliberately-bounded q30
    * quadratic baseline (ground truth needs all pairs by
    * definition); the candidate leg is the production band join. */
  val q157 = Qry(
    "q157_lsh_recall_curve",
    (s: SparkSession, d: String) => {
      val base = Tables.documents(s, d).filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
      val toksB = graft.operators.TextOps.tokens(col("text"))
      // src_id rename before the +1000000 alias: BOTH engines'
      // lateral-column-alias resolution would otherwise bind the
      // junk-name doc_id to the new alias and diverge the minhashes
      val m = col("src_id") % 8
      val twin = base.select(col("doc_id").as("src_id"), col("text"))
        .select(
          (col("src_id") + lit(1000000L)).as("doc_id"),
          concat_ws(" ",
            concat_ws(" ", transform(
              sequence(lit(1), (m + lit(1)).cast("int")),
              i => concat(lit("j"), col("src_id").cast("string"),
                lit("_"), i.cast("string")))),
            concat_ws(" ",
              slice(toksB, (m + lit(2)).cast("int"), size(toksB))))
            .as("text"))
      val corpus = base.unionByName(twin)
      val sh = corpus.select(col("doc_id").as("id"),
          Dedup.shingleSet(col("text"), 2).as("shingles"))
        .filter(size(col("shingles")) > 0)
      val truth = sh.select(col("id").as("a"), col("shingles").as("sh_a"))
        .crossJoin(
          sh.select(col("id").as("b"), col("shingles").as("sh_b")))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          round(Dedup.setJaccard(col("sh_a"), col("sh_b")), 6).as("j"))
        .filter(col("j") >= 0.05)
      val banded = sh.select(col("id"),
        explode(Dedup.bandKeys(
          Dedup.minhashSignature(col("shingles"), K), BANDS, K / BANDS))
          .as("band_key"))
      val cand = banded.as("l").join(banded.as("r"), Seq("band_key"))
        .select(col("l.id").as("a"), col("r.id").as("b"))
        .filter(col("a") < col("b")).distinct()
        .withColumn("is_cand", lit(1L))
      truth.join(cand, Seq("a", "b"), "left")
        .withColumn("bucket",
          least(floor(col("j") * 10), lit(9L)).cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(coalesce(col("is_cand"), lit(0L))).as("n_candidates"))
        .select(col("bucket"), col("n_pairs"), col("n_candidates"),
          r6(col("n_candidates").cast("double") / col("n_pairs"))
            .as("recall"))
        .orderBy(col("bucket"))
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 60),
      twin AS (
        -- src_id avoids DuckDB's lateral alias resolution: a bare
        -- doc_id here would bind to the +1000000 alias and diverge
        -- the junk-token names (and thus the minhashes) cross-engine
        SELECT src_id + 1000000 AS doc_id,
               array_to_string(list_concat(
                 list_transform(range(1, (src_id % 8) + 2),
                   i -> 'j' || CAST(src_id AS VARCHAR) || '_' ||
                        CAST(i AS VARCHAR)),
                 list_slice($toksSql, (src_id % 8) + 2, len($toksSql))),
                 ' ') AS text
        FROM (SELECT doc_id AS src_id, text FROM base)),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL SELECT doc_id, text FROM twin),
      sh AS (
        SELECT doc_id AS id, ${shinglesSql(2)} AS shingles FROM corpus),
      shf AS (SELECT * FROM sh WHERE len(shingles) > 0),
      truth AS (
        SELECT l.id AS a, r.id AS b,
               ROUND(CASE
                 WHEN len(list_distinct(list_concat(l.shingles,
                     r.shingles))) = 0 THEN 0.0
                 ELSE len(list_intersect(l.shingles, r.shingles)) * 1.0
                   / len(list_distinct(list_concat(l.shingles,
                       r.shingles))) END, 6) AS j
        FROM shf l CROSS JOIN shf r WHERE l.id < r.id),
      trf AS (SELECT * FROM truth WHERE j >= 0.05),
      sigs AS (
        SELECT id, ${minhashSql(K)} AS sig FROM shf),
      banded AS (
        SELECT id, unnest(${bandKeysSql(BANDS, K / BANDS)}) AS band_key
        FROM sigs),
      cand AS (
        SELECT DISTINCT l.id AS a, r.id AS b
        FROM banded l JOIN banded r ON l.band_key = r.band_key
        WHERE l.id < r.id)
      SELECT LEAST(CAST(FLOOR(t.j * 10) AS INT), 9) AS bucket,
             COUNT(*) AS n_pairs,
             CAST(SUM(CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_candidates,
             ${r6Sql("SUM(CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END)" +
               " * 1.0 / COUNT(*)")} AS recall
      FROM trf t
      LEFT JOIN cand c ON c.a = t.a AND c.b = t.b
      GROUP BY 1 ORDER BY 1"""))

  /** q203 — prefix-filtered EXACT set-similarity join
    * ([[Dedup.prefixFilterPairs]], τ = 0.6, shingle n = 3): the
    * deterministic complement to q28's MinHash-LSH — same
    * near-dup-pair question, but exact-by-construction (no banding
    * probability, no recall curve; the guarantee IS no false
    * negatives). The oracle deliberately does NOT replay the prefix
    * filter: it computes ground truth by the full inverted-index
    * pair join, so a prefix-length or ordering bug that loses a pair
    * breaks rows_match — the filter's zero-false-negative claim is
    * verified, not assumed. All similarity math is integer ppm.
    *
    * Scale shape: see the operator — candidates ride rare-shingle
    * posting lists (df-asc prefixes), never all-pairs, never hot
    * boilerplate shingles.
    *
    * Terminal form (r14): the deterministic order comes from
    * `repartition(1) + sortWithinPartitions`, NOT a global
    * `orderBy` — for a write sink, orderBy's RangePartitioning
    * samples its UN-materialized child to pick bounds, which
    * re-executes the expensive join once more (measured: 33-37 s vs
    * 20-21.5 s at sf1, `ProbeSetSim`; the count() terminal hid it
    * because the optimizer drops a sort under count). A few-hundred-
    * row result needs one partition, not range bounds — the same
    * full ordering at none of the sampling cost. */
  val q203 = Qry(
    "q203_setsim_join",
    (s: SparkSession, d: String) =>
      Dedup.prefixFilterPairs(Tables.documents(s, d), "doc_id", "text",
          n = N, tauPpm = 600000L)
        .repartition(1).sortWithinPartitions(col("a"), col("b")),
    Some(s"""
      WITH sh AS (
        SELECT doc_id AS id, ${shinglesSql(N)} AS sh FROM documents),
      nz AS (
        SELECT id, sh, len(sh) AS n FROM sh WHERE len(sh) > 0),
      t AS (SELECT id, unnest(sh) AS g FROM nz),
      i AS (
        SELECT a.id AS a, b.id AS b, COUNT(*) AS inter
        FROM t a JOIN t b ON a.g = b.g AND a.id < b.id
        GROUP BY 1, 2),
      p AS (
        SELECT i.a, i.b, CAST(i.inter AS BIGINT) AS inter,
               CAST(na.n + nb.n - i.inter AS BIGINT) AS uni
        FROM i JOIN nz na ON na.id = i.a JOIN nz nb ON nb.id = i.b)
      SELECT a, b, inter, uni, (inter * 1000000) // uni AS jacc_ppm
      FROM p WHERE (inter * 1000000) // uni >= 600000
      ORDER BY a, b"""))

  val all: Seq[Qry] = Seq(q28, q29, q30, q112, q114, q157, q203)
}
