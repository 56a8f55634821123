package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Qry, Tables}

/** Unicode-form canonicalization and corpus-scale language ID — the
  * two multilingual cleaning passes a pre-training scrub runs before
  * any hashing: byte-different canonically-equal spellings must
  * merge under exact dedup (q252), and every document gets a cheap
  * deterministic language call from per-language function-word
  * evidence (q253).
  */
object UnicodeQ {

  /** q252 — NFC canonicalization ahead of exact dedup
    * ([[graft.functions.UnicodeNormalize]], the codegen'd
    * `unicode_normalize` kernel): every document is planted with TWO
    * byte-different spellings of the same suffix — precomposed é
    * (U+00E9) and e + combining acute (U+0301) — then normalized to
    * NFC and exact-deduped on md5 of the normalized text. Without
    * the normalize pass each spelling is its own md5 group; with it,
    * every doc's two variants land in ONE group, which the hashed
    * group-size histogram proves (members ≥ 2 everywhere — planted
    * corpus dups merge further). Oracle: DuckDB `nfc_normalize`
    * replaying the identical plant → normalize → md5-group chain.
    *
    * Scale shape: the plant and the normalize are map-side (ASCII
    * fast path = one byte scan); the only shuffle is the exact-dedup
    * groupBy on the md5 key — the q27 shape, unchanged at 100 TB.
    */
  val q252 = Qry(
    "q252_unicode_dedup",
    (s: SparkSession, d: String) => {
      val variants = Tables.documents(s, d)
        .select(col("doc_id"), explode(array(
          concat(col("text"), lit(" caf\u00e9")),      // precomposed
          concat(col("text"), lit(" cafe\u0301"))))    // decomposed
          .as("vtext"))
      val norm = variants.select(col("doc_id"),
        call_function("unicode_normalize", col("vtext"), lit("NFC"))
          .as("ntext"))
      norm
        .groupBy(md5(col("ntext")).as("k"))
        .agg(count(lit(1)).as("members"),
          min(col("doc_id")).as("keep"),
          countDistinct(col("doc_id")).as("n_docs"))
        .groupBy(col("members"), col("n_docs"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("keep")).as("keep_checksum"))
        .orderBy(col("members"), col("n_docs"))
    },
    Some("""
      WITH v AS (
        SELECT doc_id, text || ' caf' || chr(233) AS vtext
        FROM documents
        UNION ALL
        SELECT doc_id, text || ' caf' || chr(101) || chr(769)
        FROM documents),
      n AS (SELECT doc_id, nfc_normalize(vtext) AS ntext FROM v),
      g AS (
        SELECT md5(ntext) AS k, CAST(COUNT(*) AS BIGINT) AS members,
               MIN(doc_id) AS keep,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM n GROUP BY 1)
      SELECT members, n_docs, CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(keep) AS BIGINT) AS keep_checksum
      FROM g GROUP BY 1, 2 ORDER BY 1, 2"""))

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"),
    "zh" -> Seq("的", "是", "了"))

  /** q253 — corpus-scale language ID over the REAL documents table
    * (upgrading q62's literal fixture): per-language function-word
    * evidence — the count of marker-token occurrences per candidate
    * language — argmaxed with a fixed priority order (first listed
    * wins ties; zero evidence ⇒ 'und'), then the full
    * (labeled lang × predicted lang) confusion matrix with id and
    * evidence checksums. The oracle replays the identical marker
    * counts, tie policy, and rollup in DuckDB.
    *
    * The marker lists match the vocabularies tools/regen_testdata.py
    * plants per language, so fuzz runs exercise real separation;
    * cross-engine equality holds on ANY corpus regardless.
    *
    * Scale shape: entirely map-side per document (tokenize + five
    * bounded list-membership counts — all codegen'd builtins), one
    * 25-cell aggregation. Nothing grows with corpus size but the
    * scan. */
  val q253 = Qry(
    "q253_language_id",
    (s: SparkSession, d: String) => {
      def hits(m: Seq[String]) = {
        val arr = m.map(t => s"'$t'").mkString("array(", ", ", ")")
        expr(s"size(filter(toks, x -> array_contains($arr, x)))")
          .cast("long")
      }
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          split(lower(col("text")), " ").as("toks"))
        .select(Seq(col("doc_id"), col("lang")) ++
          markers.map { case (l, m) => hits(m).as(s"s_$l") }: _*)
      val best = markers.map { case (l, _) => col(s"s_$l") }
        .reduce((a, b) => when(a >= b, a).otherwise(b))
      val pred = markers.foldRight(lit("und")) { case ((l, _), e) =>
        when(col(s"s_$l") > 0L && col(s"s_$l") === best, lit(l))
          .otherwise(e)
      }
      // foldRight gives the FIRST listed language the tie (each
      // candidate overwrites later ones when it matches the max).
      scored
        .select(col("doc_id"), col("lang"), pred.as("pred"), best.as("ev"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_checksum"),
          sum(col("ev")).as("evidence"))
        .orderBy(col("lang"), col("pred"))
    },
    Some {
      val hitSql = markers.map { case (l, m) =>
        val lst = m.map(t => s"'$t'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(string_split(lower(text), ' '), " +
          s"x -> list_contains($lst, x))) AS BIGINT) AS s_$l"
      }.mkString(",\n               ")
      val bestSql = markers.map { case (l, _) => s"s_$l" }
        .mkString("GREATEST(", ", ", ")")
      val predSql = markers.map { case (l, _) =>
        s"WHEN s_$l > 0 AND s_$l = best THEN '$l'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      s"""
      WITH scored AS (
        SELECT doc_id, lang,
               $hitSql
        FROM documents),
      best AS (
        SELECT *, $bestSql AS best FROM scored),
      pred AS (
        SELECT doc_id, lang, $predSql AS pred, best AS ev FROM best)
      SELECT lang, pred, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
             CAST(SUM(ev) AS BIGINT) AS evidence
      FROM pred GROUP BY 1, 2 ORDER BY 1, 2"""
    })

  val all: Seq[Qry] = Seq(q252, q253)
}
