package graft

import graft.operators.Graph
import graft.queries.SqlSurface

/** Recursive-CTE surface (q237): WITH RECURSIVE UNION ALL +
  * per-level DISTINCT + final MIN(hop) must implement exactly the
  * frontier-BFS semantics of [[Graph.bfsHops]] — proven by equality
  * on the real co-purchase graph — and terminate on cycles.
  */
class SqlRecursiveSpec extends SparkSpec {
  import spark.implicits._

  test("q237 recursive CTE == Graph.bfsHops on the sf0.001 " +
      "co-purchase graph") {
    val d = sf()
    val cte = SqlSurface.q237.fn(spark, d)
      .as[(Long, Int)].collect().toMap
    val edges = spark.sql("""
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey""")
    val sources = spark.sql(
      "SELECT p_partkey FROM part WHERE p_partkey % 199 = 3")
    val kernel = Graph.bfsHops(edges, "src", "dst", sources,
        "p_partkey", maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(cte === kernel)
  }

  test("recursive CTE terminates on a cycle and keeps min hop") {
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (9L, 10L))
      .toDF("src", "dst").createOrReplaceTempView("rec_cycle_edges")
    val r = spark.sql("""
      WITH RECURSIVE reach(id, hop) AS (
        SELECT CAST(1 AS BIGINT) AS id, 0 AS hop
        UNION ALL
        SELECT DISTINCT e.dst, r.hop + 1
        FROM reach r JOIN rec_cycle_edges e ON e.src = r.id
        WHERE r.hop < 10)
      SELECT id, MIN(hop) FROM reach GROUP BY id ORDER BY id""")
      .as[(Long, Int)].collect().toList
    // 1 at 0; 2 at 1; 3 at 2; 1 rediscovered at 3 (collapsed by
    // MIN); 4 at 3; 9→10 unreachable from the seed
    assert(r === List((1L, 0), (2L, 1), (3L, 2), (4L, 3)))
  }
}
