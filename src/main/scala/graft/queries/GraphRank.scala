package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplication-centrality ranking: damped PageRank over the bipartite
  * document ↔ band-hub graph of the MinHash-LSH banding (the same
  * banding dedup_lsh_pairs joins on).
  *
  * Why bipartite, not the pair graph: at 100 TB the materialized
  * pairwise dup graph is Σ bucket² rows — the one thing every dedup
  * query here avoids building. The doc↔band graph is O(docs × bands)
  * = O(n) edges and induces the same connectivity structure (two docs
  * are 2 hops apart iff they share a band), so mass still concentrates
  * on heavily-duplicated content — rank_fp is a "how much does the
  * corpus point at this document's content" score a curation pipeline
  * weights sources by.
  *
  * Band node identity is the band's HUB (min doc_id in the band — the
  * clique→star contraction dedup_clusters already uses), NOT a hash of
  * the band key: min is computed identically by any engine, so the
  * graph — and with operators.PageRank's fixed-point arithmetic, every
  * output bit — is engine-exact with zero hash-collision caveats.
  * Doc nodes live at id 2·doc_id, hub nodes at 2·hub+1 (disjoint
  * integer lanes); only doc nodes are emitted.
  */
object GraphRank {

  def pagerankDupGraph(s: SparkSession, d: String): DataFrame = {
    // band keys as md5-concat strings — same values the oracle groups
    // on (string keys share collision behavior across engines; see
    // dedupIncremental's note for why that matters at corpus scale)
    // materialized once: docBand feeds BOTH the hub aggregate and the
    // join back, and each side would otherwise recompute the full
    // MinHash signature pipeline (shingle + 4 hash folds per doc)
    val docBand = graft.operators.Materialize.eager(
      Documents.minhashSignatures(s, d)
        .select(col("doc_id"),
          explode(array(
            concat(lit("b0_"), col("mh0"), lit("_"), col("mh1")),
            concat(lit("b1_"), col("mh2"), lit("_"), col("mh3")))).as("band")))
    val hubs = docBand.groupBy(col("band")).agg(min(col("doc_id")).as("hub"))
    val docHub = docBand.join(hubs, "band")
      .select(col("doc_id"), col("hub")).distinct()
    val edges = docHub
      .select((col("doc_id") * 2).as("src"), (col("hub") * 2 + 1).as("dst"))
      .union(docHub
        .select((col("hub") * 2 + 1).as("src"), (col("doc_id") * 2).as("dst")))
    graft.operators.PageRank.run(edges, nIter = 5)
      .filter(col("id") % 2 === 0)
      .select(expr("id DIV 2").as("doc_id"), col("rank_fp"))
      .orderBy(col("doc_id"))
  }

  val pagerankDupGraphSql: String = {
    val sig = Documents.minhashSignaturesSql.replace("ORDER BY doc_id", "")
    val nIter = 5
    // mirror of operators.PageRank's integer recurrence: // is BIGINT
    // floor division in DuckDB == Spark's DIV on the non-negative
    // mass here, and the CAST keeps SUM out of HUGEINT
    val iters = (1 to nIter).map { k =>
      s"""r$k AS (
         |  SELECT n.id, (SELECT b FROM consts) + COALESCE(s.m, 0) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, CAST(SUM(((r.r // e.deg) * 85) // 100) AS BIGINT) AS m
         |    FROM edges e JOIN r${k - 1} r ON e.src = r.id
         |    GROUP BY e.dst) s ON n.id = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH sig AS ($sig),
       |doc_band AS (
       |  SELECT doc_id, 'b0_' || mh0 || '_' || mh1 AS band FROM sig
       |  UNION ALL
       |  SELECT doc_id, 'b1_' || mh2 || '_' || mh3 AS band FROM sig),
       |hubs AS (SELECT band, MIN(doc_id) AS hub FROM doc_band GROUP BY band),
       |doc_hub AS (
       |  SELECT DISTINCT d.doc_id, h.hub
       |  FROM doc_band d JOIN hubs h ON d.band = h.band),
       |e0 AS (
       |  SELECT doc_id * 2 AS src, hub * 2 + 1 AS dst FROM doc_hub
       |  UNION ALL
       |  SELECT hub * 2 + 1, doc_id * 2 FROM doc_hub),
       |edges AS (
       |  SELECT src, dst, COUNT(*) OVER (PARTITION BY src) AS deg FROM e0),
       |nodes AS (SELECT DISTINCT src AS id FROM e0),
       |consts AS (
       |  SELECT CAST(1000000000000 // COUNT(*) AS BIGINT) AS r0,
       |    CAST(((1000000000000 * 15) // 100) // COUNT(*) AS BIGINT) AS b
       |  FROM nodes),
       |r0 AS (SELECT id, (SELECT r0 FROM consts) AS r FROM nodes),
       |$iters
       |SELECT id // 2 AS doc_id, r AS rank_fp FROM r$nIter
       |WHERE id % 2 = 0 ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank_dups" -> pagerankDupGraph)

  val oracle: Map[String, String] = Map(
    "graph_pagerank_dups" -> pagerankDupGraphSql)
}
