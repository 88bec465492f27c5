package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Hybrid retrieval: fuse a lexical ranker (BM25 over the documents
  * table) with a semantic ranker (embedding cosine over the embeddings
  * table, vec_id indexing the same corpus) — the two-tower mining
  * setup behind domain-targeted training-subset selection, where
  * neither signal alone is trusted.
  *
  * Reference analog: none (SURVEY §2.2 stops at inverted index);
  * beyond-reference LLM-pipeline surface.
  */
object Retrieval {

  /** Reciprocal-rank fusion (RRF, Cormack et al.): fused score
    * Σ 1/(60+rank) over the rankers that returned the doc, computed
    * on an exact integer grid (1 000 000 DIV (60+rank)) so the fusion,
    * its ranking, and the top-k cutoff are float-free and
    * engine-identical. Docs found by only one ranker contribute one
    * term — exactly RRF's robustness property.
    *
    * Scale shape: each ranker's list is already a global top-k
    * (TakeOrderedAndProject on the lexical side; one broadcast 1-row
    * query vector + TakeOrderedAndProject on the semantic side — the
    * brute scan stands in for the ANN path, which emb_ann_* provide).
    * The fusion join and final rank run on 2k rows, driver-trivial at
    * any corpus scale. */
  def rrfFusion(s: SparkSession, d: String): DataFrame = {
    val K = 60 // RRF's standard dampening constant
    val lex = TextAnalysis.bm25TopK(s, d)
      .select(col("doc_id").as("id"), col("rank").as("lex_rank"))
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val scored = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("id"),
        graft.functions.GraftFunctions
          .cosineSim(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.orderBy(col("cos").desc, col("id"))
    val sem = scored.orderBy(col("cos").desc, col("id")).limit(20)
      .withColumn("sem_rank", row_number().over(w))
      .select(col("id"), col("sem_rank"))
    val fused = lex.join(sem, Seq("id"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(expr(s"1000000 DIV ($K + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 DIV ($K + sem_rank)"), lit(0L)))
    val w2 = Window.orderBy(col("rrf_e6").desc, col("id"))
    fused.orderBy(col("rrf_e6").desc, col("id")).limit(10)
      .withColumn("rank", row_number().over(w2))
      .select(col("rank"), col("id"), col("lex_rank"), col("sem_rank"),
        col("rrf_e6"))
      .orderBy(col("rank"))
  }

  val rrfFusionSql: String =
    s"""WITH lex AS (
       |  SELECT doc_id AS id, rank AS lex_rank FROM (
       |${TextAnalysis.bm25TopKSql}
       |  )),
       |semq AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       |semscored AS (
       |  SELECT vec_id AS id,
       |    ${Embeddings.cosFoldSql("q.q_emb", "e.embedding")} AS cos
       |  FROM embeddings e CROSS JOIN semq q WHERE vec_id <> 0),
       |sem AS (
       |  SELECT id,
       |    CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, id) AS INT) AS sem_rank
       |  FROM semscored QUALIFY sem_rank <= 20),
       |fused AS (
       |  SELECT COALESCE(lex.id, sem.id) AS id, lex_rank, sem_rank,
       |    COALESCE(CAST(1000000 AS BIGINT) // (60 + lex_rank),
       |             CAST(0 AS BIGINT)) +
       |    COALESCE(CAST(1000000 AS BIGINT) // (60 + sem_rank),
       |             CAST(0 AS BIGINT)) AS rrf_e6
       |  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_e6 DESC, id) AS INT)
       |    AS rank,
       |  id, lex_rank, sem_rank, rrf_e6
       |FROM fused QUALIFY rank <= 10 ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "retrieval_rrf_fusion" -> rrfFusion)

  val oracle: Map[String, String] = Map(
    "retrieval_rrf_fusion" -> rrfFusionSql)
}
