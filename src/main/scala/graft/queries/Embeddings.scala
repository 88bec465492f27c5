package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Scale path: brute-force cosine is the correctness baseline (O(n²)
  * pairs, broadcast one side when it fits); the LSH-bucketed variant
  * (random-hyperplane signs) bounds the candidate space per bucket and
  * is the 100 TB shape — shuffle on bucket key, no cross join.
  *
  * All arithmetic is done in DOUBLE with a fixed left-to-right
  * `aggregate` fold so Spark and DuckDB produce bit-identical sums.
  */
object Embeddings {

  /** dot(a, b) as an in-order double fold over zip_with products. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def norm2(a: Column): Column = dot(a, a)

  /** Pairwise cosine similarity for a filtered query set vs the whole
    * table; top-k neighbors per query by (similarity desc, id).
    * IDs-and-rank output keeps the hash compare float-free except for
    * the similarity itself (deterministic by the fold above). */
  def cosineTopK(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    val e = embeddings(s, d)
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cand = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    // native CosineSimF expression: one primitive loop per pair inside
    // codegen (same fold order as the zip_with composition → same
    // doubles as the DuckDB oracle); ~10× the composed throughput
    val scored = queries.join(broadcast(cand), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        graft.functions.GraftFunctions
          .cosineSim(col("q_emb"), col("c_emb")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("c_id"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val cosineTopKSql: String =
    """WITH q AS (
      |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      |  WHERE vec_id % 50 = 0),
      |c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings),
      |scored AS (
      |  SELECT q_id, c_id,
      |    list_reduce(list_transform(range(1, len(q_emb)+1),
      |        i -> CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE)),
      |      (a, b) -> a + b)
      |    / SQRT(
      |      list_reduce(list_transform(range(1, len(q_emb)+1),
      |          i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE)),
      |        (a, b) -> a + b)
      |      *
      |      list_reduce(list_transform(range(1, len(c_emb)+1),
      |          i -> CAST(c_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE)),
      |        (a, b) -> a + b)) AS cos
      |  FROM q JOIN c ON q_id <> c_id),
      |ranked AS (
      |  SELECT q_id, c_id,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
      |  FROM scored)
      |SELECT q_id, c_id, rank FROM ranked WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin

  /** Per-label centroid + stats: the clustering/recall-eval building
    * block. Sums are in-order double folds per row then Spark/DuckDB
    * aggregate over rows — element sums of doubles from floats are
    * exact-ish; we round to 6 decimals in both engines to be safe. */
  def labelCentroidNorm(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("label"), norm2(col("embedding")).as("n2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("n2") * lit(1e6) + lit(0.5))) / lit(1e6)).as("sum_norm2"))
      .orderBy(col("label"))

  val labelCentroidNormSql: String =
    """WITH t AS (
      |  SELECT label,
      |    list_reduce(list_transform(range(1, len(embedding)+1),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
      |      (a, b) -> a + b) AS n2
      |  FROM embeddings)
      |SELECT label, COUNT(*) AS n,
      |  SUM(CAST(FLOOR(n2*1000000 + 0.5) AS BIGINT))/1000000.0 AS sum_norm2
      |FROM t GROUP BY label ORDER BY label""".stripMargin

  /** LSH-bucketed ANN: sign-bit signature from fixed pseudo-random
    * hyperplanes (deterministic, seedless: plane p component i =
    * sin(p*1000 + i), identical in both engines), then candidates share
    * a bucket. The scale path: shuffle on bucket, no cross join. */
  def annLshBuckets(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    def planeDot(emb: Column, p: Int): Column =
      aggregate(
        zip_with(emb, sequence(lit(0), lit(63)),
          (x, i) => x.cast("double") * sin(lit(p * 1000).cast("double") + i.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
    val sig = e.select(col("vec_id"), col("label"),
      concat((0 until 8).map(p =>
        when(planeDot(col("embedding"), p) >= 0, lit("1")).otherwise(lit("0"))): _*)
        .as("bucket"))
    sig.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"),
        countDistinct(col("label")).as("n_labels"),
        min(col("vec_id")).as("min_id"))
      .orderBy(col("bucket"))
  }

  val annLshBucketsSql: String = {
    val planes = (0 until 8).map { p =>
      s"""CASE WHEN list_reduce(list_transform(range(1, len(embedding)+1),
         |  i -> CAST(embedding[i] AS DOUBLE) * SIN(CAST(${p * 1000} AS DOUBLE) + (i-1))),
         |  (a, b) -> a + b) >= 0 THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" || ")
    s"""WITH sig AS (
       |  SELECT vec_id, label, $planes AS bucket FROM embeddings)
       |SELECT bucket, COUNT(*) AS n_vecs,
       |  COUNT(DISTINCT label) AS n_labels, MIN(vec_id) AS min_id
       |FROM sig GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** Embedding-cosine near-dup: all pairs with cosine >= 0.99 —
    * exact (brute) for oracle parity at test scale; the LSH-bucket
    * variant (annLshBuckets) is the candidate-generation scale path
    * (bucketed pairs ⊂ brute pairs; at 100 TB run buckets + verify). */
  def dedupEmbeddingCosine(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(s)
    val e = embeddings(s, d)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
      col("label").as("label_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
      col("label").as("label_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("label_a"), col("label_b"),
        graft.functions.GraftFunctions.cosineSim(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= 0.99)
      .select(col("id_a"), col("id_b"),
        (col("label_a") === col("label_b")).as("same_label"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val dedupEmbeddingCosineSql: String =
    """WITH p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    a.label AS label_a, b.label AS label_b,
      |    list_reduce(list_transform(range(1, len(a.embedding)+1),
      |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
      |      (x, y) -> x + y)
      |    / SQRT(
      |      list_reduce(list_transform(range(1, len(a.embedding)+1),
      |          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)),
      |        (x, y) -> x + y)
      |      *
      |      list_reduce(list_transform(range(1, len(b.embedding)+1),
      |          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
      |        (x, y) -> x + y)) AS cos
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, label_a = label_b AS same_label
      |FROM p WHERE cos >= 0.99
      |ORDER BY id_a, id_b""".stripMargin

  /** IVF ANN as a query: build the seeded k-means index, probe 3 of 8
    * cells per query. No SQL oracle (k-means isn't expressible);
    * recall and determinism are pinned in IvfIndexSpec. */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val (index, centers) = graft.operators.IvfIndex.build(s, e, nLists = 8)
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    graft.operators.IvfIndex.search(s, index, centers, queries, k = 5,
      nProbe = 3, excludeSelf = true)
      .select(col("q_id"), col("c_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_cosine_topk" -> cosineTopK,
    "emb_ann_ivf" -> annIvf,
    "emb_label_norms" -> labelCentroidNorm,
    "emb_ann_lsh_buckets" -> annLshBuckets,
    "dedup_embedding_cosine" -> dedupEmbeddingCosine)

  val oracle: Map[String, String] = Map(
    "emb_cosine_topk" -> cosineTopKSql,
    "emb_label_norms" -> labelCentroidNormSql,
    "emb_ann_lsh_buckets" -> annLshBucketsSql,
    "dedup_embedding_cosine" -> dedupEmbeddingCosineSql)
}
