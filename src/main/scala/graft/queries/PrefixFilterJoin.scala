package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** EXACT set-similarity join by prefix filtering (the PPJoin-family
  * pruning from the public similarity-join literature): document
  * pairs whose whole-document token-set Jaccard is ≥ 0.8 — with a
  * GUARANTEE of no missed pairs, unlike the minhash-LSH tier, whose
  * recall is probabilistic in the band parameters. The two families
  * complement each other: LSH for recall at extreme scale, prefix
  * filtering when the contract is "every pair above threshold,
  * provably".
  *
  * Pruning lemma: order every document's tokens by one GLOBAL
  * rarest-first total order; if J(A,B) ≥ t, the first
  * |x| − ⌈t·|x|⌉ + 1 tokens of A and B (their "prefixes") must share
  * a token. So candidates = pairs sharing a PREFIX token only —
  * rarest-first makes those buckets the smallest possible — plus the
  * length filter (J ≥ 0.8 forces 4·|B| ≤ 5·|A| ≤ 5·|B|/0.8·0.8…,
  * i.e. sizes within 4:5 of each other), then an exact intersection
  * verifies each candidate. The oracle computes the same answer from
  * the DEFINITION (all shared-token pairs + exact Jaccard), so a
  * pruning bug can never hide behind the algorithm.
  *
  * DECLARED SURFACE: the cross-provider audit between sources src0
  * and src1 — "which documents did provider B copy from provider A,
  * exactly, with proof of completeness" — the contract under which a
  * near-dup list is actionable (takedown, dedup billing, license
  * compliance). The all-pairs self-join form exists as
  * [[selfPairs]] and is differentially pinned against the brute
  * definition in its spec; it is NOT the declared query because this
  * fixture's 31-token vocabulary is the prefix filter's worst case —
  * whole-corpus token sets are so dense that ~24% of ALL doc pairs
  * pass J ≥ 0.8 (≈3M pairs at sf0.1), an inherently quadratic output
  * no pair-listing algorithm escapes. On a real corpus (vocabulary in
  * the millions) prefix buckets are tiny and the same code IS the
  * scale path.
  *
  * Scale shape (declared query): token frequencies are one agg over
  * the two providers' docs; candidates are keyed on prefix tokens and
  * length-filtered IN the join; the verify ships each candidate's two
  * sorted token arrays by doc-keyed hash joins and merges them per
  * row — compute, not shuffle. Both sides are provider-bounded, so
  * the pair space is |A|·|B|, never corpus². */
object PrefixFilterJoin {

  private val ThresholdPermille = 800 // t = 0.8

  /** Candidate generation + exact verify over one distinct
    * (doc_id, token, side) table; pairs must join OPPOSITE sides
    * unless `selfJoin` (then side is ignored and doc_a < doc_b
    * dedups). */
  private def pairs(tok: DataFrame, selfJoin: Boolean): DataFrame = {
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val sized = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nt"), first(col("side")).as("side"))
    // prefix length p = n − ⌈0.8·n⌉ + 1, with ⌈4n/5⌉ = (4n+4) div 5;
    // the (cnt, token) sort key IS the global rarest-first order — no
    // vocabulary-sized global rank ever materializes
    val withRank = tok.join(freq, "token")
      .join(sized.select(col("doc_id"), col("nt")), "doc_id")
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("cnt"), col("token"))))
      .withColumn("p", col("nt") - expr("(4 * nt + 4) div 5") + 1)
    val prefix = withRank.filter(col("pos") <= col("p"))
      .select(col("doc_id"), col("token"), col("nt"), col("side"))
    val sideOk =
      if (selfJoin) lit(true) else col("a.side") =!= col("b.side")
    val cand = prefix.as("a").join(prefix.as("b"), Seq("token"))
      .filter(col("a.doc_id") < col("b.doc_id") && sideOk &&
        col("a.nt") * 5 >= col("b.nt") * 4 &&
        col("b.nt") * 5 >= col("a.nt") * 4)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val arrs = tok.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("token"))).as("ta"),
        count(lit(1)).as("nt"))
    cand
      .join(arrs.select(col("doc_id").as("doc_a"), col("ta").as("toks_a"),
        col("nt").as("na")), Seq("doc_a"))
      .join(arrs.select(col("doc_id").as("doc_b"), col("ta").as("toks_b"),
        col("nt").as("nb")), Seq("doc_b"))
      .withColumn("c", size(array_intersect(col("toks_a"), col("toks_b")))
        .cast("long"))
      .withColumn("jaccard_permille",
        expr("1000 * c DIV (na + nb - c)"))
      .filter(col("jaccard_permille") >= ThresholdPermille)
      .select(col("doc_a"), col("doc_b"), col("jaccard_permille"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private def tokensOf(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("source").as("side"),
      explode(Documents.tokens(col("text"))).as("token"))
      .distinct()

  /** The declared cross-provider audit: src0 × src1 only. */
  def crossSourcePairs(s: SparkSession, d: String): DataFrame =
    pairs(graft.operators.Materialize.eager(tokensOf(
      documents(s, d).filter(col("source").isin("src0", "src1")))),
      selfJoin = false)

  /** All-pairs form over any doc frame — the spec's differential
    * subject; see the class doc for why it is not the declared query
    * on this fixture. */
  def selfPairs(docs: DataFrame): DataFrame =
    pairs(graft.operators.Materialize.eager(
      tokensOf(docs.withColumn("source", lit("all")))), selfJoin = true)

  /** Oracle from the DEFINITION, not the algorithm: every shared-token
    * cross-source pair, exact Jaccard, threshold — so the prefix
    * pruning itself is what the gate checks. */
  val crossSourcePairsSql: String =
    """WITH tok AS (
      |  SELECT DISTINCT doc_id, source, t AS token
      |  FROM documents,
      |    UNNEST(list_filter(string_split_regex(text, '[^\p{L}]+'),
      |      w -> w <> '')) u(t)
      |  WHERE source IN ('src0', 'src1')),
      |n AS (SELECT doc_id, COUNT(*) AS nt FROM tok GROUP BY 1),
      |c AS (
      |  SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
      |    GREATEST(a.doc_id, b.doc_id) AS doc_b, COUNT(*) AS c
      |  FROM tok a JOIN tok b
      |    ON a.token = b.token AND a.doc_id < b.doc_id
      |    AND a.source <> b.source
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT doc_a, doc_b,
      |    CAST(1000 * c // (na.nt + nb.nt - c) AS BIGINT)
      |      AS jaccard_permille
      |  FROM c
      |  JOIN n na ON na.doc_id = doc_a
      |  JOIN n nb ON nb.doc_id = doc_b)
      |SELECT doc_a, doc_b, jaccard_permille
      |FROM j WHERE jaccard_permille >= 800
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_prefix_filter_pairs" -> crossSourcePairs)

  val oracle: Map[String, String] = Map(
    "dedup_prefix_filter_pairs" -> crossSourcePairsSql)
}
