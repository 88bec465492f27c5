package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariant pins for the packing/sampling operators (the DuckDB
  * oracle checks exact rows; these check the PROPERTIES that make the
  * answers right, so a future rewrite can't be accidentally-equal). */
class TextPipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = "/root/testdata/sf0.01"
  private val B = TextPipeline.PackBudget

  test("pack_sequences: no sequence exceeds the budget unless it is " +
      "a single oversized doc") {
    val perSeq = TextPipeline.packSequences(spark, d)
      .groupBy(col("shard"), col("seq_id"))
      .agg(sum(col("n_tokens")).as("seq_tokens"), count(lit(1)).as("n_docs"))
      .filter(col("seq_tokens") > B && col("n_docs") > 1)
    assert(perSeq.isEmpty, "a multi-doc sequence exceeded the token budget")
  }

  test("pack_sequences: greedy means no doc could have joined the " +
      "previous sequence of its shard") {
    import spark.implicits._
    val rows = TextPipeline.packSequences(spark, d)
      .select(col("shard"), col("seq_id"), col("doc_id"), col("n_tokens"))
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1)
    rows.foreach { case (shard, docs) =>
      val seqs = docs.sortBy(_._3).groupBy(_._2).toSeq.sortBy(_._1)
      // sequence ids are contiguous from 0
      assert(seqs.map(_._1) == (0L until seqs.size.toLong))
      seqs.sliding(2).foreach {
        case Seq((_, prev), (_, cur)) =>
          val prevTotal = prev.map(_._4.toLong).sum
          val firstNext = cur.minBy(_._3)._4
          assert(prevTotal + firstNext > B,
            s"shard $shard: doc ${cur.minBy(_._3)._1} would have fit " +
              s"in the previous sequence (greedy violated)")
        case _ =>
      }
    }
  }

  test("pack_sequences: every document is packed exactly once") {
    val n = graft.Tables.documents(spark, d).count()
    val packed = TextPipeline.packSequences(spark, d)
    assert(packed.count() == n)
    assert(packed.select(col("doc_id")).distinct().count() == n)
  }

  test("global_shuffle: positions are a permutation of 0..n-1 and " +
      "deterministic across runs") {
    import spark.implicits._
    val a = TextPipeline.globalShuffle(spark, d)
      .as[(Long, Long)].collect().sortBy(_._1)
    val n = a.length
    assert(a.map(_._2).sorted.toSeq == (0L until n.toLong))
    val b = TextPipeline.globalShuffle(spark, d)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "shuffle order must be reproducible")
  }

  test("stratified_sample: per-cell quota, contiguous ranks, deterministic") {
    import spark.implicits._
    val rows = TextPipeline.stratifiedSample(spark, d)
      .as[(String, String, Int, Long)].collect()
    val byCell = rows.groupBy(r => (r._1, r._2))
    byCell.foreach { case (cell, rs) =>
      assert(rs.length <= 5, s"$cell overflows the quota")
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length), s"$cell ranks")
    }
    // cells with fewer docs than the quota keep everything
    val cellSizes = graft.Tables.documents(spark, d)
      .groupBy(col("lang"), col("source")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    byCell.foreach { case (cell, rs) =>
      assert(rs.length == math.min(5L, cellSizes(cell)), s"$cell quota")
    }
    val again = TextPipeline.stratifiedSample(spark, d)
      .as[(String, String, Int, Long)].collect()
    assert(rows.toSeq == again.toSeq, "sample must be reproducible")
  }

  test("decontaminate: planted train/eval shingle overlap is flagged, " +
      "clean train docs are not") {
    import spark.implicits._
    // craft texts whose md5 first hex char forces the split
    def mine(base: String, wanted: Char => Boolean): String = {
      Iterator.from(0).map(i => s"$base pad$i")
        .find(t => wanted(org.apache.commons.codec.digest.DigestUtils.md5Hex(t).head))
        .get
    }
    val train = (c: Char) => !"cdef".contains(c)
    val eval_ = (c: Char) => c == 'e' || c == 'f'
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val trainDirty = mine(s"$shared one", train)
    val testDoc = mine(s"$shared two", eval_)
    val trainClean = mine("lorem ipsum dolor sit amet consectetur adipiscing", train)
    val dir = java.nio.file.Files.createTempDirectory("decon").toString
    Seq(
      (1L, trainDirty, "en", "src0", trainDirty.length.toLong),
      (2L, testDoc, "en", "src1", testDoc.length.toLong),
      (3L, trainClean, "en", "src2", trainClean.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextPipeline.decontaminate(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got.contains(1L), "overlapping train doc must be flagged")
    assert(got(1L) >= 8L, "all shared-base shingles should hit")
    assert(!got.contains(3L), "clean train doc must not be flagged")
    assert(!got.contains(2L), "eval docs are never flagged")
  }

  test("mixture_sample: kept fraction tracks the per-source weight " +
      "and is deterministic") {
    import spark.implicits._
    val stats = TextPipeline.mixtureSample(spark, d)
      .select(col("source"), col("n_docs"), col("n_kept"))
      .as[(String, Long, Long)].collect()
    val (even, odd) = stats.partition(_._1.drop(3).toInt % 2 == 0)
    def frac(xs: Array[(String, Long, Long)]) =
      xs.map(_._3).sum.toDouble / xs.map(_._2).sum
    assert(math.abs(frac(even) - 0.75) < 0.12, s"even sources: ${frac(even)}")
    assert(math.abs(frac(odd) - 0.25) < 0.12, s"odd sources: ${frac(odd)}")
    // deterministic: a second run returns byte-identical rows
    val again = TextPipeline.mixtureSample(spark, d)
      .select(col("source"), col("n_docs"), col("n_kept"))
      .as[(String, Long, Long)].collect()
    assert(stats.toSeq == again.toSeq)
  }

  test("token_budget_select: budget never exceeded, admission is " +
      "best-first, and the next-best rejected doc would not have fit") {
    import spark.implicits._
    val rows = TextPipeline.tokenBudgetSelect(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    val budget = 1200L
    rows.groupBy(_._1).foreach { case (src, picked) =>
      assert(picked.map(_._3).sum <= budget, s"$src busts the budget")
      assert(picked.map(_._3).sum == picked.map(_._5).max,
        s"$src cum_tokens must equal the running total")
      // admission order is (score desc, doc_id): cum_tokens must be
      // increasing along that order
      val inOrder = picked.sortBy(p => (-p._4, p._2))
      assert(inOrder.map(_._5).toSeq == picked.map(_._5).sorted.toSeq,
        s"$src admitted out of preference order")
    }
    // greedy-prefix semantics: for each source the FIRST doc in
    // preference order beyond the kept set must overflow the budget
    val all = graft.Tables.documents(spark, d)
      .select(col("source"), col("doc_id"),
        size(Documents.tokens(col("text"))).cast("long").as("tok"),
        size(org.apache.spark.sql.functions.filter(Documents.tokens(col("text")),
          t => t.isin("the", "a", "of", "and", "to"))).cast("long").as("sw"))
      .filter(col("tok") > 0)
      .withColumn("score_pm", expr("(sw * 1000) DIV tok"))
      .as[(String, Long, Long, Long, Long)].collect()
    all.groupBy(_._1).foreach { case (src, docs) =>
      val pickedIds = rows.filter(_._1 == src).map(_._2).toSet
      val ordered = docs.sortBy(d2 => (-d2._5, d2._2))
      val kept = ordered.takeWhile(d2 => pickedIds.contains(d2._2))
      assert(kept.length == pickedIds.size,
        s"$src kept set must be a PREFIX of the preference order")
      ordered.drop(kept.length).headOption.foreach { next =>
        assert(kept.map(_._3).sum + next._3 > budget,
          s"$src rejected a doc that still fit the budget")
      }
    }
  }

  test("mixture_plan: abundant source downsampled to target, scarce " +
      "source epoch-capped with declared deficit") {
    import spark.implicits._
    // big: 80 tokens, tiny: 4 → T=84, S=2, target=42.
    // big: rate 42000/80=525 pm, planned 80*525/1000=42, deficit 0.
    // tiny: uncapped rate 10500 → capped 4000 (4 epochs), planned 16,
    // deficit 26, epoch_capped=true.
    val dir = java.nio.file.Files.createTempDirectory("mix").toString
    Seq(
      (0L, Seq.fill(80)("aa").mkString(" "), "en", "big", 239L),
      (1L, "bb bb bb bb", "en", "tiny", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextPipeline.mixturePlan(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      ("big", 1L, 80L, 42L, 525L, 42L, 0L, false),
      ("tiny", 1L, 4L, 42L, 4000L, 16L, 26L, true)))
  }
}
