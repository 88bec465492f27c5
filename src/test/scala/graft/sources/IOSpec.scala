package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class IOSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = "/root/testdata/sf0.001"
  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("csv and jsonl round-trip the documents table") {
    val docs = graft.Tables.documents(spark, d)
    val c = tmp("csv"); val j = tmp("json")
    IO.writeCsv(docs, c); IO.writeJsonl(docs, j)
    val schema = "doc_id long, text string, lang string, source string, n_chars long"
    assert(sortedRows(IO.readCsv(spark, c, schema).select(docs.columns.map(col): _*))
      == sortedRows(docs))
    assert(sortedRows(IO.readJsonl(spark, j, schema).select(docs.columns.map(col): _*))
      == sortedRows(docs))
  }

  test("orc round-trips lineitem with predicate pushdown") {
    val li = graft.Tables.lineitem(spark, d)
    val o = tmp("orc")
    IO.writeOrc(li, o)
    val back = IO.readOrc(spark, o)
    assert(back.count() == li.count())
    val filtered = back.filter(col("l_quantity") > 45.0)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      plan.take(600))
    assert(filtered.count() == li.filter(col("l_quantity") > 45.0).count())
  }

  test("partitioned write prunes partitions on read") {
    val docs = graft.Tables.documents(spark, d)
    val p = tmp("part")
    IO.writePartitioned(docs, p, "lang")
    val dirs = new java.io.File(p).listFiles().map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.sorted.toSeq == Seq("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh"))
    val en = IO.readParquet(spark, p).filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(500))
    assert(en.count() == docs.filter(col("lang") === "en").count())
  }

  test("co-bucketed tables join without a shuffle on the join key") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables across JVMs but the
    // warehouse dirs persist; clear them or saveAsTable refuses
    for (t <- Seq("b_orders", "b_lineitem")) {
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    IO.writeBucketed(graft.Tables.orders(spark, d), "b_orders", "o_orderkey", 4)
    IO.writeBucketed(
      graft.Tables.lineitem(spark, d)
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)
    // force the sort-merge path (tiny test tables would broadcast and
    // bypass buckets); the scale-relevant property is no shuffle
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        "bucketed equi-join must not shuffle:\n" + plan.take(800))
      assert(plan.contains("Bucketed: true"), plan.take(800))
      assert(joined.count() == graft.Tables.lineitem(spark, d).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("whole-text source mirrors the reference's (filename, contents) scan") {
    val df = IO.readWholeText(spark, s"$booksDir/*.txt")
    assert(df.count() == 8)
    assert(df.columns.toSeq == Seq("path", "contents"))
  }

  test("jsonl quarantine: every line lands in exactly one of good/quarantine") {
    val p = tmp("quar")
    val lines = Seq(
      """{"doc_id": 1, "text": "ok one"}""",
      """{"doc_id": 2, "text": "ok two"}""",
      """{"doc_id": 3 "text": "missing comma"}""", // malformed
      """not json at all""",
      "", // blank: ingestion noise, in neither output
      """null""", // valid JSON, but a NULL row is not data — quarantine
      """{"doc_id": "not-a-number", "text": "type mismatch"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(p, "in.jsonl"),
      String.join("\n", lines: _*).getBytes)
    val (good, bad) = IO.readJsonlQuarantine(spark, p, "doc_id long, text string")
    assert(good.columns.toSeq == Seq("doc_id", "text"))
    // strict good: the type-mismatch line quarantines along with the
    // syntactically broken ones — no silent partial rows
    assert(good.count() == 2)
    assert(sortedRows(bad) == Seq(
      """not json at all""",
      "null",
      """{"doc_id": "not-a-number", "text": "type mismatch"}""",
      """{"doc_id": 3 "text": "missing comma"}"""))
    assert(good.count() + bad.count() == 6) // = non-blank input lines
  }

  test("clustered write bounds file sizes and yields pruning-tight ranges") {
    val docs = graft.Tables.documents(spark, d)
    val p = tmp("clus")
    IO.writeClustered(docs, p, "doc_id", nFiles = 4, maxRecordsPerFile = 60L)
    val files = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    // 500 docs / 4 range partitions = ~125 rows each, recapped at 60
    // → every file obeys the cap and there are more than 4 files
    assert(files.length > 4)
    val perFile = files.map(f => spark.read.parquet(f.getPath)
      .agg(count(lit(1)), min(col("doc_id")), max(col("doc_id")))
      .collect().head).map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(perFile.forall(_._1 <= 60L))
    // range clustering: file [min,max] doc_id intervals never overlap,
    // so a doc_id range predicate prunes to a few files by footer stats
    val spans = perFile.map(t => (t._2, t._3)).sortBy(_._1).toSeq
    assert(spans.sliding(2).forall {
      case Seq((_, hi), (lo2, _)) => hi < lo2
      case _ => true
    })
    assert(perFile.map(_._1).sum == 500L)
  }

  test("dynamic partition pruning: a filtered dim join prunes fact " +
      "partitions at runtime, not just statically") {
    import spark.implicits._
    val p = tmp("dpp")
    val docs = graft.Tables.documents(spark, d)
    IO.writePartitioned(docs, p, "lang")
    // the selective filter is on a NON-join dim column, so only DPP
    // (a runtime subquery over the broadcast) can prune the fact scan.
    // The dim must be a FILE relation: a local Seq constant-folds into
    // a LocalRelation, the Filter node disappears, and the DPP rule's
    // selective-predicate check finds nothing to prune with.
    val dimP = tmp("dppdim")
    Seq(("en", "english"), ("fr", "french"), ("de", "german"),
      ("es", "spanish"), ("zh", "chinese")).toDF("lang", "lang_name")
      .write.mode("overwrite").parquet(dimP)
    val q = IO.readParquet(spark, p)
      .join(spark.read.parquet(dimP)
        .filter(col("lang_name") === "english"), "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "fact scan must carry a dynamicpruning partition filter:\n" +
        plan.take(800))
    assert(q.count() == docs.filter(col("lang") === "en").count())
  }

  test("upsert snapshot: update wins, tombstone deletes, inserts land, " +
      "untouched rows carry over") {
    import spark.implicits._
    val tgt = tmp("upt"); val out = tmp("ups")
    Seq((1L, "one-v1"), (2L, "two-v1"), (3L, "three-v1"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(tgt)
    val updates = Seq(
      (2L, "two-v2", false), // replaces the target row
      (3L, "ignored", true), // tombstone: key 3 leaves the snapshot
      (4L, "four-v1", false)) // brand-new key
      .toDF("doc_id", "text", "deleted")
    IO.upsertSnapshot(spark.read.parquet(tgt), updates, "doc_id", out)
    val got = spark.read.parquet(out).as[(Long, String)].collect().sorted
    assert(got.toSeq == Seq((1L, "one-v1"), (2L, "two-v2"), (4L, "four-v1")))
  }

  test("upsert snapshot: a NULL tombstone means not-deleted, never " +
      "silent row loss") {
    import spark.implicits._
    val tgt = tmp("upn"); val out = tmp("upno")
    Seq((1L, "one-v1")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(tgt)
    val updates = Seq((1L, "one-v2", None: Option[Boolean]),
      (2L, "two-v1", Some(true)))
      .toDF("doc_id", "text", "deleted")
    IO.upsertSnapshot(spark.read.parquet(tgt), updates, "doc_id", out)
    val got = spark.read.parquet(out).as[(Long, String)].collect().sorted
    assert(got.toSeq == Seq((1L, "one-v2")),
      "the NULL-tombstone update must land, the true tombstone must not")
  }

  test("upsert snapshot: a target data column named like the tombstone " +
      "is refused, not destroyed") {
    import spark.implicits._
    val tgt = tmp("upc")
    Seq((1L, "a", false)).toDF("doc_id", "text", "deleted")
      .write.mode("overwrite").parquet(tgt)
    val e = intercept[IllegalArgumentException] {
      IO.upsertSnapshot(spark.read.parquet(tgt),
        Seq((2L, "b")).toDF("doc_id", "text"), "doc_id", tmp("upco"))
    }
    assert(e.getMessage.contains("deleted"))
  }

  test("upsert snapshot: a non-empty outDir (e.g. the current snapshot) " +
      "is refused, never clobbered") {
    import spark.implicits._
    val tgt = tmp("upe")
    Seq((1L, "a")).toDF("doc_id", "text").write.mode("overwrite").parquet(tgt)
    val e = intercept[IllegalArgumentException] {
      // pointing outDir at the CURRENT snapshot directory must fail
      IO.upsertSnapshot(spark.read.parquet(tgt),
        Seq((2L, "b")).toDF("doc_id", "text"), "doc_id", tgt)
    }
    assert(e.getMessage.contains("non-empty"))
    // and the old snapshot is untouched
    assert(spark.read.parquet(tgt).count() == 1L)
  }

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  test("compact: an unpartitioned fragment swarm becomes " +
      "ceil(rows/target) files with identical data") {
    import spark.implicits._
    val in = tmp("cin"); val out0 = tmp("cout0")
    val df = (1L to 1500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    df.repartition(200).write.mode("overwrite").parquet(in)
    assert(parquetFiles(in).size > 100, "fixture must be fragmented")
    val out = s"$out0/t"
    IO.compact(spark, in, out, targetRecordsPerFile = 1000L)
    // 1500 rows / 1000 target → 2 tasks; maxRecordsPerFile caps each
    val files = parquetFiles(out)
    assert(files.size >= 2 && files.size <= 3, s"got ${files.size} files")
    assert(sortedRows(spark.read.parquet(out)) == sortedRows(df))
  }

  test("compact: a partitioned table keeps its hive layout — one file " +
      "per partition dir, oversized partitions split by the target") {
    import spark.implicits._
    val in = tmp("cpin"); val out0 = tmp("cpout")
    // source 'a': 2500 rows (splits at target 1000); 'b': 40 rows
    val df = ((1L to 2500L).map(i => (i, "a")) ++
      (1L to 40L).map(i => (i + 10000L, "b")))
      .toDF("doc_id", "source")
    df.repartition(120).write.mode("overwrite")
      .partitionBy("source").parquet(in)
    assert(parquetFiles(in).size > 60, "fixture must be fragmented")
    val out = s"$out0/t"
    IO.compact(spark, in, out, targetRecordsPerFile = 1000L,
      partitionCols = Seq("source"))
    val aFiles = parquetFiles(s"$out/source=a")
    val bFiles = parquetFiles(s"$out/source=b")
    assert(bFiles.size == 1, s"small partition → one file, got ${bFiles.size}")
    assert(aFiles.size == 3, s"2500 rows at target 1000 → 3, got ${aFiles.size}")
    // partition column survives the round-trip with its values intact
    assert(sortedRows(spark.read.parquet(out)
      .select(col("doc_id"), col("source"))) ==
      sortedRows(df.select(col("doc_id"), col("source"))))
  }

  test("compact: a non-empty outDir is refused, never clobbered") {
    import spark.implicits._
    val in = tmp("crin"); val out = tmp("crout")
    Seq((1L, "x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    Seq((9L, "keep")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(out)
    val e = intercept[IllegalArgumentException] {
      IO.compact(spark, in, out, targetRecordsPerFile = 10L)
    }
    assert(e.getMessage.contains("non-empty"))
    assert(spark.read.parquet(out).as[(Long, String)].collect()
      .toSeq == Seq((9L, "keep")))
  }

  test("upsert snapshot: duplicate keys within one input fail loudly") {
    import spark.implicits._
    val tgt = tmp("upd")
    Seq((1L, "a")).toDF("doc_id", "text").write.mode("overwrite").parquet(tgt)
    val dupUpdates = Seq((2L, "x"), (2L, "y")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      IO.upsertSnapshot(spark.read.parquet(tgt), dupUpdates, "doc_id",
        tmp("upo"))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  // ---- events fixture-schema guard ------------------------------------
  // Round 6 post-mortem: the driver regenerated events.parquet with ts as
  // timestamp[us] (read as TIMESTAMP_NTZ) where earlier rounds shipped
  // TIMESTAMP(NANOS) (readable only as int64 via nanosAsLong). The loader
  // must normalize EVERY shape it has ever seen to the same session-zone
  // TimestampType instant, so a fixture regeneration can never again
  // silently break the whole events tier.

  private val instantUs = "2024-01-01 00:00:00.123456"

  private def eventsTsOf(dir: String): (org.apache.spark.sql.types.DataType, java.sql.Timestamp) = {
    val df = graft.Tables.events(spark, dir)
    (df.schema("ts").dataType, df.select(col("ts")).head().getTimestamp(0))
  }

  test("events loader: legacy TIMESTAMP(NANOS) fixture shape") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val dir = tmp("evnanos")
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("ts")
      .required(PrimitiveTypeName.INT64).named("event_id")
      .named("events")
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema).build()
    // 2024-01-01T00:00:00.123456789Z as epoch nanos; loader truncates to µs
    val nanos = 1704067200L * 1000000000L + 123456789L
    w.write(new SimpleGroupFactory(schema).newGroup()
      .append("ts", nanos).append("event_id", 1L))
    w.close()
    val (dt, ts) = eventsTsOf(dir)
    assert(dt == org.apache.spark.sql.types.TimestampType)
    assert(ts.toInstant == java.time.Instant.parse("2024-01-01T00:00:00.123456Z"))
  }

  test("events loader: current timestamp[us] (TIMESTAMP_NTZ) fixture shape") {
    val dir = tmp("evntz")
    spark.sql(s"select timestamp_ntz'$instantUs' as ts, 1L as event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, ts) = eventsTsOf(dir)
    assert(dt == org.apache.spark.sql.types.TimestampType)
    assert(ts.toInstant == java.time.Instant.parse("2024-01-01T00:00:00.123456Z"))
  }

  test("events loader: session-zone TimestampType passes through") {
    val dir = tmp("evtz")
    spark.sql(s"select timestamp'$instantUs' as ts, 1L as event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, ts) = eventsTsOf(dir)
    assert(dt == org.apache.spark.sql.types.TimestampType)
    assert(ts.toInstant == java.time.Instant.parse("2024-01-01T00:00:00.123456Z"))
  }

  test("events loader: int32 ids widen to LONG (as-of join contract)") {
    // a regenerated fixture shipping narrow ids must not break the
    // LongType key contract of plans.AsOf — the r6-class fixture break
    val dir = tmp("evint")
    spark.sql(s"select timestamp'$instantUs' as ts, " +
        "cast(7 as int) as event_id, cast(9 as int) as user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = graft.Tables.events(spark, dir)
    assert(df.schema("event_id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.schema("user_id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.select("event_id", "user_id").collect().head.toSeq ==
      Seq(7L, 9L))
  }
}
