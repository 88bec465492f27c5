package graft.queries
// (lives under tools/ but needs package-private access to
// Documents.lshCandidatePairs — measurement harness only)

import org.apache.spark.sql.functions._

/** Stage-level decomposition of graph_neighbor_jaccard's cost at
  * SPARK_GRAFT_SF_DIR — measurement harness for the r12 optimization
  * round (guide §1.1: find where the time goes before changing
  * anything). Times each sub-plan with the noop sink. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.Session.build("graft-jaccard-probe")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the shared pin outside the timed region
    val pairs = time("pin build/read (lshCandidatePairs)") {
      val p = Documents.lshCandidatePairs(s, d)
      noop(p); p
    }
    val CapK = 64
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val edges = time("edges eager copy") {
        graft.operators.Materialize.eager(
          pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      }
      val directed = edges
        .select(col("u").as("node"), col("v").as("nbr"))
        .union(edges.select(col("v").as("node"), col("u").as("nbr")))
      val deg = directed.groupBy(col("node")).agg(count(lit(1)).as("dg"))
      val hashed = directed.join(deg, "node")
        .withColumn("m", md5(concat(col("node").cast("string"), lit("|"),
          col("nbr").cast("string"))))
      val thinned = hashed
        .filter(conv(substring(col("m"), 1, 4), 16, 10).cast("long") *
          col("dg") < lit(2L * CapK * 65536L))
        .select(col("node"), col("nbr"), col("m"))
      val thinnedM = time("directed+deg+md5+thin (materialize thinned)") {
        graft.operators.Materialize.eager(thinned)
      }
      val wNode = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node")).orderBy(col("m"), col("nbr"))
      val wNbr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("nbr")).orderBy(col("m"), col("node"))
      val capped2 = time("two cap windows (materialize capped2)") {
        graft.operators.Materialize.eager(
          thinnedM.withColumn("rk", row_number().over(wNode))
            .filter(col("rk") <= CapK)
            .withColumn("rk2", row_number().over(wNbr))
            .filter(col("rk2") <= CapK)
            .select(col("node"), col("nbr")))
      }
      println(s"[probe] thinned rows=${thinnedM.count()} " +
        s"capped2 rows=${capped2.count()}")
      val deg2 = capped2.groupBy(col("node")).agg(count(lit(1)).as("cdg"))
      val a = capped2.as("a"); val b = capped2.as("b")
      val inter = a.join(b,
          col("a.nbr") === col("b.nbr") && col("a.node") < col("b.node"))
        .select(col("a.node").as("u"), col("b.node").as("v"))
      time("wedge self-join + closure join + final (noop)") {
        noop(inter.join(edges, Seq("u", "v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("common_nbrs"))
          .join(deg2.select(col("node").as("u"), col("cdg").as("deg_u")), "u")
          .join(deg2.select(col("node").as("v"), col("cdg").as("deg_v")), "v")
          .select(col("u"), col("v"), col("common_nbrs"),
            col("deg_u"), col("deg_v"),
            expr("common_nbrs * 1000 DIV (deg_u + deg_v - common_nbrs)")
              .as("jaccard_milli"))
          .orderBy(col("jaccard_milli").desc, col("u"), col("v"))
          .limit(20))
      }
      time("wedge self-join ONLY (count agg)") {
        noop(inter.groupBy(col("u"), col("v")).agg(count(lit(1))))
      }
      graft.operators.Materialize.freeAll(s)
    }
    s.stop()
  }
}
