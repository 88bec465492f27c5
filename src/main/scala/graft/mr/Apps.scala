package graft.mr

/** The reference's application plugins re-expressed as MRApp instances.
  * Each has a DataFrame twin in graft.queries (tested to agree in
  * MRDifferentialSpec). Citations are into /root/reference. */
object Apps {

  /** Word count (mr-main/mrapps/wc.go:21-42): tokenize on runs of
    * non-letters (unicode.IsLetter complement ≈ \p{L}), case-sensitive,
    * emit (word,"1"), reduce = count. */
  object WordCount extends MRApp {
    def map(filename: String, contents: String): Seq[KV] =
      contents.split("[^\\p{L}]+").iterator
        .filter(_.nonEmpty).map(KV(_, "1")).toSeq
    def reduce(key: String, values: Seq[String]): String =
      values.size.toString
  }

  /** Inverted index (mr-main/mrapps/indexer.go:21-40): per-doc distinct
    * words; reduce = "<n> <docs sorted, comma-joined>". */
  object Indexer extends MRApp {
    def map(filename: String, contents: String): Seq[KV] =
      contents.split("[^\\p{L}]+").iterator
        .filter(_.nonEmpty).toSet[String]
        .map((w: String) => KV(w, filename)).toSeq
    def reduce(key: String, values: Seq[String]): String =
      s"${values.size} ${values.sorted.mkString(",")}"
  }

  /** Credit query (mr-main/mrapps/credit.go:21-58): CSV with header,
    * skip malformed rows, WHERE year==2023 AND score>400,
    * GROUP BY agency, COUNT. Value = user id; reduce counts. */
  object Credit extends MRApp {
    def map(filename: String, contents: String): Seq[KV] =
      contents.split('\n').iterator.drop(1).flatMap { line =>
        val f = line.split(',')
        if (f.length < 4) None
        else (f(2).trim.toIntOption, f(3).trim.toIntOption) match {
          case (Some(year), Some(score)) if year == 2023 && score > 400 =>
            Some(KV(f(1).trim, f(0).trim))
          case _ => None
        }
      }.toSeq
    def reduce(key: String, values: Seq[String]): String =
      values.size.toString
  }

  /** crash.go/nocrash.go payload (mr-main/mrapps/crash.go:36-57) minus
    * the fault injection (Spark owns retry — tests inject faults via a
    * throwing wrapper instead): 4 fixed keys of file metadata; reduce =
    * values sorted, space-joined. */
  object MetadataAgg extends MRApp {
    def map(filename: String, contents: String): Seq[KV] = Seq(
      KV("a", filename),
      KV("b", filename.length.toString),
      KV("c", contents.length.toString),
      KV("d", "xyzzy"))
    def reduce(key: String, values: Seq[String]): String =
      values.sorted.mkString(" ")
  }

  /** early_exit.go:19-36: per-file "1", count per key. */
  object FileCount extends MRApp {
    def map(filename: String, contents: String): Seq[KV] =
      Seq(KV(filename, "1"))
    def reduce(key: String, values: Seq[String]): String =
      values.size.toString
  }
}
