package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character n-gram COUNT MAP as a native expression — the
  * text-tier sibling of [[SqDistF]]'s treatment: the composed form
  * (`split(text, "")` → slice/zip_with → explode → count) allocates a
  * String per CHARACTER and shuffles one row per character position,
  * which the 10× rehearsal measured as the engine's most
  * allocation-bound path (SCALING.md wave 20: per-char dual explode at
  * exponent 1.35 before the single-explode fix). This expression walks
  * the UTF-8 BYTES once per row, counts n-grams into a long-keyed open
  * hash (an n-gram of ≤7 bytes — every ASCII and BMP-pair case — packs
  * into one long; longer keys take a boxed fallback), and emits one
  * (ngram → count) map of at most |alphabet|ⁿ entries. Downstream
  * explodes the MAP: for a 5 000-char ASCII doc that is ≤ 729 rows
  * instead of 4 999 — shuffle volume bounded by the alphabet, not the
  * document.
  *
  * Codepoint semantics match `split(text, "")` / DuckDB `substring`:
  * n-grams are over Unicode codepoints (surrogate pairs stay whole),
  * so count values are bit-identical to the composed form's.
  */
case class CharNgramCounts(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1 && n <= 4, s"char_ngram_counts: n must be in [1,4], got $n")
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "char_ngram_counts"
  override def inputTypes = Seq(StringType)

  protected override def nullSafeEval(s: Any): Any =
    CharNgramImpl.ngramCounts(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharNgramImpl.ngramCounts($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : CharNgramCounts = copy(child = newChild)
}

object CharNgramImpl {
  // UTF-8 length of the codepoint starting at byte b (valid input
  // assumed — Spark strings are well-formed UTF-8)
  private def cpLen(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0x80) 1
    else if (u < 0xe0) 2
    else if (u < 0xf0) 3
    else 4
  }

  def ngramCounts(s: UTF8String, n: Int): MapData = {
    val bytes = s.getBytes // may copy when offset-shared; one per row
    val len = bytes.length
    // codepoint start offsets — one pass
    var nCp = 0
    var i = 0
    while (i < len) { i += cpLen(bytes(i)); nCp += 1 }
    val starts = new Array[Int](nCp + 1)
    i = 0; var k = 0
    while (i < len) { starts(k) = i; k += 1; i += cpLen(bytes(i)) }
    starts(nCp) = len
    val total = math.max(nCp - n + 1, 0)
    // long-keyed counting: an n-gram of b bytes (b ≤ 7) packs as
    // big-endian payload | length tag — injective because the tag
    // disambiguates payload lengths (UTF-8 bytes may be 0x00)
    val longKeyed = new java.util.HashMap[java.lang.Long, Array[Long]]()
    val boxed = new java.util.HashMap[UTF8String, Array[Long]]()
    var g = 0
    while (g < total) {
      val from = starts(g)
      val to = starts(g + n)
      val w = to - from
      if (w <= 7) {
        var key = 0L
        var j = from
        while (j < to) { key = (key << 8) | (bytes(j) & 0xffL); j += 1 }
        key = (key << 3) | w.toLong
        val c = longKeyed.get(key)
        if (c == null) longKeyed.put(key, Array(1L)) else c(0) += 1
      } else {
        val ks = UTF8String.fromBytes(bytes, from, w)
        val c = boxed.get(ks)
        if (c == null) boxed.put(ks, Array(1L)) else c(0) += 1
      }
      g += 1
    }
    val m = longKeyed.size() + boxed.size()
    val keys = new Array[Any](m)
    val vals = new Array[Any](m)
    var idx = 0
    val it = longKeyed.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val packed = e.getKey.longValue()
      val w = (packed & 7L).toInt
      val kb = new Array[Byte](w)
      var p = packed >>> 3
      var j = w - 1
      while (j >= 0) { kb(j) = (p & 0xffL).toByte; p >>>= 8; j -= 1 }
      keys(idx) = UTF8String.fromBytes(kb)
      vals(idx) = e.getValue()(0)
      idx += 1
    }
    val it2 = boxed.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      keys(idx) = e.getKey
      vals(idx) = e.getValue()(0)
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
