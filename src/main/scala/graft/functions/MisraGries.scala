package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary as a native Catalyst
  * TypedImperativeAggregate — the mergeable-summaries form (Agarwal et
  * al., PODS'12): each partition keeps at most k counters; partial
  * summaries merge by summing counts and re-truncating to k via the
  * (k+1)-st-largest subtraction, which preserves the Misra–Gries
  * error bound.
  *
  * GUARANTEE (what callers may rely on): every item with true
  * frequency > n/(k+1) appears in the output candidate list, for any
  * partitioning and any merge order. Items NEAR the threshold may or
  * may not survive depending on partition order, so the candidate list
  * itself is not deterministic — pipelines must confirm candidates
  * with an exact pass (see `text_heavy_hitters`, which broadcast-joins
  * the ≤k candidates back and filters on exact counts; its OUTPUT is
  * deterministic and oracle-checkable even though the sketch isn't).
  *
  * Scale shape: the aggregation state is ≤ k (item, count) pairs per
  * partial buffer regardless of input size — a 100 TB token table
  * aggregates to one k-entry summary with no distinct-key shuffle at
  * all (vs. groupBy word, whose shuffle carries the whole vocabulary).
  *
  * Beyond-reference operator: the reference's only aggregate is
  * per-key reduce after a full shuffle (/root/reference/mr/worker.go:154);
  * a bounded-memory pre-shuffle summary is exactly what it lacked.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ImplicitCastInputTypes {

  require(k > 0, "misra_gries: k must be positive")

  // analysis-time typing: non-string children get an implicit cast
  // (misra_gries(user_id, 8) works) instead of a runtime
  // ClassCastException on the executor. Declared as the public
  // Seq[DataType] — covariant with the parent's private[sql]
  // Seq[AbstractDataType] signature.
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (possibly reused) UnsafeRow backing buffer
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // classic MG decrement-all; zeros drop out. O(k) amortized
          // over the ≥k updates that filled the buffer.
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c == 0L) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-st largest count from everything and keep
      // the strictly-positive survivors (≤ k of them) — the merge rule
      // that keeps the summary's additive undercount ≤ n/(k+1)
      val cut = buf.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0L) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
