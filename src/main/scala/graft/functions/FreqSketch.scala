package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters aggregate over TOKENS of a text column —
  * the bounded-state top-k path for corpus vocabulary statistics at
  * 100 TB. The exact form (`explode(split(text)) → groupBy(token)`)
  * materializes one row per token occurrence and shuffles every distinct
  * token; this aggregate tokenizes INSIDE `update` (no intermediate rows
  * leave the scan stage) and each partial buffer holds at most `capacity`
  * counters, so the shuffle is `capacity × partitions` rows no matter the
  * corpus — with the classic deterministic guarantee: every token whose
  * true frequency exceeds `N / capacity` is retained, and each reported
  * count is within `N / capacity` BELOW its true count (Misra-Gries never
  * overestimates). When the vocabulary fits the capacity, no decrement
  * ever fires and the counts are EXACT — the regime the q120 oracle pins
  * against DuckDB's exact aggregation.
  *
  * Merge follows Agarwal et al. (mergeable summaries): sum counters, and
  * when the union exceeds capacity subtract the (capacity+1)-th largest
  * count from everything, dropping non-positives — the error bound
  * composes across any partitioning (spec-pinned).
  *
  * Tokens are single-space-separated runs (the [[TextExpressions]] /
  * DuckDB `string_split(text, ' ')` convention); empty tokens (from
  * consecutive spaces) never count. Output: `array<struct<token, cnt>>`
  * sorted by (cnt desc, token asc) — a deterministic total order.
  */
object FreqSketch {

  /** The MG summary: token → counter, at most `capacity` live entries. */
  final class MGBuffer(val capacity: Int) {
    val counts = new java.util.HashMap[String, Long](capacity * 2)

    def addToken(tok: String): Unit = {
      val cur = counts.get(tok)
      if (cur != 0L) counts.put(tok, cur + 1L)
      else if (counts.size < capacity) counts.put(tok, 1L)
      else {
        // full + unseen token: decrement ALL (removing zeros), discard
        // the token — each decrement cancels one prior increment, so the
        // total decrement work is bounded by the input size (amortized
        // O(1) per token)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }

    def addText(text: UTF8String): Unit = {
      val s = text.toString
      val n = s.length
      var start = 0
      var i = 0
      while (i <= n) {
        if (i == n || s.charAt(i) == ' ') {
          if (i > start) addToken(s.substring(start, i))
          start = i + 1
        }
        i += 1
      }
    }

    def mergeIn(other: MGBuffer): Unit = {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        counts.merge(e.getKey, e.getValue, (a, b) => a + b)
      }
      if (counts.size > capacity) {
        // subtract the (capacity+1)-th largest count; ≤ 2·capacity values
        val vals = new Array[Long](counts.size)
        var i = 0
        val vi = counts.values().iterator()
        while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - capacity - 1)
        val ci = counts.entrySet().iterator()
        while (ci.hasNext) {
          val e = ci.next()
          if (e.getValue <= cut) ci.remove() else e.setValue(e.getValue - cut)
        }
      }
    }
  }

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  /** misra_gries(text, capacity): bounded heavy-hitter counters. */
  case class MisraGries(child: Expression, capacity: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MGBuffer] with UnaryLike[Expression] {
    require(capacity > 0, s"capacity must be positive, got $capacity")

    override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

    override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
      val v = child.eval(input)
      if (v != null) buffer.addText(v.asInstanceOf[UTF8String])
      buffer
    }

    override def merge(buffer: MGBuffer, other: MGBuffer): MGBuffer = {
      buffer.mergeIn(other)
      buffer
    }

    override def eval(buffer: MGBuffer): Any = {
      val entries = new Array[(String, Long)](buffer.counts.size)
      var i = 0
      val it = buffer.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
      }
      val sorted = entries.sortBy { case (t, c) => (-c, t) }
      new GenericArrayData(sorted.map { case (t, c) =>
        InternalRow(UTF8String.fromString(t), c) }.toArray[Any])
    }

    override def serialize(buffer: MGBuffer): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buffer.counts.size)
      val it = buffer.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val b = e.getKey.getBytes("UTF-8")
        out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): MGBuffer = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = new MGBuffer(capacity)
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf.counts.put(new String(b, "UTF-8"), in.readLong())
        i += 1
      }
      buf
    }

    override def dataType: DataType = resultType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_misra_gries"
    override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): MisraGries =
      copy(child = newChild)
  }
}
