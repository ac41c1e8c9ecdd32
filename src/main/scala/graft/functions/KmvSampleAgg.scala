package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Bounded bottom-k SAMPLE state: the k smallest DISTINCT (hash, value)
  * pairs seen, ordered lexicographically. Like [[KmvBuffer]] this is a
  * merge LATTICE — inserts and merges are commutative, associative, and
  * idempotent (the bottom-k of a set under a total order), so partials
  * combine in any order/partitioning to the same buffer. Carrying the
  * VALUE alongside the hash (and ordering by the PAIR, so a 32-bit hash
  * collision between different ids cannot make survival order-dependent)
  * turns the KMV distinct sketch into a uniform random sample of
  * distinct ids WITH payloads — the mergeable building block for
  * distributed quantile estimation.
  */
final class KmvSampleBuffer(val k: Int) {
  // (hash, value) ordered lexicographically; TreeSet of packed pairs
  val pairs = new java.util.TreeSet[(Long, Long)](
    new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
  def add(hv: Long, value: Long): Unit = {
    val p = (hv, value)
    if (pairs.size < k) { pairs.add(p); () }
    else if (pairs.comparator.compare(p, pairs.last()) < 0) {
      if (pairs.add(p)) { pairs.pollLast(); () }
    }
  }
}

/** Bottom-k uniform sample with payload, as a native Catalyst
  * TypedImperativeAggregate — the quantile twin of [[KmvDistinctAgg]]:
  * hash each row's ID with the repo's standard md5 draw, keep the k
  * smallest DISTINCT (hash, value) pairs per group. Because the hash is
  * uniform in the id, the surviving values are a uniform sample of the
  * DISTINCT ids' values, and the p-quantile estimate is simply the
  * sample value at rank ceil(p·m) — computed here for the quartiles so
  * the aggregate's output is O(1) wide. One hash-aggregate pass with
  * map-side partials, O(k) state and O(k·16) serialized bytes per
  * group; at 100 TB the shuffle carries |groups|·k pairs instead of the
  * full value distribution, and no per-group sort exists anywhere. The
  * same lattice argument that makes [[KmvDistinctAgg]] replay-proof in
  * a streaming complete-mode aggregation applies verbatim (the
  * StreamingKmv pattern) — state is flat in stream length and needs no
  * watermark.
  */
case class KmvSampleAgg(
    left: Expression,
    right: Expression,
    k: Int,
    seed: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSampleBuffer]
    with BinaryLike[Expression] {

  require(k >= 2, s"KMV sample needs k >= 2, got $k")

  private def hash32(v: Any): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md
      .digest((seed + "|" + v.toString).getBytes(StandardCharsets.UTF_8))
      .take(4)
      .map(b => f"${b & 0xff}%02x")
      .mkString
    java.lang.Long.parseLong(hex, 16)
  }

  override def createAggregationBuffer(): KmvSampleBuffer = new KmvSampleBuffer(k)

  override def update(buffer: KmvSampleBuffer, input: InternalRow): KmvSampleBuffer = {
    val id = left.eval(input)
    val v = right.eval(input)
    if (id != null && v != null)
      buffer.add(hash32(id), v.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: KmvSampleBuffer, other: KmvSampleBuffer): KmvSampleBuffer = {
    other.pairs.forEach(p => buffer.add(p._1, p._2))
    buffer
  }

  /** struct(m, q25, q50, q75): sample size and the value at rank
    * ceil(p·m) of the sample's values in ascending order (1-indexed) —
    * the classic empirical-quantile pick, deterministic because the
    * value multiset is partitioning-independent.
    */
  override def eval(buffer: KmvSampleBuffer): Any = {
    val m = buffer.pairs.size
    if (m == 0) null
    else {
      val values = new Array[Long](m)
      var i = 0
      buffer.pairs.forEach(p => { values(i) = p._2; i += 1 })
      java.util.Arrays.sort(values)
      def at(p: Double): Long = values(math.ceil(p * m).toInt.max(1) - 1)
      InternalRow(m.toLong, at(0.25), at(0.50), at(0.75))
    }
  }

  override def serialize(buffer: KmvSampleBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.pairs.size)
    bb.putInt(buffer.pairs.size)
    buffer.pairs.forEach(p => { bb.putLong(p._1); bb.putLong(p._2); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSampleBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvSampleBuffer(k)
    (1 to n).foreach(_ => buf.add(bb.getLong, bb.getLong))
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("m", LongType),
    StructField("q25", LongType),
    StructField("q50", LongType),
    StructField("q75", LongType)))

  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSampleAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSampleAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): KmvSampleAgg =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "kmv_sample_quantiles"
}

object KmvSampleAgg {

  /** `kmvSampleQuantiles(id, value, k, seed)` as a Column aggregate —
    * use inside `groupBy(...).agg(...)` exactly like a built-in.
    */
  def kmvSampleQuantiles(id: Column, value: Column, k: Int, seed: String): Column =
    ColumnBridge.column(
      KmvSampleAgg(
        ColumnBridge.expression(id),
        ColumnBridge.expression(value),
        k,
        seed).toAggregateExpression())
}
