package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Bounded KMV state: the DISTINCT k smallest 32-bit hash values seen.
  * Insertion keeps the set size ≤ k absolutely, so a partial aggregate
  * is O(k) memory and O(k·8) serialized bytes no matter how many rows
  * flow through it.
  */
final class KmvBuffer(val k: Int) {
  val hashes = new java.util.TreeSet[java.lang.Long]()
  def add(hv: Long): Unit =
    if (hashes.size < k) { hashes.add(hv); () }
    else if (hv < hashes.last()) {
      if (hashes.add(hv)) { hashes.pollLast(); () }
    }
}

/** k-minimum-values DISTINCT sketch as a native Catalyst
  * TypedImperativeAggregate — the aggregation-operator form of the k1
  * gate's window+sort derivation (Bar-Yossef et al. 2002, "Counting
  * distinct elements in a data stream"): ONE hash-aggregate pass with
  * map-side partials, O(k) state per group, O(k) merge — at 100 TB the
  * shuffle carries |groups|·k hash values instead of |groups|·|entities|
  * ranked rows, and no per-group sort exists anywhere.
  *
  * Parity contract: the hash is the repo's standard md5 draw (first 8
  * hex chars of md5("seed|" ++ value-as-string) as an unsigned 32-bit
  * value), identical to [[graft.operators.Sketches.hash32]] and the
  * DuckDB oracles — and the k smallest DISTINCT values of a set are
  * partitioning- and order-independent, which is what makes an
  * imperative aggregate bit-exactly oracle-able at all. Returns
  * struct(m, hk, est_nd): observed sketch size, k-th minimum, and the
  * (k−1)·2³²/hk estimator (exact m below saturation) — the exact
  * columns k1 derives.
  */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    seed: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer]
    with UnaryLike[Expression] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  private def hash32(v: Any): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md
      .digest((seed + "|" + v.toString).getBytes(StandardCharsets.UTF_8))
      .take(4)
      .map(b => f"${b & 0xff}%02x")
      .mkString
    java.lang.Long.parseLong(hex, 16)
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(hash32(v))
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.hashes.forEach(h => buffer.add(h))
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val m = buffer.hashes.size.toLong
    if (m == 0L) null
    else {
      val hk = buffer.hashes.last().longValue()
      val est = if (m < k) m else (k - 1).toLong * 4294967296L / hk
      InternalRow(m, hk, est)
    }
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.hashes.size)
    bb.putInt(buffer.hashes.size)
    buffer.hashes.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    (1 to n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("m", LongType),
    StructField("hk", LongType),
    StructField("est_nd", LongType)))

  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvDistinctAgg =
    copy(child = newChild)

  override def prettyName: String = "kmv_distinct"
}

object KmvDistinctAgg {

  /** `kmvDistinct(col, k, seed)` as a Column aggregate — use inside
    * `groupBy(...).agg(...)` exactly like a built-in.
    */
  def kmvDistinct(entity: Column, k: Int, seed: String): Column =
    ColumnBridge.column(
      KmvDistinctAgg(ColumnBridge.expression(entity), k, seed).toAggregateExpression())
}
