package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Fixed-size Bloom bit array: nBits bits packed into longs. A partial
  * aggregate is O(nBits/8) memory regardless of row count, and merge is
  * a word-wise OR — the whole point of making the filter an AGGREGATE:
  * map-side partials mean each shuffle carries one bit array per
  * (group, mapper), never the rows.
  */
final class BloomBuffer(val nBits: Int) {
  val words = new Array[Long](math.max(1, (nBits + 63) / 64))
  def set(pos: Int): Unit = words(pos >>> 6) |= (1L << (pos & 63))
  def get(pos: Int): Boolean = (words(pos >>> 6) & (1L << (pos & 63))) != 0L
  def or(other: BloomBuffer): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }
}

object BloomHash {

  /** The two base hashes for Kirsch–Mitzenmacher double hashing: ONE md5
    * of the value's string form (the repo's standard draw — see
    * [[graft.operators.Sketches.hash32]]), split into two unsigned
    * 32-bit halves; probe j lands at (h1 + j·h2) mod nBits. One digest
    * per row no matter how many probes (Kirsch & Mitzenmacher 2006,
    * "Less hashing, same performance").
    */
  def baseHashes(v: Any): (Long, Long) = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(("bloom|" + v.toString).getBytes(StandardCharsets.UTF_8))
    def u32(off: Int): Long =
      ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
        ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
    (u32(0), u32(4) | 1L) // odd step so probes cycle the whole array
  }

  def positions(v: Any, nBits: Int, nHashes: Int): Array[Int] = {
    val (h1, h2) = baseHashes(v)
    Array.tabulate(nHashes)(j => ((h1 + j.toLong * h2) % nBits).toInt)
  }

  /** Membership test against packed filter bytes (the serialized form
    * [[BloomAgg]] emits) — the read-side half of the contract.
    */
  def mightContain(packed: Array[Byte], nHashes: Int, v: Any): Boolean = {
    val nBits = packed.length * 8
    if (nBits == 0) return false
    positions(v, nBits, nHashes).forall { p =>
      (packed(p >>> 3) & (1 << (p & 7))) != 0
    }
  }
}

/** Bloom filter as a native Catalyst TypedImperativeAggregate (Bloom
  * 1970, "Space/time trade-offs in hash coding with allowable errors"):
  * ONE hash-aggregate pass over the grouped rows emits each group's
  * packed bit array. The motivating group is the data FILE
  * (`_metadata.file_path`): per-file filters become the equality-skipping
  * sidecar that zone maps cannot provide on an unclustered
  * high-cardinality column — a point lookup consults |files| bit arrays
  * and scans only the files that might contain the key. False positives
  * cost an extra file scan, never a wrong row: the filter prunes I/O,
  * results always come from the real scan.
  */
case class BloomAgg(
    child: Expression,
    nBits: Int,
    nHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBuffer]
    with UnaryLike[Expression] {

  require(nBits >= 64 && nBits % 64 == 0, s"nBits must be a positive multiple of 64, got $nBits")
  require(nHashes >= 1 && nHashes <= 16, s"nHashes must be in [1,16], got $nHashes")

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(nBits)

  override def update(buffer: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) BloomHash.positions(v, nBits, nHashes).foreach(buffer.set)
    buffer
  }

  override def merge(buffer: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: BloomBuffer): Any = serialize(buffer)

  override def serialize(buffer: BloomBuffer): Array[Byte] = {
    val out = new Array[Byte](buffer.words.length * 8)
    var i = 0
    while (i < buffer.words.length) {
      val w = buffer.words(i)
      var b = 0
      while (b < 8) {
        out(i * 8 + b) = ((w >>> (b * 8)) & 0xffL).toByte
        b += 1
      }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val buf = new BloomBuffer(nBits)
    var i = 0
    while (i < buf.words.length) {
      var w = 0L
      var b = 0
      while (b < 8) {
        w |= (bytes(i * 8 + b) & 0xffL) << (b * 8)
        b += 1
      }
      buf.words(i) = w
      i += 1
    }
    buf
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)

  override def prettyName: String = "bloom_agg"
}

object BloomAgg {

  /** `bloomAgg(col, nBits, nHashes)` as a Column aggregate — use inside
    * `groupBy(...).agg(...)` exactly like a built-in. Bit layout matches
    * [[BloomHash.mightContain]]: byte i bit b = bit position i*8+b.
    */
  def bloomAgg(value: Column, nBits: Int, nHashes: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(value), nBits, nHashes).toAggregateExpression())
}
