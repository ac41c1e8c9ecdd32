package graft

import scala.util.Random

import graft.operators.TrailingWindows
import graft.store.OnlineFeatureStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style oracles (SURVEY.md §5.2) over seeded random inputs:
  * trailing-window aggregates vs an O(n^2) brute force on random keyed
  * sequences (dense timestamps to exercise ties), and store
  * last-write-wins vs a max-by-event-time fold of the put log.
  * (Plain seeded `Random` rather than scalacheck's scalatest bridge —
  * the offline dependency set has no scalatestplus artifact.)
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  test("trailing window count/sum match brute force on random keyed sequences") {
    (1 to 12).foreach { seed =>
      val rnd = new Random(seed)
      val events = List.fill(40)(
        (1L + rnd.nextInt(3), rnd.nextInt(2000).toLong * 1000000L, 1L + rnd.nextInt(100000)))
      val df = events.toDF("k", "ord_us", "cents")
        .withColumn("ts", timestamp_micros($"ord_us"))
      val got = TrailingWindows
        .aggregates(df, "k", "ts", "cents", Seq("h" -> 600L))
        .select($"k", $"ord_us", $"cents", $"cnt_h", $"sum_h")
        .as[(Long, Long, Long, Long, Long)]
        .collect()
      assert(got.length == events.length, s"seed $seed: row count")
      val gotSorted = got.sortBy(r => (r._1, r._2, r._3, r._4, r._5)).toSeq
      val expSorted = events.map { case (k, t, c) =>
        val in = events.filter { case (k2, t2, _) =>
          k2 == k && t2 <= t && t2 >= t - 600L * 1000000L
        }
        (k, t, c, in.size.toLong, in.map(_._3).sum)
      }.sortBy(r => (r._1, r._2, r._3, r._4, r._5))
      assert(gotSorted == expSorted, s"seed $seed: window mismatch")
    }
  }

  test("KMV buffer: any partitioning and merge order yields the k smallest distinct hashes") {
    import graft.functions.{KmvBuffer, KmvDistinctAgg}
    val agg = KmvDistinctAgg(
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(0L)), 16, "kmv")
    (1 to 25).foreach { seed =>
      val rnd = new Random(seed)
      // heavy duplication + skew: the bounded set must stay exact anyway
      val hvs = List.fill(400)(rnd.nextInt(120).toLong)
      val truth = hvs.distinct.sorted.take(16)
      // random partitioning, each chunk its own partial buffer
      val chunks = rnd.shuffle(hvs).grouped(1 + rnd.nextInt(50)).toList
      val partials = chunks.map { c =>
        val b = new KmvBuffer(16)
        c.foreach(b.add)
        // serde round-trip every partial — the shuffle path
        agg.deserialize(agg.serialize(b))
      }
      // merge in shuffled order (the reduce tree is nondeterministic)
      val merged = rnd.shuffle(partials).reduce { (a, b) => agg.merge(a, b); a }
      assert(merged.hashes.size == truth.size, s"seed $seed: size")
      assert(merged.hashes.toArray.toSeq.map(_.asInstanceOf[Long]).sorted == truth,
        s"seed $seed: contents")
    }
  }

  test("KMV sample buffer: any partitioning and merge order yields the k smallest distinct pairs") {
    import graft.functions.{KmvSampleAgg, KmvSampleBuffer}
    val agg = KmvSampleAgg(
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(0L)),
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(0L)), 16, "kq")
    (1 to 25).foreach { seed =>
      val rnd = new Random(seed)
      // duplication, skew, AND colliding hashes with different payloads —
      // the pair ordering must keep survival order-independent
      val pairs = List.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(5).toLong))
      val truth = pairs.distinct.sorted.take(16)
      val chunks = rnd.shuffle(pairs).grouped(1 + rnd.nextInt(50)).toList
      val partials = chunks.map { c =>
        val b = new KmvSampleBuffer(16)
        c.foreach { case (h, v) => b.add(h, v) }
        agg.deserialize(agg.serialize(b)) // serde round-trip = shuffle path
      }
      val merged = rnd.shuffle(partials).reduce { (a, b) => agg.merge(a, b); a }
      val got = {
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
        merged.pairs.forEach(p => out += p)
        out.toList
      }
      assert(got == truth, s"seed $seed: bottom-k pair set diverged")
    }
  }

  test("bottom-k buffer: any partitioning and merge order yields the k smallest pairs, ranked") {
    import graft.functions.{BottomKAgg, BottomKBuffer}
    val agg = BottomKAgg(
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(0.0)),
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(0L)), 16)
    (1 to 25).foreach { seed =>
      val rnd = new Random(seed)
      // duplicated keys with distinct ids (the ANN tie case), negative keys
      // (descending ranks arrive negated), and -0.0/0.0 collisions
      val pairs = List.fill(400)(
        (if (rnd.nextInt(20) == 0) -0.0 else (rnd.nextInt(30) - 15).toDouble / 4.0,
          rnd.nextInt(60).toLong))
      val chunks = rnd.shuffle(pairs).grouped(1 + rnd.nextInt(50)).toList
      val partials = chunks.map { c =>
        val b = new BottomKBuffer(16)
        c.foreach { case (k, id) => b.add(k, id) }
        agg.deserialize(agg.serialize(b)) // serde round-trip = shuffle path
      }
      val merged = rnd.shuffle(partials).reduce { (a, b) => agg.merge(a, b); a }
      val got = {
        val out = scala.collection.mutable.ListBuffer.empty[(Double, Long)]
        merged.pairs.forEach(p => out += p)
        out.toList
      }
      // scala Ordering[Double] and Double.compare agree except on the
      // -0.0/0.0 pair order among EQUAL ids — compare via java semantics
      val truthJava = pairs.distinct
        .sortWith((a, b) =>
          if (a._1 != b._1 || java.lang.Double.compare(a._1, b._1) != 0)
            java.lang.Double.compare(a._1, b._1) < 0
          else a._2 < b._2)
        .take(16)
      assert(got == truthJava, s"seed $seed: bottom-k pair set diverged")
      // eval emits 1-based ranks in buffer order
      val arr = agg.eval(merged).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      assert(arr.numElements() == got.size, s"seed $seed: eval size")
      (0 until arr.numElements()).foreach { i =>
        val row = arr.get(i, agg.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        assert(row.getLong(0) == i + 1, s"seed $seed: rank at $i")
        assert(row.getDouble(1) == got(i)._1 && row.getLong(2) == got(i)._2,
          s"seed $seed: pair at $i")
      }
    }
  }

  test("store last-write-wins equals max-by-event-time over any put log") {
    (1 to 30).foreach { seed =>
      val rnd = new Random(seed)
      val puts = List.fill(60)(
        (1L + rnd.nextInt(5), rnd.nextInt(50).toLong, rnd.nextInt(1000).toDouble))
      val store = new OnlineFeatureStore(Seq("v"))
      puts.foreach { case (k, t, v) => store.put(k, t, Array(v)) }
      puts.groupBy(_._1).foreach { case (k, kp) =>
        val maxT = kp.map(_._2).max
        val expect = kp.filter(_._2 == maxT).last._3 // LWW among equal times
        val (storedT, storedV) = store.get(k).get
        assert(storedT == maxT, s"seed $seed key $k: time")
        assert(storedV.toSeq == Seq(expect), s"seed $seed key $k: value")
      }
    }
  }

  test("store TTL: getLive filters by the LWW winner's age; expire removes exactly the dead") {
    (1 to 20).foreach { seed =>
      val rnd = new Random(seed)
      val puts = List.fill(40)(
        (1L + rnd.nextInt(8), rnd.nextInt(100).toLong, rnd.nextInt(1000).toDouble))
      val store = new OnlineFeatureStore(Seq("v"))
      puts.foreach { case (k, t, v) => store.put(k, t, Array(v)) }
      val asOf = 100L
      val ttl = 1L + rnd.nextInt(100)
      val latest = puts.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      latest.foreach { case (k, t) =>
        val live = store.getLive(k, asOf, ttl)
        // strict boundary: a record exactly ttl old is EXPIRED
        if (t + ttl > asOf) assert(live.exists(_._1 == t), s"seed $seed key $k alive")
        else assert(live.isEmpty, s"seed $seed key $k must be expired (t=$t ttl=$ttl)")
        // expiry filters by the WINNER's age — get() still sees the record
        assert(store.get(k).isDefined)
      }
      // the cleaner removes exactly the expired keys, and reads agree
      // before and after it runs (expiry never depended on the cleaner)
      val expectDead = latest.count { case (_, t) => t + ttl <= asOf }
      assert(store.expire(asOf, ttl) == expectDead, s"seed $seed cleaner count")
      assert(store.size == latest.size - expectDead)
      latest.foreach { case (k, t) =>
        assert(store.getLive(k, asOf, ttl).isDefined == (t + ttl > asOf))
      }
    }
  }
}
