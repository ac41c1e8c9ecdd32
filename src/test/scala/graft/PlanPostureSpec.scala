package graft

import graft.queries.FeatureQueries
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan posture gates for the core pipeline: these encode the
  * scale claims (single shuffle for both window horizons, codegen'd hot
  * path) so a regression that silently doubles the exchanges fails CI.
  */
class PlanPostureSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  private val sf = "/root/testdata/sf0.001"

  /** Operators of the physical plan, unwrapping the AQE root (a bare
    * `executedPlan.collect` on an AdaptiveSparkPlanExec sees only the
    * wrapper — every count would be vacuously zero) — and NOT the plan
    * TEXT, because a cached reference (InMemoryTableScan) re-prints its
    * stored child plan at every use, so text counts vary with whichever
    * suites warmed the CacheManager first.
    */
  private def physicalOps(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val root = df.queryExecution.executedPlan
    val inner = root match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    inner.collect { case p => p }
  }

  test("both trailing horizons share ONE hash exchange and ONE partition sort") {
    val plan = FeatureQueries
      .trailingAgg(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"expected a single hash exchange, got $hashExchanges in:\n$plan")
    // the only sort keyed by user_id is the shared window partition sort
    // (the second sort in the plan is the final ORDER BY event_id)
    val windowSorts = "Sort \\[user_id".r.findAllIn(plan).length
    assert(windowSorts == 1, s"window horizons should share one partition sort; plan:\n$plan")
  }

  test("driver entry() answers with rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() == 1000)
  }

  test("q35 ROLLUP is ONE Expand over ONE scan — never a union of per-level scans") {
    val qe = queries.RelationalQueries.rollupPricing(spark, sf).queryExecution
    val expands = qe.optimizedPlan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }
    assert(expands.size == 1, s"expected exactly one Expand, got ${expands.size}")
    val leaves = qe.optimizedPlan.collectLeaves()
    assert(leaves.size == 1,
      s"all three grouping levels must share one lineitem scan, got ${leaves.size} leaves")
    // the fan-out carries all three grouping sets (detail, subtotal, total)
    assert(expands.head.projections.size == 3,
      s"ROLLUP(a, b) expands to 3 grouping sets, got ${expands.head.projections.size}")
  }

  test("blocked near-dup plans equi-joins only — no nested-loop/cartesian anywhere") {
    val plan = queries.VectorQueries.embedNearDupLsh(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in blocked plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in blocked plan:\n$plan")
  }

  test("random-hyperplane near-dup plans equi-joins only, dots stay codegen'd") {
    val plan = queries.VectorQueries.embedNearDupRp(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in RP plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in RP plan:\n$plan")
    assert(plan.contains("longdotproduct"), "RP sign bits must use the codegen'd dot")
  }

  test("IVF: the only non-equi join is the centroid assignment, whose broadcast side is capped") {
    // assignCells cross-joins a broadcast of the centroid table; autoCells
    // caps that table at 65536 rows REGARDLESS of n (asserted below), so
    // the one BNLJ in the plan is O(1)-bounded — every other join (the
    // in-cell probe) must be an equi-join that shuffles by cell id.
    val df = queries.VectorQueries.annIvf(spark, sf)
    val ops = physicalOps(df)
    val bnlj = ops.count(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
    val cartesian = ops.count(_.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])
    val plan = df.queryExecution.executedPlan.toString
    // 2 Lloyd rounds + final assignment = 3 bounded centroid broadcasts;
    // the in-cell probe self-join duplicates the assignment subtree on its
    // a/b sides, so the physical plan shows each at most twice
    assert(bnlj + cartesian <= 6, s"unexpected unbounded join shape ($bnlj BNLJ/$cartesian cartesian):\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"in-cell probe must be an equi-join:\n$plan")
  }

  test("blocked near-dup: no candidate bucket exceeds the hot-bucket cap") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val bits = operators.Similarity.autoBits(n, 32L, 4)
    val bucketed = operators.Similarity
      .signBucketsExploded(emb, "vec_id", "embedding", bits, math.min(16, 64 / bits))
    val cap = 256L
    val maxUsed = operators.Similarity
      .dropHotBuckets(bucketed, cap)
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    assert(maxUsed <= cap, s"cooled bucket of size $maxUsed exceeds cap $cap")
  }

  test("derived LSH bits keep expected bucket size constant as n grows") {
    import operators.Similarity.autoBits
    // gate corpus (n=500) derives the round-2 constants
    assert(autoBits(500L, 32L, 4) == 4)
    assert(autoBits(500L, 2L, 4) == 8)
    // 1000x the corpus: bits grow ~log2(n), bucket count scales with n
    for (n <- Seq(2000L, 500000L, 500000000L)) {
      val b = autoBits(n, 32L, 4)
      val expectedBucket = n.toDouble / (1L << b)
      assert(expectedBucket <= 32.0, s"n=$n b=$b leaves E[bucket]=$expectedBucket > target")
      assert(b == 4 || expectedBucket > 8.0, s"n=$n b=$b over-partitions (sparse buckets)")
    }
  }

  test("derived IVF cells stay sqrt-bounded and the centroid broadcast never grows past the cap") {
    import operators.Similarity.{autoCells, trainStride}
    // gate corpus: sqrt(500) = 22 cells, full-corpus training (stride 1)
    assert(autoCells(500L, 16, 65536) == 22)
    assert(trainStride(500L, 22, 64L) == 1L)
    // floor guards tiny corpora; cap bounds the broadcast side absolutely
    assert(autoCells(10L, 16, 65536) == 16)
    assert(autoCells(1L << 40, 16, 65536) == 65536, "cap must bound the centroid table")
    // Int-overflow guard (round-3 ADVICE): a 100 TB corpus count must not
    // truncate into a negative/garbage cell count
    assert(autoCells(Long.MaxValue, 16, 65536) == 65536)
    // sampling keeps Lloyd cost ~ cells * perCell, not the corpus: at n=1e9
    // the sample is ~65536*64 = 4.2M vectors, stride ~238
    val bigN = 1000000000L
    val c = autoCells(bigN, 16, 65536)
    val s = trainStride(bigN, c, 64L)
    assert(bigN / s <= c.toLong * 64L + c, s"sample ~${bigN / s} exceeds training budget for $c cells")
  }

  test("binned range join plans a hash equi-join — no nested-loop/cartesian") {
    val plan = FeatureQueries.rangeJoinAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in binned range join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in binned range join:\n$plan")
  }

  test("sessionize: lag + running-sum window layers share ONE exchange and ONE sort") {
    val plan = operators.Sessionize
      .sessionIndex(
        Tables.events(spark, sf).select("user_id", "ord_us"),
        "user_id", "ord_us", 3600L * 1000000L)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"expected one hash exchange, got $hashExchanges in:\n$plan")
    val sorts = "Sort \\[user_id".r.findAllIn(plan).length
    assert(sorts == 1, s"both window layers should share one sort; plan:\n$plan")
  }

  test("salted top-k: phase one partitions by (key, salt) — the hot key never sorts in one task") {
    val plan = operators.Salting
      .saltedTopK(
        Tables.events(spark, sf).select("event_id", "event_type", "value"),
        Seq("event_type"),
        Seq(col("value").desc, col("event_id")),
        5,
        col("event_id"),
        32)
      .queryExecution.executedPlan.toString
    // two window layers: the first keyed on (event_type, __salt) so a hot
    // key's rows spread across 32 reducers, the second on event_type over
    // only the <= k * buckets survivors
    assert("hashpartitioning\\(event_type[^)]*__salt".r.findAllIn(plan).nonEmpty,
      s"phase-1 exchange must include the salt; plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected the two-phase exchanges, got $exchanges; plan:\n$plan")
  }

  test("decontamination matches corpus shingles via broadcast — no corpus-side shuffle for the match") {
    val plan = queries.DocQueries.decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bench-shingle match must broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"non-equi join crept into decontamination:\n$plan")
  }

  test("date-range predicate pushes into the parquet scan; projections prune the read schema") {
    // p4: the range must reach the scan as pushed min/max filters on the
    // RAW ts column (row-group pruning), not sit above the projection
    val p4 = SparkEntry.queries("p4_date_split")(spark, sf)
      .queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p4).mkString("\n")
    assert(
      pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      s"date range not pushed to the events scan:\n$pushed")
    // s5 touches 2 of events' columns; the scan must read exactly those
    val s5 = SparkEntry.queries("s5_hash_split")(spark, sf)
      .queryExecution.executedPlan.toString
    val scanCols = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(s5).map(_.group(1)).getOrElse("")
    val colNames = scanCols.split(",").map(_.trim.takeWhile(_ != '#')).toSet
    assert(colNames == Set("event_id", "user_id"), s"scan not pruned: read $scanCols")
  }

  test("vocab top-k plans TakeOrderedAndProject, not a single-partition global sort") {
    val plan = queries.DocQueries.vocabTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k cut must use per-partition heaps:\n$plan")
  }

  test("similarity hot path uses the native dot-product expression, not HOFs") {
    val plan = queries.VectorQueries.embedNearDup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("longdotproduct"), s"custom expression missing from:\n$plan")
    assert(!plan.contains("zip_with"), "HOF dot product crept back in")
  }

  test("count-min estimate joins the sketch as a broadcast, with map-side partials") {
    val plan = SparkEntry.queries("k2_countmin_spend")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the bounded sketch must broadcast to the probe side:\n$plan")
    // the sketch build's aggregation carries a partial_sum before its
    // exchange — the map-side collapse that bounds shuffle volume at
    // partitions * depth * width
    assert(plan.contains("partial_sum"), s"sketch build lost map-side partials:\n$plan")
  }

  test("tumbling rollup is one hash aggregation pair — no window-function sort") {
    val plan = SparkEntry.queries("w8_tumbling_rollup")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // one exchange for the (window, key) aggregation; orderedOutput's
    // gate-only single-partition collect is SinglePartition, not hash
    assert(exchanges == 1, s"tumbling rollup should shuffle once, got $exchanges:\n$plan")
    assert(!plan.contains("Window"), s"no window operator belongs in a tumbling GROUP BY:\n$plan")
  }

  test("term importance explodes the corpus ONCE — df branch reuses tf's shuffle stage") {
    // df is derived from tf (one row per (doc, token)), so both join
    // branches sit on the SAME hash(doc_id, token) exchange; AQE must
    // serve the df branch from the reused shuffle stage instead of
    // re-running the scan+explode+partial-agg (the r6 shape exploded the
    // corpus twice). Reuse is decided at runtime, so execute first and
    // then read the final adaptive plan.
    val q = SparkEntry.queries("t10_term_importance")(spark, sf)
    q.collect()
    // the adaptive plan string repeats every node under "== Initial Plan
    // ==" — count in the executed (final) section only
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val generates = "Generate explode".r.findAllIn(plan).length
    assert(generates == 1, s"corpus must be exploded exactly once, got $generates:\n$plan")
  }

  test("anti-join blocklist: LeftAnti with a broadcast build side — the corpus never shuffles") {
    val plan = SparkEntry.queries("j5_anti_blocklist")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"blocklist filter must be a broadcast anti-join:\n$plan")
  }

  test("bloom membership: both filter bits and exact corpus set reach probes as broadcasts") {
    val plan = SparkEntry.queries("k3_bloom_membership")(spark, sf)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 2, s"bits + corpus-hash joins must broadcast, got $broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no probe-side shuffle join belongs in the membership check:\n$plan")
  }

  test("TF-IDF near-dup pairs only through the shingle equi-join — no nested-loop/cartesian") {
    val plan = SparkEntry.queries("d13_tfidf_neardup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in d13 plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in d13 plan:\n$plan")
  }

  test("doc chunking plans no exchange at all — chunking is row-local") {
    // build WITHOUT the gate-only output sort: the operator itself must
    // be embarrassingly parallel (explode + expressions over the scan)
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .withColumn("w", graft.operators.TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .select(
        col("doc_id"),
        explode(sequence(lit(0L), col("n_tokens") - 1, lit(15L))).as("start_tok"),
        col("w"))
      .withColumn("chunk", slice(col("w"), (col("start_tok") + 1).cast("int"), lit(20)))
      .select(col("doc_id"), md5(array_join(col("chunk"), " ").cast("binary")).as("h"))
    val plan = docs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("market basket pairs only through the order-key equi-join — no nested-loop/cartesian") {
    // the one allowed cross join is the broadcast of the 1-row order count
    val plan = queries.RelationalQueries.marketBasket(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in q18 plan:\n$plan")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 1, s"q18 allows only the 1-row count broadcast, got $bnlj BNLJ:\n$plan")
  }

  test("PQ encoding aggregates map-side (partial min_by), codebook joins broadcast") {
    val plan = queries.VectorQueries.pqTopKQuery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in v10 plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in v10 plan:\n$plan")
    // the argmin encodes as partial+final min_by hash aggregation, so the
    // exchange carries n*m code rows, not the n*m*k joined candidates
    assert(
      "partial_min_by|partial.*min_by".r.findFirstIn(plan).isDefined ||
        plan.contains("min_by"),
      s"PQ encoding should be a min_by aggregation:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"codebook should broadcast:\n$plan")
  }

  test("MMR greedy rounds are checkpointed: composed plan linear, no cartesian") {
    val plan = queries.VectorQueries.mmrDiverse(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in v9 plan:\n$plan")
    // each greedy round reads the running state twice (pick window + next
    // state's join), so lazy composition DOUBLES the plan per round — the
    // round-12 beamSearch disease (v9 measured 11,628 formatted lines /
    // 981 Exchanges before the round-13 fix). Rounds are localCheckpointed
    // (the pairs-frame broadcast joins execute inside those bounded round
    // jobs), so the composed plan must read checkpoint scans and stay
    // small — linear in selectK, not exponential.
    assert(
      "Scan ExistingRDD".r.findAllIn(plan).length >= 3,
      s"greedy rounds should read localCheckpointed state:\n$plan")
    val lines = plan.linesIterator.length
    assert(lines < 1500, s"v9 plan re-expanded to $lines lines — round checkpointing broken")
  }

  test("d18: probing the standing band index never re-shuffles the corpus side") {
    // building the query writes the bucketed index eagerly; the returned
    // frame is the probe plan against the standing table — at most one
    // band_key exchange may appear (the increment side), the corpus side
    // rides the bucket layout
    val probe = queries.DocQueries.incrementalNearDup(spark, sf)
    val plan = probe.queryExecution.executedPlan.toString
    val bandKeyExchanges = "Exchange hashpartitioning\\(band_key".r.findAllIn(plan).length
    assert(
      bandKeyExchanges <= 1,
      s"corpus band index must not re-shuffle ($bandKeyExchanges band_key exchanges):\n$plan")
    assert(probe.count() > 0, "the incremental probe should surface candidates")
  }

  test("IVF+PQ: only bounded centroid broadcasts go non-equi; ADC scan is equi + broadcast") {
    // tree-based count (see the v3 posture test: cached references
    // re-print their stored plans, inflating text counts)
    val df = queries.VectorQueries.ivfPqTopKQuery(spark, sf)
    val ops = physicalOps(df)
    val plan = df.queryExecution.executedPlan.toString
    assert(ops.count(_.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]) == 0,
      s"cartesian in v12 plan:\n$plan")
    // the only BNLJs are the capped centroid-table assignment broadcasts
    // (corpus + query sides, 2 Lloyd rounds, subtrees duplicated at most
    // twice — the v3 bound); the candidate and code joins must be equi
    val bnlj = ops.count(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
    assert(bnlj <= 8, s"unbounded join shape ($bnlj BNLJ) in v12 plan:\n$plan")
    assert(
      plan.contains("BroadcastHashJoin"),
      s"the per-query PQ lookup table should broadcast into the ADC scan:\n$plan")
  }

  test("g9: link prediction wedges through equi-joins only; edges leave via LeftAnti") {
    val plan = queries.RelationalQueries.linkPrediction(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in g9 plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in g9 plan:\n$plan")
    assert(plan.contains("LeftAnti"), s"existing edges must leave via an anti-join:\n$plan")
  }

  test("q26: both correlations plan as LeftSemi/LeftAnti — no fan-out joins or dedup") {
    val plan = queries.RelationalQueries.waitingSuppliers(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in q26 plan:\n$plan")
  }

  test("q24: the correlated per-part average is ONE partkey window, not a self-join") {
    val plan = queries.RelationalQueries.smallQtyRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    // the 20%-of-average predicate must ride a window over the filtered
    // join output — a second lineitem scan would double the fact I/O
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"expected exactly lineitem+part scans, got $scans:\n$plan")
    assert("Sort \\[l_partkey".r.findAllIn(plan).nonEmpty,
      s"per-part window sort missing:\n$plan")
  }

  test("t24: RAKE pairs only through token/group equi-joins — never corpus x corpus") {
    val plan = queries.DocQueries.rakeKeywords(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in t24 plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in t24 plan:\n$plan")
  }

  test("q22: market share numerator and denominator share ONE fact-chain pass") {
    // the focal-nation split is a conditional aggregation, so the plan
    // must contain exactly one lineitem scan (plus one per dimension)
    val plan = queries.RelationalQueries.marketShare(spark, sf)
      .queryExecution.executedPlan.toString
    val liScans = "FileScan parquet \\[l_".r.findAllIn(plan).length
    assert(liScans == 1, s"fact table must be scanned once, got $liScans:\n$plan")
  }

  test("q29: brand/size conjuncts push into the part scan; disjunction never degrades the join") {
    val plan = queries.RelationalQueries.disjunctiveRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in q29 plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in q29 plan:\n$plan")
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).mkString("\n")
    assert(
      pushed.contains("In(p_brand") || pushed.contains("p_brand"),
      s"brand filter not pushed to the part scan:\n$pushed")
    assert(
      pushed.contains("GreaterThanOrEqual(p_size,1)"),
      s"common size conjunct not pushed:\n$pushed")
  }

  test("g13: every LPA round is hash-agg argmax — no Window, no cartesian, anywhere") {
    val plan = queries.RelationalQueries.labelPropagation(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"LPA argmax must be max(struct), not a rank window:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in LPA plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in LPA plan:\n$plan")
  }

  test("s13: budget and quota frames broadcast; the only window partitions by source") {
    val df = queries.DocQueries.domainMix(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"budget/quota frames must broadcast:\n$plan")
    // the remainder-rank window must be keyed (domain catalog), never empty
    val analyzed = df.queryExecution.optimizedPlan
    val emptySpecWindows = analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window if w.partitionSpec.isEmpty => w
    }
    assert(emptySpecWindows.isEmpty, s"unpartitioned window in s13:\n$analyzed")
  }

  test("m5: phash pairing goes through the band equi-join — no nested-loop/cartesian") {
    val plan = multimodal.ImagePhash.imagePhash(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in phash plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in phash plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"band self-join must be an equi-join:\n$plan")
  }

  test("g12: k-core rounds prune via semi-joins over the shrinking edge frame") {
    val plan = queries.RelationalQueries.kCore(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"survivor filtering must be left-semi:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"unbounded join in k-core plan:\n$plan")
  }

  test("g14: HITS rounds are keyed join+agg only — no windows, no cartesian") {
    val plan = queries.RelationalQueries.hits(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"HITS must iterate via join+agg, not windows:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"unbounded join in HITS plan:\n$plan")
  }

  test("a26: the CUSUM scan shares ONE (user, time) sort; no unpartitioned window") {
    val df = queries.FeatureQueries.cusumDrift(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    val windows = optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "CUSUM must plan its running sum/min as windows")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned window in a26:\n$optimized")
    // both running layers ride one exchange+sort pair (the w1 discipline)
    val plan = df.queryExecution.executedPlan.toString
    val sorts = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(sorts <= 2, s"CUSUM layers should reuse the user partitioning:\n$plan")
  }

  test("t29: the batching rank window partitions by (shard, band) — never global") {
    val optimized = queries.DocQueries.lengthBatching(spark, sf)
      .queryExecution.optimizedPlan
    val windows = optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.size == 2),
      s"batching window must key on (shard, band):\n$optimized")
  }

  test("m7: fingerprint pairing is an equi self-join on (n_frames, fp)") {
    val plan = multimodal.AudioFingerprint.audioFingerprint(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"fingerprint pairing must stay an equi-join:\n$plan")
  }

  test("x1: partitioned-table probe prunes to the named event types at planning time") {
    // build the partitioned table (the x1 lifecycle), then inspect the
    // probe-only plan: the event_type predicate must resolve against
    // partition METADATA (only the named types' directories listed),
    // with no row-level event_type filter left in the scan.
    FeatureQueries.partitionedScan(spark, sf).collect()
    val probe = FeatureQueries.partitionedScanProbe(spark)
    // the scan sits under the AQE wrapper — unwrap before collecting
    val root = probe.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = root.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.isDefined, "probe should read through a file scan")
    // expected directory counts derive from the fixture, not a literal:
    // the table has one directory per distinct event_type, and the probe
    // must keep exactly the ones its isin() predicate names
    val allTypes = Tables
      .events(spark, sf)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    val keptTypes = allTypes.intersect(Set("purchase", "error"))
    assert(
      keptTypes.nonEmpty && keptTypes.size < allTypes.size,
      s"fixture must make pruning observable (types: $allTypes)")
    assert(
      scan.get.selectedPartitions.partitionCount == keptTypes.size,
      s"expected ${keptTypes.size} pruned partitions (of ${allTypes.size}), " +
        s"got ${scan.get.selectedPartitions.partitionCount}")
    assert(
      scan.get.dataFilters.isEmpty,
      s"event_type must be a partition filter, not a data filter: ${scan.get.dataFilters}")
    assert(
      scan.get.partitionFilters.exists(_.toString.contains("event_type")),
      s"partition filters should carry event_type: ${scan.get.partitionFilters}")
  }

  test("j11: chained as-of joins cost two user-keyed window passes — no range BNLJ") {
    val df = queries.FeatureQueries.trainingDataset(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size == 2 && windows.forall(_.partitionSpec.nonEmpty),
      s"two keyed as-of windows expected, got ${windows.size}")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"the as-of chain must stay union+window, never a range join:\n$plan")
    // each AsOfJoin pass = exactly one exchange keyed by user_id ALONE
    // (the feature-group rollups exchange on composite keys and don't match)
    val userOnly = "hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r.findAllIn(plan).length
    assert(userOnly == 2,
      s"chained as-of should cost exactly two user-keyed exchanges, got $userOnly:\n$plan")
  }

  /** The scale-killer class r8 found — `Window.orderBy(...)` with no
    * PARTITION BY funnels its whole input through ONE partition — is
    * banned as an INVARIANT over every gated query, not just the three
    * call sites it was originally fixed at. The whitelist below names the
    * only gates allowed to keep an unpartitioned window, each justified
    * by a value/dimension-bounded input frame (never corpus-sized); the
    * test fails BOTH ways: an un-whitelisted gate that plans one, and a
    * stale whitelist entry whose gate no longer plans one.
    */
  test("sweep: no gated query plans an unpartitioned window over an unbounded frame") {
    // gate -> why its unpartitioned window is value/dimension-bounded
    val whitelist: Map[String, String] = Map(
      "t20_bm25_rank" -> "rank minted AFTER limit(10): window input is <= 10 rows",
      "v23_hybrid_rrf" -> "rank minted AFTER limit(10) on the fused <= 20-row frame",
      "t25_vocab_growth" -> "cumulative scan over the VocabBuckets-row bucket frame (O(buckets))",
      "w20_concurrency" -> "global prefix over the per-bin net-delta frame (corpus span / bin width rows)",
      "a10_chi_square" -> "grand-total window over the <= |event types| * 7 contingency-cell frame",
      "a22_cramers_v" -> "same contingency-cell frame as a10 (<= |types| * 7 rows)",
      "a11_spend_autocorr" -> "lag window over the daily rollup (#days rows, never raw events)",
      "a30_runs_test" -> "rank/lag windows over the same daily rollup as a11 (#days rows)")
    val unknown = whitelist.keySet.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"whitelist names that are not gates: ${unknown.mkString(", ")}")
    // operators/Ranks' two-pass scan carries ONE unpartitioned window by
    // design: the exclusive prefix over the per-partition totals frame —
    // one row per range partition (<= numParts), bounded by cluster
    // parallelism, never by data. It is recognizable by ordering on the
    // Ranks-internal `__pid` attribute; exempt it structurally so every
    // Ranks caller (a20/a21/a23/a24 today) stays covered by the sweep for
    // any OTHER unpartitioned window it might add.
    def isRanksPidPrefix(w: org.apache.spark.sql.catalyst.plans.logical.Window): Boolean =
      w.orderSpec.nonEmpty &&
        w.orderSpec.forall(_.child.references.forall(_.name == "__pid"))
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    val cleanWhitelisted = scala.collection.mutable.ListBuffer.empty[String]
    val cartesians = scala.collection.mutable.ListBuffer.empty[String]
    CacheScope.scoped(spark) {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        val qe = fn(spark, sf).queryExecution
        val emptySpec = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty && !isRanksPidPrefix(w) =>
            w
        }
        if (emptySpec.nonEmpty && !whitelist.contains(name)) offenders += name
        if (emptySpec.isEmpty && whitelist.contains(name)) cleanWhitelisted += name
        // a true CartesianProduct (a non-broadcast cross join — every
        // crossJoin in the repo pairs a broadcast/1-row frame, which
        // plans as BNLJ with a bounded build side) is never acceptable:
        // it shuffles BOTH sides everywhere. Banned with NO whitelist.
        if (qe.executedPlan.toString.contains("CartesianProduct")) cartesians += name
      }
    }
    assert(
      offenders.isEmpty,
      s"unpartitioned windows outside the whitelist (use operators/Ranks or a keyed window): " +
        offenders.mkString(", "))
    assert(
      cleanWhitelisted.isEmpty,
      s"stale whitelist entries (gate no longer plans an unpartitioned window): " +
        cleanWhitelisted.mkString(", "))
    assert(
      cartesians.isEmpty,
      s"CartesianProduct planned (broadcast the small side): ${cartesians.mkString(", ")}")
  }

  /** The unpartitioned-window ban's sibling — the scale-killer r11 found:
    * a rank window partitioned ONLY by query_id funnels its whole input
    * onto |queries| partitions (32 at the gates) and sorts each run; over
    * a corpus-sized scored frame that is a billions-of-rows sort on a
    * handful of tasks at 100x. The fix is the bounded-heap bottom-k
    * aggregate ([[graft.functions.BottomKAgg]] — map-side partials,
    * O(|queries| * k) shuffle, no sort), now used by every corpus-sized
    * top-k cut (v1/v8/v9/v10/v19 and the exact monitor sides). The
    * whitelist names the only gates allowed to keep a query_id-only
    * window, each justified by an input frame already bounded per query
    * (cell-capped, bucket-capped, beam-bounded, or shortlist-sized —
    * never corpus-sized); the test fails BOTH ways, like the sweep above.
    */
  test("sweep: no gated query rank-windows a corpus-sized frame by query_id alone") {
    // gate -> why its query_id-partitioned window input is bounded per query
    val whitelist: Map[String, String] = Map(
      "v2_ann_signlsh" -> "in-bucket pairs: <= maxBucket rows per query (capBySize before the join)",
      "v3_ann_ivf" -> "in-cell pairs: <= maxCell rows per query (capBySize before the probe join)",
      "v4_ann_ivf_multiprobe" -> "nProbe * maxCell rows per query, cells capped",
      "v5_ivf_index_probe" -> "probe join against the capped bucketed index: <= maxCell rows/query",
      "v14_ivf_incremental" -> "same capped index probe as v5 over base+delta",
      "v21_ann_tombstones" -> "same capped index probe as v5 minus tombstones",
      "v16_filtered_ann" -> "cell-capped probe join with the meta equi-key: <= maxCell rows/query",
      "v12_ivfpq_topk" -> "ADC scan restricted to nProbe capped cells: <= nProbe * maxCell rows/query",
      "v17_graph_ann" -> "beam windows over rounds * beam * degree scored rows per query",
      "v18_graph_index_probe" -> "beam search over the persisted bounded-degree graph (beam * degree rows)",
      "v22_gann_incremental" -> "same beam windows as v17 over the maintained graph (rounds * beam * degree rows)",
      "v19_binary_rerank" -> "exact rerank window over the shortlist join: <= shortlist rows per query",
      "v20_bq_recall" -> "same shortlist-sized rerank window as v19 (top-1)",
      "v7_knn_classify" -> "vote argmax over <= |labels| rows per query",
      "v9_mmr_diverse" -> "greedy rounds over the persisted <= candK-row candidate frame per query",
      "v6_ann_recall" -> "approx side embeds v3's cell-capped probe window; exact side is bottom-k",
      "v13_ivfpq_recall" -> "approx side embeds v12's nProbe*maxCell ADC window; exact side is bottom-k")
    val unknown = whitelist.keySet.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"whitelist names that are not gates: ${unknown.mkString(", ")}")
    def isQueryIdOnly(w: org.apache.spark.sql.catalyst.plans.logical.Window): Boolean =
      w.partitionSpec.nonEmpty &&
        w.partitionSpec.forall(_.references.forall(_.name == "query_id"))
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    val cleanWhitelisted = scala.collection.mutable.ListBuffer.empty[String]
    CacheScope.scoped(spark) {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        val qe = fn(spark, sf).queryExecution
        val qidWindows = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window if isQueryIdOnly(w) => w
        }
        if (qidWindows.nonEmpty && !whitelist.contains(name)) offenders += name
        if (qidWindows.isEmpty && whitelist.contains(name)) cleanWhitelisted += name
      }
    }
    assert(
      offenders.isEmpty,
      s"query_id-only windows outside the whitelist (use BottomKAgg.bottomK for corpus-sized " +
        s"top-k cuts, or justify a bounded input): ${offenders.mkString(", ")}")
    assert(
      cleanWhitelisted.isEmpty,
      s"stale whitelist entries (gate no longer plans a query_id-only window): " +
        cleanWhitelisted.mkString(", "))
  }
}
