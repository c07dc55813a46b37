package graft

import graft.functions.TextHashing
import graft.ops.{Ann, Dedup}

import org.apache.spark.sql.functions._

/** Behavior tests for the probabilistic dedup/ANN paths that the DuckDB
  * oracles deliberately pin to their deterministic subsets (see
  * QueriesText.scala): near-dup recall under genuine perturbation, LSH-vs-
  * brute-force agreement, hashing invariants.
  */
class DedupAnnSpec extends SparkSpecBase {

  private def words(seed: Long, n: Int): String = {
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango")
    (0 until n).map { i =>
      vocab((TextHashing.splitmix64(seed * 7919 + i) >>> 3 % Int.MaxValue).toInt.abs % vocab.size)
    }.mkString(" ")
  }

  test("minhash signature: identical text => identical signature") {
    val a = TextHashing.minhashSig("the quick brown fox jumps over the lazy dog", 64, 3)
    val b = TextHashing.minhashSig("the quick  brown fox jumps over the lazy dog", 64, 3)
    assert(a.toSeq === b.toSeq) // whitespace-insensitive tokenization
  }

  test("minhash estimates jaccard within tolerance") {
    val base = words(1, 200)
    val mutated = base.split(" ").dropRight(20).mkString(" ") // ~0.9 shingle overlap
    val sa = TextHashing.minhashSig(base, 128, 3)
    val sb = TextHashing.minhashSig(mutated, 128, 3)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 128
    val shA = TextHashing.shingles(base, 3).toSet
    val shB = TextHashing.shingles(mutated, 3).toSet
    val trueJ = shA.intersect(shB).size.toDouble / shA.union(shB).size
    assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ")
  }

  test("simhash: small perturbation => small hamming distance") {
    val base = words(2, 300)
    val mutated = base + " extra token"
    val d = java.lang.Long.bitCount(
      TextHashing.simhash64(base) ^ TextHashing.simhash64(mutated))
    assert(d <= 8, s"hamming=$d")
  }

  test("winnowing fingerprint: shared half => shared hashes, disjoint => none") {
    val shared = words(3, 100)
    val a = shared + " " + words(4, 100)
    val b = shared + " " + words(5, 100)
    val fa = TextHashing.winnowFingerprint(a, 5, 4).toSet
    val fb = TextHashing.winnowFingerprint(b, 5, 4).toSet
    assert(fa.intersect(fb).size > fa.size / 4)
    // genuinely disjoint vocabulary (same-vocab word salad shares 5-grams)
    val c = (0 until 100).map(i => s"q${TextHashing.splitmix64(i).toHexString}").mkString(" ")
    val fc = TextHashing.winnowFingerprint(c, 5, 4).toSet
    assert(fa.intersect(fc).size < fa.size / 10)
  }

  test("minhashPairs recalls genuinely perturbed near-dups") {
    import spark.implicits._
    val docs = (0 until 40).flatMap { i =>
      val base = words(i + 100, 150)
      val nearDup = base.split(" ").drop(3).mkString(" ") // high overlap
      Seq((i.toLong, base), (i + 1000L, nearDup))
    }.toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.7)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expected = (0 until 40).map(i => (i.toLong, i + 1000L)).toSet
    val recall = expected.intersect(pairs).size.toDouble / expected.size
    assert(recall >= 0.95, s"recall=$recall found=${pairs.size}")
  }

  test("simhashPairs finds hamming<=3 pairs exhaustively (pigeonhole banding)") {
    import spark.implicits._
    val docs = (0 until 30).flatMap { i =>
      val base = words(i + 500, 200)
      Seq((i.toLong, base), (i + 1000L, base + " zz")) // tiny perturbation
    }.toDF("doc_id", "text")
    // compute true pairs with hamming <= 3 locally
    val local = docs.as[(Long, String)].collect()
    val sigs = local.map { case (id, t) => (id, TextHashing.simhash64(t)) }.toSeq
    val truePairs = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val found = Dedup.simhashPairs(docs, "doc_id", "text", maxDistance = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(found === truePairs) // banding is complete for <= 3 of 4x16 bits
  }

  test("resolveGroups: min-label propagation finds connected components") {
    import spark.implicits._
    // chain 1-2-3-4, pair 10-11, chain 20-21-22 (out of order edges)
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (10L, 11L), (21L, 22L), (20L, 21L))
      .toDF("a_id", "b_id")
    val groups = graft.ops.Dedup.resolveGroups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(groups(1L) === 1L && groups(2L) === 1L && groups(3L) === 1L && groups(4L) === 1L)
    assert(groups(10L) === 10L && groups(11L) === 10L)
    assert(groups(20L) === 20L && groups(21L) === 20L && groups(22L) === 20L)
  }

  test("resolveGroups: one action per iteration (observe-fused convergence)") {
    import spark.implicits._
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, duration: Long): Unit =
        actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    // path graph 1-2-3-4-5-6: min label needs 5 propagation rounds + 1
    // confirming round to converge
    val pairs = (1L until 6L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    spark.listenerManager.register(listener)
    try {
      val resolved = graft.ops.Dedup.resolveGroups(pairs, maxIterations = 10)
      Thread.sleep(300) // QueryExecutionListener delivery is async
      val n = actions.get()
      val groups = resolved.as[(Long, Long)].collect().toMap
      assert((1L to 6L).forall(groups(_) === 1L))
      // 1 initial-labels checkpoint + 6 iteration checkpoints, each carrying
      // the convergence metric via observe; round 1 ran a separate
      // convergence-count action per iteration on an ever-growing plan
      assert(n <= 7, s"expected <= 7 actions (1/iteration), saw $n")
    } finally spark.listenerManager.unregister(listener)
  }

  test("phashPairs: lossy near-duplicate images found (jpeg vs png, same content)") {
    import graft.functions.GraftFunctions
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = (0 until 40).flatMap(s => Seq((2L * s, s.toLong), (2L * s + 1, s.toLong)))
      .toDF("id", "seed")
      .withColumn("fmt", when(col("id") % 2 === 0, lit("png")).otherwise(lit("jpeg")))
      .withColumn("bytes",
        GraftFunctions.genImage(col("seed"), lit(64), lit(48), col("fmt")))
    val pairs = Dedup.phashPairs(df, "id", "bytes", maxDistance = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // every png/jpeg pair of the same content survives the lossy encode
    // within the pigeonhole-complete Hamming bound
    (0 until 40).foreach { s =>
      assert(pairs.contains((2L * s, 2L * s + 1)), s"seed $s png/jpeg pair missing")
    }
  }

  test("ivfTopK: self-neighbors always found; good recall vs brute force") {
    import spark.implicits._
    val vecs = (0 until 200).map { i =>
      val v = (0 until 16).map(d =>
        ((TextHashing.splitmix64(i * 61 + d) >>> 11).toDouble / (1L << 53) * 2 - 1).toFloat)
      (i.toLong, v.toArray)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 10)
    val ivf1 = Ann.ivfTopK(vecs, queries, "vec_id", "embedding", "vec_id",
      dim = 16, nCells = 8, nProbe = 1, k = 1)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    assert(ivf1 === (0 until 10).map(i => (i.toLong, i.toLong)).toSet,
      "query's own cell must contain itself")
    val brute = Ann.bruteForceTopK(vecs, queries, "vec_id", "embedding", "vec_id", 5)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val ivf4 = Ann.ivfTopK(vecs, queries, "vec_id", "embedding", "vec_id",
      dim = 16, nCells = 8, nProbe = 4, k = 5)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf4).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall=$recall") // probing half the cells
  }

  test("ivf bucketed corpus: probe reads ONLY the probed cells' partitions") {
    import spark.implicits._
    val vecs = (0 until 400).map { i =>
      val v = (0 until 16).map(d =>
        ((TextHashing.splitmix64(i * 61 + d) >>> 11).toDouble / (1L << 53) * 2 - 1).toFloat)
      (i.toLong, v.toArray)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 5)
    val path = java.nio.file.Files.createTempDirectory("ivfbucketed").toString
    Ann.ivfWriteBucketed(vecs, path, "vec_id", "embedding", dim = 16, nCells = 8)
    val probed = Ann.ivfTopKBucketed(path, queries, "embedding", "vec_id",
      dim = 16, nCells = 8, nProbe = 2, k = 3)
    // the scan touches only files under the probed cells' directories —
    // the partition-pruned read the 100-TB IVF path claims
    val expectedCells = queries
      .select(explode(Ann.ivfProbeCells(col("embedding").cast("array<double>"),
        16, 8, 2)).as("cell"))
      .distinct().as[Int].collect().toSet
    assert(expectedCells.size < 8, "test must probe a strict subset of cells")
    // (captured at scan time — input_file_name is empty past an exchange)
    val filesRead = spark.read.parquet(path)
      .filter(col("cell").isin(expectedCells.toSeq: _*))
      .select(input_file_name().as("f")).distinct().as[String].collect()
    val cellsRead = filesRead.map(f =>
      "cell=([0-9]+)".r.findFirstMatchIn(f).get.group(1).toInt).toSet
    assert(cellsRead.subsetOf(expectedCells), s"read $cellsRead, probed $expectedCells")
    // and the pruning is static — visible in the plan's partition filters
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), "cell filter must prune at scan")
    // identical results to the unbucketed ivfTopK on the same parameters
    val direct = Ann.ivfTopK(vecs, queries, "vec_id", "embedding", "vec_id",
      dim = 16, nCells = 8, nProbe = 2, k = 3)
      .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    val bucketed = probed.select("q_id", "nn_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(bucketed === direct)
  }

  test("lshTopK agrees with brute force on self-neighbors") {
    import spark.implicits._
    val vecs = (0 until 100).map { i =>
      val v = (0 until 16).map(d =>
        ((TextHashing.splitmix64(i * 31 + d) >>> 11).toDouble / (1L << 53) * 2 - 1).toFloat)
      (i.toLong, v.toArray)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 5)
    val brute = Ann.bruteForceTopK(vecs, queries, "vec_id", "embedding", "vec_id", 1)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    // top-1 of each query is itself (cos=1)
    assert(brute === (0 until 5).map(i => (i.toLong, i.toLong)).toSet)
    val lsh = Ann.lshTopK(vecs, queries, "vec_id", "embedding", "vec_id", 16, 8, 1)
      .select("q_id", "nn_id").as[(Long, Long)].collect().toSet
    // identical vectors share every bucket: self-neighbor always found
    assert(lsh === brute)
  }
}
