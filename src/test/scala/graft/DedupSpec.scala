package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // jaccard/minhash/simhash tokenize RAW text (normalization is the exact-
  // dedup fingerprint's job), so doc 1 differs from doc 0 only in
  // whitespace — same word multiset, exact dup after normalization.
  private def docs = Seq(
    (0L, "the quick brown fox"),
    (1L, "the quick  brown   fox"),
    (2L, "the quick brown fox jumps"),   // near dup (jaccard 4/5)
    (3L, "completely different words entirely")
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates") {
    val g = Dedup.exactGroups(docs).orderBy("canonical_id")
      .select("canonical_id", "cnt").as[(Long, Long)].collect()
    assert(g.toSeq == Seq((0L, 2L), (2L, 1L), (3L, 1L)))
    assert(Dedup.exactDedup(docs).count() == 3)
  }

  test("jaccard pairs finds the near dup with the exact score") {
    val p = Dedup.jaccardPairs(docs, 1, 0.5)
      .orderBy("a", "b").select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
    assert(p.exists { case (a, b, j) => a == 0L && b == 2L && math.abs(j - 0.8) < 1e-12 })
    assert(p.exists { case (a, b, j) => a == 0L && b == 1L && j == 1.0 })
  }

  test("minhash identical word sets give identical signatures") {
    val sig = Dedup.minhashSignatures(docs, 8).orderBy("doc_id").collect()
    val s0 = sig(0).toSeq.drop(1)
    val s1 = sig(1).toSeq.drop(1)
    assert(s0 == s1)
  }

  test("minhash LSH recall vs exact jaccard on the fixture corpus") {
    val d = Tables.documents(spark, TestSpark.Sf).filter(col("doc_id") < 50)
    val exact = Dedup.jaccardPairs(d, 1, 0.8).select("a", "b")
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashDedupPairs(d, 8, 2, 0.8).select("a", "b")
      .as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH-verified pairs must be exact pairs")
    if (exact.nonEmpty)
      assert(lsh.size.toDouble / exact.size >= 0.8, s"recall ${lsh.size}/${exact.size}")
  }

  test("canonicalGroups: min-label propagation finds connected components") {
    // components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,7}, and 8-as-singleton
    // (absent from pairs entirely)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L)).toDF("a", "b")
    val got = Dedup.canonicalGroups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L))
    // a LONG chain converges: pointer jumping doubles label reach per
    // round, so a 100-hop chain needs ~log2(100) ≈ 7 of the 20 allowed
    // iterations (plain one-hop propagation would need 100)
    val chain = (0L until 100L).map(i => (i, i + 1)).toDF("a", "b")
    val chainLabels = Dedup.canonicalGroups(chain).as[(Long, Long)].collect()
    assert(chainLabels.forall(_._2 == 0L), s"chain did not converge: ${chainLabels.toSeq}")
    // empty pair set → empty labels (no infinite loop)
    assert(Dedup.canonicalGroups(Seq.empty[(Long, Long)].toDF("a", "b")).isEmpty)
  }

  test("canonicalGroups: adversarial 5000-hop chain converges (log-round pointer jumping)") {
    // worst-case diameter for a dedup graph this size; one-hop
    // propagation would need 5000 rounds, pointer jumping needs
    // ~log2(5000) ≈ 13 — far inside the default bound of 64, so the
    // non-convergence throw is unreachable for any realizable graph
    val chain = (0L until 5000L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.canonicalGroups(chain, maxIters = 14).as[(Long, Long)].collect()
    assert(labels.length == 5001)
    assert(labels.forall(_._2 == 0L))
  }

  test("simhash: identical docs hash identically, hamming 0") {
    val sh = Dedup.simhash(docs).orderBy("doc_id").select("simhash").as[Long].collect()
    assert(sh(0) == sh(1))
    val pairs = Dedup.simhashPairs(docs, maxDist = 0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }
}
