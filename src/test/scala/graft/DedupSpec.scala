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

  test("dedupSweep: hand-counted operating curve, zero-pair points kept") {
    import graft.queries.TextDedup
    // j(0,1)=1.0, j(0,2)=j(1,2)=0.6: thresholds 0.5/0.6 see 3 pairs over
    // 3 docs; 0.7+ see only the exact pair; the d3 singleton never joins
    val d = Seq(
      (0L, "a b c d"), (1L, "a b c d"), (2L, "a b c e"), (3L, "x y")
    ).toDF("doc_id", "text")
    val r = TextDedup.dedupSweep(d, "doc_id", "text")
      .collect()
    assert(r.length == 5)
    assert(r(0).getDouble(0) == 0.5 && r(0).getLong(1) == 3L &&
      r(0).getLong(2) == 3L && r(0).getDouble(3) == 0.75)
    assert(r(1).getDouble(0) == 0.6 && r(1).getLong(1) == 3L)
    assert(r(2).getDouble(0) == 0.7 && r(2).getLong(1) == 1L &&
      r(2).getLong(2) == 2L && r(2).getDouble(3) == 0.5)
    assert(r(4).getDouble(0) == 0.9 && r(4).getLong(1) == 1L)
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

  test("simhashPairs: banded candidates equal brute-force all-pairs (pigeonhole recall)") {
    // 3 bit errors over 4×8-bit bands leave ≥1 band intact, so the banded
    // shape must reproduce the exact answer — not approximate it
    val d = Tables.documents(spark, TestSpark.Sf).filter(col("doc_id") < 100)
    val sh = Dedup.simhash(d)
    val l = sh.select(col("doc_id").as("a"), col("simhash").as("sa"))
    val r = sh.select(col("doc_id").as("b"), col("simhash").as("sb"))
    val brute = l.crossJoin(r).filter(col("a") < col("b"))
      .select(col("a"), col("b"), Dedup.hamming(col("sa"), col("sb")).as("dist"))
      .filter(col("dist") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    val banded = Dedup.simhashPairs(d, maxDist = 3)
      .select(col("a"), col("b"), col("dist").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("simhashWide: identical docs share the 60-bit signature; wide banding equals brute force") {
    // exact dups keep Hamming 0 at any signature width
    val shw = Dedup.simhashWideOf(docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("t")))
      .orderBy("doc_id").select("simhash").as[Long].collect()
    assert(shw(0) == shw(1))
    // 4×15-bit banding reproduces the exact all-pairs answer at ≤3 —
    // the same pigeonhole as the 32-bit form, wider buckets
    val d = Tables.documents(spark, TestSpark.Sf).filter(col("doc_id") < 100)
    val sh = Dedup.simhashWideOf(d.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("t")))
    val l = sh.select(col("doc_id").as("a"), col("simhash").as("sa"))
    val r = sh.select(col("doc_id").as("b"), col("simhash").as("sb"))
    val brute = l.crossJoin(r).filter(col("a") < col("b"))
      .select(col("a"), col("b"), Dedup.hamming(col("sa"), col("sb")).as("dist"))
      .filter(col("dist") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    val banded = Dedup.simhashPairsWide(d, maxDist = 3)
      .select(col("a"), col("b"), col("dist").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "fixture should contain at least one wide near-dup pair")
    // EMPIRICAL selectivity check (not a structural invariant — the
    // two widths are independent hash projections, so a pair CAN sit
    // at wide distance <=3 while its 32-bit distance is 4): on this
    // vocabulary-correlated fixture the 32-bit output is heavily
    // collision-inflated (512 vs 83k pairs at sf0.1 — SCALE.md), so
    // the wide set is expected well under the narrow count
    val narrow = Dedup.simhashPairs(d, maxDist = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(banded.map(p => (p._1, p._2)).size <= narrow.size)
  }

  test("simhash 3x20 rebanding equals brute force at Hamming <= 2; radius guard trips at 3") {
    // same 60-bit signature as the 4x15 form — only the band
    // arithmetic moves, so equality with brute force at the 3-band
    // pigeonhole radius (<= 2) is the losslessness proof
    val d = Tables.documents(spark, TestSpark.Sf).filter(col("doc_id") < 100)
    val sh = Dedup.simhashWideOf(d.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("t")))
    val l = sh.select(col("doc_id").as("a"), col("simhash").as("sa"))
    val r = sh.select(col("doc_id").as("b"), col("simhash").as("sb"))
    val brute = l.crossJoin(r).filter(col("a") < col("b"))
      .select(col("a"), col("b"), Dedup.hamming(col("sa"), col("sb")).as("dist"))
      .filter(col("dist") <= 2)
      .as[(Long, Long, Int)].collect().toSet
    val banded = Dedup.simhashPairsWide20(d, maxDist = 2)
      .select(col("a"), col("b"), col("dist").cast("int"))
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    // 3 bands cannot guarantee Hamming 3 (3 errors can touch all 3
    // bands) — asking for it must fail loudly, not lose recall silently
    val ex = intercept[IllegalArgumentException] {
      Dedup.simhashPairsWide20(d, maxDist = 3)
    }
    assert(ex.getMessage.contains("maxDist"))
    // nBands*bandBits must fit a positive long signature
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.simhashPairsFrom(sh, maxDist = 2, bandBits = 16, nBands = 4)
    }
    assert(ex2.getMessage.contains("62"))
  }

  test("incrementalDedup classifies exact_dup / near_dup / new with min match id") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "one two three four five")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // normalizes to corpus 0's fingerprint (case, punctuation, spacing)
      (10L, "Alpha,  BETA -- gamma delta!"),
      // same word SET as corpus 1 (token repetition only) → identical
      // minhash signatures (guaranteed LSH candidate), jaccard 1.0,
      // but a different fingerprint → near_dup, not exact
      (11L, "one one two three four five"),
      (12L, "totally unrelated content here")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch)
      .orderBy("doc_id")
      .select("doc_id", "status", "match_id")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(got == Seq(
      (10L, "exact_dup", Some(0L)),
      (11L, "near_dup", Some(1L)),
      (12L, "new", None)))
  }

  test("incrementalDedup: exact_dup takes priority over near_dup") {
    val corpus = Seq((0L, "same words here exactly")).toDF("doc_id", "text")
    val batch = Seq((10L, "same  words here exactly")).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch)
      .select("doc_id", "status", "match_id")
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(got == Seq((10L, "exact_dup", Some(0L))))
  }

  test("bloom might_contain: zero false negatives, fpp-bounded false positives") {
    import graft.functions.BloomFunctions
    val members = spark.range(1000).toDF("id")
    val bytes = BloomFunctions.serialize(
      BloomFunctions.buildLongBloom(members, "id", 1000, 0.01))
    val probed = spark.range(2000)
      .select($"id", BloomFunctions.mightContainLong(bytes, $"id").as("m"))
      .as[(Long, Boolean)].collect()
    val falseNeg = probed.count { case (id, m) => id < 1000 && !m }
    val falsePos = probed.count { case (id, m) => id >= 1000 && m }
    assert(falseNeg == 0, s"$falseNeg false negatives — bloom contract broken")
    assert(falsePos <= 50, s"$falsePos false positives on 1000 non-members at fpp=0.01")
  }

  test("bloom-prefiltered decontamination equals the plain broadcast path") {
    val plain = graft.queries.TextDedup.qDecontaminate(spark, TestSpark.Sf)
      .collect().toSeq
    val bloom = graft.queries.TextDedup.qDecontamBloom(spark, TestSpark.Sf)
      .collect().toSeq
    assert(bloom == plain, "bloom prefilter changed decontamination results")
  }

  test("incrementalDedup: overlapping corpus/batch ids fail loudly, not silently wrong") {
    // ADVICE r5: an overlapping id merges two docs' shingle sets in the
    // verification union — the guard must raise a NAMED error instead
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq((2L, "eta theta iota"), (3L, "kappa lambda mu")).toDF("doc_id", "text")
    val err = intercept[Exception] {
      graft.operators.Dedup.incrementalDedup(corpus, batch).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(m =>
      m.contains("incrementalDedup") && m.contains("disjoint")), err.getMessage)
    // the opt-out for id-disciplined production pipelines skips the guard
    // (result is garbage-in-garbage-out by contract, but must not throw)
    graft.operators.Dedup.incrementalDedup(corpus, batch, checkDisjoint = false).collect()
  }

  test("pii redaction replaces planted emails/urls/phones/ips and counts net new spans") {
    // the PRODUCTION body (the fixture corpus is PII-clean, so only a
    // planted frame exercises the regexes and the span count)
    val planted = Seq(
      (0L, "contact me at alice.smith+x@example.co.uk for details"),
      (1L, "see https://example.com/a?b=1 and http://t.co/xyz now"),
      (2L, "no pii here at all"),
      // a URL at end-of-line must not swallow the next line's tokens
      (3L, "go to https://x.com\nnext line"),
      // an email inside a URL collapses into ONE redacted span — the
      // audit count reflects spans in the final text, not raw matches
      (4L, "visit https://bob@files.example.com/x now"),
      // phone tier: 3-3-4 with mixed separators, parens accepted
      (5L, "call (555) 123-4567 or 555.987.6543 today"),
      // IPv4 tier; an address inside a URL is already swallowed by [URL]
      (6L, "host 10.0.42.7 via http://192.168.0.1/admin page"),
      // a document that LITERALLY contains a redaction token must not
      // inflate the audit (ADVICE r5: net-new spans, not substrings)
      (7L, "the log line said [EMAIL] was rejected"),
      (8L, "template [URL] plus real bob@example.com here")
    ).toDF("doc_id", "text")
    val out = graft.queries.TextStats.piiRedact(planted)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(out(0) == ((0L, "contact me at [EMAIL] for details", 1L)))
    assert(out(1) == ((1L, "see [URL] and [URL] now", 2L)))
    assert(out(2) == ((2L, "no pii here at all", 0L)))
    assert(out(3) == ((3L, "go to [URL]\nnext line", 1L)))
    assert(out(4) == ((4L, "visit [URL] now", 1L)))
    assert(out(5) == ((5L, "call [PHONE] or [PHONE] today", 2L)))
    assert(out(6) == ((6L, "host [IP] via [URL] page", 2L)))
    assert(out(7) == ((7L, "the log line said [EMAIL] was rejected", 0L)))
    assert(out(8) == ((8L, "template [URL] plus real [EMAIL] here", 1L)))
  }

  test("best-of-cluster selection keeps exactly one doc per group, the top-quality one") {
    val best = graft.queries.TextDedup.qDedupBest(TestSpark.spark, TestSpark.Sf)
      .select("doc_id", "group_id", "quality", "keep")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val byGroup = best.groupBy(_._2)
    // exactly one keeper per group
    assert(byGroup.values.forall(_.count(_._4 == 1) == 1))
    // the keeper's quality is the group max (ties broken toward it)
    byGroup.values.foreach { g =>
      val keeper = g.find(_._4 == 1).get
      assert(g.forall(_._3 <= keeper._3),
        s"group ${keeper._2}: keeper ${keeper._3} not max of ${g.map(_._3)}")
    }
    // multi-doc groups exist on the fixture (planted near-dups)
    assert(byGroup.values.exists(_.size > 1))
  }

  test("repetitionStats flags repetitive docs, passes diverse ones") {
    val docs = Seq(
      // 9 tokens, every 2-gram is "spam spam": top2_frac = 1 → drop
      (0L, "spam spam spam spam spam spam spam spam spam"),
      // diverse: all 2-grams and 5-grams unique → fracs 0 → keep
      (1L, "one two three four five six seven eight nine"),
      // a 10-token phrase repeated 3× back-to-back: the repeated block
      // makes most 5-grams duplicates → dup5_frac > 0.15 → drop
      (2L, Seq.fill(3)("a b c d e f g h i j").mkString(" ")),
      // a 1-token doc has NO 2-grams or 5-grams at all: both fractions
      // coalesce to 0 → keep (short docs are length-filtered elsewhere)
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = graft.queries.TextStats.repetitionStats(docs)
      .orderBy("doc_id")
      .select("doc_id", "top2_frac", "dup5_frac", "keep")
      .as[(Long, Double, Double, Int)].collect().toSeq
    assert(got(0) == ((0L, 1.0, 1.0, 0)))
    assert(got(1) == ((1L, 0.125, 0.0, 1)))
    assert(got(2)._3 > 0.15 && got(2)._4 == 0, s"repeated block not flagged: ${got(2)}")
    assert(got(3) == ((3L, 0.0, 0.0, 1)))
  }

  test("crossdocNgramStats: cross-doc boilerplate flagged, unique text kept") {
    val boiler = "copyright acme corp all rights reserved worldwide"  // 7 tokens → 3 5-grams
    val docs = Seq(
      // doc 0/1 share the 7-token boilerplate block; their unique tails
      // differ, so only the boilerplate 5-grams are cross-doc dups
      (0L, s"$boiler alpha beta gamma delta epsilon zeta"),
      (1L, s"$boiler omega psi chi phi upsilon tau"),
      // fully unique text → fraction 0, keep
      (2L, "one two three four five six seven eight nine ten"),
      // too short for any 5-gram → fraction 0 (coalesced), keep
      (3L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = graft.queries.TextStats.crossdocNgramStats(docs)
      .orderBy("doc_id")
      .select("doc_id", "dup_char_frac", "keep")
      .as[(Long, Double, Int)].collect().toSeq
    // both docs carry the duplicated block (fractions differ slightly —
    // char-weighted denominators depend on each doc's own tail)
    assert(got(0)._2 > 0.3 && got(1)._2 > 0.3 && got(0)._3 == 0 && got(1)._3 == 0,
      s"shared boilerplate must flag both docs: $got")
    assert(got(2) == ((2L, 0.0, 1)))
    assert(got(3) == ((3L, 0.0, 1)))
    // an identical pair of docs is 100% duplicated → dropped
    val dup = Seq(
      (0L, "exact same words in both documents here"),
      (1L, "exact same words in both documents here")
    ).toDF("doc_id", "text")
    val g2 = graft.queries.TextStats.crossdocNgramStats(dup)
      .select("dup_char_frac", "keep").as[(Double, Int)].collect().toSeq
    assert(g2 == Seq((1.0, 0), (1.0, 0)))
  }

  test("span dedup removes cross-doc duplicated runs from non-owners only") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique one"),
      (2L, "prefix words alpha beta gamma delta epsilon zeta suffix tail"),
      (3L, "totally different content with no shared runs here"))
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, 5)
      .select($"doc_id", $"n_tokens", $"n_removed", $"clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // doc 1 is the min-id owner of the shared 6-token run — untouched
    assert(out(0) == ((1L, 8L, 0L, "alpha beta gamma delta epsilon zeta unique one")))
    // doc 2 loses exactly the shared run (two overlapping 5-gram
    // windows merge in the coverage sweep), its unique tokens survive
    assert(out(1) == ((2L, 10L, 6L, "prefix words suffix tail")))
    // doc 3 shares nothing — untouched
    assert(out(2)._3 == 0L && out(2)._4 == "totally different content with no shared runs here")
    // a doc shorter than the span length can never lose tokens
    val short = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val s = Dedup.spanDedup(short, 5).select($"n_removed").as[Long].collect()
    assert(s.toSeq == Seq(0L, 0L))
    // intra-doc repetition alone is NOT cross-doc duplication
    val selfRep = Seq(
      (1L, "one two three four five one two three four five"),
      (2L, "unrelated words entirely different from the first doc"))
      .toDF("doc_id", "text")
    val sr = Dedup.spanDedup(selfRep, 5).select($"n_removed").as[Long].collect()
    assert(sr.toSeq == Seq(0L, 0L))
  }

  test("containmentPairs: embedded excerpt scores 1.0 in the direction jaccard misses") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "intro words here alpha beta gamma delta plus a much longer tail " +
        "of content that keeps going with many extra tokens"))
      .toDF("doc_id", "text")
    val c = Dedup.containmentPairs(corpus, 3, 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    // the excerpt is wholly contained: C(1→2) = 1; the reverse direction
    // is tiny and must NOT appear
    assert(c == Seq((1L, 2L, 1.0)), s"got $c")
    // symmetric jaccard structurally misses this pair (J = 2/21 here)
    val j = Dedup.jaccardPairs(corpus, 3, 0.5).collect()
    assert(j.isEmpty, "jaccard should not see the asymmetric pair")
  }

  test("containmentPairs: prefix-filtered join equals brute-force directed containment") {
    val d = Tables.documents(spark, TestSpark.Sf).filter(col("doc_id") < 60)
    val sh = graft.functions.TextFunctions.shingleRows(d, 3).distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("na"))
    val brute = sh.select(col("doc_id").as("a"), col("sh"))
      .join(sh.select(col("doc_id").as("b"), col("sh")), "sh")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .join(sizes.select(col("doc_id").as("a"), col("na")), "a")
      .withColumn("containment", col("c") / col("na").cast("double"))
      .filter(col("containment") >= 0.2)
      .select("a", "b", "containment")
      .as[(Long, Long, Double)].collect().toSet
    val fast = Dedup.containmentPairs(d, 3, 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(fast.nonEmpty, "fixture should yield containment pairs at t=0.2")
    assert(fast == brute, "prefix filter must be exact (no false negatives, no extras)")
    // a degenerate threshold that would void the prefix bound is refused
    intercept[IllegalArgumentException](Dedup.containmentPairs(d, 3, 0.0))
  }

  test("BandedLevenshtein == builtin levenshtein wherever the distance fits the band") {
    import graft.functions.EditDistanceFunctions.levenshteinBanded
    val rng = new scala.util.Random(11)
    val alpha = "abcde f"
    def randStr(n: Int) = (1 to n).map(_ => alpha(rng.nextInt(alpha.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        val i = if (cur.isEmpty) 0 else rng.nextInt(cur.length)
        rng.nextInt(3) match {
          case 0 if cur.nonEmpty => cur = cur.take(i) + cur.drop(i + 1) // del
          case 1 => cur = cur.take(i) + alpha(rng.nextInt(alpha.length)) + cur.drop(i) // ins
          case _ if cur.nonEmpty => // sub
            cur = cur.take(i) + alpha(rng.nextInt(alpha.length)) + cur.drop(i + 1)
          case _ => cur = alpha(rng.nextInt(alpha.length)).toString
        }
      }
      cur
    }
    // near pairs (mutation chains), far pairs (independent), plus edges
    val pairs =
      (1 to 120).map { i => val s = randStr(20 + rng.nextInt(120)); (s, mutate(s, rng.nextInt(12))) } ++
      (1 to 40).map(_ => (randStr(10 + rng.nextInt(80)), randStr(10 + rng.nextInt(80)))) ++
      Seq(("", ""), ("", "abc"), ("abc", ""), ("same", "same"), ("ab", "ba"))
    for (k <- Seq(0, 1, 3, 8, 40)) {
      val got = pairs.toDF("x", "y").select(
        levenshtein(col("x"), col("y")).as("full"),
        levenshteinBanded(col("x"), col("y"), k).as("banded"))
        .as[(Int, Int)].collect()
      got.foreach { case (full, banded) =>
        if (full <= k) assert(banded == full, s"k=$k: full=$full banded=$banded")
        else assert(banded == -1, s"k=$k: full=$full must band to -1, got $banded")
      }
    }
  }

  test("threshold-bounded levenshtein: -1 sentinel only ever replaces distances ABOVE the cap") {
    // Pins the BUILTIN's sentinel convention (its docs leave the
    // boundary case ambiguous): calling it at cap+1 and keeping
    // [0, cap] is exact under either > or >= semantics because the
    // call threshold sits strictly above the kept range. The
    // production query now verifies with BandedLevenshtein at EdMax
    // (whose d-or-−1 contract is DEFINED, and parity-swept above);
    // this stays as the reference semantics the banded sweep compares
    // against — and as the recipe should anyone revert to the builtin.
    import graft.queries.TextDedup.EdMax
    val pairs = Seq(
      ("aaaa", "aaaa"),                       // 0
      ("a" * 60, "b" * 10 + "a" * 50),        // 10
      ("a" * 120, "b" * EdMax + "a" * 70),    // exactly EdMax
      ("a" * 120, "b" * (EdMax + 1) + "a" * 69), // EdMax+1: first excluded
      ("a" * 200, "z" * 200))                 // far above
    val df = pairs.toDF("x", "y").select(
      levenshtein(col("x"), col("y")).as("full"),
      levenshtein(col("x"), col("y"), EdMax + 1).as("capped"))
    df.as[(Int, Int)].collect().foreach { case (full, capped) =>
      if (full <= EdMax) assert(capped == full,
        s"distance $full within cap must survive the bounded DP (got $capped)")
      else assert(capped == -1 || capped == full,
        s"above-cap distance $full may only be itself or the -1 sentinel (got $capped)")
      assert(!(capped >= 0 && capped <= EdMax) || full <= EdMax,
        "bounded DP must never smuggle an above-cap pair under the cap")
    }
  }

  test("qGroupSplit: every near-dup group lands whole in one split; singletons match the per-doc hash") {
    import graft.queries.TextDedup
    import graft.functions.TextFunctions.hash32
    val out = TextDedup.qGroupSplit(spark, TestSpark.Sf)
      .select(col("doc_id"), col("canonical_id"), col("split"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.nonEmpty)
    // the leakage-safety invariant: one split per canonical group
    out.groupBy(_._2).foreach { case (g, rows) =>
      assert(rows.map(_._3).distinct.size == 1,
        s"group $g straddles splits: ${rows.map(_._3).distinct}")
    }
    assert(out.exists(r => r._1 != r._2), "fixture must contain a non-trivial group")
    // a doc's split is a pure function of its canonical id — verify one
    // row against the hash computed directly in a Spark expression
    val (_, canon, split) = out.head
    val bucket = spark.range(1).select(
      (hash32(concat(lit(canon.toString), lit("|gsplit"))) % 100).as("b"))
      .head().getLong(0)
    val expect = if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
    assert(split == expect)
  }
}
