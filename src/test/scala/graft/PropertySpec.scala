package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** Property-based invariants (SURVEY §5.4) via scalacheck. Pure-function
  * properties run hundreds of generated cases; Spark properties generate
  * one randomized panel and assert the invariant over every row in one
  * job (a per-sample Spark job would be quadratically slow). */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("saltedRollingSum equals unsalted on a randomized panel (any frame/chunk)") {
    val rng = new scala.util.Random(42)
    val rows = Seq.fill(800)((
      s"k${rng.nextInt(5)}", rng.nextInt(20000).toLong, rng.nextInt(100) / 1.0))
    val df = rows.toDF("k", "ts", "v")
    for ((frame, chunk) <- Seq((100L, 1000L), (999L, 1000L), (1000L, 1000L), (1L, 7L))) {
      val salted = graft.operators.SaltedWindow.saltedRollingSum(df, "k", "ts", "v", frame, chunk)
        .select("k", "ts", "v", "rolling_sum")
        .as[(String, Long, Double, Double)].collect().sorted.toSeq
      val plain = graft.operators.SaltedWindow.rollingSum(df, "k", "ts", "v", frame)
        .select("k", "ts", "v", "rolling_sum")
        .as[(String, Long, Double, Double)].collect().sorted.toSeq
      assert(salted == plain, s"frame=$frame chunk=$chunk diverged")
    }
  }

  test("native as-of join equals the composed form on randomized panels") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // few keys × small ts domain → dense (k, ts) collisions on both
      // sides, exercising tie matching and the right-frame pre-agg
      val l = Seq.tabulate(400)(i =>
        (i.toLong, rng.nextInt(8).toLong, rng.nextInt(100).toLong, rng.nextDouble()))
        .toDF("event_id", "k", "ts", "v")
      val r = Seq.fill(200)((rng.nextInt(8).toLong, rng.nextInt(100).toLong,
        if (rng.nextInt(10) == 0) Option.empty[Double] else Some(rng.nextDouble())))
        .toDF("k", "ts", "rv")
      val composed = graft.operators.AsOfJoin.asofBackward(l, r, "k", "ts", "rv")
        .select("event_id", "asof_value").as[(Long, Option[Double])]
        .collect().sortBy(_._1).toSeq
      val native = graft.operators.AsOfJoin.asofBackwardNative(l, r, "k", "ts", "rv")
        .select("event_id", "asof_value").as[(Long, Option[Double])]
        .collect().sortBy(_._1).toSeq
      assert(native == composed, s"trial $trial diverged")
      assert(native.size == 400)
    }
  }

  test("bandJoin equals the naive band predicate on a randomized panel") {
    val rng = new scala.util.Random(7)
    val l = Seq.fill(300)((rng.nextInt(10000).toLong, s"k${rng.nextInt(4)}",
      rng.nextInt(5000).toLong)).toDF("lid", "k", "lts")
    val r = Seq.fill(300)((rng.nextInt(10000).toLong, s"k${rng.nextInt(4)}",
      rng.nextInt(5000).toLong)).toDF("rid", "k", "rts")
    for (tol <- Seq(1L, 97L, 500L)) {
      val banded = graft.operators.BandJoin.bandJoin(l, r, "k", "lts", "rts", tol)
        .select("lid", "rid", "lts", "rts")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      val naive = l.join(r, Seq("k")).filter(abs($"lts" - $"rts") <= tol)
        .select("lid", "rid", "lts", "rts")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(banded == naive, s"tol=$tol diverged")
    }
  }

  test("sanitizeName is idempotent and emits no forbidden characters") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val once = Sources.sanitizeName(s)
      Sources.sanitizeName(once) == once && !once.exists("$#[]/. ".contains(_))
    })
  }

  test("rnd-style floor rounding is within half a unit of the input") {
    check(Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { x =>
      val r = math.floor(x * 1e4 + 0.5) / 1e4
      math.abs(r - x) <= 5e-5 + 1e-9
    })
  }

  test("parseMagnitude inverts suffix construction for integral bases") {
    val gen = for {
      v <- Gen.chooseNum(0, 999999)
      (sfx, mult) <- Gen.oneOf(("K", 1e3), ("M", 1e6), ("B", 1e9), ("T", 1e12), ("", 1.0))
    } yield (v, sfx, mult)
    val cases = Gen.listOfN(300, gen).sample.get.distinct
    val got = cases.map { case (v, sfx, _) => s"$v$sfx" }.toDF("s")
      .select(Sources.parseMagnitude($"s")).as[Double].collect()
    cases.zip(got).foreach { case ((v, _, mult), parsed) =>
      assert(parsed == v * mult, s"$v $mult -> $parsed")
    }
  }

  test("window invariants over a generated panel (one Spark job)") {
    val gen = for {
      sym <- Gen.oneOf("S1", "S2", "S3")
      i <- Gen.chooseNum(0, 200)
      v <- Gen.chooseNum(1, 50000)
    } yield (sym, i, v / 100.0)
    val rows = Gen.listOfN(600, gen).sample.get
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (sym, i)
    val df = rows.toDF("g", "i", "v")
    val w = Window.partitionBy("g").orderBy("i")
    val checked = df
      .withColumn("rsi", graft.functions.TimeSeries.rsi($"v", 14, w))
      .withColumn("spike", graft.functions.TimeSeries.spikeFlag($"v", 5, 1.5, w))
      .withColumn("roundtrip", lead(lag($"v", 1).over(w), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .withColumn("nrows", count(lit(1)).over(Window.partitionBy("g")))
    // RSI bounded; spike binary; lead∘lag identity on interior rows
    assert(checked.filter($"rsi".isNotNull && ($"rsi" < 0 || $"rsi" > 100)).count() == 0)
    assert(checked.filter(!$"spike".isin(0, 1)).count() == 0)
    assert(checked.filter($"rn" > 1 && $"rn" < $"nrows" && $"roundtrip" =!= $"v").count() == 0)
  }

  test("shingles() and shingleRows() agree with a naive Scala sliding-window reference") {
    val rng = new scala.util.Random(23)
    // mix of short (< n), exact-n, and long docs; multi-space runs and
    // leading/trailing whitespace exercise the tokenizer parity
    val texts = Seq.tabulate(120) { i =>
      val nTok = rng.nextInt(12)
      val body = Seq.fill(nTok)(s"w${rng.nextInt(6)}").mkString(
        if (rng.nextBoolean()) " " else "  ")
      (i.toLong, if (rng.nextBoolean()) s" $body " else body)
    }
    val df = texts.toDF("doc_id", "text")
    for (n <- Seq(2, 3, 5)) {
      def ref(t: String): Seq[String] = {
        val ts = t.trim.split("\\s+").toSeq
        if (ts.size < n) Seq.empty else ts.sliding(n).map(_.mkString(" ")).toSeq
      }
      val expected = texts.flatMap { case (id, t) => ref(t).map(sh => (id, sh)) }.sorted
      val viaArray = df.select($"doc_id", explode(
        graft.functions.TextFunctions.shingles($"text", n)).as("sh"))
        .as[(Long, String)].collect().sorted.toSeq
      val viaRows = graft.functions.TextFunctions.shingleRows(df, n)
        .as[(Long, String)].collect().sorted.toSeq
      assert(viaArray == expected, s"n=$n array form diverged")
      assert(viaRows == expected, s"n=$n rows form diverged")
    }
  }

  test("canonicalGroups equals a reference union-find on random graphs") {
    val rng = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val nNodes = 60 + rng.nextInt(60)
      val edges = Seq.fill(80)((rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      // reference: classic union-find, components labeled by min member
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = touched.map(x => x -> find(x)).toMap
      val got = graft.operators.Dedup.canonicalGroups(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: components diverged")
    }
  }

  test("exact dedup is idempotent (fixpoint after one pass)") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val once = graft.operators.Dedup.exactDedup(docs)
    val twice = graft.operators.Dedup.exactDedup(once)
    assert(once.count() == twice.count())
  }

  test("incrementalDedup near-dups agree with jaccardPairs ground truth on random docs") {
    // random word-soup corpora with planted duplicates: every near_dup
    // the incremental op reports must be a true >= τ jaccard pair, and
    // every LSH-recoverable true pair must be classified (the subset of
    // pairs minhashDedupPairs finds on the union frame — the incremental
    // path may not MISS pairs the standing self-join path finds)
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def doc(): String = Seq.fill(6 + rng.nextInt(6))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    for (trial <- 1 to 2) {
      val corpusRows = (0L until 30L).map(i => (i, doc()))
      // batch: half perturbed copies of corpus docs (planted near-dups),
      // half fresh
      val batchRows = (100L until 120L).map { i =>
        if (i % 2 == 0) {
          val base = corpusRows((i % 30).toInt)._2
          (i, base + " " + vocab(rng.nextInt(vocab.size)))
        } else (i, doc())
      }
      val corpus = corpusRows.toDF("doc_id", "text")
      val batch = batchRows.toDF("doc_id", "text")
      val inc = graft.operators.Dedup.incrementalDedup(corpus, batch)
        .filter($"status" === "near_dup")
        .select($"match_id", $"doc_id").as[(Long, Long)].collect().toSet
      // ground truth: LSH-verified pairs over the union, batch×corpus only
      val allPairs: Set[(Long, Long)] = graft.operators.Dedup
        .minhashDedupPairs(corpus.unionByName(batch), threshold = 0.8)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val unionPairs = allPairs.filter { case (a, b) => a < 100 && b >= 100 }
      // exact dups are classified exact_dup, not near_dup — exclude them
      // from the expectation
      val exactDup = graft.operators.Dedup.incrementalDedup(corpus, batch)
        .filter($"status" === "exact_dup").select($"doc_id").as[Long].collect().toSet
      // .toSeq BEFORE .map: mapping a Map keyed by b to (minA, b) tuples
      // would re-key by minA and silently collapse batch docs sharing a
      // min match
      val minMatch: Set[(Long, Long)] = unionPairs
        .groupBy(_._2).toSeq.map { case (b, ps) => (ps.map(_._1).min, b) }.toSet
      val expected = minMatch.filterNot { case (_, b) => exactDup.contains(b) }
      assert(inc == expected, s"trial $trial: near-dup sets diverged")
    }
  }

  test("bloom-prefiltered decontamination is exact on random corpora (fpp cannot leak)") {
    // property: whatever the bloom's false positives, the verify join
    // must make the bloom path's output EXACTLY the plain path's
    import graft.functions.{BloomFunctions, TextFunctions}
    val rng = new scala.util.Random(13)
    val vocab = Vector("a1", "b2", "c3", "d4", "e5", "f6", "g7", "h8", "i9", "j0")
    def doc(n: Int): String = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    for (trial <- 1 to 2) {
      val docs = (0L until 40L).map(i => (i, doc(8 + rng.nextInt(8)))).toDF("doc_id", "text")
      val n = 3
      val bench = TextFunctions.shingleRows(docs.filter($"doc_id" < 5), n)
        .select("sh").distinct()
      val bloomBytes = BloomFunctions.serialize(
        BloomFunctions.buildLongBloom(
          bench.select(xxhash64($"sh").as("h")), "h", 64, 0.05))
      val corpusSh = TextFunctions.shingleRows(docs.filter($"doc_id" >= 5), n)
      val plain = corpusSh.join(broadcast(bench), Seq("sh"))
        .groupBy("doc_id").agg(count_distinct($"sh").as("n_hits"))
        .as[(Long, Long)].collect().sorted.toSeq
      val bloomed = corpusSh
        .filter(BloomFunctions.mightContainLong(bloomBytes, xxhash64($"sh")))
        .join(broadcast(bench), Seq("sh"))
        .groupBy("doc_id").agg(count_distinct($"sh").as("n_hits"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(bloomed == plain, s"trial $trial: bloom path diverged")
    }
  }

  test("span dedup invariants hold on randomized corpora with planted shared runs") {
    val rng = new scala.util.Random(23)
    // small vocab + planted shared runs → real cross-doc duplication
    def word() = s"w${rng.nextInt(30)}"
    val shared = Seq.fill(3)(Seq.fill(6)(word()).mkString(" "))
    for (trial <- 1 to 3) {
      val docs = (0L until 30L).map { i =>
        val own = Seq.fill(4 + rng.nextInt(10))(word()).mkString(" ")
        val text =
          if (rng.nextInt(3) == 0) s"$own ${shared(rng.nextInt(shared.length))} ${word()}"
          else own
        (i, text)
      }.toDF("doc_id", "text")
      val L = 5
      val out = graft.operators.Dedup.spanDedup(docs, L)
        .select($"doc_id", $"n_tokens", $"n_removed", $"clean_text")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      val original = docs.select($"doc_id", $"text").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      assert(out.map(_._1) == original.map(_._1), "row conservation")
      out.zip(original).foreach { case ((id, nTok, nRem, clean), (_, text)) =>
        val toks = text.trim.split("\\s+").toSeq
        assert(nTok == toks.length, s"doc $id token count")
        assert(nRem >= 0 && nRem <= nTok, s"doc $id removal bounds")
        val kept = if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
        // surviving text is a subsequence of the original tokens with
        // exactly n_tokens - n_removed tokens
        assert(kept.length == nTok - nRem ||
          (clean.isEmpty && nTok == nRem), s"doc $id kept-count")
        var i = 0
        kept.foreach { t =>
          i = toks.indexOf(t, i)
          assert(i >= 0, s"doc $id: '$t' not a subsequence match")
          i += 1
        }
      }
      // global invariant: for every duplicated L-gram, the min-id doc
      // containing it never loses tokens to THAT gram — verify owners
      // of fully-shared docs: at least one doc per shared run keeps it
      shared.foreach { run =>
        val holders = original.filter(_._2.contains(run)).map(_._1)
        if (holders.length >= 2) {
          val ownerClean = out.find(_._1 == holders.min).get._4
          assert(ownerClean.contains(run),
            s"owner ${holders.min} lost its own span '$run'")
        }
      }
    }
  }

  test("topNgrams agrees with a naive Scala n-gram counter on random corpora") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
      val docs = (0 until 30).map { id =>
        (id.toLong, Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      for (n <- Seq(1, 2, 3)) {
        // naive reference: per-doc sliding grams → (df, tf) per gram.
        // r16 token semantics: empty docs contribute ZERO tokens (the
        // engine's tokens() drops the phantom '' that split("") yields)
        val grams = docs.flatMap { case (id, t) =>
          val ts = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
          ts.sliding(n).filter(_.length == n).map(g => (id, g.mkString(" "))).toSeq
        }
        val ref = grams.groupBy(_._2).map { case (g, occ) =>
          (g, occ.map(_._1).distinct.size.toLong, occ.size.toLong)
        }.toSeq.sortBy(r => (-r._2, -r._3, r._1)).take(10)
        val got = graft.queries.TextStats.topNgrams(df, n, 10)
          .as[(String, Long, Long)].collect().toSeq
        assert(got == ref, s"trial $trial n=$n:\n got=$got\n ref=$ref")
      }
    }
    intercept[IllegalArgumentException] {
      graft.queries.TextStats.topNgrams(Seq((1L, "a b")).toDF("doc_id", "text"), 0, 5)
    }
    intercept[IllegalArgumentException] {
      graft.queries.TextStats.topNgrams(Seq((1L, "a b")).toDF("doc_id", "text"), 2, 0)
    }
  }

  test("outlierMad flags a planted outlier and nulls constant groups") {
    val df = Seq(
      // group a: tight cluster + one wild value — only the wild row flags
      ("a", 1L, 100L), ("a", 2L, 101L), ("a", 3L, 99L), ("a", 4L, 100L), ("a", 5L, 5000L),
      // group b: MAD = 0 (constant) — score null, never flagged
      ("b", 6L, 50L), ("b", 7L, 50L), ("b", 8L, 50L),
      // group c: two values, MAD > 0, neither extreme enough to flag
      ("c", 9L, 10L), ("c", 10L, 14L))
      .toDF("source", "doc_id", "n_chars")
    val out = graft.queries.TrainingDataQueries
      .outlierMad(df, "source", "n_chars", "doc_id")
      .select("doc_id", "robust_z", "outlier")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), r.getInt(2)))).toMap
    assert(out(5L)._2 == 1, s"planted outlier not flagged: ${out(5L)}")
    Seq(1L, 2L, 3L, 4L).foreach(id =>
      assert(out(id)._2 == 0, s"inlier $id flagged: ${out(id)}"))
    Seq(6L, 7L, 8L).foreach { id =>
      assert(out(id)._1.isEmpty, s"constant group should null the score: ${out(id)}")
      assert(out(id)._2 == 0, s"constant group row $id flagged")
    }
    Seq(9L, 10L).foreach(id => assert(out(id)._2 == 0, s"mild row $id flagged"))
    // value column names are resolved, never parsed as SQL: "n-chars"
    // must read THE COLUMN, not compute n minus chars
    val weird = Seq(("a", 1L, 10L), ("a", 2L, 12L), ("a", 3L, 11L))
      .toDF("source", "doc_id", "n-chars")
    val wr = graft.queries.TrainingDataQueries
      .outlierMad(weird, "source", "n-chars", "doc_id")
      .collect()
    assert(wr.length == 3 && wr.forall(_.getInt(4) == 0))
  }

  test("filterFunnel matches a naive sequential-filter reference on random corpora") {
    val rng = new scala.util.Random(11)
    val langs = Seq("en", "de", "fr", "xx")
    val docs = (0 until 120).map { id =>
      val nToks = rng.nextInt(40)
      val tokLen = 1 + rng.nextInt(8)
      val text = Seq.fill(nToks)("x" * tokLen).mkString(" ")
      (id.toLong, text, langs(rng.nextInt(langs.size)), text.length.toLong)
    }
    val df = docs.toDF("doc_id", "text", "lang", "n_chars")
    val out = graft.queries.TextStats.filterFunnel(df)
      .orderBy("stage")
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    // naive reference: apply each rule to the survivors of the previous
    import graft.queries.TextStats._
    // r16 token semantics: empty/whitespace docs have ZERO tokens (the
    // engine's tokens() drops the phantom ''), and their avg length is
    // undefined (None), failing the band rule definitively
    def toksOf(t: String): Array[String] =
      t.trim.split("\\s+").filter(_.nonEmpty)
    def avgTok(t: String): Option[Double] = {
      val n = toksOf(t).length
      if (n == 0) None
      else {
        val nonWs = t.count(!_.isWhitespace).toDouble
        Some(math.floor(nonWs / n * 1e4 + 0.5) / 1e4)
      }
    }
    val rules: Seq[(String, ((Long, String, String, Long)) => Boolean)] = Seq(
      "min_chars" -> (d => d._4 >= FunnelMinChars),
      "max_chars" -> (d => d._4 <= FunnelMaxChars),
      "lang_en" -> (d => d._3 == FunnelLang),
      "min_tokens" -> (d => toksOf(d._2).length >= FunnelMinTokens),
      "tok_len_band" -> (d => avgTok(d._2).exists(a =>
        a >= FunnelTokLenLo.toDouble && a <= FunnelTokLenHi.toDouble)))
    var surv = docs
    val ref = rules.zipWithIndex.map { case ((name, p), i) =>
      val next = surv.filter(p)
      val row = (i + 1, name, surv.size.toLong,
        (surv.size - next.size).toLong, next.size.toLong)
      surv = next
      row
    }
    assert(out == ref, s"\n got=$out\n ref=$ref")
    // structural invariants: stages chain and drops add up
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a._5 == b._3, s"stage ${a._1} n_out != stage ${b._1} n_in")
    }
    out.foreach(r => assert(r._3 - r._4 == r._5, s"n_in - n_dropped != n_out: $r"))
  }

  test("upsampleRepeat: per-doc multiplicity is floor(e)/ceil(e), contiguous idx, stable") {
    val rng = new scala.util.Random(23)
    val langs = Seq("en", "de", "fr", "es", "zh", "xx")
    val docs = (0 until 300).map(id => (id.toLong, langs(rng.nextInt(langs.size))))
    val df = docs.toDF("doc_id", "lang")
    val out = graft.queries.TrainingDataQueries.upsampleRepeat(df, "lang", "doc_id")
      .select("doc_id", "lang", "repeat_idx")
      .as[(Long, String, Int)].collect().toSeq
    val epochs = graft.queries.TrainingDataQueries.MixEpochs.toMap
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    docs.foreach { case (id, lang) =>
      val e = epochs.getOrElse(lang, 0.0)
      val n = perDoc.get(id).map(_.size).getOrElse(0)
      assert(n == math.floor(e).toInt || n == math.ceil(e).toInt,
        s"doc $id lang $lang: $n repeats for e=$e")
      // repeat_idx is exactly 1..n
      perDoc.get(id).foreach(idxs => assert(idxs == (1 to n), s"doc $id idxs $idxs"))
    }
    // unknown lang always dropped; whole-epoch langs exact
    docs.filter(_._2 == "xx").foreach(d => assert(!perDoc.contains(d._1)))
    docs.filter(_._2 == "de").foreach(d => assert(perDoc(d._1).size == 1))
    // fractional langs hit BOTH multiplicities across 300 docs
    val enCounts = docs.filter(_._2 == "en").map(d => perDoc(d._1).size).toSet
    assert(enCounts == Set(2, 3), s"en multiplicities $enCounts")
    // deterministic under repartitioning
    val again = graft.queries.TrainingDataQueries
      .upsampleRepeat(df.repartition(7), "lang", "doc_id")
      .select("doc_id", "lang", "repeat_idx")
      .as[(Long, String, Int)].collect().toSeq
    assert(again.sorted == out.sorted, "repeat set changed under repartitioning")
    // payload columns survive — even ones named like the generator output
    val payload = Seq((1L, "de", 7L, "x")).toDF("doc_id", "lang", "pos", "col")
    val kept = graft.queries.TrainingDataQueries
      .upsampleRepeat(payload, "lang", "doc_id")
      .select("doc_id", "pos", "col", "repeat_idx")
      .as[(Long, Long, String, Int)].collect().toSeq
    assert(kept == Seq((1L, 7L, "x", 1)), s"payload clobbered: $kept")
    // reserved names are refused loudly, never silently clobbered
    intercept[IllegalArgumentException] {
      graft.queries.TrainingDataQueries.upsampleRepeat(
        Seq((1L, "de", 1)).toDF("doc_id", "lang", "repeat_idx"), "lang", "doc_id")
    }
  }

  test("filterFunnel reports zeros (not NULLs) on an empty corpus") {
    val empty = Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = graft.queries.TextStats.filterFunnel(empty)
      .orderBy("stage")
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    assert(out.size == 5)
    out.foreach { r =>
      assert(r._3 == 0L && r._4 == 0L && r._5 == 0L, s"non-zero on empty: $r")
    }
  }

  test("tokenEstimate subword count is exact ceil-division word-piece arithmetic") {
    val rng = new scala.util.Random(31)
    import graft.queries.TextStats.SubwordMaxLen
    val docs = (0 until 60).map { id =>
      val words = Seq.fill(rng.nextInt(15)) {
        rng.nextInt(3) match {
          case 0 => Seq.fill(1 + rng.nextInt(12))(('a' + rng.nextInt(26)).toChar).mkString
          case 1 => rng.nextInt(100000).toString
          case 2 => Seq.fill(1 + rng.nextInt(4))("?!,.;:#€中".charAt(rng.nextInt(9))).mkString
        }
      }
      (id.toLong, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = graft.queries.TextStats.tokenEstimate(df)
      .select("doc_id", "n_subword_est")
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      // naive reference: per alpha-run ceil(len/N); one per digit; one
      // per other non-ws char
      val ref = ("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]".r.findAllIn(text).map { m =>
        if (m.head.isLetter) (m.length + SubwordMaxLen - 1) / SubwordMaxLen else 1
      }).sum.toLong
      assert(got(id) == ref, s"doc $id '$text': got ${got(id)} ref $ref")
    }
  }

  test("clusterSample: sign-bit cells, exact per-cell widths, deterministic draw") {
    val rng = new scala.util.Random(19)
    val vecs = (0 until 200).map(id =>
      (id.toLong, Array.fill(8)((rng.nextDouble() * 2 - 1).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = graft.queries.SimilarityQueries.clusterSample(df, "vec_id", "embedding", 3, 4)
      .as[(Int, Long, Int)].collect().toSeq
    val expectedCell = vecs.map { case (id, v) =>
      id -> (0 until 3).map(i => if (v(i) >= 0) 1 << (2 - i) else 0).sum
    }.toMap
    out.foreach { case (cell, id, _) =>
      assert(cell == expectedCell(id), s"vec $id cell $cell != ${expectedCell(id)}")
    }
    // exact-width contract: every occupied cell draws min(k, population)
    val pops = expectedCell.values.groupBy(identity).view.mapValues(_.size).toMap
    val drawn = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(drawn.keySet == pops.keySet, "an occupied cell drew nothing")
    drawn.foreach { case (c, n) =>
      assert(n == math.min(4, pops(c)), s"cell $c drew $n of ${pops(c)} (k=4)")
    }
    // the draw is a deterministic function of ids, not partitioning
    val again = graft.queries.SimilarityQueries
      .clusterSample(df.repartition(7), "vec_id", "embedding", 3, 4)
      .as[(Int, Long, Int)].collect().toSeq
    assert(again.sorted == out.sorted, "draw changed under repartitioning")
  }

  test("weighted sample prefers heavy documents and is draw-stable") {
    import graft.queries.TrainingDataQueries
    val docs = Tables.documents(spark, TestSpark.Sf)
    val sample = TrainingDataQueries.qWeightedSample(spark, TestSpark.Sf)
    val sampleMean = sample.agg(avg(col("n_chars"))).as[Double].head()
    val corpusMean = docs.agg(avg(col("n_chars"))).as[Double].head()
    // inclusion probability ∝ n_chars, so the sampled mean must sit
    // clearly above the corpus mean on the fixed fixture draw
    assert(sampleMean > corpusMean * 1.05,
      s"weighted draw not length-biased: sample=$sampleMean corpus=$corpusMean")
    // determinism: a second construction selects the identical set
    val ids1 = sample.select("doc_id").as[Long].collect().toSeq
    val ids2 = TrainingDataQueries.qWeightedSample(spark, TestSpark.Sf)
      .select("doc_id").as[Long].collect().toSeq
    assert(ids1 == ids2)
  }

  test("qBigramLogprob matches a naive in-Scala LM over the fixture corpus") {
    import graft.queries.TextStats
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val pairs = toks.flatMap { case (id, ts) => ts.zip(ts.drop(1)).map(id -> _) }
    val cb = pairs.groupBy(_._2).view.mapValues(_.size).toMap
    val c1 = pairs.groupBy(_._2._1).view.mapValues(_.size).toMap
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val n = toks.map(_._2.size).sum.toDouble
    val expect = pairs.groupBy(_._1).view.mapValues { ps =>
      val lps = ps.map { case (_, (w1, w2)) =>
        -math.log(TextStats.BigramLambda * (cb((w1, w2)) / c1(w1).toDouble) +
          TextStats.BigramMu * (uni(w2) / n))
      }
      (ps.size.toLong, math.floor(lps.sum / lps.size * 1e4 + 0.5) / 1e4)
    }.toMap
    val got = TextStats.qBigramLogprob(spark, TestSpark.Sf)
      .select($"doc_id", $"n_bigrams", $"avg_neg_logprob")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got.size == expect.size)
    got.foreach { case (id, nb, lp) =>
      val (enb, elp) = expect(id)
      assert(nb == enb, s"doc $id: n_bigrams $nb != $enb")
      // the distributed sum order may differ from the sequential one:
      // allow one ulp-accumulation at the rounding grain
      assert(math.abs(lp - elp) <= 1e-4, s"doc $id: $lp vs $elp")
    }
  }

  test("featureHash: buckets bounded, token-count preserved, repeated tokens sum their sign") {
    import graft.queries.TextStats
    val docs = Seq((1L, "alpha beta alpha gamma"), (2L, "beta beta")).toDF("doc_id", "text")
    val out = TextStats.featureHash(docs, "doc_id", "text", 16)
      .select($"doc_id", $"bucket", $"feature_value", $"n_tokens")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(out.forall(r => r._2 >= 0 && r._2 < 16))
    // every token lands exactly once: per-doc n_tokens sums to doc length
    assert(out.filter(_._1 == 1L).map(_._4).sum == 4)
    assert(out.filter(_._1 == 2L).map(_._4).sum == 2)
    // a repeated token accumulates |value| = multiplicity in one bucket
    val beta2 = out.filter(r => r._1 == 2L)
    assert(beta2.size == 1 && math.abs(beta2.head._3) == 2)
    // identical tokens hash identically across docs (same bucket)
    val fh = TextStats.featureHash(docs, "doc_id", "text", 16)
    assert(fh.collect().toSeq == fh.collect().toSeq)
  }

  test("qPagerank: probability mass conserved, hand-checked against a dense power iteration") {
    import graft.queries.{TimeSeriesQueries => TS}
    val out = TS.qPagerank(spark, TestSpark.Sf)
      .as[(String, Double)].collect().toMap
    assert(out.size == 5)
    // no dangling nodes on this fixture -> total mass stays 1
    assert(math.abs(out.values.sum - 1.0) < 1e-3, s"mass: ${out.values.sum}")
    // dense recompute from the raw transition counts
    val pairs = TS.transitionMatrix(Tables.events(spark, TestSpark.Sf),
        "user_id", "event_type", "ts", "event_id")
      .select($"prev", $"next", $"n").as[(String, String, Long)].collect().toSeq
    val tot = pairs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted
    var pr = nodes.map(_ -> 0.2).toMap
    for (_ <- 1 to TS.PrIters) {
      val mass = pairs.groupBy(_._2).view.mapValues(_.map { case (p, _, n) =>
        (n.toDouble / tot(p).toDouble) * pr(p)
      }.sum).toMap
      pr = nodes.map(nd => nd -> (TS.PrBase / 5.0 + TS.PrDamp * mass.getOrElse(nd, 0.0))).toMap
    }
    nodes.foreach { nd =>
      assert(math.abs(out(nd) - pr(nd)) < 1e-6, s"$nd: ${out(nd)} vs ${pr(nd)}")
    }
  }

  test("qBm25 equals a naive in-Scala BM25 over the fixture corpus") {
    import graft.queries.TextStats
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val nd = toks.size.toDouble
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / nd
    val dfm = TextStats.BmQuery.map(q =>
      q -> toks.count(_._2.contains(q)).toDouble).toMap
    val expect = toks.flatMap { case (id, ts) =>
      val cs = TextStats.BmQuery.flatMap { q =>
        val tf = ts.count(_ == q).toDouble
        if (tf == 0) None else {
          val idf = math.log((nd - dfm(q) + 0.5) / (dfm(q) + 0.5) + 1.0)
          Some(idf * ((tf * (TextStats.BmK1 + 1.0)) /
            (tf + TextStats.BmK1 * (1.0 - TextStats.BmB +
              TextStats.BmB * (ts.size.toDouble / avgdl)))))
        }
      }
      if (cs.isEmpty) None
      else Some(id -> (cs.size.toLong, math.floor(cs.sum * 1e4 + 0.5) / 1e4))
    }.toMap
    val got = TextStats.qBm25(spark, TestSpark.Sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got.size == expect.size)
    got.foreach { case (id, nt, s) =>
      val (ent, es) = expect(id)
      assert(nt == ent && math.abs(s - es) <= 1e-4, s"doc $id: ($nt,$s) vs ($ent,$es)")
    }
  }

  test("qInvertedIndex: df/tf consistent, postings sorted, bounded and prefix-complete") {
    import graft.queries.TextStats
    val out = TextStats.qInvertedIndex(spark, TestSpark.Sf)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out.size == TextStats.IndexTopTerms)
    // df is monotone non-increasing down the report
    assert(out.map(_._2) == out.map(_._2).sortBy(-_))
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    out.foreach { case (term, df, tf, postings) =>
      val hits = docs.filter(_._2.trim.split("\\s+").contains(term)).map(_._1).sorted
      assert(df == hits.size, s"$term df")
      assert(tf == docs.map(_._2.trim.split("\\s+").count(_ == term)).sum, s"$term tf")
      val ids = postings.split(",").map(_.toLong).toSeq
      assert(ids == ids.sorted && ids.size <= TextStats.IndexPostings)
      assert(ids == hits.take(TextStats.IndexPostings), s"$term postings")
    }
  }

  test("tokenEntropy: closed forms on synthetic docs (uniform, constant, singleton)") {
    import graft.queries.TextStats
    val docs = Seq(
      (1L, "a b c d"),        // uniform over 4 distinct: H = ln 4
      (2L, "x x x x x"),      // constant: H = 0
      (3L, "w"),              // singleton: H = 0, ttr = 1
      (4L, "a a b b")         // two at 1/2: H = ln 2
    ).toDF("doc_id", "text")
    val out = TextStats.tokenEntropy(docs, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"n_distinct", $"entropy", $"ttr")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def g(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(out(1L) == ((1L, 4L, 4L, g(math.log(4)), 1.0)))
    assert(out(2L) == ((2L, 5L, 1L, 0.0, 0.2)))
    assert(out(3L) == ((3L, 1L, 1L, 0.0, 1.0)))
    assert(out(4L) == ((4L, 4L, 2L, g(math.log(2)), 0.5)))
  }

  test("qLiftPairs equals a naive basket walk (supports, confidences, lifts)") {
    import graft.queries.TimeSeriesQueries
    val out = TimeSeriesQueries.qLiftPairs(spark, TestSpark.Sf)
      .select($"type_a", $"type_b", $"n_both", $"support", $"confidence", $"lift")
      .as[(String, String, Long, Double, Double, Double)].collect().toSeq
    assert(out.nonEmpty)
    val baskets = Tables.events(spark, TestSpark.Sf)
      .select($"user_id", Tables.eventDay.as("day"), $"event_type")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getString(2)))
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).toSet).toMap
    val nb = baskets.size.toDouble
    val item = baskets.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size).toMap
    def g(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    out.foreach { case (a, b, both, sup, conf, lift) =>
      val expect = baskets.values.count(s => s.contains(a) && s.contains(b))
      assert(a < b && both == expect, s"($a,$b): $both vs $expect")
      assert(sup == g(both / nb))
      assert(conf == g(both.toDouble / item(a)))
      assert(lift == g((both * nb) / (item(a).toDouble * item(b))))
    }
  }

  test("qAbTest equals a hand-computed Welch t for every type") {
    import graft.queries.TrainingDataQueries
    val out = TrainingDataQueries.qAbTest(spark, TestSpark.Sf)
      .select($"event_type", $"n_a", $"n_b", $"mean_diff", $"t_stat", $"df", $"significant")
      .collect().toSeq
    assert(out.nonEmpty)
    val rows = Tables.events(spark, TestSpark.Sf)
      .select($"event_type", $"value", dayofmonth(Tables.eventDay).as("d"))
      .as[(String, Double, Int)].collect().toSeq
    def g(x: Double, s: Double) = math.floor(x * s + 0.5) / s
    out.foreach { r =>
      val et = r.getString(0)
      val cents = rows.filter(_._1 == et)
        .map(x => (x._3 <= 15, math.floor(x._2 * 100 + 0.5).toLong))
      def stats(p: Boolean) = {
        val c = cents.filter(_._1 == p).map(_._2)
        val n = c.size.toDouble
        val mean = (c.sum.toDouble / n) / 100.0
        val vr = math.max(0.0,
          (n * c.map(x => x * x).sum.toDouble - c.sum.toDouble * c.sum.toDouble)
            / (n * (n - 1.0))) / 10000.0
        (n, mean, vr)
      }
      val (na, ma, va) = stats(true)
      val (nb, mb, vb) = stats(false)
      val se2 = va / na + vb / nb
      val t = (ma - mb) / math.sqrt(se2)
      val dfw = (se2 * se2) /
        ((va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0))
      assert(r.getLong(1) == na.toLong && r.getLong(2) == nb.toLong)
      assert(r.getDouble(3) == g(ma - mb, 1e4), s"$et mean_diff")
      assert(r.getDouble(4) == g(t, 1e4), s"$et t")
      assert(r.getDouble(5) == g(dfw, 1e1), s"$et df")
      assert(r.getBoolean(6) == (math.abs(g(t, 1e4)) > 1.96))
    }
  }

  test("qPsiDrift: PSI is non-negative, zero against itself, and hand-checked per type") {
    import graft.queries.TrainingDataQueries
    val out = TrainingDataQueries.qPsiDrift(spark, TestSpark.Sf)
      .select($"event_type", $"n_first_half", $"n_second_half", $"psi")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    val total = Tables.events(spark, TestSpark.Sf).count()
    assert(out.map(r => r._2 + r._3).sum == total, "periods must partition the table")
    // each PSI term (pa-pb)ln(pa/pb) is >= 0, so the sum is
    assert(out.forall(_._4 >= 0.0))
    // independent recomputation of one event_type from raw values
    val et = out.head._1
    val rows = Tables.events(spark, TestSpark.Sf)
      .select($"event_type", $"value",
        dayofmonth(Tables.eventDay).as("d"))
      .filter($"event_type" === et)
      .select($"value", $"d").as[(Double, Int)].collect().toSeq
    val (mn, mx) = {
      val all = Tables.events(spark, TestSpark.Sf)
        .agg(min($"value"), max($"value")).as[(Double, Double)].head()
      all
    }
    val bins = TrainingDataQueries.PsiBins
    def bin(v: Double): Int =
      if (mx == mn) 0 else math.min(bins - 1, math.floor((v - mn) / ((mx - mn) / bins.toDouble)).toInt)
    val a = rows.filter(_._2 <= 15).map(r => bin(r._1))
    val b = rows.filter(_._2 > 15).map(r => bin(r._1))
    val psi = (0 until bins).map { k =>
      val pa = (a.count(_ == k) + 1.0) / (a.size + bins.toDouble)
      val pb = (b.count(_ == k) + 1.0) / (b.size + bins.toDouble)
      (pa - pb) * math.log(pa / pb)
    }.sum
    val gotPsi = out.find(_._1 == et).get._4
    assert(math.abs(gotPsi - (math.floor(psi * 1e6 + 0.5) / 1e6)) <= 1e-6,
      s"$et: $gotPsi vs $psi")
  }

  test("qKAnonymity: suppression mass and verdict hand-checked on fixture classes") {
    import graft.queries.TrainingDataQueries
    val rep = TrainingDataQueries.qKAnonymity(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(rep.nonEmpty)
    // recompute the class histogram naively and cross-check every column
    val classes = Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"), Tables.eventDay.as("day"),
        floor(col("value") / TrainingDataQueries.AnonBand).cast("long").as("band"))
      .groupBy("event_type", "day", "band").count()
      .as[(String, java.sql.Date, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._4).toSeq).toMap
    rep.foreach { case (et, nc, mn, below, frac, ok) =>
      val cs = classes(et)
      assert(nc == cs.size && mn == cs.min)
      assert(below == cs.filter(_ < TrainingDataQueries.AnonK).sum)
      assert(ok == (mn >= TrainingDataQueries.AnonK))
      val f = below.toDouble / cs.sum.toDouble
      assert(frac == math.floor(f * 1e6 + 0.5) / 1e6)
    }
  }

  test("qDpCounts: noise equals the closed-form seeded Laplace draw per type") {
    import graft.queries.TrainingDataQueries
    val out = TrainingDataQueries.qDpCounts(spark, TestSpark.Sf)
      .as[(String, Double, Double)].collect()
      .map { case (t, _, v) => t -> v }.toMap
    val truth = Tables.events(spark, TestSpark.Sf)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    truth.foreach { case (et, n) =>
      val h = java.lang.Long.parseLong(md5hex(et + "|dp").take(8), 16)
      val u = (h.toDouble + 0.5) / 4294967296.0
      val c = u - 0.5
      val noise = -1.0 * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
      val want = math.floor((n.toDouble + noise) * 1e4 + 0.5) / 1e4
      assert(out(et) == want, s"$et: ${out(et)} vs $want")
      assert(math.abs(out(et) - n) < 25.0,
        "Laplace(1) noise from a 32-bit uniform is bounded by ~ln(2^32)")
    }
  }

  test("bpePairs: hand-counted bigrams, occurrence-weighted, single-char words dropped") {
    import graft.queries.TextStats
    // "abab ab x": words abab (ab, ba, ab) + ab (ab); x dropped
    val docs = Seq((1L, "abab ab x")).toDF("doc_id", "text")
    val r = TextStats.bpePairs(docs).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq(("ab", 3L, 2L), ("ba", 1L, 1L)))
  }

  test("rakeKeywords: phrase runs split on stopwords, degree/freq hand-checked") {
    import graft.queries.TextStats
    // phrases: [red apple], [apple] -> apple: freq 2, degree 2+1=3,
    // score 1.5; red: freq 1, degree 2, score 2.0
    val docs = Seq((1L, "red apple the apple")).toDF("doc_id", "text")
    val r = TextStats.rakeKeywords(docs).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(("red", 1L, 2L, 2.0), ("apple", 2L, 3L, 1.5)))
  }

  test("qNeardupDegree: histogram mass equals corpus size and 2x the pair count") {
    import graft.queries.TextDedup
    val hist = TextDedup.qNeardupDegree(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toSeq
    val nDocs = Tables.documents(spark, TestSpark.Sf).count()
    val nPairs = graft.queries.TextDedup.queries("q_simhash_neardup")(
      spark, TestSpark.Sf).count()
    assert(hist.map(_._2).sum == nDocs, "every doc lands in exactly one bin")
    assert(hist.map { case (d, n) => d * n }.sum == 2 * nPairs,
      "total degree must be twice the pair count")
  }

  test("qGroupingSets: exactly the three requested grains, margins consistent") {
    import graft.queries.ScalarQueries
    val rows = ScalarQueries.qGroupingSets(spark, TestSpark.Sf)
      .as[(String, String, Double, Long)].collect().toSeq
    val cross = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    val statusMargin = rows.filter(r => r._1 == "ALL" && r._2 != "ALL")
    val flagMargin = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(flagMargin.isEmpty, "the flag-only margin was NOT requested")
    assert(grand.size == 1 && grand.head._4 == cross.map(_._4).sum)
    statusMargin.foreach { m =>
      assert(m._4 == cross.filter(_._2 == m._2).map(_._4).sum,
        s"status margin ${m._2} must equal its cross-cell sum")
    }
  }

  test("cubeSummary over an EMPTY relation: zero rows (declared engine divergence)") {
    // degenerate sweep r19: the SQL standard (DuckDB/PostgreSQL) emits
    // one grand-total row (count 0) for the () grouping set over empty
    // input; Spark's Expand→HashAggregate emits none. The divergence is
    // DECLARED (see cubeSummary's Scaladoc) — this pin exists so a
    // Spark version that changes the behavior surfaces loudly here
    // instead of as a silent oracle flip in the degenerate sweep.
    import graft.queries.ScalarQueries
    val empty = Seq.empty[(String, String, Double)]
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    assert(ScalarQueries.cubeSummary(empty).collect().isEmpty,
      "Spark cube over empty input emitted rows — the declared divergence " +
        "(and its oracle triage in tools/degenerate_sweep.py) is now stale")
  }

  test("cubeSummary: a NULL data key stays NULL, distinct from the ALL margin") {
    // the review-r16 hazard distilled: one NULL-flagged row. The old
    // coalesce labeling emitted the NULL data group AS 'ALL', giving
    // two indistinguishable ('ALL', status) rows with different sums;
    // grouping()-based labels keep them apart.
    import graft.queries.ScalarQueries
    val li = Seq(("A", "O", 1.0), ("A", "F", 2.0), (null, "O", 4.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val rows = ScalarQueries.cubeSummary(li)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getDouble(2), r.getLong(3)))
    // the NULL-keyed data group survives as a NULL flag, not "ALL"
    assert(rows.exists { case (f, s, q, n) =>
      f.isEmpty && s.contains("O") && q == 4.0 && n == 1L })
    // the margin row over status O aggregates BOTH the A and NULL rows
    assert(rows.exists { case (f, s, q, n) =>
      f.contains("ALL") && s.contains("O") && q == 5.0 && n == 2L })
    // grand total is unique and complete
    val grand = rows.filter(r => r._1.contains("ALL") && r._2.contains("ALL"))
    assert(grand.length == 1 && grand.head._3 == 7.0 && grand.head._4 == 3L)
    // ADVICE r17: the output order is pinned NULLS LAST on both engines
    // (Spark defaults NULLS FIRST, DuckDB LAST) — the NULL-flagged data
    // row must sort AFTER every non-null flag, exactly as the oracle's
    // ORDER BY ... NULLS LAST places it
    val flags = ScalarQueries.cubeSummary(li)
      .collect().map(r => Option(r.getString(0)))
    assert(flags.zipWithIndex.filter(_._1.isEmpty).map(_._2)
      .forall(i => flags.drop(i + 1).forall(_.isEmpty)),
      s"NULL flags must be last in ${flags.mkString(",")}")
  }
}
