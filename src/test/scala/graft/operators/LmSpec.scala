package graft.operators

import graft.SparkTester
import graft.functions.{FixedLog2, LogFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram LM train/score split (TextAnalysis.trainBigramLm /
  * perplexityScore / perplexityBuckets) and the FixedLog2 determinism
  * primitive underneath it. */
class LmSpec extends AnyFunSuite with SparkTester {
  import spark.implicits._

  // ---- FixedLog2: the exact integer recurrence ----

  test("FixedLog2 matches the DuckDB recursive-CTE replay on pinned values") {
    // values computed by the oracle's recurrence in DuckDB (round-16 session):
    // same shift-and-square loop, so these pin cross-engine bit-identity
    val pinned = Seq(
      1L -> 0L,
      2L -> 1048576L,
      3L -> 1661953L,
      4L -> 2097152L,
      5L -> 2434718L,
      7L -> 2943724L,
      8L -> 3145728L,
      1000L -> 10449882L,
      1048576L -> 20971520L,
      4398046511104L -> 44040192L // 2^42
    )
    pinned.foreach { case (x, lq) => assert(FixedLog2.log2q20(x) == lq, s"x=$x") }
  }

  test("FixedLog2 is exact at powers of two, monotone, within 2^-19 of log2") {
    (0 to 62).foreach { e =>
      assert(FixedLog2.log2q20(1L << e) == e.toLong << 20)
    }
    var prev = -1L
    (1L to 5000L).foreach { x =>
      val lq = FixedLog2.log2q20(x)
      assert(lq >= prev, s"not monotone at $x")
      prev = lq
      val err = math.abs(lq / 1048576.0 - math.log(x.toDouble) / math.log(2.0))
      assert(err < 1.0 / (1 << 19), s"error $err at $x")
    }
    // beyond the old 2^43 shift-left ceiling: the two-sided-shift mantissa
    // keeps every positive long in-domain (a 100 TB context count fits)
    assert(FixedLog2.log2q20((1L << 62) - 1L) == (62L << 20) - 1L)
  }

  test("FixedLog2 throws loudly on non-positive input") {
    intercept[IllegalArgumentException](FixedLog2.log2q20(0L))
    intercept[IllegalArgumentException](FixedLog2.log2q20(-5L))
  }

  // ---- FixedLog2Dec: the 128-bit domain widening ----

  private def dec(b: BigInt) =
    org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(b), 38, 0)

  test("FixedLog2Dec equals FixedLog2 everywhere the domains overlap") {
    val xs = Seq(1L, 2L, 3L, 7L, (1L << 20) - 1, 1L << 20, (1L << 20) + 1,
      1L << 43, 123456789L, (1L << 62) - 1, Long.MaxValue)
    xs.foreach(x => assert(FixedLog2.log2q20Dec(dec(BigInt(x))) == FixedLog2.log2q20(x), s"x=$x"))
  }

  test("FixedLog2Dec: pinned values above the long ceiling (DuckDB HUGEINT ladder replay)") {
    // each value was run through the oracle's HUGEINT recursive CTE
    // (round-16 session): one 64-bit exponent step on top of the bigint
    // ladder, mantissa via x >> (e-20) on hugeint — bit-identical
    val pinned = Seq(
      (BigInt(1) << 63) + 12345 -> 66060288L,
      (BigInt(1) << 100) + 999999999999L -> 104857600L,
      BigInt(10).pow(37) -> 128881880L,
      BigInt("121932631966163686788446883") -> 90865626L,
      (BigInt(1) << 126) - 1 -> 132120575L // top of the decimal(38,0)-carried range
    )
    pinned.foreach { case (x, lq) => assert(FixedLog2.log2q20Dec(dec(x)) == lq, s"x=$x") }
    // exact at powers of two across the widened domain
    (0 to 125).foreach(e => assert(FixedLog2.log2q20Dec(dec(BigInt(1) << e)) == e.toLong << 20))
  }

  test("FixedLog2Dec is monotone across random 128-bit pairs and throws on non-positive") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val a = BigInt(125, rnd) + 1
      val b = BigInt(125, rnd) + 1
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      assert(FixedLog2.log2q20Dec(dec(lo)) <= FixedLog2.log2q20Dec(dec(hi)), s"$lo vs $hi")
    }
    intercept[IllegalArgumentException](FixedLog2.log2q20Dec(dec(BigInt(0))))
    intercept[IllegalArgumentException](FixedLog2.log2q20Dec(dec(BigInt(-7))))
  }

  test("fixed_log2_dec column expression agrees with the scala helper under codegen") {
    val xs = Seq("1", "6144", "9223372036854788153", "10000000000000000000000000000000000000")
    val got = xs
      .toDF("s")
      .select(LogFunctions.fixedLog2Dec(col("s").cast("decimal(38,0)")).as("lq"))
      .as[Long]
      .collect()
    assert(got.toSeq == xs.map(s => FixedLog2.log2q20Dec(dec(BigInt(s)))))
  }

  test("fixed_log2 column expression agrees with the scala helper under codegen") {
    val xs = Seq(1L, 2L, 3L, 17L, 999L, 123456789L)
    val got = xs.toDF("x").select(LogFunctions.fixedLog2(col("x")).as("lq")).as[Long].collect()
    assert(got.toSeq == xs.map(FixedLog2.log2q20))
  }

  // ---- trainBigramLm / perplexityScore: hand-computed truth ----

  private val bos = "\u0001"

  private def refDocs = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")

  test("trainBigramLm counts transitions with a BOS context per document") {
    val m = TextAnalysis
      .trainBigramLm(refDocs, "doc_id", "text")
      .as[(String, String, Long)]
      .collect()
      .toSet
    assert(
      m == Set((bos, "a", 1L), (bos, "b", 1L), ("a", "b", 1L), ("b", "a", 2L))
    )
  }

  test("perplexityScore is the exact Q20 add-one bigram NLL, unseen paths included") {
    val model = TextAnalysis.trainBigramLm(refDocs, "doc_id", "text")
    // model: ctx(BOS)=2, ctx(a)=1, ctx(b)=2; V=2
    val docs = Seq((10L, "a b"), (11L, "c c")).toDF("doc_id", "text")
    val got = TextAnalysis
      .perplexityScore(docs, model, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)]
      .collect()
      .toSeq
    def lq(x: Long) = FixedLog2.log2q20(x)
    // "a b": (BOS,a) num=2 den=4; (a,b) num=2 den=3
    val nll10 = (lq(4) - lq(2)) + (lq(3) - lq(2))
    // "c c": (BOS,c) unseen bigram num=1 den=4; (c,c) unseen CONTEXT num=1 den=0+V=2
    val nll11 = (lq(4) - lq(1)) + (lq(2) - lq(1))
    assert(
      got == Seq(
        (10L, 2L, nll10, (nll10 / 2).toDouble / 1048576.0),
        (11L, 2L, nll11, (nll11 / 2).toDouble / 1048576.0)
      )
    )
    assert(nll11 == 3145728L) // lq(4)+lq(2): 2 bits + 1 bit on the Q20 grid
  }

  test("perplexityScore is deterministic under repartitioning") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val model = TextAnalysis.trainBigramLm(docs.filter($"lang" === "en"), "doc_id", "text")
    val a = TextAnalysis.perplexityScore(docs, model, "doc_id", "text")
    val b = TextAnalysis.perplexityScore(docs.repartition(7), model, "doc_id", "text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("reference-fit model separates reference-like text from shuffled-garble text") {
    // natural docs: repeated high-probability transitions of the reference;
    // garble: tokens the reference never emits in these transitions
    val ref = (1L to 50L).map(i => (i, "the cat sat on the mat")).toDF("doc_id", "text")
    val model = TextAnalysis.trainBigramLm(ref, "doc_id", "text")
    val probe = Seq((100L, "the cat sat on the mat"), (101L, "mat the on sat cat the"))
      .toDF("doc_id", "text")
    val ce = TextAnalysis
      .perplexityScore(probe, model, "doc_id", "text")
      .orderBy("doc_id")
      .select("ce_bits")
      .as[Double]
      .collect()
    assert(ce(0) < ce(1), s"natural ${ce(0)} should beat garble ${ce(1)}")
  }

  test("mergeBigramLm: count additivity makes the model an incremental artifact") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val a = docs.filter($"doc_id" % 3 === 0)
    val b = docs.filter($"doc_id" % 3 =!= 0)
    val merged = TextAnalysis.mergeBigramLm(
      TextAnalysis.trainBigramLm(a, "doc_id", "text"),
      TextAnalysis.trainBigramLm(b, "doc_id", "text")
    )
    val whole = TextAnalysis.trainBigramLm(docs, "doc_id", "text")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // and the merged model SCORES identically — the artifact contract
    val probe = docs.limit(20)
    val sa = TextAnalysis.perplexityScore(probe, merged, "doc_id", "text")
    val sb = TextAnalysis.perplexityScore(probe, whole, "doc_id", "text")
    assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty)
    intercept[IllegalArgumentException] {
      TextAnalysis.mergeBigramLm(whole, Seq((1L, "x")).toDF("doc_id", "text"))
    }
  }

  test("keyCols: one pass of per-language models == training each language alone") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val keyed = TextAnalysis.trainBigramLm(docs, "doc_id", "text", Seq("lang"))
    val sKeyed = TextAnalysis
      .perplexityScore(docs, keyed, "doc_id", "text", Seq("lang"))
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    Seq("en", "zh").foreach { l =>
      val sub = docs.filter($"lang" === l)
      val sSub = TextAnalysis
        .perplexityScore(sub, TextAnalysis.trainBigramLm(sub, "doc_id", "text"), "doc_id", "text")
      val gotL = sKeyed.filter($"lang" === l).drop("lang")
      assert(gotL.exceptAll(sSub).isEmpty && sSub.exceptAll(gotL).isEmpty, s"lang $l diverged")
    }
    // keyed merge additivity, same contract as the global model
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val merged = TextAnalysis.mergeBigramLm(
      TextAnalysis.trainBigramLm(a, "doc_id", "text", Seq("lang")),
      TextAnalysis.trainBigramLm(b, "doc_id", "text", Seq("lang")),
      Seq("lang")
    )
    assert(merged.exceptAll(keyed).isEmpty && keyed.exceptAll(merged).isEmpty)
    // a doc whose key has no model emits no row (no defined probability)
    val stray = Seq((999L, "a b", "xx")).toDF("doc_id", "text", "lang")
    assert(
      TextAnalysis.perplexityScore(stray, keyed, "doc_id", "text", Seq("lang")).isEmpty
    )
  }

  test("trainTrigramLm + scoreStupidBackoff: hand-computed backoff ladder") {
    val model = TextAnalysis.trainTrigramLm(refDocs, "doc_id", "text")
    // tri: (B,B,a):1 (B,a,b):1 (a,b,a):1 (B,B,b):1 (B,b,a):1
    val tri = model.as[(String, String, String, Long)].collect().toSet
    assert(tri == Set(
      (bos, bos, "a", 1L), (bos, "a", "b", 1L), ("a", "b", "a", 1L),
      (bos, bos, "b", 1L), (bos, "b", "a", 1L)
    ))
    // derived bigram == trainBigramLm (consistency by construction)
    val bi = model.groupBy("prev1", "tok").agg(sum("cnt").as("cnt"))
    val bi2 = TextAnalysis.trainBigramLm(refDocs, "doc_id", "text")
    assert(bi.exceptAll(bi2).isEmpty && bi2.exceptAll(bi).isEmpty)
    def lq(x: Long) = FixedLog2.log2q20(x)
    val got = TextAnalysis
      .scoreStupidBackoff(
        Seq((10L, "a b a"), (11L, "b a b"), (12L, "z z")).toDF("doc_id", "text"),
        model, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)]
      .collect()
      .toSeq
    val q = 1048576L
    // "a b a": all three trigrams seen; ctx3(B,B)=2
    val n10 = lq(2)
    // "b a b": (B,B,b) seen lq(2); (B,b,a) seen 0; (b,a,b) -> bigram (a,b)
    // cnt2=1 ctx2(a)=1: penalty 1 bit
    val n11 = lq(2) + q
    // "z z": both tokens double-backoff to add-one unigram: N=5 V=2
    val n12 = 2L * (2 * q + lq(7) - lq(1))
    assert(got == Seq(
      (10L, 3L, n10, (n10 / 3).toDouble / 1048576.0),
      (11L, 3L, n11, (n11 / 3).toDouble / 1048576.0),
      (12L, 2L, n12, (n12 / 2).toDouble / 1048576.0)
    ))
  }

  // ---- scoreKneserNey: interpolated KN on the exact Q20 grid ----

  test("scoreKneserNey: hand-computed interpolated-KN NLLs, all three branches") {
    val model = TextAnalysis.trainBigramLm(refDocs, "doc_id", "text")
    // model: (B,a):1 (B,b):1 (a,b):1 (b,a):2
    // ctx: B->2(nv 2), a->1(nv 1), b->2(nv 1); cw: a->2, b->2
    // T=4, V=2, tv=6; n1=3, n2=1 -> dq = (3*1024) div 5 = 614
    val got = TextAnalysis
      .scoreKneserNey(Seq((10L, "a b"), (11L, "c c")).toDF("doc_id", "text"),
        model, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)]
      .collect()
      .toSeq
    def lq(x: Long) = FixedLog2.log2q20(x)
    val s10 = 10L << 20
    // (B,a): seen ctx, cnt=1: num = (1024-614)*6 + 614*2*(2+1) = 2460+3684 = 6144
    // (a,b): cnt=1: num = (1024-614)*6 + 614*1*(2+1) = 2460+1842 = 4302
    val nll10 = (s10 + lq(2) + lq(6) - lq(6144)) + (s10 + lq(1) + lq(6) - lq(4302))
    // (B,c): seen ctx, cnt=0 -> pure continuation: num = 614*2*(0+1) = 1228
    // (c,c): unseen context -> p_cont: num = 0+1 = 1, den = tv = 6
    val nll11 = (s10 + lq(2) + lq(6) - lq(1228)) + (lq(6) - lq(1))
    assert(got == Seq(
      (10L, 2L, nll10, (nll10 / 2).toDouble / 1048576.0),
      (11L, 2L, nll11, (nll11 / 2).toDouble / 1048576.0)
    ))
  }

  test("scoreKneserNey: discount edges — no-evidence midpoint and all-singletons clamp") {
    def lq(x: Long) = FixedLog2.log2q20(x)
    val s10 = 10L << 20
    // every bigram type has count >= 3 -> n1 = n2 = 0 -> dq = 512 (D = 1/2)
    val m1 = TextAnalysis.trainBigramLm(
      Seq((1L, "a a a a"), (2L, "a a a a"), (3L, "a a a a")).toDF("doc_id", "text"),
      "doc_id", "text")
    // model: (B,a):3 (a,a):9; ctx B->3(nv 1), a->9(nv 1); cw a->2; T=2 V=1 tv=3
    // probe "a": (B,a) cnt=3: num = (3*1024-512)*3 + 512*1*3 = 7680+1536 = 9216
    // p = 9216/(1024*3*3) = 1 exactly (deterministic corpus) — and the
    // per-FACTOR truncated logs land the defined NLL at lq(3)+lq(3)-lq(9)
    // = -1 on the Q20 grid (~-1e-6 bits), the documented semantics
    val g1 = TextAnalysis
      .scoreKneserNey(Seq((9L, "a")).toDF("doc_id", "text"), m1, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().head
    assert(g1._3 == s10 + lq(3) + lq(3) - lq(9216))
    // all count-1 types -> (n1*1024) div n1 = 1024 -> clamps to 1023
    val m2 = TextAnalysis.trainBigramLm(Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
    // model: (B,a):1 (a,b):1 (b,c):1; ctx B->1(nv 1), a->1(nv 1), b->1(nv 1)
    // cw: a->1 b->1 c->1; T=3 V=3 tv=6
    // probe "a": (B,a) cnt=1: num = (1024-1023)*6 + 1023*1*2 = 6+2046 = 2052
    val g2 = TextAnalysis
      .scoreKneserNey(Seq((9L, "a")).toDF("doc_id", "text"), m2, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().head
    assert(g2._3 == s10 + lq(1) + lq(6) - lq(2052))
    intercept[IllegalArgumentException](
      TextAnalysis.scoreKneserNey(refDocs, m2, "doc_id", "text", discountShift = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.scoreKneserNey(refDocs, refDocs, "doc_id", "text"))
  }

  test("scoreKneserNey(modified = true): hand-computed three-discount NLLs") {
    val model = TextAnalysis.trainBigramLm(refDocs, "doc_id", "text")
    // counts {1,1,1,2} -> n1=3 n2=1 n3=n4=0:
    //   dq1 = (3*1024) div 5 = 614; dq2/dq3 fall back to the k-1/2
    //   midpoints 1536/2560 (n3 = 0 starves both estimators)
    // fan-outs: B -> nv1=2; a -> nv1=1; b -> nv2=1 (the count-2 type)
    val got = TextAnalysis
      .scoreKneserNey(Seq((10L, "b a"), (11L, "c c")).toDF("doc_id", "text"),
        model, "doc_id", "text", modified = true)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)]
      .collect()
      .toSeq
    def lq(x: Long) = FixedLog2.log2q20(x)
    val s10 = 10L << 20
    // (B,b): cnt=1, lam(B) = dq1*2 = 1228:
    //   num = (1024-614)*6 + 1228*(cw(b)+1=3) = 2460 + 3684 = 6144
    // (b,a): cnt=2 -> D2 branch, lam(b) = dq2*nv2 = 1536:
    //   num = (2048-1536)*6 + 1536*(cw(a)+1=3) = 3072 + 4608 = 7680
    val nll10 = (s10 + lq(2) + lq(6) - lq(6144)) + (s10 + lq(2) + lq(6) - lq(7680))
    // (B,c): cnt=0 -> pure continuation mass: num = lam(B) = 1228
    // (c,c): unseen context -> num = 1, den = tv = 6
    val nll11 = (s10 + lq(2) + lq(6) - lq(1228)) + (lq(6) - lq(1))
    assert(got == Seq(
      (10L, 2L, nll10, (nll10 / 2).toDouble / 1048576.0),
      (11L, 2L, nll11, (nll11 / 2).toDouble / 1048576.0)
    ))
    // deterministic-corpus invariance: with a single successor per context
    // and tv = 3, any discount cancels ((k*1024-d)*3 + d*1*3 = 3072k) —
    // modified and plain KN must agree exactly on the all-"a" corpus
    val m1 = TextAnalysis.trainBigramLm(
      Seq((1L, "a a a a"), (2L, "a a a a"), (3L, "a a a a")).toDF("doc_id", "text"),
      "doc_id", "text")
    val probe = Seq((9L, "a a")).toDF("doc_id", "text")
    val plain = TextAnalysis.scoreKneserNey(probe, m1, "doc_id", "text")
    val mkn = TextAnalysis.scoreKneserNey(probe, m1, "doc_id", "text", modified = true)
    assert(plain.exceptAll(mkn).isEmpty && mkn.exceptAll(plain).isEmpty)
  }

  test("scoreKneserNey: deterministic under repartitioning; separates natural from garble") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val model = TextAnalysis.trainBigramLm(docs.filter($"lang" === "en"), "doc_id", "text")
    val a = TextAnalysis.scoreKneserNey(docs, model, "doc_id", "text")
    val b = TextAnalysis.scoreKneserNey(docs.repartition(7), model, "doc_id", "text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val ref = (1L to 50L).map(i => (i, "the cat sat on the mat")).toDF("doc_id", "text")
    val m = TextAnalysis.trainBigramLm(ref, "doc_id", "text")
    val ce = TextAnalysis
      .scoreKneserNey(
        Seq((100L, "the cat sat on the mat"), (101L, "mat the on sat cat the"))
          .toDF("doc_id", "text"),
        m, "doc_id", "text")
      .orderBy("doc_id").select("ce_bits").as[Double].collect()
    assert(ce(0) < ce(1), s"natural ${ce(0)} should beat garble ${ce(1)}")
  }

  test("scoreKneserNey keyCols: one keyed pass == scoring each language alone") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val keyed = TextAnalysis.trainBigramLm(docs, "doc_id", "text", Seq("lang"))
    val sKeyed = TextAnalysis
      .scoreKneserNey(docs, keyed, "doc_id", "text", keyCols = Seq("lang"))
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    Seq("en", "zh").foreach { l =>
      val sub = docs.filter($"lang" === l)
      val sSub = TextAnalysis.scoreKneserNey(
        sub, TextAnalysis.trainBigramLm(sub, "doc_id", "text"), "doc_id", "text")
      val gotL = sKeyed.filter($"lang" === l).drop("lang")
      assert(gotL.exceptAll(sSub).isEmpty && sSub.exceptAll(gotL).isEmpty, s"lang $l diverged")
    }
    // a doc whose key has no model emits no row, like perplexityScore
    val stray = Seq((999L, "a b", "xx")).toDF("doc_id", "text", "lang")
    assert(
      TextAnalysis.scoreKneserNey(stray, keyed, "doc_id", "text", keyCols = Seq("lang")).isEmpty
    )
  }

  // ---- perplexityBuckets: CCNet head/middle/tail per language ----

  test("perplexityBuckets tags per-language terciles on exact boundaries") {
    // V must be >= 2: with a single-word vocabulary an unseen context's
    // add-one distribution is uniform over ONE word (p = 1, nll = 0), so
    // all-unseen text would score BETTER than partially-seen text
    val ref = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val model = TextAnalysis.trainBigramLm(ref, "doc_id", "text")
    // three docs per lang with strictly increasing unseen-token share -> ce
    // (hand-checked: ce = 0.5, ~0.896, ~1.146 bits/token)
    val docs = Seq(
      (10L, "a b a b", "en"), (11L, "a b z b", "en"), (12L, "z z z z", "en"),
      (20L, "a b a b", "de"), (21L, "a b z b", "de"), (22L, "z z z z", "de")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis
      .perplexityBuckets(docs, model, "doc_id", "text", "lang", exact = true)
      .select("doc_id", "bucket")
      .as[(Long, String)]
      .collect()
      .toMap
    assert(got == Map(
      10L -> "head", 11L -> "middle", 12L -> "tail",
      20L -> "head", 21L -> "middle", 22L -> "tail"
    ))
  }

  test("perplexityBuckets plumbs discountShift/modified through to the KN scorer") {
    // ADVICE r16: modified-KN terciles must be reachable from the bucket
    // composition — pin that the plumbed params change the underlying ce
    // exactly as a direct scoreKneserNey call would
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet").limit(60)
    val model = TextAnalysis.trainBigramLm(docs.filter($"lang" === "en"), "doc_id", "text")
    def bucketCe(mod: Boolean, shift: Int) = TextAnalysis
      .perplexityBuckets(docs, model, "doc_id", "text", "lang",
        exact = true, smoothing = "kn", discountShift = shift, modified = mod)
      .select("doc_id", "ce_bits")
    def directCe(mod: Boolean, shift: Int) = TextAnalysis
      .scoreKneserNey(docs, model, "doc_id", "text", discountShift = shift, modified = mod)
      .select("doc_id", "ce_bits")
    Seq((false, 10), (true, 10), (false, 6)).foreach { case (mod, shift) =>
      val a = bucketCe(mod, shift); val b = directCe(mod, shift)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"(mod=$mod, shift=$shift)")
    }
    // jm/wb route to their scorers with defaults; unknown names refuse
    Seq[(String, org.apache.spark.sql.DataFrame)](
      "jm" -> TextAnalysis.scoreJelinekMercer(docs, model, "doc_id", "text"),
      "wb" -> TextAnalysis.scoreWittenBell(docs, model, "doc_id", "text")
    ).foreach { case (sm, direct) =>
      val viaBuckets = TextAnalysis
        .perplexityBuckets(docs, model, "doc_id", "text", "lang", exact = true, smoothing = sm)
        .select("doc_id", "ce_bits")
      val d = direct.select("doc_id", "ce_bits")
      assert(viaBuckets.exceptAll(d).isEmpty && d.exceptAll(viaBuckets).isEmpty, sm)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.perplexityBuckets(docs, model, "doc_id", "text", "lang", smoothing = "x")
    }
    // ADVICE r17: KN-only knobs with a non-KN smoother refuse loudly
    // instead of being silently ignored
    val knOnly = intercept[IllegalArgumentException] {
      TextAnalysis.perplexityBuckets(
        docs, model, "doc_id", "text", "lang", smoothing = "jm", discountShift = 5)
    }
    assert(knOnly.getMessage.contains("only apply to smoothing='kn'"))
    intercept[IllegalArgumentException] {
      TextAnalysis.perplexityBuckets(
        docs, model, "doc_id", "text", "lang", smoothing = "wb", modified = true)
    }
  }

  // ---- mergeTrigramLm: the stupid-backoff artifact's incremental merge ----

  test("mergeTrigramLm: merge == retrain, derived bigrams stay consistent, scoring identical") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val a = docs.filter($"doc_id" % 3 === 0)
    val b = docs.filter($"doc_id" % 3 =!= 0)
    val merged = TextAnalysis.mergeTrigramLm(
      TextAnalysis.trainTrigramLm(a, "doc_id", "text"),
      TextAnalysis.trainTrigramLm(b, "doc_id", "text")
    )
    val whole = TextAnalysis.trainTrigramLm(docs, "doc_id", "text")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // x139's consistency contract HOLDS THROUGH the merge: bigrams derived
    // from the merged trigram table == trainBigramLm on the union ==
    // mergeBigramLm of the per-half derived bigrams
    def derive(m: org.apache.spark.sql.DataFrame) =
      m.groupBy("prev1", "tok").agg(sum("cnt").as("cnt"))
        .select($"prev1".as("prev"), $"tok", $"cnt")
    val fromMerged = derive(merged)
    val direct = TextAnalysis.trainBigramLm(docs, "doc_id", "text")
    assert(fromMerged.exceptAll(direct).isEmpty && direct.exceptAll(fromMerged).isEmpty)
    val mergedLower = TextAnalysis.mergeBigramLm(
      derive(TextAnalysis.trainTrigramLm(a, "doc_id", "text")),
      derive(TextAnalysis.trainTrigramLm(b, "doc_id", "text"))
    )
    assert(fromMerged.exceptAll(mergedLower).isEmpty && mergedLower.exceptAll(fromMerged).isEmpty)
    // and the merged model SCORES identically — the artifact contract
    val probe = docs.limit(20)
    val sa = TextAnalysis.scoreStupidBackoff(probe, merged, "doc_id", "text")
    val sb = TextAnalysis.scoreStupidBackoff(probe, whole, "doc_id", "text")
    assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty)
    intercept[IllegalArgumentException] {
      TextAnalysis.mergeTrigramLm(whole, Seq((1L, "x")).toDF("doc_id", "text"))
    }
  }

  // ---- Jelinek–Mercer / Witten–Bell: the remaining classic smoothers ----

  test("scoreJelinekMercer: hand-computed dyadic-lambda NLLs, both branches") {
    val model = TextAnalysis.trainBigramLm(refDocs, "doc_id", "text")
    // model: (B,a):1 (B,b):1 (a,b):1 (b,a):2
    // ctx: B->2, a->1, b->2; cw: a->2, b->2; T=4, V=2, tv=6
    def lq(x: Long) = FixedLog2.log2q20(x)
    val s1 = 1L << 20
    val got = TextAnalysis
      .scoreJelinekMercer(Seq((10L, "a b"), (11L, "c c")).toDF("doc_id", "text"),
        model, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    // λ = 1/2: (B,a) num = 1·1·6 + 2·1·3 = 12  (p = 12/24 = ½·½ + ½·(3/6))
    //          (a,b) num = 1·1·6 + 1·1·3 = 9   (p = 9/12 = ½·1 + ½·(3/6))
    val nll10 = (s1 + lq(2) + lq(6) - lq(12)) + (s1 + lq(1) + lq(6) - lq(9))
    // (B,c): seen ctx, cnt=0 -> num = 2·1·1 = 2   (p = 2/24 = ½·(1/6))
    // (c,c): unseen context -> p_cont: num = 1, den = tv = 6
    val nll11 = (s1 + lq(2) + lq(6) - lq(2)) + (lq(6) - lq(1))
    assert(got == Seq(
      (10L, 2L, nll10, (nll10 / 2).toDouble / 1048576.0),
      (11L, 2L, nll11, (nll11 / 2).toDouble / 1048576.0)
    ))
    // non-default λ = 3/4: (B,a) num = 1·3·6 + 2·1·3 = 24 (p = 24/48 = ¾·½ + ¼·½)
    val s2 = 2L << 20
    val g34 = TextAnalysis
      .scoreJelinekMercer(Seq((10L, "a")).toDF("doc_id", "text"),
        model, "doc_id", "text", lambdaQ = 3L, lambdaShift = 2)
      .as[(Long, Long, Long, Double)].collect().head
    assert(g34._3 == s2 + lq(2) + lq(6) - lq(24))
    intercept[IllegalArgumentException](
      TextAnalysis.scoreJelinekMercer(refDocs, model, "doc_id", "text", lambdaQ = 2L, lambdaShift = 1))
    intercept[IllegalArgumentException](
      TextAnalysis.scoreJelinekMercer(refDocs, model, "doc_id", "text", lambdaShift = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.scoreJelinekMercer(refDocs, refDocs, "doc_id", "text"))
  }

  test("scoreWittenBell: hand-computed fan-out-weighted NLLs, both branches") {
    val model = TextAnalysis.trainBigramLm(refDocs, "doc_id", "text")
    // ctx: B->2(nv 2), a->1(nv 1), b->2(nv 1); cw: a->2, b->2; T=4, V=2, tv=6
    def lq(x: Long) = FixedLog2.log2q20(x)
    val got = TextAnalysis
      .scoreWittenBell(Seq((10L, "a b"), (11L, "c c")).toDF("doc_id", "text"),
        model, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    // (B,a): num = 1·6 + 2·3 = 12, den = (2+2)·6   (p = ½ = [1 + 2·½]/4)
    // (a,b): num = 1·6 + 1·3 = 9,  den = (1+1)·6   (p = ¾ = [1 + ½]/2)
    val nll10 = (lq(4) + lq(6) - lq(12)) + (lq(2) + lq(6) - lq(9))
    // (B,c): cnt=0 -> num = 2·1 = 2, den = 4·6     (p = 1/12 = [2·(1/6)]/4)
    // (c,c): unseen context -> p_cont: num = 1, den = tv = 6
    val nll11 = (lq(4) + lq(6) - lq(2)) + (lq(6) - lq(1))
    assert(got == Seq(
      (10L, 2L, nll10, (nll10 / 2).toDouble / 1048576.0),
      (11L, 2L, nll11, (nll11 / 2).toDouble / 1048576.0)
    ))
    intercept[IllegalArgumentException](
      TextAnalysis.scoreWittenBell(refDocs, refDocs, "doc_id", "text"))
  }

  test("JM/WB: deterministic under repartitioning; keyed pass == per-language alone") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val model = TextAnalysis.trainBigramLm(docs.filter($"lang" === "en"), "doc_id", "text")
    Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
      "jm" -> (d => TextAnalysis.scoreJelinekMercer(d, model, "doc_id", "text")),
      "wb" -> (d => TextAnalysis.scoreWittenBell(d, model, "doc_id", "text"))
    ).foreach { case (n, f) =>
      val a = f(docs); val b = f(docs.repartition(7))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$n not deterministic")
    }
    val keyed = TextAnalysis.trainBigramLm(docs, "doc_id", "text", Seq("lang"))
    val sKeyed = TextAnalysis
      .scoreWittenBell(docs, keyed, "doc_id", "text", keyCols = Seq("lang"))
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val sub = docs.filter($"lang" === "zh")
    val sSub = TextAnalysis.scoreWittenBell(
      sub, TextAnalysis.trainBigramLm(sub, "doc_id", "text"), "doc_id", "text")
    val gotL = sKeyed.filter($"lang" === "zh").drop("lang")
    assert(gotL.exceptAll(sSub).isEmpty && sSub.exceptAll(gotL).isEmpty)
  }

  // ---- ADVICE r16: the empty-model guard ----

  test("empty model at keyCols = Nil raises the real cause, keyed mode drops cleanly") {
    val empty = TextAnalysis.trainBigramLm(
      refDocs.filter($"doc_id" < 0), "doc_id", "text")
    Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "kn" -> (() => TextAnalysis.scoreKneserNey(refDocs, empty, "doc_id", "text")),
      "jm" -> (() => TextAnalysis.scoreJelinekMercer(refDocs, empty, "doc_id", "text")),
      "wb" -> (() => TextAnalysis.scoreWittenBell(refDocs, empty, "doc_id", "text"))
    ).foreach { case (n, f) =>
      val e = intercept[Throwable](f().collect())
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("empty model"), s"$n raised the wrong error: $msgs")
    }
    // keyed mode: the empty model has no keys, so every doc drops — no row,
    // no misleading error (the documented contract)
    val emptyKeyed = TextAnalysis.trainBigramLm(
      refDocs.filter($"doc_id" < 0).withColumn("lang", lit("en")),
      "doc_id", "text", Seq("lang"))
    assert(TextAnalysis
      .scoreKneserNey(refDocs.withColumn("lang", lit("en")), emptyKeyed,
        "doc_id", "text", keyCols = Seq("lang"))
      .isEmpty)
  }

  // ---- excessPerplexity: the RHO-1-style two-model signal ----

  test("excessPerplexity equals the join of the two perplexityScore passes exactly") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val ref = TextAnalysis.trainBigramLm(docs.filter($"lang" === "en"), "doc_id", "text")
    val self = TextAnalysis.trainBigramLm(docs, "doc_id", "text")
    val got = TextAnalysis.excessPerplexity(docs, ref, self, "doc_id", "text")
    val r = TextAnalysis.perplexityScore(docs, ref, "doc_id", "text")
    val s = TextAnalysis.perplexityScore(docs, self, "doc_id", "text")
    val want = r
      .select($"doc_id", $"n_tokens", $"nll_q20".as("ref_nll_q20"), $"ce_bits".as("ref_ce_bits"))
      .join(
        s.select($"doc_id", $"nll_q20".as("self_nll_q20"), $"ce_bits".as("self_ce_bits")),
        Seq("doc_id"))
      .withColumn("excess_bits", $"self_ce_bits" - $"ref_ce_bits")
      .select(got.columns.map(col).toSeq: _*)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // determinism under repartitioning (the whole chain is exact integers)
    val again = TextAnalysis.excessPerplexity(docs.repartition(7), ref, self, "doc_id", "text")
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
  }

  test("excessPerplexity ranks reference-like-but-corpus-rare docs above corpus-typical ones") {
    // corpus: many copies of the "typical" phrase pattern + ONE doc written
    // in the reference's register. The self model fits the typical mass, so
    // the reference-like doc is the one the reference predicts BETTER than
    // the corpus does -> largest excess.
    val typical = (1 to 40).map(i => (i.toLong, s"spam spam buy now offer $i"))
    val refLike = Seq((100L, "the quick brown fox jumps over the lazy dog"))
    val corpus = (typical ++ refLike).toDF("doc_id", "text")
    val refCorpus = (1 to 20)
      .map(i => (1000L + i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val ref = TextAnalysis.trainBigramLm(refCorpus, "doc_id", "text")
    val self = TextAnalysis.trainBigramLm(corpus, "doc_id", "text")
    val top = TextAnalysis
      .excessPerplexity(corpus, ref, self, "doc_id", "text")
      .orderBy(desc("excess_bits"), $"doc_id")
      .select("doc_id")
      .head()
      .getLong(0)
    assert(top == 100L, s"expected the reference-register doc on top, got $top")
  }
}
