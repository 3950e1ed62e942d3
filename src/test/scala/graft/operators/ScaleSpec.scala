package graft.operators

import graft.SparkTester
import graft.queries.Tables.t
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite with SparkTester {

  test("stratified sample key distinguishes NULL id segments from shifted ones") {
    import spark.implicits._
    // concat_ws silently skips NULLs, so before the sentinel fix these two
    // rows shared the key "a|b" and always sampled identically
    val df = Seq(
      (1L, "a", Option.empty[String], Some("b"), "s"),
      (2L, "a", Some("b"), Option.empty[String], "s")
    ).toDF("row_id", "i1", "i2", "i3", "strat")
    val buckets = df
      .select(
        col("row_id"),
        pmod(
          Dedup.tokenHash60(
            concat_ws(
              "|",
              Seq("i1", "i2", "i3").map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*
            )
          ),
          lit(1000L)
        ).as("hb")
      )
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(buckets(1L) != buckets(2L), s"sentinel keys still collide: $buckets")
    // a rate strictly between the two buckets samples exactly one row
    val cut = (math.min(buckets(1L), buckets(2L)) + 1) / 1000.0
    val kept = Scale.stratifiedHashSample(df, Seq("i1", "i2", "i3"), "strat", Map("s" -> cut))
    assert(kept.count() == 1)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val li = t(spark, sfTiny, "lineitem").select("l_orderkey", "l_quantity")
    val o = t(spark, sfTiny, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Seq("li_b", "o_b").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"/tmp/graft-warehouse/$tbl"))
    }
    Scale.writeBucketed(li, "li_b", Seq("l_orderkey"), 8)
    Scale.writeBucketed(o, "o_b", Seq("l_orderkey"), 8)
    // force the sort-merge path so the bucketing (not broadcast) is what
    // eliminates the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan) // no shuffle
      assert(joined.count() == t(spark, sfTiny, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE o_b")
    }
  }

  test("salted join equals plain join") {
    val li = t(spark, sfTiny, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    val o = t(spark, sfTiny, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Scale.saltedJoin(li, o, Seq("l_orderkey"), 8)
    assert(salted.count() == plain.count())
    val key = plain.columns.map(col).toIndexedSeq
    assert(
      salted.orderBy(key: _*).collect().toSeq == plain.orderBy(key: _*).collect().toSeq
    )
  }

  test("salted aggregation equals direct aggregation") {
    val li = t(spark, sfTiny, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), Relational.dsum(col("l_quantity"), 12).as("s"))
    val salted = Scale.saltedAgg(
      li,
      Seq("l_returnflag"),
      8,
      g => g.agg(count(lit(1)).as("pn"), sum(col("l_quantity").cast("decimal(12,2)")).as("ps")),
      g => g.agg(sum("pn").as("n"), sum("ps").cast("double").as("s"))
    )
    assert(
      salted.orderBy("l_returnflag").collect().toSeq ==
        direct.orderBy("l_returnflag").collect().toSeq
    )
  }

  test("salted left-outer join equals plain left join (unmatched left rows kept once)") {
    import spark.implicits._
    val li = t(spark, sfTiny, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    // drop half the orders so some left rows are unmatched
    val o = t(spark, sfTiny, "orders")
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"), "left_outer")
    val salted = Scale.saltedJoin(li, o, Seq("l_orderkey"), 8, "left_outer")
    assert(salted.count() == plain.count())
    val key = plain.columns.map(col).toIndexedSeq
    assert(salted.orderBy(key: _*).collect().toSeq == plain.orderBy(key: _*).collect().toSeq)
  }

  test("salted semi/anti joins equal their plain counterparts") {
    val li = t(spark, sfTiny, "lineitem").select("l_orderkey", "l_linenumber")
    val o = t(spark, sfTiny, "orders")
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("l_orderkey"))
    Seq("left_semi", "left_anti").foreach { how =>
      val plain = li.join(o, Seq("l_orderkey"), how)
      val salted = Scale.saltedJoin(li, o, Seq("l_orderkey"), 8, how)
      assert(salted.count() == plain.count(), how)
      val key = plain.columns.map(col).toIndexedSeq
      assert(salted.orderBy(key: _*).collect().toSeq == plain.orderBy(key: _*).collect().toSeq, how)
    }
  }

  test("AQE splits a skewed join partition at runtime (the first-line skew defense)") {
    import spark.implicits._
    // one hot key dominating the left side
    val left = spark.range(200000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"), col("id").as("v"))
    val right = spark.range(500).select(col("id").as("k"), (col("id") * 2).as("w"))
    val conf = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"
    )
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = left.join(right, "k")
      // collect() runs THIS dataset's QueryExecution (count()/write plan
      // their own), so the AQE final plan is observable on it afterwards.
      // 180000 hot-key (k=1) matches + 50 ids divisible by 10 below 500
      assert(joined.collect().length == 180050)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark the skewed join:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salted join rejects right/full outer (replication would duplicate unmatched right rows)") {
    val li = t(spark, sfTiny, "lineitem").select("l_orderkey")
    val o = t(spark, sfTiny, "orders").select(col("o_orderkey").as("l_orderkey"))
    Seq("right", "right_outer", "full", "full_outer", "outer").foreach { how =>
      val e = intercept[IllegalArgumentException](Scale.saltedJoin(li, o, Seq("l_orderkey"), 8, how))
      assert(e.getMessage.contains("saltedJoin"), s"how=$how: ${e.getMessage}")
    }
  }

  test("capPerKey keeps the k best rows per key, full rows, invariant to partitioning") {
    import spark.implicits._
    // skewed: key "hot" has 50 rows, "cold" has 2, "one" has 1
    val rows =
      (1 to 50).map(i => ("hot", i.toLong, i % 7, s"payload$i")) ++
        Seq(("cold", 100L, 9, "c1"), ("cold", 101L, 9, "c2"), ("one", 200L, 1, "solo"))
    val df = rows.toDF("source", "doc_id", "prio", "payload")
    def run(parts: Int): Seq[(String, Long)] =
      Scale
        .capPerKey(df.repartition(parts), "source", "doc_id", col("prio"), 3)
        .select("source", "doc_id")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .sorted
        .toSeq
    val got = run(4)
    // hot: prio 6 rows are ids 6,13,20,27,34,41,48 -> top-3 by (prio, id) =
    // ids 48,41,34; cold + one keep everything (fewer than k rows)
    assert(got == Seq(("cold", 100L), ("cold", 101L), ("hot", 34L), ("hot", 41L), ("hot", 48L), ("one", 200L)))
    // deterministic at any parallelism (the id tiebreak, not arrival order)
    assert(run(1) == got && run(13) == got)
    // full rows survive, not just the packed columns
    assert(
      Scale.capPerKey(df, "source", "doc_id", col("prio"), 3).columns.toSeq ==
        Seq("source", "doc_id", "prio", "payload")
    )
  }

  test("resampleToMix: binding group keeps all rows; equals hash sample at computed rates") {
    val docs = t(spark, sfTiny, "documents")
    val shares = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05)
    val out = Scale.resampleToMix(docs, Seq("doc_id"), "lang", shares)
    // full row schema and column order preserved
    assert(out.columns.toSeq == docs.columns.toSeq)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val smax = shares.map { case (g, s) => byLang(g) / s }.min
    val rates = shares.map { case (g, s) => g -> math.min(1.0, s * smax / byLang(g)) }
    // the binding group's rate is ~1.0 -> it keeps every row
    val binding = shares.keys.minBy(g => byLang(g) / shares(g))
    val outByLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outByLang(binding) == byLang(binding), s"binding group $binding must keep all rows")
    // exact row-set equivalence with stratifiedHashSample at the derived
    // rates (same hash, same bucket cut) -- pins the rate arithmetic
    val viaStrat = Scale.stratifiedHashSample(docs, Seq("doc_id"), "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == viaStrat)
    // partition-count invariant; groups outside the mixture are dropped
    val repart = Scale.resampleToMix(docs.repartition(11), Seq("doc_id"), "lang", shares)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart == got)
    val partial = Scale.resampleToMix(docs, Seq("doc_id"), "lang", Map("en" -> 1.0))
    assert(partial.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))
  }

  test("resampleToMix equals hash-sample at derived rates for random share maps (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docs = t(spark, sfTiny, "documents").select("doc_id", "lang").cache()
    val langs = Seq("en", "de", "fr", "es", "zh")
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val genShares: Gen[Map[String, Double]] = for {
      k <- Gen.choose(2, langs.size)
      chosen <- Gen.pick(k, langs)
      ws <- Gen.listOfN(k, Gen.choose(1, 20))
    } yield {
      val tot = ws.sum.toDouble
      chosen.toList.zip(ws.map(_ / tot)).toMap
    }
    val prop = Prop.forAll(genShares) { shares =>
      val out = Scale.resampleToMix(docs, Seq("doc_id"), "lang", shares)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val smax = shares.map { case (g, s) => byLang(g) / s }.min
      val rates = shares.map { case (g, s) => g -> math.min(1.0, s * smax / byLang(g)) }
      val want = Scale.stratifiedHashSample(docs, Seq("doc_id"), "lang", rates)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val binding = shares.keys.minBy(g => byLang(g) / shares(g))
      val keptBinding = Scale.resampleToMix(docs, Seq("doc_id"), "lang", shares)
        .filter(col("lang") === binding).count()
      out == want && keptBinding == byLang(binding)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    docs.unpersist()
    assert(res.passed, res.status.toString)
  }

  test("hashSplit: stable under partitioning and corpus growth; fractions near targets") {
    val docs = t(spark, sfTiny, "documents")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Scale.hashSplit(df, Seq("doc_id"), splits)
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assign(docs)
    assert(assign(docs.repartition(9)) == a, "split must not depend on partitioning")
    // growth stability: assignments computed on HALF the corpus agree with
    // the full-corpus assignment on the shared rows (no migration — the
    // property randomSplit lacks)
    val half = assign(docs.filter(col("doc_id") % 2 === 0))
    half.foreach { case (id, s) => assert(a(id) == s, s"doc $id migrated $s -> ${a(id)}") }
    val byName = a.values.groupBy(identity).view.mapValues(_.size).toMap
    splits.foreach { case (name, f) =>
      val got = byName.getOrElse(name, 0).toDouble / a.size
      assert(math.abs(got - f) < 0.06, f"split $name: got $got%.3f want $f")
    }
    // every row lands in exactly one named split; bad fractions reject
    assert(a.values.toSet.subsetOf(splits.map(_._1).toSet))
    intercept[IllegalArgumentException] {
      Scale.hashSplit(docs, Seq("doc_id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("dsirLogWeights: target-like docs outscore off-target; grid sums are partition-invariant") {
    import spark.implicits._
    // raw corpus: 20 "physics" docs + 20 "spam" docs; target = physics only.
    // Importance weights must separate the two populations cleanly.
    val phys = (0 until 20).map(i => (i.toLong, "quark gluon lattice boson field theory"))
    val spam = (0 until 20).map(i => (20L + i, "click here buy now free prize winner"))
    val raw = (phys ++ spam).toDF("doc_id", "text")
    val target = phys.toDF("doc_id", "text")
    val w = Scale.dsirLogWeights(raw, target, "text", buckets = 512)
    val byDoc = w.select("doc_id", "dsir_logw").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val minPhys = (0 until 20).map(i => byDoc(i.toLong)).min
    val maxSpam = (0 until 20).map(i => byDoc(20L + i)).max
    assert(minPhys > maxSpam, s"physics $minPhys should outscore spam $maxSpam")
    // every weight sits on the 2^-20 grid times an integer count — so the
    // fold is exact and any partitioning computes the identical double
    val re = Scale
      .dsirLogWeights(raw.repartition(13), target, "text", buckets = 512)
      .select("doc_id", "dsir_logw")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    byDoc.foreach { case (id, v) =>
      assert(java.lang.Double.doubleToLongBits(v) == java.lang.Double.doubleToLongBits(re(id)), s"doc $id")
    }
    intercept[IllegalArgumentException] {
      Scale.dsirLogWeights(raw, target.filter(lit(false)), "text", buckets = 512)
    }
    intercept[IllegalArgumentException] {
      Scale.dsirLogWeights(raw, target, "text", buckets = 1 << 20)
    }
  }

  test("dsirSelect: Gumbel-top-k is deterministic, k-bounded, and favors high weights") {
    import spark.implicits._
    val phys = (0 until 20).map(i => (i.toLong, "quark gluon lattice boson field theory"))
    val spam = (0 until 20).map(i => (20L + i, "click here buy now free prize winner"))
    val raw = (phys ++ spam).toDF("doc_id", "text")
    val target = phys.toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val sel = Scale.dsirSelect(raw, target, "doc_id", "text", k = 10, buckets = 512)
    assert(sel.count() == 10)
    assert(sel.columns.contains("dsir_key") && sel.columns.contains("dsir_logw"))
    // the weight gap here dwarfs Gumbel noise — all picks are physics docs
    assert(ids(sel).forall(_ < 20L))
    // deterministic: same picks at a different partitioning
    assert(ids(Scale.dsirSelect(raw.repartition(7), target, "doc_id", "text", 10, 512)) == ids(sel))
    // k >= corpus returns everything
    assert(Scale.dsirSelect(raw, target, "doc_id", "text", 100, 512).count() == 40)
    intercept[IllegalArgumentException] {
      Scale.dsirSelect(raw, target, "doc_id", "text", k = 0)
    }
  }

  test("weightedSample: matches a local A-ES replay; deterministic; nonpositive weights excluded") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      val w = if (i % 17 == 0) 0.0 else if (i % 23 == 0) -3.0 else (1 + i % 9).toDouble
      (i.toLong, w)
    }
    val df = rows.map { case (id, w) => (id, Option(w)) }.toDF("id", "w")
      .unionByName(Seq((999L, Option.empty[Double])).toDF("id", "w"))
    val got = Scale.weightedSample(df, "id", "w", 25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.size == 25)
    // local replay of the exact key formula over positive-weight rows
    def h60(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.substring(17, 32), 16)
    }
    val expected = rows
      .filter(_._2 > 0)
      .map { case (id, w) =>
        val u = ((h60(id) >>> 8).toDouble + 0.5) / math.pow(2.0, 52)
        (id, math.log(w) + -math.log(-math.log(u)))
      }
      .sortBy { case (id, k) => (-k, id) }.take(25).map(_._1).toSet
    assert(got == expected)
    // why the 52-bit slice: u must be EXACTLY representable and strictly
    // inside (0,1) at every hash. The max 52-bit u stays below 1, while a
    // raw 60-bit hash near 2^60 rounds (53-bit mantissa, double spacing
    // 128 in that binade) to u = 1.0 exactly — -ln(-ln(1)) = +Inf, an
    // unconditional winner regardless of weight
    val uMax = (((1L << 52) - 1).toDouble + 0.5) / math.pow(2.0, 52)
    assert(uMax < 1.0 && uMax > 0.0)
    assert(((1L << 60) - 50L).toDouble + 0.5 == math.pow(2.0, 60)) // the old pathology
    // zero/negative/null weight rows never selected, even with k >= corpus
    val all = Scale.weightedSample(df, "id", "w", 1000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!all.contains(999L) && all == rows.filter(_._2 > 0).map(_._1).toSet)
    // partitioning-invariant
    val gotPar = Scale.weightedSample(df.repartition(13), "id", "w", 25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotPar == got)
    // inclusion tracks weight: the top weight class is overrepresented
    // vs the bottom one among the 25 picks (a deterministic fact here)
    val picked9 = got.count(id => id < 200 && (1 + id % 9) == 9)
    val picked1 = got.count(id => id < 200 && (1 + id % 9) == 1 && id % 17 != 0 && id % 23 != 0)
    assert(picked9 > picked1, s"w=9 picks $picked9 should beat w=1 picks $picked1")
    intercept[IllegalArgumentException] { Scale.weightedSample(df, "id", "w", 0) }
  }

  test("selectByBudget: equals the greedy (score DESC, id) token prefix; layer ties; guards") {
    import spark.implicits._
    // scores with TIES so the boundary layer logic is exercised: three
    // docs at score 3.0 with different ids and token counts
    val rows = Seq(
      (1L, 5.0, 10L), (2L, 4.0, 20L),
      (3L, 3.0, 15L), (4L, 3.0, 5L), (5L, 3.0, 30L),
      (6L, 2.0, 40L), (7L, 1.0, 50L)
    )
    val df = rows
      .map { case (id, s, t) => (id, Option(s), Option(t)) }
      .toDF("id", "s", "t")
      .unionByName(Seq((8L, Option.empty[Double], Option(9L))).toDF("id", "s", "t"))
      .unionByName(Seq((9L, Option(9.9), Option(0L))).toDF("id", "s", "t"))
    def got(budget: Long) = Scale
      .selectByBudget(df, "id", "s", "t", budget)
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    // local greedy replay over the valid rows
    def want(budget: Long): Seq[Long] = {
      var cum = 0L
      rows
        .sortBy { case (id, s, _) => (-s, id) }
        .takeWhile { case (_, _, t) => { cum += t; cum <= budget } }
        .map(_._1)
        .sorted
    }
    // 50 cuts INSIDE the tied layer: 10+20 fit, then ids 3 (15) and 4 (5)
    // fit (cum 50), id 5 (30) overflows — and ids after an overflow stay out
    assert(got(50) == Seq(1L, 2L, 3L, 4L) && got(50) == want(50))
    for (b <- Seq(0L, 9L, 10L, 30L, 45L, 80L, 100L, 170L, 1000L))
      assert(got(b) == want(b), s"budget=$b: ${got(b)} vs ${want(b)}")
    // everything fits -> all valid rows (null score / non-positive tokens out)
    assert(got(1000) == rows.map(_._1).sorted)
    // partition-invariant
    assert(
      Scale.selectByBudget(df.repartition(5), "id", "s", "t", 50)
        .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq == want(50)
    )
    // the distinct-score guard names the fix
    val wide = (0 until 50).map(i => (i.toLong, i.toDouble, 1L)).toDF("id", "s", "t")
    val e = intercept[IllegalArgumentException] {
      Scale.selectByBudget(wide, "id", "s", "t", 10L, maxDistinctScores = 10)
    }
    assert(e.getMessage.contains("grid"), e.getMessage)
    intercept[IllegalArgumentException] { Scale.selectByBudget(df, "id", "s", "t", -1L) }
  }

  test("selectByBudget two-level boundary walk: all-ties 1M-row layer, bucket paths agree") {
    import spark.implicits._
    // the coarse-grid worst case the two-level walk exists for: EVERY row
    // in one score layer — a single-window plan would sort all 1M rows in
    // one task; the two-level path windows only the boundary bucket
    val n = 1000000L
    val df = spark
      .range(n)
      .select(
        col("id"),
        lit(1.0).as("s"),
        (col("id") % 7L + 1L).as("t") // mixed token counts, deterministic
      )
    val budget = 1000000L // cuts deep inside the layer
    val twoLevel = Scale
      .selectByBudget(df, "id", "s", "t", budget, boundaryBuckets = 64)
      .agg(count(lit(1)), max("id"), sum("t"))
      .collect()(0)
    // ground truth: ids are walked in ASC order, tokens cycle 1..7 with
    // period sum 28 — the kept prefix is computable in closed form
    var cum = 0L; var kept = 0L
    while (cum + (kept % 7 + 1) <= budget) { cum += kept % 7 + 1; kept += 1 }
    assert(twoLevel.getLong(0) == kept, s"kept ${twoLevel.getLong(0)} want $kept")
    assert(twoLevel.getLong(1) == kept - 1)
    assert(twoLevel.getLong(2) == cum)
    // the legacy single-window path (boundaryBuckets = 1) agrees exactly
    val oneLevel = Scale
      .selectByBudget(df, "id", "s", "t", budget, boundaryBuckets = 1)
      .agg(count(lit(1)), max("id"), sum("t"))
      .collect()(0)
    assert(oneLevel == twoLevel)
    // non-numeric ids fall back to the single-window path and stay correct
    val sdf = Seq(("a", 1.0, 3L), ("b", 1.0, 4L), ("c", 1.0, 5L)).toDF("id", "s", "t")
    assert(
      Scale.selectByBudget(sdf, "id", "s", "t", 8L)
        .select("id").orderBy("id").collect().map(_.getString(0)).toSeq == Seq("a", "b")
    )
    // mixed layers + ties at scale: two-level == legacy on a multi-layer frame
    val mixed = spark
      .range(20000)
      .select(col("id"), (col("id") % 5L).cast("double").as("s"), (col("id") % 3L + 1L).as("t"))
    val a = Scale.selectByBudget(mixed, "id", "s", "t", 9000L, boundaryBuckets = 16)
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    val b = Scale.selectByBudget(mixed, "id", "s", "t", 9000L, boundaryBuckets = 1)
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("doremiMix: excess-loss domains gain weight, local scalar replay exact, guards") {
    import spark.implicits._
    // three domains with planted mean losses 0.1 / 0.5 / 0.9 (two docs each)
    val docs = Seq(
      (0L, "lo", 0.1), (1L, "lo", 0.1),
      (2L, "mid", 0.5), (3L, "mid", 0.5),
      (4L, "hi", 0.9), (5L, "hi", 0.9),
      (6L, "hi", Double.NaN), (7L, null.asInstanceOf[String], 0.5)
    ).map { case (id, g, l) => (id, g, if (l.isNaN) Option.empty[Double] else Some(l)) }
      .toDF("id", "dom", "loss")
    val got = Scale
      .doremiMix(docs, "dom", "loss", steps = 4)
      .orderBy("dom")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // null loss / null group excluded: hi has 2 scored docs, null dom gone
    assert(got.map(x => (x._1, x._2)).toSeq == Seq(("hi", 2L), ("lo", 2L), ("mid", 2L)))
    val byDom = got.map(x => x._1 -> x._4).toMap
    assert(byDom("hi") > byDom("mid") && byDom("mid") > byDom("lo"),
      s"excess-loss ordering violated: $byDom")
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12)
    // exact scalar replay of the documented op sequence
    val scale = math.pow(2.0, 20)
    def snap(x: Double) = math.floor(x * scale) / scale
    val ls = Array(snap(0.9), snap(0.1), snap(0.5)) // hi, lo, mid (domain order)
    val aa = Array.fill(3)(1.0)
    for (_ <- 1 to 4) {
      val m = aa.zip(ls).map { case (x, l) => x * l }.sum / aa.sum
      for (i <- 0 until 3) aa(i) = snap(aa(i) * math.max(0.0, 1.0 + 0.25 * (ls(i) - m)))
    }
    val tot = aa.sum
    assert(got.map(_._4).toSeq == Seq(aa(0) / tot, aa(1) / tot, aa(2) / tot),
      "driver loop diverged from the documented scalar replay")
    // uniform losses -> exactly uniform weights
    val uni = Scale
      .doremiMix(Seq((0L, "a", 0.3), (1L, "b", 0.3)).toDF("id", "dom", "loss"),
        "dom", "loss", steps = 3)
      .collect().map(_.getDouble(3)).toSeq
    assert(uni == Seq(0.5, 0.5))
    intercept[IllegalArgumentException] { Scale.doremiMix(docs, "dom", "loss", 0) }
    intercept[IllegalArgumentException] {
      Scale.doremiMix(docs, "dom", "loss", 2, maxGroups = 2)
    }
  }

  test("curriculumInterleave: closed-form positions == the two-window definition") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // unequal source sizes (one source exhausts early), duplicate
    // difficulties (the tie-group path), ids out of order
    val docs = Seq(
      (7L, "b", 3L), (1L, "a", 5L), (2L, "a", 2L), (3L, "c", 2L),
      (4L, "a", 2L), (5L, "b", 9L), (6L, "c", 1L), (8L, "c", 2L),
      (9L, "a", 7L), (10L, "c", 8L)
    ).toDF("doc_id", "source", "diff")
    val got = Scale.curriculumInterleave(docs, "doc_id", "diff", "source")
    // the oracle definition: per-source row_number, then a global
    // row_number over (rn, source) — fine on a 10-row test frame
    val rnW = Window.partitionBy("source").orderBy("diff", "doc_id")
    val posW = Window.orderBy("rn", "source")
    val want = docs
      .withColumn("rn", row_number().over(rnW).cast("long"))
      .withColumn("pos", row_number().over(posW).cast("long"))
      .select("doc_id", "source", "diff", "rn", "pos")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // positions are a permutation of 1..N and round-robin starts with one
    // doc from every source
    val byPos = got.orderBy("pos").collect()
    assert(byPos.map(_.getLong(4)).toSeq == (1L to 10L))
    assert(byPos.take(3).map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    // deterministic at any partitioning
    val again = Scale.curriculumInterleave(docs.repartition(5), "doc_id", "diff", "source")
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    // ADVICE r17: the per-row closed form walks a broadcast array of ALL
    // sources — a high-cardinality source column must refuse, not degrade
    val guard = intercept[Exception] {
      Scale.curriculumInterleave(docs, "doc_id", "diff", "source", maxSources = 2).collect()
    }
    assert(guard.getMessage.contains("distinct sources"))
  }

  test("curriculumEpochs: full epochs + partial boundary cut == naive per-epoch greedy prefix") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // total tokens = 17; budget 43 = 2 full epochs + a 9-token partial
    val docs = Seq(
      (1L, "a", 5L), (2L, "a", 2L), (3L, "b", 4L),
      (4L, "b", 1L), (5L, "a", 3L), (6L, "b", 2L)
    ).toDF("doc_id", "source", "n_tokens")
    val got = Scale.curriculumEpochs(
      docs, "doc_id", "n_tokens", "n_tokens", "source", 43L, tiers = 4)
    // independent replay: naive two-window curriculum, x162 tier grid,
    // md5 shuffle key, global greedy prefix per epoch
    val rnW = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    val posW = Window.orderBy("rn", "source")
    val tierd = docs
      .withColumn("rn", row_number().over(rnW).cast("long"))
      .withColumn("pos0", row_number().over(posW).cast("long"))
      .withColumn("tier", expr("(pos0 * 4) div 7")) // N + 1 = 7
    val x = tierd
      .crossJoin(spark.range(3).select(col("id").as("epoch")))
      .withColumn(
        "shuffle_key",
        expr("cast(conv(substring(md5(concat(cast(doc_id as string), '#', " +
          "cast(epoch as string))), 18, 15), 16, 10) as long)"))
    val ordW = Window.partitionBy("epoch").orderBy("tier", "shuffle_key", "doc_id")
    val want = x
      .withColumn("cum",
        sum("n_tokens").over(ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("epoch") < 2 || col("cum") <= 9)
      .withColumn("pos", row_number().over(ordW).cast("long"))
      .select("doc_id", "source", "n_tokens", "epoch", "tier", "shuffle_key", "pos")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // both full epochs carry every doc; the partial epoch genuinely cuts;
    // the reshuffle is real (epoch orders differ)
    val byEpoch = got.groupBy("epoch").count().orderBy("epoch").collect()
    assert(byEpoch.map(r => (r.getLong(0), r.getLong(1))).toSeq.take(2) ==
      Seq((0L, 6L), (1L, 6L)))
    assert(byEpoch(2).getLong(1) < 6L && byEpoch(2).getLong(1) > 0L)
    val ord0 = got.filter(col("epoch") === 0).orderBy("pos").collect().map(_.getLong(0)).toSeq
    val ord1 = got.filter(col("epoch") === 1).orderBy("pos").collect().map(_.getLong(0)).toSeq
    assert(ord0 != ord1, "per-epoch hash reshuffle must change the within-tier order")
    // deterministic at any partitioning
    val again = Scale.curriculumEpochs(
      docs.repartition(5), "doc_id", "n_tokens", "n_tokens", "source", 43L, tiers = 4)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    // guards: budget past maxEpochs refuses; zero budget is empty
    val g = intercept[IllegalArgumentException] {
      Scale.curriculumEpochs(docs, "doc_id", "n_tokens", "n_tokens", "source",
        17L * 20, tiers = 4, maxEpochs = 16)
    }
    assert(g.getMessage.contains("full epochs"))
    assert(Scale.curriculumEpochs(
      docs, "doc_id", "n_tokens", "n_tokens", "source", 0L).count() == 0L)
    // the budget-closure overload (budget derived from the operator's own
    // (n, total) aggregate — saves the caller's separate count job) must
    // equal the literal-budget path: budgetOf(6, 17) = 43 here
    val viaClosure = Scale.curriculumEpochs(
      docs, "doc_id", "n_tokens", "n_tokens", "source",
      (n: Long, t: Long) => { assert(n == 6L && t == 17L); t * 2L + 9L },
      tiers = 4, maxEpochs = 16, maxSources = 1000)
    assert(got.exceptAll(viaClosure).isEmpty && viaClosure.exceptAll(got).isEmpty)
  }

  test("packEpochs: one continuous stream across epochs == naive per-epoch cumsum + epoch base") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // the curriculumEpochs hand corpus: T = 17, budget 43 = 2 full + 9 partial
    val docs = Seq(
      (1L, "a", 5L), (2L, "a", 2L), (3L, "b", 4L),
      (4L, "b", 1L), (5L, "a", 3L), (6L, "b", 2L)
    ).toDF("doc_id", "source", "n_tokens")
    val asg = Scale.curriculumEpochs(
      docs, "doc_id", "n_tokens", "n_tokens", "source", 43L, tiers = 4)
    val got = Scale.packEpochs(asg, "doc_id", "n_tokens", seqLen = 7)
      .select("doc_id", "n_tokens", "epoch", "pos", "stream_off", "seq_id", "seq_off")
    // naive replay: per-epoch window cumsum over (tier, shuffle_key, id)
    // + epoch base 17 — the formulation the closed form exists to avoid
    val ordW = Window.partitionBy("epoch").orderBy("tier", "shuffle_key", "doc_id")
    val want = asg
      .withColumn("__cum",
        sum("n_tokens").over(ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("stream_off", col("epoch") * lit(17L) + col("__cum") - col("n_tokens"))
      .select(
        col("doc_id"), col("n_tokens"), col("epoch"), col("pos"), col("stream_off"),
        floor(col("stream_off") / lit(7L)).cast("long").as("seq_id"),
        pmod(col("stream_off"), lit(7L)).as("seq_off"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the stream is CONTIGUOUS: ordered by (epoch, pos), every row starts
    // exactly where the previous one ended, from offset 0 — epoch
    // boundaries included (epoch 1's first doc starts at exactly T = 17)
    val seq = got.orderBy("epoch", "pos").collect()
    var expect = 0L
    seq.foreach { r =>
      assert(r.getLong(4) == expect, s"stream_off gap at doc ${r.getLong(0)}")
      expect += r.getLong(1)
    }
    assert(seq.find(r => r.getLong(2) == 1L && r.getLong(3) == 1L).get.getLong(4) == 17L)
    // a doc genuinely spills its window (seq_off + n_tokens > seqLen)
    assert(seq.exists(r => r.getLong(6) + r.getLong(1) > 7L))
    // deterministic at any partitioning
    val again = Scale.packEpochs(
      asg.repartition(5), "doc_id", "n_tokens", seqLen = 7)
      .select("doc_id", "n_tokens", "epoch", "pos", "stream_off", "seq_id", "seq_off")
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    // guards: bad seqLen; a frame that is not curriculumEpochs-shaped
    assertThrows[IllegalArgumentException] {
      Scale.packEpochs(asg, "doc_id", "n_tokens", seqLen = 0)
    }
    val g2 = intercept[IllegalArgumentException] {
      Scale.packEpochs(docs, "doc_id", "n_tokens", seqLen = 7)
    }
    assert(g2.getMessage.contains("curriculumEpochs-shaped"))
  }

  test("unimaxMix: waterfill closed form, tie uniformity, caps, guards") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String, Long)]) =
      rows.toDF("doc_id", "source", "n_tokens")
    // hand waterfill: tokens a=5 b=20 c=100, maxEpochs=2 -> caps 10/40/200;
    // B=100 caps a and b (10*3=30<=100; 40*2+10=90<=100), c gets the
    // level (100-50)/1 = 50 = half an epoch
    val docs = mk(Seq(
      (1L, "a", 2L), (2L, "a", 3L),
      (3L, "b", 20L),
      (4L, "c", 60L), (5L, "c", 40L),
      (6L, null, 9L), (7L, "a", 0L), (8L, "b", -3L) // excluded rows
    ))
    val got = Scale.unimaxMix(docs, "source", "n_tokens", 100L, maxEpochs = 2)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == Seq(
      ("a", 2L, 5L, 10L, true, 10.0, 2.0),
      ("b", 1L, 20L, 40L, true, 40.0, 2.0),
      ("c", 2L, 100L, 200L, false, 50.0, 0.5)))
    // tie at the waterline: caps [10,10] at B=19 must split 9.5/9.5 —
    // the prefix-closed predicate rejects BOTH (10*2=20>19), neither may
    // cap after the other's failure
    val tie = Scale
      .unimaxMix(mk(Seq((1L, "a", 10L), (2L, "b", 10L))),
        "source", "n_tokens", 19L, maxEpochs = 1)
      .orderBy("source").collect()
      .map(r => (r.getBoolean(4), r.getDouble(5)))
    assert(tie.toSeq == Seq((false, 9.5), (false, 9.5)))
    // budget past ALL caps: every source at its cap, remainder unallocated
    val full = Scale.unimaxMix(docs, "source", "n_tokens", 100000L, maxEpochs = 2)
      .collect().map(r => (r.getBoolean(4), r.getDouble(5), r.getDouble(6)))
    assert(full.forall(_._1) && full.map(_._2).sum == 250.0 &&
      full.forall(_._3 == 2.0))
    // zero budget: nothing capped (caps are positive), level 0
    val zero = Scale.unimaxMix(docs, "source", "n_tokens", 0L, maxEpochs = 2)
      .collect().map(r => (r.getBoolean(4), r.getDouble(5)))
    assert(zero.forall(r => !r._1 && r._2 == 0.0))
    // invariants on a wider frame + repartition determinism; budget just
    // below the total cap so at least one source is provably uncapped
    val wide = mk((1L to 400L).map(i =>
      (i, "s" + (i % 23), 1L + (i * i) % 97)))
    val budget =
      3L * wide.agg(sum("n_tokens")).collect()(0).getLong(0) * 9L / 10L
    val w1 = Scale.unimaxMix(wide, "source", "n_tokens", budget, maxEpochs = 3)
    val w2 = Scale.unimaxMix(wide.repartition(7), "source", "n_tokens", budget, maxEpochs = 3)
    assert(w1.exceptAll(w2).isEmpty && w2.exceptAll(w1).isEmpty)
    val rows = w1.collect().map(r => (r.getLong(3), r.getBoolean(4), r.getDouble(5)))
    val allocSum = rows.map(_._3).sum
    assert(math.abs(allocSum - budget.toDouble) < 1e-6,
      s"budget not exhausted: $allocSum vs $budget")
    val levels = rows.filter(!_._2).map(_._3).distinct
    assert(levels.length == 1, "uncapped sources must share one uniform level")
    assert(rows.filter(_._2).forall(_._1 <= levels.head.ceil.toLong),
      "a capped source's cap must sit below the waterline")
    assert(rows.filter(!_._2).forall(r => levels.head <= r._1.toDouble),
      "the level may never exceed an uncapped source's cap")
    // guards
    intercept[IllegalArgumentException] {
      Scale.unimaxMix(docs, "source", "n_tokens", -1L, 2)
    }
    intercept[IllegalArgumentException] {
      Scale.unimaxMix(docs, "source", "n_tokens", 10L, 0)
    }
    intercept[IllegalArgumentException] {
      Scale.unimaxMix(docs, "source", "n_tokens", 10L, 2, maxGroups = 2)
    }
    intercept[IllegalArgumentException] {
      Scale.unimaxMix(
        mk(Seq((1L, "a", Long.MaxValue / 2))), "source", "n_tokens", 10L, 4)
    }
  }

  test("unimaxSelect: full epochs + greedy partial prefix == naive replay") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // skewed sources: tiny (~7%), mid (~27%), big (~66%) of tokens
    val docs = (1L to 300L).map { i =>
      val src = if (i <= 20) "tiny" else if (i <= 100) "mid" else "big"
      (i, src, 1L + (i * 7) % 23)
    }.toDF("doc_id", "source", "n_tokens")
    val totalT = docs.agg(sum("n_tokens")).collect()(0).getLong(0)
    val budget = totalT * 11L / 10L
    val got = Scale.unimaxSelect(docs, "doc_id", "source", "n_tokens", budget, maxEpochs = 3)
    // naive replay from the allocation table: full-epoch explode + a
    // per-source window prefix over (tokenHash60(id#k), id) order
    val mix = Scale.unimaxMix(docs, "source", "n_tokens", budget, maxEpochs = 3).collect()
    val plan = mix.map { r =>
      val t = r.getLong(2)
      val at = if (r.getBoolean(4)) r.getLong(3) else math.floor(r.getDouble(5)).toLong
      (r.getString(0), at / t, at % t)
    }
    val ks = plan.toSeq.map(p => (p._1, p._2, p._3)).toDF("source", "k", "rem")
    val joined = docs.join(ks, Seq("source"))
    val fullN = joined.filter(col("k") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("k") - 1L)))
    val partN = joined.filter(col("rem") > 0)
      .withColumn("__ek", Dedup.tokenHash60(
        concat(col("doc_id").cast("string"), lit("#"), col("k").cast("string"))))
      .withColumn("__cum", sum("n_tokens").over(
        Window.partitionBy("source").orderBy("__ek", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__cum") <= col("rem"))
      .withColumn("epoch", col("k"))
    val want = fullN.select("doc_id", "source", "n_tokens", "epoch")
      .unionByName(partN.select("doc_id", "source", "n_tokens", "epoch"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // at least one source has full epochs AND a partial tail in this setup
    val byEp = got.groupBy("source").agg(max("epoch").as("me"),
      countDistinct("epoch").as("ne")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.count() > 0 && byEp.nonEmpty)
    // per-source partial-epoch tokens never exceed rem; selection maximal
    // by construction (monotone prefix — pinned by the replay equality)
    val remBy = plan.map(p => p._1 -> p._3).toMap
    val partTok = got.join(ks, Seq("source")).filter(col("epoch") === col("k"))
      .groupBy("source").agg(sum("n_tokens").as("pt")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    partTok.foreach { case (s, pt) => assert(pt <= remBy(s), s"$s partial overflow") }
    // budget >= all caps: every doc appears exactly maxEpochs times
    val everything = Scale
      .unimaxSelect(docs, "doc_id", "source", "n_tokens", totalT * 100L, maxEpochs = 2)
    assert(everything.count() == 600L &&
      everything.groupBy("doc_id").count().filter(col("count") =!= 2L).count() == 0L)
    // zero budget -> empty; determinism under repartition
    assert(Scale.unimaxSelect(docs, "doc_id", "source", "n_tokens", 0L, 2).count() == 0L)
    val again = Scale
      .unimaxSelect(docs.repartition(13), "doc_id", "source", "n_tokens", budget, maxEpochs = 3)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    intercept[IllegalArgumentException] {
      Scale.unimaxSelect(docs, "doc_id", "source", "n_tokens", -1L, 2)
    }
    intercept[IllegalArgumentException] {
      Scale.unimaxSelect(docs, "doc_id", "source", "n_tokens", 10L, 2, maxGroups = 0)
    }
  }

  test("unimaxMix: waterfill invariants on random corpora (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val genCase: Gen[(List[Long], Long, Int)] = for {
      k <- Gen.choose(1, 7)
      ts <- Gen.listOfN(k, Gen.choose(1L, 500L))
      e <- Gen.choose(1, 5)
      b <- Gen.choose(0L, ts.sum * e * 2)
    } yield (ts, b, e)
    val prop = Prop.forAll(genCase) { case (ts, b, e) =>
      val docs = ts.zipWithIndex
        .map { case (t, i) => (i.toLong, s"s$i", t) }
        .toDF("doc_id", "source", "n_tokens")
      val rows = Scale.unimaxMix(docs, "source", "n_tokens", b, e)
        .collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getDouble(5)))
      val sumCaps = rows.map(_._2).sum
      val allocSum = rows.map(_._4).sum
      val uncappedLevels = rows.filter(!_._3).map(_._4).distinct
      val capsRespected = rows.forall { case (_, cap, capped, a) =>
        if (capped) a == cap.toDouble else a <= cap.toDouble + 1e-6
      }
      val exhaustedOrAllCapped =
        if (b >= sumCaps) rows.forall(_._3) && allocSum == sumCaps.toDouble
        else math.abs(allocSum - b.toDouble) < 1e-6
      val uniform = uncappedLevels.length <= 1
      val monotone = rows.sortBy(_._2).map(_._4).zip(rows.sortBy(_._2).map(_._4).drop(1))
        .forall { case (a1, a2) => a1 <= a2 + 1e-6 } // bigger cap never gets less
      capsRespected && exhaustedOrAllCapped && uniform && monotone
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("packStream: partitioned stream == naive replay, contiguous across partitions, numeric order") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 120L)
      .map(i => (i, i % 2, (i / 2) % 3, 1L + i % 5))
      .toDF("doc_id", "phase", "epoch", "n_tokens")
      .withColumn("key", Dedup.tokenHash60(
        concat(col("doc_id").cast("string"), lit("#"), col("epoch").cast("string"))))
    val cols = Seq("doc_id", "phase", "epoch", "n_tokens", "key", "stream_off", "seq_id", "seq_off")
    val got = Scale
      .packStream(df, "doc_id", "n_tokens", Seq("phase", "epoch"), "key", 7)
      .select(cols.map(col): _*)
    // naive replay: driver cumulative bases in (phase, epoch) order + ONE
    // window per partition over (key, doc_id) — the formulation the
    // bucket closed form exists to avoid
    val totals = df.groupBy("phase", "epoch").agg(sum("n_tokens").as("t"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).sortBy(_._1)
    val baseDf = totals.zip(totals.scanLeft(0L)(_ + _._2).init)
      .map { case (((p, e), _), b) => (p, e, b) }.toSeq.toDF("phase", "epoch", "b")
    val w = Window.partitionBy("phase", "epoch").orderBy("key", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.join(baseDf, Seq("phase", "epoch"))
      .withColumn("stream_off", col("b") + sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("seq_id", expr("stream_off div 7"))
      .withColumn("seq_off", col("stream_off") % 7)
      .select(cols.map(col): _*)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // ONE contiguous stream from offset 0, straight across partition
    // boundaries; some doc spills its window
    val seq = got.orderBy("stream_off").collect()
    var expect = 0L
    seq.foreach { r => assert(r.getLong(5) == expect, s"gap at ${r.getLong(0)}"); expect += r.getLong(3) }
    assert(seq.exists(r => r.getLong(7) + r.getLong(3) > 7L))
    // numeric partition order: epoch 10 streams AFTER epoch 2
    val two = Seq((1L, 0L, 2L, 3L), (2L, 0L, 10L, 3L))
      .toDF("doc_id", "phase", "epoch", "n_tokens").withColumn("key", lit(0L))
    val ord = Scale.packStream(two, "doc_id", "n_tokens", Seq("phase", "epoch"), "key", 7)
      .orderBy("stream_off").select("epoch").collect().map(_.getLong(0))
    assert(ord.toSeq == Seq(2L, 10L), s"string-ordered partitions: ${ord.toSeq}")
    // determinism at any partitioning; guards
    val again = Scale
      .packStream(df.repartition(9), "doc_id", "n_tokens", Seq("phase", "epoch"), "key", 7)
      .select(cols.map(col): _*)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    intercept[IllegalArgumentException] {
      Scale.packStream(df, "doc_id", "n_tokens", Seq.empty, "key", 7)
    }
    intercept[IllegalArgumentException] {
      Scale.packStream(df, "doc_id", "n_tokens", Seq("phase"), "key", 0)
    }
    intercept[IllegalArgumentException] {
      Scale.packStream(
        df.withColumn("ps", col("phase").cast("string")),
        "doc_id", "n_tokens", Seq("ps"), "key", 7)
    }
    intercept[IllegalArgumentException] {
      Scale.packStream(df, "doc_id", "n_tokens", Seq("phase", "epoch"), "key", 7, maxParts = 3)
    }
    intercept[IllegalArgumentException] {
      Scale.packStream(
        df.withColumn("ks", col("key").cast("string")),
        "doc_id", "n_tokens", Seq("phase"), "ks", 7)
    }
  }
}
