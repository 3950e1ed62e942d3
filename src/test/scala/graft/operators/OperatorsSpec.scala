package graft.operators

import graft.SparkTester
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite with SparkTester {
  import graft.queries.Tables.t

  test("exact dedup keeps lowest id per key and counts duplicates") {
    import spark.implicits._
    val df = Seq((3L, "a"), (1L, "a"), (2L, "b"), (5L, "a")).toDF("id", "k")
    val out = Dedup.exactWithCounts(df, Seq("k"), "id").orderBy("id")
    assert(out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 3L), (2L, "b", 1L)))
  }

  test("duplicatedSpans maxDocs cap drops only the hot spans; default path unchanged") {
    import spark.implicits._
    // "w0 .. w7" is an 8-gram shared by ALL 6 docs (the boilerplate bucket);
    // "u0 .. u7" is shared by exactly docs 0 and 1
    val boiler = (0 until 8).map(i => s"w$i").mkString(" ")
    val rare = (0 until 8).map(i => s"u$i").mkString(" ")
    val docs = (0 until 6)
      .map(i => (i.toLong, if (i < 2) s"$boiler x$i $rare" else s"$boiler x$i"))
      .toDF("doc_id", "text")
    val dflt = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
    assert(dflt.filter(col("n_docs") === 6).count() == 1) // boilerplate span present
    assert(dflt.filter(col("n_docs") === 2).count() == 1) // rare span present
    val capped = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2, maxDocs = Some(5L))
    assert(capped.filter(col("n_docs") === 6).count() == 0) // hot bucket dropped
    // everything under the cap is byte-identical to the default output
    assert(
      capped.orderBy("span_hash").collect().toSeq ==
        dflt.filter(col("n_docs") <= 5).orderBy("span_hash").collect().toSeq
    )
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(docs, "doc_id", "text", n = 8, minDocs = 3, maxDocs = Some(2L))
    }
  }

  test("minhash LSH candidates cover all high-jaccard pairs (recall on real docs)") {
    val docs = t(spark, sfTiny, "documents")
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = shingleJaccardPairs(0.8)
      .collect().map(r => (r.getLong(r.fieldIndex("d1")), r.getLong(r.fieldIndex("d2")))).toSet
    assert(truth.nonEmpty, "fixture should contain near-duplicate docs")
    val missed = truth -- cand
    assert(missed.isEmpty, s"LSH missed high-jaccard pairs: $missed")
  }

  test("IVF recall@10 vs brute force is monotone in nProbe and bounded below") {
    val e = t(spark, sfTiny, "embeddings")
    val k = 10
    val truth = Similarity
      .bruteForceTopK(e, e, "vec_id", "embedding", k)
      .select("qid", "cid")
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    // deterministic centroids from the corpus itself (seeded Lloyd's)
    val cen = Similarity
      .kmeansFit(e, "vec_id", "embedding", k = 8, iters = 5)
      .select(col("cen_id"), col("cen_v").as("embedding"))
      .withColumnRenamed("cen_id", "vec_id")
    def recallAt(nProbe: Int): Double = {
      val approx = Similarity
        .ivfTopK(e, cen, "vec_id", "embedding", k, nProbe)
        .select("qid", "cid")
        .collect()
        .groupBy(_.getLong(0))
        .view
        .mapValues(_.map(_.getLong(1)).toSet)
        .toMap
      val per = truth.map { case (q, ts) =>
        approx.get(q).map(as => (as & ts).size.toDouble / ts.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    val r1 = recallAt(1); val r2 = recallAt(2); val r4 = recallAt(4)
    info(f"IVF recall@$k: nProbe=1 -> $r1%.3f, 2 -> $r2%.3f, 4 -> $r4%.3f")
    // probing more cells only grows the candidate set, so recall is monotone
    assert(r1 <= r2 + 1e-9 && r2 <= r4 + 1e-9, s"recall not monotone: $r1, $r2, $r4")
    // pinned lower bounds on the seeded corpus (deterministic pipeline;
    // measured 0.302 / 0.497 / 0.764): the ANN quality claim as a test
    assert(r1 >= 0.30, s"nProbe=1 recall $r1")
    assert(r2 >= 0.45, s"nProbe=2 recall $r2")
    assert(r4 >= 0.70, s"nProbe=4 recall $r4")
  }

  test("banding is splittable and monotone: more bands never lose candidates (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vocab = Vector(
      "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
      "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa"
    )
    val genDoc: Gen[String] =
      Gen.choose(5, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val genCorpus = Gen.choose(6, 12).flatMap(n => Gen.listOfN(n, genDoc))
    val prop = Prop.forAll(genCorpus) { docsList =>
      import spark.implicits._
      // clone of doc 0 guarantees one identical pair in the ground truth
      val rows = docsList.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+ (1000L, docsList.head)
      val df = rows.toDF("doc_id", "text")
      def cands(b: Int, r: Int): Set[(Long, Long)] =
        Dedup
          .minhashCandidates(df, "doc_id", "text", bands = b, rowsPerBand = r)
          .collect()
          .map(x => (x.getLong(0), x.getLong(1)))
          .toSet
      val c2 = cands(2, 2)
      val c4 = cands(4, 2) // bands 0,1 of c4 use the same hashes as c2 (prefix-stable family)
      val wide = cands(2, 4) // rowsPerBand > 3 exercises the array band key
      val idPair = (0L, 1000L)
      c2.subsetOf(c4) && c4.contains(idPair) && wide.contains(idPair) &&
      (c2 ++ c4 ++ wide).forall { case (d1, d2) => d1 < d2 }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("explicit default banding (4x2) equals the parameterless call") {
    val docs = t(spark, sfTiny, "documents")
    val a = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.minhashCandidates(docs, "doc_id", "text", bands = 4, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  /** Shingle-level jaccard pairs >= threshold — ground truth for the
    * sketch-based dedup tests (token-level jaccard is meaningless on this
    * corpus: all docs share one 31-word vocabulary). */
  private def shingleJaccardPairs(threshold: Double) = {
    val docs = t(spark, sfTiny, "documents")
    val sh = Dedup.shingleRows(docs, "doc_id", "text")
    val a = sh.toDF("d1", "s"); val b = sh.toDF("d2", "s2")
    val inter = a.join(b, a("s") === b("s2") && a("d1") < b("d2")).groupBy("d1", "d2")
      .agg(count(lit(1)).as("ni"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "na"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "nb"), "d2")
      .withColumn("j", col("ni").cast("double") / (col("na") + col("nb") - col("ni")))
      .filter(col("j") >= threshold)
      .select("d1", "d2")
  }

  test("simhash: shingle-level near-dup docs have small hamming distance") {
    val docs = t(spark, sfTiny, "documents")
    val sims = Dedup.simhash16(docs, "doc_id", "text")
    val j = shingleJaccardPairs(0.9)
    val withH = j
      .join(sims.select(col("doc_id").as("d1"), col("simhash").as("h1")), "d1")
      .join(sims.select(col("doc_id").as("d2"), col("simhash").as("h2")), "d2")
      .withColumn("ham", expr("bit_count(h1 ^ h2)"))
    val hams = withH.collect().map(_.getAs[Int]("ham"))
    assert(hams.nonEmpty && hams.forall(_ <= 6), hams.mkString(","))
  }

  test("asof join matches brute-force point-in-time lookup") {
    import spark.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 8L, 100L), (1L, 15L, 101L), (1L, 20L, 102L), (3L, 1L, 103L))
      .toDF("k", "ts", "rid")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rid"))
      .orderBy("name")
      .collect().map(r => (r.getAs[String]("name"), Option(r.getAs[java.lang.Long]("rid_asof"))))
    assert(out.toSeq == Seq(
      ("p1", Some(100L)),  // latest right ts<=10 is 8
      ("p2", Some(102L)),  // equal ts matches
      ("p3", None)         // no right rows for key 2
    ).map { case (n, o) => (n, o.map(java.lang.Long.valueOf)) })
  }

  test("brute-force topk is exact: agrees with local computation") {
    val e = t(spark, sfTiny, "embeddings").limit(50).cache()
    val got = Similarity.bruteForceTopK(e.filter(col("vec_id") === 0), e, "vec_id", "embedding", 3)
      .orderBy("rn").collect().map(_.getAs[Long]("cid")).toSeq
    val vecs = e.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs(0L)
    val expect = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, BigDecimal(cos(q, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
    assert(got == expect)
  }

  test("nearDuplicates (LSH + verify) finds the same pairs as exhaustive jaccard") {
    val docs = t(spark, sfTiny, "documents")
    val got = Dedup.nearDuplicates(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = shingleJaccardPairs(0.8)
      .collect().map(r => (r.getLong(r.fieldIndex("d1")), r.getLong(r.fieldIndex("d2")))).toSet
    assert(truth.nonEmpty)
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
  }

  test("native vec_dot expression is bit-identical to the HOF formulation") {
    val e = t(spark, sfTiny, "embeddings").limit(100)
    val both = e.select(
      Similarity.dotD(col("embedding"), col("embedding")).as("native"),
      Similarity.dotHof(col("embedding"), col("embedding")).as("hof")
    )
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // and via SQL registration
    e.createOrReplaceTempView("emb_t")
    val viaSql = spark.sql("select vec_dot(embedding, embedding) d from emb_t")
    assert(viaSql.count() == 100)
  }

  test("approx topk: deterministic recall against exact brute force") {
    val e = t(spark, sfTiny, "embeddings").cache()
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 10)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("cid")).toSet).toMap
    val approx = Similarity.approxTopK(e, "vec_id", "embedding", 10, 64, 4, multiProbe = 1)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("cid")).toSet).toMap
    val recalls = exact.keys.toSeq.map { qid =>
      val a = approx.getOrElse(qid, Set.empty)
      (exact(qid) intersect a).size.toDouble / exact(qid).size
    }
    val meanRecall = recalls.sum / recalls.size
    info(f"mean recall@10 = $meanRecall%.3f")
    // deterministic data + deterministic hyperplanes -> a fixed value; the
    // bound just guards against the pipeline silently degenerating
    assert(meanRecall > 0.15, f"recall collapsed: $meanRecall%.3f")
    // cost sanity: probed candidate volume far below the n^2 cross join
    val candPerQuery = Similarity
      .approxTopK(e, "vec_id", "embedding", Int.MaxValue, 64, 4, 1)
      .count()
      .toDouble / exact.size
    assert(candPerQuery < 200, s"candidates per query $candPerQuery ~ cross join")
  }

  test("lsh buckets: same-bucket rate shrinks with more bits") {
    val e = t(spark, sfTiny, "embeddings").limit(200)
    val c4 = Similarity.lshCandidates(e, "vec_id", "embedding", 64, 4).count()
    val c8 = Similarity.lshCandidates(e, "vec_id", "embedding", 64, 8).count()
    assert(c8 < c4, s"c8=$c8 c4=$c4")
    assert(c8 > 0)
  }

  test("redact scrubs multiple PII hits and leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact a@b.co or c.d+x@e-f.org now"),
      (2L, "docs at https://x.y/z?q=1 and http://plain.link"),
      (3L, "nothing to scrub here"),
      (4L, "mixed bob@corp.io sees https://a.b/c")
    ).toDF("id", "t")
    val out = df.select(col("id"), TextAnalysis.redact(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact <EMAIL> or <EMAIL> now")
    assert(out(2L) == "docs at <URL> and <URL>")
    assert(out(3L) == "nothing to scrub here")
    assert(out(4L) == "mixed <EMAIL> sees <URL>")
    // extra (pattern -> tag) pairs chain after the built-ins
    val custom = df
      .filter(col("id") === 3L)
      .select(TextAnalysis.redact(col("t"), Seq(("nothing", "<X>"))).as("r"))
      .collect().head.getString(0)
    assert(custom == "<X> to scrub here")
  }

  test("repetitionStats: sorted-run fold equals per-token counts on edge shapes") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"), // one token repeated: top_share 1.0
      (2L, "x"), // single token
      (3L, "a b a c a b") // a:3 of 6
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((4, 0.25, 1.0)))
    assert(out(2L) == ((1, 1.0, 1.0)))
    assert(out(3L) == ((6, 0.5, 0.5)))
  }

  test("multimodal: REAL image decode (JDK ImageIO) extracts luminance grids distributed") {
    import spark.implicits._
    def makeImage(w: Int, h: Int, fmt: String, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 7 + y * 13 + seed * 31) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v) // gray gradient
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK can't encode $fmt")
      bos.toByteArray
    }
    val rows = Seq(
      (1L, makeImage(16, 16, "png", 1)),
      (2L, makeImage(9, 7, "bmp", 2)), // non-multiple dims exercise region edges
      (3L, makeImage(4, 4, "png", 3)),
      (4L, "not an image".getBytes("UTF-8"))
    )
    val df = rows.toDF("doc_id", "payload").repartition(3)
    val out = Multimodal
      .extractImageFeatures(df, "doc_id", grid = 4)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    // decoded rows carry dimensions + a 16-cell luminance grid in [0,1]
    assert(out(1L).getInt(2) == 16 && out(1L).getInt(3) == 16)
    assert(out(2L).getInt(2) == 9 && out(2L).getInt(3) == 7)
    val f1 = out(1L).getSeq[Float](1)
    assert(f1.length == 16 && f1.forall(v => v >= 0f && v <= 1f))
    // distributed result equals a local decode of the same payload
    val local = Multimodal.decodeImage(rows.head._2, 4).get._1
    assert(f1 == local.toSeq)
    // grayscale gradient: luminance varies across grid cells
    assert(f1.distinct.length > 4)
    // garbage payload -> null features, row kept, task alive
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(2))
    // PNG and BMP of the same pixels decode identically
    val png = Multimodal.decodeImage(makeImage(8, 8, "png", 9), 2).get._1
    val bmp = Multimodal.decodeImage(makeImage(8, 8, "bmp", 9), 2).get._1
    assert(png.toSeq == bmp.toSeq)
  }

  test("multimodal: REAL audio decode (javax.sound.sampled) — WAV features distributed") {
    import spark.implicits._
    // known signal: square wave at 1/4 sample rate -> amplitude A everywhere,
    // RMS = A/32768 exactly, zero crossing every 2 samples
    val a: Short = 8192
    val square = Array.tabulate(400)(i => if ((i / 2) % 2 == 0) a else (-a).toShort)
    val sine = Array.tabulate(800)(i => (10000 * math.sin(2 * math.Pi * i / 80)).toShort)
    val rows = Seq(
      (1L, Multimodal.wavBytes(square, 8000f)),
      (2L, Multimodal.wavBytes(sine, 16000f)),
      (3L, "definitely not audio".getBytes("UTF-8"))
    )
    val out = Multimodal
      .extractAudioFeatures(rows.toDF("doc_id", "payload").repartition(3), "doc_id")
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    val sq = out(1L)
    assert(sq.getLong(1) == 400 && sq.getDouble(2) == 8000.0 && sq.getInt(3) == 1)
    assert(sq.getDouble(4) == 0.05) // 400 / 8000
    assert(math.abs(sq.getDouble(5) - a / 32768.0) < 1e-12) // RMS == amplitude
    assert(math.abs(sq.getDouble(6) - a / 32768.0) < 1e-12) // peak
    assert(math.abs(sq.getDouble(7) - 0.5) < 0.01) // crossing every 2 samples
    val sn = out(2L)
    assert(sn.getLong(1) == 800 && sn.getDouble(2) == 16000.0)
    // sine RMS ~= peak / sqrt(2)
    assert(math.abs(sn.getDouble(5) - (10000.0 / 32768) / math.sqrt(2)) < 0.001)
    // garbage payload -> null features, row kept, task alive
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(4))
    // distributed equals local decode
    val local = Multimodal.decodeAudio(rows.head._2).get
    assert(local._1 == sq.getLong(1) && local._5 == sq.getDouble(5))
    // stereo mixes channels by average: L = 2A, R = 0 -> mixed amplitude A
    val stereo = Array.tabulate(200)(i => if (i % 2 == 0) (2 * a).toShort else 0.toShort)
    val st = Multimodal.decodeAudio(Multimodal.wavBytes(stereo, 8000f, channels = 2)).get
    assert(st._3 == 2 && st._1 == 100)
    assert(math.abs(st._5 - a / 32768.0) < 1e-12)
    // 8-bit unsigned PCM routes through the JDK's format conversion
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val pcm8 = Array.tabulate(64)(i => (128 + (if (i % 2 == 0) 60 else -60)).toByte)
    val ais8 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm8), fmt8, 64
    )
    val bos8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais8, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos8)
    val d8 = Multimodal.decodeAudio(bos8.toByteArray).get
    assert(d8._1 == 64 && d8._7 > 0.9) // alternating sign -> zcr near 1
    // 8-bit payloads MISS the lock-free fast path (bits != 16) by design
    assert(Multimodal.decodePcm16Riff(bos8.toByteArray).isEmpty)
    // fast path == javax path, field for field, on canonical PCM16 payloads
    for (payload <- Seq(rows.head._2, rows(1)._2, Multimodal.wavBytes(stereo, 8000f, channels = 2))) {
      val fast = Multimodal.decodePcm16Riff(payload).get
      val ref = Multimodal.decodeAudioJavax(payload).get
      assert(fast == ref, s"fast $fast != javax $ref")
    }
    // a chunk length near Int.MaxValue must not overflow the walk into an
    // out-of-bounds read — undecodable means None, never a thrown task
    val evil = java.nio.ByteBuffer.allocate(100).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes("US-ASCII")).putInt(92).put("WAVE".getBytes("US-ASCII"))
    evil.put("JUNK".getBytes("US-ASCII")).putInt(0x7ffffff0)
    assert(Multimodal.decodePcm16Riff(evil.array()).isEmpty)
    assert(Multimodal.decodeAudio(evil.array()).isEmpty)
  }

  test("multimodal: REAL video decode — AVI/MJPEG container parse, frame pixels, fan-out") {
    import spark.implicits._
    def jpegOf(w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val o = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", o))
      o.toByteArray
    }
    // mux a real container and decode it back
    val frames = Seq(jpegOf(32, 16, 40), jpegOf(32, 16, 200), jpegOf(32, 16, 120))
    val avi = Multimodal.encodeAviMjpeg(frames, 32, 16, 25)
    val (info, got) = Multimodal.decodeAvi(avi).get
    assert(info == Multimodal.VideoInfo(32, 16, 3, 25.0, "MJPG"))
    assert(got.length == 3 && got(0).sameElements(frames(0)) && got(2).sameElements(frames(2)))
    // frame payloads are REAL JPEGs: pixel decode recovers the gray level
    val lum = Multimodal.decodeImage(got(1), 2).get._1
    assert(lum.forall(v => math.abs(v - 200 / 255.0) < 0.02), lum.toSeq.toString)
    // odd-sized JPEG exercises RIFF word-alignment padding
    val trailing = frames.map(f => if (f.length % 2 == 0) f ++ Array(0xd9.toByte) else f)
    val aviOdd = Multimodal.encodeAviMjpeg(trailing, 32, 16, 10)
    assert(Multimodal.decodeAvi(aviOdd).get._2.length == 3)
    // garbage and truncated payloads fail safe (None), never throw
    assert(Multimodal.decodeAvi("not a riff file at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAvi(avi.take(40)).isEmpty)
    // distributed: metadata + first-frame features; corrupt row nulls out
    val df = Seq((1L, avi), (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload").repartition(2)
    val out = Multimodal.extractVideoFeatures(df, "doc_id").collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 32 && out(1L).getInt(2) == 16 && out(1L).getInt(3) == 3)
    assert(out(1L).getString(5) == "MJPG")
    val ff = out(1L).getSeq[Float](6)
    assert(ff.forall(v => math.abs(v - 40 / 255.0) < 0.02))
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(6))
    // real frame fan-out: one row per contained frame, each a decodable JPEG
    val fanned = Multimodal.explodeVideoFrames(df, "doc_id").collect()
    assert(fanned.length == 3 && fanned.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2))
    fanned.foreach(r => assert(Multimodal.decodeImage(r.getAs[Array[Byte]](2), 2).isDefined))
  }

  test("multimodal: frame sampling fans out k rows per payload; resize halves features") {
    val docs = t(spark, sfTiny, "documents").limit(6)
    val withP = Multimodal.withPayload(docs.withColumn("hex", md5(col("text"))), "hex")
    val frames = Multimodal.sampleFrames(withP, "doc_id", 4)
    assert(frames.count() == 24)
    val perDoc = frames.groupBy("doc_id").count().collect().map(_.getLong(1)).distinct.toSeq
    assert(perDoc == Seq(4L))
    assert(frames.schema("frame").dataType.typeName == "binary")
    val resized = Multimodal.resizeStub(Array(1f, 3f, 5f, 7f))
    assert(resized.toSeq == Seq(2f, 6f))
  }

  test("multimodal: payload + stub feature extraction plumbing") {
    val docs = t(spark, sfTiny, "documents").limit(10)
    val withP = Multimodal.withPayload(docs.withColumn("hex", md5(col("text"))), "hex")
    assert(withP.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(withP, "doc_id")
    val rows = feats.collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_bytes") == 16)
      val f = r.getSeq[Float](r.fieldIndex("features"))
      assert(f.length == 16 && f.forall(x => x >= 0f && x < 1f))
    }
  }

  test("asof join carries payload atomically: null payload values win, multi-column from one row") {
    import spark.implicits._
    val left = Seq((1L, 30L, "p")).toDF("k", "ts", "name")
    // latest right row (ts=20) has a NULL payload value in v1: true as-of
    // semantics attach THAT row (v1=null, v2=22), not a blend of older rows
    val right = Seq(
      (1L, 10L, Option(11L), Option(12L)),
      (1L, 20L, Option.empty[Long], Option(22L))
    ).toDF("k", "ts", "v1", "v2")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("v1", "v2")).collect().head
    assert(out.isNullAt(out.fieldIndex("v1_asof")), "null payload value must win (atomic match)")
    assert(out.getAs[Long]("v2_asof") == 22L, "both payload columns must come from the same right row")
  }

  test("minhashSig accepts any k up to the splittable family bound, rejects beyond") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("h")
    // k beyond the old fixed table (8) now works via the derived family
    val sig = df
      .agg(graft.functions.MinHashAggFunctions.minhashSig(col("h"), k = 99))
      .collect()
      .head
      .getSeq[Long](0)
    assert(sig.length == 99 && sig.forall(v => v >= 0 && v < Dedup.MinhashP2))
    val e = intercept[IllegalArgumentException] {
      df.agg(graft.functions.MinHashAggFunctions.minhashSig(col("h"), k = Dedup.MinhashMaxK + 1))
        .collect()
    }
    assert(e.getMessage.contains("minhash_sig"))
  }

  test("nearestNeighbor: zero-norm vectors yield null sim, never NaN or a wrong neighbor") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(0f, 0f)),        // zero-norm query: all its sims null
      (1L, Array(1f, 0f)),
      (2L, Array(1f, 0.1f))
    ).toDF("vec_id", "embedding")
    val rows = Similarity.nearestNeighbor(df, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (Option(r.getAs[java.lang.Long]("nn_id")), Option(r.getAs[java.lang.Double]("sim")))).toMap
    assert(rows(0L) == (None, None), "zero-norm query must surface with null nn/sim, not vanish or crash")
    assert(rows(1L)._1.contains(java.lang.Long.valueOf(2L)))
    assert(rows(2L)._1.contains(java.lang.Long.valueOf(1L)))
  }

  test("nearestNeighbor: out-of-range id fails loudly instead of decoding wrong") {
    import spark.implicits._
    val df = Seq((-5L, Array(1f, 0f)), (1L, Array(1f, 0.1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.nearestNeighbor(df, "vec_id", "embedding").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("2^32")), e.getMessage)
  }

  test("sorted_intersect_count agrees with array_intersect on sorted distinct arrays") {
    val docs = t(spark, sfTiny, "documents").limit(200)
    val d = docs.select(
      col("doc_id"),
      sort_array(array_distinct(transform(split(col("text"), " "), x => xxhash64(x)))).as("toks")
    )
    val a = d.as("a"); val b = d.as("b")
    val pairs = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(
        graft.functions.ArrayFunctions
          .sortedIntersectCount(col("a.toks"), col("b.toks")).as("fast"),
        size(array_intersect(col("a.toks"), col("b.toks"))).as("ref")
      )
    assert(pairs.filter(col("fast") =!= col("ref")).count() == 0)
    // SQL registration
    d.createOrReplaceTempView("sic_t")
    val viaSql = spark.sql(
      "select sorted_intersect_count(a.toks, b.toks) c from sic_t a join sic_t b on a.doc_id < b.doc_id"
    )
    assert(viaSql.agg(sum(col("c"))).collect().head.getLong(0) > 0)
  }

  test("range join (bucketed) equals brute-force range predicate join") {
    import spark.implicits._
    val pts = t(spark, sfTiny, "lineitem").select("l_extendedprice").limit(2000)
    val iv = Seq((0L, 900.0, 2400.0), (1L, 2000.0, 2050.0), (2L, 50000.0, 104000.0))
      .toDF("iv_id", "lo", "hi")
    val fast = RangeJoin.pointInInterval(pts, "l_extendedprice", iv, "lo", "hi", 777.0)
      .groupBy("iv_id").count()
    val brute = pts.join(iv, col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy("iv_id").count()
    assert(fast.orderBy("iv_id").collect().toSeq == brute.orderBy("iv_id").collect().toSeq)
    // overlapping intervals: a point matches both, exactly once each
    assert(fast.count() > 0)
  }

  test("range join: degenerate (empty) intervals match nothing, negatives bucket correctly") {
    import spark.implicits._
    val pts = Seq(-3.5, -0.5, 0.0, 2.0, 7.0).toDF("p")
    val iv = Seq(
      (0L, -4.0, -1.0), // negative range
      (1L, 5.0, 5.0),   // empty: hi == lo
      (2L, 9.0, 3.0),   // inverted: must not match (descending sequence trap)
      (3L, 0.0, 3.0)
    ).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", iv, "lo", "hi", 2.0)
      .select("iv_id", "p").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((0L, -3.5), (3L, 0.0), (3L, 2.0)))
  }

  test("cube via re-aggregation handles non-string keys") {
    import spark.implicits._
    val df = Seq((1, 10L, 5.50), (1, 20L, 1.25), (2, 10L, 3.00)).toDF("k1", "k2", "v")
    val out = Relational.cubeCountDsum(df, "k1", "k2", "v", "sv", 10)
    val expect = df.cube("k1", "k2")
      .agg(count(lit(1)).as("n"), Relational.dsum(col("v"), 10).as("sv"))
    val key = Seq(asc_nulls_first("k1"), asc_nulls_first("k2"))
    assert(out.orderBy(key: _*).collect().toSeq == expect.orderBy(key: _*).collect().toSeq)
  }

  test("ivf topk: per-cell exact, recall grows with nProbe, candidates bounded") {
    val e = t(spark, sfTiny, "embeddings").cache()
    val cen = e.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 5)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("cid")).toSet).toMap
    def recall(nProbe: Int): Double = {
      val approx = Similarity.ivfTopK(e, cen, "vec_id", "embedding", 5, nProbe)
        .collect().groupBy(_.getAs[Long]("qid"))
        .view.mapValues(_.map(_.getAs[Long]("cid")).toSet).toMap
      val rs = exact.keys.toSeq.map { q =>
        (exact(q) intersect approx.getOrElse(q, Set.empty)).size.toDouble / exact(q).size
      }
      rs.sum / rs.size
    }
    val r1 = recall(1); val r2 = recall(2)
    info(f"ivf recall@5: nProbe=1 $r1%.3f nProbe=2 $r2%.3f")
    assert(r1 > 0.1, f"recall collapsed: $r1%.3f")
    assert(r2 >= r1, f"more probes must not lose recall: $r2%.3f < $r1%.3f")
  }

  test("stratified hash sample is partition-count invariant and respects rates") {
    val li = t(spark, sfTiny, "lineitem")
    val rates = Map("A" -> 0.1, "N" -> 0.2, "R" -> 0.05)
    def run(df: org.apache.spark.sql.DataFrame) =
      Scale.stratifiedHashSample(df, Seq("l_orderkey", "l_linenumber"), "l_returnflag", rates)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .collect().map(_.toSeq).toSet
    val a = run(li)
    val b = run(li.repartition(7))
    assert(a == b, "sample must not depend on partitioning")
    val byFlag = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampleByFlag = a.groupBy(_.apply(2)).view.mapValues(_.size).toMap
    rates.foreach { case (f, r) =>
      val got = sampleByFlag.getOrElse(f, 0).toDouble / byFlag(f)
      assert(math.abs(got - r) < 0.05, f"stratum $f: got $got%.3f want $r")
    }
  }

  test("decontaminate drops fingerprint matches incl. reordered-token variants") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c"), (2L, "x y z"), (3L, "c b a"), (4L, "q r s"))
      .toDF("doc_id", "text")
    val reference = Seq((100L, "a b c"), (101L, "nothing here")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, reference, "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // doc 3 is "a b c" reordered -> same fingerprint -> also removed
    assert(out == Set(2L, 4L))
  }

  test("decontaminateNgram: any shared n-gram kills, position-free; short docs survive") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "p q a b c r s"), // embeds the ref 3-gram mid-doc
      (2L, "a b c"), // IS the ref line
      (3L, "x a b y c"), // shares words but no 3-gram
      (4L, "a b"), // shorter than n: zero grams, must survive
      (5L, "u v w a b c") // ref 3-gram at the very end
    ).toDF("doc_id", "text")
    val reference = Seq("m n a b c").toDF("text")
    val out = Dedup.decontaminateNgram(corpus, reference, "doc_id", "text", n = 3)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(3L, 4L))
    // shuffled-reference path agrees with the broadcast path
    val shuffled = Dedup
      .decontaminateNgram(corpus, reference, "doc_id", "text", n = 3, broadcastReference = false)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(shuffled == out)
    // n larger than every doc: nothing matches, everything survives
    assert(Dedup.decontaminateNgram(corpus, reference, "doc_id", "text", n = 20).count() == 5)
    intercept[IllegalArgumentException] {
      Dedup.decontaminateNgram(corpus, reference, "doc_id", "text", n = 0)
    }
  }

  test("sourceOverlap: planted cross-source duplicates land in the right matrix cells") {
    import spark.implicits._
    val tA = (1 to 12).map(i => s"a$i").mkString(" ")
    val tB = (1 to 12).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, "cc", tA), (2L, "c4", tA), //   cross-source exact pair -> (c4, cc)
      (3L, "cc", tB), (4L, "cc", tB), //   internal cc pair -> the diagonal
      (5L, "wiki", (1 to 12).map(i => s"u$i").mkString(" ")) // unique, no row
    ).toDF("doc_id", "source", "text")
    // 8/8 agreement cut: exact copies reach est 1.0; unrelated short texts
    // reach it with P ~ (hash-set J)^8 ~ 0 (the curate-incr convention)
    def run(df: org.apache.spark.sql.DataFrame) = Dedup
      .sourceOverlap(df, "doc_id", "text", "source", minEstJaccard = 1.0)
      .orderBy("source_a", "source_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    val got = run(docs)
    assert(got == Seq(("c4", "cc", 1L), ("cc", "cc", 1L)), got)
    assert(run(docs.repartition(4)) == got) // deterministic at any partitioning
    intercept[IllegalArgumentException] {
      Dedup.sourceOverlap(docs, "doc_id", "text", "source", minEstJaccard = 1.5)
    }
  }

  test("corpusDatasheet: hand-built per-source report card, deterministic top-lang ties") {
    import spark.implicits._
    val suites = Seq(("s1", "a b c d e f g h i j k l m")).toDF("suite", "text") // one 13-gram
    val docs = Seq(
      (1L, "srcA", "en", "a b c d e f g h i j k l m xx"), // contaminated, 14 tokens, 12 shingles
      (2L, "srcA", "de", "z1 z2"), //                         2 tokens, no shingles
      (3L, "srcB", "en", "p q r") //                          1 novel shingle
    ).toDF("doc_id", "source", "lang", "text")
    val got = Pipeline
      .corpusDatasheet(docs, suites, "doc_id", "text", "source", "lang", "suite")
      .orderBy("source")
      .collect()
    val a = got(0)
    assert(a.getString(0) == "srcA" && a.getLong(1) == 2L && a.getLong(2) == 16L)
    assert(a.getLong(3) == 2L) // two langs
    // top-lang TIE (1 doc each): max(struct(docs, lang)) breaks to the
    // lexicographically last lang — "en" over "de", deterministically
    assert(a.getString(4) == "en")
    assert(a.getLong(5) == 0L && a.getDouble(6) == 0.0) // nothing passes quality
    assert(a.getLong(7) == 1L) // doc 1 shares the 13-gram
    assert(a.getDouble(8) == 1.0) // all 12 shingles are corpus-unique
    val b = got(1)
    assert(b.getString(0) == "srcB" && b.getLong(1) == 1L && b.getLong(7) == 0L)
    assert(b.getDouble(8) == 1.0)
    // deterministic at any partitioning
    val again = Pipeline
      .corpusDatasheet(docs.repartition(5), suites, "doc_id", "text", "source", "lang", "suite")
      .orderBy("source")
    assert(again.exceptAll(
      Pipeline.corpusDatasheet(docs, suites, "doc_id", "text", "source", "lang", "suite")
    ).isEmpty)
    // a source whose docs are all sub-shingle-length gets a NULL novelty
    val tiny = Seq((9L, "srcC", "en", "one two")).toDF("doc_id", "source", "lang", "text")
    val r9 = Pipeline
      .corpusDatasheet(tiny, suites, "doc_id", "text", "source", "lang", "suite").head()
    assert(r9.isNullAt(8) && r9.getLong(1) == 1L)
  }

  test("auditFunnel: staged counters match hand-built corpus and chained operators") {
    import spark.implicits._
    // 100 tokens of 8 chars: quality = 0.5*min(100/100,1) + 0.5*min(8/8,1) = 1.0
    val good = Seq.fill(100)("wordword").mkString(" ")
    val corpus = Seq(
      (1L, good), // survivor
      (2L, good), // exact dup of 1 -> dropped at dedup
      (3L, "short"), // fails quality
      (4L, good + " extra"), // survivor, but contaminated (in ref)
      (5L, good + " unique tail here")
    ).toDF("doc_id", "text")
    val reference = Seq(good + " extra").toDF("text")
    val row = Pipeline.auditFunnel(corpus, "doc_id", "text", reference, minQuality = 0.6).head()
    assert(
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) == ((5L, 4L, 3L, 2L)),
      row
    )
    // chained-operator parity on real data: n_clean == |decontaminate(exact(quality))|
    val docs = t(spark, sfTiny, "documents")
    val ref = docs.filter(col("doc_id") % 7 === 0)
    val funnel = Pipeline.auditFunnel(docs, "doc_id", "text", ref, 0.6).head()
    val chained = Dedup.decontaminate(
      Dedup.exact(docs.filter(TextAnalysis.qualityExpr(col("text")) >= 0.6), Seq("text"), "doc_id"),
      ref,
      "text"
    ).count()
    assert(funnel.getLong(3) == chained)
  }

  test("chunkDocs: window/stride coverage exact; short docs; guards") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(docs, "doc_id", "text", window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getInt(3))).toMap
    // doc 1: 10 tokens, starts 0,3,6,9
    assert(got((1L, 0L)) == (("t1 t2 t3 t4", 4)))
    assert(got((1L, 1L)) == (("t4 t5 t6 t7", 4)))
    assert(got((1L, 2L)) == (("t7 t8 t9 t10", 4)))
    assert(got((1L, 3L)) == (("t10", 1))) // short tail chunk
    assert(got((2L, 0L)) == (("a b", 2)))
    assert(got.size == 5)
    // every token covered at stride <= window; no overlap at stride == window
    val tight = TextAnalysis.chunkDocs(docs, "doc_id", "text", window = 3, stride = 3)
      .filter(col("doc_id") === 1L).collect().map(_.getString(2))
    assert(tight.mkString(" ") == (1 to 10).map(i => s"t$i").mkString(" "))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocs(docs, "doc_id", "text", window = 3, stride = 4)
    }
    // null text emits zero chunk rows, never fabricated ones
    val withNull = docs.union(Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    assert(
      TextAnalysis.chunkDocs(withNull, "doc_id", "text", 4, 3)
        .filter(col("doc_id") === 3L).count() == 0
    )
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocs(docs, "doc_id", "text", window = 0, stride = 1)
    }
  }

  test("decontaminateBloom equals decontaminate, incl. under forced bloom false positives") {
    import spark.implicits._
    val corpus = spark.range(400)
      .select(col("id").as("doc_id"), concat(lit("w"), col("id"), lit(" common tail")).as("text"))
    val reference = corpus.filter(col("doc_id") % 9 === 0)
    val exact = Dedup.decontaminate(corpus, reference, "text", broadcastReference = false)
      .collect().map(_.getLong(0)).toSet
    // tiny bloom (512 bits, ~45 ref fps) -> high fpp: the verify stage must
    // rescue the false positives; no-false-negative keeps the rest
    val bloomed = Dedup.decontaminateBloom(corpus, reference, "text", 64, 512)
      .collect().map(_.getLong(0)).toSet
    assert(bloomed == exact)
    assert(exact == (0 until 400).filter(_ % 9 != 0).map(_.toLong).toSet)
    // sane bloom too
    val bloomed2 = Dedup.decontaminateBloom(corpus, reference, "text")
      .collect().map(_.getLong(0)).toSet
    assert(bloomed2 == exact)
  }

  test("tfidf: corpus-unique terms outrank ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common other other"),
      (3L, "common filler words")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdf(docs, "doc_id", "text", 2)
      .filter(col("doc_id") === 1).orderBy("rank")
      .collect().map(_.getAs[String]("term")).toSeq
    // 'common' appears in every doc (idf ln(4/4)=0) -> cannot win
    assert(top.head == "rare1", top.mkString(","))
    assert(!top.contains("common") || top.indexOf("common") > 0)
  }

  test("range join sweep: bucketed equals brute force for many widths and interval shapes") {
    import spark.implicits._
    // deterministic pseudo-random fixtures from hash arithmetic
    val pts = (0 until 500)
      .map(i => ((i * 2654435761L % 10007).toDouble / 10, i.toLong)).toDF("p", "pid")
    val iv = (0 until 60).map { i =>
      val lo = (i * 1315423911L % 9001).toDouble / 10
      val width = ((i * 97 + 13) % 300).toDouble / 3
      (i.toLong, lo, lo + width) // width 0..100, includes width-0 (empty)
    }.toDF("iv_id", "lo", "hi")
    val brute = pts
      .join(iv, col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(0.5, 7.0, 100.0, 5000.0).foreach { w =>
      val fast = RangeJoin.pointInInterval(pts, "p", iv, "lo", "hi", w)
        .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == brute, s"bucketWidth=$w: missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
    }
    assert(brute.nonEmpty)
  }

  test("topKPerKey sweep: equals window for k in {1, 2, 7, 50, over-size}") {
    val li = t(spark, sfTiny, "lineitem").limit(3000)
    val packed = struct(
      col("l_quantity").as("q"),
      col("l_orderkey").as("ok"),
      col("l_linenumber").as("ln")
    )
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy(desc("l_quantity"), desc("l_orderkey"), desc("l_linenumber"))
    Seq(1, 2, 7, 50, 100000).foreach { k =>
      val expect = li
        .select(col("l_returnflag"), packed.as("s"), row_number().over(w).as("rk"))
        .filter(col("rk") <= k)
        .select(col("l_returnflag"), col("rk"), col("s.*"))
        .orderBy("l_returnflag", "rk").collect().toSeq
      val got = Relational.topKPerKey(li, Seq("l_returnflag"), packed, k)
        .orderBy("l_returnflag", "rk").collect().toSeq
      assert(got == expect, s"k=$k: sizes ${got.size} vs ${expect.size}")
    }
  }

  test("kmeansFit: deterministic across partitioning, improves ivf recall over naive seeds") {
    val e = t(spark, sfTiny, "embeddings").cache()
    def fit(df: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansFit(df, "vec_id", "embedding", k = 8, iters = 2)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
        .sortBy(_._1).toVector
    val a = fit(e)
    assert(a.length == 8 && a.map(_._1) == (0L until 8L).toVector)
    assert(a == fit(e.repartition(7)), "decimal-exact means must make the fit partition-invariant")
    // fitted centroids must at least not collapse: all 8 distinct
    assert(a.map(_._2).distinct.length == 8)
    // and compose with ivfTopK
    val cen = Similarity.kmeansFit(e, "vec_id", "embedding", 8, 2)
      .select(col("cen_id").as("vec_id"), col("cen_v").as("embedding"))
    val hits = Similarity.ivfTopK(e, cen, "vec_id", "embedding", 5).count()
    assert(hits > 0)
  }

  test("topKPerKey (bounded-heap agg) equals window row_number, at any partitioning") {
    val li = t(spark, sfTiny, "lineitem")
    val packed = struct(
      col("l_extendedprice").as("price"),
      col("l_orderkey").as("ok"),
      col("l_linenumber").as("ln")
    )
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy(desc("l_extendedprice"), desc("l_orderkey"), desc("l_linenumber"))
    val viaWindow = li
      .select(col("l_returnflag"), packed.as("s"), row_number().over(w).as("rk"))
      .filter(col("rk") <= 4)
      .select(col("l_returnflag"), col("rk"), col("s.*"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Relational.topKPerKey(df, Seq("l_returnflag"), packed, 4)
        .orderBy("l_returnflag", "rk").collect().toSeq
    val a = run(li)
    assert(a == viaWindow.orderBy("l_returnflag", "rk").collect().toSeq)
    assert(a == run(li.repartition(13)), "heap merge must be partition-count invariant")
  }

  test("connected components: fails loudly when maxIter < component diameter") {
    import spark.implicits._
    val chain = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("d1", "d2")
    val e = intercept[IllegalStateException](
      Graph.connectedComponents(chain, "d1", "d2", maxIter = 2).collect()
    )
    assert(e.getMessage.contains("did not converge"))
    // and with enough rounds the same chain collapses fully
    val ok = Graph.connectedComponents(chain, "d1", "d2", maxIter = 10)
      .collect().map(_.getLong(1)).distinct.toSeq
    assert(ok == Seq(1L))
  }

  test("minhash hot-bucket cap drops oversized buckets, leaves small ones intact") {
    import spark.implicits._
    // 6 near-identical docs (one shared bucket of 6) + 2 similar docs (bucket of 2)
    val docs = (
      (1 to 6).map(i => (i.toLong, "the same boilerplate header text repeated verbatim")) ++
        Seq((10L, "a unique pair of similar documents here"), (11L, "a unique pair of similar documents here"))
    ).toDF("doc_id", "text")
    val uncapped = Dedup.minhashCandidates(docs, "doc_id", "text")
    val capped = Dedup.minhashCandidates(docs, "doc_id", "text", maxBucketSize = Some(4))
    // uncapped: the 6-clone group contributes 15 pairs; capped: that bucket
    // is dropped but the size-2 bucket (10, 11) survives
    assert(uncapped.filter(col("d1") < 7).count() == 15)
    assert(capped.filter(col("d1") < 7).count() == 0)
    assert(capped.filter(col("d1") === 10L && col("d2") === 11L).count() == 1)
  }

  test("connected components: 10k-node path converges via large-star/small-star in O(log n) rounds") {
    import spark.implicits._
    // diameter 9999 — pure min-label would need 9999 rounds; the star
    // fallback (engaged after starAfter=10) must finish inside the default
    // 20-round total budget, proving O(log n) alternation
    val path = spark.range(0, 9999).select(col("id").as("d1"), (col("id") + 1).as("d2"))
    val labels = Graph.connectedComponents(path, "d1", "d2")
    assert(labels.count() == 10000)
    assert(labels.select("label").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
    // two parallel chains + a bridge: roots stay per-component
    val two = spark.range(0, 500).select(col("id").as("d1"), (col("id") + 1).as("d2"))
      .union(spark.range(1000, 1500).select(col("id").as("d1"), (col("id") + 1).as("d2")))
    val got = Graph.connectedComponents(two, "d1", "d2", maxIter = 25)
      .groupBy("label").count().orderBy("label")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 501L), (1000L, 501L)))
    // random-graph equivalence: pure star (starAfter=0) == pure min-label
    val rnd = new scala.util.Random(42)
    val rand = (0 until 400)
      .map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .toDF("d1", "d2")
    rand.persist()
    val viaStar = Graph.connectedComponents(rand, "d1", "d2", maxIter = 30, starAfter = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaMinLabel = Graph.connectedComponents(rand, "d1", "d2", maxIter = 200, starAfter = 200)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rand.unpersist()
    assert(viaStar == viaMinLabel)
  }

  test("sorted_intersect_count rejects nullable-element arrays at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT sorted_intersect_count(array(1L, CAST(NULL AS BIGINT)), array(1L))").collect()
    }
    assert(e.getMessage.contains("non-nullable"), e.getMessage)
  }

  test("registered functions report arity errors clearly") {
    val e = intercept[Exception](spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)))").collect())
    assert(e.getMessage.contains("2 arguments"), e.getMessage)
  }

  test("connected components: transitive chains collapse to min label") {
    import spark.implicits._
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,7}; {8,11}
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 9L), (5L, 7L), (11L, 8L)).toDF("d1", "d2")
    val got = Graph.connectedComponents(edges, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L, 8L -> 8L, 11L -> 8L))
  }

  test("label centroids: exact elementwise mean per label") {
    import spark.implicits._
    val df = Seq((0, Array(1.0f, 2.0f)), (0, Array(3.0f, 6.0f)), (1, Array(5.0f, 5.0f)))
      .toDF("label", "embedding")
    val got = Similarity.labelCentroids(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0, 0) -> 2.0, (0, 1) -> 4.0, (1, 0) -> 5.0, (1, 1) -> 5.0))
  }

  test("fingerprint is token-order insensitive") {
    import spark.implicits._
    val df = Seq((1L, "b a c"), (2L, "c b a"), (3L, "a b d")).toDF("id", "text")
    val fp = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("quantiles facade: exact flag routes percentile vs approx_percentile") {
    val li = t(spark, sfTiny, "lineitem")
    val exact = Quantiles
      .quantiles(li, Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.75), exact = true)
    assert(exact.queryExecution.analyzed.toString.contains("percentile"))
    assert(!exact.queryExecution.analyzed.toString.contains("approx_percentile"))
    val approx = Quantiles
      .quantiles(li, Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.75), accuracy = 10000)
    assert(approx.queryExecution.analyzed.toString.contains("approx_percentile"))
    assert(exact.columns.toSeq == Seq("l_returnflag", "p25", "p50", "p75"))
    // high-accuracy sketch agrees with exact to well under the rank bound
    val e = exact.orderBy("l_returnflag").collect()
    val a = approx.orderBy("l_returnflag").collect()
    assert(e.length == a.length && e.length == 3)
    e.zip(a).foreach { case (er, ar) =>
      (1 to 3).foreach { i =>
        val (ev, av) = (er.getDouble(i), ar.getDouble(i))
        assert(math.abs(ev - av) / math.max(1.0, math.abs(ev)) < 0.02, s"$ev vs $av")
      }
    }
    // global (no keys): one row, labels from fractions incl. sub-percent
    val g = Quantiles.quantiles(li, Nil, "l_extendedprice", Seq(0.05, 0.999), exact = true)
    assert(g.columns.toSeq == Seq("p05", "p99_9"))
    assert(g.count() == 1)
  }

  test("embedDupes: exact-verified subset of LSH candidates; planted dup pair found") {
    import spark.implicits._
    val emb = t(spark, sfTiny, "embeddings")
    // plant a true near-dup: vec 0 scaled by 2 (exact in float -> identical
    // direction, identical bucket) under a new id
    val planted = emb.filter(col("vec_id") === 0).select(
      lit(100000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"),
      col("label")
    )
    val df = emb.unionByName(planted)
    val dupes = Similarity.embedDupes(df, "vec_id", "embedding", 64, 8, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // a uniform scaling preserves direction -> cosine ~ 1.0; same bucket by
    // construction (all sign dots scale by the same positive factor)
    assert(dupes.exists { case (d1, d2, s) => d1 == 0L && d2 == 100000L && s > 0.999 },
      s"planted duplicate not found: ${dupes.mkString(",")}")
    // every emitted pair really is same-bucket AND >= threshold: recompute
    // buckets + exact cosine locally over the collected vectors
    val vecs = df.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bucket(v: Array[Float]): Long = {
      var bk = 0L
      for (b <- 0 until 8) {
        var acc = 0.0
        for (i <- 0 until 64) {
          val sgn = {
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(s"$b:$i".getBytes("US-ASCII"))
            if (((d(0) >>> 4) & 0xF) % 2 == 0) 1.0 else -1.0
          }
          acc += v(i).toDouble * sgn
        }
        if (acc > 0) bk |= (1L << b)
      }
      bk
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (ab, aa, bb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { ab += a(i).toDouble * b(i); aa += a(i).toDouble * a(i); bb += b(i).toDouble * b(i) }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    dupes.foreach { case (d1, d2, s) =>
      assert(bucket(vecs(d1)) == bucket(vecs(d2)), s"pair ($d1,$d2) not same-bucket")
      assert(math.abs(cos(vecs(d1), vecs(d2)) - s) < 1e-5 && s >= 0.9)
    }
  }

  test("farthestPointSeeds: deterministic spread seeding; composes with kmeansFit/ivfTopK") {
    val e = t(spark, sfTiny, "embeddings")
    val k = 8
    def seedIds(df: org.apache.spark.sql.DataFrame) =
      Similarity.farthestPointSeeds(df, "vec_id", "embedding", k)
        .orderBy("cen_id").collect().map(_.getSeq[Float](1).toVector).toSeq
    val s1 = seedIds(e)
    assert(s1.size == k && s1.distinct.size == k, "seeds must be k distinct vectors")
    // deterministic at any parallelism (packed argmin + id tiebreak)
    assert(seedIds(e.repartition(11)) == s1)
    // quality: mean max-cosine of every vector to its nearest centroid,
    // after the same Lloyd's iterations, from both seedings
    def meanMaxCos(initial: Option[org.apache.spark.sql.DataFrame]): Double = {
      val cen = Similarity.kmeansFit(e, "vec_id", "embedding", k, iters = 3, initial = initial)
        .collect().map(r => r.getSeq[Float](1).toArray)
      val vecs = e.select("embedding").collect().map(_.getSeq[Float](0).toArray)
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var (ab, aa, bb) = (0.0, 0.0, 0.0)
        for (i <- a.indices) { ab += a(i).toDouble * b(i); aa += a(i).toDouble * a(i); bb += b(i).toDouble * b(i) }
        if (aa == 0 || bb == 0) 0.0 else ab / (math.sqrt(aa) * math.sqrt(bb))
      }
      vecs.map(v => cen.map(c => cos(v, c)).max).sum / vecs.length
    }
    val fps = meanMaxCos(Some(Similarity.farthestPointSeeds(e, "vec_id", "embedding", k)))
    val firstK = meanMaxCos(None)
    info(f"mean max-cos after 3 Lloyd iters: farthest-point $fps%.4f vs first-k $firstK%.4f")
    // spread seeding must not be materially worse than the first-k default
    // (measured: better on this fixture); pinned with a small tolerance
    assert(fps >= firstK - 0.02, f"farthest-point $fps%.4f much worse than first-k $firstK%.4f")
  }

  test("stripBoilerplate: exact coverage union, short docs untouched, full-boilerplate empty") {
    import spark.implicits._
    // 4-gram spans in > 1 docs are boilerplate. "a b c d" is shared by
    // docs 1,2,3,5,6; "b c d e" by docs 5,6 (overlapping coverage).
    val corpus = Seq(
      (1L, "a b c d x y z"), // boiler prefix -> "x y z"
      (2L, "p q r a b c d"), // boiler suffix -> "p q r"
      (3L, "a b c d"), // fully boilerplate -> ""
      (4L, "u v w"), // < n tokens: no spans, untouched
      (5L, "a b c d e k5"), // two OVERLAPPING hot spans cover 0..4 -> "k5"
      (6L, "a b c d e k6")
    ).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.stripBoilerplate(df, "doc_id", "text", n = 4, maxDocs = 1L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val got = run(corpus)
    assert(got == Seq(
      (1L, "x y z", 3L),
      (2L, "p q r", 3L),
      (3L, "", 0L),
      (4L, "u v w", 3L),
      (5L, "k5", 1L),
      (6L, "k6", 1L)
    ), got.mkString(","))
    assert(run(corpus.repartition(7)) == got)
  }

  test("curate == the hand-chained stages; splits cover survivors exactly") {
    val docs = t(spark, sfTiny, "documents")
    val reference = docs.filter(col("doc_id") % 7 === 0)
    val shares = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Pipeline
      .curate(docs, "doc_id", "text", reference, "lang", shares, splits, 0.6, 0.8)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val cleaned = Pipeline.cleanCorpus(docs, "doc_id", "text", 0.6, 0.8)
    val manual = Scale.hashSplit(
      Scale.resampleToMix(
        Dedup.decontaminate(cleaned, reference, "text"),
        Seq("doc_id"), "lang", shares),
      Seq("doc_id"), splits)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == manual && got.nonEmpty)
    // every survivor has exactly one split label from the declared set
    assert(got.map(_._1).size == got.size)
    assert(got.map(_._2).subsetOf(splits.map(_._1).toSet))
  }

  test("temperatureMix: sqrt-rule shares == manual resampleToMix; alpha=1 keeps all") {
    import spark.implicits._
    // counts 1 / 4 / 9 -> sqrt-weights 1 / 2 / 3 -> shares 1/6, 2/6, 3/6
    val docs = ((1 to 1).map(i => (i.toLong, "a")) ++
      (11 to 14).map(i => (i.toLong, "b")) ++
      (21 to 29).map(i => (i.toLong, "c"))).toDF("doc_id", "lang")
    val got = Scale.temperatureMix(docs, Seq("doc_id"), "lang", alpha = 0.5)
      .collect().map(_.getLong(0)).toSet
    val manual = Scale.resampleToMix(
      docs, Seq("doc_id"), "lang",
      Map("a" -> 1.0 / 6, "b" -> 2.0 / 6, "c" -> 3.0 / 6)
    ).collect().map(_.getLong(0)).toSet
    assert(got == manual && got.nonEmpty)
    // alpha=1: shares proportional to counts -> every rate is 1, all rows kept
    assert(Scale.temperatureMix(docs, Seq("doc_id"), "lang", alpha = 1.0).count() == 14)
    intercept[IllegalArgumentException] {
      Scale.temperatureMix(docs, Seq("doc_id"), "lang", alpha = 0.0)
    }
    // tail protection really happens: sqrt shares give the 1-doc domain a
    // larger target share than its natural 1/14
    val full = t(spark, sfTiny, "documents")
    val mixed = Scale.temperatureMix(full, Seq("doc_id"), "lang", 0.5)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val natural = full.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = natural.minBy(_._2)._1
    val maxLang = natural.maxBy(_._2)._1
    // the smallest domain keeps (nearly) everything; the largest is downsampled
    assert(mixed(minLang) >= natural(minLang) * 9 / 10, s"$minLang: $mixed vs $natural")
    assert(mixed(maxLang) < natural(maxLang), s"$maxLang: $mixed vs $natural")
  }

  test("decontaminateNgram equals brute force on random corpora (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny alphabet so n-gram collisions actually happen
    val genDoc = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val prop = Prop.forAll(
      Gen.choose(4, 15).flatMap(n => Gen.listOfN(n, genDoc)),
      Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, genDoc)),
      Gen.choose(2, 4)
    ) { (corpusToks, refToks, n) =>
      import spark.implicits._
      val corpus = corpusToks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      val df = corpus.toDF("doc_id", "text").repartition(3)
      val ref = refToks.map(_.mkString(" ")).toDF("text")
      val got = Dedup.decontaminateNgram(df, ref, "doc_id", "text", n)
        .collect().map(_.getLong(0)).toSet
      // brute force: string n-gram sets intersect?
      def grams(ts: Seq[String]): Set[String] =
        if (ts.length < n) Set.empty else ts.sliding(n).map(_.mkString(" ")).toSet
      val refG = refToks.flatMap(grams).toSet
      val want = corpus.collect {
        case (id, _) if grams(corpusToks(id.toInt)).intersect(refG).isEmpty => id
      }.toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("packSequences equals a local fold on random corpora (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genDoc = for {
      grp <- Gen.oneOf("s0", "s1", "s2")
      nTok <- Gen.choose(1, 40)
    } yield (grp, nTok)
    val genCorpus = Gen.choose(5, 40).flatMap(n => Gen.listOfN(n, genDoc))
    val prop = Prop.forAll(genCorpus, Gen.choose(4, 64)) { (docsList, seqLen) =>
      import spark.implicits._
      val rows = docsList.zipWithIndex.map { case ((g, n), i) =>
        (i.toLong, g, (0 until n).map(j => s"t$j").mkString(" "))
      }
      val df = rows.toDF("doc_id", "source", "text").repartition(5)
      val got = TextAnalysis
        .packSequences(df, "doc_id", Seq("source"), "text", seqLen)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      // local simulation: running token sum per group in doc_id order
      val want = rows
        .groupBy(_._2)
        .flatMap { case (_, rs) =>
          rs.sortBy(_._1)
            .foldLeft((0L, List.empty[(Long, (Long, Long, Long))])) {
              case ((cum, acc), (id, _, text)) =>
                val n = text.split(" ").length.toLong
                (cum + n, (id -> (n, cum / seqLen, cum % seqLen)) :: acc)
            }
            ._2
        }
        .toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("spanContamination: exact span-overlap fractions, short docs null, paths agree") {
    import spark.implicits._
    // 4-token spans; doc 1 = reference verbatim (contam 1.0), doc 2 shares
    // its first 4-gram only, doc 3 disjoint, doc 4 too short for any span
    val corpus = Seq(
      (1L, "a b c d e"), // spans: "a b c d", "b c d e" -> both in ref
      (2L, "a b c d x y z"), // spans: 4 total, 1 in ref
      (3L, "p q r s t"), // 2 spans, 0 in ref
      (4L, "u v w") // < 4 tokens: no spans
    ).toDF("doc_id", "text")
    val reference = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    def run(bcast: Boolean) =
      Dedup.spanContamination(corpus, reference, "doc_id", "text", n = 4, broadcastReference = bcast)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
        .sortBy(_._1).toSeq
    val got = run(bcast = true)
    assert(got == Seq(
      (1L, 2L, 2L, Some(1.0)),
      (2L, 4L, 1L, Some(0.25)),
      (3L, 2L, 0L, Some(0.0)),
      (4L, 0L, 0L, None)
    ), got.mkString(","))
    // shuffled-reference path is result-identical to the broadcast path
    assert(run(bcast = false) == got)
  }

  test("packSequences: offsets reconstruct the concatenated stream; partition invariant") {
    val docs = t(spark, sfTiny, "documents")
    val L = 128
    val out = TextAnalysis.packSequences(docs, "doc_id", Seq("source"), "text", L)
    assert(out.columns.toSeq == Seq("doc_id", "source", "n_tokens", "seq_id", "seq_off"))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per source in doc_id order, offsets are the exact running token sum
    rows.groupBy(_._2).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._1).foreach { case (id, src, n, seqId, seqOff) =>
        assert(seqId == cum / L && seqOff == cum % L,
          s"doc $id in $src: expected start $cum, got seq=$seqId off=$seqOff")
        cum += n
      }
    }
    // n_tokens matches tokenStats' whitespace convention
    val nTok = TextAnalysis.tokenStats(docs, "doc_id", "text")
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.foreach { case (id, _, n, _, _) => assert(nTok(id) == n) }
    // identical at any parallelism (the window orders globally per group)
    val repart = TextAnalysis
      .packSequences(docs.repartition(13), "doc_id", Seq("source"), "text", L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(repart.toSet == rows.toSet)
  }

  test("htmlToText: script/style dropped with content, tags to spaces, entities decoded") {
    import spark.implicits._
    val cases = Seq(
      // script body containing a bare '<' must vanish entirely
      ("<p>a</p><script>if (x<2) y=3;</script><p>b</p>", "a b"),
      ("<style>p { color: red }</style>hello", "hello"),
      // tags become spaces: block boundaries never glue words
      ("<div>one</div><div>two</div>", "one two"),
      // entity decode order: &amp;lt; is the LITERAL string "&lt;"
      ("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; &amp;lt; end",
        "x <tag> \"q\" 's' & &lt; end"),
      ("   spaced\n\tout   ", "spaced out"),
      ("plain text untouched", "plain text untouched"),
      ("", "")
    ).toDF("html", "expect")
    val got = cases.select(col("expect"), TextAnalysis.htmlToText(col("html")).as("got"))
    got.collect().foreach(r => assert(r.getString(1) == r.getString(0),
      s"expected '${r.getString(0)}' got '${r.getString(1)}'"))
  }

  test("htmlToText recovers the text of any generated page (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val genText = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val tag = Gen.oneOf("p", "div", "span", "b", "h1", "li")
    // a page interleaves wrapped/bare segments plus script/style noise
    val genSeg: Gen[(String, String)] = Gen.oneOf(
      genText.flatMap(t => tag.map(g => (s"<$g>$t</$g>", t))),
      genText.map(t => (t, t)),
      Gen.const(("<script>var q = 1 < 2;</script>", "")),
      Gen.const(("<style>b{font-weight:900}</style>", "")),
      Gen.const(("<br/>", ""))
    )
    val genPage = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genSeg))
    val prop = Prop.forAll(genPage) { segs =>
      val html = segs.map(_._1).mkString(" ")
      val expect = segs.map(_._2).filter(_.nonEmpty).mkString(" ")
      val got = Seq(html).toDF("h")
        .select(TextAnalysis.htmlToText(col("h"))).head().getString(0)
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("clusterRepresentatives: best doc per component survives, singletons kept, sizes sum") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // docs 1,2,3 mutually near-dup (one token appended/changed), 2 is longest;
    // docs 10, 11 unique singletons
    val docs = Seq(
      (1L, s"$base one"),
      (2L, s"$base one two"),
      (3L, s"$base three"),
      (10L, "completely different content with many unrelated words here now"),
      (11L, "another standalone document about nothing in particular at all")
    ).toDF("doc_id", "text").withColumn("q", length(col("text")))
    val out = Dedup.clusterRepresentatives(docs, "doc_id", "text", 0.5, col("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((2L, 1L, 3L), (10L, 10L, 1L), (11L, 11L, 1L)), out.toString)
    // sizes always sum to the input count, survivors = one per cluster
    val full = t(spark, sfTiny, "documents")
    val reps = Dedup.clusterRepresentatives(full, "doc_id", "text", 0.8, col("n_chars")).cache()
    assert(reps.agg(sum("n_cluster")).head().getLong(0) == full.count())
    assert(reps.select("cluster").distinct().count() == reps.count())
    reps.unpersist()
  }

  test("sq8 quantize: codes bounded, reconstruction within scale/2, zero vector safe") {
    import spark.implicits._
    val e = t(spark, sfTiny, "embeddings")
    val q = Similarity.sqQuantize(e, "vec_id", "embedding").cache()
    // every code in [-127, 127]; max element hits ±127 exactly (max-abs scaling)
    val stats = q.select(
      aggregate(col("sq_codes"), lit(127), (a, c) => least(a, c.cast("int"))).as("mn"),
      aggregate(col("sq_codes"), lit(-127), (a, c) => greatest(a, c.cast("int"))).as("mx")
    ).agg(min("mn"), max("mx")).head()
    assert(stats.getInt(0) >= -127 && stats.getInt(1) <= 127)
    assert(q.filter(abs(element_at(
      sort_array(transform(col("sq_codes"), c => abs(c.cast("int"))), asc = false), 1
    )) =!= 127).count() == 0, "max |code| should be exactly 127 under max-abs scaling")
    // reconstruction error bound: |x - code*scale| <= scale/2 (+1 float ulp)
    val viol = q.filter(
      aggregate(
        zip_with(col("embedding"), col("sq_codes"),
          (x, c) => abs(x.cast("double") - c.cast("double") * col("sq_scale"))),
        lit(0.0), (a, v) => greatest(a, v)
      ) > col("sq_scale") * 0.5 * (1.0 + 1e-9)
    ).count()
    assert(viol == 0)
    // quantized cosine (codes only — scales cancel) tracks exact cosine
    val self = q.limit(50).select(col("vec_id").as("qid"), col("embedding").as("qv"), col("sq_codes").as("qc"))
    val other = q.select(col("vec_id").as("cid"), col("embedding").as("cv"), col("sq_codes").as("cc"))
    val maxDev = other.join(broadcast(self), col("qid") =!= col("cid"))
      .select(abs(
        Similarity.sqCosine(col("qc"), col("cc")) -
          Similarity.cosine(col("qv"), col("cv"))
      ).as("dev"))
      .agg(max("dev")).head().getDouble(0)
    assert(maxDev < 0.02, s"SQ8 cosine deviated $maxDev from exact")
    // all-zero vector: scale 0, all-zero codes, no division blowup
    val z = Similarity.sqQuantize(
      Seq((1L, Seq(0f, 0f, 0f)), (2L, Seq(1f, -2f, 0.5f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding"
    ).orderBy("vec_id").collect()
    assert(z(0).getDouble(z(0).fieldIndex("sq_scale")) == 0.0)
    assert(z(0).getSeq[Byte](z(0).fieldIndex("sq_codes")).forall(_ == 0))
    assert(z(1).getSeq[Byte](z(1).fieldIndex("sq_codes")) == Seq[Byte](64, -127, 32))
    // byte_dot is SQL-registered
    q.limit(5).createOrReplaceTempView("sq_t")
    assert(spark.sql("select byte_dot(sq_codes, sq_codes) d from sq_t").count() == 5)
    q.unpersist()
  }

  test("sq8 topk: full rerank equals exact brute force; small rerank keeps recall") {
    val e = t(spark, sfTiny, "embeddings").cache()
    val small = e.limit(100).cache()
    val exactSmall = Similarity.bruteForceTopK(small, small, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Int]("rn"))).toSet
    // rerank >= corpus: stage 2 drops nothing, so the result IS the exact top-k
    val full = Similarity.bruteForceTopKSq(small, small, "vec_id", "embedding", 5, rerank = 99)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Int]("rn"))).toSet
    assert(full == exactSmall, s"missing=${exactSmall -- full} extra=${full -- exactSmall}")
    // modest oversampling: near-total recall on the real corpus
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 10)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("cid")).toSet).toMap
    val sq = Similarity.bruteForceTopKSq(e, e, "vec_id", "embedding", 10, rerank = 30)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("cid")).toSet).toMap
    val recall = exact.keys.toSeq.map { qid =>
      (exact(qid) intersect sq.getOrElse(qid, Set.empty)).size.toDouble / exact(qid).size
    }
    val mean = recall.sum / recall.size
    assert(mean >= 0.99, s"SQ8 rerank recall@10 = $mean")
    intercept[IllegalArgumentException] {
      Similarity.bruteForceTopKSq(e, e, "vec_id", "embedding", 10, rerank = 5)
    }
    small.unpersist(); e.unpersist()
  }

  test("sq8 ivf: full rerank equals float ivfTopK; codes-only join keeps recall") {
    val e = t(spark, sfTiny, "embeddings").cache()
    val cen = e.filter(col("vec_id") < 8).select("vec_id", "embedding")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Int]("rn"))).toSet
    val floatIvf = asSet(Similarity.ivfTopK(e, cen, "vec_id", "embedding", 5, nProbe = 2))
    // rerank >= corpus: every in-cell candidate reaches the exact stage
    val sqFull = asSet(Similarity.ivfTopKSq(e, cen, "vec_id", "embedding", 5, nProbe = 2, rerank = 600))
    assert(sqFull == floatIvf, s"missing=${floatIvf -- sqFull} extra=${sqFull -- floatIvf}")
    // modest oversampling: near-total agreement with the float index
    val sq = Similarity.ivfTopKSq(e, cen, "vec_id", "embedding", 5, nProbe = 2, rerank = 15)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("cid")).toSet).toMap
    val truth = floatIvf.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val recalls = truth.keys.toSeq.map { qid =>
      (truth(qid) intersect sq.getOrElse(qid, Set.empty)).size.toDouble / truth(qid).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.99, s"SQ8 IVF recall vs float IVF = $mean")
    intercept[IllegalArgumentException] {
      Similarity.ivfTopKSq(e, cen, "vec_id", "embedding", 10, rerank = 5)
    }
    e.unpersist()
  }

  test("sampleVideoFrames: stride-2 indices, media timestamps, real pixels recovered") {
    import spark.implicits._
    val ids = (0L until 12L).toDF("doc_id")
    val withAvi = Multimodal.withSynthAviPayload(ids, "doc_id")
    val out = Multimodal.sampleVideoFrames(withAvi, "doc_id", 2).cache()
    val rows = out.collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3), r.getInt(4),
        r.getAs[Array[Byte]](5))
    }
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val n = 2 + (id % 4).toInt
      val fps = (5 + (id % 3).toInt * 5).toDouble
      val expectIdx = (0 until n by 2).toSeq
      assert(rs.map(_._2).sorted.toSeq == expectIdx, s"doc $id sampled wrong frames")
      rs.foreach { case (_, i, t, w, h, frame) =>
        assert(t == i / fps)
        assert(w == 16 + (id % 3).toInt * 8 && h == 8 + (id % 5).toInt * 8)
        // the sampled frame is a REAL JPEG of the synth gray pattern
        val gray = ((id * 37 + i * 11) % 256).toInt
        val lum = Multimodal.decodeImage(frame, 2).get._1
        assert(lum.forall(v => math.abs(v - gray / 255.0) < 0.02))
      }
    }
    // every=1 degenerates to the full explode; corrupt payload yields no rows
    val all = Multimodal.sampleVideoFrames(withAvi, "doc_id", 1)
    assert(all.count() == (0L until 12L).map(id => 2 + id % 4).sum)
    val bad = Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    assert(Multimodal.sampleVideoFrames(bad, "doc_id", 2).count() == 0)
    intercept[IllegalArgumentException] {
      Multimodal.sampleVideoFrames(withAvi, "doc_id", 0)
    }
    out.unpersist()
  }

  test("dedupSegmentsKeepFirst keeps globally-first occurrence, rebuilds in order") {
    import spark.implicits._
    // segTokens=2: doc 0 = [a b][c d][a b]  (internal repeat of its own first seg)
    //              doc 1 = [c d][e f]       (c d first seen in doc 0 seg 1)
    //              doc 2 = [a b][c d]       (fully duplicate -> "")
    //              doc 3 = [g h]            (unique singleton)
    val docs = Seq(
      (0L, "a b c d a b"),
      (1L, "c d e f"),
      (2L, "a b c d"),
      (3L, "g h")
    ).toDF("doc_id", "text")
    val out = Dedup
      .dedupSegmentsKeepFirst(docs, "doc_id", "text", segTokens = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(out == Seq(
      (0L, "a b c d", 2L), // internal repeat dropped too
      (1L, "e f", 1L),
      (2L, "", 0L), // fully duplicate doc survives as empty, not dropped
      (3L, "g h", 1L)
    ))
    // partial tail segment is a segment of its own: "x y z" = [x y][z]
    val tail = Seq((0L, "x y z"), (1L, "z")).toDF("doc_id", "text")
    val t2 = Dedup
      .dedupSegmentsKeepFirst(tail, "doc_id", "text", segTokens = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(t2 == Seq((0L, "x y z"), (1L, ""))) // doc 0's tail [z] wins over doc 1's [z]
    intercept[IllegalArgumentException] {
      Dedup.dedupSegmentsKeepFirst(docs, "doc_id", "text", segTokens = 0)
    }
  }

  test("dedupSegmentsKeepFirst is partition-count invariant") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, (0 until 12).map(j => s"w${(i * 7 + j) % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Dedup.dedupSegmentsKeepFirst(docs.repartition(1), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.dedupSegmentsKeepFirst(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("imagePHash robust to scale/quality; pHashDupes == brute force at the threshold") {
    import spark.implicits._
    // 12 docs over 4 patterns; same-pattern variants differ in SIZE and
    // JPEG QUALITY (different bytes, same content — byte hashing is blind)
    val docs = (0L until 12L).map(i => (i, i % 4)).toDF("doc_id", "pat")
    val withP = Multimodal.withSynthJpegPayload(docs, "doc_id", "pat")
    val hashes = Multimodal.imagePHashes(withP, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.size == 12)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val same = for (i <- 0L until 12L; j <- i + 1 until 12L if i % 4 == j % 4)
      yield ham(hashes(i), hashes(j))
    val cross = for (i <- 0L until 12L; j <- i + 1 until 12L if i % 4 != j % 4)
      yield ham(hashes(i), hashes(j))
    info(s"same-pattern hamming: ${same.sorted.mkString(",")}")
    info(s"cross-pattern hamming min: ${cross.min}")
    assert(same.max <= 3, s"same pattern hamming up to ${same.max}")
    assert(cross.min > 10, s"cross pattern hamming down to ${cross.min}")
    // banded blocking has EXACT recall at the threshold: operator output
    // == brute-force all-pairs at hamming <= 3
    val got = Multimodal.pHashDupes(withP, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      i <- 0L until 12L; j <- i + 1 until 12L
      h = ham(hashes(i), hashes(j)) if h <= 3
    } yield (i, j, h.toLong)).toSet
    assert(got == want && got.nonEmpty)
    // corrupt payloads decode to nothing and pair with nothing
    val withBad = withP.union(
      Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    )
    assert(Multimodal.imagePHashes(withBad, "doc_id").count() == 12)
    intercept[IllegalArgumentException] {
      Multimodal.pHashDupes(withP, "doc_id", maxHamming = 63)
    }
  }

  test("hashedTf: manual recount, dense==sparse, identical docs collide exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "a b a c"), // identical content
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val sparse = TextAnalysis.hashedTf(docs, "doc_id", "text", dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // manual recount with the same portable hash convention
    def h60(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(17, 32), 16)
    }
    val want = Seq("a", "b", "a", "c").map(h60).groupBy(h => (h >>> 1) % 16)
      .map { case (b, hs) => b -> hs.map(h => if (h % 2 == 1) 1L else -1L).sum }
    want.foreach { case (b, w) => assert(sparse((1L, b)) == w, s"bucket $b") }
    // identical docs produce identical sparse rows
    assert(
      sparse.collect { case ((d, b), w) if d == 1L => b -> w } ==
        sparse.collect { case ((d, b), w) if d == 2L => b -> w }
    )
    // dense form is exactly the densified sparse form
    val dense = TextAnalysis.hashedTfDense(docs, "doc_id", "text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (d <- Seq(1L, 2L, 3L); b <- 0 until 16)
      assert(dense(d)(b) == sparse.getOrElse((d, b), 0L).toDouble, s"doc $d bucket $b")
    assert(dense(1L) == dense(2L))
    intercept[IllegalArgumentException] {
      TextAnalysis.hashedTf(docs, "doc_id", "text", dim = 0)
    }
  }

  test("scoreLinear: manual logit; sparse path agrees exactly; collision guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "x y z"),
      (3L, "a a a a a a a a") // repeated token exercises the fold
    ).toDF("doc_id", "text")
    val dim = 16
    val wts = Array.tabulate(dim)(b => ((b * 37) % 101 - 50) / 256.0)
    val bias = 17.0 / 256.0
    def h60(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(17, 32), 16)
    }
    def logit(text: String): Double =
      bias + text.split(" ").map { t =>
        val h = h60(t)
        (if (h % 2 == 1) 1.0 else -1.0) * wts(((h >>> 1) % dim).toInt)
      }.sum
    val got = TextAnalysis.scoreLinear(docs, "text", wts, bias)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    for ((id, text) <- Seq(1L -> "a b a c", 2L -> "x y z", 3L -> "a a a a a a a a")) {
      val l = logit(text)
      assert(got(id) == ((l, l >= 0)), s"doc $id") // EXACT: 1/256-grid weights
    }
    // sparse (broadcast-table) path: bit-identical to the literal path
    val wdf = wts.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toSeq.toDF("bucket", "weight")
    val sparse = TextAnalysis.scoreLinearSparse(docs, "doc_id", "text", wdf, dim, bias)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(sparse == got)
    intercept[IllegalArgumentException] {
      TextAnalysis.scoreLinear(docs.withColumn("keep", lit(true)), "text", wts, bias)
    }
    // curate accepts the learned gate: equals hand-chained stages with the
    // same predicate
    val corpus = t(spark, sfTiny, "documents")
    val reference = corpus.filter(col("doc_id") % 7 === 0)
    val gate = TextAnalysis.linearLogit(col("text"), wts, bias) >= 0
    val shares = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val viaCurate = Pipeline
      .curate(corpus, "doc_id", "text", reference, "lang", shares, splits, gate, 0.8)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val manual = Scale.hashSplit(
      Scale.resampleToMix(
        Dedup.decontaminate(
          Pipeline.cleanCorpus(corpus, "doc_id", "text", gate, 0.8),
          reference, "text"),
        Seq("doc_id"), "lang", shares),
      Seq("doc_id"), splits)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaCurate == manual && viaCurate.nonEmpty)
  }

  test("audioFingerprint volume/tail invariant; audioFpDupes == brute force at threshold") {
    import spark.implicits._
    // 12 docs over 4 patterns; same-pattern variants differ in AMPLITUDE
    // and tail length — different bytes, same content head
    val docs = (0L until 12L).map(i => (i, i % 4)).toDF("doc_id", "pat")
    val withP = Multimodal.withSynthWavVariantPayload(docs, "doc_id", "pat")
    val fps = Multimodal.audioFingerprints(withP, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.size == 12)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val same = for (i <- 0L until 12L; j <- i + 1 until 12L if i % 4 == j % 4)
      yield ham(fps(i), fps(j))
    val cross = for (i <- 0L until 12L; j <- i + 1 until 12L if i % 4 != j % 4)
      yield ham(fps(i), fps(j))
    info(s"same-pattern hamming: ${same.sorted.mkString(",")}; cross min: ${cross.min}")
    assert(same.max <= 3, s"same pattern hamming up to ${same.max}")
    assert(cross.min > 10, s"cross pattern hamming down to ${cross.min}")
    val got = Multimodal.audioFpDupes(withP, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      i <- 0L until 12L; j <- i + 1 until 12L
      h = ham(fps(i), fps(j)) if h <= 3
    } yield (i, j, h.toLong)).toSet
    assert(got == want && got.nonEmpty)
    // corrupt and too-short payloads contribute nothing
    val withBad = withP.union(
      Seq(
        (98L, Array[Byte](1, 2, 3)),
        (99L, Multimodal.wavBytes(new Array[Short](100))) // < 2 windows
      ).toDF("doc_id", "payload")
    )
    assert(Multimodal.audioFingerprints(withBad, "doc_id").count() == 12)
  }

  test("videoDupes: same-pattern clips pair with full frame matches, cross never") {
    import spark.implicits._
    // 8 docs over 4 patterns; variants differ in frame SIZE and JPEG quality
    val docs = (0L until 8L).map(i => (i, i % 4)).toDF("doc_id", "pat")
    val withP = Multimodal.withSynthAviVariantPayload(docs, "doc_id", "pat")
    val out = Multimodal.videoDupes(withP, "doc_id", every = 2, maxHamming = 3, minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exactly the 4 same-pattern pairs; every sampled frame matches
    assert(out.map { case (a, b, _) => (a, b) } ==
      (0L until 4L).map(p => (p, p + 4)).toSet)
    out.foreach { case (a, _, n) =>
      val frames = 4 + (a % 4) % 3 // n frames for this pattern
      val sampled = (frames + 1) / 2 // every=2
      assert(n == sampled, s"pair of doc $a matched $n of $sampled sampled frames")
    }
    // frame-level hashes: same pattern+frame across variants agree closely
    val ph = Multimodal.videoPHashes(withP, "doc_id", every = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (p <- 0L until 4L; f <- 0 until 4)
      assert(ham(ph((p, f)), ph((p + 4, f))) <= 3, s"pattern $p frame $f")
    // corrupt payload: no rows, no pairs
    val bad = Seq((99L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")
    assert(Multimodal.videoPHashes(bad, "doc_id", 1).count() == 0)
    intercept[IllegalArgumentException] {
      Multimodal.videoDupes(withP, "doc_id", minMatches = 0)
    }
    // negative doc ids would mis-unpack (div truncates toward zero, pmod
    // wraps) — they raise instead of mis-attributing pairs
    val neg = Multimodal.withSynthAviVariantPayload(
      Seq((1L, 0L), (5L, 0L)).toDF("doc_id", "pat"), "doc_id", "pat"
    ).withColumn("doc_id", when($"doc_id" === 1L, -1L).otherwise($"doc_id"))
    val e = intercept[Exception] { Multimodal.videoDupes(neg, "doc_id").collect() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("negative doc id"), msgs)
  }

  test("fillBlockTexture == per-pixel reference loop (media payload refactor pin)") {
    // the r18 block-fill rewrite must keep every pixel identical to the
    // original per-pixel setRGB loop — identical pixels => identical JPEG
    // bytes => identical downstream hashes at every SF
    for (scale <- 1 to 3; seed <- Seq(0L, 2L, 7L)) {
      val w = 64 * scale; val h = 48 * scale
      def g(bx: Int, by: Int): Int =
        ((Multimodal.mix64(seed * 1000003L + bx * 7919L + by * 104729L) >>> 33) % 256).toInt
      val fast = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      Multimodal.fillBlockTexture(fast, w, h, scale, g)
      val ref = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val bx = (x / scale) / 4; val by = (y / scale) / 4
        val gv = g(bx, by)
        ref.setRGB(x, y, (gv << 16) | (gv << 8) | gv)
      }
      for (y <- 0 until h; x <- 0 until w)
        assert(fast.getRGB(x, y) == ref.getRGB(x, y), s"pixel ($x,$y) scale=$scale seed=$seed")
    }
  }

  test("slide: membership exact incl. boundaries; width < step leaves gaps") {
    import spark.implicits._
    val df = Seq((1L, 13L), (2L, 12L), (3L, 0L)).toDF("id", "ts")
    val out = TimeOps.slide(df, "ts", width = 10L, step = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // ts=13 in [4,14) [8,18) [12,22); ts=12 in [4,14) [8,18) [12,22); ts=0 in [-8,2) [-4,6) [0,10)
    assert(out == Set(
      (1L, 4L), (1L, 8L), (1L, 12L),
      (2L, 4L), (2L, 8L), (2L, 12L),
      (3L, -8L), (3L, -4L), (3L, 0L)
    ))
    // every emitted window really contains its ts; reconstruction is exact
    out.foreach { case (_, w) => assert(w <= 13 && w + 10 > 0) }
    // width < step: ts in a gap emits NO windows, ts in coverage emits one
    val gaps = TimeOps.slide(Seq((1L, 4L), (2L, 6L)).toDF("id", "ts"), "ts", 2L, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(gaps == Set((2L, 5L))) // [5,7) holds 6; nothing holds 4
    intercept[IllegalArgumentException] { TimeOps.slide(df, "ts", 0L, 4L) }
    // appended-column collisions refuse loudly instead of overwriting
    intercept[IllegalArgumentException] {
      TimeOps.slide(df.withColumn("window_start", lit(0L)), "ts", 10L, 4L)
    }
    intercept[IllegalArgumentException] {
      TimeOps.rollingByTime(
        df.withColumn("sum_win", lit(0.0)), "id", "ts", "sum_win", width = 10L
      )
    }
  }

  test("rankStats: percent_rank/cume_dist exact with ties; modeOf tie-breaks to largest") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 20.0), ("a", 4L, 30.0), ("a", 5L, 40.0),
      ("b", 6L, 7.0)
    ).toDF("k", "id", "v")
    val rs = Relational.rankStats(df, Seq("k"), "v").orderBy("id")
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4)))
    // group a (n=5): ranks 1,2,2,4,5 -> pr 0, .25, .25, .75, 1; cd 0.2, 0.6, 0.6, 0.8, 1
    assert(rs.take(5).toSeq == Seq(
      (1L, 0.0, 0.2), (2L, 0.25, 0.6), (3L, 0.25, 0.6), (4L, 0.75, 0.8), (5L, 1.0, 1.0)
    ))
    assert(rs(5) == ((6L, 0.0, 1.0))) // singleton: pr 0 (defined), cd 1
    val m = Relational.modeOf(
      Seq((1L, "x"), (1L, "x"), (1L, "y"), (1L, "y"), (2L, "z")).toDF("g", "v"),
      Seq("g"), "v"
    ).orderBy("g").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(m == Seq((1L, "y", 2L), (2L, "z", 1L))) // tie x/y at 2 -> largest wins
  }

  test("zscore: per-key stats exact; constant and singleton groups yield NULL z") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), // mean 2, std 1
      ("b", 4L, 5.0), ("b", 5L, 5.0), // constant group: std 0 -> NULL z
      ("c", 6L, 9.0) // singleton: stddev_samp NULL -> NULL z
    ).toDF("k", "id", "v")
    val out = Relational.zscore(df, Seq("k"), "v").orderBy("id").collect()
    assert(out.map(r => r.getAs[Double]("mean_v")).take(3).forall(_ == 2.0))
    assert(math.abs(out(0).getAs[Double]("z") - (-1.0)) < 1e-12)
    assert(math.abs(out(2).getAs[Double]("z") - 1.0) < 1e-12)
    assert(out(3).isNullAt(out(3).fieldIndex("z")) && out(4).isNullAt(out(4).fieldIndex("z")))
    assert(out(5).isNullAt(out(5).fieldIndex("z")))
  }

  test("estimatedJaccard agrees with signatures; identical docs estimate 1.0") {
    import spark.implicits._
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (1L, base), (2L, base), // identical: every band collides, est 1.0
      (3L, base + " x1 x2 x3"), // near-dup of 1/2
      (4L, "z1 z2 z3 z4 z5 z6") // disjoint: no candidate pair with others
    ).toDF("doc_id", "text")
    val est = Dedup.estimatedJaccard(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(est((1L, 2L)) == 1.0)
    assert(est.keySet.forall { case (a, b) => a < b && b != 4L && a != 4L })
    // every estimate is an exact multiple of 1/8 in [0,1] and matches a
    // manual recount over the minhashSignatures output
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    est.foreach { case ((a, b), e) =>
      val manual = sig(a).zip(sig(b)).count { case (x, y) => x == y } / 8.0
      assert(e == manual, s"pair ($a,$b): $e vs $manual")
      assert(e >= 0.0 && e <= 1.0 && (e * 8) == (e * 8).round)
    }
  }

  test("pageRank matches a local reference; mass conserved; dangling + parallel edges") {
    import spark.implicits._
    // 1 -> 2 (twice: parallel edges), 1 -> 3, 2 -> 1; 3 is dangling
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 4, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // local dense reference on the same multigraph
    val es = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L))
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val deg = es.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 4) {
      val contrib = es.groupBy(_._2).view.mapValues(
        _.map(e => r(e._1) / deg(e._1)).sum).toMap
      val dm = nodes.filterNot(deg.contains).map(r).sum
      r = nodes.map(v => v -> ((1.0 - 0.85) / n + 0.85 * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    assert(got.keySet == nodes.toSet)
    nodes.foreach(v => assert(math.abs(got(v) - r(v)) < 1e-12, s"node $v: ${got(v)} vs ${r(v)}"))
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // dangling redistribution conserves mass
    // parallel edges matter: without the duplicate 1->2, node 2 ranks lower
    val single = Graph.pageRank(Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst"),
      "src", "dst", iters = 4, damping = 0.85)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    assert(single(2L) < got(2L))
    intercept[IllegalArgumentException] { Graph.pageRank(edges, "src", "dst", iters = 0) }
    intercept[IllegalArgumentException] { Graph.pageRank(edges, "src", "dst", damping = 1.0) }
  }

  test("invertedIndex: df/cf exact, postings ranked (tf DESC, id ASC), k-bounded") {
    import spark.implicits._
    val docs = Seq(
      (10L, "a a a b"),
      (11L, "a a b b"),
      (12L, "a b c"),
      (13L, "a z")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "doc_id", "text", k = 2)
      .orderBy("token", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(out == Seq(
      ("a", 4L, 7L, 1L, 10L, 3L), // tf 3 beats tf 2
      ("a", 4L, 7L, 2L, 11L, 2L), // tf tie (11 vs 12,13): lowest id wins rank 2
      ("b", 3L, 4L, 1L, 11L, 2L),
      ("b", 3L, 4L, 2L, 10L, 1L), // tf tie at 1: id 10 < 12
      ("c", 1L, 1L, 1L, 12L, 1L),
      ("z", 1L, 1L, 1L, 13L, 1L)
    )) // k=2 bound: token 'a' (df 4) and 'b' (df 3) emit exactly 2 postings
    intercept[IllegalArgumentException] {
      TextAnalysis.invertedIndex(docs, "doc_id", "text", k = 0)
    }
  }

  test("bm25TopK matches a local reference; ties break to smallest id; k bound; partition-invariant") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b"), (2L, "a a b"), (3L, "b c"), (4L, "c"),
      (5L, "q q"), (6L, "q q") // identical docs: exact score tie on query 'q'
    )
    val docs = corpus.toDF("doc_id", "text")
    val qs = Seq((100L, "a c a"), (101L, "q"), (102L, "nohit")).toDF("qid", "qtext")
    val got = TextAnalysis.bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext", 3)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap

    // local reference over the same corpus (query terms DEDUPLICATED)
    val (k1, b) = (1.2, 0.75)
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    def score(qterms: Seq[String], d: Long): Double = {
      val c = qterms.distinct.flatMap { t =>
        val tf = toks(d).count(_ == t).toDouble
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          val raw = idf * (tf * (k1 + 1.0)) /
            (tf + k1 * (1.0 - b + b * toks(d).size / avgdl))
          Some(BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        }
      }.sum
      BigDecimal(c.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // query 100 ('a c', deduped): docs 1..4 all match some term
    val exp100 = Seq(1L, 2L, 3L, 4L).map(d => d -> score(Seq("a", "c"), d))
      .sortBy { case (d, s) => (-s, d) }.take(3)
    exp100.zipWithIndex.foreach { case ((d, s), i) =>
      assert(got((100L, i + 1)) == ((d, s)), s"q100 rk ${i + 1}")
    }
    // query 101: docs 5 and 6 are byte-identical -> exact score tie,
    // smaller id takes rank 1
    assert(got((101L, 1))._1 == 5L && got((101L, 2))._1 == 6L)
    assert(got((101L, 1))._2 == got((101L, 2))._2)
    // query 102 matches nothing -> absent entirely; k=3 bound held for q100
    assert(!got.keySet.exists(_._1 == 102L))
    assert(got.keySet.count(_._1 == 100L) == 3)

    // decimal-summed contributions: identical at any parallelism
    val gotPar = TextAnalysis
      .bm25TopK(docs.repartition(7), qs.repartition(3), "doc_id", "text", "qid", "qtext", 3)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(gotPar == got)

    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext", 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext", 3, b = 1.5)
    }
  }

  test("canonicalUrl collapses case/www/default-port/tracking/fragment noise") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://WWW.Site.Example.COM:443/Docs//a/7/?utm_source=x&b=2&a=1#frag",
      "https://site.example.com/Docs/a/7?a=1&b=2",
      "http://site.example.com:80/Docs/a/7?a=1&b=2", // http != https: distinct
      "https://site.example.com/Docs/A/7?a=1&b=2", // path case-SENSITIVE: distinct
      "https://site.example.com:8443/x?fbclid=1&gclid=2&utm_medium=m", // odd port kept
      "not a url at all"
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val out = urls
      .select(col("id"), TextAnalysis.canonicalUrl(col("url")).as("c"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out(0) == "https://site.example.com/Docs/a/7?a=1&b=2")
    assert(out(1) == out(0)) // the two https variants collapse
    assert(out(2) == "http://site.example.com/Docs/a/7?a=1&b=2")
    assert(out(2) != out(0))
    assert(out(3) == "https://site.example.com/Docs/A/7?a=1&b=2")
    assert(out(4) == "https://site.example.com:8443/x") // all params were tracking
    assert(out(5) == "://") // non-URL degrades, never throws
    // idempotence: canonicalizing an already-canonical URL is a no-op
    // (generated noisy URLs over schemes/hosts/ports/params/fragments)
    import spark.implicits._
    val gen = (0 until 200).map { i =>
      val scheme = Seq("http", "HTTPS", "https", "HTTP")(i % 4)
      val www = if (i % 3 == 0) "WWW." else ""
      val port = Seq("", ":80", ":443", ":8080")(i % 4)
      val path = Seq("/a/b/", "//x", "/P/Q", "")(i % 4)
      val q = Seq("", "?b=2&a=1", "?utm_source=x", "?z=9&utm_medium=m&y=8")(i % 4)
      val frag = if (i % 5 == 0) "#f" else ""
      (i.toLong, s"$scheme://${www}Host$i.Example.COM$port$path$q$frag")
    }.toDF("id", "url")
    val twice = gen
      .select(col("id"), TextAnalysis.canonicalUrl(col("url")).as("c1"))
      .select(col("id"), col("c1"), TextAnalysis.canonicalUrl(col("c1")).as("c2"))
      .collect()
    twice.foreach(r => assert(r.getString(1) == r.getString(2), s"not idempotent: ${r.getString(1)}"))
  }

  test("rollingByTime RANGE frames: irregular spacing, ts peers, exact decimal sum") {
    import spark.implicits._
    // key 1: ts 0, 50, 110 (110 sees only 50+110 under width 60); ts peers at 200
    val ev = Seq(
      (1L, 0L, 1.25), (2L, 50L, 2.50), (3L, 110L, 4.00),
      (4L, 200L, 1.00), (5L, 200L, 3.00), // peers: each sees both
      (6L, 1000L, 9.99)
    ).map { case (id, ts, v) => (id, 7L, ts, v) }.toDF("event_id", "user_id", "ts", "value")
    val out = TimeOps.rollingByTime(ev, "user_id", "ts", "value", width = 60L)
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toSeq
    assert(out == Seq(
      (1L, 1L, 1.25, 1.25, 1.25),
      (2L, 2L, 3.75, 1.25, 2.50), // [0,50] in range (endpoints inclusive)
      (3L, 2L, 6.50, 2.50, 4.00), // 0 aged out: [50,110]
      (4L, 2L, 4.00, 1.00, 3.00), // peer row included both ways
      (5L, 2L, 4.00, 1.00, 3.00),
      (6L, 1L, 9.99, 9.99, 9.99)
    ))
    intercept[IllegalArgumentException] {
      TimeOps.rollingByTime(ev, "user_id", "ts", "value", width = 0L)
    }
  }

  test("ivfTopKAuto == manual kmeansFit + ivfTopK at the derived sqrt(N) cell count") {
    val e = t(spark, sfTiny, "embeddings")
    val n = e.count()
    val nCells = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong).toInt
    assert(nCells > 1, "fixture should derive a multi-cell index")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "sim", "rn").orderBy("qid", "rn").collect().toSeq
    // iters > 0: composition with an explicit kmeansFit (deterministic at
    // any partition count, so byte-equality is the right assertion)
    val cen = Similarity
      .kmeansFit(e, "vec_id", "embedding", nCells, iters = 2)
      .select(col("cen_id").as("vec_id"), col("cen_v").as("embedding"))
    assert(
      rows(Similarity.ivfTopKAuto(e, "vec_id", "embedding", 5, iters = 2)) ==
        rows(Similarity.ivfTopK(e, cen, "vec_id", "embedding", 5))
    )
    // iters = 0: centroids are the first-sqrt(N)-ids' vectors verbatim
    val seeds = Similarity
      .kmeansFit(e, "vec_id", "embedding", nCells, iters = 0)
      .select(col("cen_id").as("vec_id"), col("cen_v").as("embedding"))
    assert(
      rows(Similarity.ivfTopKAuto(e, "vec_id", "embedding", 5, iters = 0)) ==
        rows(Similarity.ivfTopK(e, seeds, "vec_id", "embedding", 5))
    )
    intercept[IllegalArgumentException] {
      Similarity.ivfTopKAuto(e.filter(lit(false)), "vec_id", "embedding", 5)
    }
  }

  test("pqFit: iters=0 seeds are the first-nCen ids' subvectors; Lloyd means are exact") {
    import spark.implicits._
    val e = t(spark, sfTiny, "embeddings")
    val m0 = Similarity.pqFit(e, "vec_id", "embedding", dim = 64, m = 8, nCen = 4, iters = 0)
    assert(m0.m == 8 && m0.nCen == 4 && m0.dim == 64)
    val firstFour = e.orderBy("vec_id").limit(4).collect().map(_.getSeq[Float](1))
    (0 until 8).foreach { j =>
      (0 until 4).foreach { c =>
        assert(m0.codebook(j)(c) == firstFour(c).slice(j * 8, (j + 1) * 8), s"seed j=$j c=$c")
      }
    }
    // one Lloyd round on a hand dataset: m=1 (whole vector), nCen=2, seeds
    // are rows 0/1; all four rows assign by L2 and the new centroids are
    // the elementwise means of their members
    val tiny = Seq(
      (0L, Array(0f, 0f)),
      (1L, Array(10f, 10f)),
      (2L, Array(2f, 0f)), // -> c0
      (3L, Array(10f, 8f)) // -> c1
    ).toDF("id", "v")
    val m1 = Similarity.pqFit(tiny, "id", "v", dim = 2, m = 1, nCen = 2, iters = 1)
    assert(m1.codebook(0)(0) == Seq(1f, 0f)) // mean of (0,0),(2,0)
    assert(m1.codebook(0)(1) == Seq(10f, 9f)) // mean of (10,10),(10,8)
    intercept[IllegalArgumentException] {
      Similarity.pqFit(e, "vec_id", "embedding", dim = 64, m = 7, nCen = 4, iters = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.pqFit(tiny, "id", "v", dim = 2, m = 1, nCen = 10, iters = 0)
    }
  }

  test("pqEncode carries codes + reconstruction norm; pqTopK rerank>=cells == ivfTopK") {
    val e = t(spark, sfTiny, "embeddings")
    val model = Similarity.pqFit(e, "vec_id", "embedding", dim = 64, m = 8, nCen = 16, iters = 0)
    val enc = Similarity.pqEncode(e, "vec_id", "embedding", model)
    assert(enc.columns.toSeq == Seq("vec_id", "pq_codes", "pq_norm"))
    val sample = enc
      .select(
        col("pq_codes"),
        col("pq_norm"),
        sqrt(
          Similarity.dotD(
            graft.functions.PqFunctions.pqDecode(col("pq_codes"), model.codebook),
            graft.functions.PqFunctions.pqDecode(col("pq_codes"), model.codebook)
          )
        ).as("n2")
      )
      .collect()
    sample.foreach { r =>
      assert(r.getSeq[Int](0).length == 8)
      assert(r.getDouble(1) == r.getDouble(2))
    }
    // with rerank >= the whole corpus every ADC candidate is exactly
    // re-scored, so the result equals the unquantized ivfTopK at the same
    // centroids
    val n = e.count()
    val nCells = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong).toInt
    val cen = Similarity
      .kmeansFit(e, "vec_id", "embedding", nCells, iters = 0)
      .select(col("cen_id").as("vec_id"), col("cen_v").as("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "sim", "rn").orderBy("qid", "rn").collect().toSeq
    assert(
      rows(Similarity.pqTopK(e, cen, "vec_id", "embedding", 5, model, rerank = n.toInt)) ==
        rows(Similarity.ivfTopK(e, cen, "vec_id", "embedding", 5))
    )
    // rerank=0 (pure ADC) is deterministic and distinct from the exact
    // ranking only through quantization: every returned pair shares the
    // query's cell, rn runs 1..k
    val adc = Similarity.pqTopK(e, cen, "vec_id", "embedding", 3, model)
    val byQ = adc.groupBy("qid").agg(count(lit(1)).as("c"), max("rn").as("mx")).collect()
    byQ.foreach(r => assert(r.getLong(1) <= 3 && r.getInt(2) <= 3))
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(e, cen, "vec_id", "embedding", 5, model, rerank = 3)
    }
    // the auto convenience == the manual composition at the derived cells
    def rows3(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "sim", "rn").orderBy("qid", "rn").collect().toSeq
    assert(
      rows3(Similarity.pqTopKAuto(e, "vec_id", "embedding", dim = 64, k = 3)) ==
        rows3(Similarity.pqTopK(e, cen, "vec_id", "embedding", 3, model))
    )
    // nProbe=2 exercises the dedup + non-cell-local ranking branch; full
    // rerank again equals the unquantized index at the same probes
    assert(
      rows3(Similarity.pqTopK(e, cen, "vec_id", "embedding", 5, model, nProbe = 2, rerank = n.toInt)) ==
        rows3(Similarity.ivfTopK(e, cen, "vec_id", "embedding", 5, nProbe = 2))
    )
    intercept[IllegalArgumentException] {
      Similarity.pqTopKAuto(e.filter(lit(false)), "vec_id", "embedding", 64, 3)
    }
  }

  test("semDedup: same-direction vectors drop d2-side; distinct and zero vectors survive") {
    import spark.implicits._
    // n=6 -> floor(sqrt(6))=2 cells seeded by ids 0 and 1 (iters=0):
    // cell 0 ~ x-axis, cell 1 ~ y-axis
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f)), // same direction as 0 -> cos 1.0, drops
      (3L, Array(0.0f, 3.0f, 0.0f)), // same direction as 1 -> drops
      (4L, Array(0.9f, 0.1f, 0.0f)), // cell 0, cos(v0,v4)=0.9939 < 0.999 -> survives
      (5L, Array(0.0f, 0.0f, 0.0f)) // zero norm: no cell, always survives
    ).toDF("vec_id", "v")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ids(Similarity.semDedup(vecs, "vec_id", "v", 0.999)) == Seq(0L, 1L, 4L, 5L))
    // at 0.99 the 0.9939 pair is a duplicate too -> 4 drops as the larger id
    assert(ids(Similarity.semDedup(vecs, "vec_id", "v", 0.99)) == Seq(0L, 1L, 5L))
    intercept[IllegalArgumentException] {
      Similarity.semDedup(vecs, "vec_id", "v", 1.5)
    }
  }

  test("hardNegatives: different-label only; filter inside the cell join, not after ranking") {
    import spark.implicits._
    val e = t(spark, sfTiny, "embeddings")
    val out = Similarity.hardNegatives(e, "vec_id", "embedding", "label", 3)
    val labels = e.select(col("vec_id"), col("label"))
    // every returned pair crosses labels
    val crossed = out
      .join(labels.withColumnRenamed("vec_id", "qid").withColumnRenamed("label", "ql"), Seq("qid"))
      .join(labels.withColumnRenamed("vec_id", "cid").withColumnRenamed("label", "cl"), Seq("cid"))
    assert(crossed.filter(col("ql") === col("cl")).count() == 0)
    assert(out.filter(col("rn") > 3).count() == 0 && out.count() > 0)
    // the filter runs INSIDE the join: an anchor whose top-3 same-cell
    // neighbors share its label still gets 3 negatives (post-rank
    // filtering would return fewer). Verify against a per-cell brute
    // force: for each qid the result equals ranking ALL different-label
    // same-cell candidates.
    val hand = Seq(
      // one cell (identical direction, varying magnitude); labels: anchor
      // 0's nearest neighbors 1,2 share its label — 3,4,5 must surface
      (0L, Array.fill(4)(1.0f), 0),
      (1L, Array.fill(4)(1.01f), 0),
      (2L, Array.fill(4)(0.99f), 0),
      (3L, Array.fill(4)(1.02f), 1),
      (4L, Array.fill(4)(0.98f), 1),
      (5L, Array.fill(4)(1.03f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity
      .hardNegatives(hand, "vec_id", "embedding", "label", 3)
      .filter(col("qid") === 0L)
      .orderBy("rn")
      .collect()
      .map(r => r.getLong(1))
      .toSeq
    // all six share one direction → sim 1.0 everywhere → tie-break on cid
    assert(got == Seq(3L, 4L, 5L))
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(hand.filter(col("label").isNull), "vec_id", "embedding", "label", 3)
    }
  }

  test("recallAtK: exact-vs-approx intersection per query; self-recall is 1; shortfall not punished") {
    import spark.implicits._
    val approx = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // 2 of 3 right
      (2L, 20L, 1), (2L, 99L, 2), (2L, 98L, 3), // 1 of 3
      (3L, 30L, 1) // query with only one exact neighbor: full recall
    ).toDF("qid", "cid", "rn")
    val exact = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 13L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1),
      (4L, 40L, 1) // query the index missed entirely -> recall 0
    ).toDF("qid", "cid", "rn")
    val got = Similarity
      .recallAtK(approx, exact, 3)
      .orderBy("qid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (1L, 2L, 3L, 0.666667),
      (2L, 1L, 3L, 0.333333),
      (3L, 1L, 1L, 1.0),
      (4L, 0L, 1L, 0.0)
    ))
    // an index audited against itself scores 1.0 everywhere
    val e = t(spark, sfTiny, "embeddings")
    val ivf = Similarity.ivfTopKAuto(e, "vec_id", "embedding", 5, iters = 0)
    val self = Similarity.recallAtK(ivf, ivf, 5)
    assert(self.filter(col("recall") =!= 1.0).count() == 0 && self.count() > 0)
    intercept[IllegalArgumentException](Similarity.recallAtK(approx, exact, 0))
  }

  test("approxDistinct: partition-invariant HLL counts; audit bound holds") {
    import spark.implicits._
    val df = (0 until 5000)
      .map(i => (s"src${i % 3}", s"text-${i % 700}"))
      .toDF("source", "text")
    val a = Relational
      .approxDistinct(df, Seq("source"), "text")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // deterministic at any partitioning (HLL registers are hash maxima)
    val b = Relational
      .approxDistinct(df.repartition(17), Seq("source"), "text")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(a == b)
    // within the ±4σ band of the exact counts
    val audit = Relational.approxDistinctAudit(df, Seq("source"), "text").collect()
    assert(audit.length == 3)
    audit.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: approx outside bound (exact ${r.getLong(1)})")
    }
  }

  test("heavyHitters: exact vs plain GROUP BY at any partitioning; MG superset guarantee; nulls skipped") {
    import spark.implicits._
    // Zipf-ish stream: value v%m appears with frequency ~ 1/(1+v), plus a
    // planted dominator and nulls (which must not count toward N)
    val raw = (0 until 20000).map { i =>
      val v = i % 20
      if (i % 37 == 0) null
      else if (v < 2) "hot" + v // 2 dominators at ~5% each
      else if (v < 4) "hotC" // one at ~10%
      else "cold" + (i % 1500) // long tail, far under threshold
    }
    val df = raw.toDF("v")
    val phi = 0.02
    val n = raw.count(_ != null).toLong
    // exact reference: plain groupBy-having (the thing the operator avoids at scale)
    val expected = raw.filter(_ != null).groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c > phi * n }.toMap
    assert(expected.nonEmpty && expected.size <= 5) // the test is non-trivial
    for (parts <- Seq(1, 7, 32)) {
      val got = Relational.heavyHitters(df.repartition(parts), "v", phi)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts: $got vs $expected")
    }
    // MG superset guarantee directly, with cap far below the domain size:
    // every value with freq > N/(cap+1) must appear among the candidates
    for (parts <- Seq(1, 13)) {
      val cap = 25
      val cands = df.repartition(parts)
        .agg(graft.functions.MgAggFunctions.mgSummary(col("v"), cap))
        .collect()(0).getAs[collection.Seq[org.apache.spark.sql.Row]](0)
        .map(_.getString(0)).toSet
      assert(cands.size <= cap)
      val must = raw.filter(_ != null).groupBy(identity)
        .collect { case (k, vs) if vs.size > n.toDouble / (cap + 1) => k }.toSet
      assert(must.subsetOf(cands), s"parts=$parts missing ${must -- cands}")
    }
    // cache=true (the non-deterministic-input escape hatch): same exact
    // result, materialized from one persisted snapshot
    val gotCached = Relational.heavyHitters(df.repartition(7), "v", phi, cache = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCached == expected, s"cache=true: $gotCached vs $expected")
    // boundary is strict: a value at EXACTLY phi*N is not a heavy hitter
    val even = (0 until 100).flatMap(i => Seq("a", "b")).toDF("v") // each exactly half
    assert(Relational.heavyHitters(even, "v", 0.5).collect().isEmpty)
    // empty input and out-of-range phi
    assert(Relational.heavyHitters(df.filter(lit(false)), "v", 0.1).collect().isEmpty)
    intercept[IllegalArgumentException] { Relational.heavyHitters(df, "v", 0.0) }
    intercept[IllegalArgumentException] { Relational.heavyHitters(df, "v", 1.0) }
  }

  test("decontaminateNearDup: paraphrased eval docs drop; unrelated and shingle-less survive") {
    import spark.implicits._
    val w = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (0L, w), // near-dup of the reference (reference = w + extra words)
      (1L, w), // exact text dup of 0 — same signatures, drops too
      (2L, (100 to 129).map(i => s"v$i").mkString(" ")), // unrelated
      (3L, "too few"), // < 3 words: no shingles, can never match
      (4L, (1 to 15).map(i => s"w$i").mkString(" ") + " " +
        (200 to 214).map(i => s"u$i").mkString(" ")) // half-overlap
    ).toDF("doc_id", "text")
    val reference = Seq((100L, w + " zz1 zz2")).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val kept = ids(Dedup.decontaminateNearDup(corpus, reference, "doc_id", "text"))
    assert(!kept.contains(0L) && !kept.contains(1L), s"near-dups must drop: $kept")
    assert(kept.contains(2L) && kept.contains(3L), s"unrelated/shingle-less must survive: $kept")
    // threshold 0 keeps only docs with NO band collision at all;
    // threshold 1 requires ALL signature components to agree
    val strict = ids(
      Dedup.decontaminateNearDup(corpus, reference, "doc_id", "text", minEstJaccard = 1.0)
    )
    assert(strict.contains(2L) && strict.contains(3L))
    // broadcast and shuffled reference paths agree
    assert(kept == ids(
      Dedup.decontaminateNearDup(corpus, reference, "doc_id", "text", broadcastReference = false)
    ))
    intercept[IllegalArgumentException] {
      Dedup.decontaminateNearDup(corpus, reference, "doc_id", "text", minEstJaccard = 1.5)
    }
    intercept[IllegalArgumentException] {
      Dedup.decontaminateNearDup(corpus, reference, "doc_id", "text", bands = 0)
    }
  }

  test("scrubDuplicatedSpans: shared spans cut everywhere but the first carrier") {
    import spark.implicits._
    val span = "a b c d e f g h" // the duplicated 8-gram
    val docs = Seq(
      (0L, span + " x y"), // first carrier — keeps everything
      (1L, "z1 z2 " + span), // loses the span tail -> "z1 z2"
      (2L, (1 to 9).map(i => s"u$i").mkString(" ")), // unique -> untouched
      (3L, "s1 s2"), // shorter than a span -> untouched
      (4L, span + " x y") // exact copy of 0: ALL its grams are doc-0-first -> ''
    ).toDF("doc_id", "text")
    val out = Dedup
      .scrubDuplicatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    assert(out(0L) == (span + " x y", 0), s"first carrier must keep: ${out(0L)}")
    assert(out(1L) == ("z1 z2", 8), s"span tail must drop: ${out(1L)}")
    assert(out(2L)._2 == 0 && out(3L)._2 == 0)
    assert(out(4L) == ("", 10), s"full duplicate scrubs to empty: ${out(4L)}")
    intercept[IllegalArgumentException] {
      Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", n = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", minDocs = 1)
    }
  }

  test("minhash family regression: one shared shingle must not collapse signatures") {
    import spark.implicits._
    // The round-13 degenerate-family bug, pinned at unit speed (the 2M-doc
    // incr-planted gate caught it; this keeps it from ever reappearing):
    // two docs sharing exactly ONE shingle used to get FULLY IDENTICAL
    // signatures whenever that shingle's hash was small (h=0 was a fixed
    // point of every permutation; multipliers 7..919 never wrapped small
    // h). With the fixed family a shared shingle may win SOME component
    // minima but not all — full equality for unrelated docs is ~1e-16.
    val shared = "q1 q2 q3" // one 3-gram both docs contain
    val a = (shared + " " + (1 to 20).map(i => s"a$i").mkString(" "))
    val b = (shared + " " + (1 to 20).map(i => s"b$i").mkString(" "))
    val sig = Dedup
      .minhashSignatures(Seq((0L, a), (1L, b)).toDF("doc_id", "text"), "doc_id", "text", 8)
      .orderBy("doc_id")
      .collect()
      .map(r => (0 until 8).map(i => r.getLong(i + 1)))
    assert(sig(0) != sig(1), s"unrelated docs with one shared shingle collapsed: ${sig(0)}")
    // family invariants the fix relies on: multipliers large and mixed
    // (small multipliers never wrap small h), hash domain [1, p-1]
    // (0 is the affine fixed point; >= p aliases)
    (0 until Dedup.MinhashMaxK).foreach { i =>
      assert(Dedup.minhashA(i) > Dedup.MinhashAFloor, s"multiplier a($i)=${Dedup.minhashA(i)} too small")
      assert(Dedup.minhashA(i) < Dedup.MinhashP2)
    }
    val hs = Dedup
      .shingleRows(Seq((0L, a)).toDF("doc_id", "text"), "doc_id", "text", 3)
      .select((Dedup.tokenHash60(col("s")) % Dedup.MinhashHashMod + 1).as("h"))
      .collect()
      .map(_.getLong(0))
    assert(hs.forall(h => h >= 1 && h < Dedup.MinhashP2), s"hash domain violated: ${hs.min}..${hs.max}")
  }

  test("signature index persisted as bucketed band rows: batch join reshuffles ONLY the batch") {
    import spark.implicits._
    // The 100 TB cost center of incrementalNearDup is re-shuffling the
    // INDEX band rows for every daily batch. Persisting the index as
    // band rows BUCKETED by the bucket key makes the scan itself
    // hash-partitioned on exactly the join keys (bucket columns must
    // EQUAL the join keys — a bh-only bucketing cannot co-partition
    // with a (band, bh) shuffle on the other side), so only the small
    // batch side exchanges — the storage pattern the operator's
    // scaladoc prescribes for production.
    def bandRows(sig: org.apache.spark.sql.DataFrame) = sig.select(
      col("doc_id"),
      explode(array((0 until 4).map { b =>
        struct(
          lit(b).as("band"),
          (col(s"m${2 * b}") * 100000L + col(s"m${2 * b + 1}")).as("bh")
        )
      }: _*)).as("p")
    ).select(col("doc_id"), col("p.band").as("band"), col("p.bh").as("bh"))
    val mk = (tag: String, i: Int) => (1 to 30).map(j => s"$tag${i}w$j").mkString(" ")
    val hist = (0 until 50).map(i => (i.toLong, mk("h", i))).toDF("doc_id", "text")
    val batch = (100 until 110).map(i => (i.toLong, mk("h", i % 5))).toDF("doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS sig_band_idx")
    bandRows(Dedup.minhashSignatures(hist, "doc_id", "text", 8)).write
      .bucketBy(8, "band", "bh")
      .sortBy("band", "bh")
      .saveAsTable("sig_band_idx")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ: prove bucketing, not broadcast
      val idx = spark.table("sig_band_idx")
      val joined = bandRows(Dedup.minhashSignatures(batch, "doc_id", "text", 8))
        .withColumnRenamed("doc_id", "bid")
        .join(idx, Seq("band", "bh"))
      assert(joined.count() > 0, "planted exact copies must band-collide")
      val plan = joined.queryExecution.executedPlan.toString
      // count only planner-inserted join shuffles: minhashSignatures'
      // own spread() repartition (REPARTITION_BY_NUM) is deliberate
      val shuffles = "ENSURE_REQUIREMENTS".r.findAllIn(plan).length
      assert(plan.contains("Bucketed: true"), s"index scan must be bucketed:\n$plan")
      assert(shuffles == 1, s"expected ONE join shuffle (batch side only), got $shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS sig_band_idx")
    }
  }

  test("scrubDuplicatedSpans: ScalaCheck parity vs an independent local reference") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // independent reference: same contract, straight Scala — no shared
    // hashing, banding or join machinery with the engine
    def refScrub(docs: Seq[(Long, String)], n: Int, minDocs: Int): Map[Long, (String, Int)] = {
      val grams = docs.flatMap { case (id, t) =>
        val tk = t.split(" ")
        if (tk.length < n) Seq.empty
        else (0 to tk.length - n).map(i => (id, i, tk.slice(i, i + n).mkString(" ")))
      }
      val firstDoc = grams
        .groupBy(_._3)
        .collect { case (g, os) if os.map(_._1).distinct.size >= minDocs => g -> os.map(_._1).min }
      val marked = grams
        .filter { case (id, _, g) => firstDoc.get(g).exists(_ != id) }
        .flatMap { case (id, i, _) => (i until i + n).map(p => (id, p)) }
        .groupBy(_._1)
        .map { case (id, ps) => id -> ps.map(_._2).toSet }
      docs.map { case (id, t) =>
        val tk = t.split(" ")
        val m = marked.getOrElse(id, Set.empty[Int])
        val kept = tk.zipWithIndex.collect { case (w, i) if !m(i) => w }
        id -> ((kept.mkString(" "), tk.length - kept.length))
      }.toMap
    }
    // 3-word vocabulary maximizes shared 3-grams and overlapping spans
    val genDoc = for {
      n <- Gen.choose(0, 14)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" ")
    val genCase = for {
      nd <- Gen.choose(4, 9)
      ds <- Gen.listOfN(nd, genDoc)
    } yield ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val prop = Prop.forAll(genCase) { docs =>
      val got = Dedup
        .scrubDuplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n = 3, minDocs = 2)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
        .toMap
      got == refScrub(docs, 3, 2)
    }
    // each case is a full Spark job — 20 random corpora, not 300
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("incrementalNearDup: index hits and within-batch d2 drop; index update closes the loop") {
    import spark.implicits._
    val w = (1 to 30).map(i => s"w$i").mkString(" ")
    val v = (100 to 129).map(i => s"v$i").mkString(" ")
    val history = Seq((0L, w)).toDF("doc_id", "text")
    val index = Dedup.minhashSignatures(history, "doc_id", "text", 8)
    val batch = Seq(
      (10L, w + " zz1 zz2"), // near-dup of indexed doc 0 — index hit
      (11L, v), // novel — survives
      (12L, v), // exact dup of 11 within the batch — d2 of the pair, drops
      (13L, "too few") // shingle-less: no signature, always survives
    ).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val survivors = Dedup.incrementalNearDup(batch, index, "doc_id", "text")
    assert(ids(survivors) == Seq(11L, 13L))
    // closing the loop: appending survivor signatures makes batch-2 near-dups
    // of batch-1 survivors die against the UPDATED index
    val index2 = index.union(Dedup.minhashSignatures(survivors, "doc_id", "text", 8))
    val batch2 = Seq((20L, v + " zz3 zz4"), (21L, "fresh unrelated " + (1 to 28).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(ids(Dedup.incrementalNearDup(batch2, index2, "doc_id", "text")) == Seq(21L))
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDup(batch, index, "doc_id", "text", minEstJaccard = -0.1)
    }
    // an index built at a different k refuses loudly
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDup(
        batch,
        Dedup.minhashSignatures(history, "doc_id", "text", 4),
        "doc_id",
        "text"
      )
    }
    // the drop ledger: reason + smallest qualifying partner per drop, and
    // survivors == batch minus the ledger's distinct ids
    val ledger = Dedup
      .incrementalNearDupAudit(batch, index, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(ledger == Set((10L, "index", 0L), (12L, "batch", 11L)), s"ledger: $ledger")
    assert(ids(survivors) == Seq(11L, 13L))
  }

  test("incrementalNearDup: signature family is versioned — stale or unversioned index refuses loudly") {
    import spark.implicits._
    val w = (1 to 30).map(i => s"w$i").mkString(" ")
    val history = Seq((0L, w)).toDF("doc_id", "text")
    val batch = Seq((10L, w + " zz1")).toDF("doc_id", "text")
    val index = Dedup.minhashSignatures(history, "doc_id", "text", 8)
    // the stamp rides the schema as column metadata (and survives a
    // parquet round-trip — Spark persists field metadata in the footer)
    val dir = java.nio.file.Files.createTempDirectory("sigfam").toString
    index.write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    (0 until 8).foreach { i =>
      assert(
        reread.schema(s"m$i").metadata.getLong(Dedup.MinhashFamilyKey) ==
          Dedup.MinhashFamilyVersion
      )
    }
    assert(Dedup.incrementalNearDup(batch, reread, "doc_id", "text").count() == 0)
    // an UNVERSIONED index (hand-built, or persisted under a pre-stamp
    // engine) must fail loudly, not silently estimate ~0 Jaccard
    val stripped = reread.select(
      col("doc_id") +: (0 until 8).map(i => col(s"m$i").as(s"m$i")): _*
    )
    val unversioned = spark.createDataFrame(stripped.rdd, org.apache.spark.sql.types.StructType(
      stripped.schema.fields.map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty))
    ))
    val e1 = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDup(batch, unversioned, "doc_id", "text")
    }
    assert(e1.getMessage.contains("rebuild"), e1.getMessage)
    // a STALE family stamp fails with the same loud migration message
    val staleMd = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(Dedup.MinhashFamilyKey, 1L).build()
    val stale = reread.select(
      col("doc_id") +: (0 until 8).map(i => col(s"m$i").as(s"m$i", staleMd)): _*
    )
    val e2 = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDupAudit(batch, stale, "doc_id", "text")
    }
    assert(e2.getMessage.contains("family 1") && e2.getMessage.contains("rebuild"), e2.getMessage)
  }

  test("decontaminateFuzzy: Levenshtein band catches drifted grams; maxDist=0 == exact") {
    import spark.implicits._
    val g = (1 to 5).map(i => s"tok$i").mkString(" ") // the 5-gram "tok1 .. tok5"
    val docs = Seq(
      (0L, s"alpha beta $g"), // exact planted gram
      (1L, s"alpha beta ${g.replace("tok3", "tokx3")}"), // one edit inside a token
      (2L, s"alpha beta ${g.replace("tok3", "zzzzzz")}"), // 6 edits — out of band
      (3L, "alpha beta gamma delta"), // shorter than n — never matches
      (4L, s"${g.reverse}") // same length, wildly different
    ).toDF("doc_id", "text")
    val ref = Seq(g).toDF("text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids(Dedup.decontaminateFuzzy(docs, ref, "doc_id", "text", n = 5, maxDist = 2)) ==
      Seq(2L, 3L, 4L))
    // maxDist=0 degenerates to exact-gram semantics == decontaminateNgram
    assert(ids(Dedup.decontaminateFuzzy(docs, ref, "doc_id", "text", n = 5, maxDist = 0)) ==
      ids(Dedup.decontaminateNgram(docs, ref, "doc_id", "text", n = 5)))
    // the band boundary is inclusive: distance exactly maxDist drops
    assert(ids(Dedup.decontaminateFuzzy(docs, ref, "doc_id", "text", n = 5, maxDist = 1)) ==
      Seq(2L, 3L, 4L))
    intercept[IllegalArgumentException] {
      Dedup.decontaminateFuzzy(docs, ref, "doc_id", "text", n = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.decontaminateFuzzy(docs, ref, "doc_id", "text", maxDist = -1)
    }
  }

  test("rrfFuse: matches the paper's sum on a local replay; missing-doc, tie and k semantics") {
    import spark.implicits._
    // two rankings over 3 queries: doc 100 is #1 on both for q0; doc 200
    // only appears on list B; q2 exists only on list A
    val la = Seq((0L, 100L, 1), (0L, 101L, 2), (1L, 110L, 1), (2L, 120L, 1))
      .toDF("qid", "did", "rank")
    val lb = Seq((0L, 100L, 1), (0L, 200L, 2), (1L, 110L, 2))
      .toDF("qid", "did", "rank")
    val got = Relational
      .rrfFuse(Seq(la, lb), "qid", "did", "rank", 10)
      .orderBy("qid", "rn")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    def c(rank: Int): BigDecimal =
      BigDecimal(1.0 / (60 + rank)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val want = Seq(
      (0L, 1, 100L, (c(1) + c(1)).toDouble), // on both lists
      (0L, 2, 101L, c(2).toDouble), // list A only
      (0L, 3, 200L, c(2).toDouble), // list B only — tie with 101, larger id ranks after
      (1L, 1, 110L, (c(1) + c(2)).toDouble),
      (2L, 1, 120L, c(1).toDouble)
    )
    assert(got == want, s"got $got")
    // k bounds the per-query output; partitioning never changes the result
    assert(Relational.rrfFuse(Seq(la, lb), "qid", "did", "rank", 1).count() == 3)
    val gotPar = Relational
      .rrfFuse(Seq(la.repartition(7), lb.repartition(3)), "qid", "did", "rank", 10)
      .orderBy("qid", "rn")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(gotPar == want)
    // a single list degrades to its own ranking
    assert(
      Relational
        .rrfFuse(Seq(la), "qid", "did", "rank", 10)
        .orderBy("qid", "rn")
        .select("did")
        .collect()
        .map(_.getLong(0))
        .toSeq == Seq(100L, 101L, 110L, 120L)
    )
    intercept[IllegalArgumentException] { Relational.rrfFuse(Nil, "qid", "did", "rank", 5) }
    intercept[IllegalArgumentException] { Relational.rrfFuse(Seq(la), "qid", "did", "rank", 0) }
    intercept[IllegalArgumentException] { Relational.rrfFuse(Seq(la), "qid", "did", "rank", 5, k0 = 0) }
  }

  test("calibrationSweep: exact counts and ratios on a hand example; edge guards") {
    import spark.implicits._
    // 6 rows: scores 0.1..0.6, labels true for the top 3 scores
    val df = Seq(
      (0.1, false), (0.2, false), (0.3, false),
      (0.4, true), (0.5, true), (0.6, true)
    ).toDF("score", "label")
    val got = TextAnalysis
      .calibrationSweep(df, "score", "label", Seq(0.0, 0.35, 0.45, 0.7))
      .orderBy("threshold")
      .collect()
      .map(r =>
        (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double]),
          Option(r.get(7)).map(_.asInstanceOf[Double]))
      )
      .toSeq
    val want = Seq(
      // t=0.0: everything passes — precision 3/6, recall 1, f1 = 6/9
      (0.0, 6L, 3L, 3L, 0L, Some(0.5), Some(1.0), Some(0.666667)),
      // t=0.35: the 3 positives pass — perfect
      (0.35, 3L, 3L, 0L, 0L, Some(1.0), Some(1.0), Some(1.0)),
      // t=0.45: 2 of 3 positives pass
      (0.45, 2L, 2L, 0L, 1L, Some(1.0), Some(0.666667), Some(0.8)),
      // t=0.7: nothing passes — precision undefined (NULL)
      (0.7, 0L, 0L, 0L, 3L, None, Some(0.0), Some(0.0))
    )
    assert(got == want, s"got $got")
    // no positive labels: recall/f1 NULL when denominators are zero
    val neg = Seq((0.5, false)).toDF("score", "label")
    val r0 = TextAnalysis.calibrationSweep(neg, "score", "label", Seq(0.9)).collect()(0)
    // pp = 0, pos = 0: all three ratios have zero denominators -> NULL
    assert(r0.isNullAt(5) && r0.isNullAt(6) && r0.isNullAt(7))
    intercept[IllegalArgumentException] {
      TextAnalysis.calibrationSweep(df, "score", "label", Nil)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.calibrationSweep(df, "score", "label", Seq(0.1, 0.1))
    }
  }

  test("domainStats/domainFilter: per-domain means and the bad-domain anti-join") {
    import spark.implicits._
    val docs = Seq(
      (0L, "https://Good.Example.com/a", 1.0),
      (1L, "https://good.example.com/b", 0.5), // same domain, case-insensitive host
      (2L, "https://bad.example.com/a", -1.0),
      (3L, "https://bad.example.com:8080/b", -0.5), // explicit port strips
      (4L, "https://blocked.example.com/x", 5.0) // high quality but blocklisted
    ).toDF("doc_id", "url", "score")
    val stats = TextAnalysis
      .domainStats(docs, "url", "score")
      .orderBy("domain")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(stats == Seq(
      ("bad.example.com", 2L, -0.75),
      ("blocked.example.com", 1L, 5.0),
      ("good.example.com", 2L, 0.75)
    ), s"got $stats")
    val kept = TextAnalysis
      .domainFilter(docs, "url", "score", 0.0, blocked = Seq("blocked.example.com"))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(0L, 1L))
    // a domain whose scores are all NULL has NULL mean — dropped (conservative)
    val withNull = docs.unionByName(
      Seq((5L, "https://unscored.example.com/x", Option.empty[Double]))
        .toDF("doc_id", "url", "score")
    )
    val kept2 = TextAnalysis
      .domainFilter(withNull, "url", "score", 0.0)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept2 == Seq(0L, 1L, 4L))
  }

  test("incrementalSemDedup: index hits and within-batch d2 drop; semIndex append closes the loop") {
    import spark.implicits._
    // two orthogonal cells; cosines are scale-invariant so the planted
    // magnitudes don't matter
    val cen = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("id", "v")
    val accepted = Seq((10L, Seq(1f, 0.01f)), (11L, Seq(0.01f, 1f))).toDF("id", "v")
    val index = Similarity.semIndex(accepted, "id", "v", cen)
    assert(
      index.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq ==
        Seq((10L, 0L), (11L, 1L))
    )
    val batch = Seq(
      (20L, Seq(2f, 0.02f)), // scaled copy of indexed 10 — index hit, drops
      (21L, Seq(1f, 0.8f)), // novel (cosine vs 10 ~ 0.79) — survives
      (22L, Seq(1f, 0.8f)), // exact dup of 21 within the batch — d2 drops
      (23L, Seq(0f, 0f)) // zero-norm: no cell, always survives
    ).toDF("id", "v")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    val survivors = Similarity.incrementalSemDedup(batch, index, cen, "id", "v", 0.95)
    assert(ids(survivors) == Seq(21L, 23L))
    // closing the loop: appending survivor cells kills a batch-2 near-dup
    // of a batch-1 survivor against the UPDATED index
    val index2 = index.unionByName(
      Similarity.semIndex(survivors.filter(col("id") === 21L), "id", "v", cen)
    )
    val batch2 = Seq((30L, Seq(2f, 1.6f)), (31L, Seq(-1f, 0.9f))).toDF("id", "v")
    assert(ids(Similarity.incrementalSemDedup(batch2, index2, cen, "id", "v", 0.95)) == Seq(31L))
    // the drop ledger: reason + smallest qualifying partner per drop, and
    // survivors == batch minus the ledger's distinct ids
    val ledger = Similarity
      .incrementalSemDedupAudit(batch, index, cen, "id", "v", 0.95)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(ledger == Set((20L, "index", 10L), (22L, "batch", 21L)), s"ledger: $ledger")
    // guards: threshold range; an index without cells refuses loudly
    intercept[IllegalArgumentException] {
      Similarity.incrementalSemDedup(batch, index, cen, "id", "v", 1.5)
    }
    val e = intercept[IllegalArgumentException] {
      Similarity.incrementalSemDedup(batch, accepted, cen, "id", "v", 0.95)
    }
    assert(e.getMessage.contains("semIndex"), e.getMessage)
    intercept[IllegalArgumentException] {
      Similarity.incrementalSemDedupAudit(batch, accepted, cen, "id", "v", 0.95)
    }
  }

  test("incrementalSemDedup: no persisted-RDD accumulation across repeated calls (micro-batch leak)") {
    import spark.implicits._
    val cen = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("id", "v")
    val accepted = Seq((10L, Seq(1f, 0.01f)), (11L, Seq(0.01f, 1f))).toDF("id", "v")
    val index = Similarity.semIndex(accepted, "id", "v", cen)
    val batch = Seq((20L, Seq(2f, 0.02f)), (21L, Seq(1f, 0.8f))).toDF("id", "v")
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val before = persisted
    (1 to 4).foreach { _ =>
      // consume both public surfaces the evidence frames feed
      assert(Similarity.incrementalSemDedup(batch, index, cen, "id", "v", 0.95).count() == 1L)
      assert(
        Similarity.incrementalSemDedupAudit(batch, index, cen, "id", "v", 0.95).count() == 1L
      )
    }
    // the assigned-batch cache is unpersisted explicitly inside the call
    // (a Dataset.persist is pinned by the CacheManager and NEVER collected
    // by GC — the pre-fix leak); the checkpointed evidence frames are
    // released by the ContextCleaner once unreferenced. Poll GC until the
    // persisted count returns to baseline.
    val deadline = System.currentTimeMillis() + 30000
    var now = persisted
    while (now > before && System.currentTimeMillis() < deadline) {
      System.gc(); Thread.sleep(200); now = persisted
    }
    assert(now <= before, s"persisted RDDs leaked across calls: before=$before after=$now")
  }

  test("nearDuplicates / scrubDuplicatedSpans: no pinned-cache accumulation across repeated calls") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different text with no shared shingles at all anywhere here now")
    ).toDF("doc_id", "text")
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val before = persisted
    (1 to 3).foreach { _ =>
      assert(Dedup.nearDuplicates(docs, "doc_id", "text", 0.8).count() == 1L)
      assert(Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2).count() == 3L)
    }
    // the intermediates (shingle sets / tokenized base) are localCheckpoint'd,
    // not Dataset.persist'ed — a persist is CacheManager-pinned and NEVER
    // collected by GC (the pre-fix leak); checkpoint blocks are released by
    // the ContextCleaner once the result frames above are unreachable.
    // Poll GC until the persisted count returns to baseline.
    val deadline = System.currentTimeMillis() + 30000
    var now = persisted
    while (now > before && System.currentTimeMillis() < deadline) {
      System.gc(); Thread.sleep(200); now = persisted
    }
    assert(now <= before, s"persisted RDDs leaked across calls: before=$before after=$now")
  }

  test("truncateDims: leading-prefix projection; full-dim truncation changes nothing") {
    import spark.implicits._
    val df = Seq((0L, Seq(1f, 2f, 3f, 4f)), (1L, Seq(5f, 6f, 7f, 8f))).toDF("id", "v")
    val got = Similarity.truncateDims(df, "v", 2).orderBy("id").collect()
      .map(_.getSeq[Float](1).toSeq).toSeq
    assert(got == Seq(Seq(1f, 2f), Seq(5f, 6f)))
    // truncating to the full dim is the identity, so recall vs the full
    // ranking is exactly 1.0 — the audit's sanity anchor
    val e = t(spark, "/root/testdata/sf0.001", "embeddings")
    val full = Similarity.bruteForceTopK(
      e.filter(col("vec_id") % 10 === 0), e, "vec_id", "embedding", 3)
    val same = Similarity.bruteForceTopK(
      Similarity.truncateDims(e, "embedding", 64).filter(col("vec_id") % 10 === 0),
      Similarity.truncateDims(e, "embedding", 64), "vec_id", "embedding", 3)
    val rec = Similarity.recallAtK(same, full, 3)
      .agg(min("recall"), max("recall")).collect()(0)
    assert(rec.getDouble(0) == 1.0 && rec.getDouble(1) == 1.0)
    intercept[IllegalArgumentException] { Similarity.truncateDims(df, "v", 0) }
  }

  test("matryoshkaTopK/matryoshkaIvfTopK: prefix funnel reranks to the exact full-dim ranking") {
    import spark.implicits._
    val e = t(spark, "/root/testdata/sf0.001", "embeddings")
    val n = e.count().toInt
    val qs = e.filter(col("vec_id") % 10 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "sim", "rn").orderBy("qid", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    // rerank >= |candidates|: the sliver is everything, so the two-stage
    // result EQUALS the full-dim exact ranking — the correctness pin
    val full = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 5)
    val pinned = Similarity.matryoshkaTopK(qs, e, "vec_id", "embedding", 5, 16, rerank = n)
    assert(rows(pinned) == rows(full), "rerank >= N must reproduce the exact ranking")
    // the funnel at a REAL sliver (rerank 20): recall vs exact, and it can
    // only improve on the raw prefix ranking it post-processes
    val funnel = Similarity.matryoshkaTopK(qs, e, "vec_id", "embedding", 5, 16, rerank = 20)
    val prefixOnly = Similarity.bruteForceTopK(
      Similarity.truncateDims(qs, "embedding", 16),
      Similarity.truncateDims(e, "embedding", 16), "vec_id", "embedding", 5)
    def meanRecall(approx: org.apache.spark.sql.DataFrame) = Similarity
      .recallAtK(approx, full, 5).agg(avg("recall")).collect()(0).getDouble(0)
    val (rFunnel, rPrefix) = (meanRecall(funnel), meanRecall(prefixOnly))
    assert(rFunnel >= rPrefix, s"rerank must not lose recall: $rFunnel < $rPrefix")
    // recall grows monotonically with the sliver width (rerank = N is the
    // exact pin above); the ABSOLUTE recall at 16 dims is a property of
    // the embeddings (synthetic, not MRL-trained — x125 measures it),
    // not of this operator, so no fixed bar here
    val wider = Similarity.matryoshkaTopK(qs, e, "vec_id", "embedding", 5, 16, rerank = 100)
    val rWider = meanRecall(wider)
    assert(rWider >= rFunnel, s"wider sliver lost recall: $rWider < $rFunnel")
    assert(rFunnel > 0.0, s"funnel recall zero — the funnel is not ranking at all")
    // IVF form under a single cell == brute-force form (same sliver set)
    val oneCell = Seq((0L, Seq.fill(64)(1f))).toDF("vec_id", "embedding")
    val ivfAll = Similarity
      .matryoshkaIvfTopK(e, oneCell, "vec_id", "embedding", 5, 16, nProbe = 1, rerank = 20)
    val bruteAll = Similarity.matryoshkaTopK(e, e, "vec_id", "embedding", 5, 16, rerank = 20)
    assert(rows(ivfAll) == rows(bruteAll), "single-cell IVF funnel must equal brute funnel")
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaTopK(qs, e, "vec_id", "embedding", 5, 16, rerank = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaIvfTopK(e, oneCell, "vec_id", "embedding", 5, 16, rerank = 3)
    }
  }

  test("matryoshkaIvfTopK fetch='cell' is bit-identical to the per-pair fetch") {
    val e = t(spark, "/root/testdata/sf0.001", "embeddings")
    // a REAL multi-cell index (16 cells), so the per-cell vector maps and
    // the cell-keyed pair routing are genuinely exercised
    val cen = e.filter(col("vec_id") < 16)
    val pairsF = Similarity
      .matryoshkaIvfTopK(e, cen, "vec_id", "embedding", 5, 16, nProbe = 1, rerank = 20)
      .select("qid", "cid", "sim", "rn")
    val cellF = Similarity
      .matryoshkaIvfTopK(
        e, cen, "vec_id", "embedding", 5, 16, nProbe = 1, rerank = 20, fetch = "cell")
      .select("qid", "cid", "sim", "rn")
    assert(pairsF.exceptAll(cellF).isEmpty && cellF.exceptAll(pairsF).isEmpty)
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaIvfTopK(e, cen, "vec_id", "embedding", 5, 16, nProbe = 2, fetch = "cell")
    }
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaIvfTopK(e, cen, "vec_id", "embedding", 5, 16, fetch = "rows")
    }
  }

  test("scoreBuckets: tercile tags match a local sort replay; nulls tag NULL; guards") {
    import spark.implicits._
    // 9 scores 1..9 → boundaries at pos 8/3 and 16/3 of the sorted list
    val rows = (1 to 9).map(i => (i.toLong, i.toDouble))
    val df = rows.toDF("id", "s")
      .unionByName(Seq((99L, Option.empty[Double])).toDF("id", "s"))
    val got = TextAnalysis
      .scoreBuckets(df, "s", exact = true)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(2))))
      .toSeq
    // local replay of Spark's percentile interpolation
    def pct(v: Seq[Double], f: Double): Double = {
      val pos = f * (v.size - 1)
      val l = math.floor(pos).toInt; val h = math.ceil(pos).toInt
      if (l == h || v(l) == v(h)) v(l)
      else (h - pos) * v(l) + (pos - l) * v(h)
    }
    val sorted = rows.map(_._2).sorted
    val (blo, bhi) = (pct(sorted, 1.0 / 3), pct(sorted, 2.0 / 3))
    val want = rows.map { case (id, s) =>
      (id, Some(if (s <= blo) "head" else if (s <= bhi) "middle" else "tail"))
    } :+ (99L, None)
    assert(got == want, s"got $got (blo=$blo bhi=$bhi)")
    // every non-null row is tagged and the three buckets are ~equal thirds
    val byBucket = got.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    assert(byBucket == Map("head" -> 3, "middle" -> 3, "tail" -> 3), s"$byBucket")
    // partition-invariant
    val gotPar = TextAnalysis
      .scoreBuckets(df.repartition(7), "s", exact = true)
      .orderBy("id").collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSeq
    assert(gotPar == want)
    intercept[IllegalArgumentException] {
      TextAnalysis.scoreBuckets(df, "s", lo = 0.0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.scoreBuckets(df, "s", lo = 0.7, hi = 0.3)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.scoreBuckets(df.withColumn("bucket", lit(1)), "s")
    }
  }

  test("corpusDivergence: zero on identical corpora, positive and asymmetric on drift") {
    import spark.implicits._
    val a = Seq((0L, "aa bb cc dd"), (1L, "aa bb ee ff")).toDF("doc_id", "text")
    val b = Seq((0L, "aa aa aa aa"), (1L, "zz zz yy xx")).toDF("doc_id", "text")
    def kl(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) = {
      val r = TextAnalysis.corpusDivergence(x, y, "text", 256).collect()(0)
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    // identical corpora: every per-bucket log-ratio cancels EXACTLY
    // (same counts term by term), so both directions are exactly 0
    val same = kl(a, a)
    assert(same == ((8L, 8L, 0.0, 0.0)), s"got $same")
    // drifted corpora: both KLs strictly positive; direction asymmetry is
    // the definition (swapping the arguments swaps the two columns)
    val ab = kl(a, b)
    assert(ab._3 > 0 && ab._4 > 0, s"got $ab")
    val ba = kl(b, a)
    assert(math.abs(ab._3 - ba._4) < 1e-9 && math.abs(ab._4 - ba._3) < 1e-9)
    // partition-invariant (decimal contribution sums)
    val abPar = kl(a.repartition(5), b.repartition(3))
    assert(abPar == ab)
    intercept[IllegalArgumentException] {
      TextAnalysis.corpusDivergence(a, b, "text", 0)
    }
  }

  test("VecSum128: exact 128-bit element-wise sums match BigInt, carries and negatives included") {
    import spark.implicits._
    import graft.functions.VecAggFunctions
    // values chosen to force low-limb carries in both directions
    val rows = Seq(
      Seq(Long.MaxValue, -3L, 0L),
      Seq(Long.MaxValue, -5L, 1L),
      Seq(Long.MinValue, 7L, -1L),
      Seq(Long.MinValue, Long.MinValue, 2L),
      Seq(12345L, Long.MaxValue, -9L)
    )
    val limbs = rows
      .toDF("a")
      .repartition(3) // exercise partial-aggregate merges
      .agg(VecAggFunctions.vecSum128(col("a"), 3))
      .collect()(0)
      .getAs[collection.Seq[Long]](0)
    val got = VecAggFunctions.decode128(limbs).toSeq
    val want = (0 until 3).map(i => rows.map(r => BigInt(r(i))).sum)
    assert(got == want, s"got $got want $want")
    // sized mismatch refuses loudly rather than truncating a gradient
    val e = intercept[Exception] {
      Seq(Seq(1L, 2L)).toDF("a").agg(VecAggFunctions.vecSum128(col("a"), 3)).collect()
    }
    assert(e.getMessage != null)
  }

  test("trainLinear: exact integer GD replay, scoreLinear composition, separability, guards") {
    import spark.implicits._
    val dim = 8; val steps = 4; val lrShift = 3; val scaleShift = 10
    // planted corpus: label 1 docs carry 'pos' tokens, label 0 docs 'neg'
    val docs = (0 until 24).map { i =>
      val y = i % 2
      val text =
        if (y == 1) s"pos pos common w$i common"
        else s"neg common w$i neg neg common"
      (i.toLong, text, y)
    }.toDF("doc_id", "text", "label")
    val model =
      TextAnalysis.trainLinear(docs, "doc_id", "text", "label", dim, steps, lrShift, scaleShift)
    // ---- local pure-Scala replay over the ENGINE's own features ----
    val feats = TextAnalysis
      .hashedTf(docs, "doc_id", "text", dim)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
      .groupBy(_._1)
      .map { case (id, rs) =>
        val x = Array.fill(dim)(0L); rs.foreach { case (_, b, w) => x(b) = w }; (id, x)
      }
    val labels = docs.collect().map(r => (r.getLong(0), r.getInt(2).toLong)).toMap
    val n = labels.size
    val w = Array.fill(dim)(BigInt(0)); var b = BigInt(0)
    val pHalf = BigInt(1) << (scaleShift + 1); val pMax = BigInt(1) << (scaleShift + 2)
    val d = (BigInt(1) << (lrShift + 2)) * n
    (1 to steps).foreach { _ =>
      val g = Array.fill(dim + 1)(BigInt(0))
      feats.foreach { case (id, x) =>
        val m = b + x.indices.map(i => w(i) * x(i)).sum
        val p = (pHalf + m).max(BigInt(0)).min(pMax)
        val r = p - labels(id) * pMax
        x.indices.foreach(i => g(i) += r * x(i))
        g(dim) += r
      }
      (0 until dim).foreach(i => w(i) -= (g(i).abs / d) * g(i).signum)
      b -= (g(dim).abs / d) * g(dim).signum
    }
    assert(model.weightNums.toSeq == w.map(_.toLong).toSeq, "weight numerators diverged from replay")
    assert(model.biasNum == b.toLong, "bias numerator diverged from replay")
    // ---- trained weights feed BOTH scoring paths unchanged and equally ----
    val viaDense = TextAnalysis
      .scoreLinear(docs.select(col("doc_id"), col("text")), "text", model.weights, model.bias)
      .select("doc_id", "logit").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val viaSparse = TextAnalysis
      .scoreLinearSparse(
        docs, "doc_id", "text",
        model.frame(spark).filter(col("bucket") >= 0), dim, model.bias)
      .select("doc_id", "logit").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaDense == viaSparse, "dense and sparse scoring disagree on trained weights")
    // ---- the planted signal was learned: positives outscore negatives ----
    val posMean = viaDense.filter(kv => labels(kv._1) == 1L).values.sum / (n / 2)
    val negMean = viaDense.filter(kv => labels(kv._1) == 0L).values.sum / (n / 2)
    assert(posMean > negMean, s"no separation: pos=$posMean neg=$negMean")
    // ---- guards ----
    intercept[IllegalArgumentException] { // non-0/1 label
      TextAnalysis.trainLinear(
        docs.withColumn("label", col("label") + 1), "doc_id", "text", "label", dim, 1)
    }
    intercept[IllegalArgumentException] { // internal column clash
      TextAnalysis.trainLinear(
        docs.withColumn("__x", lit(1)), "doc_id", "text", "label", dim, 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainLinear(docs, "doc_id", "text", "label", 0, 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainLinear(docs.filter(lit(false)), "doc_id", "text", "label", dim, 1)
    }
  }

  test("trainLinearSparse: bit-identical weights to the dense path; fasttext-dim regime; guards") {
    import spark.implicits._
    // planted corpus, including an EMPTY-feature doc (no tokens -> the
    // bias entry alone must still contribute its residual)
    val docs = ((0 until 24).map { i =>
      val y = i % 2
      val text = if (y == 1) s"pos pos common w$i common" else s"neg common w$i neg neg common"
      (i.toLong, text, y.toLong)
    } :+ ((24L, "", 0L))).toDF("doc_id", "text", "label")
    for ((dim, steps, lr, sc) <- Seq((8, 4, 3, 10), (64, 3, 4, 20))) {
      val dense = TextAnalysis.trainLinear(docs, "doc_id", "text", "label", dim, steps, lr, sc)
      val sparse =
        TextAnalysis.trainLinearSparse(docs, "doc_id", "text", "label", dim, steps, lr, sc)
      assert(sparse.weightNums.toSeq == dense.weightNums.toSeq, s"weights diverged at dim=$dim")
      assert(sparse.biasNum == dense.biasNum, s"bias diverged at dim=$dim")
    }
    // the gate corpus with the x127 label signal: the oracle-pinned config
    val gate = t(spark, sfTiny, "documents")
      .select(
        col("doc_id"), col("text"),
        when(col("text").contains("vector"), lit(1L)).otherwise(lit(0L)).as("label")
      )
      .localCheckpoint(true)
    val dg = TextAnalysis.trainLinear(gate, "doc_id", "text", "label", 64, 3, 4, 20)
    val sg = TextAnalysis.trainLinearSparse(gate, "doc_id", "text", "label", 64, 3, 4, 20)
    assert(sg.weightNums.toSeq == dg.weightNums.toSeq && sg.biasNum == dg.biasNum)
    // past the dense ceiling: the fasttext-dim regime this path exists for
    val big = TextAnalysis.trainLinearSparse(gate, "doc_id", "text", "label", 1 << 17, 2, 4, 20)
    assert(big.weightNums.length == (1 << 17) && big.weightNums.exists(_ != 0L))
    // guards mirror the dense path
    intercept[IllegalArgumentException] {
      TextAnalysis.trainLinearSparse(
        docs.withColumn("label", col("label") + 1), "doc_id", "text", "label", 8, 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainLinearSparse(docs.withColumn("__e", lit(1)), "doc_id", "text", "label", 8, 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainLinearSparse(docs, "doc_id", "text", "label", (1 << 21) + 1, 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainLinearSparse(docs.filter(lit(false)), "doc_id", "text", "label", 8, 1)
    }
  }

  test("trainLinearSgd: single-shard == full-batch bit-for-bit; multi-shard deterministic and separating") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      val y = i % 2
      val text = if (y == 1) s"pos pos common w$i common" else s"neg common w$i neg neg common"
      (i.toLong, text, y.toLong)
    }.toDF("doc_id", "text", "label")
    // nShards=1, rounds=1: the single shard IS the corpus — the local loop
    // must reproduce full-batch GD exactly
    val full = TextAnalysis.trainLinear(docs, "doc_id", "text", "label", 8, 4, 3, 10)
    val one = TextAnalysis.trainLinearSgd(docs, "doc_id", "text", "label", 8, 1, 1, 4, 3, 10)
    assert(one.weightNums.toSeq == full.weightNums.toSeq && one.biasNum == full.biasNum)
    // multi-shard: deterministic at ANY input partitioning (shard = pure
    // hash of id), and the planted signal still separates
    val sharded = TextAnalysis.trainLinearSgd(docs, "doc_id", "text", "label", 8, 4, 2, 2, 3, 10)
    val reparted =
      TextAnalysis.trainLinearSgd(docs.repartition(7), "doc_id", "text", "label", 8, 4, 2, 2, 3, 10)
    assert(sharded.weightNums.toSeq == reparted.weightNums.toSeq)
    assert(sharded.biasNum == reparted.biasNum)
    val labels = docs.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val scored = TextAnalysis
      .scoreLinear(docs.select("doc_id", "text"), "text", sharded.weights, sharded.bias)
      .select("doc_id", "logit").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val posMean = scored.filter(kv => labels(kv._1) == 1L).values.sum / 20
    val negMean = scored.filter(kv => labels(kv._1) == 0L).values.sum / 20
    assert(posMean > negMean, s"no separation: pos=$posMean neg=$negMean")
    // guards
    intercept[IllegalArgumentException] {
      TextAnalysis.trainLinearSgd(
        docs.withColumn("label", col("label") + 1), "doc_id", "text", "label", 8, 2, 1, 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainLinearSgd(docs, "doc_id", "text", "label", 8, 0, 1, 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.trainLinearSgd(docs.filter(lit(false)), "doc_id", "text", "label", 8, 2, 1, 1)
    }
    intercept[IllegalArgumentException] { // joint driver-merge bound: 65536 shards x 2^21 dims
      TextAnalysis.trainLinearSgd(docs, "doc_id", "text", "label", 1 << 21, 65536, 1, 1)
    }
  }

  test("trainLinearSparse/trainLinearSgd: ScalaCheck bit-equality with trainLinear on random corpora") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // random corpora including empty texts, repeated tokens (signed tf
    // magnitudes > 1), skewed labels — the three trainers implement ONE
    // exact integer recursion through three execution paths (dense
    // VecSum128 aggregate / sparse bucket-keyed aggregate / in-memory
    // single-shard GD), so the models must match bit-for-bit everywhere
    val vocab = (1 to 14).map(i => s"tok$i") :+ "" // "" → empty-ish text rows
    val genDoc = for {
      n <- Gen.choose(0, 10)
      tks <- Gen.listOfN(n, Gen.oneOf(vocab))
      y <- Gen.oneOf(0L, 1L)
    } yield (tks.filter(_.nonEmpty).mkString(" "), y)
    val genCase = for {
      m <- Gen.choose(3, 16)
      ds <- Gen.listOfN(m, genDoc)
      steps <- Gen.choose(1, 3)
      dim <- Gen.oneOf(4, 8, 32)
    } yield (ds.zipWithIndex.map { case ((t, y), i) => (i.toLong, t, y) }, steps, dim)
    val prop = Prop.forAll(genCase) { case (docs, steps, dim) =>
      val df = docs.toDF("doc_id", "text", "label")
      val dense = TextAnalysis.trainLinear(df, "doc_id", "text", "label", dim, steps, 3, 10)
      val sparse = TextAnalysis.trainLinearSparse(df, "doc_id", "text", "label", dim, steps, 3, 10)
      val sgd = TextAnalysis.trainLinearSgd(df, "doc_id", "text", "label", dim, 1, 1, steps, 3, 10)
      sparse.weightNums.toSeq == dense.weightNums.toSeq && sparse.biasNum == dense.biasNum &&
      sgd.weightNums.toSeq == dense.weightNums.toSeq && sgd.biasNum == dense.biasNum
    }
    // each case runs three full trainers — 15 random corpora, not 300
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("trainLinear -> scoreLinear -> calibrationSweep: the closed quality loop beats fixed weights") {
    import spark.implicits._
    // the x127 label signal on real corpus text: contains 'vector'
    val docs = t(spark, sfTiny, "documents")
      .select(
        col("doc_id"), col("text"),
        when(col("text").contains("vector"), lit(1L)).otherwise(lit(0L)).as("label")
      )
      .localCheckpoint(true)
    val model = TextAnalysis.trainLinear(docs, "doc_id", "text", "label", 64, 3, 4, 20)
    val scored = TextAnalysis.scoreLinear(docs, "text", model.weights, model.bias)
    // x118's sweep picks the operating cut for the TRAINED scores
    val cuts = Seq(-0.5, -0.25, 0.0, 0.25, 0.5)
    val sweep = TextAnalysis
      .calibrationSweep(scored, "logit", "label", cuts)
      .collect()
      .map(r => (r.getDouble(0), Option(r.get(7)).map(_.asInstanceOf[Double]).getOrElse(-1.0)))
    val bestF1 = sweep.map(_._2).max
    // fixed, label-agnostic qWeights as the baseline on the same labels
    val qw = Array.tabulate(64)(b => ((b * 37) % 101 - 50) / 256.0)
    val fixedScored = TextAnalysis
      .scoreLinear(docs.drop("label"), "text", qw, 17.0 / 256.0)
      .join(docs.select("doc_id", "label"), "doc_id")
    val fixedBest = TextAnalysis
      .calibrationSweep(fixedScored, "logit", "label", cuts)
      .collect()
      .map(r => Option(r.get(7)).map(_.asInstanceOf[Double]).getOrElse(-1.0))
      .max
    assert(
      bestF1 > fixedBest,
      s"training did not beat fixed weights on its own labels: trained F1 $bestF1 <= fixed $fixedBest"
    )
    assert(bestF1 > 0.8, s"trained classifier failed to learn the planted signal: best F1 $bestF1")
  }

  test("ngramNovelty: shared shingles drop novelty, short docs emit no row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), // shingles {a b c, b c d}; "a b c" shared with doc 2
      (2L, "a b c x"), // shingles {a b c, b c x}
      (3L, "q w e r t"), // all 3 shingles unique
      (4L, "too short") // < 3 tokens -> no shingles -> no row
    ).toDF("doc_id", "text")
    val got = Dedup
      .ngramNovelty(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 2L, 1L, 0.5),
      (3L, 3L, 3L, 1.0)
    ))
    // repeated shingles within ONE doc count once (distinct set semantics)
    val rep = Dedup.ngramNovelty(
      Seq((9L, "x y z x y z x y z")).toDF("doc_id", "text"), "doc_id", "text")
    val r9 = rep.head()
    assert(r9.getLong(1) == 3L && r9.getDouble(3) == 1.0) // {x y z, y z x, z x y}
  }

  test("vocabGrowth: first-seen buckets make every cum_types prefix the exact distinct count") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b"), (1L, "b c"), // bucket 0: types a,b,c; 4 tokens
      (2L, "c d"), (3L, "a e") //  bucket 1: new d,e;     4 tokens
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .vocabGrowth(docs, "doc_id", "text", nBuckets = 2)
      .orderBy("bucket")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == Seq(
      (0L, 2L, 4L, 4L, 3L, 3L),
      (1L, 2L, 4L, 8L, 2L, 5L)
    ))
    // invariant at any partitioning and any bucket count: total types ==
    // corpus distinct types, final cum_tokens == corpus token count
    val g5 = TextAnalysis.vocabGrowth(docs.repartition(3), "doc_id", "text", nBuckets = 4)
    val last = g5.orderBy(desc("bucket")).head()
    assert(last.getLong(5) == 5L && last.getLong(3) == 8L)
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabGrowth(docs, "doc_id", "text", nBuckets = 0)
    }
    // ADVICE r17 guards: negative ids refuse at plan level (div truncates
    // toward zero, the oracle floors — they diverge below 0), and a column
    // name needing backticks parses (the bucket expr quotes it)
    val neg = intercept[Exception] {
      TextAnalysis
        .vocabGrowth(Seq((-1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", 2)
        .collect()
    }
    assert(neg.getMessage.contains("ids must be nonnegative"))
    val weird = docs.withColumnRenamed("doc_id", "doc id")
    val gw = TextAnalysis.vocabGrowth(weird, "doc id", "text", nBuckets = 2)
    assert(gw.orderBy(desc("bucket")).head().getLong(5) == 5L)
    // ids near Long.MaxValue/nBuckets: the decimal(38,0) widening keeps
    // id*nBuckets exact where the raw long product would overflow
    val big = Seq((Long.MaxValue - 1L, "a b"), (0L, "c")).toDF("doc_id", "text")
    val gb = TextAnalysis.vocabGrowth(big, "doc_id", "text", nBuckets = 4)
      .orderBy("bucket").collect()
    assert(gb.map(_.getLong(0)).toSeq == Seq(0L, 3L)) // first + last slice
  }

  test("vocabOverlap: hand-computed pairwise type Jaccard; zero-overlap pairs emit no row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a b c"), (2L, "en", "b c d"), //   en types {a,b,c,d}
      (3L, "de", "c d e"), //                        de types {c,d,e}
      (4L, "zh", "x y") //                           zh types {x,y} — disjoint
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis
      .vocabOverlap(docs, "lang", "text")
      .orderBy("key_a", "key_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    // de∩en = {c,d} -> 2/(3+4-2) = 0.4; zh shares nothing -> absent
    assert(got == Seq(("de", "en", 3L, 4L, 2L, 0.4)))
    // repeated tokens count once per key (type semantics, not token counts)
    val rep = TextAnalysis.vocabOverlap(
      Seq((1L, "a", "x x x y"), (2L, "b", "x")).toDF("doc_id", "k", "text"), "k", "text")
    val r0 = rep.head()
    assert(r0.getLong(2) == 2L && r0.getLong(3) == 1L && r0.getLong(4) == 1L &&
      r0.getDouble(5) == 0.5)
  }

  test("contaminationReport: per-suite distinct-gram hit counts; clean docs emit no row") {
    import spark.implicits._
    // n=3 grams; suiteA = "a b c d" -> grams {a b c, b c d};
    // suiteB = "x y z" -> gram {x y z}
    val suites = Seq(("suiteA", "a b c d"), ("suiteB", "x y z")).toDF("suite", "text")
    val corpus = Seq(
      (1L, "p q a b c d r"), // both A-grams -> (1, suiteA, 2)
      (2L, "a b c q x y z"), // one A-gram + the B-gram -> two rows
      (3L, "a b x y c d"), //   no shared 3-gram -> clean
      (4L, "a b c a b c d") //  gram "a b c" twice, distinct counts once -> 2
    ).toDF("doc_id", "text")
    val got = Dedup
      .contaminationReport(corpus, suites, "doc_id", "text", "suite", n = 3)
      .orderBy("doc_id", "suite")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(
      (1L, "suiteA", 2L),
      (2L, "suiteA", 1L), (2L, "suiteB", 1L),
      (4L, "suiteA", 2L)
    ))
    // shuffled-reference path agrees with the broadcast default
    val shuffled = Dedup.contaminationReport(
      corpus, suites, "doc_id", "text", "suite", n = 3, broadcastReference = false)
    assert(shuffled.orderBy("doc_id", "suite").collect().toSeq ==
      Dedup.contaminationReport(corpus, suites, "doc_id", "text", "suite", n = 3)
        .orderBy("doc_id", "suite").collect().toSeq)
  }

  test("marginMine: ratio margin on a hand neighborhood, mutual intersection, brute end-to-end") {
    import spark.implicits._
    def snap6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // hand case: src 1's best tgt is 10 (sim .9, fwd neighborhood avg .7);
    // src 2 also points at 10 (.8, avg .6); tgt 10's backward
    // neighborhood avg .85 and its rank-1 source is 1 -> only (1, 10)
    // survives the mutual rule
    val fwd = Seq(
      (1L, 10L, 0.9, 1), (1L, 11L, 0.5, 2),
      (2L, 10L, 0.8, 1), (2L, 12L, 0.4, 2)
    ).toDF("qid", "cid", "sim", "rn")
    val bwd = Seq(
      (10L, 1L, 0.9, 1), (10L, 2L, 0.8, 2),
      (11L, 1L, 0.5, 1), (12L, 2L, 0.4, 1)
    ).toDF("qid", "cid", "sim", "rn")
    val got = Similarity.marginMine(fwd, bwd)
      .orderBy("qid").collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    // join order: paired.join(avgF on qid).join(avgB on cid) puts cid first
    assert(got.length == 2)
    assert(got(0) == ((10L, 1L, 0.9, 0.7, 0.85, snap6(0.9 / ((0.7 + 0.85) / 2)))), got(0).toString)
    assert(got(1) == ((10L, 2L, 0.8, 0.6, 0.85, snap6(0.8 / ((0.6 + 0.85) / 2)))), got(1).toString)
    // the higher-margin pair is the better-aligned one even though both
    // share the target: (1, 10) beats (2, 10)
    assert(got(0)._6 > got(1)._6)
    val mut = Similarity.marginMine(fwd, bwd, mutual = true)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
    assert(mut.toSeq == Seq((1L, 10L)), mut.toSeq.toString)
    val g = intercept[IllegalArgumentException] { Similarity.marginMine(fwd.drop("rn"), bwd) }
    assert(g.getMessage.contains("top-k frame"))
    // end-to-end through bruteForceTopK on planted vectors: src 100 is a
    // near-copy of tgt 200 (margin leader), the rest are spread out
    val src = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)), (101L, Seq(0.6f, 0.8f, 0.0f)),
      (102L, Seq(0.0f, 0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val tgt = Seq(
      (200L, Seq(0.99f, 0.01f, 0.0f)), (201L, Seq(0.0f, 1.0f, 0.0f)),
      (202L, Seq(0.5f, 0.5f, 0.7f))
    ).toDF("vec_id", "embedding")
    val f2 = Similarity.bruteForceTopK(src, tgt, "vec_id", "embedding", k = 2)
    val b2 = Similarity.bruteForceTopK(tgt, src, "vec_id", "embedding", k = 2)
    val mined = Similarity.marginMine(f2, b2).orderBy("qid").collect()
    assert(mined.length == 3)
    val m100 = mined.find(_.getAs[Long]("qid") == 100L).get
    assert(m100.getAs[Long]("cid") == 200L && m100.getAs[Double]("margin") > 1.0,
      m100.toString)
    // margins recompute from the frames: margin = sim / ((avgF + avgB)/2)
    mined.foreach { r =>
      val aF = f2.filter(col("qid") === r.getAs[Long]("qid"))
        .agg(avg("sim")).collect()(0).getDouble(0)
      assert(math.abs(r.getAs[Double]("avg_src") - aF) < 1e-9)
      assert(math.abs(r.getAs[Double]("margin") -
        snap6(r.getAs[Double]("sim") /
          ((r.getAs[Double]("avg_src") + r.getAs[Double]("avg_tgt")) / 2))) < 1e-12)
    }
  }

  test("ivfSearch: one-cell == brute, ids not cross-filtered, nProbe widens recall, zero-norm drops") {
    import spark.implicits._
    val cs = Seq(
      (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.8f, 0.6f)), (3L, Seq(-1.0f, 0.2f))
    ).toDF("vec_id", "embedding")
    val oneCen = Seq((0L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    // single centroid -> one cell -> exactly brute-force (disjoint ids)
    val qs = Seq((100L, Seq(1.0f, 0.0f)), (101L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val a = Similarity.ivfSearch(qs, cs, oneCen, "vec_id", "embedding", k = 2)
      .select("qid", "cid", "sim", "rn")
    val b = Similarity.bruteForceTopK(qs, cs, "vec_id", "embedding", k = 2)
      .select("qid", "cid", "sim", "rn")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // a query id equal to a corpus id is a separate namespace, NOT a
    // self-pair: (1, 1) must appear (ivfTopK would drop it)
    val sameId = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val withSame = Similarity.ivfSearch(sameId, cs, oneCen, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
    assert(withSame.contains((1L, 1L)), withSame.toSeq.toString)
    // two far-apart cells: the best candidate sits in the query's SECOND
    // cell — invisible at nProbe=1, found at nProbe=2
    val twoCen = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val corpusB = Seq((50L, Seq(0.1f, 0.99f))).toDF("vec_id", "embedding")
    val qMid = Seq((200L, Seq(0.9f, 0.44f))).toDF("vec_id", "embedding") // cell 0
    assert(Similarity.ivfSearch(qMid, corpusB, twoCen, "vec_id", "embedding", 1).count() == 0L)
    val probed = Similarity.ivfSearch(qMid, corpusB, twoCen, "vec_id", "embedding", 1, nProbe = 2)
      .collect()
    assert(probed.length == 1 && probed(0).getAs[Long]("cid") == 50L)
    // zero-norm query has no cell
    val zq = Seq((300L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.ivfSearch(zq, cs, oneCen, "vec_id", "embedding", 2).count() == 0L)
    intercept[IllegalArgumentException] {
      Similarity.ivfSearch(qs, cs, oneCen, "vec_id", "embedding", 0)
    }
  }
}
