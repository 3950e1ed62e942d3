package graft.functions

import graft.SparkTester
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkTester {

  private def ranks(merges: (String, String)*) = new Bpe.Ranks(merges)

  test("Sennrich merge chain: low/lower/newest/widest vectors") {
    // the published BPE walkthrough alphabet: es+t -> est, l+o -> lo, lo+w -> low
    val r = ranks(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    assert(Bpe.encode("low", r).toSeq == Seq("low"))
    // space pre-tokens carry the Ġ-mapped leading space as its own symbol
    // (no merge in the table touches Ġ)
    assert(Bpe.encode("low lower newest widest", r).toSeq == Seq(
      "low",
      "Ġ", "low", "e", "r",
      "Ġ", "n", "e", "w", "est",
      "Ġ", "w", "i", "d", "est"
    ))
    assert(Bpe.countTokens("low lower newest widest", r) == 15)
  }

  test("GPT-2 pre-tokenizer: contractions, punct runs, digits, trailing-space lookahead") {
    def pre(s: String): Seq[String] = {
      val m = Bpe.PreTokenizer.matcher(s)
      Iterator.continually(if (m.find()) Some(m.group()) else None).takeWhile(_.isDefined).flatten.toSeq
    }
    assert(pre("don't stop") == Seq("don", "'t", " stop"))
    assert(pre("I'll we've he's") == Seq("I", "'ll", " we", "'ve", " he", "'s"))
    assert(pre("a1b2") == Seq("a", "1", "b", "2"))
    assert(pre("hello, world!!") == Seq("hello", ",", " world", "!!"))
    // \s+(?!\S): interior multi-space keeps ONE space attached to the next
    // word; the rest is its own whitespace token. Trailing spaces are one.
    assert(pre("a  b") == Seq("a", " ", " b"))
    assert(pre("ab  ") == Seq("ab", "  "))
    assert(pre("x 42.5") == Seq("x", " 42", ".", "5"))
  }

  test("byte-level mapping: printable identity, space->Ġ, multibyte UTF-8, byte 0") {
    assert(Bpe.byteMap("abcXYZ!~") == "abcXYZ!~")
    assert(Bpe.byteMap(" ") == "Ġ") // Ġ
    assert(Bpe.byteMap("\n") == "Ċ") // Ċ
    assert(Bpe.byteMap("é") == "Ã©") // UTF-8 C3 A9: C3 self-maps, A9 self-maps
    assert(Bpe.byteMap("\u0000") == "\u0100") // byte 0 -> first shifted slot (Ā)
    // round-trip shape: mapped length == UTF-8 byte length
    for (s <- Seq("héllo wörld", "日本語", "a\tb\nc"))
      assert(Bpe.byteMap(s).length == s.getBytes("UTF-8").length, s)
  }

  test("merge loop: rank priority beats position; all occurrences merge; tokens concat losslessly") {
    // (b,c) outranks (a,b): "abc" -> a,[bc] even though (a,b) is leftmost
    assert(Bpe.encode("abc", ranks(("b", "c"), ("a", "b"))).toSeq == Seq("a", "bc"))
    // position order when ranks equal-by-definition (one pair): all occurrences, left to right
    assert(Bpe.encode("abab", ranks(("a", "b"))).toSeq == Seq("ab", "ab"))
    assert(Bpe.encode("aaa", ranks(("a", "a"))).toSeq == Seq("aa", "a"))
    // chained: ab + ab -> abab
    assert(Bpe.encode("abab", ranks(("a", "b"), ("ab", "ab"))).toSeq == Seq("abab"))
    // lossless: concat(tokens) == byteMap(input), any text, any table
    val r = ranks(("t", "h"), ("th", "e"), ("e", "r"), ("Ġ", "t"))
    for (s <- Seq("the weather there", "don't  stop!", "héllo", "", " ", "a  b  "))
      assert(Bpe.encode(s, r).mkString == Bpe.byteMap(s), s"input '$s'")
  }

  test("x90 closed form: merge-loop count == substring-subtraction over the corpus vocabulary") {
    // the x90 oracle's precondition, pinned exhaustively: for every word
    // the testdata generator can emit, the real merge loop removes exactly
    // one symbol per non-overlapping pattern occurrence
    val merges = Seq(
      ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
      ("s", "c"), ("sc", "a"), ("sca", "n"),
      ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
      ("o", "r"), ("or", "d"),
      ("i", "n"), ("in", "d"), ("ind", "o"), ("indo", "w"),
      ("e", "r"),
      ("q", "u")
    )
    val r = new Bpe.Ranks(merges)
    val vocab = Seq(
      "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
      "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
      "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
      "table", "the", "value", "vector", "window"
    )
    def occ(s: String, p: String): Int = (s.length - s.replace(p, "").length) / p.length
    val pats = merges.map { case (a, b) => a + b }
    vocab.foreach { w =>
      val closed = w.length - pats.map(occ(w, _)).sum
      assert(Bpe.countTokens(w, r) == closed, s"word '$w'")
      // and multi-word lines: each ' word' adds one Ġ token
      val line = s"$w $w"
      assert(Bpe.countTokens(line, r) == 2 * closed + 1, s"line '$line'")
    }
    // spot vectors for the table itself
    assert(Bpe.encode("table", r).toSeq == Seq("table"))
    assert(Bpe.encode("order", r).toSeq == Seq("ord", "er"))
    assert(Bpe.encode("query", r).toSeq == Seq("qu", "er", "y"))
    assert(Bpe.encode("window", r).toSeq == Seq("w", "indow"))
    assert(Bpe.encode("data", r).toSeq == Seq("d", "a", "ta"))
  }

  test("expressions: codegen path, null safety, count==size(tokens), guards") {
    import spark.implicits._
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val df = Seq(
      (1L, "low lower"),
      (2L, ""),
      (3L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val got = df
      .select(
        col("id"),
        BpeFunctions.bpeTokens(col("text"), merges).as("toks"),
        BpeFunctions.bpeCount(col("text"), merges).as("n")
      )
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getSeq[String](1)), if (r.isNullAt(2)) -1 else r.getInt(2)))
      .toMap
    assert(got(1L) == ((Some(Seq("low", "Ġ", "low", "er")), 4)))
    assert(got(2L) == ((Some(Seq.empty[String]), 0)))
    assert(got(3L) == ((None, -1))) // null in, null out
    // count always equals size(tokens) — cross-expression consistency
    val docs = graft.queries.Tables.t(spark, sfTiny, "documents").limit(50)
    val mism = docs
      .select(
        (BpeFunctions.bpeCount(col("text"), merges) =!=
          size(BpeFunctions.bpeTokens(col("text"), merges))).as("bad")
      )
      .filter(col("bad"))
      .count()
    assert(mism == 0)
    intercept[IllegalArgumentException] { new Bpe.Ranks(Seq.empty) }
    intercept[IllegalArgumentException] { new Bpe.Ranks(Seq(("a", "b"), ("a", "b"))) }
    intercept[IllegalArgumentException] { new Bpe.Ranks(Seq(("a\u0000", "b"))) }
  }

  test("bpeIds: vocab map lookup, unk substitution, loud unknown-token error") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val merges = Seq(("l", "o"), ("lo", "w"))
    // tokens of "low lower": low, Ġ, low, e, r
    val vocab = Map("low" -> 7, "Ġ" -> 0, "e" -> 3, "r" -> 4)
    val df = Seq((1L, "low lower")).toDF("id", "text")
    val ids = df
      .select(TextAnalysis.bpeIds(col("text"), merges, vocab).as("ids"))
      .collect()
      .head
      .getSeq[Int](0)
    assert(ids == Seq(7, 0, 7, 3, 4))
    // token outside the vocab: unkId substitutes...
    val unk = df
      .select(TextAnalysis.bpeIds(col("text"), merges, vocab - "e", unkId = Some(-1)).as("ids"))
      .collect()
      .head
      .getSeq[Int](0)
    assert(unk == Seq(7, 0, 7, -1, 4))
    // ...and without unkId the row FAILS, naming the token — a silent
    // null id would corrupt a training sequence
    val err = intercept[Exception] {
      df.select(TextAnalysis.bpeIds(col("text"), merges, vocab - "e").as("ids")).collect()
    }
    assert(err.getMessage.contains("not in vocab"), err.getMessage)
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeIds(col("text"), merges, Map.empty)
    }
  }

  test("bpeTrain: learns the hand-derivable merges; trained table drives the tokenizer") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // corpus engineered so every merge is hand-checkable:
    //   "low low low lower lowest" -> pre-tokens: low(1), Ġlow(2),
    //   Ġlower(1), Ġlowest(1)
    // pair counts round 1: (Ġ,l)=4, (l,o)=5, (o,w)=5, (w,e)=2, (e,r)=1,
    // (e,s)=1, (s,t)=1 -> max 5, tie (l,o) vs (o,w) -> lexicographic:
    // 'l' < 'o' -> merge (l,o). Round 2: (lo,w)=5 wins. Round 3:
    // (Ġ,low)=4. Round 4: (low,e)=2 beats count-2 (w? no) ties:
    // pairs now: low(1) done; Ġlow(2); Ġlow,e? words: low, Ġlow, Ġlow|e|r,
    // Ġlow|e|s|t -> (Ġlow,e)=2, (e,r)=1, (e,s)=1, (s,t)=1 -> (Ġlow,e).
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 4)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("Ġ", "low"), ("Ġlow", "e")), merges)
    // the learned table drives the real tokenizer
    val r = new Bpe.Ranks(merges)
    assert(Bpe.encode("low lower", r).toSeq == Seq("low", "Ġlowe", "r"))
    // early stop: once no pair repeats, training returns fewer merges
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val m2 = TextAnalysis.bpeTrain(tiny, "text", numMerges = 10)
    // (a,b), (Ġ,c), (c,d) all count 1 -> nothing repeats -> no merges
    assert(m2.isEmpty, m2)
    // vocabulary cap refuses loudly, never a silent driver blowup
    val many = spark.range(200).selectExpr("id AS doc_id", "concat('w', id) AS text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrain(many, "text", numMerges = 2, maxVocab = 50)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
    intercept[IllegalArgumentException](TextAnalysis.bpeTrain(tiny, "text", numMerges = 0))
    // bpeWords: the unit stream training counts (byte-mapped pre-tokens)
    val w = docs
      .select(BpeFunctions.bpeWords(col("text")).as("w"))
      .collect()
      .head
      .getSeq[String](0)
    assert(w == Seq("low", "Ġlow", "Ġlow", "Ġlower", "Ġlowest"))
  }

  test("bpeDetokenize: lossless byte-level round trip; corrupted tokens refuse loudly") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val merges = Seq(("l", "o"), ("lo", "w"))
    // round trip survives multibyte UTF-8, control bytes and emoji —
    // byte-level mapping means ANY string decodes back exactly
    val texts = Seq(
      "low lower lowest",
      "naïve café über",
      "混合 multilingual テキスト",
      "tabs\tand\nnewlines zero",
      "🦑 emoji 🚀"
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rt = df
      .select(
        col("id"),
        col("text"),
        TextAnalysis.bpeDecode(TextAnalysis.bpeTokens(col("text"), merges)).as("back")
      )
      .collect()
    rt.foreach(r => assert(r.getString(1) == r.getString(2), s"row ${r.getLong(0)}"))
    // direct kernel: detokenize concatenates tokens and inverts the map
    assert(Bpe.detokenize(Array("low", "Ġlow", "er")) == "low lower")
    // a char outside the 324-symbol byte alphabet is a corrupted token
    val ex = intercept[Exception] {
      spark.sql("SELECT array('ok', '日') AS t")
        .select(BpeFunctions.bpeDetokenize(col("t")))
        .collect()
    }
    assert(ex.getMessage.contains("byte alphabet") ||
      Option(ex.getCause).exists(_.getMessage.contains("byte alphabet")))
    // null stays null
    val n = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS t")
      .select(BpeFunctions.bpeDetokenize(col("t")).as("d"))
      .collect()
    assert(n.head.isNullAt(0))
    // composes with a LEARNED table: train -> tokenize -> decode == id
    val docs = Seq((1L, "low low lower lowest")).toDF("doc_id", "text")
    val learned = TextAnalysis.bpeTrain(docs, "text", numMerges = 3)
    val back = docs
      .select(TextAnalysis.bpeDecode(TextAnalysis.bpeTokens(col("text"), learned)).as("b"))
      .collect()
      .head
      .getString(0)
    assert(back == "low low lower lowest")
  }

  test("bpeTrain == instance-based reference trainer on random corpora (ScalaCheck)") {
    import graft.operators.TextAnalysis
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // independent reference: trains on the raw pre-token INSTANCES (no
    // frequency dictionary), immutable collections, Scala Map counting —
    // shares nothing with the engine's dict-based loop but the spec:
    // overlap-counting pair stats, max-count/lex-min selection,
    // left-to-right non-overlapping merges, stop when nothing repeats
    def naiveTrain(words: Seq[String], numMerges: Int): Seq[(String, String)] = {
      var ws: Seq[Vector[String]] = words.map(_.split("").filter(_.nonEmpty).toVector)
      val out = Seq.newBuilder[(String, String)]
      var k = 0
      var done = false
      while (k < numMerges && !done) {
        val counts = ws
          .flatMap(w => w.zip(w.drop(1)))
          .groupBy(identity)
          .view
          .mapValues(_.size.toLong)
          .toMap
        val repeats = counts.filter(_._2 >= 2)
        if (repeats.isEmpty) done = true
        else {
          val bestC = repeats.values.max
          // toList first: Map.collect over pair results would rebuild a
          // MAP keyed by the pair's first element, silently dropping tied
          // rivals that share a left symbol (found the hard way)
          val best = repeats.toList.collect { case (p, c) if c == bestC => p }.min
          out += best
          ws = ws.map { w =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < w.length) {
              if (i < w.length - 1 && (w(i), w(i + 1)) == best) { b += w(i) + w(i + 1); i += 2 }
              else { b += w(i); i += 1 }
            }
            b.result()
          }
          k += 1
        }
      }
      out.result()
    }
    // tiny alphabet + short words force heavy pair contention and ties
    val genWord = for {
      n <- Gen.choose(1, 5)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val genDoc = for {
      n <- Gen.choose(1, 8)
      ws <- Gen.listOfN(n, genWord)
    } yield ws.mkString(" ")
    val genCase = for {
      nd <- Gen.choose(1, 12)
      docs <- Gen.listOfN(nd, genDoc)
      m <- Gen.choose(1, 8)
    } yield (docs, m)
    val prop = Prop.forAll(genCase) { case (docTexts, numMerges) =>
      val docs = docTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextAnalysis.bpeTrain(docs, "text", numMerges)
      // reference pre-tokens: first word bare, the rest space-prefixed
      // (the GPT-2 byte map is the identity on [a-z], Ġ is mapped space)
      val words = docTexts.flatMap { t =>
        val w = t.split(" ")
        w.head +: w.tail.map("Ġ" + _)
      }
      got == naiveTrain(words, numMerges)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("bpeVocab: GPT-2 construction (256 byte symbols + merges by rank); train→vocab→ids chain") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val merges = Seq(("l", "o"), ("lo", "w"), ("Ġ", "low"))
    val v = TextAnalysis.bpeVocab(merges)
    assert(v.size == 256 + 3)
    // byte symbols get their byte value as id, in the GPT-2 mapped alphabet
    assert(v("l") == 'l'.toInt && v("w") == 'w'.toInt)
    assert(v(Bpe.ByteToChar(0).toString) == 0 && v(Bpe.ByteToChar(255).toString) == 255)
    assert(v("Ġ") == 0x20) // Ġ is the mapped SPACE byte → id = its byte value
    // merged tokens: 256 + rank
    assert(v("lo") == 256 && v("low") == 257 && v("Ġlow") == 258)
    // duplicate merged token keeps the FIRST id (reference first-wins load)
    val dup = TextAnalysis.bpeVocab(Seq(("a", "b"), ("ab", "c"), ("a", "b")))
    assert(dup("ab") == 256)
    // the full learned chain: train on a corpus, derive the vocab, id-ify
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val learned = TextAnalysis.bpeTrain(docs, "text", numMerges = 4)
    val vocab = TextAnalysis.bpeVocab(learned)
    val ids = docs
      .select(TextAnalysis.bpeIds(col("text"), learned, vocab).as("ids"))
      .collect()
      .head
      .getSeq[Int](0)
    // merges: (l,o)(lo,w)(Ġ,low)(Ġlow,e) → vocab: lo=256 low=257 Ġlow=258
    // Ġlowe=259; "low low low lower lowest" tokens: [low, Ġlow, Ġlow,
    // Ġlowe+r, Ġlow+e?]: encode("lowest") = Ġlow,e,s,t? merge (Ġlow,e) →
    // Ġlowe,s,t
    assert(ids == Seq(257, 258, 258, 259, 'r'.toInt, 259, 's'.toInt, 't'.toInt))
  }

  test("x98 oracle precondition: greedy-replay == merge loop across the vocab (build-time pin fires)") {
    // forcing the x98 oracle SQL executes ExtQueries' require that the
    // independent greedy tokenization equals the real encoder on BOTH
    // variants of every corpus word — this test makes that pin part of
    // `sbt test`, not just query construction
    val sql = graft.SparkEntry.oracleSql("x98_bpe_ids")
    assert(sql.contains("wt(w, first, ids)"))
    // and the id space is dense 0..|vocab|-1 (every id appears in the SQL)
    val ids = "\\[([0-9, ]+)\\]".r
      .findAllMatchIn(sql)
      .flatMap(_.group(1).split(", "))
      .map(_.trim.toInt)
      .toSet
    assert(ids == (0 until ids.size).toSet, s"vocab ids not dense: $ids")
  }
}
