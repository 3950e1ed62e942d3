package graft.functions

import graft.SparkTester
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KeywordSpec extends AnyFunSuite with SparkTester {

  test("automaton: overlapping terms, nested substrings, phrases, misses") {
    val ac = new Keywords.Automaton(Seq("he", "she", "his", "hers", "hash join"))
    def m(s: String) = ac.matchSet(s).map(ac.table).toList
    // the classic Aho-Corasick example: "ushers" contains she, he, hers
    assert(m("ushers") == List("he", "hers", "she"))
    assert(m("this") == List("his"))
    assert(m("a hash join b") == List("hash join"))
    assert(m("hash  join") == Nil) // double space breaks the phrase
    assert(m("") == Nil)
    assert(ac.anyMatch("ushers") && !ac.anyMatch("xyz"))
    // duplicate terms collapse; output order is the sorted table order
    val dup = new Keywords.Automaton(Seq("b", "a", "b"))
    assert(dup.table.toList == List("a", "b"))
    intercept[IllegalArgumentException](new Keywords.Automaton(Nil))
    intercept[IllegalArgumentException](new Keywords.Automaton(Seq("ok", "")))
  }

  test("keyword_matches == per-term contains on random dictionaries (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny alphabet maximizes overlap/fail-link traffic
    val genStr = for {
      n <- Gen.choose(1, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val genCase = for {
      nt <- Gen.choose(1, 10)
      terms <- Gen.listOfN(nt, genStr)
      text <- for {
        n <- Gen.choose(0, 60)
        cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', ' '))
      } yield cs.mkString
    } yield (terms, text)
    val prop = Prop.forAll(genCase) { case (terms, text) =>
      val ac = new Keywords.Automaton(terms)
      val got = ac.matchSet(text).map(ac.table).toList
      val want = terms.distinct.sorted.filter(text.contains(_))
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("expressions: codegen + null paths; blocklist filter semantics") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Seq(
      (1L, "the big data table"),
      (2L, "slow scan"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val tags = TextAnalysis
      .tagKeywords(docs, "doc_id", "text", Seq("data", "slow", "a"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toList
    // null text explodes to nothing; 'a' hits via substrings of both docs
    assert(tags == List((1L, "a"), (1L, "data"), (2L, "a"), (2L, "slow")))
    val kept = TextAnalysis
      .blocklistFilter(docs, "text", Seq("slow"))
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toList
    // null text: keyword_any is null -> filter drops it (no defined
    // verdict on absent text; gate explicitly before the blocklist)
    assert(kept == List(1L))
  }
}
