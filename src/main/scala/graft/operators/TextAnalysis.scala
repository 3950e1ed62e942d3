package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Materialize.StageSyntax

/** Text-analysis operators for document pipelines: token stats, quality
  * scoring, language-ID heuristics, canonical fingerprints. All are pure
  * per-row column expressions (whole-stage codegen, no shuffle). */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** HTML/markup → plain text — the web-crawl extraction stage that sits
    * in front of every text-curation operator here (the CommonCrawl-style
    * pipeline: extract → language-ID → quality → dedup). Pure chained
    * regexp/replace column expression (whole-stage codegen, no UDF, no
    * shuffle), portable to the SQL oracle (RE2 and Java agree on every
    * pattern used: dotall via `(?s)`, lazy quantifiers, no backreferences):
    *
    *  1. `<script>`/`<style>` blocks removed WITH their content (code and
    *     CSS are not text — naive tag-stripping leaves them in);
    *  2. every remaining tag `<...>` → one space (block boundaries must
    *     not glue words together);
    *  3. the five standard entities decoded, `&amp;` LAST so `&amp;lt;`
    *     correctly yields the literal `&lt;`, not `<`;
    *  4. whitespace collapsed and trimmed.
    *
    * Not a browser: comments/CDATA inside scripts, conditional markup and
    * malformed nesting degrade gracefully (tags still strip) but are not
    * spec'd — the contract is crawl-scale text extraction, not DOM
    * fidelity. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val unesc = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&lt;", "<"),
            "&gt;", ">"
          ),
          "&quot;", "\""
        ),
        "&#39;", "'"
      ),
      "&amp;", "&"
    )
    trim(regexp_replace(unesc, "\\s+", " "))
  }

  /** Canonical URL form for crawl-level dedup — the normalization every
    * URL-keyed pipeline stage (frontier dedup, per-site caps, exact URL
    * dedup) applies before comparing:
    *  1. fragment stripped (never reaches the server);
    *  2. scheme and host lowercased (RFC 3986 case-insensitive parts; the
    *     PATH keeps its case — it is case-sensitive);
    *  3. leading `www.` and scheme-default port (`:80` http / `:443`
    *     https) dropped from the host;
    *  4. duplicate slashes in the path collapsed, trailing slashes
    *     stripped (root becomes "");
    *  5. tracking params (`utm_*`, `fbclid`, `gclid`) removed, the rest
    *     byte-order sorted and rejoined — `?b=2&a=1` == `?a=1&b=2`.
    *
    * Every regex behaves identically under Java regex and RE2, so the
    * DuckDB oracle replays the exact chain. Pure per-row column — no
    * shuffle; compose with [[Dedup.exactWithCounts]] on the result for
    * URL-level dedup. Non-URL input degrades to best effort (empty
    * scheme/host), never throws. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val noWww = regexp_replace(
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", ""
    )
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val path = regexp_replace(
      regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/{2,}", "/"),
      "/+$", ""
    )
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val params = array_join(
      array_sort(
        filter(
          split(query, "&"),
          p => p =!= lit("") && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)")
        )
      ),
      "&"
    )
    concat(
      scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params))
    )
  }

  /** doc_id, n_tokens, n_uniq, type-token ratio. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    docs.select(
      col(idCol),
      size(tk).as("n_tokens"),
      size(array_distinct(tk)).as("n_uniq"),
      round(size(array_distinct(tk)).cast("double") / size(tk).cast("double"), 6).as("ttr")
    )
  }

  /** The quality score as a pure column expression — usable as an inline
    * filter predicate (no join-back needed to keep the source columns). */
  def qualityExpr(textCol: Column): Column = {
    val tk = tokens(textCol)
    val nTok = size(tk).cast("double")
    val avgLen = length(regexp_replace(textCol, " ", "")).cast("double") / nTok
    round(
      lit(0.5) * least(nTok / lit(100.0), lit(1.0)) +
        lit(0.5) * least(avgLen / lit(8.0), lit(1.0)),
      6
    )
  }

  /** Simple quality score in [0,1]: length component + avg-token-length
    * component (the reference-style derived quality flag generalized —
    * cf. docs/examples/index.md:253-257 quality flag derivation). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    val nTok = size(tk).cast("double")
    val avgLen = length(regexp_replace(col(textCol), " ", "")).cast("double") / nTok
    docs.select(
      col(idCol),
      nTok.cast("int").as("n_tokens"),
      round(avgLen, 6).as("avg_tok_len"),
      qualityExpr(col(textCol)).as("quality")
    )
  }

  /** Marker lexicons for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und"),
    "en" -> Seq("the", "a", "scan"),
    "es" -> Seq("el", "los", "y"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("shi", "de", "bu")
  )

  /** Stopword-count language ID: argmax of per-language marker hits with a
    * deterministic alphabetical tie-break. On this corpus it is a parity
    * exercise (all languages share one vocabulary); on real text the marker
    * lists are the per-language stopword lexicons. */
  def langId(docs: DataFrame, idCol: String, textCol: String, actualCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    val counts = LangMarkers.map { case (lang, ms) =>
      lang -> size(filter(tk, t => ms.map(m => t === m).reduce(_ || _)))
    }
    val best = greatest(counts.map(_._2): _*)
    // first language (alphabetical) reaching the max count wins
    val pred = counts.tail.foldLeft(when(counts.head._2 === best, counts.head._1)) {
      case (acc, (lang, c)) => acc.when(c === best, lang)
    }
    docs.select(
      col(idCol),
      pred.as("pred_lang"),
      col(actualCol).as("lang"),
      (pred === col(actualCol)).as("is_match")
    )
  }

  /** Canonical content fingerprint: md5 over the sorted distinct token set —
    * whitespace/term-order-insensitive document identity. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Portable-dialect PII patterns (work identically under Java regex and
    * DuckDB/RE2 — no lookaround, no backrefs). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ ]+"

  /** PII-style redaction: emails → `<EMAIL>`, URLs → `<URL>` — the scrub
    * step every public-corpus pipeline runs before training. Pure per-row
    * regexp_replace (codegen, no shuffle); extend by chaining more
    * (pattern → tag) pairs. */
  def redact(text: Column, extra: Seq[(String, String)] = Nil): Column =
    extra.foldLeft(
      regexp_replace(regexp_replace(text, UrlPattern, "<URL>"), EmailPattern, "<EMAIL>")
    ) { case (acc, (pat, tag)) => regexp_replace(acc, pat, tag) }

  /** Dictionary tagging via the Aho–Corasick automaton
    * ([[graft.functions.KeywordMatches]] — one text pass regardless of
    * dictionary size): `(id, term)` rows for every DISTINCT dictionary
    * term occurring in each doc (substring semantics; sorted term
    * order). The topic-tagging / term-audit stage of a curation
    * pipeline. Pure per-row codegen + explode — no shuffle, no join;
    * the automaton rides the plan. */
  def tagKeywords(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String]): DataFrame =
    docs.select(
      col(idCol),
      explode(graft.functions.KeywordFunctions.keywordMatches(col(textCol), terms)).as("term")
    )

  /** Blocklist gate: drop every doc containing ANY dictionary term —
    * [[graft.functions.KeywordAny]] stops at the first hit, so clean
    * docs pay one text pass and dirty docs even less. The naive
    * `terms.map(contains).reduce(or)` plans one scan of the text per
    * term — this is the 10k-term-blocklist shape. */
  def blocklistFilter(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame =
    docs.filter(!graft.functions.KeywordFunctions.keywordAny(col(textCol), terms))

  /** Per-document repetition metrics — the C4/Gopher-style boilerplate
    * signal: type-token ratio and the most-frequent-token share. Computed
    * per ROW (sort the token array once, fold over it counting the longest
    * equal-run) — whole-stage codegen, NO shuffle, unlike the naive
    * explode + groupBy(doc, token) + max formulation whose shuffle is the
    * corpus size. Output: (id, n_tokens, distinct_ratio, top_share). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    val sorted = array_sort(tk)
    // fold state: (prev token, current run, best run) — max equal-run in a
    // sorted array IS the top token count
    val best = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best")
    )
    docs.select(
      col(idCol),
      size(tk).as("n_tokens"),
      round(size(array_distinct(tk)).cast("double") / size(tk).cast("double"), 6)
        .as("distinct_ratio"),
      round(best.cast("double") / size(tk).cast("double"), 6).as("top_share")
    )
  }

  /** GPT2-style pre-tokenizer regex, simplified to the dialect-portable
    * core: letter runs, digit runs, and single non-alphanumeric marks.
    * The "BPE-ish" token count every budget estimator starts from —
    * whitespace counting undercounts code/punctuation-heavy text. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Per-doc token-budget stats: whitespace tokens vs BPE-ish tokens and
    * their ratio. Pure per-row expressions (codegen, no shuffle). */
  def tokenBudget(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = size(tokens(col(textCol)))
    val bpe = size(regexp_extract_all(col(textCol), lit(BpeishPattern), lit(0)))
    docs.select(
      col(idCol),
      ws.as("n_ws_tokens"),
      bpe.as("n_bpe_tokens"),
      round(bpe.cast("double") / ws.cast("double"), 6).as("bpe_per_ws")
    )
  }

  /** EXACT-mode [[tokenBudget]]: the regex estimate columns plus
    * `n_bpe_exact` from the real merge-table tokenizer
    * ([[bpeCount]]/[[graft.functions.Bpe]]) — what packing (x62), budgets
    * and dedup-by-token-segment actually key off when a model's merge
    * table is at hand. Still pure per-row codegen'd expressions. */
  def tokenBudget(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bpeMerges: Seq[(String, String)]
  ): DataFrame = {
    val ws = size(tokens(col(textCol)))
    val bpe = size(regexp_extract_all(col(textCol), lit(BpeishPattern), lit(0)))
    docs.select(
      col(idCol),
      ws.as("n_ws_tokens"),
      bpe.as("n_bpe_tokens"),
      round(bpe.cast("double") / ws.cast("double"), 6).as("bpe_per_ws"),
      bpeCount(col(textCol), bpeMerges).as("n_bpe_exact")
    )
  }

  /** BPE token strings of `text` under `merges` (GPT-2 byte-level
    * algorithm — see [[graft.functions.Bpe]]). Codegen'd expression. */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeFunctions.bpeTokens(text, merges)

  /** BPE token count — [[bpeTokens]] without the per-row array. */
  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeFunctions.bpeCount(text, merges)

  /** DETOKENIZE a mapped-char BPE token array back to the original
    * string — byte-level BPE's lossless round-trip
    * (`bpeDecode(bpeTokens(text, m)) == text` for ANY merge table; x108
    * gates exactly that corpus-wide). Pure per-row codegen. */
  def bpeDecode(tokens: Column): Column =
    graft.functions.BpeFunctions.bpeDetokenize(tokens)

  /** Byte-mapped GPT-2 pre-token frequency dictionary of a corpus — the
    * structure BPE training actually consumes (Sennrich 2016 trains on
    * the word-frequency dict, never the raw corpus). One explode + one
    * count aggregate; output bounded by the corpus VOCABULARY (Heaps'
    * law), not its size. */
  def bpeWordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(graft.functions.BpeFunctions.bpeWords(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** LEARN a BPE merge table from the corpus — the training loop of
    * Sennrich 2016 / Radford 2019, engine-side: ONE distributed pass
    * builds the pre-token frequency dictionary ([[bpeWordCounts]]); the
    * iterative pair-count/merge loop then runs on that dictionary — the
    * standard trick that makes tokenizer training tractable (the loop
    * touches |vocab| entries, never the corpus). Returns ranked merges
    * ready for [[bpeTokens]]/[[bpeCount]]/[[bpeIds]] — train → tokenize
    * → pack, all in-engine.
    *
    * Deterministic: pair counts are exact longs, and ties break on the
    * lexicographically smallest (left, right) — byte-order comparison,
    * identical in the JVM (BMP code units) and a UTF-8-collating SQL
    * engine, so a replay agrees bit-for-bit. Adjacent pairs count at
    * every position (overlaps included), merges apply left-to-right
    * non-overlapping — the reference dynamics. Stops early when no pair
    * repeats (count < 2 — a merge seen once compresses nothing).
    *
    * 100 TB shape: the corpus cost is the one explode+count aggregate;
    * the driver holds only the dictionary, with a LOUD `require` at
    * `maxVocab` (default 2^20 — GPT-2's dict was ~6M words; raise it
    * deliberately, never silently). */
  def bpeTrain(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 1 << 20
  ): Seq[(String, String)] = {
    require(numMerges >= 1, s"bpeTrain: numMerges must be >= 1, got $numMerges")
    val rows = bpeWordCounts(docs, textCol).limit(maxVocab + 1).collect()
    require(
      rows.length <= maxVocab,
      s"bpeTrain: corpus pre-token vocabulary exceeds maxVocab=$maxVocab — " +
        "raise maxVocab deliberately (the training dictionary is driver-held)"
    )
    // dictionary as (symbol array, count); the loop below never rescans docs
    var dict: Array[(Array[String], Long)] =
      rows.map(r => (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1)))
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      dict.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          val prev = counts.get(key)
          counts.put(key, if (prev == null) cnt else prev + cnt)
          i += 1
        }
      }
      // max count, ties to the lexicographically smallest (a, b)
      var best: (String, String) = null
      var bestC = 1L // a pair must repeat to be worth a merge
      counts.forEach { (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val (a, b) = best
        dict = dict.map { case (syms, cnt) =>
          if (syms.length < 2) (syms, cnt)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), cnt)
          }
        }
        k += 1
      }
    }
    merges.result()
  }

  /** BPE token IDS — what a training dataloader actually consumes:
    * [[bpeTokens]] mapped through a `token string -> vocab id` table.
    * The vocab rides the plan ONCE as a map literal (a GPT-2-scale 50k
    * vocab is a few MB — same budget as the merge-rank table itself), so
    * the whole lookup is a per-row `transform` + `element_at` inside
    * whole-stage codegen: no shuffle, no broadcast join, no UDF.
    *
    * A token absent from the vocab maps to `unkId` when given; with
    * `unkId = None` it raises a loud per-row error (a silent null id
    * corrupts a training sequence), naming the offending token. */
  /** GPT-2-style vocabulary from a merge table (Radford 2019's
    * construction): the 256 byte-alphabet symbols in byte order get ids
    * 0..255, then each merge's concatenated token gets `256 + rank` —
    * so [[bpeTrain]]'s output feeds [[bpeIds]] directly: train → vocab
    * → ids → pack, no hand-built table. Duplicate merged tokens (legal
    * if two merge paths produce the same string; GPT-2's table has
    * none) keep the FIRST (lowest) id, matching the reference encoders'
    * first-wins dict loading. */
  def bpeVocab(merges: Seq[(String, String)]): Map[String, Int] = {
    val base = (0 until 256).map(b => graft.functions.Bpe.ByteToChar(b).toString -> b)
    val merged = merges.zipWithIndex.map { case ((a, b), i) => (a + b) -> (256 + i) }
    (merged.reverse ++ base.reverse).toMap // later wins in toMap → reversed = first wins
  }

  def bpeIds(
      text: Column,
      merges: Seq[(String, String)],
      vocab: Map[String, Int],
      unkId: Option[Int] = None
  ): Column = {
    require(vocab.nonEmpty, "bpeIds: vocab must be non-empty")
    val m = typedlit(vocab)
    transform(
      bpeTokens(text, merges),
      t => {
        val hit = element_at(m, t)
        unkId match {
          case Some(u) => coalesce(hit, lit(u))
          case None =>
            coalesce(
              hit,
              raise_error(concat(lit("bpeIds: token not in vocab: "), t)).cast("int")
            )
        }
      }
    )
  }

  /** Gopher-style composite quality filter: the standard keep/drop
    * pre-training gate combining length, mean token length, lexical
    * diversity, and stopword presence. Thresholds are the knobs; the
    * output keeps the metrics alongside `keep` so downstream can audit
    * drop reasons. Pure per-row expressions — no shuffle. */
  def gopherFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      minMeanTokLen: Double = 2.0,
      maxMeanTokLen: Double = 12.0,
      minDistinctRatio: Double = 0.2,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")
  ): DataFrame = {
    val tk = tokens(col(textCol))
    val nTok = size(tk).cast("double")
    val meanLen = length(regexp_replace(col(textCol), " ", "")).cast("double") / nTok
    val distinctRatio = size(array_distinct(tk)).cast("double") / nTok
    // empty stopword list = criterion disabled, not empty.reduce crash
    val hasStop =
      if (stopwords.isEmpty) lit(true)
      else size(filter(tk, t => stopwords.map(s => t === lit(s)).reduce(_ || _))) > 0
    val keep = nTok >= minTokens && nTok <= maxTokens &&
      meanLen >= minMeanTokLen && meanLen <= maxMeanTokLen &&
      distinctRatio >= minDistinctRatio && hasStop
    docs.select(
      col(idCol),
      nTok.cast("int").as("n_tokens"),
      round(meanLen, 6).as("mean_tok_len"),
      round(distinctRatio, 6).as("distinct_ratio"),
      hasStop.as("has_stopword"),
      keep.as("keep")
    )
  }

  /** Per-document bigram cross-entropy under an add-one-smoothed bigram
    * model fit on the corpus itself — the perplexity-filter primitive of
    * training-data pipelines (low avg log-prob = unnatural token
    * transitions = boilerplate/garbled text). Two corpus aggregations
    * (bigram and context counts) + two joins back to the transition rows,
    * all hash-partitioned on the token keys; vocabulary size arrives as a
    * broadcast scalar. Each transition's log-prob is rounded to 9 dp and
    * decimal-summed so the per-doc mean is exact at any parallelism.
    * Output: (idCol, n_trans, avg_logprob rounded to 6 dp).
    *
    * Smoothing convention: V is the number of distinct CONTEXT types
    * (tokens appearing as w1) — tokens only ever seen in final position
    * (w2-only) are not in V. This differs from the textbook add-one model
    * (V over all token types) by a constant-ish offset per context; ranking
    * behavior, the filter's use case, is unaffected, and the pinned oracle
    * locks this exact convention. */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val trans = docs
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .select(
        col(idCol),
        explode(
          when(
            size(col("tk")) >= 2,
            expr("transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")
          ).otherwise(array().cast("array<struct<w1:string,w2:string>>"))
        ).as("b")
      )
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bigrams = trans.groupBy("w1", "w2").agg(count(lit(1)).as("c_big"))
    val contexts = trans.groupBy("w1").agg(count(lit(1)).as("c_ctx"))
    val vocab = trans.select("w1").distinct().agg(count(lit(1)).as("v"))
    val lp = round(
      log(
        (col("c_big") + 1).cast("double") / (col("c_ctx") + col("v")).cast("double")
      ),
      9
    ).cast(org.apache.spark.sql.types.DecimalType(24, 9))
    trans
      .join(bigrams, Seq("w1", "w2"))
      .join(contexts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(lp).as("slp"))
      .select(
        col(idCol),
        col("n_trans"),
        round(col("slp").cast("double") / col("n_trans"), 6).as("avg_logprob")
      )
  }

  /** Sentence-start marker for the bigram LM ([[trainBigramLm]]): every
    * token gets a left context, so documents of ANY length score (the
    * [[bigramCrossEntropy]] transition form skips 1-token docs). U+0001
    * cannot come out of crawl text that passed [[htmlToText]] (control
    * chars never survive extraction); a raw corpus that legitimately
    * contains it as a whitespace-delimited token would alias the
    * sentence-start context — documented, not guarded, because the guard
    * would cost a full scan. */
  private val LmBos = "\u0001"

  /** The per-token `(prev, tok)` transition rows both LM operators share:
    * tokens with a prepended [[LmBos]], zipped against themselves shifted
    * by one; `carry` columns (the doc id, model key columns) ride along.
    * Pure per-row generator (codegen `slice`/`zip_with`), shuffle
    * ∝ token count only after the caller aggregates. */
  private def bigramRows(docs: DataFrame, carry: Seq[String], textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    val arr = concat(array(lit(LmBos)), tk)
    val n = size(tk)
    docs
      .select(
        carry.map(col) :+
          explode(
            zip_with(
              slice(arr, lit(1), n),
              slice(arr, lit(2), n),
              (p, w) => struct(p.as("prev"), w.as("tok"))
            )
          ).as("__b"): _*
      )
      .select(carry.map(col) :+ col("__b.prev").as("prev") :+ col("__b.tok").as("tok"): _*)
  }

  /** Train a bigram language model — the PERSISTABLE half of the
    * CCNet-style perplexity filter (Wenzek et al. 2020: score crawl text
    * under an LM fit on a trusted REFERENCE corpus; KenLM's role there).
    * Output `(prev, tok, cnt)` is the complete model: context totals and
    * the vocabulary size derive from it ([[perplexityScore]] does), so
    * one parquet table IS the artifact — train once on the reference,
    * score every future batch/stream against it, exactly the
    * [[trainLinear]]→[[scoreLinearSparse]] split for LMs.
    *
    * vs [[bigramCrossEntropy]] (self-fit, one-shot, float `ln` rounded to
    * 9 dp): this form separates fit from apply and scores on the INTEGER
    * Q20 log grid ([[graft.functions.FixedLog2]]), so a model persisted
    * today reproduces bit-identical scores on any engine, any time.
    *
    * `keyCols` trains one INDEPENDENT model per key value in a single
    * pass — `Seq(langCol)` is CCNet proper (one LM per language; Wenzek
    * 2020 trains per-lang Wikipedia KenLMs). The output gains the key
    * columns and every derived quantity ([[perplexityScore]]'s context
    * totals and vocabulary) is computed within the key.
    *
    * 100 TB shape: one token explode + one (keys, prev, tok) count
    * aggregate — map-side partials bound the shuffle by distinct bigrams
    * per partition, never token volume. No collect; the model stays a
    * frame. */
  def trainBigramLm(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      keyCols: Seq[String] = Nil
  ): DataFrame =
    bigramRows(docs, keyCols, textCol)
      .groupBy((keyCols :+ "prev" :+ "tok").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge two [[trainBigramLm]] models — bigram counts are additive, so
    * `mergeBigramLm(train(A), train(B)) == train(A ∪ B)` EXACTLY (spec-
    * pinned), which makes the persisted model an INCREMENTALLY updatable
    * artifact: train on each new reference batch alone and fold it into
    * the stored model, never rescanning history (the minhash/sem index
    * append pattern, for LMs). One union + one (prev, tok) sum — the
    * shuffle is model-sized, not corpus-sized. */
  def mergeBigramLm(a: DataFrame, b: DataFrame, keyCols: Seq[String] = Nil): DataFrame = {
    val cols = keyCols ++ Seq("prev", "tok", "cnt")
    Seq(a, b).foreach(m =>
      require(
        cols.forall(m.columns.contains),
        s"mergeBigramLm: both sides need (${cols.mkString(", ")}) — build them with trainBigramLm"
      )
    )
    a.select(cols.map(col): _*)
      .unionByName(b.select(cols.map(col): _*))
      .groupBy((keyCols :+ "prev" :+ "tok").map(col): _*)
      .agg(sum("cnt").as("cnt"))
  }

  /** Train a TRIGRAM count model — the artifact for [[scoreStupidBackoff]].
    * Output `(prev2, prev1, tok, cnt)` with a DOUBLE [[LmBos]] prefix, so
    * every token has two left contexts and the lower orders DERIVE from
    * this one table: summing over `prev2` reproduces [[trainBigramLm]]'s
    * counts exactly (the single-BOS bigram rows are the tail of each
    * double-BOS trigram row — consistency is by construction, spec-
    * pinned), and summing further gives unigram counts. One artifact,
    * three orders. Counts are additive, so incremental updates are the
    * same union+sum as [[mergeBigramLm]].
    *
    * 100 TB shape: one token explode + one (prev2, prev1, tok) count
    * aggregate — this is exactly the distributed-count setting stupid
    * backoff was designed for (Brants et al., EMNLP 2007). */
  def trainTrigramLm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    val arr = concat(array(lit(LmBos), lit(LmBos)), tk)
    val n = size(tk)
    docs
      .select(
        explode(
          zip_with(
            zip_with(
              slice(arr, lit(1), n),
              slice(arr, lit(2), n),
              (a, b) => struct(a.as("prev2"), b.as("prev1"))
            ),
            slice(arr, lit(3), n),
            (p, w) => struct(p.getField("prev2").as("prev2"), p.getField("prev1").as("prev1"), w.as("tok"))
          )
        ).as("__g")
      )
      .select(col("__g.prev2").as("prev2"), col("__g.prev1").as("prev1"), col("__g.tok").as("tok"))
      .groupBy("prev2", "prev1", "tok")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two [[trainTrigramLm]] models — trigram counts are additive
    * exactly like bigram counts, so `mergeTrigramLm(train(A), train(B))
    * == train(A ∪ B)` EXACTLY (spec-pinned), closing the one asymmetry
    * the round-16 audit flagged: the stupid-backoff artifact is now as
    * incrementally updatable as [[mergeBigramLm]]'s. Because the lower
    * orders DERIVE from the trigram table (sum over `prev2` reproduces
    * [[trainBigramLm]] — x139's consistency contract), a merged trigram
    * model keeps that derivation: derived-bigrams(merge) ==
    * mergeBigramLm(derived-bigrams) == trainBigramLm(A ∪ B), also
    * spec-pinned. One union + one (prev2, prev1, tok) sum — the shuffle
    * is model-sized, not corpus-sized. `keyCols` merges per-key models
    * built from keyed trigram counts (same column contract). */
  def mergeTrigramLm(a: DataFrame, b: DataFrame, keyCols: Seq[String] = Nil): DataFrame = {
    val cols = keyCols ++ Seq("prev2", "prev1", "tok", "cnt")
    Seq(a, b).foreach(m =>
      require(
        cols.forall(m.columns.contains),
        s"mergeTrigramLm: both sides need (${cols.mkString(", ")}) — build them with trainTrigramLm"
      )
    )
    a.select(cols.map(col): _*)
      .unionByName(b.select(cols.map(col): _*))
      .groupBy((keyCols ++ Seq("prev2", "prev1", "tok")).map(col): _*)
      .agg(sum("cnt").as("cnt"))
  }

  /** Stupid-backoff trigram scoring (Brants et al., EMNLP 2007 §4: the
    * smoothing Google built FOR distributed count-based LMs — no
    * discount fitting, no normalization, just relative frequencies with
    * a fixed backoff penalty; "score, not probability" is the documented
    * trade). Per token with contexts (p2, p1):
    *
    *   seen trigram:  nll = lq(ctx3) − lq(cnt3)
    *   seen bigram:   nll = αbits + lq(ctx2) − lq(cnt2)
    *   else:          nll = 2·αbits + lq(N + V) − lq(cnt1 + 1)
    *
    * where every count derives from the ONE [[trainTrigramLm]] table,
    * the final level is add-one-smoothed so unseen tokens stay finite,
    * and α = 2^-alphaShift (αbits = alphaShift·2^20) — Brants' α = 0.4
    * becomes the nearest power of two so the penalty is EXACT on the Q20
    * grid and the whole score replays in external SQL (same recursive-
    * CTE log as x135, plus an integer addend). All [[graft.functions.FixedLog2]]
    * integers: per-doc sums are order-free, hash-exact at any SF.
    *
    * Output: `(idCol, n_tokens, nll_q20, ce_bits)` — the [[perplexityScore]]
    * contract, directly comparable per corpus (lower = closer to the
    * reference).
    *
    * 100 TB shape: the lower-order tables are model-sized aggregates of
    * the trigram table; scoring is the token explode + three left joins
    * on (p2,p1,t)/(p1,t)/(t) and two context joins — standard hash
    * joins, broadcast while the model allows, one per-doc integer sum.
    * Nothing collected, nothing pairwise. */
  def scoreStupidBackoff(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      alphaShift: Int = 1
  ): DataFrame = {
    require(
      Seq("prev2", "prev1", "tok", "cnt").forall(model.columns.contains),
      "scoreStupidBackoff: model needs (prev2, prev1, tok, cnt) — build it with trainTrigramLm"
    )
    require(alphaShift >= 1, s"scoreStupidBackoff: alphaShift must be >= 1, got $alphaShift")
    val tri = materializeModel(
      model.select(col("prev2"), col("prev1"), col("tok"), col("cnt").as("__c3")))
    val bi = tri.groupBy("prev1", "tok").agg(sum("__c3").as("__c2"))
    val uni = bi.groupBy("tok").agg(sum("__c2").as("__c1"))
    val ctx3 = tri.groupBy("prev2", "prev1").agg(sum("__c3").as("__x3"))
    val ctx2 = bi.groupBy("prev1").agg(sum("__c2").as("__x2"))
    val nv = uni.agg((sum("__c1") + countDistinct("tok")).as("__nv"))
    val tk = tokens(col(textCol))
    val arr = concat(array(lit(LmBos), lit(LmBos)), tk)
    val n = size(tk)
    val grams = docs
      .select(
        col(idCol),
        explode(
          zip_with(
            zip_with(
              slice(arr, lit(1), n),
              slice(arr, lit(2), n),
              (a, b) => struct(a.as("prev2"), b.as("prev1"))
            ),
            slice(arr, lit(3), n),
            (p, w) =>
              struct(p.getField("prev2").as("prev2"), p.getField("prev1").as("prev1"), w.as("tok"))
          )
        ).as("__g")
      )
      .select(col(idCol), col("__g.prev2").as("prev2"), col("__g.prev1").as("prev1"), col("__g.tok").as("tok"))
    import graft.functions.LogFunctions.fixedLog2
    val bits = lit(alphaShift.toLong * 1048576L)
    val nll = when(
      col("__c3").isNotNull,
      fixedLog2(col("__x3")) - fixedLog2(col("__c3"))
    ).when(
      col("__c2").isNotNull,
      bits + fixedLog2(col("__x2")) - fixedLog2(col("__c2"))
    ).otherwise(
      bits * 2 + fixedLog2(col("__nv")) - fixedLog2(coalesce(col("__c1"), lit(0L)) + lit(1L))
    )
    nllAggregate(
      grams
        .join(tri, Seq("prev2", "prev1", "tok"), "left")
        .join(ctx3, Seq("prev2", "prev1"), "left")
        .join(bi, Seq("prev1", "tok"), "left")
        .join(ctx2, Seq("prev1"), "left")
        .join(uni, Seq("tok"), "left")
        .crossJoin(broadcast(nv))
        .select(col(idCol), nll.as("__nll")),
      idCol
    )
  }

  /** Score documents under a [[trainBigramLm]] model — per-doc total and
    * per-token negative log-likelihood on the EXACT Q20 integer grid.
    * Add-one smoothing over the model vocabulary: `p(tok|prev) =
    * (cnt + 1) / (ctx(prev) + V)` with `ctx` the model's context totals
    * and `V` its distinct-token count, so unseen bigrams (cnt = 0) and
    * unseen contexts (ctx = 0 — scoring text the reference never saw)
    * stay finite. Per token `nll = log2q20(den) − log2q20(num)`; both
    * logs are [[graft.functions.FixedLog2]] integers, so the per-doc SUM
    * is order-free and the whole score replays bit-for-bit in external
    * SQL (the x135 oracle replays train + score end-to-end, recursive-CTE
    * log included).
    *
    * Output: `(idCol, n_tokens, nll_q20, ce_bits)` where `nll_q20` is the
    * Q20 total and `ce_bits = (nll_q20 div n_tokens) / 2^20` — the
    * floor-to-grid cross-entropy in bits/token (a dyadic double, exact).
    * Perplexity is `2^ce_bits` — left to the consumer because `pow` is
    * not correctly-rounded across engines and the RANKING, which is what
    * filters use, is identical. Docs with NULL text emit no row.
    *
    * `keyCols` scores each doc under ITS key's model (a `trainBigramLm`
    * fit with the same keys — CCNet's per-language LMs): counts,
    * context totals and the vocabulary all resolve within the key.
    * Keys are expected low-cardinality (languages — the per-key vocab
    * frame broadcasts); a doc whose key has no model emits no row.
    *
    * 100 TB shape: token explode, two shuffle joins on the model keys
    * (`(prev, tok)` then `prev` — Spark broadcasts them when the model is
    * small; both sides scale as standard hash joins when it is not), the
    * V scalar via one broadcast aggregate, one per-doc sum. Nothing
    * collected, nothing pairwise. */
  def perplexityScore(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      keyCols: Seq[String] = Nil
  ): DataFrame = {
    require(
      (keyCols ++ Seq("prev", "tok", "cnt")).forall(model.columns.contains),
      s"perplexityScore: model needs (${(keyCols ++ Seq("prev", "tok", "cnt")).mkString(", ")}) " +
        "— build it with trainBigramLm under the same keyCols"
    )
    val mdl = materializeModel(model.select((keyCols ++ Seq("prev", "tok", "cnt")).map(col): _*))
    val ctx = mdl.groupBy((keyCols :+ "prev").map(col): _*).agg(sum("cnt").as("__ctx"))
    val nll = graft.functions.LogFunctions.fixedLog2(
      coalesce(col("__ctx"), lit(0L)) + col("__v")
    ) - graft.functions.LogFunctions.fixedLog2(coalesce(col("cnt"), lit(0L)) + lit(1L))
    val grams = bigramRows(docs, idCol +: keyCols, textCol)
    val withV =
      if (keyCols.isEmpty)
        grams.crossJoin(broadcast(mdl.agg(countDistinct(col("tok")).as("__v"))))
      else {
        // per-key vocabulary; a doc whose key has NO model emits no row
        // (no defined probability under that key), documented contract
        val vByKey = mdl
          .groupBy(keyCols.map(col): _*)
          .agg(countDistinct(col("tok")).as("__v"))
        grams.join(broadcast(vByKey), keyCols)
      }
    nllAggregate(
      withV
        .join(mdl, keyCols ++ Seq("prev", "tok"), "left")
        .join(ctx, keyCols :+ "prev", "left")
        .select(col(idCol), nll.as("__nll")),
      idCol
    )
  }

  /** The shared per-doc tail of every LM scorer: token count, Q20 NLL
    * total, and the floor-to-grid cross-entropy in bits/token. Expects a
    * `(idCol, __nll)` frame. */
  private def nllAggregate(scored: DataFrame, idCol: String): DataFrame =
    scored
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__nll")).as("nll_q20"))
      .select(
        col(idCol),
        col("n_tokens"),
        col("nll_q20"),
        (expr("nll_q20 div n_tokens").cast("double") / lit(1048576.0)).as("ce_bits")
      )

  /** `T + V` with the ADVICE-r16 empty-model guard: a keyCols = Nil score
    * against an EMPTY model still emits one global-aggregate row with
    * `__t = __v = 0`, which would reach `fixedLog2(0)` and throw the
    * misleading "corrupted count" error — raise loudly naming the real
    * cause instead. Plan-level (a `when` + `raise_error`), so the guard
    * costs no extra pass; keyed mode drops such docs cleanly per the
    * documented contract and stays unguarded. */
  private def emptyModelGuard(op: String, keyCols: Seq[String]): Column = {
    val tv = col("__t") + col("__v")
    if (keyCols.nonEmpty) tv
    else
      when(
        tv === 0L,
        raise_error(
          lit(s"$op: empty model (0 bigram types, 0 vocabulary) — train it with trainBigramLm on a non-empty corpus")
        ).cast("long")
      ).otherwise(tv)
  }

  /** Excess-perplexity data selection (the RHO-1 / DoReMi "excess loss"
    * signal, Lin et al. 2024 §3.1, at document granularity): score every
    * doc under TWO [[trainBigramLm]] artifacts — a trusted REFERENCE
    * model and a SELF model fit on the raw corpus itself — and rank by
    * `excess = ce_self − ce_ref`. A large positive excess means the
    * reference distribution predicts the doc well but the corpus's own
    * distribution does not: high-quality AND under-represented, the
    * upweight set; a large negative excess is corpus-typical text the
    * reference disfavors (boilerplate, spam), the downweight set.
    *
    * Both scores are [[perplexityScore]]'s add-one Q20 integers, so
    * `excess_bits` — a difference of two dyadic doubles — is EXACT and
    * the ranking replays bit-for-bit in external SQL. Consumers select
    * with `orderBy(desc("excess_bits"), idCol).limit(n)`, which Spark
    * plans as TakeOrderedAndProject: no global sort materializes.
    *
    * Output: `(idCol, n_tokens, ref_nll_q20, self_nll_q20, ref_ce_bits,
    * self_ce_bits, excess_bits)`. `keyCols` routes BOTH scores through
    * per-key models (CCNet-style per-language references) — both models
    * must then carry the keys, and a doc whose key is missing from
    * EITHER model emits no row (inner join of the two score frames).
    *
    * 100 TB shape: two independent [[perplexityScore]] passes (each a
    * token explode + model-keyed joins + one per-doc integer sum) and
    * one equi-join on the doc id — no new shuffle class; the self model
    * is the only corpus-derived frame and it stays model-sized. */
  def excessPerplexity(
      docs: DataFrame,
      refModel: DataFrame,
      selfModel: DataFrame,
      idCol: String,
      textCol: String,
      keyCols: Seq[String] = Nil
  ): DataFrame = {
    val r = perplexityScore(docs, refModel, idCol, textCol, keyCols)
      .select(
        col(idCol),
        col("n_tokens"),
        col("nll_q20").as("ref_nll_q20"),
        col("ce_bits").as("ref_ce_bits")
      )
    val s = perplexityScore(docs, selfModel, idCol, textCol, keyCols)
      .select(
        col(idCol),
        col("nll_q20").as("self_nll_q20"),
        col("ce_bits").as("self_ce_bits")
      )
    r.join(s, Seq(idCol))
      .select(
        col(idCol),
        col("n_tokens"),
        col("ref_nll_q20"),
        col("self_nll_q20"),
        col("ref_ce_bits"),
        col("self_ce_bits"),
        (col("self_ce_bits") - col("ref_ce_bits")).as("excess_bits")
      )
  }

  /** Vocabulary growth curve (Heaps' law audit): distinct word types and
    * total tokens, cumulative over `nBuckets` ordinal slices of the
    * corpus — the tokenizer-planning instrument (is the type inventory
    * still growing at the corpus tail, i.e. does the BPE vocab budget
    * cover the long tail?) and a drift canary (a flattening-then-jumping
    * curve marks a new domain entering the crawl).
    *
    * The slice is `floor(id·nBuckets / (max_id + 1))` — a pure function
    * of the doc id against ONE broadcast scalar, standing in for
    * ingestion order; no global row-number window. Each type counts
    * once, in the FIRST bucket containing it (`min(bucket)` per token —
    * one token-keyed aggregate, the same shuffle class as a vocabulary
    * count), so `sum(new_types)` over any prefix IS the distinct-type
    * count of that prefix. The cumulative window runs on the nBuckets-row
    * aggregate, never the corpus. Empty buckets (sparse ids) emit no row.
    *
    * Output: `(bucket, n_docs, bucket_tokens, cum_tokens, new_types,
    * cum_types)`, ordered nowhere — consumers sort the tiny frame. */
  def vocabGrowth(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int = 20
  ): DataFrame = {
    require(nBuckets >= 1, s"vocabGrowth: nBuckets must be >= 1, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val mx = docs.agg((max(col(idCol)) + 1L).as("__mx"))
    // ADVICE r17: quote the id column (backtick-safe), widen the product to
    // decimal(38,0) (a raw long id near Long.MaxValue/nBuckets overflows
    // id*nBuckets), and require nonnegative ids at plan level — `div`
    // truncates toward zero, which equals the oracle's floor `//` only for
    // nonnegative operands
    val idQ = "`" + idCol.replace("`", "``") + "`"
    val bucketed = docs
      .crossJoin(broadcast(mx))
      .select(
        // integer division keeps the slice exact at any id magnitude (a
        // double divide loses ulps past 2^53 and the oracle uses `//`)
        when(
          col(idCol) < 0,
          raise_error(concat(
            lit("vocabGrowth: ids must be nonnegative, got "),
            col(idCol).cast("string")))
        ).otherwise(
          expr(s"(cast($idQ as decimal(38,0)) * $nBuckets) div __mx"))
          .as("__b"),
        col(textCol)
      )
    val toks = bucketed.select(col("__b"), explode(tokens(col(textCol))).as("__tok"))
    val perBucket = bucketed
      .select(col("__b"), size(tokens(col(textCol))).cast("long").as("__nt"))
      .groupBy("__b")
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("bucket_tokens"))
    val firstSeen = toks
      .groupBy("__tok")
      .agg(min("__b").as("__fb"))
      .groupBy(col("__fb").as("__b"))
      .agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    perBucket
      .join(firstSeen, Seq("__b"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .select(
        col("__b").as("bucket"),
        col("n_docs"),
        col("bucket_tokens"),
        sum("bucket_tokens").over(w).as("cum_tokens"),
        col("new_types"),
        sum("new_types").over(w).as("cum_types")
      )
  }

  /** Pairwise vocabulary overlap between corpus partitions (languages,
    * sources): distinct word types per key, Jaccard over each key pair —
    * the mixture-design diagnostic (how much subword budget do two
    * languages actually share? which two sources are near-mirrors?).
    * Pairs sharing ZERO types emit no row (inner join on the type).
    *
    * Output: `(key_a, key_b, n_a, n_b, n_shared, jaccard)` with
    * `key_a < key_b`, jaccard rounded to 6 dp.
    *
    * 100 TB shape: one distinct-(key, type) pass (the vocabulary frame —
    * model-sized, types not tokens), one type-keyed self-join whose
    * per-type fan-out is bounded by the KEY cardinality (a type in k of
    * K keys yields C(k,2) ≤ C(K,2) pair rows — K is languages/sources,
    * single digits), one C(K,2)-row aggregate. Nothing corpus-pairwise. */
  def vocabOverlap(docs: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val st = docs
      .select(col(keyCol).as("__k"), explode(tokens(col(textCol))).as("__tok"))
      .distinct()
    val sizes = st.groupBy("__k").agg(count(lit(1)).as("__n"))
    val inter = st
      .select(col("__k").as("key_a"), col("__tok"))
      .join(st.select(col("__k").as("key_b"), col("__tok")), "__tok")
      .filter(col("key_a") < col("key_b"))
      .groupBy("key_a", "key_b")
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(broadcast(sizes.select(col("__k").as("key_a"), col("__n").as("n_a"))), "key_a")
      .join(broadcast(sizes.select(col("__k").as("key_b"), col("__n").as("n_b"))), "key_b")
      .select(
        col("key_a"),
        col("key_b"),
        col("n_a"),
        col("n_b"),
        col("n_shared"),
        round(
          col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")),
          6
        ).as("jaccard")
      )
  }

  /** The joined per-token stat frame every continuation-interpolated
    * scorer starts from: document bigram rows against the model's counts
    * (`cnt`), context totals and fan-outs (`__ctx`, `__nv`), continuation
    * counts (`__cw`), and the per-key scalars (`__t` bigram types, `__v`
    * vocabulary) — broadcast, since keys are languages at most. Shared by
    * [[scoreJelinekMercer]] and [[scoreWittenBell]] (KN builds the same
    * frame plus its discount columns). */
  /** Materialize a DERIVED model frame once (eager `localCheckpoint`) so
    * the 3–6 model-sized aggregates every scorer derives from it (context
    * totals, fan-outs, continuation counts, vocab/discount scalars) read
    * stored rows instead of each re-running the corpus-sized count build.
    * The r18 stage profile showed the bigram/trigram explode+count
    * executing once PER derived aggregate (x139: six ~350 ms single-task
    * corpus passes for one score call — exchange reuse does not bridge
    * separately planned aggregates), which this collapses to one.
    *
    * A frame that is already storage-backed — a parquet/file scan, a
    * checkpoint RDD, or a local relation, possibly under
    * projection/filter: the persisted-artifact serving shape, including
    * per-batch streaming scoring against a stored model — passes through
    * untouched, so deployments never pay a copy. When the model IS built
    * inline, the checkpoint is model-sized: strictly smaller than even
    * one of the rebuilds it replaces, at any scale.
    *
    * EAGERNESS NOTE (ADVICE r18): constructing a scorer DataFrame over an
    * inline-built model runs the model-build job HERE, at composition
    * time, and holds the materialized blocks until the frame is GC'd —
    * a deliberate lazy-to-eager trade. Library callers who compose
    * scoring frames they may never execute should pass a stored model
    * (the passthrough below costs nothing). */
  private def materializeModel(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
    def storageBacked(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case pj: org.apache.spark.sql.catalyst.plans.logical.Project => storageBacked(pj.child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => storageBacked(f.child)
      // spark.table(...) / .as(...) wrap stored models in an alias; without
      // this case an already-persisted model behind an alias would pay a
      // redundant model-sized checkpoint (ADVICE r18)
      case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => storageBacked(a.child)
      case _ => false
    }
    if (storageBacked(df.queryExecution.analyzed)) df else df.stageCheckpoint()
  }

  private def contStatJoin(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      keyCols: Seq[String]
  ): DataFrame = {
    val mdl = materializeModel(model.select((keyCols ++ Seq("prev", "tok", "cnt")).map(col): _*))
    val ctx = mdl
      .groupBy((keyCols :+ "prev").map(col): _*)
      .agg(sum("cnt").as("__ctx"), count(lit(1)).as("__nv"))
    val cw = mdl.groupBy((keyCols :+ "tok").map(col): _*).agg(count(lit(1)).as("__cw"))
    val glob = mdl
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__t"), countDistinct(col("tok")).as("__v"))
    val grams = bigramRows(docs, idCol +: keyCols, textCol)
    val withG =
      if (keyCols.isEmpty) grams.crossJoin(broadcast(glob))
      else grams.join(broadcast(glob), keyCols)
    withG
      .join(mdl, keyCols ++ Seq("prev", "tok"), "left")
      .join(ctx, keyCols :+ "prev", "left")
      .join(cw, keyCols :+ "tok", "left")
  }

  /** Jelinek–Mercer interpolated scoring over a [[trainBigramLm]]
    * artifact (Jelinek & Mercer 1980; Chen & Goodman 1999 §2's simplest
    * interpolated smoother): a FIXED dyadic mixing weight instead of
    * KN's estimated discount —
    *
    *   seen v:   p = λ·c(v,w)/c(v) + (1−λ)·p_cont(w)
    *   unseen v: p = p_cont(w)
    *
    * with λ = lambdaQ/2^lambdaShift on the dyadic grid and the SAME
    * add-one continuation distribution as [[scoreKneserNey]]
    * (`p_cont(w) = (N1+(·w)+1)/(T+V)`) as the lower order, so every
    * statistic still derives from the one `(prev, tok, cnt)` table and
    * the artifact stays incrementally mergeable. Exact-grid integers:
    *
    *   num = λq·c(v,w)·(T+V) + (2^S−λq)·c(v)·(N1+(·w)+1)
    *   nll = S·2^20 + lq(c(v)) + lq(T+V) − lqDec(num)
    *
    * num ≥ 1 by construction (λq ≤ 2^S−1 keeps the second term ≥ 1);
    * it reaches ~2^98 at 100 TB counts so it rides DECIMAL(38,0) through
    * [[graft.functions.FixedLog2.log2q20Dec]] like KN's. Same output
    * contract and keyed semantics as [[perplexityScore]].
    *
    * 100 TB shape: identical to [[scoreKneserNey]] — model-sized stat
    * aggregates, token explode + three left joins + one broadcast scalar
    * frame + one per-doc integer sum. */
  def scoreJelinekMercer(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      lambdaQ: Long = 1L,
      lambdaShift: Int = 1,
      keyCols: Seq[String] = Nil
  ): DataFrame = {
    require(
      (keyCols ++ Seq("prev", "tok", "cnt")).forall(model.columns.contains),
      s"scoreJelinekMercer: model needs (${(keyCols ++ Seq("prev", "tok", "cnt")).mkString(", ")}) " +
        "— build it with trainBigramLm under the same keyCols"
    )
    require(
      lambdaShift >= 1 && lambdaShift <= 20,
      s"scoreJelinekMercer: lambdaShift must be in [1, 20], got $lambdaShift — " +
        "past 20 the count·2^S product would erode the 100 TB count headroom"
    )
    val two = 1L << lambdaShift
    require(
      lambdaQ >= 1 && lambdaQ <= two - 1,
      s"scoreJelinekMercer: lambdaQ must be in [1, ${two - 1}] at lambdaShift=$lambdaShift, got $lambdaQ"
    )
    val c = coalesce(col("cnt"), lit(0L))
    val x = coalesce(col("__ctx"), lit(0L))
    val cwp1 = coalesce(col("__cw"), lit(0L)) + lit(1L)
    val tv = emptyModelGuard("scoreJelinekMercer", keyCols)
    val seen = x > 0L
    val dec = "decimal(38,0)"
    // every factor is cast to decimal BEFORE multiplying: c·2^S alone can
    // pass 2^63 at 100 TB counts with a large lambdaShift — the long
    // intermediate would wrap silently
    val numRaw = when(
      seen,
      c.cast(dec) * lit(lambdaQ).cast(dec) * tv.cast(dec)
        + x.cast(dec) * lit(two - lambdaQ).cast(dec) * cwp1.cast(dec)
    ).otherwise(cwp1.cast(dec))
    val num = when(
      numRaw.isNull,
      raise_error(lit("scoreJelinekMercer: decimal(38,0) numerator overflow — corrupted counts?"))
        .cast(dec)
    ).otherwise(numRaw)
    import graft.functions.LogFunctions.{fixedLog2, fixedLog2Dec}
    val nll = when(seen, lit(lambdaShift.toLong << 20) + fixedLog2(x) + fixedLog2(tv))
      .otherwise(fixedLog2(tv)) - fixedLog2Dec(num)
    nllAggregate(
      contStatJoin(docs, model, idCol, textCol, keyCols).select(col(idCol), nll.as("__nll")),
      idCol
    )
  }

  /** Witten–Bell scoring over a [[trainBigramLm]] artifact (Witten &
    * Bell 1991, method C; Chen & Goodman 1999 §2): the mixing weight is
    * ESTIMATED per context from its type fan-out — contexts with many
    * distinct successors trust the lower order more —
    *
    *   seen v:   p = [c(v,w) + T(v)·p_cont(w)] / [c(v) + T(v)]
    *   unseen v: p = p_cont(w)
    *
    * with `T(v) = N1+(v·)` the context's distinct-successor count and
    * the same add-one continuation distribution as [[scoreKneserNey]].
    * No dyadic snap needed — the weights `c(v)/(c(v)+T(v))` are already
    * exact count ratios:
    *
    *   num = c(v,w)·(T+V) + N1+(v·)·(N1+(·w)+1)
    *   nll = lq(c(v) + N1+(v·)) + lq(T+V) − lqDec(num)
    *
    * num ≥ 1 by construction (a seen context has `N1+(v·) ≥ 1`); the
    * products are SMALLER than KN's (no 2^S factor) and ride the same
    * DECIMAL(38,0) ladder. Same output contract and keyed semantics as
    * [[perplexityScore]]; same 100 TB shape as [[scoreKneserNey]]. */
  def scoreWittenBell(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      keyCols: Seq[String] = Nil
  ): DataFrame = {
    require(
      (keyCols ++ Seq("prev", "tok", "cnt")).forall(model.columns.contains),
      s"scoreWittenBell: model needs (${(keyCols ++ Seq("prev", "tok", "cnt")).mkString(", ")}) " +
        "— build it with trainBigramLm under the same keyCols"
    )
    val c = coalesce(col("cnt"), lit(0L))
    val x = coalesce(col("__ctx"), lit(0L))
    val nv = coalesce(col("__nv"), lit(0L))
    val cwp1 = coalesce(col("__cw"), lit(0L)) + lit(1L)
    val tv = emptyModelGuard("scoreWittenBell", keyCols)
    val seen = x > 0L
    val dec = "decimal(38,0)"
    // nv·(cw+1) can pass 2^63 at 100 TB type counts — cast each factor
    // to decimal before multiplying, never the long product
    val numRaw = when(
      seen,
      c.cast(dec) * tv.cast(dec) + nv.cast(dec) * cwp1.cast(dec)
    ).otherwise(cwp1.cast(dec))
    val num = when(
      numRaw.isNull,
      raise_error(lit("scoreWittenBell: decimal(38,0) numerator overflow — corrupted counts?"))
        .cast(dec)
    ).otherwise(numRaw)
    import graft.functions.LogFunctions.{fixedLog2, fixedLog2Dec}
    val nll = when(seen, fixedLog2(x + nv) + fixedLog2(tv))
      .otherwise(fixedLog2(tv)) - fixedLog2Dec(num)
    nllAggregate(
      contStatJoin(docs, model, idCol, textCol, keyCols).select(col(idCol), nll.as("__nll")),
      idCol
    )
  }

  /** Interpolated Kneser–Ney scoring over a [[trainBigramLm]] artifact —
    * the quality standard among count smoothers (Kneser & Ney 1995; Chen &
    * Goodman 1999's empirical winner), on the SAME exact Q20 integer grid
    * as [[perplexityScore]], so per-doc NLL sums stay order-free and the
    * whole score replays bit-for-bit in external SQL. No new training op:
    * every KN statistic derives from the one `(prev, tok, cnt)` table —
    * context totals `c(v)`, context fan-outs `N1+(v·)`, continuation
    * counts `N1+(·w)`, bigram-type total `T`, vocabulary `V`, and the
    * Chen–Goodman discount `D = n1/(n1+2·n2)` — so the persisted model
    * stays incrementally mergeable ([[mergeBigramLm]]).
    *
    * Exact-grid formulation: `D` is snapped to the dyadic grid
    * `dq/2^discountShift`, `dq = clamp(floor(2^S·n1/(n1+2n2)), 1, 2^S-1)`
    * (D = 1/2 when `n1+2n2 = 0` — a corpus with no count-1/2 bigram types
    * gives the estimator no evidence; the midpoint is the documented
    * fallback). The continuation distribution carries add-one mass so
    * unseen TOKENS stay finite: `p_cont(w) = (N1+(·w)+1)/(T+V)`. Then per
    * token with context `v`:
    *
    *   seen v:   p = [ (c(v,w)·2^S − dq)⁺·(T+V) + dq·N1+(v·)·(N1+(·w)+1) ]
    *                 / [ 2^S · c(v) · (T+V) ]
    *   unseen v: p = p_cont(w)
    *
    * Numerator and denominator are INTEGERS; `nll = S·2^20 + lq(c(v)) +
    * lq(T+V) − lqDec(num)` (per-FACTOR logs — the defined function, not a
    * claim that lq distributes over ×). The numerator reaches ~2^90 at
    * 100 TB counts (`c·2^S·(T+V)`), past any long — it rides a
    * `DECIMAL(38,0)` (2^126 headroom; overflow would need ~3·10^17 tokens,
    * 4 orders past 100 TB) through [[graft.functions.FixedLog2.log2q20Dec]],
    * the 128-bit widening of the Q20 recurrence. Positivity is by
    * construction: `dq ≥ 1` makes both branches ≥ 1.
    *
    * `keyCols` scores each doc under ITS key's model (per-language KN —
    * the CCNet deployment shape), all statistics within-key; a doc whose
    * key has no model emits no row (the [[perplexityScore]] contract).
    *
    * `modified = true` is Chen & Goodman's MODIFIED Kneser–Ney (1999 §3,
    * their empirical winner over plain KN): three count-conditioned
    * discounts instead of one —
    *
    *   D1 = Y = n1/(n1+2n2)   (the identity 1 − 2Y·n2/n1 = Y)
    *   D2 = 2 − 3Y·n3/n2      D3 = 3 − 4Y·n4/n3   (D3 for cnt ≥ 3)
    *   λ(v) = (D1·N1(v) + D2·N2(v) + D3·N3+(v)) / c(v)
    *
    * each snapped to the same Q-`discountShift` grid, `dq_k` clamped to
    * `[1, k·2^S − 1]` (keeps every branch's numerator ≥ 1), with the
    * `(2k−1)·2^(S−1)` midpoint (k − ½) whenever the estimator has no
    * evidence (`n_k = 0`, `n_{k+1} = 0`, or `n1+2n2 = 0` — the plain-KN
    * fallback convention extended per level). The discount-formula
    * products (`3·2^S·n1·n3`) can reach ~2^94 at 100 TB type counts, so
    * they ride DECIMAL(38,0) with an integral `div`; the quotient is
    * grid-small. Same output, same replayability (the oracle computes
    * the identical HUGEINT expressions).
    *
    * Output: `(idCol, n_tokens, nll_q20, ce_bits)` — directly comparable
    * with [[perplexityScore]]/[[scoreStupidBackoff]] rows.
    *
    * 100 TB shape: the model-derived stat frames are model-sized
    * aggregates (broadcast while small, standard hash joins when not);
    * scoring is the token explode + three left joins + one broadcast of
    * the per-key scalar frame + one per-doc integer sum. Nothing
    * collected, nothing pairwise. */
  def scoreKneserNey(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      discountShift: Int = 10,
      keyCols: Seq[String] = Nil,
      modified: Boolean = false
  ): DataFrame = {
    require(
      (keyCols ++ Seq("prev", "tok", "cnt")).forall(model.columns.contains),
      s"scoreKneserNey: model needs (${(keyCols ++ Seq("prev", "tok", "cnt")).mkString(", ")}) " +
        "— build it with trainBigramLm under the same keyCols"
    )
    require(
      discountShift >= 1 && discountShift <= 20,
      s"scoreKneserNey: discountShift must be in [1, 20], got $discountShift — " +
        "past 20 the cnt*2^S product would erode the 100 TB count headroom"
    )
    val two = 1L << discountShift
    val k = keyCols.map(col)
    val mdl = materializeModel(model.select((keyCols ++ Seq("prev", "tok", "cnt")).map(col): _*))
    // per-context totals AND fan-outs in one aggregate: model rows are
    // distinct (prev, tok), so count(*) per prev IS N1+(v·); the modified
    // form also needs the count-conditioned fan-outs N1/N2/N3+(v·)
    val baseCtx = mdl.groupBy((keyCols :+ "prev").map(col): _*)
    val ctx =
      if (!modified) baseCtx.agg(sum("cnt").as("__ctx"), count(lit(1)).as("__nv"))
      else
        baseCtx.agg(
          sum("cnt").as("__ctx"),
          sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("__nv1"),
          sum(when(col("cnt") === 2L, 1L).otherwise(0L)).as("__nv2"),
          sum(when(col("cnt") >= 3L, 1L).otherwise(0L)).as("__nv3")
        )
    val cw = mdl.groupBy((keyCols :+ "tok").map(col): _*).agg(count(lit(1)).as("__cw"))
    // per-key scalars: type total T, vocab V, and the snapped discount(s).
    // D1 uses the plain-KN formula (the 1 − 2Y·n2/n1 = Y identity); D2/D3
    // products can reach ~2^94 at 100 TB type counts, so the formula rides
    // DECIMAL(38,0) with an integral div (grid-small quotient), midpoint
    // k − ½ fallback when the estimator has no evidence at that level
    val dqExpr = when(col("__n1") + lit(2L) * col("__n2") === 0L, lit(two / 2))
      .otherwise(
        least(
          greatest(expr(s"(__n1 * ${two}L) div (__n1 + 2L * __n2)"), lit(1L)),
          lit(two - 1)
        )
      )
    def dqK(kk: Int, nk: String, nk1: String): Column =
      when(
        col("__n1") + lit(2L) * col("__n2") === 0L || col(nk) === 0L || col(nk1) === 0L,
        lit((2L * kk - 1) * (two / 2))
      ).otherwise(
        least(
          greatest(
            lit(kk * two) - expr(
              s"(CAST($kk + 1 AS DECIMAL(38,0)) * ${two}L * __n1 * $nk1) div " +
                s"(CAST(__n1 + 2L * __n2 AS DECIMAL(38,0)) * $nk)"
            ),
            lit(1L)
          ),
          lit(kk * two - 1)
        )
      )
    val baseGlob = mdl
      .groupBy(k: _*)
      .agg(
        count(lit(1)).as("__t"),
        countDistinct(col("tok")).as("__v"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("cnt") === 2L, 1L).otherwise(0L)).as("__n2"),
        sum(when(col("cnt") === 3L, 1L).otherwise(0L)).as("__n3"),
        sum(when(col("cnt") === 4L, 1L).otherwise(0L)).as("__n4")
      )
    val glob =
      if (!modified)
        baseGlob
          .withColumn("__dq", dqExpr.cast("long"))
          .select((k :+ col("__t") :+ col("__v") :+ col("__dq")): _*)
      else
        baseGlob
          .withColumn("__dq1", dqExpr.cast("long"))
          .withColumn("__dq2", dqK(2, "__n2", "__n3").cast("long"))
          .withColumn("__dq3", dqK(3, "__n3", "__n4").cast("long"))
          .select(
            (k :+ col("__t") :+ col("__v")
              :+ col("__dq1") :+ col("__dq2") :+ col("__dq3")): _*
          )
    val grams = bigramRows(docs, idCol +: keyCols, textCol)
    val withG =
      if (keyCols.isEmpty) grams.crossJoin(broadcast(glob))
      else grams.join(broadcast(glob), keyCols)
    val c = coalesce(col("cnt"), lit(0L))
    val x = coalesce(col("__ctx"), lit(0L))
    val cwp1 = coalesce(col("__cw"), lit(0L)) + lit(1L)
    val tv = emptyModelGuard("scoreKneserNey", keyCols)
    val seen = x > 0L
    val dec = "decimal(38,0)"
    val numRaw =
      if (!modified) {
        val nv = coalesce(col("__nv"), lit(0L))
        when(
          seen,
          greatest(c * lit(two) - col("__dq"), lit(0L)).cast(dec) * tv.cast(dec)
            + (col("__dq") * nv).cast(dec) * cwp1.cast(dec)
        ).otherwise(cwp1.cast(dec))
      } else {
        val dqSel = when(c === 1L, col("__dq1")).when(c === 2L, col("__dq2"))
          .otherwise(col("__dq3"))
        val lamNum = col("__dq1").cast(dec) * coalesce(col("__nv1"), lit(0L)).cast(dec) +
          col("__dq2").cast(dec) * coalesce(col("__nv2"), lit(0L)).cast(dec) +
          col("__dq3").cast(dec) * coalesce(col("__nv3"), lit(0L)).cast(dec)
        when(
          seen,
          greatest(c * lit(two) - dqSel, lit(0L)).cast(dec) * tv.cast(dec)
            + lamNum * cwp1.cast(dec)
        ).otherwise(cwp1.cast(dec))
      }
    // the only null source after the coalesces above is a decimal-38
    // overflow (~3·10^17 tokens) — fail loudly, never a silent null NLL
    val num = when(
      numRaw.isNull,
      raise_error(lit("scoreKneserNey: decimal(38,0) numerator overflow — corrupted counts?"))
        .cast(dec)
    ).otherwise(numRaw)
    import graft.functions.LogFunctions.{fixedLog2, fixedLog2Dec}
    val nll = when(seen, lit(discountShift.toLong << 20) + fixedLog2(x) + fixedLog2(tv))
      .otherwise(fixedLog2(tv)) - fixedLog2Dec(num)
    nllAggregate(
      withG
        .join(mdl, keyCols ++ Seq("prev", "tok"), "left")
        .join(ctx, keyCols :+ "prev", "left")
        .join(cw, keyCols :+ "tok", "left")
        .select(col(idCol), nll.as("__nll")),
      idCol
    )
  }

  /** CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.3):
    * PER-LANGUAGE perplexity terciles under a reference LM — the
    * composition of [[perplexityScore]] with [[scoreBuckets]]' boundary
    * machinery, partitioned by language because perplexity scales are not
    * comparable across languages. head = lowest cross-entropy (closest to
    * the reference), the bucket CCNet keeps preferentially.
    *
    * Boundaries come from ONE grouped quantile aggregate
    * ([[Quantiles.quantiles]]; `exact = false` sketch default for the
    * 100 TB path, `exact = true` the oracle-replayable opt-in) joined
    * back broadcast — the lang-cardinality boundary frame is tiny. The
    * per-row tag is a pure compare on the dyadic-exact `ce_bits`.
    *
    * `smoothing` picks the scorer over the same model artifact:
    * `"addone"` ([[perplexityScore]], the replayable baseline),
    * `"kn"` ([[scoreKneserNey]], the quality standard — CCNet as
    * actually deployed uses a proper LM, and KN is the count-model
    * equivalent), `"jm"` ([[scoreJelinekMercer]] at its default dyadic
    * λ) or `"wb"` ([[scoreWittenBell]]). All four are exact-grid, so
    * the tercile compares stay wobble-free whichever smoother the
    * deployment standardizes on. */
  def perplexityBuckets(
      docs: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      exact: Boolean = false,
      accuracy: Int = 10000,
      keyCols: Seq[String] = Nil,
      smoothing: String = "addone",
      discountShift: Int = 10,
      modified: Boolean = false
  ): DataFrame = {
    // ADVICE r17: discountShift/modified are KN-only knobs — silently
    // ignoring them under jm/wb/addone would let a caller believe they
    // tuned something; refuse loudly instead (JM's lambda is tunable via
    // scoreJelinekMercer directly)
    require(
      smoothing == "kn" || (discountShift == 10 && !modified),
      s"perplexityBuckets: discountShift/modified only apply to smoothing='kn' " +
        s"(got smoothing='$smoothing', discountShift=$discountShift, modified=$modified); " +
        "for JM lambda tuning call scoreJelinekMercer directly"
    )
    // ADVICE r16: discountShift/modified plumb through to the KN scorer so
    // modified-KN terciles are reachable from the bucket composition;
    // defaults match scoreKneserNey's, so existing calls are unchanged
    val scored = smoothing match {
      case "addone" => perplexityScore(docs, model, idCol, textCol, keyCols)
      case "kn" =>
        scoreKneserNey(docs, model, idCol, textCol, discountShift, keyCols, modified)
      case "jm" => scoreJelinekMercer(docs, model, idCol, textCol, keyCols = keyCols)
      case "wb" => scoreWittenBell(docs, model, idCol, textCol, keyCols = keyCols)
      case other =>
        throw new IllegalArgumentException(
          s"perplexityBuckets: smoothing must be 'addone', 'kn', 'jm' or 'wb', got '$other'")
    }
    // materialized ONCE: the per-doc scored frame feeds BOTH the boundary
    // quantiles and the tagged output — without the checkpoint each branch
    // re-runs the full scoring pass (token explode + model joins) over the
    // corpus. The checkpoint is the narrow (id, scores, lang) frame, the
    // same corpus-sized-but-thin materialization the x122/x162 operators
    // already make; guide §5 trade, measured 2x on the bucket family
    val sc = scored
      .join(docs.select(col(idCol), col(langCol)), Seq(idCol))
      .stageCheckpoint()
    val bounds = Quantiles
      .quantiles(sc, Seq(langCol), "ce_bits", Seq(1.0 / 3, 2.0 / 3), exact, accuracy)
    val bCols = bounds.columns.filterNot(_ == langCol)
    val bd = bounds.select(col(langCol), col(bCols(0)).as("__blo"), col(bCols(1)).as("__bhi"))
    sc.join(broadcast(bd), Seq(langCol))
      .withColumn("bucket", bucketTag(col("ce_bits"), col("__blo"), col("__bhi")))
      .drop("__blo", "__bhi")
  }

  /** Per-document top-`k` TF-IDF terms. tf = term count in doc; idf =
    * ln((N+1)/(df+1)) with df = #docs containing the term. Three shuffles
    * total — (doc,term) count, per-term df, per-doc top-k window — each
    * hash-partitioned on its key; N arrives as a broadcast scalar subquery,
    * never a driver-side count. Returns (doc_id-named idCol, term, tf,
    * tfidf rounded to 6 dp, rank). */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.agg(count(lit(1)).as("__N"))
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol).orderBy(desc("tfidf"), col("term"))
    tf.join(df_, "term")
      .crossJoin(broadcast(n))
      .withColumn(
        "tfidf",
        round(
          col("tf").cast("double") *
            log((col("__N") + 1).cast("double") / (col("df") + 1).cast("double")),
          6
        )
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("tfidf"), col("rank"))
  }

  /** BM25 top-k retrieval (Robertson–Spärck Jones, the Lucene-standard
    * formulation): `score(q,d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) /
    * (tf + k1·(1−b+b·len_d/avgdl))` with
    * `idf(t) = ln(1 + (N−df+0.5)/(df+0.5))`. Query terms are
    * DEDUPLICATED (the short-query convention — no query-side tf
    * weighting). The retrieval primitive the curation stack composes
    * with: find the corpus docs most similar to an eval item
    * (lexical-side decontamination triage), to a seed set (targeted
    * data selection), or to a blocklisted exemplar.
    *
    * 100 TB shape: a query NEVER meets the corpus — queries explode to
    * (qid, term) rows and meet the (doc, term, tf) postings in one hash
    * join on the term (both df and postings are already partitioned by
    * term, so the df attach adds no exchange); per-(qid, doc) scores
    * aggregate map-side; the per-query winners come from the bounded
    * [[Relational.topKPerKey]] heap, so only k docs per query survive
    * any stage. Per-term contributions are rounded to 6 dp and summed
    * as DECIMAL — exact and associative, so the score is identical at
    * any parallelism (a raw double sum is partial-aggregation-order
    * dependent). Stop-word-heavy corpora should pre-filter the postings
    * (a hot term's postings list is the skew unit, exactly as in
    * [[invertedIndex]]).
    *
    * `idCol` must be numeric (the heap's tie-break negates it: ties on
    * score break toward the SMALLEST doc id). Returns
    * `(qidCol, rk, idCol, score)`. */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      idCol: String,
      textCol: String,
      qidCol: String,
      queryCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(k >= 1, s"bm25TopK: k must be >= 1, got $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bm25TopK: bad parameters k1=$k1 b=$b")
    val tok = docs.select(col(idCol), tokens(col(textCol)).as("__tk"))
    val tf = tok
      .select(col(idCol), size(col("__tk")).as("__len"), explode(col("__tk")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("__len")).as("__len"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = tok.agg(count(lit(1)).as("__N"), sum(size(col("__tk"))).as("__SL"))
    val qterms = queries
      .select(col(qidCol), explode(array_distinct(tokens(col(queryCol)))).as("term"))
    val avgdl = col("__SL").cast("double") / col("__N")
    // k1+1 computed at runtime from the same literal both engines parse —
    // a pre-folded Scala `k1 + 1` can differ from SQL `1.2 + 1` by 1 ulp
    val contrib = round(
      log(lit(1.0) + (col("__N") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * (lit(k1) + lit(1.0))) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__len") / avgdl)),
      6
    ).cast(org.apache.spark.sql.types.DecimalType(28, 6))
    val scored = qterms
      .join(tf, "term")
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col(qidCol), col(idCol), contrib.as("__c"))
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(col("__c")).cast("double"), 6).as("score"))
    Relational
      .topKPerKey(
        scored,
        Seq(qidCol),
        struct(col("score"), (-col(idCol)).as("__nd")),
        k,
        rankCol = "rk"
      )
      .select(col(qidCol), col("rk"), (-col("__nd")).as(idCol), col("score"))
  }

  /** Sequence-packing index: assign every document its token offset in the
    * concatenate-then-chunk training layout (GPT-style packing — documents
    * are concatenated per `groupCols` stream in ascending `idCol` order and
    * sliced into `seqLen`-token windows). Emits, per document:
    * `n_tokens`, `seq_id` (the window holding its first token) and
    * `seq_off` (offset within that window). A doc whose tokens spill the
    * window boundary continues into `seq_id + 1` — exactly the layout a
    * packed-dataloader reproduces, so this IS the global shuffle-free index
    * for "which sequence does doc d land in".
    *
    * 100 TB shape: packing is inherently sequential per stream, so the
    * running offset is a window cumulative sum PARTITIONED BY the stream
    * key — each stream sorts independently (one range-partitioned sort per
    * group, no global order). At corpus scale, shard the stream key so no
    * single stream exceeds a task's sort budget (e.g. group by
    * (source, day)); the per-shard indexes are independent by
    * construction. */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      groupCols: Seq[String],
      textCol: String,
      seqLen: Int
  ): DataFrame =
    packSequences(docs, idCol, groupCols, size(tokens(col(textCol))).cast("long"), seqLen)

  /** [[packSequences]] with a caller-supplied token-count Column — pass
    * `bpeCount(col(text), merges).cast("long")` to pack on EXACT
    * merge-table token counts instead of the whitespace estimate (the
    * layout a real packed dataloader reproduces only matches when the
    * counts are the model tokenizer's). */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      groupCols: Seq[String],
      nTokens: Column,
      seqLen: Int
  ): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen must be positive, got $seqLen")
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(
        (col(idCol) +: groupCols.map(col)) :+
          nTokens.as("n_tokens"): _*
      )
      .withColumn("tok_start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        (col(idCol) +: groupCols.map(col)) ++ Seq(
          col("n_tokens"),
          floor(col("tok_start") / lit(seqLen.toLong)).cast("long").as("seq_id"),
          pmod(col("tok_start"), lit(seqLen.toLong)).as("seq_off")
        ): _*
      )
  }

  /** Overlapping token-window chunking — the context-window prep stage
    * (RAG passage splitting, long-doc pretraining windows): chunk `k`
    * covers tokens `[k·stride, k·stride + window)`; the last chunk may be
    * short, and every token is covered when `stride <= window`. Emits one
    * row per chunk: `(idCol, chunk_id, chunk_text, n_chunk_tokens)`.
    *
    * 100 TB shape: a pure per-row transform + explode — fan-out is
    * ceil(n/stride) per doc, no shuffle, no state; pairs with
    * [[packSequences]] (which packs whole docs) when the unit is the
    * chunk. */
  def chunkDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int
  ): DataFrame = {
    require(window >= 1, s"chunkDocs: window must be >= 1, got $window")
    require(
      stride >= 1 && stride <= window,
      s"chunkDocs: need 1 <= stride <= window, got stride=$stride window=$window"
    )
    val tk = tokens(col(textCol))
    val chunks = transform(
      // chunk starts 0, stride, 2·stride, … strictly below n (n>=1 always:
      // split('') yields [''], so every doc emits at least chunk 0).
      // floor, not Column./ alone: that is DOUBLE division
      sequence(lit(0), floor((size(tk) - 1) / lit(stride)).cast("int")),
      k => struct(
        k.as("chunk_id"),
        array_join(slice(tk, k * stride + 1, lit(window)), " ").as("chunk_text"),
        least(size(tk) - k * stride, lit(window)).as("n_chunk_tokens")
      )
    )
    docs
      // null text emits ZERO chunk rows: the explicit isNotNull gate makes
      // the column null, which explode drops — without it, non-ANSI
      // size(null) = -1 semantics would run the sequence DESCENDING and
      // fabricate garbage chunks
      .select(col(idCol), explode(when(tk.isNotNull, chunks)).as("__c"))
      .select(
        col(idCol),
        col("__c.chunk_id").cast("long").as("chunk_id"),
        col("__c.chunk_text"),
        col("__c.n_chunk_tokens")
      )
  }

  /** Feature hashing (the "hashing trick"): project term frequencies into
    * a fixed `dim`-bucket signed vector with NO vocabulary — bucket and
    * sign derive from disjoint bits of the portable 60-bit md5 token hash
    * ([[graft.operators.Dedup.tokenHash60]]), so the mapping is identical
    * on every engine and every run, needs no fitted dictionary, and the
    * signed sum makes collisions unbiased (E[x·y] preserved — Weinberger
    * et al.). Output is the SPARSE form `(id, bucket, w)` with exact
    * integer weights; densify with [[hashedTfDense]] to feed the
    * cosine/ANN operators.
    *
    * 100 TB shape: one explode + one groupBy(id, bucket) with map-side
    * combine — output bounded by `|docs| x dim` regardless of vocabulary
    * size, and no vocabulary table is ever built, broadcast, or fitted. */
  def hashedTf(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"hashedTf: dim must be positive, got $dim")
    val h = Dedup.tokenHash60(col("tok"))
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .select(
        col(idCol),
        // shiftright, NOT `/ 2`: Column `/` is DOUBLE division, which
        // rounds 60-bit hashes past the 53-bit mantissa
        (shiftright(h, 1) % dim).cast("long").as("bucket"),
        when(h % 2 === 1, lit(1L)).otherwise(lit(-1L)).as("sign")
      )
      .groupBy(col(idCol), col("bucket"))
      .agg(sum("sign").as("w"))
  }

  /** Dense `array<double>` form of [[hashedTf]] — one row per doc, ready
    * for cosine / ANN / quantization. Per-doc map assembly only (bounded
    * by `dim`), no shuffle beyond hashedTf's aggregate. */
  def hashedTfDense(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    hashedTf(docs, idCol, textCol, dim)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("w")))).as("__m"))
      .select(
        col(idCol),
        expr(s"transform(sequence(0, $dim - 1), i -> CAST(coalesce(__m[CAST(i AS BIGINT)], 0) AS DOUBLE))")
          .as("features")
      )

  /** Logit of a fasttext-style LINEAR quality classifier over hashed
    * term-frequency features, as ONE column expression:
    * `bias + Σ_tok sign(tok) · weights[bucket(tok)]` with bucket/sign from
    * the same portable md5 mapping as [[hashedTf]] — so a model trained on
    * hashedTf features scores without materializing the feature vector.
    *
    * 100 TB shape: the weights ride the plan as a literal array and the
    * whole score is a per-row fold over the token array — NO shuffle, no
    * broadcast join, no feature materialization; stays inside whole-stage
    * codegen. Sized for literal-friendly dims (≤ ~64k buckets); for
    * fasttext-scale bucket counts use [[scoreLinearSparse]]. Exactness
    * note: weights on a small binary grid (k/256) make the fold
    * order-independent — integer token counts times exact fractions sum
    * exactly, which is what lets an external engine replay the score
    * bit-for-bit. */
  def linearLogit(text: Column, weights: Array[Double], bias: Double): Column = {
    val dim = weights.length
    require(dim > 0, "linearLogit: weights must be non-empty")
    val wLit = typedlit(weights.toSeq)
    // null text scores `bias` (not NULL), matching scoreLinearSparse's
    // left-join + coalesce path — the two engine paths must agree exactly
    aggregate(
      coalesce(tokens(text), typedlit(Seq.empty[String])),
      lit(bias),
      (acc, tok) => {
        val h = Dedup.tokenHash60(tok)
        val sgn = when(h % 2 === 1, lit(1.0)).otherwise(lit(-1.0))
        // shiftright, NOT `/ 2` (see hashedTf); element_at is 1-based
        acc + sgn * element_at(wLit, ((shiftright(h, 1) % dim) + 1).cast("int"))
      }
    )
  }

  /** Learned-quality-filter scoring (the CCNet/RefinedWeb/DCLM-style
    * classifier stage that runs beside the rule-based [[qualityExpr]]):
    * appends `logit` ([[linearLogit]]) and `keep` (logit >= 0) to the
    * input. Pure per-row expressions — all input columns survive. */
  def scoreLinear(
      docs: DataFrame,
      textCol: String,
      weights: Array[Double],
      bias: Double
  ): DataFrame = {
    val clash = docs.columns.toSet.intersect(Set("logit", "keep"))
    require(
      clash.isEmpty,
      s"scoreLinear: input already has ${clash.mkString(", ")} — withColumn would silently overwrite"
    )
    docs
      .withColumn("logit", linearLogit(col(textCol), weights, bias))
      .withColumn("keep", col("logit") >= 0)
  }

  /** [[scoreLinear]] for bucket counts too large to ride the plan as a
    * literal (fasttext defaults to 2M buckets): sparse hashed features
    * ([[hashedTf]], exact integer weights) joined to a BROADCAST
    * `(bucket, weight)` table, one per-doc sum. Buckets absent from the
    * table weigh 0. Returns `(idCol, logit, keep)` — docs with no tokens
    * in weighted buckets score `bias` via the left join, never vanish.
    *
    * 100 TB shape: hashedTf's one groupBy(id, bucket) with map-side
    * combine + a broadcast hash join (weights ≤ tens of MB) + one
    * groupBy(id) — output and shuffle bounded by |docs| x dim, no
    * vocabulary, no driver loop. */
  def scoreLinearSparse(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weightsDf: DataFrame,
      dim: Int,
      bias: Double
  ): DataFrame = {
    val dots = hashedTf(docs, idCol, textCol, dim)
      .join(broadcast(weightsDf.select(col("bucket"), col("weight"))), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("w") * col("weight")).as("__dot"))
    docs
      .select(col(idCol))
      .join(dots, Seq(idCol), "left")
      .select(
        col(idCol),
        (coalesce(col("__dot"), lit(0.0)) + lit(bias)).as("logit"),
        (coalesce(col("__dot"), lit(0.0)) + lit(bias) >= 0).as("keep")
      )
  }

  /** A trained [[trainLinear]] model: integer weight NUMERATORS on the
    * `2^-scaleShift` dyadic grid (`weight_b = weightNums(b) / 2^k`), so
    * the floats handed to [[scoreLinear]]/[[scoreLinearSparse]] are exact
    * dyadic values and every downstream score stays order-independent —
    * the same exactness contract the fixed x88 `k/256` weights satisfy. */
  final case class LinearModel(weightNums: Array[Long], biasNum: Long, scaleShift: Int) {
    private def scale: Double = (1L << scaleShift).toDouble
    def dim: Int = weightNums.length
    def weights: Array[Double] = weightNums.map(_ / scale)
    def bias: Double = biasNum / scale

    /** `(bucket, w_num, weight)` frame — bucket −1 is the bias row; the
      * bucket ≥ 0 rows feed [[scoreLinearSparse]] unchanged. */
    def frame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      (weightNums.zipWithIndex.map { case (wn, b) => (b.toLong, wn) } :+ (-1L, biasNum))
        .toSeq
        .toDF("bucket", "w_num")
        .select(col("bucket"), col("w_num"), (col("w_num") / lit(scale)).as("weight"))
    }
  }

  /** In-engine TRAINING of the linear quality classifier — the missing
    * fourth side of the quality-filter loop (score = [[scoreLinear]],
    * calibrate = [[calibrationSweep]], select = [[scoreBuckets]] /
    * [[graft.operators.Scale.selectByBudget]]): a fasttext-style logit
    * over [[hashedTf]] features (Joulin et al. 2016; the CCNet /
    * RefinedWeb / DCLM quality-filter stage) fitted by full-batch
    * gradient descent on the hard-sigmoid logistic surrogate, in EXACT
    * INTEGER arithmetic so every step is deterministically replayable by
    * an external engine:
    *
    *  - weights live as integer numerators `W_b` on the `2^-k` grid
    *    (`k = scaleShift`); features are [[hashedTf]]'s exact signed
    *    counts, so the per-doc margin numerator `M = B + Σ W_b·x_b` is
    *    one int64 fold (ANSI: overflow throws, never wraps);
    *  - the sigmoid is the HARD sigmoid `p = clamp(½ + m/4, 0, 1)`
    *    (Courbariaux et al. 2015's σ_hard) — numerator
    *    `P = clamp(2^(k+1) + M, 0, 2^(k+2))`, still an integer, unlike
    *    `exp` whose cross-engine rounding is not reproducible;
    *  - residual `R = P − y·2^(k+2)`; per-bucket gradient sums
    *    `G_b = Σ_docs R·x_b` (+ `G_bias = Σ R`) accumulate in ONE
    *    map-side [[graft.functions.VecSum128]] aggregate per step —
    *    128-bit limbs, so the sum is exact at any corpus size and equal
    *    to DuckDB's HUGEINT `SUM` bit-for-bit;
    *  - update `ΔW_b = sign(G_b)·(|G_b| div (2^(s+2)·N))` with
    *    `lr = 2^-s` — BigInt symmetric-truncating division, snapping
    *    each step back onto the weight grid (the gradient MEAN times the
    *    dyadic learning rate, truncated toward zero identically in every
    *    engine).
    *
    * 100 TB shape: the dense integer feature frame (`(dim+1)·8` bytes a
    * doc) is built by ONE [[hashedTf]] pass + per-doc map assembly and
    * `localCheckpoint(true)`-ed; each of the `steps` iterations is then
    * a single map-side aggregate over it producing `2·(dim+1)` longs per
    * partition — no shuffle of doc rows, no vocabulary, and the only
    * driver state is the dim-bounded weight vector (the kmeansFit
    * model-collect precedent). Labels must be 0/1 (validated, loud).
    * `dim ≤ 65536` keeps the weight literal plan-friendly — the
    * fasttext-2M-bucket regime trains the same way but is deliberately
    * out of scope for the literal path ([[scoreLinearSparse]] documents
    * the scoring half of that trade). */
  def trainLinear(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int,
      steps: Int,
      lrShift: Int = 4,
      scaleShift: Int = 20
  ): LinearModel = {
    require(dim > 0 && dim <= 65536, s"trainLinear: dim must be in [1, 65536], got $dim")
    require(steps >= 1 && steps <= 128, s"trainLinear: steps must be in [1, 128], got $steps")
    require(lrShift >= 0 && lrShift <= 24, s"trainLinear: lrShift must be in [0, 24], got $lrShift")
    require(
      scaleShift >= 1 && scaleShift <= 24,
      s"trainLinear: scaleShift must be in [1, 24], got $scaleShift"
    )
    val clash = docs.columns.toSet.intersect(Set("__m", "__x", "__y"))
    require(
      clash.isEmpty,
      s"trainLinear: input already has ${clash.mkString(", ")} — internal columns would collide"
    )
    val tfMap = hashedTf(docs, idCol, textCol, dim)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("w")))).as("__m"))
    // dense integer features + label, materialized ONCE (localCheckpoint:
    // blocks are ContextCleaner-freed when the frame is dropped, and the
    // `steps` re-reads never recompute the hashedTf shuffle)
    val dense = docs
      .select(col(idCol), col(labelCol).cast("long").as("__y"))
      .join(tfMap, Seq(idCol), "left")
      .select(
        col("__y"),
        expr(
          s"transform(sequence(0, ${dim - 1}), " +
            "i -> coalesce(__m[CAST(i AS BIGINT)], CAST(0 AS BIGINT)))"
        ).as("__x")
      )
      .stageCheckpoint()
    // one job for both guards (row count + bad-label count), not two
    val guardRow = dense
      .agg(
        count(lit(1)).as("__n"),
        sum(
          when(col("__y").isNull || (col("__y") =!= 0L && col("__y") =!= 1L), 1L).otherwise(0L)
        ).as("__bad")
      )
      .collect()(0)
    val n = guardRow.getLong(0)
    require(n > 0, "trainLinear: empty corpus")
    val badLabels = guardRow.getLong(1)
    require(
      badLabels == 0,
      s"trainLinear: $badLabels rows have labels outside {0, 1} — a mislabeled gradient " +
        "is silent corruption, refuse loudly"
    )
    val pHalf = 1L << (scaleShift + 1)
    val pMax = 1L << (scaleShift + 2)
    val d = (BigInt(1) << (lrShift + 2)) * n
    val w = Array.fill(dim)(0L)
    var b = 0L
    var step = 0
    while (step < steps) {
      val wLit = typedlit(w.toSeq)
      val mCol = aggregate(
        zip_with(col("__x"), wLit, (x, wc) => x * wc),
        lit(b),
        (acc, e) => acc + e
      )
      val rCol = greatest(least(lit(pHalf) + mCol, lit(pMax)), lit(0L)) - col("__y") * lit(pMax)
      val limbs = dense
        .select(col("__x"), rCol.as("__r"))
        .agg(
          graft.functions.VecAggFunctions
            .vecSum128(concat(transform(col("__x"), t => col("__r") * t), array(col("__r"))), dim + 1)
            .as("__g")
        )
        .collect()(0)
        .getAs[collection.Seq[Long]](0)
      val g = graft.functions.VecAggFunctions.decode128(limbs)
      var i = 0
      while (i <= dim) {
        val delta = ((g(i).abs / d) * g(i).signum).toLong
        if (i < dim) w(i) -= delta else b -= delta
        i += 1
      }
      // margin headroom: |M| ≤ (Σ_b |W_b| + |B|)·max_tf must stay inside
      // int64 — enforce a loud per-weight bound far before that point
      require(
        w.forall(v => math.abs(v) < (1L << 44)) && math.abs(b) < (1L << 44),
        "trainLinear: weight numerators exceeded 2^44 — margin arithmetic would risk " +
          "int64 overflow; lower steps/lr or raise lrShift"
      )
      step += 1
    }
    LinearModel(w, b, scaleShift)
  }

  /** [[trainLinear]] as a frame surface: the trained `(bucket, w_num,
    * weight)` table (bucket −1 = bias) — the shape [[scoreLinearSparse]]
    * consumes and the oracle replays. */
  def trainLinearWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int,
      steps: Int,
      lrShift: Int = 4,
      scaleShift: Int = 20
  ): DataFrame =
    trainLinear(docs, idCol, textCol, labelCol, dim, steps, lrShift, scaleShift)
      .frame(docs.sparkSession)

  /** [[trainLinear]] with SPARSE gradient accumulation — the same exact
    * integer GD loop (identical margin, hard sigmoid, residual, and
    * truncating update, so the returned [[LinearModel]] is BIT-IDENTICAL
    * to the dense path's on any corpus; spec-pinned), but the feature
    * pass stays nnz-proportional instead of `O(N·dim)`:
    *
    *  - the checkpointed frame holds each doc's [[hashedTf]] entries as a
    *    sparse `(bucket, count)` array (+ one bias entry), so the one
    *    materialization costs `O(Σ nnz)` — at fasttext-scale dims the
    *    dense path's `(dim+1)·8` bytes/doc (~512 KB/doc at 64k, more
    *    above) would dwarf the corpus text, which is exactly the regime
    *    this path exists for;
    *  - per step, the margin is a per-row fold over the doc's OWN entries
    *    against the weight-array literal (no shuffle), and the gradient
    *    sums `G_b = Σ R·x_b` come from ONE bucket-keyed aggregate of the
    *    exploded entries — shuffle volume ∝ nnz (map-side partials bound
    *    it further by distinct-buckets-per-partition), summed as
    *    `DECIMAL(38,0)` (exact to 10^38, the same integer every engine
    *    computes), collected as ≤ dim+1 rows (absent buckets have G=0).
    *
    * Regime split vs [[trainLinear]]: the dense path's per-step aggregate
    * is shuffle-FREE (one VecSum128 over the checkpointed vectors) and
    * wins at classifier-typical dims where `N·dim` is cheap; this path
    * pays one nnz-sized shuffle per step but never materializes a dense
    * vector, so its ceiling is the fasttext bucket regime
    * (`dim ≤ 2^21`). The per-step weight literal is `dim·8` bytes riding
    * the task binary (~16 MB at the ceiling) — driver→executor broadcast
    * per step, not a shuffle. */
  def trainLinearSparse(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int,
      steps: Int,
      lrShift: Int = 4,
      scaleShift: Int = 20
  ): LinearModel = {
    require(dim > 0 && dim <= (1 << 21), s"trainLinearSparse: dim must be in [1, 2^21], got $dim")
    require(steps >= 1 && steps <= 128, s"trainLinearSparse: steps must be in [1, 128], got $steps")
    require(lrShift >= 0 && lrShift <= 24, s"trainLinearSparse: lrShift must be in [0, 24], got $lrShift")
    require(
      scaleShift >= 1 && scaleShift <= 24,
      s"trainLinearSparse: scaleShift must be in [1, 24], got $scaleShift"
    )
    val clash = docs.columns.toSet.intersect(Set("__e", "__y", "__r", "__m"))
    require(
      clash.isEmpty,
      s"trainLinearSparse: input already has ${clash.mkString(", ")} — internal columns would collide"
    )
    val tfEntries = hashedTf(docs, idCol, textCol, dim)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("bucket").as("key"), col("w").as("value"))).as("__e"))
    // sparse integer features + label, materialized ONCE (O(Σ nnz), the
    // whole point; localCheckpoint blocks are ContextCleaner-freed when
    // the frame is dropped, and the `steps` re-reads never recompute the
    // hashedTf shuffle)
    val sparse = docs
      .select(col(idCol), col(labelCol).cast("long").as("__y"))
      .join(tfEntries, Seq(idCol), "left")
      .select(
        col("__y"),
        coalesce(col("__e"), array().cast("array<struct<key:bigint,value:bigint>>")).as("__e")
      )
      .stageCheckpoint()
    // one job for both guards (row count + bad-label count), not two
    val guardRow = sparse
      .agg(
        count(lit(1)).as("__n"),
        sum(
          when(col("__y").isNull || (col("__y") =!= 0L && col("__y") =!= 1L), 1L).otherwise(0L)
        ).as("__bad")
      )
      .collect()(0)
    val n = guardRow.getLong(0)
    require(n > 0, "trainLinearSparse: empty corpus")
    val badLabels = guardRow.getLong(1)
    require(
      badLabels == 0,
      s"trainLinearSparse: $badLabels rows have labels outside {0, 1} — a mislabeled " +
        "gradient is silent corruption, refuse loudly"
    )
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pHalf = 1L << (scaleShift + 1)
    val pMax = 1L << (scaleShift + 2)
    val d = (BigInt(1) << (lrShift + 2)) * n
    val w = Array.fill(dim)(0L)
    var b = 0L
    var step = 0
    while (step < steps) {
      val wLit = typedlit(w.toSeq)
      // per-doc margin numerator: fold the doc's OWN entries (integer
      // adds — order-free, identical to the dense full-vector fold)
      val mCol = aggregate(
        col("__e"),
        lit(b),
        (acc, e) => acc + e.getField("value") * element_at(wLit, e.getField("key").cast("int") + 1)
      )
      val rCol = greatest(least(lit(pHalf) + mCol, lit(pMax)), lit(0L)) - col("__y") * lit(pMax)
      // ONE bucket-keyed aggregate of the exploded entries (+ a bias
      // entry per doc): G_b = Σ R·x_b, G_bias = Σ R — exact decimal sums,
      // ≤ dim+1 result rows (the same model-bounded collect class as the
      // weight vector itself)
      val biasEntry = array(struct(lit(-1L).as("key"), lit(1L).as("value")))
      val g = sparse
        .select(explode(concat(col("__e"), biasEntry)).as("kv"), rCol.as("__r"))
        .groupBy(col("kv.key").as("__k"))
        .agg(sum((col("kv.value") * col("__r")).cast(dec)).as("__g"))
        .collect()
        .map(r => (r.getLong(0), BigInt(r.getDecimal(1).toBigInteger)))
      g.foreach { case (k, gk) =>
        val delta = ((gk.abs / d) * gk.signum).toLong
        if (k >= 0L) w(k.toInt) -= delta else b -= delta
      }
      // same loud margin-headroom bound as the dense path
      require(
        w.forall(v => math.abs(v) < (1L << 44)) && math.abs(b) < (1L << 44),
        "trainLinearSparse: weight numerators exceeded 2^44 — margin arithmetic would " +
          "risk int64 overflow; lower steps/lr or raise lrShift"
      )
      step += 1
    }
    LinearModel(w, b, scaleShift)
  }

  /** Sharded local-SGD trainer — the WALL-CLOCK shape of [[trainLinear]]
    * for huge corpora (local SGD / FedAvg-style model averaging, McMahan
    * et al. 2017): instead of `steps` full-corpus aggregates, each of
    * `rounds` passes runs `localSteps` exact integer GD steps INSIDE each
    * of `nShards` deterministic shards (shard = hash(id) mod nShards — a
    * pure function of the id, so membership never depends on input
    * partitioning), then merges the shard models by exact integer
    * averaging (Σ numerators, symmetric truncating division by the shard
    * count — order-free, deterministic at any parallelism).
    *
    * Contract vs the oracle-exact core: with `nShards = 1, rounds = 1`
    * the single shard IS the full corpus, so the result is BIT-IDENTICAL
    * to `trainLinear(steps = localSteps)` (spec-pinned). Multi-shard
    * results differ from full-batch GD (that's the point — local steps
    * trade exact replayability for fewer corpus passes) but remain fully
    * DETERMINISTIC: same corpus → same model, any partitioning (also
    * spec-pinned). Gate quality with a planted-separability check, not a
    * SQL replay.
    *
    * 100 TB shape: ONE shard-keyed shuffle total — the sparse O(Σ nnz)
    * feature frame is repartitioned by shard BEFORE its localCheckpoint,
    * so every round is a shuffle-free scan of the checkpointed blocks
    * (mapPartitions groups the co-located shards in memory and runs the
    * local loop); at `rounds = R` that is R−1 fewer corpus-sized
    * exchanges than a per-round groupByKey. Size shards so a PARTITION
    * (possibly several hash-colliding shards) fits an executor
    * (`nShards` ≥ corpus_bytes / executor_mem; jointly guarded with dim
    * so the driver merge stays bounded). Driver state: one (dim+1)-long
    * vector per shard per round. */
  def trainLinearSgd(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int,
      nShards: Int,
      rounds: Int,
      localSteps: Int,
      lrShift: Int = 4,
      scaleShift: Int = 20
  ): LinearModel = {
    // same fasttext ceiling as trainLinearSparse: the per-shard dense
    // weight array is dim·8 bytes of TASK state (not per-doc storage) and
    // the current model rides the closure once per round — 16 MB at the
    // ceiling, fine for a per-round broadcast
    require(dim > 0 && dim <= (1 << 21), s"trainLinearSgd: dim must be in [1, 2^21], got $dim")
    require(nShards >= 1 && nShards <= 65536, s"trainLinearSgd: nShards must be in [1, 65536]")
    // JOINT bound: the per-round merge collects nShards·(dim+1) longs to
    // the driver — each cap is individually fine, but together they'd
    // accept a ~1 TB collect (65536 shards × 2^21 dims). 2^27 longs
    // (1 GB) keeps every sane combination (dim 64 → all 65536 shards;
    // dim 2^21 → 63 shards) and refuses the absurd corner loudly.
    require(
      nShards.toLong * (dim + 1L) <= (1L << 27),
      s"trainLinearSgd: nShards·(dim+1) = ${nShards.toLong * (dim + 1L)} exceeds 2^27 — " +
        "the per-round driver merge would collect that many longs; lower nShards or dim"
    )
    require(rounds >= 1 && rounds <= 64, s"trainLinearSgd: rounds must be in [1, 64], got $rounds")
    require(
      localSteps >= 1 && localSteps <= 128,
      s"trainLinearSgd: localSteps must be in [1, 128], got $localSteps"
    )
    require(lrShift >= 0 && lrShift <= 24, s"trainLinearSgd: lrShift must be in [0, 24]")
    require(scaleShift >= 1 && scaleShift <= 24, s"trainLinearSgd: scaleShift must be in [1, 24]")
    val clash = docs.columns.toSet.intersect(Set("__e", "__y", "__s", "__m"))
    require(
      clash.isEmpty,
      s"trainLinearSgd: input already has ${clash.mkString(", ")} — internal columns would collide"
    )
    val spark = docs.sparkSession
    import spark.implicits._
    val tfEntries = hashedTf(docs, idCol, textCol, dim)
      .groupBy(col(idCol))
      // tuple-encoder field names so the typed view below resolves
      .agg(collect_list(struct(col("bucket").as("_1"), col("w").as("_2"))).as("__e"))
    // repartition BY SHARD before the checkpoint: every round is then a
    // shuffle-free scan of the checkpointed blocks (all rows of a shard
    // are physically co-located), instead of re-shuffling the corpus per
    // round through a groupByKey exchange — at rounds=R that's R-1 fewer
    // nnz-sized shuffles. A task buffers its PARTITION (possibly several
    // hash-colliding shards), so size nShards against executor memory
    // with that in mind.
    val sparse = docs
      .select(col(idCol), col(labelCol).cast("long").as("__y"))
      .join(tfEntries, Seq(idCol), "left")
      .select(
        pmod(xxhash64(col(idCol)), lit(nShards.toLong)).cast("int").as("__s"),
        col("__y"),
        coalesce(col("__e"), array().cast("array<struct<_1:bigint,_2:bigint>>")).as("__e")
      )
      .repartition(nShards.min(4096), col("__s"))
      .stageCheckpoint()
    require(sparse.count() > 0, "trainLinearSgd: empty corpus")
    val badLabels = sparse
      .filter(col("__y").isNull || (col("__y") =!= 0L && col("__y") =!= 1L))
      .count()
    require(
      badLabels == 0,
      s"trainLinearSgd: $badLabels rows have labels outside {0, 1} — a mislabeled gradient " +
        "is silent corruption, refuse loudly"
    )
    val ds = sparse
      .select(col("__s").as("_1"), col("__y").as("_2"), col("__e").as("_3"))
      .as[(Int, Long, Seq[(Long, Long)])]
    val pHalf = BigInt(1) << (scaleShift + 1)
    val pMax = BigInt(1) << (scaleShift + 2)
    var w = Array.fill(dim)(0L)
    var b = 0L
    var round = 0
    while (round < rounds) {
      val (w0, b0) = (w, b) // captured by the task closure
      // per shard: buffer the shard's sparse rows ONCE, run localSteps
      // exact integer GD steps over them (identical arithmetic to
      // trainLinear: margin fold, hard-sigmoid residual, BigInt gradient
      // sums, truncating mean update — order-free, so the partition
      // iterator's nondeterministic order cannot leak into the model).
      // mapPartitions, NOT groupByKey: the frame is already hash-
      // partitioned by __s, so each round reads the checkpoint blocks
      // with ZERO exchange and groups the (few) co-located shards
      // in-memory
      val shardModels = ds
        .mapPartitions { it =>
          it.toArray.groupBy(_._1).iterator.map { case (_, shardRows) =>
            val rows = shardRows.map { case (_, y, e) => (y, e.toArray) }
            val nL = rows.length.toLong
            val dL = (BigInt(1) << (lrShift + 2)) * nL
            val wl = w0.clone()
            var bl = b0
            var st = 0
            while (st < localSteps) {
              val g = Array.fill(dim + 1)(BigInt(0))
              rows.foreach { case (y, e) =>
                var m = BigInt(bl)
                e.foreach { case (k, v) => m += BigInt(v) * wl(k.toInt) }
                val r = (pHalf + m).max(BigInt(0)).min(pMax) - BigInt(y) * pMax
                e.foreach { case (k, v) => g(k.toInt) += r * v }
                g(dim) += r
              }
              var i = 0
              while (i <= dim) {
                val delta = (g(i).abs / dL) * g(i).signum
                if (i < dim) wl(i) = (BigInt(wl(i)) - delta).toLong
                else bl = (BigInt(bl) - delta).toLong
                i += 1
              }
              st += 1
            }
            wl :+ bl
          }
        }
        .collect() // ≤ nShards rows of (dim+1) longs — bounded by construction
      // exact integer averaging across shards: Σ numerators is an exact
      // BigInt sum (order-free), symmetric truncating division snaps back
      // onto the weight grid identically in every run
      val k = BigInt(shardModels.length)
      val merged = Array.tabulate(dim + 1) { i =>
        val s = shardModels.foldLeft(BigInt(0))((acc, m) => acc + m(i))
        ((s.abs / k) * s.signum).toLong
      }
      w = merged.take(dim)
      b = merged(dim)
      require(
        w.forall(v => math.abs(v) < (1L << 44)) && math.abs(b) < (1L << 44),
        "trainLinearSgd: weight numerators exceeded 2^44 — margin arithmetic would risk " +
          "int64 overflow; lower rounds/localSteps or raise lrShift"
      )
      round += 1
    }
    LinearModel(w, b, scaleShift)
  }

  /** [[trainLinearSparse]] as a frame surface — the same `(bucket, w_num,
    * weight)` table shape as [[trainLinearWeights]]. */
  def trainLinearSparseWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      dim: Int,
      steps: Int,
      lrShift: Int = 4,
      scaleShift: Int = 20
  ): DataFrame =
    trainLinearSparse(docs, idCol, textCol, labelCol, dim, steps, lrShift, scaleShift)
      .frame(docs.sparkSession)

  /** Bounded inverted index: one output row per (token, posting) with the
    * token's document frequency `df`, collection frequency `cf`, and its
    * top-`k` postings ranked by `(tf DESC, id ASC)` — the corpus-search /
    * retrieval-debug structure ("which docs dominate this term?").
    *
    * 100 TB shape: term frequencies are one `(token, id)` groupBy (map-side
    * partials absorb within-doc repeats), then ONE aggregate per token
    * computes df + cf + the posting list together via the bounded-heap
    * [[graft.functions.TopKStructs]] — at most k postings per token per
    * partition cross the shuffle, never a `row_number()` sort of a
    * stopword's entire posting set in one task, and the output is bounded
    * by `|vocab| * k` regardless of corpus size. Ids are packed negated so
    * the heap's descending struct order yields the ASC id tie-break. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"invertedIndex: k must be positive, got $k")
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy("token")
      .agg(
        count(lit(1)).as("df"),
        sum("tf").as("cf"),
        graft.functions.TopKAggFunctions
          .topKStructs(struct(col("tf"), (-col(idCol)).as("__nid")), k)
          .as("__topk")
      )
      .select(
        col("token"), col("df"), col("cf"),
        posexplode(col("__topk")).as(Seq("__pos", "__s"))
      )
      .select(
        col("token"), col("df"), col("cf"),
        (col("__pos") + 1).cast("long").as("rank"),
        (-col("__s.__nid")).as(idCol),
        col("__s.tf").as("tf")
      )
  }

  /** Threshold calibration sweep for a scored binary filter — the
    * question every learned quality classifier ([[scoreLinear]]) must
    * answer before it gates a corpus: at which cut does it best
    * reproduce the labels (human judgments, or a trusted rule filter
    * like [[gopherFilter]])? One row per threshold t: predicted
    * positives (`score >= t`), TP/FP/FN against `labelCol`, precision,
    * recall and F1 (6 dp; precision is NULL at a threshold nothing
    * passes, recall/F1 NULL when there are no positive labels).
    *
    * Determinism: counts are exact longs; each ratio is ONE IEEE double
    * division of two exact integers (correctly rounded, identical in any
    * engine) rounded to 6 dp — nothing order-dependent anywhere. Pair
    * with an exact-grid score (the [[scoreLinear]] 1/256 contract) and
    * the `>=` compares carry no float wobble either.
    *
    * 100 TB shape: ONE corpus pass — 2·|thresholds| + 2 conditional
    * aggregates folded map-side into a single global aggregate row, then
    * a |thresholds|-bounded explode. No shuffle of data rows, no
    * per-threshold jobs. */
  def calibrationSweep(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      thresholds: Seq[Double]
  ): DataFrame = {
    require(thresholds.nonEmpty, "calibrationSweep: need at least one threshold")
    require(
      thresholds.distinct.size == thresholds.size,
      "calibrationSweep: duplicate thresholds"
    )
    val s = col(scoreCol)
    val y = col(labelCol).cast("boolean")
    val aggs: Seq[Column] =
      coalesce(sum(when(y, 1L).otherwise(0L)), lit(0L)).as("__pos") +:
        thresholds.zipWithIndex.flatMap { case (t, i) =>
          Seq(
            coalesce(sum(when(s >= lit(t), 1L).otherwise(0L)), lit(0L)).as(s"__pp$i"),
            coalesce(sum(when(s >= lit(t) && y, 1L).otherwise(0L)), lit(0L)).as(s"__tp$i")
          )
        }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      struct(
        lit(t).as("threshold"),
        col(s"__pp$i").as("n_pred_pos"),
        col(s"__tp$i").as("tp")
      )
    }
    one
      .select(col("__pos"), explode(array(rows: _*)).as("r"))
      .select(
        col("r.threshold").as("threshold"),
        col("r.n_pred_pos").as("n_pred_pos"),
        col("r.tp").as("tp"),
        (col("r.n_pred_pos") - col("r.tp")).as("fp"),
        (col("__pos") - col("r.tp")).as("fn"),
        when(
          col("r.n_pred_pos") > 0,
          round(col("r.tp").cast("double") / col("r.n_pred_pos"), 6)
        ).as("precision"),
        when(col("__pos") > 0, round(col("r.tp").cast("double") / col("__pos"), 6))
          .as("recall"),
        when(
          col("r.n_pred_pos") + col("__pos") > 0,
          round(
            lit(2.0) * col("r.tp").cast("double") / (col("r.n_pred_pos") + col("__pos")),
            6
          )
        ).as("f1")
      )
  }

  /** Domain (lowercased host, `www.`/default port/fragment-insensitive
    * via [[canonicalUrl]], explicit port stripped) of a URL — the
    * grouping key for domain-level curation. Pure per-row column. */
  def urlDomain(url: Column): Column =
    regexp_replace(
      regexp_extract(canonicalUrl(url), "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
      ":[0-9]+$",
      ""
    )

  /** Per-domain corpus statistics: doc count and mean quality score —
    * the aggregation behind domain-level curation (RefinedWeb-style:
    * judge the SITE, not just the page; a domain whose average quality
    * is low is boilerplate/SEO-spam even when single pages sneak past a
    * per-doc filter).
    *
    * Determinism: per-row scores round to 6 dp and sum as DECIMAL
    * (exact, associative — identical at any parallelism); the mean is
    * ONE IEEE double division of that exact sum by the exact count —
    * bit-identical in any engine. It is deliberately NOT re-rounded
    * here: rounding a double to 6 dp is the one step engines disagree
    * on at 7th-digit ties (Spark rounds the shortest decimal repr
    * HALF_UP, DuckDB rounds the binary value — measured divergence at
    * 0.2597655), while the raw quotient is exactly shared; round for
    * display downstream if needed. One groupBy(domain) shuffle —
    * map-side partials bound it by the domain cardinality. */
  def domainStats(docs: DataFrame, urlCol: String, scoreCol: String): DataFrame =
    docs
      .groupBy(urlDomain(col(urlCol)).as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(
          round(col(scoreCol).cast("double"), 6)
            .cast(org.apache.spark.sql.types.DecimalType(28, 6))
        ).as("__s")
      )
      .select(
        col("domain"),
        col("n_docs"),
        (col("__s").cast("double") / col("n_docs")).as("mean_score")
      )

  /** Domain-level curation filter: drop every doc whose domain has mean
    * quality below `minMeanScore` OR sits on an explicit blocklist.
    * Composes [[domainStats]] with an anti-join against only the BAD
    * domains — the corpus shuffles once on the domain key (Spark
    * broadcasts the bad side when it is small, the common case).
    *
    * The input is scanned twice (stats pass + filter pass) — like
    * [[graft.operators.Relational.heavyHitters]], the input must be
    * deterministic between the two jobs (parquet tables are; persist
    * upstream non-determinism first). NULL-score docs count toward
    * `n_docs` but contribute nothing to the sum — a mostly-unscored
    * domain's mean sinks accordingly, which is the conservative reading
    * for curation. */
  def domainFilter(
      docs: DataFrame,
      urlCol: String,
      scoreCol: String,
      minMeanScore: Double,
      blocked: Seq[String] = Nil
  ): DataFrame =
    domainFilterAgainst(docs, urlCol, badDomains(docs, urlCol, scoreCol, minMeanScore, blocked))

  /** The bad-domain frame [[domainFilter]] enforces: domains whose mean
    * score is NULL or below `minMeanScore`, plus the explicit blocklist.
    * Split out so production can compute it on a nightly batch SNAPSHOT
    * and enforce it elsewhere (see [[domainFilterAgainst]]). */
  def badDomains(
      docs: DataFrame,
      urlCol: String,
      scoreCol: String,
      minMeanScore: Double,
      blocked: Seq[String] = Nil
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val low = domainStats(docs, urlCol, scoreCol)
      .filter(col("mean_score").isNull || col("mean_score") < minMeanScore)
      .select(col("domain"))
    if (blocked.isEmpty) low
    else low.unionByName(blocked.toDF("domain")).distinct()
  }

  /** [[domainFilter]]'s ENFORCEMENT stage against an already-computed
    * bad-domain frame (one `domain` column) — the production split:
    * stats from a nightly batch snapshot, enforcement wherever ingestion
    * happens. A stream-static anti-join, so it runs unchanged under
    * Structured Streaming (StreamingSpec pins streamed == batch). */
  def domainFilterAgainst(docs: DataFrame, urlCol: String, badDomains: DataFrame): DataFrame = {
    require(
      !docs.columns.contains("__dom"),
      "domainFilterAgainst: input already carries a __dom column, which this operator " +
        "would silently overwrite and drop — rename it first (the scoreBuckets guard pattern)"
    )
    docs
      .withColumn("__dom", urlDomain(col(urlCol)))
      .join(badDomains.select(col("domain").as("__dom")), Seq("__dom"), "left_anti")
      .drop("__dom")
  }

  /** CCNet/FineWeb-style corpus bucketing: tag every row `head` /
    * `middle` / `tail` by the corpus-level quantile boundaries of
    * `scoreCol` — CCNet buckets documents by language-model perplexity
    * thirds (head = LOWEST score, the convention here; flip the score's
    * sign for higher-is-better metrics), and curation pipelines use the
    * buckets for curriculum ordering and mixture rates.
    *
    * Boundaries come from ONE global [[Quantiles.quantiles]] aggregate
    * (`exact = false` default — the 100 TB sketch path; `exact = true`
    * is the oracle-replayable opt-in, Spark's `percentile`:
    * `pos = f·(n−1)`, result `(⌈pos⌉−pos)·v[⌊pos⌋] + (pos−⌊pos⌋)·v[⌈pos⌉]`
    * over the sorted values — every step a correctly-rounded double op,
    * so an external engine replaying that formula lands on the
    * bit-identical boundary) and broadcast back; tagging is a pure
    * per-row compare. NULL scores are ignored by the boundary aggregate
    * and tag NULL. */
  def scoreBuckets(
      docs: DataFrame,
      scoreCol: String,
      lo: Double = 1.0 / 3,
      hi: Double = 2.0 / 3,
      exact: Boolean = false,
      accuracy: Int = 10000
  ): DataFrame = {
    require(
      lo > 0 && hi < 1 && lo <= hi,
      s"scoreBuckets: need 0 < lo <= hi < 1, got lo=$lo hi=$hi"
    )
    require(!docs.columns.contains("bucket"), "scoreBuckets: input already has a bucket column")
    val bounds = Quantiles
      .quantiles(docs, Nil, scoreCol, Seq(lo, hi), exact, accuracy)
      .toDF("__blo", "__bhi")
    docs
      .crossJoin(broadcast(bounds))
      .withColumn("bucket", bucketTag(col(scoreCol), col("__blo"), col("__bhi")))
      .drop("__blo", "__bhi")
  }

  private def bucketTag(score: Column, blo: Column, bhi: Column): Column =
    when(score.isNull, lit(null).cast("string"))
      .when(score <= blo, lit("head"))
      .when(score <= bhi, lit("middle"))
      .otherwise(lit("tail"))

  /** [[scoreBuckets]]'s TAGGING stage at fixed boundaries — pure per-row
    * column, so it runs unchanged on a stream (boundaries come from a
    * batch snapshot; re-deriving quantiles over an unbounded stream is
    * not meaningful). */
  def tagBuckets(df: DataFrame, scoreCol: String, blo: Double, bhi: Double): DataFrame = {
    require(blo <= bhi, s"tagBuckets: need blo <= bhi, got $blo > $bhi")
    df.withColumn("bucket", bucketTag(col(scoreCol), lit(blo), lit(bhi)))
  }

  /** Distribution drift between two corpora — smoothed KL divergence
    * over hashed unigram buckets, both directions (the mixture-
    * monitoring primitive: "has this source's token distribution moved
    * since the rates were tuned?", "how far is the candidate corpus
    * from the target domain?"). Same hashed-feature convention as
    * [[hashedTf]]/DSIR: `bucket = (h60(token) >> 1) % buckets`, add-one
    * smoothing over the bucket domain so empty buckets carry mass and
    * the ratio is always finite.
    *
    * Determinism (the x102 contract): the log-ratio is a sum of four
    * integer-argument `ln`s snapped to the 2⁻²⁰ dyadic grid (kills the
    * 1-ulp cross-engine `ln` wobble); each bucket's contribution
    * `p_A · λ` rounds to 9 dp and sums as DECIMAL — order-independent
    * and exactly replayable. Output: ONE row `(tot_a, tot_b, kl_ab,
    * kl_ba)` with KL in nats, 6 dp.
    *
    * 100 TB shape: two token-count aggregates (map-side partials; the
    * shuffle is `buckets`-bounded, never corpus-bound), a
    * `buckets`-sized frame join, one global sum. Nothing pairwise,
    * nothing collected beyond the single output row. */
  def corpusDivergence(
      a: DataFrame,
      b: DataFrame,
      textCol: String,
      buckets: Int = 4096
  ): DataFrame = {
    require(buckets > 0, s"corpusDivergence: buckets must be positive, got $buckets")
    val spark = a.sparkSession
    def bucketCounts(df: DataFrame, name: String): DataFrame =
      df.select(explode(tokens(col(textCol))).as("tok"))
        .select((shiftright(Dedup.tokenHash60(col("tok")), 1) % buckets).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as(name))
    val ca = bucketCounts(a, "ca")
    val cb = bucketCounts(b, "cb")
    val grid = spark.range(buckets).select(col("id").as("bucket"))
    val joined = grid
      .join(ca, Seq("bucket"), "left")
      .join(cb, Seq("bucket"), "left")
      .select(
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb")
      )
    val snap = math.pow(2.0, 20)
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    // λ = ln(p_a/p_b) = ln(ca+1) − ln(cb+1) + ln(TB+K) − ln(TA+K),
    // dyadic-snapped; contributions are p·λ rounded to 9 dp, decimal-summed
    def kl(cx: Column, cy: Column, tx: Column, ty: Column): Column = {
      val lam = floor(
        (log(cx + lit(1.0)) - log(cy + lit(1.0)) + log(ty + lit(buckets.toDouble)) -
          log(tx + lit(buckets.toDouble))) * lit(snap)
      ) / lit(snap)
      val p = (cx.cast("double") + lit(1.0)) / (tx.cast("double") + lit(buckets.toDouble))
      sum(round(p * lam, 9).cast(dec))
    }
    val withTotals = joined
      .crossJoin(
        broadcast(joined.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb")))
      )
    withTotals
      .agg(
        first(col("ta")).as("tot_a"),
        first(col("tb")).as("tot_b"),
        kl(col("ca"), col("cb"), col("ta"), col("tb")).as("__kab"),
        kl(col("cb"), col("ca"), col("tb"), col("ta")).as("__kba")
      )
      .select(
        col("tot_a"),
        col("tot_b"),
        round(col("__kab").cast("double"), 6).as("kl_ab"),
        round(col("__kba").cast("double"), 6).as("kl_ba")
      )
  }
}
