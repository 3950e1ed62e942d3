package graft.queries

import graft.operators._
import graft.operators.Relational.dsum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extension operators beyond the reference surface (SURVEY.md §7.5 +
  * BASELINE.json north star): dedup, similarity search, text analysis,
  * multimodal plumbing, JSON, event-time analytics, as-of join, OLAP
  * extras. Every SQL-expressible operator carries a DuckDB oracle. */
object ExtQueries {
  import Tables.{t, tw}

  /** Shared shingle CTE: distinct word 3-grams per doc (matches
    * Dedup.shingleRows) + the md5-derived 60-bit token hash (matches
    * Dedup.tokenHash60). Parametrized by the source relation. */
  /** The per-source datasheet aggregates (x166's shape) over corpus CTE
    * `src`, every CTE name prefixed with `p` so the fragment can appear
    * twice in one query (x167's before/after diff). Expects a global `rg`
    * CTE of distinct reference 13-grams. Emits `${p}ds(source, n_docs,
    * n_tokens, n_contaminated, novelty_micro)`. */
  private def datasheetSqlCtes(src: String, p: String): String =
    s"""${p}tk AS (SELECT doc_id, source, lang, string_split(text, ' ') AS tk FROM $src),
       |${p}sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
       |  FROM ${p}tk, unnest(range(1, len(tk) - 1)) AS t(i)),
       |${p}df AS (SELECT s, COUNT(*) AS df FROM ${p}sh GROUP BY 1),
       |${p}nv AS (SELECT ${p}sh.doc_id, CAST(COUNT(*) AS BIGINT) AS nsh,
       |    CAST(SUM(CASE WHEN ${p}df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nvl
       |  FROM ${p}sh JOIN ${p}df USING (s) GROUP BY 1),
       |${p}dg AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+12], ' ') AS g
       |  FROM ${p}tk, unnest(range(1, len(tk) - 11)) AS u(i)),
       |${p}cn AS (SELECT DISTINCT doc_id, TRUE AS contam FROM ${p}dg JOIN rg USING (g)),
       |${p}pl AS (SELECT source, lang, COUNT(*) AS docs,
       |    SUM(CAST(len(tk) AS BIGINT)) AS toks,
       |    SUM(CASE WHEN COALESCE(contam, FALSE) THEN 1 ELSE 0 END) AS nc,
       |    SUM(COALESCE(${p}nv.nsh, 0)) AS sh2, SUM(COALESCE(${p}nv.nvl, 0)) AS nvl2
       |  FROM ${p}tk LEFT JOIN ${p}nv USING (doc_id) LEFT JOIN ${p}cn USING (doc_id)
       |  GROUP BY 1, 2),
       |${p}ds AS (SELECT source, CAST(SUM(docs) AS BIGINT) AS n_docs,
       |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
       |    CAST(SUM(nc) AS BIGINT) AS n_contaminated,
       |    CASE WHEN SUM(sh2) > 0 THEN
       |      round(CAST(SUM(nvl2) AS DOUBLE) / CAST(SUM(sh2) AS DOUBLE), 6)
       |    END AS novelty_micro
       |  FROM ${p}pl GROUP BY 1)""".stripMargin

  private def shingleCteFrom(src: String) =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $src),
       |sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
       |       FROM toks, unnest(range(1, len(tk) - 1)) AS t(i))""".stripMargin
  private val shingleCte = shingleCteFrom("documents")

  /** The x175 cross-set IVF replay as a reusable CTE block (prefix `p`,
    * query CTE `q`, corpus CTE `c`, both (vec_id, v)): √|corpus|
    * lowest-id centroids (the x97 row_number convention), nearest-cell
    * assignment on BOTH sides (6-dp sims, ties to the lowest centroid
    * id — PackedArgmax's encoding), cell equi-join WITHOUT the qid!=cid
    * filter (cross-set namespaces), ranked per query. Top-k rows land in
    * `${p}tk` (filter `rn <= k` at the use site). */
  private def ivfSearchSql(q: String, c: String, p: String): String =
    s"""${p}nl AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS nlist FROM $c),
       |${p}cen AS (SELECT cen_vid, cv FROM (
       |    SELECT vec_id AS cen_vid, v AS cv,
       |      row_number() OVER (ORDER BY vec_id) AS rk FROM $c) t, ${p}nl
       |  WHERE rk <= nlist),
       |${p}casg AS (SELECT vec_id, cell FROM (
       |    SELECT c2.vec_id, cen.cen_vid AS cell,
       |      row_number() OVER (PARTITION BY c2.vec_id ORDER BY
       |        round(list_dot_product(c2.v, cen.cv)
       |          / (sqrt(list_dot_product(c2.v, c2.v))
       |            * sqrt(list_dot_product(cen.cv, cen.cv))), 6) DESC, cen.cen_vid) AS r
       |    FROM $c c2 CROSS JOIN ${p}cen cen) t WHERE r = 1),
       |${p}qasg AS (SELECT vec_id, cell FROM (
       |    SELECT q2.vec_id, cen.cen_vid AS cell,
       |      row_number() OVER (PARTITION BY q2.vec_id ORDER BY
       |        round(list_dot_product(q2.v, cen.cv)
       |          / (sqrt(list_dot_product(q2.v, q2.v))
       |            * sqrt(list_dot_product(cen.cv, cen.cv))), 6) DESC, cen.cen_vid) AS r
       |    FROM $q q2 CROSS JOIN ${p}cen cen) t WHERE r = 1),
       |${p}sims AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid,
       |    round(list_dot_product(q3.v, c3.v)
       |      / (sqrt(list_dot_product(q3.v, q3.v))
       |        * sqrt(list_dot_product(c3.v, c3.v))), 6) AS sim
       |  FROM ${p}qasg qa JOIN ${p}casg ca ON qa.cell = ca.cell
       |  JOIN $q q3 ON q3.vec_id = qa.vec_id JOIN $c c3 ON c3.vec_id = ca.vec_id),
       |${p}tk AS (SELECT qid, cid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
       |  FROM ${p}sims)""".stripMargin

  /** The x171 waterfill→select replay as a reusable CTE block (prefix
    * `p`, source CTE `dc` with (doc_id, source, n_tokens), budget scalar
    * `budgetExpr`, epoch cap `e`): the x172 anneal composition runs it
    * twice — once per phase — so the whole two-phase schedule is one
    * oracle row. Selected rows land in `${p}fe` (full epochs) and
    * `${p}pe` (the partial-epoch prefix). */
  private def unimaxSelectSql(dc: String, budgetExpr: String, e: Int, p: String): String =
    s"""${p}b AS (SELECT $budgetExpr AS budget),
       |${p}st AS (SELECT source, SUM(n_tokens) AS t FROM $dc GROUP BY 1),
       |${p}w AS (SELECT source, t, t * $e AS cap,
       |    CAST(row_number() OVER (ORDER BY t, source) AS BIGINT) AS rk,
       |    COALESCE(SUM(t * $e) OVER (ORDER BY t, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS s
       |  FROM ${p}st),
       |${p}c AS (SELECT ${p}w.*, cap * (s - rk + 1) + pre <= b.budget AS capped
       |  FROM ${p}w, ${p}b b),
       |${p}ag AS (SELECT COALESCE(SUM(cap) FILTER (capped), 0) AS csum,
       |    COALESCE(COUNT(*) FILTER (capped), 0) AS m, MAX(s) AS s FROM ${p}c),
       |${p}al AS (SELECT c.source, c.t,
       |    CASE WHEN c.capped THEN CAST(c.cap AS BIGINT)
       |         ELSE CAST(floor(CAST(b.budget - ag.csum AS DOUBLE)
       |           / CAST(ag.s - ag.m AS DOUBLE)) AS BIGINT) END AS at
       |  FROM ${p}c c, ${p}ag ag, ${p}b b),
       |${p}ks AS (SELECT source, CAST(at // t AS BIGINT) AS k,
       |    CAST(at % t AS BIGINT) AS rem FROM ${p}al),
       |${p}fe AS (SELECT d.doc_id, d.source, d.n_tokens,
       |    unnest(generate_series(0, ks.k - 1)) AS epoch
       |  FROM $dc d JOIN ${p}ks ks USING (source) WHERE ks.k > 0),
       |${p}pk AS (SELECT d.doc_id, d.source, d.n_tokens, ks.k, ks.rem,
       |    CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#' ||
       |      CAST(ks.k AS VARCHAR)), 18, 15) AS BIGINT) AS ek
       |  FROM $dc d JOIN ${p}ks ks USING (source) WHERE ks.rem > 0),
       |${p}pc AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY source
       |    ORDER BY ek, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM ${p}pk),
       |${p}pe AS (SELECT doc_id, source, n_tokens, k AS epoch FROM ${p}pc
       |  WHERE cum <= rem)""".stripMargin

  /** Planted ground truth of the x81/x83/x84 media-dedup queries: the
    * synthetic payloads make docs with the same `doc_id % 40` pattern
    * true near-duplicates (same content, different bytes) and everything
    * else distinct, so the expected pair set is SQL-expressible even
    * though the decode is not — and the hash check demands the full
    * decode → hash → blocking path recover it exactly. */
  /** x88/x89 classifier weights: bucket b weighs ((b·37) % 101 − 50)/256
    * — deterministic, sign-mixed, and on the 1/256 binary grid so every
    * partial sum is exact (see TextAnalysis.linearLogit). */
  private val qWeights: Array[Double] =
    Array.tabulate(64)(b => ((b * 37) % 101 - 50) / 256.0)

  /** x127/x128 training-loop replay: GD steps (kept small — each step is
    * one full-corpus aggregate in BOTH engines). */
  private val TrainSteps = 3

  /** DuckDB replay of TextAnalysis.trainLinear's integer GD loop at
    * dim=64, lr=2^-4, scale=2^-20, labels = text contains 'vector':
    * signed hashedTf counts `tf`, then per step t — margin numerators
    * (bias + Σ W·x), hard-sigmoid clamp, residuals, HUGEINT gradient
    * sums (exactly the engine's 128-bit limb sums), and the
    * sign-symmetric truncating update `W −= sign(G)·(|G| // (64·N))`.
    * Ends with the `w$TrainSteps` CTE holding the trained numerators.
    * `trainLinearCtes(labCte)` parameterizes the LABEL source (x144
    * distills an LM-derived label; x127/x128 keep the planted text
    * signal) — the training corpus is exactly the `lab` rows, so `nn`
    * counts lab, and the tf/margin joins all start FROM lab. */
  private def trainLinearCtes(labCte: String): String = {
    val pHalf = 1L << 21
    val pMax = 1L << 22
    val head =
      s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) AS h60 FROM toks),
        |tf AS MATERIALIZED (SELECT doc_id, (h60 // 2) % 64 AS bucket,
        |    SUM(CASE WHEN h60 % 2 = 1 THEN 1 ELSE -1 END) AS x
        |  FROM h GROUP BY 1, 2),
        |$labCte,
        |nn AS (SELECT COUNT(*) AS n FROM lab),
        |w0 AS (SELECT unnest(generate_series(-1, 63)) AS bucket, CAST(0 AS BIGINT) AS wn)""".stripMargin
    val steps = (1 to TrainSteps).map { t =>
      val p = t - 1
      s"""m$t AS MATERIALIZED (SELECT l.doc_id, l.y, COALESCE(SUM(tf.x * w.wn), 0) AS mm
         |  FROM lab l LEFT JOIN tf ON tf.doc_id = l.doc_id
         |  LEFT JOIN w$p w ON w.bucket = tf.bucket GROUP BY 1, 2),
         |r$t AS MATERIALIZED (SELECT doc_id,
         |    GREATEST(LEAST($pHalf + (SELECT wn FROM w$p WHERE bucket = -1) + mm, $pMax), 0)
         |      - y * $pMax AS r
         |  FROM m$t),
         |g$t AS MATERIALIZED (SELECT tf.bucket, SUM(CAST(r.r AS HUGEINT) * tf.x) AS g
         |    FROM r$t r JOIN tf ON tf.doc_id = r.doc_id GROUP BY 1
         |  UNION ALL SELECT CAST(-1 AS BIGINT), SUM(CAST(r AS HUGEINT)) FROM r$t),
         |w$t AS MATERIALIZED (SELECT w.bucket, w.wn - CAST(CASE
         |    WHEN COALESCE(g.g, 0) < 0 THEN -((-g.g) // (64 * (SELECT n FROM nn)))
         |    ELSE COALESCE(g.g, 0) // (64 * (SELECT n FROM nn)) END AS BIGINT) AS wn
         |  FROM w$p w LEFT JOIN g$t g ON g.bucket = w.bucket)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  private val trainLinearSqlPrefix: String =
    "WITH " + trainLinearCtes(
      """lab AS MATERIALIZED (SELECT doc_id,
        |    CASE WHEN text LIKE '%vector%' THEN 1 ELSE 0 END AS y FROM documents)""".stripMargin
    )

  /** x135/x136 shared replay: en-reference bigram LM (BOS = chr(1)),
    * add-one smoothing, and the FixedLog2 Q20 shift-and-square recurrence
    * as one recursive CTE over the DISTINCT count values (num/den are
    * +1-smoothed counts — far fewer distinct values than token rows).
    * Ends with `nl(doc_id, nll)` = per-token Q20 negative log-likelihood.
    * The mantissa uses the two-sided-shift form (never `x << 20`), exactly
    * like the engine expression, so the domain is every positive count. */
  /** The generic half of the LM replay: given a `pt(doc_id, num, den, adq)`
    * CTE upstream, computes FixedLog2 for every distinct count value and
    * ends with `nl(doc_id, nll)`, nll = lq(den) − lq(num) + adq
    * (adq carries x139's integer backoff penalty; 0 elsewhere).
    * Model-building CTEs vary per query
    * (global en reference in x135/x136/x138, per-language in x137);
    * this part never does. `vals` dedups via an OUTER DISTINCT over a
    * UNION ALL: in DuckDB 1.0.0 a bare UNION inside a WITH RECURSIVE
    * block does NOT deduplicate (x135-x138 masked it because their
    * num/den ranges are disjoint; x139's overlap exposed it — duplicate
    * l2 rows fan out the nl join). */
  private val lmLogReplayCtes: String = lmLogReplayCtesCols("")

  /** [[lmLogReplayCtes]] with extra `pt` columns carried through `nl`
    * (x150 threads a model `side` tag so ONE ladder serves two models —
    * `vals` dedups across both, exactly as the engine's FixedLog2 is one
    * expression over both score passes). */
  private def lmLogReplayCtesCols(extra: String): String =
    s"""vals AS (SELECT DISTINCT x FROM
      |  (SELECT num AS x FROM pt UNION ALL SELECT den FROM pt)),
      |n0 AS (SELECT x, x AS r, 0 AS e FROM vals),
      |n1 AS (SELECT x, CASE WHEN r >= 4294967296 THEN r >> 32 ELSE r END AS r,
      |  e + CASE WHEN r >= 4294967296 THEN 32 ELSE 0 END AS e FROM n0),
      |n2 AS (SELECT x, CASE WHEN r >= 65536 THEN r >> 16 ELSE r END AS r,
      |  e + CASE WHEN r >= 65536 THEN 16 ELSE 0 END AS e FROM n1),
      |n3 AS (SELECT x, CASE WHEN r >= 256 THEN r >> 8 ELSE r END AS r,
      |  e + CASE WHEN r >= 256 THEN 8 ELSE 0 END AS e FROM n2),
      |n4 AS (SELECT x, CASE WHEN r >= 16 THEN r >> 4 ELSE r END AS r,
      |  e + CASE WHEN r >= 16 THEN 4 ELSE 0 END AS e FROM n3),
      |n5 AS (SELECT x, CASE WHEN r >= 4 THEN r >> 2 ELSE r END AS r,
      |  e + CASE WHEN r >= 4 THEN 2 ELSE 0 END AS e FROM n4),
      |n6 AS (SELECT x, e + CASE WHEN r >= 2 THEN 1 ELSE 0 END AS e FROM n5),
      |it AS (SELECT x, e, CASE WHEN e >= 20 THEN x >> (e - 20) ELSE x << (20 - e) END AS mt,
      |    CAST(0 AS BIGINT) AS frac, 0 AS j FROM n6
      |  UNION ALL SELECT x, e,
      |    CASE WHEN ((mt*mt) >> 20) >= 2097152 THEN ((mt*mt) >> 20) >> 1 ELSE (mt*mt) >> 20 END,
      |    frac * 2 + CASE WHEN ((mt*mt) >> 20) >= 2097152 THEN 1 ELSE 0 END,
      |    j + 1 FROM it WHERE j < 20),
      |l2 AS MATERIALIZED (SELECT x, e * 1048576 + frac AS lq FROM it WHERE j = 20),
      |nl AS (SELECT pt.doc_id$extra, ld.lq - ln_.lq + pt.adq AS nll FROM pt
      |  JOIN l2 ln_ ON pt.num = ln_.x JOIN l2 ld ON pt.den = ld.x)""".stripMargin

  private val bigramLmSqlPrefix: String =
    s"""WITH RECURSIVE
      |tkr AS (SELECT string_split(text, ' ') AS ts FROM documents WHERE lang = 'en'),
      |ar AS (SELECT list_prepend(chr(1), ts) AS arr FROM tkr),
      |bgr AS (SELECT unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok FROM ar),
      |m AS MATERIALIZED (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM bgr GROUP BY 1, 2),
      |cx AS MATERIALIZED (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS ctx FROM m GROUP BY 1),
      |vv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM m),
      |tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |aa AS (SELECT doc_id, list_prepend(chr(1), ts) AS arr FROM tk),
      |bg AS (SELECT doc_id, unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok
      |  FROM aa),
      |pt AS MATERIALIZED (SELECT b.doc_id,
      |    COALESCE(m.cnt, 0) + 1 AS num,
      |    COALESCE(cx.ctx, 0) + (SELECT v FROM vv) AS den,
      |    CAST(0 AS BIGINT) AS adq
      |  FROM bg b LEFT JOIN m USING (prev, tok) LEFT JOIN cx ON b.prev = cx.prev),
      |$lmLogReplayCtes""".stripMargin

  /** x137/x140 shared replay: per-LANGUAGE bigram models fit on the
    * source='src0' trusted subset (trainBigramLm keyCols), every doc
    * scored under its language's model — the x135 chain with the lang
    * key added to every model join. Ends with
    * `ag(doc_id, n_tokens, nll_q20)`. */
  private val langLmSqlPrefix: String =
    s"""WITH RECURSIVE
       |tkr AS (SELECT lang, string_split(text, ' ') AS ts FROM documents
       |  WHERE source = 'src0'),
       |ar AS (SELECT lang, list_prepend(chr(1), ts) AS arr FROM tkr),
       |bgr AS (SELECT lang, unnest(arr[1:len(arr)-1]) AS prev,
       |    unnest(arr[2:len(arr)]) AS tok FROM ar),
       |m AS MATERIALIZED (SELECT lang, prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM bgr GROUP BY 1, 2, 3),
       |cx AS MATERIALIZED (SELECT lang, prev, CAST(SUM(cnt) AS BIGINT) AS ctx
       |  FROM m GROUP BY 1, 2),
       |vv AS MATERIALIZED (SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
       |  FROM m GROUP BY 1),
       |tk AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
       |aa AS (SELECT doc_id, lang, list_prepend(chr(1), ts) AS arr FROM tk),
       |bg AS (SELECT doc_id, lang, unnest(arr[1:len(arr)-1]) AS prev,
       |    unnest(arr[2:len(arr)]) AS tok FROM aa),
       |pt AS MATERIALIZED (SELECT b.doc_id,
       |    COALESCE(m.cnt, 0) + 1 AS num,
       |    COALESCE(cx.ctx, 0) + vv.v AS den,
       |    CAST(0 AS BIGINT) AS adq
       |  FROM bg b JOIN vv USING (lang)
       |  LEFT JOIN m ON m.lang = b.lang AND m.prev = b.prev AND m.tok = b.tok
       |  LEFT JOIN cx ON cx.lang = b.lang AND cx.prev = b.prev),
       |$lmLogReplayCtes,
       |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1)""".stripMargin

  /** The HUGEINT widening of [[lmLogReplayCtes]] for the Kneser–Ney
    * replay: pt here is `(doc_id, num HUGEINT, den1, den2, adq)` — the
    * interpolated-KN numerator is a sum of count PRODUCTS (~2^90 at
    * 100 TB counts), so the log ladder runs on HUGEINT (one 64-bit
    * exponent step on top, mantissa via `x >> (e-20)` — DuckDB hugeint
    * supports both, probe-verified bit-identical to the engine's
    * FixedLog2.log2q20Dec on boundary values up to 2^126) and the
    * denominator contributes PER-FACTOR logs: `nll = lq(den1) + lq(den2)
    * − lq(num) + adq` (den2 = 1 ⇒ lq = 0 on the unseen-context branch;
    * adq carries the 2^discountShift scale constant). */
  private val knLogReplayCtes: String =
    """vals AS (SELECT DISTINCT x FROM
      |  (SELECT num AS x FROM pt UNION ALL SELECT CAST(den1 AS HUGEINT) FROM pt
      |   UNION ALL SELECT CAST(den2 AS HUGEINT) FROM pt)),
      |n0 AS (SELECT x, x AS r, 0 AS e FROM vals),
      |h1 AS (SELECT x, CASE WHEN r >= 18446744073709551616 THEN r >> 64 ELSE r END AS r,
      |  e + CASE WHEN r >= 18446744073709551616 THEN 64 ELSE 0 END AS e FROM n0),
      |n1 AS (SELECT x, CASE WHEN r >= 4294967296 THEN r >> 32 ELSE r END AS r,
      |  e + CASE WHEN r >= 4294967296 THEN 32 ELSE 0 END AS e FROM h1),
      |n2 AS (SELECT x, CASE WHEN r >= 65536 THEN r >> 16 ELSE r END AS r,
      |  e + CASE WHEN r >= 65536 THEN 16 ELSE 0 END AS e FROM n1),
      |n3 AS (SELECT x, CASE WHEN r >= 256 THEN r >> 8 ELSE r END AS r,
      |  e + CASE WHEN r >= 256 THEN 8 ELSE 0 END AS e FROM n2),
      |n4 AS (SELECT x, CASE WHEN r >= 16 THEN r >> 4 ELSE r END AS r,
      |  e + CASE WHEN r >= 16 THEN 4 ELSE 0 END AS e FROM n3),
      |n5 AS (SELECT x, CASE WHEN r >= 4 THEN r >> 2 ELSE r END AS r,
      |  e + CASE WHEN r >= 4 THEN 2 ELSE 0 END AS e FROM n4),
      |n6 AS (SELECT x, e + CASE WHEN r >= 2 THEN 1 ELSE 0 END AS e FROM n5),
      |it AS (SELECT x, e,
      |    CAST(CASE WHEN e >= 20 THEN x >> (e - 20) ELSE x << (20 - e) END AS BIGINT) AS mt,
      |    CAST(0 AS BIGINT) AS frac, 0 AS j FROM n6
      |  UNION ALL SELECT x, e,
      |    CASE WHEN ((mt*mt) >> 20) >= 2097152 THEN ((mt*mt) >> 20) >> 1 ELSE (mt*mt) >> 20 END,
      |    frac * 2 + CASE WHEN ((mt*mt) >> 20) >= 2097152 THEN 1 ELSE 0 END,
      |    j + 1 FROM it WHERE j < 20),
      |l2 AS MATERIALIZED (SELECT x, e * 1048576 + frac AS lq FROM it WHERE j = 20),
      |nl AS (SELECT pt.doc_id, ld1.lq + ld2.lq - ln_.lq + pt.adq AS nll FROM pt
      |  JOIN l2 ln_ ON pt.num = ln_.x
      |  JOIN l2 ld1 ON CAST(pt.den1 AS HUGEINT) = ld1.x
      |  JOIN l2 ld2 ON CAST(pt.den2 AS HUGEINT) = ld2.x)""".stripMargin

  /** x141 replay: interpolated Kneser–Ney under the en-reference bigram
    * model (same train subset as x135) — every KN statistic derives from
    * the one (prev, tok, cnt) table: context totals+fan-outs (cx),
    * continuation counts (cw), and the Chen–Goodman discount snapped to
    * the Q10 dyadic grid with the engine's clamp and no-evidence
    * midpoint. The pt branches mirror scoreKneserNey exactly. */
  private val knSqlPrefix: String =
    s"""WITH RECURSIVE
      |tkr AS (SELECT string_split(text, ' ') AS ts FROM documents WHERE lang = 'en'),
      |ar AS (SELECT list_prepend(chr(1), ts) AS arr FROM tkr),
      |bgr AS (SELECT unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok FROM ar),
      |m AS MATERIALIZED (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM bgr GROUP BY 1, 2),
      |cx AS MATERIALIZED (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS ctx,
      |  CAST(COUNT(*) AS BIGINT) AS nv FROM m GROUP BY 1),
      |cw AS MATERIALIZED (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cw FROM m GROUP BY 1),
      |gq AS (SELECT t, v, CASE WHEN n1 + 2*n2 = 0 THEN CAST(512 AS BIGINT)
      |    ELSE least(greatest((n1*1024)//(n1+2*n2), 1), 1023) END AS dq
      |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t, CAST(COUNT(DISTINCT tok) AS BIGINT) AS v,
      |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2 FROM m)),
      |tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |aa AS (SELECT doc_id, list_prepend(chr(1), ts) AS arr FROM tk),
      |bg AS (SELECT doc_id, unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok
      |  FROM aa),
      |pt AS MATERIALIZED (SELECT b.doc_id,
      |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN
      |      CAST(greatest(COALESCE(m.cnt, 0)*1024 - gq.dq, 0) AS HUGEINT) * (gq.t + gq.v)
      |      + CAST(gq.dq * cx.nv AS HUGEINT) * (COALESCE(cw.cw, 0) + 1)
      |    ELSE CAST(COALESCE(cw.cw, 0) + 1 AS HUGEINT) END AS num,
      |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN cx.ctx ELSE gq.t + gq.v END AS den1,
      |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN gq.t + gq.v ELSE CAST(1 AS BIGINT) END AS den2,
      |    CAST(CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN 10485760 ELSE 0 END AS BIGINT) AS adq
      |  FROM bg b LEFT JOIN m USING (prev, tok) LEFT JOIN cx ON b.prev = cx.prev
      |    LEFT JOIN cw ON b.tok = cw.tok CROSS JOIN gq),
      |$knLogReplayCtes""".stripMargin

  /** x145 replay: MODIFIED Kneser–Ney (Chen & Goodman 1999 §3) under the
    * en-reference model — three count-conditioned discounts (D1 via the
    * 1 − 2Y·n2/n1 = Y identity, D2/D3 by the HUGEINT formula with the
    * k − ½ midpoint fallback and [1, k·2^S−1] clamp) and the
    * count-conditioned fan-outs N1/N2/N3+(v·) in λ(v). Same HUGEINT log
    * ladder; integer products distribute exactly, so the λ·(cw+1) form
    * matches the engine bit-for-bit. */
  private val mknSqlPrefix: String =
    s"""WITH RECURSIVE
      |tkr AS (SELECT string_split(text, ' ') AS ts FROM documents WHERE lang = 'en'),
      |ar AS (SELECT list_prepend(chr(1), ts) AS arr FROM tkr),
      |bgr AS (SELECT unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok FROM ar),
      |m AS MATERIALIZED (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM bgr GROUP BY 1, 2),
      |cx AS MATERIALIZED (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS ctx,
      |  CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nv1,
      |  CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS nv2,
      |  CAST(SUM(CASE WHEN cnt >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS nv3 FROM m GROUP BY 1),
      |cw AS MATERIALIZED (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cw FROM m GROUP BY 1),
      |gs AS (SELECT CAST(COUNT(*) AS BIGINT) AS t, CAST(COUNT(DISTINCT tok) AS BIGINT) AS v,
      |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN cnt = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
      |    CAST(SUM(CASE WHEN cnt = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4 FROM m),
      |gq AS (SELECT t, v,
      |  CASE WHEN n1 + 2*n2 = 0 THEN CAST(512 AS BIGINT)
      |    ELSE least(greatest((n1*1024)//(n1+2*n2), 1), 1023) END AS dq1,
      |  CASE WHEN n1 + 2*n2 = 0 OR n2 = 0 OR n3 = 0 THEN CAST(1536 AS BIGINT)
      |    ELSE CAST(least(greatest(2048 - (CAST(3 AS HUGEINT) * 1024 * n1 * n3)
      |      // (CAST(n1 + 2*n2 AS HUGEINT) * n2), 1), 2047) AS BIGINT) END AS dq2,
      |  CASE WHEN n1 + 2*n2 = 0 OR n3 = 0 OR n4 = 0 THEN CAST(2560 AS BIGINT)
      |    ELSE CAST(least(greatest(3072 - (CAST(4 AS HUGEINT) * 1024 * n1 * n4)
      |      // (CAST(n1 + 2*n2 AS HUGEINT) * n3), 1), 3071) AS BIGINT) END AS dq3
      |  FROM gs),
      |tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |aa AS (SELECT doc_id, list_prepend(chr(1), ts) AS arr FROM tk),
      |bg AS (SELECT doc_id, unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok
      |  FROM aa),
      |pt AS MATERIALIZED (SELECT b.doc_id,
      |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN
      |      CAST(greatest(COALESCE(m.cnt, 0)*1024 -
      |        CASE WHEN COALESCE(m.cnt, 0) = 1 THEN gq.dq1
      |          WHEN COALESCE(m.cnt, 0) = 2 THEN gq.dq2 ELSE gq.dq3 END, 0) AS HUGEINT)
      |        * (gq.t + gq.v)
      |      + (CAST(gq.dq1 AS HUGEINT) * cx.nv1 + CAST(gq.dq2 AS HUGEINT) * cx.nv2
      |        + CAST(gq.dq3 AS HUGEINT) * cx.nv3) * (COALESCE(cw.cw, 0) + 1)
      |    ELSE CAST(COALESCE(cw.cw, 0) + 1 AS HUGEINT) END AS num,
      |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN cx.ctx ELSE gq.t + gq.v END AS den1,
      |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN gq.t + gq.v ELSE CAST(1 AS BIGINT) END AS den2,
      |    CAST(CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN 10485760 ELSE 0 END AS BIGINT) AS adq
      |  FROM bg b LEFT JOIN m USING (prev, tok) LEFT JOIN cx ON b.prev = cx.prev
      |    LEFT JOIN cw ON b.tok = cw.tok CROSS JOIN gq),
      |$knLogReplayCtes""".stripMargin

  /** x142 replay: per-LANGUAGE Kneser–Ney (the CCNet deployment shape —
    * x137's keyed training composed with the KN smoother): every KN
    * statistic resolves within the lang key, docs of languages without a
    * model drop on the inner gq join (the keyed-scorer contract). */
  private val knLangSqlPrefix: String =
    s"""WITH RECURSIVE
      |tkr AS (SELECT lang, string_split(text, ' ') AS ts FROM documents
      |  WHERE source = 'src0'),
      |ar AS (SELECT lang, list_prepend(chr(1), ts) AS arr FROM tkr),
      |bgr AS (SELECT lang, unnest(arr[1:len(arr)-1]) AS prev,
      |    unnest(arr[2:len(arr)]) AS tok FROM ar),
      |m AS MATERIALIZED (SELECT lang, prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM bgr GROUP BY 1, 2, 3),
      |cx AS MATERIALIZED (SELECT lang, prev, CAST(SUM(cnt) AS BIGINT) AS ctx,
      |  CAST(COUNT(*) AS BIGINT) AS nv FROM m GROUP BY 1, 2),
      |cw AS MATERIALIZED (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cw
      |  FROM m GROUP BY 1, 2),
      |gq AS (SELECT lang, t, v, CASE WHEN n1 + 2*n2 = 0 THEN CAST(512 AS BIGINT)
      |    ELSE least(greatest((n1*1024)//(n1+2*n2), 1), 1023) END AS dq
      |  FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS t,
      |    CAST(COUNT(DISTINCT tok) AS BIGINT) AS v,
      |    CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |    FROM m GROUP BY 1)),
      |tk AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
      |aa AS (SELECT doc_id, lang, list_prepend(chr(1), ts) AS arr FROM tk),
      |bg AS (SELECT doc_id, lang, unnest(arr[1:len(arr)-1]) AS prev,
      |    unnest(arr[2:len(arr)]) AS tok FROM aa),
      |pt AS MATERIALIZED (SELECT b.doc_id,
      |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN
      |      CAST(greatest(COALESCE(m.cnt, 0)*1024 - gq.dq, 0) AS HUGEINT) * (gq.t + gq.v)
      |      + CAST(gq.dq * cx.nv AS HUGEINT) * (COALESCE(cw.cw, 0) + 1)
      |    ELSE CAST(COALESCE(cw.cw, 0) + 1 AS HUGEINT) END AS num,
      |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN cx.ctx ELSE gq.t + gq.v END AS den1,
      |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN gq.t + gq.v ELSE CAST(1 AS BIGINT) END AS den2,
      |    CAST(CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN 10485760 ELSE 0 END AS BIGINT) AS adq
      |  FROM bg b JOIN gq USING (lang)
      |    LEFT JOIN m ON m.lang = b.lang AND m.prev = b.prev AND m.tok = b.tok
      |    LEFT JOIN cx ON cx.lang = b.lang AND cx.prev = b.prev
      |    LEFT JOIN cw ON cw.lang = b.lang AND cw.tok = b.tok),
      |$knLogReplayCtes""".stripMargin

  /** x148/x149 shared replay scaffolding: the en-reference bigram model
    * with context totals+fan-outs (cx), continuation counts (cw), and the
    * (T, V) scalars — the [[knSqlPrefix]] chain minus the discount
    * estimator; `ptCols` supplies the per-smoother num/den1/den2/adq CASE
    * columns feeding the shared HUGEINT log ladder. */
  private def contSqlPrefix(ptCols: String): String =
    s"""WITH RECURSIVE
      |tkr AS (SELECT string_split(text, ' ') AS ts FROM documents WHERE lang = 'en'),
      |ar AS (SELECT list_prepend(chr(1), ts) AS arr FROM tkr),
      |bgr AS (SELECT unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok FROM ar),
      |m AS MATERIALIZED (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM bgr GROUP BY 1, 2),
      |cx AS MATERIALIZED (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS ctx,
      |  CAST(COUNT(*) AS BIGINT) AS nv FROM m GROUP BY 1),
      |cw AS MATERIALIZED (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cw FROM m GROUP BY 1),
      |gq AS (SELECT CAST(COUNT(*) AS BIGINT) AS t, CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
      |  FROM m),
      |tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |aa AS (SELECT doc_id, list_prepend(chr(1), ts) AS arr FROM tk),
      |bg AS (SELECT doc_id, unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok
      |  FROM aa),
      |pt AS MATERIALIZED (SELECT b.doc_id,
      |$ptCols
      |  FROM bg b LEFT JOIN m USING (prev, tok) LEFT JOIN cx ON b.prev = cx.prev
      |    LEFT JOIN cw ON b.tok = cw.tok CROSS JOIN gq),
      |$knLogReplayCtes""".stripMargin

  /** The shared `(doc_id, n_tokens, nll_q20, ce_bits)` oracle tail of the
    * LM scoring replays. */
  private val nllSqlTail: String =
    """ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1)
      |SELECT doc_id, n_tokens, nll_q20,
      |  CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce_bits
      |FROM ag ORDER BY doc_id""".stripMargin

  private val scoreLinearSql =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) AS h60 FROM toks),
      |sw AS (SELECT doc_id, (h60 // 2) % 64 AS bucket,
      |    CASE WHEN h60 % 2 = 1 THEN 1.0 ELSE -1.0 END AS sign FROM h),
      |dots AS (SELECT doc_id,
      |    SUM(sign * CAST((bucket * 37) % 101 - 50 AS DOUBLE) / 256.0) AS dot
      |  FROM sw GROUP BY 1)
      |SELECT d.doc_id, COALESCE(dots.dot, 0) + 17.0/256.0 AS logit,
      |  (COALESCE(dots.dot, 0) + 17.0/256.0) >= 0 AS keep
      |FROM documents d LEFT JOIN dots USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** x90 merge table: chained merges over corpus-vocabulary words (each
    * later pair extends an earlier result or stands alone). Chains are
    * chosen so NO two merge patterns compete for a character anywhere in
    * the corpus vocabulary — under that condition the BPE token count has
    * a closed form the oracle can replay: `length(text) − Σ_p
    * non-overlapping occurrences of pattern p` (each successful merge
    * removes exactly one symbol, and left-to-right `replace()` counting
    * matches the merge dynamics when patterns never contend). The
    * condition is exhaustively verified against the real merge loop in
    * the BpeSpec vocab sweep; text outside the vocab (real corpora) keeps
    * the engine correct but voids the closed form — the oracle is a
    * property of THIS table+corpus pair, the operator is general. The
    * oracle's base count uses DuckDB strlen (BYTES) to match the
    * tokenizer's UTF-8 byte-level start state, so the ASCII-vs-not
    * distinction cannot silently skew it. */
  private val bpeMerges: Seq[(String, String)] = Seq(
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("o", "r"), ("or", "d"),
    ("i", "n"), ("in", "d"), ("ind", "o"), ("indo", "w"),
    ("e", "r"),
    ("q", "u")
  )

  /** The x90 closed-form exact BPE token count as a SQL expression (see
    * bpeBudgetSql's strlen note) — shared with x156's per-language
    * fertility aggregate. */
  private val bpeExactSqlExpr: String = {
    val pats = bpeMerges.map { case (a, b) => a + b }
    "CAST(strlen(text)" + pats
      .map(p => s" - (length(text) - length(replace(text, '$p', ''))) // ${p.length}")
      .mkString + " AS INTEGER)"
  }

  private val bpeBudgetSql: Option[String] = Some {
    // Base count is strlen (BYTES): the engine's initial symbol count is
    // the UTF-8 byte count, and char-based length() would silently drift
    // on non-ASCII text instead of failing the precondition. Occurrence
    // counting stays char-based (each hit removes p.length chars either
    // way, and all patterns are ASCII).
    val exact = bpeExactSqlExpr
    s"""SELECT doc_id,
       |CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
       |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INTEGER) AS n_bpe_tokens,
       |round(CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS DOUBLE)
       |  / len(string_split(text, ' ')), 6) AS bpe_per_ws,
       |$exact AS n_bpe_exact
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** The closed corpus vocabulary the testdata generator draws
    * documents.text from (pinned in BpeSpec's x90 sweep). */
  private val corpusVocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "the", "value", "vector", "window"
  )

  /** INDEPENDENT tokenization replay for the x98 oracle: greedy
    * leftmost-longest match over the merge-RESULT pattern set. NOT the
    * merge loop — under bpeMerges' no-contention chain property the two
    * provably coincide, and that equivalence is pinned two ways: an
    * exhaustive both-variant vocab sweep in BpeSpec, and a build-time
    * require against the real encoder right below. Space maps to Ġ
    * (byte-level table, ASCII-only corpus — see x90's strlen note). */
  private def greedyBpe(word: String): Seq[String] = {
    val pats = bpeMerges.map { case (a, b) => a + b }.sortBy(-_.length)
    val mapped = word.map(c => if (c == ' ') 'Ġ' else c)
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < mapped.length) {
      pats.find(p => mapped.startsWith(p, i)) match {
        case Some(p) => out += p; i += p.length
        case None => out += mapped(i).toString; i += 1
      }
    }
    out.result()
  }

  /** Per-word token lists for both positions a word can occupy (doc-first
    * = bare, otherwise space-prefixed — single-spaced corpus, GPT-2
    * pre-tokenizer attaches the space to the following word), plus the
    * derived token→id vocab (distinct tokens, sorted, id = index). */
  private lazy val (bpeVocab: Map[String, Int], bpeWordIds: Seq[(String, Boolean, Seq[Int])]) = {
    val variants = corpusVocab.flatMap { w =>
      Seq((w, true, greedyBpe(w)), (w, false, greedyBpe(" " + w)))
    }
    // build-time pin: greedy replay == the REAL merge-loop encoder on
    // every variant (the no-contention precondition, enforced loudly)
    val ranks = new graft.functions.Bpe.Ranks(bpeMerges)
    variants.foreach { case (w, first, toks) =>
      val real = graft.functions.Bpe.encode(if (first) w else " " + w, ranks).toSeq
      require(
        real == toks,
        s"x98 oracle precondition broken: greedy $toks != merge-loop $real for '$w' (first=$first)"
      )
    }
    val vocab = variants.flatMap(_._3).distinct.sorted.zipWithIndex.toMap
    (vocab, variants.map { case (w, first, toks) => (w, first, toks.map(vocab)) })
  }

  private lazy val bpeIdsSql: Option[String] = Some {
    val rows = bpeWordIds
      .map { case (w, first, ids) => s"('$w', ${if (first) "TRUE" else "FALSE"}, [${ids.mkString(", ")}])" }
      .mkString(",\n|  ")
    s"""WITH wt(w, first, ids) AS (VALUES
       |  $rows),
       |tk AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |ex AS (SELECT doc_id, i, ws[i] AS w FROM tk, unnest(range(1, len(ws) + 1)) AS u(i)),
       |wi AS (SELECT doc_id, i, wt.ids FROM ex JOIN wt ON wt.w = ex.w AND wt.first = (ex.i = 1)),
       |o AS (SELECT doc_id, i, ids,
       |    SUM(len(ids)) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len(ids) AS off
       |  FROM wi)
       |SELECT doc_id, CAST(off + j - 1 AS INTEGER) AS pos, CAST(ids[j] AS INTEGER) AS token_id
       |FROM o, unnest(range(1, len(ids) + 1)) AS u(j)
       |ORDER BY doc_id, pos""".stripMargin
  }

  /** x99's oracle: the ENTIRE BPE training loop replayed in SQL — the
    * word-frequency dictionary, then per learned merge one unrolled CTE
    * stage that (a) counts adjacent pairs weighted by word count, (b)
    * picks max-count / lexicographically-smallest, (c) merges all
    * non-overlapping occurrences left-to-right (run starts via a
    * LAG-window run id + parity — the scan dependency greedy merging
    * needs, expressed with windows). Tie-break and pair-count semantics
    * (overlaps counted) match TextAnalysis.bpeTrain exactly. The
    * dictionary CTE replays the GPT-2 pre-tokenizer for this corpus
    * family: per space-separated word, runs of letters/digits/other with
    * Ġ on the FIRST piece (lowercase-ASCII precondition — sf10's
    * amplified corpus adds digit-bearing words like `c5`, which the real
    * pre-tokenizer splits, so a bare word split would diverge there).
    *
    * Every CTE from the frequency dictionary on is `AS MATERIALIZED`:
    * DuckDB inlines CTEs by default, and with each stage referencing
    * `s$$n`/`b$$n` several times the unrolled k-stage chain duplicates
    * the corpus-level dictionary scan EXPONENTIALLY (~4^k copies — at
    * sf0.1 that spilled >75 GB of temp before failing). Materialized,
    * the corpus is scanned once and every later CTE is |vocab|-sized. */
  private def bpeTrainSql(k: Int): Option[String] = Some {
    def stage(n: Int): String =
      s"""p$n AS MATERIALIZED (SELECT syms[i] AS a, syms[i+1] AS b, SUM(cnt) AS c
         |  FROM s$n, unnest(range(1, len(syms))) u(i) GROUP BY 1, 2),
         |b$n AS MATERIALIZED (SELECT a, b FROM p$n ORDER BY c DESC, a, b LIMIT 1),
         |e$n AS MATERIALIZED (SELECT w, cnt, i, syms[i] AS sym,
         |    (i < len(syms) AND syms[i] = (SELECT a FROM b$n)
         |     AND syms[i+1] = (SELECT b FROM b$n)) AS m
         |  FROM s$n, unnest(range(1, len(syms) + 1)) u(i)),
         |q$n AS (SELECT w, cnt, i, sym, m,
         |    COALESCE(LAG(m) OVER (PARTITION BY w ORDER BY i), FALSE) AS pm
         |  FROM e$n),
         |r$n AS (SELECT w, cnt, i, sym, m,
         |    SUM(CASE WHEN m AND NOT pm THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY w ORDER BY i) AS rid
         |  FROM q$n),
         |g$n AS (SELECT w, cnt, i, sym, m, rid,
         |    MIN(CASE WHEN m THEN i END) OVER (PARTITION BY w, rid) AS rs
         |  FROM r$n),
         |h$n AS (SELECT w, cnt, i, sym, (m AND (i - rs) % 2 = 0) AS ms FROM g$n),
         |k$n AS (SELECT w, cnt, i,
         |    CASE WHEN ms THEN sym || (SELECT b FROM b$n)
         |         WHEN COALESCE(LAG(ms) OVER (PARTITION BY w ORDER BY i), FALSE) THEN NULL
         |         ELSE sym END AS nsym
         |  FROM h$n),
         |s${n + 1} AS MATERIALIZED (SELECT w, cnt, list(nsym ORDER BY i) AS syms
         |  FROM k$n WHERE nsym IS NOT NULL GROUP BY w, cnt)""".stripMargin
    val union = (0 until k)
      .map(n => s"SELECT $n AS rank, a, b FROM b$n")
      .mkString(" UNION ALL ")
    s"""WITH tk AS (SELECT string_split(text, ' ') AS ws FROM documents),
       |ex AS (SELECT CASE WHEN j = 1 THEN pre || ps[j] ELSE ps[j] END AS w
       |  FROM (SELECT CASE WHEN i = 1 THEN '' ELSE 'Ġ' END AS pre,
       |      regexp_extract_all(ws[i], '[a-z]+|[0-9]+|[^a-z0-9]+') AS ps
       |    FROM tk, unnest(range(1, len(ws) + 1)) u(i)) t,
       |  unnest(range(1, len(ps) + 1)) v(j)),
       |wd AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM ex GROUP BY 1),
       |s0 AS MATERIALIZED (SELECT w, cnt, string_split(w, '') AS syms FROM wd),
       |${(0 until k).map(stage).mkString(",\n")}
       |SELECT CAST(rank AS INTEGER) AS rank, a, b FROM ($union) ORDER BY rank""".stripMargin
  }

  /** x91's planted eval canary: 13 words outside the corpus vocabulary,
    * appended to every doc_id % 5 == 1 doc; the reference set is this one
    * line, so its single 13-gram is the only possible overlap. */
  private val CanaryLine =
    "zcan1 zcan2 zcan3 zcan4 zcan5 zcan6 zcan7 zcan8 zcan9 zcan10 zcan11 zcan12 zcan13"

  /** x157's SECOND planted suite: 15 words -> THREE 13-grams, so its hit
    * counts differ from suite A's single gram (the attribution report
    * must carry real per-suite counts, not booleans). */
  private val CanaryLineB =
    "qcan1 qcan2 qcan3 qcan4 qcan5 qcan6 qcan7 qcan8 qcan9 qcan10 qcan11 qcan12 qcan13 qcan14 qcan15"

  private val plantedPairSql =
    """SELECT a.doc_id AS d1, b.doc_id AS d2
      |FROM documents a JOIN documents b
      |  ON a.doc_id < b.doc_id AND a.doc_id % 40 = b.doc_id % 40
      |ORDER BY d1, d2""".stripMargin

  private val minhashMins = Dedup.MinhashAs
    .zip(Dedup.MinhashBs)
    .zipWithIndex
    .map { case ((a, b), i) => s"MIN(($a*h+$b) % ${Dedup.MinhashP2}) AS m$i" }
    .mkString(", ")

  /** MinHash bands CTEs (shared by x03 and the x22 pipeline oracle);
    * expects `sh` in scope. */
  private val minhashCtes =
    s"""tok AS (SELECT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) % ${Dedup.MinhashHashMod} + 1 AS h FROM sh),
       |sig AS (SELECT doc_id, $minhashMins FROM tok GROUP BY 1),
       |bands AS (
       |  SELECT doc_id, 0 AS band, m0*100000+m1 AS bh FROM sig UNION ALL
       |  SELECT doc_id, 1, m2*100000+m3 FROM sig UNION ALL
       |  SELECT doc_id, 2, m4*100000+m5 FROM sig UNION ALL
       |  SELECT doc_id, 3, m6*100000+m7 FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin

  private val simhashBits = (0 until 16)
    .map(i =>
      s"(CASE WHEN SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << i} ELSE 0 END)"
    )
    .mkString(" + ")

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    Q(
      "x01_dedup_exact",
      (s, d) =>
        Dedup
          .exactWithCounts(t(s, d, "documents"), Seq("text"), "doc_id")
          .select(col("doc_id"), col("n_dups"), md5(col("text")).as("h"))
          .orderBy("doc_id"),
      Some("""SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups, md5(text) AS h
             |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x02_jaccard_pairs",
      (s, d) =>
        Dedup
          .jaccardPairs(t(s, d, "documents").filter(col("lang") === "de"), "doc_id", "text", 0.75)
          .select(col("d1"), col("d2"), round(col("j"), 6).as("jac"))
          .orderBy("d1", "d2"),
      Some("""WITH d AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS toks
             |           FROM documents WHERE lang = 'de'),
             |p AS (SELECT a.doc_id d1, b.doc_id d2,
             |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS j
             |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
             |SELECT d1, d2, round(j, 6) AS jac FROM p WHERE j >= 0.75 ORDER BY d1, d2""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x03_minhash_lsh",
      (s, d) =>
        Dedup
          .minhashCandidates(t(s, d, "documents"), "doc_id", "text")
          .orderBy("d1", "d2"),
      Some(s"""WITH $shingleCte,
              |$minhashCtes
              |SELECT d1, d2 FROM cand ORDER BY d1, d2""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x04_simhash",
      (s, d) => Dedup.simhash16(tw(s, d, "documents"), "doc_id", "text").orderBy("doc_id"),
      Some(s"""WITH $shingleCte,
              |tok AS (SELECT DISTINCT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) AS h FROM sh)
              |SELECT doc_id, CAST($simhashBits AS BIGINT) AS simhash
              |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x05_ann_topk",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity
          .bruteForceTopK(e.filter(col("vec_id") < 5), e, "vec_id", "embedding", 10)
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |q AS (SELECT * FROM e WHERE vec_id < 5),
             |sims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |  round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
             |  FROM q JOIN e c ON q.vec_id != c.vec_id),
             |rk AS (SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn FROM sims)
             |SELECT qid, cid, sim, rn FROM rk WHERE rn <= 10 ORDER BY qid, rn""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x06_embed_nn",
      (s, d) =>
        Similarity.nearestNeighbor(t(s, d, "embeddings"), "vec_id", "embedding").orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |sims AS (SELECT a.vec_id AS vec_id, b.vec_id AS cid,
             |  round(list_dot_product(a.v, b.v)
             |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
             |  FROM e a JOIN e b ON a.vec_id != b.vec_id),
             |rk AS (SELECT vec_id, cid, sim,
             |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM sims)
             |SELECT vec_id, cid AS nn_id, sim FROM rk WHERE rn = 1 ORDER BY vec_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x07_token_stats",
      (s, d) => TextAnalysis.tokenStats(t(s, d, "documents"), "doc_id", "text").orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
             |round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |  / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS ttr
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x08_quality_score",
      (s, d) => TextAnalysis.qualityScore(t(s, d, "documents"), "doc_id", "text").orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             |  / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS avg_tok_len,
             |round(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
             |  + 0.5 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
             |      / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0), 6) AS quality
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x09_lang_id",
      (s, d) =>
        TextAnalysis.langId(t(s, d, "documents"), "doc_id", "text", "lang").orderBy("doc_id"),
      Some {
        val counts = TextAnalysis.LangMarkers.map { case (lang, ms) =>
          lang -> s"len(list_filter(string_split(text, ' '), x -> x IN (${ms.map(m => s"'$m'").mkString(",")})))"
        }
        val best = s"greatest(${counts.map(_._2).mkString(", ")})"
        val pred =
          "CASE " + counts.map { case (l, c) => s"WHEN $c = $best THEN '$l'" }.mkString(" ") + " END"
        s"""SELECT doc_id, $pred AS pred_lang, lang, ($pred = lang) AS is_match
           |FROM documents ORDER BY doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    Q(
      "x10_fingerprint",
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x11_json_extract",
      (s, d) =>
        t(s, d, "events")
          // the filter is a self-consistency check: the from_json (schema)
          // and get_json_object (path) extractions must agree on every row,
          // so it keeps everything - exercising both JSON surfaces
          .filter(
            from_json(col("props"), "k INT", Map.empty[String, String]).getField("k") ===
              get_json_object(col("props"), "$.k").cast(IntegerType)
          )
          .groupBy(get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 14).as("sum_v"))
          .orderBy("k"),
      Some(s"""SELECT CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
              |COUNT(*) AS n, ${Sql.dsum("value", 14)} AS sum_v
              |FROM events GROUP BY 1 ORDER BY k""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x12_window_5m",
      (s, d) =>
        t(s, d, "events")
          .groupBy(expr("(ts div 300000000000) * 300").as("bucket_s"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 14).as("sum_v"))
          .orderBy("bucket_s", "event_type"),
      Some(s"""SELECT (epoch_ns(ts) // 300000000000) * 300 AS bucket_s, event_type,
              |COUNT(*) AS n, ${Sql.dsum("value", 14)} AS sum_v
              |FROM events GROUP BY 1, 2 ORDER BY bucket_s, event_type""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x13_sessionize",
      (s, d) =>
        TimeOps
          .sessionize(
            t(s, d, "events").select(col("user_id"), col("event_id"), expr("ts div 1000").as("tus")),
            "user_id",
            "tus",
            "event_id",
            1800000000L
          )
          .groupBy("user_id", "sid")
          .agg(
            min("tus").as("session_start_us"),
            max("tus").as("session_end_us"),
            count(lit(1)).as("n_events")
          )
          .orderBy("user_id", "sid"),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
             |m AS (SELECT *, CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
             |  OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
             |  THEN 1 ELSE 0 END AS new_s FROM e),
             |x AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM m)
             |SELECT user_id, sid, MIN(tus) AS session_start_us, MAX(tus) AS session_end_us,
             |COUNT(*) AS n_events
             |FROM x GROUP BY 1, 2 ORDER BY user_id, sid""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x14_asof_join",
      (s, d) => {
        val ev = t(s, d, "events")
        AsOf
          .asofJoin(
            ev.filter(col("event_type") === "purchase"),
            ev.filter(col("event_type") === "click"),
            Seq("user_id"),
            "ts",
            Seq("event_id")
          )
          .select(col("event_id").as("purchase_id"), col("event_id_asof").as("click_id"))
          .orderBy("purchase_id")
      },
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY purchase_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x15_rollup",
      (s, d) => {
        // rollup via re-aggregation of the base aggregate, not Expand:
        // `.rollup()` triples every input row through the decimal aggregate;
        // aggregating once to the (flag, status) grain (6 rows) and deriving
        // the coarser levels from those partials is exact (decimal sums are
        // associative) and scans the fact table once — the only shape that
        // survives a 100 TB fact table.
        val base = t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(12, 2))).as("sq")
          )
        val lvl2 = base.select(col("l_returnflag"), col("l_linestatus"), col("n"), col("sq"))
        val lvl1 = base
          .groupBy("l_returnflag")
          .agg(sum(col("n")).as("n"), sum(col("sq")).as("sq"))
          .select(col("l_returnflag"), lit(null).cast("string").as("l_linestatus"), col("n"), col("sq"))
        val lvl0 = base
          .agg(sum(col("n")).as("n"), sum(col("sq")).as("sq"))
          .select(
            lit(null).cast("string").as("l_returnflag"),
            lit(null).cast("string").as("l_linestatus"),
            col("n"),
            col("sq")
          )
        lvl2
          .select(col("l_returnflag"), col("l_linestatus"), col("n"), col("sq").cast("double").as("sum_qty"))
          .unionByName(lvl1.select(col("l_returnflag"), col("l_linestatus"), col("n"), col("sq").cast("double").as("sum_qty")))
          .unionByName(lvl0.select(col("l_returnflag"), col("l_linestatus"), col("n"), col("sq").cast("double").as("sum_qty")))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              |${Sql.dsum("l_quantity", 12)} AS sum_qty
              |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x16_setops",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val f = li.filter(col("l_linestatus") === "F").select("l_returnflag")
        val o = li.filter(col("l_linestatus") === "O").select("l_returnflag")
        val a = f.intersect(o).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
        val b = f.except(o).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
        val c =
          f.union(o).distinct().agg(count(lit(1)).as("n")).withColumn("op", lit("union_distinct"))
        a.unionByName(b).unionByName(c).select("op", "n").orderBy("op")
      },
      Some("""SELECT 'intersect' AS op, (SELECT COUNT(*) FROM (
             |  SELECT l_returnflag FROM lineitem WHERE l_linestatus='F'
             |  INTERSECT SELECT l_returnflag FROM lineitem WHERE l_linestatus='O') t) AS n
             |UNION ALL
             |SELECT 'except', (SELECT COUNT(*) FROM (
             |  SELECT l_returnflag FROM lineitem WHERE l_linestatus='F'
             |  EXCEPT SELECT l_returnflag FROM lineitem WHERE l_linestatus='O') t)
             |UNION ALL
             |SELECT 'union_distinct', (SELECT COUNT(*) FROM (
             |  SELECT DISTINCT l_returnflag FROM lineitem WHERE l_linestatus='F'
             |  UNION SELECT l_returnflag FROM lineitem WHERE l_linestatus='O') t)
             |ORDER BY op""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "x17_winfuncs",
      (s, d) => {
        val w1 = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
        val w2 = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
        t(s, d, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("o_totalprice"),
            row_number().over(w1).as("rn"),
            rank().over(w2).as("rnk"),
            dense_rank().over(w2).as("drnk")
          )
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT * FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn,
             |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
             |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS drnk
             |  FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Join-variant surface (SURVEY.md §2.3: absent in the reference, exposed
    // by the engine): left outer, left semi (EXISTS), left anti (NOT EXISTS).
    Q(
      "x21_join_variants",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
        val leftN = c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .agg(count(lit(1)).as("n")).withColumn("op", lit("left_rows"))
        val semiN = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n")).withColumn("op", lit("semi_rows"))
        val antiN = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")).withColumn("op", lit("anti_rows"))
        leftN.unionByName(semiN).unionByName(antiN).select("op", "n").orderBy("op")
      },
      Some("""WITH big AS (SELECT * FROM orders WHERE o_totalprice > 300000.0)
             |SELECT 'left_rows' AS op, (SELECT COUNT(*) FROM customer LEFT JOIN big ON c_custkey = o_custkey) AS n
             |UNION ALL
             |SELECT 'semi_rows', (SELECT COUNT(*) FROM customer c WHERE EXISTS (SELECT 1 FROM big WHERE o_custkey = c.c_custkey))
             |UNION ALL
             |SELECT 'anti_rows', (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS (SELECT 1 FROM big WHERE o_custkey = c.c_custkey))
             |ORDER BY op""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // HLL approximate distinct. The HLL estimate itself is
    // algorithm-specific, so the oracled contract is an error bound. The
    // default rsd is 0.05 — ONE standard deviation, which a correct
    // estimate exceeds on ~1/3 of datasets — so the gate asserts 3*rsd
    // (15%): tight enough to catch a broken sketch, loose enough to hold
    // across scale factors. The oracle emits TRUE + the exact count — if
    // the estimate drifts out of bound, the hash compare fails.
    Q(
      "x18_approx_distinct",
      (s, d) =>
        t(s, d, "lineitem")
          .agg(
            approx_count_distinct(col("l_partkey")).as("n_approx"),
            countDistinct(col("l_partkey")).as("n_exact")
          )
          .select(
            (abs(col("n_approx") - col("n_exact")) / col("n_exact") <= 0.15).as("within_bound"),
            col("n_exact")
          ),
      Some(
        "SELECT TRUE AS within_bound, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact FROM lineitem"
      )
    ),
    // ------------------------------------------------------------------
    Q(
      "x19_multimodal_payload",
      (s, d) =>
        Multimodal
          .withPayload(t(s, d, "documents").withColumn("hex", md5(col("text"))), "hex")
          .select(
            col("doc_id"),
            col("meta.n_bytes").as("payload_len"),
            base64(col("payload")).as("b64")
          )
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CAST(octet_length(from_hex(md5(text))) AS INTEGER) AS payload_len,
             |to_base64(from_hex(md5(text))) AS b64
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // The reference's `col == col.max()` idiom (examples/basic_usage.py:238-244):
    // rows equal to their group maximum, via a window max.
    Q(
      "x27_group_max_rows",
      (s, d) => {
        val w = Window.partitionBy("event_type")
        t(s, d, "events")
          .withColumn("mx", max("value").over(w))
          .filter(col("value") === col("mx"))
          .select("event_id", "event_type", "value")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type, value FROM (
             |  SELECT event_id, event_type, value,
             |         MAX(value) OVER (PARTITION BY event_type) AS mx
             |  FROM events) t
             |WHERE value = mx ORDER BY event_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Generator/explode surface: token frequency table (top-20).
    Q(
      "x33_token_explode",
      (s, d) =>
        t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("token"))
          .limit(20),
      Some("""SELECT tok AS token, COUNT(*) AS n
             |FROM documents, unnest(string_split(text, ' ')) AS t(tok)
             |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Weighted mean via sum products (reference: docs/examples/index.md:187-189
    // — quantity-weighted price), exact through decimal products.
    Q(
      "x32_weighted_mean",
      (s, d) => {
        val wp = col("l_extendedprice").cast(DecimalType(12, 2)) *
          col("l_quantity").cast(DecimalType(7, 2))
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            (sum(wp).cast("double") / sum(col("l_quantity").cast(DecimalType(7, 2))).cast("double"))
              .as("wavg_price"),
            sum(wp).cast("double").as("sum_pq")
          )
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE)
             |  / CAST(SUM(CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE) AS wavg_price,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE) AS sum_pq
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Rolling + cumulative frames (ROWS BETWEEN): decimal-routed sums so the
    // sliding-window implementation strategy (recompute vs slide) cannot
    // perturb the floats.
    Q(
      "x28_rolling",
      (s, d) => {
        val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val roll5 = ord.rowsBetween(-4, Window.currentRow)
        val dec = col("value").cast(DecimalType(14, 2))
        t(s, d, "events")
          .select(
            col("event_id"),
            col("user_id"),
            count(lit(1)).over(cum).as("cum_n"),
            sum(dec).over(cum).cast("double").as("cum_sum"),
            sum(dec).over(roll5).cast("double").as("roll5_sum"),
            (sum(dec).over(roll5).cast("double") / count(lit(1)).over(roll5).cast("double"))
              .as("roll5_avg")
          )
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |count(*) OVER cum AS cum_n,
             |CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER cum AS DOUBLE) AS cum_sum,
             |CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER r5 AS DOUBLE) AS roll5_sum,
             |CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER r5 AS DOUBLE)
             |  / CAST(count(*) OVER r5 AS DOUBLE) AS roll5_avg
             |FROM events
             |WINDOW cum AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |       r5 AS (PARTITION BY user_id ORDER BY ts, event_id
             |              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // arg-max per group with a total tie-break (max_by over a struct key).
    Q(
      "x29_argmax",
      (s, d) =>
        t(s, d, "events")
          .groupBy("event_type")
          .agg(
            max_by(col("event_id"), struct(col("value"), col("event_id"))).as("top_event"),
            max(col("value")).as("top_value")
          )
          .orderBy("event_type"),
      Some("""SELECT event_type, event_id AS top_event, mx AS top_value FROM (
             |  SELECT event_type, event_id, value,
             |         MAX(value) OVER (PARTITION BY event_type) AS mx,
             |         row_number() OVER (PARTITION BY event_type
             |                            ORDER BY value DESC, event_id DESC) AS rn
             |  FROM events) t
             |WHERE rn = 1 ORDER BY event_type""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Null handling on a genuinely-null column (as-of misses): coalesce fill
    // + drop-nulls count.
    Q(
      "x30_null_handling",
      (s, d) => {
        val ev = t(s, d, "events")
        val matched = AsOf
          .asofJoin(
            ev.filter(col("event_type") === "purchase"),
            ev.filter(col("event_type") === "click"),
            Seq("user_id"),
            "ts",
            Seq("event_id")
          )
          .select(col("event_id").as("purchase_id"), col("event_id_asof").as("click_id"))
        matched
          .agg(
            count(lit(1)).as("n_total"),
            count(col("click_id")).as("n_matched"),
            sum(when(col("click_id").isNull, 1L).otherwise(0L)).as("n_null"),
            min(coalesce(col("click_id"), lit(-1L))).as("min_filled")
          )
      },
      Some("""WITH m AS (
             |  SELECT p.event_id AS purchase_id, c.event_id AS click_id
             |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |    ON p.user_id = c.user_id AND p.ts >= c.ts)
             |SELECT COUNT(*) AS n_total, COUNT(click_id) AS n_matched,
             |CAST(SUM(CASE WHEN click_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |MIN(COALESCE(click_id, -1)) AS min_filled
             |FROM m""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // String scalar functions.
    Q(
      "x31_string_ops",
      (s, d) =>
        t(s, d, "customer")
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("uname"),
            substring(col("c_name"), 1, 8).as("prefix"),
            length(col("c_name")).as("name_len"),
            concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
            lpad(col("c_custkey").cast("string"), 10, "0").as("padded")
          )
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, upper(c_name) AS uname, substring(c_name, 1, 8) AS prefix,
             |CAST(length(c_name) AS INTEGER) AS name_len,
             |concat_ws('|', c_mktsegment, c_name) AS tagged,
             |lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Pivot (wide aggregation) — absent in the reference, Catalyst built-in.
    Q(
      "x23_pivot",
      (s, d) =>
        t(s, d, "events")
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(dsum(col("value"), 14))
          .orderBy("user_id"),
      Some(s"""SELECT user_id,
              |CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(14,2)) END) AS DOUBLE) AS click,
              |CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(14,2)) END) AS DOUBLE) AS error,
              |CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(14,2)) END) AS DOUBLE) AS purchase,
              |CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(14,2)) END) AS DOUBLE) AS signup,
              |CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(14,2)) END) AS DOUBLE) AS view
              |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Distribution window functions: percent_rank / cume_dist / ntile.
    Q(
      "x24_distribution_ranks",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
        t(s, d, "customer")
          .select(
            col("c_custkey"),
            col("c_mktsegment"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"),
            ntile(4).over(w).as("quartile")
          )
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment,
             |round(percent_rank() OVER w, 6) AS pr,
             |round(cume_dist() OVER w, 6) AS cd,
             |CAST(ntile(4) OVER w AS INTEGER) AS quartile
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
             |ORDER BY c_custkey""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Regex extraction over text.
    Q(
      "x25_regex_extract",
      (s, d) =>
        t(s, d, "documents")
          .groupBy(regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"))
          .agg(count(lit(1)).as("n"), max(col("n_chars")).as("max_chars"))
          .orderBy("first_word"),
      Some("""SELECT regexp_extract(text, '^([a-z]+)', 1) AS first_word,
             |COUNT(*) AS n, MAX(n_chars) AS max_chars
             |FROM documents GROUP BY 1 ORDER BY first_word""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Date arithmetic: datediff / date_add / truncation.
    Q(
      "x26_date_arith",
      (s, d) =>
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType))
              .as("days_since"),
            date_add(col("o_orderdate").cast(DateType), 30).as("due_date"),
            trunc(col("o_orderdate").cast(DateType), "quarter").as("qtr_start")
          )
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
             |CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
             |date_trunc('quarter', CAST(o_orderdate AS DATE)) AS qtr_start
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // The flagship composed pipeline: quality gate -> exact dedup ->
    // MinHash-LSH near-dup removal, oracle-checked end to end.
    Q(
      "x22_clean_corpus",
      (s, d) =>
        Pipeline
          .cleanCorpus(t(s, d, "documents"), "doc_id", "text", 0.6, 0.8)
          .select(col("doc_id"), md5(col("text")).as("h"))
          .orderBy("doc_id"),
      Some {
        val quality =
          """round(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
            |  + 0.5 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
            |      / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0), 6)""".stripMargin
        s"""WITH passed AS (SELECT doc_id, text FROM documents WHERE $quality >= 0.6),
           |dedup AS (SELECT doc_id, text FROM (
           |  SELECT doc_id, text, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           |  FROM passed) t WHERE rn = 1),
           |${shingleCteFrom("dedup")},
           |$minhashCtes,
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
           |inter AS (SELECT c.d1, c.d2, COUNT(*) AS ni FROM cand c
           |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
           |  GROUP BY 1, 2),
           |pairs AS (SELECT d1, d2 FROM inter
           |  JOIN sizes sa ON sa.doc_id = inter.d1
           |  JOIN sizes sb ON sb.doc_id = inter.d2
           |  WHERE CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni) >= 0.8)
           |SELECT doc_id, md5(text) AS h FROM dedup
           |WHERE doc_id NOT IN (SELECT d2 FROM pairs)
           |ORDER BY doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // IVF approximate top-k: coarse-centroid cell assignment (packed-long
    // argmax) + cell equi-join search. Centroids: vectors with vec_id < 8
    // (deterministic stand-in for a sampled k-means fit).
    Q(
      "x34_ivf_topk",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity
          .ivfTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding", 5)
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |cen AS (SELECT vec_id AS cen_id, v AS cv FROM e WHERE vec_id < 8),
             |score AS (SELECT e.vec_id, cen.cen_id,
             |  round(list_dot_product(e.v, cen.cv)
             |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cen.cv, cen.cv))), 6) AS sim
             |  FROM e CROSS JOIN cen),
             |asg AS (SELECT vec_id, cen_id AS cell FROM (
             |  SELECT vec_id, cen_id,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cen_id) AS r
             |  FROM score) t WHERE r = 1),
             |sims AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid,
             |  round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
             |  FROM asg qa JOIN asg ca ON qa.cell = ca.cell AND qa.vec_id != ca.vec_id
             |  JOIN e q ON q.vec_id = qa.vec_id JOIN e c ON c.vec_id = ca.vec_id),
             |rk AS (SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
             |  FROM sims)
             |SELECT qid, cid, sim, rn FROM rk WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // CUBE via re-aggregation of the finest-grain aggregate (one fact scan;
    // no 4x Expand) — see Relational.cubeCountDsum.
    Q(
      "x35_cube",
      (s, d) =>
        Relational
          .cubeCountDsum(t(s, d, "lineitem"), "l_returnflag", "l_linestatus", "l_quantity", "sum_qty", 12)
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              |${Sql.dsum("l_quantity", 12)} AS sum_qty
              |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Bucketed point-in-interval join (RangeJoin.pointInInterval): price
    // bands x lineitem prices, equi-join on quantized bucket + exact
    // re-check — never the cross product a bare range predicate would plan.
    Q(
      "x36_range_join",
      (s, d) => {
        val bands = s
          .range(30)
          .select(
            col("id").as("band_id"),
            (lit(800.0) + col("id") * lit(3400.0)).as("lo"),
            (lit(800.0) + col("id") * lit(3400.0) + lit(2000.0) + (col("id") % 5) * lit(700.0))
              .as("hi")
          )
        RangeJoin
          .pointInInterval(
            t(s, d, "lineitem").select("l_extendedprice"),
            "l_extendedprice",
            bands,
            "lo",
            "hi",
            1000.0
          )
          .groupBy("band_id")
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice"), 12).as("sum_price"))
          .orderBy("band_id")
      },
      Some(s"""WITH bands AS (SELECT i AS band_id,
              |  CAST(800.0 + i*3400.0 AS DOUBLE) AS lo,
              |  CAST(800.0 + i*3400.0 + 2000.0 + (i % 5)*700.0 AS DOUBLE) AS hi
              |  FROM range(30) t(i))
              |SELECT band_id, COUNT(*) AS n, ${Sql.dsum("l_extendedprice", 12)} AS sum_price
              |FROM lineitem JOIN bands ON l_extendedprice >= lo AND l_extendedprice < hi
              |GROUP BY band_id ORDER BY band_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // TF-IDF top-3 terms per document (TextAnalysis.tfIdf): corpus-level
    // document frequency + broadcast scalar N, per-doc top-k window.
    Q(
      "x37_tfidf",
      (s, d) =>
        TextAnalysis
          .tfIdf(t(s, d, "documents"), "doc_id", "text", 3)
          .withColumnRenamed("rank", "rk")
          .orderBy("doc_id", "rk"),
      Some("""WITH tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) u
             |  GROUP BY 1, 2),
             |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT COUNT(*) AS nn FROM documents),
             |scored AS (SELECT doc_id, term, tf,
             |  round(CAST(tf AS DOUBLE) * ln(CAST(nn + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)), 6) AS tfidf
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
             |rk AS (SELECT doc_id, term, tf, tfidf,
             |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rk
             |  FROM scored)
             |SELECT doc_id, term, tf, tfidf, rk FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Decontamination (Dedup.decontaminate): drop corpus docs whose
    // canonical fingerprint appears in a reference/eval set (here: every
    // 7th doc plays the benchmark) — broadcast anti-join on the fingerprint.
    Q(
      "x38_decontam",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup
          .decontaminate(docs, docs.filter(col("doc_id") % 7 === 0), "text")
          .select(col("doc_id"), md5(col("text")).as("h"))
          .orderBy("doc_id")
      },
      Some("""WITH fp AS (SELECT doc_id,
             |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS f
             |  FROM documents)
             |SELECT d.doc_id, md5(d.text) AS h
             |FROM documents d JOIN fp ON fp.doc_id = d.doc_id
             |WHERE fp.f NOT IN (SELECT DISTINCT f FROM fp WHERE doc_id % 7 = 0)
             |ORDER BY d.doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Deterministic stratified hash sampling (Scale.stratifiedHashSample):
    // reproducible per-stratum rates off a portable key hash — identical
    // output at any partition count, unlike RNG-based sampleBy.
    Q(
      "x39_strat_sample",
      (s, d) =>
        Scale
          .stratifiedHashSample(
            tw(s, d, "lineitem"),
            Seq("l_orderkey", "l_linenumber"),
            "l_returnflag",
            Map("A" -> 0.1, "N" -> 0.2, "R" -> 0.05)
          )
          .select("l_orderkey", "l_linenumber", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM (
             |  SELECT l_orderkey, l_linenumber, l_returnflag,
             |    CAST('0x' || substr(md5(coalesce(CAST(l_orderkey AS VARCHAR), chr(1)) || '|'
             |      || coalesce(CAST(l_linenumber AS VARCHAR), chr(1))), 18, 15) AS BIGINT) % 1000 AS hb
             |  FROM lineitem) t
             |WHERE (l_returnflag = 'A' AND hb < CAST(0.1 AS DOUBLE) * 1000)
             |   OR (l_returnflag = 'N' AND hb < CAST(0.2 AS DOUBLE) * 1000)
             |   OR (l_returnflag = 'R' AND hb < CAST(0.05 AS DOUBLE) * 1000)
             |ORDER BY 1, 2, 3""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Per-label embedding centroids (Similarity.labelCentroids): decimal-
    // routed elementwise mean, long format — exact at any parallelism.
    Q(
      "x40_label_centroids",
      (s, d) =>
        Similarity
          .labelCentroids(t(s, d, "embeddings"), "label", "embedding")
          .orderBy("label", "pos"),
      Some("""WITH ex AS (SELECT label,
             |  CAST(generate_subscripts(embedding, 1) AS INTEGER) - 1 AS pos,
             |  CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings)
             |SELECT label, pos,
             |  round(CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS mean
             |FROM ex GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Near-duplicate CLUSTERS (Graph.connectedComponents over the verified
    // LSH pair list): transitive closure by min-label propagation; the
    // oracle computes the same closure with a recursive CTE.
    Q(
      "x41_dup_clusters",
      (s, d) => {
        val pairs = Dedup.nearDuplicates(t(s, d, "documents"), "doc_id", "text", 0.8)
        Graph
          .connectedComponents(pairs, "d1", "d2")
          .select(col("node").as("doc_id"), col("label").as("cluster"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $shingleCte,
              |$minhashCtes,
              |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
              |inter AS (SELECT c.d1, c.d2, COUNT(*) AS ni FROM cand c
              |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
              |  GROUP BY 1, 2),
              |pairs AS (SELECT d1, d2 FROM inter
              |  JOIN sizes sa ON sa.doc_id = inter.d1
              |  JOIN sizes sb ON sb.doc_id = inter.d2
              |  WHERE CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni) >= 0.8),
              |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
              |  UNION SELECT d2, d1 FROM pairs),
              |reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
              |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
              |SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Per-group exact quantiles: one percentile(array(...)) buffer per
    // group (single pass), vs five independent aggs.
    Q(
      "x42_group_quantiles",
      (s, d) =>
        // Quantiles facade, exact=true: groups here are the 3 returnflags
        // of a bench-scale table, so the O(group-rows) exact buffer is
        // safe; at 100 TB the default exact=false sketch path applies.
        graft.operators.Quantiles
          .quantiles(
            t(s, d, "lineitem"),
            Seq("l_returnflag"),
            "l_extendedprice",
            Seq(0.25, 0.50, 0.75),
            exact = true
          )
          .select(
            col("l_returnflag") +: Seq("p25", "p50", "p75").map(c => round(col(c), 6).as(c)): _*
          )
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
             |round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
             |round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Symmetric int8 embedding quantization (training-data storage path):
    // per-vector scale = max |x|, q = round(x/scale*127) — pure per-row
    // array math, long-format output for oracle parity.
    Q(
      "x43_quantize",
      (s, d) => {
        val scale = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
        tw(s, d, "embeddings")
          .select(col("vec_id"), scale.as("scale"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(
            col("vec_id"),
            col("pos"),
            when(col("scale") > 0, round(col("v").cast("double") / col("scale") * 127))
              .otherwise(0.0)
              .cast("int")
              .as("q"),
            round(col("scale"), 6).as("scale")
          )
          .orderBy("vec_id", "pos")
      },
      Some("""WITH ex AS (SELECT vec_id,
             |  CAST(generate_subscripts(embedding, 1) AS INTEGER) - 1 AS pos,
             |  CAST(unnest(embedding) AS DOUBLE) AS v,
             |  list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS scale
             |  FROM embeddings)
             |SELECT vec_id, pos,
             |  CAST(CASE WHEN scale > 0 THEN round(v / scale * 127) ELSE 0 END AS INTEGER) AS q,
             |  round(scale, 6) AS scale
             |FROM ex ORDER BY vec_id, pos""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Grouped top-k via the bounded-heap custom aggregate (TopKStructs):
    // map-side k-element heaps, never a full window sort.
    Q(
      "x44_topk_per_key",
      (s, d) =>
        Relational
          .topKPerKey(
            t(s, d, "lineitem"),
            Seq("l_returnflag"),
            struct(
              col("l_extendedprice").as("price"),
              col("l_orderkey").as("ok"),
              col("l_linenumber").as("ln")
            ),
            3
          )
          .orderBy("l_returnflag", "rk"),
      Some("""SELECT l_returnflag, rk, price, ok, ln FROM (
             |  SELECT l_returnflag, l_extendedprice AS price, l_orderkey AS ok,
             |    l_linenumber AS ln,
             |    CAST(row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC)
             |      AS INTEGER) AS rk
             |  FROM lineitem) t
             |WHERE rk <= 3 ORDER BY l_returnflag, rk""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Perplexity-style quality signal: per-doc mean log-prob under an
    // add-one-smoothed corpus bigram model (TextAnalysis.bigramCrossEntropy).
    Q(
      "x45_bigram_xent",
      (s, d) =>
        TextAnalysis
          .bigramCrossEntropy(t(s, d, "documents"), "doc_id", "text")
          .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |trans AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
             |  FROM toks, unnest(range(1, len(tk))) AS t(i)),
             |bigrams AS (SELECT w1, w2, COUNT(*) AS c_big FROM trans GROUP BY 1, 2),
             |contexts AS (SELECT w1, COUNT(*) AS c_ctx FROM trans GROUP BY 1),
             |vocab AS (SELECT COUNT(DISTINCT w1) AS v FROM trans)
             |SELECT doc_id, COUNT(*) AS n_trans,
             |  round(CAST(SUM(CAST(round(ln(CAST(c_big + 1 AS DOUBLE)
             |    / CAST(c_ctx + v AS DOUBLE)), 9) AS DECIMAL(24,9))) AS DOUBLE)
             |    / COUNT(*), 6) AS avg_logprob
             |FROM trans JOIN bigrams USING (w1, w2) JOIN contexts USING (w1) CROSS JOIN vocab
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Ordered min-timestamp funnel (TimeOps.funnel): view -> click ->
    // purchase per user; every stage co-partitions on user_id.
    Q(
      "x46_funnel",
      (s, d) =>
        TimeOps
          .funnel(t(s, d, "events"), "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
          .orderBy("step_idx"),
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id
             |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
             |SELECT 1 AS step_idx, 'view' AS step, (SELECT COUNT(*) FROM s1) AS users
             |UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
             |UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
             |ORDER BY step_idx""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Weekly retention cohorts (TimeOps.retentionCohorts): cohort by first
    // signup week, count distinct cohort users active in week cohort+n.
    Q(
      "x47_retention",
      (s, d) =>
        TimeOps
          .retentionCohorts(
            t(s, d, "events"),
            "user_id",
            timestamp_micros(expr("ts div 1000")),
            "event_type",
            "signup"
          )
          .orderBy("cohort_week", "week_n"),
      Some("""WITH ev AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w, event_type
             |  FROM events),
             |coh AS (SELECT user_id, min(w) AS cw FROM ev
             |  WHERE event_type = 'signup' GROUP BY 1),
             |act AS (SELECT DISTINCT e.user_id, w FROM ev e),
             |grid AS (SELECT coh.cw AS cohort_week,
             |    CAST(datediff('day', coh.cw, a.w) / 7 AS INTEGER) AS week_n, a.user_id
             |  FROM act a JOIN coh ON a.user_id = coh.user_id WHERE a.w >= coh.cw)
             |SELECT cohort_week, week_n, COUNT(*) AS users
             |FROM grid GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Conditional aggregation: count_if / filtered sums in one grouped pass
    // (the idiomatic replacement for N self-joins of filtered subsets).
    Q(
      "x48_cond_agg",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            count_if(col("l_quantity") > 25).as("n_bulk"),
            dsum(when(col("l_discount") >= 0.05, col("l_extendedprice")).otherwise(lit(0.0)), 12)
              .as("disc_rev"),
            // decimal-routed filtered mean (PARITY.md rule 1): avg of raw
            // doubles is partition-order dependent
            round(
              dsum(when(col("l_linestatus") === "F", col("l_tax")), 12) /
                count_if(col("l_linestatus") === "F"),
              6
            ).as("avg_tax_f")
          )
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
              |COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
              |CAST(SUM(CAST(CASE WHEN l_discount >= 0.05 THEN l_extendedprice ELSE 0.0 END
              |  AS DECIMAL(12,2))) AS DOUBLE) AS disc_rev,
              |round(CAST(SUM(CAST(l_tax AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE)
              |  / (COUNT(*) FILTER (WHERE l_linestatus = 'F')), 6) AS avg_tax_f
              |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Per-row array set algebra over token arrays (union/except/overlap) —
    // the row-level counterpart of the set-operation queries.
    Q(
      "x49_array_ops",
      (s, d) => {
        val docs = t(s, d, "documents")
        val a = docs.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") / 2).cast("long").as("k"), split(col("text"), " ").as("ta"))
        val b = docs.filter(col("doc_id") % 2 === 1)
          .select(((col("doc_id") - 1) / 2).cast("long").as("k"), split(col("text"), " ").as("tb"))
        a.join(b, "k")
          .select(
            col("k"),
            size(array_distinct(concat(col("ta"), col("tb")))).as("n_union"),
            size(array_except(array_distinct(col("ta")), col("tb"))).as("n_a_only"),
            arrays_overlap(col("ta"), col("tb")).as("overlaps"),
            element_at(array_sort(array_distinct(col("ta"))), 1).as("first_tok")
          )
          .orderBy("k")
      },
      Some("""WITH a AS (SELECT doc_id // 2 AS k, string_split(text, ' ') AS ta
             |  FROM documents WHERE doc_id % 2 = 0),
             |b AS (SELECT (doc_id - 1) // 2 AS k, string_split(text, ' ') AS tb
             |  FROM documents WHERE doc_id % 2 = 1)
             |SELECT k,
             |CAST(len(list_distinct(list_concat(ta, tb))) AS INTEGER) AS n_union,
             |CAST(len(list_filter(list_distinct(ta), x -> NOT list_contains(tb, x))) AS INTEGER) AS n_a_only,
             |len(list_intersect(ta, tb)) > 0 AS overlaps,
             |list_sort(list_distinct(ta))[1] AS first_tok
             |FROM a JOIN b USING (k) ORDER BY k""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Stubbed decode + feature extraction: exercises the full distributed
    // multimodal pipeline (binary payload -> mapPartitions batch decode ->
    // feature aggregation). The stub (byte/256 over unhex(md5(text)) —
    // Multimodal.decodeStub) is deterministic, so the oracle re-expresses
    // it in SQL: parse each md5 hex byte, sum, scale. Every term is a
    // dyadic rational -> both engines are bit-exact.
    Q(
      "x20_mm_features",
      (s, d) => {
        val withP =
          Multimodal.withPayload(t(s, d, "documents").withColumn("hex", md5(col("text"))), "hex")
        Multimodal
          .extractFeatures(withP, "doc_id")
          .select(
            col("doc_id"),
            col("n_bytes"),
            round(aggregate(col("features"), lit(0.0), (a, x) => a + x.cast("double")) / 16.0, 6)
              .as("mean_feat")
          )
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id, md5(text) AS h FROM documents)
             |SELECT doc_id,
             |CAST(octet_length(from_hex(h)) AS INTEGER) AS n_bytes,
             |round(CAST(list_sum([(strpos('0123456789abcdef', h[2*i-1]) - 1) * 16.0
             |  + (strpos('0123456789abcdef', h[2*i]) - 1) FOR i IN generate_series(1, 16)]) AS DOUBLE)
             |  / 256.0 / 16.0, 6) AS mean_feat
             |FROM p ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // PII-style redaction (TextAnalysis.redact): the corpus is synthetic
    // word-soup, so the query INJECTS a deterministic email + URL per doc
    // (identical expression both engines) and the operator scrubs them —
    // the pre-training scrub step, oracled end-to-end.
    Q(
      "x50_redact",
      (s, d) => {
        val dirty = concat(
          col("text"),
          lit(" mail u"),
          col("doc_id"),
          lit("@example.com see https://ex.org/p/"),
          col("doc_id")
        )
        t(s, d, "documents")
          .select(col("doc_id"), TextAnalysis.redact(dirty).as("redacted"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
             |regexp_replace(
             |  regexp_replace(text || ' mail u' || doc_id || '@example.com see https://ex.org/p/' || doc_id,
             |    'https?://[^ ]+', '<URL>', 'g'),
             |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS redacted
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Repetition metrics (TextAnalysis.repetitionStats): per-ROW sorted
    // fold (no shuffle) vs the oracle's explode+group formulation — same
    // numbers, radically different cost at corpus scale.
    Q(
      "x51_repetition",
      (s, d) =>
        TextAnalysis.repetitionStats(t(s, d, "documents"), "doc_id", "text").orderBy("doc_id"),
      Some("""WITH base AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |cnt AS (SELECT doc_id, tok, COUNT(*) AS c
             |  FROM (SELECT doc_id, unnest(tk) AS tok FROM base) GROUP BY 1, 2),
             |top AS (SELECT doc_id, MAX(c) AS mx FROM cnt GROUP BY 1)
             |SELECT b.doc_id,
             |CAST(len(b.tk) AS INTEGER) AS n_tokens,
             |round(CAST(len(list_distinct(b.tk)) AS DOUBLE) / len(b.tk), 6) AS distinct_ratio,
             |round(CAST(t.mx AS DOUBLE) / len(b.tk), 6) AS top_share
             |FROM base b JOIN top t USING (doc_id) ORDER BY b.doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Gopher-style composite quality gate (TextAnalysis.gopherFilter):
    // keep/drop + auditable metrics, thresholds on UNROUNDED values.
    Q(
      "x52_gopher_filter",
      (s, d) =>
        TextAnalysis.gopherFilter(t(s, d, "documents"), "doc_id", "text").orderBy("doc_id"),
      Some("""WITH m AS (SELECT doc_id,
             |  string_split(text, ' ') AS tk,
             |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_raw,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |    / len(string_split(text, ' ')) AS dr_raw,
             |  len(list_filter(string_split(text, ' '),
             |    t -> t IN ('the', 'a', 'and', 'of', 'to'))) > 0 AS has_stop
             |  FROM documents)
             |SELECT doc_id,
             |CAST(len(tk) AS INTEGER) AS n_tokens,
             |round(mean_raw, 6) AS mean_tok_len,
             |round(dr_raw, 6) AS distinct_ratio,
             |has_stop AS has_stopword,
             |(len(tk) >= 10 AND len(tk) <= 100000 AND mean_raw >= CAST(2.0 AS DOUBLE)
             |  AND mean_raw <= CAST(12.0 AS DOUBLE) AND dr_raw >= CAST(0.2 AS DOUBLE)
             |  AND has_stop) AS keep
             |FROM m ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Span-level contamination (Dedup.duplicatedSpans): word 8-grams
    // shared by >= 2 distinct docs. Doc-level dedup misses a boilerplate
    // paragraph inside otherwise-unique docs; this finds it. Shuffle key
    // is the 60-bit span hash, never the span string.
    Q(
      "x53_dup_spans",
      (s, d) =>
        Dedup
          .duplicatedSpans(t(s, d, "documents"), "doc_id", "text", n = 8, minDocs = 2)
          .orderBy("span_hash"),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |sh8 AS (SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
             |    || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7] AS s
             |  FROM toks, unnest(range(1, len(tk) - 6)) AS t(i)),
             |hashed AS (SELECT DISTINCT doc_id,
             |  CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) AS span_hash FROM sh8)
             |SELECT span_hash, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS first_doc
             |FROM hashed GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY span_hash""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Token-budget estimation (TextAnalysis.tokenBudget): whitespace vs
    // BPE-ish counts. The corpus is punctuation-free, so the query injects
    // deterministic punctuation (identical expression both engines) to
    // make the two tokenizations diverge.
    Q(
      "x54_token_budget",
      (s, d) =>
        TextAnalysis
          .tokenBudget(
            t(s, d, "documents")
              .withColumn("dirty", concat(col("text"), lit(" v"), col("doc_id"), lit(".x!"))),
            "doc_id",
            "dirty"
          )
          .orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, text || ' v' || doc_id || '.x!' AS t FROM documents)
             |SELECT doc_id,
             |CAST(len(string_split(t, ' ')) AS INTEGER) AS n_ws_tokens,
             |CAST(len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INTEGER) AS n_bpe_tokens,
             |round(CAST(len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS DOUBLE)
             |  / len(string_split(t, ' ')), 6) AS bpe_per_ws
             |FROM d ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // REAL audio decode under the correctness gate: each doc gets a
    // deterministic 200-sample 16-bit PCM WAV (sample(i) = (id*31 + i*17)
    // % 20001 - 10000 — PCM16 round-trips bit-exact through the WAV
    // container), decoded back through javax.sound.sampled
    // (Multimodal.decodeAudio); the oracle recomputes duration/RMS/peak/
    // zero-crossing rate from the same sample expression in SQL. Both
    // engines do the identical IEEE double ops, so round(,6) is safety
    // margin, not slack.
    Q(
      "x55_audio_features",
      (s, d) => {
        val withWav = Multimodal.withSynthWavPayload(
          t(s, d, "documents").select("doc_id"), "doc_id", 200, 8000f
        )
        Multimodal
          .extractAudioFeatures(withWav, "doc_id")
          .select(
            col("doc_id"),
            col("n_samples"),
            col("channels"),
            round(col("duration_s"), 6).as("duration_s"),
            round(col("rms"), 6).as("rms"),
            round(col("peak"), 6).as("peak"),
            round(col("zcr"), 6).as("zcr")
          )
          .orderBy("doc_id")
      },
      Some("""WITH s AS (
             |  SELECT d.doc_id, i.i,
             |    CAST((d.doc_id * 31 + i.i * 17) % 20001 - 10000 AS BIGINT) AS smp
             |  FROM (SELECT doc_id FROM documents) d
             |  CROSS JOIN (SELECT range AS i FROM range(0, 200)) i),
             |x AS (
             |  SELECT doc_id, i, smp,
             |    lag(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
             |  FROM s)
             |SELECT doc_id,
             |  CAST(200 AS BIGINT) AS n_samples,
             |  1 AS channels,
             |  round(200 / 8000.0, 6) AS duration_s,
             |  round(sqrt(SUM(smp * smp) / 200.0) / 32768.0, 6) AS rms,
             |  round(MAX(abs(smp)) / 32768.0, 6) AS peak,
             |  round(SUM(CASE WHEN prev IS NOT NULL AND ((smp >= 0) != (prev >= 0))
             |    THEN 1 ELSE 0 END) / 199.0, 6) AS zcr
             |FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // REAL video container decode (Multimodal.decodeAvi): per document a
    // genuine AVI-MJPEG file is muxed (ImageIO-encoded JPEG frames inside
    // a RIFF container) and the decoder must recover width / height /
    // frame count / rate / codec by PARSING those bytes — the oracle
    // recomputes the expected metadata from the generator formulas. Frame
    // PIXEL decode is covered by MultimodalSpec (JPEG is lossy, so pixels
    // are a tolerance check, not a hash oracle).
    Q(
      "x56_video_meta",
      (s, d) => {
        val withAvi = Multimodal.withSynthAviPayload(
          t(s, d, "documents").select("doc_id"), "doc_id"
        )
        Multimodal
          .extractVideoFeatures(withAvi, "doc_id")
          .select(
            col("doc_id"),
            col("width"),
            col("height"),
            col("n_frames"),
            round(col("fps"), 6).as("fps"),
            col("codec")
          )
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS width,
             |  CAST(8 + (doc_id % 5) * 8 AS INTEGER) AS height,
             |  CAST(2 + (doc_id % 4) AS INTEGER) AS n_frames,
             |  round(CAST(5 + (doc_id % 3) * 5 AS DOUBLE), 6) AS fps,
             |  'MJPG' AS codec
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Bloom-prefiltered decontamination: same semantics as x38 but the
    // 100 TB shape — a bloom of reference fingerprints (built with Spark's
    // own BloomFilterAggregate) keeps definitely-clean corpus rows out of
    // the shuffle; only the fpp-bounded might-match sliver anti-joins. A
    // deliberately tiny bloom (4096 bits for ~71 refs) forces real false
    // positives through the exact-verify stage, so the oracle proves BOTH
    // the no-false-negative keep path and the verification path.
    Q(
      "x57_decontam_bloom",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup
          .decontaminateBloom(
            docs, docs.filter(col("doc_id") % 7 === 0), "text",
            expectedRefItems = 128, numBits = 4096
          )
          .select(col("doc_id"), md5(col("text")).as("h"))
          .orderBy("doc_id")
      },
      Some("""WITH fp AS (SELECT doc_id,
             |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS f
             |  FROM documents)
             |SELECT d.doc_id, md5(d.text) AS h
             |FROM documents d JOIN fp ON fp.doc_id = d.doc_id
             |WHERE fp.f NOT IN (SELECT DISTINCT f FROM fp WHERE doc_id % 7 = 0)
             |ORDER BY d.doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Approximate quantiles — the 100 TB quantile path (q10's EXACT
    // percentile buffers every distinct value per group; the GK sketch is
    // mergeable, bounded-memory, one pass). Oracled like x18: the sketch's
    // documented rank guarantee (|rank(v) - q*N| <= N/accuracy) is
    // verified IN-ENGINE by exact rank counts, and DuckDB pins the
    // booleans TRUE plus the exact N.
    Q(
      "x58_approx_quantiles",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
        val acc = 100
        val row = li
          .agg(
            expr(s"approx_percentile(l_quantity, array(${qs.mkString(",")}), $acc)").as("ap"),
            count(lit(1)).as("n")
          )
          .head()
        val vals = row.getSeq[Double](0)
        val n = row.getLong(1)
        // tied values occupy a rank INTERVAL [count(<v)+1, count(<=v)]; the
        // guarantee holds iff that interval intersects the target window
        // [q*N - N/acc, q*N + N/acc] (+1 slack for boundary rounding) — a
        // point-rank check would false-fail on heavily tied columns
        val rankCols = qs.zip(vals).zipWithIndex.flatMap { case ((_, v), i) =>
          Seq(
            sum(when(col("l_quantity") < v, 1L).otherwise(0L)).as(s"lo$i"),
            sum(when(col("l_quantity") <= v, 1L).otherwise(0L)).as(s"hi$i")
          )
        }
        val ranks = li.agg(rankCols.head, rankCols.tail: _*).head()
        val rows = qs.zipWithIndex.map { case (q, i) =>
          val lo = ranks.getLong(2 * i) + 1
          val hi = ranks.getLong(2 * i + 1)
          val eps = n.toDouble / acc + 1.0
          (q, lo <= q * n + eps && hi >= q * n - eps, n)
        }
        import s.implicits._
        rows.toDF("q", "within_bound", "n").orderBy("q")
      },
      Some("""SELECT CAST(t.q AS DOUBLE) AS q, TRUE AS within_bound,
             |(SELECT COUNT(*) FROM lineitem) AS n
             |FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) AS t(q)
             |ORDER BY q""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Per-source frequency cap (Scale.capPerKey): bound any one source's
    // contribution to the corpus — keep the 5 longest docs per source
    // (doc_id breaks ties deterministically), full rows survive. Bounded-
    // heap winners + semi-join, never a window sort over a hot source.
    Q(
      "x59_source_cap",
      (s, d) =>
        graft.operators.Scale
          .capPerKey(
            t(s, d, "documents"),
            "source",
            "doc_id",
            col("n_chars"),
            5
          )
          .select(col("source"), col("doc_id"), col("n_chars"))
          .orderBy("source", "doc_id"),
      Some("""SELECT source, doc_id, n_chars FROM (
             |  SELECT source, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id DESC) AS rk
             |  FROM documents) t
             |WHERE rk <= 5 ORDER BY source, doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Embedding-cosine near-dup (Similarity.embedDupes): hyperplane-LSH
    // bucket candidates verified by exact cosine >= 0.3. The oracle
    // recomputes the SAME deterministic md5 sign matrix (parity of
    // md5("b:i")'s first hex nibble — the repo's portable-hash family) so
    // the bucket structure itself is under test, not just the cosine.
    Q(
      "x60_embed_dupes",
      (s, d) =>
        Similarity
          .embedDupes(t(s, d, "embeddings"), "vec_id", "embedding", 64, 8, 0.3)
          .orderBy("d1", "d2"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |ex AS (SELECT vec_id, CAST(generate_subscripts(v,1) AS BIGINT) - 1 AS i,
             |       unnest(v) AS x FROM e),
             |bits AS (SELECT vec_id, b.b AS b,
             |    SUM(x * (CASE WHEN CAST('0x' || substr(md5(CAST(b.b AS VARCHAR) || ':'
             |               || CAST(i AS VARCHAR)), 1, 1) AS INTEGER) % 2 = 0
             |             THEN 1.0 ELSE -1.0 END)) AS acc
             |  FROM ex CROSS JOIN (SELECT unnest(range(8)) AS b) b GROUP BY 1, 2),
             |bk AS (SELECT vec_id,
             |    SUM(CASE WHEN acc > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS bucket
             |  FROM bits GROUP BY 1)
             |SELECT a.vec_id AS d1, c.vec_id AS d2,
             |  round(list_dot_product(ea.v, ec.v)
             |    / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(ec.v, ec.v))), 6) AS sim
             |FROM bk a JOIN bk c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
             |JOIN e ea ON ea.vec_id = a.vec_id JOIN e ec ON ec.vec_id = c.vec_id
             |WHERE round(list_dot_product(ea.v, ec.v)
             |    / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(ec.v, ec.v))), 6) >= 0.3
             |ORDER BY d1, d2""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Domain-mixture resampling (Scale.resampleToMix): downsample to
    // target language shares — largest feasible output with no group
    // upsampled, deterministic md5 hash-bucket filter per group.
    Q(
      "x61_domain_mix",
      (s, d) =>
        Scale
          .resampleToMix(
            t(s, d, "documents"),
            Seq("doc_id"),
            "lang",
            Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05)
          )
          .select("doc_id", "lang", "source")
          .orderBy("doc_id"),
      Some("""WITH n AS (SELECT lang, CAST(count(*) AS DOUBLE) AS ng FROM documents GROUP BY 1),
             |sh AS (SELECT * FROM (VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.15),
             |       ('es', 0.1), ('zh', 0.05)) AS t(lang, share)),
             |j AS (SELECT n.lang, ng, share, ng / share AS demand FROM n JOIN sh USING (lang)),
             |s AS (SELECT min(demand) AS smax FROM j),
             |r AS (SELECT lang, share * smax / ng AS rate FROM j CROSS JOIN s)
             |SELECT d.doc_id, d.lang, d.source
             |FROM documents d JOIN r USING (lang)
             |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000
             |      < rate * 1000
             |ORDER BY d.doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Sequence-packing index (TextAnalysis.packSequences): per-source
    // concatenate-then-chunk token offsets — which 256-token training
    // window does each document start in, and at what offset.
    Q(
      "x62_pack_sequences",
      (s, d) =>
        TextAnalysis
          .packSequences(t(s, d, "documents"), "doc_id", Seq("source"), "text", 256)
          .orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
             |cs AS (SELECT doc_id, source, n_tokens,
             |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS tok_start
             |  FROM tk)
             |SELECT doc_id, source, n_tokens,
             |  CAST(tok_start // 256 AS BIGINT) AS seq_id,
             |  CAST(tok_start % 256 AS BIGINT) AS seq_off
             |FROM cs ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Deterministic train/val/test split (Scale.hashSplit): assignment is
    // a pure function of doc_id — re-runs, repartitions, and corpus growth
    // never migrate a row between splits (RNG randomSplit can't do this).
    Q(
      "x63_train_split",
      (s, d) =>
        Scale
          .hashSplit(
            t(s, d, "documents"),
            Seq("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
          )
          .select("doc_id", "lang", "split")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang,
             |  CASE WHEN hb < 800 THEN 'train' WHEN hb < 900 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id, lang,
             |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000 AS hb
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Span-level contamination score (Dedup.spanContamination): fraction
    // of each doc's distinct 8-gram spans present in the reference set
    // (docs with doc_id % 7 = 0, the x38 reference convention) — the
    // eval-contamination audit number; doc-level fingerprints can't see
    // partial overlap.
    Q(
      "x64_contam_score",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup
          .spanContamination(docs, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", 8)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |sh8 AS (SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
             |    || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7] AS s
             |  FROM toks, unnest(range(1, len(tk) - 6)) AS t(i)),
             |ch AS (SELECT DISTINCT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) AS h
             |  FROM sh8),
             |rh AS (SELECT DISTINCT CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) AS h
             |  FROM sh8 WHERE doc_id % 7 = 0),
             |agg AS (SELECT c.doc_id, count(*) AS n_spans, count(r.h) AS n_hit
             |  FROM ch c LEFT JOIN rh r ON c.h = r.h GROUP BY 1)
             |SELECT d.doc_id,
             |  CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
             |  CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
             |  CASE WHEN coalesce(n_spans, 0) > 0
             |       THEN round(CAST(n_hit AS DOUBLE) / n_spans, 6) END AS contam
             |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
             |ORDER BY d.doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // The full curation pipeline end to end (Pipeline.curate): quality
    // gate -> exact dedup -> MinHash-LSH near-dup removal -> fingerprint
    // decontamination (ref = doc_id % 7 = 0) -> domain-mixture resampling
    // over the SURVIVORS -> train/val/test split. Six operators composed,
    // oracle-checked as one query.
    Q(
      "x65_curate_e2e",
      (s, d) => {
        val docs = t(s, d, "documents")
        Pipeline
          .curate(
            docs,
            "doc_id",
            "text",
            docs.filter(col("doc_id") % 7 === 0),
            "lang",
            Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            minQuality = 0.6,
            nearDupThreshold = 0.8
          )
          .select("doc_id", "lang", "source", "split")
          .orderBy("doc_id")
      },
      Some {
        val quality =
          """round(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
            |  + 0.5 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
            |      / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0), 6)""".stripMargin
        s"""WITH passed AS (SELECT doc_id, text, lang, source FROM documents WHERE $quality >= 0.6),
           |dedup AS (SELECT doc_id, text, lang, source FROM (
           |  SELECT doc_id, text, lang, source,
           |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           |  FROM passed) t WHERE rn = 1),
           |${shingleCteFrom("dedup")},
           |$minhashCtes,
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
           |inter AS (SELECT c.d1, c.d2, COUNT(*) AS ni FROM cand c
           |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
           |  GROUP BY 1, 2),
           |prs AS (SELECT d1, d2 FROM inter
           |  JOIN sizes sa ON sa.doc_id = inter.d1
           |  JOIN sizes sb ON sb.doc_id = inter.d2
           |  WHERE CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni) >= 0.8),
           |cleaned AS (SELECT * FROM dedup WHERE doc_id NOT IN (SELECT d2 FROM prs)),
           |fp AS (SELECT doc_id,
           |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS f
           |  FROM documents),
           |decon AS (SELECT c.* FROM cleaned c JOIN fp ON fp.doc_id = c.doc_id
           |  WHERE fp.f NOT IN (SELECT DISTINCT f FROM fp WHERE doc_id % 7 = 0)),
           |n AS (SELECT lang, CAST(count(*) AS DOUBLE) AS ng FROM decon GROUP BY 1),
           |shr AS (SELECT * FROM (VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.15),
           |       ('es', 0.1), ('zh', 0.05)) AS t(lang, share)),
           |j AS (SELECT n.lang, ng, share, ng / share AS demand FROM n JOIN shr USING (lang)),
           |smx AS (SELECT min(demand) AS smax FROM j),
           |r AS (SELECT lang, share * smax / ng AS rate FROM j CROSS JOIN smx),
           |mixed AS (SELECT d.doc_id, d.lang, d.source,
           |    CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000 AS hb
           |  FROM decon d JOIN r USING (lang)
           |  WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000
           |        < rate * 1000)
           |SELECT doc_id, lang, source,
           |  CASE WHEN hb < 800 THEN 'train' WHEN hb < 900 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM mixed ORDER BY doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // Boilerplate removal (Dedup.stripBoilerplate): tokens covered by an
    // 8-gram span shared by > 2 docs are stripped, text rebuilt in order —
    // the C4/RefinedWeb shared-passage scrub that doc-level dedup misses.
    // One fixture doc is entirely boilerplate and comes back as "".
    Q(
      "x66_strip_boilerplate",
      (s, d) =>
        Dedup
          .stripBoilerplate(t(s, d, "documents"), "doc_id", "text", n = 8, maxDocs = 2L)
          .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |pos AS (SELECT doc_id, CAST(i AS BIGINT) - 1 AS p, tk[i] AS tok
             |  FROM toks, unnest(range(1, len(tk) + 1)) t(i)),
             |st AS (SELECT doc_id, CAST(i AS BIGINT) - 1 AS s,
             |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]
             |    || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7] AS sp
             |  FROM toks, unnest(range(1, len(tk) - 6)) t(i)),
             |hot AS (SELECT sp FROM (SELECT DISTINCT doc_id, sp FROM st) GROUP BY sp
             |  HAVING count(*) > 2),
             |hs AS (SELECT DISTINCT doc_id, s FROM st JOIN hot USING (sp)),
             |cov AS (SELECT DISTINCT doc_id, s + d.d AS p
             |  FROM hs, (SELECT unnest(range(8)) AS d) d),
             |kept AS (SELECT p.doc_id, p.p, p.tok FROM pos p
             |  LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.p = c.p WHERE c.p IS NULL),
             |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_clean,
             |  count(*) AS n_kept FROM kept GROUP BY 1)
             |SELECT d.doc_id, coalesce(agg.text_clean, '') AS text_clean,
             |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept
             |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Int8 scalar quantization (Similarity.sqQuantize): per-vector
    // scale = max|x|/127, codes = round(x/scale) as tinyint — the 4x
    // embedding storage/shuffle reduction of the SQ8 ANN path. Output pins
    // the code multiset strongly (sum + sum-of-squares) plus the max
    // reconstruction error; the oracle recomputes the identical double
    // arithmetic over unnested elements.
    Q(
      "x67_embed_quant",
      (s, d) =>
        Similarity
          .sqQuantize(t(s, d, "embeddings"), "vec_id", "embedding")
          .select(
            col("vec_id"),
            round(col("sq_scale"), 6).as("scale"),
            aggregate(col("sq_codes"), lit(0L), (a, c) => a + c.cast("long")).as("code_sum"),
            graft.functions.VecFunctions
              .byteDot(col("sq_codes"), col("sq_codes"))
              .as("code_norm2"),
            round(
              aggregate(
                zip_with(
                  col("embedding"),
                  col("sq_codes"),
                  (x, c) => abs(x.cast("double") - c.cast("double") * col("sq_scale"))
                ),
                lit(0.0),
                (a, e) => greatest(a, e)
              ),
              6
            ).as("max_abs_err")
          )
          .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |ex AS (SELECT vec_id, unnest(v) AS x FROM e),
             |m AS (SELECT vec_id, max(abs(x)) / 127 AS scale FROM ex GROUP BY 1),
             |c AS (SELECT ex.vec_id, x, scale,
             |    CASE WHEN scale = 0 THEN 0 ELSE CAST(round(x / scale) AS BIGINT) END AS code
             |  FROM ex JOIN m USING (vec_id))
             |SELECT vec_id, round(scale, 6) AS scale,
             |  CAST(SUM(code) AS BIGINT) AS code_sum,
             |  CAST(SUM(code * code) AS BIGINT) AS code_norm2,
             |  round(MAX(abs(x - code * scale)), 6) AS max_abs_err
             |FROM c GROUP BY vec_id, scale ORDER BY vec_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Strided REAL-video frame sampling (Multimodal.sampleVideoFrames):
    // every 2nd frame of each muxed AVI-MJPEG payload with its media
    // timestamp — the "1 frame per N" sampler of a video training
    // pipeline. The oracle recomputes the sampled index set and t_s from
    // the generator formulas, so the container walk must find exactly the
    // frames that are really there. Pixel content of sampled frames is
    // tolerance-checked in MultimodalSpec (JPEG is lossy).
    Q(
      "x68_frame_sample",
      (s, d) => {
        val withAvi = Multimodal.withSynthAviPayload(
          t(s, d, "documents").select("doc_id"), "doc_id"
        )
        Multimodal
          .sampleVideoFrames(withAvi, "doc_id", 2)
          .select(
            col("doc_id"),
            col("frame_idx"),
            round(col("t_s"), 6).as("t_s"),
            col("width"),
            col("height")
          )
          .orderBy("doc_id", "frame_idx")
      },
      Some("""SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             |  round(i / CAST(5 + (doc_id % 3) * 5 AS DOUBLE), 6) AS t_s,
             |  CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS width,
             |  CAST(8 + (doc_id % 5) * 8 AS INTEGER) AS height
             |FROM documents, unnest(range(0, 2 + doc_id % 4, 2)) t(i)
             |ORDER BY doc_id, frame_idx""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // HTML -> text extraction (TextAnalysis.htmlToText): the crawl-
    // pipeline stage in front of every text operator. Each doc is wrapped
    // in a deterministic HTML page (tags, a <script> whose BODY contains a
    // bare '<', a <style> block, entities) by the SAME expression on both
    // engines; the extractor must drop script/style WITH content, strip
    // tags to spaces, decode entities (&amp; last), collapse whitespace.
    Q(
      "x69_html_extract",
      (s, d) => {
        val html = concat(
          lit("<html><head><style>p{color:red}</style></head><body><h1>"),
          col("lang"),
          lit("</h1><script>var x=1; if (x<2) { x=3; }</script><p class=\"main\">"),
          col("text"),
          lit("</p><br/>&quot;fin&quot; &amp;lt; &#39;ok&#39;</body></html>")
        )
        t(s, d, "documents")
          .select(
            col("doc_id"),
            TextAnalysis.htmlToText(html).as("text_plain")
          )
          .withColumn("n_chars_plain", length(col("text_plain")).cast("long"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id,
             |  '<html><head><style>p{color:red}</style></head><body><h1>' || lang ||
             |  '</h1><script>var x=1; if (x<2) { x=3; }</script><p class="main">' || text ||
             |  '</p><br/>&quot;fin&quot; &amp;lt; &#39;ok&#39;</body></html>' AS html
             |  FROM documents),
             |x AS (SELECT doc_id,
             |  trim(regexp_replace(
             |    replace(replace(replace(replace(replace(
             |      regexp_replace(
             |        regexp_replace(
             |          regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
             |          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
             |        '<[^>]*>', ' ', 'g'),
             |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
             |    '\s+', ' ', 'g')) AS text_plain
             |  FROM h)
             |SELECT doc_id, text_plain,
             |  CAST(length(text_plain) AS BIGINT) AS n_chars_plain
             |FROM x ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Near-dup cluster representatives (Dedup.clusterRepresentatives):
    // LSH near-dup pairs -> connected components -> keep the best doc
    // (highest n_chars, ties to highest id) per cluster; singletons
    // survive as their own cluster. sum(n_cluster) == |documents|.
    Q(
      "x70_cluster_reps",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup
          .clusterRepresentatives(docs, "doc_id", "text", 0.8, col("n_chars"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $shingleCte,
              |$minhashCtes,
              |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
              |inter AS (SELECT c.d1, c.d2, COUNT(*) AS ni FROM cand c
              |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
              |  GROUP BY 1, 2),
              |prs AS (SELECT d1, d2 FROM inter
              |  JOIN sizes sa ON sa.doc_id = inter.d1
              |  JOIN sizes sb ON sb.doc_id = inter.d2
              |  WHERE CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni) >= 0.8),
              |edges AS (SELECT d1 AS a, d2 AS b FROM prs
              |  UNION SELECT d2, d1 FROM prs),
              |reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
              |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
              |comp AS (SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY 1),
              |wc AS (SELECT d.doc_id, d.n_chars, COALESCE(c.cluster, d.doc_id) AS cluster
              |  FROM documents d LEFT JOIN comp c USING (doc_id)),
              |cs AS (SELECT cluster, COUNT(*) AS n_cluster FROM wc GROUP BY 1),
              |rep AS (SELECT doc_id, cluster FROM (
              |  SELECT doc_id, cluster,
              |    row_number() OVER (PARTITION BY cluster
              |      ORDER BY n_chars DESC, doc_id DESC) AS rk
              |  FROM wc) t WHERE rk = 1)
              |SELECT r.doc_id, r.cluster, CAST(cs.n_cluster AS BIGINT) AS n_cluster
              |FROM rep r JOIN cs USING (cluster) ORDER BY r.doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // C4-style global segment dedup (Dedup.dedupSegmentsKeepFirst): every
    // distinct 8-token segment keeps ONLY its globally-first occurrence
    // (ordered by doc_id, seg_idx); docs are rebuilt from survivors. The
    // winner per segment hash is a min-struct groupBy (map-side partials —
    // no hot-hash window sort); a fully-duplicated doc survives as "".
    Q(
      "x71_seg_dedup",
      (s, d) =>
        Dedup
          .dedupSegmentsKeepFirst(t(s, d, "documents"), "doc_id", "text", segTokens = 8)
          .withColumn("n_chars_dedup", length(col("text_dedup")).cast("long"))
          .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |segs AS (SELECT doc_id, j AS seg_idx,
             |    array_to_string(tk[j*8+1 : j*8+8], ' ') AS seg
             |  FROM toks, unnest(range(0, (len(tk)-1)//8 + 1)) AS t(j)),
             |hs AS (SELECT *, CAST('0x' || substr(md5(seg), 18, 15) AS BIGINT) AS h FROM segs),
             |keep AS (SELECT doc_id, seg_idx, seg FROM (
             |    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, seg_idx) AS rn
             |    FROM hs) z WHERE rn = 1),
             |agg AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup,
             |    COUNT(*) AS n_segs_kept FROM keep GROUP BY 1)
             |SELECT d.doc_id, COALESCE(a.text_dedup, '') AS text_dedup,
             |  CAST(COALESCE(a.n_segs_kept, 0) AS BIGINT) AS n_segs_kept,
             |  CAST(length(COALESCE(a.text_dedup, '')) AS BIGINT) AS n_chars_dedup
             |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // URL canonicalization + URL-level dedup (TextAnalysis.canonicalUrl +
    // Dedup.exactWithCounts): synthesized crawl URLs with case/port/www/
    // tracking-param/fragment noise collapse to one canonical form; dedup
    // keeps the lowest doc_id per canonical URL with a duplicate count.
    // Canonicalization is a pure per-row column (no shuffle); the dedup is
    // the one hash shuffle on the canonical key.
    Q(
      "x72_url_dedup",
      (s, d) => {
        val dk = col("doc_id")
        val u = concat(
          when(dk % 2 === 0, lit("https")).otherwise(lit("HTTPS")),
          lit("://"),
          when(dk % 3 === 0, lit("WWW.")).otherwise(lit("")),
          col("source"), lit(".Example.COM"),
          when(dk % 4 === 0, lit(":443")).otherwise(lit("")),
          lit("/Docs/"), col("lang"), lit("/"), (dk % 25).cast("string"),
          when(dk % 2 === 0, lit("/")).otherwise(lit("")),
          when(dk % 5 === 0, lit("?utm_source=feed&b=2&a=1")).otherwise(lit("?a=1&b=2")),
          when(dk % 7 === 0, lit("#frag")).otherwise(lit(""))
        )
        val withCanon = t(s, d, "documents")
          .withColumn("url_canon", TextAnalysis.canonicalUrl(u))
        Dedup
          .exactWithCounts(withCanon, Seq("url_canon"), "doc_id")
          .select(col("doc_id"), col("url_canon"), col("n_dups"))
          .orderBy("doc_id")
      },
      Some("""WITH syn AS (SELECT doc_id,
             |  (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://' ||
             |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
             |  source || '.Example.COM' ||
             |  (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
             |  '/Docs/' || lang || '/' || CAST(doc_id % 25 AS VARCHAR) ||
             |  (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
             |  (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&b=2&a=1' ELSE '?a=1&b=2' END) ||
             |  (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS u
             |  FROM documents),
             |c1 AS (SELECT doc_id, regexp_replace(u, '#.*$', '') AS u1 FROM syn),
             |c2 AS (SELECT doc_id,
             |  lower(regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             |  regexp_replace(lower(regexp_extract(u1,
             |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\.', '') AS h0,
             |  regexp_extract(u1, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
             |  FROM c1),
             |c3 AS (SELECT doc_id, scheme,
             |  CASE WHEN scheme = 'http' THEN regexp_replace(h0, ':80$', '')
             |       WHEN scheme = 'https' THEN regexp_replace(h0, ':443$', '')
             |       ELSE h0 END AS host,
             |  regexp_replace(regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
             |    '/{2,}', '/', 'g'), '/+$', '') AS path,
             |  array_to_string(list_sort(list_filter(
             |    string_split(regexp_extract(rest, '^[^?]*\?(.*)$', 1), '&'),
             |    p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)(=|$)'))),
             |    '&') AS params
             |  FROM c2),
             |canon AS (SELECT doc_id, scheme || '://' || host || path ||
             |  (CASE WHEN params = '' THEN '' ELSE '?' || params END) AS url_canon FROM c3)
             |SELECT MIN(doc_id) AS doc_id, url_canon, COUNT(*) AS n_dups
             |FROM canon GROUP BY url_canon ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // PageRank, fixed 3 iterations (Graph.pageRank) over the events
    // user -> item multigraph (item nodes offset past the user-id space so
    // they are PURE SINKS — the dangling-mass path is genuinely exercised,
    // not vacuously zero). Edge joins co-partition on src across rounds;
    // contributions aggregate map-side; dangling mass is a 1-row broadcast.
    // The oracle unrolls the same three synchronous rounds as CTEs with
    // mirrored double arithmetic.
    Q(
      "x73_pagerank",
      (s, d) => {
        val edges = t(s, d, "events")
          .select(
            col("user_id").as("src"),
            (get_json_object(col("props"), "$.k").cast("long") + 1000000L).as("dst")
          )
          .where(col("dst").isNotNull)
        Graph.pageRank(edges, "src", "dst", iters = 3, damping = 0.85).orderBy("node")
      },
      Some("""WITH e AS (SELECT user_id AS src,
             |    1000000 + CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst
             |  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
             |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
             |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
             |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
             |r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes CROSS JOIN nn),
             |c1 AS (SELECT e.dst AS node, SUM(r.rank / d.deg) AS c FROM e
             |  JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src GROUP BY 1),
             |d1 AS (SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) AS dm FROM r0 r
             |  LEFT JOIN deg d ON d.src = r.node WHERE d.src IS NULL),
             |r1 AS (SELECT ns.node,
             |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n + CAST(0.85 AS DOUBLE) *
             |      (COALESCE(c.c, CAST(0 AS DOUBLE)) + d1.dm / nn.n) AS rank
             |  FROM nodes ns CROSS JOIN nn CROSS JOIN d1 LEFT JOIN c1 c ON c.node = ns.node),
             |c2 AS (SELECT e.dst AS node, SUM(r.rank / d.deg) AS c FROM e
             |  JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src GROUP BY 1),
             |d2 AS (SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) AS dm FROM r1 r
             |  LEFT JOIN deg d ON d.src = r.node WHERE d.src IS NULL),
             |r2 AS (SELECT ns.node,
             |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n + CAST(0.85 AS DOUBLE) *
             |      (COALESCE(c.c, CAST(0 AS DOUBLE)) + d2.dm / nn.n) AS rank
             |  FROM nodes ns CROSS JOIN nn CROSS JOIN d2 LEFT JOIN c2 c ON c.node = ns.node),
             |c3 AS (SELECT e.dst AS node, SUM(r.rank / d.deg) AS c FROM e
             |  JOIN r2 r ON r.node = e.src JOIN deg d ON d.src = e.src GROUP BY 1),
             |d3 AS (SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) AS dm FROM r2 r
             |  LEFT JOIN deg d ON d.src = r.node WHERE d.src IS NULL),
             |r3 AS (SELECT ns.node,
             |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n + CAST(0.85 AS DOUBLE) *
             |      (COALESCE(c.c, CAST(0 AS DOUBLE)) + d3.dm / nn.n) AS rank
             |  FROM nodes ns CROSS JOIN nn CROSS JOIN d3 LEFT JOIN c3 c ON c.node = ns.node)
             |SELECT node, rank FROM r3 ORDER BY node""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Bounded inverted index (TextAnalysis.invertedIndex): per-token df /
    // cf + top-5 postings by (tf DESC, doc_id ASC) via the bounded-heap
    // aggregate — at most k postings per token per partition cross the
    // shuffle; output bounded by |vocab| * k at any corpus size.
    Q(
      "x74_inverted_index",
      (s, d) =>
        TextAnalysis
          .invertedIndex(t(s, d, "documents"), "doc_id", "text", k = 5)
          .orderBy("token", "rank"),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |  FROM documents),
             |tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
             |agg AS (SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf
             |  FROM tf GROUP BY 1),
             |rk AS (SELECT token, doc_id, tf,
             |    row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id ASC) AS rank
             |  FROM tf)
             |SELECT r.token, a.df, a.cf, CAST(r.rank AS BIGINT) AS rank, r.doc_id,
             |  CAST(r.tf AS BIGINT) AS tf
             |FROM rk r JOIN agg a USING (token)
             |WHERE r.rank <= 5 ORDER BY r.token, r.rank""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Per-key z-score standardization (Relational.zscore): group stats are
    // a |keys|-row broadcast back onto the fact table — the data itself
    // never shuffles; degenerate (zero-stddev) groups yield NULL z.
    Q(
      "x76_zscore",
      (s, d) =>
        Relational
          .zscore(
            t(s, d, "events").select(col("event_id"), col("event_type"), col("value")),
            Seq("event_type"),
            "value"
          )
          .select(col("event_id"), col("event_type"), col("value"), col("z"))
          .orderBy("event_id"),
      Some("""WITH s AS (SELECT event_type, AVG(value) AS mean_v,
             |    STDDEV_SAMP(value) AS std_v FROM events GROUP BY 1)
             |SELECT e.event_id, e.event_type, e.value,
             |  (e.value - s.mean_v) / NULLIF(s.std_v, 0) AS z
             |FROM events e JOIN s USING (event_type) ORDER BY e.event_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Winsorization (Relational.winsorize): per-event-type [p01, p99]
    // clamp of `value` — thresholds broadcast back (|keys| rows), data
    // never shuffles. exact=true for oracle parity (percentile ==
    // quantile_cont); the 100 TB default is the mergeable sketch.
    Q(
      "x78_winsorize",
      (s, d) =>
        Relational
          .winsorize(
            t(s, d, "events").select(col("event_id"), col("event_type"), col("value")),
            Seq("event_type"),
            "value",
            lo = 0.01,
            hi = 0.99,
            exact = true
          )
          .select(col("event_id"), col("event_type"), col("value"), col("value_w"))
          .orderBy("event_id"),
      Some("""WITH s AS (SELECT event_type,
             |    quantile_cont(value, 0.01) AS qlo, quantile_cont(value, 0.99) AS qhi
             |  FROM events GROUP BY 1)
             |SELECT e.event_id, e.event_type, e.value,
             |  least(greatest(e.value, s.qlo), s.qhi) AS value_w
             |FROM events e JOIN s USING (event_type) ORDER BY e.event_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Signature-estimated Jaccard (Dedup.estimatedJaccard): LSH candidate
    // pairs scored by the MinHash estimator |{i: m_i(a)=m_i(b)}| / k —
    // verification that touches only the k-long signatures (computed once,
    // checkpointed), never re-joining the shingle sets. est values are
    // exact multiples of 1/8, so both engines emit identical doubles.
    Q(
      "x77_minhash_est",
      (s, d) =>
        Dedup
          .estimatedJaccard(t(s, d, "documents"), "doc_id", "text")
          .orderBy("d1", "d2"),
      Some(s"""WITH $shingleCte,
              |$minhashCtes
              |SELECT c.d1, c.d2,
              |  CAST(${(0 until 8).map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")}
              |    AS DOUBLE) / CAST(8 AS DOUBLE) AS est_j
              |FROM cand c JOIN sig a ON a.doc_id = c.d1 JOIN sig b ON b.doc_id = c.d2
              |ORDER BY c.d1, c.d2""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Distributed covariance matrix (Similarity.covarianceMatrix): each
    // vector expands to its d(d+1)/2 upper-triangular products, ONE
    // groupBy(i,j) reduces them — map-side combine bounds the shuffle at
    // O(d² x partitions) regardless of corpus size. This is the single
    // data pass under pcaFit; the oracle recomputes every cell with
    // covar_samp over the unnested table.
    Q(
      "x79_embed_cov",
      (s, d) =>
        Similarity
          .covarianceMatrix(tw(s, d, "embeddings"), "embedding", dim = 64)
          .select(
            col("i").cast("long").as("i"),
            col("j").cast("long").as("j"),
            col("n"), col("cov")
          )
          .orderBy("i", "j"),
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             |    CAST(unnest(embedding) AS DOUBLE) AS x
             |  FROM embeddings WHERE len(embedding) = 64)
             |SELECT a.i, b.i AS j, COUNT(*) AS n, covar_samp(a.x, b.x) AS cov
             |FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // PCA fit + project (Similarity.pcaFit/pcaProject): the one data pass
    // is x79's covariance; the eigensolve is a d x d driver-side Jacobi
    // (bounded by dim², like kmeansFit's k-centroid collect) and the
    // projection rides the plan as literals. The eigensolve itself is not
    // SQL-expressible, so the oracle row is the x58 boolean-pin shape:
    // per-component rows carry what DuckDB CAN recompute (n, and trace =
    // Σ var_samp(xᵢ) — sum of eigenvalues by trace invariance) plus
    // engine-computed eigenpair invariants (residual, unit norm,
    // orthogonality, descending order, projected variance == λ via a
    // second distributed pass) that the oracle pins TRUE. Raw projections
    // stay pinned by PcaSpec (brute-force parity, planted directions).
    Q(
      "x80_pca_eigen",
      (s, d) =>
        Similarity
          .pcaVerifyRows(tw(s, d, "embeddings"), "embedding", dim = 64, k = 4)
          .orderBy("c"),
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             |    CAST(unnest(embedding) AS DOUBLE) AS x
             |  FROM embeddings WHERE len(embedding) = 64),
             |tr AS (SELECT SUM(v) AS trace
             |  FROM (SELECT var_samp(x) AS v FROM e GROUP BY i)),
             |nn AS (SELECT COUNT(*) AS n FROM embeddings WHERE len(embedding) = 64)
             |SELECT CAST(t.c AS BIGINT) AS c, nn.n, tr.trace,
             |  TRUE AS resid_ok, TRUE AS unit_ok, TRUE AS orth_ok,
             |  TRUE AS desc_ok, TRUE AS var_ok
             |FROM (VALUES (0), (1), (2), (3)) AS t(c), tr, nn
             |ORDER BY c""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Image near-dup via perceptual hash (Multimodal.pHashDupes): real
    // JPEG decode → 32x32 fractional-box luminance → DCT pHash → banded-
    // Hamming blocking (exact recall at the threshold by pigeonhole).
    // Same-pattern synthetic images differ in SIZE and JPEG QUALITY —
    // different bytes, same content, the pairs byte hashing cannot see.
    // The decode+DCT is not SQL-expressible, but the PLANTED TRUTH is:
    // same-pattern (doc_id % 40) pairs are near-dups by construction and
    // cross-pattern pairs are not, so the oracle recomputes the exact
    // expected pair set and the hash check demands the full decode →
    // pHash → banded-blocking path recover it with zero misses and zero
    // false pairs. The spec additionally pins the hamming values against
    // brute force at the threshold.
    Q(
      "x81_phash_dupes",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), (col("doc_id") % 40).as("pat"))
        val withP = Multimodal.withSynthJpegPayload(docs, "doc_id", "pat")
        Multimodal
          .pHashDupes(withP, "doc_id", maxHamming = 3)
          .select(col("d1"), col("d2"))
          .orderBy("d1", "d2")
      },
      Some(plantedPairSql)
    ),
    // ------------------------------------------------------------------
    // Feature hashing (TextAnalysis.hashedTf): vocabulary-free signed
    // TF projection into 64 buckets — bucket and sign from disjoint bits
    // of the portable md5 token hash, so the oracle replays the exact
    // mapping; weights are exact integers. Output bounded by |docs| x dim
    // at any vocabulary size; no dictionary built or broadcast.
    Q(
      "x82_feature_hash",
      (s, d) =>
        TextAnalysis
          .hashedTf(t(s, d, "documents"), "doc_id", "text", dim = 64)
          .orderBy("doc_id", "bucket"),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |h AS (SELECT doc_id,
             |    CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) AS h60 FROM toks),
             |sw AS (SELECT doc_id, (h60 // 2) % 64 AS bucket,
             |    CASE WHEN h60 % 2 = 1 THEN 1 ELSE -1 END AS sign FROM h)
             |SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS w
             |FROM sw GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Audio near-dup via energy-ratio fingerprint (Multimodal.
    // audioFpDupes): real WAV decode → 8-band window energies → 64-bit
    // "band rose vs previous window" hash (volume- and tail-invariant) →
    // banded-Hamming blocking. Same-pattern synth clips differ in
    // amplitude and length — near-dups byte hashing cannot see. PCM
    // decode is not SQL-expressible, but the planted truth is (see x81):
    // the oracle recomputes the exact expected same-pattern pair set and
    // the hash check demands full recovery. Spec pins operator ==
    // brute-force at the threshold and the invariances.
    Q(
      "x83_audio_dupes",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), (col("doc_id") % 40).as("pat"))
        val withP = Multimodal.withSynthWavVariantPayload(docs, "doc_id", "pat")
        Multimodal
          .audioFpDupes(withP, "doc_id", maxHamming = 3)
          .select(col("d1"), col("d2"))
          .orderBy("d1", "d2")
      },
      Some(plantedPairSql)
    ),
    // ------------------------------------------------------------------
    // Video near-dup (Multimodal.videoDupes): real AVI/MJPEG decode →
    // per-sampled-frame DCT pHash → banded-Hamming frame matching →
    // videos pair when >= minMatches distinct frames match (frame-index-
    // free, so trims/offsets still pair). Same-pattern synth clips differ
    // in frame size and JPEG quality. Container walk + JPEG decode is not
    // SQL-expressible, but the planted truth is (see x81): the oracle
    // recomputes the exact expected same-pattern pair set and the hash
    // check demands full recovery. Spec pins per-frame hash agreement and
    // the match counts.
    Q(
      "x84_video_dupes",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), (col("doc_id") % 40).as("pat"))
        val withP = Multimodal.withSynthAviVariantPayload(docs, "doc_id", "pat")
        Multimodal
          .videoDupes(withP, "doc_id", every = 2, maxHamming = 3, minMatches = 2)
          .select(col("d1"), col("d2"))
          .orderBy("d1", "d2")
      },
      Some(plantedPairSql)
    ),
    // ------------------------------------------------------------------
    // Sliding (hopping) windows (TimeOps.slide): 5-min windows every
    // 100 s — each event explodes into its 3 containing windows; map-side
    // partials collapse the fan-out before the one aggregate shuffle.
    Q(
      "x85_sliding_window",
      (s, d) =>
        TimeOps
          .slide(
            t(s, d, "events").select(col("ts"), col("event_type"), col("value")),
            "ts",
            width = 300_000_000_000L,
            step = 100_000_000_000L
          )
          .groupBy(expr("window_start div 1000000000").as("window_s"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 14).as("sum_v"))
          .orderBy("window_s", "event_type"),
      Some(s"""WITH e AS (SELECT epoch_ns(ts) AS tns, event_type, value FROM events),
              |w AS (SELECT event_type, value,
              |    unnest(range((tns - 300000000000) // 100000000000 + 1,
              |                 tns // 100000000000 + 1)) AS k
              |  FROM e)
              |SELECT k * 100 AS window_s, event_type, COUNT(*) AS n,
              |  ${Sql.dsum("value", 14)} AS sum_v
              |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Per-key rank statistics (Relational.rankStats): ANSI percent_rank +
    // cume_dist per event_type — bit-stable ((rank-1)/(n-1) is one IEEE
    // division); one exchange, per-key sort.
    Q(
      "x86_rank_stats",
      (s, d) =>
        Relational
          .rankStats(
            t(s, d, "events").select(col("event_id"), col("event_type"), col("value")),
            Seq("event_type"),
            "value"
          )
          .orderBy("event_id"),
      Some("""SELECT event_id, event_type, value,
             |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY value)
             |ORDER BY event_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Per-group mode (Relational.modeOf): most frequent event_type per
    // user, largest-value tie-break — two map-side-partial aggregates,
    // never a window sort over the raw events.
    Q(
      "x87_mode",
      (s, d) =>
        Relational
          .modeOf(t(s, d, "events"), Seq("user_id"), "event_type")
          .orderBy("user_id"),
      Some("""WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
             |    ORDER BY n DESC, event_type DESC) AS rk FROM c)
             |SELECT user_id, event_type AS mode_event_type, n AS n_mode
             |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Trailing time-window features (TimeOps.rollingByTime): per-user
    // count / exact decimal sum / min / max of `value` over the last 60 s
    // (RANGE frame — irregular event spacing gets true time windows, and
    // same-ts rows are peers on both engines). One hash exchange on
    // user_id; each key sorts independently — no global sort.
    Q(
      "x75_rolling_time",
      (s, d) =>
        TimeOps
          .rollingByTime(
            t(s, d, "events").select(col("event_id"), col("user_id"), col("ts"), col("value")),
            "user_id",
            "ts",
            "value",
            width = 60_000_000_000L
          )
          .select(
            col("event_id"),
            col("user_id"),
            col("n_win").as("n_60s"),
            col("sum_win").as("sum_60s"),
            col("min_win").as("min_60s"),
            col("max_win").as("max_60s")
          )
          .orderBy("event_id"),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, value FROM events)
             |SELECT event_id, user_id,
             |  COUNT(*) OVER w AS n_60s,
             |  CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER w AS DOUBLE) AS sum_60s,
             |  MIN(value) OVER w AS min_60s,
             |  MAX(value) OVER w AS max_60s
             |FROM e
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns
             |  RANGE BETWEEN 60000000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Learned linear quality classifier (TextAnalysis.scoreLinear): the
    // CCNet/RefinedWeb/DCLM-style fasttext stage beside the rule-based
    // x52 — logit = bias + Σ_tok sign·w[bucket] over x82's portable md5
    // hashed features. Weights on the k/256 binary grid make the score
    // order-independent and EXACT, so the oracle replays it bit-for-bit.
    // Engine shape: weights as plan literals, one per-row fold — no
    // shuffle, no broadcast, no feature materialization.
    Q(
      "x88_quality_score",
      (s, d) =>
        TextAnalysis
          .scoreLinear(
            tw(s, d, "documents").select(col("doc_id"), col("text")),
            "text",
            qWeights,
            17.0 / 256.0
          )
          .select(col("doc_id"), col("logit"), col("keep"))
          .orderBy("doc_id"),
      Some(scoreLinearSql)
    ),
    // ------------------------------------------------------------------
    // Same classifier through the LARGE-dim path (TextAnalysis.
    // scoreLinearSparse): sparse hashedTf + broadcast (bucket, weight)
    // table + one per-doc sum — the shape for fasttext-scale bucket
    // counts that cannot ride the plan as literals. Same oracle: the two
    // engine paths and DuckDB must agree exactly.
    Q(
      "x89_quality_score_sparse",
      (s, d) => {
        val wdf = s
          .range(64)
          .select(
            col("id").as("bucket"),
            (expr("CAST((id * 37) % 101 - 50 AS DOUBLE)") / 256.0).as("weight")
          )
        TextAnalysis
          .scoreLinearSparse(t(s, d, "documents"), "doc_id", "text", wdf, dim = 64, bias = 17.0 / 256.0)
          .orderBy("doc_id")
      },
      Some(scoreLinearSql)
    ),
    // ------------------------------------------------------------------
    // REAL BPE tokenizer under the correctness gate (graft.functions.Bpe:
    // GPT-2 pre-tokenizer + byte-level mapping + rank-table merge loop as
    // a codegen'd expression). The merge table is chain-structured over
    // the corpus vocabulary (see bpeMerges), which gives the token count
    // a closed form DuckDB can replay EXACTLY — so the hash row pins the
    // real iterative tokenizer, not an approximation. Regex estimate
    // columns ride along (x54's surface, now with the exact count).
    Q(
      "x90_bpe_budget",
      (s, d) =>
        TextAnalysis
          .tokenBudget(t(s, d, "documents"), "doc_id", "text", bpeMerges)
          .orderBy("doc_id"),
      bpeBudgetSql
    ),
    // ------------------------------------------------------------------
    // N-gram-overlap decontamination (Dedup.decontaminateNgram): the
    // GPT-3-style 13-gram eval-set scrub — whole-doc fingerprints miss a
    // training doc that merely EMBEDS an eval question. A 13-word canary
    // is planted at the END of every doc_id % 5 == 1 doc (so gram
    // positions vary with doc length); the reference is that one canary
    // line. The oracle replays the full n-gram extraction and join in
    // SQL, so survivorship is recomputed, not assumed.
    Q(
      "x91_decon_ngram",
      (s, d) => {
        import s.implicits._
        val dirty = tw(s, d, "documents")
          .withColumn(
            "text",
            when(col("doc_id") % 5 === 1, concat(col("text"), lit(" " + CanaryLine)))
              .otherwise(col("text"))
          )
        val reference = Seq(CanaryLine).toDF("text")
        Dedup
          .decontaminateNgram(dirty, reference, "doc_id", "text", n = 13)
          .select(col("doc_id"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, n_chars,
             |    CASE WHEN doc_id % 5 = 1 THEN text || ' $CanaryLine' ELSE text END AS t
             |  FROM documents),
             |rtk AS (SELECT string_split('$CanaryLine', ' ') AS tk),
             |rg AS (SELECT DISTINCT array_to_string(tk[i:i+12], ' ') AS g
             |  FROM rtk, unnest(range(1, len(tk) - 11)) AS u(i)),
             |dtk AS (SELECT doc_id, string_split(t, ' ') AS tk FROM d),
             |dg AS (SELECT doc_id, array_to_string(tk[i:i+12], ' ') AS g
             |  FROM dtk, unnest(range(1, len(tk) - 11)) AS u(i)),
             |bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN rg USING (g))
             |SELECT doc_id, n_chars FROM d
             |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
             |ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Curation funnel audit (Pipeline.auditFunnel): per-stage survivor
    // counters — total → quality passers → lowest-id-per-text among
    // passers → decontaminated — in ONE pass (window on the text key +
    // broadcast fingerprints + one global aggregate). The drop-rate
    // report every production pipeline runs beside its output; the
    // oracle replays each stage's predicate with windows.
    Q(
      "x92_curation_funnel",
      (s, d) =>
        graft.operators.Pipeline.auditFunnel(
          t(s, d, "documents"),
          "doc_id",
          "text",
          t(s, d, "documents").filter(col("doc_id") % 7 === 0),
          minQuality = 0.6
        ),
      Some("""WITH q AS (SELECT doc_id, text,
             |    round(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
             |     + 0.5 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
             |         / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0), 6) >= 0.6 AS ok
             |  FROM documents),
             |r AS (SELECT *, row_number() OVER (PARTITION BY text
             |    ORDER BY ok DESC, doc_id) AS rk FROM q),
             |fp AS (SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
             |    string_split(text, ' '))), ' ')) AS f FROM documents),
             |ref AS (SELECT DISTINCT f FROM fp WHERE doc_id % 7 = 0)
             |SELECT COUNT(*) AS n_total,
             |  CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
             |  CAST(SUM(CASE WHEN ok AND rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_dedup,
             |  CAST(SUM(CASE WHEN ok AND rk = 1
             |      AND fp.f NOT IN (SELECT f FROM ref) THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
             |FROM r JOIN fp USING (doc_id)""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Overlapping token-window chunking (TextAnalysis.chunkDocs): the
    // RAG/pretraining context-window prep — 32-token windows every 24
    // tokens, last chunk short, every token covered. Pure per-row
    // transform + explode; the oracle replays the slicing with DuckDB
    // list windows.
    Q(
      "x93_chunk_docs",
      (s, d) =>
        TextAnalysis
          .chunkDocs(t(s, d, "documents"), "doc_id", "text", window = 32, stride = 24)
          .orderBy("doc_id", "chunk_id"),
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |k AS (SELECT doc_id, t, unnest(range(0, ((len(t) - 1) // 24) + 1)) AS c
             |  FROM tk)
             |SELECT doc_id, CAST(c AS BIGINT) AS chunk_id,
             |  array_to_string(t[c * 24 + 1 : c * 24 + 32], ' ') AS chunk_text,
             |  CAST(least(len(t) - c * 24, 32) AS INTEGER) AS n_chunk_tokens
             |FROM k ORDER BY doc_id, chunk_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Sequence packing on EXACT BPE counts (packSequences' count-Column
    // overload + BpeCount): the layout a packed dataloader reproduces
    // only matches when the counts are the model tokenizer's — x62 packs
    // the whitespace estimate, this packs the real merge-table counts.
    // The oracle reuses x90's closed form for the per-doc count, then
    // replays the same per-stream cumulative sum.
    Q(
      "x94_pack_bpe",
      (s, d) =>
        TextAnalysis
          .packSequences(
            t(s, d, "documents"),
            "doc_id",
            Seq("source"),
            TextAnalysis.bpeCount(col("text"), bpeMerges).cast("long"),
            256
          )
          .orderBy("doc_id"),
      Some {
        val pats = bpeMerges.map { case (a, b) => a + b }
        // strlen = bytes, matching the BPE engine's base symbol count (x90)
        val exact = "CAST(strlen(text)" + pats
          .map(p => s" - (length(text) - length(replace(text, '$p', ''))) // ${p.length}")
          .mkString + " AS BIGINT)"
        s"""WITH tk AS (SELECT doc_id, source, $exact AS n_tokens FROM documents),
           |cs AS (SELECT doc_id, source, n_tokens,
           |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS tok_start
           |  FROM tk)
           |SELECT doc_id, source, n_tokens,
           |  CAST(tok_start // 256 AS BIGINT) AS seq_id,
           |  CAST(tok_start % 256 AS BIGINT) AS seq_off
           |FROM cs ORDER BY doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // Temperature-weighted domain mixture (Scale.temperatureMix): share
    // of each lang ∝ count^0.5 — the α-exponent rule that keeps head
    // domains from drowning the tail. Bit-identical across engines by
    // construction (ordered normalizing sum, pow(x,0.5)=sqrt, the same
    // (share·smax)/ng rate association as x61), so the oracle recomputes
    // the ENTIRE pipeline: counts → √-weights → shares → rates → the
    // per-row hash test.
    Q(
      "x95_temperature_mix",
      (s, d) =>
        Scale
          .temperatureMix(t(s, d, "documents"), Seq("doc_id"), "lang", alpha = 0.5)
          .select("doc_id", "lang", "source")
          .orderBy("doc_id"),
      Some("""WITH n AS (SELECT lang, CAST(count(*) AS DOUBLE) AS ng FROM documents GROUP BY 1),
             |w AS (SELECT lang, ng, pow(ng, 0.5) AS wt FROM n),
             |tw AS (SELECT SUM(wt ORDER BY lang) AS tot FROM w),
             |j AS (SELECT lang, ng, wt / tot AS share,
             |    ng / (wt / tot) AS demand FROM w CROSS JOIN tw),
             |s AS (SELECT min(demand) AS smax FROM j),
             |r AS (SELECT lang, share * smax / ng AS rate FROM j CROSS JOIN s)
             |SELECT d.doc_id, d.lang, d.source
             |FROM documents d JOIN r USING (lang)
             |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000
             |      < rate * 1000
             |ORDER BY d.doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // IVF top-k at the DOCUMENTED cell-count contract (nCells = floor(√N)
    // — see ivfTopK's Scaladoc and ROUND12.md's sf10 measurement): x34
    // pins the operator at a fixed 8 cells; this gates the scale
    // parameterization itself — the cell count derives from the corpus,
    // and the oracle recomputes the same √N cutoff, assignment, and
    // within-cell ranking. sqrt/floor are correctly-rounded IEEE on both
    // engines, so the cutoff is bit-identical.
    Q(
      "x96_ivf_sqrtn",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val nlist = math.max(1L, math.floor(math.sqrt(e.count().toDouble)).toLong)
        Similarity
          .ivfTopK(e, e.filter(col("vec_id") < nlist), "vec_id", "embedding", 5)
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |nl AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS nlist FROM e),
             |cen AS (SELECT vec_id AS cen_id, v AS cv FROM e, nl WHERE vec_id < nlist),
             |score AS (SELECT e.vec_id, cen.cen_id,
             |  round(list_dot_product(e.v, cen.cv)
             |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cen.cv, cen.cv))), 6) AS sim
             |  FROM e CROSS JOIN cen),
             |asg AS (SELECT vec_id, cen_id AS cell FROM (
             |  SELECT vec_id, cen_id,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cen_id) AS r
             |  FROM score) t WHERE r = 1),
             |sims AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid,
             |  round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
             |  FROM asg qa JOIN asg ca ON qa.cell = ca.cell AND qa.vec_id != ca.vec_id
             |  JOIN e q ON q.vec_id = qa.vec_id JOIN e c ON c.vec_id = ca.vec_id),
             |rk AS (SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
             |  FROM sims)
             |SELECT qid, cid, sim, rn FROM rk WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // The √N contract as the DEFAULT ergonomics (Similarity.ivfTopKAuto):
    // cell count derived from the corpus, centroids fitted by kmeansFit.
    // iters=0 keeps kmeansFit's deterministic seeding (the first √N ids'
    // vectors, renumbered 0..√N-1) so an external engine can replay the
    // whole path: the oracle re-derives √N, re-picks the seed vectors by
    // id rank, and re-runs assignment + within-cell ranking. Lloyd
    // iterations (iters>0) are pinned equal to the manual composition in
    // OperatorsSpec instead.
    Q(
      "x97_ivf_auto",
      (s, d) =>
        Similarity
          .ivfTopKAuto(t(s, d, "embeddings"), "vec_id", "embedding", 5, iters = 0)
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |nl AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS nlist FROM e),
             |cen AS (SELECT cen_vid, cv FROM (
             |    SELECT vec_id AS cen_vid, v AS cv,
             |      row_number() OVER (ORDER BY vec_id) AS rk FROM e) t, nl
             |  WHERE rk <= nlist),
             |score AS (SELECT e.vec_id, cen.cen_vid,
             |  round(list_dot_product(e.v, cen.cv)
             |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cen.cv, cen.cv))), 6) AS sim
             |  FROM e CROSS JOIN cen),
             |asg AS (SELECT vec_id, cen_vid AS cell FROM (
             |  SELECT vec_id, cen_vid,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cen_vid) AS r
             |  FROM score) t WHERE r = 1),
             |sims AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid,
             |  round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
             |  FROM asg qa JOIN asg ca ON qa.cell = ca.cell AND qa.vec_id != ca.vec_id
             |  JOIN e q ON q.vec_id = qa.vec_id JOIN e c ON c.vec_id = ca.vec_id),
             |rk AS (SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
             |  FROM sims)
             |SELECT qid, cid, sim, rn FROM rk WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // BPE token IDS (TextAnalysis.bpeIds): the dataloader-facing surface
    // — real merge-loop tokens mapped through a vocab that rides the plan
    // as a map literal, exploded to (doc_id, pos, token_id). The oracle
    // replays the whole sequence: per-word token-id lists (independent
    // greedy replay, pinned == the merge loop at build time AND in
    // BpeSpec), doc assembly by word position (first word bare, the rest
    // space-prefixed), running offsets, flatten.
    Q(
      "x98_bpe_ids",
      (s, d) =>
        tw(s, d, "documents")
          .select(
            col("doc_id"),
            posexplode(TextAnalysis.bpeIds(col("text"), bpeMerges, bpeVocab))
          )
          .withColumnRenamed("col", "token_id")
          .orderBy("doc_id", "pos"),
      bpeIdsSql
    ),
    // ------------------------------------------------------------------
    // BPE tokenizer TRAINING in the engine (TextAnalysis.bpeTrain): one
    // distributed pass builds the pre-token frequency dictionary (the
    // Sennrich trick — the loop never touches the corpus again); the
    // driver learns 6 merges on it. The oracle replays the WHOLE
    // training loop in SQL — dictionary, pair counts (overlaps
    // included), max-count/lexicographic selection, left-to-right
    // non-overlapping merge via run-id + parity windows — so the learned
    // table is recomputed, not assumed. Closes the loop with x90/x94/
    // x98: train -> tokenize -> pack, all under the hash gate.
    Q(
      "x99_bpe_train",
      (s, d) => {
        import s.implicits._
        TextAnalysis
          .bpeTrain(t(s, d, "documents"), "text", numMerges = 6)
          .zipWithIndex
          .map { case ((a, b), i) => (i, a, b) }
          .toDF("rank", "a", "b")
          .orderBy("rank")
      },
      bpeTrainSql(6)
    ),
    // ------------------------------------------------------------------
    // Product-quantization ANN (Similarity.pqFit/pqTopK — the FAISS
    // IVFADC architecture): IVF cells bound WHICH pairs are scored,
    // candidates cross the cell join as m=8 codes + a norm instead of 64
    // floats, and pairs are scored by the asymmetric codegen kernel.
    // iters=0 everywhere keeps BOTH trainings at their deterministic
    // first-k-by-id seeding (the x97 convention), so the oracle replays
    // the entire path: √N cell seeds + cosine assignment, per-subspace
    // L2 code assignment against the first-16 seed slices, reconstruction
    // + its norm, and the same-cell ADC cosine ranking. The engine's
    // kernels accumulate double left-to-right exactly like
    // list_dot_product, so codes and sims replay bit-for-bit.
    Q(
      "x100_pq_adc",
      (s, d) => {
        val e = tw(s, d, "embeddings")
        val n = e.count()
        val nCells = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong).toInt
        val cen = Similarity
          .kmeansFit(e, "vec_id", "embedding", nCells, iters = 0)
          .select(col("cen_id").as("vec_id"), col("cen_v").as("embedding"))
        val model = Similarity.pqFit(e, "vec_id", "embedding", dim = 64, m = 8, nCen = 16, iters = 0)
        Similarity
          .pqTopK(e, cen, "vec_id", "embedding", 5, model)
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |nl AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS nlist FROM e),
             |rkd AS MATERIALIZED (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rk FROM e),
             |cen AS MATERIALIZED (SELECT rk - 1 AS cen_id, v AS cv FROM rkd, nl WHERE rk <= nlist),
             |score AS (SELECT e.vec_id, cen.cen_id,
             |  round(list_dot_product(e.v, cen.cv)
             |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cen.cv, cen.cv))), 6) AS sim
             |  FROM e CROSS JOIN cen),
             |asg AS MATERIALIZED (SELECT vec_id, cen_id AS cell FROM (
             |  SELECT vec_id, cen_id,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cen_id) AS r
             |  FROM score) t WHERE r = 1),
             |sd AS MATERIALIZED (SELECT rk - 1 AS c, j, v[j*8+1 : j*8+8] AS cv
             |  FROM rkd, unnest(range(0, 8)) u(j) WHERE rk <= 16),
             |sdist AS (SELECT e.vec_id, sd.j, sd.c,
             |    round(list_dot_product(
             |      list_transform(range(1, 9), t -> e.v[sd.j*8 + t] - sd.cv[t]),
             |      list_transform(range(1, 9), t -> e.v[sd.j*8 + t] - sd.cv[t])), 6) AS dd
             |  FROM e CROSS JOIN sd),
             |codes AS MATERIALIZED (SELECT vec_id, j, c FROM (
             |  SELECT vec_id, j, c,
             |    row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, c) AS r
             |  FROM sdist) t WHERE r = 1),
             |dec AS MATERIALIZED (SELECT codes.vec_id, flatten(list(sd.cv ORDER BY sd.j)) AS dv
             |  FROM codes JOIN sd ON sd.j = codes.j AND sd.c = codes.c
             |  GROUP BY codes.vec_id),
             |dn AS MATERIALIZED (SELECT vec_id, sqrt(list_dot_product(dv, dv)) AS pqn FROM dec),
             |sims AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid,
             |    round(list_dot_product(q.v, c.dv)
             |      / (sqrt(list_dot_product(q.v, q.v)) * dn.pqn), 6) AS sim
             |  FROM asg qa JOIN asg ca ON qa.cell = ca.cell AND qa.vec_id != ca.vec_id
             |  JOIN e q ON q.vec_id = qa.vec_id
             |  JOIN dec c ON c.vec_id = ca.vec_id
             |  JOIN dn ON dn.vec_id = ca.vec_id),
             |rk2 AS (SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
             |  FROM sims)
             |SELECT qid, cid, sim, rn FROM rk2 WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // FUZZY n-gram decontamination (Dedup.decontaminateFuzzy): the eval
    // text drifted one token — x91's exact 13-gram scrub misses it
    // entirely. The planted canary is EXACT in the corpus but the
    // reference carries a PERTURBED copy (zcan7 → zcanx7, one character
    // edit inside one word), so survivorship here is decided purely by
    // the Levenshtein band — an exact-gram join would drop nothing.
    // Integer edit distance replays identically in DuckDB: no float
    // wobble anywhere in this gate.
    Q(
      "x101_decon_fuzzy",
      (s, d) => {
        import s.implicits._
        val dirty = tw(s, d, "documents")
          .withColumn(
            "text",
            when(col("doc_id") % 5 === 1, concat(col("text"), lit(" " + CanaryLine)))
              .otherwise(col("text"))
          )
        val reference = Seq(CanaryLine.replace("zcan7", "zcanx7")).toDF("text")
        Dedup
          .decontaminateFuzzy(dirty, reference, "doc_id", "text", n = 13, maxDist = 2)
          .select(col("doc_id"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, n_chars,
             |    CASE WHEN doc_id % 5 = 1 THEN text || ' $CanaryLine' ELSE text END AS t
             |  FROM documents),
             |rtk AS (SELECT string_split('${CanaryLine.replace("zcan7", "zcanx7")}', ' ') AS tk),
             |rg AS (SELECT DISTINCT array_to_string(tk[i:i+12], ' ') AS g
             |  FROM rtk, unnest(range(1, len(tk) - 11)) AS u(i)),
             |dtk AS (SELECT doc_id, string_split(t, ' ') AS tk FROM d),
             |dg AS (SELECT doc_id, array_to_string(tk[i:i+12], ' ') AS g
             |  FROM dtk, unnest(range(1, len(tk) - 11)) AS u(i)),
             |bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN rg
             |  ON abs(length(dg.g) - length(rg.g)) <= 2 AND levenshtein(dg.g, rg.g) <= 2)
             |SELECT doc_id, n_chars FROM d
             |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
             |ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // DSIR data selection (Scale.dsirSelect — Xie et al., NeurIPS 2023):
    // pick raw docs whose hashed-unigram+bigram distribution looks like
    // a target corpus (here the doc_id % 7 == 0 slice), by smoothed
    // log-prob-ratio importance weight + Gumbel-top-k. λ snapped to the
    // 2^-20 dyadic grid makes per-doc sums order-independent (the x88
    // exact-grid trick), the Gumbel noise is a pure id-hash transform,
    // and the k cut breaks ties on doc_id — so the oracle replays the
    // WHOLE method: gram extraction, bucket counts for both corpora, λ,
    // per-doc weights, Gumbel keys, the top-k ranking.
    Q(
      "x102_dsir_select",
      (s, d) => {
        val docs = tw(s, d, "documents")
        Scale
          .dsirSelect(docs, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", k = 200, buckets = 1024)
          .select(
            col("doc_id"),
            col("source"),
            round(col("dsir_logw"), 6).as("dsir_logw")
          )
          .orderBy("doc_id")
      },
      Some("""WITH tw AS MATERIALIZED (SELECT doc_id, list_concat(ws,
             |    CASE WHEN len(ws) >= 2
             |      THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
             |      ELSE CAST([] AS VARCHAR[]) END) AS gs
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
             |gb AS MATERIALIZED (SELECT doc_id,
             |    (CAST('0x' || substr(md5(g), 18, 15) AS BIGINT) // 2) % 1024 AS b
             |  FROM (SELECT doc_id, unnest(gs) AS g FROM tw)),
             |rc AS MATERIALIZED (SELECT b, CAST(count(*) AS BIGINT) AS c FROM gb GROUP BY 1),
             |tc AS MATERIALIZED (SELECT b, CAST(count(*) AS BIGINT) AS c FROM gb
             |  WHERE doc_id % 7 = 0 GROUP BY 1),
             |tot AS (SELECT (SELECT SUM(c) FROM rc) AS rt, (SELECT SUM(c) FROM tc) AS tt),
             |lam AS MATERIALIZED (SELECT n.b,
             |    floor((ln(COALESCE(tc.c, 0) + 1.0) - ln(COALESCE(rc.c, 0) + 1.0)
             |      + (ln(rt + 1024.0) - ln(tt + 1024.0))) * 1048576.0) / 1048576.0 AS l
             |  FROM (SELECT unnest(range(0, 1024)) AS b) n
             |  LEFT JOIN rc ON rc.b = n.b LEFT JOIN tc ON tc.b = n.b CROSS JOIN tot),
             |sc AS MATERIALIZED (SELECT gb.doc_id, SUM(l) AS logw
             |  FROM gb JOIN lam ON lam.b = gb.b GROUP BY 1),
             |ky AS (SELECT d.doc_id, d.source, sc.logw,
             |    sc.logw + (-ln(-ln(
             |      (CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 18, 15) AS BIGINT)
             |        // 256 AS DOUBLE) + 0.5) / 4503599627370496.0))) AS key
             |  FROM documents d JOIN sc ON sc.doc_id = d.doc_id),
             |sel AS (SELECT doc_id, source, logw,
             |    row_number() OVER (ORDER BY key DESC, doc_id) AS r FROM ky)
             |SELECT doc_id, source, round(logw, 6) AS dsir_logw
             |FROM sel WHERE r <= 200 ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Approximate distinct cardinality, audited (Relational.
    // approxDistinctAudit): HyperLogLog++ per-key sketches — the 100 TB
    // COUNT(DISTINCT) path (fixed-size registers merge map-side; the
    // exact aggregate shuffles every distinct string). The sketch VALUE
    // is engine-specific, so the x58 boolean-pin shape gates it: the
    // oracle recomputes the exact count and pins the ±4σ rsd band TRUE.
    Q(
      "x103_approx_distinct",
      (s, d) =>
        Relational
          .approxDistinctAudit(tw(s, d, "documents"), Seq("source"), "text")
          .orderBy("source"),
      Some("""SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT) AS n_exact,
             |TRUE AS within_bound
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // ANN recall audit (Similarity.recallAtK): recall@5 of the √N IVF
    // index (x97's exact configuration) against the brute-force exact
    // ranking — the acceptance test an index deployment runs, in its
    // at-scale SHAPE: the exact baseline is O(N·Q), so the query
    // workload is FIXED (vec_id < 1e7 — every vector at the driver's
    // SFs, base-copy ids only under amplification, sampled 1-in-10 —
    // recallAtK's documented contract) while the index ranks the full
    // corpus. An N-proportional query set would make the exact side
    // O(N²) — the same fixed-workload contract as x114; this keeps the
    // audit (and its oracle) linear at 100x. Both rankings are
    // deterministic (rounded sims, cid tie-break), so the oracle
    // recomputes BOTH sides and the per-query intersection: the recall
    // numbers are exact facts, not estimates.
    Q(
      "x104_ann_recall",
      (s, d) => {
        val e = tw(s, d, "embeddings")
        val approx = Similarity.ivfTopKAuto(e, "vec_id", "embedding", 5, iters = 0)
        val queries = e.filter(col("vec_id") < 10000000L && col("vec_id") % 10 === 0)
        val exact = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", 5)
        Similarity.recallAtK(approx, exact, 5).orderBy("qid")
      },
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |nl AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS nlist FROM e),
             |cen AS MATERIALIZED (SELECT cen_vid, cv FROM (
             |    SELECT vec_id AS cen_vid, v AS cv,
             |      row_number() OVER (ORDER BY vec_id) AS rk FROM e) t, nl
             |  WHERE rk <= nlist),
             |score AS (SELECT e.vec_id, cen.cen_vid,
             |  round(list_dot_product(e.v, cen.cv)
             |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cen.cv, cen.cv))), 6) AS sim
             |  FROM e CROSS JOIN cen),
             |asg AS MATERIALIZED (SELECT vec_id, cen_vid AS cell FROM (
             |  SELECT vec_id, cen_vid,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cen_vid) AS r
             |  FROM score) t WHERE r = 1),
             |isims AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid,
             |  round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
             |  FROM asg qa JOIN asg ca ON qa.cell = ca.cell AND qa.vec_id != ca.vec_id
             |  JOIN e q ON q.vec_id = qa.vec_id JOIN e c ON c.vec_id = ca.vec_id),
             |ark AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid,
             |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
             |  FROM isims) t WHERE rn <= 5),
             |bsims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |  round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
             |  FROM e q JOIN e c ON q.vec_id != c.vec_id
             |  WHERE q.vec_id < 10000000 AND q.vec_id % 10 = 0),
             |brk AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid,
             |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
             |  FROM bsims) t WHERE rn <= 5),
             |hits AS (SELECT ark.qid, CAST(count(*) AS BIGINT) AS n_hit
             |  FROM ark JOIN brk ON ark.qid = brk.qid AND ark.cid = brk.cid GROUP BY 1),
             |base AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_exact FROM brk GROUP BY 1)
             |SELECT base.qid, COALESCE(hits.n_hit, 0) AS n_hit, base.n_exact,
             |  round(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / base.n_exact, 6) AS recall
             |FROM base LEFT JOIN hits ON hits.qid = base.qid
             |ORDER BY base.qid""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Hard-negative mining (Similarity.hardNegatives): per anchor the 3
    // most-similar DIFFERENT-label vectors — the confusable negatives
    // contrastive training needs (random pairs are far apart in high
    // dimensions). The mismatch filter runs INSIDE the √N cell join (a
    // post-rank filter would lose negatives hiding behind same-label
    // neighbors — the oracle replays exactly that distinction). iters=0
    // first-√N seeding keeps the whole path SQL-replayable.
    Q(
      "x105_hard_negatives",
      (s, d) =>
        Similarity
          .hardNegatives(tw(s, d, "embeddings"), "vec_id", "embedding", "label", 3)
          .orderBy("qid", "rn"),
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE label IS NOT NULL),
             |nl AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS nlist FROM e),
             |cen AS MATERIALIZED (SELECT rk - 1 AS cen_id, cv FROM (
             |    SELECT v AS cv, row_number() OVER (ORDER BY vec_id) AS rk FROM e) t, nl
             |  WHERE rk <= nlist),
             |score AS (SELECT e.vec_id, cen.cen_id,
             |  round(list_dot_product(e.v, cen.cv)
             |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cen.cv, cen.cv))), 6) AS sim
             |  FROM e CROSS JOIN cen),
             |asg AS MATERIALIZED (SELECT vec_id, cen_id AS cell FROM (
             |  SELECT vec_id, cen_id,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cen_id) AS r
             |  FROM score) t WHERE r = 1),
             |sims AS (SELECT qa.vec_id AS qid, ca.vec_id AS cid,
             |  round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
             |  FROM asg qa JOIN asg ca ON qa.cell = ca.cell AND qa.vec_id != ca.vec_id
             |  JOIN e q ON q.vec_id = qa.vec_id JOIN e c ON c.vec_id = ca.vec_id
             |  WHERE q.label != c.label),
             |rk AS (SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
             |  FROM sims)
             |SELECT qid, cid, sim, rn FROM rk WHERE rn <= 3 ORDER BY qid, rn""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Aho–Corasick dictionary tagging (TextAnalysis.tagKeywords): one
    // text pass finds every dictionary term — the naive formulation
    // scans the text once PER TERM. The dictionary is chosen to stress
    // the automaton: 'a' (hits inside almost every word), 'can'/'art'
    // (proper substrings of corpus words via fail links), a two-word
    // phrase, and an absent term. The oracle replays semantics with
    // per-term contains() — trivially correct, dictionary-scale slow,
    // which is exactly the point.
    Q(
      "x106_keyword_tag",
      (s, d) =>
        TextAnalysis
          .tagKeywords(
            t(s, d, "documents"),
            "doc_id",
            "text",
            Seq("a", "art", "can", "data", "hash join", "scan", "the", "zebra")
          )
          .orderBy("doc_id", "term"),
      Some("""SELECT doc_id, t AS term
             |FROM documents, (VALUES ('a'), ('art'), ('can'), ('data'),
             |  ('hash join'), ('scan'), ('the'), ('zebra')) terms(t)
             |WHERE contains(text, t)
             |ORDER BY doc_id, term""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Blocklist gate (TextAnalysis.blocklistFilter): drop every doc
    // containing any dictionary term — keyword_any stops at the FIRST
    // hit, one pass for clean docs, less for dirty ones.
    Q(
      "x107_blocklist",
      (s, d) =>
        TextAnalysis
          .blocklistFilter(t(s, d, "documents"), "text", Seq("slow", "dup table"))
          .select(col("doc_id"), col("n_chars"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars FROM documents
             |WHERE NOT (contains(text, 'slow') OR contains(text, 'dup table'))
             |ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Byte-level BPE round trip (TextAnalysis.bpeDecode): detokenizing
    // the REAL merge-loop token stream must reproduce the original text
    // byte-for-byte — the lossless-by-construction property byte-level
    // BPE exists for (Radford 2019), here gated corpus-wide: the engine
    // emits decode(encode(text)) and the oracle is simply the text
    // column. Any tokenizer defect that loses or reorders a byte breaks
    // the hash.
    Q(
      "x108_bpe_roundtrip",
      (s, d) =>
        t(s, d, "documents")
          .select(
            col("doc_id"),
            TextAnalysis.bpeDecode(TextAnalysis.bpeTokens(col("text"), bpeMerges)).as("text")
          )
          .orderBy("doc_id"),
      Some("SELECT doc_id, text FROM documents ORDER BY doc_id")
    ),
    // ------------------------------------------------------------------
    // PARAPHRASE decontamination (Dedup.decontaminateNearDup): the eval
    // item was lightly rewritten, so fingerprint/13-gram/per-gram-edit
    // scrubs all miss it — document-level MinHash overlap doesn't. The
    // reference here is the doc_id % 7 == 0 slice with three words
    // APPENDED (a true near-dup of those corpus docs: shingle sets
    // overlap heavily but no fingerprint or 13-gram tail matches). The
    // oracle replays BOTH signature pipelines, the band join against the
    // reference, the exact 1/8-quantized agreement estimate and the
    // anti-join — survivorship is recomputed end to end.
    Q(
      "x109_decon_neardup",
      (s, d) => {
        val docs = t(s, d, "documents")
        val reference = docs
          .filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" zzeval zzset zzcanary")).as("text"))
        Dedup
          .decontaminateNearDup(docs, reference, "doc_id", "text")
          .select(col("doc_id"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ref AS (SELECT doc_id, text || ' zzeval zzset zzcanary' AS text
             |    FROM documents WHERE doc_id % 7 = 0),
             |${shingleCteFrom("documents")},
             |tok AS (SELECT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) % ${Dedup.MinhashHashMod} + 1 AS h FROM sh),
             |sig AS MATERIALIZED (SELECT doc_id, $minhashMins FROM tok GROUP BY 1),
             |rtoks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM ref),
             |rsh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
             |        FROM rtoks, unnest(range(1, len(tk) - 1)) AS t(i)),
             |rtok AS (SELECT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) % ${Dedup.MinhashHashMod} + 1 AS h FROM rsh),
             |rsig AS MATERIALIZED (SELECT doc_id, $minhashMins FROM rtok GROUP BY 1),
             |bands AS (
             |  SELECT doc_id, 0 AS band, m0*100000+m1 AS bh FROM sig UNION ALL
             |  SELECT doc_id, 1, m2*100000+m3 FROM sig UNION ALL
             |  SELECT doc_id, 2, m4*100000+m5 FROM sig UNION ALL
             |  SELECT doc_id, 3, m6*100000+m7 FROM sig),
             |rbands AS (
             |  SELECT doc_id, 0 AS band, m0*100000+m1 AS bh FROM rsig UNION ALL
             |  SELECT doc_id, 1, m2*100000+m3 FROM rsig UNION ALL
             |  SELECT doc_id, 2, m4*100000+m5 FROM rsig UNION ALL
             |  SELECT doc_id, 3, m6*100000+m7 FROM rsig),
             |cand AS (SELECT DISTINCT c.doc_id AS cid, r.doc_id AS rid
             |  FROM bands c JOIN rbands r ON c.band = r.band AND c.bh = r.bh),
             |bad AS (SELECT DISTINCT cand.cid AS doc_id
             |  FROM cand JOIN sig cs ON cs.doc_id = cand.cid
             |  JOIN rsig rs ON rs.doc_id = cand.rid
             |  WHERE CAST(${(0 until 8)
              .map(i => s"(CASE WHEN cs.m$i = rs.m$i THEN 1 ELSE 0 END)")
              .mkString(" + ")} AS DOUBLE) / 8 >= 0.5)
             |SELECT doc_id, n_chars FROM documents
             |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
             |ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // INCREMENTAL near-dup dedup (Dedup.incrementalNearDup): the
    // continuous-ingestion shape — the accepted corpus is represented
    // only by its persisted signature INDEX, a daily batch dies against
    // it band-wise and self-dedups with cleanCorpus's d1<d2 rule.
    // History = the doc_id % 3 == 0 slice (index = its signatures);
    // batch = the rest, with doc_id % 5 == 0 texts lightly perturbed so
    // the NEAR (not exact) path fires both vs the index (perturbed copy
    // of a history text) and within the batch. The oracle replays both
    // signature pipelines, both band joins, both 1/8-exact agreement
    // confirms and the final anti-join — survivorship end to end.
    Q(
      "x110_incr_neardup",
      (s, d) => {
        val docs = t(s, d, "documents")
        val index =
          Dedup.minhashSignatures(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", 8)
        val batch = docs
          .filter(col("doc_id") % 3 =!= 0)
          .withColumn(
            "text",
            when(col("doc_id") % 5 === 0, concat(col("text"), lit(" zinc zbatch znew")))
              .otherwise(col("text"))
          )
        Dedup
          .incrementalNearDup(batch, index, "doc_id", "text")
          .select(col("doc_id"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some {
        def agree(l: String, r: String) =
          s"CAST(${(0 until 8)
              .map(i => s"(CASE WHEN $l.m$i = $r.m$i THEN 1 ELSE 0 END)")
              .mkString(" + ")} AS DOUBLE) / 8 >= 0.5"
        s"""WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
           |bat AS (SELECT doc_id,
           |    CASE WHEN doc_id % 5 = 0 THEN text || ' zinc zbatch znew' ELSE text END AS text
           |  FROM documents WHERE doc_id % 3 <> 0),
           |htoks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM hist),
           |hsh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
           |        FROM htoks, unnest(range(1, len(tk) - 1)) AS t(i)),
           |htok AS (SELECT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) % ${Dedup.MinhashHashMod} + 1 AS h FROM hsh),
           |hsig AS MATERIALIZED (SELECT doc_id, $minhashMins FROM htok GROUP BY 1),
           |btoks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM bat),
           |bsh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
           |        FROM btoks, unnest(range(1, len(tk) - 1)) AS t(i)),
           |btok AS (SELECT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) % ${Dedup.MinhashHashMod} + 1 AS h FROM bsh),
           |bsig AS MATERIALIZED (SELECT doc_id, $minhashMins FROM btok GROUP BY 1),
           |hbands AS (
           |  SELECT doc_id, 0 AS band, m0*100000+m1 AS bh FROM hsig UNION ALL
           |  SELECT doc_id, 1, m2*100000+m3 FROM hsig UNION ALL
           |  SELECT doc_id, 2, m4*100000+m5 FROM hsig UNION ALL
           |  SELECT doc_id, 3, m6*100000+m7 FROM hsig),
           |bbands AS (
           |  SELECT doc_id, 0 AS band, m0*100000+m1 AS bh FROM bsig UNION ALL
           |  SELECT doc_id, 1, m2*100000+m3 FROM bsig UNION ALL
           |  SELECT doc_id, 2, m4*100000+m5 FROM bsig UNION ALL
           |  SELECT doc_id, 3, m6*100000+m7 FROM bsig),
           |icand AS (SELECT DISTINCT b.doc_id AS bid, h.doc_id AS hid
           |  FROM bbands b JOIN hbands h ON b.band = h.band AND b.bh = h.bh),
           |idrop AS (SELECT DISTINCT icand.bid AS doc_id
           |  FROM icand JOIN bsig cs ON cs.doc_id = icand.bid
           |  JOIN hsig rs ON rs.doc_id = icand.hid
           |  WHERE ${agree("cs", "rs")}),
           |scand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |  FROM bbands a JOIN bbands b
           |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
           |sdrop AS (SELECT DISTINCT scand.d2 AS doc_id
           |  FROM scand JOIN bsig cs ON cs.doc_id = scand.d1
           |  JOIN bsig rs ON rs.doc_id = scand.d2
           |  WHERE ${agree("cs", "rs")})
           |SELECT doc_id, n_chars FROM documents
           |WHERE doc_id % 3 <> 0
           |  AND doc_id NOT IN (SELECT doc_id FROM idrop)
           |  AND doc_id NOT IN (SELECT doc_id FROM sdrop)
           |ORDER BY doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // SemDeDup (Similarity.semDedup, Abbas et al. 2023): semantic dedup
    // over embeddings — √N k-means cells bound the pairwise cosine, of
    // each within-cell (d1 < d2) pair at/above the threshold d2 drops.
    // The corpus has no high-cosine pairs (max pairwise 0.513), so the
    // query plants them: the %9 slice re-enters at id+1e9 scaled by 2.0
    // — DOUBLING is exact in binary FP and commutes with every rounding
    // step, so the copy lands in the SAME cell with cosine round6 1.0
    // by construction, not hope. The oracle replays seeding (first-√N
    // by id), the argmax assignment (sim DESC, cen_id ASC — the
    // PackedArgmax contract), the within-cell confirm and the
    // anti-join.
    Q(
      "x111_semdedup",
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding").as("v"))
        // x * 2.0f is EXACT in float (exponent bump, no mantissa rounding),
        // so the double the oracle computes from the planted floats equals
        // 2.0 * its double of the originals — both engines see the same reals
        val planted = e
          .filter(col("vec_id") % 9 === 0)
          .select(
            (col("vec_id") + lit(1000000000L)).as("vec_id"),
            transform(col("v"), x => x * lit(2.0f)).as("v")
          )
        Similarity
          .semDedup(e.union(planted), "vec_id", "v", 0.95)
          .select(col("vec_id"))
          .orderBy("vec_id")
      },
      Some("""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |u AS MATERIALIZED (
             |  SELECT vec_id, v FROM base
             |  UNION ALL
             |  SELECT vec_id + 1000000000, list_transform(v, x -> x * 2.0)
             |  FROM base WHERE vec_id % 9 = 0),
             |nl AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS nlist FROM u),
             |cen AS MATERIALIZED (SELECT rk - 1 AS cen_id, cv FROM (
             |    SELECT v AS cv, row_number() OVER (ORDER BY vec_id) AS rk FROM u) t, nl
             |  WHERE rk <= nlist),
             |score AS (SELECT u.vec_id, cen.cen_id,
             |  round(list_dot_product(u.v, cen.cv)
             |    / (sqrt(list_dot_product(u.v, u.v)) * sqrt(list_dot_product(cen.cv, cen.cv))), 6) AS sim
             |  FROM u CROSS JOIN cen),
             |asg AS MATERIALIZED (SELECT vec_id, cen_id AS cell FROM (
             |  SELECT vec_id, cen_id,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cen_id) AS r
             |  FROM score) t WHERE r = 1),
             |drops AS (SELECT DISTINCT b.vec_id
             |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
             |  JOIN u q ON q.vec_id = a.vec_id JOIN u c ON c.vec_id = b.vec_id
             |  WHERE round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.95)
             |SELECT vec_id FROM u
             |WHERE vec_id NOT IN (SELECT vec_id FROM drops)
             |ORDER BY vec_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Incremental-dedup drop LEDGER (Dedup.incrementalNearDupAudit): the
    // provenance trail beside x110's survivor set — which batch docs
    // dropped, why ('index' hit vs within-'batch' shadow), and against
    // whom (smallest qualifying partner — deterministic and diffable).
    // Same corpus construction as x110; the oracle replays the evidence
    // pipelines and aggregates min(partner) per (doc, reason).
    Q(
      "x112_incr_ledger",
      (s, d) => {
        val docs = t(s, d, "documents")
        val index =
          Dedup.minhashSignatures(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", 8)
        val batch = docs
          .filter(col("doc_id") % 3 =!= 0)
          .withColumn(
            "text",
            when(col("doc_id") % 5 === 0, concat(col("text"), lit(" zinc zbatch znew")))
              .otherwise(col("text"))
          )
        Dedup
          .incrementalNearDupAudit(batch, index, "doc_id", "text")
          .orderBy("doc_id", "reason")
      },
      Some {
        def agree(l: String, r: String) =
          s"CAST(${(0 until 8)
              .map(i => s"(CASE WHEN $l.m$i = $r.m$i THEN 1 ELSE 0 END)")
              .mkString(" + ")} AS DOUBLE) / 8 >= 0.5"
        s"""WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
           |bat AS (SELECT doc_id,
           |    CASE WHEN doc_id % 5 = 0 THEN text || ' zinc zbatch znew' ELSE text END AS text
           |  FROM documents WHERE doc_id % 3 <> 0),
           |htoks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM hist),
           |hsh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
           |        FROM htoks, unnest(range(1, len(tk) - 1)) AS t(i)),
           |htok AS (SELECT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) % ${Dedup.MinhashHashMod} + 1 AS h FROM hsh),
           |hsig AS MATERIALIZED (SELECT doc_id, $minhashMins FROM htok GROUP BY 1),
           |btoks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM bat),
           |bsh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
           |        FROM btoks, unnest(range(1, len(tk) - 1)) AS t(i)),
           |btok AS (SELECT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) % ${Dedup.MinhashHashMod} + 1 AS h FROM bsh),
           |bsig AS MATERIALIZED (SELECT doc_id, $minhashMins FROM btok GROUP BY 1),
           |hbands AS (
           |  SELECT doc_id, 0 AS band, m0*100000+m1 AS bh FROM hsig UNION ALL
           |  SELECT doc_id, 1, m2*100000+m3 FROM hsig UNION ALL
           |  SELECT doc_id, 2, m4*100000+m5 FROM hsig UNION ALL
           |  SELECT doc_id, 3, m6*100000+m7 FROM hsig),
           |bbands AS (
           |  SELECT doc_id, 0 AS band, m0*100000+m1 AS bh FROM bsig UNION ALL
           |  SELECT doc_id, 1, m2*100000+m3 FROM bsig UNION ALL
           |  SELECT doc_id, 2, m4*100000+m5 FROM bsig UNION ALL
           |  SELECT doc_id, 3, m6*100000+m7 FROM bsig),
           |icand AS (SELECT DISTINCT b.doc_id AS bid, h.doc_id AS hid
           |  FROM bbands b JOIN hbands h ON b.band = h.band AND b.bh = h.bh),
           |iled AS (SELECT icand.bid AS doc_id, MIN(icand.hid) AS partner
           |  FROM icand JOIN bsig cs ON cs.doc_id = icand.bid
           |  JOIN hsig rs ON rs.doc_id = icand.hid
           |  WHERE ${agree("cs", "rs")} GROUP BY 1),
           |scand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |  FROM bbands a JOIN bbands b
           |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
           |sled AS (SELECT scand.d2 AS doc_id, MIN(scand.d1) AS partner
           |  FROM scand JOIN bsig cs ON cs.doc_id = scand.d1
           |  JOIN bsig rs ON rs.doc_id = scand.d2
           |  WHERE ${agree("cs", "rs")} GROUP BY 1)
           |SELECT doc_id, 'index' AS reason, partner FROM iled
           |UNION ALL
           |SELECT doc_id, 'batch' AS reason, partner FROM sled
           |ORDER BY doc_id, reason""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // ExactSubstr span scrubbing (Dedup.scrubDuplicatedSpans, Lee et al.
    // 2022): x53 FINDS word 8-gram spans shared by >= 2 docs; this
    // removes them — tokens under a duplicated span are cut everywhere
    // except the span's first (min-id) carrier. The oracle replays the
    // whole surgery: per-position gram hashes, the >= 2-distinct-docs
    // span set with first carriers, flagged occurrences, the n-position
    // fan-out, the anti-joined token survivors and the ORDER BY-position
    // string reassembly.
    Q(
      "x113_span_scrub",
      (s, d) =>
        Dedup
          .scrubDuplicatedSpans(tw(s, d, "documents"), "doc_id", "text", n = 8, minDocs = 2)
          .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |occ AS (SELECT doc_id, i - 1 AS i,
             |    CAST('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
             |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7]), 18, 15) AS BIGINT) AS h
             |  FROM toks, unnest(range(1, len(tk) - 6)) AS t(i)),
             |spans AS MATERIALIZED (SELECT h, MIN(doc_id) AS fd FROM (SELECT DISTINCT doc_id, h FROM occ)
             |  GROUP BY 1 HAVING COUNT(*) >= 2),
             |flag AS (SELECT o.doc_id, o.i FROM occ o JOIN spans s ON o.h = s.h AND o.doc_id <> s.fd),
             |marked AS (SELECT DISTINCT doc_id, i + u AS p FROM flag, unnest(range(0, 8)) AS tt(u)),
             |tokpos AS (SELECT doc_id, i - 1 AS p, tk[i] AS tok
             |  FROM toks, unnest(range(1, len(tk) + 1)) AS t(i)),
             |kept AS (SELECT tp.doc_id, string_agg(tp.tok, ' ' ORDER BY tp.p) AS scrub,
             |    COUNT(*) AS nk
             |  FROM tokpos tp LEFT JOIN marked m ON m.doc_id = tp.doc_id AND m.p = tp.p
             |  WHERE m.p IS NULL GROUP BY 1)
             |SELECT t.doc_id, COALESCE(k.scrub, '') AS scrubbed,
             |  CAST(len(t.tk) - COALESCE(k.nk, 0) AS INTEGER) AS n_removed
             |FROM toks t LEFT JOIN kept k ON k.doc_id = t.doc_id
             |ORDER BY t.doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // BM25 top-k retrieval (TextAnalysis.bm25TopK): the Lucene-standard
    // scoring over the x74 postings shape — a query never meets the
    // corpus, only its terms' postings. Queries = the first 5 tokens of
    // every %97 doc. Per-term contributions are rounded to 6 dp and
    // summed as DECIMAL (order-independent — a raw double sum varies
    // with partial-aggregation order); k1+1 is computed at runtime from
    // the same literal both engines parse (a Scala-folded 1.2+1 can be
    // 1 ulp off SQL's). The oracle replays tf/df/avgdl, the per-term
    // formula, the decimal sum and the ranked cut. The query set is a
    // FIXED workload (doc_id < 1e7 is every doc at the driver's SFs):
    // retrieval cost must scale with the CORPUS, never corpus x queries
    // — an N-proportional query set would make the term join O(N²),
    // the same documented contract as x104's sampled exact baseline.
    Q(
      "x114_bm25",
      (s, d) => {
        val docs = tw(s, d, "documents")
        val qs = docs
          .filter(col("doc_id") % 97 === 0 && col("doc_id") < 10000000L)
          .select(
            col("doc_id").as("qid"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("qtext")
          )
        TextAnalysis
          .bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext", 5)
          .orderBy("qid", "rk")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf, MIN(len) AS len FROM (
             |    SELECT doc_id, len(tk) AS len, unnest(tk) AS term FROM tok) u
             |  GROUP BY 1, 2),
             |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |st AS (SELECT COUNT(*) AS n, SUM(len(tk)) AS sl FROM tok),
             |qt AS (SELECT DISTINCT doc_id AS qid, unnest(tk[1:5]) AS term
             |  FROM tok WHERE doc_id % 97 = 0 AND doc_id < 10000000),
             |contrib AS (SELECT qt.qid, tf.doc_id,
             |    CAST(round(ln(1.0 + (n - df + 0.5) / (df + 0.5))
             |      * (tf * (1.2 + 1.0))
             |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / (CAST(sl AS DOUBLE) / n))), 6)
             |      AS DECIMAL(28, 6)) AS c
             |  FROM qt JOIN tf USING (term) JOIN dfq USING (term) CROSS JOIN st),
             |sc AS (SELECT qid, doc_id, round(CAST(SUM(c) AS DOUBLE), 6) AS score
             |  FROM contrib GROUP BY 1, 2),
             |rk AS (SELECT qid, doc_id, score,
             |    CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INTEGER) AS rk
             |  FROM sc)
             |SELECT qid, rk, doc_id, score FROM rk WHERE rk <= 5 ORDER BY qid, rk""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Exact heavy hitters (Relational.heavyHitters): every token with
    // frequency > phi*N over the corpus token stream, WITHOUT shuffling
    // the full domain — a Misra-Gries candidate pass (fixed cap =
    // ceil(1/phi) counters, map-side merge; superset guaranteed under
    // any partitioning) followed by an exact isin-bounded recount. The
    // intermediate summary is partitioning-dependent but only its
    // superset guarantee is used, so the OUTPUT is exact — the oracle is
    // the plain GROUP BY ... HAVING the operator exists to avoid at
    // scale. Threshold compare is one IEEE double product (identical in
    // both engines).
    Q(
      "x115_heavy_hitters",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("term"))
        Relational
          .heavyHitters(toks, "term", 0.034)
          .orderBy(desc("cnt"), col("term"))
      },
      Some("""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
             |st AS (SELECT COUNT(term) AS n FROM tk)
             |SELECT term, COUNT(*) AS cnt FROM tk CROSS JOIN st
             |GROUP BY term, st.n HAVING COUNT(*) > 0.034 * n
             |ORDER BY cnt DESC, term""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Weighted sample without replacement (Scale.weightedSample):
    // Efraimidis-Spirakis as Gumbel-top-k — inclusion ∝ n_chars, noise
    // a hash of the id (exact power-of-two u, the x102 contract), so
    // the pick is deterministic, partitioning-invariant and replayable.
    // Selection plans as TakeOrderedAndProject, never a global sort.
    Q(
      "x116_weighted_sample",
      (s, d) =>
        Scale
          .weightedSample(t(s, d, "documents"), "doc_id", "n_chars", 150)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .orderBy("doc_id"),
      Some("""WITH ky AS (SELECT doc_id, source, n_chars,
             |    ln(CAST(n_chars AS DOUBLE)) + (-ln(-ln(
             |      (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15) AS BIGINT)
             |        // 256 AS DOUBLE) + 0.5) / 4503599627370496.0))) AS key
             |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
             |sel AS (SELECT doc_id, source, n_chars,
             |    row_number() OVER (ORDER BY key DESC, doc_id) AS r FROM ky)
             |SELECT doc_id, source, n_chars FROM sel WHERE r <= 150 ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Hybrid retrieval via reciprocal-rank fusion (Relational.rrfFuse,
    // Cormack 2009): the lexical BM25 top-10 (x114's fixed workload) and
    // the exact embedding top-10 (x104's brute-force shape — queries are
    // the same fixed ids) fuse by rank only: per (query, doc) score =
    // Σ 1/(60 + rank), reciprocals rounded to 9 dp and summed as DECIMAL
    // (order-independent), final rank by (score DESC, doc). A doc on one
    // list only carries that list's contribution — embeddings cover
    // fewer ids than documents at sf0.1, so lexical-only qids exercise
    // exactly that path. The oracle replays both retrievals end to end
    // and the fusion arithmetic.
    Q(
      "x117_rrf_fusion",
      (s, d) => {
        val docs = t(s, d, "documents")
        val e = t(s, d, "embeddings")
        val qs = docs
          .filter(col("doc_id") % 97 === 0 && col("doc_id") < 10000000L)
          .select(
            col("doc_id").as("qid"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("qtext")
          )
        val lex = TextAnalysis
          .bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext", 10)
          .select(col("qid"), col("doc_id").as("did"), col("rk").as("rank"))
        val qv = e.filter(col("vec_id") % 97 === 0 && col("vec_id") < 10000000L)
        val sem = Similarity
          .bruteForceTopK(qv, e, "vec_id", "embedding", 10)
          .select(col("qid"), col("cid").as("did"), col("rn").as("rank"))
        Relational.rrfFuse(Seq(lex, sem), "qid", "did", "rank", 10).orderBy("qid", "rn")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf, MIN(len) AS len FROM (
             |    SELECT doc_id, len(tk) AS len, unnest(tk) AS term FROM tok) u
             |  GROUP BY 1, 2),
             |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |st AS (SELECT COUNT(*) AS n, SUM(len(tk)) AS sl FROM tok),
             |qt AS (SELECT DISTINCT doc_id AS qid, unnest(tk[1:5]) AS term
             |  FROM tok WHERE doc_id % 97 = 0 AND doc_id < 10000000),
             |contrib AS (SELECT qt.qid, tf.doc_id,
             |    CAST(round(ln(1.0 + (n - df + 0.5) / (df + 0.5))
             |      * (tf * (1.2 + 1.0))
             |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / (CAST(sl AS DOUBLE) / n))), 6)
             |      AS DECIMAL(28, 6)) AS c
             |  FROM qt JOIN tf USING (term) JOIN dfq USING (term) CROSS JOIN st),
             |sc AS (SELECT qid, doc_id, round(CAST(SUM(c) AS DOUBLE), 6) AS score
             |  FROM contrib GROUP BY 1, 2),
             |lrk AS (SELECT qid, doc_id AS did,
             |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
             |  FROM sc),
             |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |bs AS (SELECT q.vec_id AS qid, c.vec_id AS did,
             |  round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
             |  FROM e q JOIN e c ON q.vec_id != c.vec_id
             |  WHERE q.vec_id % 97 = 0 AND q.vec_id < 10000000),
             |srk AS (SELECT qid, did,
             |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rnk
             |  FROM bs),
             |u AS (SELECT qid, did, CAST(round(1.0 / (60 + rnk), 9) AS DECIMAL(28, 9)) AS c
             |    FROM lrk WHERE rnk <= 10
             |  UNION ALL
             |  SELECT qid, did, CAST(round(1.0 / (60 + rnk), 9) AS DECIMAL(28, 9)) AS c
             |    FROM srk WHERE rnk <= 10),
             |f AS (SELECT qid, did, SUM(c) AS s FROM u GROUP BY 1, 2),
             |r AS (SELECT qid, did, s,
             |    CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, did) AS INTEGER) AS rn
             |  FROM f)
             |SELECT qid, rn, did, round(CAST(s AS DOUBLE), 9) AS rrf_score
             |FROM r WHERE rn <= 10 ORDER BY qid, rn""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Threshold calibration sweep (TextAnalysis.calibrationSweep): the
    // learned x88 classifier scored against the x52 gopher-rule labels —
    // at which logit cut does the cheap linear model best reproduce the
    // rule filter? ONE corpus pass (2·|grid|+1 conditional aggregates
    // folded map-side), |grid| output rows. Scores are on the exact
    // 1/256 grid and thresholds on the 1/8 grid, so every >= compare is
    // bit-exact; each ratio is one correctly-rounded double division of
    // exact integers — the oracle replays score, labels and all counts.
    Q(
      "x118_calibration",
      (s, d) => {
        val docs = tw(s, d, "documents")
        val scored = TextAnalysis
          .scoreLinear(docs.select(col("doc_id"), col("text")), "text", qWeights, 17.0 / 256.0)
          .select(col("doc_id"), col("logit"))
        val labels = TextAnalysis
          .gopherFilter(docs, "doc_id", "text")
          .select(col("doc_id"), col("keep").as("label"))
        TextAnalysis
          .calibrationSweep(
            scored.join(labels, "doc_id"),
            "logit",
            "label",
            (-8 to 8).map(_ * 0.125)
          )
          .orderBy("threshold")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) AS h60 FROM toks),
             |sw AS (SELECT doc_id, (h60 // 2) % 64 AS bucket,
             |    CASE WHEN h60 % 2 = 1 THEN 1.0 ELSE -1.0 END AS sign FROM h),
             |dots AS (SELECT doc_id,
             |    SUM(sign * CAST((bucket * 37) % 101 - 50 AS DOUBLE) / 256.0) AS dot
             |  FROM sw GROUP BY 1),
             |sc AS (SELECT d.doc_id, COALESCE(dots.dot, 0) + 17.0/256.0 AS logit
             |  FROM documents d LEFT JOIN dots USING (doc_id)),
             |m AS (SELECT doc_id,
             |  string_split(text, ' ') AS tk,
             |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_raw,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |    / len(string_split(text, ' ')) AS dr_raw,
             |  len(list_filter(string_split(text, ' '),
             |    t -> t IN ('the', 'a', 'and', 'of', 'to'))) > 0 AS has_stop
             |  FROM documents),
             |lab AS (SELECT doc_id,
             |  (len(tk) >= 10 AND len(tk) <= 100000 AND mean_raw >= CAST(2.0 AS DOUBLE)
             |    AND mean_raw <= CAST(12.0 AS DOUBLE) AND dr_raw >= CAST(0.2 AS DOUBLE)
             |    AND has_stop) AS label FROM m),
             |j AS (SELECT logit, label FROM sc JOIN lab USING (doc_id)),
             |pos AS (SELECT CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos FROM j),
             |th AS (SELECT CAST(unnest([-1.0, -0.875, -0.75, -0.625, -0.5, -0.375, -0.25,
             |    -0.125, 0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0]) AS DOUBLE)
             |  AS threshold),
             |agg AS (SELECT threshold,
             |    CAST(SUM(CASE WHEN logit >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
             |    CAST(SUM(CASE WHEN logit >= threshold AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp
             |  FROM th CROSS JOIN j GROUP BY 1)
             |SELECT threshold, n_pred_pos, tp, n_pred_pos - tp AS fp, pos - tp AS fn,
             |  CASE WHEN n_pred_pos > 0 THEN round(CAST(tp AS DOUBLE) / n_pred_pos, 6) END AS "precision",
             |  CASE WHEN pos > 0 THEN round(CAST(tp AS DOUBLE) / pos, 6) END AS recall,
             |  CASE WHEN n_pred_pos + pos > 0
             |    THEN round(CAST(2 * tp AS DOUBLE) / (n_pred_pos + pos), 6) END AS f1
             |FROM agg CROSS JOIN pos ORDER BY threshold""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Domain-level curation (TextAnalysis.domainStats/domainFilter):
    // judge the SITE, not just the page — drop every doc whose domain
    // (synthetic URLs on the x72 convention; canonicalUrl lowercases the
    // host) has mean x88-classifier quality below the cut or sits on an
    // explicit blocklist. Per-row scores round to 6 dp and sum as
    // DECIMAL per domain (order-independent); the mean is one double
    // division. The oracle replays URL → domain, the per-domain means,
    // the bad set and the anti-join.
    Q(
      "x119_domain_filter",
      (s, d) => {
        val dk = col("doc_id")
        val u = concat(
          lit("https://"), col("source"), lit("-"), (dk % 13).cast("string"),
          lit(".Example.com/"), col("lang"), lit("/"), dk.cast("string")
        )
        val docs = t(s, d, "documents").withColumn("url", u)
        val scored = TextAnalysis.scoreLinear(docs, "text", qWeights, 17.0 / 256.0)
        TextAnalysis
          .domainFilter(scored, "url", "logit", 0.0, blocked = Seq("src3-7.example.com"))
          .select(col("doc_id"), col("source"), col("lang"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) AS h60 FROM toks),
             |sw AS (SELECT doc_id, (h60 // 2) % 64 AS bucket,
             |    CASE WHEN h60 % 2 = 1 THEN 1.0 ELSE -1.0 END AS sign FROM h),
             |dots AS (SELECT doc_id,
             |    SUM(sign * CAST((bucket * 37) % 101 - 50 AS DOUBLE) / 256.0) AS dot
             |  FROM sw GROUP BY 1),
             |sc AS (SELECT d.doc_id, d.source, d.lang,
             |    d.source || '-' || CAST(d.doc_id % 13 AS VARCHAR) || '.example.com' AS dom,
             |    COALESCE(dots.dot, 0) + 17.0/256.0 AS logit
             |  FROM documents d LEFT JOIN dots USING (doc_id)),
             |ds AS (SELECT dom,
             |    CAST(SUM(CAST(round(logit, 6) AS DECIMAL(28, 6))) AS DOUBLE)
             |      / COUNT(*) AS mean_score
             |  FROM sc GROUP BY 1),
             |bad AS (SELECT dom FROM ds WHERE mean_score < 0.0
             |  UNION SELECT 'src3-7.example.com')
             |SELECT doc_id, source, lang FROM sc
             |WHERE dom NOT IN (SELECT dom FROM bad) ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Corpus distribution drift (TextAnalysis.corpusDivergence):
    // smoothed KL divergence in both directions between src0 and the
    // rest over 1024 hashed unigram buckets — the mixture-monitoring
    // primitive. Log-ratios are sums of integer-argument lns snapped to
    // the 2⁻²⁰ dyadic grid (the x102 contract); per-bucket contributions
    // round to 9 dp and sum as DECIMAL, so the one output row is exactly
    // replayable.
    Q(
      "x120_corpus_kl",
      (s, d) => {
        val docs = t(s, d, "documents")
        TextAnalysis.corpusDivergence(
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"),
          "text",
          1024
        )
      },
      Some("""WITH ta AS (SELECT (CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) // 2) % 1024 AS b
             |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents
             |        WHERE source = 'src0') u),
             |tb AS (SELECT (CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) // 2) % 1024 AS b
             |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents
             |        WHERE source != 'src0') u),
             |ca AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM ta GROUP BY 1),
             |cb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tb GROUP BY 1),
             |g AS (SELECT unnest(range(0, 1024)) AS b),
             |j AS (SELECT g.b, COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
             |  FROM g LEFT JOIN ca ON ca.b = g.b LEFT JOIN cb ON cb.b = g.b),
             |tt AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta, CAST(SUM(cb) AS BIGINT) AS tb FROM j),
             |k AS (SELECT MIN(ta) AS tot_a, MIN(tb) AS tot_b,
             |  SUM(CAST(round(((ca + 1.0) / (ta + 1024.0)) *
             |    (floor((ln(ca + 1.0) - ln(cb + 1.0) + ln(tb + 1024.0) - ln(ta + 1024.0))
             |      * 1048576.0) / 1048576.0), 9) AS DECIMAL(28, 9))) AS kab,
             |  SUM(CAST(round(((cb + 1.0) / (tb + 1024.0)) *
             |    (floor((ln(cb + 1.0) - ln(ca + 1.0) + ln(ta + 1024.0) - ln(tb + 1024.0))
             |      * 1048576.0) / 1048576.0), 9) AS DECIMAL(28, 9))) AS kba
             |  FROM j CROSS JOIN tt)
             |SELECT tot_a, tot_b, round(CAST(kab AS DOUBLE), 6) AS kl_ab,
             |  round(CAST(kba AS DOUBLE), 6) AS kl_ba FROM k""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // CCNet/FineWeb-style corpus bucketing (TextAnalysis.scoreBuckets):
    // head/middle/tail by corpus-level score terciles — here the exact-
    // grid x88 logit, so every `<= boundary` compare is wobble-free. The
    // exact=true boundary is Spark's `percentile` formula —
    // pos = f·(n−1), (⌈pos⌉−pos)·v[⌊pos⌋] + (pos−⌊pos⌋)·v[⌈pos⌉] over
    // the sorted values, lower value when the neighbors are equal — every
    // step a correctly-rounded double op, replayed verbatim by the
    // oracle on the same sorted list (at 100 TB the default sketch
    // boundaries apply instead, same facade as B17).
    Q(
      "x121_score_buckets",
      (s, d) => {
        val docs = tw(s, d, "documents")
        val scored = TextAnalysis
          .scoreLinear(docs.select(col("doc_id"), col("text")), "text", qWeights, 17.0 / 256.0)
          .select(col("doc_id"), col("logit"))
        TextAnalysis
          .scoreBuckets(scored, "logit", exact = true)
          .select(col("doc_id"), col("logit"), col("bucket"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) AS h60 FROM toks),
             |sw AS (SELECT doc_id, (h60 // 2) % 64 AS bucket,
             |    CASE WHEN h60 % 2 = 1 THEN 1.0 ELSE -1.0 END AS sign FROM h),
             |dots AS (SELECT doc_id,
             |    SUM(sign * CAST((bucket * 37) % 101 - 50 AS DOUBLE) / 256.0) AS dot
             |  FROM sw GROUP BY 1),
             |sc AS (SELECT d.doc_id, COALESCE(dots.dot, 0) + 17.0/256.0 AS logit
             |  FROM documents d LEFT JOIN dots USING (doc_id)),
             |vs AS (SELECT list_sort(list(logit)) AS v, COUNT(*) AS n FROM sc),
             |ps AS (SELECT v, CAST(1 AS DOUBLE) / 3 * (n - 1) AS p1,
             |    CAST(2 AS DOUBLE) / 3 * (n - 1) AS p2 FROM vs),
             |bd AS (SELECT
             |  CASE WHEN ceil(p1) = floor(p1)
             |      OR v[CAST(floor(p1) AS BIGINT) + 1] = v[CAST(ceil(p1) AS BIGINT) + 1]
             |    THEN v[CAST(floor(p1) AS BIGINT) + 1]
             |    ELSE (ceil(p1) - p1) * v[CAST(floor(p1) AS BIGINT) + 1]
             |      + (p1 - floor(p1)) * v[CAST(ceil(p1) AS BIGINT) + 1] END AS blo,
             |  CASE WHEN ceil(p2) = floor(p2)
             |      OR v[CAST(floor(p2) AS BIGINT) + 1] = v[CAST(ceil(p2) AS BIGINT) + 1]
             |    THEN v[CAST(floor(p2) AS BIGINT) + 1]
             |    ELSE (ceil(p2) - p2) * v[CAST(floor(p2) AS BIGINT) + 1]
             |      + (p2 - floor(p2)) * v[CAST(ceil(p2) AS BIGINT) + 1] END AS bhi
             |  FROM ps)
             |SELECT doc_id, logit,
             |  CASE WHEN logit <= blo THEN 'head' WHEN logit <= bhi THEN 'middle'
             |    ELSE 'tail' END AS bucket
             |FROM sc CROSS JOIN bd ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Token-budgeted quality selection (Scale.selectByBudget): "the best
    // 15k tokens" — walk docs in (x88 logit DESC, id) order, keep while
    // the inclusive token cumsum fits. The ENGINE never sorts globally
    // (per-score histogram → driver threshold → filter + one boundary-
    // layer window); the oracle proves the semantics equal the plain
    // windowed-cumsum prefix it avoids at scale.
    Q(
      "x122_budget_select",
      (s, d) => {
        val docs = tw(s, d, "documents")
        val base = TextAnalysis
          .scoreLinear(docs.select(col("doc_id"), col("text")), "text", qWeights, 17.0 / 256.0)
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        Scale
          .selectByBudget(base, "doc_id", "logit", "n_tokens", 15000L, materializeInput = true)
          .select(col("doc_id"), col("logit"), col("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) AS h60 FROM toks),
             |sw AS (SELECT doc_id, (h60 // 2) % 64 AS bucket,
             |    CASE WHEN h60 % 2 = 1 THEN 1.0 ELSE -1.0 END AS sign FROM h),
             |dots AS (SELECT doc_id,
             |    SUM(sign * CAST((bucket * 37) % 101 - 50 AS DOUBLE) / 256.0) AS dot
             |  FROM sw GROUP BY 1),
             |sc AS (SELECT d.doc_id, COALESCE(dots.dot, 0) + 17.0/256.0 AS logit,
             |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents d LEFT JOIN dots USING (doc_id)),
             |c AS (SELECT doc_id, logit, n_tokens,
             |    SUM(n_tokens) OVER (ORDER BY logit DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM sc WHERE n_tokens > 0)
             |SELECT doc_id, logit, n_tokens FROM c WHERE cum <= 15000
             |ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Incremental SemDeDup (Similarity.incrementalSemDedup): x111's
    // semantic dedup in the continuous-ingestion shape — the accepted
    // corpus is ONLY its persisted (id, vec, cell) semIndex; the batch
    // assigns to the SAME frozen centroids (iters=0 seeds from the
    // index's first √N ids — replayable), confirms within-cell cosines
    // against the index, then self-dedups. Planted truth inside the
    // query: %9 index vectors re-enter the batch scaled by 2.0f (exact
    // in float → same cell, cosine 1.0 → index hit) and %7 batch rows
    // re-enter verbatim at id+2e9 (within-batch d2 drop). The oracle
    // replays seeding, both assignments, both confirm joins and the
    // anti-join.
    Q(
      "x123_incr_semdedup",
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding").as("v"))
        val idx0 = e.filter(col("vec_id") % 3 === 0)
        val nl = math.max(1L, math.floor(math.sqrt(idx0.count().toDouble)).toLong).toInt
        val cen = Similarity
          .kmeansFit(idx0, "vec_id", "v", nl, iters = 0)
          .select(col("cen_id").as("vec_id"), col("cen_v").as("v"))
        val index = Similarity.semIndex(idx0, "vec_id", "v", cen)
        val batchRaw = e.filter(col("vec_id") % 3 =!= 0)
        val plantedIdx = idx0
          .filter(col("vec_id") % 9 === 0)
          .select(
            (col("vec_id") + lit(1000000000L)).as("vec_id"),
            transform(col("v"), x => x * lit(2.0f)).as("v")
          )
        val dupInBatch = batchRaw
          .filter(col("vec_id") % 7 === 1)
          .select((col("vec_id") + lit(2000000000L)).as("vec_id"), col("v"))
        val batch = batchRaw.union(plantedIdx).union(dupInBatch)
        Similarity
          .incrementalSemDedup(batch, index, cen, "vec_id", "v", 0.95)
          .select(col("vec_id"))
          .orderBy("vec_id")
      },
      Some("""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |idx AS MATERIALIZED (SELECT vec_id, v FROM base WHERE vec_id % 3 = 0),
             |nl AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS nlist FROM idx),
             |cen AS MATERIALIZED (SELECT rk - 1 AS cen_id, cv FROM (
             |    SELECT v AS cv, row_number() OVER (ORDER BY vec_id) AS rk FROM idx) t, nl
             |  WHERE rk <= nlist),
             |bat AS MATERIALIZED (
             |  SELECT vec_id, v FROM base WHERE vec_id % 3 != 0
             |  UNION ALL
             |  SELECT vec_id + 1000000000, list_transform(v, x -> x * 2.0)
             |  FROM idx WHERE vec_id % 9 = 0
             |  UNION ALL
             |  SELECT vec_id + 2000000000, v FROM base
             |  WHERE vec_id % 3 != 0 AND vec_id % 7 = 1),
             |iasg AS MATERIALIZED (SELECT vec_id, cell FROM (
             |  SELECT i.vec_id, cen.cen_id AS cell,
             |    row_number() OVER (PARTITION BY i.vec_id ORDER BY
             |      round(list_dot_product(i.v, cen.cv)
             |        / (sqrt(list_dot_product(i.v, i.v))
             |           * sqrt(list_dot_product(cen.cv, cen.cv))), 6) DESC, cen.cen_id) AS r
             |  FROM idx i CROSS JOIN cen) t WHERE r = 1),
             |basg AS MATERIALIZED (SELECT vec_id, cell FROM (
             |  SELECT b.vec_id, cen.cen_id AS cell,
             |    row_number() OVER (PARTITION BY b.vec_id ORDER BY
             |      round(list_dot_product(b.v, cen.cv)
             |        / (sqrt(list_dot_product(b.v, b.v))
             |           * sqrt(list_dot_product(cen.cv, cen.cv))), 6) DESC, cen.cen_id) AS r
             |  FROM bat b CROSS JOIN cen) t WHERE r = 1),
             |idrops AS (SELECT DISTINCT b.vec_id
             |  FROM basg b JOIN iasg i ON b.cell = i.cell
             |  JOIN bat q ON q.vec_id = b.vec_id JOIN idx c ON c.vec_id = i.vec_id
             |  WHERE round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.95),
             |sdrops AS (SELECT DISTINCT b2.vec_id
             |  FROM basg b1 JOIN basg b2 ON b1.cell = b2.cell AND b1.vec_id < b2.vec_id
             |  JOIN bat q ON q.vec_id = b1.vec_id JOIN bat c ON c.vec_id = b2.vec_id
             |  WHERE round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.95)
             |SELECT vec_id FROM bat
             |WHERE vec_id NOT IN (SELECT vec_id FROM idrops)
             |  AND vec_id NOT IN (SELECT vec_id FROM sdrops)
             |ORDER BY vec_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Incremental-SemDeDup drop LEDGER (incrementalSemDedupAudit): the
    // x112 provenance shape for the semantic path — one row per
    // (dropped doc, reason ∈ {index, batch}) with the smallest
    // qualifying partner. Same corpus construction as x123; the oracle
    // replays the evidence joins and the min(partner) aggregation.
    Q(
      "x124_incr_sem_ledger",
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding").as("v"))
        val idx0 = e.filter(col("vec_id") % 3 === 0)
        val nl = math.max(1L, math.floor(math.sqrt(idx0.count().toDouble)).toLong).toInt
        val cen = Similarity
          .kmeansFit(idx0, "vec_id", "v", nl, iters = 0)
          .select(col("cen_id").as("vec_id"), col("cen_v").as("v"))
        val index = Similarity.semIndex(idx0, "vec_id", "v", cen)
        val batchRaw = e.filter(col("vec_id") % 3 =!= 0)
        val plantedIdx = idx0
          .filter(col("vec_id") % 9 === 0)
          .select(
            (col("vec_id") + lit(1000000000L)).as("vec_id"),
            transform(col("v"), x => x * lit(2.0f)).as("v")
          )
        val dupInBatch = batchRaw
          .filter(col("vec_id") % 7 === 1)
          .select((col("vec_id") + lit(2000000000L)).as("vec_id"), col("v"))
        val batch = batchRaw.union(plantedIdx).union(dupInBatch)
        Similarity
          .incrementalSemDedupAudit(batch, index, cen, "vec_id", "v", 0.95)
          .orderBy("vec_id", "reason")
      },
      Some("""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |idx AS MATERIALIZED (SELECT vec_id, v FROM base WHERE vec_id % 3 = 0),
             |nl AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS nlist FROM idx),
             |cen AS MATERIALIZED (SELECT rk - 1 AS cen_id, cv FROM (
             |    SELECT v AS cv, row_number() OVER (ORDER BY vec_id) AS rk FROM idx) t, nl
             |  WHERE rk <= nlist),
             |bat AS MATERIALIZED (
             |  SELECT vec_id, v FROM base WHERE vec_id % 3 != 0
             |  UNION ALL
             |  SELECT vec_id + 1000000000, list_transform(v, x -> x * 2.0)
             |  FROM idx WHERE vec_id % 9 = 0
             |  UNION ALL
             |  SELECT vec_id + 2000000000, v FROM base
             |  WHERE vec_id % 3 != 0 AND vec_id % 7 = 1),
             |iasg AS MATERIALIZED (SELECT vec_id, cell FROM (
             |  SELECT i.vec_id, cen.cen_id AS cell,
             |    row_number() OVER (PARTITION BY i.vec_id ORDER BY
             |      round(list_dot_product(i.v, cen.cv)
             |        / (sqrt(list_dot_product(i.v, i.v))
             |           * sqrt(list_dot_product(cen.cv, cen.cv))), 6) DESC, cen.cen_id) AS r
             |  FROM idx i CROSS JOIN cen) t WHERE r = 1),
             |basg AS MATERIALIZED (SELECT vec_id, cell FROM (
             |  SELECT b.vec_id, cen.cen_id AS cell,
             |    row_number() OVER (PARTITION BY b.vec_id ORDER BY
             |      round(list_dot_product(b.v, cen.cv)
             |        / (sqrt(list_dot_product(b.v, b.v))
             |           * sqrt(list_dot_product(cen.cv, cen.cv))), 6) DESC, cen.cen_id) AS r
             |  FROM bat b CROSS JOIN cen) t WHERE r = 1),
             |iev AS (SELECT b.vec_id AS did, i.vec_id AS partner
             |  FROM basg b JOIN iasg i ON b.cell = i.cell
             |  JOIN bat q ON q.vec_id = b.vec_id JOIN idx c ON c.vec_id = i.vec_id
             |  WHERE round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.95),
             |sev AS (SELECT b2.vec_id AS did, b1.vec_id AS partner
             |  FROM basg b1 JOIN basg b2 ON b1.cell = b2.cell AND b1.vec_id < b2.vec_id
             |  JOIN bat q ON q.vec_id = b1.vec_id JOIN bat c ON c.vec_id = b2.vec_id
             |  WHERE round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.95)
             |SELECT did AS vec_id, reason, partner FROM (
             |  SELECT did, 'index' AS reason, MIN(partner) AS partner FROM iev GROUP BY 1
             |  UNION ALL
             |  SELECT did, 'batch' AS reason, MIN(partner) AS partner FROM sev GROUP BY 1)
             |ORDER BY vec_id, reason""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Matryoshka truncation audit (Similarity.truncateDims + recallAtK):
    // recall@5 of the 16-dim PREFIX ranking against the full 64-dim
    // exact ranking over the fixed x104 query workload — the
    // measurement that justifies (or vetoes) shrinking an embedding
    // index 4x. Both rankings are deterministic brute-force top-k, so
    // the oracle recomputes both sides from list slices.
    Q(
      "x125_mrl_recall",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qs = (df: org.apache.spark.sql.DataFrame) =>
          df.filter(col("vec_id") < 10000000L && col("vec_id") % 10 === 0)
        val trunc = Similarity.truncateDims(e, "embedding", 16)
        val approx = Similarity.bruteForceTopK(qs(trunc), trunc, "vec_id", "embedding", 5)
        val exact = Similarity.bruteForceTopK(qs(e), e, "vec_id", "embedding", 5)
        Similarity.recallAtK(approx, exact, 5).orderBy("qid")
      },
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             |    CAST(embedding[1:16] AS DOUBLE[]) AS t FROM embeddings),
             |asims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |  round(list_dot_product(q.t, c.t)
             |    / (sqrt(list_dot_product(q.t, q.t)) * sqrt(list_dot_product(c.t, c.t))), 6) AS sim
             |  FROM e q JOIN e c ON q.vec_id != c.vec_id
             |  WHERE q.vec_id < 10000000 AND q.vec_id % 10 = 0),
             |ark AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid,
             |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
             |  FROM asims) t WHERE rn <= 5),
             |bsims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |  round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
             |  FROM e q JOIN e c ON q.vec_id != c.vec_id
             |  WHERE q.vec_id < 10000000 AND q.vec_id % 10 = 0),
             |brk AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid,
             |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
             |  FROM bsims) t WHERE rn <= 5),
             |hits AS (SELECT ark.qid, CAST(count(*) AS BIGINT) AS n_hit
             |  FROM ark JOIN brk ON ark.qid = brk.qid AND ark.cid = brk.cid GROUP BY 1),
             |base AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_exact FROM brk GROUP BY 1)
             |SELECT base.qid, COALESCE(hits.n_hit, 0) AS n_hit, base.n_exact,
             |  round(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / base.n_exact, 6) AS recall
             |FROM base LEFT JOIN hits ON hits.qid = base.qid
             |ORDER BY base.qid""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Per-domain statistics surface (TextAnalysis.domainStats): the
    // dashboard behind x119's filter — doc count and decimal-exact mean
    // quality per domain, the frame an operator inspects before picking
    // the domainFilter cut. Same URL synthesis and x88 score as x119.
    Q(
      "x126_domain_stats",
      (s, d) => {
        val dk = col("doc_id")
        val u = concat(
          lit("https://"), col("source"), lit("-"), (dk % 13).cast("string"),
          lit(".Example.com/"), col("lang"), lit("/"), dk.cast("string")
        )
        val docs = tw(s, d, "documents").withColumn("url", u)
        val scored = TextAnalysis.scoreLinear(docs, "text", qWeights, 17.0 / 256.0)
        TextAnalysis.domainStats(scored, "url", "logit").orderBy("domain")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) AS h60 FROM toks),
             |sw AS (SELECT doc_id, (h60 // 2) % 64 AS bucket,
             |    CASE WHEN h60 % 2 = 1 THEN 1.0 ELSE -1.0 END AS sign FROM h),
             |dots AS (SELECT doc_id,
             |    SUM(sign * CAST((bucket * 37) % 101 - 50 AS DOUBLE) / 256.0) AS dot
             |  FROM sw GROUP BY 1),
             |sc AS (SELECT d.doc_id,
             |    d.source || '-' || CAST(d.doc_id % 13 AS VARCHAR) || '.example.com' AS domain,
             |    COALESCE(dots.dot, 0) + 17.0/256.0 AS logit
             |  FROM documents d LEFT JOIN dots USING (doc_id))
             |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(CAST(round(logit, 6) AS DECIMAL(28, 6))) AS DOUBLE)
             |    / COUNT(*) AS mean_score
             |FROM sc GROUP BY 1 ORDER BY domain""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // IN-ENGINE classifier TRAINING (TextAnalysis.trainLinear): the
    // fourth side of the quality loop — score (x88) / calibrate (x118) /
    // select (x121/x122) consumed literal weights until now; here the
    // weights are FITTED over hashedTf features by full-batch gradient
    // descent on the hard-sigmoid logistic surrogate, in exact integer
    // arithmetic (weights on the 2^-20 grid, 128-bit gradient sums), so
    // the oracle replays the ENTIRE training loop step by step in SQL
    // (hugeint sums) and lands on bit-identical weight numerators.
    // Labels: the planted text signal "contains 'vector'" (76% base
    // rate) — content-derived, SQL-expressible, and genuinely learnable
    // (bucket 55 carries the word collision-free at dim=64).
    Q(
      "x127_train_weights",
      (s, d) =>
        TextAnalysis
          .trainLinearWeights(
            t(s, d, "documents")
              .select(
                col("doc_id"),
                col("text"),
                when(col("text").contains("vector"), lit(1L)).otherwise(lit(0L)).as("label")
              ),
            "doc_id", "text", "label",
            dim = 64, steps = TrainSteps, lrShift = 4, scaleShift = 20
          )
          .orderBy("bucket"),
      Some(
        s"""$trainLinearSqlPrefix
           |SELECT bucket, wn AS w_num, CAST(wn AS DOUBLE) / 1048576.0 AS weight
           |FROM w$TrainSteps ORDER BY bucket""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Trained weights feed scoreLinearSparse UNCHANGED — the composition
    // the trainer exists for: fit on the corpus, then score every doc
    // with the fitted frame (same dyadic-grid exactness argument as
    // x88/x89, now with LEARNED weights). The oracle chains the full
    // training replay into the scoring join, so a single hash row pins
    // train → score end-to-end.
    Q(
      "x128_train_score",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextAnalysis.trainLinear(
          docs.select(
            col("doc_id"),
            col("text"),
            when(col("text").contains("vector"), lit(1L)).otherwise(lit(0L)).as("label")
          ),
          "doc_id", "text", "label",
          dim = 64, steps = TrainSteps, lrShift = 4, scaleShift = 20
        )
        TextAnalysis
          .scoreLinearSparse(
            docs, "doc_id", "text",
            model.frame(s).filter(col("bucket") >= 0), dim = 64, bias = model.bias
          )
          .orderBy("doc_id")
      },
      Some(
        s"""$trainLinearSqlPrefix,
           |wgt AS (SELECT bucket, CAST(wn AS DOUBLE) / 1048576.0 AS weight
           |  FROM w$TrainSteps WHERE bucket >= 0),
           |bias AS (SELECT CAST(wn AS DOUBLE) / 1048576.0 AS b
           |  FROM w$TrainSteps WHERE bucket = -1),
           |dots AS (SELECT tf.doc_id, SUM(tf.x * wgt.weight) AS dot
           |  FROM tf JOIN wgt USING (bucket) GROUP BY 1)
           |SELECT d.doc_id,
           |  COALESCE(dots.dot, 0) + (SELECT b FROM bias) AS logit,
           |  COALESCE(dots.dot, 0) + (SELECT b FROM bias) >= 0 AS keep
           |FROM documents d LEFT JOIN dots USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Matryoshka two-stage retrieval (Similarity.matryoshkaTopK): the
    // CONSUMER of x125's prefix-recall audit — candidate volume scored
    // on 16 of 64 dims (1/4 the flops/bytes), then ONLY the per-query
    // top-20 sliver reranked at full dimension. The oracle replays both
    // stages (prefix ranking, sliver fetch, exact rerank) including the
    // 6-dp rounding and cid tie-breaks, so the hash pins the funnel
    // end-to-end. Fixed query workload (vec_id < 1e7, %10) keeps engine
    // and oracle O(N·Q) under the key-shifted sf10 amplifier.
    Q(
      "x129_mrl_rerank",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val qs = e.filter(col("vec_id") < 10000000L && col("vec_id") % 10 === 0)
        Similarity
          .matryoshkaTopK(qs, e, "vec_id", "embedding", k = 5, prefixDim = 16, rerank = 20)
          .select(col("qid"), col("cid"), col("sim"), col("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             |    CAST(embedding[1:16] AS DOUBLE[]) AS t FROM embeddings),
             |asims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |  round(list_dot_product(q.t, c.t)
             |    / (sqrt(list_dot_product(q.t, q.t)) * sqrt(list_dot_product(c.t, c.t))), 6) AS sim
             |  FROM e q JOIN e c ON q.vec_id != c.vec_id
             |  WHERE q.vec_id < 10000000 AND q.vec_id % 10 = 0),
             |sliver AS MATERIALIZED (SELECT qid, cid FROM (SELECT qid, cid,
             |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
             |  FROM asims) t WHERE rn <= 20),
             |fsims AS (SELECT s.qid, s.cid,
             |  round(list_dot_product(q.v, c.v)
             |    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
             |  FROM sliver s JOIN e q ON q.vec_id = s.qid JOIN e c ON c.vec_id = s.cid)
             |SELECT qid, cid, sim, rn FROM (SELECT qid, cid, sim,
             |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rn
             |  FROM fsims) t
             |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // DoReMi-style mixture optimization (Scale.doremiMix): completes the
    // mixture toolkit — temperatureMix/resampleToMix SET rates from
    // counts; this LEARNS them from per-domain excess loss (x126's
    // domain synthesis, x88's classifier as the loss signal, x120's
    // KL-adjacent goal). Four multiplicative-weights rounds with the
    // linearized (1+η·excess) update, every value snapped to the 2^-20
    // dyadic grid so the mixture sums are exact and order-independent —
    // the oracle replays the entire loop (decimal-exact domain means,
    // floor-snaps, the moving mixture mean, normalization) in SQL.
    Q(
      "x130_doremi_mix",
      (s, d) => {
        val dk = col("doc_id")
        val u = concat(
          lit("https://"), col("source"), lit("-"), (dk % 13).cast("string"),
          lit(".Example.com/"), col("lang"), lit("/"), dk.cast("string")
        )
        val docs = t(s, d, "documents").withColumn("url", u)
        val scored = TextAnalysis
          .scoreLinear(docs, "text", qWeights, 17.0 / 256.0)
          .withColumn("domain", TextAnalysis.urlDomain(col("url")))
          .withColumn("loss", -col("logit")) // high loss = low quality -> upweighted
        Scale.doremiMix(scored, "domain", "loss", steps = 4).orderBy("domain")
      },
      Some {
        val steps = (1 to 4).map { t =>
          val p = t - 1
          s"""mm$t AS (SELECT SUM(a.a * l.l) / SUM(a.a) AS m
             |  FROM a$p a JOIN l USING (domain)),
             |a$t AS (SELECT l.domain,
             |    floor(a.a * GREATEST(0.0, 1.0 + 0.25 * (l.l - (SELECT m FROM mm$t)))
             |      * 1048576.0) / 1048576.0 AS a
             |  FROM a$p a JOIN l USING (domain))""".stripMargin
        }.mkString(",\n")
        s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) AS h60 FROM toks),
           |sw AS (SELECT doc_id, (h60 // 2) % 64 AS bucket,
           |    CASE WHEN h60 % 2 = 1 THEN 1.0 ELSE -1.0 END AS sign FROM h),
           |dots AS (SELECT doc_id,
           |    SUM(sign * CAST((bucket * 37) % 101 - 50 AS DOUBLE) / 256.0) AS dot
           |  FROM sw GROUP BY 1),
           |sc AS (SELECT d.doc_id,
           |    d.source || '-' || CAST(d.doc_id % 13 AS VARCHAR) || '.example.com' AS domain,
           |    -(COALESCE(dots.dot, 0) + 17.0/256.0) AS loss
           |  FROM documents d LEFT JOIN dots USING (doc_id)),
           |st AS MATERIALIZED (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n,
           |    SUM(CAST(round(loss, 6) AS DECIMAL(28, 6))) AS s
           |  FROM sc GROUP BY 1),
           |l AS MATERIALIZED (SELECT domain,
           |    floor((CAST(s AS DOUBLE) / n) * 1048576.0) / 1048576.0 AS l FROM st),
           |a0 AS (SELECT domain, 1.0 AS a FROM l),
           |$steps
           |SELECT st.domain, st.n AS n_docs,
           |  CAST(st.s AS DOUBLE) / st.n AS mean_loss,
           |  a4.a / (SELECT SUM(a) FROM a4) AS weight
           |FROM st JOIN a4 USING (domain)
           |ORDER BY st.domain""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // Sparse-gradient trainer (TextAnalysis.trainLinearSparse): the SAME
    // exact integer GD loop as x127 — identical margins, residuals, and
    // truncating updates — but the feature pass stays nnz-proportional
    // (sparse entry arrays + one bucket-keyed decimal gradient aggregate
    // per step) instead of materializing a dense (dim+1)-long vector per
    // doc. Bit-identical weights by construction, so the oracle IS x127's
    // full training replay: one hash row pins the sparse path to the same
    // SQL-replayed truth as the dense path, at every SF.
    Q(
      "x131_train_sparse",
      (s, d) =>
        TextAnalysis
          .trainLinearSparseWeights(
            tw(s, d, "documents")
              .select(
                col("doc_id"),
                col("text"),
                when(col("text").contains("vector"), lit(1L)).otherwise(lit(0L)).as("label")
              ),
            "doc_id", "text", "label",
            dim = 64, steps = TrainSteps, lrShift = 4, scaleShift = 20
          )
          .orderBy("bucket"),
      Some(
        s"""$trainLinearSqlPrefix
           |SELECT bucket, wn AS w_num, CAST(wn AS DOUBLE) / 1048576.0 AS weight
           |FROM w$TrainSteps ORDER BY bucket""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // doremiMix -> resampleToMix composition (the x128 optimize->apply
    // pattern, now for mixtures): the learned domain weights from x130's
    // multiplicative-weights loop feed the x61 resampling machinery
    // directly, so ONE hash row pins learn-weights -> downsample-corpus
    // end-to-end. Exactness chain: the α weights are dyadic-grid values
    // replayed bit-for-bit (x130), weight = α/Σα and the per-domain rate
    // (share·smax)/ng are correctly-rounded IEEE ops in a pinned
    // association (the x61 contract), and membership is the portable
    // md5 hash-bucket test — no RNG, no order dependence anywhere.
    Q(
      "x132_doremi_resample",
      (s, d) => {
        val dk = col("doc_id")
        val u = concat(
          lit("https://"), col("source"), lit("-"), (dk % 13).cast("string"),
          lit(".Example.com/"), col("lang"), lit("/"), dk.cast("string")
        )
        val docs = t(s, d, "documents").withColumn("url", u)
        // materialized once: doremiMix's stats collect AND the final
        // resample both consume the scored frame — without the checkpoint
        // each action re-runs the token-hash scoring pass (the oracle's
        // sc CTE is MATERIALIZED for the same reason)
        val scored = TextAnalysis
          .scoreLinear(docs, "text", qWeights, 17.0 / 256.0)
          .withColumn("domain", TextAnalysis.urlDomain(col("url")))
          .withColumn("loss", -col("logit"))
          .select(col("doc_id"), col("domain"), col("loss"))
          .localCheckpoint()
        val shares = Scale
          .doremiMix(scored, "domain", "loss", steps = 4)
          .select("domain", "weight")
          .collect() // bounded by doremiMix's maxGroups guard
          .map(r => r.getString(0) -> r.getDouble(1))
          .filter(_._2 > 0)
          .toMap
        Scale
          .resampleToMix(scored, Seq("doc_id"), "domain", shares)
          .select("doc_id", "domain")
          .orderBy("doc_id")
      },
      Some {
        val steps = (1 to 4).map { t =>
          val p = t - 1
          s"""mm$t AS (SELECT SUM(a.a * l.l) / SUM(a.a) AS m
             |  FROM a$p a JOIN l USING (domain)),
             |a$t AS (SELECT l.domain,
             |    floor(a.a * GREATEST(0.0, 1.0 + 0.25 * (l.l - (SELECT m FROM mm$t)))
             |      * 1048576.0) / 1048576.0 AS a
             |  FROM a$p a JOIN l USING (domain))""".stripMargin
        }.mkString(",\n")
        s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 18, 15) AS BIGINT) AS h60 FROM toks),
           |sw AS (SELECT doc_id, (h60 // 2) % 64 AS bucket,
           |    CASE WHEN h60 % 2 = 1 THEN 1.0 ELSE -1.0 END AS sign FROM h),
           |dots AS (SELECT doc_id,
           |    SUM(sign * CAST((bucket * 37) % 101 - 50 AS DOUBLE) / 256.0) AS dot
           |  FROM sw GROUP BY 1),
           |sc AS MATERIALIZED (SELECT d.doc_id,
           |    d.source || '-' || CAST(d.doc_id % 13 AS VARCHAR) || '.example.com' AS domain,
           |    -(COALESCE(dots.dot, 0) + 17.0/256.0) AS loss
           |  FROM documents d LEFT JOIN dots USING (doc_id)),
           |st AS MATERIALIZED (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n,
           |    SUM(CAST(round(loss, 6) AS DECIMAL(28, 6))) AS s
           |  FROM sc GROUP BY 1),
           |l AS MATERIALIZED (SELECT domain,
           |    floor((CAST(s AS DOUBLE) / n) * 1048576.0) / 1048576.0 AS l FROM st),
           |a0 AS (SELECT domain, 1.0 AS a FROM l),
           |$steps,
           |wts AS (SELECT domain, a / (SELECT SUM(a) FROM a4) AS share
           |  FROM a4 WHERE a > 0),
           |j AS (SELECT st.domain, CAST(st.n AS DOUBLE) AS ng, wts.share,
           |    CAST(st.n AS DOUBLE) / wts.share AS demand
           |  FROM st JOIN wts USING (domain)),
           |smax AS (SELECT min(demand) AS smax FROM j),
           |r AS (SELECT domain, share * smax / ng AS rate FROM j CROSS JOIN smax)
           |SELECT sc.doc_id, sc.domain
           |FROM sc JOIN r USING (domain)
           |WHERE CAST('0x' || substr(md5(CAST(sc.doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000
           |      < rate * 1000
           |ORDER BY sc.doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // The FULLY-LEARNED curation chain in one hash row: train the
    // classifier (x127), score every doc with the trained weights
    // (x128), learn domain-mixture weights from the trained losses
    // (x130's loop over LEARNED losses instead of fixed-weight ones),
    // and resample the corpus to the learned mixture (x132's apply
    // step). Exactness stacks the three proven contracts: integer-exact
    // training -> dyadic-grid logits (common denominator 2^scaleShift,
    // sums exact) -> grid-snapped mixture loop -> pinned-association
    // rates + md5 membership. The oracle replays all four stages in one
    // SQL chain.
    Q(
      "x133_train_mix",
      (s, d) => {
        val dk = col("doc_id")
        val u = concat(
          lit("https://"), col("source"), lit("-"), (dk % 13).cast("string"),
          lit(".Example.com/"), col("lang"), lit("/"), dk.cast("string")
        )
        val docs = t(s, d, "documents").withColumn("url", u)
        val model = TextAnalysis.trainLinear(
          docs.select(
            col("doc_id"),
            col("text"),
            when(col("text").contains("vector"), lit(1L)).otherwise(lit(0L)).as("label")
          ),
          "doc_id", "text", "label",
          dim = 64, steps = TrainSteps, lrShift = 4, scaleShift = 20
        )
        val scored = TextAnalysis.scoreLinearSparse(
          docs, "doc_id", "text",
          model.frame(s).filter(col("bucket") >= 0), dim = 64, bias = model.bias
        )
        // materialized once: the doremiMix stats collect AND the final
        // resample both consume this frame — without the checkpoint each
        // action re-runs the classifier scoring pass (the oracle's sc CTE
        // is MATERIALIZED for the same reason)
        val withDom = docs
          .select(col("doc_id"), TextAnalysis.urlDomain(col("url")).as("domain"))
          .join(scored.select(col("doc_id"), (-col("logit")).as("loss")), Seq("doc_id"))
          .localCheckpoint()
        val shares = Scale
          .doremiMix(withDom, "domain", "loss", steps = 4)
          .select("domain", "weight")
          .collect()
          .map(r => r.getString(0) -> r.getDouble(1))
          .filter(_._2 > 0)
          .toMap
        Scale
          .resampleToMix(withDom, Seq("doc_id"), "domain", shares)
          .select("doc_id", "domain")
          .orderBy("doc_id")
      },
      Some {
        val steps = (1 to 4).map { t =>
          val p = t - 1
          s"""mm$t AS (SELECT SUM(a.a * l.l) / SUM(a.a) AS m
             |  FROM a$p a JOIN l USING (domain)),
             |a$t AS (SELECT l.domain,
             |    floor(a.a * GREATEST(0.0, 1.0 + 0.25 * (l.l - (SELECT m FROM mm$t)))
             |      * 1048576.0) / 1048576.0 AS a
             |  FROM a$p a JOIN l USING (domain))""".stripMargin
        }.mkString(",\n")
        s"""$trainLinearSqlPrefix,
           |wgt AS (SELECT bucket, CAST(wn AS DOUBLE) / 1048576.0 AS weight
           |  FROM w$TrainSteps WHERE bucket >= 0),
           |bias AS (SELECT CAST(wn AS DOUBLE) / 1048576.0 AS b
           |  FROM w$TrainSteps WHERE bucket = -1),
           |dots AS (SELECT tf.doc_id, SUM(tf.x * wgt.weight) AS dot
           |  FROM tf JOIN wgt USING (bucket) GROUP BY 1),
           |sc AS MATERIALIZED (SELECT d.doc_id,
           |    d.source || '-' || CAST(d.doc_id % 13 AS VARCHAR) || '.example.com' AS domain,
           |    -(COALESCE(dots.dot, 0) + (SELECT b FROM bias)) AS loss
           |  FROM documents d LEFT JOIN dots USING (doc_id)),
           |st AS MATERIALIZED (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n,
           |    SUM(CAST(round(loss, 6) AS DECIMAL(28, 6))) AS s
           |  FROM sc GROUP BY 1),
           |l AS MATERIALIZED (SELECT domain,
           |    floor((CAST(s AS DOUBLE) / n) * 1048576.0) / 1048576.0 AS l FROM st),
           |a0 AS (SELECT domain, 1.0 AS a FROM l),
           |$steps,
           |wts AS (SELECT domain, a / (SELECT SUM(a) FROM a4) AS share
           |  FROM a4 WHERE a > 0),
           |j AS (SELECT st.domain, CAST(st.n AS DOUBLE) AS ng, wts.share,
           |    CAST(st.n AS DOUBLE) / wts.share AS demand
           |  FROM st JOIN wts USING (domain)),
           |smax AS (SELECT min(demand) AS smax FROM j),
           |r AS (SELECT domain, share * smax / ng AS rate FROM j CROSS JOIN smax)
           |SELECT sc.doc_id, sc.domain
           |FROM sc JOIN r USING (domain)
           |WHERE CAST('0x' || substr(md5(CAST(sc.doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000
           |      < rate * 1000
           |ORDER BY sc.doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // Bigram LM training (TextAnalysis.trainBigramLm): the PERSISTABLE
    // reference-LM artifact of the CCNet perplexity filter (Wenzek 2020;
    // KenLM's role) — fit on the trusted subset (lang='en' as the
    // reference corpus), one (prev, tok, cnt) frame IS the model.
    // BOS = chr(1) gives every token a left context.
    Q(
      "x134_lm_model",
      (s, d) =>
        TextAnalysis
          .trainBigramLm(t(s, d, "documents").filter(col("lang") === "en"), "doc_id", "text")
          .orderBy("prev", "tok"),
      Some("""WITH tkr AS (SELECT string_split(text, ' ') AS ts FROM documents WHERE lang = 'en'),
             |ar AS (SELECT list_prepend(chr(1), ts) AS arr FROM tkr),
             |bgr AS (SELECT unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok
             |  FROM ar)
             |SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt
             |FROM bgr GROUP BY 1, 2 ORDER BY prev, tok""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Perplexity scoring under the reference LM (TextAnalysis
    // .perplexityScore): every document scored against the en-trained
    // model — cross-corpus, so unseen bigrams genuinely exercise the
    // add-one path. The per-token log2 is the EXACT Q20 shift-and-square
    // integer recurrence (graft.functions.FixedLog2), so per-doc NLL
    // sums are order-free integers and the oracle replays the ENTIRE
    // chain — train, smooth, fixed-point log (one recursive CTE over
    // the distinct count values), sum — to the bit at every SF.
    Q(
      "x135_perplexity",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        TextAnalysis.perplexityScore(docs, model, "doc_id", "text").orderBy("doc_id")
      },
      Some(
        s"""$bigramLmSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1)
           |SELECT doc_id, n_tokens, nll_q20,
           |  CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce_bits
           |FROM ag ORDER BY doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // CCNet head/middle/tail (TextAnalysis.perplexityBuckets): the
    // consumer the LM exists for — PER-LANGUAGE cross-entropy terciles
    // under the reference model (perplexity scales are not comparable
    // across languages), head = closest to the reference. Boundaries
    // are the x121 exact-percentile formula, here per lang; ce values
    // are dyadic-exact doubles so every compare is wobble-free.
    Q(
      "x136_ppl_buckets",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        TextAnalysis
          .perplexityBuckets(docs, model, "doc_id", "text", "lang", exact = true)
          .select(col("doc_id"), col("lang"), col("ce_bits"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(
        s"""$bigramLmSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1),
           |sc AS MATERIALIZED (SELECT ag.doc_id, d.lang,
           |    CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce
           |  FROM ag JOIN documents d USING (doc_id)),
           |vs AS (SELECT lang, list_sort(list(ce)) AS v, COUNT(*) AS n FROM sc GROUP BY 1),
           |ps AS (SELECT lang, v, CAST(1 AS DOUBLE) / 3 * (n - 1) AS p1,
           |    CAST(2 AS DOUBLE) / 3 * (n - 1) AS p2 FROM vs),
           |bd AS (SELECT lang,
           |  CASE WHEN ceil(p1) = floor(p1)
           |      OR v[CAST(floor(p1) AS BIGINT) + 1] = v[CAST(ceil(p1) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p1) AS BIGINT) + 1]
           |    ELSE (ceil(p1) - p1) * v[CAST(floor(p1) AS BIGINT) + 1]
           |      + (p1 - floor(p1)) * v[CAST(ceil(p1) AS BIGINT) + 1] END AS blo,
           |  CASE WHEN ceil(p2) = floor(p2)
           |      OR v[CAST(floor(p2) AS BIGINT) + 1] = v[CAST(ceil(p2) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p2) AS BIGINT) + 1]
           |    ELSE (ceil(p2) - p2) * v[CAST(floor(p2) AS BIGINT) + 1]
           |      + (p2 - floor(p2)) * v[CAST(ceil(p2) AS BIGINT) + 1] END AS bhi
           |  FROM ps)
           |SELECT sc.doc_id, sc.lang, sc.ce AS ce_bits,
           |  CASE WHEN sc.ce <= bd.blo THEN 'head'
           |    WHEN sc.ce <= bd.bhi THEN 'middle' ELSE 'tail' END AS bucket
           |FROM sc JOIN bd USING (lang) ORDER BY sc.doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Per-language reference LMs (trainBigramLm keyCols — CCNet proper:
    // Wenzek 2020 trains one KenLM per language): ONE pass fits an
    // independent model per lang on the trusted source subset
    // (source='src0'), and every doc scores under ITS language's model —
    // counts, context totals and the vocabulary all resolve within the
    // key. Same Q20 integer exactness as x135; the oracle adds the lang
    // key to every model join and replays the identical recursive log.
    Q(
      "x137_lang_lm",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextAnalysis.trainBigramLm(
          docs.filter(col("source") === "src0"), "doc_id", "text", Seq("lang"))
        TextAnalysis
          .perplexityScore(docs, model, "doc_id", "text", Seq("lang"))
          .orderBy("doc_id")
      },
      Some(
        s"""$langLmSqlPrefix
           |SELECT doc_id, n_tokens, nll_q20,
           |  CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce_bits
           |FROM ag ORDER BY doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // The complete CCNet shape in one hash row (Wenzek 2020 §4.3 as
    // deployed): per-LANGUAGE reference models (x137's keyed training on
    // the trusted source subset), each doc scored under its language's
    // model, and head/middle/tail cut at PER-LANGUAGE exact terciles of
    // the resulting cross-entropy (x136's boundary replay, now over
    // per-lang-model scores). perplexityBuckets(keyCols = lang) is the
    // engine composition; the oracle chains the x137 replay into the
    // x121 percentile formula per lang.
    Q(
      "x140_ccnet_buckets",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextAnalysis.trainBigramLm(
          docs.filter(col("source") === "src0"), "doc_id", "text", Seq("lang"))
        TextAnalysis
          .perplexityBuckets(
            docs, model, "doc_id", "text", "lang", exact = true, keyCols = Seq("lang"))
          .select(col("doc_id"), col("lang"), col("ce_bits"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(
        s"""$langLmSqlPrefix,
           |sc AS MATERIALIZED (SELECT ag.doc_id, d.lang,
           |    CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce
           |  FROM ag JOIN documents d USING (doc_id)),
           |vs AS (SELECT lang, list_sort(list(ce)) AS v, COUNT(*) AS n FROM sc GROUP BY 1),
           |ps AS (SELECT lang, v, CAST(1 AS DOUBLE) / 3 * (n - 1) AS p1,
           |    CAST(2 AS DOUBLE) / 3 * (n - 1) AS p2 FROM vs),
           |bd AS (SELECT lang,
           |  CASE WHEN ceil(p1) = floor(p1)
           |      OR v[CAST(floor(p1) AS BIGINT) + 1] = v[CAST(ceil(p1) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p1) AS BIGINT) + 1]
           |    ELSE (ceil(p1) - p1) * v[CAST(floor(p1) AS BIGINT) + 1]
           |      + (p1 - floor(p1)) * v[CAST(ceil(p1) AS BIGINT) + 1] END AS blo,
           |  CASE WHEN ceil(p2) = floor(p2)
           |      OR v[CAST(floor(p2) AS BIGINT) + 1] = v[CAST(ceil(p2) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p2) AS BIGINT) + 1]
           |    ELSE (ceil(p2) - p2) * v[CAST(floor(p2) AS BIGINT) + 1]
           |      + (p2 - floor(p2)) * v[CAST(ceil(p2) AS BIGINT) + 1] END AS bhi
           |  FROM ps)
           |SELECT sc.doc_id, sc.lang, sc.ce AS ce_bits,
           |  CASE WHEN sc.ce <= bd.blo THEN 'head'
           |    WHEN sc.ce <= bd.bhi THEN 'middle' ELSE 'tail' END AS bucket
           |FROM sc JOIN bd USING (lang) ORDER BY sc.doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Perplexity as the DoReMi loss (the x130 optimize -> x132 apply
    // chain with the LM as the loss signal): domains whose text the
    // reference LM finds hard carry EXCESS cross-entropy and get
    // upweighted, then the corpus resamples to the learned mixture —
    // LM -> mixture -> resample in ONE hash row. Exactness stacks three
    // proven contracts: Q20-integer NLLs (x135) -> ce_bits is a dyadic
    // double whose round(.,6)/decimal sums replay exactly (the x130
    // loop) -> pinned-association rates + md5 membership (x61/x132).
    Q(
      "x138_ppl_mix",
      (s, d) => {
        val dk = col("doc_id")
        val u = concat(
          lit("https://"), col("source"), lit("-"), (dk % 13).cast("string"),
          lit(".Example.com/"), col("lang"), lit("/"), dk.cast("string")
        )
        val docs = t(s, d, "documents").withColumn("url", u)
        val model = TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        val ce = TextAnalysis
          .perplexityScore(docs, model, "doc_id", "text")
          .select(col("doc_id"), col("ce_bits").as("loss"))
        // materialized once: the doremiMix stats collect AND the final
        // resample both consume this frame — without the checkpoint each
        // action re-runs the LM scoring pass (the oracle's sc CTE is
        // MATERIALIZED for the same reason)
        val withDom = docs
          .select(col("doc_id"), TextAnalysis.urlDomain(col("url")).as("domain"))
          .join(ce, Seq("doc_id"))
          .localCheckpoint()
        val shares = Scale
          .doremiMix(withDom, "domain", "loss", steps = 4)
          .select("domain", "weight")
          .collect() // bounded by doremiMix's maxGroups guard
          .map(r => r.getString(0) -> r.getDouble(1))
          .filter(_._2 > 0)
          .toMap
        Scale
          .resampleToMix(withDom, Seq("doc_id"), "domain", shares)
          .select("doc_id", "domain")
          .orderBy("doc_id")
      },
      Some {
        val steps = (1 to 4).map { t =>
          val p = t - 1
          s"""mm$t AS (SELECT SUM(a.a * l.l) / SUM(a.a) AS m
             |  FROM a$p a JOIN l USING (domain)),
             |a$t AS (SELECT l.domain,
             |    floor(a.a * GREATEST(0.0, 1.0 + 0.25 * (l.l - (SELECT m FROM mm$t)))
             |      * 1048576.0) / 1048576.0 AS a
             |  FROM a$p a JOIN l USING (domain))""".stripMargin
        }.mkString(",\n")
        s"""$bigramLmSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1),
           |sc AS MATERIALIZED (SELECT d.doc_id,
           |    d.source || '-' || CAST(d.doc_id % 13 AS VARCHAR) || '.example.com' AS domain,
           |    CAST(ag.nll_q20 // ag.n_tokens AS DOUBLE) / 1048576.0 AS loss
           |  FROM documents d JOIN ag USING (doc_id)),
           |st AS MATERIALIZED (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n,
           |    SUM(CAST(round(loss, 6) AS DECIMAL(28, 6))) AS s
           |  FROM sc GROUP BY 1),
           |l AS MATERIALIZED (SELECT domain,
           |    floor((CAST(s AS DOUBLE) / n) * 1048576.0) / 1048576.0 AS l FROM st),
           |a0 AS (SELECT domain, 1.0 AS a FROM l),
           |$steps,
           |wts AS (SELECT domain, a / (SELECT SUM(a) FROM a4) AS share
           |  FROM a4 WHERE a > 0),
           |j AS (SELECT st.domain, CAST(st.n AS DOUBLE) AS ng, wts.share,
           |    CAST(st.n AS DOUBLE) / wts.share AS demand
           |  FROM st JOIN wts USING (domain)),
           |smax AS (SELECT min(demand) AS smax FROM j),
           |r AS (SELECT domain, share * smax / ng AS rate FROM j CROSS JOIN smax)
           |SELECT sc.doc_id, sc.domain
           |FROM sc JOIN r USING (domain)
           |WHERE CAST('0x' || substr(md5(CAST(sc.doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000
           |      < rate * 1000
           |ORDER BY sc.doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // Stupid-backoff trigram scoring (TextAnalysis.trainTrigramLm /
    // scoreStupidBackoff — Brants 2007, the smoothing built FOR
    // distributed count LMs): one (prev2, prev1, tok, cnt) table is the
    // whole artifact (lower orders derive by summation), and each token
    // scores at the deepest seen order with a fixed 2^-1 backoff
    // penalty — exactly alphaShift·2^20 on the Q20 grid, so the oracle
    // replays the case ladder as an integer addend on the SAME recursive
    // log CTE as x135.
    Q(
      "x139_backoff",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextAnalysis.trainTrigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        TextAnalysis.scoreStupidBackoff(docs, model, "doc_id", "text").orderBy("doc_id")
      },
      Some(
        s"""WITH RECURSIVE
           |tkr AS (SELECT string_split(text, ' ') AS ts FROM documents WHERE lang = 'en'),
           |ar AS (SELECT list_prepend(chr(1), list_prepend(chr(1), ts)) AS arr FROM tkr),
           |g3 AS (SELECT unnest(arr[1:len(arr)-2]) AS p2, unnest(arr[2:len(arr)-1]) AS p1,
           |    unnest(arr[3:len(arr)]) AS t FROM ar),
           |t3 AS MATERIALIZED (SELECT p2, p1, t, CAST(COUNT(*) AS BIGINT) AS c3
           |  FROM g3 GROUP BY 1, 2, 3),
           |b2 AS MATERIALIZED (SELECT p1, t, CAST(SUM(c3) AS BIGINT) AS c2 FROM t3 GROUP BY 1, 2),
           |u1 AS MATERIALIZED (SELECT t, CAST(SUM(c2) AS BIGINT) AS c1 FROM b2 GROUP BY 1),
           |x3 AS MATERIALIZED (SELECT p2, p1, CAST(SUM(c3) AS BIGINT) AS x3 FROM t3 GROUP BY 1, 2),
           |x2 AS MATERIALIZED (SELECT p1, CAST(SUM(c2) AS BIGINT) AS x2 FROM b2 GROUP BY 1),
           |nv AS (SELECT CAST(SUM(c1) + COUNT(DISTINCT t) AS BIGINT) AS nv FROM u1),
           |tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
           |aa AS (SELECT doc_id, list_prepend(chr(1), list_prepend(chr(1), ts)) AS arr FROM tk),
           |bg AS (SELECT doc_id, unnest(arr[1:len(arr)-2]) AS p2,
           |    unnest(arr[2:len(arr)-1]) AS p1, unnest(arr[3:len(arr)]) AS t FROM aa),
           |pt AS MATERIALIZED (SELECT b.doc_id,
           |    CASE WHEN t3.c3 IS NOT NULL THEN t3.c3
           |      WHEN b2.c2 IS NOT NULL THEN b2.c2
           |      ELSE COALESCE(u1.c1, 0) + 1 END AS num,
           |    CASE WHEN t3.c3 IS NOT NULL THEN x3.x3
           |      WHEN b2.c2 IS NOT NULL THEN x2.x2
           |      ELSE (SELECT nv FROM nv) END AS den,
           |    CAST(CASE WHEN t3.c3 IS NOT NULL THEN 0
           |      WHEN b2.c2 IS NOT NULL THEN 1048576 ELSE 2097152 END AS BIGINT) AS adq
           |  FROM bg b
           |  LEFT JOIN t3 ON t3.p2 = b.p2 AND t3.p1 = b.p1 AND t3.t = b.t
           |  LEFT JOIN x3 ON x3.p2 = b.p2 AND x3.p1 = b.p1
           |  LEFT JOIN b2 ON b2.p1 = b.p1 AND b2.t = b.t
           |  LEFT JOIN x2 ON x2.p1 = b.p1
           |  LEFT JOIN u1 ON u1.t = b.t),
           |$lmLogReplayCtes,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1)
           |SELECT doc_id, n_tokens, nll_q20,
           |  CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce_bits
           |FROM ag ORDER BY doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Interpolated Kneser–Ney (TextAnalysis.scoreKneserNey — Kneser & Ney
    // 1995; Chen & Goodman 1999's empirical winner): the quality-standard
    // smoother over the SAME trainBigramLm artifact — discounted seen
    // mass interpolated with the continuation distribution N1+(·w), the
    // Chen–Goodman discount n1/(n1+2n2) snapped to the Q10 dyadic grid.
    // The interpolated numerator is a sum of count products (~2^90 at
    // 100 TB counts): it rides a DECIMAL(38,0) through the 128-bit
    // FixedLog2 widening, and the oracle replays the identical recurrence
    // on HUGEINT — exponent ladder + one 64-bit step, mantissa by shift.
    Q(
      "x141_kneser_ney",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        TextAnalysis.scoreKneserNey(docs, model, "doc_id", "text").orderBy("doc_id")
      },
      Some(
        s"""$knSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1)
           |SELECT doc_id, n_tokens, nll_q20,
           |  CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce_bits
           |FROM ag ORDER BY doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Per-language Kneser–Ney (scoreKneserNey keyCols — the CCNet
    // deployment shape with the quality-standard smoother): x137's keyed
    // per-lang training on the trusted source subset, every doc scored
    // under ITS language's model with ALL KN statistics (context totals,
    // fan-outs, continuation counts, discount) resolved within the key.
    Q(
      "x142_kn_lang",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextAnalysis.trainBigramLm(
          docs.filter(col("source") === "src0"), "doc_id", "text", Seq("lang"))
        TextAnalysis
          .scoreKneserNey(docs, model, "doc_id", "text", keyCols = Seq("lang"))
          .orderBy("doc_id")
      },
      Some(
        s"""$knLangSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1)
           |SELECT doc_id, n_tokens, nll_q20,
           |  CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce_bits
           |FROM ag ORDER BY doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // CCNet with the quality-standard smoother (perplexityBuckets
    // smoothing = "kn"): x140's complete shape — per-language models on
    // the trusted subset, per-language exact terciles — but the
    // cross-entropy under interpolated Kneser–Ney instead of add-one.
    // The oracle chains the x142 keyed-KN replay into the x121
    // percentile formula per lang.
    Q(
      "x143_kn_buckets",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextAnalysis.trainBigramLm(
          docs.filter(col("source") === "src0"), "doc_id", "text", Seq("lang"))
        TextAnalysis
          .perplexityBuckets(docs, model, "doc_id", "text", "lang",
            exact = true, keyCols = Seq("lang"), smoothing = "kn")
          .select(col("doc_id"), col("lang"), col("ce_bits"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(
        s"""$knLangSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1),
           |sc AS MATERIALIZED (SELECT ag.doc_id, d.lang,
           |    CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce
           |  FROM ag JOIN documents d USING (doc_id)),
           |vs AS (SELECT lang, list_sort(list(ce)) AS v, COUNT(*) AS n FROM sc GROUP BY 1),
           |ps AS (SELECT lang, v, CAST(1 AS DOUBLE) / 3 * (n - 1) AS p1,
           |    CAST(2 AS DOUBLE) / 3 * (n - 1) AS p2 FROM vs),
           |bd AS (SELECT lang,
           |  CASE WHEN ceil(p1) = floor(p1)
           |      OR v[CAST(floor(p1) AS BIGINT) + 1] = v[CAST(ceil(p1) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p1) AS BIGINT) + 1]
           |    ELSE (ceil(p1) - p1) * v[CAST(floor(p1) AS BIGINT) + 1]
           |      + (p1 - floor(p1)) * v[CAST(ceil(p1) AS BIGINT) + 1] END AS blo,
           |  CASE WHEN ceil(p2) = floor(p2)
           |      OR v[CAST(floor(p2) AS BIGINT) + 1] = v[CAST(ceil(p2) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p2) AS BIGINT) + 1]
           |    ELSE (ceil(p2) - p2) * v[CAST(floor(p2) AS BIGINT) + 1]
           |      + (p2 - floor(p2)) * v[CAST(ceil(p2) AS BIGINT) + 1] END AS bhi
           |  FROM ps)
           |SELECT sc.doc_id, sc.lang, sc.ce AS ce_bits,
           |  CASE WHEN sc.ce <= bd.blo THEN 'head'
           |    WHEN sc.ce <= bd.bhi THEN 'middle' ELSE 'tail' END AS bucket
           |FROM sc JOIN bd USING (lang) ORDER BY sc.doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Distillation QUALITY audit (the FineWeb-Edu ablation, in-engine):
    // how much of its own supervision signal does x144's distilled
    // classifier actually capture? Confusion counts of the classifier's
    // keep decision against the KN-head labels it was trained on, plus
    // precision/recall (single IEEE divisions of exact integer counts —
    // both engines land the same double). Exactness is x144's chain plus
    // one global aggregate; the NUMBER is the ablation: at 3 GD steps
    // over 64 hash buckets the linear model is a cheap approximation of
    // the LM signal, and this row says exactly how cheap.
    Q(
      "x146_distill_audit",
      (s, d) => {
        val docs = t(s, d, "documents")
        val lm = TextAnalysis.trainBigramLm(
          docs.filter(col("source") === "src0"), "doc_id", "text", Seq("lang"))
        val labels = TextAnalysis
          .perplexityBuckets(docs, lm, "doc_id", "text", "lang",
            exact = true, keyCols = Seq("lang"), smoothing = "kn")
          .select(col("doc_id"), when(col("bucket") === "head", 1L).otherwise(0L).as("label"))
        val labeled = docs.join(labels, Seq("doc_id"))
        val model = TextAnalysis.trainLinear(
          labeled.select(col("doc_id"), col("text"), col("label")),
          "doc_id", "text", "label",
          dim = 64, steps = TrainSteps, lrShift = 4, scaleShift = 20)
        val scored = TextAnalysis.scoreLinearSparse(
          docs, "doc_id", "text",
          model.frame(s).filter(col("bucket") >= 0), dim = 64, bias = model.bias)
        // rank-matched cut: the exact global 2/3 logit quantile selects
        // ~the same share the head-tercile labels carry, so agreement
        // ABOVE it measures ranking signal independent of the keep
        // threshold's calibration (which 3 cheap GD steps never reach)
        val bq = Quantiles.quantiles(scored, Nil, "logit", Seq(2.0 / 3), exact = true)
        val bqCol = bq.columns.head
        scored
          .join(labels, Seq("doc_id"))
          .crossJoin(broadcast(bq.select(col(bqCol).as("__bq"))))
          .agg(
            sum(when(col("keep") && col("label") === 1L, 1L).otherwise(0L)).as("tp"),
            sum(when(col("keep") && col("label") === 0L, 1L).otherwise(0L)).as("fp"),
            sum(when(!col("keep") && col("label") === 1L, 1L).otherwise(0L)).as("fn"),
            sum(when(!col("keep") && col("label") === 0L, 1L).otherwise(0L)).as("tn"),
            sum(when(col("logit") > col("__bq") && col("label") === 1L, 1L).otherwise(0L))
              .as("top_hits"),
            sum(when(col("logit") > col("__bq"), 1L).otherwise(0L)).as("top_n"),
            sum(col("label")).as("base_p")
          )
          .select(
            col("tp"), col("fp"), col("fn"), col("tn"),
            col("top_hits"), col("top_n"), col("base_p"),
            // NULL when the class is empty (an all-drop classifier at tiny
            // SF has no defined precision; ANSI would throw on the /0)
            when(col("tp") + col("fp") === 0L, lit(null).cast("double"))
              .otherwise(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
              .as("precision"),
            when(col("tp") + col("fn") === 0L, lit(null).cast("double"))
              .otherwise(col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
              .as("recall"),
            when(col("top_n") === 0L, lit(null).cast("double"))
              .otherwise(col("top_hits").cast("double") / col("top_n").cast("double"))
              .as("precision_top")
          )
      },
      Some(
        s"""$knLangSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1),
           |sc AS MATERIALIZED (SELECT ag.doc_id, d.lang,
           |    CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce
           |  FROM ag JOIN documents d USING (doc_id)),
           |vs AS (SELECT lang, list_sort(list(ce)) AS v, COUNT(*) AS n FROM sc GROUP BY 1),
           |ps AS (SELECT lang, v, CAST(1 AS DOUBLE) / 3 * (n - 1) AS p1 FROM vs),
           |bd AS (SELECT lang,
           |  CASE WHEN ceil(p1) = floor(p1)
           |      OR v[CAST(floor(p1) AS BIGINT) + 1] = v[CAST(ceil(p1) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p1) AS BIGINT) + 1]
           |    ELSE (ceil(p1) - p1) * v[CAST(floor(p1) AS BIGINT) + 1]
           |      + (p1 - floor(p1)) * v[CAST(ceil(p1) AS BIGINT) + 1] END AS blo
           |  FROM ps),
           |${trainLinearCtes(
             """lab AS MATERIALIZED (SELECT sc.doc_id,
               |    CASE WHEN sc.ce <= bd.blo THEN 1 ELSE 0 END AS y
               |  FROM sc JOIN bd USING (lang))""".stripMargin
           )},
           |wgt AS (SELECT bucket, CAST(wn AS DOUBLE) / 1048576.0 AS weight
           |  FROM w$TrainSteps WHERE bucket >= 0),
           |bias AS (SELECT CAST(wn AS DOUBLE) / 1048576.0 AS b
           |  FROM w$TrainSteps WHERE bucket = -1),
           |dots AS (SELECT tf.doc_id, SUM(tf.x * wgt.weight) AS dot
           |  FROM tf JOIN wgt USING (bucket) GROUP BY 1),
           |lgt AS MATERIALIZED (SELECT d.doc_id,
           |    COALESCE(dots.dot, 0) + (SELECT b FROM bias) AS logit
           |  FROM documents d LEFT JOIN dots USING (doc_id)),
           |qv AS (SELECT list_sort(list(logit)) AS v, COUNT(*) AS n FROM lgt),
           |qp AS (SELECT v, CAST(2 AS DOUBLE) / 3 * (n - 1) AS p2 FROM qv),
           |qb AS (SELECT
           |  CASE WHEN ceil(p2) = floor(p2)
           |      OR v[CAST(floor(p2) AS BIGINT) + 1] = v[CAST(ceil(p2) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p2) AS BIGINT) + 1]
           |    ELSE (ceil(p2) - p2) * v[CAST(floor(p2) AS BIGINT) + 1]
           |      + (p2 - floor(p2)) * v[CAST(ceil(p2) AS BIGINT) + 1] END AS bq
           |  FROM qp),
           |cf AS (SELECT
           |    CAST(SUM(CASE WHEN logit >= 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |    CAST(SUM(CASE WHEN logit >= 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |    CAST(SUM(CASE WHEN logit < 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |    CAST(SUM(CASE WHEN logit < 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           |    CAST(SUM(CASE WHEN logit > (SELECT bq FROM qb) AND y = 1
           |      THEN 1 ELSE 0 END) AS BIGINT) AS top_hits,
           |    CAST(SUM(CASE WHEN logit > (SELECT bq FROM qb)
           |      THEN 1 ELSE 0 END) AS BIGINT) AS top_n,
           |    CAST(SUM(y) AS BIGINT) AS base_p
           |  FROM lgt JOIN lab USING (doc_id))
           |SELECT tp, fp, fn, tn, top_hits, top_n, base_p,
           |  CASE WHEN tp + fp = 0 THEN NULL
           |    ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
           |  CASE WHEN tp + fn = 0 THEN NULL
           |    ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
           |  CASE WHEN top_n = 0 THEN NULL
           |    ELSE CAST(top_hits AS DOUBLE) / CAST(top_n AS DOUBLE) END AS precision_top
           |FROM cf""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // MODIFIED Kneser–Ney (scoreKneserNey modified = true — Chen &
    // Goodman 1999 §3, their empirical winner over plain KN): three
    // count-conditioned discounts (D1 = Y by identity; D2/D3 with
    // midpoint fallbacks and per-level clamps) and count-conditioned
    // fan-outs in the interpolation weight. Discount-formula products
    // reach ~2^94 at 100 TB type counts, so both engines compute them in
    // 128-bit (DECIMAL(38,0) div / HUGEINT //).
    Q(
      "x145_mkn",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        TextAnalysis
          .scoreKneserNey(docs, model, "doc_id", "text", modified = true)
          .orderBy("doc_id")
      },
      Some(
        s"""$mknSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1)
           |SELECT doc_id, n_tokens, nll_q20,
           |  CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce_bits
           |FROM ag ORDER BY doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Classifier distillation from the LM signal (the FineWeb-Edu /
    // quality-classifier pattern: an expensive-but-cheaply-supervised
    // signal becomes the LABEL for a fast linear model that scores
    // everything thereafter): x143's CCNet-KN head bucket (per-language
    // KN terciles) labels the corpus, x127's exact integer GD trains on
    // those labels, and scoreLinearSparse scores every doc — LM → bucket
    // → label → train → score, ONE hash row. The oracle chains the full
    // keyed-KN HUGEINT replay into the tercile formula into the
    // step-by-step training replay into the scoring join.
    Q(
      "x144_lm_distill",
      (s, d) => {
        val docs = t(s, d, "documents")
        val lm = TextAnalysis.trainBigramLm(
          docs.filter(col("source") === "src0"), "doc_id", "text", Seq("lang"))
        val labeled = docs.join(
          TextAnalysis
            .perplexityBuckets(docs, lm, "doc_id", "text", "lang",
              exact = true, keyCols = Seq("lang"), smoothing = "kn")
            .select(
              col("doc_id"),
              when(col("bucket") === "head", 1L).otherwise(0L).as("label")),
          Seq("doc_id"))
        val model = TextAnalysis.trainLinear(
          labeled.select(col("doc_id"), col("text"), col("label")),
          "doc_id", "text", "label",
          dim = 64, steps = TrainSteps, lrShift = 4, scaleShift = 20)
        TextAnalysis
          .scoreLinearSparse(
            docs, "doc_id", "text",
            model.frame(s).filter(col("bucket") >= 0), dim = 64, bias = model.bias)
          .orderBy("doc_id")
      },
      Some(
        s"""$knLangSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1),
           |sc AS MATERIALIZED (SELECT ag.doc_id, d.lang,
           |    CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce
           |  FROM ag JOIN documents d USING (doc_id)),
           |vs AS (SELECT lang, list_sort(list(ce)) AS v, COUNT(*) AS n FROM sc GROUP BY 1),
           |ps AS (SELECT lang, v, CAST(1 AS DOUBLE) / 3 * (n - 1) AS p1 FROM vs),
           |bd AS (SELECT lang,
           |  CASE WHEN ceil(p1) = floor(p1)
           |      OR v[CAST(floor(p1) AS BIGINT) + 1] = v[CAST(ceil(p1) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p1) AS BIGINT) + 1]
           |    ELSE (ceil(p1) - p1) * v[CAST(floor(p1) AS BIGINT) + 1]
           |      + (p1 - floor(p1)) * v[CAST(ceil(p1) AS BIGINT) + 1] END AS blo
           |  FROM ps),
           |${trainLinearCtes(
             """lab AS MATERIALIZED (SELECT sc.doc_id,
               |    CASE WHEN sc.ce <= bd.blo THEN 1 ELSE 0 END AS y
               |  FROM sc JOIN bd USING (lang))""".stripMargin
           )},
           |wgt AS (SELECT bucket, CAST(wn AS DOUBLE) / 1048576.0 AS weight
           |  FROM w$TrainSteps WHERE bucket >= 0),
           |bias AS (SELECT CAST(wn AS DOUBLE) / 1048576.0 AS b
           |  FROM w$TrainSteps WHERE bucket = -1),
           |dots AS (SELECT tf.doc_id, SUM(tf.x * wgt.weight) AS dot
           |  FROM tf JOIN wgt USING (bucket) GROUP BY 1)
           |SELECT d.doc_id,
           |  COALESCE(dots.dot, 0) + (SELECT b FROM bias) AS logit,
           |  COALESCE(dots.dot, 0) + (SELECT b FROM bias) >= 0 AS keep
           |FROM documents d LEFT JOIN dots USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // LM-GATED curation — the complete CCNet-gated curation story in one
    // row (Wenzek 2020's deployment: the perplexity filter sits IN FRONT
    // of the cleaning pipeline): x143's per-language KN terciles keep
    // head+middle, and the survivors flow through the full x65 pipeline
    // (quality gate -> exact dedup -> MinHash-LSH near-dup removal ->
    // fingerprint decontamination -> mixture resampling -> split). The
    // oracle chains the keyed-KN HUGEINT replay into the tercile formula
    // into the entire x65 curate chain.
    Q(
      "x147_lm_curate",
      (s, d) => {
        val docs = t(s, d, "documents")
        val lm = TextAnalysis.trainBigramLm(
          docs.filter(col("source") === "src0"), "doc_id", "text", Seq("lang"))
        val gated = docs.join(
          TextAnalysis
            .perplexityBuckets(docs, lm, "doc_id", "text", "lang",
              exact = true, keyCols = Seq("lang"), smoothing = "kn")
            .filter(col("bucket") =!= "tail")
            .select("doc_id"),
          Seq("doc_id"))
        Pipeline
          .curate(
            gated,
            "doc_id",
            "text",
            docs.filter(col("doc_id") % 7 === 0),
            "lang",
            Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            minQuality = 0.6,
            nearDupThreshold = 0.8
          )
          .select("doc_id", "lang", "source", "split")
          .orderBy("doc_id")
      },
      Some {
        val quality =
          """round(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
            |  + 0.5 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
            |      / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0), 6)""".stripMargin
        s"""$knLangSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1),
           |sc AS MATERIALIZED (SELECT ag.doc_id, d.lang,
           |    CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce
           |  FROM ag JOIN documents d USING (doc_id)),
           |vs AS (SELECT lang, list_sort(list(ce)) AS v, COUNT(*) AS n FROM sc GROUP BY 1),
           |ps AS (SELECT lang, v, CAST(2 AS DOUBLE) / 3 * (n - 1) AS p2 FROM vs),
           |bd AS (SELECT lang,
           |  CASE WHEN ceil(p2) = floor(p2)
           |      OR v[CAST(floor(p2) AS BIGINT) + 1] = v[CAST(ceil(p2) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p2) AS BIGINT) + 1]
           |    ELSE (ceil(p2) - p2) * v[CAST(floor(p2) AS BIGINT) + 1]
           |      + (p2 - floor(p2)) * v[CAST(ceil(p2) AS BIGINT) + 1] END AS bhi
           |  FROM ps),
           |gated AS (SELECT sc.doc_id FROM sc JOIN bd USING (lang) WHERE sc.ce <= bd.bhi),
           |passed AS (SELECT d.doc_id, d.text, d.lang, d.source FROM documents d
           |  JOIN gated USING (doc_id) WHERE $quality >= 0.6),
           |dedup AS (SELECT doc_id, text, lang, source FROM (
           |  SELECT doc_id, text, lang, source,
           |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           |  FROM passed) t WHERE rn = 1),
           |${shingleCteFrom("dedup")},
           |$minhashCtes,
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
           |inter AS (SELECT c.d1, c.d2, COUNT(*) AS ni FROM cand c
           |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
           |  GROUP BY 1, 2),
           |prs AS (SELECT d1, d2 FROM inter
           |  JOIN sizes sa ON sa.doc_id = inter.d1
           |  JOIN sizes sb ON sb.doc_id = inter.d2
           |  WHERE CAST(ni AS DOUBLE) / (sa.sz + sb.sz - ni) >= 0.8),
           |cleaned AS (SELECT * FROM dedup WHERE doc_id NOT IN (SELECT d2 FROM prs)),
           |fp AS (SELECT doc_id,
           |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS f
           |  FROM documents),
           |decon AS (SELECT c.* FROM cleaned c JOIN fp ON fp.doc_id = c.doc_id
           |  WHERE fp.f NOT IN (SELECT DISTINCT f FROM fp WHERE doc_id % 7 = 0)),
           |n AS (SELECT lang, CAST(count(*) AS DOUBLE) AS ng FROM decon GROUP BY 1),
           |shr AS (SELECT * FROM (VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.15),
           |       ('es', 0.1), ('zh', 0.05)) AS t(lang, share)),
           |j AS (SELECT n.lang, ng, share, ng / share AS demand FROM n JOIN shr USING (lang)),
           |smx AS (SELECT min(demand) AS smax FROM j),
           |r AS (SELECT lang, share * smax / ng AS rate FROM j CROSS JOIN smx),
           |mixed AS (SELECT d.doc_id, d.lang, d.source,
           |    CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000 AS hb
           |  FROM decon d JOIN r USING (lang)
           |  WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000
           |        < rate * 1000)
           |SELECT doc_id, lang, source,
           |  CASE WHEN hb < 800 THEN 'train' WHEN hb < 900 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM mixed ORDER BY doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // Jelinek–Mercer interpolation (scoreJelinekMercer — Chen & Goodman
    // 1999 §2's simplest interpolated smoother): fixed dyadic λ = 1/2
    // mixing the bigram ML estimate with the add-one continuation
    // distribution, same trainBigramLm artifact, same exact Q20 grid and
    // HUGEINT log ladder as the KN replay.
    Q(
      "x148_jelinek_mercer",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model =
          TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        TextAnalysis.scoreJelinekMercer(docs, model, "doc_id", "text").orderBy("doc_id")
      },
      Some(
        s"""${contSqlPrefix(
            """    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN
              |      CAST(COALESCE(m.cnt, 0) AS HUGEINT) * (gq.t + gq.v)
              |      + CAST(cx.ctx AS HUGEINT) * (COALESCE(cw.cw, 0) + 1)
              |    ELSE CAST(COALESCE(cw.cw, 0) + 1 AS HUGEINT) END AS num,
              |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN cx.ctx ELSE gq.t + gq.v END AS den1,
              |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN gq.t + gq.v
              |      ELSE CAST(1 AS BIGINT) END AS den2,
              |    CAST(CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN 1048576 ELSE 0 END AS BIGINT) AS adq""".stripMargin
          )},
           |$nllSqlTail""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Witten–Bell smoothing (scoreWittenBell — Witten & Bell 1991 method
    // C): per-context mixing weight from the type fan-out N1+(v·), no
    // dyadic snap needed (the weights are exact count ratios), same
    // artifact, grid, and ladder.
    Q(
      "x149_witten_bell",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model =
          TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        TextAnalysis.scoreWittenBell(docs, model, "doc_id", "text").orderBy("doc_id")
      },
      Some(
        s"""${contSqlPrefix(
            """    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN
              |      CAST(COALESCE(m.cnt, 0) AS HUGEINT) * (gq.t + gq.v)
              |      + CAST(cx.nv AS HUGEINT) * (COALESCE(cw.cw, 0) + 1)
              |    ELSE CAST(COALESCE(cw.cw, 0) + 1 AS HUGEINT) END AS num,
              |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN cx.ctx + cx.nv
              |      ELSE gq.t + gq.v END AS den1,
              |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN gq.t + gq.v
              |      ELSE CAST(1 AS BIGINT) END AS den2,
              |    CAST(0 AS BIGINT) AS adq""".stripMargin
          )},
           |$nllSqlTail""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Excess-perplexity selection (TextAnalysis.excessPerplexity — the
    // RHO-1 / DoReMi excess-loss signal at doc granularity): every doc
    // scored under the en-trained REFERENCE LM and under a SELF model
    // fit on the whole raw corpus; excess = ce_self − ce_ref ranks docs
    // that the reference predicts well but the corpus's own distribution
    // does not — high-quality and under-represented, the upweight set.
    // Both scores are the exact-Q20 add-one chain, so the top-200 cut
    // (ties broken by doc_id) is deterministic in both engines; ONE log
    // ladder serves both models via a side tag, and Spark plans the
    // orderBy+limit as TakeOrderedAndProject (no global sort).
    Q(
      "x150_excess_ppl",
      (s, d) => {
        val docs = t(s, d, "documents")
        val ref =
          TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        val self = TextAnalysis.trainBigramLm(docs, "doc_id", "text")
        TextAnalysis
          .excessPerplexity(docs, ref, self, "doc_id", "text")
          .orderBy(desc("excess_bits"), col("doc_id"))
          .limit(200)
      },
      Some(
        s"""WITH RECURSIVE
           |rt AS (SELECT string_split(text, ' ') AS ts FROM documents WHERE lang = 'en'),
           |ra AS (SELECT list_prepend(chr(1), ts) AS arr FROM rt),
           |rb AS (SELECT unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok
           |  FROM ra),
           |rm AS MATERIALIZED (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM rb GROUP BY 1, 2),
           |rcx AS MATERIALIZED (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS ctx FROM rm GROUP BY 1),
           |rv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM rm),
           |st AS (SELECT string_split(text, ' ') AS ts FROM documents),
           |sa AS (SELECT list_prepend(chr(1), ts) AS arr FROM st),
           |sb AS (SELECT unnest(arr[1:len(arr)-1]) AS prev, unnest(arr[2:len(arr)]) AS tok
           |  FROM sa),
           |sm AS MATERIALIZED (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM sb GROUP BY 1, 2),
           |scx AS MATERIALIZED (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS ctx FROM sm GROUP BY 1),
           |sv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM sm),
           |tkd AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
           |aad AS (SELECT doc_id, list_prepend(chr(1), ts) AS arr FROM tkd),
           |bgd AS (SELECT doc_id, unnest(arr[1:len(arr)-1]) AS prev,
           |    unnest(arr[2:len(arr)]) AS tok FROM aad),
           |pt AS MATERIALIZED (
           |  SELECT doc_id, 'r' AS side, COALESCE(rm.cnt, 0) + 1 AS num,
           |      COALESCE(rcx.ctx, 0) + (SELECT v FROM rv) AS den, CAST(0 AS BIGINT) AS adq
           |    FROM bgd LEFT JOIN rm USING (prev, tok) LEFT JOIN rcx ON bgd.prev = rcx.prev
           |  UNION ALL
           |  SELECT doc_id, 's', COALESCE(sm.cnt, 0) + 1,
           |      COALESCE(scx.ctx, 0) + (SELECT v FROM sv), CAST(0 AS BIGINT)
           |    FROM bgd LEFT JOIN sm USING (prev, tok) LEFT JOIN scx ON bgd.prev = scx.prev),
           |${lmLogReplayCtesCols(", pt.side")},
           |ag AS (SELECT doc_id, side, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nllq FROM nl GROUP BY 1, 2),
           |rr AS (SELECT doc_id, n_tokens, nllq FROM ag WHERE side = 'r'),
           |ss AS (SELECT doc_id, nllq FROM ag WHERE side = 's'),
           |j AS (SELECT rr.doc_id, rr.n_tokens,
           |    rr.nllq AS ref_nll_q20, ss.nllq AS self_nll_q20,
           |    CAST(rr.nllq // rr.n_tokens AS DOUBLE) / 1048576.0 AS ref_ce_bits,
           |    CAST(ss.nllq // rr.n_tokens AS DOUBLE) / 1048576.0 AS self_ce_bits
           |  FROM rr JOIN ss USING (doc_id))
           |SELECT doc_id, n_tokens, ref_nll_q20, self_nll_q20, ref_ce_bits, self_ce_bits,
           |  self_ce_bits - ref_ce_bits AS excess_bits
           |FROM j ORDER BY excess_bits DESC, doc_id LIMIT 200""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // N-gram novelty (Dedup.ngramNovelty): per-doc fraction of distinct
    // word 3-grams that appear in NO other document — the measurement
    // side of the dedup stack (survivors of a near-dup pass should read
    // high; the low tail localizes residual templated/boilerplate spans
    // pairwise dedup missed). One shingle-df aggregate + one join back,
    // linear in shingle occurrences.
    Q(
      "x151_ngram_novelty",
      (s, d) =>
        Dedup
          .ngramNovelty(t(s, d, "documents"), "doc_id", "text")
          .orderBy("doc_id"),
      Some(
        s"""WITH $shingleCte,
           |df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1)
           |SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           |  CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel_shingles,
           |  round(CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           |    / COUNT(*), 6) AS novelty
           |FROM sh JOIN df USING (s) GROUP BY 1 ORDER BY doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Curriculum ordering with source round-robin (Scale
    // .curriculumInterleave): shortest-first within each source (the
    // classic length curriculum), global position interleaves rank 1
    // of every source, then rank 2, ... — sorted-by-difficulty data
    // without long same-source runs. The oracle IS the two-window
    // definition; the engine computes the same positions CLOSED-FORM
    // from broadcast per-source counts (no single-partition window).
    Q(
      "x152_curriculum",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(
            col("doc_id"),
            col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        Scale
          .curriculumInterleave(docs, "doc_id", "n_tokens", "source")
          .orderBy("pos")
      },
      Some(
        """WITH d AS (SELECT doc_id, source,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
          |r AS (SELECT doc_id, source, n_tokens,
          |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id)
          |      AS BIGINT) AS rn FROM d)
          |SELECT doc_id, source, n_tokens, rn,
          |  CAST(row_number() OVER (ORDER BY rn, source) AS BIGINT) AS pos
          |FROM r ORDER BY pos""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Vocabulary growth curve (TextAnalysis.vocabGrowth — the Heaps'-law
    // audit): distinct word types and total tokens, cumulative over 20
    // ordinal corpus slices; each type counts once in its FIRST slice
    // (min-bucket per token), so every cum_types prefix is the exact
    // distinct-type count of that prefix. Tokenizer-budget planning and
    // a domain-drift canary, from one token-keyed aggregate.
    Q(
      "x153_vocab_growth",
      (s, d) =>
        TextAnalysis
          .vocabGrowth(t(s, d, "documents"), "doc_id", "text", 20)
          .orderBy("bucket"),
      Some(
        """WITH mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
          |b AS (SELECT (doc_id * 20) // m AS bucket, text FROM documents CROSS JOIN mx),
          |pb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS bucket_tokens
          |  FROM b GROUP BY 1),
          |tk AS (SELECT bucket, unnest(string_split(text, ' ')) AS tok FROM b),
          |fs AS (SELECT tok, MIN(bucket) AS fb FROM tk GROUP BY 1),
          |nt AS (SELECT fb AS bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM fs GROUP BY 1)
          |SELECT pb.bucket, pb.n_docs, pb.bucket_tokens,
          |  CAST(SUM(pb.bucket_tokens) OVER (ORDER BY pb.bucket) AS BIGINT) AS cum_tokens,
          |  CAST(COALESCE(nt.new_types, 0) AS BIGINT) AS new_types,
          |  CAST(SUM(COALESCE(nt.new_types, 0)) OVER (ORDER BY pb.bucket) AS BIGINT)
          |    AS cum_types
          |FROM pb LEFT JOIN nt USING (bucket) ORDER BY bucket""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Pairwise vocabulary overlap across languages (TextAnalysis
    // .vocabOverlap): distinct word types per lang, Jaccard per lang
    // pair — the mixture/tokenizer-design diagnostic (how much subword
    // budget do two languages share?). The type-keyed self-join fans
    // out by C(k,2) per type with k <= #langs — never corpus-pairwise.
    Q(
      "x154_vocab_overlap",
      (s, d) =>
        TextAnalysis
          .vocabOverlap(t(s, d, "documents"), "lang", "text")
          .orderBy("key_a", "key_b"),
      Some(
        """WITH st AS (SELECT DISTINCT k, tok FROM
          |  (SELECT lang AS k, unnest(string_split(text, ' ')) AS tok FROM documents)),
          |sz AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1),
          |iv AS (SELECT a.k AS key_a, b.k AS key_b, CAST(COUNT(*) AS BIGINT) AS n_shared
          |  FROM st a JOIN st b USING (tok) WHERE a.k < b.k GROUP BY 1, 2)
          |SELECT key_a, key_b, sa.n AS n_a, sb.n AS n_b, n_shared,
          |  round(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 6) AS jaccard
          |FROM iv JOIN sz sa ON sa.k = key_a JOIN sz sb ON sb.k = key_b
          |ORDER BY key_a, key_b""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Perplexity drift over ordinal corpus slices — the monitoring face
    // of the CCNet filter (composition of perplexityScore with x153's
    // ordinal bucketing): mean reference-LM cross-entropy per slice. A
    // rising tail says the crawl is drifting from the reference; a step
    // says a new domain entered. ce_bits values are dyadic (k/2^20), so
    // their double sums are EXACT at any aggregation order (numerators
    // stay far under 2^52) and the per-bucket mean is deterministic.
    Q(
      "x155_ppl_drift",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model =
          TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        val mx = docs.agg((max(col("doc_id")) + 1L).as("__mx"))
        TextAnalysis
          .perplexityScore(docs, model, "doc_id", "text")
          .crossJoin(broadcast(mx))
          .groupBy(expr("(doc_id * 20) div __mx").as("bucket"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum("nll_q20").as("nll_q20"),
            round(avg("ce_bits"), 6).as("avg_ce_bits")
          )
          .orderBy("bucket")
      },
      Some(
        s"""$bigramLmSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1),
           |mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
           |sc AS (SELECT (ag.doc_id * 20) // m AS bucket, ag.nll_q20,
           |    CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce
           |  FROM ag CROSS JOIN mx)
           |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(nll_q20) AS BIGINT) AS nll_q20,
           |  round(AVG(ce), 6) AS avg_ce_bits
           |FROM sc GROUP BY 1 ORDER BY bucket""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // BPE fertility per language (bytes per EXACT BPE token — the
    // multilingual tokenizer-equity audit: a language with low
    // bytes/token pays more sequence positions per byte of content).
    // Composes x90's exact merge-table count with a per-lang aggregate;
    // the oracle reuses x90's closed-form count expression.
    Q(
      "x156_bpe_fertility",
      (s, d) => {
        val docs = t(s, d, "documents")
        docs
          .select(col("doc_id"), col("lang"), octet_length(col("text")).cast("long").as("__b"))
          .join(
            TextAnalysis
              .tokenBudget(docs, "doc_id", "text", bpeMerges)
              .select(col("doc_id"), col("n_bpe_exact")),
            Seq("doc_id"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("__b").as("n_bytes"),
            sum("n_bpe_exact").as("n_bpe_tokens"),
            round(sum("__b").cast("double") / sum("n_bpe_exact"), 6).as("bytes_per_token")
          )
          .orderBy("lang")
      },
      Some(
        s"""WITH e AS (SELECT doc_id, lang, CAST(strlen(text) AS BIGINT) AS b,
           |    $bpeExactSqlExpr AS nbe FROM documents)
           |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(b) AS BIGINT) AS n_bytes,
           |  CAST(SUM(nbe) AS BIGINT) AS n_bpe_tokens,
           |  round(CAST(SUM(b) AS DOUBLE) / SUM(nbe), 6) AS bytes_per_token
           |FROM e GROUP BY 1 ORDER BY lang""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Contamination ATTRIBUTION (Dedup.contaminationReport): not just
    // which docs are contaminated (x91 scrubs those) but against WHICH
    // eval suite and by how many shared 13-grams — the audit table a
    // lab publishes beside its decontaminated corpus. Two planted
    // suites: A = one 13-word canary (1 gram), B = a 15-word canary
    // (3 grams); docs at %35==16 embed BOTH and must get two rows with
    // different counts.
    Q(
      "x157_contam_report",
      (s, d) => {
        import s.implicits._
        val dirty = tw(s, d, "documents")
          .withColumn(
            "text",
            when(col("doc_id") % 35 === 16,
              concat(col("text"), lit(" " + CanaryLine + " " + CanaryLineB)))
              .when(col("doc_id") % 5 === 1, concat(col("text"), lit(" " + CanaryLine)))
              .when(col("doc_id") % 7 === 2, concat(col("text"), lit(" " + CanaryLineB)))
              .otherwise(col("text"))
          )
        val suites = Seq(("suiteA", CanaryLine), ("suiteB", CanaryLineB)).toDF("suite", "text")
        Dedup
          .contaminationReport(dirty, suites, "doc_id", "text", "suite")
          .orderBy("doc_id", "suite")
      },
      Some(
        s"""WITH d AS (SELECT doc_id,
           |    CASE WHEN doc_id % 35 = 16 THEN text || ' $CanaryLine $CanaryLineB'
           |      WHEN doc_id % 5 = 1 THEN text || ' $CanaryLine'
           |      WHEN doc_id % 7 = 2 THEN text || ' $CanaryLineB'
           |      ELSE text END AS t
           |  FROM documents),
           |r AS (SELECT 'suiteA' AS suite, '$CanaryLine' AS rt
           |  UNION ALL SELECT 'suiteB', '$CanaryLineB'),
           |rtk AS (SELECT suite, string_split(rt, ' ') AS tk FROM r),
           |rg AS (SELECT DISTINCT suite, array_to_string(tk[i:i+12], ' ') AS g
           |  FROM rtk, unnest(range(1, len(tk) - 11)) AS u(i)),
           |dtk AS (SELECT doc_id, string_split(t, ' ') AS tk FROM d),
           |dg AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+12], ' ') AS g
           |  FROM dtk, unnest(range(1, len(tk) - 11)) AS u(i))
           |SELECT doc_id, suite, CAST(COUNT(*) AS BIGINT) AS n_gram_hits
           |FROM dg JOIN rg USING (g) GROUP BY 1, 2 ORDER BY doc_id, suite""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Eval-leakage guard (hashSplit -> decontaminateNearDup): in-corpus
    // train/test leakage — after splitting ONE corpus, near-duplicates
    // of test docs must leave the train split or the eval is
    // contaminated by construction (the within-corpus counterpart of
    // x109's external decontamination). Planted leakage: every %11 doc
    // gets a near-dup twin at id+1e8 (above any sf10-amplified id);
    // twin and original hash to INDEPENDENT md5 split buckets, so some
    // twins land train while their original lands test — exactly the
    // pairs the scrub must catch. The oracle replays the split buckets,
    // both minhash pipelines, the band join, the 1/8-exact agreement
    // confirm and the anti-join.
    Q(
      "x158_split_leakage",
      (s, d) => {
        val docs = t(s, d, "documents")
        val twins = docs
          .filter(col("doc_id") % 11 === 0)
          .select(
            (col("doc_id") + 100000000L).as("doc_id"),
            concat(col("text"), lit(" ztwin zleak")).as("text"),
            col("n_chars"))
        val corpus = docs.select("doc_id", "text", "n_chars").unionByName(twins)
        val sp = Scale.hashSplit(
          corpus, Seq("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        Dedup
          .decontaminateNearDup(
            sp.filter(col("split") === "train").drop("split"),
            sp.filter(col("split") === "test").drop("split"),
            "doc_id",
            "text")
          .select(col("doc_id"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text, n_chars FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000000, text || ' ztwin zleak', n_chars
             |    FROM documents WHERE doc_id % 11 = 0),
             |sp AS MATERIALIZED (SELECT doc_id, text, n_chars,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15) AS BIGINT) % 1000 AS hb
             |  FROM corpus),
             |tr AS (SELECT * FROM sp WHERE hb < 800),
             |te AS (SELECT * FROM sp WHERE hb >= 900),
             |toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM tr),
             |sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
             |       FROM toks, unnest(range(1, len(tk) - 1)) AS t(i)),
             |tok AS (SELECT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) % ${Dedup.MinhashHashMod} + 1 AS h FROM sh),
             |sig AS MATERIALIZED (SELECT doc_id, $minhashMins FROM tok GROUP BY 1),
             |rtoks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM te),
             |rsh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
             |        FROM rtoks, unnest(range(1, len(tk) - 1)) AS t(i)),
             |rtok AS (SELECT doc_id, CAST('0x' || substr(md5(s), 18, 15) AS BIGINT) % ${Dedup.MinhashHashMod} + 1 AS h FROM rsh),
             |rsig AS MATERIALIZED (SELECT doc_id, $minhashMins FROM rtok GROUP BY 1),
             |bands AS (
             |  SELECT doc_id, 0 AS band, m0*100000+m1 AS bh FROM sig UNION ALL
             |  SELECT doc_id, 1, m2*100000+m3 FROM sig UNION ALL
             |  SELECT doc_id, 2, m4*100000+m5 FROM sig UNION ALL
             |  SELECT doc_id, 3, m6*100000+m7 FROM sig),
             |rbands AS (
             |  SELECT doc_id, 0 AS band, m0*100000+m1 AS bh FROM rsig UNION ALL
             |  SELECT doc_id, 1, m2*100000+m3 FROM rsig UNION ALL
             |  SELECT doc_id, 2, m4*100000+m5 FROM rsig UNION ALL
             |  SELECT doc_id, 3, m6*100000+m7 FROM rsig),
             |cand AS (SELECT DISTINCT c.doc_id AS cid, r.doc_id AS rid
             |  FROM bands c JOIN rbands r ON c.band = r.band AND c.bh = r.bh),
             |bad AS (SELECT DISTINCT cand.cid AS doc_id
             |  FROM cand JOIN sig cs ON cs.doc_id = cand.cid
             |  JOIN rsig rs ON rs.doc_id = cand.rid
             |  WHERE CAST(${(0 until 8)
              .map(i => s"(CASE WHEN cs.m$i = rs.m$i THEN 1 ELSE 0 END)")
              .mkString(" + ")} AS DOUBLE) / 8 >= 0.5)
             |SELECT doc_id, n_chars FROM tr
             |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
             |ORDER BY doc_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Incremental LM artifact CROSS-ENGINE (mergeBigramLm): the engine
    // trains on two reference halves SEPARATELY and scores under the
    // MERGED model; the oracle trains on the union in one pass. The
    // merge == retrain additivity is already spec-pinned engine-side —
    // this row pins it against an independent engine: any count the
    // merge loses or double-folds breaks the hash. This is the contract
    // that lets a 100 TB deployment fold each day's reference batch
    // into the stored model without rescanning history.
    Q(
      "x159_lm_incremental",
      (s, d) => {
        val docs = t(s, d, "documents")
        val en = docs.filter(col("lang") === "en")
        val merged = TextAnalysis.mergeBigramLm(
          TextAnalysis.trainBigramLm(en.filter(col("doc_id") % 2 === 0), "doc_id", "text"),
          TextAnalysis.trainBigramLm(en.filter(col("doc_id") % 2 =!= 0), "doc_id", "text"))
        TextAnalysis.perplexityScore(docs, merged, "doc_id", "text").orderBy("doc_id")
      },
      Some(
        s"""$bigramLmSqlPrefix,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1)
           |SELECT doc_id, n_tokens, nll_q20,
           |  CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce_bits
           |FROM ag ORDER BY doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // PER-LANGUAGE excess-perplexity selection (x150's RHO-1 signal with
    // keyCols = lang + the bounded topKPerKey heap): both the trusted
    // reference (fit on source='src0', per lang — the x137 setup) and
    // the self model (fit on the whole corpus, per lang) resolve within
    // the language, so the excess ranking is comparable WITHIN each
    // language even though perplexity scales differ across them (the
    // CCNet argument, applied to selection). Top-20 per language via the
    // map-side k-element heap — never a per-language window sort of the
    // corpus; the desc-struct heap tie-breaks on the NEGATED id, i.e.
    // smallest doc_id wins ties, matching the oracle's ORDER BY.
    Q(
      "x160_excess_lang",
      (s, d) => {
        val docs = t(s, d, "documents")
        val ref = TextAnalysis.trainBigramLm(
          docs.filter(col("source") === "src0"), "doc_id", "text", Seq("lang"))
        val self = TextAnalysis.trainBigramLm(docs, "doc_id", "text", Seq("lang"))
        Relational
          .topKPerKey(
            TextAnalysis
              .excessPerplexity(docs, ref, self, "doc_id", "text", Seq("lang"))
              .join(docs.select("doc_id", "lang"), Seq("doc_id")),
            Seq("lang"),
            struct(col("excess_bits").as("excess_bits"), (-col("doc_id")).as("__nid")),
            20
          )
          .select(col("lang"), col("rk"), col("excess_bits"), (-col("__nid")).as("doc_id"))
          .orderBy("lang", "rk")
      },
      Some(
        s"""WITH RECURSIVE
           |rtk AS (SELECT lang, string_split(text, ' ') AS ts FROM documents
           |  WHERE source = 'src0'),
           |rar AS (SELECT lang, list_prepend(chr(1), ts) AS arr FROM rtk),
           |rbg AS (SELECT lang, unnest(arr[1:len(arr)-1]) AS prev,
           |    unnest(arr[2:len(arr)]) AS tok FROM rar),
           |rm AS MATERIALIZED (SELECT lang, prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM rbg GROUP BY 1, 2, 3),
           |rcx AS MATERIALIZED (SELECT lang, prev, CAST(SUM(cnt) AS BIGINT) AS ctx
           |  FROM rm GROUP BY 1, 2),
           |rvv AS MATERIALIZED (SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
           |  FROM rm GROUP BY 1),
           |stk AS (SELECT lang, string_split(text, ' ') AS ts FROM documents),
           |sar AS (SELECT lang, list_prepend(chr(1), ts) AS arr FROM stk),
           |sbg AS (SELECT lang, unnest(arr[1:len(arr)-1]) AS prev,
           |    unnest(arr[2:len(arr)]) AS tok FROM sar),
           |sm AS MATERIALIZED (SELECT lang, prev, tok, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM sbg GROUP BY 1, 2, 3),
           |scx AS MATERIALIZED (SELECT lang, prev, CAST(SUM(cnt) AS BIGINT) AS ctx
           |  FROM sm GROUP BY 1, 2),
           |svv AS MATERIALIZED (SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
           |  FROM sm GROUP BY 1),
           |tkd AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
           |aad AS (SELECT doc_id, lang, list_prepend(chr(1), ts) AS arr FROM tkd),
           |bgd AS (SELECT doc_id, lang, unnest(arr[1:len(arr)-1]) AS prev,
           |    unnest(arr[2:len(arr)]) AS tok FROM aad),
           |pt AS MATERIALIZED (
           |  SELECT b.doc_id, 'r' AS side, COALESCE(rm.cnt, 0) + 1 AS num,
           |      COALESCE(rcx.ctx, 0) + rvv.v AS den, CAST(0 AS BIGINT) AS adq
           |    FROM bgd b JOIN rvv USING (lang)
           |    LEFT JOIN rm ON rm.lang = b.lang AND rm.prev = b.prev AND rm.tok = b.tok
           |    LEFT JOIN rcx ON rcx.lang = b.lang AND rcx.prev = b.prev
           |  UNION ALL
           |  SELECT b.doc_id, 's', COALESCE(sm.cnt, 0) + 1,
           |      COALESCE(scx.ctx, 0) + svv.v, CAST(0 AS BIGINT)
           |    FROM bgd b JOIN svv USING (lang)
           |    LEFT JOIN sm ON sm.lang = b.lang AND sm.prev = b.prev AND sm.tok = b.tok
           |    LEFT JOIN scx ON scx.lang = b.lang AND scx.prev = b.prev),
           |${lmLogReplayCtesCols(", pt.side")},
           |ag AS (SELECT doc_id, side, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nllq FROM nl GROUP BY 1, 2),
           |rr AS (SELECT doc_id, n_tokens, nllq FROM ag WHERE side = 'r'),
           |ss AS (SELECT doc_id, nllq FROM ag WHERE side = 's'),
           |j AS (SELECT rr.doc_id,
           |    CAST(ss.nllq // rr.n_tokens AS DOUBLE) / 1048576.0
           |      - CAST(rr.nllq // rr.n_tokens AS DOUBLE) / 1048576.0 AS excess_bits
           |  FROM rr JOIN ss USING (doc_id)),
           |rkd AS (SELECT d.lang, j.doc_id, j.excess_bits,
           |    CAST(row_number() OVER (PARTITION BY d.lang
           |      ORDER BY j.excess_bits DESC, j.doc_id) AS INTEGER) AS rk
           |  FROM j JOIN documents d USING (doc_id))
           |SELECT lang, rk, excess_bits, doc_id FROM rkd
           |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Incremental TRIGRAM artifact CROSS-ENGINE (mergeTrigramLm — closing
    // x159's symmetry for the stupid-backoff model): the engine trains
    // trigram counts on two reference halves separately and scores under
    // the MERGED table; the oracle trains on the union. Because the
    // lower orders (bigram/unigram/context totals) all DERIVE from the
    // one trigram table by summation, a merge error anywhere corrupts
    // every backoff level — the hash pins all of them at once.
    Q(
      "x161_backoff_incremental",
      (s, d) => {
        val docs = t(s, d, "documents")
        val en = docs.filter(col("lang") === "en")
        val merged = TextAnalysis.mergeTrigramLm(
          TextAnalysis.trainTrigramLm(en.filter(col("doc_id") % 2 === 0), "doc_id", "text"),
          TextAnalysis.trainTrigramLm(en.filter(col("doc_id") % 2 =!= 0), "doc_id", "text"))
        TextAnalysis.scoreStupidBackoff(docs, merged, "doc_id", "text").orderBy("doc_id")
      },
      Some(
        s"""WITH RECURSIVE
           |tkr AS (SELECT string_split(text, ' ') AS ts FROM documents WHERE lang = 'en'),
           |ar AS (SELECT list_prepend(chr(1), list_prepend(chr(1), ts)) AS arr FROM tkr),
           |g3 AS (SELECT unnest(arr[1:len(arr)-2]) AS p2, unnest(arr[2:len(arr)-1]) AS p1,
           |    unnest(arr[3:len(arr)]) AS t FROM ar),
           |t3 AS MATERIALIZED (SELECT p2, p1, t, CAST(COUNT(*) AS BIGINT) AS c3
           |  FROM g3 GROUP BY 1, 2, 3),
           |b2 AS MATERIALIZED (SELECT p1, t, CAST(SUM(c3) AS BIGINT) AS c2 FROM t3 GROUP BY 1, 2),
           |u1 AS MATERIALIZED (SELECT t, CAST(SUM(c2) AS BIGINT) AS c1 FROM b2 GROUP BY 1),
           |x3 AS MATERIALIZED (SELECT p2, p1, CAST(SUM(c3) AS BIGINT) AS x3 FROM t3 GROUP BY 1, 2),
           |x2 AS MATERIALIZED (SELECT p1, CAST(SUM(c2) AS BIGINT) AS x2 FROM b2 GROUP BY 1),
           |nv AS (SELECT CAST(SUM(c1) + COUNT(DISTINCT t) AS BIGINT) AS nv FROM u1),
           |tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
           |aa AS (SELECT doc_id, list_prepend(chr(1), list_prepend(chr(1), ts)) AS arr FROM tk),
           |bg AS (SELECT doc_id, unnest(arr[1:len(arr)-2]) AS p2,
           |    unnest(arr[2:len(arr)-1]) AS p1, unnest(arr[3:len(arr)]) AS t FROM aa),
           |pt AS MATERIALIZED (SELECT b.doc_id,
           |    CASE WHEN t3.c3 IS NOT NULL THEN t3.c3
           |      WHEN b2.c2 IS NOT NULL THEN b2.c2
           |      ELSE COALESCE(u1.c1, 0) + 1 END AS num,
           |    CASE WHEN t3.c3 IS NOT NULL THEN x3.x3
           |      WHEN b2.c2 IS NOT NULL THEN x2.x2
           |      ELSE (SELECT nv FROM nv) END AS den,
           |    CAST(CASE WHEN t3.c3 IS NOT NULL THEN 0
           |      WHEN b2.c2 IS NOT NULL THEN 1048576 ELSE 2097152 END AS BIGINT) AS adq
           |  FROM bg b
           |  LEFT JOIN t3 ON t3.p2 = b.p2 AND t3.p1 = b.p1 AND t3.t = b.t
           |  LEFT JOIN x3 ON x3.p2 = b.p2 AND x3.p1 = b.p1
           |  LEFT JOIN b2 ON b2.p1 = b.p1 AND b2.t = b.t
           |  LEFT JOIN x2 ON x2.p1 = b.p1
           |  LEFT JOIN u1 ON u1.t = b.t),
           |$lmLogReplayCtes,
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1)
           |SELECT doc_id, n_tokens, nll_q20,
           |  CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce_bits
           |FROM ag ORDER BY doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Curriculum-ordered token budget (curriculumInterleave ∘
    // selectByBudget): take the FIRST ~20k tokens of the round-robin
    // curriculum — the "train the first epoch slice in curriculum
    // order" cut. The curriculum position coarse-grids into 256 tiers
    // (selectByBudget's documented grid-valued-score contract — a
    // per-doc rank as the score would put N distinct values through
    // the driver histogram); whole earliest tiers fill first, the
    // boundary tier resolves by doc id (the operator's documented
    // boundary rule). Oracle = the greedy (tier, id) prefix with
    // cumulative tokens <= budget, on top of the x152 window replay.
    Q(
      "x162_curriculum_budget",
      (s, d) => {
        val docs0 = t(s, d, "documents")
          .select(
            col("doc_id"),
            col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        val cur = Scale.curriculumInterleave(docs0, "doc_id", "n_tokens", "source")
        val n1 = cur.agg((count(lit(1)) + 1L).as("__n1"))
        val tiered = cur
          .crossJoin(broadcast(n1))
          .withColumn("tier", expr("(pos * 256) div __n1"))
          .withColumn("score", -col("tier"))
        Scale
          // materializeInput: the budget walk takes several actions
          // (histogram collect, boundary quantiles, final filter) — without
          // it each one would replay the whole curriculum window chain
          .selectByBudget(tiered, "doc_id", "score", "n_tokens", 20000L,
            materializeInput = true)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("pos"), col("tier"))
          .orderBy("pos")
      },
      Some(
        """WITH d AS (SELECT doc_id, source,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
          |r AS (SELECT doc_id, source, n_tokens,
          |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id)
          |      AS BIGINT) AS rn FROM d),
          |p AS (SELECT doc_id, source, n_tokens,
          |    CAST(row_number() OVER (ORDER BY rn, source) AS BIGINT) AS pos FROM r),
          |nn AS (SELECT COUNT(*) + 1 AS n1 FROM p),
          |tr2 AS (SELECT p.*, (pos * 256) // n1 AS tier FROM p CROSS JOIN nn),
          |c AS (SELECT doc_id, source, n_tokens, pos, tier,
          |    SUM(n_tokens) OVER (ORDER BY tier, doc_id ROWS UNBOUNDED PRECEDING) AS cum
          |  FROM tr2)
          |SELECT doc_id, source, n_tokens, pos, tier FROM c
          |WHERE cum <= 20000 ORDER BY pos""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Which source ships boilerplate (ngramNovelty per source): x151's
    // per-doc novelty aggregated to the per-source report a curation
    // run publishes. The ratio is the MICRO-average over exact integer
    // sums (one double division per source — deterministic), NOT a mean
    // of the per-doc 6-dp ratios (summing rounded doubles is
    // aggregation-order dependent); the low tail counts docs under 0.5
    // on the per-doc rounded value both engines already hash-agree on.
    Q(
      "x163_source_novelty",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup
          .ngramNovelty(docs, "doc_id", "text")
          .join(docs.select("doc_id", "source"), Seq("doc_id"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_shingles").as("n_shingles"),
            sum("novel_shingles").as("novel_shingles"),
            round(sum("novel_shingles").cast("double") / sum("n_shingles"), 6)
              .as("novelty_micro"),
            sum(when(col("novelty") < 0.5, 1L).otherwise(0L)).as("n_low")
          )
          .orderBy("source")
      },
      Some(
        s"""WITH $shingleCte,
           |df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
           |nv AS (SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           |    CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel_shingles,
           |    round(CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           |      / COUNT(*), 6) AS novelty
           |  FROM sh JOIN df USING (s) GROUP BY 1)
           |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(nv.n_shingles) AS BIGINT) AS n_shingles,
           |  CAST(SUM(nv.novel_shingles) AS BIGINT) AS novel_shingles,
           |  round(CAST(SUM(nv.novel_shingles) AS DOUBLE) / SUM(nv.n_shingles), 6)
           |    AS novelty_micro,
           |  CAST(SUM(CASE WHEN nv.novelty < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
           |FROM nv JOIN documents d USING (doc_id)
           |GROUP BY 1 ORDER BY source""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // CCNet buckets under Witten–Bell (perplexityBuckets smoothing="wb"
    // — the bucket composition now reaches all four smoothers; this row
    // pins the jm/wb routing cross-engine): x136's per-language tercile
    // machinery over x149's WB per-token replay — same model artifact,
    // same HUGEINT ladder, same boundary formula.
    Q(
      "x164_wb_buckets",
      (s, d) => {
        val docs = t(s, d, "documents")
        val model =
          TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
        TextAnalysis
          .perplexityBuckets(docs, model, "doc_id", "text", "lang",
            exact = true, smoothing = "wb")
          .select(col("doc_id"), col("lang"), col("ce_bits"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(
        s"""${contSqlPrefix(
            """    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN
              |      CAST(COALESCE(m.cnt, 0) AS HUGEINT) * (gq.t + gq.v)
              |      + CAST(cx.nv AS HUGEINT) * (COALESCE(cw.cw, 0) + 1)
              |    ELSE CAST(COALESCE(cw.cw, 0) + 1 AS HUGEINT) END AS num,
              |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN cx.ctx + cx.nv
              |      ELSE gq.t + gq.v END AS den1,
              |    CASE WHEN COALESCE(cx.ctx, 0) > 0 THEN gq.t + gq.v
              |      ELSE CAST(1 AS BIGINT) END AS den2,
              |    CAST(0 AS BIGINT) AS adq""".stripMargin
          )},
           |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |    CAST(SUM(nll) AS BIGINT) AS nll_q20 FROM nl GROUP BY 1),
           |sc AS MATERIALIZED (SELECT ag.doc_id, d.lang,
           |    CAST(nll_q20 // n_tokens AS DOUBLE) / 1048576.0 AS ce
           |  FROM ag JOIN documents d USING (doc_id)),
           |vs AS (SELECT lang, list_sort(list(ce)) AS v, COUNT(*) AS n FROM sc GROUP BY 1),
           |ps AS (SELECT lang, v, CAST(1 AS DOUBLE) / 3 * (n - 1) AS p1,
           |    CAST(2 AS DOUBLE) / 3 * (n - 1) AS p2 FROM vs),
           |bd AS (SELECT lang,
           |  CASE WHEN ceil(p1) = floor(p1)
           |      OR v[CAST(floor(p1) AS BIGINT) + 1] = v[CAST(ceil(p1) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p1) AS BIGINT) + 1]
           |    ELSE (ceil(p1) - p1) * v[CAST(floor(p1) AS BIGINT) + 1]
           |      + (p1 - floor(p1)) * v[CAST(ceil(p1) AS BIGINT) + 1] END AS blo,
           |  CASE WHEN ceil(p2) = floor(p2)
           |      OR v[CAST(floor(p2) AS BIGINT) + 1] = v[CAST(ceil(p2) AS BIGINT) + 1]
           |    THEN v[CAST(floor(p2) AS BIGINT) + 1]
           |    ELSE (ceil(p2) - p2) * v[CAST(floor(p2) AS BIGINT) + 1]
           |      + (p2 - floor(p2)) * v[CAST(ceil(p2) AS BIGINT) + 1] END AS bhi
           |  FROM ps)
           |SELECT sc.doc_id, sc.lang, sc.ce AS ce_bits,
           |  CASE WHEN sc.ce <= bd.blo THEN 'head'
           |    WHEN sc.ce <= bd.bhi THEN 'middle' ELSE 'tail' END AS bucket
           |FROM sc JOIN bd USING (lang) ORDER BY sc.doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Multi-epoch curriculum budget (VERDICT r17 Next #5 — x162's
    // first-epoch slice extended past one corpus pass): budget = 2.5
    // corpus epochs, exact integers from ONE 1-row aggregate, so the
    // budget genuinely spans 2 full epochs + a half-corpus partial at
    // EVERY scale factor. Epochs repeat the x162 tier ramp; within a
    // tier each epoch reads docs in a fresh md5-keyed deterministic
    // order (the x39/x63 hash convention, replayed verbatim by the
    // oracle); the partial epoch fills whole earliest tiers first and
    // cuts the boundary tier by that epoch's shuffle order. The oracle
    // IS the naive definition — per-epoch greedy prefix over
    // (tier, shuffle_key, doc_id) with a window cumsum — so the
    // engine's two-level driver walk + closed-form positions are pinned
    // against the formulation they exist to avoid.
    Q(
      "x165_epoch_budget",
      (s, d) => {
        val docs0 = t(s, d, "documents")
          .select(
            col("doc_id"),
            col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        // 2.5 epochs: (5T) div 2 — derived inside the operator from its
        // own (n, total) aggregate (no separate corpus-tokenizing job)
        Scale
          .curriculumEpochs(docs0, "doc_id", "n_tokens", "n_tokens", "source",
            (_, t) => t * 5L / 2L, tiers = 256, maxEpochs = 16, maxSources = 1000)
          .orderBy("epoch", "pos")
      },
      Some(
        """WITH d AS (SELECT doc_id, source,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
          |r AS (SELECT doc_id, source, n_tokens,
          |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id)
          |      AS BIGINT) AS rn FROM d),
          |p AS (SELECT doc_id, source, n_tokens,
          |    CAST(row_number() OVER (ORDER BY rn, source) AS BIGINT) AS pos0 FROM r),
          |nn AS (SELECT COUNT(*) + 1 AS n1, SUM(n_tokens) AS t FROM p),
          |b AS (SELECT t, (t * 5) // 2 AS budget, ((t * 5) // 2) // t AS k,
          |    (t * 5) // 2 - ((t * 5) // 2) // t * t AS rem FROM nn),
          |tr AS (SELECT p.*, (pos0 * 256) // n1 AS tier FROM p CROSS JOIN nn),
          |eps AS (SELECT unnest(generate_series(0,
          |    CAST((SELECT k FROM b) AS BIGINT))) AS epoch),
          |x AS (SELECT tr.*, eps.epoch,
          |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
          |      CAST(epoch AS VARCHAR)), 18, 15) AS BIGINT) AS shuffle_key
          |  FROM tr CROSS JOIN eps),
          |c AS (SELECT x.*, SUM(n_tokens) OVER (PARTITION BY epoch
          |    ORDER BY tier, shuffle_key, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM x),
          |f AS (SELECT doc_id, source, n_tokens, epoch, tier, shuffle_key FROM c, b
          |  WHERE epoch < b.k OR cum <= b.rem)
          |SELECT doc_id, source, n_tokens, epoch, tier, shuffle_key,
          |  CAST(row_number() OVER (PARTITION BY epoch
          |    ORDER BY tier, shuffle_key, doc_id) AS BIGINT) AS pos
          |FROM f ORDER BY epoch, pos""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // The per-source corpus DATASHEET (VERDICT r17 Next #6): the audit
    // surfaces that exist piecemeal (x126 domain stats, x163 source
    // novelty, x157 contamination, x92 funnel) composed into the report
    // card a lab publishes beside a released corpus — docs, tokens,
    // language mix, quality-gate share, contamination exposure, novelty
    // micro-average — ONE row per source from ONE corpus read (the
    // per-doc frame is materialized once; the plan-contract spec pins
    // zero parquet scans in the final plan). The corpus reuses x157's
    // planted canary transform so contamination is non-trivially > 0 and
    // the novelty tail sees heavy shared shingles.
    Q(
      "x166_datasheet",
      (s, d) => {
        import s.implicits._
        val dirty = t(s, d, "documents")
          .withColumn(
            "text",
            when(col("doc_id") % 35 === 16,
              concat(col("text"), lit(" " + CanaryLine + " " + CanaryLineB)))
              .when(col("doc_id") % 5 === 1, concat(col("text"), lit(" " + CanaryLine)))
              .when(col("doc_id") % 7 === 2, concat(col("text"), lit(" " + CanaryLineB)))
              .otherwise(col("text"))
          )
        val suites = Seq(("suiteA", CanaryLine), ("suiteB", CanaryLineB)).toDF("suite", "text")
        Pipeline
          .corpusDatasheet(dirty, suites, "doc_id", "text", "source", "lang", "suite")
          .orderBy("source")
      },
      Some(
        s"""WITH d AS (SELECT doc_id, source, lang,
           |    CASE WHEN doc_id % 35 = 16 THEN text || ' $CanaryLine $CanaryLineB'
           |      WHEN doc_id % 5 = 1 THEN text || ' $CanaryLine'
           |      WHEN doc_id % 7 = 2 THEN text || ' $CanaryLineB'
           |      ELSE text END AS text
           |  FROM documents),
           |${shingleCteFrom("d")},
           |df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
           |nv AS (SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS nsh,
           |    CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nvl
           |  FROM sh JOIN df USING (s) GROUP BY 1),
           |r AS (SELECT '$CanaryLine' AS rt UNION ALL SELECT '$CanaryLineB'),
           |rtk AS (SELECT string_split(rt, ' ') AS tk FROM r),
           |rg AS (SELECT DISTINCT array_to_string(tk[i:i+12], ' ') AS g
           |  FROM rtk, unnest(range(1, len(tk) - 11)) AS u(i)),
           |dtk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM d),
           |dg AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+12], ' ') AS g
           |  FROM dtk, unnest(range(1, len(tk) - 11)) AS u(i)),
           |cn AS (SELECT DISTINCT doc_id, TRUE AS contam FROM dg JOIN rg USING (g)),
           |q AS (SELECT doc_id, source, lang,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
           |    round(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
           |      + 0.5 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
           |          / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0), 6) >= 0.6 AS ok
           |  FROM d),
           |pl AS (SELECT source, lang, COUNT(*) AS docs, SUM(nt) AS toks,
           |    SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS nq,
           |    SUM(CASE WHEN COALESCE(contam, FALSE) THEN 1 ELSE 0 END) AS nc,
           |    SUM(COALESCE(nv.nsh, 0)) AS sh2, SUM(COALESCE(nv.nvl, 0)) AS nvl2
           |  FROM q LEFT JOIN nv USING (doc_id) LEFT JOIN cn USING (doc_id)
           |  GROUP BY 1, 2)
           |SELECT source, CAST(SUM(docs) AS BIGINT) AS n_docs,
           |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
           |  CAST(COUNT(*) AS BIGINT) AS n_langs,
           |  (max(struct_pack(d := docs, l := lang))).l AS top_lang,
           |  CAST(SUM(nq) AS BIGINT) AS n_quality,
           |  round(CAST(SUM(nq) AS DOUBLE) / CAST(SUM(docs) AS DOUBLE), 6) AS quality_share,
           |  CAST(SUM(nc) AS BIGINT) AS n_contaminated,
           |  CASE WHEN SUM(sh2) > 0 THEN
           |    round(CAST(SUM(nvl2) AS DOUBLE) / CAST(SUM(sh2) AS DOUBLE), 6)
           |  END AS novelty_micro
           |FROM pl GROUP BY 1 ORDER BY source""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // The datasheet DIFF — the before/after card a lab publishes showing
    // what curation changed, per source: the canary-dirty corpus runs
    // quality gate -> exact dedup -> 13-gram decontamination AGAINST THE
    // SAME SUITES the datasheet measures, so the after-card's
    // contamination column is provably ZERO — the report card proves the
    // scrub. kept_share / token deltas / novelty movement are the
    // curation summary; both cards are corpusDatasheet's one-read shape.
    Q(
      "x167_datasheet_diff",
      (s, d) => {
        import s.implicits._
        val dirty = tw(s, d, "documents")
          .withColumn(
            "text",
            when(col("doc_id") % 35 === 16,
              concat(col("text"), lit(" " + CanaryLine + " " + CanaryLineB)))
              .when(col("doc_id") % 5 === 1, concat(col("text"), lit(" " + CanaryLine)))
              .when(col("doc_id") % 7 === 2, concat(col("text"), lit(" " + CanaryLineB)))
              .otherwise(col("text"))
          )
        val suites = Seq(("suiteA", CanaryLine), ("suiteB", CanaryLineB)).toDF("suite", "text")
        val gated = dirty.filter(TextAnalysis.qualityExpr(col("text")) >= 0.6)
        val deduped = Dedup.exact(gated, Seq("text"), "doc_id")
        val scrubbed = Dedup.decontaminateNgram(deduped, suites, "doc_id", "text")
        def card(corpus: org.apache.spark.sql.DataFrame) =
          Pipeline.corpusDatasheet(corpus, suites, "doc_id", "text", "source", "lang", "suite")
        val b = card(dirty).select(
          col("source"),
          col("n_docs").as("docs_before"),
          col("n_tokens").as("tokens_before"),
          col("n_contaminated").as("contam_before"),
          col("novelty_micro").as("novelty_before"))
        val a = card(scrubbed).select(
          col("source"),
          col("n_docs").as("__da"),
          col("n_tokens").as("__ta"),
          col("n_contaminated").as("__ca"),
          col("novelty_micro").as("novelty_after"))
        b.join(a, Seq("source"), "left")
          .select(
            col("source"),
            col("docs_before"),
            coalesce(col("__da"), lit(0L)).as("docs_after"),
            round(coalesce(col("__da"), lit(0L)).cast("double")
              / col("docs_before").cast("double"), 6).as("kept_share"),
            col("tokens_before"),
            coalesce(col("__ta"), lit(0L)).as("tokens_after"),
            col("contam_before"),
            coalesce(col("__ca"), lit(0L)).as("contam_after"),
            col("novelty_before"),
            col("novelty_after"))
          .orderBy("source")
      },
      Some {
        val quality =
          """round(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
            |  + 0.5 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
            |      / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0), 6)""".stripMargin
        s"""WITH d AS (SELECT doc_id, source, lang,
           |    CASE WHEN doc_id % 35 = 16 THEN text || ' $CanaryLine $CanaryLineB'
           |      WHEN doc_id % 5 = 1 THEN text || ' $CanaryLine'
           |      WHEN doc_id % 7 = 2 THEN text || ' $CanaryLineB'
           |      ELSE text END AS text
           |  FROM documents),
           |r AS (SELECT '$CanaryLine' AS rt UNION ALL SELECT '$CanaryLineB'),
           |rtk AS (SELECT string_split(rt, ' ') AS tk FROM r),
           |rg AS (SELECT DISTINCT array_to_string(tk[i:i+12], ' ') AS g
           |  FROM rtk, unnest(range(1, len(tk) - 11)) AS u(i)),
           |${datasheetSqlCtes("d", "b")},
           |passed AS (SELECT doc_id, source, lang, text FROM d WHERE $quality >= 0.6),
           |ded AS (SELECT doc_id, source, lang, text FROM (
           |  SELECT doc_id, source, lang, text,
           |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           |  FROM passed) t WHERE rn = 1),
           |dtk2 AS (SELECT doc_id, string_split(text, ' ') AS tk FROM ded),
           |sg AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+12], ' ') AS g
           |  FROM dtk2, unnest(range(1, len(tk) - 11)) AS u(i)),
           |badids AS (SELECT DISTINCT sg.doc_id FROM sg JOIN rg USING (g)),
           |scrub AS (SELECT * FROM ded WHERE doc_id NOT IN (SELECT doc_id FROM badids)),
           |${datasheetSqlCtes("scrub", "a")}
           |SELECT b.source, b.n_docs AS docs_before,
           |  COALESCE(a.n_docs, 0) AS docs_after,
           |  round(COALESCE(a.n_docs, 0) / CAST(b.n_docs AS DOUBLE), 6) AS kept_share,
           |  b.n_tokens AS tokens_before, COALESCE(a.n_tokens, 0) AS tokens_after,
           |  b.n_contaminated AS contam_before,
           |  COALESCE(a.n_contaminated, 0) AS contam_after,
           |  b.novelty_micro AS novelty_before, a.novelty_micro AS novelty_after
           |FROM bds b LEFT JOIN ads a USING (source) ORDER BY source""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // Cross-source duplication overlap matrix (Dedup.sourceOverlap):
    // which source PAIRS ship each other's content — the crawl-snapshot
    // overlap audit — with the diagonal as each source's internal
    // near-dup load. Near-dup pairs = the x77 signature-agreement
    // estimate at the 4/8 cut, aggregated per unordered source pair;
    // the oracle replays the full minhash pipeline + agreement + the
    // least/greatest pair normalization.
    Q(
      "x168_source_overlap",
      (s, d) =>
        Dedup
          .sourceOverlap(t(s, d, "documents"), "doc_id", "text", "source")
          .orderBy("source_a", "source_b"),
      Some(s"""WITH $shingleCte,
              |$minhashCtes,
              |est AS (SELECT c.d1, c.d2,
              |  CAST(${(0 until 8).map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")}
              |    AS DOUBLE) / CAST(8 AS DOUBLE) AS est_j
              |  FROM cand c JOIN sig a ON a.doc_id = c.d1 JOIN sig b ON b.doc_id = c.d2),
              |pr AS (SELECT d1, d2 FROM est WHERE est_j >= 0.5),
              |sj AS (SELECT least(s1.source, s2.source) AS source_a,
              |    greatest(s1.source, s2.source) AS source_b
              |  FROM pr JOIN documents s1 ON s1.doc_id = pr.d1
              |          JOIN documents s2 ON s2.doc_id = pr.d2)
              |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
              |FROM sj GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Epoch-aware sequence packing (the round-18 seed): the x165 budget
    // stream — 2.5 corpus epochs in curriculum order with per-epoch
    // md5 reshuffles — packed into 1024-token context windows as ONE
    // continuous token stream (windows run straight across epoch
    // boundaries; a doc spilling a window continues into the next — the
    // packSequences contract, now spanning the whole training run). The
    // engine's per-epoch token prefix is the same closed-form family as
    // pos ((epoch, tier, bucket) aggregate + tiny offset window +
    // within-bucket running sum; epoch base = epoch · T from ONE scalar
    // aggregate); the oracle IS the naive definition — a per-epoch
    // window cumsum over (tier, shuffle_key, doc_id) plus epoch · T.
    Q(
      "x169_epoch_pack",
      (s, d) => {
        val docs0 = t(s, d, "documents")
          .select(
            col("doc_id"),
            col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        val asg = Scale.curriculumEpochs(
          docs0, "doc_id", "n_tokens", "n_tokens", "source",
          (_, t) => t * 5L / 2L, tiers = 256, maxEpochs = 16, maxSources = 1000)
        Scale
          .packEpochs(asg, "doc_id", "n_tokens", 1024)
          .select(
            "doc_id", "source", "n_tokens", "epoch", "pos",
            "stream_off", "seq_id", "seq_off")
          .orderBy("epoch", "pos")
      },
      Some(
        """WITH d AS (SELECT doc_id, source,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
          |r AS (SELECT doc_id, source, n_tokens,
          |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id)
          |      AS BIGINT) AS rn FROM d),
          |p AS (SELECT doc_id, source, n_tokens,
          |    CAST(row_number() OVER (ORDER BY rn, source) AS BIGINT) AS pos0 FROM r),
          |nn AS (SELECT COUNT(*) + 1 AS n1, SUM(n_tokens) AS t FROM p),
          |b AS (SELECT t, (t * 5) // 2 AS budget, ((t * 5) // 2) // t AS k,
          |    (t * 5) // 2 - ((t * 5) // 2) // t * t AS rem FROM nn),
          |tr AS (SELECT p.*, (pos0 * 256) // n1 AS tier FROM p CROSS JOIN nn),
          |eps AS (SELECT unnest(generate_series(0,
          |    CAST((SELECT k FROM b) AS BIGINT))) AS epoch),
          |x AS (SELECT tr.*, eps.epoch,
          |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
          |      CAST(epoch AS VARCHAR)), 18, 15) AS BIGINT) AS shuffle_key
          |  FROM tr CROSS JOIN eps),
          |c AS (SELECT x.*, SUM(n_tokens) OVER (PARTITION BY epoch
          |    ORDER BY tier, shuffle_key, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM x),
          |f AS (SELECT doc_id, source, n_tokens, epoch, tier, shuffle_key,
          |    epoch * (SELECT t FROM nn) + cum - n_tokens AS so
          |  FROM c, b WHERE epoch < b.k OR cum <= b.rem)
          |SELECT doc_id, source, n_tokens, epoch,
          |  CAST(row_number() OVER (PARTITION BY epoch
          |    ORDER BY tier, shuffle_key, doc_id) AS BIGINT) AS pos,
          |  CAST(so AS BIGINT) AS stream_off,
          |  CAST(so // 1024 AS BIGINT) AS seq_id,
          |  CAST(so % 1024 AS BIGINT) AS seq_off
          |FROM f ORDER BY epoch, pos""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // UniMax budget allocation (Scale.unimaxMix — Chung et al., ICLR
    // 2023): the epoch-capped alternative to x95's temperature mixing —
    // a total token budget waterfilled UNIFORMLY across sources, every
    // source capped at maxEpochs passes over its own data, the capped
    // surplus redistributed by the closed-form prefix predicate. Sources
    // are synthesized from doc_id residues (the x130 domain convention)
    // with shares ~1/16, 3/16, 4/16, 8/16 so a budget of 1.1 corpus
    // epochs at maxEpochs=2 provably caps the smallest source and
    // levels the rest AT EVERY SF (the binding predicate holds a >13%
    // margin against residue-class token jitter). The oracle evaluates
    // the same predicate independently per row with window prefix sums —
    // legal exactly because the predicate is prefix-closed, which is the
    // property the engine's first-failure break relies on.
    Q(
      "x170_unimax",
      (s, d) => {
        val res = col("doc_id") % 16
        val src = when(res === 0, lit("s0"))
          .when(res < 4, lit("s1"))
          .when(res < 8, lit("s2"))
          .otherwise(lit("s3"))
        val docs0 = t(s, d, "documents")
          .select(
            src.as("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        val totalT = docs0.agg(sum("n_tokens")).collect()(0).getLong(0)
        Scale
          .unimaxMix(docs0, "source", "n_tokens", totalT * 11L / 10L, maxEpochs = 2)
          .orderBy("source")
      },
      Some(
        """WITH d AS (SELECT
          |    CASE WHEN doc_id % 16 = 0 THEN 's0'
          |         WHEN doc_id % 16 < 4 THEN 's1'
          |         WHEN doc_id % 16 < 8 THEN 's2'
          |         ELSE 's3' END AS src,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |b AS (SELECT SUM(n_tokens) * 11 // 10 AS budget FROM d),
          |st AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n,
          |    SUM(n_tokens) AS t FROM d GROUP BY 1),
          |w AS (SELECT src, n, t, t * 2 AS cap,
          |    CAST(row_number() OVER (ORDER BY t, src) AS BIGINT) AS rk,
          |    COALESCE(SUM(t * 2) OVER (ORDER BY t, src
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
          |    CAST(COUNT(*) OVER () AS BIGINT) AS s
          |  FROM st),
          |c AS (SELECT w.*, cap * (s - rk + 1) + pre <= b.budget AS capped
          |  FROM w, b),
          |ag AS (SELECT COALESCE(SUM(cap) FILTER (capped), 0) AS csum,
          |    COALESCE(COUNT(*) FILTER (capped), 0) AS m, MAX(s) AS s FROM c),
          |sel AS (SELECT c.src, c.n, c.t, c.cap, c.capped,
          |    CASE WHEN c.capped THEN CAST(c.cap AS DOUBLE)
          |         ELSE CAST(b.budget - ag.csum AS DOUBLE)
          |           / CAST(ag.s - ag.m AS DOUBLE) END AS alloc
          |  FROM c, ag, b)
          |SELECT src AS source, n AS n_docs, CAST(t AS BIGINT) AS n_tokens,
          |  CAST(cap AS BIGINT) AS cap_tokens, capped,
          |  alloc AS alloc_tokens, alloc / CAST(t AS DOUBLE) AS epochs
          |FROM sel ORDER BY source""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // UniMax materialization (Scale.unimaxSelect — the x128/x132
    // optimize→apply pattern for x170's allocation): one (doc, epoch)
    // row per training pass. Per source the fractional allocation
    // becomes an integer budget (exact Long cap for capped sources,
    // floor(level) for uncapped) = k full passes + a partial epoch cut
    // by the md5 per-epoch shuffle order (the x165 reshuffle
    // convention). Same synthetic sources/budget as x170, so the three
    // allocation regimes all materialize: the capped small source ships
    // k=2 full epochs and NO tail, mid sources ship full epochs + a
    // greedy partial prefix, the big source is partial-only (k=0). The
    // oracle replays waterfill → integer split → generate_series full
    // epochs → per-source window prefix over (md5(id#k), id).
    Q(
      "x171_unimax_select",
      (s, d) => {
        val res = col("doc_id") % 16
        val src = when(res === 0, lit("s0"))
          .when(res < 4, lit("s1"))
          .when(res < 8, lit("s2"))
          .otherwise(lit("s3"))
        val docs0 = t(s, d, "documents")
          .select(
            col("doc_id"),
            src.as("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        val totalT = docs0.agg(sum("n_tokens")).collect()(0).getLong(0)
        Scale
          .unimaxSelect(docs0, "doc_id", "source", "n_tokens",
            totalT * 11L / 10L, maxEpochs = 2)
          .orderBy("source", "epoch", "doc_id")
      },
      Some(
        """WITH d AS (SELECT doc_id,
          |    CASE WHEN doc_id % 16 = 0 THEN 's0'
          |         WHEN doc_id % 16 < 4 THEN 's1'
          |         WHEN doc_id % 16 < 8 THEN 's2'
          |         ELSE 's3' END AS source,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |b AS (SELECT SUM(n_tokens) * 11 // 10 AS budget FROM d),
          |st AS (SELECT source, SUM(n_tokens) AS t FROM d GROUP BY 1),
          |w AS (SELECT source, t, t * 2 AS cap,
          |    CAST(row_number() OVER (ORDER BY t, source) AS BIGINT) AS rk,
          |    COALESCE(SUM(t * 2) OVER (ORDER BY t, source
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
          |    CAST(COUNT(*) OVER () AS BIGINT) AS s
          |  FROM st),
          |c AS (SELECT w.*, cap * (s - rk + 1) + pre <= b.budget AS capped
          |  FROM w, b),
          |ag AS (SELECT COALESCE(SUM(cap) FILTER (capped), 0) AS csum,
          |    COALESCE(COUNT(*) FILTER (capped), 0) AS m, MAX(s) AS s FROM c),
          |al AS (SELECT c.source, c.t,
          |    CASE WHEN c.capped THEN CAST(c.cap AS BIGINT)
          |         ELSE CAST(floor(CAST(b.budget - ag.csum AS DOUBLE)
          |           / CAST(ag.s - ag.m AS DOUBLE)) AS BIGINT) END AS at
          |  FROM c, ag, b),
          |ks AS (SELECT source, CAST(at // t AS BIGINT) AS k,
          |    CAST(at % t AS BIGINT) AS rem FROM al),
          |fe AS (SELECT d.doc_id, d.source, d.n_tokens,
          |    unnest(generate_series(0, ks.k - 1)) AS epoch
          |  FROM d JOIN ks USING (source) WHERE ks.k > 0),
          |pk AS (SELECT d.doc_id, d.source, d.n_tokens, ks.k, ks.rem,
          |    CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#' ||
          |      CAST(ks.k AS VARCHAR)), 18, 15) AS BIGINT) AS ek
          |  FROM d JOIN ks USING (source) WHERE ks.rem > 0),
          |pc AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY source
          |    ORDER BY ek, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM pk),
          |pe AS (SELECT doc_id, source, n_tokens, k AS epoch FROM pc
          |  WHERE cum <= rem)
          |SELECT doc_id, source, n_tokens, CAST(epoch AS BIGINT) AS epoch FROM fe
          |UNION ALL
          |SELECT doc_id, source, n_tokens, CAST(epoch AS BIGINT) AS epoch FROM pe
          |ORDER BY source, epoch, doc_id""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // Two-phase anneal schedule (the WSD / midtraining practice: a broad
    // stable phase, then a decay phase re-reading only high-quality
    // data): phase 0 = unimaxSelect over the FULL mix at 1.2 corpus
    // epochs (maxEpochs 2 — the small source caps, the rest waterfill);
    // phase 1 = unimaxSelect over the quality-gated subset (the x08
    // heuristic >= 0.6, the x167 gate) at 1.3 gated epochs (maxEpochs 3
    // — nothing caps, per-source passes spread k in {0, 1, 2} plus
    // partial tails). One oracle row replays BOTH waterfills and both
    // selections (the x171 replay as a reusable CTE block, run twice),
    // so the entire training schedule — who trains, in which phase, how
    // many passes — is pinned cross-engine end to end.
    Q(
      "x172_anneal",
      (s, d) => {
        val res = col("doc_id") % 16
        val src = when(res === 0, lit("s0"))
          .when(res < 4, lit("s1"))
          .when(res < 8, lit("s2"))
          .otherwise(lit("s3"))
        val docs0 = t(s, d, "documents")
          .select(
            col("doc_id"),
            src.as("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
            TextAnalysis.qualityExpr(col("text")).as("__q"))
          .localCheckpoint(true) // one scalar agg + two phase selections read it
        // one job for both phase budgets (the trainer guard-merge
        // pattern): total tokens and gated tokens from a single aggregate
        // instead of two sequential driver barriers
        val tRow = docs0
          .agg(
            sum("n_tokens"),
            sum(when(col("__q") >= 0.6, col("n_tokens"))))
          .collect()(0)
        val totalT = tRow.getLong(0)
        val annealT = tRow.getLong(1)
        val gated = docs0.filter(col("__q") >= 0.6).drop("__q")
        val stable = Scale
          .unimaxSelect(docs0.drop("__q"), "doc_id", "source", "n_tokens",
            totalT * 6L / 5L, maxEpochs = 2)
          .withColumn("phase", lit(0L))
        val anneal = Scale
          .unimaxSelect(gated, "doc_id", "source", "n_tokens",
            annealT * 13L / 10L, maxEpochs = 3)
          .withColumn("phase", lit(1L))
        stable
          .unionByName(anneal)
          .select("doc_id", "source", "n_tokens", "phase", "epoch")
          .orderBy("phase", "source", "epoch", "doc_id")
      },
      Some {
        val quality =
          """round(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
            |  + 0.5 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
            |      / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0), 6)""".stripMargin
        s"""WITH d0 AS (SELECT doc_id,
           |    CASE WHEN doc_id % 16 = 0 THEN 's0'
           |         WHEN doc_id % 16 < 4 THEN 's1'
           |         WHEN doc_id % 16 < 8 THEN 's2'
           |         ELSE 's3' END AS source,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |    $quality AS q
           |  FROM documents),
           |d AS (SELECT doc_id, source, n_tokens FROM d0),
           |g AS (SELECT doc_id, source, n_tokens FROM d0 WHERE q >= 0.6),
           |${unimaxSelectSql("d", "(SELECT SUM(n_tokens) * 6 // 5 FROM d)", 2, "a")},
           |${unimaxSelectSql("g", "(SELECT SUM(n_tokens) * 13 // 10 FROM g)", 3, "z")}
           |SELECT doc_id, source, n_tokens, CAST(0 AS BIGINT) AS phase,
           |  CAST(epoch AS BIGINT) AS epoch FROM afe
           |UNION ALL SELECT doc_id, source, n_tokens, CAST(0 AS BIGINT),
           |  CAST(epoch AS BIGINT) FROM ape
           |UNION ALL SELECT doc_id, source, n_tokens, CAST(1 AS BIGINT),
           |  CAST(epoch AS BIGINT) FROM zfe
           |UNION ALL SELECT doc_id, source, n_tokens, CAST(1 AS BIGINT),
           |  CAST(epoch AS BIGINT) FROM zpe
           |ORDER BY phase, source, epoch, doc_id""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // The x172 anneal schedule PACKED into context windows
    // (Scale.packStream — packEpochs generalized to any long-typed
    // stream partitioning): the whole two-phase training run is ONE
    // continuous token stream in (phase, epoch) order, within a
    // partition in (md5(id#epoch), id) order, sliced into 1024-token
    // windows that run straight across phase AND epoch boundaries. The
    // engine's offsets are closed-form (a (phase, epoch, bucket)
    // aggregate + hash-partitioned windows + a driver-walked broadcast
    // base table — no global sort anywhere); the oracle IS the naive
    // definition: a per-(phase, epoch) window cumsum plus cumulative
    // partition bases.
    Q(
      "x173_anneal_pack",
      (s, d) => {
        val res = col("doc_id") % 16
        val src = when(res === 0, lit("s0"))
          .when(res < 4, lit("s1"))
          .when(res < 8, lit("s2"))
          .otherwise(lit("s3"))
        val docs0 = t(s, d, "documents")
          .select(
            col("doc_id"),
            src.as("source"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
            TextAnalysis.qualityExpr(col("text")).as("__q"))
          .localCheckpoint(true)
        // one job for both phase budgets (the x172 guard-merge)
        val tRow = docs0
          .agg(
            sum("n_tokens"),
            sum(when(col("__q") >= 0.6, col("n_tokens"))))
          .collect()(0)
        val totalT = tRow.getLong(0)
        val annealT = tRow.getLong(1)
        val gated = docs0.filter(col("__q") >= 0.6).drop("__q")
        val sched = Scale
          .unimaxSelect(docs0.drop("__q"), "doc_id", "source", "n_tokens",
            totalT * 6L / 5L, maxEpochs = 2)
          .withColumn("phase", lit(0L))
          .unionByName(
            Scale
              .unimaxSelect(gated, "doc_id", "source", "n_tokens",
                annealT * 13L / 10L, maxEpochs = 3)
              .withColumn("phase", lit(1L)))
          .withColumn("__key", graft.operators.Dedup.tokenHash60(
            concat(col("doc_id").cast("string"), lit("#"), col("epoch").cast("string"))))
        Scale
          .packStream(sched, "doc_id", "n_tokens", Seq("phase", "epoch"), "__key", 1024L)
          .select("doc_id", "source", "n_tokens", "phase", "epoch",
            "stream_off", "seq_id", "seq_off")
          .orderBy("stream_off")
      },
      Some {
        val quality =
          """round(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
            |  + 0.5 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
            |      / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0), 6)""".stripMargin
        s"""WITH d0 AS (SELECT doc_id,
           |    CASE WHEN doc_id % 16 = 0 THEN 's0'
           |         WHEN doc_id % 16 < 4 THEN 's1'
           |         WHEN doc_id % 16 < 8 THEN 's2'
           |         ELSE 's3' END AS source,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |    $quality AS q
           |  FROM documents),
           |d AS (SELECT doc_id, source, n_tokens FROM d0),
           |g AS (SELECT doc_id, source, n_tokens FROM d0 WHERE q >= 0.6),
           |${unimaxSelectSql("d", "(SELECT SUM(n_tokens) * 6 // 5 FROM d)", 2, "a")},
           |${unimaxSelectSql("g", "(SELECT SUM(n_tokens) * 13 // 10 FROM g)", 3, "z")},
           |u AS (SELECT doc_id, source, n_tokens, CAST(0 AS BIGINT) AS phase,
           |    CAST(epoch AS BIGINT) AS epoch FROM afe
           |  UNION ALL SELECT doc_id, source, n_tokens, CAST(0 AS BIGINT),
           |    CAST(epoch AS BIGINT) FROM ape
           |  UNION ALL SELECT doc_id, source, n_tokens, CAST(1 AS BIGINT),
           |    CAST(epoch AS BIGINT) FROM zfe
           |  UNION ALL SELECT doc_id, source, n_tokens, CAST(1 AS BIGINT),
           |    CAST(epoch AS BIGINT) FROM zpe),
           |kk AS (SELECT u.*, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
           |    CAST(epoch AS VARCHAR)), 18, 15) AS BIGINT) AS ek FROM u),
           |bt AS (SELECT phase, epoch, SUM(n_tokens) AS t FROM u GROUP BY 1, 2),
           |bs AS (SELECT phase, epoch, COALESCE(SUM(t) OVER (ORDER BY phase, epoch
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b FROM bt),
           |cc AS (SELECT kk.*, SUM(n_tokens) OVER (PARTITION BY phase, epoch
           |    ORDER BY ek, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM kk),
           |f AS (SELECT doc_id, source, n_tokens, phase, epoch,
           |    bs.b + cum - n_tokens AS so FROM cc JOIN bs USING (phase, epoch))
           |SELECT doc_id, source, n_tokens, phase, epoch,
           |  CAST(so AS BIGINT) AS stream_off, CAST(so // 1024 AS BIGINT) AS seq_id,
           |  CAST(so % 1024 AS BIGINT) AS seq_off
           |FROM f ORDER BY stream_off""".stripMargin
      }
    ),
    // ------------------------------------------------------------------
    // Margin-based bitext candidate mining (Similarity.marginMine —
    // Artetxe & Schwenk 2019, the LASER/CCMatrix alignment rule): two
    // disjoint "languages" from the embeddings table (vec_id % 4 ∈
    // {0, 1}, bounded < 1e7 so the workload is identical under the
    // key-shifted sf10 amplifier — the x129 convention), forward and
    // backward brute top-4 frames, and every forward rank-1 pair scored
    // by sim / ((avgF + avgB) / 2) — aligned means high RELATIVE to
    // both neighborhoods, the hubness correction. Neighborhood means
    // divide exact DECIMAL(28,6) sums (order-independent, the x130
    // discipline); the oracle replays both similarity matrices, both
    // rankings, both decimal means, and the margin quotient.
    Q(
      "x174_margin_mine",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val src = e.filter(col("vec_id") < 10000000L && col("vec_id") % 4 === 0)
        val tgt = e.filter(col("vec_id") < 10000000L && col("vec_id") % 4 === 1)
        val fwd = Similarity.bruteForceTopK(src, tgt, "vec_id", "embedding", k = 4)
        val bwd = Similarity.bruteForceTopK(tgt, src, "vec_id", "embedding", k = 4)
        Similarity.marginMine(fwd, bwd).orderBy("qid")
      },
      Some(
        """WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          |    FROM embeddings WHERE vec_id < 10000000),
          |s AS (SELECT vec_id, v FROM e WHERE vec_id % 4 = 0),
          |tt AS (SELECT vec_id, v FROM e WHERE vec_id % 4 = 1),
          |fs AS (SELECT s.vec_id AS qid, tt.vec_id AS cid,
          |    round(list_dot_product(s.v, tt.v)
          |      / (sqrt(list_dot_product(s.v, s.v))
          |        * sqrt(list_dot_product(tt.v, tt.v))), 6) AS sim
          |  FROM s, tt),
          |f4 AS (SELECT * FROM (SELECT qid, cid, sim,
          |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
          |  FROM fs) WHERE rn <= 4),
          |bs AS (SELECT tt.vec_id AS qid, s.vec_id AS cid,
          |    round(list_dot_product(tt.v, s.v)
          |      / (sqrt(list_dot_product(tt.v, tt.v))
          |        * sqrt(list_dot_product(s.v, s.v))), 6) AS sim
          |  FROM tt, s),
          |b4 AS (SELECT * FROM (SELECT qid, cid, sim,
          |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
          |  FROM bs) WHERE rn <= 4),
          |af AS (SELECT qid,
          |    CAST(SUM(CAST(sim AS DECIMAL(28, 6))) AS DOUBLE) / COUNT(*) AS avg_src
          |  FROM f4 GROUP BY 1),
          |ab AS (SELECT qid AS cid,
          |    CAST(SUM(CAST(sim AS DECIMAL(28, 6))) AS DOUBLE) / COUNT(*) AS avg_tgt
          |  FROM b4 GROUP BY 1)
          |SELECT f.qid, f.cid, f.sim, af.avg_src, ab.avg_tgt,
          |  round(f.sim / ((af.avg_src + ab.avg_tgt) / 2), 6) AS margin
          |FROM f4 f JOIN af USING (qid) JOIN ab USING (cid)
          |WHERE f.rn = 1 ORDER BY qid""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // The bitext-mining SCALE path (Similarity.ivfSearch ∘ marginMine):
    // x174's brute matrices replaced by cross-set IVF in BOTH directions
    // — each language indexed under its own √N lowest-id centroids (the
    // x97 deterministic convention), neighborhoods found through the
    // cell equi-join (per-query work |corpus|/√N, the IVF contract, and
    // NO qid != cid filter — cross-set ids are separate namespaces),
    // then the same ratio-margin scoring over the k-bounded frames. The
    // oracle replays centroid pick, BOTH nearest-cell assignments, both
    // cell joins, both rankings, the decimal means and the margin
    // quotient — the whole serving-shape funnel in one hash row.
    Q(
      "x175_margin_ivf",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val src = e.filter(col("vec_id") < 10000000L && col("vec_id") % 4 === 0)
        val tgt = e.filter(col("vec_id") < 10000000L && col("vec_id") % 4 === 1)
        val nS = math.max(1L, math.floor(math.sqrt(src.count().toDouble)).toLong)
        val nT = math.max(1L, math.floor(math.sqrt(tgt.count().toDouble)).toLong)
        val cenT = tgt.orderBy("vec_id").limit(nT.toInt)
        val cenS = src.orderBy("vec_id").limit(nS.toInt)
        val fwd = Similarity.ivfSearch(src, tgt, cenT, "vec_id", "embedding", k = 4)
        val bwd = Similarity.ivfSearch(tgt, src, cenS, "vec_id", "embedding", k = 4)
        Similarity.marginMine(fwd, bwd).orderBy("qid")
      },
      Some(
        s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |    FROM embeddings WHERE vec_id < 10000000),
           |s AS (SELECT vec_id, v FROM e WHERE vec_id % 4 = 0),
           |tt AS (SELECT vec_id, v FROM e WHERE vec_id % 4 = 1),
           |${ivfSearchSql("s", "tt", "f")},
           |${ivfSearchSql("tt", "s", "z")},
           |af AS (SELECT qid,
           |    CAST(SUM(CAST(sim AS DECIMAL(28, 6))) AS DOUBLE) / COUNT(*) AS avg_src
           |  FROM ftk WHERE rn <= 4 GROUP BY 1),
           |ab AS (SELECT qid AS cid,
           |    CAST(SUM(CAST(sim AS DECIMAL(28, 6))) AS DOUBLE) / COUNT(*) AS avg_tgt
           |  FROM ztk WHERE rn <= 4 GROUP BY 1)
           |SELECT f.qid, f.cid, f.sim, af.avg_src, ab.avg_tgt,
           |  round(f.sim / ((af.avg_src + ab.avg_tgt) / 2), 6) AS margin
           |FROM ftk f JOIN af USING (qid) JOIN ab USING (cid)
           |WHERE f.rn = 1 ORDER BY qid""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // The MUTUAL (CCMatrix-intersection) branch of margin mining: x174's
    // brute funnel with mutual = true — a pair survives only when it is
    // its source's forward rank-1 AND its target's backward rank-1. The
    // survivor set is a strict, deterministic subset of x174's rows (the
    // filter the released CCMatrix corpus actually shipped with); one
    // extra equi-join in both engines pins the branch cross-engine.
    Q(
      "x176_margin_mutual",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val src = e.filter(col("vec_id") < 10000000L && col("vec_id") % 4 === 0)
        val tgt = e.filter(col("vec_id") < 10000000L && col("vec_id") % 4 === 1)
        val fwd = Similarity.bruteForceTopK(src, tgt, "vec_id", "embedding", k = 4)
        val bwd = Similarity.bruteForceTopK(tgt, src, "vec_id", "embedding", k = 4)
        Similarity.marginMine(fwd, bwd, mutual = true).orderBy("qid")
      },
      Some(
        """WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          |    FROM embeddings WHERE vec_id < 10000000),
          |s AS (SELECT vec_id, v FROM e WHERE vec_id % 4 = 0),
          |tt AS (SELECT vec_id, v FROM e WHERE vec_id % 4 = 1),
          |fs AS (SELECT s.vec_id AS qid, tt.vec_id AS cid,
          |    round(list_dot_product(s.v, tt.v)
          |      / (sqrt(list_dot_product(s.v, s.v))
          |        * sqrt(list_dot_product(tt.v, tt.v))), 6) AS sim
          |  FROM s, tt),
          |f4 AS (SELECT * FROM (SELECT qid, cid, sim,
          |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
          |  FROM fs) WHERE rn <= 4),
          |bs AS (SELECT tt.vec_id AS qid, s.vec_id AS cid,
          |    round(list_dot_product(tt.v, s.v)
          |      / (sqrt(list_dot_product(tt.v, tt.v))
          |        * sqrt(list_dot_product(s.v, s.v))), 6) AS sim
          |  FROM tt, s),
          |b4 AS (SELECT * FROM (SELECT qid, cid, sim,
          |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
          |  FROM bs) WHERE rn <= 4),
          |af AS (SELECT qid,
          |    CAST(SUM(CAST(sim AS DECIMAL(28, 6))) AS DOUBLE) / COUNT(*) AS avg_src
          |  FROM f4 GROUP BY 1),
          |ab AS (SELECT qid AS cid,
          |    CAST(SUM(CAST(sim AS DECIMAL(28, 6))) AS DOUBLE) / COUNT(*) AS avg_tgt
          |  FROM b4 GROUP BY 1)
          |SELECT f.qid, f.cid, f.sim, af.avg_src, ab.avg_tgt,
          |  round(f.sim / ((af.avg_src + ab.avg_tgt) / 2), 6) AS margin
          |FROM f4 f
          |JOIN b4 b ON b.qid = f.cid AND b.cid = f.qid AND b.rn = 1
          |JOIN af ON af.qid = f.qid JOIN ab ON ab.cid = f.cid
          |WHERE f.rn = 1 ORDER BY f.qid""".stripMargin
      )
    )
  )
}
