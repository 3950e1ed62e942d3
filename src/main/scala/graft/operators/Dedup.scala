package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All operators are single-shuffle designs: exact dedup shuffles once on the
  * key; MinHash-LSH shuffles on band buckets (never all-pairs); SimHash is a
  * pure per-row signature. Nothing materializes on the driver, so behavior is
  * identical at 60k rows and 100 TB — only partition counts change.
  */
object Dedup {

  /** Exact dedup: keep one row per key set (lowest tie-breaker wins).
    * Hash-partitioned window — one shuffle, streaming-friendly row_number. */
  def exact(df: DataFrame, keys: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreaker))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact dedup keeping a duplicate count per retained row. */
  def exactWithCounts(df: DataFrame, keys: Seq[String], tieBreaker: String): DataFrame = {
    val p = Window.partitionBy(keys.map(col): _*)
    val w = p.orderBy(col(tieBreaker))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("n_dups", count(lit(1)).over(p))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** 60-bit stable token hash shared with the DuckDB oracle:
    * lower 15 hex digits of md5, base-16 → long. */
  def tokenHash60(c: Column): Column =
    conv(substring(md5(c), 18, 15), 16, 10).cast("long")

  /** doc → distinct word 3-gram shingle rows (`doc_id`, `s`). */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val withTk = docs.select(col(idCol), split(col(textCol), " ").as("tk"))
    withTk
      .select(
        col(idCol),
        explode(
          when(
            size(col("tk")) >= n,
            expr(
              s"transform(sequence(0, size(tk) - $n), i -> concat_ws(' ', ${(0 until n).map(j => s"tk[i + $j]").mkString(", ")}))"
            )
          ).otherwise(array().cast("array<string>"))
        ).as("s")
      )
      .distinct()
  }

  /** Affine hash family used by minhash (small moduli keep ANSI-safe int64
    * arithmetic identical in Spark and the SQL oracle). */
  val MinhashAs: Seq[Int] = Seq(7, 131, 257, 389, 521, 653, 787, 919)
  val MinhashBs: Seq[Int] = Seq(11, 17, 23, 29, 31, 37, 41, 43)
  val MinhashP1 = 100003
  val MinhashP2 = 99991

  /** MinHash signatures: one row per doc with columns m0..m{k-1}, computed
    * by the single-pass [[graft.functions.MinHashSignature]] custom
    * aggregate (one primitive buffer per group instead of k agg exprs). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, 3)
    val tok = sh.select(col(idCol), (tokenHash60(col("s")) % MinhashP1).as("h"))
    val k = MinhashAs.length
    tok
      .groupBy(col(idCol))
      .agg(graft.functions.MinHashAggFunctions.minhashSig(col("h"), k).as("sig"))
      .select(col(idCol) +: (0 until k).map(i => col("sig").getItem(i).as(s"m$i")): _*)
  }

  /** LSH candidate pairs: 4 bands of 2 minhashes. Docs sharing any band
    * bucket become candidates — the shuffle key is the bucket, so cost is
    * sum(bucket²), never n². */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol)
    val bands = (0 until 4)
      .map { b =>
        sig.select(
          col(idCol),
          lit(b).as("band"),
          (col(s"m${2 * b}") * lit(100000L) + col(s"m${2 * b + 1}")).as("bh")
        )
      }
      .reduce(_ unionByName _)
    val a = bands.as("a"); val b = bands.as("b")
    a.join(
      b,
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col(s"a.$idCol") < col(s"b.$idCol")
    ).select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .distinct()
  }

  /** 16-bit SimHash over distinct word-3-gram shingle hashes. */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, 3)
    val tok = sh.select(col(idCol), tokenHash60(col("s")).as("h")).distinct()
    val bitSum = (0 until 16).map { i =>
      sum(when(expr(s"(shiftright(h, $i) & 1) = 1"), 1).otherwise(-1)).as(s"b$i")
    }
    val grouped = tok.groupBy(col(idCol)).agg(bitSum.head, bitSum.tail: _*)
    val simhash = (0 until 16)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    grouped.select(col(idCol), simhash.cast("long").as("simhash"))
  }

  /** Scalable near-duplicate detection: MinHash-LSH candidate generation
    * followed by exact shingle-Jaccard verification on candidate pairs only
    * (the classic two-stage pipeline; verification cost is |candidates|, not
    * n²). Returns (d1, d2, jaccard) for pairs with jaccard >= threshold. */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double
  ): DataFrame = {
    val cand = minhashCandidates(docs, idCol, textCol)
    val sh = shingleRows(docs, idCol, textCol, 3)
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val a = sh.toDF("d1", "s")
    val b = sh.toDF("bd2", "s2")
    val inter = cand
      .join(a, "d1")
      .join(b, col("d2") === col("bd2") && col("s") === col("s2"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("ni"))
    inter
      .join(sizes.select(col(idCol).as("d1"), col("sz").as("na")), "d1")
      .join(sizes.select(col(idCol).as("d2"), col("sz").as("nb")), "d2")
      .withColumn("j", col("ni").cast("double") / (col("na") + col("nb") - col("ni")))
      .filter(col("j") >= threshold)
      .select(col("d1"), col("d2"), col("j"))
  }

  /** Exact pairwise token-set Jaccard over a (pre-filtered) document set.
    * All-pairs by construction — callers must bound the input (e.g., one
    * LSH bucket, one language partition); use minhashCandidates for the
    * scale path. */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double
  ): DataFrame = {
    // tokens are hashed to int64 before the pairwise intersect: set sizes
    // (and therefore jaccard) are unchanged (64-bit collisions negligible),
    // but the per-pair intersection compares primitives instead of strings.
    val d = docs.select(
      col(idCol),
      array_distinct(transform(split(col(textCol), " "), t => xxhash64(t))).as("toks")
    )
    val a = d.as("a"); val b = d.as("b")
    val inter = size(array_intersect(col("a.toks"), col("b.toks"))).cast("double")
    val j = inter / (size(col("a.toks")) + size(col("b.toks")) - inter)
    a.join(b, col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"), j.as("j"))
      .filter(col("j") >= threshold)
  }
}
