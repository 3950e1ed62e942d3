package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine is the exact baseline (O(|Q|·|C|) — broadcast the small
  * query side so candidates never shuffle); LSH bucketing is the scale path:
  * random-hyperplane signatures shrink the candidate set to same-bucket
  * pairs, turning the n² cross join into a bucket-keyed equi-join.
  */
object Similarity {

  /** Exact dot product in double precision via codegen'd higher-order
    * functions (left-to-right fold → deterministic, oracle-matching). */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def norm2(a: Column): Column = sqrt(dotD(a, a))

  def cosine(a: Column, b: Column): Column = dotD(a, b) / (norm2(a) * norm2(b))

  /** Exact top-k neighbors for each query row. `queries` is expected to be
    * small (broadcast); `candidates` can be arbitrarily large. */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      useCosine: Boolean = true
  ): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val simExpr = if (useCosine) cosine(col("qv"), col("cv")) else dotD(col("qv"), col("cv"))
    val sims = broadcast(q)
      .join(c, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(simExpr, 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), col("cid"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Random-hyperplane LSH bucket id: `nBits` sign bits from deterministic
    * pseudo-hyperplanes derived from (bit, dim) hashes — no RNG state to
    * ship, identical on every executor. Same-bucket vectors are near-dup
    * candidates; expected candidate count falls exponentially in nBits. */
  def lshBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { b =>
      // plane(b)(i) = ±1 from a stable integer hash (xxhash64 of (b, i))
      val contrib = (0 until dim).map { i =>
        val sign = if (((b * 1315423911L + i * 2654435761L) >>> 13) % 2 == 0) 1.0 else -1.0
        element_at(vec, i + 1).cast("double") * lit(sign)
      }.reduce(_ + _)
      when(contrib > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed approximate NN: join same-bucket pairs only. */
  def lshCandidates(df: DataFrame, idCol: String, vecCol: String, dim: Int, nBits: Int): DataFrame = {
    val withB = df.select(col(idCol), col(vecCol), lshBucket(col(vecCol), dim, nBits).as("bucket"))
    val a = withB.as("a"); val b = withB.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("d1"),
        col(s"b.$idCol").as("d2"),
        round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), 6).as("sim")
      )
  }
}
