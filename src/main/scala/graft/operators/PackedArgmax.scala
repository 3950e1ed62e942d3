package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared packed-long argmax encoding: (round(sim, 6) scaled to an exact
  * integer, offset non-negative) in the high bits, bit-complemented id in
  * the low 32 — so a primitive `max(long)` HashAggregate reproduces
  * `ORDER BY sim DESC, id ASC LIMIT 1`. Used by the NN/IVF/k-means
  * assignment paths; keep encode, decode and the guard in ONE place so the
  * id-range precondition can't silently drift out of a copy. */
private[operators] object PackedArgmax {
  val IdMask = 4294967295L // 2^32 - 1
  val SimOffset = 2000000L

  /** Runtime guard: id must fit the 32-bit slot. `what` names the caller
    * for the error message. */
  def guardId(id: Column, what: String, hint: String = ""): Column =
    when(id.cast("long").between(lit(0L), lit(IdMask)), id)
      .otherwise(
        raise_error(
          concat(
            lit(s"$what: id must be in [0, 2^32) for long-packing (got "),
            id.cast("string"),
            lit(")" + hint)
          )
        )
      )

  /** `sim` must already be rounded to 6 dp (and null for undefined pairs —
    * null sims encode to null, which max() ignores). */
  def encode(sim: Column, id: Column): Column =
    (round(sim * lit(1000000.0)).cast("long") + lit(SimOffset)) * lit(IdMask + 1) +
      (lit(IdMask) - id)

  // enc is non-negative by construction (sim offset), so bit ops equal the
  // mod/div of the original formulation and stay in integer arithmetic
  // (2^53 double precision would not cover the packed range).
  def decodeId(enc: Column): Column = lit(IdMask) - enc.bitwiseAND(lit(IdMask))

  def decodeSim(enc: Column): Column =
    (shiftright(enc, 32) - lit(SimOffset)).cast("double") / lit(1000000.0)
}
