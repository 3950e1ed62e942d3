package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo,
  OutputMode,
  StatefulProcessor,
  TimeMode,
  TimerValues,
  TTLConfig
}

/** Streaming NEAR-duplicate removal — the stage `Pipeline.curateStream`
  * leaves to batch compaction, as a true streaming operator (SURVEY.md
  * §2.9 extension surface; the batch analog is `Dedup.minhashCandidates`
  * + removal in `Pipeline.cleanCorpus`).
  *
  * Shape: MinHash signatures are STATELESS per row (per-row shingle set →
  * k affine-hash minima, the same family/moduli as
  * [[graft.operators.Dedup.minhashSignatures]] so batch and stream agree
  * bit-for-bit), band keys explode per row, and the only state lives in
  * the band-bucket groups: each bucket keeps the signatures of the docs
  * that SURVIVED there (anchors). An arriving doc matches if any anchor's
  * signature-estimated Jaccard (`agree/k`, the unbiased MinHash
  * estimator) reaches the threshold in any of its buckets — first arrival
  * wins, exactly [[graft.operators.Pipeline.curateStream]]'s exact-dedup
  * contract lifted to near-duplicates.
  *
  * Built on Spark 4's `transformWithState` (TimeMode.EventTime) because
  * the verdict needs a SECOND stateful hop: per-band flags re-group by
  * doc to AND across bands, and `transformWithState(..,
  * eventTimeColumnName, ..)` is the API contract that lets a downstream
  * windowed aggregation chain behind custom state (classic
  * `flatMapGroupsWithState` forbids stateful operators after it).
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` →
  * `...state.RocksDBStateStoreProvider`), the transformWithState
  * prerequisite.
  *
  * State bound: per bucket, the anchor list — duplicates only cluster
  * within `delay` of their anchor; an event-time timer re-armed at
  * `max(ts) + delay` clears the bucket once the watermark passes it (the
  * `dropDuplicatesWithinWatermark` TTL contract: a near-dup arriving
  * LATER than `delay` after its anchor may survive, state never grows
  * with corpus history).
  *
  * 100 TB/day shape: the shuffle key is the band bucket (sum(bucket²),
  * never n², same as batch LSH), signatures are k ints per doc, and the
  * doc-level AND is a watermark-finalized window aggregate — no
  * per-corpus state anywhere.
  */
object DedupStreams {

  /** One (band-bucket, doc) row entering the bucket processor. */
  case class NdBand(bh: Long, docId: Long, ts: Timestamp, sig: Seq[Int], text: String)

  /** Per-bucket verdict for one doc: `matched` = some anchor in this
    * bucket estimated >= threshold. */
  case class NdFlag(docId: Long, ts: Timestamp, text: String, matched: Boolean)

  /** Band-bucket anchor state: surviving signatures packed 4 bytes per
    * minhash (ListState element — BINARY encodes without a bespoke
    * product wrapper). */
  private def pack(sig: Seq[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(sig.length * 4)
    sig.foreach(bb.putInt)
    bb.array()
  }

  private def agree(packed: Array[Byte], sig: Seq[Int]): Int = {
    val bb = java.nio.ByteBuffer.wrap(packed)
    var n = 0
    var i = 0
    while (i < sig.length && bb.remaining() >= 4) {
      if (bb.getInt() == sig(i)) n += 1
      i += 1
    }
    n
  }

  /** The bucket-keyed stateful core: anchors = signatures that survived
    * this bucket; event-time timer clears the bucket `delay` past its
    * newest arrival. Intra-batch arrivals process in (ts, docId) order so
    * replays and repartitionings agree. */
  final class BucketProcessor(minAgree: Int, delayMs: Long)
      extends StatefulProcessor[Long, NdBand, NdFlag] {
    @transient private var anchors: org.apache.spark.sql.streaming.ListState[Array[Byte]] = _
    @transient private var armed: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      anchors = getHandle.getListState[Array[Byte]]("anchors", Encoders.BINARY, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[NdBand],
        timerValues: TimerValues
    ): Iterator[NdFlag] = {
      val sorted = rows.toIndexedSeq.sortBy(r => (r.ts.getTime, r.docId))
      var cur = anchors.get().toIndexedSeq
      val out = sorted.map { r =>
        val matched = cur.exists(a => agree(a, r.sig) >= minAgree)
        if (!matched) {
          val p = pack(r.sig)
          anchors.appendValue(p)
          cur = cur :+ p
        }
        NdFlag(r.docId, r.ts, r.text, matched)
      }
      // one live timer per bucket: expire `delay` after the newest arrival
      // seen so far (monotone — a late batch must not SHRINK the TTL)
      val batchExpiry = sorted.map(_.ts.getTime).max + delayMs
      val expiry =
        if (armed.exists()) {
          val prev = armed.get()
          if (batchExpiry > prev) { getHandle.deleteTimer(prev); getHandle.registerTimer(batchExpiry); batchExpiry }
          else prev
        } else { getHandle.registerTimer(batchExpiry); batchExpiry }
      armed.update(expiry)
      out.iterator
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo
    ): Iterator[NdFlag] = {
      anchors.clear()
      armed.clear()
      Iterator.empty
    }
  }

  /** Per-row MinHash signature column (k = bands * rowsPerBand minima
    * over the doc's word-3-gram shingle hashes) — the formula of
    * [[graft.operators.Dedup.minhashSignatures]] as pure array
    * expressions, no groupBy. Docs with < 3 words have no shingles: their
    * signature is all -1 (a sentinel no real minhash takes — hashes are
    * non-negative), and they bypass the stateful path as automatic
    * survivors, matching batch LSH where shingle-less docs never become
    * candidates. */
  private def sigCol(text: Column, k: Int): Column = {
    import graft.operators.Dedup
    val tk = split(text, " ")
    val shingles = when(
      size(tk) >= 3,
      transform(
        sequence(lit(0), size(tk) - 3),
        i =>
          concat_ws(
            " ",
            element_at(tk, i + 1),
            element_at(tk, i + 2),
            element_at(tk, i + 3)
          )
      )
    ).otherwise(array().cast("array<string>"))
    val hs = transform(shingles, s => Dedup.tokenHash60(s) % lit(Dedup.MinhashHashMod) + lit(1L))
    array((0 until k).map { i =>
      coalesce(
        array_min(
          transform(hs, h => (lit(Dedup.minhashA(i)) * h + lit(Dedup.minhashB(i))) % lit(Dedup.MinhashP2))
        ).cast("int"),
        lit(-1)
      )
    }: _*)
  }

  /** Streaming near-dup removal: survivors of `docs` (streaming frame)
    * under first-arrival-wins signature-estimated-Jaccard dedup. Returns
    * `(idCol, eventTimeCol, textCol)` of survivors, finalized as the
    * watermark passes (append mode).
    *
    * `threshold` is on the MinHash-ESTIMATED Jaccard (multiples of 1/k,
    * k = bands*rowsPerBand): the at-scale verification economics of
    * [[graft.operators.Dedup.estimatedJaccard]] — exact shingle
    * verification would mean keeping whole shingle sets in state. */
  def nearDupStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      eventTimeCol: String,
      delay: String,
      threshold: Double,
      bands: Int = 4,
      rowsPerBand: Int = 2
  ): DataFrame = {
    require(docs.isStreaming, "nearDupStream: batch near-dup removal is Dedup/Pipeline territory")
    require(bands >= 1 && rowsPerBand >= 1 && rowsPerBand <= 3, s"bad banding ($bands x $rowsPerBand)")
    require(threshold > 0 && threshold <= 1, s"threshold must be in (0, 1]: $threshold")
    val k = bands * rowsPerBand
    val minAgree = math.ceil(threshold * k).toInt
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(iv.months == 0, s"nearDupStream: month-based delay not supported: $delay")
    val delayMillis = iv.days * 86400000L + iv.microseconds / 1000L
    val spark = docs.sparkSession
    import spark.implicits._
    val based = docs.select(
      col(idCol).cast("long").as("docId"),
      col(eventTimeCol).cast("timestamp").as("ts"),
      col(textCol).cast("string").as("text"),
      sigCol(col(textCol), k).as("sig")
    )
    val noShingles = based
      .filter(element_at(col("sig"), 1) < 0)
      .select(col("docId"), col("ts"), col("text"))
    // base-100000 injective band key (minhashes < MinhashP2 < 100000),
    // band index in the top digits so buckets of different bands never mix
    def bandKey(b: Int): Column =
      (0 until rowsPerBand)
        .map(r => element_at(col("sig"), rowsPerBand * b + r + 1).cast("long"))
        .foldLeft(lit(b.toLong): Column)((acc, m) => acc * lit(100000L) + m)
    val bandRows = based
      .filter(element_at(col("sig"), 1) >= 0)
      .select(
        col("docId"),
        col("ts"),
        col("text"),
        col("sig"),
        explode(array((0 until bands).map(bandKey): _*)).as("bh")
      )
      .withWatermark("ts", delay)
      .as[NdBand]
    val flags = bandRows
      .groupByKey(_.bh)
      .transformWithState(
        new BucketProcessor(minAgree, delayMillis),
        "ts",
        OutputMode.Append
      )
      .toDF()
    // AND across the doc's bands: all band rows of a doc carry its exact
    // event time, so (docId, any window containing ts) is the doc — the
    // aggregate finalizes with the watermark like any event-time window
    // no second withWatermark: the eventTimeColumnName overload already
    // re-attaches the watermark to the output's ts (redefining throws)
    val survivors = flags
      .groupBy(col("docId"), window(col("ts"), "1 second"))
      .agg(
        max(when(col("matched"), 1).otherwise(0)).as("__m"),
        first(col("text")).as("text"),
        first(col("ts")).as("__ts")
      )
      .filter(col("__m") === 0)
      .select(col("docId"), col("__ts").as("ts"), col("text"))
    survivors
      .unionByName(noShingles)
      .select(
        col("docId").as(idCol),
        col("ts").as(eventTimeCol),
        col("text").as(textCol)
      )
  }
}
