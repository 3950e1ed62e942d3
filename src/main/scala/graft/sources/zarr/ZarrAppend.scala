package graft.sources.zarr

import graft.model.IndexMath
import graft.sources.Coord

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** APPEND writes along the leading dimension of an EXISTING array —
  * `df.write.format("zarr").option("append.dim", "time")` — the write-side
  * complement of the streaming source (`stream.dim`): one job appends
  * slabs, another streams them, each cell seen exactly once.
  *
  * Contract (every violation rejects loudly before any byte lands):
  *  - zarr v2 or v3 (incl. v3 sharding_indexed: the extent must sit on a
  *    SHARD boundary and each slab lands as whole new shard objects — one
  *    PUT each, never read-modify-write — unless `append.realign=true`
  *    absorbs a mid-shard tail by rewriting the tail-row objects merged
  *    with the batch, one RMW PUT each, everything else still
  *    append-only; the shard index honors the store's declared
  *    index_location / index_codecs / endianness); no
  *    numcodecs filters / array→array codecs; numeric or vlen-utf8 string
  *    values. v2 commits metadata in
  *    three ordered writes (stats attrs → shape → batch id, see below);
  *    v3 keeps all three in ONE zarr.json, so the commit is a single
  *    write (one PUT on an object store) after which the slab, its
  *    stats, and the batch id become visible together;
  *  - the append dim is the array's FIRST dim (C-order: existing chunk
  *    files and existing chunk-stats ordinals stay valid — appending an
  *    outer slab only ADDS chunk objects);
  *  - the current extent sits on a chunk boundary (size batches to the
  *    chunk; partial-chunk read-modify-write is exactly the mutable-object
  *    pattern zarr stores avoid);
  *  - non-append dims must carry exactly the store's existing axis values;
  *    eager axes broadcast as ordinal join maps, DEFERRED ones (10M+
  *    values) become distributed (value, ordinal) maps decoded from the
  *    coordinate chunks by executors and shuffle-joined — no axis ever
  *    rides the driver; the APPEND dim itself may also be deferred: the
  *    strictly-after check boundary-decodes one coordinate chunk and the
  *    commit appends tail chunks to the coordinate array in place —
  *    O(batch + 1 chunk), never the whole axis;
  *  - new append-dim coordinate values must sort strictly AFTER the
  *    existing axis (time moves forward), keeping the axis sorted so
  *    deferred-axis pruning stays ≤ 2 boundary decodes;
  *  - `append.batch_id=<long>` makes replays idempotent: a batch id at or
  *    below the recorded one is a no-op (the foreachBatch streaming-sink
  *    pattern). Metadata commit order is stats, then shape, then the batch
  *    id — the id is recorded only once the slab is VISIBLE, so a crash in
  *    any window makes the replay either a clean rewrite or a loud
  *    strictly-after violation, never a silently dropped batch.
  *
  * Chunk statistics survive the append in every layout: flat docs merge
  * the new chunks' bounds under the grown grid; a grid growing past the
  * flat cap upgrades flat -> HIERARCHICAL (side docs for every block,
  * rollup attrs); a hierarchical store rewrites at most the one
  * boundary-straddling block's side doc and widens the touched rollups —
  * fully-old blocks keep their side docs, which stay exact because
  * leading-dim appends never rewrite existing ordinals. A store without
  * stats stays without (absence may be deliberate); a grid growing past
  * flat_cap x block_len drops them (the sink's own ceiling).
  */
object ZarrAppend {

  val BatchAttrKey = "graft:append_batch"

  def append(df: DataFrame, rawOptions: Map[String, String]): Unit = {
    val opts = rawOptions.map { case (k, v) => k.toLowerCase -> v }
    val path = opts("path")
    val array = opts("array")
    val group = opts.get("group")
    val storageOptions = opts.collect { case (k, v) if k.startsWith("storage.") => k.drop("storage.".length) -> v }
    val appendDim = opts("append.dim")
    val batchId = opts.get("append.batch_id").map(_.toLong)
    val spark = df.sparkSession

    // fresh, UNconsolidated metadata — appends must see the live shape
    val store = new ZarrStore(path, storageOptions, group, Some(false))
    val meta = store.arrayMeta(array)
    // numcodecs-filtered VALUE arrays append when every filter has a write
    // path (append slabs are whole chunks, and filters are per-chunk, so
    // the encode fold is exactly the fixture writer's). String arrays:
    // exactly ONE categorize filter appends too — label codes are
    // per-chunk encodes as long as every appended value is IN the declared
    // label set (unknown labels encode 0 and decode '', silent loss — the
    // in-vocabulary precheck below refuses first). Other/stacked string
    // filters still refuse.
    val strCategorize: Option[String] =
      if (ZDtype.isString(meta.zdtype.code)) meta.filters match {
        case Seq() => None
        case Seq(cfg) if ZarrFilters.idOf(cfg) == "categorize" => Some(cfg)
        case other =>
          throw new IllegalArgumentException(
            "zarr append: filtered string value arrays support exactly one categorize filter " +
              s"(got: ${other.map(ZarrFilters.idOf).mkString(", ")})"
          )
      } else {
        meta.filters.foreach { cfg =>
          val id = ZarrFilters.idOf(cfg)
          require(
            Set("delta", "quantize", "bitround", "fixedscaleoffset", "packbits")(id),
            s"zarr append: numcodecs filter '$id' has no write path " +
              "(writable: delta, quantize, bitround, fixedscaleoffset, packbits)"
          )
          // id allowlist is not enough: encode preconditions (delta's
          // same-type rule, fso/quantize/bitround dtype + params) must
          // reject HERE, before the distributed write, not mid-job in an
          // executor after slab chunks have landed
          ZarrFilters.validateWritable(cfg, meta.zdtype)
        }
        None
      }
    strCategorize.foreach { _ =>
      require(
        meta.shardShape.isEmpty,
        "zarr append: categorize-filtered SHARDED string arrays unsupported"
      )
    }
    require(
      meta.dims.headOption.contains(appendDim),
      s"append.dim '$appendDim' must be the FIRST dimension of '${array}' (dims ${meta.dims.mkString(",")}) — " +
        "outer-slab appends keep every existing chunk object and stats ordinal valid"
    )
    val strValue = ZDtype.isString(meta.zdtype.code)
    require(
      strValue || ZarrChunkStats.domainOf(meta.zdtype).exists(d => d == "int" || d == "float") ||
        meta.zdtype.code == ZDtype.F2,
      s"zarr append supports numeric and vlen-utf8 string values, not dtype '${meta.dtype}'"
    )

    // idempotent replay
    val priorBatch: Option[Long] =
      meta.attrs.get(BatchAttrKey).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    if (batchId.exists(id => priorBatch.exists(id <= _))) return

    val extent = meta.shape.head
    val chunk0 = meta.chunks.head
    require(
      extent % chunk0 == 0,
      s"zarr append requires the current extent ($extent) on a chunk boundary (chunk $chunk0) — size batches to the chunk"
    )
    // sharded (v3-only): appends add whole new SHARD objects — the extent
    // must sit on a shard boundary so no existing object is ever rewritten
    // (a batch may end mid-shard, leaving a valid partial tail shard whose
    // absent inner chunks index as missing; the NEXT append then refuses
    // unless `append.realign=true` absorbs the tail: the one shard row
    // holding the old extent is re-read and REWRITTEN merged with the new
    // batch — a single read-modify-write PUT per tail-row object, every
    // other object still append-only)
    val realign = opts.get("append.realign").exists(_.toBoolean)
    meta.shardShape.foreach { sh =>
      require(
        extent % sh.head == 0 || realign,
        s"zarr append on a sharded array requires the current extent ($extent) on a SHARD boundary " +
          s"(shard ${sh.head}). A mid-shard tail (e.g. a final batch that ended early) is absorbed by " +
          "passing option append.realign=true: the partial tail shard object is re-read and rewritten " +
          "merged with this batch (one read-modify-write PUT of that object only)"
      )
    }
    require(df.columns.contains("value"), "zarr append requires a 'value' column")
    meta.dims.foreach(d => require(df.columns.contains(d), s"zarr append: missing dimension column '$d'"))
    // fail BEFORE the distributed job, not mid-write in putCell
    require(
      (strValue && df.schema("value").dataType == org.apache.spark.sql.types.StringType) ||
        (!strValue && df.schema("value").dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]) ||
        (!strValue && Seq(
          org.apache.spark.sql.types.BooleanType,
          org.apache.spark.sql.types.TimestampType,
          org.apache.spark.sql.types.DateType
        ).contains(df.schema("value").dataType)),
      s"zarr append: value column type ${df.schema("value").dataType} does not fit store dtype '${meta.dtype}'"
    )

    // ---- existing axes. Any dim may be deferred (10M+ values). The
    // APPEND dim: the strictly-after check boundary-decodes the axis tail
    // (1 chunk read) and the commit appends tail chunks to the coordinate
    // array instead of rewriting it. NON-append dims: executors decode the
    // coordinate chunks into a distributed (value, ordinal) map and the
    // row->index join shuffles instead of broadcasting — no axis ever
    // materializes on the driver.
    val deferredThreshold =
      opts.get("coord.deferred.threshold").map(_.toInt).getOrElse(10000000)
    val coords: Vector[Coord] =
      meta.dims.zipWithIndex.map { case (d, i) => store.coordFor(d, meta.shape(i), deferredThreshold) }

    // ---- new append-dim values: distinct, sorted, strictly after the axis
    val newValsRaw = df.select(col(appendDim)).distinct().limit(1000001).collect().map(_.get(0))
    require(newValsRaw.length <= 1000000, "zarr append: > 1e6 new append-dim values in one batch")
    require(newValsRaw.nonEmpty, "zarr append: empty batch")
    val ord = ZarrSink.externalOrdering(df.schema(appendDim).dataType)
    val newVals = newValsRaw.sorted(ord)
    coords.head match {
      case Coord.Index(_) =>
        // positional axis: new "values" must be exactly the next indices
        val expected = (extent.toLong until extent.toLong + newVals.length).toVector
        val got = newVals.toVector.map {
          case l: Long => l
          case i: Int => i.toLong
          case other => throw new IllegalArgumentException(s"positional append dim got $other")
        }
        require(got == expected, s"positional append dim must continue at $extent (got ${got.take(3).mkString(",")}...)")
      case _: Coord.Deferred =>
        // boundary decode: ONE coordinate chunk read gives the axis end
        val lastExt = deferredTailValue(store, appendDim, extent, storageOptions)
        require(
          ord.compare(newVals.head, lastExt) > 0,
          s"zarr append: new $appendDim values must sort strictly after the existing axis end ($lastExt)"
        )
        // width/range precheck for exact-cell coord dtypes: an oversize
        // |S/<U label or out-of-range uint64 must reject HERE, before any
        // value byte lands — not mid-commit in appendCoordTail
        val cmPre = store.arrayMeta(appendDim)
        if (Set(ZDtype.S, ZDtype.US, ZDtype.U8)(cmPre.zdtype.code)) {
          val scratch = ByteBuffer
            .allocate(math.max(cmPre.zdtype.itemSize, 8))
            .order(ByteOrder.LITTLE_ENDIAN)
          newVals.foreach {
            case s: String => ZDtype.putFixedString(cmPre.zdtype, scratch, 0, s)
            case bd: java.math.BigDecimal => ZDtype.putUnsigned64(cmPre.zdtype, scratch, 0, bd)
            case _ => ()
          }
        }
      case c =>
        val last = c(extent - 1)
        require(
          ord.compare(newVals.head, externalOf(c, last)) > 0,
          s"zarr append: new $appendDim values must sort strictly after the existing axis end"
        )
    }
    val k = newVals.length
    val newExtent = extent + k

    // ---- row -> global index mapping: broadcast ordinal maps
    val rank = meta.rank
    val newShape = meta.shape.updated(0, newExtent)
    val chunks = meta.chunks
    val nChunksVec = newShape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
    val gridStrides = IndexMath.strides(nChunksVec)
    val chunkStrides = IndexMath.strides(chunks)
    var indexed = df
    meta.dims.zipWithIndex.foreach { case (d, di) =>
      val dt = df.schema(d).dataType
      coords(di) match {
        case _: Coord.Deferred if di > 0 =>
          val idxDf = deferredOrdinalMap(spark, store, d, meta.shape(di), dt, di, storageOptions)
          indexed = indexed.join(idxDf, indexed(d) === idxDf("__v")).drop("__v")
        case _ =>
          val pairs: Seq[Row] =
            if (di == 0) newVals.zipWithIndex.map { case (v, i) => Row(v, (extent + i).toLong) }.toSeq
            else {
              val c = coords(di)
              require(
                c.length == meta.shape(di),
                s"axis '$d' length ${c.length} != shape ${meta.shape(di)}"
              )
              (0 until c.length).map(i => Row(externalOf(c, c(i)), i.toLong))
            }
          val idxSchema = org.apache.spark.sql.types.StructType(
            Seq(
              org.apache.spark.sql.types.StructField("__v", dt, nullable = false),
              org.apache.spark.sql.types
                .StructField(s"__i$di", org.apache.spark.sql.types.LongType, nullable = false)
            )
          )
          import scala.jdk.CollectionConverters._
          val idxDf = spark.createDataFrame(pairs.asJava, idxSchema)
          indexed = indexed.join(broadcast(idxDf), indexed(d) === idxDf("__v")).drop("__v")
      }
    }
    // non-append dim values not present in the store's axes would silently
    // drop in the join — count and reject instead. Persist the mapped rows
    // so the rows VALIDATED here are the rows WRITTEN below even for a
    // nondeterministic source, and the input is scanned once, not thrice.
    indexed = indexed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inputRows = df.count()
    val mappedRows = indexed.count()
    require(
      mappedRows == inputRows,
      s"zarr append: ${inputRows - mappedRows} rows carry dimension values the store's axes do not have"
    )

    val chunkExpr = (0 until rank)
      .map(di => expr(s"__i$di div ${chunks(di)}") * lit(gridStrides(di)))
      .reduce(_ + _)
    val localExpr = (0 until rank)
      .map(di => (col(s"__i$di") % lit(chunks(di))) * lit(chunkStrides(di)))
      .reduce(_ + _)
    val elems = chunks.map(_.toLong).product.toInt
    val fill = meta.fillValue.getOrElse(0.0)
    val fillStr = meta.fillValueStr.getOrElse("")
    // categorize in-vocabulary precheck: every appended value (and the fill
    // landing in padded cells) must be a declared label or '' — an unknown
    // label would encode 0 and decode '', i.e. silent data loss. Scans the
    // PERSISTED `indexed` frame, not `df`: the persist exists so the rows
    // validated are the rows written even for a nondeterministic source,
    // and this check must sit inside that guarantee.
    strCategorize.foreach { cfg =>
      val labels = ZarrFilters.categorizeLabels(cfg)
      require(
        fillStr.isEmpty || labels.contains(fillStr),
        s"zarr append: string fill value '$fillStr' is not in the categorize labels — " +
          "padded cells would decode as ''"
      )
      val bad = indexed
        .filter(
          col("value").isNotNull && col("value") =!= "" &&
            !col("value").isin(labels.toSeq: _*)
        )
        .select(col("value"))
        .limit(1)
        .collect()
      require(
        bad.isEmpty,
        s"zarr append: value '${bad.headOption.map(_.getString(0)).getOrElse("")}' is not in the " +
          "categorize labels — unknown labels encode 0 and decode '' (silent loss); " +
          "extend the store's label set first"
      )
    }
    val strCatSer = strCategorize
    val dt = meta.zdtype
    val comp = meta.compressor
    val v2Filters = meta.filters // encode fold before the compressor (v2 only)
    // v3 encodes through the parsed bytes→bytes codec chain; v2 through the
    // numcodecs compressor id. Chunk keys follow the store's key encoding
    // (v2 dotted / v3 "c"-prefixed with the configured separator).
    val isV3 = meta.v3
    val v3Cfgs = meta.v3Codecs
    val keyEnc = meta.keyEncoding
    val keySep = meta.keySeparator
    def chunkKeyOf(idx: Seq[Int]): String = keyEnc match {
      case "default" => if (idx.isEmpty) "c" else "c" + keySep + idx.mkString(keySep)
      case _ => if (idx.isEmpty) "0" else idx.mkString(keySep)
    }
    val arrayDirStr = store.arrayDir(array)
    val executorOpts = ZarrFileIO.executorOptions(storageOptions)
    val nChunksArr = nChunksVec.toArray
    val statsDomain = ZarrChunkStats.domainOf(dt)
    val rawStatsAttr = meta.attrs.get(ZarrChunkStats.AttrKey)
    val existingFlatStats =
      rawStatsAttr.flatMap(ZarrChunkStats.parse).filter(d => statsDomain.contains(d.domain))
    val existingHierStats =
      rawStatsAttr.flatMap(ZarrChunkStats.parseHier).filter(h => statsDomain.contains(h.domain))
    val statsFlatCap =
      opts.get("stats.flat_cap").map(_.toLong).getOrElse(ZarrChunkStats.FlatCap)
    // an existing hier layout fixes the block length; otherwise the option
    // (or default) decides the flat->hier upgrade geometry
    val statsBlockLen = existingHierStats
      .map(_.blockLen)
      .getOrElse(
        opts.get("stats.block_len").map(_.toLong).getOrElse(ZarrChunkStats.DefaultBlockLen)
      )
    val grownTotalChunks = nChunksVec.map(_.toLong).product
    val oldTotalChunks =
      (extent.toLong / chunk0) * nChunksVec.drop(1).map(_.toLong).product
    // stats survive the append when the store already has same-domain
    // stats, the grown grid fits the two-level ceiling, and the batch's
    // own chunk records stay driver-collectable (flat-cap bound). A lossy
    // v2 filter (quantize/bitround/fixedscaleoffset) disqualifies: bounds
    // taken from raw pre-filter values can be narrower than the decoded
    // values, so a zonemap-pruned scan would silently drop matching rows
    // — the sink never writes stats+lossy together, but an
    // externally-authored store with graft stats attrs can arrive here
    val lossyFiltered = !isV3 && meta.filters.exists(ZarrFilters.isLossy)
    val statsOn = (existingFlatStats.isDefined || existingHierStats.isDefined) &&
      !lossyFiltered &&
      grownTotalChunks <= statsFlatCap * statsBlockLen &&
      grownTotalChunks - oldTotalChunks <= statsFlatCap
    val statsOnSer = statsOn
    // a store that HAD stats loses them here: record why in the attrs so
    // the scan can warn instead of silently losing pruning. A marker left
    // by an earlier drop carries forward (later appends see no stats and
    // must not erase the record of why).
    val statsDroppedJson: Option[String] =
      if (statsOn) None
      else if (existingFlatStats.isDefined || existingHierStats.isDefined)
        Some(
          if (lossyFiltered)
            ZarrChunkStats.droppedJson(grownTotalChunks, 0L, "lossy_filter")
          else if (grownTotalChunks > statsFlatCap * statsBlockLen)
            ZarrChunkStats.droppedJson(grownTotalChunks, statsFlatCap * statsBlockLen, "ceiling")
          else
            ZarrChunkStats.droppedJson(grownTotalChunks - oldTotalChunks, statsFlatCap, "batch_flat_cap")
        )
      else meta.attrs.get(ZarrChunkStats.DroppedAttrKey)
    val isStr = strValue
    val intDomain = statsDomain.contains("int")
    // in-shape-only stats geometry over the GROWN grid: appended boundary
    // chunks may be ragged on any dim; padding cells must not widen bounds
    val geom = ZarrSink.ChunkGeom(newShape.map(_.toLong).toArray, chunks.toArray, nChunksVec.toArray)

    val totalNewChunks = nChunksVec.map(_.toLong).product
    val parts = math.max(
      1L,
      math.min(spark.sessionState.conf.numShufflePartitions.toLong, totalNewChunks)
    ).toInt
    def appendChunked(): Array[ZarrSink.ChunkBounds] = indexed
      .select(chunkExpr.as("__chunk"), localExpr.as("__local"), col("value").as("__value"))
      .repartition(parts, col("__chunk"))
      .sortWithinPartitions("__chunk")
      .rdd
      .mapPartitions { (rows: Iterator[Row]) =>
        val order = if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
        var current = -1L
        var buf: ByteBuffer = null
        var cells: Array[String] = null
        val stats = Array.newBuilder[ZarrSink.ChunkBounds]
        def flush(): Unit = if (current >= 0L) {
          if (statsOnSer)
            stats += (if (isStr) ZarrSink.stringBoundsRecord(current, cells, geom)
                      else ZarrSink.chunkBoundsRecord(current, dt, buf, geom, intDomain))
          // categorize IS the string filter chain: codes replace the vlen
          // stream entirely (the fixture writer's exact encode), so the
          // v2 fold is skipped for it
          val raw =
            if (isStr) strCatSer match {
              case Some(cfg) => ZarrFilters.categorizeEncodeCells(cfg, cells)
              case None => ZarrStoreWriter.vlenEncode(cells)
            }
            else buf.array()
          val bytes =
            if (isV3) v3Cfgs.foldLeft(raw)((b, cfg) => ZarrCodecV3.encode(cfg, b, math.max(dt.itemSize, 1)))
            else {
              val filtered =
                if (strCatSer.isDefined) raw
                else v2Filters.foldLeft(raw)((b, cfg) => ZarrFilters.encode(cfg, dt, b))
              ZarrCodec.compress(comp, filtered, typesize = math.max(dt.itemSize, 1))
            }
          val idx = new Array[Int](nChunksArr.length)
          var rem = current
          var d = nChunksArr.length - 1
          while (d >= 0) { idx(d) = (rem % nChunksArr(d)).toInt; rem /= nChunksArr(d); d -= 1 }
          ZarrFileIO.writeBytes(
            new HPath(arrayDirStr, chunkKeyOf(idx.toSeq)),
            executorOpts,
            bytes
          )
        }
        while (rows.hasNext) {
          val r = rows.next()
          val c = r.getLong(0)
          if (c != current) {
            flush()
            current = c
            if (isStr) {
              if (cells == null) cells = new Array[String](elems)
              java.util.Arrays.fill(cells.asInstanceOf[Array[AnyRef]], fillStr)
            } else {
              if (buf == null) buf = ByteBuffer.allocate(elems * dt.itemSize).order(order)
              if (fill == 0.0) java.util.Arrays.fill(buf.array(), 0.toByte)
              else { var i = 0; while (i < elems) { ZDtype.put(dt, buf, i, fill); i += 1 } }
            }
          }
          if (isStr) {
            val v = r.getString(2)
            cells(r.getLong(1).toInt) = if (v == null) fillStr else v
          } else ZarrSink.putCell(dt, buf, r.getLong(1).toInt, r.get(2), rCheck = false, 0L, 0L, meta.dtype)
        }
        flush()
        stats.result().iterator
      }
      .collect()
    val statsRows: Array[ZarrSink.ChunkBounds] = meta.shardShape match {
      case Some(shards) =>
        // realign: the shard ROW (dim-0 shard index) holding the old
        // extent already has objects on disk; their live inner chunks are
        // copied byte-for-byte into the rewritten tail objects
        val tailShardRow = if (extent % shards.head == 0) -1L else (extent / shards.head).toLong
        appendSharded(
          indexed, meta, shards, newShape, nChunksVec, chunkExpr, localExpr,
          geom, elems, fill, fillStr, statsOnSer, intDomain, arrayDirStr, executorOpts, parts,
          tailShardRow
        )
      case None => appendChunked()
    }
    indexed.unpersist(blocking = false)

    // ---- metadata commit: coord array, then attrs (stats, WITHOUT the
    // batch id), then SHAPE, then attrs again WITH the batch id, then the
    // consolidated snapshot. The batch id lands strictly AFTER the shape
    // write: a crash in between leaves the slab visible but the batch
    // unrecorded, so a replay fails LOUDLY (new values no longer strictly
    // after the axis end) instead of silently dropping the batch — the
    // failure mode of the reverse order, where a recorded-but-invisible
    // batch replays as a no-op and the data is gone.
    coords.head match {
      case Coord.Index(_) => () // positional: nothing stored
      case _: Coord.Deferred =>
        // extend the coordinate array IN PLACE: rewrite at most the one
        // partial tail chunk (read-modify-write), append whole new
        // chunks, bump the coord .zarray shape — never the whole axis
        appendCoordTail(store, appendDim, extent, newVals, storageOptions)
      case c =>
        val existingExternal = Array.tabulate[Any](extent)(i => externalOf(c, c(i)))
        if (meta.v3)
          ZarrSink.writeCoordArrayV3(
            store.groupDir,
            appendDim,
            existingExternal ++ newVals,
            df.schema(appendDim).dataType,
            store.arrayMeta(appendDim).v3Codecs,
            storageOptions
          )
        else
          ZarrSink.writeCoordArray(
            store.groupDir,
            appendDim,
            existingExternal ++ newVals,
            df.schema(appendDim).dataType,
            meta.compressor,
            storageOptions
          )
    }
    // ---- stats maintenance across the append. Side docs land BEFORE the
    // attrs that reference them (a missing side doc only degrades fine
    // pruning to the block rollup). Three transitions:
    //   flat -> flat   merged per-chunk doc in the attrs (grown grid)
    //   flat -> hier   the grown grid crosses the flat cap: side docs for
    //                  every block (old entries from the flat attrs, new
    //                  from this batch), rollups, hier attrs
    //   hier -> hier   rewrite at most the ONE boundary-straddling block's
    //                  side doc (read-modify-write; fully-old blocks keep
    //                  their still-exact docs — the pruner accepts stale
    //                  nChunks for blocks the old grid fully covered), add
    //                  side docs for new blocks, widen those blocks'
    //                  rollups + written counts
    val statsAttrJson: Option[String] =
      if (!statsOn) None
      else {
        val domain = statsDomain.get
        val newDoc = ZarrChunkStats.docOfBounds(domain, grownTotalChunks, statsRows)
        if (existingHierStats.isEmpty && grownTotalChunks <= statsFlatCap) {
          existingFlatStats.map(d =>
            ZarrChunkStats.toJson(ZarrChunkStats.mergeFlat(d, newDoc, grownTotalChunks))
          )
        } else {
          val blockLen = statsBlockLen
          val nBlocksNew = (grownTotalChunks + blockLen - 1) / blockLen
          val newBlocks: Set[Long] = statsRows.map(_.ord / blockLen).toSet
          // the one block straddling the old grid end (if any): its side
          // doc must be rewritten with the grown nChunks even when the
          // batch wrote nothing in it, or the pruner rejects it as stale
          val boundaryBlock: Option[Long] =
            if (oldTotalChunks % blockLen == 0) None else Some(oldTotalChunks / blockLen)
          val oldBlocks: Set[Long] = existingHierStats match {
            case Some(_) => boundaryBlock.toSet
            case None => (0L until (oldTotalChunks + blockLen - 1) / blockLen).toSet
          }
          val baseHier: ZarrChunkStats.Hier = existingHierStats.getOrElse(
            ZarrChunkStats.Hier(
              domain,
              grownTotalChunks,
              blockLen,
              Map.empty,
              ZarrChunkStats.Doc(domain, 0)
            )
          )
          var written = baseHier.written
          var rollRecs = Map.empty[Long, ZarrSink.ChunkBounds]
          (newBlocks ++ oldBlocks).toSeq.sorted.foreach { b =>
            val newSub = ZarrChunkStats.blockSlice(newDoc, b, blockLen, grownTotalChunks)
            val oldSideDoc: Option[ZarrChunkStats.Doc] = existingHierStats match {
              case Some(_) if oldBlocks.contains(b) =>
                ZarrFileIO
                  .readStringIfExists(
                    new HPath(arrayDirStr, s"${ZarrChunkStats.SideDir}/$b"),
                    storageOptions
                  )
                  .flatMap(ZarrChunkStats.parse)
                  .filter(_.domain == domain)
              case None =>
                Some(
                  ZarrChunkStats.blockSlice(existingFlatStats.get, b, blockLen, grownTotalChunks)
                )
              case _ => Some(ZarrChunkStats.Doc(domain, grownTotalChunks)) // purely-new block
            }
            oldSideDoc match {
              case Some(oldSub) =>
                val merged = ZarrChunkStats.mergeFlat(oldSub, newSub, grownTotalChunks)
                ZarrFileIO.writeString(
                  new HPath(arrayDirStr, s"${ZarrChunkStats.SideDir}/$b"),
                  storageOptions,
                  ZarrChunkStats.toJson(merged)
                )
                written = written.updated(b, merged.written.toLong)
                rollRecs += b -> ZarrChunkStats.rollupRecord(b, merged)
              case None =>
                // boundary block with written old chunks but no readable
                // side doc: per-chunk entries are unrecoverable — do NOT
                // write a doc claiming completeness (absent old ordinals
                // would read as "never written"). Keep the coarse level
                // sound instead: widen the old rollup with the new bounds
                // and add the new written count.
                written = written.updated(b, baseHier.written.getOrElse(b, 0L) + newSub.written)
                val newRec = ZarrChunkStats.rollupRecord(b, newSub)
                rollRecs += b -> ZarrChunkStats
                  .entryRecord(baseHier.rollup, b)
                  .map(old => ZarrChunkStats.widen(old, newRec, domain))
                  .getOrElse(newRec)
            }
          }
          val mergedRoll = ZarrChunkStats.mergeFlat(
            baseHier.rollup,
            ZarrChunkStats.docOfBounds(domain, nBlocksNew, rollRecs.values),
            nBlocksNew
          )
          Some(
            ZarrChunkStats.toJsonHier(
              ZarrChunkStats.Hier(domain, grownTotalChunks, blockLen, written, mergedRoll)
            )
          )
        }
      }
    val baseAttrs: Map[String, String] =
      meta.attrs -- Seq(ZarrChunkStats.AttrKey, ZarrChunkStats.DroppedAttrKey, "_ARRAY_DIMENSIONS") ++
        statsAttrJson.map(j => ZarrChunkStats.AttrKey -> j) ++
        statsDroppedJson.map(j => ZarrChunkStats.DroppedAttrKey -> j)
    if (meta.v3) {
      // v3 keeps shape, attributes (stats + batch id), and everything else
      // in ONE zarr.json — a single write makes the slab, its stats, and
      // the batch id visible together; a crash before it leaves the old
      // metadata intact and the replay is clean
      val raw = ZarrFileIO
        .readStringIfExists(new HPath(arrayDirStr, "zarr.json"), storageOptions)
        .getOrElse(throw new IllegalStateException(s"zarr append: missing zarr.json under $arrayDirStr"))
      val finalAttrs =
        batchId.foldLeft(baseAttrs)((m, id) => (m - BatchAttrKey) + (BatchAttrKey -> id.toString))
      ZarrFileIO.writeString(
        new HPath(arrayDirStr, "zarr.json"),
        storageOptions,
        v3MetaWithShapeAttrs(raw, newShape, finalAttrs)
      )
      ZarrSink.consolidateV3(store.groupDir, storageOptions)
    } else {
      // stats first, PRIOR batch id retained: safe before the shape grows —
      // appends are leading-dim only, so existing chunk ordinals are
      // unchanged and the extra tail entries are never consulted under the
      // old shape
      ZarrFileIO.writeString(
        new HPath(arrayDirStr, ".zattrs"),
        storageOptions,
        ZarrStoreWriter.zattrsJson(Some(meta.dims), baseAttrs)
      )
      // shape: the visibility point — an interrupted append before this
      // leaves the new slab invisible and the batch unrecorded (clean retry)
      val zarrayRaw = ZarrFileIO
        .readStringIfExists(new HPath(arrayDirStr, ".zarray"), storageOptions)
        .getOrElse(throw new IllegalStateException(s"zarr append: missing .zarray under $arrayDirStr"))
      val updated = zarrayRaw.replaceFirst(
        """"shape"\s*:\s*\[[0-9,\s]*\]""",
        s""""shape": [${newShape.mkString(",")}]"""
      )
      require(updated != zarrayRaw, "zarr append: could not rewrite .zarray shape")
      ZarrFileIO.writeString(new HPath(arrayDirStr, ".zarray"), storageOptions, updated)
      // batch id LAST: recorded only once the slab is visible
      batchId.foreach { id =>
        ZarrFileIO.writeString(
          new HPath(arrayDirStr, ".zattrs"),
          storageOptions,
          ZarrStoreWriter.zattrsJson(Some(meta.dims), (baseAttrs - BatchAttrKey) + (BatchAttrKey -> id.toString))
        )
      }
      ZarrSink.consolidate(store.groupDir, storageOptions)
    }
  }

  /** SHARDED (v3) append: cluster the batch's rows by SHARD ordinal over
    * the grown grid so each task streams one complete shard object (inner
    * chunks + byte-range index in the STORE's declared layout: location
    * end|start, crc32c or bare, either endianness) — one PUT per NEW
    * shard, existing objects untouched (extent shard-aligned by contract;
    * `append.realign=true` absorbs a mid-shard tail by rewriting the
    * tail-row objects merged with the batch — see `tailShardRow`). Emits the
    * same per-INNER-chunk bounds records the chunked path does, so zone-map
    * maintenance downstream is layout-blind. Mirrors the sink's sharded
    * writer (ZarrSink.scala `case Some(shards)`), restricted to the append
    * contract (no range re-check: dtype already validated). */
  private def appendSharded(
      indexed: DataFrame,
      meta: ZarrArrayMeta,
      shards: Vector[Int],
      newShape: Vector[Int],
      nChunksVec: Vector[Int],
      chunkExpr: org.apache.spark.sql.Column,
      localExpr: org.apache.spark.sql.Column,
      geom: ZarrSink.ChunkGeom,
      elems: Int,
      fill: Double,
      fillStr: String,
      statsOn: Boolean,
      intDomain: Boolean,
      arrayDirStr: String,
      executorOpts: Map[String, String],
      parts: Int,
      tailShardRow: Long
  ): Array[ZarrSink.ChunkBounds] = {
    val dt = meta.zdtype
    val isStr = ZDtype.isString(dt.code)
    val chunks = meta.chunks
    shards.zip(chunks).foreach { case (s, c) =>
      require(s % c == 0, s"shard shape $shards must be a multiple of inner chunks $chunks")
    }
    val nShardsVec = newShape.zip(shards).map { case (s, c) => (s + c - 1) / c }
    val shardStrides = IndexMath.strides(nShardsVec)
    val innerPerVec = shards.zip(chunks).map { case (s, c) => s / c }
    val shardExpr = meta.dims.indices
      .map(di => expr(s"__i$di div ${shards(di)}") * lit(shardStrides(di)))
      .reduce(_ + _)
    val nChunksArr = nChunksVec.toArray
    val nShardsArr = nShardsVec.toArray
    val innerPerArr = innerPerVec.toArray
    val innerStrides = IndexMath.strides(innerPerVec).toArray
    val nInner = innerPerVec.map(_.toLong).product.toInt
    val v3Cfgs = meta.v3Codecs
    val keyEnc = meta.keyEncoding
    val keySep = meta.keySeparator
    val dtypeStr = meta.dtype
    // Honor the STORE's declared shard-index layout (index_location,
    // index_codecs crc32c-or-not, endianness) — ZarrStoreWriter can itself
    // produce index_location=start stores, and appending a hardcoded
    // end/crc/LE index to one would corrupt every shard object we write.
    val idxAtEnd = meta.shardIndexAtEnd
    val idxCrc = meta.shardIndexCrc
    val idxBig = meta.shardIndexBigEndian
    // Spec: index offsets are absolute within the shard object, so a
    // leading index shifts the data region by its own stored length.
    val dataBase = if (idxAtEnd) 0L else nInner * 16L + (if (idxCrc) 4L else 0L)
    // chunk count along dim 0 under the OLD shape: the realign preload's
    // boundary between chunks to copy and chunks the batch rewrites
    val oldChunk0Count = (meta.shape.head / chunks.head).toLong
    indexed
      .select(
        shardExpr.as("__shard"),
        chunkExpr.as("__chunk"),
        localExpr.as("__local"),
        col("value").as("__value")
      )
      .repartition(parts, col("__shard"))
      .sortWithinPartitions("__shard", "__chunk")
      .rdd
      .mapPartitions { (rows: Iterator[Row]) =>
        val order = if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
        val rank = nShardsArr.length
        var curShard = -1L
        var curChunk = -1L
        var buf: ByteBuffer = null
        var cells: Array[String] = null
        val shardData = new java.io.ByteArrayOutputStream()
        val index = new Array[Long](nInner * 2)
        val stats = Array.newBuilder[ZarrSink.ChunkBounds]
        val stride0 = shardStrides.head
        def keyOf(shardOrd: Long): String = {
          val sIdx = new Array[Int](rank)
          var rem = shardOrd
          var d = rank - 1
          while (d >= 0) { sIdx(d) = (rem % nShardsArr(d)).toInt; rem /= nShardsArr(d); d -= 1 }
          keyEnc match {
            case "default" => "c" + keySep + sIdx.mkString(keySep)
            case _ => sIdx.mkString(keySep)
          }
        }
        // REALIGN: this shard sits on the row holding the old (mid-shard)
        // extent — copy the existing object's live inner chunks into the
        // rewritten object byte-for-byte (no decode; their ChunkBounds
        // records are already in the stats doc). New-batch chunk positions
        // are disjoint: old chunks end before the chunk-aligned extent.
        // Chunks AT or past the old extent (left by a crashed realign
        // attempt whose metadata commit never landed) are skipped — the
        // replay rewrites them from the batch, keeping the rewritten
        // object byte-identical run over run.
        def preloadTail(shardOrd: Long): Unit =
          ZarrFileIO
            .readBytesIfExists(new HPath(arrayDirStr, keyOf(shardOrd)), executorOpts)
            .foreach { raw =>
              val storedLen = ZarrChunkIO.shardIndexStoredLen(nInner, idxCrc)
              require(
                raw.length >= storedLen,
                s"zarr realign append: tail shard object ${keyOf(shardOrd)} (${raw.length} B) is " +
                  s"smaller than its $storedLen B index — refusing to rewrite a corrupt object"
              )
              val idxOff = if (idxAtEnd) raw.length - storedLen else 0
              // shared parse (crc VERIFIED): a corrupt tail object rejects
              // loudly here instead of being copied byte-for-byte into the
              // rewritten shard
              val idx = ZarrChunkIO.parseShardIndexBytes(
                java.util.Arrays.copyOfRange(raw, idxOff, idxOff + storedLen),
                nInner, idxCrc, idxBig
              )
              var w = 0
              while (w < nInner) {
                val off = idx(2 * w)
                val len = idx(2 * w + 1)
                val chunk0 = tailShardRow * innerPerArr(0) + w / innerStrides(0)
                if (off != -1L && chunk0 < oldChunk0Count) {
                  index(2 * w) = dataBase + shardData.size().toLong
                  index(2 * w + 1) = len
                  shardData.write(raw, off.toInt, len.toInt)
                }
                w += 1
              }
            }
        def flushChunk(): Unit = if (curChunk >= 0L) {
          if (statsOn)
            stats += (if (isStr) ZarrSink.stringBoundsRecord(curChunk, cells, geom)
                      else ZarrSink.chunkBoundsRecord(curChunk, dt, buf, geom, intDomain))
          val raw = if (isStr) ZarrStoreWriter.vlenEncode(cells) else buf.array()
          val enc = v3Cfgs.foldLeft(raw)((b, cfg) => ZarrCodecV3.encode(cfg, b, math.max(dt.itemSize, 1)))
          val cIdx = new Array[Int](rank)
          var rem = curChunk
          var d = rank - 1
          while (d >= 0) { cIdx(d) = (rem % nChunksArr(d)).toInt; rem /= nChunksArr(d); d -= 1 }
          var w = 0L
          var k = 0
          while (k < rank) { w += (cIdx(k) % innerPerArr(k)).toLong * innerStrides(k); k += 1 }
          index(2 * w.toInt) = dataBase + shardData.size().toLong
          index(2 * w.toInt + 1) = enc.length.toLong
          shardData.write(enc)
        }
        def flushShard(): Unit = if (curShard >= 0L) {
          flushChunk()
          curChunk = -1L
          val ib = ByteBuffer
            .allocate(nInner * 16)
            .order(if (idxBig) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < nInner * 2) { ib.putLong(i * 8, index(i)); i += 1 }
          val idxBytes =
            if (idxCrc) ZarrCodecV3.encode("""{"name": "crc32c"}""", ib.array(), math.max(dt.itemSize, 1))
            else ib.array()
          ZarrFileIO.writeBytes(
            new HPath(arrayDirStr, keyOf(curShard)),
            executorOpts,
            if (idxAtEnd) shardData.toByteArray ++ idxBytes else idxBytes ++ shardData.toByteArray
          )
          shardData.reset()
        }
        while (rows.hasNext) {
          val r = rows.next()
          val s = r.getLong(0)
          val c = r.getLong(1)
          if (s != curShard) {
            flushShard()
            curShard = s
            java.util.Arrays.fill(index, -1L) // 2^64-1: missing inner chunk
            if (tailShardRow >= 0L && s / stride0 == tailShardRow) preloadTail(s)
          }
          if (c != curChunk) {
            flushChunk()
            curChunk = c
            if (isStr) {
              if (cells == null) cells = new Array[String](elems)
              java.util.Arrays.fill(cells.asInstanceOf[Array[AnyRef]], fillStr)
            } else {
              if (buf == null) buf = ByteBuffer.allocate(elems * dt.itemSize).order(order)
              if (fill == 0.0) java.util.Arrays.fill(buf.array(), 0.toByte)
              else { var i = 0; while (i < elems) { ZDtype.put(dt, buf, i, fill); i += 1 } }
            }
          }
          if (isStr) {
            val v = r.getString(3)
            cells(r.getLong(2).toInt) = if (v == null) fillStr else v
          } else ZarrSink.putCell(dt, buf, r.getLong(2).toInt, r.get(3), rCheck = false, 0L, 0L, dtypeStr)
        }
        flushShard()
        stats.result().iterator
      }
      .collect()
  }

  /** Rewrite a v3 array's zarr.json with a grown shape and replaced
    * attributes, preserving every other field verbatim. Top-level-only
    * transform: a "chunk_shape" (not "shape") key appears nested inside
    * sharding_indexed configs — sharded appends are supported and rely on
    * that nested config passing through untouched; "shape" itself never
    * occurs twice at the top level. Attr values are raw JSON fragments —
    * the same convention the sink's attrs maps use. */
  private def v3MetaWithShapeAttrs(
      raw: String,
      newShape: Vector[Int],
      attrs: Map[String, String]
  ): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val attrsJ: JValue = JObject(attrs.toList.map { case (k, v) => k -> JsonMethods.parse(v) })
    JsonMethods.parse(raw) match {
      case JObject(fields) =>
        val replaced = fields.map {
          case ("shape", _) => ("shape", JArray(newShape.toList.map(s => JInt(BigInt(s)))): JValue)
          case ("attributes", _) => ("attributes", attrsJ)
          case f => f
        }
        val withAttrs =
          if (replaced.exists(_._1 == "attributes")) replaced
          else replaced :+ ("attributes" -> attrsJ)
        JsonMethods.compact(JsonMethods.render(JObject(withAttrs)))
      case other =>
        throw new IllegalStateException(s"zarr append: array zarr.json is not an object: $other")
    }
  }

  /** Supported coordinate-array dtypes for the in-place tail append: the
    * shapes the sink itself writes (plus their big-endian variants), PLUS
    * externally-written fixed `|S`/`<U` string axes (exact padded-cell
    * encode, oversize cells refuse) and uint64 axes (exact decimal →
    * raw-bits encode). M8/TD require exact-micros units because externals
    * arrive as micros. numcodecs-FILTERED coordinate arrays append when
    * every filter has a write path (delta, quantize, bitround,
    * fixedscaleoffset, packbits — the same encode fold as
    * ZarrStoreWriter); only categorize-filtered axes still refuse. */
  private def requireAppendableCoord(cm: ZarrArrayMeta, dim: String): Unit = {
    require(cm.rank == 1, s"deferred append dim '$dim': coordinate array must be 1-D")
    cm.shardShape.foreach { ss =>
      require(
        ss.head % cm.chunks.head == 0,
        s"deferred append dim '$dim': coordinate shard shape ${ss.head} must be a " +
          s"multiple of its inner chunks ${cm.chunks.head}"
      )
    }
    cm.filters.foreach { cfg =>
      val id = ZarrFilters.idOf(cfg)
      require(
        Set("delta", "quantize", "bitround", "fixedscaleoffset", "packbits")(id),
        s"deferred append dim '$dim': numcodecs filter '$id' has no write path " +
          "(writable: delta, quantize, bitround, fixedscaleoffset, packbits)"
      )
      ZarrFilters.validateWritable(cfg, cm.zdtype) // encode preconditions, not just the id
    }
    cm.zdtype.code match {
      case ZDtype.I4 | ZDtype.I8 | ZDtype.F4 | ZDtype.F8 | ZDtype.VSTR => ()
      case ZDtype.S | ZDtype.US | ZDtype.U8 => () // fixed strings / uint64: exact cell encode
      case ZDtype.M8 | ZDtype.TD =>
        require(
          cm.zdtype.m8Num == 1L && cm.zdtype.m8Den == 1L,
          s"deferred append dim '$dim': datetime coordinate unit must be microseconds ('${cm.dtype}')"
        )
      case other =>
        throw new IllegalArgumentException(
          s"deferred append dim '$dim': coordinate dtype '${cm.dtype}' ($other) unsupported for in-place append"
        )
    }
  }

  /** Last coordinate value of a DEFERRED append axis as an external
    * (Row-compatible) value — one chunk read, never the whole axis. */
  private def deferredTailValue(
      store: ZarrStore,
      dim: String,
      extent: Int,
      storageOptions: Map[String, String]
  ): Any = {
    val cm = store.arrayMeta(dim)
    require(cm.shape.head == extent, s"coordinate axis '$dim' length ${cm.shape.head} != extent $extent")
    requireAppendableCoord(cm, dim)
    val chunkLen = cm.chunks.head
    val c = (extent - 1) / chunkLen
    val buf = ZarrChunkIO
      .readChunk(store.arrayDir(dim), cm, Seq(c), storageOptions)
      .getOrElse(
        throw new IllegalStateException(s"deferred append dim '$dim': missing coordinate chunk $c")
      )
    val local = (extent - 1) - c * chunkLen
    coordExternal(buf, local) match {
      case null =>
        throw new IllegalStateException(s"deferred append dim '$dim': null/NaT at the axis end")
      case ext => ext
    }
  }

  /** One decoded coordinate cell as the EXTERNAL value Spark's Row builders
    * and joins expect; null for NaT / null labels. Covers every dtype
    * [[ZarrStore.coordFor]] can defer. */
  private def coordExternal(b: ZarrBuffer, local: Int): Any = b.dt.code match {
    case ZDtype.I4 => b.getInt(local)
    case ZDtype.I8 => b.getLong(local)
    case ZDtype.F4 => b.getFloat(local)
    case ZDtype.F8 => b.getDouble(local)
    case ZDtype.M8 =>
      b.getM8(local) match {
        case null => null
        case us: Long => java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000L))
      }
    case ZDtype.TD =>
      b.getM8(local) match {
        case null => null
        case us: Long => java.time.Duration.ofNanos(us * 1000L)
      }
    case ZDtype.S | ZDtype.US | ZDtype.VSTR =>
      Option(b.getUTF8(local)).map(_.toString).orNull
    case ZDtype.U8 => b.getU8Dec(local).toJavaBigDecimal
    case other => throw new IllegalStateException(s"coordinate dtype $other is never deferred")
  }

  /** Distributed (value, ordinal) map of a DEFERRED non-append axis:
    * executors decode the coordinate array's chunks and the row->index
    * join SHUFFLES on the value — a 10^8-element axis never rides the
    * driver or a broadcast. Null cells (NaT / null labels) emit no pair;
    * rows carrying them reject in the coverage check like any dim value
    * the axis does not have. */
  private def deferredOrdinalMap(
      spark: org.apache.spark.sql.SparkSession,
      store: ZarrStore,
      dim: String,
      extent: Int,
      sparkType: org.apache.spark.sql.types.DataType,
      di: Int,
      storageOptions: Map[String, String]
  ): DataFrame = {
    val cm = store.arrayMeta(dim)
    require(
      cm.rank == 1 && cm.shape.head == extent,
      s"coordinate axis '$dim' shape ${cm.shape.mkString("x")} != extent $extent"
    )
    val chunkLen = cm.chunks.head
    val nCoordChunks = (extent + chunkLen - 1) / chunkLen
    val dir = store.arrayDir(dim)
    val executorOpts = ZarrFileIO.executorOptions(storageOptions)
    val parts = math.max(1, math.min(spark.sessionState.conf.numShufflePartitions, nCoordChunks))
    val rows = spark.sparkContext
      .parallelize(0 until nCoordChunks, parts)
      .flatMap { c =>
        val start = c * chunkLen
        val end = math.min(start + chunkLen, extent)
        ZarrChunkIO.readChunk(dir, cm, Seq(c), executorOpts) match {
          case None => Iterator.empty // unwritten chunk: null coords join nothing
          case Some(b) =>
            Iterator.range(start, end).flatMap { i =>
              coordExternal(b, i - start) match {
                case null => None
                case ext => Some(Row(ext, i.toLong))
              }
            }
        }
      }
    val schema = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("__v", sparkType, nullable = false),
        org.apache.spark.sql.types
          .StructField(s"__i$di", org.apache.spark.sql.types.LongType, nullable = false)
      )
    )
    spark.createDataFrame(rows, schema)
  }

  /** Append `newVals` to a DEFERRED coordinate axis in place: rewrite the
    * one partial tail chunk if the extent is mid-chunk (read-modify-write,
    * byte-exact copy of the existing prefix), write whole new chunks, then
    * bump the coord `.zarray` shape. Work is O(newVals + 1 chunk), driver-
    * side (newVals is already bounded at 1e6). */
  private def appendCoordTail(
      store: ZarrStore,
      dim: String,
      extent: Int,
      newVals: Array[Any],
      storageOptions: Map[String, String]
  ): Unit = {
    val cm = store.arrayMeta(dim)
    require(cm.shape.head == extent, s"coordinate axis '$dim' length ${cm.shape.head} != extent $extent")
    requireAppendableCoord(cm, dim)
    val dirStr = store.arrayDir(dim)
    val chunkLen = cm.chunks.head
    val dt = cm.zdtype
    val isStr = dt.code == ZDtype.VSTR
    val newTotal = extent + newVals.length
    val startChunk = extent / chunkLen
    val lastChunk = (newTotal - 1) / chunkLen
    val order = if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    // v3 coords encode through their parsed codec chain + key encoding;
    // v2 applies the numcodecs filter chain forward (same fold as
    // ZarrStoreWriter) before the compressor — the reader decodes in
    // reverse, so a rebuilt tail chunk round-trips through any filter the
    // precheck admitted
    def encodeCoord(raw: Array[Byte], typesize: Int): Array[Byte] =
      if (cm.v3) cm.v3Codecs.foldLeft(raw)((b, cfg) => ZarrCodecV3.encode(cfg, b, typesize))
      else {
        val filtered = cm.filters.foldLeft(raw)((b, cfg) => ZarrFilters.encode(cfg, dt, b))
        ZarrCodec.compress(cm.compressor, filtered, typesize)
      }
    def coordKey(c: Int): String = cm.chunkKey(Seq(c))
    // the partial tail chunk's existing cells (byte-exact for numerics)
    val nKeep = extent - startChunk * chunkLen
    val existing: Option[ZarrBuffer] =
      if (nKeep > 0)
        Some(
          ZarrChunkIO
            .readChunk(dirStr, cm, Seq(startChunk), storageOptions)
            .getOrElse(
              throw new IllegalStateException(s"deferred append dim '$dim': missing coordinate chunk $startChunk")
            )
        )
      else None
    // ENCODED bytes of rebuilt chunk c (>= startChunk): ""-/zero-padded
    // past the axis end, existing partial prefix merged at the boundary
    def encodedChunk(c: Int): Array[Byte] =
      if (isStr) {
        val arr = Array.fill(chunkLen)("") // ""-padded past the axis end
        if (c == startChunk) existing.foreach { b =>
          var i = 0
          while (i < nKeep) { arr(i) = Option(b.getUTF8(i)).map(_.toString).getOrElse(""); i += 1 }
        }
        var g = math.max(c.toLong * chunkLen, extent.toLong)
        val end = math.min((c.toLong + 1) * chunkLen, newTotal.toLong)
        while (g < end) {
          arr((g - c.toLong * chunkLen).toInt) = newVals((g - extent).toInt).asInstanceOf[String]
          g += 1
        }
        encodeCoord(ZarrStoreWriter.vlenEncode(arr), typesize = 1)
      } else {
        val buf = ByteBuffer.allocate(chunkLen * dt.itemSize).order(order) // zero pad past the end
        if (c == startChunk) existing.foreach(b => System.arraycopy(b.raw, 0, buf.array(), 0, nKeep * dt.itemSize))
        var g = math.max(c.toLong * chunkLen, extent.toLong)
        val end = math.min((c.toLong + 1) * chunkLen, newTotal.toLong)
        while (g < end) {
          ZarrSink.putCoordCell(dt, buf, (g - c.toLong * chunkLen).toInt, newVals((g - extent).toInt))
          g += 1
        }
        encodeCoord(buf.array(), typesize = dt.itemSize)
      }
    cm.shardShape match {
      case None =>
        var c = startChunk
        while (c <= lastChunk) {
          ZarrFileIO.writeBytes(new HPath(dirStr, coordKey(c)), storageOptions, encodedChunk(c))
          c += 1
        }
      case Some(ss) =>
        // SHARDED coordinate axis (v3): same object-store shape as the
        // value-array append — existing inner chunks of the tail shard copy
        // byte-for-byte (no decode), chunks >= startChunk rebuild from the
        // batch, each affected shard is ONE whole-object PUT, and the index
        // follows the store's declared layout. Chunks at/past startChunk in
        // a pre-existing tail object (a crashed attempt whose metadata
        // commit never landed) are skipped, so replay rewrites the object
        // byte-identically.
        val shardLen = ss.head
        val innerPer = shardLen / chunkLen
        val idxAtEnd = cm.shardIndexAtEnd
        val idxCrc = cm.shardIndexCrc
        val idxBig = cm.shardIndexBigEndian
        val storedLen = ZarrChunkIO.shardIndexStoredLen(innerPer, idxCrc)
        val dataBase = if (idxAtEnd) 0L else storedLen.toLong
        val startShard = extent / shardLen
        val lastShard = (newTotal - 1) / shardLen
        val oldTail: Option[(Array[Byte], Array[Long])] =
          if (extent > startShard * shardLen)
            ZarrFileIO
              .readBytesIfExists(new HPath(dirStr, cm.chunkKey(Seq(startShard))), storageOptions)
              .map { raw =>
                require(
                  raw.length >= storedLen,
                  s"deferred append dim '$dim': tail coordinate shard object (${raw.length} B) is " +
                    s"smaller than its $storedLen B index — refusing to rewrite a corrupt object"
                )
                val idxOff = if (idxAtEnd) raw.length - storedLen else 0
                (
                  raw,
                  ZarrChunkIO.parseShardIndexBytes(
                    java.util.Arrays.copyOfRange(raw, idxOff, idxOff + storedLen),
                    innerPer,
                    idxCrc,
                    idxBig
                  )
                )
              }
          else None
        var s = startShard
        while (s <= lastShard) {
          val data = new java.io.ByteArrayOutputStream()
          val index = Array.fill(innerPer * 2)(-1L) // 2^64-1: missing inner chunk
          var w = 0
          while (w < innerPer) {
            val c = s * innerPer + w
            if (c.toLong * chunkLen < newTotal) {
              if (c < startChunk) {
                oldTail.foreach { case (raw, idx) =>
                  val off = idx(2 * w)
                  val len = idx(2 * w + 1)
                  if (off != -1L) {
                    index(2 * w) = dataBase + data.size().toLong
                    index(2 * w + 1) = len
                    data.write(raw, off.toInt, len.toInt)
                  }
                }
              } else {
                val enc = encodedChunk(c)
                index(2 * w) = dataBase + data.size().toLong
                index(2 * w + 1) = enc.length.toLong
                data.write(enc)
              }
            }
            w += 1
          }
          val ib = ByteBuffer
            .allocate(innerPer * 16)
            .order(if (idxBig) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < innerPer * 2) { ib.putLong(i * 8, index(i)); i += 1 }
          val idxBytes =
            if (idxCrc)
              ZarrCodecV3.encode("""{"name": "crc32c"}""", ib.array(), math.max(dt.itemSize, 1))
            else ib.array()
          ZarrFileIO.writeBytes(
            new HPath(dirStr, cm.chunkKey(Seq(s))),
            storageOptions,
            if (idxAtEnd) data.toByteArray ++ idxBytes else idxBytes ++ data.toByteArray
          )
          s += 1
        }
    }
    // bump the coordinate array's shape LAST (the tail chunks above are
    // invisible until this lands; a crash before it leaves the old axis)
    if (cm.v3) {
      val raw = ZarrFileIO
        .readStringIfExists(new HPath(dirStr, "zarr.json"), storageOptions)
        .getOrElse(throw new IllegalStateException(s"deferred append dim '$dim': missing zarr.json"))
      ZarrFileIO.writeString(
        new HPath(dirStr, "zarr.json"),
        storageOptions,
        v3MetaWithShapeAttrs(raw, Vector(newTotal), cm.attrs)
      )
    } else {
      val zarrayRaw = ZarrFileIO
        .readStringIfExists(new HPath(dirStr, ".zarray"), storageOptions)
        .getOrElse(throw new IllegalStateException(s"deferred append dim '$dim': missing .zarray"))
      val updated = zarrayRaw.replaceFirst(
        """"shape"\s*:\s*\[[0-9,\s]*\]""",
        s""""shape": [$newTotal]"""
      )
      require(updated != zarrayRaw, s"deferred append dim '$dim': could not rewrite .zarray shape")
      ZarrFileIO.writeString(new HPath(dirStr, ".zarray"), storageOptions, updated)
    }
  }

  /** Internal coord cell -> the external (Row-compatible) value. */
  private def externalOf(c: Coord, v: Any): Any = c match {
    case _: Coord.Timestamps => java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(v.asInstanceOf[Long] * 1000L))
    case _: Coord.Strings => v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    case _: Coord.Intervals => java.time.Duration.ofNanos(v.asInstanceOf[Long] * 1000L)
    case _ => v
  }
}
