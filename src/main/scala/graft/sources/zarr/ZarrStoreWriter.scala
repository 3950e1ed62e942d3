package graft.sources.zarr

import graft.model.IndexMath
import graft.sources.Coord

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Minimal Zarr v2 writer — test fixtures and the CLI `write-demo` path.
  * (The reference is read-only over Zarr; this exists because no Python zarr
  * stack is available here to create stores.) Driver-side, small data only. */
object ZarrStoreWriter {

  def writeGroup(root: String, group: Option[String] = None): Path = {
    val dir = group.map(g => Paths.get(root, g)).getOrElse(Paths.get(root))
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(".zgroup"), """{"zarr_format": 2}""")
    dir
  }

  /** Write one n-D array from a flat C-order generator. `filters` is a list
    * of numcodecs filter ids (e.g. "delta") applied in order before the
    * compressor, emitted into `.zarray` as configs. */
  def writeArray(
      groupDir: Path,
      name: String,
      shape: Vector[Int],
      chunks: Vector[Int],
      dtype: String,
      value: Long => Double,
      dims: Option[Vector[String]] = None,
      attrs: Map[String, String] = Map.empty,
      compressor: Option[String] = None,
      fillValue: Option[Double] = Some(0.0),
      filters: Seq[String] = Nil
  ): Unit = {
    require(shape.length == chunks.length)
    val dir = groupDir.resolve(name)
    Files.createDirectories(dir)
    // bare ids become minimal configs; raw JSON configs pass through (for
    // parameterized filters like fixedscaleoffset)
    val filterCfgs =
      filters.map(f => if (f.trim.startsWith("{")) f else s"""{"id": "$f", "dtype": "$dtype"}""")
    Files.writeString(
      dir.resolve(".zarray"),
      zarrayJson(shape, chunks, dtype, compressor, fillValue, filterCfgs)
    )
    Files.writeString(dir.resolve(".zattrs"), zattrsJson(dims, attrs))

    val dt = ZDtype.parse(dtype)
    foreachChunk(shape, chunks, dt, value, fillValue.getOrElse(0.0)) { (cIdx, raw) =>
      val filtered = filterCfgs.foldLeft(raw)((b, cfg) => ZarrFilters.encode(cfg, dt, b))
      val bytes = ZarrCodec.compress(compressor, filtered, typesize = dt.itemSize)
      Files.write(dir.resolve(ZarrChunkIO.chunkFileName(cIdx.toSeq)), bytes)
    }
  }

  /** Generate every chunk's RAW bytes (fill applied, in-bounds cells from
    * the flat C-order generator) and hand (chunkIdx, bytes) to `sink` —
    * shared by the v2 and v3 fixture writers. */
  private[zarr] def foreachChunk(
      shape: Vector[Int],
      chunks: Vector[Int],
      dt: ZDtype,
      value: Long => Double,
      fillV: Double
  )(sink: (Array[Int], Array[Byte]) => Unit): Unit = {
    val rank = shape.length
    val nC = shape.zip(chunks).map { case (s, c) => if (s == 0) 0 else (s + c - 1) / c }
    val chunkCount = nC.map(_.toLong).product.toInt

    val cIdx = new Array[Int](rank)
    var ci = 0
    while (ci < chunkCount) { // rank 0 => empty product = 1 chunk

      var rem = ci; var d = rank - 1
      while (d >= 0) { cIdx(d) = if (nC(d) == 0) 0 else rem % nC(d); rem /= math.max(nC(d), 1); d -= 1 }
      sink(cIdx, chunkRaw(shape, chunks, dt, value, fillV, cIdx))
      ci += 1
    }
  }

  /** RAW bytes of ONE chunk (fill applied, in-bounds cells from the flat
    * C-order generator) — the per-chunk body of [[foreachChunk]], also used
    * standalone by the sharded fixture writer. */
  private[zarr] def chunkRaw(
      shape: Vector[Int],
      chunks: Vector[Int],
      dt: ZDtype,
      value: Long => Double,
      fillV: Double,
      cIdx: Array[Int]
  ): Array[Byte] = {
    val item = dt.itemSize
    val rank = shape.length
    val chunkElems = chunks.map(_.toLong).product.toInt
    val globalStrides = IndexMath.strides(shape)
    val chunkStrides = IndexMath.strides(chunks)
    val buf = ByteBuffer
      .allocate(chunkElems * item)
      .order(if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < chunkElems) { ZDtype.put(dt, buf, i, fillV); i += 1 }
    // write in-bounds cells
    val lo = Array.tabulate(rank)(d => cIdx(d) * chunks(d))
    val hi = Array.tabulate(rank)(d => math.min(shape(d), lo(d) + chunks(d)))
    if (rank == 0) ZDtype.put(dt, buf, 0, value(0L))
    else if (!hi.indices.exists(d => lo(d) >= hi(d))) {
      val pos = lo.clone()
      var done = false
      while (!done) {
        var localFlat = 0L; var globalFlat = 0L
        var k = 0
        while (k < rank) {
          localFlat += (pos(k) - lo(k)) * chunkStrides(k)
          globalFlat += pos(k).toLong * globalStrides(k)
          k += 1
        }
        ZDtype.put(dt, buf, localFlat.toInt, value(globalFlat))
        var c = rank - 1; var carry = true
        while (carry && c >= 0) {
          pos(c) += 1
          if (pos(c) < hi(c)) carry = false else { pos(c) = lo(c); c -= 1 }
        }
        done = carry
      }
    }
    buf.array()
  }

  /** `.zarray` metadata JSON. Blosc spec strings ("blosc:lz4",
    * "blosc:zstd:noshuffle", "blosc:lz4:bitshuffle") serialize as
    * numcodecs-shaped config; the id alone drives decode (the frame header
    * is self-describing). Shared by the local fixture writer and the
    * distributed sink. */
  def zarrayJson(
      shape: Vector[Int],
      chunks: Vector[Int],
      dtype: String,
      compressor: Option[String],
      fillValue: Option[Double],
      filterCfgs: Seq[String] = Nil
  ): String = {
    val comp = compressorJson(compressor)
    val fill = fillValue.map(f => if (f.isNaN) "\"NaN\"" else f.toString).getOrElse("null")
    val filt = if (filterCfgs.isEmpty) "null" else filterCfgs.mkString("[", ", ", "]")
    s"""{"zarr_format": 2, "shape": [${shape.mkString(",")}], "chunks": [${chunks.mkString(",")}],
       |"dtype": "$dtype", "order": "C", "compressor": $comp, "fill_value": $fill, "filters": $filt}""".stripMargin
  }

  /** numcodecs-shaped compressor config JSON ("null" when uncompressed). */
  def compressorJson(compressor: Option[String]): String =
    compressor.map { c =>
      val parts = c.split(":")
      if (parts(0) == "blosc") {
        val cname = if (parts.length > 1) parts(1) else "lz4"
        val shuf = ZarrCodec.shuffleModeOf(parts)
        s"""{"id": "blosc", "cname": "$cname", "clevel": 5, "shuffle": $shuf, "blocksize": 0}"""
      } else s"""{"id": "$c"}"""
    }.getOrElse("null")

  /** Minimal JSON string escaping (quotes, backslash, control chars). */
  def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    (sb += '"').toString
  }

  /** `.zattrs` JSON with the xarray dimension-name convention. */
  def zattrsJson(dims: Option[Vector[String]], attrs: Map[String, String] = Map.empty): String = {
    val dimAttr = dims.map(d => s""""_ARRAY_DIMENSIONS": [${d.map(x => s""""$x"""").mkString(",")}]""")
    val extraAttrs = attrs.map { case (k, v) => s""""$k": $v""" }
    s"{${(dimAttr.toSeq ++ extraAttrs).mkString(", ")}}"
  }

  /** Write a STRING-dtyped array: `|S<n>` fixed bytes, `<U<n>`/`>U<n>`
    * fixed UCS4, or `|O` + vlen-utf8 filter (the numcodecs object-array
    * encoding). Out-of-bounds edge cells encode as empty strings;
    * fill_value is written as null. */
  def writeStringArray(
      groupDir: Path,
      name: String,
      shape: Vector[Int],
      chunks: Vector[Int],
      dtype: String,
      value: Long => String,
      dims: Option[Vector[String]] = None,
      compressor: Option[String] = None,
      filters: Seq[String] = Nil
  ): Unit = {
    require(shape.length == chunks.length)
    val dt = ZDtype.parse(dtype)
    require(ZDtype.isString(dt.code), s"writeStringArray needs a string dtype, got $dtype")
    val vlen = dt.code == ZDtype.VSTR
    // categorize REPLACES the structural vlen-utf8: chunks hold int codes
    val catCfg = filters.find(f => ZarrFilters.idOf(f) == "categorize")
    val dir = groupDir.resolve(name)
    Files.createDirectories(dir)
    val filterCfgs =
      if (catCfg.isDefined) filters
      else if (vlen) Seq("""{"id": "vlen-utf8"}""") else Nil
    Files.writeString(
      dir.resolve(".zarray"),
      zarrayJson(shape, chunks, dtype, compressor, fillValue = None, filterCfgs)
    )
    Files.writeString(dir.resolve(".zattrs"), zattrsJson(dims))
    foreachStringChunk(shape, chunks, value) { (cIdx, cells) =>
      val raw: Array[Byte] = catCfg match {
        case Some(cfg) => ZarrFilters.categorizeEncodeCells(cfg, cells)
        case None if vlen => vlenEncode(cells)
        case None =>
          val out = new Array[Byte](cells.length * dt.itemSize)
          var i = 0
          while (i < cells.length) {
            System.arraycopy(ZarrBuffer.encodeFixed(cells(i), dt), 0, out, i * dt.itemSize, dt.itemSize)
            i += 1
          }
          out
      }
      val typesize = catCfg match {
        case Some(_) => math.max(1, raw.length / math.max(1, cells.length))
        case None => if (vlen) 1 else dt.itemSize
      }
      val bytes = ZarrCodec.compress(compressor, raw, typesize = typesize)
      Files.write(dir.resolve(ZarrChunkIO.chunkFileName(cIdx.toSeq)), bytes)
    }
  }

  /** Complex array (`<c8`/`<c16`): per-cell (re, im) IEEE pairs. */
  def writeComplexArray(
      groupDir: Path,
      name: String,
      shape: Vector[Int],
      chunks: Vector[Int],
      dtype: String,
      value: Long => (Double, Double),
      dims: Option[Vector[String]] = None,
      compressor: Option[String] = None
  ): Unit = {
    require(shape.length == chunks.length)
    val dt = ZDtype.parse(dtype)
    require(ZDtype.isComplex(dt.code), s"writeComplexArray needs c8/c16, got $dtype")
    val half = dt.itemSize / 2
    val dir = groupDir.resolve(name)
    Files.createDirectories(dir)
    Files.writeString(
      dir.resolve(".zarray"),
      zarrayJson(shape, chunks, dtype, compressor, fillValue = None)
    )
    Files.writeString(dir.resolve(".zattrs"), zattrsJson(dims))
    val rank = shape.length
    val chunkElems = chunks.map(_.toLong).product.toInt
    val globalStrides = IndexMath.strides(shape)
    val chunkStrides = IndexMath.strides(chunks)
    val nC = shape.zip(chunks).map { case (s, c) => if (s == 0) 0 else (s + c - 1) / c }
    val chunkCount = nC.map(_.toLong).product.toInt
    val buf = ByteBuffer
      .allocate(chunkElems * dt.itemSize)
      .order(if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    def putPair(i: Int, re: Double, im: Double): Unit =
      if (half == 4) { buf.putFloat(i * 8, re.toFloat); buf.putFloat(i * 8 + 4, im.toFloat) }
      else { buf.putDouble(i * 16, re); buf.putDouble(i * 16 + 8, im) }
    val cIdx = new Array[Int](rank)
    var ci = 0
    while (ci < chunkCount) {
      var rem = ci; var d = rank - 1
      while (d >= 0) { cIdx(d) = if (nC(d) == 0) 0 else rem % nC(d); rem /= math.max(nC(d), 1); d -= 1 }
      java.util.Arrays.fill(buf.array(), 0.toByte)
      val lo = Array.tabulate(rank)(dd => cIdx(dd) * chunks(dd))
      val hi = Array.tabulate(rank)(dd => math.min(shape(dd), lo(dd) + chunks(dd)))
      if (rank == 0) { val (re, im) = value(0L); putPair(0, re, im) }
      else if (!hi.indices.exists(dd => lo(dd) >= hi(dd))) {
        val pos = lo.clone()
        var done = false
        while (!done) {
          var localFlat = 0L; var globalFlat = 0L
          var k = 0
          while (k < rank) {
            localFlat += (pos(k) - lo(k)) * chunkStrides(k)
            globalFlat += pos(k).toLong * globalStrides(k)
            k += 1
          }
          val (re, im) = value(globalFlat)
          putPair(localFlat.toInt, re, im)
          var c = rank - 1; var carry = true
          while (carry && c >= 0) {
            pos(c) += 1
            if (pos(c) < hi(c)) carry = false else { pos(c) = lo(c); c -= 1 }
          }
          done = carry
        }
      }
      Files.write(
        dir.resolve(ZarrChunkIO.chunkFileName(cIdx.toSeq)),
        ZarrCodec.compress(compressor, buf.array().clone(), typesize = half)
      )
      ci += 1
    }
  }

  /** numcodecs vlen-utf8 stream for one chunk's cells. */
  private[zarr] def vlenEncode(cells: Array[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val hdr = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(0, cells.length); bos.write(hdr.array())
    cells.foreach { s =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val lb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      lb.putInt(0, b.length); bos.write(lb.array()); bos.write(b)
    }
    bos.toByteArray
  }

  /** String analog of [[foreachChunk]]: every chunk's cells in local
    * C-order (out-of-bounds edge cells = ""), handed to `sink`. */
  private[zarr] def foreachStringChunk(
      shape: Vector[Int],
      chunks: Vector[Int],
      value: Long => String
  )(sink: (Array[Int], Array[String]) => Unit): Unit = {
    val rank = shape.length
    val chunkElems = chunks.map(_.toLong).product.toInt
    val globalStrides = IndexMath.strides(shape)
    val chunkStrides = IndexMath.strides(chunks)
    val nC = shape.zip(chunks).map { case (s, c) => if (s == 0) 0 else (s + c - 1) / c }
    val chunkCount = nC.map(_.toLong).product.toInt
    val cIdx = new Array[Int](rank)
    var ci = 0
    while (ci < chunkCount) {
      var rem = ci; var d = rank - 1
      while (d >= 0) { cIdx(d) = if (nC(d) == 0) 0 else rem % nC(d); rem /= math.max(nC(d), 1); d -= 1 }
      val cells = Array.fill(chunkElems)("")
      val lo = Array.tabulate(rank)(dd => cIdx(dd) * chunks(dd))
      val hi = Array.tabulate(rank)(dd => math.min(shape(dd), lo(dd) + chunks(dd)))
      if (rank == 0) cells(0) = value(0L)
      else if (!hi.indices.exists(dd => lo(dd) >= hi(dd))) {
        val pos = lo.clone()
        var done = false
        while (!done) {
          var localFlat = 0L; var globalFlat = 0L
          var k = 0
          while (k < rank) {
            localFlat += (pos(k) - lo(k)) * chunkStrides(k)
            globalFlat += pos(k).toLong * globalStrides(k)
            k += 1
          }
          cells(localFlat.toInt) = value(globalFlat)
          var c = rank - 1; var carry = true
          while (carry && c >= 0) {
            pos(c) += 1
            if (pos(c) < hi(c)) carry = false else { pos(c) = lo(c); c -= 1 }
          }
          done = carry
        }
      }
      sink(cIdx.clone(), cells)
      ci += 1
    }
  }

  /** Structured (compound) array: each cell a packed record of scalar
    * fields; `dtypeJson` is the v2 list-of-[name, dtype] spelling and
    * `cell` maps the global C-order flat index to one external value per
    * field. Out-of-bounds pad cells stay all-zero bytes. */
  def writeStructArray(
      groupDir: Path,
      name: String,
      shape: Vector[Int],
      chunks: Vector[Int],
      dtypeJson: String,
      cell: Long => Seq[Any],
      dims: Option[Vector[String]] = None,
      compressor: Option[String] = None,
      fillBase64: Option[String] = None
  ): Unit = {
    require(shape.length == chunks.length)
    val dt = ZDtype.parse(dtypeJson)
    require(dt.code == ZDtype.V, s"writeStructArray needs a structured dtype, got $dtypeJson")
    val dir = groupDir.resolve(name)
    Files.createDirectories(dir)
    Files.writeString(
      dir.resolve(".zarray"),
      s"""{"zarr_format": 2, "shape": [${shape.mkString(",")}], "chunks": [${chunks.mkString(",")}],
         |"dtype": $dtypeJson, "order": "C", "compressor": ${compressorJson(compressor)},
         |"fill_value": ${fillBase64.map(b => "\"" + b + "\"").getOrElse("null")}, "filters": null}""".stripMargin
    )
    Files.writeString(dir.resolve(".zattrs"), zattrsJson(dims))
    val chunkElems = chunks.map(_.toLong).product.toInt
    // ride the string chunk walk (global flat index as decimal; pad = "")
    foreachStringChunk(shape, chunks, i => i.toString) { (cIdx, cells) =>
      val buf = ByteBuffer.allocate(math.max(1, chunkElems) * dt.itemSize)
      var k = 0
      while (k < cells.length) {
        if (cells(k).nonEmpty) {
          val vals = cell(cells(k).toLong)
          require(vals.length == dt.fields.length, s"cell yields ${vals.length} values for ${dt.fields.length} fields")
          var f = 0
          while (f < vals.length) {
            packStructField(buf, k * dt.itemSize + dt.fieldOffsets(f), dt.fields(f)._2, vals(f))
            f += 1
          }
        }
        k += 1
      }
      val bytes = ZarrCodec.compress(compressor, buf.array(), typesize = dt.itemSize)
      Files.write(dir.resolve(ZarrChunkIO.chunkFileName(cIdx.toSeq)), bytes)
    }
  }

  private[zarr] def packStructField(buf0: ByteBuffer, off: Int, fdt: ZDtype, v: Any): Unit = {
    if (fdt.shape.nonEmpty) {
      // shaped field: value is a nested Seq matching the numpy subarray;
      // elements pack row-major through the scalar path. Arity is checked
      // LEVEL-BY-LEVEL against fdt.shape — a ragged nesting with the right
      // flattened count (e.g. [[1,2,3],[4]] for 2x2) must fail, not pack
      // silently with elements in the wrong cells.
      val e = fdt.elem
      def level(x: Any, depth: Int): Seq[Any] = x match {
        case null =>
          throw new IllegalArgumentException(
            "null element in shaped structured field — zarr subarray cells have no per-element null"
          )
        // collection.Seq, not (immutable) Seq: Spark Rows surface array
        // columns as mutable.ArraySeq in Scala 2.13
        case s: scala.collection.Seq[_] => s.toSeq
        case a: Array[_] => a.toSeq
        case o =>
          throw new IllegalArgumentException(
            s"shaped structured field ${fdt.shape.mkString("x")}: expected a sequence at " +
              s"nesting depth $depth, got scalar $o"
          )
      }
      def walk(x: Any, dims: List[Int], o: Int): Unit = dims match {
        case Nil => packStructField(buf0, o, e, x)
        case d :: rest =>
          val depth = fdt.shape.length - dims.length
          val s = level(x, depth)
          require(
            s.length == d,
            s"shaped structured field ${fdt.shape.mkString("x")}: nesting depth $depth has " +
              s"${s.length} elements, expected $d"
          )
          val stride = rest.map(_.toLong).product.toInt * e.itemSize
          var i = 0
          s.foreach { c => walk(c, rest, o + i * stride); i += 1 }
      }
      walk(v, fdt.shape.toList, off)
      return
    }
    def asLong(x: Any): Long = x match {
      case i: Int => i.toLong
      case l: Long => l
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalArgumentException(s"bad integral field value $other")
    }
    def asDouble(x: Any): Double = x match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other => throw new IllegalArgumentException(s"bad float field value $other")
    }
    val bb = buf0.duplicate().order(if (fdt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    fdt.code match {
      case ZDtype.BOOL => bb.put(off, (if (v.asInstanceOf[Boolean]) 1 else 0).toByte)
      case ZDtype.I1 | ZDtype.U1 => bb.put(off, asLong(v).toByte)
      case ZDtype.I2 | ZDtype.U2 => bb.putShort(off, asLong(v).toShort)
      case ZDtype.I4 | ZDtype.U4 => bb.putInt(off, asLong(v).toInt)
      case ZDtype.I8 | ZDtype.U8 => bb.putLong(off, asLong(v))
      case ZDtype.M8 | ZDtype.TD =>
        // datetime/timedelta fields: externals arrive as Timestamp/Instant
        // (M8) or Duration (TD) and must land in the field dtype's RAW
        // stored unit — the inverse of the read path's m8Micros scaling
        // (micros = raw * m8Num / m8Den). Raw longs pass through untouched
        // for callers that already hold stored units.
        val raw: Long = v match {
          case t @ (_: java.sql.Timestamp | _: java.time.Instant) =>
            ZarrSink.micros(t) * fdt.m8Den / fdt.m8Num
          case d: java.time.Duration => (d.toNanos / 1000L) * fdt.m8Den / fdt.m8Num
          case other => asLong(other)
        }
        bb.putLong(off, raw)
      case ZDtype.F2 => bb.putShort(off, ZDtype.floatToHalf(asDouble(v).toFloat))
      case ZDtype.F4 => bb.putFloat(off, asDouble(v).toFloat)
      case ZDtype.F8 => bb.putDouble(off, asDouble(v))
      case ZDtype.S | ZDtype.US =>
        val enc = ZarrBuffer.encodeFixed(v.asInstanceOf[String], fdt)
        var i = 0
        while (i < enc.length) { bb.put(off + i, enc(i)); i += 1 }
      case other => throw new IllegalArgumentException(s"unsupported structured field dtype code $other")
    }
  }

  /** Write a 1-D coordinate array for a dimension. */
  def writeCoord(groupDir: Path, dim: String, coord: Coord, compressor: Option[String] = None): Unit = {
    coord match {
      case Coord.Strings(a) =>
        // label axes write as vlen-utf8 object arrays (what xarray/zarr-
        // python produce for object-dtype coordinates)
        writeStringArray(
          groupDir, dim, Vector(a.length), Vector(a.length), "|O",
          i => a(i.toInt).toString, dims = Some(Vector(dim)), compressor = compressor
        )
        return
      case _ => ()
    }
    val (dtype, f): (String, Long => Double) = coord match {
      case Coord.Ints(a) => ("<i4", (i: Long) => a(i.toInt).toDouble)
      case Coord.Longs(a) => ("<i8", (i: Long) => a(i.toInt).toDouble)
      case Coord.Floats(a) => ("<f4", (i: Long) => a(i.toInt).toDouble)
      case Coord.Doubles(a) => ("<f8", (i: Long) => a(i.toInt))
      case Coord.Timestamps(a) => ("<M8[us]", (i: Long) => a(i.toInt).toDouble)
      case Coord.Intervals(a) => ("<m8[us]", (i: Long) => a(i.toInt).toDouble)
      case Coord.Index(_) => ("<i8", (i: Long) => i.toDouble)
      case other => throw new IllegalArgumentException(s"writeCoord: unsupported coord $other")
    }
    writeArray(
      groupDir,
      dim,
      Vector(coord.length),
      Vector(coord.length),
      dtype,
      f,
      dims = Some(Vector(dim)),
      compressor = compressor
    )
  }

  /** Build `.zmetadata` from the on-disk metadata files (consolidated path). */
  def consolidate(groupDir: Path): Unit = {
    val entries = scala.collection.mutable.ListBuffer[String]()
    if (Files.exists(groupDir.resolve(".zgroup")))
      entries += "\".zgroup\": " + Files.readString(groupDir.resolve(".zgroup"))
    Files.list(groupDir).iterator().asScala.filter(Files.isDirectory(_)).toSeq.sortBy(_.getFileName.toString).foreach { d =>
      val n = d.getFileName.toString
      Seq(".zarray", ".zattrs").foreach { mf =>
        val f = d.resolve(mf)
        if (Files.exists(f)) entries += s""""$n/$mf": ${Files.readString(f)}"""
      }
    }
    Files.writeString(
      groupDir.resolve(".zmetadata"),
      s"""{"zarr_format": 2, "metadata": {${entries.mkString(",\n")}}}"""
    )
  }
}

/** Minimal Zarr V3 writer — test fixtures only (zarr-specs v3: single
  * `zarr.json` per node, `c/`-prefixed chunk keys, codecs pipeline).
  * Codec spec strings: "gzip", "zstd", "blosc[:cname[:noshuffle|:bitshuffle]]",
  * "crc32c" — chained in order after the implicit `bytes` codec. */
object ZarrStoreWriterV3 {

  def writeGroup(root: String, group: Option[String] = None): Path = {
    val dir = group.map(g => Paths.get(root, g)).getOrElse(Paths.get(root))
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("zarr.json"), """{"zarr_format": 3, "node_type": "group"}""")
    dir
  }

  private[zarr] def codecCfg(spec: String, typesize: Int): String = {
    val parts = spec.split(":")
    parts(0) match {
      case "gzip" => """{"name": "gzip", "configuration": {"level": 5}}"""
      case "zstd" => """{"name": "zstd", "configuration": {"level": 3, "checksum": false}}"""
      case "blosc" =>
        val cname = if (parts.length > 1) parts(1) else "lz4"
        val shuffle =
          if (parts.length > 2 && parts(2) == "noshuffle") "noshuffle"
          else if (parts.length > 2 && parts(2) == "bitshuffle") "bitshuffle"
          else "shuffle"
        s"""{"name": "blosc", "configuration": {"cname": "$cname", "clevel": 5, "shuffle": "$shuffle", "typesize": $typesize, "blocksize": 0}}"""
      case "crc32c" => """{"name": "crc32c"}"""
      case other => throw new IllegalArgumentException(s"unknown v3 codec spec '$other'")
    }
  }

  /** v3 data_type name → the v2-style kind tag the shared writer loop uses. */
  private val KindOf: Map[String, String] = Map(
    "bool" -> "b1",
    "int8" -> "i1", "uint8" -> "u1",
    "int16" -> "i2", "uint16" -> "u2",
    "int32" -> "i4", "uint32" -> "u4",
    "int64" -> "i8", "uint64" -> "u8",
    "float16" -> "f2", "float32" -> "f4", "float64" -> "f8"
  )

  /** v3 variable-length string array: data_type "string", codec chain
    * [vlen-utf8, bytes→bytes...] — the zarr-python v3 string spelling. */
  def writeStringArray(
      groupDir: Path,
      name: String,
      shape: Vector[Int],
      chunks: Vector[Int],
      value: Long => String,
      dims: Option[Vector[String]] = None,
      codecs: Seq[String] = Nil,
      separator: String = "/"
  ): Unit = {
    require(shape.length == chunks.length)
    val dir = groupDir.resolve(name)
    Files.createDirectories(dir)
    val cfgs = codecs.map(codecCfg(_, 1))
    val allCodecs = ("""{"name": "vlen-utf8"}""" +: cfgs).mkString("[", ", ", "]")
    val dimNames = dims.map(d => d.map(x => s""""$x"""").mkString("[", ", ", "]"))
    Files.writeString(
      dir.resolve("zarr.json"),
      s"""{"zarr_format": 3, "node_type": "array",
         |"shape": [${shape.mkString(",")}],
         |"data_type": "string",
         |"chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [${chunks.mkString(",")}]}},
         |"chunk_key_encoding": {"name": "default", "configuration": {"separator": "$separator"}},
         |"fill_value": null,
         |"codecs": $allCodecs,
         |"attributes": {}${dimNames.map(d => s""",\n"dimension_names": $d""").getOrElse("")}}""".stripMargin
    )
    ZarrStoreWriter.foreachStringChunk(shape, chunks, value) { (cIdx, cells) =>
      val raw = ZarrStoreWriter.vlenEncode(cells)
      val bytes = cfgs.foldLeft(raw)((b, cfg) => ZarrCodecV3.encode(cfg, b, 1))
      val key = if (cIdx.isEmpty) "c" else "c" + separator + cIdx.mkString(separator)
      val target = dir.resolve(key)
      Option(target.getParent).foreach(Files.createDirectories(_))
      Files.write(target, bytes)
    }
  }

  def arrayJson(
      shape: Vector[Int],
      chunks: Vector[Int],
      dataType: String,
      codecCfgs: Seq[String],
      fillValue: Option[Double],
      dims: Option[Vector[String]],
      separator: String,
      endian: String,
      attrs: Map[String, String] = Map.empty
  ): String = {
    val fill = fillValue.map(f => if (f.isNaN) "\"NaN\"" else f.toString).getOrElse("0")
    val dimNames = dims.map(d => d.map(x => s""""$x"""").mkString("[", ", ", "]"))
    val attrsJson =
      if (attrs.isEmpty) "{}" else attrs.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    val allCodecs =
      (s"""{"name": "bytes", "configuration": {"endian": "$endian"}}""" +: codecCfgs)
        .mkString("[", ", ", "]")
    s"""{"zarr_format": 3, "node_type": "array",
       |"shape": [${shape.mkString(",")}],
       |"data_type": "$dataType",
       |"chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [${chunks.mkString(",")}]}},
       |"chunk_key_encoding": {"name": "default", "configuration": {"separator": "$separator"}},
       |"fill_value": $fill,
       |"codecs": $allCodecs,
       |"attributes": $attrsJson${dimNames.map(d => s""",\n"dimension_names": $d""").getOrElse("")}}""".stripMargin
  }

  def writeArray(
      groupDir: Path,
      name: String,
      shape: Vector[Int],
      chunks: Vector[Int],
      dataType: String,
      value: Long => Double,
      dims: Option[Vector[String]] = None,
      codecs: Seq[String] = Nil,
      fillValue: Option[Double] = Some(0.0),
      separator: String = "/",
      bigEndian: Boolean = false,
      attrs: Map[String, String] = Map.empty
  ): Unit = {
    require(shape.length == chunks.length)
    val kind = KindOf.getOrElse(dataType, throw new IllegalArgumentException(s"bad v3 data_type $dataType"))
    val dt = ZDtype.parse((if (bigEndian) ">" else "<") + kind)
    val dir = groupDir.resolve(name)
    Files.createDirectories(dir)
    val cfgs = codecs.map(codecCfg(_, dt.itemSize))
    Files.writeString(
      dir.resolve("zarr.json"),
      arrayJson(shape, chunks, dataType, cfgs, fillValue, dims,
        separator, if (bigEndian) "big" else "little", attrs)
    )
    ZarrStoreWriter.foreachChunk(shape, chunks, dt, value, fillValue.getOrElse(0.0)) { (cIdx, raw) =>
      val bytes = cfgs.foldLeft(raw)((b, cfg) => ZarrCodecV3.encode(cfg, b, dt.itemSize))
      val key = if (cIdx.isEmpty) "c" else "c" + separator + cIdx.mkString(separator)
      val target = dir.resolve(key)
      Option(target.getParent).foreach(Files.createDirectories(_))
      Files.write(target, bytes)
    }
  }

  /** Write a SHARDED v3 array (zarr-specs v3 §sharding-indexed): each
    * on-store object covers `shardShape` cells and holds the encoded inner
    * chunks (`innerChunks` each) plus a crc32c-checked (offset, nbytes)
    * u64-pair index. `omitInner` forces chosen GLOBAL inner-chunk indices
    * to the missing marker (fill-value on read); shards whose inner chunks
    * are all missing are not written at all. */
  def writeShardedArray(
      groupDir: Path,
      name: String,
      shape: Vector[Int],
      shardShape: Vector[Int],
      innerChunks: Vector[Int],
      dataType: String,
      value: Long => Double,
      dims: Option[Vector[String]] = None,
      innerCodecs: Seq[String] = Nil,
      fillValue: Option[Double] = Some(0.0),
      indexAtEnd: Boolean = true,
      omitInner: Seq[Int] => Boolean = _ => false
  ): Unit = {
    require(shape.length == shardShape.length && shape.length == innerChunks.length)
    require(
      shardShape.zip(innerChunks).forall { case (s, i) => i > 0 && s % i == 0 },
      s"shard $shardShape must divide into inner chunks $innerChunks"
    )
    val kind = KindOf.getOrElse(dataType, throw new IllegalArgumentException(s"bad v3 data_type $dataType"))
    val dt = ZDtype.parse("<" + kind)
    val dir = groupDir.resolve(name)
    Files.createDirectories(dir)
    val rank = shape.length
    val innerCfgs = innerCodecs.map(codecCfg(_, dt.itemSize))
    val innerChain =
      ("""{"name": "bytes", "configuration": {"endian": "little"}}""" +: innerCfgs)
        .mkString("[", ", ", "]")
    val shardingCfg =
      s"""{"name": "sharding_indexed", "configuration": {
         |"chunk_shape": [${innerChunks.mkString(",")}],
         |"codecs": $innerChain,
         |"index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "crc32c"}],
         |"index_location": "${if (indexAtEnd) "end" else "start"}"}}""".stripMargin
    // arrayJson prepends the implicit outer bytes codec for plain arrays;
    // a sharded array's codec list is exactly [sharding_indexed]
    val jsonWithOuter = arrayJson(
      shape, shardShape, dataType, Nil, fillValue, dims, "/", "little"
    )
    val json = jsonWithOuter.replace(
      """"codecs": [{"name": "bytes", "configuration": {"endian": "little"}}]""",
      s""""codecs": [$shardingCfg]"""
    )
    require(json != jsonWithOuter, "sharded arrayJson rewrite failed")
    Files.writeString(dir.resolve("zarr.json"), json)

    val fillV = fillValue.getOrElse(0.0)
    val nShards = shape.zip(shardShape).map { case (s, c) => if (s == 0) 0 else (s + c - 1) / c }
    val innerPer = shardShape.zip(innerChunks).map { case (s, i) => s / i }
    val nInner = innerPer.map(_.toLong).product.toInt
    val shardCount = nShards.map(_.toLong).product.toInt
    val sIdx = new Array[Int](rank)
    var si = 0
    while (si < shardCount) {
      var rem = si; var d = rank - 1
      while (d >= 0) { sIdx(d) = if (nShards(d) == 0) 0 else rem % nShards(d); rem /= math.max(nShards(d), 1); d -= 1 }
      val data = new java.io.ByteArrayOutputStream()
      val index = ByteBuffer.allocate(nInner * 16).order(ByteOrder.LITTLE_ENDIAN)
      // index offsets address the WHOLE shard object: with the index at the
      // start, the data section begins after the encoded index
      val dataBase = if (indexAtEnd) 0L else nInner * 16L + 4L
      var wrote = 0
      val wIdx = new Array[Int](rank)
      var wi = 0
      while (wi < nInner) {
        var wrem = wi; var wd = rank - 1
        while (wd >= 0) { wIdx(wd) = wrem % innerPer(wd); wrem /= innerPer(wd); wd -= 1 }
        val gIdx = Array.tabulate(rank)(d => sIdx(d) * innerPer(d) + wIdx(d))
        val outOfBounds = (0 until rank).exists(d => gIdx(d) * innerChunks(d) >= shape(d))
        if (outOfBounds || omitInner(gIdx.toSeq)) {
          index.putLong(wi * 16, -1L).putLong(wi * 16 + 8, -1L) // 2^64-1 marker
        } else {
          val raw = ZarrStoreWriter.chunkRaw(shape, innerChunks, dt, value, fillV, gIdx)
          val enc = innerCfgs.foldLeft(raw)((b, cfg) => ZarrCodecV3.encode(cfg, b, dt.itemSize))
          index.putLong(wi * 16, dataBase + data.size()).putLong(wi * 16 + 8, enc.length.toLong)
          data.write(enc)
          wrote += 1
        }
        wi += 1
      }
      if (wrote > 0) {
        val idxBytes = ZarrCodecV3.encode("""{"name": "crc32c"}""", index.array(), dt.itemSize)
        val out =
          if (indexAtEnd) data.toByteArray ++ idxBytes else idxBytes ++ data.toByteArray
        val key = "c" + "/" + sIdx.mkString("/")
        val target = dir.resolve(key)
        Option(target.getParent).foreach(Files.createDirectories(_))
        Files.write(target, out)
      }
      si += 1
    }
  }

  def writeCoord(groupDir: Path, dim: String, coord: Coord, codecs: Seq[String] = Nil): Unit = {
    val (dataType, f): (String, Long => Double) = coord match {
      case Coord.Ints(a) => ("int32", (i: Long) => a(i.toInt).toDouble)
      case Coord.Longs(a) => ("int64", (i: Long) => a(i.toInt).toDouble)
      case Coord.Floats(a) => ("float32", (i: Long) => a(i.toInt).toDouble)
      case Coord.Doubles(a) => ("float64", (i: Long) => a(i.toInt))
      case other => throw new IllegalArgumentException(s"unsupported v3 coord $other")
    }
    writeArray(groupDir, dim, Vector(coord.length), Vector(coord.length), dataType, f,
      dims = Some(Vector(dim)), codecs = codecs)
  }

  /** Embed every member node's zarr.json into the root document —
    * zarr-python 3's consolidated-metadata layout. */
  def consolidate(groupDir: Path): Unit = {
    val entries = Files.list(groupDir).iterator().asScala
      .filter(Files.isDirectory(_))
      .toSeq.sortBy(_.getFileName.toString)
      .flatMap { d =>
        val f = d.resolve("zarr.json")
        if (Files.exists(f)) Some(s""""${d.getFileName}": ${Files.readString(f)}""") else None
      }
    Files.writeString(
      groupDir.resolve("zarr.json"),
      s"""{"zarr_format": 3, "node_type": "group",
         |"consolidated_metadata": {"kind": "inline", "must_understand": false,
         |"metadata": {${entries.mkString(",\n")}}}}""".stripMargin
    )
  }
}
