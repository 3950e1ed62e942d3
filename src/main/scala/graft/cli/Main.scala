package graft.cli

import graft.Sessions
import graft.api.{ZarrDataReader, ZarrScan}
import graft.model.DimSel
import graft.sources.zarr.ZarrTable

import java.nio.file.{Files, Paths}

/** CLI parity with the reference (`cae-polars info|read|benchmark`,
  * reference: src/cli.py:42-254):
  *
  * {{{
  * graft-cli info STORE [--group G] [--output f.json]
  * graft-cli read STORE ARRAY [--select dim=a:b,dim=i,...] [--output out.parquet]
  * graft-cli benchmark STORE [--array-name A]
  * }}}
  */
object Main {

  private def parseArgs(args: Seq[String]): (String, Seq[String], Map[String, String]) = {
    require(args.nonEmpty, usage)
    val cmd = args.head
    val rest = args.tail
    val opts = scala.collection.mutable.Map[String, String]()
    val pos = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < rest.length) {
      val a = rest(i)
      if (a.startsWith("--")) {
        require(i + 1 < rest.length, s"missing value for $a")
        opts(a.stripPrefix("--")) = rest(i + 1); i += 2
      } else { pos += a; i += 1 }
    }
    (cmd, pos.toSeq, opts.toMap)
  }

  /** `--select time=0:3,lat=1,3,5` is ambiguous; use `;` between dims:
    * `time=0:3;lat=1,3,5;lon=7`. */
  private def parseSelect(s: String): Map[String, DimSel] =
    s.split(";").filter(_.nonEmpty).map { part =>
      val Array(k, v) = part.split("=", 2)
      k -> ZarrTable.parseDimSel(v)
    }.toMap

  /** `--storage-options` as JSON (`{"key": "..."}`) or `k=v,k=v` — parity
    * with the reference's dual format (reference: src/cli.py:257-300). */
  private[cli] def parseStorageOptions(s: String): Map[String, String] = {
    val t = s.trim
    if (t.startsWith("{")) {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(t) match {
        case JObject(fields) =>
          fields.map {
            case (k, JString(v)) => k -> v
            case (k, v) => k -> org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(v))
          }.toMap
        case _ => throw new IllegalArgumentException(s"bad --storage-options JSON: $s")
      }
    } else
      t.split(",").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k.trim -> v.trim
      }.toMap
  }

  val usage: String =
    """usage: graft-cli <info|read|benchmark> STORE [ARRAY] [--group G]
      |  [--select dim=a:b;dim=i;dim=i,j,k] [--output PATH] [--array-name A]""".stripMargin

  def main(args: Array[String]): Unit = {
    val (cmd, pos, opts) = parseArgs(args.toSeq)
    cmd match {
      case "info" => info(pos, opts)
      case "read" => read(pos, opts)
      case "benchmark" => benchmark(pos, opts)
      case other => System.err.println(s"unknown command '$other'\n$usage"); sys.exit(2)
    }
  }

  private def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def storageOpts(opts: Map[String, String]): Map[String, String] =
    opts.get("storage-options").map(parseStorageOptions).getOrElse(Map.empty)

  /** Store metadata → JSON (reference: cli.py:42-96). */
  private def info(pos: Seq[String], opts: Map[String, String]): Unit = {
    val store = pos.headOption.getOrElse { System.err.println(usage); sys.exit(2); "" }
    val metas = ZarrScan.getZarrDataInfo(store, storageOpts(opts), group = opts.get("group"))
    val json = metas.toSeq
      .sortBy(_._1)
      .map { case (name, m) =>
        s"""${q(name)}: {"shape": [${m.shape.mkString(",")}], "chunks": [${m.chunks.mkString(",")}],
           |"dtype": ${q(m.dtype)}, "dimensions": [${m.dims.map(q).mkString(",")}],
           |"compressor": ${m.compressor.map(q).getOrElse("null")},
           |"fill_value": ${m.fillValue.map(_.toString).getOrElse("null")},
           |"n_elements": ${m.totalElements}}""".stripMargin
      }
      .mkString("{\n", ",\n", "\n}")
    opts.get("output") match {
      case Some(f) => Files.writeString(Paths.get(f), json); println(s"wrote $f")
      case None => println(json)
    }
  }

  /** Scan → parquet sink (reference: cli.py:99-169). */
  private def read(pos: Seq[String], opts: Map[String, String]): Unit = {
    require(pos.length >= 2, usage)
    val spark = Sessions.local()
    val df = new ZarrDataReader(spark, pos(0), storageOpts(opts), group = opts.get("group"))
      .readArray(pos(1), opts.get("select").map(parseSelect).getOrElse(Map.empty))
    val out = opts.getOrElse("output", "out.parquet")
    df.write.mode("overwrite").parquet(out)
    println(s"wrote ${spark.read.parquet(out).count()} rows to $out")
    spark.stop()
  }

  /** Timing harness (reference: cli.py:172-254): read time (plan+schema),
    * collect time (full scan), rows, estimated MB. */
  private def benchmark(pos: Seq[String], opts: Map[String, String]): Unit = {
    require(pos.nonEmpty, usage)
    val spark = Sessions.local()
    val reader = new ZarrDataReader(spark, pos(0), storageOpts(opts), group = opts.get("group"))
    val arrays = opts.get("array-name").map(Seq(_)).getOrElse(reader.listArrays())
    arrays.foreach { a =>
      val t0 = System.nanoTime()
      val df = reader.readArray(a)
      val readS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rows = df.count()
      val collectS = (System.nanoTime() - t1) / 1e9
      val bytesPerRow = df.schema.fields.map(_.dataType.defaultSize).sum
      val mb = rows * bytesPerRow / 1e6
      println(
        f"$a: read $readS%.4f s, collect $collectS%.4f s, total ${readS + collectS}%.4f s, " +
          f"rows $rows, estimated $mb%.2f MB"
      )
    }
    spark.stop()
  }
}
