package graft.tools

import graft.Sessions
import graft.model.DimSel
import graft.sources.Coord
import graft.sources.zarr.ZarrStoreWriter
import graft.api.{ZarrDataReader, ZarrScan}
import org.apache.spark.sql.functions._

/** Throwaway spike: zarr store roundtrip + pushdown. */
object Spike {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val root = "/tmp/zarr_spike"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val dir = ZarrStoreWriter.writeGroup(root)
    // climate cube per FIXTURES.md: temperature (12,10,15) f4, chunks (6,5,8)
    ZarrStoreWriter.writeArray(
      dir, "temperature", Vector(12, 10, 15), Vector(6, 5, 8), "<f4",
      flat => 280.0 + (flat % 40) * 0.5,
      dims = Some(Vector("time", "lat", "lon")),
      attrs = Map("units" -> "\"K\""),
      compressor = Some("zlib"))
    ZarrStoreWriter.writeCoord(dir, "time", Coord.Ints(Array.tabulate(12)(identity)))
    ZarrStoreWriter.writeCoord(dir, "lat", Coord.Floats(Array.tabulate(10)(i => 30f + i * (20f / 9f))))
    ZarrStoreWriter.writeCoord(dir, "lon", Coord.Floats(Array.tabulate(15)(j => -120f + j * (20f / 14f))))
    ZarrStoreWriter.consolidate(dir)

    val r = new ZarrDataReader(spark, root)
    println("arrays=" + r.listArrays())
    println("info=" + r.getArrayInfo("temperature"))
    val df = r.readArray("temperature")
    df.printSchema()
    println("count=" + df.count() + " (expect 1800)")
    df.show(3)
    // dimension selection: point drops lon
    val sel = r.readArray("temperature", Map("time" -> DimSel.Range(0, 3), "lat" -> DimSel.Indices(Vector(1, 3, 5)), "lon" -> DimSel.Point(7)))
    println("sel count=" + sel.count() + " (expect 9), cols=" + sel.columns.mkString(","))
    sel.show(20)
    // filter pushdown on coord
    val f = df.filter(col("time") >= 6 && col("lat") > 40f)
    f.explain(true)
    println("filtered=" + f.count())
    // column pruning: count only
    println("prune-count=" + df.select(col("time")).distinct().count())
    // consolidated + scanData facade
    println("scanAll=" + ZarrScan.scanData(spark, root).toOption.get.keys)
    spark.stop()
  }
}
