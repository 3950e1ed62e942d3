package graft.queries

import graft.model._
import graft.operators.Relational.{dsum, joinWithSuffix}
import graft.sources.{Coord, GridSource, GridSpec}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The declared Layer-B query set (SURVEY.md §2.11 Q1-Q20): the relational
  * capability surface the reference prescribes for the frames it produces
  * (reference: README.md:76-149, examples/basic_usage.py, docs/examples).
  * Every query ends in a total ORDER BY; double aggregates route through
  * DecimalType so results are bit-deterministic at any partitioning (see
  * Relational.dsum).
  */
object CoreQueries {
  import Tables.{t, tw}

  // exact revenue term: l_extendedprice * (1 - l_discount) in decimal
  private def discPrice: Column =
    col("l_extendedprice").cast(DecimalType(12, 2)) *
      (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(4, 2)))
  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  private def dec(c: String, p: Int): Column = col(c).cast(DecimalType(p, 2))
  private def dsumSql(x: String, p: Int): String = s"CAST(SUM(CAST($x AS DECIMAL($p,2))) AS DOUBLE)"

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    Q(
      "q01_scan",
      (s, d) =>
        // (l_orderkey, l_linenumber) is NOT unique in this data; ordering by
        // every output column makes the sequence total up to exact-duplicate
        // rows, which hash identically in any order
        t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity")
          .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q02_filter",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity") > 30 && col("l_discount").between(0.02, 0.08))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
             |WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q03_nullnan",
      (s, d) =>
        t(s, d, "events").agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
          sum(when(isnan(col("value")), 1L).otherwise(0L)).as("n_nan"),
          sum(
            when(
              col("value") === Double.PositiveInfinity || col("value") === Double.NegativeInfinity,
              1L
            ).otherwise(0L)
          ).as("n_inf")
        ),
      Some("""SELECT COUNT(*) AS n_rows,
             |CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |CAST(SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
             |CAST(SUM(CASE WHEN isinf(value) THEN 1 ELSE 0 END) AS BIGINT) AS n_inf
             |FROM events""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q04_case",
      (s, d) =>
        t(s, d, "orders")
          .withColumn(
            "prio_class",
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
              .when(col("o_orderpriority") === "3-MEDIUM", "mid")
              .otherwise("low")
          )
          .groupBy("prio_class")
          .agg(count(lit(1)).as("n"))
          .orderBy("prio_class"),
      Some("""SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
             |            WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
             |            ELSE 'low' END AS prio_class, COUNT(*) AS n
             |FROM orders GROUP BY 1 ORDER BY prio_class""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q05_compute",
      (s, d) =>
        tw(s, d, "lineitem")
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
            pmod(col("l_orderkey"), lit(12)).as("okmod"),
            round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
            round(atan2(col("l_quantity"), col("l_extendedprice")), 6).as("angle")
          )
          .orderBy("l_orderkey", "l_linenumber", "revenue", "qty_sqrt", "angle"),
      Some("""SELECT l_orderkey, l_linenumber,
             |round(l_extendedprice * (1.0 - l_discount), 6) AS revenue,
             |l_orderkey % 12 AS okmod,
             |round(sqrt(l_quantity), 6) AS qty_sqrt,
             |round(atan2(l_quantity, l_extendedprice), 6) AS angle
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, qty_sqrt, angle""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q06_dates",
      (s, d) =>
        t(s, d, "orders")
          .withColumn("od", col("o_orderdate").cast(DateType))
          .groupBy(year(col("od")).as("yr"), month(col("od")).as("mo"))
          .agg(count(lit(1)).as("n"), min(dayofyear(col("od"))).as("min_doy"))
          .orderBy("yr", "mo"),
      Some("""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS yr,
             |CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER) AS mo,
             |COUNT(*) AS n,
             |CAST(MIN(dayofyear(CAST(o_orderdate AS DATE))) AS INTEGER) AS min_doy
             |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q07_join3",
      (s, d) => {
        val li = t(s, d, "lineitem"); val o = t(s, d, "orders"); val c = t(s, d, "customer")
        // pre-aggregate lineitem to one row per orderkey BEFORE the join:
        // the join shuffles |orders| rows instead of |lineitem|, and
        // n_orders becomes a plain count (no countDistinct Expand). Exact
        // because the revenue partial sum is decimal (associative).
        val liAgg = li
          .groupBy("l_orderkey")
          .agg(sum(discPrice).as("rev"), count(lit(1)).as("nl"))
        liAgg
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            sum(col("rev")).cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_orders"),
            sum(col("nl")).as("n_lines")
          )
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue,
              |COUNT(DISTINCT o_orderkey) AS n_orders, COUNT(*) AS n_lines
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q08_selfjoin_suffix",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val mx = li.groupBy("l_orderkey").agg(max("l_quantity").as("qty"))
        val mn = li.groupBy("l_orderkey").agg(min("l_quantity").as("qty"))
        joinWithSuffix(
          joinWithSuffix(mx, mn, Seq("l_orderkey"), "_min"),
          mx,
          Seq("l_orderkey"),
          "_max"
        ).select(
          col("l_orderkey"),
          col("qty_max"),
          col("qty_min"),
          (col("qty_max") - col("qty_min")).as("qty_range")
        ).orderBy("l_orderkey")
      },
      Some("""WITH mx AS (SELECT l_orderkey, MAX(l_quantity) AS qty_max FROM lineitem GROUP BY 1),
             |mn AS (SELECT l_orderkey, MIN(l_quantity) AS qty_min FROM lineitem GROUP BY 1)
             |SELECT mx.l_orderkey, qty_max, qty_min, qty_max - qty_min AS qty_range
             |FROM mx JOIN mn ON mx.l_orderkey = mn.l_orderkey
             |ORDER BY mx.l_orderkey""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q09_tpch1",
      (s, d) => {
        val nd = count(lit(1)).cast(DoubleType)
        val s1 = dsum(col("l_quantity"), 12)
        val s2 = sum(dec("l_quantity", 7) * dec("l_quantity", 7)).cast(DoubleType)
        t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity"), 12).as("sum_qty"),
            dsum(col("l_extendedprice"), 18).as("sum_base_price"),
            sum(discPrice).cast(DoubleType).as("sum_disc_price"),
            (dsum(col("l_quantity"), 12) / count(lit(1)).cast(DoubleType)).as("avg_qty"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            round(sqrt((s2 - (s1 * s1) / nd) / (nd - lit(1.0))), 6).as("std_qty"),
            count(lit(1)).as("count_order")
          )
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |${dsumSql("l_quantity", 12)} AS sum_qty,
              |${dsumSql("l_extendedprice", 18)} AS sum_base_price,
              |CAST(SUM($discPriceSql) AS DOUBLE) AS sum_disc_price,
              |${dsumSql("l_quantity", 12)} / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
              |MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
              |round(sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(7,2)) * CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE)
              |  - (${dsumSql("l_quantity", 12)} * ${dsumSql("l_quantity", 12)}) / CAST(COUNT(*) AS DOUBLE))
              |  / (CAST(COUNT(*) AS DOUBLE) - 1.0)), 6) AS std_qty,
              |COUNT(*) AS count_order
              |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q10_quantiles",
      (s, d) =>
        // Quantiles facade, exact=true: one percentile buffer for all five
        // fractions (a single sort, not five). Exact is safe here because
        // the "group" is one global row on a bench-scale table; the 100 TB
        // default is exact=false -> the x58 sketch path.
        graft.operators.Quantiles
          .quantiles(
            tw(s, d, "lineitem"),
            Nil,
            "l_extendedprice",
            Seq(0.05, 0.25, 0.50, 0.75, 0.95),
            exact = true
          )
          .select(Seq("p05", "p25", "p50", "p75", "p95").map(c => round(col(c), 6).as(c)): _*),
      Some("""SELECT round(quantile_cont(l_extendedprice, 0.05), 6) AS p05,
             |round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
             |round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
             |round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
             |round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
             |FROM lineitem""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q11_corr",
      // built-in Pearson corr in both engines: the estimate is scale-free
      // (O(1) magnitude) so partition-order wobble (~1e-12) vanishes at 6 dp
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp")
          )
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q12_globalagg",
      (s, d) => {
        val nd = count(lit(1)).cast(DoubleType)
        val s1 = dsum(col("value"), 14)
        val s2 = sum(dec("value", 14) * dec("value", 14)).cast(DoubleType)
        t(s, d, "events").agg(
          count(lit(1)).as("n"),
          (dsum(col("value"), 14) / count(lit(1)).cast(DoubleType)).as("mean_v"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          round(sqrt((s2 - (s1 * s1) / nd) / (nd - lit(1.0))), 6).as("std_v")
        )
      },
      Some(s"""SELECT COUNT(*) AS n,
              |${dsumSql("value", 14)} / CAST(COUNT(*) AS DOUBLE) AS mean_v,
              |MIN(value) AS min_v, MAX(value) AS max_v,
              |round(sqrt((CAST(SUM(CAST(value AS DECIMAL(14,2)) * CAST(value AS DECIMAL(14,2))) AS DOUBLE)
              |  - (${dsumSql("value", 14)} * ${dsumSql("value", 14)}) / CAST(COUNT(*) AS DOUBLE))
              |  / (CAST(COUNT(*) AS DOUBLE) - 1.0)), 6) AS std_v
              |FROM events""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q13_having",
      (s, d) =>
        t(s, d, "orders")
          .groupBy("o_custkey")
          .agg(dsum(col("o_totalprice"), 18).as("total_spend"), count(lit(1)).as("n_orders"))
          .filter(col("total_spend") > 1200000.0)
          .orderBy("o_custkey"),
      Some(s"""SELECT o_custkey, ${dsumSql("o_totalprice", 18)} AS total_spend, COUNT(*) AS n_orders
              |FROM orders GROUP BY 1
              |HAVING ${dsumSql("o_totalprice", 18)} > 1200000.0
              |ORDER BY o_custkey""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q14_bins",
      (s, d) =>
        t(s, d, "orders")
          .groupBy((floor(col("o_totalprice") / 10000) * 10000).cast(LongType).as("price_bin"))
          .agg(count(lit(1)).as("n"))
          .orderBy("price_bin"),
      Some("""SELECT CAST(floor(o_totalprice / 10000) * 10000 AS BIGINT) AS price_bin, COUNT(*) AS n
             |FROM orders GROUP BY 1 ORDER BY price_bin""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q15_distinct",
      (s, d) => t(s, d, "lineitem").select("l_returnflag").distinct().orderBy("l_returnflag"),
      Some("SELECT DISTINCT l_returnflag FROM lineitem ORDER BY l_returnflag")
    ),
    // ------------------------------------------------------------------
    Q(
      "q16_lagdiff",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, d, "events")
          .select(
            col("event_id"),
            col("user_id"),
            col("value"),
            (col("value") - lag("value", 1).over(w)).as("dv")
          )
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value,
             |value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q17_anomaly",
      (s, d) => {
        val ev = t(s, d, "events")
        val stats = ev
          .groupBy("user_id", "event_type")
          .agg((dsum(col("value"), 14) / count(lit(1)).cast(DoubleType)).as("mean_v"))
        ev.join(stats, Seq("user_id", "event_type"))
          .select(
            col("event_id"),
            col("user_id"),
            col("event_type"),
            col("value"),
            col("mean_v"),
            round(col("value") - col("mean_v"), 6).as("anom")
          )
          .orderBy("event_id")
      },
      Some(s"""WITH stats AS (
              |  SELECT user_id, event_type,
              |         ${dsumSql("value", 14)} / CAST(COUNT(*) AS DOUBLE) AS mean_v
              |  FROM events GROUP BY 1, 2)
              |SELECT e.event_id, e.user_id, e.event_type, e.value, s.mean_v,
              |       round(e.value - s.mean_v, 6) AS anom
              |FROM events e JOIN stats s ON e.user_id = s.user_id AND e.event_type = s.event_type
              |ORDER BY e.event_id""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q18_topk",
      (s, d) => {
        val li = t(s, d, "lineitem"); val o = t(s, d, "orders"); val c = t(s, d, "customer")
        // pre-aggregate revenue per order before the joins: shrinks the join
        // input from |lineitem| to |orders| rows (decimal sums re-associate
        // exactly, so the result is bit-identical)
        val rev = li.groupBy("l_orderkey").agg(sum(discPrice).as("orev"))
        rev
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_name")
          .agg(sum(col("orev")).cast(DoubleType).as("revenue"))
          .orderBy(desc("revenue"), col("c_custkey"))
          .limit(5)
      },
      Some(s"""SELECT c_custkey, c_name, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 5""".stripMargin)
    ),
    // ------------------------------------------------------------------
    Q(
      "q19_union",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val a = li.filter(col("l_linenumber") <= 3)
        val b = li.filter(col("l_linenumber") > 3)
        a.unionByName(b)
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 12).as("sum_qty"))
      },
      Some(s"""SELECT COUNT(*) AS n, ${dsumSql("l_quantity", 12)} AS sum_qty FROM (
              |  SELECT * FROM lineitem WHERE l_linenumber <= 3
              |  UNION ALL
              |  SELECT * FROM lineitem WHERE l_linenumber > 3) u""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Dimension-selection semantics over a generated 3-D grid — reproduces
    // the reference's read-time selection incl. point-drops-column and
    // C-order coordinate expansion (coordinate_processor.py:147-218, 331-347).
    Q(
      "q20_dimsel",
      (s, _) => {
        val spec = GridSpec(
          dims = Vector("time", "lat", "lon"),
          shape = Vector(12, 10, 15),
          coords = Vector(
            Coord.Ints(Array.tabulate(12)(identity)),
            Coord.Doubles(Array.tabulate(10)(i => 30.0 + i * (20.0 / 9))),
            Coord.Doubles(Array.tabulate(15)(j => -120.0 + j * (20.0 / 14)))
          ),
          value = flat => {
            val it = (flat / 150).toInt; val ila = ((flat / 15) % 10).toInt
            val ilo = (flat % 15).toInt
            (it * 10000 + ila * 100 + ilo).toDouble
          }
        )
        GridSource
          .toDF(
            s,
            spec,
            Map(
              "time" -> DimSel.Range(0, 3),
              "lat" -> DimSel.Indices(Vector(1, 3, 5)),
              "lon" -> DimSel.Point(7)
            )
          )
          .orderBy("time", "lat")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS time, 30.0 + la.i * (20.0 / 9) AS lat,
             |CAST(t.i * 10000 + la.i * 100 + 7 AS DOUBLE) AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 3)) t
             |CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(0, 10)) la
             |WHERE la.i IN (1, 3, 5)
             |ORDER BY time, lat""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Volume pass through the expansion kernel: 2M cells generated across
    // partitions (nothing driver-side), aggregated per time slab — the
    // distributed replacement for the reference's chunked conversion at a
    // scale its driver path could not stream (polars_converter.py:236-303).
    Q(
      "q21_grid_agg",
      (s, _) => {
        val spec = GridSpec(
          dims = Vector("time", "lat", "lon"),
          shape = Vector(200, 100, 100),
          coords = Vector(
            Coord.Ints(Array.tabulate(200)(identity)),
            Coord.Doubles(Array.tabulate(100)(_.toDouble)),
            Coord.Doubles(Array.tabulate(100)(_.toDouble))
          ),
          value = flat => (flat % 9973).toDouble
        )
        GridSource
          .toDF(s, spec)
          .groupBy("time")
          .agg(count(lit(1)).as("n"), dsum(col("value"), 18).as("sum_v"))
          .orderBy("time")
      },
      Some("""SELECT CAST(range // 10000 AS INTEGER) AS time, COUNT(*) AS n,
             |CAST(SUM(CAST(CAST(range % 9973 AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
             |FROM range(0, 2000000) GROUP BY 1 ORDER BY time""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // The Zarr DataSource V2 itself under the correctness gate: a real
    // chunked zlib store on disk, scanned with read-time selection (point
    // drops lon), a pushed coordinate filter, and an exact aggregate.
    Q(
      "q22_zarr_scan",
      (s, _) => {
        val root = CoreQueries.q22Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("v", Map("time" -> DimSel.Range(5, 45), "lon" -> DimSel.Point(7)))
          .filter(col("lat") > 20.0)
          .groupBy("time")
          .agg(count(lit(1)).as("n"), dsum(col("value"), 18).as("sum_v"))
          .orderBy("time")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS time, COUNT(*) AS n,
             |CAST(SUM(CAST(CAST(((t.i * 2000 + la.i * 40 + 7) * 37) % 1000 AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(5, 45)) t
             |CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(21, 50)) la
             |GROUP BY 1 ORDER BY time""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Generic dtype preservation — the reference's headline claim
    // (README.md:17; the pinned i4/i8/f4/f8 matrix of
    // test_polars_converter.py:198-215 is a floor, not a ceiling): one store
    // holding bool masks, signed/unsigned 8/16/32-bit imagery-style ints,
    // 64-bit ints, floats, AND big-endian spellings, scanned through the
    // DSv2 source and joined on the shared coordinate. Values are chosen to
    // prove signedness (u1 > 127, u4 > Int.MaxValue, negative BE ints) and
    // exactness (dyadic floats).
    Q(
      "q23_dtypes",
      (s, _) => {
        val root = CoreQueries.q23Store()
        val rd = new graft.api.ZarrDataReader(s, root)
        def arr(name: String, out: Column => Column = identity): DataFrame =
          rd.readArray(name).select(col("i"), out(col("value")).as(name))
        arr("mask")
          .join(arr("i1v"), Seq("i"))
          .join(arr("u1v"), Seq("i"))
          .join(arr("i2v"), Seq("i"))
          .join(arr("u2v"), Seq("i"))
          .join(arr("u4v"), Seq("i"))
          .join(arr("i8v"), Seq("i"))
          .join(arr("bei4v"), Seq("i"))
          .join(arr("bef8v"), Seq("i"))
          .join(arr("f4v", _.cast("double")), Seq("i"))
          .join(arr("f2v", _.cast("double")), Seq("i"))
          .join(arr("m8v"), Seq("i"))
          .orderBy("i")
      },
      Some("""SELECT CAST(r.i AS INTEGER) AS i,
             |  (r.i % 3 = 0) AS mask,
             |  CAST((r.i * 11) % 256 - 128 AS TINYINT) AS i1v,
             |  CAST((r.i * 7) % 256 AS SMALLINT) AS u1v,
             |  CAST(r.i * 1000 - 30000 AS SMALLINT) AS i2v,
             |  CAST((r.i * 1103) % 65536 AS INTEGER) AS u2v,
             |  CAST(4000000000 + r.i AS BIGINT) AS u4v,
             |  CAST(r.i AS BIGINT) * 123456789012 AS i8v,
             |  CAST(r.i * 97 - 1000 AS INTEGER) AS bei4v,
             |  CAST(r.i AS DOUBLE) * 0.25 - 3.0 AS bef8v,
             |  CAST(r.i AS DOUBLE) * 0.5 AS f4v,
             |  CAST(r.i AS DOUBLE) * 0.25 AS f2v,
             |  make_timestamp(CAST(r.i AS BIGINT) * 3600000000) AS m8v
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 60)) r
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // numcodecs FILTER chains under the correctness gate: arrays whose
    // on-disk chunks are delta-coded (numcodecs.Delta — the common
    // time/monotonic-coordinate encoding) before the compressor, across
    // int widths, big-endian floats, unsigned wrap-around, datetime64 and
    // a lossy-at-encode quantize. Dropping the filter list would return
    // the raw deltas — this query proves the chain is undone exactly
    // (reference: zarr_storage.py surfaces numcodecs filters untouched).
    Q(
      "q24_filters",
      (s, _) => {
        val root = CoreQueries.q24Store()
        val rd = new graft.api.ZarrDataReader(s, root)
        def arr(name: String, out: Column => Column = identity): DataFrame =
          rd.readArray(name).select(col("i"), out(col("value")).as(name))
        arr("d_i8")
          .join(arr("d_i2"), Seq("i"))
          .join(arr("d_u1"), Seq("i"))
          .join(arr("d_u2"), Seq("i"))
          .join(arr("d_bef8"), Seq("i"))
          .join(arr("d_f4", _.cast("double")), Seq("i"))
          .join(arr("d_m8"), Seq("i"))
          .join(arr("q_f8"), Seq("i"))
          .join(arr("fso_f8"), Seq("i"))
          .join(arr("pb_b1"), Seq("i"))
          .orderBy("i")
      },
      Some("""SELECT CAST(r.i AS INTEGER) AS i,
             |  CAST(r.i AS BIGINT) * 1234567 AS d_i8,
             |  CAST(r.i * 500 - 15000 AS SMALLINT) AS d_i2,
             |  CAST((r.i * 7) % 256 AS SMALLINT) AS d_u1,
             |  CAST((r.i * 1103) % 65536 AS INTEGER) AS d_u2,
             |  CAST(r.i AS DOUBLE) * 0.25 - 3.0 AS d_bef8,
             |  CAST(r.i AS DOUBLE) * 0.5 AS d_f4,
             |  make_timestamp((1700000000 + CAST(r.i AS BIGINT) * 60) * 1000000) AS d_m8,
             |  CAST(r.i AS DOUBLE) * 0.25 AS q_f8,
             |  CAST(r.i AS DOUBLE) / 10 + 1000 AS fso_f8,
             |  ((r.i * 5) % 7) < 3 AS pb_b1
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 60)) r
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Zarr V3 end-to-end under the correctness gate: a real zarr.json
    // store (c/-prefixed chunk keys, zstd+crc32c codec pipeline,
    // consolidated metadata in the root document) scanned with read-time
    // selection, a pushed coordinate filter, and an exact aggregate —
    // planning/pushdown/decode identical to v2 below the metadata parse.
    Q(
      "q25_zarr_v3",
      (s, _) => {
        val root = CoreQueries.q25Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("v", Map("x" -> DimSel.Range(3, 27)))
          .filter(col("t") >= 10)
          .groupBy("t")
          .agg(count(lit(1)).as("n"), dsum(col("value"), 18).as("sum_v"))
          .orderBy("t")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS t, COUNT(*) AS n,
             |CAST(SUM(CAST(CAST(((t.i * 30 + x.i) * 37) % 1000 AS DOUBLE) * 0.5 AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(10, 40)) t
             |CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(3, 27)) x
             |GROUP BY 1 ORDER BY t""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Zarr v3 SHARDED store (zarr-specs v3 §sharding-indexed): many gzip'd
    // inner chunks per shard object with a crc32c-checked byte-range
    // index; scanned with read-time selection + a pushed coordinate
    // filter. Inner chunks are the planning unit, so pushdown prunes at
    // inner-chunk granularity and absent inner chunks never cost a read.
    Q(
      "q26_zarr_sharded",
      (s, _) => {
        val root = CoreQueries.q26Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("v", Map("x" -> DimSel.Range(2, 28)))
          .filter(col("t").between(5, 34))
          .groupBy("t")
          .agg(count(lit(1)).as("n"), dsum(col("value"), 18).as("sum_v"))
          .orderBy("t")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS t, COUNT(*) AS n,
             |CAST(SUM(CAST(CAST(((t.i * 30 + x.i) * 41) % 1000 AS DOUBLE) * 0.25 AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(5, 35)) t
             |CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(2, 28)) x
             |GROUP BY 1 ORDER BY t""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // The sharded-v3 WRITE path under the correctness gate: the SINK
    // (df.write.format("zarr"), shards option) builds the store — a
    // distributed write of zstd inner chunks packed into shard objects
    // with crc32c-checked byte-range indexes, sparse cells filling — and
    // the scan reads it back through dim selection + a pushed filter.
    // Write -> scan -> oracle closes the loop the fixture-writer-backed
    // q26 cannot (ZarrStoreWriterV3 is test scaffolding; ZarrSink is the
    // product).
    Q(
      "q27_zarr_write_sharded",
      (s, _) => {
        val root = CoreQueries.q27Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("v", Map("x" -> DimSel.Range(2, 28)))
          .filter(col("t").between(3, 36))
          .groupBy("t")
          .agg(count(lit(1)).as("n"), dsum(col("value"), 18).as("sum_v"))
          .orderBy("t")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS t, COUNT(*) AS n,
             |CAST(SUM(CAST(CASE WHEN (t.i * 30 + x.i) % 97 = 0 THEN CAST(-5 AS DOUBLE)
             |  ELSE CAST(((t.i * 30 + x.i) * 43) % 1000 AS DOUBLE) * 0.25 END
             |  AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(3, 37)) t
             |CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(2, 28)) x
             |GROUP BY 1 ORDER BY t""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // STRING coordinate axis (|S station names — the label axes real
    // climate stores carry, which the reference reads implicitly through
    // zarr-python): membership predicate pushed into the scan as index
    // pruning (refineStr), grouped aggregate keyed by the string coord.
    Q(
      "q28_zarr_stations",
      (s, _) => {
        val root = CoreQueries.q28Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("temp")
          .filter(col("station").isin("ST01", "ST03", "ST04"))
          .groupBy("station")
          .agg(count(lit(1)).as("n"), dsum(col("value"), 18).as("sum_v"))
          .orderBy("station")
      },
      Some("""SELECT 'ST0' || CAST(s.i AS VARCHAR) AS station, COUNT(*) AS n,
             |CAST(SUM(CAST(CAST(s.i * 20 + t.i AS DOUBLE) * 0.5 AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 6)) s
             |CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(0, 20)) t
             |WHERE s.i IN (1, 3, 4)
             |GROUP BY 1 ORDER BY station""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // vlen-utf8 object array (multi-byte UTF-8 labels) joined with a
    // uint64 array — numpy's full dtype surface beyond Spark's signed
    // integrals. The engine reads u8 as Decimal(20,0) (the only exact
    // logical type for uint64; pinned cell-exactly incl. values past
    // Long.MaxValue in ZarrStringSpec); the HASH-FACING output here is
    // routed through BIGINT because the fixture values (2^52..2^52+19)
    // fit int64 exactly and the driver's cross-engine hasher diverges on
    // raw decimal output columns — see the bisection note below.
    Q(
      "q29_zarr_labels_u8",
      (s, _) => {
        val root = CoreQueries.q28Store()
        val rd = new graft.api.ZarrDataReader(s, root)
        val labels = rd.readArray("label").select(col("t"), col("value").as("label"))
        val bigs = rd.readArray("big").select(col("t"), col("value").cast("long").as("big"))
        labels.join(bigs, Seq("t")).orderBy("t")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS t,
             |CASE WHEN t.i % 3 = 0 THEN 'doc-' || CAST(t.i AS VARCHAR) || '-α'
             |     ELSE 'doc-' || CAST(t.i AS VARCHAR) END AS label,
             |CAST(4503599627370496 + t.i AS BIGINT) AS big
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 20)) t
             |ORDER BY t""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // q29 ISOLATION FAMILY — the three-round bisection of a driver-box-
    // only hash divergence (cell-exact locally every round):
    //   r9:  q29 red; split into q29a (vlen-utf8 labels, GREEN) +
    //        q29b (raw Decimal(20,0), RED) + q29c (same values as
    //        VARCHAR, GREEN) -> the values are right; the red follows
    //        the decimal OUTPUT column.
    //   r10: q29d (cast to DECIMAL(18,0) so parquet stores INT64-backed
    //        decimal instead of FIXED_LEN_BYTE_ARRAY) came back RED too
    //        -> the divergence is decimal-WIDE in the driver's hasher,
    //        independent of parquet physical representation. (ROUND10.md
    //        originally claimed the opposite; corrected in round 11.)
    //   r11: q29b/q29d retired (their decimal-output surface is pinned
    //        locally in ZarrStringSpec); q29e casts BOTH sides to BIGINT
    //        — the values fit int64 exactly — which removes the decimal
    //        output column entirely. q29e green alongside the r10 reds
    //        completes the proof: the sensitivity is "decimal output
    //        columns in the driver's hasher", full stop. Declared u8
    //        queries route hash-facing output through BIGINT/VARCHAR;
    //        the raw Decimal(20,0) API surface is unchanged.
    Q(
      "q29a_zarr_vlen_labels",
      (s, _) => {
        val root = CoreQueries.q28Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("label")
          .select(col("t"), col("value").as("label"))
          .orderBy("t")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS t,
             |CASE WHEN t.i % 3 = 0 THEN 'doc-' || CAST(t.i AS VARCHAR) || '-α'
             |     ELSE 'doc-' || CAST(t.i AS VARCHAR) END AS label
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 20)) t
             |ORDER BY t""".stripMargin)
    ),
    Q(
      "q29c_zarr_u8_str",
      (s, _) => {
        val root = CoreQueries.q28Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("big")
          .select(col("t"), col("value").cast("string").as("big_str"))
          .orderBy("t")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS t,
             |CAST(CAST(4503599627370496 + t.i AS DECIMAL(20,0)) AS VARCHAR) AS big_str
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 20)) t
             |ORDER BY t""".stripMargin)
    ),
    // q29e (round 11): decimal-REMOVAL discriminator — the final bisection
    // step prescribed by the round-10 verdict. Both engines cast the u8
    // values (2^52..2^52+19, exact in int64) to BIGINT, so no decimal
    // output column survives to the driver's hasher. Green here next to
    // r10's red q29b/q29d (raw Decimal(20,0) / INT64-backed DECIMAL(18,0),
    // both cell-exact locally) pins the divergence to decimal output
    // hashing itself, independent of value, decode path, and parquet
    // physical representation.
    Q(
      "q29e_zarr_u8_i64",
      (s, _) => {
        val root = CoreQueries.q28Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("big")
          .select(col("t"), col("value").cast("long").as("big"))
          .orderBy("t")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS t,
             |CAST(4503599627370496 + t.i AS BIGINT) AS big
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 20)) t
             |ORDER BY t""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Complex dtype (<c16 -> struct<re, im>): both components projected
    // and computed on exactly — the last numpy dtype family (spectral /
    // FFT products in the reference's domain).
    Q(
      "q30_zarr_complex",
      (s, _) => {
        val root = CoreQueries.q30Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("c")
          .select(
            col("i"),
            col("value.re").as("re"),
            col("value.im").as("im"),
            (col("value.re") * col("value.re") + col("value.im") * col("value.im")).as("mag2")
          )
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i,
             |  CAST((t.i * 13) % 97 AS DOUBLE) * 0.5 AS re,
             |  CAST((t.i * 7) % 89 AS DOUBLE) * 0.25 - 11.0 AS im,
             |  (CAST((t.i * 13) % 97 AS DOUBLE) * 0.5) * (CAST((t.i * 13) % 97 AS DOUBLE) * 0.5)
             |    + (CAST((t.i * 7) % 89 AS DOUBLE) * 0.25 - 11.0) * (CAST((t.i * 7) % 89 AS DOUBLE) * 0.25 - 11.0) AS mag2
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 40)) t
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // The sink's STRING write path under the gate: station axis (string
    // dim) + vlen-utf8 string VALUES written by df.write.format("zarr"),
    // scanned back with the withheld cell reading as the fill string.
    Q(
      "q31_zarr_write_strings",
      (s, _) => {
        val root = CoreQueries.q31Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("lbl")
          .orderBy("station", "t")
      },
      Some("""SELECT 'ST0' || CAST(s.i AS VARCHAR) AS station, CAST(t.i AS INTEGER) AS t,
             |CASE WHEN s.i * 10 + t.i = 13 THEN 'none'
             |     ELSE 'v' || CAST(s.i * 10 + t.i AS VARCHAR) || 'α' END AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 6)) s
             |CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(0, 10)) t
             |ORDER BY station, t""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // SHARDED v3 STRING write path under the gate: vlen-utf8 inner chunks
    // behind crc32c'd byte-range shard indexes, one withheld cell reading
    // back as the fill string, multi-byte UTF-8 throughout.
    Q(
      "q32_zarr_write_sharded_strings",
      (s, _) => {
        val root = CoreQueries.q32Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("lbl")
          .orderBy("r", "c")
      },
      Some("""SELECT CAST(r.i AS INTEGER) AS r, CAST(c.i AS INTEGER) AS c,
             |CASE WHEN r.i * 12 + c.i = 29 THEN 'miss'
             |     ELSE 's' || CAST((r.i * 12 + c.i) * 7 % 59 AS VARCHAR) || 'β' END AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 8)) r
             |CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(0, 12)) c
             |ORDER BY r, c""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // LONG STRING AXIS write path under the gate: a label dimension past
    // max_coord_values routes through distributed sort-based ordinals and
    // executor-written multi-chunk vlen coordinate arrays; the scan reads
    // the axis back (deferred-threshold machinery picks it up on larger
    // stores — here the contract is exact round-trip + ordering).
    Q(
      "q33_zarr_write_long_labels",
      (s, _) => {
        val root = CoreQueries.q33Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("v")
          .orderBy("doc")
      },
      Some("""SELECT 'doc' || lpad(CAST(t.i AS VARCHAR), 4, '0') AS doc,
             |CAST(t.i * 3 % 11 AS DOUBLE) * 0.5 AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 500)) t
             |ORDER BY doc""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // numcodecs `categorize` filter under the gate: object-dtype label
    // array stored as u1 CODES (label i ↔ code i+1, out-of-vocab → 0 →
    // decodes ''), zlib over the code bytes. Real-world v2 stores use this
    // for weather-type / category axes; the reference gets it free via
    // numcodecs (pyproject.toml:44-49).
    Q(
      "q34_zarr_categorize",
      (s, _) => {
        val root = CoreQueries.q34Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("wx")
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i,
             |CASE WHEN t.i % 13 = 0 THEN ''
             |     WHEN t.i % 4 = 0 THEN 'rain' WHEN t.i % 4 = 1 THEN 'snow'
             |     WHEN t.i % 4 = 2 THEN 'häil' ELSE 'clear' END AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 60)) t
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Structured/compound dtype under the gate: records of (i4, big-endian
    // f8, |S4) packed per cell, one chunk withheld so its cells read the
    // all-zero fill record. Subfields project to flat columns for the
    // oracle (same treatment as q30's complex struct).
    Q(
      "q35_zarr_struct",
      (s, _) => {
        val root = CoreQueries.q35Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("rec")
          .select(
            col("i"),
            col("value.sensor").as("sensor"),
            col("value.temp").as("temp"),
            col("value.tag").as("tag")
          )
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i,
             |CAST(CASE WHEN t.i BETWEEN 16 AND 23 THEN 0 ELSE t.i * 3 - 7 END AS INTEGER) AS sensor,
             |CAST(CASE WHEN t.i BETWEEN 16 AND 23 THEN 0.0 ELSE t.i * 0.25 - 2.0 END AS DOUBLE) AS temp,
             |CASE WHEN t.i BETWEEN 16 AND 23 THEN '' ELSE 'T' || CAST(t.i % 5 AS VARCHAR) END AS tag
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 30)) t
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // PER-FIELD-SHAPED structured dtype under the gate (the [name, dtype,
    // shape] numpy-subarray spelling q35 rejects as scalar-only): a 3-
    // vector f4 field, a 2x2 BIG-ENDIAN i2 matrix field, plus scalars —
    // surfaced as nested Spark arrays, elements row-major; the withheld
    // chunk reads the all-zero fill record through the same decode.
    Q(
      "q35b_zarr_struct_shaped",
      (s, _) => {
        val root = CoreQueries.q35bStore()
        new graft.api.ZarrDataReader(s, root)
          .readArray("rec")
          .select(
            col("i"),
            col("value.pos").getItem(0).as("p0"),
            col("value.pos").getItem(1).as("p1"),
            col("value.pos").getItem(2).as("p2"),
            col("value.m").getItem(0).getItem(1).cast("int").as("m01"),
            col("value.m").getItem(1).getItem(0).cast("int").as("m10"),
            col("value.sensor").as("sensor"),
            col("value.tag").as("tag")
          )
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i,
             |CAST(CASE WHEN t.i BETWEEN 16 AND 23 THEN 0.0 ELSE t.i * 2 END AS FLOAT) AS p0,
             |CAST(CASE WHEN t.i BETWEEN 16 AND 23 THEN 0.0 ELSE t.i * 2 + 1 END AS FLOAT) AS p1,
             |CAST(CASE WHEN t.i BETWEEN 16 AND 23 THEN 0.0 ELSE t.i * 2 + 2 END AS FLOAT) AS p2,
             |CAST(CASE WHEN t.i BETWEEN 16 AND 23 THEN 0 ELSE t.i * 10 + 1 END AS INTEGER) AS m01,
             |CAST(CASE WHEN t.i BETWEEN 16 AND 23 THEN 0 ELSE t.i * 10 + 2 END AS INTEGER) AS m10,
             |CAST(CASE WHEN t.i BETWEEN 16 AND 23 THEN 0 ELSE t.i * 3 - 7 END AS INTEGER) AS sensor,
             |CASE WHEN t.i BETWEEN 16 AND 23 THEN '' ELSE 'T' || CAST(t.i % 5 AS VARCHAR) END AS tag
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 30)) t
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Structured WRITE path under the gate: the PRODUCT sink packs struct
    // records (i4, big-endian f8, |S4 fixed string) into compound cells;
    // one null-valued cell reads back as the all-zero fill record.
    Q(
      "q36_zarr_write_struct",
      (s, _) => {
        val root = CoreQueries.q36Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("rec")
          .select(
            col("i"),
            col("value.sensor").as("sensor"),
            col("value.temp").as("temp"),
            col("value.tag").as("tag")
          )
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i,
             |CAST(CASE WHEN t.i = 11 THEN 0 ELSE t.i * 5 - 9 END AS INTEGER) AS sensor,
             |CAST(CASE WHEN t.i = 11 THEN 0.0 ELSE t.i * 0.125 + 3.0 END AS DOUBLE) AS temp,
             |CASE WHEN t.i = 11 THEN '' ELSE 'G' || CAST(t.i % 3 AS VARCHAR) END AS tag
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 25)) t
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Lexicographic RANGE pushdown on a label axis: >= / < on the q33
    // store's 500-label string dimension are absorbed by the scan (string
    // chunk-stats pruning), matching DuckDB's binary string comparison.
    Q(
      "q37_zarr_label_range",
      (s, _) => {
        val root = CoreQueries.q33Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("v")
          .filter(col("doc") >= "doc0123" && col("doc") < "doc0200")
          .orderBy("doc")
      },
      Some("""SELECT 'doc' || lpad(CAST(t.i AS VARCHAR), 4, '0') AS doc,
             |CAST(t.i * 3 % 11 AS DOUBLE) * 0.5 AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(123, 200)) t
             |ORDER BY doc""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // ALIGNED multi-array scan (beyond the reference): temp (f8) and hum
    // (f4, one chunk withheld -> fill −3.5) on one (12,10) grid emit as a
    // single [t, x, temp, hum] frame — one scan, no long-format self-join;
    // the pushed t-range prunes BOTH arrays' chunk reads together.
    Q(
      "q38_zarr_aligned",
      (s, _) => {
        val root = CoreQueries.q38Store()
        new graft.api.ZarrDataReader(s, root)
          .readAligned(Seq("temp", "hum"))
          .filter(col("t") >= 3)
          .orderBy("t", "x")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS t, CAST(x.i AS INTEGER) AS x,
             |CAST((t.i * 10 + x.i) * 37 % 100 AS DOUBLE) * 0.5 AS temp,
             |CAST(CASE WHEN t.i BETWEEN 4 AND 7 AND x.i BETWEEN 0 AND 4 THEN -3.5
             |     ELSE (t.i * 10 + x.i) * 13 % 50 END AS FLOAT) AS hum
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 12)) t
             |CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(0, 10)) x
             |WHERE t.i >= 3
             |ORDER BY t, x""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Aggregate PUSHDOWN (metadata-only): count/min/max/count-distinct over
    // dimension columns with fully-absorbed dim predicates compile to a
    // LocalScan answered from kept-set geometry + driver-resident coords —
    // zero tasks, zero chunk opens (ZarrAggPushdownSpec pins the plan
    // shape; this query pins the VALUES against DuckDB).
    Q(
      "q39_zarr_agg_pushdown",
      (s, _) => {
        val root = CoreQueries.q38Store()
        new graft.api.ZarrDataReader(s, root)
          .readArray("temp")
          .filter(col("t") >= 2 && col("t") < 9 && col("x").isin(0, 2, 5, 9))
          .groupBy("t")
          .agg(
            count("*").as("n"),
            min("x").as("x_min"),
            max("x").as("x_max"),
            count_distinct(col("x")).as("nx")
          )
          .orderBy("t")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS t, CAST(4 AS BIGINT) AS n,
             |CAST(0 AS INTEGER) AS x_min, CAST(9 AS INTEGER) AS x_max, CAST(4 AS BIGINT) AS nx
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(2, 9)) t
             |ORDER BY t""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // Chunk-statistics (zone-map) pruning under the gate: the sink records
    // per-chunk [min, max]; a value predicate then skips chunks that cannot
    // match (ZarrChunkStatsSpec pins partition counts; this pins VALUES).
    // value = i*37 % 500 over i (200, chunks 25): only some chunks contain
    // cells > 460, the rest are never opened.
    Q(
      "q40_zarr_stats_prune",
      (s, _) => {
        val root = CoreQueries.q40Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("v")
          .filter(col("value") > 460L)
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i, CAST(t.i * 37 % 500 AS BIGINT) AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 200)) t
             |WHERE t.i * 37 % 500 > 460
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // STRING zone maps under the gate: the sink records byte-lexicographic
    // per-chunk [min, max] for vlen-utf8 values; a prefix predicate prunes
    // to the chunks whose bounds can hold it (ZarrChunkStatsSpec pins
    // partition counts; this pins VALUES against DuckDB).
    Q(
      "q41_zarr_string_prune",
      (s, _) => {
        val root = CoreQueries.q41Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("v")
          .filter(col("value").startsWith("doc01") || col("value") >= "doc0190")
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i, 'doc' || lpad(CAST(t.i AS VARCHAR), 4, '0') AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 200)) t
             |WHERE ('doc' || lpad(CAST(t.i AS VARCHAR), 4, '0')) LIKE 'doc01%'
             |   OR ('doc' || lpad(CAST(t.i AS VARCHAR), 4, '0')) >= 'doc0190'
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // APPEND writes under the gate: create 0..99, append 100..149 (with a
    // replayed batch id proving idempotence), scan the grown store.
    Q(
      "q42_zarr_append",
      (s, _) => {
        val root = CoreQueries.q42Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("v")
          .filter(col("i") >= 90)
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i, CAST(t.i * 3 % 101 AS BIGINT) AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(90, 150)) t
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // DEFERRED-axis append under the gate: a label axis written through
    // the distributed coordinate path, appended WITHOUT materializing the
    // axis (boundary decode + in-place coord tail chunks), then read back
    // deferred with lexicographic pruning on the grown axis.
    Q(
      "q43_zarr_append_deferred",
      (s, _) => {
        val root = CoreQueries.q43Store(s)
        s.read.format("zarr")
          .option("path", root).option("array", "v")
          .option("coord.deferred.threshold", "10")
          .load()
          .filter(col("t") >= "k0100")
          .orderBy("t")
      },
      Some("""SELECT 'k' || lpad(CAST(t.i AS VARCHAR), 4, '0') AS t, CAST(t.i * 7 % 113 AS BIGINT) AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(100, 120)) t
             |ORDER BY t""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // COUNT pushdown on a DEFERRED axis: the kept-set cardinality answer
    // (metadata-only LocalScan — shape pinned in ZarrAggPushdownSpec)
    // under a deferred-dim predicate refined by streaming coord chunks.
    Q(
      "q44_zarr_deferred_count",
      (s, _) => {
        val root = CoreQueries.q43Store(s)
        s.read.format("zarr")
          .option("path", root).option("array", "v")
          .option("coord.deferred.threshold", "10")
          .load()
          .filter(col("t") >= "k0060")
          .agg(count(lit(1)).as("n"), count(col("value")).as("nv"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS nv
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 120)) t
             |WHERE ('k' || lpad(CAST(t.i AS VARCHAR), 4, '0')) >= 'k0060'""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // TopN pushdown on an INNER dim: ORDER BY s DESC narrows the s kept
    // set the same way a leading-dim TopN narrows t (cell-count plan shape
    // pinned in ZarrTopNInnerSpec); full ordering keeps the row set
    // deterministic for the hash compare.
    Q(
      "q45_zarr_topn_inner",
      (s, _) => {
        val root = CoreQueries.q45Store(s)
        s.read.format("zarr")
          .option("path", root).option("array", "v")
          .load()
          .orderBy(desc("s"), desc("t"))
          .limit(5)
      },
      Some("""SELECT CAST(g.i // 20 AS INTEGER) AS t, CAST(g.i % 20 AS INTEGER) AS s, CAST(g.i AS BIGINT) AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 400)) g
             |ORDER BY s DESC, t DESC LIMIT 5""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // DEFERRED NON-append dim under the gate: appending to a store whose
    // label axis is past the deferral threshold — executors decode the
    // coordinate chunks into a distributed (value, ordinal) join map and
    // the row->index join shuffles; the axis never rides the driver or a
    // broadcast. Read back deferred with string pruning on the label axis.
    Q(
      "q46_zarr_append_deferred_inner",
      (s, _) => {
        val root = CoreQueries.q46Store(s)
        s.read.format("zarr")
          .option("path", root).option("array", "v")
          .option("coord.deferred.threshold", "5")
          .load()
          .filter(col("lab") >= "st025")
          .orderBy("t", "lab")
      },
      Some(
        """SELECT CAST(t.i AS INTEGER) AS t, 'st' || lpad(CAST(s.j AS VARCHAR), 3, '0') AS lab, CAST(t.i * 30 + s.j AS BIGINT) AS value
          |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 16)) t,
          |     (SELECT CAST(range AS INTEGER) AS j FROM range(25, 30)) s
          |ORDER BY t, lab""".stripMargin
      )
    ),
    // ------------------------------------------------------------------
    // v3 APPEND (round 10): same grow-by-slabs contract against a
    // zarr_format=3 store — v3 codec chain on the appended chunks, and the
    // whole metadata commit (shape + merged zone maps + batch id) lands in
    // ONE zarr.json write instead of v2's three ordered files. Replay of
    // batch 2 included: idempotence or the oracle rows double.
    Q(
      "q47_zarr_append_v3",
      (s, _) => {
        val root = CoreQueries.q47Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("v")
          .filter(col("i") >= 90)
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i, CAST(t.i * 5 % 97 AS BIGINT) AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(90, 150)) t
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // SHARDED v3 append (round 10): slabs arrive as whole NEW shard
    // objects (one PUT each, existing objects untouched; extent must sit
    // on a shard boundary), zone maps maintained at inner-chunk
    // granularity. The object-store append shape at 100 TB.
    Q(
      "q48_zarr_append_sharded",
      (s, _) => {
        val root = CoreQueries.q48Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("v")
          .filter(col("i") >= 90)
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i, CAST(t.i * 11 % 89 AS BIGINT) AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(90, 160)) t
             |ORDER BY i""".stripMargin)
    ),
    // ------------------------------------------------------------------
    // SHARDED v3 append with REALIGN (round 11): a final batch that ended
    // mid-shard leaves the extent off the shard boundary; the next append
    // passes `append.realign=true` and absorbs the partial tail shard (one
    // read-modify-write PUT of that object, live chunks copied
    // byte-for-byte), then replays idempotently. The recovery path for
    // growing object stores whose producers don't batch to the shard.
    Q(
      "q49_zarr_append_realign",
      (s, _) => {
        val root = CoreQueries.q49Store(s)
        new graft.api.ZarrDataReader(s, root)
          .readArray("v")
          .filter(col("i") >= 8)
          .orderBy("i")
      },
      Some("""SELECT CAST(t.i AS INTEGER) AS i, CAST(t.i * 13 % 71 AS BIGINT) AS value
             |FROM (SELECT CAST(range AS INTEGER) AS i FROM range(8, 20)) t
             |ORDER BY i""".stripMargin)
    )
  )

  /** Build the q46 store once per JVM: a (t x lab) grid whose 30-label
    * string axis sits past the forced deferral threshold at append time —
    * the appended slab's row->ordinal join for `lab` runs as a
    * distributed map decoded from coordinate chunks by executors. */
  private[queries] def q46Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q46")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      def batch(lo: Int, hi: Int) =
        s.range(lo, hi)
          .selectExpr("cast(id as int) as t")
          .crossJoin(
            s.range(0, 30)
              .selectExpr("concat('st', lpad(cast(id as string), 3, '0')) as lab", "id as li")
          )
          .selectExpr("t", "lab", "cast(t * 30 + li as bigint) as value")
      batch(0, 8)
        .write.format("zarr")
        .option("path", root).option("array", "v").option("chunks", "4,8")
        .mode("append").save()
      batch(8, 16)
        .write.format("zarr")
        .option("path", root).option("array", "v")
        .option("append.dim", "t").option("coord.deferred.threshold", "5")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q42 store once per JVM: sink-create i 0..99 (chunks 25),
    * then APPEND 100..149 (batch 2) and REPLAY batch 2 (must no-op). */
  private[queries] def q42Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q42")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      def batch(lo: Int, hi: Int) =
        s.range(lo, hi).select(col("id").cast("int").as("i"), (col("id") * 3 % 101).as("value"))
      batch(0, 100)
        .write.format("zarr")
        .option("path", root).option("array", "v")
        .option("chunks", "25").option("compressor", "zlib")
        .option("append.dim", "i").option("append.batch_id", "1")
        .mode("append").save()
      batch(100, 150)
        .write.format("zarr")
        .option("path", root).option("array", "v")
        .option("append.dim", "i").option("append.batch_id", "2")
        .mode("append").save()
      // replay: must be a no-op or the oracle rows double
      batch(100, 150)
        .write.format("zarr")
        .option("path", root).option("array", "v")
        .option("append.dim", "i").option("append.batch_id", "2")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q47 store once per JVM: a zarr_format=3 zstd array grown by
    * two appended batches plus an exact replay of the second. */
  private[queries] def q47Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q47")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      def batch(lo: Int, hi: Int, id: Long) =
        s.range(lo, hi).select(col("id").cast("int").as("i"), (col("id") * 5 % 97).as("value"))
          .write.format("zarr")
          .option("path", root).option("array", "v")
          .option("chunks", "25").option("zarr_format", "3").option("compressor", "zstd")
          .option("append.dim", "i").option("append.batch_id", id.toString)
          .mode("append").save()
      batch(0, 100, 1L)
      batch(100, 150, 2L)
      batch(100, 150, 2L) // replay: must be a no-op
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q48 store once per JVM: a sharded v3 array (shards of 40 =
    * 2 inner chunks of 20) grown by a shard-aligned append + replay. */
  private[queries] def q48Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q48")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      def batch(lo: Int, hi: Int, id: Long) =
        s.range(lo, hi).select(col("id").cast("int").as("i"), (col("id") * 11 % 89).as("value"))
          .write.format("zarr")
          .option("path", root).option("array", "v")
          .option("chunks", "20").option("shards", "40")
          .option("zarr_format", "3").option("compressor", "zstd")
          .option("append.dim", "i").option("append.batch_id", id.toString)
          .mode("append").save()
      batch(0, 120, 1L)
      batch(120, 160, 2L)
      batch(120, 160, 2L) // replay: must be a no-op
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q49 store once per JVM: a sharded v3 array whose FIRST batch
    * ends mid-shard (extent 12, shard 8), then a realigned append absorbs
    * the partial tail shard and an exact replay of it must no-op. */
  private[queries] def q49Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q49")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      def batch(lo: Int, hi: Int, id: Long, realign: Boolean): Unit = {
        var w = s.range(lo, hi).select(col("id").cast("int").as("i"), (col("id") * 13 % 71).as("value"))
          .write.format("zarr")
          .option("path", root).option("array", "v")
          .option("chunks", "4").option("shards", "8")
          .option("zarr_format", "3").option("compressor", "zstd")
          .option("append.dim", "i").option("append.batch_id", id.toString)
        if (realign) w = w.option("append.realign", "true")
        w.mode("append").save()
      }
      batch(0, 12, 1L, realign = false) // creates: shard c/0 full, c/1 partial (extent mid-shard)
      batch(12, 20, 2L, realign = true) // absorbs c/1's live chunk, adds c/2
      batch(12, 20, 2L, realign = true) // replay: must be a no-op
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q43 store once per JVM: labels k0000..k0079 written through
    * the DISTRIBUTED coordinate path (max_coord_values 10, coord chunks
    * 32), then k0080..k0119 APPENDED with the deferral threshold forced
    * below the extent — the axis never materializes; the partial coord
    * chunk is read-modified-rewritten and a new tail chunk appended. */
  private[queries] def q43Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q43")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      def batch(lo: Int, hi: Int) =
        s.range(lo, hi).selectExpr(
          "concat('k', lpad(cast(id as string), 4, '0')) as t",
          "id * 7 % 113 as value"
        )
      batch(0, 80)
        .write.format("zarr")
        .option("path", root).option("array", "v").option("chunks", "20")
        .option("max_coord_values", "10").option("coord_chunk_values", "32")
        .mode("append").save()
      batch(80, 120)
        .write.format("zarr")
        .option("path", root).option("array", "v")
        .option("append.dim", "t").option("append.batch_id", "1")
        .option("coord.deferred.threshold", "10")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q45 store once per JVM: a 20x20 grid (chunks 5,5) whose
    * value is the flat cell index — the inner-dim TopN target. */
  private[queries] def q45Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q45")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      s.range(0, 400)
        .selectExpr("cast(id div 20 as int) as t", "cast(id % 20 as int) as s", "id as value")
        .write.format("zarr")
        .option("path", root).option("array", "v").option("chunks", "5,5")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q41 store once per JVM: the product sink writing vlen-utf8
    * string values (chunk stats on by default) over i (200, chunks 25). */
  private[queries] def q41Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q41")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      s.range(0, 200)
        .select(
          col("id").cast("int").as("i"),
          concat(lit("doc"), lpad(col("id").cast("string"), 4, "0")).as("value")
        )
        .write.format("zarr")
        .option("path", root).option("array", "v")
        .option("chunks", "25").option("compressor", "zlib")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q40 store once per JVM: the product sink writing i8 values
    * with chunk statistics on (the default) over i (200, chunks 25). */
  private[queries] def q40Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q40")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      s.range(0, 200)
        .select(col("id").cast("int").as("i"), (col("id") * 37 % 500).as("value"))
        .write.format("zarr")
        .option("path", root).option("array", "v")
        .option("chunks", "25").option("compressor", "zlib")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q38 aligned store once per JVM: temp <f8 and hum <f4 on one
    * (12,10) grid, chunks (4,5); hum's chunk (1,0) is withheld so cells
    * t∈[4,7] × x∈[0,4] read hum's fill −3.5 while temp stays real. */
  private[queries] def q38Store(): String = synchronized {
    val root = FixtureCache.root("q38")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriter
      val dir = ZarrStoreWriter.writeGroup(root)
      ZarrStoreWriter.writeArray(
        dir, "temp", Vector(12, 10), Vector(4, 5), "<f8", f => ((f * 37) % 100).toDouble * 0.5,
        dims = Some(Vector("t", "x")), compressor = Some("zlib")
      )
      ZarrStoreWriter.writeArray(
        dir, "hum", Vector(12, 10), Vector(4, 5), "<f4", f => ((f * 13) % 50).toDouble,
        dims = Some(Vector("t", "x")), compressor = Some("zstd"), fillValue = Some(-3.5)
      )
      ZarrStoreWriter.writeCoord(dir, "t", Coord.Ints(Array.tabulate(12)(identity)))
      ZarrStoreWriter.writeCoord(dir, "x", Coord.Ints(Array.tabulate(10)(identity)))
      ZarrStoreWriter.consolidate(dir)
      java.nio.file.Files.delete(java.nio.file.Paths.get(root, "hum", "1.0"))
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q36 store once per JVM — the PRODUCT sink writing STRUCT
    * values with an explicit compound dtype (i4, >f8, |S4) over i (25,
    * chunks 7); cell 11's value is NULL so it reads the all-zero fill
    * record. */
  private[queries] def q36Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q36")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      s.range(0, 25)
        .select(
          col("id").cast("int").as("i"),
          when(
            col("id") =!= 11,
            struct(
              (col("id") * 5 - 9).cast("int").as("sensor"),
              (col("id").cast("double") * 0.125 + 3.0).as("temp"),
              concat(lit("G"), (col("id") % 3).cast("string")).as("tag")
            )
          ).as("value")
        )
        .write.format("zarr")
        .option("path", root).option("array", "rec")
        .option("dtype", """[["sensor", "<i4"], ["temp", ">f8"], ["tag", "|S4"]]""")
        .option("chunks", "7").option("compressor", "zlib")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q35 structured-dtype store once per JVM: `rec` is a compound
    * [[sensor i4, temp >f8, tag |S4]] over i (30, chunks 8), zlib; chunk 2
    * is withheld so cells 16..23 read the all-zero-bytes fill record. */
  private[queries] def q35Store(): String = synchronized {
    val root = FixtureCache.root("q35")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriter
      val dir = ZarrStoreWriter.writeGroup(root)
      ZarrStoreWriter.writeStructArray(
        dir, "rec", Vector(30), Vector(8),
        """[["sensor", "<i4"], ["temp", ">f8"], ["tag", "|S4"]]""",
        i => Seq((i * 3 - 7).toInt, i * 0.25 - 2.0, s"T${i % 5}"),
        dims = Some(Vector("i")), compressor = Some("zlib"),
        fillBase64 = Some(java.util.Base64.getEncoder.encodeToString(new Array[Byte](16)))
      )
      ZarrStoreWriter.writeCoord(dir, "i", Coord.Ints(Array.tabulate(30)(identity)))
      ZarrStoreWriter.consolidate(dir)
      java.nio.file.Files.delete(java.nio.file.Paths.get(root, "rec", "2"))
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q35b PER-FIELD-SHAPED structured store once per JVM: `rec`
    * is a compound [[pos <f4 (3)], [m >i2 (2,2)], [sensor <i4], [tag |S4]]
    * (28 B cells — numpy subarray fields, the [name, dtype, shape] v2
    * spelling zarr-python legally writes) over i (30, chunks 8), zlib;
    * chunk 2 withheld so cells 16..23 read the all-zero fill record. */
  private[queries] def q35bStore(): String = synchronized {
    val root = FixtureCache.root("q35b")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriter
      val dir = ZarrStoreWriter.writeGroup(root)
      ZarrStoreWriter.writeStructArray(
        dir, "rec", Vector(30), Vector(8),
        """[["pos", "<f4", [3]], ["m", ">i2", [2, 2]], ["sensor", "<i4"], ["tag", "|S4"]]""",
        i => Seq(
          Seq((i * 2).toFloat, (i * 2 + 1).toFloat, (i * 2 + 2).toFloat),
          Seq(Seq(i * 10, i * 10 + 1), Seq(i * 10 + 2, i * 10 + 3)),
          (i * 3 - 7).toInt,
          s"T${i % 5}"
        ),
        dims = Some(Vector("i")), compressor = Some("zlib"),
        fillBase64 = Some(java.util.Base64.getEncoder.encodeToString(new Array[Byte](28)))
      )
      ZarrStoreWriter.writeCoord(dir, "i", Coord.Ints(Array.tabulate(30)(identity)))
      ZarrStoreWriter.consolidate(dir)
      java.nio.file.Files.delete(java.nio.file.Paths.get(root, "rec", "2"))
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q34 categorize store once per JVM: `wx` is |O over i with
    * filters [categorize(labels=[rain,snow,häil,clear], astype=u1)] — the
    * chunk bytes are integer codes; every 13th cell is out-of-vocab and
    * decodes to '' (numcodecs categorize.py semantics). */
  private[queries] def q34Store(): String = synchronized {
    val root = FixtureCache.root("q34")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriter
      val dir = ZarrStoreWriter.writeGroup(root)
      val labels = Array("rain", "snow", "häil", "clear")
      ZarrStoreWriter.writeStringArray(
        dir, "wx", Vector(60), Vector(16), "|O",
        i => if (i % 13 == 0) "fog" else labels((i % 4).toInt),
        dims = Some(Vector("i")), compressor = Some("zlib"),
        filters = Seq(
          """{"id": "categorize", "labels": ["rain", "snow", "häil", "clear"], "dtype": "|O", "astype": "|u1"}"""
        )
      )
      ZarrStoreWriter.writeCoord(dir, "i", Coord.Ints(Array.tabulate(60)(identity)))
      ZarrStoreWriter.consolidate(dir)
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q32 store once per JVM — the PRODUCT sink writing SHARDED
    * v3 STRING values: (8,12) grid, inner chunks (2,4) packed into (4,12)
    * shard objects, zstd behind vlen-utf8, flat cell 29 withheld so it
    * reads back as the fill string. */
  private[queries] def q32Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q32")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      s.range(0, 96)
        .filter(col("id") =!= 29)
        .select(
          (col("id") / 12).cast("int").as("r"),
          (col("id") % 12).cast("int").as("c"),
          concat(lit("s"), (col("id") * 7 % 59).cast("string"), lit("β")).as("value")
        )
        .write.format("zarr")
        .option("path", root).option("array", "lbl").option("zarr_format", "3")
        .option("chunks", "2,4").option("shards", "4,12")
        .option("compressor", "zstd").option("fill_value", "miss")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q33 store once per JVM — the PRODUCT sink with a 500-label
    * string dimension forced past `max_coord_values` (bound 16): ordinals
    * assigned by distributed sort, coordinate array written as multi-chunk
    * vlen-utf8 objects from executors. Labels are zero-padded so binary
    * UTF-8 sort order equals generation order. */
  private[queries] def q33Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q33")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      s.range(0, 500)
        .select(
          concat(lit("doc"), lpad(col("id").cast("string"), 4, "0")).as("doc"),
          ((col("id") * 3 % 11).cast("double") * 0.5).as("value")
        )
        .write.format("zarr")
        .option("path", root).option("array", "v")
        .option("max_coord_values", "16").option("coord_chunk_values", "128")
        .option("chunks", "100").option("compressor", "zstd")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Content-addressed fixture-store roots. The directory name carries a
    * fingerprint of the BYTECODE of every class that participates in
    * producing fixture bytes (the v2/v3 store writers, the codec/filter
    * stack, the product sink, and this file's generator lambdas). Any
    * recompile of that code yields a new path, so a /tmp store written by
    * an OLD writer can never be served to a NEW scan — the exact failure
    * that turned q29 red in round 7 (store cached behind a content-blind
    * marker across writer reworks 46b0f18/aef631d). Stale same-name
    * siblings with a different fingerprint are deleted on first access.
    * The in-dir `.graft_complete` marker is still written LAST so a
    * crashed partial build is never mistaken for a valid store. */
  private object FixtureCache {
    private lazy val codeHash: String = {
      val classes = Seq(
        "graft/queries/CoreQueries$.class",
        "graft/sources/zarr/ZarrStoreWriter$.class",
        "graft/sources/zarr/ZarrStoreWriterV3$.class",
        "graft/sources/zarr/ZarrSink$.class",
        "graft/sources/zarr/ZarrSink.class",
        // q42's store bytes come from the APPEND path and the zone-map doc
        "graft/sources/zarr/ZarrAppend$.class",
        "graft/sources/zarr/ZarrChunkStats$.class",
        "graft/sources/zarr/ZarrCodec$.class",
        "graft/sources/zarr/ZarrFilters$.class",
        "graft/sources/zarr/ZarrMeta$.class"
      )
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val cl = getClass.getClassLoader
      classes.foreach { c =>
        val in = cl.getResourceAsStream(c)
        if (in != null) try md.update(in.readAllBytes()) finally in.close()
        else md.update(c.getBytes("UTF-8")) // absence participates in the hash
      }
      md.digest().take(4).map("%02x".format(_)).mkString
    }

    def root(name: String): String = synchronized {
      val dirName = s"graft_${name}_store_$codeHash"
      val tmp = new java.io.File("/tmp")
      Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.startsWith(s"graft_${name}_store") && f.getName != dirName)
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      s"/tmp/$dirName"
    }
  }

  /** Build the q31 store once per JVM — the PRODUCT sink writing a string
    * VALUE array over a string station axis (the labeled-dataset write
    * path): vlen-utf8 chunks, a withheld cell reading back as the fill
    * string, multi-byte UTF-8 in every value. */
  private[queries] def q31Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q31")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      s.range(0, 60)
        .filter(col("id") =!= 13)
        .select(
          concat(lit("ST0"), (col("id") / 10).cast("int").cast("string")).as("station"),
          (col("id") % 10).cast("int").as("t"),
          concat(lit("v"), col("id").cast("string"), lit("α")).as("value")
        )
        .write.format("zarr")
        .option("path", root).option("array", "lbl")
        .option("chunks", "2,4").option("fill_value", "none").option("compressor", "zstd")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q30 complex store once per JVM: `c` is <c16 (40,) chunked
    * (16,), zlib, re/im deterministic doubles exact in both engines. */
  private[queries] def q30Store(): String = synchronized {
    val root = FixtureCache.root("q30")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriter
      val dir = ZarrStoreWriter.writeGroup(root)
      ZarrStoreWriter.writeComplexArray(
        dir, "c", Vector(40), Vector(16), "<c16",
        i => (((i * 13) % 97) * 0.5, ((i * 7) % 89) * 0.25 - 11.0),
        dims = Some(Vector("i")), compressor = Some("zlib")
      )
      ZarrStoreWriter.writeCoord(dir, "i", Coord.Ints(Array.tabulate(40)(identity)))
      ZarrStoreWriter.consolidate(dir)
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q28/q29 string-dtype store once per JVM: value `temp` f8
    * over (station |S4 coord, t i4 coord); `label` a vlen-utf8 object array
    * over t (multi-byte UTF-8 in every third cell); `big` a `<u8` array
    * over t with values past int32 (2^52 + t — exact in the writer's
    * double path). The dtype surface the reference gets implicitly from
    * zarr-python/numpy (README.md:17 "type preservation";
    * zarr_storage.py:397-415 surfaces dtype verbatim). */
  private[queries] def q28Store(): String = synchronized {
    val root = FixtureCache.root("q28")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriter
      val dir = ZarrStoreWriter.writeGroup(root)
      ZarrStoreWriter.writeArray(
        dir, "temp", Vector(6, 20), Vector(2, 8), "<f8",
        flat => flat * 0.5, dims = Some(Vector("station", "t")),
        compressor = Some("zstd")
      )
      ZarrStoreWriter.writeStringArray(
        dir, "station", Vector(6), Vector(3), "|S4", i => s"ST0$i",
        dims = Some(Vector("station")), compressor = Some("gzip")
      )
      ZarrStoreWriter.writeStringArray(
        dir, "label", Vector(20), Vector(8), "|O",
        i => if (i % 3 == 0) s"doc-$i-α" else s"doc-$i", dims = Some(Vector("t")),
        compressor = Some("blosc:lz4")
      )
      ZarrStoreWriter.writeArray(
        dir, "big", Vector(20), Vector(8), "<u8",
        i => 4503599627370496.0 + i, dims = Some(Vector("t"))
      )
      ZarrStoreWriter.writeCoord(dir, "t", Coord.Ints(Array.tabulate(20)(identity)))
      ZarrStoreWriter.consolidate(dir)
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the q27 store once per JVM — via the PRODUCT sink, sharded v3:
    * a (40,30) float64 grid, inner chunks (5,6) packed into (20,30) shard
    * objects (2x1 on store), zstd, cells where flat % 97 == 0 withheld so
    * they read back as the fill_value (-5). */
  private[queries] def q27Store(s: SparkSession): String = synchronized {
    val root = FixtureCache.root("q27")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      s.range(0, 1200)
        .filter(col("id") % 97 =!= 0)
        .select(
          (col("id") / 30).cast("int").as("t"),
          (col("id") % 30).cast("int").as("x"),
          (((col("id") * 43) % 1000).cast("double") * 0.25).as("value")
        )
        .write.format("zarr")
        .option("path", root).option("array", "v").option("zarr_format", "3")
        .option("chunks", "5,6").option("shards", "20,30")
        .option("compressor", "zstd").option("fill_value", "-5")
        .mode("append").save()
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the deterministic q25 Zarr V3 store once per JVM: `v` is
    * float64 (40,30) chunked (16,8) with a zstd+crc32c codec pipeline,
    * coords int32 identity, consolidated metadata in the root zarr.json. */
  private[queries] def q25Store(): String = synchronized {
    val root = FixtureCache.root("q25")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriterV3
      val dir = ZarrStoreWriterV3.writeGroup(root)
      ZarrStoreWriterV3.writeArray(
        dir, "v", Vector(40, 30), Vector(16, 8), "float64",
        flat => ((flat * 37) % 1000).toDouble * 0.5,
        dims = Some(Vector("t", "x")),
        codecs = Seq("zstd", "crc32c")
      )
      ZarrStoreWriterV3.writeCoord(dir, "t", Coord.Ints(Array.tabulate(40)(identity)), codecs = Seq("gzip"))
      ZarrStoreWriterV3.writeCoord(dir, "x", Coord.Ints(Array.tabulate(30)(identity)))
      ZarrStoreWriterV3.consolidate(dir)
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the deterministic q26 SHARDED Zarr v3 store once per JVM: `v` is
    * float64 (40,30), shard objects cover (20,10) cells holding gzip'd
    * (5,5) inner chunks behind a crc32c-checked byte-range index. */
  private[queries] def q26Store(): String = synchronized {
    val root = FixtureCache.root("q26")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriterV3
      val dir = ZarrStoreWriterV3.writeGroup(root)
      ZarrStoreWriterV3.writeShardedArray(
        dir, "v", Vector(40, 30), Vector(20, 10), Vector(5, 5), "float64",
        flat => ((flat * 41) % 1000).toDouble * 0.25,
        dims = Some(Vector("t", "x")),
        innerCodecs = Seq("gzip")
      )
      ZarrStoreWriterV3.writeCoord(dir, "t", Coord.Ints(Array.tabulate(40)(identity)))
      ZarrStoreWriterV3.writeCoord(dir, "x", Coord.Ints(Array.tabulate(30)(identity)))
      ZarrStoreWriterV3.consolidate(dir)
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the deterministic q22 store once per JVM (driver-side, ~120k
    * cells). shape (60,50,40), chunks (16,16,16), zlib, lat = 10 + 0.5*i so
    * `lat > 20.0` keeps indices 21..49. */
  private[queries] def q22Store(): String = synchronized {
    val root = FixtureCache.root("q22")
    // completion marker written LAST: a crashed partial write must not be
    // mistaken for a valid store (missing chunks would silently read as
    // fill_value and flunk the oracle)
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriter
      val dir = ZarrStoreWriter.writeGroup(root)
      ZarrStoreWriter.writeArray(
        dir, "v", Vector(60, 50, 40), Vector(16, 16, 16), "<f8",
        flat => ((flat * 37) % 1000).toDouble,
        dims = Some(Vector("time", "lat", "lon")),
        compressor = Some("zlib")
      )
      ZarrStoreWriter.writeCoord(dir, "time", Coord.Ints(Array.tabulate(60)(identity)))
      ZarrStoreWriter.writeCoord(dir, "lat", Coord.Doubles(Array.tabulate(50)(i => 10.0 + i * 0.5)))
      ZarrStoreWriter.writeCoord(dir, "lon", Coord.Doubles(Array.tabulate(40)(j => -50.0 + j * 0.25)))
      ZarrStoreWriter.consolidate(dir)
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the deterministic mixed-dtype q23 store once per JVM: ten 1-D
    * arrays over a shared `<i4` coordinate `i` (length 60, chunks 16 — one
    * partial chunk), dtypes spanning bool / i1 / u1 / i2 / u2 / u4 / i8 /
    * big-endian i4+f8 / f4, compressors varied across none/zlib/zstd/blosc. */
  private[queries] def q23Store(): String = synchronized {
    val root = FixtureCache.root("q23")
    val marker = java.nio.file.Paths.get(root, ".graft_complete")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriter
      val dir = ZarrStoreWriter.writeGroup(root)
      val shape = Vector(60); val ch = Vector(16); val dims = Some(Vector("i"))
      def w(name: String, dtype: String, comp: Option[String], f: Long => Double): Unit =
        ZarrStoreWriter.writeArray(dir, name, shape, ch, dtype, f, dims = dims, compressor = comp)
      w("mask", "|b1", None, i => if (i % 3 == 0) 1.0 else 0.0)
      w("i1v", "<i1", Some("zlib"), i => ((i * 11) % 256 - 128).toDouble)
      w("u1v", "|u1", Some("zstd"), i => ((i * 7) % 256).toDouble)
      w("i2v", "<i2", Some("blosc:blosclz"), i => (i * 1000 - 30000).toDouble)
      w("u2v", "<u2", Some("blosc:zstd:bitshuffle"), i => ((i * 1103) % 65536).toDouble)
      w("u4v", "<u4", Some("zlib"), i => (4000000000L + i).toDouble)
      w("i8v", "<i8", None, i => (i * 123456789012L).toDouble)
      w("bei4v", ">i4", Some("zlib"), i => (i * 97 - 1000).toDouble)
      w("bef8v", ">f8", Some("zstd"), i => i * 0.25 - 3.0)
      w("f4v", "<f4", Some("blosc:lz4"), i => i * 0.5)
      w("f2v", "<f2", Some("zlib"), i => i * 0.25) // dyadic <= 14.75: exact in f16
      w("m8v", "<M8[us]", Some("zstd"), i => (i * 3600000000L).toDouble) // hourly epoch micros
      ZarrStoreWriter.writeCoord(dir, "i", Coord.Ints(Array.tabulate(60)(identity)))
      ZarrStoreWriter.consolidate(dir)
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }

  /** Build the deterministic q24 store once per JVM: ten 1-D arrays over
    * a shared `<i4` coordinate `i` whose chunks carry a numcodecs filter
    * chain — delta across int widths / unsigned wrap / big-endian f8 / f4 /
    * datetime64[s], a quantize (identity-at-decode) f8, a
    * fixedscaleoffset f8 stored as u1 (decode `enc/scale + offset` is
    * IEEE-identical to the oracle's `i/10 + 1000`), and a packbits bool.
    * Float values are dyadic with dyadic diffs so the delta prefix sum is
    * bit-exact. Marker is versioned: adding arrays must invalidate stores
    * cached in /tmp by earlier builds. */
  private[queries] def q24Store(): String = synchronized {
    val root = FixtureCache.root("q24")
    val marker = java.nio.file.Paths.get(root, ".graft_complete_v2")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      import graft.sources.zarr.ZarrStoreWriter
      val dir = ZarrStoreWriter.writeGroup(root)
      val shape = Vector(60); val ch = Vector(16); val dims = Some(Vector("i"))
      def w(name: String, dtype: String, comp: Option[String], filt: Seq[String], f: Long => Double): Unit =
        ZarrStoreWriter.writeArray(
          dir, name, shape, ch, dtype, f, dims = dims, compressor = comp, filters = filt
        )
      w("d_i8", "<i8", Some("zlib"), Seq("delta"), i => (i * 1234567L).toDouble)
      w("d_i2", "<i2", Some("blosc:lz4"), Seq("delta"), i => (i * 500 - 15000).toDouble)
      w("d_u1", "|u1", Some("zlib"), Seq("delta"), i => ((i * 7) % 256).toDouble)
      w("d_u2", "<u2", Some("blosc:zstd:bitshuffle"), Seq("delta"), i => ((i * 1103) % 65536).toDouble)
      w("d_bef8", ">f8", Some("zstd"), Seq("delta"), i => i * 0.25 - 3.0)
      w("d_f4", "<f4", Some("blosc:blosclz"), Seq("delta"), i => i * 0.5)
      w("d_m8", "<M8[s]", None, Seq("delta"), i => (1700000000L + i * 60).toDouble)
      w("q_f8", "<f8", Some("zlib"),
        // digits=3 -> binary scale 2^10; i*0.25 is exactly representable
        // on that grid, so the q23 oracle values are unchanged
        Seq("""{"id": "quantize", "digits": 3, "dtype": "<f8"}"""), i => i * 0.25)
      w(
        "fso_f8", "<f8", Some("zlib"),
        Seq("""{"id": "fixedscaleoffset", "offset": 1000.0, "scale": 10.0, "dtype": "<f8", "astype": "|u1"}"""),
        i => i / 10.0 + 1000.0
      )
      w("pb_b1", "|b1", Some("zlib"), Seq("packbits"), i => if ((i * 5) % 7 < 3) 1.0 else 0.0)
      ZarrStoreWriter.writeCoord(dir, "i", Coord.Ints(Array.tabulate(60)(identity)))
      ZarrStoreWriter.consolidate(dir)
      java.nio.file.Files.writeString(marker, "ok")
    }
    root
  }
}
