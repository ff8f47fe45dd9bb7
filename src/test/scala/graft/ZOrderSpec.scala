package graft

import org.apache.spark.sql.functions._
import graft.etl.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("interleave matches the reference Morton code bit-for-bit") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.interleave($"x", $"y", 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === mortonRef(x, y, 4), s"($x,$y)")
    }
    assert(got.map(_._3).distinct.length === 256, "Morton code must be a bijection")
  }

  test("interleaveN: 3-D Morton is a bijection with the right bit placement") {
    def ref3(x: Long, y: Long, w: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (3 * i)) | (((y >> i) & 1L) << (3 * i + 1)) |
          (((w >> i) & 1L) << (3 * i + 2))).sum
    val pts = for (x <- 0L until 8L; y <- 0L until 8L; w <- 0L until 8L)
      yield (x, y, w)
    val got = pts.toDF("x", "y", "w")
      .select($"x", $"y", $"w",
        ZOrder.interleaveN(Seq($"x", $"y", $"w"), 3).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, w, z) =>
      assert(z === ref3(x, y, w, 3), s"($x,$y,$w)")
    }
    assert(got.map(_._4).distinct.length === 512, "3-D Morton must be a bijection")
    // N = 2 emits exactly the classic 2-D code (interleave delegates)
    val two = Seq((5L, 9L)).toDF("x", "y")
      .select(ZOrder.interleaveN(Seq($"x", $"y"), 4)).as[Long].head()
    assert(two === mortonRef(5L, 9L, 4))
    // the long-overflow guard: 5 dims x 13 bits = 65 z-bits must raise
    intercept[IllegalArgumentException](
      ZOrder.interleaveN(Seq($"x", $"x", $"x", $"x", $"x"), 13))
  }

  test("cell maps min to 0, max to 2^bits-1, and a constant dimension to 0") {
    val df = Seq(10L, 55L, 100L).toDF("v")
      .crossJoin(Seq((10L, 100L)).toDF("mn", "mx"))
    val cells = df.select(ZOrder.cell($"v", $"mn", $"mx", 8)).as[Long].collect().sorted
    assert(cells.head === 0L && cells.last === 255L)
    val const = Seq(7L).toDF("v").crossJoin(Seq((7L, 7L)).toDF("mn", "mx"))
      .select(ZOrder.cell($"v", $"mn", $"mx", 8)).as[Long].head()
    assert(const === 0L)
  }

  test("every z-bucket is a tight axis-aligned rectangle: spans bounded on BOTH dims") {
    // 20k uniform points on a 256x256 grid, bucketed by the top 6
    // z-bits: x-span <= 2^(8-3) = 32 cells, y-span <= 2^(8-3) = 32
    // cells per bucket (top 6 z-bits = top 3 bits of each dim)
    val bits = 8
    val pts = spark.range(20000).select(
      (($"id" * 7919L) % 256).as("x"), (($"id" * 104729L) % 256).as("y"))
    val spans = pts
      .withColumn("z", ZOrder.interleave($"x", $"y", bits))
      .groupBy(shiftright($"z", 2 * bits - 6).as("b"))
      .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
      .as[(Long, Long, Long)].collect()
    assert(spans.length > 32, "fixture must populate many buckets")
    spans.foreach { case (b, xs, ys) =>
      assert(xs < 32 && ys < 32, s"bucket $b spans x=$xs y=$ys — not a tight rectangle")
    }
  }

  test("z-layout prunes a second-column filter that a one-column sort cannot") {
    // same points laid out 64 ways; a narrow y-slice (1/8 of the range)
    // touches EVERY x-sorted bucket but at most ~1/8 of z-buckets' worth
    // of extra mass — measure buckets containing any qualifying row
    // independent coordinates: id enumerates the full 256x256 grid
    val pts = spark.range(65536).select(
      ($"id" % 256).as("x"), (($"id" / 256).cast("bigint") % 256).as("y"))
    val withZ = pts.withColumn("z", ZOrder.interleave($"x", $"y", 8))
    def touched(bucket: org.apache.spark.sql.Column): Long = withZ
      .withColumn("b", bucket)
      .filter($"y" >= 96 && $"y" < 128)
      .select($"b").distinct().count()
    val zTouched = touched(shiftright($"z", 10))         // 64 z-buckets
    val xTouched = touched(shiftright($"x", 2))          // 64 x-sort buckets
    assert(xTouched === 64, "an x-only sort cannot prune a y filter")
    assert(zTouched <= 16, s"z-order must localize the y-slice, touched $zTouched/64")
  }

  test("layout range-partitions on z: files cover disjoint contiguous z-ranges") {
    val pts = spark.range(5000).select(
      (($"id" * 7919L) % 1000).as("x"), (($"id" * 104729L) % 365).as("y"))
    val laid = ZOrder.layout(pts, "x", "y", bits = 8, numFiles = 8)
    val ranges = laid
      .select(spark_partition_id().as("p"), $"z")
      .groupBy("p").agg(min($"z").as("zmin"), max($"z").as("zmax"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) =>
        assert(hi <= lo, "partition z-ranges must not overlap")
      case _ =>
    }
  }
}
