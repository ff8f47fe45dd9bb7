package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout — multi-dimensional data clustering for
  * file skipping, the layout optimization a 100 TB table needs when
  * queries filter on TWO columns at once.
  *
  * Range-partitioning on one column gives perfect min/max pruning on
  * that column and NONE on any other: a filter on the second column
  * touches every file. Interleaving the bits of both columns into one
  * sort key makes every contiguous key range an axis-aligned rectangle
  * of the 2-D grid, so per-file min/max stats stay TIGHT on BOTH
  * dimensions — a selective filter on either column (or both) prunes
  * ~√ of what a one-column sort would read. This is the standard lakehouse
  * `OPTIMIZE ZORDER BY` construction, composed here from pure integer
  * column expressions: normalize each dimension to a `bits`-bit grid
  * cell, interleave statically unrolled bit pairs, then
  * `repartitionByRange` on the z-value so Spark's range exchange turns
  * key locality into FILE locality.
  *
  * Everything is integer shifts/masks plus one explicitly `floor`ed
  * double division (floor, never bare CAST: engines disagree on
  * double→int rounding, floor they agree on) — deterministic and
  * replayable cross-engine, like every operator in this engine.
  */
object ZOrder {

  /** Normalize `c` into [0, 2^bits) given its min/max: the grid cell
    * index. Integer inputs only; a degenerate (constant) dimension
    * maps to cell 0. The product (c−mn)·(2^bits−1) must stay inside
    * the double's 2^53 exact-integer range — bits ≤ 16 and any real
    * key range keep it far below. */
  def cell(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 16, s"bits=$bits outside (0, 16]")
    when(mx === mn, lit(0L)).otherwise(
      floor((c - mn).cast("double") * lit((1L << bits) - 1).cast("double") /
        (mx - mn).cast("double")).cast("bigint"))
  }

  /** Morton interleave of two `bits`-bit cell indices: x takes even bit
    * positions, y odd. Statically unrolled — `bits` pairs of
    * shift/mask/multiply terms, all codegen'd; max result bit 2·bits−1
    * ≤ 31. */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 16, s"bits=$bits outside (0, 16]")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The write-side layout: z-value appended and the frame
    * range-partitioned on it, so each output file covers one contiguous
    * z-range = one tight rectangle of the (x, y) grid. `numFiles`
    * mirrors the target file count (at 100 TB: total size / target
    * file size). Column min/max bounds are a ~4-value broadcast. */
  def layout(df: DataFrame, xCol: String, yCol: String, bits: Int,
             numFiles: Int): DataFrame = {
    val bounds = df.agg(
      min(col(xCol)).as("__xmn"), max(col(xCol)).as("__xmx"),
      min(col(yCol)).as("__ymn"), max(col(yCol)).as("__ymx"))
    df.crossJoin(broadcast(bounds))
      .withColumn("z", interleave(
        cell(col(xCol), col("__xmn"), col("__xmx"), bits),
        cell(col(yCol), col("__ymn"), col("__ymx"), bits), bits))
      .drop("__xmn", "__xmx", "__ymn", "__ymx")
      .repartitionByRange(numFiles, col("z"))
  }

  /** [[layout]] under PINNED bounds — the incremental-maintenance form
    * ([[graft.sinks.ZOrderTable.optimize]]): every generation of a
    * maintained table must grid against the SAME bounds or their
    * z-rectangles mean different things. Values outside the pinned range
    * (drift since the original write) CLAMP to the edge cells — only
    * clustering quality degrades at the edges; pruning correctness never
    * does, because file skipping reads the files' ACTUAL min/max stats,
    * not the grid. */
  def layoutPinned(df: DataFrame, xCol: String, yCol: String, bits: Int,
                   numFiles: Int, xmn: Long, xmx: Long,
                   ymn: Long, ymx: Long): DataFrame = {
    def clamped(c: Column, mn: Long, mx: Long) =
      least(greatest(c, lit(mn)), lit(mx))
    df.withColumn("z", interleave(
        cell(clamped(col(xCol), xmn, xmx), lit(xmn), lit(xmx), bits),
        cell(clamped(col(yCol), ymn, ymx), lit(ymn), lit(ymx), bits), bits))
      .repartitionByRange(numFiles, col("z"))
  }
}
