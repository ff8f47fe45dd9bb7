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

  /** Morton interleave of N `bits`-bit cell indices — the general form
    * `OPTIMIZE ZORDER BY (c1, …, cN)` needs: bit i of dimension j lands
    * at position i·N + j, so every contiguous z-range is an axis-aligned
    * BOX of the N-dim grid and per-file min/max stats stay tight on ALL
    * dimensions at once. Statically unrolled (N·bits shift/mask/multiply
    * terms, all codegen'd); N·bits ≤ 62 keeps the result in a long.
    * More dimensions split the same bit budget — pruning per dimension
    * weakens as N grows (the classic z-order tradeoff), so 2–4 columns
    * is the practical range, exactly as in the lakehouse engines. */
  def interleaveN(xs: Seq[Column], bits: Int): Column = {
    require(xs.nonEmpty, "interleaveN: at least one dimension")
    require(bits > 0 && bits <= 16, s"bits=$bits outside (0, 16]")
    require(xs.size * bits <= 62,
      s"${xs.size} dims x $bits bits = ${xs.size * bits} z-bits > 62")
    val n = xs.size
    xs.zipWithIndex.map { case (x, j) =>
      (0 until bits).map { i =>
        shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j))
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  /** Morton interleave of two `bits`-bit cell indices: x takes even bit
    * positions, y odd — [[interleaveN]] at N = 2 (identical terms). */
  def interleave(x: Column, y: Column, bits: Int): Column =
    interleaveN(Seq(x, y), bits)

  /** The write-side layout over N columns: z-value appended and the
    * frame range-partitioned on it, so each output file covers one
    * contiguous z-range = one tight BOX of the N-dim grid. `numFiles`
    * mirrors the target file count (at 100 TB: total size / target
    * file size). Column min/max bounds are a ~2N-value broadcast. */
  def layoutN(df: DataFrame, cols: Seq[String], bits: Int,
              numFiles: Int): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    df.crossJoin(broadcast(bounds))
      .withColumn("z", interleaveN(
        cols.map(c => cell(col(c), col(s"__mn_$c"), col(s"__mx_$c"), bits)),
        bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
      .repartitionByRange(numFiles, col("z"))
  }

  /** Two-column [[layoutN]] — the common case. */
  def layout(df: DataFrame, xCol: String, yCol: String, bits: Int,
             numFiles: Int): DataFrame =
    layoutN(df, Seq(xCol, yCol), bits, numFiles)

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
