package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for two-dimensional scan locality.
  *
  * 100 TB motivation: corpus scans usually filter on more than one
  * dimension (user x time, lang x quality, source x date). A layout
  * sorted on ONE key gives parquet row-group min/max pruning on that
  * key only; interleaving the bits of two bucketed keys instead gives
  * every row group a tight bounding RECTANGLE in both dimensions, so a
  * 2-D range predicate skips row groups on both axes (the
  * Delta/Iceberg OPTIMIZE ZORDER idea, built here from pure Column
  * bit-ops — codegen'd, no UDF anywhere in the write path, and the
  * one exchange is the range partition that any global sort would pay
  * anyway). The reference engine has no layout optimizer (its nearest
  * analogue is the 1-D centroid file split, dnc/dnc.go:430); this is
  * a pipeline extension for training-data scans.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so that bit i lands at bit 2*i
    * (the classic mask-shift ladder, in long space throughout). */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit bucketed dimensions: bit i of
    * `a` goes to bit 2*i, bit i of `b` to bit 2*i+1. Inputs outside
    * [0, 65536) are masked to their low 16 bits. */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Rewrite `df` into `numFiles` z-contiguous partitions with rows
    * sorted by the Morton key inside each, so every output file's
    * (a, b) min/max envelope is a compact z-curve cell. Costs exactly
    * one range exchange; `a`/`b` should already be bucketed into
    * [0, 65536). Write the result with one file per partition to keep
    * the cells as the row-group pruning unit. */
  def cluster(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame =
    df.withColumn("_zkey", morton2(a, b))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
}
