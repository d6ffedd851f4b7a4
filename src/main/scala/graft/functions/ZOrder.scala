package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the `OPTIMIZE ZORDER BY` layout
  * primitive (Delta's multi-dimensional clustering; same idea in
  * Iceberg's sort-order z-curve): interleaving the bits of two
  * normalized dimensions gives a 1-D key whose PREFIX is a quadtree
  * tile, so laying a table out by a short z-prefix makes BOTH
  * dimensions' zone maps tight at once — a bbox query prunes to the
  * tiles the box intersects instead of opening every dir the way a
  * layout keyed on an unrelated column (ingest month) must.
  *
  * Everything here is a pure `Column` expression tree (shifts, masks,
  * arithmetic — whole-stage-codegen'd, reproducible bit-for-bit in
  * any engine with IEEE doubles and 64-bit integers, which is what
  * lets a DuckDB oracle re-derive the exact same cells):
  *
  *  - [[norm16]]: min-max normalize a value to a 16-bit integer rank
  *    (deterministic: one subtraction, one division, one multiply,
  *    one floor — IEEE ops are exact-deterministic, so both engines
  *    land on the same integer).
  *  - [[spread16]]: spread a 16-bit integer's bits to even positions
  *    with the standard magic-number doubling (4 shift-or-mask
  *    rounds, not a 16-term sum).
  *  - [[zValue]]: interleave two 16-bit ranks into a 32-bit Morton
  *    code (x takes even bits, y odd).
  *  - [[zCell]]: the code's top `bits` bits as a LONG cell id — the
  *    quadtree tile a layout partitions by. Prefix-bucketing needs no
  *    global sort (a rank-based ntile would collapse to one
  *    partition): buckets are fixed-width in z-space, so the column
  *    is embarrassingly parallel and the same expression computes it
  *    at 100 TB.
  */
object ZOrder {

  /** Min-max normalize to [0, 65535]; constant columns (mx == mn) map
    * to 0. The caller passes GLOBAL bounds (one tiny aggregate).
    */
  def norm16(x: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L)).otherwise(
      floor((x - mn) / (mx - mn) * lit(65535.0)).cast("long"))

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit word: 0b..dcba → 0b.d0c0b0a.
    */
  def spread16(v: Column): Column = {
    val s1 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit ranks (x even bits, y odd). */
  def zValue(x16: Column, y16: Column): Column =
    spread16(x16).bitwiseOR(shiftleft(spread16(y16), 1))

  /** The z-code's top `bits` bits as the clustering cell id: `bits`
    * must be even to cut the curve on whole quadtree levels (bits=4
    * → a 4×4 grid of tiles, 16 dirs).
    */
  def zCell(x: Column, y: Column,
            mnx: Column, mxx: Column, mny: Column, mxy: Column,
            bits: Int): Column = {
    require(bits > 0 && bits <= 32 && bits % 2 == 0,
      s"zCell: bits must be even in (0, 32], got $bits")
    shiftright(zValue(norm16(x, mnx, mxx), norm16(y, mny, mxy)),
      32 - bits)
  }
}
