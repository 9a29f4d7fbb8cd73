package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.10's `Aggregator[IN,BUF,OUT]` surface): bounded
  * per-group top-k.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(...))`
  * then `rn <= k`) sorts EVERY group's full contents before discarding all
  * but k rows. This aggregator keeps only k candidates per group in both the
  * partial (map-side) and merge phases — O(k) state per group, no sort of
  * the non-winners — the shape that matters when a 100 TB fact table has
  * millions of rows per key. (Spark 3.5+'s WindowGroupLimit narrows the gap
  * for rank functions; the Aggregator additionally gets map-side partial
  * aggregation.)
  *
  * Ordering: (price DESC, orderkey ASC, linenumber ASC) — the same total
  * order as the `window_topk` query, so the DuckDB oracle is shared.
  */
final case class LineRef(price: Double, okey: Long, lnum: Int)

final class TopKLines(k: Int) extends Aggregator[LineRef, List[LineRef], Seq[LineRef]] {

  private def lt(a: LineRef, b: LineRef): Boolean =
    a.price > b.price ||
      (a.price == b.price && (a.okey < b.okey ||
        (a.okey == b.okey && a.lnum < b.lnum)))

  /** Insert keeping the buffer sorted and truncated to k. */
  private def insert(buf: List[LineRef], v: LineRef): List[LineRef] = {
    if (buf.size >= k && lt(buf.last, v)) buf
    else {
      val (before, after) = buf.span(lt(_, v))
      (before ::: v :: after).take(k)
    }
  }

  override def zero: List[LineRef] = Nil
  override def reduce(b: List[LineRef], a: LineRef): List[LineRef] = insert(b, a)
  override def merge(b1: List[LineRef], b2: List[LineRef]): List[LineRef] =
    b2.foldLeft(b1)(insert)
  override def finish(r: List[LineRef]): Seq[LineRef] = r
  override def bufferEncoder: Encoder[List[LineRef]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[LineRef]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAgg {
  /** groupBy(key).agg(topKLines(k)) → array<struct<price,okey,lnum>> sorted
    * best-first. */
  def topKLines(k: Int): org.apache.spark.sql.TypedColumn[LineRef, Seq[LineRef]] =
    new TopKLines(k).toColumn
}
