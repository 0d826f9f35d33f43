package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the exact population variance of integer
  * cents — the third custom-aggregation tier this library demonstrates
  * (built-in functions everywhere they suffice, codegen Catalyst
  * expressions for scalar hot paths, and THIS for custom merge logic the
  * expression API can't express as one tree).
  *
  * The buffer is a flat (n, Σx, Σx²) product of longs — Tungsten encodes
  * it off-heap, merges are three additions, and partial aggregation
  * (map-side combine) applies exactly as for built-in aggregates. Σx² of
  * 1e6-cent balances reaches ~1.5e17 per fact table at sf0.1 — inside
  * long range; the finishing division uses BigInt so n·Σx² (~1e22) never
  * overflows. The result is the FLOORED population variance in cents² —
  * bit-identical on any engine or partitioning, so the DuckDB oracle
  * replays it with HUGEINT arithmetic.
  */
object VarianceAgg extends Aggregator[Long, (Long, Long, Long), Long] {
  override def zero: (Long, Long, Long) = (0L, 0L, 0L)

  override def reduce(b: (Long, Long, Long), x: Long): (Long, Long, Long) =
    (b._1 + 1L, b._2 + x, b._3 + x * x)

  override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3)

  override def finish(r: (Long, Long, Long)): Long =
    if (r._1 == 0L) 0L
    else {
      val n = BigInt(r._1)
      ((n * r._3 - BigInt(r._2) * r._2) / (n * n)).toLong
    }

  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
