package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-invariant table fingerprints — the anti-entropy / replica-
  * validation primitive (ref: the integrity check a lakehouse runs
  * after replicating a zone, per SURVEY §2's S4/S5 object transfer).
  * Each row is canonicalized to one string (integer cents for money,
  * ISO dates — the exact-parity projections used across this repo),
  * hashed, and folded with ORDER-INVARIANT aggregates (XOR + modular
  * sum), so two copies of a table compare equal regardless of file
  * layout, partition count, or row order — and the comparison ships
  * one row per table, not the data.
  *
  * Scale shape: a single scan per table, all-codegen row hashing, and
  * a 1-row aggregate — no shuffle beyond the final partial-agg merge.
  * XOR alone is weak to even-multiplicity row swaps (a row inserted
  * twice cancels), hence the paired modular sum; together with the
  * exact row count a mismatch in any of the three flags divergence.
  */
object Fingerprint {

  /** 60-bit integer hash of the canonical row string (15 hex chars of
    * md5 — fits a signed 64-bit lane in any engine).
    */
  private def rowHash(canonical: Column): Column =
    graft.plans.Md5LongExpr(canonical, 15)

  /** One-row fingerprint of `df` under the canonical projection
    * `cols` (caller quantizes floats / formats dates — canonical
    * strings must be engine-portable).
    */
  def of(df: DataFrame, tableName: String, cols: Seq[Column]): DataFrame = {
    val fp = rowHash(concat_ws("|", cols: _*))
    df.select(fp.as("fp"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(fp)").as("xor_fp"),
        sum(col("fp") % 1000000007L).as("sum_fp"))
      .select(lit(tableName).as("table_name"), col("n_rows"), col("xor_fp"), col("sum_fp"))
  }

  /** Fingerprints for a set of named canonical projections, one row
    * per table, deterministic order.
    */
  def ofAll(tables: Seq[(String, DataFrame, Seq[Column])]): DataFrame =
    tables.map { case (n, df, cs) => of(df, n, cs) }
      .reduce(_ unionByName _)
      .orderBy("table_name")
}
