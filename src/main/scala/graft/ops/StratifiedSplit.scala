package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-class stratified 3-way split (reference: `preprocess_to_staging.py:14-74`).
  *
  * Branch semantics reproduced exactly (SURVEY.md §2.5 SP1):
  *   - n == 1  → the row goes to test
  *   - n == 2  → first row (file order) to dev, second to test
  *   - n == 3  → rows 1,2,3 (file order) to train, dev, test
  *   - n >= 4  → shuffle, then nTest = int(n*0.33) rows to test,
  *               nDev = int((n-nTest)*0.33) to dev, the rest to train
  *
  * The reference's unseeded `np.random.permutation` (`:61`) is replaced by a
  * deterministic pseudo-shuffle: order by `md5(class # rowKey)` (SP3). md5
  * exists in both Spark and DuckDB, so the oracle can replay the exact
  * permutation.
  *
  * Scale notes: one hash-partition exchange on the class column feeds all
  * three window specs (count + two row_numbers share the partitioning); no
  * driver-side collect, no per-class loop. Skewed giant classes only pay an
  * in-partition sort.
  */
object StratifiedSplit {
  val TestRatio = 0.33
  val DevRatio  = 0.33

  /** Adds a `split` column in {train, dev, test}. `orderCol` stands in for
    * the reference's file order and must be unique within a class.
    */
  def withSplit(df: DataFrame, classCol: String, orderCol: String): DataFrame = {
    val cls = col(classCol)
    val ord = col(orderCol)
    val byClass = Window.partitionBy(cls)
    val fileOrder = byClass.orderBy(ord)
    // SP3: deterministic stand-in for np.random.permutation
    val shuffleKey = md5(concat_ws("#", cls.cast("string"), ord.cast("string")))
    val shufOrder = byClass.orderBy(shuffleKey, ord)

    val base = df
      .withColumn("_cnt", count(lit(1)).over(byClass))
      .withColumn("_rnf", row_number().over(fileOrder).cast("long"))
      .withColumn("_rns", row_number().over(shufOrder).cast("long"))

    // Python int() on a positive double == floor; 0.33 must stay a DOUBLE
    // (not decimal) so e.g. 100*0.33 floors to 32 exactly as numpy does.
    val nTest = floor(col("_cnt") * lit(TestRatio))
    val nDev  = floor((col("_cnt") - nTest) * lit(DevRatio))

    base
      .withColumn(
        "split",
        when(col("_cnt") === 1, lit("test"))
          .when(col("_cnt") === 2, when(col("_rnf") === 1, lit("dev")).otherwise(lit("test")))
          .when(
            col("_cnt") === 3,
            when(col("_rnf") === 1, lit("train"))
              .when(col("_rnf") === 2, lit("dev"))
              .otherwise(lit("test")))
          .otherwise(
            when(col("_rns") <= nTest, lit("test"))
              .when(col("_rns") <= nTest + nDev, lit("dev"))
              .otherwise(lit("train"))))
      .drop("_cnt", "_rnf", "_rns")
  }

  /** One split as a filtered view (reference `iloc[indices]`, P6). */
  def split(df: DataFrame, classCol: String, orderCol: String, name: String): DataFrame =
    withSplit(df, classCol, orderCol).filter(col("split") === lit(name)).drop("split")

  /** Per-class (n, n_train, n_dev, n_test) derived arithmetically from the
    * class size alone — SP1's four branches fix the counts regardless of
    * which rows the permutation picks, so cardinality queries need one hash
    * aggregation, not the row-level window+sort. Row-level oracles verify
    * the equivalence at runtime (q09/q10 vs the sp CTE).
    */
  def splitSizes(df: DataFrame, classCol: String): DataFrame = {
    val n = col("n")
    val nTest = when(n <= 2, lit(1L))
      .when(n === 3, lit(1L))
      .otherwise(floor(n * lit(TestRatio)))
    val nDev = when(n === 1, lit(0L))
      .when(n <= 3, lit(1L))
      .otherwise(floor((n - floor(n * lit(TestRatio))) * lit(DevRatio)))
    df.groupBy(col(classCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_test", nTest)
      .withColumn("n_dev", nDev)
      .withColumn("n_train", n - col("n_test") - col("n_dev"))
  }
}
