package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label encoding with sklearn `LabelEncoder` semantics (reference:
  * `preprocess_to_staging.py:124-129`, SURVEY.md §2.4 E1-E3): classes sorted
  * lexicographically, assigned dense codes 0..K-1 in sorted order.
  *
  * NOT `ml.feature.StringIndexer` (frequency order by default — different
  * codes). The single-partition `Window.orderBy` runs on the distinct
  * dictionary only (at most K rows, e.g. 17,930 Pfam families), never on the
  * fact table; the fact table gets its codes via a broadcast join.
  */
object LabelEncode {

  /** E1/E2: the dictionary — `keyCol` → dense `class_encoded` code. Null
    * keys are excluded (sklearn's LabelEncoder raises on them; silently
    * giving null code 0 would shift every real class by one).
    */
  def mapping(df: DataFrame, keyCol: String, codeCol: String = "class_encoded"): DataFrame =
    df.select(keyCol)
      .filter(col(keyCol).isNotNull)
      .distinct()
      .withColumn(codeCol, (dense_rank().over(Window.orderBy(col(keyCol))) - 1).cast("long"))

  /** E1 applied: attach codes to the fact table via broadcast join (inner —
    * null-key rows, having no code, are dropped).
    */
  def encode(df: DataFrame, keyCol: String, codeCol: String = "class_encoded"): DataFrame =
    encode(df, mapping(df, keyCol, codeCol), keyCol)

  /** E3 with a precomputed dictionary (one mapping reused across frames —
    * e.g. the pipeline encodes splits against the train-time dictionary).
    */
  def encode(df: DataFrame, mapping: DataFrame, keyCol: String): DataFrame =
    df.join(broadcast(mapping), Seq(keyCol))
}
