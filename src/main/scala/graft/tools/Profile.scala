package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Dev utility: time sub-pipelines of the heavy queries to localize cost.
  * `runMain graft.tools.Profile <sfDir>`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val docs = Tables.documents(spark, sfDir)
    time("warmup count")(docs.count())

    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
    time("shingle rows (lead-window)")(sh.count())

    val h = sh.select(
      col("doc_id"),
      conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("h1"),
      conv(substring(md5(col("s")), 13, 12), 16, 10).cast("long").as("h2"))
    time("+ md5/conv hashes")(h.count())

    val minAggs = (0 until 8).map(k =>
      min((col("h1") + lit(k.toLong) * col("h2")) % lit(Dedup.MinhashMod)).as(s"m$k"))
    val mh = h.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    time("+ signature groupBy")(mh.count())

    // native one-pass signatures (r2) vs the explode+agg pipeline above
    time("native minhash signatures")(
      docs.select(graft.plans.MinHashExpr(col("text"), 8).as("m")).count())
    time("native simhash signatures")(
      docs.select(graft.plans.SimHashExpr(col("text")).as("h")).count())

    time("full minhash candidates")(Dedup.minhashCandidates(docs, "doc_id", "text").count())
    time("full jaccard-on-cand")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    time("full simhash pairs")(Dedup.simhashPairs(docs, "doc_id", "text").count())

    // similarity scale stress: 100k synthetic 64-dim vectors (far beyond the
    // test table) — IVF bucketed search must stay near-linear
    import graft.operators.Similarity
    val big = spark.range(100000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        i => (pmod(hash(col("id") * lit(64) + i), lit(1000)).cast("float") / 500.0f - 1.0f))
        .as("embedding"))
      .cache() // isolate search cost from synthetic-vector generation
    time("materialize 100k vectors")(big.count())
    time("ANN ivf 100k vectors")(
      Similarity.ivfTopK(big, "vec_id", "embedding", nCentroids = 64, nQueries = 5, k = 10).count())
    time("ANN brute 100k vectors")(
      Similarity.bruteForceTopK(big, "vec_id", "embedding", nQueries = 5, k = 10).count())

    // IVF skew stress: 100k vectors in ONE tight cluster (dominant first
    // dim, small jitter elsewhere). Centroids are the first 64 vectors —
    // cluster members — so the hot region must split across buckets; the
    // printed max/min bucket sizes quantify residual skew, and the
    // multi-probe timing shows the probe stays bounded.
    val clustered = spark.range(100000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        i => when(i === 1, lit(100.0f)).otherwise(
          pmod(hash(col("id") * lit(64) + i), lit(1000)).cast("float") / 500.0f - 1.0f))
        .as("embedding"))
      .cache()
    time("materialize clustered 100k")(clustered.count())
    val bs = Similarity.assignBuckets(clustered, "vec_id", "embedding", 64)
      .groupBy("bucket").count()
      .agg(max("count").as("mx"), min("count").as("mn"), count(lit(1)).as("nb"))
      .collect()(0)
    println(s"[profile] clustered bucket sizes: max=${bs.getLong(0)} min=${bs.getLong(1)} buckets=${bs.getLong(2)}")
    time("ANN ivf clustered mp=2")(
      Similarity.ivfTopK(clustered, "vec_id", "embedding", nCentroids = 64, nQueries = 5, k = 10, multiProbe = 2).count())

    // dedup scaling: minhash over a 50k-doc synthetic corpus (10x the sf0.1
    // documents table) — should stay near-linear in total shingles
    val synthDocs = spark.range(50000).select(
      col("id").as("doc_id"),
      concat_ws(" ", (1 to 60).map(i =>
        substring(md5(concat(col("id").cast("string"), lit(s":$i"))), 1, 4)): _*).as("text"))
      .cache()
    time("materialize 50k docs")(synthDocs.count())
    time("minhash 50k docs")(Dedup.minhashCandidates(synthDocs, "doc_id", "text").count())

    // tokenizer throughput: native expression vs UDF over 1M sequences
    import graft.functions.EsmTokenizer
    val seqs = spark.range(1000000)
      .select(concat(lit("MKV"), md5(col("id").cast("string"))).as("sequence"))
      .cache()
    time("materialize 1M sequences")(seqs.count())
    def tokNative(): Long =
      seqs.select(EsmTokenizer.tokenizeCol(upper(col("sequence")), 128).as("t"))
        .select(sum(element_at(col("t"), 2)).as("s")).collect()(0).getLong(0)
    def tokUdf(): Long =
      seqs.select(EsmTokenizer.tokenizeUdf(128)(upper(col("sequence"))).as("t"))
        .select(sum(element_at(col("t"), 2)).as("s")).collect()(0).getLong(0)
    time("tokenize 1M native (cold)")(tokNative())
    time("tokenize 1M UDF (cold)")(tokUdf())
    time("tokenize 1M native (warm)")(tokNative())
    time("tokenize 1M UDF (warm)")(tokUdf())
    spark.stop()
  }
}
