package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mathematical invariants of the late round-5 inline queries — properties
  * the DuckDB oracle cannot see (it only proves Spark ≡ DuckDB, not that
  * the shared formulation is self-consistent).
  */
class RoundFivePropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()

  test("q230: the stationary vector stays within 1% of total ppm mass") {
    val mass = rows("q230_markov_stationary").map(_.getAs[Long]("pi_ppm")).sum
    // per-term floor division only loses mass (≤ 1 ppm per matrix cell)
    assert(mass <= 1000000L, s"mass $mass exceeds 1e6")
    assert(mass >= 990000L, s"mass $mass lost more than 1%")
  }

  test("q231: every z-order box scans at least its hits (corner bounds are sound)") {
    rows("q231_zorder_layout").foreach { r =>
      val (scanned, hits) = (r.getAs[Long]("scanned"), r.getAs[Long]("hits"))
      assert(hits <= scanned, s"box ${r.getAs[Long]("box_id")}: $hits hits > $scanned scanned")
      assert(r.getAs[Long]("precision_ppm") <= 1000000L)
    }
  }

  test("q239: ABC classes partition the parts exactly") {
    val r = rows("q239_abc_classification")
    val nParts = r.map(_.getAs[Long]("n_parts")).sum
    val expected = Tables.lineitem(spark, sfDir)
      .select("l_partkey").distinct().count()
    assert(nParts === expected)
    // shares sum to ~1e6 (floor division loses at most 1 ppm per class)
    val share = r.map(_.getAs[Long]("share_ppm")).sum
    assert(share >= 999997L && share <= 1000000L, s"share sum $share")
  }

  test("q242: k-core peeling is monotone and lands on a min-degree-2 core") {
    val r = rows("q242_kcore").sortBy(_.getAs[Long]("round"))
    val nodes = r.map(_.getAs[Long]("nodes"))
    val edges = r.map(_.getAs[Long]("edges"))
    assert(nodes.zip(nodes.tail).forall { case (a, b) => b <= a }, nodes.toSeq.toString)
    assert(edges.zip(edges.tail).forall { case (a, b) => b <= a }, edges.toSeq.toString)
    // a 2-core with n nodes needs at least n edges (min degree 2 ⇒ |E| ≥ |V|)
    assert(edges.last >= nodes.last, s"final core ${nodes.last}v/${edges.last}e")
  }

  test("q244: removing a channel never increases conversion reach") {
    val r = rows("q244_removal_effect")
    val base = r.find(_.getAs[String]("removed") == "none").get.getAs[Long]("reach3_ppm")
    r.foreach { row =>
      assert(row.getAs[Long]("reach3_ppm") <= base,
        s"${row.getAs[String]("removed")} reach exceeds base")
      assert(row.getAs[Long]("effect_ppm") >= 0L)
    }
  }

  test("q246 + q254: correlation signs and tau-b bounds are consistent") {
    val tau = rows("q254_kendall_tau")
    tau.foreach { r =>
      val t = r.getAs[Double]("tau_b")
      assert(t >= -1.0 && t <= 1.0, s"${r.getAs[String]("p_brand")} tau $t")
      assert(r.getAs[Long]("concordant") + r.getAs[Long]("discordant")
        <= r.getAs[Long]("n_pairs"))
    }
    val s = rows("q246_simpsons_flip").head
    assert(s.getAs[Long]("n_agree") + s.getAs[Long]("n_flipped")
      <= s.getAs[Long]("n_groups"))
  }

  test("q248: weighted PageRank mass stays within floor-loss of 1e6 ppm") {
    val mass = rows("q248_weighted_pagerank").map(_.getAs[Long]("pr_ppm")).sum
    assert(mass <= 1000000L && mass >= 950000L, s"mass $mass")
  }

  test("q251 + q256: the biased sample is a subset and ESS ≤ n_sample") {
    val ipw = rows("q251_ipw_reweight")
    ipw.foreach { r =>
      assert(r.getAs[Long]("n_sample") <= r.getAs[Long]("n_full"))
      val en = r.getAs[String]("lang") == "en"
      if (en) assert(r.getAs[Long]("err_ppm") === 0L, "English is kept at 100%")
    }
    val ess = rows("q256_ess_weights").head
    assert(ess.getAs[Long]("ess_milli") <= ess.getAs[Long]("n_sample") * 1000)
    assert(ess.getAs[Long]("deff_ppm") >= 1000000L, "design effect ≥ 1 for non-uniform weights")
  }

  test("q255: coalesced counts preserve the per-source totals") {
    val co = rows("q255_rare_coalesce")
    val bySource = co.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val full = Tables.documents(spark, sfDir).groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(bySource === full)
  }

  test("q253: handoff matrix counts equal sessions minus users (first sessions excluded)") {
    val handoffs = rows("q253_session_handoff").map(_.getAs[Long]("n")).sum
    val ses = graft.operators.EventWindows
      .sessionize(Tables.events(spark, sfDir), 30)
    val nSessions = ses.count()
    val nUsers = ses.select("user_id").distinct().count()
    assert(handoffs === nSessions - nUsers)
  }

  test("q273: Misra-Gries candidates are a superset of the exact heavy hitters") {
    import graft.operators.HeavyHitters
    val toks = HeavyHitters.tokenStream(Tables.documents(spark, sfDir), "text")
    val n = toks.count()
    val exact = toks.groupBy("token").count()
      .filter(org.apache.spark.sql.functions.col("count") * 100 > n)
      .collect().map(_.getAs[String]("token")).toSet
    val cand = HeavyHitters.candidates(toks, "token", 100)
      .collect().map(_.getAs[String]("token")).toSet
    assert(exact.subsetOf(cand),
      s"missed hitters: ${exact -- cand}")
    // and the two-pass result IS the exact answer
    val hh = rows("q273_heavy_hitters").map(_.getAs[String]("token")).toSet
    assert(hh === exact)
  }

  test("q274: quantized recall is bounded and overlap consistent with recall_pct") {
    rows("q274_quantized_recall").foreach { r =>
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0L && ov <= 10L)
      assert(r.getAs[Long]("recall_pct") === ov * 10)
      assert(r.getAs[Long]("mean_disp_milli") >= 0L)
    }
  }

  test("q276: removing shard 7 moves ONLY shard 7's docs (rendezvous stability)") {
    val r = rows("q276_rendezvous_shards")
    r.foreach { row =>
      val (shard, moved) = (row.getAs[Long]("shard"), row.getAs[Long]("n_moved_if_drop7"))
      if (shard == 7L) assert(moved === row.getAs[Long]("n_docs"),
        "every doc on the removed shard must move")
      else assert(moved === 0L, s"shard $shard lost docs it should have kept")
    }
    val nDocs = r.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === Tables.documents(spark, sfDir).count())
  }

  test("q277: uniformity estimate never undershoots (Cauchy-Schwarz) and ndv ≤ rows") {
    rows("q277_join_card_audit").foreach { r =>
      // Σc² ≥ (Σc)²/ndv always (equality iff perfectly uniform), so the
      // planner's uniformity estimate is a LOWER bound up to the floor div
      assert(r.getAs[Long]("est_selfjoin") <= r.getAs[Long]("exact_selfjoin"),
        s"bucket ${r.getAs[Long]("bucket")}")
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("err_ppm") <= 0L)
    }
  }

  test("q278: snake packing conserves rows and beats-or-ties hash on max load") {
    val r = rows("q278_partition_packing")
    val snakeTotal = r.map(_.getAs[Long]("snake_rows")).sum
    val hashTotal = r.map(_.getAs[Long]("hash_rows")).sum
    assert(snakeTotal === hashTotal, "both assignments place every row")
    val maxSnake = r.map(_.getAs[Long]("snake_load_ppm")).max
    val maxHash = r.map(_.getAs[Long]("hash_load_ppm")).max
    assert(maxSnake <= maxHash,
      s"snake max load $maxSnake should not exceed hash max load $maxHash")
  }

  test("q279: per-dim profile is consistent (n uniform, var ≥ 0, dead ⇒ var = 0)") {
    val r = rows("q279_embed_dim_profile")
    assert(r.map(_.getAs[Long]("n")).distinct.length === 1,
      "every dimension sees the same vector count")
    r.foreach { row =>
      assert(row.getAs[Long]("var_micro2") >= 0L)
      if (row.getAs[Long]("dead") == 1L)
        assert(row.getAs[Long]("var_micro2") === 0L)
      assert(row.getAs[Long]("zero_ppm") <= 1000000L)
    }
  }

  test("q280: hot keys are rank-ordered with out_rows = n_rows² and shares ≤ 1e6") {
    val r = rows("q280_join_hotkeys")
    assert(r.length === 20)
    r.foreach { row =>
      assert(row.getAs[Long]("out_rows") ===
        row.getAs[Long]("n_rows") * row.getAs[Long]("n_rows"))
    }
    val outs = r.map(_.getAs[Long]("out_rows"))
    assert(outs.zip(outs.tail).forall { case (a, b) => a >= b }, "descending")
    assert(r.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
  }

  test("q281: l-diversity bounds hold (1 ≤ min_l ≤ 5 priorities, risk ⊆ total)") {
    val r = rows("q281_l_diversity").head
    assert(r.getAs[Long]("min_l") >= 1L && r.getAs[Long]("min_l") <= 5L)
    assert(r.getAs[Long]("rows_at_risk") <= r.getAs[Long]("total_rows"))
    assert(r.getAs[Long]("n_low_diversity") <= r.getAs[Long]("n_groups"))
  }

  test("q282: entropy is within [0, ln(ndv)] and normalization bounded by 1") {
    rows("q282_column_entropy").foreach { r =>
      val (ndv, e9) = (r.getAs[Long]("ndv"), r.getAs[Long]("entropy_nano"))
      assert(e9 >= 0L)
      // quantization adds ≤ 1 nano per term
      val maxNano = (math.log(ndv.toDouble) * 1e9).toLong + ndv
      assert(e9 <= maxNano, s"${r.getAs[String]("col_name")}: $e9 > $maxNano")
      assert(r.getAs[Double]("entropy_norm") <= 1.000001)
    }
  }

  test("q283: assortativity is a correlation (|r| ≤ 1e6 ppm)") {
    val r = rows("q283_assortativity").head
    assert(math.abs(r.getAs[Long]("assortativity_ppm")) <= 1000000L)
    assert(r.getAs[Long]("n_edges") > 0L)
  }

  test("q284: KM survival is monotone non-increasing and at-risk decreases") {
    val r = rows("q284_km_survival")
    val surv = r.map(_.getAs[Long]("ln_surv_nano"))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a },
      "ln-survival must be non-increasing")
    val risk = r.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b < a },
      "at-risk count strictly decreases across event days")
    r.foreach(row => assert(row.getAs[Long]("d_events") <= row.getAs[Long]("n_risk")))
  }

  test("q285: contamination is monotone non-increasing in shingle width") {
    val r = rows("q285_decontam_sweep").sortBy(_.getAs[Long]("n"))
    val cs = r.map(_.getAs[Long]("n_contaminated"))
    assert(cs.zip(cs.tail).forall { case (a, b) => b <= a },
      s"wider n-grams can only flag fewer docs: ${cs.toSeq}")
    assert(r.map(_.getAs[Long]("n")).toSeq === Seq(3L, 5L, 8L, 13L))
  }

  test("q286: latest-state compaction conserves users and ops") {
    val r = rows("q286_latest_state")
    val ev = Tables.events(spark, sfDir)
    assert(r.map(_.getAs[Long]("n_users")).sum ===
      ev.select("user_id").distinct().count())
    assert(r.map(_.getAs[Long]("n_ops_folded")).sum === ev.count())
    assert(r.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
  }

  test("q287: conditional entropy is within [0, ln(branching) + quantization]") {
    rows("q287_transition_entropy").foreach { r =>
      val h = r.getAs[Long]("h_cond_nano")
      val k = r.getAs[Long]("n_next_states")
      assert(h >= 0L)
      assert(h <= (math.log(k.toDouble) * 1e9).toLong + k,
        s"state ${r.getAs[String]("state")}: H=$h exceeds ln($k)")
    }
  }

  test("q275: waterfilling exhausts the budget exactly and respects every cap") {
    val r = rows("q275_token_allocation")
    val total = r.map(_.getAs[Long]("n_tokens")).sum
    val alloc = r.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc === total / 2, s"allocated $alloc != budget ${total / 2}")
    r.foreach { row =>
      assert(row.getAs[Long]("alloc_tokens") <= row.getAs[Long]("n_tokens"),
        s"${row.getAs[String]("source")} allocated over its 1-epoch cap")
      assert(row.getAs[Long]("epochs_ppm") <= 1000000L)
    }
    // uncapped sources all land within 1 token of the common level λ
    val uncapped = r.filter(_.getAs[Long]("capped") == 0L).map(_.getAs[Long]("alloc_tokens"))
    if (uncapped.nonEmpty)
      assert(uncapped.max - uncapped.min <= 1L, s"level spread ${uncapped.toSeq}")
  }

  test("q288: the OR-of-conjunctions equals the union of its three branches") {
    import org.apache.spark.sql.functions._
    val r = rows("q288_disjunctive_revenue")
      .map(x => x.getAs[String]("p_brand") -> x.getAs[Long]("n_items")).toMap
    val l = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val branches = Seq(
      ("Brand#12", 5, 1, 11), ("Brand#23", 10, 10, 20), ("Brand#34", 15, 20, 30))
    branches.foreach { case (b, sz, qLo, qHi) =>
      val n = l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === b && col("p_size").between(1, sz) &&
          col("l_quantity").between(qLo, qHi))
        .count()
      assert(r.getOrElse(b, 0L) === n, s"branch $b")
    }
  }

  test("q289: doubled U statistic matches a brute-force rank computation") {
    import org.apache.spark.sql.functions._
    val r = rows("q289_mannwhitney").head
    // brute force at sf0.001: average ranks over the raw (group, cents) list
    val seg = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey"), col("c_mktsegment").as("g"))
    val vals = Tables.orders(spark, sfDir)
      .join(seg, col("o_custkey") === col("c_custkey"))
      .select(col("g"), expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
      .collect()
      .map(x => (x.getAs[String]("g"), x.getAs[Long]("v")))
    val sorted = vals.sortBy(_._2)
    // 2·avg-rank of each value (1-based ranks, ties averaged)
    val rank2 = sorted.zipWithIndex
      .groupBy(_._1._2)
      .map { case (v, xs) => v -> xs.map(_._2 + 1L).sum * 2L / xs.length }
    val n1 = vals.count(_._1 == "BUILDING").toLong
    val r1x2 = vals.filter(_._1 == "BUILDING").map(x => rank2(x._2)).sum
    val expected = r1x2 - n1 * (n1 + 1)
    assert(r.getAs[Long]("u1_x2") === expected)
    val n2 = r.getAs[Long]("n2")
    assert(r.getAs[Long]("u1_x2") >= 0L && r.getAs[Long]("u1_x2") <= 2 * n1 * n2)
  }

  test("q290: chi-square matches the classic zero-cell formulation") {
    val r = rows("q290_cramers_v").head
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "source").collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[String]("source")))
    val n = docs.length.toDouble
    val byCell = docs.groupBy(identity).view.mapValues(_.length.toDouble)
    val byLang = docs.groupBy(_._1).view.mapValues(_.length.toDouble)
    val bySrc = docs.groupBy(_._2).view.mapValues(_.length.toDouble)
    // classic Σ_all_cells (O−E)²/E, absent cells contributing E
    val chi2 = (for (l <- byLang.keys; s <- bySrc.keys) yield {
      val e = byLang(l) * bySrc(s) / n
      val o = byCell.getOrElse((l, s), 0.0)
      (o - e) * (o - e) / e
    }).sum
    val got = r.getAs[Long]("chi2_nano").toDouble / 1e9
    assert(math.abs(got - chi2) < 1e-3, s"got $got expected $chi2")
    val v = r.getAs[Long]("cramers_v_ppm")
    assert(v >= 0L && v <= 1000000L)
  }

  test("q291: folds partition the orders and coverage sits near the 90% target") {
    val r = rows("q291_conformal_coverage")
    val total = r.map(x => x.getAs[Long]("n_train") + x.getAs[Long]("n_cal") +
      x.getAs[Long]("n_test")).sum
    assert(total === Tables.orders(spark, sfDir).count())
    r.foreach { row =>
      val cov = row.getAs[Long]("coverage_ppm")
      // conformal guarantees E[coverage] ≥ 0.9; small per-segment folds
      // fluctuate, so assert a loose band rather than the exact bound
      assert(cov >= 800000L && cov <= 1000000L,
        s"${row.getAs[String]("segment")}: coverage $cov outside [0.8, 1]")
      assert(row.getAs[Long]("qhat_cents") >= 0L)
    }
  }

  test("q292: every AA score is n_common terms of 1/ln(deg) with deg in [2, n)") {
    val r = rows("q292_adamic_adar")
    r.foreach { row =>
      val (nc, aa) = (row.getAs[Long]("n_common"), row.getAs[Long]("aa_nano"))
      assert(nc >= 1L)
      // each common-neighbor term lies in (1e9/ln(n_brands), 1e9/ln(2)]
      assert(aa <= nc * 1442695041L, s"$aa too large for $nc terms")
      assert(aa >= nc * (1e9 / math.log(60)).toLong, s"$aa too small for $nc terms")
    }
  }

  test("q293: calibration bins partition the non-null corpus with sane rates") {
    val r = rows("q293_calibration_bins")
    val nonNull = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum === nonNull)
    r.foreach { row =>
      assert(row.getAs[Long]("n_dups") <= row.getAs[Long]("n_docs"))
      assert(row.getAs[Long]("dup_rate_ppm") <= 1000000L)
      assert(row.getAs[Long]("mean_pred_ppm") <= 1000000L)
      assert(row.getAs[Long]("gap_ppm") ===
        math.abs(row.getAs[Long]("mean_pred_ppm") - row.getAs[Long]("dup_rate_ppm")))
    }
  }

  test("q294: nDCG is a [0,1] ratio with DCG bounded by the ideal ranking") {
    val r = rows("q294_ndcg_eval")
    assert(r.nonEmpty)
    // the ideal DCG is the same constant for every query with a full top-10
    val idcgExpected = (1 to 10).map(p =>
      math.round((11 - p) * 1e9 / math.log(p + 1))).sum
    r.foreach { row =>
      assert(row.getAs[Long]("n_hits") <= 10L)
      assert(row.getAs[Long]("dcg_nano") <= row.getAs[Long]("idcg_nano"))
      assert(row.getAs[Long]("ndcg_ppm") >= 0L && row.getAs[Long]("ndcg_ppm") <= 1000000L)
      assert(row.getAs[Long]("idcg_nano") === idcgExpected)
    }
  }

  test("q295: hapax counts nest inside types inside tokens") {
    rows("q295_hapax_share").foreach { row =>
      val (h, ty, tk) = (row.getAs[Long]("n_hapax"), row.getAs[Long]("n_types"),
        row.getAs[Long]("n_tokens"))
      assert(h <= ty && ty <= tk, s"${row.getAs[String]("source")}: $h/$ty/$tk")
      assert(row.getAs[Long]("hapax_ppm") <= 1000000L)
    }
  }

  test("q296: W1 dominates the mean gap (Kantorovich duality lower bound)") {
    import org.apache.spark.sql.functions._
    val r = rows("q296_wasserstein").head
    val w1 = r.getAs[Long]("w1_cents")
    val segs = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
      .select(col("c_custkey"), col("c_mktsegment").as("g"))
    val means = Tables.orders(spark, sfDir)
      .join(segs, col("o_custkey") === col("c_custkey"))
      .groupBy("g").agg(avg(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("m"))
      .collect().map(x => x.getAs[String]("g") -> x.getAs[Double]("m")).toMap
    val meanGap = math.abs(means("AUTOMOBILE") - means("HOUSEHOLD"))
    // f(x)=x is 1-Lipschitz, so W1 ≥ |E_A − E_B| (±1 cent of int division)
    assert(w1 + 1 >= meanGap.floor.toLong, s"W1 $w1 below mean gap $meanGap")
    assert(w1 >= 0L)
  }

  test("q297: every feature sees the same candidate-pair universe") {
    val r = rows("q297_fellegi_sunter")
    assert(r.length === 3)
    val totals = r.map(x => x.getAs[Long]("n_match") + x.getAs[Long]("n_nonmatch")).distinct
    assert(totals.length === 1, s"pair universes differ: ${totals.toSeq}")
    r.foreach { row =>
      assert(row.getAs[Long]("nf_match") <= row.getAs[Long]("n_match"))
      assert(row.getAs[Long]("nf_nonmatch") <= row.getAs[Long]("n_nonmatch"))
      assert(row.getAs[Long]("m_ppm") > 0L && row.getAs[Long]("m_ppm") <= 1000000L)
      assert(row.getAs[Long]("u_ppm") > 0L && row.getAs[Long]("u_ppm") <= 1000000L)
    }
  }

  test("q298: burstiness is at least 1 (cf ≥ df by construction)") {
    rows("q298_burstiness").foreach { row =>
      assert(row.getAs[Long]("cf") >= row.getAs[Long]("df"))
      assert(row.getAs[Long]("burstiness_ppm") >= 1000000L)
      assert(row.getAs[Long]("df") >= 5L)
    }
  }

  test("q299: the two-pass percentile equals the global-sort order statistic") {
    import org.apache.spark.sql.functions._
    val sorted = Tables.orders(spark, sfDir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
      .collect().map(_.getAs[Long]("v")).sorted
    val n = sorted.length.toLong
    rows("q299_twopass_quantiles").foreach { row =>
      val p = row.getAs[Long]("pct")
      val k = (p * n + 99) / 100
      assert(row.getAs[Long]("k") === k)
      assert(row.getAs[Long]("value_cents") === sorted((k - 1).toInt), s"p$p")
    }
  }

  test("q301: leadership census conserves the widget part count") {
    import org.apache.spark.sql.functions._
    val nLed = rows("q301_part_leaders").map(_.getAs[Long]("n_led")).sum
    val nParts = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey"))
      .select("l_partkey").distinct().count()
    // ≤ because the readout is top-20 suppliers; at sf0.001 all fit
    assert(nLed <= nParts)
    assert(nLed > 0L)
  }

  test("q302: supplier counts stay within the clean-supplier universe") {
    import org.apache.spark.sql.functions._
    val nOk = Tables.supplier(spark, sfDir).filter(col("s_acctbal") >= 0).count()
    rows("q302_part_supplier_cnt").foreach { row =>
      assert(row.getAs[Long]("supplier_cnt") >= 1L)
      assert(row.getAs[Long]("supplier_cnt") <= nOk)
    }
  }

  test("q303: hop histogram covers every dup-graph node, keepers at hop 0") {
    val r = rows("q303_keeper_hops")
    val total = r.map(_.getAs[Long]("n_nodes")).sum
    val clusters = rows("q66_dup_clusters")
    val nNodes = clusters.map(_.getAs[Long]("n_docs")).sum
    val nKeepers = clusters.length.toLong
    assert(total === nNodes, s"histogram covers $total of $nNodes nodes")
    val hop0 = r.find(_.getAs[Long]("hop") == 0L).map(_.getAs[Long]("n_nodes")).getOrElse(0L)
    assert(hop0 === nKeepers, s"$hop0 hop-0 nodes vs $nKeepers keepers")
  }

  test("q304: held-out NLL is positive and OOV is a proper rate") {
    val r = rows("q304_heldout_nll")
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("avg_nll_nano") > 0L,
        s"${row.getAs[String]("source")}: NLL must be positive")
      val oov = row.getAs[Long]("oov_ppm")
      assert(oov >= 0L && oov <= 1000000L)
      assert(row.getAs[Long]("n_bigrams") > 0L)
    }
  }

  test("q305: weighted Jaccard is bounded by the set Jaccard structure") {
    rows("q305_weighted_jaccard").foreach { row =>
      val (smin, smax) = (row.getAs[Long]("smin"), row.getAs[Long]("smax"))
      assert(smin >= 0L && smin <= smax, s"min/max violated: $smin/$smax")
      val wj = row.getAs[Long]("wjaccard_ppm")
      assert(wj >= 0L && wj <= 1000000L)
    }
  }

  test("q306: DiD algebra is internally consistent") {
    val r = rows("q306_did_revenue").head
    val did = (r.getAs[Long]("treat_post_cents") - r.getAs[Long]("treat_pre_cents")) -
      (r.getAs[Long]("ctrl_post_cents") - r.getAs[Long]("ctrl_pre_cents"))
    assert(r.getAs[Long]("did_cents") === did)
    Seq("treat_pre_cents", "treat_post_cents", "ctrl_pre_cents", "ctrl_post_cents")
      .foreach(c => assert(r.getAs[Long](c) > 0L, s"$c must be positive"))
  }

  test("q307: RBO is a [0,1] score and caps at the truncated-sum maximum") {
    // with A_d = d at every depth the truncated RBO sum is Σ(1−p)p^(d−1)
    val maxRbo = (1 to 10).map(d =>
      (d.toLong * math.pow(9, d - 1).toLong * 1000000000L) /
        (d * math.pow(10, d).toLong)).sum
    rows("q307_rbo_eval").foreach { row =>
      val rbo = row.getAs[Long]("rbo_nano")
      assert(rbo >= 0L && rbo <= maxRbo, s"rbo $rbo outside [0, $maxRbo]")
    }
  }

  test("q308: Hill estimator internals are consistent") {
    val r = rows("q308_hill_tail_index").head
    assert(r.getAs[Long]("k") === 100L)
    val hill = r.getAs[Long]("hill_nano")
    assert(hill >= 0L)
    if (hill > 0L)
      assert(r.getAs[Long]("alpha_ppm") === 1000000000000000L / hill)
  }

  test("q309: cohort LTV accumulates monotonically and conserves revenue") {
    import org.apache.spark.sql.functions._
    val r = rows("q309_cohort_ltv")
    r.groupBy(_.getAs[Long]("cohort_month")).foreach { case (_, xs) =>
      val sorted = xs.sortBy(_.getAs[Long]("age"))
      val cums = sorted.map(_.getAs[Long]("cum_cents"))
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
      assert(sorted.map(_.getAs[Long]("rev_cents")).sum === cums.last)
    }
    val total = Tables.orders(spark, sfDir)
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
      .collect()(0).getLong(0)
    assert(r.map(_.getAs[Long]("rev_cents")).sum === total)
  }

  test("q300: the pipeline card shrinks monotonically from raw to decontam") {
    val r = rows("q300_pipeline_card").sortBy(_.getAs[Long]("stage_id"))
    assert(r.length === 7)
    assert(r.head.getAs[String]("stage") === "raw")
    assert(r.head.getAs[Long]("survival_ppm") === 1000000L)
    val docs = r.map(_.getAs[Long]("n_docs"))
    val toks = r.map(_.getAs[Long]("n_tokens"))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a }, docs.toSeq.toString)
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a }, toks.toSeq.toString)
    assert(docs.last > 0L, "decontam stage emptied the corpus")
  }

  test("q314: CUPED arms are non-empty, ρ² ∈ [0, 1e6], lift columns consistent") {
    val r = rows("q314_cuped")(0)
    assert(r.getAs[Long]("n_treat") > 0 && r.getAs[Long]("n_ctrl") > 0)
    val vr = r.getAs[Long]("var_reduction_ppm")
    assert(vr >= 0L && vr <= 1000000L, s"rho2 ppm $vr outside [0, 1e6]")
    assert(r.getAs[Long]("raw_lift_cents") ===
      r.getAs[Long]("mean_treat_cents") - r.getAs[Long]("mean_ctrl_cents"))
    // both arms' md5 assignment should split ~50/50 (sf0.001 has only
    // ~150 customers → binomial σ ≈ 4%, so allow 5σ)
    val (nt, nc) = (r.getAs[Long]("n_treat"), r.getAs[Long]("n_ctrl"))
    assert(math.abs(nt - nc).toDouble / (nt + nc) < 0.2, s"arm skew: $nt vs $nc")
  }

  test("q315: the isotonic fit is non-decreasing and bounded by the raw range") {
    val r = rows("q315_isotonic_calibration")
    val iso = r.map(_.getAs[Long]("iso_rate_ppm"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b }, iso.toSeq.toString)
    val raw = r.map(_.getAs[Long]("raw_rate_ppm"))
    assert(iso.min >= raw.min - 1 && iso.max <= raw.max + 1,
      s"iso ${iso.toSeq} escapes raw range ${raw.toSeq}")
  }

  test("q315: the minimax identity equals sequential pool-adjacent-violators") {
    // the identity q315 relies on — iso(i) = max_{j≤i} min_{k≥i} avg(j..k)
    // — checked against a literal PAV merge loop on deterministic data
    // (exact rational comparisons via cross-multiplication)
    val cases = Seq(
      Seq((5L, 3L), (2L, 1L), (3L, 3L), (4L, 0L), (6L, 6L)), // (weight, sum)
      Seq((1L, 1L), (1L, 0L), (1L, 1L), (1L, 0L), (1L, 1L), (1L, 0L)),
      Seq((10L, 0L), (10L, 5L), (10L, 10L)), // already isotonic
      Seq((10L, 10L), (10L, 5L), (10L, 0L))) // fully reversed → one pool
    for (bins <- cases) {
      val n = bins.length
      def avg(j: Int, k: Int): (Long, Long) = { // (num, den) of pooled mean
        val s = bins.slice(j, k + 1)
        (s.map(_._2).sum, s.map(_._1).sum)
      }
      val minimax = (0 until n).map { i =>
        (0 to i).map { j =>
          (i until n).map(k => avg(j, k))
            .minBy { case (s, w) => BigDecimal(s) / BigDecimal(w) }
        }.maxBy { case (s, w) => BigDecimal(s) / BigDecimal(w) }
      }.map { case (s, w) => s * 1000000L / w }
      // sequential PAV: merge while the previous block's mean exceeds this one's
      case class B(w: Long, s: Long, span: Int)
      val pav = bins.foldLeft(List.empty[B]) { case (acc, (w, s)) =>
        var cur = B(w, s, 1)
        var rest = acc
        while (rest.nonEmpty && rest.head.s * cur.w >= cur.s * rest.head.w) {
          cur = B(rest.head.w + cur.w, rest.head.s + cur.s, rest.head.span + cur.span)
          rest = rest.tail
        }
        cur :: rest
      }.reverse.flatMap(b => List.fill(b.span)(b.s * 1000000L / b.w))
      assert(minimax === pav, s"bins $bins: minimax $minimax vs PAV $pav")
    }
  }

  test("q317: every md5 bucket contributes at most one pair, bands partition pairs") {
    val r = rows("q317_corpus_diversity")
    val n = r.map(_.getAs[Long]("n_pairs")).sum
    assert(n >= 1L && n <= 256L, s"$n pairs from 256 buckets")
    r.foreach { row =>
      val (b, m) = (row.getAs[Long]("band"), row.getAs[Long]("mean_jac_ppm"))
      val hi = Seq(0L, 1000L, 10000L, 100000L, 1000000L)(b.toInt)
      assert(m <= hi, s"band $b mean $m above band ceiling $hi")
    }
  }

  test("q318: the sampling table's expected shares are positive and draws conserved") {
    val r = rows("q318_negative_sampling")
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("expected_ppm") > 0))
    assert(r.forall(_.getAs[Long]("drawn") > 0))
    assert(r.map(_.getAs[Long]("drawn")).sum <= 1000L) // top-20 of the 1000 draws
  }

  test("q319: all index formats account for the same postings") {
    val r = rows("q319_index_formats")
    assert(r.length === 3)
    assert(r.map(_.getAs[Long]("n_postings")).distinct.length === 1)
    assert(r.forall(_.getAs[Long]("total_bytes") > 0))
  }

  test("q320: Damerau never exceeds Levenshtein, and the readout is the strict-win set") {
    rows("q320_damerau_linkage").foreach { r =>
      assert(r.getAs[Long]("dl") < r.getAs[Long]("lev"),
        s"pair ${r.getAs[Long]("part_a")}-${r.getAs[Long]("part_b")} not a strict win")
    }
  }

  test("q321: sharding by cluster id never splits a component; by doc id may") {
    val r = rows("q321_cluster_sharding").map(x => x.getAs[String]("policy") -> x).toMap
    assert(r("by_cluster").getAs[Long]("n_split") === 0L)
    assert(r("by_cluster").getAs[Long]("split_ppm") === 0L)
    // both policies see the same cluster census
    assert(r("by_doc").getAs[Long]("n_clusters") === r("by_cluster").getAs[Long]("n_clusters"))
    assert(r("by_doc").getAs[Long]("n_multi") === r("by_cluster").getAs[Long]("n_multi"))
    // load stays within 8× of ideal (one shard holding everything)
    assert(r("by_cluster").getAs[Long]("max_shard_ppm") <= 8000000L)
  }

  test("q322: MRR and AP stay within their rank bounds") {
    rows("q322_mrr_eval").foreach { r =>
      val nHits = r.getAs[Long]("n_hits")
      assert(nHits >= 0L && nHits <= 10L)
      if (!r.isNullAt(r.fieldIndex("mrr_nano"))) {
        val mrr = r.getAs[Long]("mrr_nano")
        assert(mrr >= 100000000L && mrr <= 1000000000L) // 1/10 .. 1/1
      }
      val ap = r.getAs[Long]("ap_nano")
      assert(ap >= 0L && ap <= 1000000000L)
    }
  }

  test("q323: trending panel is 10 risers + 10 fallers with opposite score sides") {
    val r = rows("q323_trending_terms")
    val byDir = r.groupBy(_.getAs[String]("direction"))
    assert(byDir("rising").length === 10 && byDir("falling").length === 10)
    val minRise = byDir("rising").map(_.getAs[Long]("score_ppm")).min
    val maxFall = byDir("falling").map(_.getAs[Long]("score_ppm")).max
    assert(maxFall <= minRise, s"falling max $maxFall above rising min $minRise")
  }

  test("q324: debounce keeps at least one event per non-empty type") {
    rows("q324_event_debounce").foreach { r =>
      val (n, k) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_kept"))
      assert(k >= 1L && k <= n)
      assert(r.getAs[Long]("keep_ppm") === k * 1000000L / n)
    }
  }

  test("q325: pareto layers are disjoint, exhaustive down to layer 3, and dominated in order") {
    val r = rows("q325_pareto_layers").sortBy(_.getAs[Long]("layer"))
    assert(r.map(_.getAs[Long]("layer")).toSeq === Seq(1L, 2L, 3L))
    // each deeper layer's best size cannot beat the shallower frontier's
    val maxSizes = r.map(_.getAs[Long]("max_size"))
    assert(maxSizes.zip(maxSizes.tail).forall { case (a, b) => b <= a },
      s"deeper layer dominates shallower: $maxSizes")
  }

  test("q316: JL distortion is small but non-zero, and every query is audited") {
    val r = rows("q316_jl_distortion")
    assert(r.length === 8)
    r.foreach { row =>
      val mean = row.getAs[Long]("mean_err_ppm")
      val max  = row.getAs[Long]("max_err_ppm")
      assert(mean <= max)
      // 16 of 64 dims: typical cosine error well under 0.5, never ≥ 2.0
      assert(max < 2000000L, s"query ${row.getAs[Long]("query_id")}: max err $max")
    }
  }

  test("q326: the encoding planner's size model is internally consistent") {
    rows("q326_encoding_planner").foreach { r =>
      // runs can never exceed values; a dictionary never exceeds the data
      assert(r.getAs[Long]("n_runs") <= r.getAs[Long]("n_values"))
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n_values"))
      // the chosen encoding is never beaten by another estimate
      val sizes = Map("plain" -> r.getAs[Long]("plain_bytes"),
        "dict" -> r.getAs[Long]("dict_bytes"), "rle" -> r.getAs[Long]("rle_bytes"))
      assert(sizes(r.getAs[String]("chosen")) === sizes.values.min,
        s"${r.getAs[String]("col_name")}: chose ${r.getAs[String]("chosen")} of $sizes")
    }
  }

  test("q327: front coding never grows a block beyond raw + 1 byte/term") {
    rows("q327_front_coding").foreach { r =>
      val raw = r.getAs[Long]("raw_bytes")
      val front = r.getAs[Long]("front_bytes")
      val n = r.getAs[Long]("n_terms")
      assert(front <= raw + n, s"block ${r.getAs[Long]("rg")}: $front > $raw + $n")
      assert(r.getAs[Long]("saved_bytes") <= raw)
      // id-style names share long prefixes — the win should be substantial
      assert(r.getAs[Long]("savings_ppm") > 500000L,
        s"block ${r.getAs[Long]("rg")}: only ${r.getAs[Long]("savings_ppm")} ppm saved")
    }
  }

  test("q328: red share is a true share and the panel is sorted by it") {
    val r = rows("q328_red_specialists")
    r.foreach { row =>
      assert(row.getAs[Long]("red_qty") <= row.getAs[Long]("total_qty"))
      assert(row.getAs[Long]("red_share_ppm") <= 1000000L)
    }
    val shares = r.map(_.getAs[Long]("red_share_ppm")).toSeq
    assert(shares === shares.sorted.reverse)
  }

  test("q329: bloom sizing is monotone in the fpp target") {
    // tighter fpp ⇒ strictly more bits and more hashes, linear in n_keys
    rows("q329_bloom_sizing").groupBy(_.getAs[String]("source")).foreach {
      case (_, rs) =>
        val byFpp = rs.sortBy(-_.getAs[Long]("fpp_ppm"))
        val bits = byFpp.map(_.getAs[Long]("m_bits"))
        assert(bits.zip(bits.tail).forall { case (a, b) => a < b })
        val k = byFpp.map(_.getAs[Long]("k_hashes"))
        assert(k.zip(k.tail).forall { case (a, b) => a < b })
    }
  }

  test("q330: pruning power discriminates the clustered layout key from random columns") {
    val r = rows("q330_zonemap_power")
    r.foreach { row =>
      val p = row.getAs[Long]("pruning_power_ppm")
      assert(p >= 0L && p <= 1000000L)
    }
    val byCol = r.map(x => x.getAs[String]("col_name") -> x.getAs[Long]("pruning_power_ppm")).toMap
    // o_orderkey IS the layout order — contiguous block ranges, power ~1;
    // this synthetic data stores dates and custkeys randomly, so the audit
    // must report both as unclustered (at sf0.001's single block, exactly 0)
    if (byCol.size == 3 && rows("q330_zonemap_power").head.getAs[Long]("n_blocks") > 1)
      assert(byCol("o_orderkey") > 900000L, s"layout key not detected: $byCol")
    assert(byCol("o_orderdate") < 100000L && byCol("o_custkey") < 100000L,
      s"random columns reported as clustered: $byCol")
  }

  test("q332: PQ audit covers every subspace with a discriminative codebook") {
    val r = rows("q332_pq_codebook")
    assert(r.map(_.getAs[Long]("subspace")).toSeq === (0L to 7L))
    val ns = r.map(_.getAs[Long]("n_vectors")).distinct
    assert(ns.length === 1, s"subspaces saw different corpora: $ns")
    r.foreach { row =>
      val used = row.getAs[Long]("codes_used")
      assert(used >= 2L && used <= 16L, s"degenerate codebook: $used codes")
      assert(row.getAs[Long]("codes_defined") === 16L,
        "codebook short of nCodes — the dense-id precondition is violated")
      assert(used <= row.getAs[Long]("codes_defined"))
      // sum_sqerr_q accumulates in decimal(38,0) (grows with the corpus,
      // past long) but is REPORTED as its digit string — the one
      // representation both engines hash identically (round 8's only red)
      assert(BigDecimal(row.getAs[Long]("avg_sqerr_q")) <=
        BigDecimal(row.getAs[String]("sum_sqerr_q")))
    }
  }

  test("q333: the histogram estimate lands within one bin of the true order statistic") {
    val r = rows("q333_histogram_quantiles")
    assert(r.map(_.getAs[Long]("pct")).toSeq.sorted === Seq(50L, 90L, 99L))
    r.foreach { row =>
      // est and exact share a bin by construction: error ≤ 1/64 of the
      // domain (+ integer-floor slack)
      assert(row.getAs[Long]("err_domain_ppm") <= 16000L,
        s"p${row.getAs[Long]("pct")}: ${row.getAs[Long]("err_domain_ppm")} ppm off")
    }
  }

  test("q334: FK joins with a unique right key make the uniform estimate an upper bound") {
    val r = rows("q334_join_estimate")
    assert(r.length === 3)
    r.foreach { row =>
      // right keys unique ⇒ est = |L|·|R|/|R| = |L| ≥ matched rows
      assert(row.getAs[Long]("est_rows") >= row.getAs[Long]("actual_rows"),
        s"${row.getAs[String]("join_name")}: uniform estimate undershot")
      assert(row.getAs[Long]("actual_rows") > 0L)
    }
  }

  test("q331: the shuffle planner's hot key is real and the byte model is conserved") {
    val r = rows("q331_shuffle_planner")
    assert(r.length === 3)
    val bytes = r.map(_.getAs[Long]("est_bytes")).distinct
    assert(bytes.length === 1, s"per-key byte totals differ: $bytes")
    r.foreach { row =>
      assert(row.getAs[Long]("hot_rows") * row.getAs[Long]("n_keys")
        >= row.getAs[Long]("n_rows"), "hot key below the per-key average")
      assert(row.getAs[Long]("parts_64mib") >= 1L)
    }
  }
}
