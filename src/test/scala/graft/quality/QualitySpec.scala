package graft.quality

import graft.SparkSpec
import graft.operators.CompareDatasets

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("expectations: between + exists, nulls not unexpected, single pass") {
    val df = Seq(
      (Some(60), "a"), (Some(200), "b"), (None, "c"), (Some(75), "d")
    ).toDF("AverageHeartRate", "k")
    val results = Expectations.run(df, Seq(
      Expectations.Between("AverageHeartRate", 40, 180),
      Expectations.ColumnExists("AverageHeartRate"),
      Expectations.ColumnExists("Missing"),
      Expectations.Between("AlsoMissing", 0, 1)))
    val byCol = results.map(r => (r.column, r)).toMap
    assert(byCol("AverageHeartRate").unexpectedCount === 1) // only 200 out of range
    assert(!byCol("AverageHeartRate").passed)
    assert(byCol("Missing").unexpectedCount === 1 && !byCol("Missing").passed)
    assert(!byCol("AlsoMissing").passed)
  }

  test("validation results render to data-docs artifacts") {
    val results = Seq(
      Expectations.Result("expect_column_values_to_be_between", "HeartRate", 0L, passed = true),
      Expectations.Result("expect_column_values_to_be_between", "Steps<xss>", 7L, passed = false),
      Expectations.Result("expect_column_to_exist", "Missing", 1L, passed = false))
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_").toString
    val (jsonPath, htmlPath) = Expectations.renderDocs(
      spark, "hk_suite", "run_2023_05_12", results, dir)

    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(s"file://$jsonPath").getPath)))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(root.get("suite").asText() === "hk_suite")
    assert(!root.get("success").asBoolean())
    assert(root.get("results").size() === 3)
    assert(root.get("results").get(1).get("unexpected_count").asLong() === 7L)

    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(s"file://$htmlPath").getPath)))
    assert(html.contains("1/3 expectations"))
    assert(html.contains("Steps&lt;xss&gt;")) // column names are escaped
    assert(html.contains("FAIL"))
  }

  test("compare: summary counts and mismatch rows") {
    val left = Seq((1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)).toDF("k", "s", "v")
    val right = Seq((1, "x", 10.0), (2, "y", 21.0), (4, "w", 40.0)).toDF("k", "s", "v")
    val sum = CompareDatasets.summary(left, right, Seq("k"), Seq("s", "v")).collect().head
    assert(sum.getAs[Long]("n_common") === 2)
    assert(sum.getAs[Long]("n_left_only") === 1)
    assert(sum.getAs[Long]("n_right_only") === 1)
    assert(sum.getAs[Long]("n_mismatch_v") === 1)
    assert(sum.getAs[Long]("n_mismatch_s") === 0)

    val rows = CompareDatasets.mismatchRows(left, right, Seq("k"), Seq("s", "v"))
      .select("k").as[Int].collect()
    assert(rows.toSeq === Seq(2))
  }

  test("compare summary: dup keys pair positionally, null keys still counted") {
    val left = Seq((Option(1), "a"), (Option(1), "b"), (Option.empty[Int], "n"))
      .toDF("k", "v")
    val right = Seq((Option(1), "a"), (Option(1), "b"))
      .toDF("k", "v")
    val s = CompareDatasets.summary(left, right, Seq("k"), Seq("v")).collect().head
    assert(s.getAs[Long]("n_common") === 2)   // 2 pairs, not 4
    assert(s.getAs[Long]("n_left_only") === 1) // the null-keyed row
    assert(s.getAs[Long]("n_right_only") === 0)
    assert(s.getAs[Long]("n_mismatch_v") === 0) // positional pairing aligns a-a, b-b
  }

  test("compare mismatch rows: dup keys pair positionally like the summary") {
    // key 1 twice per side: positional pairing aligns (a,a) and (b,c) —
    // ONE mismatch pair; an inner join would emit 4 combos (3 mismatched)
    val left = Seq((1, "a"), (1, "b"), (2, "x")).toDF("k", "v")
    val right = Seq((1, "a"), (1, "c"), (2, "x")).toDF("k", "v")
    val s = CompareDatasets.summary(left, right, Seq("k"), Seq("v")).collect().head
    assert(s.getAs[Long]("n_mismatch_v") === 1)
    val rows = CompareDatasets.mismatchRows(left, right, Seq("k"), Seq("v")).collect()
    assert(rows.length === 1 && rows.head.getAs[Int]("k") === 1)
  }

  test("compare mismatch rows: empty compare-column list yields no rows, not a crash") {
    val left = Seq(1, 2).toDF("k")
    val right = Seq(2, 3).toDF("k")
    val rows = CompareDatasets.mismatchRows(left, right, Seq("k"), Seq.empty)
    assert(rows.columns.toSeq === Seq("k") && rows.count() === 0)
  }

  test("compare summary + mismatch rows equal a brute-force positional-pairing reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](gen: Gen[A], seed: Long): A =
      gen.apply(Gen.Parameters.default, Seed(seed)).get
    // few distinct keys/values to force duplicate keys and ties; ~10% null keys
    val rowGen = Gen.zip(
      Gen.frequency(9 -> Gen.choose(0, 4).map(Option(_)), 1 -> Gen.const(Option.empty[Int])),
      Gen.choose(0, 2).map(v => s"v$v"))
    (1L to 8L).foreach { seed =>
      val l = sample(Gen.listOfN(20, rowGen), seed)
      val r = sample(Gen.listOfN(20, rowGen), seed + 50)
      // reference: null keys never pair; per key, sort each side by the
      // compared value and zip positionally (datacompy cumcount)
      def grouped(rows: Seq[(Option[Int], String)]) =
        rows.filter(_._1.isDefined).groupBy(_._1.get)
          .map { case (k, rs) => k -> rs.map(_._2).sorted }
      val (lg, rg) = (grouped(l), grouped(r))
      val pairs = (lg.keySet ++ rg.keySet).toSeq.flatMap { k =>
        val (a, b) = (lg.getOrElse(k, Nil), rg.getOrElse(k, Nil))
        a.zip(b).map { case (x, y) => (k, x, y) }
      }
      val expCommon = pairs.size.toLong
      val expLeftOnly = l.size - pairs.size // unpaired incl. null keys
      val expRightOnly = r.size - pairs.size
      val expMismatch = pairs.count { case (_, x, y) => x != y }.toLong
      val expMismatchKeys = pairs.collect { case (k, x, y) if x != y => k }
        .groupBy(identity).view.mapValues(_.size).toMap

      val left = l.toDF("k", "v")
      val right = r.toDF("k", "v")
      val s = CompareDatasets.summary(left, right, Seq("k"), Seq("v")).collect().head
      assert(s.getAs[Long]("n_common") === expCommon, s"seed=$seed common")
      assert(s.getAs[Long]("n_left_only") === expLeftOnly, s"seed=$seed left")
      assert(s.getAs[Long]("n_right_only") === expRightOnly, s"seed=$seed right")
      assert(s.getAs[Long]("n_mismatch_v") === expMismatch, s"seed=$seed mismatch")
      val gotKeys = CompareDatasets.mismatchRows(left, right, Seq("k"), Seq("v"))
        .collect().map(_.getAs[Int]("k")).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(gotKeys === expMismatchKeys, s"seed=$seed mismatch rows")
    }
  }

  test("compare summary works when sides share only the key columns") {
    val left = Seq(1, 2, 3, 3).toDF("k")
    val right = Seq(2, 3, 4).toDF("k")
    val s = CompareDatasets.summary(left, right, Seq("k"), Seq.empty).collect().head
    assert(s.getAs[Long]("n_common") === 2)
    assert(s.getAs[Long]("n_left_only") === 2) // 1 and the second 3
    assert(s.getAs[Long]("n_right_only") === 1)
  }

  test("compare: duplicate key detection and column diff") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    assert(CompareDatasets.duplicateKeyRows(df, Seq("k")).count() === 2)
    val cd = CompareDatasets.columnDiff(
      Seq((1, "a")).toDF("k", "v1"), Seq((1, "a")).toDF("k", "v2"))
    assert(cd.common === Seq("k") && cd.onlyLeft === Seq("v1") && cd.onlyRight === Seq("v2"))
  }

  test("full compare report renders sections and writes row CSVs") {
    import graft.operators.CompareReport
    val left = Seq((1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)).toDF("k", "s", "v")
    val right = Seq((1, "x", 10.0), (2, "y", 21.0), (4, "w", 40.0)).toDF("k", "s", "v")
    val rep = CompareReport.build(left, right, Seq("k"))
    assert(rep.summaryText.contains("Rows in common: 2"))
    assert(rep.summaryText.contains("Rows only in staging: 1"))
    assert(rep.leftOnlyRows.count() === 1 && rep.rightOnlyRows.count() === 1)
    val out = java.nio.file.Files.createTempDirectory("graft_rep_").toString
    CompareReport.write(rep, out)
    assert(new java.io.File(s"$out/comparison_report.txt").exists())
    assert(spark.read.option("header", "true").csv(s"$out/rows_with_diffs").count() === 1)
  }

  test("exports filter builds OR-of-cohort-date predicates") {
    val df = Seq(
      ("adults_v1", "2023-05-12"), ("adults_v1", "2023-05-13"),
      ("pediatric_v1", "2023-05-12")).toDF("cohort", "export_end_date")
    val f = CompareDatasets.exportsFilter(Map(
      "adults_v1" -> Seq("2023-05-12"), "pediatric_v1" -> Seq("2023-05-12")))
    assert(df.where(f).count() === 2)
  }

  test("expectation suites load from the GE-style JSON config shape") {
    val suites = Expectations.fromJson(
      """{"fitbitdailydata": {"expectations": [
        |  {"expectation_type": "expect_column_values_to_be_between",
        |   "kwargs": {"column": "Steps", "min_value": 0, "max_value": 100000}},
        |  {"expectation_type": "expect_column_to_exist",
        |   "kwargs": {"column": "ParticipantIdentifier"}}
        |]}}""".stripMargin)
    assert(suites("fitbitdailydata") === Seq(
      Expectations.Between("Steps", 0.0, 100000.0),
      Expectations.ColumnExists("ParticipantIdentifier")))
    // an unknown rule type must fail loudly, not validate nothing
    intercept[IllegalArgumentException] {
      Expectations.fromJson(
        """{"t": {"expectations": [
          |  {"expectation_type": "expect_table_row_count_to_equal",
          |   "kwargs": {"value": 1}}]}}""".stripMargin)
    }
    // parsed rules drive the one-pass engine
    val df = Seq(5.0, 150000.0).toDF("Steps")
    val results = Expectations.run(df, suites("fitbitdailydata")
      .filter(_.column == "Steps"))
    assert(results.head.unexpectedCount === 1 && !results.head.passed)
  }

  test("DataCard: KLL quantiles track the exact card; exact mode available behind the flag") {
    val docs = (1 to 300).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val words = (1 to (i % 37) + 3).map(j => s"w${(i * 31 + j) % 97}")
      (i.toLong, lang, words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))

    val exact = DataCard.build(docs, "lang", "text", "n_chars",
        exactPercentiles = true)
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    val approx = DataCard.build(docs, "lang", "text", "n_chars")
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap

    assert(exact.keySet === Set("en", "fr"))
    for (s <- exact.keySet) {
      // exact columns identical between the two modes
      assert(approx(s).getAs[Long]("n_docs") === exact(s).getAs[Long]("n_docs"))
      assert(approx(s).getAs[Long]("n_tokens") === exact(s).getAs[Long]("n_tokens"))
      assert(approx(s).getAs[Long]("dup_docs") === exact(s).getAs[Long]("dup_docs"))
      // 150 docs per stratum fit inside the k=200 sketch, so the KLL
      // quantile is an exact order statistic — allow only the one-rank
      // gap between interpolation (exact percentile) and selection (KLL)
      val medA = approx(s).getAs[Double]("median_tokens")
      val medE = exact(s).getAs[Double]("median_tokens")
      assert(math.abs(medA - medE) <= 1.0, s"median $s: kll=$medA exact=$medE")
      val p90A = approx(s).getAs[Double]("p90_chars")
      val p90E = exact(s).getAs[Double]("p90_chars")
      assert(math.abs(p90A - p90E) <= 20.0, s"p90 $s: kll=$p90A exact=$p90E")
    }
  }

  test("DataCard counts null-text docs instead of silently dropping them") {
    // md5(null) is null and a non-null-safe join would drop the row from
    // every stat; null coalesces to the empty document
    val docs = Seq((1L, "en", "some words here", 15),
      (2L, "en", null.asInstanceOf[String], 0),
      (3L, "en", null.asInstanceOf[String], 0)).toDF("doc_id", "lang", "text", "n_chars")
    val card = DataCard.build(docs, "lang", "text", "n_chars").collect().head
    assert(card.getAs[Long]("n_docs") === 3L,
      s"null-text docs dropped from the card: $card")
    // the two null docs fingerprint identically → both are dup_docs
    assert(card.getAs[Long]("dup_docs") === 2L, card)
  }

  test("betweenReport: two rules on one column; empty rule list") {
    val df = Seq((50, "a"), (250, "b")).toDF("hr", "k")
    val rep = Expectations.betweenReport(df, Seq(
        Expectations.Between("hr", 30, 200), Expectations.Between("hr", 60, 300)))
      .select("column_name", "lo", "unexpected_count")
      .as[(String, Double, Long)].collect().toSet
    assert(rep === Set(("hr", 30.0, 1L), ("hr", 60.0, 1L)), rep)
    assert(Expectations.betweenReport(df, Nil).count() === 0L)
  }
}
