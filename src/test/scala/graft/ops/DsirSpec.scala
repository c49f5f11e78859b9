package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("target-like documents score higher than target-unlike ones") {
    val w = Dsir.logWeights(docs, docs.where(col("lang") === "en"))
      .join(docs.select("doc_id", "lang"), "doc_id")
    val byLang = w.groupBy("lang")
      .agg(avg(col("logw_micros").cast("double")).as("aw"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the English model should prefer English text over every other
    // language in the pool — the selection signal DSIR exists for
    assert(Seq("fr", "es", "de", "zh").forall(l => byLang("en") > byLang(l)),
      s"en not preferred: $byLang")
  }

  test("featureless and feature-counted documents: n_feats = tokens + bigrams, empty text scores (0, 0)") {
    val tiny = Seq(
      (1L, "alpha beta gamma"),   // 3 unigrams + 2 bigrams = 5
      (2L, "alpha"),              // 1 + 0
      (3L, ""),                   // featureless
      (4L, "   ")                 // whitespace-only — also featureless
    ).toDF("doc_id", "text")
    val w = Dsir.logWeights(tiny, tiny.where(col("doc_id") === 1L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(w(1L)._1 === 5L)
    assert(w(2L)._1 === 1L)
    assert(w(3L) === ((0L, 0L)))
    assert(w(4L) === ((0L, 0L)))
    // every raw doc appears exactly once
    assert(w.keySet === Set(1L, 2L, 3L, 4L))
    // the doc that IS the target scores strictly above the others
    assert(w(1L)._2 > w(2L)._2)
  }

  test("weights are deterministic across runs and independent of partitioning") {
    val a = Dsir.logWeights(docs, docs.where(col("lang") === "en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dsir.logWeights(docs.repartition(13),
        docs.where(col("lang") === "en").repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("selectTopFraction: exact ceil quotas per stratum, deterministic cut, top-ranked kept") {
    val sel = Dsir.selectTopFraction(docs, docs.where(col("lang") === "en"),
      fractionPpm = 250000L)
    val perSource = sel.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum keeps exactly ceil(0.25·n)
    sizes.foreach { case (s, n) =>
      assert(perSource(s) === (n * 250000L + 999999L) / 1000000L,
        s"source $s: ${perSource.get(s)} of $n")
    }
    // kept docs are the weight-top ones: the minimum kept weight in a
    // stratum is >= the maximum dropped weight (ties broken by doc_id)
    val w = Dsir.logWeights(docs, docs.where(col("lang") === "en"))
      .join(docs.select("doc_id", "source"), "doc_id")
    val keptIds = sel.select("doc_id").collect().map(_.getLong(0)).toSet
    val bySource = w.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("logw_micros")))
      .groupBy(_._1)
    bySource.foreach { case (_, rows) =>
      val (kept, dropped) = rows.partition(r => keptIds.contains(r._2))
      if (kept.nonEmpty && dropped.nonEmpty)
        assert(kept.map(_._3).min >= dropped.map(_._3).max)
    }
  }

  test("logWeightsWithin / selectTopFractionWithin: in-pool predicate ≡ the " +
    "two-frame form (incl. null predicate rows), zero target featurize scan") {
    // null lang rows exercise the coalesce(pred, false) flag: a null
    // predicate must behave exactly like where()'s null-drops-row rule
    val tiny = Seq(
      (1L, "alpha beta alpha", "en", "a"),
      (2L, "beta beta gamma", "fr", "a"),
      (3L, "alpha gamma", null.asInstanceOf[String], "b"),
      (4L, "", "en", "b")
    ).toDF("doc_id", "text", "lang", "source")
    val twoFrame = Dsir.logWeights(tiny, tiny.where(col("lang") === "en"))
      .collect().map(_.toSeq).toSet
    val within = Dsir.logWeightsWithin(tiny, col("lang") === "en")
    assert(within.collect().map(_.toSeq).toSet === twoFrame)
    val selTwo = Dsir.selectTopFraction(docs,
        docs.where(col("lang") === "en"), fractionPpm = 250000L)
      .collect().map(_.toSeq).toSet
    val selWithin = Dsir.selectTopFractionWithin(docs,
        col("lang") === "en", fractionPpm = 250000L)
      .collect().map(_.toSeq).toSet
    assert(selWithin === selTwo)
    // the within form folds the target model from the one materialized
    // feature relation: its plan reads NO second text featurize (no
    // Generate/explode anywhere — the only explode ran inside the
    // construction-time checkpoint)
    val gens = within.queryExecution.executedPlan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens.isEmpty, s"target featurize re-executed: $gens")
  }

  test("model joins stay broadcast: no shuffle on the bucket-delta side") {
    val w = Dsir.logWeights(docs, docs.where(col("lang") === "en"))
    val plan = w.queryExecution.executedPlan.toString
    // the ≤buckets-row delta/total relations must reach the scoring
    // join as broadcasts — a sort-merge join there would shuffle the
    // corpus-sized feature relation against a 1024-row table
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }
}
