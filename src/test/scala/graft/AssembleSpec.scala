package graft

import org.apache.spark.sql.functions._

import graft.ext.Assemble

/** Semantics of the corpus-assembly operators (split/mix/pack) — the
  * oracle gate pins cross-engine equality; these pin the properties the
  * fixture hash can't distinguish (determinism, co-travel, whitelist
  * behavior, packing arithmetic). */
class AssembleSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("hashSplit: content-keyed (dups co-travel), deterministic, ~900/50/50 on the fixture") {
    val d = docsDf((1L, "same text", "en"), (2L, "same text", "en"), (3L, "other", "en"))
    val by = Assemble.hashSplit(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(by(1L) == by(2L), "identical texts must land in the same split")

    val f = spark.read.parquet(s"$sf/documents.parquet")
    val counts = Assemble.hashSplit(f).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(counts.keySet == Set("train", "val", "test"), s"got $counts")
    // 500 docs at 90%: expect ~450; allow wide tolerance (binomial)
    assert(counts("train") > (n * 0.8).toLong && counts("train") < (n * 0.97).toLong,
      s"train fraction off: $counts")
    // re-running reproduces the exact assignment (no RNG, no rowid)
    val again = Assemble.hashSplit(f).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == Assemble.hashSplit(f.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet,
      "assignment must survive re-partitioning")
  }

  test("mixSample: weight 1 keeps all, absent stratum drops all, 1/2 keeps a strict subset") {
    val rows = (1L to 200L).map(i => (i, s"text number $i with content", if (i % 2 == 0) "en" else "de"))
    val d = docsDf(rows: _*)
    val kept = Assemble.mixSample(d, Map("en" -> ((1, 1)), "de" -> ((1, 2))))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (en, de) = (kept.count(_._2 == "en"), kept.count(_._2 == "de"))
    assert(en == 100, s"weight 1/1 must keep every en doc, kept $en")
    assert(de > 0 && de < 100, s"weight 1/2 must keep a strict subset of de, kept $de")
    val noFr = Assemble.mixSample(d, Map("fr" -> ((1, 1))))
    assert(noFr.count() == 0, "strata missing from the whitelist are dropped")
  }

  test("packBudget: exclusive-prefix binning, shard-local sequence indexes") {
    // 6 docs x 10 tokens, one shard, budget 25 -> prefixes 0,10,20,30,40,50
    val d = docsDf((1L to 6L).map(i =>
      (i, (1 to 10).map(j => s"d${i}w$j").mkString(" "), "en")): _*)
    val r = Assemble.packBudget(d, budgetTokens = 25, shards = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 2L), s"got $r")

    // fixture, many shards: every non-empty shard starts at seq 0 and
    // seq_idx is non-decreasing in doc_id order within a shard
    val f = spark.read.parquet(s"$sf/documents.parquet")
    val packed = Assemble.packBudget(f).collect()
      .map(x => (x.getLong(1), x.getLong(0), x.getLong(3)))
    packed.groupBy(_._1).foreach { case (shard, xs) =>
      val seqs = xs.sortBy(_._2).map(_._3)
      assert(seqs.head == 0L, s"shard $shard does not start at seq 0")
      assert(seqs.zip(seqs.tail).forall { case (a, b) => a <= b },
        s"shard $shard seq_idx not monotone")
    }
  }
}
