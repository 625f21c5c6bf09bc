package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Every gate output must be SCALAR-typed: the correctness driver's
  * pandas canonicalizer sorts rows by every column and cannot hash or
  * sort an array/struct/map cell (round 4's x47 shipped a raw
  * `array<double>` column and turned its gate row into a driver error).
  * Vector-valued results are pinned into scalars instead — md5 over a
  * fixed-format rendering plus norm/min/max (the x28/x47 convention).
  *
  * This builds every `SparkEntry.queries` frame at sf0.001 and checks
  * the SCHEMA only — dtype drift against the DuckDB oracle (the other
  * driver-comparator hazard: HUGEINT→float64 promotion, as in round
  * 4's x22) is checked value-for-value by tools/compare.py's strict
  * dtype gate, which cannot be expressed Spark-side. */
class GateSchemaSpec extends SparkSpec {

  test("no SparkEntry.queries output carries an array/struct/map/decimal column") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema = fn(spark, sf).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[MapType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
        // DECIMAL is scalar but lands as pandas `object` while DuckDB's
        // HUGEINT arrives as float64 — guaranteed dtype drift at the
        // driver's hash. Intermediates may be decimal (x45's moments,
        // x50/x52's cross-products); OUTPUTS return to BIGINT/DOUBLE
        // via integral div or an explicit cast.
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
          s"$name.${f.name}: ${f.dataType.simpleString} (decimal output — dtype drift)"
      }
    }
    assert(bad.isEmpty,
      s"gate-hazard columns (driver comparator would err/drift):\n  " +
        bad.mkString("\n  "))
  }

  test("oracle keys match query keys; rows-only set is the declared one") {
    // an oracle without a query is a typo'd key (the driver would
    // record a phantom failure); a query without an oracle must be a
    // CONSCIOUS rows-only declaration, not a forgotten oracle — every
    // addition below needs its exactness pinned by a spec instead
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty, s"oracle SQL without a query: $orphanOracles")
    val declaredRowsOnly = Set(
      "x6_ann_ivf",          // approximate ANN; full-probe ≡ exact pinned
      "x33_bpe_merges",      // per-round argmax isn't one SQL query; hand-worked spec
      "x37_bpe_encode",      // same; applyMerge-composition spec
      "x41_semantic_dedup",  // approximate; cells=1 ≡ brute force pinned
      "x42_sketch_distinct", // cross-engine sketches differ; 5% bound pinned
      "x43_sketch_overlap",  // same; exact-mode ≡ x38 pinned
      "x47_random_project",  // approximate; determinism/geometry pinned
      "x49_fertility",       // composes the x33 merge table; hand-applied spec
      "x71_pq_topk",         // approximate; codebook-saturating ≡ exact pinned
      "x106_mmr_diversify")  // per-round argmax isn't one SQL query; hand-worked spec
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual == declaredRowsOnly,
      s"rows-only drift: undeclared ${actual -- declaredRowsOnly}, " +
        s"stale ${declaredRowsOnly -- actual}")
  }
}
