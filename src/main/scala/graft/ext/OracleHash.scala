package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE cross-engine 32-bit hash idiom, defined once: hex digits
  * [from, from+8) of md5, parsed as a long. Load-bearing for every
  * hash-compared oracle — the DuckDB side spells the identical value
  * `('0x' || substr(md5(x), from, 8))::BIGINT` — so a change here
  * (widening, different window) must land in every oracle in lockstep;
  * one definition makes a partial change impossible on the Spark side
  * (SimHash, fingerprinting, and corpus-assembly bucketing all resolve
  * to this function). */
private[graft] object OracleHash {

  def md5Hash32(c: Column, from: Int = 1): Column =
    conv(substring(md5(c), from, 8), 16, 10).cast("long")
}
