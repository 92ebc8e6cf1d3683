package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.md5Long

/** Deterministic (hash-split) sampling for corpus construction.
  *
  * Training-data pipelines need samples that are REPRODUCIBLE — the
  * same key must land in the same split regardless of run, engine,
  * partitioning, or cluster size — which `rand()`/`df.sample` cannot
  * guarantee. Here membership is a pure function of the row key: the
  * md5-derived 60-bit hash mod 1e6, compared against a
  * parts-per-million rate. Properties that matter at 100 TB:
  *
  *  - a plain filter: no shuffle, no state, stays inside whole-stage
  *    codegen and runs at scan speed;
  *  - rates NEST: the 20% sample is a strict subset of the 50% sample,
  *    so growing a training mix never invalidates earlier work;
  *  - per-stratum rates express mixture weighting (the domain-mix step
  *    of corpus assembly) in one pass over the data.
  */
object Sampling {

  /** Rate denominator: rates are parts-per-million. */
  val Ppm = 1000000L

  /** Demo mixture used by the q48 battery entry (and mirrored in its
    * DuckDB oracle from this same map, so the two cannot drift).
    */
  val DemoRates: Map[String, Long] = Map(
    "de" -> 1000000L, "en" -> 300000L, "es" -> 100000L, "fr" -> 500000L)

  /** Uniform [0, 1e6) bucket from a key — deterministic across engines
    * (DuckDB mirror: cast('0x'||substr(md5(k),1,15) as bigint) %
    * 1000000).
    */
  def hashBucket(key: Column): Column = pmod(md5Long(key.cast("string")), lit(Ppm))

  /** Keep rows whose key hashes under `ppm` parts-per-million. */
  def hashSample(df: DataFrame, key: Column, ppm: Long): DataFrame = {
    require(ppm >= 0 && ppm <= Ppm, s"ppm must be in [0, $Ppm], got $ppm")
    df.filter(hashBucket(key) < ppm)
  }

  /** Stratified deterministic sample: per-stratum ppm rates; strata
    * absent from `rates` (including null) are dropped (rate 0).
    */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Long]): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= Ppm),
      s"rates must be in [0, $Ppm]: $rates")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(0L): Column) {
      case (acc, (s, r)) => when(strata === s, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(key) < rate)
  }
}
