package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operator: the Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle for the driver's differential check.
  *
  * This generalizes the reference's test harness — a CPU scalar oracle per
  * GPU kernel with an element-wise compare (stockify.cu:248-260 and nine
  * siblings) — replacing the hand-rolled oracle with an independent engine
  * (DuckDB) over the same Parquet tables.
  *
  * Conventions that make the differential check deterministic:
  *   - every computed/aggregated column is aliased identically in the Spark
  *     plan and the oracle SQL;
  *   - every query ends in a total ORDER BY over its output keys;
  *   - floating-point aggregates are rounded (2-6 digits) on BOTH sides so
  *     accumulation-order differences cannot flip the hash;
  *   - timestamps leave the engine as DATE or epoch BIGINT, never raw
  *     timestamps, to dodge precision/timezone representation drift.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  require(name.matches("[a-z0-9_]+"), s"query name must be snake_case: $name")
}

object QueryDef {
  /** Query with a full DuckDB oracle (strong hash check). */
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  /** Query without an oracle (driver records a weaker rows-only check);
    * used for approximate operators (HLL, ANN) whose exact output is
    * engine-specific. Pair each with a ScalaTest asserting quality (e.g.
    * ANN recall vs brute force). */
  def unoracled(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
