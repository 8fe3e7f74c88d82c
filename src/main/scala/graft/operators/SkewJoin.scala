package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys. AQE's skew-join handling covers
 * sort-merge joins at runtime; salting is the explicit, planable
 * alternative when one hot key would otherwise pin a single task at
 * the 100 TB design point:
 *
 *  - left side: deterministic salt in [0, n) derived by hashing the
 *    whole row (xxhash64 — reproducible, no RNG state on executors);
 *  - right side: exploded n× with every salt value;
 *  - join on (key, salt) → the hot key's rows spread over n tasks.
 *
 * Result is exactly the plain inner equi-join (asserted by the
 * spec). Right-side replication costs n×|R| rows, so use it when
 * |R| is the smaller relation and the skew lives in |L|.
 */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    val lSalted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val rSalted = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    lSalted.join(rSalted,
        lSalted(leftKey) === rSalted(rightKey) && lSalted("_salt") === rSalted("_salt"))
      .drop("_salt")
  }

  /** Heavy-hitter keys by approximate frequency — pick salting targets without a full pass. */
  def hotKeys(df: DataFrame, key: Column, minCount: Long): DataFrame =
    df.groupBy(key.as("key")).agg(count("*").as("n")).filter(col("n") >= minCount)
}
