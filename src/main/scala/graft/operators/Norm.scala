package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Shared oracle-hash normalization. */
private[operators] object Norm {

  /** Round to 4 decimals AND normalize negative zero: a tiny negative
    * value (|v| < 5e-5, e.g. a near-null slope or z-score) rounds to
    * -0.0 in DuckDB but +0.0 in Spark (whose Round goes through
    * BigDecimal, which has no signed zero). The two compare equal yet
    * hash differently byte-wise — `+ 0.0` collapses both sides to
    * +0.0 (IEEE: -0.0 + 0.0 = +0.0; every other value, NaN included,
    * is unchanged). Oracle SQL mirrors this by appending `+ 0`. */
  def r4(c: Column): Column = round(c, 4) + lit(0.0)
}
