package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §5).
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit fallback when one key dominates so heavily that even split
  * partitions bottleneck (e.g. a null-ish sentinel key owning 30% of a
  * 100 TB fact table).
  *
  * The fact side gets a random-but-deterministic salt in [0, factor);
  * the dimension side is replicated `factor` times; the join key becomes
  * (key, salt), spreading each hot key over `factor` reducers. Salt is
  * derived by hashing a set of carrier columns, NOT rand() — keeps the
  * operator deterministic and retry-safe (a failed task re-derives the
  * same salt).
  */
object SkewJoin {

  /** inner join `facts` (big, skewed) with `dims` (replicable) on
    * factKey == dimKey, salted `factor` ways. `carriers` are fact
    * columns whose hash spreads rows of the same key (default: all). */
  def saltedJoin(facts: DataFrame, dims: DataFrame,
                 factKey: String, dimKey: String, factor: Int,
                 carriers: Seq[String] = Nil): DataFrame = {
    val carrierCols = (if (carriers.nonEmpty) carriers else facts.columns.toSeq).map(col)
    val salted = facts.withColumn("_salt", pmod(xxhash64(carrierCols: _*), lit(factor)).cast("int"))
    val replicated = dims.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
