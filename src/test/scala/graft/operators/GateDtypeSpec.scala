package graft.operators

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.types._

/** Driver-gate dtype contract (the round-8 lesson): the driver hashes
  * query outputs through pandas, which (a) renders DuckDB DECIMAL as
  * float64 while Spark parquet decimal stays `Decimal` objects — a hash
  * mismatch even when every value is identical (q261/q262), and (b)
  * crashes `sort_values` outright on array/map/struct cells
  * (`unhashable type: numpy.ndarray`, q264). So every oracle-gated
  * query must present ONLY driver-hashable scalar columns; operators
  * keep richer internal types (DECIMAL(38,0) exactness, id arrays) and
  * narrow at the query seam behind loud overflow guards.
  *
  * This spec pins that contract over the full `SparkEntry.queries`
  * registry so the class of regression that cost round 8 its green
  * board cannot ship again. `tools/check_oracle.py` enforces the same
  * envelope on the oracle side.
  */
class GateDtypeSpec extends SparkSpec {

  private def hashable(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _: FloatType | _: DoubleType => true
    case _: StringType | _: BooleanType => true
    case _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false // DecimalType, ArrayType, MapType, StructType, BinaryType
  }

  test("every gated query presents only driver-hashable scalar columns") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, sfDir).schema
        schema.fields.collect {
          case f if !hashable(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(bad.isEmpty,
      s"driver-unhashable output columns (pandas hash layer):\n  " +
        bad.mkString("\n  "))
  }
}
