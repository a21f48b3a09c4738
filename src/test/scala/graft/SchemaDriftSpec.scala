package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Early-warning canary for generator schema drift: the corpus is
  * regenerated per round and physical types are NOT stable (round 8:
  * `events.ts` flipped from parquet TIMESTAMP(NANOS) to timestamp[us],
  * silently breaking every events gate until diagnosed). This spec loads
  * every table through [[Tables.load]] — the NORMALIZED schema the whole
  * engine programs against — and pins the column names + logical types
  * the operators assume, so a new round's drift fails HERE with the
  * offending column named, not deep inside a gate plan.
  *
  * Pinned loosely on purpose: integral widths (int/long) and
  * timestamp flavors (TIMESTAMP vs TIMESTAMP_NTZ vs DATE) that the
  * operators genuinely tolerate are grouped, so the canary only fires on
  * drift that needs a code response.
  */
class SchemaDriftSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def integral(dt: DataType): Boolean =
    dt == IntegerType || dt == LongType || dt == ShortType
  private def temporal(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || dt == DateType

  private def check(table: String, expect: Map[String, DataType => Boolean]): Unit = {
    val schema = Tables.load(spark, sfDir, table).schema
    val bad = expect.flatMap { case (name, ok) =>
      schema.fields.find(_.name == name) match {
        case None => Some(s"$table.$name MISSING (have: ${schema.fieldNames.mkString(",")})")
        case Some(f) if !ok(f.dataType) =>
          Some(s"$table.$name has unexpected type ${f.dataType.catalogString}")
        case _ => None
      }
    }
    assert(bad.isEmpty, s"generator schema drift — adapt Tables/operators:\n  " +
      bad.mkString("\n  "))
  }

  test("events: ts normalizes to ns-long; core columns hold") {
    // ts MUST normalize to LongType whatever the file ships
    // (Tables.normalizeEventTs) — everything downstream does ns math
    check("events", Map(
      "event_id" -> integral, "ts" -> (_ == LongType), "user_id" -> integral,
      "event_type" -> (_ == StringType), "value" -> (_ == DoubleType),
      "props" -> (_ == StringType)))
  }

  test("documents + embeddings: text/dedup/ANN column contracts hold") {
    check("documents", Map(
      "doc_id" -> integral, "text" -> (_ == StringType),
      "lang" -> (_ == StringType), "source" -> (_ == StringType),
      "n_chars" -> integral))
    check("embeddings", Map(
      "vec_id" -> integral,
      "embedding" -> {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      },
      "label" -> integral))
  }

  test("driver smoke contract: entry() returns rows on sf0.001") {
    // the driver's t1 smoke gate: SparkEntry.entry must yield rows > 0
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("relational star schema: key and date column contracts hold") {
    check("orders", Map(
      "o_orderkey" -> integral, "o_custkey" -> integral,
      "o_totalprice" -> (_ == DoubleType), "o_orderdate" -> temporal))
    check("lineitem", Map(
      "l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_quantity" -> (_ == DoubleType),
      "l_extendedprice" -> (_ == DoubleType), "l_discount" -> (_ == DoubleType),
      "l_returnflag" -> (_ == StringType), "l_shipdate" -> temporal))
    check("customer", Map(
      "c_custkey" -> integral, "c_nationkey" -> integral,
      "c_mktsegment" -> (_ == StringType)))
    check("supplier", Map("s_suppkey" -> integral, "s_nationkey" -> integral))
    check("part", Map("p_partkey" -> integral, "p_type" -> (_ == StringType)))
    check("nation", Map("n_nationkey" -> integral, "n_regionkey" -> integral))
    check("region", Map("r_regionkey" -> integral, "r_name" -> (_ == StringType)))
  }
}
