package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registration invariants of the driver contract — cheap, no Spark. */
class RegistrySpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("lifecycle bench family names registered queries only, and is a strict subset") {
    val unknown = SparkEntry.lifecycleQueries -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"lifecycleQueries names unregistered queries: $unknown")
    assert(SparkEntry.lifecycleQueries.nonEmpty &&
      SparkEntry.lifecycleQueries.size < SparkEntry.queries.size,
      "the engine family must be non-empty too")
  }
}
