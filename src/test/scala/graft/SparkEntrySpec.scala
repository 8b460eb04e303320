package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the things that would silently weaken the
  * correctness gate if a future change got them wrong. */
class SparkEntrySpec extends AnyFunSuite {

  test("query names are unique (maps would silently collapse duplicates)") {
    val names = SparkEntry.registered.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct)}")
  }

  /** Queries allowed to ship rows-only (no DuckDB oracle). Empty today:
    * q31 got a FLOAT4-replayed oracle in round 3. Add a name here ONLY
    * with a written justification — this guard exists so a future
    * rows-only query can't slip in silently. */
  private val rowsOnlyAllowlist: Set[String] = Set.empty

  test("205 queries registered, every one oracle-checked unless allowlisted") {
    assert(SparkEntry.queries.size == 205)
    val withoutOracle = SparkEntry.registered.filter(_.oracle.isEmpty).map(_.name)
    assert(withoutOracle.toSet == rowsOnlyAllowlist,
      s"rows-only queries not in allowlist: ${withoutOracle.toSet -- rowsOnlyAllowlist}")
  }

  test("oracle keys are exactly the oracle-bearing query names") {
    assert(SparkEntry.oracleSql.keySet ==
      SparkEntry.registered.filter(_.oracle.isDefined).map(_.name).toSet)
  }

  test("query names follow the qNN_ naming scheme, numbered contiguously") {
    val nums = SparkEntry.registered.map(_.name)
      .map(n => n.split("_")(0).drop(1).toInt).sorted
    assert(nums == (1 to 205))
  }
}
