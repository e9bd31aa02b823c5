package org.apache.spark.sql.graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.classic.SparkSession

/** The production deployment path: a cluster admin sets
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` and
  * every session gets the optimizer rule AND the as-of planner strategy
  * without any code-side install() call. This spec drives the extension
  * object through the real SparkSessionExtensions build hooks (what
  * session construction invokes) so a forgotten injection can't ship.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects PowToMultiply and AsOfJoinStrategy") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
    val spark = graft.SparkTestSession.spark.asInstanceOf[SparkSession]
    val rules = e.buildOptimizerRules(spark)
    assert(rules.contains(PowToMultiply),
      s"optimizer rule missing from extension build: $rules")
    val strategies = e.buildPlannerStrategies(spark)
    assert(strategies.contains(AsOfJoinStrategy),
      s"planner strategy missing from extension build: $strategies")
  }

  test("install() is idempotent: repeated calls register each hook once") {
    val spark = graft.SparkTestSession.spark.asInstanceOf[SparkSession]
    GraftOptimizations.install(spark)
    GraftOptimizations.install(spark)
    assert(spark.experimental.extraOptimizations.count(_ == PowToMultiply) == 1)
    assert(spark.experimental.extraStrategies.count(_ == AsOfJoinStrategy) == 1)
  }
}
