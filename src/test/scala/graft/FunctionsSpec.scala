package graft

import graft.analysis.Analyzer
import graft.functions.{GraftExtensions, GraftFunctions}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The native Catalyst analyzer expression: correctness vs the Scala chain,
  * whole-stage codegen participation, and registration through both the
  * runtime registry and the SparkSessionExtensions hook.
  */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("graft_terms matches Analyzer.terms, including edge cases") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val texts = Seq(
      "The Quick-Brown fox", "don't stop", "3.14 foo.bar", "", "the a and",
      "x".repeat(300) + " ok", "spark AND spark")
    val got = texts.toDF("text")
      .selectExpr("graft_terms(text) AS ts")
      .collect().map(_.getSeq[String](0).toSeq)
    val want = texts.map(t => Analyzer.terms(t).toSeq)
    assert(got.toSeq == want)
  }

  test("the expression runs inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // non-literal input so the optimizer can't constant-fold the projection
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "size(graft_terms(text)) AS n")
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    // the '*'-marked Project containing graft_terms sits inside a codegen stage
    assert(codegenStages.exists(_.toString.contains("graft_terms")),
      df.queryExecution.executedPlan.toString)
    // and the codegen'd result agrees with the Scala chain
    val row = df.orderBy("doc_id").limit(1).collect().head
    val text = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(s"doc_id = ${row.getLong(0)}").select("text").collect().head.getString(0)
    assert(row.getInt(1) == Analyzer.terms(text).length)
  }

  test("SparkSessionExtensions injection registers the function") {
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      val r = s2.sql("SELECT graft_terms('The FAST table') AS ts")
        .collect().head.getSeq[String](0)
      assert(r == Seq("fast", "table"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setActiveSession)
      prev.foreach(SparkSession.setDefaultSession)
    }
  }
}
