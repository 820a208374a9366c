package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{Binom, BinomSf}

/** The native Catalyst binom_sf expression: parity with the UDF/kernel and
  * participation in whole-stage codegen (SURVEY.md §4.2 upgrade path).
  */
class ExpressionSpec extends AnyFunSuite with Matchers with SparkTest {
  test("binom_sf expression ≡ Scala kernel over a parameter sweep") {
    import spark.implicits._
    BinomSf.register(spark)
    val cases = for {
      k <- Seq(0L, 1L, 5L, 20L, 100L)
      n <- Seq(10L, 100L, 100000L)
      p <- Seq(1e-9, 1e-4, 0.05, 0.5, 0.999)
    } yield (k, n, p)
    val df = cases.toDF("k", "n", "p")
      .withColumn("e", expr("binom_sf(k, n, p)"))
      .withColumn("u", Binom.sfUdf(col("k"), col("n"), col("p")))
    df.collect().foreach { r =>
      val (k, n, p) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      r.getDouble(3) shouldBe Binom.sf(k, n, p)
      r.getDouble(4) shouldBe r.getDouble(3)
    }
  }

  test("binom_sf runs inside WholeStageCodegen (no UDF dispatch)") {
    BinomSf.register(spark)
    // a literal-only frame constant-folds to LocalTableScan (also proof of
    // native-expression status); use a real scan to see the codegen span
    val df = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(expr("binom_sf(cast(l_quantity as bigint), 100L, 0.1D)")
        .as("sf"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in simpleString; the
    // binom_sf projection must sit inside one
    plan should include("*(1) Project [binom_sf")
    df.count() shouldBe 6000
    // spot value parity against the kernel
    val q1 = df.first().getDouble(0)
    q1 should be >= 0.0
    q1 should be <= 1.0
  }

  test("GraftExtensions injects binom_sf at session build") {
    // the extension class is instantiable and registers without error
    val ext = new graft.functions.GraftExtensions()
    val e = new org.apache.spark.sql.SparkSessionExtensions
    noException should be thrownBy ext(e)
  }
}
