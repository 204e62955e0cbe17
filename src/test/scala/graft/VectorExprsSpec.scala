package graft

import graft.functions.{FloatDot, VectorFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

class VectorExprsSpec extends SparkSpec {

  private def hofDot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
    aggregate(zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("float_dot equals the HOF ordered fold bit-for-bit on seeded vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f),
        Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("id", "x", "y")
    val got = df.select(col("id"),
        VectorFunctions.floatDot(col("x"), col("y")).as("nat"),
        hofDot(col("x"), col("y")).as("hof"))
      .collect()
    got.foreach { r =>
      // exact equality: same widening, same fold order
      assert(r.getDouble(1) == r.getDouble(2), s"row ${r.getLong(0)}")
    }
  }

  test("float_dot null and empty semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (2L, None, Some(Array(1f))),
      (3L, Some(Array.empty[Float]), Some(Array.empty[Float]))
    ).toDF("id", "x", "y")
    val out = df.select(col("id"),
        VectorFunctions.floatDot(col("x"), col("y")).as("d"))
      .orderBy(col("id")).collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1))
    assert(out(2).getDouble(1) == 0.0)
    // null ELEMENTS propagate to a null result — matching the
    // aggregate(zip_with(...)) lambda twin, whose fold nulls out;
    // ArrayData.getFloat would otherwise silently read a 0.0f (r07
    // review). Exercised through BOTH paths: a local relation
    // (interpreted eval) and a range-based plan (codegen).
    val withNullElem = Seq(
      (1L, Seq(Some(1f), None), Seq(Some(2f), Some(3f))))
      .toDF("id", "x", "y")
      .select(VectorFunctions.floatDot(col("x"), col("y")).as("d"))
      .collect()
    assert(withNullElem(0).isNullAt(0),
      "a null element must null the dot product, not read as 0")
    val codegenNull = spark.range(3)
      .select(
        array(when(col("id") === 1, lit(null).cast("float"))
          .otherwise(col("id").cast("float"))).as("x"),
        array(col("id").cast("float")).as("y"))
      .select(col("x"), VectorFunctions.floatDot(col("x"), col("y")).as("d"))
      .orderBy(col("d").asc_nulls_first)
      .collect()
    assert(codegenNull(0).isNullAt(1), "codegen path must null-propagate too")
    assert(codegenNull.count(_.isNullAt(1)) == 1)
  }

  test("FloatDot is a real codegen expression, not CodegenFallback") {
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[FloatDot]))
    // and the expression lands INSIDE a WholeStageCodegen stage when fed
    // codegen-able inputs (spark.range + array(), not a local Seq which
    // ConvertToLocalRelation folds away, and not transform() whose
    // CodegenFallback lambdas would break the stage around it)
    val df = spark.range(100).select(
      array(Seq.tabulate(8)(i => (col("id") + i).cast("float")): _*).as("x"),
      array(Seq.tabulate(8)(i => (col("id") - i).cast("float")): _*).as("y"))
    val q = df.select(VectorFunctions.floatDot(col("x"), col("y")).as("d"))
    val inStage = q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.toString.contains("float_dot") => w
    }
    assert(inStage.nonEmpty, q.queryExecution.executedPlan.toString)
    // execute it so the generated java actually compiles and runs
    assert(q.agg(sum(col("d"))).collect()(0).getDouble(0) != 0.0)
  }

  test("float_dot is SQL-callable after registration (extensions surface)") {
    VectorFunctions.register(spark)
    import spark.implicits._
    Seq((Array(1f, 2f), Array(10f, 20f))).toDF("x", "y")
      .createOrReplaceTempView("vx")
    val v = spark.sql("SELECT float_dot(x, y) AS d FROM vx").collect()(0).getDouble(0)
    assert(v == 50.0)
  }
}
