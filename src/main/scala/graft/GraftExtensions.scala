package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{GraftInternals, SparkSession, SparkSessionExtensions}

import graft.expressions.{ArrayDot, PolyHash, StripAccents}

/** SQL-surface registration of graft's native expressions, so
  * `spark.sql("SELECT graft_strip_accents(name) ...")` works next to
  * the Column API:
  *
  *  - cluster deployments: `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - existing sessions (tests, notebooks): `GraftFunctions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name)

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_strip_accents", info("graft_strip_accents", "NFKD accent strip"),
      (es: Seq[Expression]) => StripAccents(es.head)),
    ("graft_poly_hash", info("graft_poly_hash", "portable polynomial hash"),
      (es: Seq[Expression]) => PolyHash(es.head)),
    ("graft_array_dot", info("graft_array_dot", "float-array dot product"),
      (es: Seq[Expression]) => ArrayDot(es.head, es(1))))

  /** Register into an already-built session (temp-function registry). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      GraftInternals.registerFunction(spark, name, builder)
    }
}
