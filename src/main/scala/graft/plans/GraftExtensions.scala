package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions wiring for graft's custom Catalyst surface.
  * Function injections are added here as native Expressions land
  * (SURVEY §2e); keeping registration centralized means SQL users and
  * the DataFrame API see the same functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctionRegistry.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder))
    }
  }
}

/** Central list of (name, ExpressionInfo, builder) for SQL registration. */
object GraftFunctionRegistry {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  type Builder = Seq[Expression] => Expression

  def registrations: Seq[(String, ExpressionInfo, Builder)] = Seq.empty
}
