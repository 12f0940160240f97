package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared argument validation for SQL-registered functions whose `n`
  * argument must be a compile-time constant (the expression burns it
  * into the generated loop, so a per-row column can never work). A
  * non-foldable or non-integral argument used to surface as an
  * unhelpful NPE/ClassCastException from `eval(null).asInstanceOf[Int]`
  * at analysis time; this raises a clear error naming the function and
  * the offending expression instead, mirroring what a
  * checkInputDataTypes failure reads like. */
private[graft] object ConstArgs {

  def int(fn: String, e: Expression): Int = {
    def fail(): Nothing = throw new IllegalArgumentException(
      s"$fn requires a constant integer for its n argument " +
        s"(e.g. $fn(text, 8)); got: ${e.sql}")
    if (!e.foldable) fail()
    e.eval() match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long
          if l.longValue >= Int.MinValue && l.longValue <= Int.MaxValue =>
        l.intValue
      case s: java.lang.Short => s.intValue
      case b: java.lang.Byte => b.intValue
      case _ => fail()
    }
  }
}
