package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{AbstractDataType, LongType}

/** Analysis-time "one bigint argument" contract, behind the shim
  * because `AbstractDataType` is `private[sql]` in Spark 4: mistyped
  * arguments fail analysis with a readable message (or widen, for
  * int/smallint) instead of ClassCastException-ing mid-job.
  */
trait LongInput extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
}
