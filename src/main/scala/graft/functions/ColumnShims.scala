package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Column-API entry points for expressions used across operators. */
object ColumnShims {
  def countTokens(c: Column): Column =
    ColumnBridge.column(CountTokens(ColumnBridge.expression(c)))
}
