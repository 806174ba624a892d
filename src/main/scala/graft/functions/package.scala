package graft

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, IntegralDivide, ShiftLeft, ShiftRight}

/** Column helpers that need the Catalyst bridge (see GraftBridge). */
package object functions {
  def toExpr(c: Column): Expression = GraftBridge.expression(c)
  def toCol(e: Expression): Column = GraftBridge.column(e)

  /** Exact integer division (SQL `div`) — `a / b` on Columns is
    * double division, which corrupts int64 nanosecond epochs
    * (> 2^53). */
  def longDiv(a: Column, b: Column): Column = toCol(IntegralDivide(toExpr(a), toExpr(b)))

  /** Bit shifts with a Column shift amount (functions.shiftleft/
    * shiftright only take Int literals — useless inside lambdas). */
  def shiftL(v: Column, n: Column): Column = toCol(ShiftLeft(toExpr(v), toExpr(n)))
  def shiftR(v: Column, n: Column): Column = toCol(ShiftRight(toExpr(v), toExpr(n)))
}
