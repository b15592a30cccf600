package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, round}

package object ops {
  /** Column by raw name, backtick-quoted so names containing dots (e.g.
    * the reference's "No. of episodes" key) resolve as whole names, not
    * struct-field paths. */
  def qcol(name: String): Column = col(s"`$name`")

  /** Signed-zero-safe round: `round(c, s) + 0.0`. IEEE 754 addition maps
    * `-0.0 + 0.0` to `+0.0`, so a readout whose true value is a tiny
    * negative that rounds to zero emits the SAME bit pattern in every
    * engine. Spark and DuckDB round negative-tiny doubles to
    * differently-signed zeros (`-0.0` vs `0.0`), which value-compares
    * equal but hash-compares different under the driver's bit-level
    * contract — use this for every rounded double readout that can be
    * negative, and mirror `+ 0.0` in the DuckDB oracle SQL. */
  def round0(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)
}
