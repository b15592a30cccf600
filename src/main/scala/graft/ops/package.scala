package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object ops {
  /** Column by raw name, backtick-quoted so names containing dots (e.g.
    * the reference's "No. of episodes" key) resolve as whole names, not
    * struct-field paths. */
  def qcol(name: String): Column = col(s"`$name`")
}
