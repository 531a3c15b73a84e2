package graft.data

import org.apache.spark.sql.Row

/** Row → Array[Double] projector shared by the training and scoring
  * paths (kept a standalone object so RDD closures capture only the
  * column list, never an engine instance). */
object RowVec {

  def of(names: Seq[String]): Row => Array[Double] = {
    val n = names.length
    val namesArr = names.toArray
    row => {
      val in = new Array[Double](n)
      var i = 0
      while (i < n) {
        in(i) = row.get(i) match {
          case d: java.lang.Double => d.doubleValue()
          case f: java.lang.Float => f.toDouble
          case l2: java.lang.Long => l2.toDouble
          case i2: java.lang.Integer => i2.toDouble
          case other => throw new IllegalArgumentException(
            s"non-numeric input ${namesArr(i)}: $other")
        }
        i += 1
      }
      in
    }
  }
}
