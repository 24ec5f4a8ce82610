package graft.dev

object CountQ {
  def main(a: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println("rows-only (no oracle): " + (q -- o).toSeq.sorted.mkString(","))
    println("oracle-without-query: " + (o -- q).toSeq.sorted.mkString(","))
  }
}
