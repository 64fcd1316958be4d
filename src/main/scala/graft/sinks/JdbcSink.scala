package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}

/** Templated SQL DML sink — the reference's per-row `sql_query % row`
  * load (cubicerpetl/cubicerpetl.py:466-492): arbitrary INSERT/UPDATE/
  * MERGE statements with row values interpolated. The reference
  * interpolates with Python `%` formatting (SQL injection by design,
  * SURVEY.md §7.4) and executes ONE statement per row over one
  * connection.
  *
  * Engine form: `?` placeholders bound from named columns via
  * `PreparedStatement` (no injection), executed in batches per partition —
  * connections scale with partitions, statements batch per
  * `batchSize`, and the driver never sees the rows.
  */
object JdbcSink {

  def writeTemplated(
      df: DataFrame,
      url: String,
      sql: String,
      cols: Seq[String],
      batchSize: Int = 1000,
      props: Map[String, String] = Map.empty): Unit = {
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val p = new java.util.Properties()
        props.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = DriverManager.getConnection(url, p)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          try {
            var n = 0
            rows.foreach { r =>
              cols.zipWithIndex.foreach { case (c, i) => st.setObject(i + 1, r.getAs[Any](c)) }
              st.addBatch()
              n += 1
              if (n % batchSize == 0) st.executeBatch()
            }
            st.executeBatch()
            conn.commit()
          } finally st.close()
        } finally conn.close()
      }
    }
  }
}
