package graft.core

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max, min}
import org.apache.spark.sql.types.StructType
import scala.collection.mutable

/** Transactional JDBC backend (embedded Derby) behind the `Store` seam —
  * the deployment shape of the reference's EF/Postgres unit-of-work
  * (`EfBlockUnitOfWork.cs:18-247`): data rows, checkpoints, and the
  * commit marker all land through one database, with visibility gated by
  * the marker.
  *
  * Commit protocol (crash-safe without multi-statement DDL coordination):
  *  1. data rows are appended tagged with a `_batch` column via Spark
  *     JDBC (executor-parallel writes — NOT yet visible: readers filter
  *     `_batch <= max(committed)`);
  *  2. one driver-side JDBC transaction replaces the checkpoint rows and
  *     inserts the commit marker `graft_commits(batch_id)` — the atomic
  *     point, exactly the reference's data+state single transaction (T3);
  *  3. a crash between 1 and 2 leaves orphan rows with `_batch` above
  *     the marker — invisible to readers and deleted when the batch id
  *     is retried (idempotent at-least-once replay).
  *
  * Rollback (T5) runs entirely in one transaction: slot-keyed deletes on
  * every user table + checkpoint rewind + marker. Retraction here is
  * sargable via the database's own indexes — the reference's
  * `HasIndex(SpentSlot)` analogue (P9) — so no `compactWith` filter is
  * needed; at 100 TB the segment-log `StateStore` is the scale path and
  * this backend is the serving/ops-database path, mirroring how the
  * reference pairs Postgres with its design's scale notes.
  *
  * SINGLE WRITER REQUIRED (like the reference's Postgres backend behind
  * its advisory lock, T13): the commit-marker primary key stops a racing
  * writer from double-committing a batch id, but the loser's already-
  * appended data rows would share the winner's (now visible) `_batch`
  * tag. `ChainIngest.start`/`Rewind` acquire the store lock; direct
  * GraphRunner embedders must do the same.
  */
final class JdbcStore(val root: String, spark: SparkSession) extends Store {

  private val url = s"jdbc:derby:$root/derby;create=true"
  private val props = new java.util.Properties()

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def q(ident: String): String = "\"" + ident + "\""

  // bootstrap the framework tables
  withConn { c =>
    val existing = listTables(c)
    val st = c.createStatement()
    try {
      if (!existing.contains("graft_commits"))
        st.executeUpdate(
          s"CREATE TABLE ${q("graft_commits")} (batch_id BIGINT PRIMARY KEY)")
      if (!existing.contains("graft_checkpoints"))
        st.executeUpdate(
          s"""CREATE TABLE ${q("graft_checkpoints")}
             | (reducer VARCHAR(128), hash VARCHAR(256), slot BIGINT)"""
            .stripMargin.replace("\n", " "))
      if (!existing.contains("graft_tables"))
        // per-table retraction column, persisted at first write: a later
        // rollback from a subset-registered runner must know every
        // table's slot column (same role as StateStore manifest slotCols)
        st.executeUpdate(
          s"""CREATE TABLE ${q("graft_tables")}
             | (tbl VARCHAR(128) PRIMARY KEY, slot_col VARCHAR(128))"""
            .stripMargin.replace("\n", " "))
    } finally st.close()
  }

  private def storedSlotCols: Map[String, String] = withConn { c =>
    val st = c.createStatement()
    try {
      val rs = st.executeQuery(
        s"SELECT tbl, slot_col FROM ${q("graft_tables")}")
      val acc = mutable.Map[String, String]()
      while (rs.next()) acc += rs.getString(1) -> rs.getString(2)
      acc.toMap
    } finally st.close()
  }

  private def registerSlotCol(table: String, slotCol: String): Unit =
    withConn { c =>
      val st = c.createStatement()
      try st.executeUpdate(
        s"INSERT INTO ${q("graft_tables")} VALUES ('$table', '$slotCol')")
      catch { case _: Exception => () } // already registered
      finally st.close()
    }

  private def listTables(c: Connection): Set[String] = {
    val rs = c.getMetaData.getTables(null, null, "%", Array("TABLE"))
    val names = mutable.Set[String]()
    while (rs.next()) names += rs.getString("TABLE_NAME")
    rs.close()
    names.toSet
  }

  private def userTables(c: Connection): Set[String] =
    listTables(c).filterNot(t =>
      t.startsWith("graft_") || t.startsWith("SYS"))

  def batchId: Long = withConn { c =>
    val st = c.createStatement()
    try {
      val rs = st.executeQuery(
        s"SELECT MAX(batch_id) FROM ${q("graft_commits")}")
      rs.next()
      val v = rs.getLong(1)
      if (rs.wasNull()) -1L else v
    } finally st.close()
  }

  def checkpoints: Map[String, Seq[Point]] = withConn { c =>
    val st = c.createStatement()
    try {
      val rs = st.executeQuery(
        s"SELECT reducer, hash, slot FROM ${q("graft_checkpoints")}")
      val acc = mutable.Map[String, mutable.ArrayBuffer[Point]]()
      while (rs.next())
        acc.getOrElseUpdate(rs.getString(1), mutable.ArrayBuffer.empty) +=
          Point(rs.getString(2), rs.getLong(3))
      acc.view.mapValues(ps => CheckpointWindow.normalize(ps.toSeq)).toMap
    } finally st.close()
  }

  private def emptyDf(schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def readCommitted(table: String, schema: StructType,
      extraPredicate: Option[String]): DataFrame = {
    val exists = withConn(c => listTables(c).contains(table))
    if (!exists) emptyDf(schema)
    else {
      val committed = batchId
      // Spark-side predicate: backtick-quoted identifiers (double quotes
      // are string literals in Spark SQL); pushed down to Derby by the
      // JDBC source.
      val pred = (s"`_batch` <= $committed" +: extraPredicate.toSeq)
        .mkString(" AND ")
      val df = spark.read.jdbc(url, q(table), props)
        .filter(pred)
      df.select(schema.fields.toSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
    }
  }

  def read(table: String, schema: StructType): DataFrame =
    readCommitted(table, schema, None)

  def readLatestSegment(table: String, schema: StructType): DataFrame = {
    val exists = withConn(c => listTables(c).contains(table))
    if (!exists) emptyDf(schema)
    else {
      val committed = batchId
      val latest = withConn { c =>
        val st = c.createStatement()
        try {
          val rs = st.executeQuery(
            s"SELECT MAX(${q("_batch")}) FROM ${q(table)} " +
              s"WHERE ${q("_batch")} <= $committed")
          rs.next()
          val v = rs.getLong(1)
          if (rs.wasNull()) -1L else v
        } finally st.close()
      }
      if (latest < 0) emptyDf(schema)
      else readCommitted(table, schema, Some(s"`_batch` = $latest"))
    }
  }

  /** Secondary indexes on `_batch` (visibility filter) and the slot
    * column (rollback deletes) — the reference's P9 sargability
    * (`TestDbContext.cs:36-37` `HasIndex(SpentSlot)`). Created lazily
    * after the table exists; best-effort (Derby errors if present).
    */
  private val indexed = mutable.Set[String]()
  private def ensureIndexes(table: String, slotCol: String): Unit =
    if (!indexed.contains(table)) {
      withConn { c =>
        Seq("_batch" -> s"ix_${table}_batch", slotCol -> s"ix_${table}_slot")
          .foreach { case (column, ix) =>
            val st = c.createStatement()
            try st.executeUpdate(
              s"CREATE INDEX ${q(ix)} ON ${q(table)} (${q(column)})")
            catch { case _: Exception => () }
            finally st.close()
          }
      }
      indexed += table
    }

  def commit(batchId: Long, appends: Map[String, (DataFrame, String)],
      checkpoints: Map[String, Seq[Point]],
      compactors: Map[String, DataFrame => DataFrame],
      onSegment: (String, Double) => Unit): Boolean = {
    val committed = this.batchId
    if (batchId <= committed) return false
    // retried-batch cleanup: orphan rows from a crashed attempt
    withConn { c =>
      userTables(c).foreach { t =>
        val st = c.createStatement()
        try st.executeUpdate(
          s"DELETE FROM ${q(t)} WHERE ${q("_batch")} >= $batchId")
        finally st.close()
      }
    }
    var wroteAny = false
    appends.foreach { case (table, (df, slotCol)) =>
      val t0 = System.nanoTime()
      val obs = Observation()
      df.withColumn("_batch", lit(batchId))
        .observe(obs, min(col(slotCol)).as("lo"), max(col(slotCol)).as("hi"))
        .write.mode("append").jdbc(url, q(table), props)
      if (obs.get.get("lo").exists(_ != null)) wroteAny = true
      ensureIndexes(table, slotCol)
      registerSlotCol(table, slotCol)
      onSegment(table, (System.nanoTime() - t0) / 1e9)
    }
    if (!wroteAny) return false
    // The atomic point: checkpoints + commit marker in one transaction.
    // MERGE semantics (like StateStore's `stored ++ checkpoints`): only
    // the committing runner's reducers are replaced — checkpoints of
    // reducers not registered with this runner survive untouched.
    withConn { c =>
      c.setAutoCommit(false)
      val st = c.createStatement()
      try {
        val del = c.prepareStatement(
          s"DELETE FROM ${q("graft_checkpoints")} WHERE reducer = ?")
        checkpoints.keys.foreach { r =>
          del.setString(1, r); del.executeUpdate()
        }
        del.close()
        val ps = c.prepareStatement(
          s"INSERT INTO ${q("graft_checkpoints")} VALUES (?, ?, ?)")
        checkpoints.foreach { case (r, pts) =>
          pts.foreach { p =>
            ps.setString(1, r); ps.setString(2, p.hash); ps.setLong(3, p.slot)
            ps.executeUpdate()
          }
        }
        ps.close()
        st.executeUpdate(
          s"INSERT INTO ${q("graft_commits")} VALUES ($batchId)")
        c.commit()
      } catch { case e: Throwable => c.rollback(); throw e }
      finally st.close()
    }
    true
  }

  def rollback(delSlot: Long, slotCols: Map[String, String],
      checkpoints: Map[String, Seq[Point]]): Unit = {
    val next = batchId + 1
    withConn { c =>
      c.setAutoCommit(false)
      val st = c.createStatement()
      try {
        val stored = storedSlotCols
        userTables(c).foreach { t =>
          // stored registry wins (a subset-registered runner doesn't
          // know other tables' retraction columns)
          val slotCol = stored.getOrElse(t, slotCols.getOrElse(t, "slot"))
          st.executeUpdate(
            s"DELETE FROM ${q(t)} WHERE ${q(slotCol)} >= $delSlot")
        }
        // Every stored checkpoint rewinds (points at/after delSlot die —
        // tables of unregistered reducers were trimmed too); then the
        // registered reducers' windows are replaced wholesale.
        st.executeUpdate(
          s"DELETE FROM ${q("graft_checkpoints")} WHERE slot >= $delSlot")
        val del = c.prepareStatement(
          s"DELETE FROM ${q("graft_checkpoints")} WHERE reducer = ?")
        checkpoints.keys.foreach { r =>
          del.setString(1, r); del.executeUpdate()
        }
        del.close()
        val ps = c.prepareStatement(
          s"INSERT INTO ${q("graft_checkpoints")} VALUES (?, ?, ?)")
        checkpoints.foreach { case (r, pts) =>
          pts.foreach { p =>
            ps.setString(1, r); ps.setString(2, p.hash); ps.setLong(3, p.slot)
            ps.executeUpdate()
          }
        }
        ps.close()
        st.executeUpdate(s"INSERT INTO ${q("graft_commits")} VALUES ($next)")
        c.commit()
      } catch { case e: Throwable => c.rollback(); throw e }
      finally st.close()
    }
  }
}
