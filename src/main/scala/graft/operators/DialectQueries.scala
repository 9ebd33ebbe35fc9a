package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.engine.IoServer
import graft.functions.{ArrayPrimitives => AP}

/** End-to-end dialect queries: the same `operation=key=value;` text a
  * reference client would submit, executed through
  * [[graft.engine.IoServer]] and checked against DuckDB — proving the
  * full parse → compile → Catalyst → result pipeline, not just the
  * DataFrame layer.
  */
object DialectQueries {

  /** embeddings as a fragment: id_dim = vec_id+1 (dense 1..n), measure =
    * the 64-element array as double. */
  private def serverWithEmb(s: SparkSession, dir: String): IoServer#Session = {
    val srv = new IoServer(s)
    srv.registerFragment("default", "emb",
      Tables.embeddings(s, dir).select(
        (col("vec_id") + 1).as("id_dim"),
        col("embedding").cast("array<double>").as("measure")))
    srv.newSession()
  }

  /** qd01 — the canonical Ophidia slice (SURVEY §7.2): CTAS with a
    * blockwise reduce + key-algebra WHERE, then read the fragment back. */
  def qd01_dialect_ctas(s: SparkSession, dir: String): DataFrame = {
    val ses = serverWithEmb(s, dir)
    ses.execute(
      "operation=create_frag_select;frag_name=out;" +
        "field=id_dim|oph_reduce('oph_double','oph_double',measure,'oph_avg',8);" +
        "field_alias=id_dim|measure;from=emb;" +
        "where=oph_is_in_subset(id_dim,1,2,301)")
    ses.execute("operation=select;field=id_dim|measure;from=out;order=id_dim").get
      .withColumn("measure", AP.fx12(col("measure")))
  }

  /** qd02 — dialect GROUP BY with a row-crossing aggregate primitive
    * (elementwise max keeps the oracle exact under any execution order)
    * plus the first-row rule for the group key. */
  def qd02_dialect_groupby(s: SparkSession, dir: String): DataFrame = {
    val ses = serverWithEmb(s, dir)
    ses.execute(
      "operation=create_frag_select;frag_name=gout;" +
        "field=oph_id(id_dim,50)|oph_aggregate_operator('oph_double',measure,'oph_max');" +
        "field_alias=gid|vec_max;from=emb;group=oph_id(id_dim,50)")
    ses.execute("operation=select;field=gid|vec_max;from=gout;order=gid").get
      .withColumn("vec_max", AP.fx12(col("vec_max")))
  }

  /** qd03 — oph_subset stored procedure: strided filter + sequential
    * re-key (the reference's self-rewriting procedure). */
  def qd03_dialect_subset(s: SparkSession, dir: String): DataFrame = {
    val ses = serverWithEmb(s, dir)
    ses.execute("operation=function;function_name=oph_subset;" +
      "function_args=emb|1|id_dim:oph_mul_scalar('oph_double','oph_double',measure,2.0)|sout|" +
      "oph_is_in_subset(id_dim,3,5,498)")
    ses.execute("operation=select;field=id_dim|measure;from=sout;order=id_dim").get
      .withColumn("measure", AP.fx12(col("measure")))
  }

  /** qd04 — the reference's multi-fragment "join" (positional aligned
    * merge over dense sorted ids, oph_io_server_query_blocks.c:845-1082,
    * expressed as an id_dim equi-join): elementwise-sum two fragments'
    * measures under a key-algebra subset. */
  def qd04_dialect_join(s: SparkSession, dir: String): DataFrame = {
    val srv = new IoServer(s)
    val base = Tables.embeddings(s, dir).select(
      (col("vec_id") + 1).as("id_dim"),
      col("embedding").cast("array<double>").as("measure"))
    srv.registerFragment("default", "emb", base)
    srv.registerFragment("default", "embr",
      base.select(col("id_dim"), reverse(col("measure")).as("measure")))
    val ses = srv.newSession()
    ses.execute(
      "operation=create_frag_select;frag_name=jout;" +
        "field=id_dim|oph_sum_array('oph_double','oph_double',t1.measure,t2.measure);" +
        "field_alias=id_dim|measure;from=emb|embr;" +
        "where=oph_is_in_subset(id_dim,2,4,400)")
    ses.execute("operation=select;field=id_dim|measure;from=jout;order=id_dim").get
      .withColumn("measure", AP.fx12(col("measure")))
  }

  /** qd05 — the 2-phase create_frag + chunked prepared multi_insert path
    * (tot_run/curr_run, oph_io_server_thread.h:60-66): 100 rows arrive
    * as 4 prepared runs of 25 ?-bound rows each, commit on the last run,
    * then read back. Oracle regenerates the bound values from range(). */
  def qd05_dialect_insert(s: SparkSession, dir: String): DataFrame = {
    val ses = new IoServer(s).newSession()
    ses.execute("operation=create_frag;frag_name=ins;" +
      "column_name=id_dim|val;column_type=long|double")
    val placeholders = (1 to 50).map(k => s"?$k").mkString("|")
    (0 until 4).foreach { run =>
      val binds: Seq[Any] = (1 to 25).flatMap { j =>
        val i = run * 25 + j
        Seq[Any](i.toLong, i * 0.5 + 0.25)
      }
      ses.execute("operation=multi_insert;frag_name=ins;field=id_dim|val;" +
        s"value=$placeholders;tot_run=4;curr_run=${run + 1}", binds)
    }
    ses.execute("operation=select;field=id_dim|val;from=ins;order=id_dim").get
  }

  /** qd06 — random_import under the oracle gate: both generators
    * (`default` uniform and `temperatures` AR(1)) are pure integer
    * arithmetic (IoServer.runRandomImport), so DuckDB replays them
    * exactly — default in closed form, the AR(1) recurrence as a
    * recursive CTE with the identical IEEE expression shape. The two
    * fragments then meet in a multi-FROM aligned dialect join. */
  def qd06_dialect_random(s: SparkSession, dir: String): DataFrame = {
    val ses = new IoServer(s).newSession()
    ses.execute("operation=random_import;frag_name=rnd;nrows=60;array_length=8")
    ses.execute("operation=random_import;frag_name=rnt;nrows=60;array_length=8;" +
      "algorithm=temperatures")
    ses.execute("operation=select;field=id_dim|t1.measure|t2.measure;" +
      "field_alias=id_dim|m_def|m_temp;from=rnd|rnt;where=id_dim>0;order=id_dim")
      .get
      .withColumn("m_def", AP.fx12(col("m_def")))
      .withColumn("m_temp", AP.fx12(col("m_temp")))
  }

  /** qd07 — full fragment lifecycle through the dialect: create_database
    * → create_frag → 3 chunked prepared multi_insert runs → oph_export to
    * a NetCDF file → file_import of that file into a second fragment →
    * drop of a scratch fragment → oph_size over both copies. The output
    * is the re-imported fragment (bytes went through the CDF-1 writer and
    * the DSv2 reader) plus the catalog's size accounting. */
  def qd07_dialect_lifecycle(s: SparkSession, dir: String): DataFrame = {
    val ses = new IoServer(s).newSession()
    ses.execute("operation=create_database;db_name=lab")
    ses.execute("operation=create_frag;frag_name=lab.lf;" +
      "column_name=id_dim|measure;column_type=long|double_array")
    val placeholders = (1 to 40).map(k => s"?$k").mkString("|")
    (0 until 3).foreach { run =>
      val binds: Seq[Any] = (1 to 20).flatMap { j =>
        val i = run * 20 + j
        Seq[Any](i.toLong, (0 until 4).map(k => i * 0.5 + k * 0.125))
      }
      ses.execute("operation=multi_insert;frag_name=lab.lf;" +
        s"field=id_dim|measure;value=$placeholders;tot_run=3;curr_run=${run + 1}",
        binds)
    }
    val path = java.nio.file.Files.createTempDirectory("graft_qd07")
      .resolve("lf.nc").toString
    ses.execute("operation=function;function_name=oph_export;" +
      s"function_args=lab.lf|$path")
    ses.execute(s"operation=file_import;frag_name=lab.back;src_path=@$path;" +
      "measure=measure;explicit=1")
    // scratch fragment: create + drop must leave the catalog unchanged
    ses.execute("operation=create_frag;frag_name=lab.tmp;" +
      "column_name=id_dim|measure;column_type=long|double_array")
    ses.execute("operation=insert;frag_name=lab.tmp;field=id_dim|measure;" +
      "value=?1|?2", Seq[Any](1L, Seq(0.0)))
    ses.execute("operation=drop_frag;frag_name=lab.tmp")
    val size = ses.execute("operation=function;function_name=oph_size;" +
      "function_args=lab.lf|lab.back").get
    val out = ses.execute("operation=select;field=id_dim|measure;from=lab.back;" +
      "order=id_dim").get
      .withColumn("measure", AP.fx12(col("measure")))
      .crossJoin(broadcast(size))
    // close the lifecycle (oph_io_server_query_engine.c:1190-1285):
    // drop_database must REFUSE while fragments remain...
    val guardNonempty =
      try { ses.execute("operation=drop_database;db_name=lab"); 0L }
      catch { case _: IllegalArgumentException => 1L }
    // ...and succeed once emptied, resetting the session's default db —
    // observable as `lab` no longer resolving for use_db
    ses.execute("operation=drop_frag;frag_name=lab.lf")
    ses.execute("operation=drop_frag;frag_name=lab.back")
    ses.useDb("lab")
    ses.execute("operation=drop_database;db_name=lab")
    val guardDropped =
      try { ses.useDb("lab"); 0L }
      catch { case _: IllegalArgumentException => 1L }
    out.withColumn("guard_nonempty", lit(guardNonempty))
      .withColumn("guard_dropped", lit(guardDropped))
  }

  /** qd08 — the information-schema keywords as oracle rows (§2.8,
    * oph_query_engine_language.h:110-114): @info_system (current_db
    * after use_db), @function_table (the UDF registry — ≥88 primitives,
    * spot-membership), @tot_table_size / @info_system_table (catalog
    * size accounting for a freshly built fragment), @function_fields
    * (the mysql.func column shape). One deterministic composed row. */
  def qd08_dialect_catalog(s: SparkSession, dir: String): DataFrame = {
    val ses = new IoServer(s).newSession()
    ses.execute("operation=create_database;db_name=cat")
    ses.execute("operation=create_frag;frag_name=cat.f1;" +
      "column_name=id_dim|measure;column_type=long|double_array")
    val placeholders = (1 to 40).map(k => s"?$k").mkString("|")
    (0 until 3).foreach { run =>
      val binds: Seq[Any] = (1 to 20).flatMap { j =>
        val i = run * 20 + j
        Seq[Any](i.toLong, (0 until 4).map(k => i * 0.5 + k * 0.125))
      }
      ses.execute("operation=multi_insert;frag_name=cat.f1;" +
        s"field=id_dim|measure;value=$placeholders;tot_run=3;curr_run=${run + 1}",
        binds)
    }
    ses.useDb("cat")
    val info = ses.execute(
      "operation=select;field=id_dim|current_db;from=@info_system").get
    val fns = ses.execute(
      "operation=select;field=id_dim|function_name;from=@function_table").get
    val tot = ses.execute(
      "operation=select;field=id_dim|tot_table_size;from=@tot_table_size").get
    val ist = ses.execute("operation=select;" +
      "field=id_dim|db_name|frag_name|frag_size;from=@info_system_table").get
    val ff = ses.execute(
      "operation=select;field=id_dim|field_name;from=@function_fields").get
    val fnAgg = fns.agg(
      (count(lit(1)) >= 88).cast("long").as("fn_ge88"),
      max(when(col("function_name") === "oph_id", 1L).otherwise(0L))
        .as("has_oph_id"),
      max(when(col("function_name") === "oph_sum_array", 1L).otherwise(0L))
        .as("has_sum_array"))
    val ffAgg = ff.agg(concat_ws(",",
      array_sort(collect_list(col("field_name")))).as("func_fields"))
    info.select(col("current_db"))
      .crossJoin(broadcast(fnAgg))
      .crossJoin(broadcast(tot.select(col("tot_table_size"))))
      .crossJoin(broadcast(ist.select(
        col("db_name"), col("frag_name"), col("frag_size"))))
      .crossJoin(broadcast(ffAgg))
  }

  /** qd09 — the reference client loop END-TO-END over a real TCP socket
    * (oph_io_client_test.c:28-40: connect → PG → UD → EQ… → RS), binary
    * wire mode. Every byte of the lifecycle crosses a loopback socket
    * through [[graft.service.IoService]]'s frame codec: PG ping, UD
    * database select, create_frag, FOUR chunked prepared multi_insert
    * runs (tot_run/curr_run as frame fields, 25 rows each bound as
    * DL longs + DB packed-double blobs), a CTAS with an array primitive
    * and a key-algebra WHERE, a select, and an RS fetch whose framed
    * payload (NUL-terminated longs + packed-double BLOB cells) is
    * decoded back into the returned DataFrame. Driver-side rows here are
    * the PROTOCOL under test, not a data path — the result set is one
    * wire page (34 rows), the same bounded shape the reference client
    * materializes. */
  def qd09_wire_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
    import java.nio.{ByteBuffer, ByteOrder}
    val svc = new graft.service.IoService(s, 0, "binary")
    try {
      val c = new java.net.Socket("127.0.0.1", svc.boundPort)
      try {
        val out = new DataOutputStream(new BufferedOutputStream(c.getOutputStream))
        val in = new DataInputStream(new BufferedInputStream(c.getInputStream))
        def wu64(v: Long): Unit = out.writeLong(java.lang.Long.reverseBytes(v))
        def wu32(v: Int): Unit = out.writeInt(java.lang.Integer.reverseBytes(v))
        def ru64(): Long = java.lang.Long.reverseBytes(in.readLong())
        def ru32(): Int = java.lang.Integer.reverseBytes(in.readInt())
        def wstr(t: String): Unit = { // C-style strlen+1 with NUL
          val b = (t + "\u0000").getBytes("UTF-8")
          wu64(b.length.toLong); out.write(b)
        }
        def tag(): String = {
          val b = new Array[Byte](2); in.readFully(b); new String(b, "UTF-8")
        }
        def expect(want: String): Unit = {
          val got = tag()
          require(got == want, s"wire: expected $want frame, got $got")
        }
        out.write("PG".getBytes); out.flush(); expect("PG")
        out.write("UD".getBytes); wstr("default"); wstr("memory"); out.flush()
        expect("UD")
        def eq(q: String): Unit = {
          out.write("EQ".getBytes); wu32(1); wstr(q); wstr("memory")
          out.flush(); expect("EQ")
        }
        eq("operation=create_frag;frag_name=wirein;" +
          "column_name=id_dim|measure;column_type=long|double_array")
        val placeholders = (1 to 50).map(k => s"?$k").mkString("|")
        (0 until 4).foreach { run =>
          out.write("EQ".getBytes); wu32(51)
          wstr("operation=multi_insert;frag_name=wirein;" +
            s"field=id_dim|measure;value=$placeholders")
          wstr("memory")
          wu64(4L); wu64(run + 1L) // tot_run, curr_run frame fields
          (1 to 25).foreach { j =>
            val i = run * 25 + j // id 1..100
            wu64(8L); out.write("DL".getBytes)
            out.writeLong(java.lang.Long.reverseBytes(i.toLong))
            val blob = graft.sources.BinaryCodec.packDoubles(
              (0 until 8).map(k => (i - 1) * 0.5 + k * 0.125))
            wu64(blob.length.toLong); out.write("DB".getBytes); out.write(blob)
          }
          out.flush(); expect("EQ")
        }
        eq("operation=create_frag_select;frag_name=wout;" +
          "field=id_dim|oph_mul_scalar('oph_double','oph_double',measure,2.0);" +
          "field_alias=id_dim|measure;from=wirein;" +
          "where=oph_is_in_subset(id_dim,1,3,100)")
        eq("operation=select;field=id_dim|measure;from=wout;order=id_dim")
        out.write("RS".getBytes); out.flush(); expect("RS")
        val payloadLen = ru64(); val nRows = ru64(); val nFields = ru32()
        require(nFields == 2, s"wire: expected 2 fields, got $nFields")
        var seen = 0L
        val rows = (0L until nRows).map { _ =>
          val l1 = ru64(); val v1 = new Array[Byte](l1.toInt); in.readFully(v1)
          val id = new String(v1, 0, l1.toInt - 1, "UTF-8").toLong // NUL-term
          val l2 = ru64(); val v2 = new Array[Byte](l2.toInt); in.readFully(v2)
          val bb = ByteBuffer.wrap(v2).order(ByteOrder.LITTLE_ENDIAN)
          val m = (0 until (l2 / 8).toInt)
            .map(k => math.floor(bb.getDouble(k * 8) * 1e12).toLong)
            .mkString(",") // client-side fx12 twin
          seen += 16L + l1 + l2
          (id, m)
        }
        require(seen == payloadLen,
          s"wire: payload length $payloadLen, cells consumed $seen")
        import s.implicits._
        rows.toDF("id_dim", "measure").orderBy("id_dim")
      } finally c.close()
    } finally svc.stop()
  }

  /** qd10 — the last three of the 88 registered plugins driven through
    * the dialect front-end (etc/oph_primitives_list.in:81,153,277):
    * oph_predicate2 (elementwise `if x-y>=0 then x else y` against the
    * reversed measure) nested inside oph_filter (keep elements > 0.1) in
    * a CTAS field, then oph_expand as a top-level select field — the one
    * generator primitive — promoting the surviving elements to rows with
    * a regenerated dense id_dim. */
  def qd10_dialect_expand(s: SparkSession, dir: String): DataFrame = {
    val ses = serverWithEmb(s, dir)
    ses.execute(
      "operation=create_frag_select;frag_name=pf;" +
        "field=id_dim|oph_filter('oph_double'," +
        "oph_predicate2('oph_double','oph_double',measure," +
        "oph_reverse('oph_double',measure),'x-y','>=','x','y'),'x>0.1');" +
        "field_alias=id_dim|measure;from=emb;" +
        "where=oph_is_in_subset(id_dim,1,1,12)")
    ses.execute(
      "operation=select;" +
        "field=id_dim|oph_expand('oph_double','oph_double',measure);" +
        "field_alias=id_dim|val;from=pf;order=id_dim").get
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qd10_dialect_expand" -> (qd10_dialect_expand _),
    "qd09_wire_roundtrip" -> (qd09_wire_roundtrip _),
    "qd08_dialect_catalog" -> (qd08_dialect_catalog _),
    "qd05_dialect_insert" -> (qd05_dialect_insert _),
    "qd06_dialect_random" -> (qd06_dialect_random _),
    "qd07_dialect_lifecycle" -> (qd07_dialect_lifecycle _),
    "qd01_dialect_ctas" -> (qd01_dialect_ctas _),
    "qd02_dialect_groupby" -> (qd02_dialect_groupby _),
    "qd03_dialect_subset" -> (qd03_dialect_subset _),
    "qd04_dialect_join" -> (qd04_dialect_join _),
  )

  /** DuckDB mirror of [[AP.fx12]] (see ArrayQueries output-shape note). */
  private def FX(e: String): String =
    s"array_to_string(list_transform(($e), v -> CAST(floor(v * 1e12) AS BIGINT)), ',')"

  val oracles: Map[String, String] = Map(
    "qd10_dialect_expand" ->
      """WITH pf AS (
           SELECT vec_id + 1 AS oid,
             list_filter(
               list_transform(range(1, 65), i ->
                 CASE WHEN embedding[i]::DOUBLE - embedding[65-i]::DOUBLE >= 0.0
                      THEN embedding[i]::DOUBLE ELSE embedding[65-i]::DOUBLE END),
               x -> x > 0.1) AS m
           FROM embeddings WHERE vec_id + 1 BETWEEN 1 AND 12)
         SELECT row_number() OVER (ORDER BY oid, pos) AS id_dim, val
         FROM (SELECT oid, unnest(m) AS val,
                 generate_subscripts(m, 1) AS pos FROM pf)
         ORDER BY id_dim""",
    "qd09_wire_roundtrip" ->
      """SELECT i AS id_dim,
         array_to_string(list_transform(range(0, 8),
           j -> CAST(floor(((i-1) * 0.5 + j * 0.125) * 2.0 * 1e12) AS BIGINT)),
           ',') AS measure
         FROM range(1, 101) t(i)
         WHERE (i - 1) % 3 = 0
         ORDER BY id_dim""",
    "qd08_dialect_catalog" ->
      """SELECT 'cat' AS current_db,
         CAST(1 AS BIGINT) AS fn_ge88,
         CAST(1 AS BIGINT) AS has_oph_id,
         CAST(1 AS BIGINT) AS has_sum_array,
         CAST(60 AS BIGINT) AS tot_table_size,
         'cat' AS db_name, 'f1' AS frag_name,
         CAST(60 AS BIGINT) AS frag_size,
         'dl,name,ret,type' AS func_fields""",
    "qd06_dialect_random" -> s"""
      WITH RECURSIVE ar(i, j, x) AS (
        SELECT i, 0::BIGINT,
          20.0 * ((((i*2654435761 + 0*40503 + 12345) * 69069 + 1234567)
            % 2147483647)::DOUBLE / 2147483647.0)
        FROM range(1, 61) t(i)
        UNION ALL
        SELECT i, j + 1,
          x * 0.9 + 0.1 * (((((i*2654435761 + (j+1)*40503 + 12345) * 69069
            + 1234567) % 2147483647)::DOUBLE / 2147483647.0) * 40.0 - 5.0)
        FROM ar WHERE j < 8),
      tm AS (SELECT i, list(x ORDER BY j) AS m FROM ar WHERE j >= 1 GROUP BY i),
      df AS (SELECT i, list_transform(range(1, 9), j ->
          ((((i*2654435761 + j*40503 + 12345) * 69069 + 1234567)
            % 2147483647)::DOUBLE / 2147483647.0) * 1000.0) AS m
        FROM range(1, 61) t(i))
      SELECT df.i AS id_dim, ${FX("df.m")} AS m_def, ${FX("tm.m")} AS m_temp
      FROM df JOIN tm ON df.i = tm.i
      ORDER BY id_dim""",
    "qd07_dialect_lifecycle" -> s"""
      SELECT i AS id_dim,
        ${FX("list_transform(range(0, 4), k -> i * 0.5 + k * 0.125)")} AS measure,
        CAST(120 AS BIGINT) AS frag_size,
        CAST(1 AS BIGINT) AS guard_nonempty,
        CAST(1 AS BIGINT) AS guard_dropped
      FROM range(1, 61) t(i)
      ORDER BY id_dim""",
    "qd01_dialect_ctas" ->
      s"""SELECT vec_id + 1 AS id_dim,
         ${FX("""list_transform(range(0, 8), b ->
           list_reduce(list_transform(embedding[b*8+1 : b*8+8], x -> x::DOUBLE),
             (x,y) -> x+y) / 8.0)""")} AS measure
         FROM embeddings
         WHERE (vec_id + 1 - 1) % 2 = 0 AND vec_id + 1 >= 1 AND vec_id + 1 <= 301
         ORDER BY id_dim""",
    "qd02_dialect_groupby" ->
      s"""SELECT gid, ${FX("list(m ORDER BY i)")} AS vec_max FROM (
           SELECT 1 + (vec_id + 1 - 1) // 50 AS gid, i,
             max(embedding[i]::DOUBLE) AS m
           FROM embeddings, range(1, 65) t(i)
           GROUP BY gid, i)
         GROUP BY gid ORDER BY gid""",
    "qd05_dialect_insert" ->
      """SELECT i::BIGINT AS id_dim, i * 0.5 + 0.25 AS val
         FROM range(1, 101) t(i) ORDER BY id_dim""",
    "qd04_dialect_join" ->
      s"""SELECT vec_id + 1 AS id_dim,
         ${FX("list_transform(range(1, 65), i -> embedding[i]::DOUBLE + embedding[65-i]::DOUBLE)")} AS measure
         FROM embeddings
         WHERE (vec_id + 1 - 2) % 4 = 0 AND vec_id + 1 >= 2 AND vec_id + 1 <= 400
         ORDER BY id_dim""",
    "qd03_dialect_subset" ->
      s"""SELECT row_number() OVER (ORDER BY vec_id) AS id_dim,
         ${FX("list_transform(embedding, x -> x::DOUBLE * 2.0)")} AS measure
         FROM embeddings
         WHERE (vec_id + 1 - 3) % 5 = 0 AND vec_id + 1 >= 3 AND vec_id + 1 <= 498
         ORDER BY id_dim""",
  )
}
