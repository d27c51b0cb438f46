package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.TableStore
import graft.types._
import scala.jdk.CollectionConverters._

/** Driver-checked gate queries that route through TableStore/GraftDb — the
  * storage/DML half of SURVEY §2 (S2/S7, D1-D4, A1 over the store). Each
  * query builds a FRESH store under the JVM temp dir from
  * `documents.parquet`, applies the DML under test, and returns the
  * re-READ state; the DuckDB oracle reproduces the same end state from the
  * raw parquet with window/anti-join SQL (reference semantics:
  * table_segment_mvp.cpp:455-876 insert/upsert/delete/insertPrepare).
  *
  * Determinism notes:
  *  - batches are ordered by doc_id before insert, so `__row_id` order ==
  *    doc_id order and pagination oracles can ORDER BY doc_id;
  *  - in-batch duplicate order is the DataFrame union order (originals
  *    before mutated copies), matching the `ord` column in the oracles.
  */
object QueriesStore {

  private val docSchema = TableSchema("documents", Seq(
    FieldSchema("doc_id", FieldType.BigInt, primaryKey = true),
    FieldSchema("text", FieldType.Str),
    FieldSchema("lang", FieldType.Str),
    FieldSchema("source", FieldType.Str),
    FieldSchema("n_chars", FieldType.BigInt)))

  /** Deleted-then-recreated scratch root, unique per (tag, sf dir). */
  private def cleanRoot(tag: String, dir: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_gate_${tag}_${math.abs(dir.hashCode)}"
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      val w = java.nio.file.Files.walk(p)
      try w.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally w.close()
    }
    root
  }

  /** Fresh store + the documents batch in doc_id order. */
  private def freshStore(s: SparkSession, dir: String, tag: String): (TableStore, DataFrame) = {
    val st = TableStore.create(s, cleanRoot(tag, dir), docSchema)
    val docs = s.read.parquet(s"$dir/documents.parquet").orderBy("doc_id")
    (st, docs)
  }

  /** D5's constant insert batch: embeddings of CONSTANT texts are computable
    * at oracle-construction time (DeterministicEmbedder is pure), so the
    * auto-embedded store content gets a full VALUES-literal hash oracle. */
  private val D5Texts = Seq(
    "distributed shuffle hash join",
    "broadcast nested loop",
    "catalyst optimizer rule",
    "tungsten codegen stage",
    "parquet footer pruning")
  private val D5Dim = 8

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // D1: INSERT first-wins — the batch carries every doc twice (original,
    // then a mutated copy); the duplicate is skipped in-batch
    // (table_segment_mvp.cpp:652-737).
    "d1_insert_firstwins" -> ((s, dir) => {
      val (st, docs) = freshStore(s, dir, "d1")
      val dup = docs.withColumn("text", concat(lit("DUP:"), col("text")))
      st.insert(docs.unionByName(dup))
      st.read().select(col("doc_id"), col("text"), col("lang")).orderBy("doc_id")
    }),

    // D1: the {inserted, skipped} response counters across two inserts —
    // in-batch dup skip, then an all-duplicates second batch
    // (table_segment_mvp.cpp:800).
    "d1_insert_counts" -> ((s, dir) => {
      import s.implicits._
      val (st, docs) = freshStore(s, dir, "d1c")
      val dup = docs.withColumn("text", concat(lit("DUP:"), col("text")))
      val r1 = st.insert(docs.unionByName(dup))
      val r2 = st.insert(dup) // every PK already present -> all skipped
      Seq((1L, r1.inserted, r1.skipped), (2L, r2.inserted, r2.skipped))
        .toDF("step", "inserted", "skipped").orderBy("step")
    }),

    // D2: UPSERT last-wins, in-batch included: docs with doc_id%3=0 appear
    // twice in the upsert batch (V2 then V3 -> V3 wins), plus brand-new
    // rows; old versions are tombstoned (table_segment_mvp.cpp:652-795).
    "d2_upsert_lastwins" -> ((s, dir) => {
      val (st, docs) = freshStore(s, dir, "d2")
      st.insert(docs)
      val third = docs.filter(col("doc_id") % 3 === 0)
      val v2 = third.withColumn("text", concat(lit("V2:"), col("text")))
      val v3 = third.withColumn("text", concat(lit("V3:"), col("text")))
      val news = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text", concat(lit("NEW:"), col("text")))
      st.insert(v2.unionByName(v3).unionByName(news), upsert = true)
      st.read().select(col("doc_id"), col("text")).orderBy("doc_id")
    }),

    // D3: DELETE by PK list, by filter, and by PK-list-checked-against-
    // filter (db_server.cpp:297-360; tombstone bitset analog
    // table_segment_mvp.cpp:321-405).
    "d3_delete_filter" -> ((s, dir) => {
      val (st, docs) = freshStore(s, dir, "d3")
      st.insert(docs)
      st.delete(pks = Seq(0L, 1L, 2L))
      st.delete(Nil, "n_chars < 200")
      st.delete(Seq(5L, 6L, 7L), "lang <> 'en'")
      st.read().select(col("doc_id")).orderBy("doc_id")
    }),

    // D4: InsertPrepare existence bitmask — bit CLEARED iff the pk exists
    // (table_segment_mvp.cpp:816-876).
    "d4_insert_prepare" -> ((s, dir) => {
      import s.implicits._
      val (st, docs) = freshStore(s, dir, "d4")
      st.insert(docs)
      val (_, words) = st.insertPrepare((490L to 509L).map(x => x: Any))
      words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq
        .toDF("word_idx", "word_val").orderBy("word_idx")
    }),

    // A1 over the store: pagination (skip/limit window in __row_id =
    // insertion order) with filter + projection, over a table with
    // tombstones (vec_search_executor.cpp:1016-1029).
    "a1_store_scan_page" -> ((s, dir) => {
      val (st, docs) = freshStore(s, dir, "a1s")
      st.insert(docs)
      st.delete(Nil, "n_chars < 200")
      graft.query.QueryEngine.get(st.read(), st.schema,
        graft.query.QueryEngine.GetRequest(
          filter = "lang <> 'fr'", skip = 20, limit = 30,
          outputFields = Seq("doc_id", "lang", "source")))
    }),

    // S2: versioned snapshots — time travel to the pre-delete version
    // while the live table reflects the delete (manifest-per-commit
    // analog of data_mvp.bin save/load + WAL versioning).
    "s2_time_travel" -> ((s, dir) => {
      val (st, docs) = freshStore(s, dir, "tt")
      st.insert(docs) // commit v0
      st.delete(Nil, "lang = 'en'") // commit v1
      val v0 = st.readVersion(0).groupBy(col("lang")).agg(count(lit(1)).as("n_v0"))
      val cur = st.read().groupBy(col("lang")).agg(count(lit(1)).as("n_cur"))
      v0.join(cur, Seq("lang"), "left_outer")
        .na.fill(0L, Seq("n_cur")).orderBy("lang")
    }),

    // S7: per-table statistics after DML (db_server.cpp:105-119).
    "s7_statistics" -> ((s, dir) => {
      import s.implicits._
      val (st, docs) = freshStore(s, dir, "s7")
      st.insert(docs)
      st.delete(Nil, "doc_id < 10")
      Seq(st.count()).toDF("total_records")
    }),

    // D5: auto-embedding at ingest — the schema carries an EmbeddingIndex
    // (src text -> tgt vector via model name, table_segment_mvp.cpp:746-762)
    // and insert fills the vector column itself; the oracle holds the exact
    // expected embeddings as literals (the embedder is pure). The vector is
    // exploded to (doc_id, dim_idx, val) scalar rows so the driver's
    // column-sorting hash comparator never sees an array cell.
    "d5_auto_embed" -> ((s, dir) => {
      import s.implicits._
      val sch = TableSchema("docs_e", Seq(
        FieldSchema("doc_id", FieldType.BigInt, primaryKey = true),
        FieldSchema("text", FieldType.Str),
        FieldSchema("embedding", FieldType.VectorFloat, dimensions = D5Dim)),
        Seq(EmbeddingIndex("auto_emb", "text", "embedding", "fake/offline")))
      val st = TableStore.create(s, cleanRoot("d5e", dir), sch)
      st.insert(D5Texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      st.read()
        .select(col("doc_id"), posexplode(col("embedding")).as(Seq("dim_idx", "val")))
        .select(col("doc_id"), col("dim_idx").cast("long").as("dim_idx"), col("val"))
        .orderBy("doc_id", "dim_idx")
    }),

    // S4: catalog save/load — create a database + table through a catalog,
    // then open a SECOND catalog instance on the same root (a restart):
    // catalog.json resolves the database, the table's schema.json + manifest
    // resolve the data (basic_meta_impl.cpp:35-98 LoadDB + persisted meta).
    "s4_catalog_reload" -> ((s, dir) => {
      val root = cleanRoot("cat", dir)
      val cat = new graft.api.GraftCatalog(s, root)
      val db = cat.load("covdb")
      db.createTable(graft.store.SchemaJson.write(docSchema))
      db.store("documents").insert(
        s.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") < 100)
          .orderBy("doc_id"))
      val reopened = new graft.api.GraftCatalog(s, root)
      reopened.db("covdb").store("documents").read()
        .select(col("doc_id"), col("lang"), col("n_chars")).orderBy("doc_id")
    }),

    // G8: the rendered facet JSON envelope itself — query a CONSTANT table
    // through the JSON front door (result rows + a global facet), emit the
    // raw response string; the oracle pins the exact bytes the renderer
    // must produce (web_controller JSON response shape; aggregation.hpp
    // output keys are the aggregate expressions verbatim).
    "g8_facet_json" -> ((s, dir) => {
      import s.implicits._
      val db = new graft.api.GraftDb(s, cleanRoot("g8", dir))
      db.createTable(
        """{"name":"t8","fields":[
          |  {"name":"doc_id","dataType":"BIGINT","primaryKey":true},
          |  {"name":"lang","dataType":"STRING"},
          |  {"name":"score","dataType":"BIGINT"}]}""".stripMargin)
      db.store("t8").insert(
        Seq((0L, "en", 3L), (1L, "de", 1L), (2L, "en", 5L), (3L, "fr", 2L), (4L, "de", 4L))
          .toDF("doc_id", "lang", "score"))
      val json = db.get(
        """{"table":"t8","filter":"score >= 2",
          |  "facets":[{"group":[],"aggregate":["COUNT(*)","SUM(score)"]}]}""".stripMargin)
      Seq(json).toDF("facet_json")
    }),

    // S5/D6: WAL-first ingestion — entries appended to the log (bulk insert
    // BY REFERENCE, delete by filter, inline upsert), then replayed through
    // the real Structured Streaming path (readStream -> foreachBatch ->
    // store DML in gid order, consumed-gid watermark); the oracle reproduces
    // the final table state (write_ahead_log.hpp:30-142 semantics).
    "s5_wal_replay" -> ((s, dir) => {
      val (st, docs) = freshStore(s, dir, "wal")
      val base = cleanRoot("walside", dir)
      val walDir = s"$base/wal"
      val pay = s"$base/payload"
      docs.select(to_json(struct(docs.columns.map(col): _*)).as("value"))
        .write.mode("overwrite").text(pay)
      graft.streaming.WalStream.append(walDir, 1, "INSERT", payloadPath = pay)
      graft.streaming.WalStream.append(walDir, 2, "DELETE", filter = "n_chars < 200")
      val up = (0 until 5).map(i =>
        s"""{"doc_id":$i,"text":"wal upsert $i","lang":"xx","source":"wal","n_chars":${100 + i}}""")
        .mkString("\n")
      graft.streaming.WalStream.append(walDir, 3, "UPSERT", payload = up)
      val q = s.readStream.schema(graft.streaming.WalStream.entrySchema).json(walDir)
        .writeStream.option("checkpointLocation", s"$base/ckpt")
        .foreachBatch(graft.streaming.WalStream.applyBatch(st) _)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      st.read().select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }))

  val oracle: Map[String, String] = Map(
    "d1_insert_firstwins" ->
      """WITH batch AS (
        |  SELECT doc_id, text, lang, 0 AS ord FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'DUP:' || text, lang, 1 FROM documents)
        |SELECT doc_id, text, lang FROM (
        |  SELECT doc_id, text, lang,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS rn
        |  FROM batch) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "d1_insert_counts" ->
      """SELECT CAST(1 AS BIGINT) AS step, CAST(count(*) AS BIGINT) AS inserted,
        |  CAST(count(*) AS BIGINT) AS skipped FROM documents
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(count(*) AS BIGINT)
        |FROM documents ORDER BY step""".stripMargin,
    "d2_upsert_lastwins" ->
      """SELECT doc_id, text FROM (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
        |  UNION ALL
        |  SELECT doc_id, 'V3:' || text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'NEW:' || text FROM documents WHERE doc_id % 7 = 0)
        |ORDER BY doc_id""".stripMargin,
    "d3_delete_filter" ->
      """SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (0, 1, 2)
        |  AND NOT (n_chars < 200)
        |  AND NOT (doc_id IN (5, 6, 7) AND lang <> 'en')
        |ORDER BY doc_id""".stripMargin,
    "d4_insert_prepare" ->
      """WITH pks AS (SELECT range AS i, 490 + range AS pk FROM range(0, 20)),
        |m AS (SELECT i,
        |  CASE WHEN EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = pk)
        |       THEN (1 << (i % 32)) ELSE 0 END AS bit FROM pks)
        |SELECT CAST(i // 32 AS BIGINT) AS word_idx,
        |  CAST(-1 - sum(bit) AS INTEGER) AS word_val
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "a1_store_scan_page" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE NOT (n_chars < 200) AND lang <> 'fr'
        |ORDER BY doc_id LIMIT 30 OFFSET 20""".stripMargin,
    "s2_time_travel" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_v0,
        |  CAST(count(*) FILTER (WHERE lang <> 'en') AS BIGINT) AS n_cur
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "s7_statistics" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_records
        |FROM documents WHERE doc_id >= 10""".stripMargin,
    "d5_auto_embed" -> {
      // the embedder is pure: compute the exact floats the insert will store
      // (toDouble.toString round-trips each float32 exactly; the DOUBLE ->
      // FLOAT cast on the DuckDB side lands back on the same float32). The
      // `e0` suffix forces a DOUBLE literal — a bare 17-digit decimal parses
      // as DECIMAL(18,17) in DuckDB, whose float cast rounds differently.
      // One scalar row per (doc_id, dim_idx) — arrays never reach the driver.
      val embs = new graft.embed.DeterministicEmbedder("fake/offline", D5Dim)
        .embedBatch(D5Texts)
      // toPlainString: Double.toString can emit scientific notation
      // ("1.0E-5"), which would concatenate into an invalid "…E-5e0"
      // literal; the plain-decimal expansion of the exact double is always
      // parseable and lands on the same float32 after the cast
      val rows = (for {
        (e, i) <- embs.zipWithIndex
        (v, d) <- e.zipWithIndex
      } yield s"(CAST($i AS BIGINT), CAST($d AS BIGINT), " +
        s"CAST(${new java.math.BigDecimal(v.toDouble).toPlainString}e0 AS FLOAT))")
        .mkString(",\n  ")
      s"""SELECT * FROM (VALUES
         |  $rows) t(doc_id, dim_idx, val)
         |ORDER BY doc_id, dim_idx""".stripMargin
    },
    "g8_facet_json" ->
      ("""SELECT '{"result":[{"doc_id":0,"lang":"en","score":3},""" +
        """{"doc_id":2,"lang":"en","score":5},{"doc_id":3,"lang":"fr","score":2},""" +
        """{"doc_id":4,"lang":"de","score":4}],""" +
        """"facets":[[{"COUNT(*)":4,"SUM(score)":14}]]}' AS facet_json"""),
    "s4_catalog_reload" ->
      """SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin,
    "s5_wal_replay" ->
      """SELECT doc_id, text, lang, n_chars FROM (
        |  SELECT doc_id, text, lang, n_chars FROM documents
        |  WHERE NOT (n_chars < 200) AND doc_id NOT IN (0, 1, 2, 3, 4)
        |  UNION ALL
        |  SELECT range AS doc_id, 'wal upsert ' || CAST(range AS VARCHAR),
        |    'xx', CAST(100 + range AS BIGINT)
        |  FROM range(0, 5))
        |ORDER BY doc_id""".stripMargin)
}
