package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Round 12: the serving ladder's remaining decline cells — sparse-ONLY
  * tables serve filtered requests from the sparse index's own pass-set
  * residency (round-11 "What's missing" #2), the dense side of floored
  * hybrid queries serves under its proven cover (#3), and the
  * filter+recallTarget+facets combination serves with the facet lookup
  * probing the passing-count cover the hits came from (#5 / ADVICE). */
class Round12Spec extends SparkSpec {

  private def resultIds(resp: String, key: String = "__row_id"): Seq[Long] = {
    val p = (s"""\"$key\":(-?\\d+)""").r
    p.findAllMatchIn(resp).map(_.group(1).toLong).toSeq
  }

  /** Sparse-ONLY fixture: no dense sibling anywhere, so every borrowed
    * verdict path is structurally unavailable — the table serves filtered
    * requests only if the sparse index's own residency can. */
  private def sparseOnlyDb(tag: String): graft.api.GraftDb = {
    val db = new graft.api.GraftDb(spark, tmpDir(tag))
    db.createTable(
      """{"name":"S","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"Label","dataType":"BIGINT"},
        |{"name":"SV","dataType":"SPARSE_VECTOR_FLOAT","dimensions":16,
        | "metricType":"DOT_PRODUCT"},
        |{"name":"SE","dataType":"SPARSE_VECTOR_FLOAT","dimensions":16,
        | "metricType":"EUCLIDEAN"}]}""".stripMargin)
    db
  }

  private def sparseRows(from: Int, until: Int): Seq[Row] =
    (from until until).map { i =>
      val (a, b) = (i % 16, (i + 7) % 16)
      val sv = Row(Seq(math.min(a, b), math.max(a, b)),
        Seq(1.0f + (i % 5) * 0.25f, 0.5f))
      Row(i.toLong, (i % 10).toLong, sv, sv)
    }

  private val sparseSchema = StructType(Seq(
    StructField("ID", LongType, nullable = false),
    StructField("Label", LongType, nullable = false),
    StructField("SV", graft.functions.SparseVec.sqlType, nullable = false),
    StructField("SE", graft.functions.SparseVec.sqlType, nullable = false)))

  private def insertRows(db: graft.api.GraftDb, rows: Seq[Row]): Unit = {
    val res = db.store("S").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), sparseSchema))
    assert(res.inserted == rows.length, res.toString)
  }

  test("sparse-ONLY table: declared filter serves from the index's own pass-set residency (dot + Euclid), equal to the job path") {
    val db = sparseOnlyDb("r12_sparse_only")
    insertRows(db, sparseRows(0, 600))
    assert(db.rebuildIndex("S", "SV"))
    assert(db.rebuildIndex("S", "SE"))
    db.setServeFilterColumns("S", "SV", Seq("Label"))
    db.setServeFilterColumns("S", "SE", Seq("Label"))
    val qv = """{"indices":[3,10],"values":[1.0,1.0]}"""
    val m = db.store("S").read()
      .select(org.apache.spark.sql.functions.col(graft.store.TableStore.RowId),
        org.apache.spark.sql.functions.col("ID"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (fld <- Seq("SV", "SE")) {
      val served = db.query(
        s"""{"table":"S","queryField":"$fld","queryVector":$qv,"limit":5,
           |"serve":true,"filter":"Label >= 5"}""".stripMargin)
      assert(served.contains("\"served\":true") &&
        served.contains("\"filtered\":true"), s"$fld: $served")
      val job = db.query(
        s"""{"table":"S","queryField":"$fld","queryVector":$qv,"limit":5,
           |"filter":"Label >= 5","response":["ID"]}""".stripMargin)
      assert(resultIds(served).map(m) == resultIds(job, "ID"),
        s"$fld: $served vs $job")
      assert(resultIds(served).map(m).forall(_ % 10 >= 5), s"$fld: $served")
    }
    // an UNDECLARED column still declines (no donor, not in own decl)
    val undeclared = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":5,
         |"serve":true,"filter":"ID >= 100","response":["ID"]}""".stripMargin)
    assert(!undeclared.contains("\"served\""), undeclared)
  }

  test("sparse-ONLY filtered serving: fresh rows above the pin are judged on the tail's scalar sidecar") {
    val db = sparseOnlyDb("r12_sparse_only_tail")
    insertRows(db, sparseRows(0, 400))
    assert(db.rebuildIndex("S", "SV"))
    db.setServeFilterColumns("S", "SV", Seq("Label"))
    // warm the serve path at the pre-tail pin
    val qv = """{"indices":[3,10],"values":[1.0,1.0]}"""
    val warm = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":5,
         |"serve":true,"filter":"Label >= 5"}""".stripMargin)
    assert(warm.contains("\"served\":true"), warm)
    // fresh rows: ids 400..419 land ABOVE the sparse pin; Label = id%10,
    // so half pass the filter — a hit from the tail must be filter-true
    insertRows(db, sparseRows(400, 420))
    val served = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":8,
         |"serve":true,"filter":"Label >= 5"}""".stripMargin)
    assert(served.contains("\"served\":true") &&
      served.contains("\"filtered\":true"), served)
    val job = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":8,
         |"filter":"Label >= 5","response":["ID"]}""".stripMargin)
    val m = db.store("S").read()
      .select(org.apache.spark.sql.functions.col(graft.store.TableStore.RowId),
        org.apache.spark.sql.functions.col("ID"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resultIds(served).map(m) == resultIds(job, "ID"),
      s"$served vs $job")
    assert(resultIds(served).map(m).forall(_ % 10 >= 5), served)
  }

  test("sparse-ONLY declaration persists (serve_cols.json): a fresh db instance on the same root serves filtered without re-declaration") {
    val root = tmpDir("r12_sparse_only_follower")
    val db = new graft.api.GraftDb(spark, root)
    db.createTable(
      """{"name":"S","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"Label","dataType":"BIGINT"},
        |{"name":"SV","dataType":"SPARSE_VECTOR_FLOAT","dimensions":16,
        | "metricType":"DOT_PRODUCT"},
        |{"name":"SE","dataType":"SPARSE_VECTOR_FLOAT","dimensions":16,
        | "metricType":"EUCLIDEAN"}]}""".stripMargin)
    insertRows(db, sparseRows(0, 300))
    assert(db.rebuildIndex("S", "SV"))
    db.setServeFilterColumns("S", "SV", Seq("Label"))
    val qv = """{"indices":[3,10],"values":[1.0,1.0]}"""
    val follower = new graft.api.GraftDb(spark, root)
    val served = follower.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":5,
         |"serve":true,"filter":"Label >= 5"}""".stripMargin)
    assert(served.contains("\"served\":true") &&
      served.contains("\"filtered\":true"), served)
  }

  test("sparse-ONLY facets: values from the index's own scalar residency + tail sidecar, equal to the job path's envelope") {
    val db = sparseOnlyDb("r12_sparse_only_facets")
    insertRows(db, sparseRows(0, 400))
    assert(db.rebuildIndex("S", "SV"))
    db.setServeFilterColumns("S", "SV", Seq("Label", "ID"))
    // fresh rows above the pin so the sidecar leg is exercised too
    insertRows(db, sparseRows(400, 420))
    val qv = """{"indices":[3,10],"values":[1.0,1.0]}"""
    val req =
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":8,
         |"filter":"Label >= 5",
         |"facets":[{"group":["Label"],"aggregate":["COUNT(*)","SUM(ID)"]}]""".stripMargin
    val served = db.query(req + ""","serve":true}""")
    assert(served.contains("\"served\":true") &&
      served.contains("\"filtered\":true") &&
      served.contains("\"facets\":["), served)
    val job = db.query(req + "}")
    assert(!job.contains("\"served\""), job)
    assert(facetRowSets(served) == facetRowSets(job), s"$served\n$job")
    // a facet on an UNDECLARED column declines the whole request
    db.setServeFilterColumns("S", "SV", Seq("Label")) // ID no longer declared
    val undeclared = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":8,
         |"serve":true,
         |"facets":[{"group":["Label"],"aggregate":["SUM(ID)"]}]}""".stripMargin)
    assert(!undeclared.contains("\"served\""), undeclared)
  }

  test("sparse-ONLY filtered serving equals the job path over random conjunctions and NULL-bearing data (property sweep)") {
    // the FilteredServeProps backstop for the NEW verdict source: the
    // driver-side kernels over the sparse values residency must agree
    // with the Catalyst plan the job path compiles from the SAME filter
    // string, on every typed column / op / literal / NULL combination
    // the sub-grammar admits. Every row carries the query's dims
    // (all-overlap), so retrieval-mode == exact and the mask is the only
    // variable.
    val rnd = new scala.util.Random(421200L)
    val db = new graft.api.GraftDb(spark, tmpDir("r12_sparse_props"))
    db.createTable(
      """{"name":"P","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"lc","dataType":"BIGINT"},
        |{"name":"dc","dataType":"DOUBLE"},
        |{"name":"sc","dataType":"STRING"},
        |{"name":"bc","dataType":"BOOL"},
        |{"name":"SV","dataType":"SPARSE_VECTOR_FLOAT","dimensions":16,
        | "metricType":"DOT_PRODUCT"}]}""".stripMargin)
    def maybeNull[A <: AnyRef](v: A): A =
      if (rnd.nextInt(8) == 0) null.asInstanceOf[A] else v
    val rows = (0 until 700).map { i =>
      Row(i.toLong,
        maybeNull(java.lang.Long.valueOf(rnd.nextInt(50).toLong)),
        maybeNull(java.lang.Double.valueOf(math.rint(rnd.nextDouble() * 1000) / 10.0)),
        maybeNull("s" + rnd.nextInt(20)),
        maybeNull(java.lang.Boolean.valueOf(rnd.nextBoolean())),
        Row(Seq(3, 10), Seq(1.0f + (i % 7) * 0.25f, 0.5f + (i % 5) * 0.25f)))
    }
    val res = db.store("P").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), StructType(Seq(
        StructField("ID", LongType, nullable = false),
        StructField("lc", LongType, nullable = true),
        StructField("dc", DoubleType, nullable = true),
        StructField("sc", StringType, nullable = true),
        StructField("bc", BooleanType, nullable = true),
        StructField("SV", graft.functions.SparseVec.sqlType, nullable = false)))))
    assert(res.inserted == 700, res.toString)
    assert(db.rebuildIndex("P", "SV"))
    db.setServeFilterColumns("P", "SV", Seq("lc", "dc", "sc", "bc"))
    val qv = """{"indices":[3,10],"values":[1.0,1.0]}"""
    val m = db.store("P").read()
      .select(org.apache.spark.sql.functions.col(graft.store.TableStore.RowId),
        org.apache.spark.sql.functions.col("ID"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ordOps = Array("<", "<=", ">", ">=", "=", "<>")
    var nonEmptyTrials = 0
    for (trial <- 0 until 30) {
      val parts = (0 to rnd.nextInt(2)).map { _ =>
        rnd.nextInt(5) match {
          case 0 => s"lc ${ordOps(rnd.nextInt(6))} ${rnd.nextInt(50)}"
          case 1 => s"dc ${ordOps(rnd.nextInt(6))} ${rnd.nextInt(100)}"
          case 2 => s"dc ${ordOps(rnd.nextInt(6))} ${math.rint(rnd.nextDouble() * 1000) / 10.0}"
          case 3 => s"sc ${if (rnd.nextBoolean()) "=" else "<>"} 's${rnd.nextInt(20)}'"
          case 4 => s"bc ${if (rnd.nextBoolean()) "=" else "<>"} ${if (rnd.nextBoolean()) "TRUE" else "FALSE"}"
        }
      }
      val filter = parts.mkString(" AND ")
      val served = db.query(
        s"""{"table":"P","queryField":"SV","queryVector":$qv,"limit":10,
           |"serve":true,"filter":"${filter.replace("\"", "\\\"")}"}""".stripMargin)
      assert(served.contains("\"served\":true"),
        s"trial $trial declined: $filter -> $served")
      val job = db.query(
        s"""{"table":"P","queryField":"SV","queryVector":$qv,"limit":10,
           |"filter":"${filter.replace("\"", "\\\"")}","response":["ID"]}""".stripMargin)
      val got = resultIds(served).map(m)
      val expect = resultIds(job, "ID")
      assert(got == expect, s"trial $trial diverged on: $filter\n$served\n$job")
      if (expect.nonEmpty) nonEmptyTrials += 1
    }
    assert(nonEmptyTrials >= 15, s"only $nonEmptyTrials non-empty trials")
  }

  test("IoRoot is launch-time + narrow-only: updateConfig cannot widen or clear the confinement") {
    val exports = tmpDir("r12_ioroot_exports")
    val db = new graft.api.GraftDb(spark, tmpDir("r12_ioroot"),
      ioRootInit = Some(exports))
    db.dump(s"$exports/ok") // inside the launch-time root: allowed
    intercept[IllegalArgumentException](db.dump("/tmp/outside_r12_ioroot"))
    // the attack the advice named: the unauthenticated config surface
    // re-pointing the root at "/" — must throw, not widen
    intercept[IllegalArgumentException](db.updateConfig("""{"IoRoot":"/"}"""))
    intercept[IllegalArgumentException](
      db.updateConfig(s"""{"IoRoot":"${tmpDir("r12_ioroot_other")}"}"""))
    // narrowing to a subdirectory is allowed and takes effect
    db.updateConfig(s"""{"IoRoot":"$exports/sub"}""")
    intercept[IllegalArgumentException](db.dump(s"$exports/ok2"))
    db.dump(s"$exports/sub/ok3")
  }

  // ---- filter + recallTarget + facets: lookup probes the swept cover ----

  private def facetRowSets(resp: String): Seq[Set[String]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    (JsonMethods.parse(resp) \ "facets") match {
      case JArray(fs) => fs.map {
        case JArray(rows) =>
          rows.map(r => JsonMethods.compact(JsonMethods.render(r))).toSet
        case other => fail(s"bad facet entry in $resp: $other")
      }
      case other => fail(s"no facets in $resp: $other")
    }
  }

  private def denseDb(tag: String): graft.api.GraftDb = {
    val db = new graft.api.GraftDb(spark, tmpDir(tag))
    db.createTable(
      """{"name":"T","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"Label","dataType":"BIGINT"},
        |{"name":"V","dataType":"VECTOR_FLOAT","dimensions":4,
        | "metricType":"EUCLIDEAN"}]}""".stripMargin)
    val rows = (0 until 600).map { i =>
      Row(i.toLong, (i % 10).toLong,
        Seq((i % 83) / 83.0f, (i % 47) / 47.0f, (i % 29) / 29.0f,
          (i % 13) / 13.0f))
    }
    db.store("T").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), StructType(Seq(
        StructField("ID", LongType, nullable = false),
        StructField("Label", LongType, nullable = false),
        StructField("V", ArrayType(FloatType, containsNull = false),
          nullable = false)))))
    assert(db.rebuildIndex("T", "V"))
    db.setServeFilterColumns("T", "V", Seq("Label", "ID"))
    db
  }

  test("filter + recallTarget + facets SERVES: the facet lookup probes the passing-count cover the hits came from") {
    val db = denseDb("r12_facet_cover")
    val req =
      s"""{"table":"T","queryVector":[0.5,0.4,0.3,0.2],"limit":20,
         |"filter":"Label >= 5","recallTarget":1.0,
         |"facets":[{"group":["Label"],"aggregate":["COUNT(*)","SUM(ID)"]}]""".stripMargin
    val served = db.query(req + ""","serve":true}""")
    // the round-11 hint was the UNFILTERED cover, which could miss and
    // decline this exact combination — round 12 pins that it SERVES
    assert(served.contains("\"served\":true") &&
      served.contains("\"filtered\":true"), served)
    val job = db.query(req + "}")
    assert(!job.contains("\"served\""), job)
    assert(facetRowSets(served) == facetRowSets(job), s"$served\n$job")
    // the batch twin: both entries serve with facets under filter+floor
    val batch = db.query(
      s"""{"table":"T","queryVectors":[[0.5,0.4,0.3,0.2],[0.1,0.9,0.2,0.8]],
         |"limit":20,"filter":"Label >= 5","recallTarget":1.0,
         |"facets":[{"group":["Label"],"aggregate":["COUNT(*)","SUM(ID)"]}],
         |"serve":true}""".stripMargin)
    assert(batch.contains("\"served\":true"), batch)
  }

  // ---- floored hybrid: dense side serves under its proven cover ----

  private val vocab = Array("spark", "vector", "join", "scan", "stream",
    "filter", "hash", "probe", "window", "state", "plan", "fusion")

  private def hybridDb(tag: String): graft.api.GraftDb = {
    val db = new graft.api.GraftDb(spark, tmpDir(tag))
    db.createTable(
      """{"name":"T","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"Label","dataType":"BIGINT"},
        |{"name":"Doc","dataType":"STRING"},
        |{"name":"V","dataType":"VECTOR_FLOAT","dimensions":4,
        | "metricType":"EUCLIDEAN"}]}""".stripMargin)
    val rows = (0 until 600).map { i =>
      val len = 4 + (i * 7) % 9
      val doc = (0 until len).map(j => vocab((i * 5 + j * j) % vocab.length))
        .mkString(" ")
      Row(i.toLong, (i % 10).toLong, doc,
        Seq((i % 83) / 83.0f, (i % 47) / 47.0f, (i % 29) / 29.0f,
          (i % 13) / 13.0f))
    }
    db.store("T").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), StructType(Seq(
        StructField("ID", LongType, nullable = false),
        StructField("Label", LongType, nullable = false),
        StructField("Doc", StringType, nullable = false),
        StructField("V", ArrayType(FloatType, containsNull = false),
          nullable = false)))))
    assert(db.rebuildIndex("T", "V"))
    db.setServeFilterColumns("T", "V", Seq("Label"))
    db.rebuildBm25Index("T", "Doc")
    db
  }

  test("floored FILTERED hybrid: dense side serves under the passing-count cover, keyword exact on the job path; 1.0 == both-job-paths") {
    val db = hybridDb("r12_hybrid_floor")
    val req =
      s"""{"table":"T","keywords":["spark","vector","join"],
         |"textField":"Doc","queryField":"V","queryVector":[0.5,0.4,0.3,0.2],
         |"limit":10,"filter":"Label >= 5"""".stripMargin
    val plain = db.query(req + "}")
    assert(!plain.contains("\"served\""), plain)
    val floored = db.query(req + ""","serve":true,"recallTarget":1.0}""")
    assert(floored.contains("\"served\":{\"dense\":true,\"keyword\":false}"),
      floored)
    assert(resultIds(floored) == resultIds(plain), s"$floored vs $plain")
    // an undeclared-column filter declines the dense serve too: both
    // sides exact on the job paths, nothing marked served
    val undeclared = db.query(
      s"""{"table":"T","keywords":["spark","vector","join"],
         |"textField":"Doc","queryField":"V","queryVector":[0.5,0.4,0.3,0.2],
         |"limit":10,"filter":"ID >= 100","serve":true,
         |"recallTarget":1.0}""".stripMargin)
    assert(!undeclared.contains("\"served\""), undeclared)
  }

  test("sparse-ONLY floors: Euclid exact-or-decline; dot + filter serves under the zero-gap proof") {
    val db = sparseOnlyDb("r12_sparse_only_floor")
    insertRows(db, sparseRows(0, 600))
    assert(db.rebuildIndex("S", "SE"))
    assert(db.rebuildIndex("S", "SV"))
    db.setServeFilterColumns("S", "SE", Seq("Label"))
    db.setServeFilterColumns("S", "SV", Seq("Label"))
    val qv = """{"indices":[3,10],"values":[1.0,1.0]}"""
    val served = db.query(
      s"""{"table":"S","queryField":"SE","queryVector":$qv,"limit":5,
         |"serve":true,"filter":"Label >= 5","recallTarget":1.0}""".stripMargin)
    assert(served.contains("\"served\":true") &&
      served.contains("\"filtered\":true"), served)
    val job = db.query(
      s"""{"table":"S","queryField":"SE","queryVector":$qv,"limit":5,
         |"filter":"Label >= 5","response":["ID"]}""".stripMargin)
    val m = db.store("S").read()
      .select(org.apache.spark.sql.functions.col(graft.store.TableStore.RowId),
        org.apache.spark.sql.functions.col("ID"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resultIds(served).map(m) == resultIds(job, "ID"), s"$served vs $job")
    // dot + filter + floor: the zero-gap proof composes with the mask
    // (masked rows are excluded; unseen rows still score exactly 0) —
    // serves and equals the filtered job cut
    val dot = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":5,
         |"serve":true,"filter":"Label >= 5","recallTarget":1.0}""".stripMargin)
    assert(dot.contains("\"served\":true") &&
      dot.contains("\"filtered\":true"), dot)
    val dotJob = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":5,
         |"filter":"Label >= 5","response":["ID"]}""".stripMargin)
    assert(resultIds(dot).map(m) == resultIds(dotJob, "ID"), s"$dot vs $dotJob")
  }
}
