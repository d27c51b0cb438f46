package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import graft.query.QueryEngine
import graft.query.QueryEngine._

/** Concurrent searches against one store (the reference ships a 32-thread
  * concurrency test, engine/test/bindings/python/concurrent_test.py; Spark's
  * scheduler replaces the executor pool, so correctness under concurrency is
  * the only thing to verify). */
class ConcurrencySpec extends SparkSpec {

  test("16 concurrent top-K searches agree with the serial result") {
    val fixture = new FiveCitySpec {}
    val store = fixture.makeDenseStore()
    def run(): Seq[String] =
      QueryEngine.search(store.read(), store.schema,
        SearchRequest("EmbeddingEuclidean", DenseQuery(fixture.queryVec), 6, "",
          Seq("Doc"), withDistance = true))
        .collect().map(_.getString(0)).toSeq
    val expected = run()
    val results = Await.result(
      Future.sequence((1 to 16).map(_ => Future(run()))), 120.seconds)
    assert(results.forall(_ == expected))
  }

  test("concurrent readers during writes each see a consistent snapshot") {
    import spark.implicits._
    val schema = graft.types.TableSchema("Conc", Seq(
      graft.types.FieldSchema("ID", graft.types.FieldType.Int4, primaryKey = true),
      graft.types.FieldSchema("V", graft.types.FieldType.Str)))
    val store = graft.store.TableStore.create(spark, tmpDir("conc"), schema)
    store.insert(Seq((0, "seed")).toDF("ID", "V"))
    val writer = Future {
      (1 to 5).foreach { b =>
        store.insert(Seq((b * 10, s"b$b"), (b * 10 + 1, s"b$b")).toDF("ID", "V"))
      }
    }
    val readers = Future.sequence((1 to 8).map(_ => Future {
      (1 to 5).map { _ =>
        val n = store.count()
        // every observed count corresponds to a committed version:
        // 1 seed + 2k rows for some k
        assert(n % 2 == 1 && n >= 1 && n <= 11, s"inconsistent count $n")
        n
      }
    }))
    Await.result(writer, 120.seconds)
    Await.result(readers, 120.seconds)
    assert(store.count() == 11)
  }
}
