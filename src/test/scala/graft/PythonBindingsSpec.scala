package graft

import graft.api.{GraftCatalog, GraftHttpServer}

/** The Python binding exercised against a live server — the direct analog
  * of the reference's engine/test/bindings/python/test.py and
  * concurrent_test.py, here driven by bindings/python/smoke_test.py and
  * concurrent_smoke.py (pure-stdlib urllib client). Skips cleanly when no
  * python3 is on PATH (the binding is optional tooling, not a library
  * dependency). */
class PythonBindingsSpec extends SparkSpec {

  private def python3: Option[String] =
    Seq("python3", "python").find { p =>
      try {
        val proc = new ProcessBuilder(p, "--version").redirectErrorStream(true).start()
        proc.waitFor() == 0
      } catch { case _: java.io.IOException => false }
    }

  private def runScript(script: String, port: Int): (Int, String) = {
    val pb = new ProcessBuilder(python3.get, s"bindings/python/$script",
      "--port", port.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val code = proc.waitFor()
    (code, out)
  }

  private def withServer(f: Int => Unit): Unit = {
    val srv = new GraftHttpServer(new GraftCatalog(spark, tmpDir("pybind")), 0).start()
    try f(srv.actualPort)
    finally srv.stop()
  }

  test("python smoke_test: reference test.py flow end-to-end") {
    assume(python3.isDefined, "no python interpreter on PATH")
    withServer { port =>
      val (code, out) = runScript("smoke_test.py", port)
      assert(code == 0, s"smoke_test.py failed:\n$out")
      assert(out.contains("smoke_test OK"), out)
    }
  }

  test("python concurrent_smoke: 10x10 reader threads + interleaved writers") {
    assume(python3.isDefined, "no python interpreter on PATH")
    withServer { port =>
      val (code, out) = runScript("concurrent_smoke.py", port)
      assert(code == 0, s"concurrent_smoke.py failed:\n$out")
      assert(out.contains("concurrent_smoke OK"), out)
    }
  }

  test("python index_smoke: rebuild + ann + serve + ingest-append through the binding") {
    assume(python3.isDefined, "no python interpreter on PATH")
    withServer { port =>
      val (code, out) = runScript("index_smoke.py", port)
      assert(code == 0, s"index_smoke.py failed:\n$out")
      assert(out.contains("index_smoke OK"), out)
    }
  }

  test("python admin_smoke: describe + csv load + dump + release + leader + config") {
    assume(python3.isDefined, "no python interpreter on PATH")
    withServer { port =>
      val (code, out) = runScript("admin_smoke.py", port)
      assert(code == 0, s"admin_smoke.py failed:\n$out")
      assert(out.contains("admin_smoke OK"), out)
    }
  }
}
