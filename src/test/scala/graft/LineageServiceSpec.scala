package graft

import java.net.{HttpURLConnection, URL}
import scala.io.Source

import graft.operators.{InMemoryControlBackend, JdbcControlBackend, Provenance}
import graft.service.LineageService

class LineageServiceSpec extends SparkSpec {

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new URL(s"http://127.0.0.1:$port$path").openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(30000)
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("all five reference endpoints serve provenance state as JSON") {
    val p = new Provenance(spark, new InMemoryControlBackend(spark))
    p.createBatch("b1", "hospital_a", "/raw/f1.csv", "sha1")
    p.setRowCount("b1", "VALIDATED", 10L)
    p.recordStep("b1", "INGEST", Map("k" -> "v"))
    p.recordStep("b1", "VALIDATION_PASSED", Map("rows" -> "10"))
    p.recordRule("b1", "PHI_SSN", "applied")
    p.createBatch("b2", "hospital_a", "/raw/f2.csv", "sha2")
    p.createBatch("b3", "clinic_b", "/raw/f3.jsonl", "sha3")

    val svc = new LineageService(p)
    val port = svc.start()
    try {
      // 1. batch by id (api/app.py:63-89)
      val (c1, batch) = get(port, "/provenance/batch/b1")
      assert(c1 == 200 && batch.contains("\"batch_id\":\"b1\"")
        && batch.contains("\"status\":\"VALIDATED\"") && batch.contains("\"raw_sha256\":\"sha1\""))
      // 404 on unknown id (api/app.py:75-76)
      val (c404, _) = get(port, "/provenance/batch/nope")
      assert(c404 == 404)
      // 2. steps timeline asc (api/app.py:92-103)
      val (c2, steps) = get(port, "/provenance/steps/b1")
      assert(c2 == 200
        && steps.indexOf("INGEST") < steps.indexOf("VALIDATION_PASSED"))
      // 3. rules applied (api/app.py:106-120)
      val (c3, rules) = get(port, "/provenance/rules/b1")
      assert(c3 == 200 && rules.contains("PHI_SSN"))
      // 4. latest batches for a source with limit (api/app.py:123-135)
      val (c4, bySource) = get(port, "/provenance/source/hospital_a?limit=1")
      assert(c4 == 200 && bySource.contains("b2") && !bySource.contains("b3"))
      assert(bySource.split("batch_id").length == 2, "limit=1 must return one row")
      // 5. search with optional filters (api/app.py:138-152)
      val (c5, found) = get(port, "/provenance/search?status=INGESTED&source=clinic_b")
      assert(c5 == 200 && found.contains("b3") && !found.contains("b1"))
      val (c5b, all) = get(port, "/provenance/search")
      assert(c5b == 200 && Seq("b1", "b2", "b3").forall(all.contains))
      // search honors ?limit= (newest first), default cap 20
      val (c5c, capped) = get(port, "/provenance/search?limit=1")
      assert(c5c == 200 && capped.split("batch_id").length == 2,
        s"limit=1 must return one row: $capped")
      assert(capped.contains("b3"), s"newest batch wins the cap: $capped")
    } finally svc.stop()
  }

  test("full pipeline on a Derby JDBC control plane, served over HTTP " +
      "(the complete reference architecture end-to-end)") {
    // reference shape: ETL writes provenance to an RDBMS (Postgres,
    // etl/db.py) and FastAPI serves lineage from it (api/app.py) — here:
    // Pipeline → JdbcControlBackend(Derby) → LineageService
    val base = Fixtures.sourceTree(Fixtures.tmpDir("srcjdbc"))
    val lake = Fixtures.tmpDir("lakejdbc").toString
    val be = new JdbcControlBackend(spark,
      s"jdbc:derby:${Fixtures.tmpDir("derbye2e")}/db;create=true")
    val p = new Pipeline(spark, lake, controlBackend = Some(be))
    p.ingest(base.toString)
    p.validatePending()
    p.scrubPending()
    val transformed = p.transformPending()
    assert(transformed.size == 3)

    val svc = new LineageService(p.provenance)
    val port = svc.start()
    try {
      // search by status hits the Derby-backed state machine
      val (cs, completed) = get(port, "/provenance/search?status=COMPLETED")
      assert(cs == 200)
      transformed.foreach { case (batchId, _) =>
        assert(completed.contains(batchId), s"$batchId missing from $completed")
      }
      // a single batch round-trips with its full hash chain
      val b1 = transformed.head._1
      val (cb, batch) = get(port, s"/provenance/batch/$b1")
      assert(cb == 200 && batch.contains("\"status\":\"COMPLETED\"")
        && batch.contains("raw_sha256") && batch.contains("final_sha256"))
      // the step timeline of that batch covers all four stages
      val (ct, steps) = get(port, s"/provenance/steps/$b1")
      assert(ct == 200)
      Seq("INGEST", "VALIDATION_PASSED", "SCRUB_PHI", "TRANSFORM").foreach(st =>
        assert(steps.contains(st), s"missing step $st in $steps"))
      // rules applied during the scrub are queryable
      val (cr, rules) = get(port, s"/provenance/rules/$b1")
      assert(cr == 200 && rules.contains("PHI_"))
    } finally svc.stop()
  }
}
