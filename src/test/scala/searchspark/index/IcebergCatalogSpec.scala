package searchspark.index

import org.scalatest.funsuite.AnyFunSuite

/** Offline unit tests for the Iceberg adapter's MAPPING logic (the jar
  * is absent in this sandbox, so the runtime surface can't execute;
  * what CAN be wrong offline — identifier mapping, SQL construction,
  * snapshot-record translation — is pinned here against the semantics
  * DirCatalog/IceLite implement for the same seam). */
class IcebergCatalogSpec extends AnyFunSuite {

  private val cat = new IcebergCatalog("ice")

  test("ident: pipeline paths → catalog.namespace.table") {
    assert(cat.ident("/data/warehouse/prod_idx/docs_raw") == "ice.prod_idx.docs_raw")
    assert(cat.ident("/tmp/build-7/tf") == "ice.build_7.tf")
    assert(cat.ident("relative/root/postings") == "ice.root.postings")
    // already-qualified identifiers pass through under the catalog
    assert(cat.ident("db.terms") == "ice.db.terms")
    assert(cat.ident("terms") == "ice.searchspark.terms")
    // sanitization: non-word chars, leading digit
    assert(cat.ident("/w/9x/a-b.c") == "ice.t_9x.a_b_c")
  }

  test("propsSql: sorted, quoted, single-quote-escaped") {
    assert(cat.propsSql("ice.ns.t", Map("b" -> "2", "a" -> "o'k")) ==
      "ALTER TABLE ice.ns.t SET TBLPROPERTIES ('a'='o''k', 'b'='2')")
  }

  test("timeTravelSql pins VERSION AS OF") {
    assert(cat.timeTravelSql("ice.ns.t", 42L) ==
      "SELECT * FROM ice.ns.t VERSION AS OF 42")
  }

  test("snapshotFromRow matches IceLite/DirCatalog record semantics") {
    // parent null → -1 (IceLite's 'no parent' encoding), totalRows from
    // the Iceberg total-records summary, summary carried as props
    val first = cat.snapshotFromRow(7L, None, "overwrite",
      Map("total-records" -> "123", "spark.app.id" -> "x"))
    assert(first == IceLite.Snapshot(7L, -1L, "overwrite", 123L, Nil,
      Map("total-records" -> "123", "spark.app.id" -> "x")))
    val child = cat.snapshotFromRow(8L, Some(7L), "append", Map.empty)
    assert(child.parentId == 7L && child.totalRows == 0L && child.files.isEmpty)
    // the same first-snapshot shape DirCatalog produces
    assert(first.parentId == -1L)
  }

  test("adapter satisfies the seam's type contract") {
    val tc: TableCatalog = cat
    assert(tc.isInstanceOf[TableCatalog])
  }
}
