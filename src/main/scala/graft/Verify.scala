package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Canonical order-independent digest of a result: columns sorted
    * by name, each cell rendered to a deterministic string (hex for
    * binary, Spark's cast-to-string otherwise), then LENGTH-PREFIXED
    * (`<chars>:<value>`, null = the single token `n`) so no cell
    * content can shift a column boundary or collide with the null
    * sentinel — two different results cannot share a digest. Rows are
    * reduced by SUMMING two 48-bit md5 prefixes per row in
    * DECIMAL(38,0) — commutative, so no sort and no single-task
    * collect; the whole digest is one distributed aggregate.
    *
    * Purpose (r9 `parts_abc_analysis`, r10/r11 `store_vacuum_plan`): a
    * driver-side hash-fail whose gate digest here EQUALS the
    * committed digest of a clean, oracle-checked run
    * (DIGESTS_sf*.json) is proven to have produced content-identical
    * Spark output — the flake is on the compare side, adjudicable
    * from artifacts alone. A differing digest localizes a real change
    * to the gate. Computed from the WRITTEN parquet (read back), so it
    * covers the exact artifact the driver compares, not just the
    * logical plan.
    */
  def digestOf(df: DataFrame): String = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{BinaryType, DecimalType}
    val cols = df.schema.fields.sortBy(_.name).map { f =>
      val rendered = f.dataType match {
        case BinaryType => hex(col(f.name))
        case _          => col(f.name).cast("string")
      }
      // length prefix: a non-null cell is "<len>:<text>" (always
      // starts with a digit), a null is "n" — unambiguous under any
      // cell content, including cells that contain the  column
      // separator or a literal "n".
      coalesce(
        concat(length(rendered).cast("string"), lit(":"), rendered),
        lit("n"))
    }
    val h = md5(concat_ws("", cols.toSeq: _*).cast("binary"))
    val row = df.select(
        sum(conv(substring(h, 1, 12), 16, 10).cast(DecimalType(38, 0)))
          .as("d1"),
        sum(conv(substring(h, 13, 12), 16, 10).cast(DecimalType(38, 0)))
          .as("d2"),
        count(lit(1)).as("n"))
      .head()
    if (row.getLong(2) == 0L) "0-0-0"
    else s"${row.getDecimal(0).toBigInteger}-" +
      s"${row.getDecimal(1).toBigInteger}-${row.getLong(2)}"
  }

  /** A data type the canonical row sort can order (Spark cannot sort
    * MapType; everything a gate emits today is orderable, but guard
    * recursively so a future map-valued gate degrades to unsorted
    * rather than throwing). */
  private def orderable(dt: DataType): Boolean = dt match {
    case _: MapType       => false
    case ArrayType(et, _) => orderable(et)
    case st: StructType   => st.fields.forall(f => orderable(f.dataType))
    case _                => true
  }

  /** Canonical on-disk form of a gate result — the r11 verdict's #1
    * task: `store_vacuum_plan` drew a driver-side hash-fail two rounds
    * running while its content digest matched the committed baseline
    * exactly, so whatever the driver hashes is sensitive to some
    * detail of the artifact's LAYOUT. Remove every remaining layout
    * degree of freedom: fixed column order (sorted by name), a total
    * deterministic row order (sort by ALL orderable columns — gate
    * outputs are small, ≤ tens of thousands of rows), and exactly one
    * part file. `coalesce(1)` BEFORE the sort keeps it a single-task
    * in-partition sort (no range-partitioner sampling involved).
    */
  def canonical(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val named = df.columns.sorted.map(n => col(n))
    val sortCols: Seq[Column] = df.schema.fields.sortBy(_.name)
      .filter(f => orderable(f.dataType)).map(f => col(f.name)).toSeq
    val one = df.select(named.toSeq: _*).coalesce(1)
    if (sortCols.isEmpty) one else one.sortWithinPartitions(sortCols: _*)
  }

  /** Changed-gates-only selection for `--since <gitrev>` (VERDICT r13
    * #7): at ~500 gates a serial 3-SF digest refresh is ~3 full runs,
    * so incremental waves re-digest only TOUCHED gates. A gate is
    * "touched" when a source file in the changed files' REVERSE-
    * DEPENDENCY CLOSURE contains its quoted name literal — gate
    * definitions name themselves exactly once, in their defining
    * file. The closure (r15, ADVICE): gate-defining files also export
    * public helpers consumed elsewhere (SimilarityOps.knnEdgesSql
    * feeds ClusterOps' graph gates), so selecting only the changed
    * file's OWN gates under-selects and merge_digests.py could bake a
    * stale baseline mid-round. Instead: collect the top-level
    * object/class/trait names each closure file defines, pull in
    * every main-source file whose text mentions any of them, and
    * iterate to a fixpoint — substring matching over-selects (safe),
    * never under-selects, because any cross-file use of a Scala
    * symbol must spell the enclosing type's name (import or
    * qualified access).
    *
    * CONSERVATIVE fallbacks to the FULL sweep: git fails; a changed
    * file was deleted; a changed file defines no gate AND no
    * top-level type (blast radius unknowable by name); any closure
    * file declares a `package object` (whose members are usable with
    * no name mention).
    *
    * GRAIN NOTE (VERDICT r14 #7): selection is FILE-grained — a
    * one-line edit to a 9.5k-line family file (TimeSeriesOps)
    * re-verifies every gate that file defines, and the closure pulls
    * in referencing files wholesale, so edits to widely-referenced
    * files approach a full sweep. Conservative-safe by design; budget
    * accordingly. This is the iteration fast path only — the
    * round-close gate remains the full serial 3-SF sweep.
    */
  private def gatesChangedSince(rev: String): Option[Set[String]] = {
    import scala.sys.process._
    val changed =
      try Process(Seq("git", "diff", "--name-only", rev, "--",
          "src/main/scala")).!!.linesIterator
        .map(_.trim).filter(_.nonEmpty).toSeq
      catch { case e: Throwable =>
        System.err.println(s"[verify] --since: git diff failed " +
          s"(${e.getMessage}); falling back to the full sweep")
        return None
      }
    changed.find(f => !Files.exists(Paths.get(f))).foreach { f =>
      System.err.println(s"[verify] --since: $f deleted; full sweep")
      return None
    }
    val names = SparkEntry.queries.keySet
    val typeName =
      ("""(?m)^\s*(?:final\s+|case\s+|abstract\s+|sealed\s+|""" +
        """private(?:\[\w+\])?\s+|implicit\s+)*""" +
        """(?:object|class|trait)\s+([A-Za-z_][A-Za-z0-9_]*)""").r
    // every main-source file, read once
    val allFiles = {
      val s = Files.walk(Paths.get("src/main/scala"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p =>
          p.toString.endsWith(".scala")).toVector
      } finally s.close()
    }
    val texts = allFiles.map(p => p.toString -> Files.readString(p)).toMap
    // `changed` is ANY path under src/main/scala from git diff, but the
    // index above holds only .scala files — a changed non-.scala file
    // (an embedded resource, a stray .md) exists on disk, passes the
    // deleted-file check, and used to throw NoSuchElementException here
    // instead of taking the conservative fallback (ADVICE r15).
    changed.find(f => !texts.contains(f)).foreach { f =>
      System.err.println(s"[verify] --since: $f is not an indexed " +
        "main-source .scala file — blast radius unknowable, full sweep")
      return None
    }
    def gatesIn(f: String): Set[String] =
      names.filter(n => texts(f).contains("\"" + n + "\""))
    changed.find(f => gatesIn(f).isEmpty &&
        typeName.findFirstIn(texts(f)).isEmpty).foreach { f =>
      System.err.println(s"[verify] --since: $f defines no gate and " +
        "no top-level type — blast radius unknown, full sweep")
      return None
    }
    // reverse-dependency fixpoint over top-level-name mentions
    var closure = changed.toSet
    var frontier = changed.toSet
    while (frontier.nonEmpty) {
      val syms = frontier.flatMap(f =>
        typeName.findAllMatchIn(texts(f)).map(_.group(1)))
      frontier = texts.keySet.diff(closure).filter(g =>
        syms.exists(s => texts(g).contains(s)))
      closure ++= frontier
    }
    val pkgObject = """(?m)^\s*package\s+object\s+\w""".r
    closure.find(f => pkgObject.findFirstIn(texts(f)).nonEmpty)
      .foreach { f =>
        System.err.println(s"[verify] --since: $f declares a package " +
          "object (members usable without a name mention) — full sweep")
        return None
      }
    val picked = closure.flatMap(gatesIn)
    System.err.println(s"[verify] --since $rev: ${picked.size} gate(s)" +
      s" from ${changed.size} changed file(s) " +
      s"(+${closure.size - changed.size} via reverse deps): " +
      picked.toSeq.sorted.mkString(", "))
    Some(picked)
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, since) = args match {
      case Array(s, o)                => (s, o, None)
      case Array(s, o, "--since", r)  => (s, o, Some(r))
      case _ => sys.error(
        "usage: graft.Verify <sfDir> <outDir> [--since <gitrev>]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.build(cpus, "graft-verify")
    new java.io.File(outDir).mkdirs()
    // Iteration aid (same contract as Bench): run only the named
    // queries (comma-separated). The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // --since narrows to gates touched since a git rev (None = full);
    // an explicit SPARK_GRAFT_ONLY further intersects.
    val sinceSel = since.flatMap(gatesChangedSince)
    val selected = (only, sinceSel) match {
      case (Some(names), Some(ch)) =>
        SparkEntry.queries.filter(q => names(q._1) && ch(q._1))
      case (Some(names), None) => SparkEntry.queries.filter(q => names(q._1))
      case (None, Some(ch))    => SparkEntry.queries.filter(q => ch(q._1))
      case (None, None)        => SparkEntry.queries
    }
    // Complete-by-construction: EVERY selected query writes an output
    // directory. On failure we still write a one-row sentinel parquet
    // whose schema (`__verify_error`) can never match an oracle, so the
    // driver's compare records the query as a red row instead of the
    // name silently vanishing from the round's CORRECTNESS artifact.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val digests = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try {
        canonical(fn(spark, sfDir)).write.mode("overwrite")
          .option("compression", "snappy")
          .parquet(s"$outDir/$name")
        // digest the artifact as written (read back), never the plan
        digests(name) =
          try digestOf(spark.read.parquet(s"$outDir/$name"))
          catch { case e: Throwable =>
            "digest-error: " +
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          }
      }
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        failures(name) = msg
        digests(name) = "error"
        System.err.println(s"[verify] $name failed: $msg")
        try {
          import spark.implicits._
          Seq(msg.take(2000)).toDF("__verify_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name sentinel write failed: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Audit artifact: which queries threw (empty object = clean run).
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // Self-adjudication sidecar: canonical per-gate digest of the
    // written parquet (see [[digestOf]]). Compare against the repo's
    // committed DIGESTS_sf*.json baseline for the run's scale factor
    // (the builder's clean, oracle-checked runs; tools/adjudicate.py
    // picks the right one) to adjudicate a driver-side hash-fail
    // without rerunning anything.
    val digJson = digests
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/digests.json"), digJson)
    // Run metadata so tools/adjudicate.py can pick the committed
    // digest baseline for THIS run's scale factor (DIGESTS_sf*.json —
    // one per SF is committed; comparing against the wrong SF's
    // baseline would flag every gate).
    Files.writeString(Paths.get(s"$outDir/run_meta.json"),
      s"""{"sf_dir": ${q(sfDir)}, "baseline": ${q(baselineNameFor(sfDir))}}""")
    spark.stop()
  }

  /** The committed digest-baseline filename for a testdata dir — the
    * dispatch rule tools/adjudicate.py mirrors (last path component:
    * /root/testdata/sf0.1 → DIGESTS_sf0.1.json). */
  def baselineNameFor(sfDir: String): String = {
    val sf = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse("sf0.01")
    s"DIGESTS_$sf.json"
  }
}
