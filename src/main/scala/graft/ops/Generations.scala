package graft.ops

import org.apache.spark.sql.SparkSession

/** The generation-pointer protocol shared by the serving indexes
  * ([[LshIndex]], [[Similarity]]'s IVF index): relations live under
  * `dir/gen-<n>`, a one-line `dir/CURRENT` names the live generation,
  * and an in-place compaction writes generation n+1 then atomically
  * swaps the pointer — the previous generation stays on disk for
  * in-flight readers. Flat (non-versioned) directories resolve to
  * themselves, so every index function serves both layouts.
  *
  * The swap is a small-file create + delete + rename; during the brief
  * window with no `CURRENT`, [[root]] serves the newest COMPLETE
  * generation — [[setCurrent]] drops a `_GRAFT_GEN_COMPLETE` marker
  * into the generation before touching the pointer (the
  * [[Restart]] `_GRAFT_COMMITTED` convention), so a reader in the gap
  * merely sees the compaction a moment early, and a generation a
  * compaction crashed mid-write (no marker yet) is never served even
  * if a second crash also lost `CURRENT`. Generations from builds
  * predating the marker carry none; with no marked generation the
  * fallback is the newest generation (their writers always completed
  * the swap, so reaching the fallback at all means only the benign
  * delete→rename gap).
  *
  * Single writer per index dir (the ingest loop), as with any
  * checkpoint location. Writer crash recovery is single-step: a crash
  * between the delete and the rename leaves no `CURRENT`; the writer
  * (or operator) re-runs [[setCurrent]] with the generation it was
  * swapping to — the marker is already in place and the swap is
  * idempotent. */
private[ops] object Generations {
  val CurrentFile = "CURRENT"
  val CompleteMarker = "_GRAFT_GEN_COMPLETE"
  private val GenRe = "^gen-(\\d+)$".r

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def numbers(spark: SparkSession, dir: String): Seq[Int] = {
    val (fs, p) = fsOf(spark, dir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .flatMap(_.getPath.getName match {
        case GenRe(n) => Some(n.toInt)
        case _        => None
      })
  }

  def isVersioned(spark: SparkSession, dir: String): Boolean = {
    val (fs, _) = fsOf(spark, dir)
    numbers(spark, dir).nonEmpty ||
      fs.exists(new org.apache.hadoop.fs.Path(dir, CurrentFile))
  }

  /** The directory actually holding the live relations. */
  def root(spark: SparkSession, dir: String): String = {
    val (fs, _) = fsOf(spark, dir)
    val cur = new org.apache.hadoop.fs.Path(dir, CurrentFile)
    if (fs.exists(cur)) {
      val in = fs.open(cur)
      val name = try scala.io.Source.fromInputStream(in).mkString.trim
                 finally in.close()
      s"$dir/$name"
    } else numbers(spark, dir) match {
      case Nil  => dir
      case gens =>
        // no CURRENT (the swap gap, or a writer crash inside it):
        // prefer the newest generation whose writer finished it —
        // an unmarked newer generation is a compaction that crashed
        // mid-write and must not be served. No marked generation at
        // all = a pre-marker layout; newest is then correct (see the
        // object doc).
        val marked = gens.filter(n => fs.exists(
          new org.apache.hadoop.fs.Path(s"$dir/gen-$n", CompleteMarker)))
        s"$dir/gen-${(if (marked.nonEmpty) marked else gens).max}"
    }
  }

  /** Mark `gen` complete, then atomically swap the pointer to it.
    * Idempotent — re-running after a writer crash anywhere inside
    * (marker written / CURRENT deleted / rename lost) converges to the
    * same end state, which IS the documented recovery step. */
  def setCurrent(spark: SparkSession, dir: String, gen: String): Unit = {
    val (fs, _) = fsOf(spark, dir)
    // marker BEFORE the pointer: once CURRENT can name (or fall back
    // to) this generation, it is durably complete
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/$gen", CompleteMarker),
      true).close()
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$CurrentFile.tmp")
    val dst = new org.apache.hadoop.fs.Path(dir, CurrentFile)
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      sys.error(s"Generations: CURRENT swap rename failed for $dir -> $gen")
  }

  /** The next generation name for an in-place compaction; refuses flat
    * layouts (their compaction contract is the caller-side cutover). */
  def nextGen(spark: SparkSession, dir: String, flatAdvice: String): String = {
    require(isVersioned(spark, dir),
      s"in-place compaction needs a versioned index; $dir has no " +
        s"generations — $flatAdvice")
    s"gen-${numbers(spark, dir).max + 1}"
  }
}
