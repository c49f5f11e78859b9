package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class DistCpSpec extends SparkSpec {

  test("distCp copies a nested tree distributively, preserving bytes") {
    val src = Files.createTempDirectory("distcp-src")
    val dst = Files.createTempDirectory("distcp-dst").resolve("staged")
    Files.createDirectories(src.resolve("a/b"))
    Files.write(src.resolve("top.txt"), "top-level".getBytes)
    Files.write(src.resolve("a/mid.bin"), Array.tabulate[Byte](4096)(_.toByte))
    Files.write(src.resolve("a/b/deep.txt"), "deep".getBytes)

    val n = Io.distCp(spark, src.toString, dst.toString)
    assert(n === 3)
    assert(new String(Files.readAllBytes(dst.resolve("top.txt"))) === "top-level")
    assert(Files.readAllBytes(dst.resolve("a/mid.bin")).toSeq ===
      Array.tabulate[Byte](4096)(_.toByte).toSeq)
    assert(new String(Files.readAllBytes(dst.resolve("a/b/deep.txt"))) === "deep")
  }

  test("distCp overwrites on re-copy (idempotent staging) and handles empty dirs") {
    val src = Files.createTempDirectory("distcp-src2")
    val dst = Files.createTempDirectory("distcp-dst2")
    Files.write(src.resolve("f.txt"), "v1".getBytes)
    assert(Io.distCp(spark, src.toString, dst.toString) === 1)
    Files.write(src.resolve("f.txt"), "v2-longer".getBytes)
    assert(Io.distCp(spark, src.toString, dst.toString) === 1)
    assert(new String(Files.readAllBytes(dst.resolve("f.txt"))) === "v2-longer")

    val empty = Files.createTempDirectory("distcp-empty")
    assert(Io.distCp(spark, empty.toString,
      Paths.get(dst.toString, "nothing").toString) === 0)
  }
}
