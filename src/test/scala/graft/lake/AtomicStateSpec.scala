package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

class AtomicStateSpec extends SparkSpec {

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  test("write then read round-trips") {
    val dir = new Path(tmpDir("graft-atomic"))
    val f = new Path(dir, "state.json")
    val fs = fsFor(dir)
    AtomicState.write(fs, f, """{"v":1}""")
    assert(AtomicState.read(fs, f) === Some("""{"v":1}"""))
    AtomicState.write(fs, f, """{"v":2}""")
    assert(AtomicState.read(fs, f) === Some("""{"v":2}"""))
  }

  test("recovers from the .tmp when a crash hit between delete and rename") {
    val dir = new Path(tmpDir("graft-atomic"))
    val f = new Path(dir, "state.json")
    val fs = fsFor(dir)
    AtomicState.write(fs, f, """{"v":1}""")
    // simulate the crash window: next version fully staged in .tmp, main
    // already deleted, rename never happened
    val tmp = new Path(dir, "state.json.tmp")
    val out = fs.create(tmp, true)
    out.write("""{"v":2}""".getBytes("UTF-8")); out.close()
    fs.delete(f, false)
    assert(AtomicState.read(fs, f) === Some("""{"v":2}"""))
    // recovery promoted the tmp: subsequent reads hit the main file
    assert(fs.exists(f) && !fs.exists(tmp))
  }

  test("missing file with no tmp reads as None") {
    val dir = new Path(tmpDir("graft-atomic"))
    val fs = fsFor(dir)
    assert(AtomicState.read(fs, new Path(dir, "absent.json")) === None)
  }
}
