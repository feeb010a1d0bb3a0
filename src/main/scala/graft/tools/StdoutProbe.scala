package graft.tools

/** Bench-stdout-contract probe: prints exactly one JSON line and exits.
  *
  * The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`;
  * rounds 7-9 lost the bench signal to sbt log decoration (`[info] ` prefix
  * + trailing `[success]` banner). This main validates the build-level fix
  * (`outputStrategy := StdoutOutput`, `showSuccess := false`) in seconds
  * instead of a full bench run:
  *
  *   sbt "runMain graft.tools.StdoutProbe" 2>/dev/null | tail -1
  *
  * must be the literal `{"metric":"probe","value":1,"unit":"line"}` —
  * undecorated, final, parseable.
  */
object StdoutProbe {
  def main(args: Array[String]): Unit = {
    println("""{"metric":"probe","value":1,"unit":"line"}""")
    System.out.flush()
  }
}
