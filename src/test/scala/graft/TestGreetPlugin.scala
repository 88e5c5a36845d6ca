package graft

import java.io.PrintStream

/** Fixture for Dp3CliSpec's plugin test: the class body lives on the
  * test classpath; the installed jar carries only the ServiceLoader
  * registration, mirroring how a real plugin jar's classes resolve
  * through the CLI's parent classloader for shared dependencies. */
final class TestGreetPlugin extends graft.cli.CliPlugin {
  override def verb: String = "greet"
  override def run(args: Seq[String], out: PrintStream,
      err: PrintStream): Int = {
    out.println(s"hello ${args.mkString(" ")}")
    0
  }
}
