package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class IniConfigSpec extends AnyFunSuite {

  test("parses the reference config.ini shape") {
    val ini = IniConfig.parse(
      """[database]
        |host = localhost
        |port = 5432
        |user = postgres
        |password = 123""".stripMargin)
    assert(IniConfig.section(ini, "database") ===
      Map("host" -> "localhost", "port" -> "5432",
        "user" -> "postgres", "password" -> "123"))
  }

  test("configparser conventions: comments, colons, lowercased keys, last-wins") {
    val ini = IniConfig.parse(
      """; leading comment
        |[A Section]
        |# another comment
        |Key One = v1
        |key:two : with = inner
        |EMPTY =
        |dup = first
        |dup = second""".stripMargin)
    val s = IniConfig.section(ini, "A Section")
    assert(s("key one") === "v1")
    assert(s("key") === "two : with = inner",
      "first separator (here '=' vs ':' — leftmost wins) splits the line")
    assert(s("empty") === "")
    assert(s("dup") === "second")
  }

  test("leftmost separator wins when ':' precedes '='") {
    val s = IniConfig.section(
      IniConfig.parse("[s]\nurl : http://x/?a=b"), "s")
    assert(s("url") === "http://x/?a=b")
  }

  test("errors: key before section, non key-value line, missing section") {
    assertThrows[RuntimeException](IniConfig.parse("k = v"))
    assertThrows[RuntimeException](IniConfig.parse("[s]\njust words"))
    assertThrows[RuntimeException](
      IniConfig.section(IniConfig.parse("[other]\nk = v"), "database"))
  }

  test("ExtractTick.loadConfig prefers config.ini over properties") {
    val dir = java.nio.file.Files.createTempDirectory("ini")
    java.nio.file.Files.writeString(dir.resolve("config.ini"),
      """[configuration]
        |api_states_url = http://ini-wins/
        |[job_states]
        |bbox = 1,2,3,4""".stripMargin)
    java.nio.file.Files.writeString(dir.resolve("configuration.properties"),
      "api_states_url=http://props-lose/")
    val (config, job) = graft.ExtractTick.loadConfig(dir, "states")
    assert(config("api_states_url") === "http://ini-wins/")
    assert(job("bbox") === "1,2,3,4")
  }

  test("ExtractTick.loadConfig falls back to properties files") {
    val dir = java.nio.file.Files.createTempDirectory("props")
    java.nio.file.Files.writeString(dir.resolve("configuration.properties"),
      "api_states_url=http://props/")
    java.nio.file.Files.writeString(dir.resolve("job_states.properties"),
      "bbox=9,9,9,9")
    val (config, job) = graft.ExtractTick.loadConfig(dir, "states")
    assert(config("api_states_url") === "http://props/")
    assert(job("bbox") === "9,9,9,9")
  }
}
