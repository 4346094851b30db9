package graft.tools
object MediumLoop {
  def main(a: Array[String]): Unit = {
    val medium = "<div><h1>Title</h1><p>alpha beta gamma</p><ul><li>a</li><li>b</li><li>c</li></ul></div>" * 200
    var i = 0
    while (i < 20000) { graft.core.HtmlParser.parse(medium); i += 1 }
  }
}
