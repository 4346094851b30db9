package graft.core

/** Tree queries: walk / walkElements / findById / findAllByTagName /
  * findAllByAttr / textContent / outline / chunk
  * (reference: src/public/mod.ts:1669-1795, 2179-2233).
  */
object Traversal {

  /** Pre-order iteration with depth, matching the reference's walk order. */
  def iterate(children: Vector[HtmlNode]): Iterator[(HtmlNode, Int)] = {
    def go(nodes: Vector[HtmlNode], depth: Int): Iterator[(HtmlNode, Int)] =
      nodes.iterator.flatMap {
        case e: ElementNode => Iterator((e, depth)) ++ go(e.children, depth + 1)
        case n              => Iterator((n, depth))
      }
    go(children, 0)
  }

  def walk(tree: DocumentTree)(visitor: (HtmlNode, Int) => Unit): Unit =
    iterate(tree.children).foreach { case (n, d) => visitor(n, d) }

  def walk(tree: FragmentTree)(visitor: (HtmlNode, Int) => Unit): Unit =
    iterate(tree.children).foreach { case (n, d) => visitor(n, d) }

  def walkElements(tree: DocumentTree)(visitor: (ElementNode, Int) => Unit): Unit =
    iterate(tree.children).foreach {
      case (e: ElementNode, d) => visitor(e, d)
      case _                   =>
    }

  def findById(children: Vector[HtmlNode], id: Int): Option[HtmlNode] =
    iterate(children).collectFirst { case (n, _) if n.id == id => n }

  def findAllByTagName(children: Vector[HtmlNode], tagName: String): Iterator[ElementNode] = {
    val normalized = tagName.toLowerCase
    iterate(children).collect {
      case (e: ElementNode, _) if e.tagName.toLowerCase == normalized => e
    }
  }

  /** Attribute-name match is case-SENSITIVE here, mirroring the reference
    * (mod.ts:1749-1750).
    */
  def findAllByAttr(
      children: Vector[HtmlNode],
      name: String,
      value: Option[String] = None
  ): Iterator[ElementNode] =
    iterate(children).collect {
      case (e: ElementNode, _)
          if e.attributes.exists(a =>
            a.name == name && value.forall(_ == a.value)) => e
    }

  def textContent(node: HtmlNode): String = node match {
    case t: TextNode    => t.value
    case e: ElementNode => e.children.map(textContent).mkString
    case _              => ""
  }

  def textContent(children: Vector[HtmlNode]): String =
    children.map(textContent).mkString

  // ------------------------------------------------------------------
  def outline(children: Vector[HtmlNode]): Outline = {
    val entries = Vector.newBuilder[OutlineEntry]
    def collect(node: HtmlNode, depth: Int): Unit = node match {
      case e: ElementNode =>
        val normalized = e.tagName.toLowerCase
        if (normalized.matches("^h[1-6]$") || normalized == "section" ||
          normalized == "article") {
          entries += OutlineEntry(e.id, depth, e.tagName, textContent(e).take(200))
        }
        e.children.foreach(c => collect(c, depth + 1))
      case _ =>
    }
    children.foreach(c => collect(c, 0))
    Outline(entries.result())
  }

  private def countNodes(node: HtmlNode): Int = node match {
    case e: ElementNode => 1 + e.children.map(countNodes).sum
    case _              => 1
  }

  /** Greedy packing of top-level siblings under maxChars/maxNodes/maxBytes
    * caps (reference: mod.ts:2179-2233). Bytes are UTF-8 lengths.
    */
  def chunk(children: Vector[HtmlNode], options: ChunkOptions = ChunkOptions()): Vector[Chunk] = {
    val chunks = Vector.newBuilder[Chunk]
    var activeContent = new java.lang.StringBuilder
    var activeNodes = 0
    var activeBytes = 0L
    var activeNodeId = -1
    var index = 0

    def flush(): Unit = {
      if (activeNodeId < 0) return
      chunks += Chunk(index, activeNodeId, activeContent.toString, activeNodes)
      index += 1
      activeContent = new java.lang.StringBuilder
      activeNodes = 0
      activeBytes = 0L
      activeNodeId = -1
    }

    children.foreach { node =>
      val content = Serializer.serialize(node)
      val nodes = countNodes(node)
      val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      val nextChars = activeContent.length + content.length
      val nextNodes = activeNodes + nodes
      val nextBytes = activeBytes + bytes
      if (activeNodeId >= 0 &&
        (nextChars > options.maxChars || nextNodes > options.maxNodes ||
          nextBytes > options.maxBytes)) flush()
      if (activeNodeId < 0) activeNodeId = node.id
      activeContent.append(content)
      activeNodes += nodes
      activeBytes += bytes
    }
    flush()
    chunks.result()
  }
}
