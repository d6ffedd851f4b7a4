package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.collection.mutable

/** Minimal self-contained SQLite3 file WRITER + READER — just enough
  * of the format (https://sqlite.org/fileformat2.html) to produce and
  * verify a valid GeoPackage container without a native sqlite
  * dependency (this container has none, and the reference shells out
  * to GDAL/ogr2ogr for the same step,
  * `eodatadownlandsatgoogsensor.py:2688-2845`).
  *
  * Scope (loud, not silent): rowid table b-trees only — INTEGER /
  * REAL / TEXT / BLOB / NULL values, multi-level table interiors,
  * overflow chains for oversized records. No indices, no WITHOUT
  * ROWID, no freelist, no WAL: a written file is a fresh single-shot
  * container, which is exactly what a footprint export produces. The
  * reader exists as the round-trip verifier (and is format-general
  * enough to read what sqlite itself writes for such tables).
  *
  * Layout choices: page size 4096, text encoding UTF-8, schema
  * format 1 (the most compatible; no 0/1-constant serial types),
  * legacy rollback-journal read/write versions.
  */
object SqliteFile {

  sealed trait V
  case object VNull extends V
  final case class VInt(v: Long) extends V
  final case class VReal(v: Double) extends V
  final case class VText(s: String) extends V
  final case class VBlob(b: Array[Byte]) extends V

  /** One table: `createSql` is stored verbatim in sqlite_master (and
    * is what downstream readers introspect); `rows` stream in rowid
    * order (rowids assigned 1..n unless `ipkCol` supplies them).
    *
    * `ipkCol`: index of an INTEGER PRIMARY KEY column within each
    * row, if the schema declares one. SQLite's rowid-alias
    * convention: that column is stored as NULL in the record and its
    * value IS the rowid — a writer that stored it inline would shift
    * every later column by one under a real sqlite reader. A VInt at
    * that position becomes the rowid (must ascend strictly); VNull
    * keeps auto-assignment (1..n).
    */
  final case class Table(name: String, createSql: String,
                         rows: Iterator[Seq[V]],
                         ipkCol: Option[Int] = None)

  val PageSize = 4096
  private val Usable = PageSize // reserved space 0
  // leaf-table overflow thresholds (fileformat2.html §B-tree Pages)
  private val MaxLeaf = Usable - 35
  private val MinLeaf = (Usable - 12) * 32 / 255 - 23

  // ---------- varint + record encoding ----------

  private[sources] def varint(v0: Long): Array[Byte] = {
    var v = v0
    if (v >= 0 && v <= 0x7f) return Array(v.toByte)
    // collect 7-bit groups low-to-high; 9-byte form keeps low 8 bits
    val out = mutable.ArrayBuffer.empty[Byte]
    if ((v >>> 56) != 0 || v < 0) { // needs the 9-byte form
      out += (v & 0xff).toByte
      v >>>= 8
      var i = 0
      while (i < 8) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7; i += 1 }
      return out.reverse.toArray
    }
    while (v != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    val a = out.reverse.toArray
    a(a.length - 1) = (a(a.length - 1) & 0x7f).toByte
    a
  }

  private[sources] def readVarint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i)
      if ((x & 0x80) == 0) return ((v << 7) | x, i + 1)
      v = (v << 7) | (x & 0x7f)
      i += 1
    }
    (((v << 8) | (b(off + 8) & 0xff)), 9)
  }

  private def intSerial(v: Long): (Int, Int) = { // (serial, width)
    if (v >= Byte.MinValue && v <= Byte.MaxValue) (1, 1)
    else if (v >= Short.MinValue && v <= Short.MaxValue) (2, 2)
    else if (v >= -(1L << 23) && v < (1L << 23)) (3, 3)
    else if (v >= Int.MinValue && v <= Int.MaxValue) (4, 4)
    else if (v >= -(1L << 47) && v < (1L << 47)) (5, 6)
    else (6, 8)
  }

  private def putBE(buf: mutable.ArrayBuffer[Byte], v: Long,
                    width: Int): Unit = {
    var i = width - 1
    while (i >= 0) { buf += ((v >>> (8 * i)) & 0xff).toByte; i -= 1 }
  }

  /** Encode one row as an SQLite record (header + body). */
  private[sources] def record(vals: Seq[V]): Array[Byte] = {
    val serials = vals.map {
      case VNull => (0L, Array.empty[Byte])
      case VInt(v) =>
        val (s, w) = intSerial(v)
        val b = mutable.ArrayBuffer.empty[Byte]; putBE(b, v, w)
        (s.toLong, b.toArray)
      case VReal(d) =>
        val b = mutable.ArrayBuffer.empty[Byte]
        putBE(b, java.lang.Double.doubleToLongBits(d), 8)
        (7L, b.toArray)
      case VText(s) =>
        val bytes = s.getBytes(UTF_8)
        (2L * bytes.length + 13, bytes)
      case VBlob(bl) => (2L * bl.length + 12, bl)
    }
    val serialBytes = serials.map(s => varint(s._1))
    // header length varint includes itself — iterate to fixpoint
    // (adding the length byte can widen the varint; 2 rounds suffice)
    val sLen = serialBytes.map(_.length).sum
    var hLen = sLen + 1
    if (varint(hLen).length + sLen != hLen)
      hLen = sLen + varint(sLen + 2).length
    val out = mutable.ArrayBuffer.empty[Byte]
    out ++= varint(hLen)
    serialBytes.foreach(out ++= _)
    serials.foreach(out ++= _._2)
    out.toArray
  }

  // ---------- writer ----------

  /** Write `tables` as a fresh SQLite3 database. `applicationId` and
    * `userVersion` land in the header (GeoPackage sets both).
    */
  def write(path: String, tables: Seq[Table],
            applicationId: Int = 0, userVersion: Int = 0): Unit = {
    // pages accumulate by number (1-based); page 1 is reserved for
    // the sqlite_master root and allocated LAST
    val pages = mutable.Map.empty[Int, Array[Byte]]
    var nextPage = 2
    def alloc(): Int = { val p = nextPage; nextPage += 1; p }

    // leaf-table cell for (rowid, record): local payload + overflow
    def leafCell(rowid: Long, rec: Array[Byte]): Array[Byte] = {
      val payload = rec.length
      val local =
        if (payload <= MaxLeaf) payload
        else {
          val k = MinLeaf + (payload - MinLeaf) % (Usable - 4)
          if (k <= MaxLeaf) k else MinLeaf
        }
      val cell = mutable.ArrayBuffer.empty[Byte]
      cell ++= varint(payload.toLong)
      cell ++= varint(rowid)
      cell ++= rec.take(local)
      if (local < payload) {
        // overflow chain: 4-byte next pointer + data per page
        var rest = rec.drop(local)
        val chain = mutable.ArrayBuffer.empty[Int]
        while (rest.nonEmpty) {
          val p = alloc(); chain += p
          val take = math.min(Usable - 4, rest.length)
          val pg = new Array[Byte](PageSize)
          pages(p) = pg
          // next pointer patched below; data now
          System.arraycopy(rest, 0, pg, 4, take)
          rest = rest.drop(take)
        }
        chain.zipWithIndex.foreach { case (p, i) =>
          val next = if (i + 1 < chain.size) chain(i + 1) else 0
          ByteBuffer.wrap(pages(p)).order(ByteOrder.BIG_ENDIAN)
            .putInt(0, next)
        }
        val first = mutable.ArrayBuffer.empty[Byte]
        putBE(first, chain.head.toLong, 4)
        cell ++= first
      }
      cell.toArray
    }

    /** Pack cells into pages of one b-tree level; returns
      * (page number, max rowid) per page. `hdrAt` reserves the
      * database-header offset for the page-1 special case.
      */
    def packLeaves(cells: Iterator[(Long, Array[Byte])])
        : Seq[(Int, Long)] = {
      val out = mutable.ArrayBuffer.empty[(Int, Long)]
      val cur = mutable.ArrayBuffer.empty[(Array[Byte], Long)]
      var curBytes = 0
      def flush(): Unit = if (cur.nonEmpty) {
        val p = alloc()
        pages(p) = renderPage(13, 0, cur.map(_._1).toSeq, 0)
        out += ((p, cur.last._2))
        cur.clear(); curBytes = 0
      }
      cells.foreach { case (rowid, rec) =>
        val c = leafCell(rowid, rec)
        require(c.length + 2 + 8 <= Usable,
          s"SqliteFile: single cell exceeds a page (${c.length} B) — " +
            "overflow sizing bug")
        if (8 + 2 * (cur.size + 1) + curBytes + c.length > Usable) flush()
        cur += ((c, rowid)); curBytes += c.length
      }
      flush()
      out.toSeq
    }

    /** Interior levels until one root remains. */
    def buildInterior(children: Seq[(Int, Long)]): Int =
      if (children.size == 1) children.head._1
      else {
        val levels = mutable.ArrayBuffer.empty[(Int, Long)]
        val cur = mutable.ArrayBuffer.empty[(Array[Byte], Long)]
        var curBytes = 0
        var pend: Option[(Int, Long)] = None
        def flush(right: (Int, Long)): Unit = {
          val p = alloc()
          pages(p) = renderPage(5, right._1, cur.map(_._1).toSeq, 0)
          levels += ((p, right._2))
          cur.clear(); curBytes = 0
        }
        children.foreach { case (child, maxRowid) =>
          pend.foreach { case (c, r) =>
            val cell = mutable.ArrayBuffer.empty[Byte]
            putBE(cell, c.toLong, 4); cell ++= varint(r)
            if (12 + 2 * (cur.size + 1) + curBytes + cell.length > Usable)
              flush((c, r))
            else { cur += ((cell.toArray, r)); curBytes += cell.length }
          }
          pend = Some((child, maxRowid))
        }
        flush(pend.get) // rightmost child carries no cell
        buildInterior(levels.toSeq)
      }

    def buildTable(t: Table): (Int, Long) = {
      var n = 0L
      var lastRowid = Long.MinValue
      val leaves = packLeaves(t.rows.map { r0 =>
        n += 1
        val (rowid, r) = t.ipkCol match {
          case Some(i) => r0(i) match {
            case VInt(v) => (v, r0.updated(i, VNull))
            case VNull => (n, r0)
            case other => throw new IllegalArgumentException(
              s"${t.name}: ipkCol $i must be VInt or VNull, got $other")
          }
          case None => (n, r0)
        }
        require(rowid > lastRowid,
          s"${t.name}: rowids must ascend strictly " +
            s"($rowid after $lastRowid)")
        lastRowid = rowid
        (rowid, record(r)) })
      if (leaves.isEmpty) {
        val p = alloc()
        pages(p) = renderPage(13, 0, Seq.empty, 0)
        (p, 0L)
      } else (buildInterior(leaves), n)
    }

    val roots = tables.map(t => t.name -> buildTable(t))

    // sqlite_master rows: (type, name, tbl_name, rootpage, sql)
    val masterRows = tables.zip(roots).map { case (t, (_, _)) =>
      Seq(VText("table"), VText(t.name), VText(t.name),
        VInt(roots.find(_._1 == t.name).get._2._1.toLong),
        VText(t.createSql))
    }
    val masterCells = masterRows.zipWithIndex.map { case (r, i) =>
      leafCell(i + 1L, record(r)) }
    val masterBytes = masterCells.map(_.length).sum
    require(100 + 8 + 2 * masterCells.size + masterBytes <= Usable,
      s"SqliteFile: sqlite_master needs interior pages " +
        s"(${tables.size} tables) — beyond this writer's scope")
    pages(1) = renderPage(13, 0, masterCells, 100)

    val nPages = nextPage - 1
    val buf = ByteBuffer.allocate(nPages * PageSize)
      .order(ByteOrder.BIG_ENDIAN)
    (1 to nPages).foreach { p =>
      buf.position((p - 1) * PageSize)
      buf.put(pages.getOrElse(p, new Array[Byte](PageSize)))
    }
    // database header into page 1's first 100 bytes
    buf.position(0)
    buf.put("SQLite format 3".getBytes(UTF_8)).put(0.toByte)
    buf.putShort(16, PageSize.toShort)
    buf.put(18, 1.toByte).put(19, 1.toByte) // legacy journal r/w
    buf.put(21, 64.toByte).put(22, 32.toByte).put(23, 32.toByte)
    buf.putInt(24, 1)       // change counter
    buf.putInt(28, nPages)  // database size in pages
    buf.putInt(40, 1)       // schema cookie
    buf.putInt(44, 1)       // schema format 1
    buf.putInt(56, 1)       // text encoding utf-8
    buf.putInt(60, userVersion)
    buf.putInt(68, applicationId)
    buf.putInt(92, 1)       // version-valid-for = change counter
    buf.putInt(96, 3045000) // library version stamp
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, buf.array())
  }

  /** Render one b-tree page. `hdrOff` = 100 on page 1, else 0. */
  private def renderPage(pType: Int, rightmost: Int,
                         cells: Seq[Array[Byte]], hdrOff: Int)
      : Array[Byte] = {
    val pg = new Array[Byte](PageSize)
    val bb = ByteBuffer.wrap(pg).order(ByteOrder.BIG_ENDIAN)
    val hdrLen = if (pType == 5) 12 else 8
    bb.put(hdrOff, pType.toByte)
    bb.putShort(hdrOff + 3, cells.size.toShort)
    var content = PageSize
    cells.zipWithIndex.foreach { case (c, i) =>
      content -= c.length
      System.arraycopy(c, 0, pg, content, c.length)
      bb.putShort(hdrOff + hdrLen + 2 * i, content.toShort)
    }
    bb.putShort(hdrOff + 5, content.toShort)
    if (pType == 5) bb.putInt(hdrOff + 8, rightmost)
    pg
  }

  // ---------- reader (round-trip verifier) ----------

  /** All rows of `table` (decoded values, rowid order). */
  def readTable(path: String, table: String): Seq[Seq[Any]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(new String(bytes, 0, 15, UTF_8) == "SQLite format 3",
      s"$path: not an SQLite database")
    val master = walk(bytes, 1)
    val root = master.collectFirst {
      case Seq(_, "table", name: String, _, rp: Long, _)
        if name == table => rp.toInt
    }
    require(root.isDefined, s"$path: no table '$table' in sqlite_master")
    walk(bytes, root.get).map(_.tail) // drop the leading rowid
  }

  /** Like [[readTable]] but keeps each row's rowid at position 0 —
    * the value an INTEGER PRIMARY KEY alias column actually holds.
    */
  def readTableWithRowids(path: String, table: String): Seq[Seq[Any]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val root = walk(bytes, 1).collectFirst {
      case Seq(_, "table", name: String, _, rp: Long, _)
        if name == table => rp.toInt
    }
    require(root.isDefined, s"$path: no table '$table' in sqlite_master")
    walk(bytes, root.get)
  }

  /** Table names in sqlite_master. */
  def tableNames(path: String): Seq[String] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    walk(bytes, 1).collect {
      case Seq(_, "table", name: String, _, _, _) => name }
  }

  /** Walk a table b-tree; rows come back as rowid +: values. */
  private def walk(db: Array[Byte], page: Int): Seq[Seq[Any]] = {
    val base = (page - 1) * PageSize
    val hdrOff = base + (if (page == 1) 100 else 0)
    val bb = ByteBuffer.wrap(db).order(ByteOrder.BIG_ENDIAN)
    val pType = db(hdrOff) & 0xff
    val nCells = bb.getShort(hdrOff + 3) & 0xffff
    val hdrLen = if (pType == 5) 12 else 8
    val ptrs = (0 until nCells).map(i =>
      bb.getShort(hdrOff + hdrLen + 2 * i) & 0xffff)
    pType match {
      case 5 =>
        val kids = ptrs.map(p => bb.getInt(base + p)) :+
          bb.getInt(hdrOff + 8)
        kids.flatMap(walk(db, _))
      case 13 =>
        ptrs.map { p =>
          var off = base + p
          val (payload, l1) = readVarint(db, off); off += l1
          val (rowid, l2) = readVarint(db, off); off += l2
          val local =
            if (payload <= MaxLeaf) payload.toInt
            else {
              val k = MinLeaf + (payload - MinLeaf) % (Usable - 4)
              (if (k <= MaxLeaf) k else MinLeaf).toInt
            }
          val rec = new Array[Byte](payload.toInt)
          System.arraycopy(db, off, rec, 0, local)
          if (local < payload) {
            var nxt = bb.getInt(off + local)
            var at = local
            while (nxt != 0) {
              val ob = (nxt - 1) * PageSize
              val take = math.min(Usable - 4, payload.toInt - at)
              System.arraycopy(db, ob + 4, rec, at, take)
              at += take
              nxt = bb.getInt(ob)
            }
          }
          rowid +: decodeRecord(rec)
        }
      case other => throw new IllegalStateException(
        s"SqliteFile: unsupported page type $other (index b-trees " +
          "are out of scope)")
    }
  }

  private def decodeRecord(rec: Array[Byte]): Seq[Any] = {
    val (hLen, l0) = readVarint(rec, 0)
    var hOff = l0
    val serials = mutable.ArrayBuffer.empty[Long]
    while (hOff < hLen) {
      val (s, l) = readVarint(rec, hOff); serials += s; hOff += l
    }
    var off = hLen.toInt
    serials.map { s =>
      def be(w: Int): Long = {
        var v = 0L
        (0 until w).foreach(i => v = (v << 8) | (rec(off + i) & 0xff))
        // sign-extend
        if (w < 8 && (v & (1L << (8 * w - 1))) != 0) v - (1L << (8 * w))
        else v
      }
      s match {
        case 0 => null
        case 1 => val v = be(1); off += 1; v
        case 2 => val v = be(2); off += 2; v
        case 3 => val v = be(3); off += 3; v
        case 4 => val v = be(4); off += 4; v
        case 5 => val v = be(6); off += 6; v
        case 6 => val v = be(8); off += 8; v
        case 7 =>
          val v = java.lang.Double.longBitsToDouble(be(8)); off += 8; v
        case 8 => 0L
        case 9 => 1L
        case t if t >= 13 && t % 2 == 1 =>
          val n = ((t - 13) / 2).toInt
          val v = new String(rec, off, n, UTF_8); off += n; v
        case t if t >= 12 =>
          val n = ((t - 12) / 2).toInt
          val v = java.util.Arrays.copyOfRange(rec, off, off + n)
          off += n; v
      }
    }.toSeq
  }
}
