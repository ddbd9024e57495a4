package graft

/** Round-scoped A/B prober (rewritten every round — dev tool, not
  * product surface). Round 18: isolate the Avro container-fuzz
  * failure — build each seed's container exactly like the LoadSpec
  * fuzz test and print per-seed block structure vs decoded rows.
  */
object Scratch {

  def main(args: Array[String]): Unit = {
    import graft.sources.AvroSource
    import org.apache.spark.sql.types._
    import java.io.ByteArrayOutputStream
    import java.nio.charset.StandardCharsets.UTF_8
    def zz(out: ByteArrayOutputStream, v: Long): Unit = {
      var u = (v << 1) ^ (v >> 63)
      while ((u & ~0x7fL) != 0) {
        out.write(((u & 0x7f) | 0x80).toInt); u >>>= 7
      }
      out.write(u.toInt)
    }
    def zbytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
      zz(out, b.length.toLong); out.write(b)
    }
    def zstr(out: ByteArrayOutputStream, s: String): Unit =
      zbytes(out, s.getBytes(UTF_8))
    def deflateRaw(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(b); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](b.length + 64)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val schemaJson =
      """{"type":"record","name":"fz","fields":[
        |{"name":"id","type":"long"},
        |{"name":"v","type":["null","long"]},
        |{"name":"s","type":["string","null"]}]}""".stripMargin
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", LongType, nullable = true),
      StructField("s", StringType, nullable = true)))
    val want = schema.fields.map(f =>
      (f.name, if (f.dataType == LongType) "long" else "string",
        f.nullable))
    val longPool = IndexedSeq(0L, 1L, -1L, 63L, 64L, -64L, -65L,
      Long.MaxValue, Long.MinValue, Long.MaxValue - 1,
      Long.MinValue + 1, 1L << 35, -(1L << 35))
    val strPool = IndexedSeq("", "a", "é", "中", "😀",
      "line\nbreak", "\"q\" \\b", "x" * 300)
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(seed)
      val deflate = seed % 2 == 1
      val nRows = rnd.nextInt(50)
      case class R(id: Long, v: java.lang.Long, s: String)
      val rows = (0 until nRows).map { _ =>
        R(if (rnd.nextBoolean()) longPool(rnd.nextInt(longPool.size))
          else rnd.nextLong(),
          if (rnd.nextDouble() < 0.3) null
          else java.lang.Long.valueOf(
            if (rnd.nextBoolean()) longPool(rnd.nextInt(longPool.size))
            else rnd.nextLong()),
          if (rnd.nextDouble() < 0.3) null
          else Seq.fill(rnd.nextInt(4))(
            strPool(rnd.nextInt(strPool.size))).mkString)
      }
      def encodeRow(out: ByteArrayOutputStream, r: R): Unit = {
        zz(out, r.id)
        if (r.v == null) zz(out, 0L) else { zz(out, 1L); zz(out, r.v) }
        if (r.s == null) zz(out, 1L) else { zz(out, 0L); zstr(out, r.s) }
      }
      val out = new ByteArrayOutputStream()
      out.write('O'); out.write('b'); out.write('j'); out.write(1)
      zz(out, 1L); zstr(out, "avro.codec")
      zbytes(out, (if (deflate) "deflate" else "null").getBytes(UTF_8))
      val mb = new ByteArrayOutputStream()
      zstr(mb, "avro.schema"); zbytes(mb, schemaJson.getBytes(UTF_8))
      zstr(mb, "junk.meta")
      zbytes(mb, Array.fill(rnd.nextInt(9))(rnd.nextInt(256).toByte))
      zz(out, -2L); zz(out, mb.size.toLong); out.write(mb.toByteArray)
      zz(out, 0L)
      val sync = Array.fill[Byte](16)(rnd.nextInt(256).toByte)
      out.write(sync)
      var pos = 0
      val counts = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (pos < nRows) {
        if (rnd.nextDouble() < 0.15) counts += 0
        val k = math.min(1 + rnd.nextInt(7), nRows - pos)
        counts += k; pos += k
      }
      if (rnd.nextBoolean()) counts += 0
      var at = 0
      for (c <- counts) {
        val body = new ByteArrayOutputStream()
        rows.slice(at, at + c).foreach(encodeRow(body, _)); at += c
        val payload =
          if (deflate) deflateRaw(body.toByteArray) else body.toByteArray
        zz(out, c.toLong); zz(out, payload.length.toLong)
        out.write(payload); out.write(sync)
      }
      val bytes = out.toByteArray
      val got = try {
        Right(AvroSource.decodeFile(s"fuzz-$seed", bytes, want, schema)
          .size)
      } catch { case e: Exception => Left(e.getMessage.take(90)) }
      println(s"seed=$seed deflate=$deflate nRows=$nRows " +
        s"blocks=${counts.mkString("[", ",", "]")} got=$got")
    }
  }
}
