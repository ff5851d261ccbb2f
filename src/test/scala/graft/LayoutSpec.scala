package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (hand-computed), monotone on the curve") {
    // x=3 (011), y=5 (101), 3 bits: even positions get x's bits, odd
    // get y's: z = x0*1 + y0*2 + x1*4 + y1*8 + x2*16 + y2*32
    //           = 1  +  2   +  4   +  0   +  0   +  32  = 39
    val r = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue($"x", $"y", bits = 3).as("z"))
      .head().getLong(0)
    assert(r == 39L)
    // corners of the 16-bit domain
    val corners = Seq((0L, 0L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L)).toDF("x", "y")
      .select(Layout.zValue($"x", $"y").as("z"))
      .as[Long].collect()
    assert(corners(0) == 0L)
    assert(corners(1) == 0x55555555L) // even bits set
    assert(corners(2) == 0xAAAAAAAAL) // odd bits set
    assert(corners(3) == 0xFFFFFFFFL)
  }

  test("z-ordered files bound BOTH dimensions; single-key sort leaves " +
      "the second dimension unpruned") {
    // deterministic uniform grid over [0,1024)^2
    val data = spark.range(0, 65536)
      .select((($"id" * 2654435761L) % 1024).as("x"),
        (($"id" * 40503L) % 1024).as("y"))
    def fileSpans(path: String): Seq[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
        .select("xs", "ys").as[(Long, Long)].collect().toSeq
    val zdir = TempDirs.createCleanedAtExit("graft-layout-z")
    Layout.zorderWrite(data, "x", "y", zdir, numFiles = 16, bits = 10)
    val zs = fileSpans(zdir)
    assert(zs.size >= 12, s"expected ~16 files, got ${zs.size}")
    // 16 curve slices fix 2 top bits of each dim; sampled range
    // boundaries blur the edges, so assert the AVERAGE span is well
    // under half the domain in BOTH dims
    val (zxAvg, zyAvg) = (zs.map(_._1).sum / zs.size.toDouble,
      zs.map(_._2).sum / zs.size.toDouble)
    assert(zxAvg < 512, s"z-order x-span avg $zxAvg")
    assert(zyAvg < 512, s"z-order y-span avg $zyAvg")
    // baseline: linear sort on x — tight x, but y spans ~the full
    // domain in every file (no pruning for y predicates)
    val ldir = TempDirs.createCleanedAtExit("graft-layout-linear")
    data.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(ldir)
    val ls = fileSpans(ldir)
    val lyAvg = ls.map(_._2).sum / ls.size.toDouble
    assert(lyAvg > 900, s"linear-sort y-span avg $lyAvg")
    assert(zyAvg < lyAvg / 2,
      s"z-order y-span $zyAvg not better than linear $lyAvg")
  }

  test("bloom-enabled parquet write carries the filter in the footer " +
    "for the enrolled column only, and it answers membership") {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val out = TempDirs.createCleanedAtExit("graft-bloom-spec") + "/t"
    spark.range(0, 5000)
      .select(($"id" * 7919).as("k"), ($"id" % 13).as("v"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", "5000")
      .parquet(out)
    val part = new java.io.File(out).listFiles()
      .find(f => f.getName.startsWith("part-")
        && f.getName.endsWith(".parquet")).get
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(part.getAbsolutePath), new Configuration()))
    try {
      val rg = reader.getRowGroups.get(0)
      import scala.jdk.CollectionConverters._
      val byName = rg.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      assert(byName("k").getBloomFilterOffset >= 0,
        "enrolled column k lost its bloom filter")
      assert(byName("v").getBloomFilterOffset < 0,
        "non-enrolled column v grew a bloom filter")
      val bloom = reader.getBloomFilterDataReader(rg)
        .readBloomFilter(byName("k"))
      assert(bloom != null)
      // a present key hashes to a hit; blooms have no false negatives
      assert(bloom.findHash(bloom.hash(7919L * 42)),
        "present key missing from bloom")
      // and SOME absent key must miss (filter is not saturated)
      val anyMiss = (1L to 50L)
        .exists(i => !bloom.findHash(bloom.hash(7919L * i + 3)))
      assert(anyMiss, "bloom saturated: every absent key hit")
    } finally reader.close()
  }
}
