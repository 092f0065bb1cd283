package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mortonKey interleaves bits (x even, y odd)") {
    // x=0b101=5, y=0b011=3 → z bits: y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.mortonKey($"x", $"y", 3)).as[Long].head()
    assert(z == 27L)
    // bijectivity on a 16x16 grid
    val n = (for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .select(ZOrder.mortonKey($"x", $"y", 4).as("z"))
      .distinct().count()
    assert(n == 256L)
  }

  test("mortonSql generates the same key as mortonKey") {
    val df = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val viaSql = df.selectExpr(s"${ZOrder.mortonSql("x", "y", 5)} AS z")
    val viaCol = df.select(ZOrder.mortonKey($"x", $"y", 5).as("z"))
    assert(viaSql.except(viaCol).isEmpty && viaCol.except(viaSql).isEmpty)
  }

  test("layoutStats: the Morton layout bounds BOTH dims; single-column sorts bound one") {
    // uniform 64x64 grid, one row per cell
    val df = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong * 2.0)).toDF("u", "v")
    val stats = ZOrder.layoutStats(df, "u", "v", bits = 6, blocks = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val (zx, zy) = stats("zorder")
    val (bxX, bxY) = stats("by_x")
    val (byX, byY) = stats("by_y")
    // x-major: tight in x, full span in y (and mirrored for y-major)
    assert(bxY > zy * 4, s"by_x y-span $bxY should dwarf zorder $zy")
    assert(byX > zx * 4, s"by_y x-span $byX should dwarf zorder $zx")
    // the Morton layout's worst dimension beats both single-column
    // layouts' worst dimension
    assert(math.max(zx, zy) * 4 < math.max(bxX, bxY))
    assert(math.max(zx, zy) * 4 < math.max(byX, byY))
  }

  test("ensureZOrderedLayout: sidecar reuse, pushed 2-D predicates, file skipping") {
    val df = (for { x <- 0 until 100; y <- 0 until 100 }
      yield (x.toLong * 10000 + y, x.toLong, y.toDouble)).toDF("event_id", "u", "v")
    val dir = Files.createTempDirectory("zlayout").toString
    ZOrder.ensureZOrderedLayout(spark, df, dir, "u", "v", numFiles = 16, bits = 7)
    val f1 = new java.io.File(s"$dir/data").listFiles().map(f => f.getName -> f.lastModified).toMap
    ZOrder.ensureZOrderedLayout(spark, df, dir, "u", "v", numFiles = 16, bits = 7)
    val f2 = new java.io.File(s"$dir/data").listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(f1 == f2, "unchanged input must not rewrite the layout")

    val scan = ZOrder.scanBox(spark, dir, "u", "v", 10L, 30L, 10.0, 30.0)
    // both range predicates reach the parquet scan (the printed
    // PushedFilters list is byte-width truncated, so assert the u
    // range plus v's presence in the pushed list)
    val explained = scan.queryExecution.executedPlan.toString
    assert(explained.contains("GreaterThanOrEqual(u,10") &&
      explained.contains("IsNotNull(v)") &&
      explained.replaceAll("\\s", "").contains("DataFilters:[isnotnull(u"),
      s"both predicates must push to the scan:\n$explained")
    // correctness: equals the raw filter
    val expect = df.filter($"u".between(10, 30) && $"v".between(10.0, 30.0)).count()
    assert(scan.count() == expect)
    // the layout prunes: the box intersects well under half the files
    val (total, touched) = ZOrder.filesTouched(spark, s"$dir/data", "u", "v", 10, 30, 10, 30)
    assert(total == 16L && touched < total / 2,
      s"expected file-level pruning, box touches $touched of $total")

    // CHANGED BUILD PARAMS on the same data must invalidate the layout:
    // the sidecar fingerprints (cols, numFiles, bits), not just the
    // input — a silent reuse here would serve an 16-file layout where
    // the caller asked for 8
    ZOrder.ensureZOrderedLayout(spark, df, dir, "u", "v", numFiles = 8, bits = 7)
    val f3 = new java.io.File(s"$dir/data").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(f3 == 8, s"changed numFiles must rebuild the layout, found $f3 files")
  }

  test("writeZOrdered: 2-D box predicates touch fewer file-level min/max boxes") {
    val df = (for { x <- 0 until 100; y <- 0 until 100 }
      yield (x.toLong, y.toDouble)).toDF("u", "v")
    val base = Files.createTempDirectory("zorder").toString
    ZOrder.writeZOrdered(df, "u", "v", s"$base/z", numFiles = 16, bits = 7)
    // the single-column layout: range-partition + sort by u only
    df.repartitionByRange(16, $"u").sortWithinPartitions("u")
      .write.mode("overwrite").parquet(s"$base/byu")

    // quarter box in both dims
    val (zTotal, zBox) = ZOrder.filesTouched(spark, s"$base/z", "u", "v", 10, 30, 10, 30)
    val (uTotal, uBox) = ZOrder.filesTouched(spark, s"$base/byu", "u", "v", 10, 30, 10, 30)
    assert(zTotal == 16L && uTotal == 16L)
    assert(zBox < zTotal / 2, s"zorder should prune most files for a 2-D box, touched $zBox")

    // v-only predicate: the u-sorted layout cannot prune at all
    val (_, zV) = ZOrder.filesTouched(spark, s"$base/z", "u", "v", 0, 1000, 10, 30)
    val (_, uV) = ZOrder.filesTouched(spark, s"$base/byu", "u", "v", 0, 1000, 10, 30)
    assert(uV == uTotal, "u-sorted files all span the full v range")
    assert(zV < uV, s"zorder must prune v-only predicates too ($zV vs $uV)")
  }
}
