package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Multi-pattern blocklist scan — the "banned phrase" content-filter
  * stage of a curation pipeline, run as ONE Aho–Corasick pass per
  * document regardless of pattern count.
  *
  * Semantics per pattern: leftmost NON-OVERLAPPING occurrence counts,
  * i.e. exactly what repeated `indexOf(pat, from = lastEnd)` — or SQL
  * `(length(t) - length(replace(t, pat, ''))) / length(pat)` —
  * computes, each pattern tracked independently. AC enumerates all
  * match ends in increasing position; for a fixed pattern, matches
  * sorted by end are sorted by start, so greedily keeping a match iff
  * its start is past the previous kept end reproduces the
  * `replace`-scan exactly. One shared automaton evaluates every
  * pattern simultaneously: per-document cost is O(|text| + matches),
  * independent of |patterns| — the property that makes a
  * thousand-entry blocklist affordable at 100 TB, where the naive
  * per-pattern scan is O(|text| · |patterns|).
  *
  * The automaton is a model-sized JVM singleton (built lazily from the
  * fixed pattern list per executor — nothing shuffles, nothing is
  * broadcast), and the expression participates in whole-stage codegen
  * like the other one-pass text kernels in [[TextHashFns]].
  */
object BlocklistFns {

  /** A goto/fail/output trie over the pattern set. States are dense
    * ints; transitions are per-state hash maps (the alphabet is
    * unbounded UTF-16 chars). */
  final class Automaton(val patterns: Array[String]) {
    private val gotoMaps = mutable.ArrayBuffer(
      new mutable.LongMap[Int]())
    private val outHead = mutable.ArrayBuffer(-1)
    // linked lists of (patternId, next) so shared suffixes stack
    private val outPat = mutable.ArrayBuffer.empty[Int]
    private val outNext = mutable.ArrayBuffer.empty[Int]
    private var failArr: Array[Int] = _

    private def addOut(state: Int, pat: Int): Unit = {
      outPat += pat
      outNext += outHead(state)
      outHead(state) = outPat.length - 1
    }

    // build the trie
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i).toLong
        s = gotoMaps(s).getOrElse(c, {
          gotoMaps += new mutable.LongMap[Int]()
          outHead += -1
          val ns = gotoMaps.length - 1
          gotoMaps(s).update(c, ns)
          ns
        })
        i += 1
      }
      addOut(s, pid)
    }

    // BFS failure links; merge output lists along failures
    locally {
      failArr = new Array[Int](gotoMaps.length)
      val queue = mutable.Queue.empty[Int]
      gotoMaps(0).foreach { case (_, s) => failArr(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        gotoMaps(r).foreach { case (c, s) =>
          queue += s
          var f = failArr(r)
          while (f != 0 && !gotoMaps(f).contains(c)) f = failArr(f)
          // f walked failure links from failArr(r), whose depth is
          // strictly below r's (fail links strictly decrease depth),
          // so f can never be r or s — the lookup is safe as-is
          failArr(s) = gotoMaps(f).getOrElse(c, 0)
          // append the fail state's outputs (shared suffix matches)
          var o = outHead(failArr(s))
          while (o >= 0) { addOut(s, outPat(o)); o = outNext(o) }
        }
      }
    }

    private val gotoArr: Array[mutable.LongMap[Int]] = gotoMaps.toArray
    private val outHeadArr: Array[Int] = outHead.toArray
    private val outPatArr: Array[Int] = outPat.toArray
    private val outNextArr: Array[Int] = outNext.toArray
    private val patLen: Array[Int] = patterns.map(_.length)

    /** Per-pattern leftmost non-overlapping counts in one pass. */
    def countsOf(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      val nextOk = new Array[Int](patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i).toLong
        while (s != 0 && !gotoArr(s).contains(c)) s = failArr(s)
        s = gotoArr(s).getOrElse(c, 0)
        var o = outHeadArr(s)
        while (o >= 0) {
          val p = outPatArr(o)
          val start = i - patLen(p) + 1
          if (start >= nextOk(p)) { counts(p) += 1; nextOk(p) = i + 1 }
          o = outNextArr(o)
        }
        i += 1
      }
      counts
    }
  }

  /** The fixed curation blocklist (model-sized; phrases chosen from
    * the synthetic corpus vocabulary so the operator exercises real
    * hit paths — single words, multi-word phrases, and a pair with a
    * shared suffix so the AC failure-output merge is on the hot
    * path). */
  val Patterns: Array[String] = Array(
    "query line", "sort key", "agg query", "table part",
    "window stream", "merge", "slow", "big table table",
    "customer join merge", "scan query", "an query", "stream sort")

  lazy val automaton = new Automaton(Patterns)

  def counts(text: UTF8String): GenericArrayData =
    new GenericArrayData(automaton.countsOf(text.toString))
}

/** Per-pattern non-overlapping match counts (array aligned with
  * [[BlocklistFns.Patterns]]) — one codegen'd AC pass per row. */
case class BlocklistCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    BlocklistFns.counts(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.BlocklistFns.counts($c)")
  override protected def withNewChildInternal(c: Expression)
      : BlocklistCountsExpr = copy(c)
  override def prettyName: String = "blocklist_counts"
}

object Blocklist {
  /** Column of per-pattern counts for `text`. */
  def matchCounts(text: Column): Column =
    bridge.toColumn(BlocklistCountsExpr(bridge.toExpression(text)))
}

/** License / copyright-notice detection — the code-corpus curation
  * stage (the Stack / RedPajama-style pipelines run it on every repo
  * file before training): SPDX identifiers and distinctive notice
  * lines through the SAME one-pass Aho–Corasick machinery as the
  * blocklist, then a fixed-priority classification into a per-file
  * license label feeding a per-source license manifest (data card).
  *
  * Priority: an explicit SPDX tag beats notice prose (it is the
  * machine-readable ground truth); two DIFFERENT SPDX tags in one
  * file are a `conflict`; a notice line alone classifies by the
  * notice; a bare copyright line with no license grant is
  * `copyright-only`; nothing at all is `none`. A disagreement flag
  * marks files whose single SPDX tag coexists with a notice from a
  * different license family — the real-world signal that a header
  * was copy-pasted without updating the tag. */
object LicenseFns {
  /** Pattern ids 0-3: SPDX tags; 4-8: notice lines (Apache / MIT /
    * GPL / BSD / CC-BY); 9-10: bare copyright markers. The shared
    * "SPDX-License-Identifier: " prefix keeps the trie walk on the
    * shared-prefix path; "GNU General Public License" inside a
    * longer notice exercises the fail-link outputs. */
  val Patterns: Array[String] = Array(
    "SPDX-License-Identifier: MIT",
    "SPDX-License-Identifier: Apache-2.0",
    "SPDX-License-Identifier: GPL-3.0-or-later",
    "SPDX-License-Identifier: BSD-3-Clause",
    "Licensed under the Apache License, Version 2.0",
    "Permission is hereby granted, free of charge",
    "GNU General Public License",
    "Redistribution and use in source and binary forms",
    "Creative Commons Attribution",
    "All rights reserved",
    "Copyright (c)")

  lazy val automaton = new BlocklistFns.Automaton(Patterns)

  def counts(text: UTF8String): GenericArrayData =
    new GenericArrayData(automaton.countsOf(text.toString))
}

/** Per-pattern non-overlapping match counts (aligned with
  * [[LicenseFns.Patterns]]) — one codegen'd AC pass per row. */
case class LicenseCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    LicenseFns.counts(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.LicenseFns.counts($c)")
  override protected def withNewChildInternal(c: Expression)
      : LicenseCountsExpr = copy(c)
  override def prettyName: String = "license_counts"
}

object License {
  import org.apache.spark.sql.functions._

  /** Column of per-pattern counts for `text`. */
  def matchCounts(text: Column): Column =
    bridge.toColumn(LicenseCountsExpr(bridge.toExpression(text)))

  private def hit(c: Column, pid: Int): Column =
    element_at(c, pid + 1) > 0L

  /** Number of DISTINCT SPDX tags present. */
  def spdxCount(c: Column): Column =
    (0 to 3).map(p => when(hit(c, p), 1).otherwise(0)).reduce(_ + _)

  /** Fixed-priority license label from a [[matchCounts]] array. */
  def label(c: Column): Column =
    when(spdxCount(c) >= 2, "conflict")
      .when(hit(c, 0), "mit")
      .when(hit(c, 1), "apache-2.0")
      .when(hit(c, 2), "gpl-3.0-or-later")
      .when(hit(c, 3), "bsd-3-clause")
      .when(hit(c, 4), "apache-2.0")
      .when(hit(c, 5), "mit")
      .when(hit(c, 6), "gpl")
      .when(hit(c, 7), "bsd")
      .when(hit(c, 8), "cc-by")
      .when(hit(c, 9) || hit(c, 10), "copyright-only")
      .otherwise(lit("none"))

  /** True when exactly one SPDX tag coexists with a notice line from
    * a DIFFERENT license family (tag families: 0 = MIT, 1 = Apache,
    * 2 = GPL, 3 = BSD; notice families: 4 = Apache, 5 = MIT,
    * 6 = GPL, 7 = BSD, 8 = CC). */
  def spdxNoticeDisagree(c: Column): Column =
    spdxCount(c) === 1 && (
      (hit(c, 0) && (hit(c, 4) || hit(c, 6) || hit(c, 7) || hit(c, 8))) ||
      (hit(c, 1) && (hit(c, 5) || hit(c, 6) || hit(c, 7) || hit(c, 8))) ||
      (hit(c, 2) && (hit(c, 4) || hit(c, 5) || hit(c, 7) || hit(c, 8))) ||
      (hit(c, 3) && (hit(c, 4) || hit(c, 5) || hit(c, 6) || hit(c, 8))))
}
