package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property sweep for URL canonicalization over a structured URL
  * grammar (schemes × case × www × label counts × default/odd ports ×
  * paths × tracked/plain param mixes × fragments). Batched: each
  * property materializes ONE DataFrame of generated URLs per check
  * round, not one Spark job per sample.
  */
class WebPropertySpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(r.passed, r.status.toString)
  }

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val label = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val host = for {
    www <- Gen.oneOf("", "www.", "WWW.", "www.WWW.", "WWW.www.www.")
    parts <- Gen.choose(1, 3).flatMap(Gen.listOfN(_, label))
    tld <- Gen.oneOf("com", "org", "io", "co.uk", "com.au", "de")
  } yield www + (parts :+ tld).mkString(".")
  private val param = Gen.oneOf(
    Gen.oneOf("utm_source", "utm_x", "fbclid", "gclid", "ref").map(_ + "=t1"),
    label.map(k => s"q$k=v"))
  private val url = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
    h <- host
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/A/b", "/x%20y/")
    params <- Gen.choose(0, 4).flatMap(Gen.listOfN(_, param))
    frag <- Gen.oneOf("", "#f", "#Frag/2")
  } yield scheme + "://" + h + port + path +
    (if (params.isEmpty) "" else "?" + params.mkString("&")) + frag

  private val batch = Gen.listOfN(60, url)

  private def cols(us: List[String], c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] =
    us.toDF("u").select(c(col("u")).as("v")).as[String].collect().toSeq

  test("canonicalizeUrl is idempotent") {
    check(Prop.forAll(batch) { us =>
      us.isEmpty || {
        val once = cols(us, Web.canonicalizeUrl)
        val twice = once.toList.toDF("u")
          .select(Web.canonicalizeUrl(col("u"))).as[String].collect().toSeq
        once == twice
      }
    })
  }

  test("urlHost is stable under canonicalization and never keeps www/port/case") {
    // Higher sample count than the other properties: the www-repeat
    // edge (`www.www.example.com`) hid behind lucky seeds for 14
    // rounds, so this one sweeps harder AND the host generator now
    // emits stacked-www prefixes directly.
    val p = Prop.forAll(batch) { us =>
      us.isEmpty || {
        val raw = cols(us, Web.urlHost)
        val afterCanon = cols(us, u => Web.urlHost(Web.canonicalizeUrl(u)))
        raw == afterCanon &&
          raw.forall(h => h == h.toLowerCase && !h.startsWith("www.") && !h.contains(":"))
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), p)
    assert(r.passed, r.status.toString)
  }

  test("urlHost strips every leading www label, any case") {
    val got = Seq(
      "http://www.www.example.com/a",
      "https://WWW.wWw.WWW.news.example.co.uk:443/",
      "http://wwwx.example.com/",    // not a www label — kept
      "http://sub.www.example.com/"  // interior www — kept
    ).toDF("u").select(Web.urlHost(col("u"))).as[String].collect().toSeq
    assert(got == Seq("example.com", "news.example.co.uk",
      "wwwx.example.com", "sub.www.example.com"))
  }

  test("canonical URLs carry no fragment and no tracked params; plain params survive in order") {
    // `ref` is NOT in the default tracked set (a legitimate content
    // param on code hosts) — it must SURVIVE like any plain param
    check(Prop.forAll(batch) { us =>
      us.isEmpty || cols(us, Web.canonicalizeUrl).zip(us).forall { case (c, u) =>
        val noFrag = !c.contains("#")
        val noTracked = !c.matches(".*[?&](utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid)=.*")
        // non-tracked params of the original survive, same relative order
        val keepParams = u.takeWhile(_ != '#').split("[?]", 2) match {
          case Array(_, q) => q.split("&").filterNot(
            _.matches("(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid)=.*")).toSeq
          case _ => Seq.empty
        }
        val gotParams = c.split("[?]", 2) match {
          case Array(_, q) => q.split("&").toSeq
          case _ => Seq.empty
        }
        noFrag && noTracked && gotParams == keepParams
      }
    })
  }

  test("a custom tracked set strips ref; the default preserves it and userinfo case") {
    val u = "HTTPS://UserName@Host.Example.COM:443/Path?ref=main&q=1"
    val byDefault = Seq(u).toDF("u")
      .select(Web.canonicalizeUrl(col("u"))).as[String].head()
    // scheme+host lower, userinfo case kept (RFC 3986 §6.2.2.1), ref kept
    assert(byDefault == "https://UserName@host.example.com/Path?ref=main&q=1")
    val custom = Seq(u).toDF("u")
      .select(Web.canonicalizeUrl(col("u"),
        Web.DefaultTrackedParams :+ "ref")).as[String].head()
    assert(custom == "https://UserName@host.example.com/Path?q=1")
  }

  test("registeredDomain is a dot-suffix of the host with at most 3 labels") {
    check(Prop.forAll(batch) { us =>
      us.isEmpty || {
        val hosts = cols(us, Web.urlHost).filter(_.nonEmpty)
        val doms = hosts.toList.toDF("h")
          .select(Web.registeredDomain(col("h"))).as[String].collect().toSeq
        hosts.zip(doms).forall { case (h, d) =>
          (h == d || h.endsWith("." + d)) && d.count(_ == '.') <= 2
        }
      }
    })
  }
}
