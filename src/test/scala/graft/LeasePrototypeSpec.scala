package graft

import graft.incr.Lease
import graft.sources.Prototypes
import graft.sources.Prototypes._
import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** A19 lease state machine (reference tests/test_listeners.py:133-259, under
  * a controlled clock) + §1.1 prototype→schema mapping. */
class LeasePrototypeSpec extends AnyFunSuite {

  test("A19: acquire, heartbeat, contention, expiry steal, release") {
    val dir = Files.createTempDirectory("lease")
    var now = 1000L
    val clock = () => now
    val w1 = new Lease(dir.resolve("pipeline.lease"), "worker-1", timeoutMs = 60000, clock)
    val w2 = new Lease(dir.resolve("pipeline.lease"), "worker-2", timeoutMs = 60000, clock)

    w1.keepAlive() // acquire
    assert(w1.holds && !w2.holds)
    // a live lease cannot be taken by another worker
    assertThrows[Lease.BusyListenerError] { w2.keepAlive() }
    // heartbeats keep it alive past the original expiry
    now += 50000; w1.keepAlive()
    now += 50000
    assertThrows[Lease.BusyListenerError] { w2.keepAlive() }
    // after timeout without heartbeat the lease is stealable
    now += 60001
    assert(!w1.holds)
    w2.keepAlive()
    assert(w2.holds)
    assertThrows[Lease.BusyListenerError] { w1.keepAlive() }
    // release hands over immediately
    w2.release()
    w1.keepAlive()
    assert(w1.holds)
  }

  test("prototype maps to nested Spark schema (no Qvarn-style flattening)") {
    // contracts-like shape: scalar fields + 2-level nesting
    // (reference realqvarn.py:155-258)
    val contracts = ResourceType("contracts", Seq(ResourceVersion("v1", Map(
      "contract_type" -> PStr,
      "start_date" -> PStr, // dates are ISO strings in the reference
      "signed" -> PBool,
      "preferred_rank" -> PInt,
      "names" -> PStrList,
      "contract_parties" -> PDictList(Map(
        "role" -> PStr,
        "resource_id" -> PStr,
        "contacts" -> PDictList(Map("address_lines" -> PStrList)))),
      "private" -> PDict(Map("note" -> PStr)),
      "body" -> PBlob))))

    val s = contracts.schema
    assert(s("id").dataType == StringType && !s("id").nullable)
    assert(s("revision").dataType == StringType)
    assert(s("names").dataType == ArrayType(StringType, containsNull = false))
    assert(s("preferred_rank").dataType == LongType)
    assert(s("body").dataType == BinaryType)
    val parties = s("contract_parties").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val contacts = parties("contacts").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(contacts("address_lines").dataType == ArrayType(StringType, containsNull = false))
    assert(s("private").dataType.isInstanceOf[StructType])
  }

  test("versioned prototypes: each version has its own schema") {
    val rt = ResourceType("orgs", Seq(
      ResourceVersion("v1", Map("names" -> PStrList)),
      ResourceVersion("v2", Map("names" -> PStrList, "country" -> PStr))))
    assert(rt.current.version == "v2")
    assert(rt.schemaOf("v1").fieldNames.count(_ == "country") == 0)
    assert(rt.schema.fieldNames.contains("country"))
    assertThrows[NoSuchElementException] { rt.schemaOf("v9") }
  }
}
