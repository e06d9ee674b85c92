"""K5 executed produce without a broker install: the stdlib wire
producer (sinks/kafka_wire.py) against the in-process protocol stub
(kafka_broker_stub.py), over real sockets, distributed via
foreachPartition — closing the one SURVEY §2 component that previously
skipped (round-4 verdict task 1)."""

from __future__ import annotations

import json

import pytest

from parsedmarc_go_spark.sinks.kafka import send_kafka
from parsedmarc_go_spark.sinks.kafka_wire import (
    crc32c,
    encode_record_batch,
    sarama_partition,
    send_kafka_stdlib,
    zigzag_decode,
    zigzag_encode,
)

from kafka_broker_stub import KafkaBrokerStub, decode_record_batch


def test_crc32c_check_value():
    # the standard CRC-32C check vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_zigzag_roundtrip():
    for n in (0, 1, -1, 63, -64, 300, -300, 2**31, -(2**31), 12345678901):
        buf = zigzag_encode(n)
        got, pos = zigzag_decode(buf, 0)
        assert (got, pos) == (n, len(buf))


def test_record_batch_roundtrip_through_independent_decoder():
    records = [
        (b"k1", b"v1", [("report_type", b"aggregate")]),
        (None, b"v2", []),
        (b"k3", None, [("h", None), ("h2", b"x")]),
    ]
    batch = encode_record_batch(records, base_timestamp_ms=1_700_000_000_000)
    assert decode_record_batch(batch) == records


def test_record_batch_crc_detects_corruption():
    batch = bytearray(encode_record_batch([(b"k", b"v", [])], 0))
    batch[-1] ^= 0xFF
    with pytest.raises(ValueError, match="crc"):
        decode_record_batch(bytes(batch))


def test_sarama_partition_range_and_wrap():
    for key in (b"rpt-1", b"example.com", b"", b"\xff" * 8):
        for n in (1, 3, 7):
            assert 0 <= sarama_partition(key, n) < n
    # determinism (the property replays rely on)
    assert sarama_partition(b"rpt-1", 3) == sarama_partition(b"rpt-1", 3)


def test_stdlib_produce_executes_end_to_end(spark):
    """The executed produce: 12 aggregate messages through
    foreachPartition → wire protocol → stub broker with 3 partitions.
    Asserts content, report_type header, and sarama partition routing."""
    stub = KafkaBrokerStub(num_partitions=3).start()
    try:
        df = spark.createDataFrame(
            [(f"rpt-{i}", f"dom{i}.example", "org") for i in range(12)],
            "report_id string, domain string, org_name string",
        ).repartition(4)
        send_kafka_stdlib(df, "aggregate", f"127.0.0.1:{stub.port}", "dmarc.aggregate")
        assert stub.errors == []
        got = [(k, v, h) for part in stub.received.values() for (k, v, h) in part]
        assert len(got) == 12
        for key, value, headers in got:
            body = json.loads(value)
            assert key.decode() == body["report_id"]
            assert headers == [("report_type", b"aggregate")]
        # routing matches the sarama default hash partitioner
        for part, records in stub.received.items():
            for key, _v, _h in records:
                assert sarama_partition(key, 3) == part
    finally:
        stub.stop()


def test_send_kafka_falls_back_when_connector_absent(spark):
    """send_kafka must execute (connector if present, wire fallback
    otherwise) — the produce path never skips."""
    stub = KafkaBrokerStub(num_partitions=1).start()
    try:
        df = spark.createDataFrame([("rpt-1", "d", "o")],
                                   "report_id string, domain string, org_name string")
        from parsedmarc_go_spark.sinks.kafka import kafka_available

        if kafka_available(spark):
            pytest.skip("connector present; fallback unreachable (covered by connector path)")
        send_kafka(df, "aggregate", f"127.0.0.1:{stub.port}", "dmarc.aggregate")
        assert stub.errors == []
        assert sum(len(v) for v in stub.received.values()) == 1
    finally:
        stub.stop()


def test_send_kafka_fallback_refuses_sasl(spark):
    df = spark.createDataFrame([("r",)], "report_id string")
    from parsedmarc_go_spark.sinks.kafka import kafka_available

    if kafka_available(spark):
        pytest.skip("connector present; SASL goes through the connector")
    with pytest.raises(RuntimeError, match="plaintext-only"):
        send_kafka(df, "aggregate", "b:9092", "t", username="u", password="p")


def test_multi_broker_routes_to_partition_leaders(spark):
    """2-node cluster, 4 partitions (leaders alternate node0/node1): the
    producer must route every batch to the partition's LEADER — a
    cluster rejects mis-routed produces, so zero NOT_LEADER rejections
    is proof of routing, not merely absence of an assertion."""
    stub = KafkaBrokerStub(num_partitions=4, num_nodes=2).start()
    try:
        df = spark.createDataFrame(
            [(f"rpt-{i}", f"dom{i}.example", "org") for i in range(24)],
            "report_id string, domain string, org_name string",
        ).repartition(3)
        send_kafka_stdlib(df, "aggregate", f"127.0.0.1:{stub.port}", "dmarc.aggregate")
        assert stub.errors == []
        assert stub.not_leader_rejections == []
        assert sum(len(v) for v in stub.received.values()) == 24
        # every record landed on the node that leads its partition
        for (node, part), records in stub.received_by_node.items():
            assert node == stub.leaders[part]
            for key, _v, _h in records:
                assert sarama_partition(key, 4) == part
        # both nodes actually served produces (the routing is real)
        assert {node for node, _ in stub.received_by_node} == {0, 1}
    finally:
        stub.stop()


def test_not_leader_retry_refreshes_metadata_and_reroutes():
    """Leadership moves between discovery and produce: the first
    Metadata answer names node0 as partition 0's leader, the truth is
    node1. The producer must hit node0, get NOT_LEADER_FOR_PARTITION,
    refresh metadata, and deliver to node1 — driven directly through
    produce_partition for a deterministic single client."""
    from parsedmarc_go_spark.sinks.kafka_wire import produce_partition

    stub = KafkaBrokerStub(
        num_partitions=1, num_nodes=2, first_metadata_leaders={0: 0}
    ).start()
    stub.set_leader(0, 1)
    try:
        rows = [
            {"key": "rpt-1", "value": '{"report_id":"rpt-1"}', "headers": []},
            {"key": "rpt-2", "value": '{"report_id":"rpt-2"}', "headers": []},
        ]
        produce_partition(iter(rows), f"127.0.0.1:{stub.port}", "dmarc.aggregate")
        assert stub.errors == []
        # the stale route was attempted exactly once, then corrected
        assert stub.not_leader_rejections == [(0, 0)]
        assert [k for k, _v, _h in stub.received_by_node[(1, 0)]] == [b"rpt-1", b"rpt-2"]
    finally:
        stub.stop()


def test_not_leader_refresh_survives_dead_bootstrap():
    """The broker that answered discovery dies before the produce round
    — the very scenario that moves leadership. Stale metadata names
    node1 as leader (truth: node2), and node0 (bootstrap) drops every
    connection after serving that first answer. The NOT_LEADER refresh
    must fail over to another live connection (node1) instead of
    pinning itself to the dead bootstrap socket, then deliver to
    node2 (ADVICE r6, kafka_wire refresh path)."""
    from parsedmarc_go_spark.sinks.kafka_wire import produce_partition

    stub = KafkaBrokerStub(
        num_partitions=1,
        num_nodes=3,
        first_metadata_leaders={0: 1},
        bootstrap_conn_dies_after_first_metadata=True,
    ).start()
    stub.set_leader(0, 2)
    try:
        rows = [{"key": "rpt-1", "value": '{"report_id":"rpt-1"}', "headers": []}]
        produce_partition(iter(rows), f"127.0.0.1:{stub.port}", "dmarc.aggregate")
        assert stub.errors == []
        # stale route hit node1 once, refresh rerouted to the real leader
        assert stub.not_leader_rejections == [(1, 0)]
        assert [k for k, _v, _h in stub.received_by_node[(2, 0)]] == [b"rpt-1"]
    finally:
        stub.stop()


def test_bootstrap_failover_skips_dead_broker():
    """sarama tries each bootstrap address until one connects: a dead
    first address must not fail the produce."""
    from parsedmarc_go_spark.sinks.kafka_wire import produce_partition

    stub = KafkaBrokerStub(num_partitions=1).start()
    try:
        dead = "127.0.0.1:1"  # port 1: connection refused
        rows = [{"key": "rpt-1", "value": "v", "headers": []}]
        produce_partition(iter(rows), f"{dead},127.0.0.1:{stub.port}", "t")
        assert stub.errors == []
        assert len(stub.received[0]) == 1
    finally:
        stub.stop()


def test_batching_splits_large_partitions(spark):
    # 30 rows, batch_size=7 → multiple RecordBatch frames, all delivered
    stub = KafkaBrokerStub(num_partitions=1).start()
    try:
        df = spark.createDataFrame(
            [(f"rpt-{i}", "d", "o") for i in range(30)],
            "report_id string, domain string, org_name string",
        ).coalesce(1)
        send_kafka_stdlib(df, "aggregate", f"127.0.0.1:{stub.port}",
                          "dmarc.aggregate", batch_size=7)
        assert stub.errors == []
        assert len(stub.received[0]) == 30
        keys = sorted(k.decode() for k, _v, _h in stub.received[0])
        assert keys == sorted(f"rpt-{i}" for i in range(30))
    finally:
        stub.stop()
