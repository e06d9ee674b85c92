"""K5 fallback — stdlib Kafka wire-protocol producer.

The primary produce path is the spark-sql-kafka connector
(sinks/kafka.py); its jar is resolved from Maven at session build, which
offline environments can't do. The reference's producer is a *client
library* (sarama, internal/kafka/kafka.go:33-198) — so the
connector-absent fallback here is the same shape: a minimal Kafka
protocol client, pure stdlib, that each executor partition drives over a
socket. ``send_kafka_stdlib`` runs ``kafka_messages`` rows through
``foreachPartition``, so the produce is distributed exactly like the
connector's (one producer per input partition, records batched into
RecordBatch v2 frames, acks=1).

Protocol surface (all public, from the Kafka protocol guide):
  - ApiVersions v0 (key 18) — optional handshake
  - Metadata    v1 (key 3)  — leader discovery per partition
  - Produce     v3 (key 0)  — message format v2 (RecordBatch, crc32c,
    zigzag varints) so record headers survive (kafka.go:60-66 sets a
    report_type header; message format v1 has no headers)

Keyed partition assignment follows sarama's default hash partitioner
(FNV-1a 32-bit, negative remainder wrapped) for parity with the
reference's producer config. Cluster behavior matches a real client:
bootstrap addresses are tried in order until one connects, each batch
is produced to ITS partition's leader from the metadata broker list,
and a NOT_LEADER_FOR_PARTITION response (leadership moved between
discovery and produce) triggers one metadata refresh + re-route before
the error propagates to Spark's task-retry layer
(tests/test_kafka_wire.py drives all three against a 2-node stub).

SASL/TLS are connector-only concerns: the fallback refuses them rather
than pretending (kafka.go's TLS/SASL maps onto the connector options in
sinks/kafka.py).
"""

from __future__ import annotations

import socket
import struct
from typing import Iterable, Iterator

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    """Kafka varint: zigzag then base-128 little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


_CRC32C_TABLE: list[int] = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), the RecordBatch v2 checksum — stdlib zlib
    only has CRC-32/ISO-HDLC, so table-driven here. Check value:
    crc32c(b'123456789') == 0xE3069283."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def fnv1a_32(data: bytes) -> int:
    h = 2166136261
    for b in data:
        h ^= b
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def sarama_partition(key: bytes, num_partitions: int) -> int:
    """sarama NewHashPartitioner semantics: FNV-1a 32 interpreted as a
    signed int32; a negative remainder wraps positive."""
    h = fnv1a_32(key)
    if h >= 1 << 31:
        h -= 1 << 32
    p = h % num_partitions
    return p if p >= 0 else p + num_partitions


def _str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    raw = s.encode()
    return struct.pack(">h", len(raw)) + raw


def _read_str(buf: bytes, pos: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from(">h", buf, pos)
    pos += 2
    if n < 0:
        return None, pos
    return buf[pos : pos + n].decode(), pos + n


# ---------------------------------------------------------------------------
# RecordBatch v2 (magic 2) encoding
# ---------------------------------------------------------------------------


def encode_record(
    offset_delta: int,
    timestamp_delta: int,
    key: bytes | None,
    value: bytes | None,
    headers: list[tuple[str, bytes | None]],
) -> bytes:
    body = bytearray()
    body += b"\x00"  # attributes
    body += zigzag_encode(timestamp_delta)
    body += zigzag_encode(offset_delta)
    for blob in (key, value):
        if blob is None:
            body += zigzag_encode(-1)
        else:
            body += zigzag_encode(len(blob)) + blob
    body += zigzag_encode(len(headers))
    for hkey, hval in headers:
        hk = hkey.encode()
        body += zigzag_encode(len(hk)) + hk
        if hval is None:
            body += zigzag_encode(-1)
        else:
            body += zigzag_encode(len(hval)) + hval
    return bytes(zigzag_encode(len(body)) + body)


def encode_record_batch(
    records: list[tuple[bytes | None, bytes | None, list[tuple[str, bytes | None]]]],
    base_timestamp_ms: int,
) -> bytes:
    """records: [(key, value, headers)] → one RecordBatch v2 frame."""
    recs = b"".join(
        encode_record(i, 0, k, v, h) for i, (k, v, h) in enumerate(records)
    )
    # crc32c covers attributes..records (everything after the crc field)
    after_crc = (
        struct.pack(">hiqqqhi", 0, len(records) - 1, base_timestamp_ms,
                    base_timestamp_ms, -1, -1, -1)
        + struct.pack(">i", len(records))
        + recs
    )
    head = struct.pack(">ibI", -1, 2, crc32c(after_crc))  # leaderEpoch, magic, crc
    batch_len = len(head) + len(after_crc)
    return struct.pack(">qi", 0, batch_len) + head + after_crc


# ---------------------------------------------------------------------------
# request framing + the three request/response pairs
# ---------------------------------------------------------------------------

_CLIENT_ID = "parsedmarc-go-spark"


def _frame(api_key: int, api_version: int, corr_id: int, body: bytes) -> bytes:
    payload = struct.pack(">hhi", api_key, api_version, corr_id) + _str(_CLIENT_ID) + body
    return struct.pack(">i", len(payload)) + payload


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = bytearray()
    while len(chunks) < n:
        part = sock.recv(n - len(chunks))
        if not part:
            raise ConnectionError("kafka broker closed the connection mid-frame")
        chunks += part
    return bytes(chunks)


def _roundtrip(sock: socket.socket, frame: bytes, corr_id: int) -> bytes:
    sock.sendall(frame)
    (size,) = struct.unpack(">i", _recv_exact(sock, 4))
    resp = _recv_exact(sock, size)
    (got_corr,) = struct.unpack_from(">i", resp, 0)
    if got_corr != corr_id:
        raise RuntimeError(f"correlation id mismatch: sent {corr_id} got {got_corr}")
    return resp[4:]


def request_metadata(
    sock: socket.socket, topic: str, corr_id: int = 1
) -> tuple[dict[int, tuple[str, int]], dict[int, int]]:
    """Metadata v1 → ({node_id: (host, port)}, {partition: leader_node})."""
    body = struct.pack(">i", 1) + _str(topic)
    resp = _roundtrip(sock, _frame(3, 1, corr_id, body), corr_id)
    pos = 0
    (n_brokers,) = struct.unpack_from(">i", resp, pos)
    pos += 4
    brokers: dict[int, tuple[str, int]] = {}
    for _ in range(n_brokers):
        (node_id,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        host, pos = _read_str(resp, pos)
        (port,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        _rack, pos = _read_str(resp, pos)
        brokers[node_id] = (host or "", port)
    pos += 4  # controller_id
    (n_topics,) = struct.unpack_from(">i", resp, pos)
    pos += 4
    leaders: dict[int, int] = {}
    for _ in range(n_topics):
        (t_err,) = struct.unpack_from(">h", resp, pos)
        pos += 2
        t_name, pos = _read_str(resp, pos)
        pos += 1  # is_internal
        (n_parts,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        for _ in range(n_parts):
            p_err, p_idx, p_leader = struct.unpack_from(">hii", resp, pos)
            pos += 10
            for _arr in range(2):  # replicas, isr
                (n,) = struct.unpack_from(">i", resp, pos)
                pos += 4 + 4 * n
            if t_name == topic:
                leaders[p_idx] = p_leader
        if t_err not in (0, 3):  # 3 = UNKNOWN_TOPIC (auto-create brokers)
            raise RuntimeError(f"metadata error {t_err} for topic {t_name!r}")
    return brokers, leaders


NOT_LEADER_FOR_PARTITION = 6


class ProduceError(RuntimeError):
    """Non-zero partition error code in a Produce response; ``code``
    keeps the broker's error number so callers can retry the retriable
    ones (NOT_LEADER_FOR_PARTITION after a metadata refresh) and fail
    fast on the rest."""

    def __init__(self, code: int, partition: int):
        super().__init__(f"produce error {code} on partition {partition}")
        self.code = code
        self.partition = partition


def request_produce(
    sock: socket.socket,
    topic: str,
    partition: int,
    batch: bytes,
    corr_id: int,
    timeout_ms: int = 30_000,
) -> None:
    """Produce v3, acks=1 — raises ProduceError on a non-zero partition
    error code."""
    body = (
        _str(None)  # transactional_id
        + struct.pack(">hi", 1, timeout_ms)  # acks, timeout
        + struct.pack(">i", 1)  # one topic
        + _str(topic)
        + struct.pack(">i", 1)  # one partition
        + struct.pack(">i", partition)
        + struct.pack(">i", len(batch))
        + batch
    )
    resp = _roundtrip(sock, _frame(0, 3, corr_id, body), corr_id)
    pos = 0
    (n_topics,) = struct.unpack_from(">i", resp, pos)
    pos += 4
    for _ in range(n_topics):
        _name, pos = _read_str(resp, pos)
        (n_parts,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        for _ in range(n_parts):
            p_idx, err = struct.unpack_from(">ih", resp, pos)
            pos += 6 + 8 + 8  # index, error, base_offset, log_append_time
            if err != 0:
                raise ProduceError(err, p_idx)


# ---------------------------------------------------------------------------
# executor-side partition producer + the DataFrame entry point
# ---------------------------------------------------------------------------


def _parse_bootstrap(bootstrap_servers: str) -> list[tuple[str, int]]:
    out = []
    for hp in bootstrap_servers.split(","):
        host, _, port = hp.strip().rpartition(":")
        out.append((host, int(port)))
    return out


def produce_partition(
    rows: Iterator,
    bootstrap_servers: str,
    topic: str,
    batch_size: int = 500,
    timeout_s: float = 30.0,
) -> None:
    """One input partition's produce: discover leaders once, group rows
    by target partition (sarama FNV-1a on the key), flush RecordBatch v2
    frames of ``batch_size``. Runs on the executor — the driver never
    sees a row."""
    first = next(rows, None)
    if first is None:
        return
    conns: dict[tuple[str, int], socket.socket] = {}

    def _conn(addr: tuple[str, int]) -> socket.socket:
        if addr not in conns:
            s = socket.create_connection(addr, timeout=timeout_s)
            conns[addr] = s
        return conns[addr]

    # bootstrap failover, sarama-style: try each listed address in order
    boot = None
    boot_err: Exception | None = None
    for boot_host, boot_port in _parse_bootstrap(bootstrap_servers):
        try:
            boot = _conn((boot_host, boot_port))
            break
        except OSError as exc:
            boot_err = exc
    if boot is None:
        raise ConnectionError(f"no bootstrap broker reachable: {boot_err}")

    corr = 0
    try:
        corr += 1
        brokers, leaders = request_metadata(boot, topic, corr)
        n_parts = max(len(leaders), 1)
        pending: dict[int, list] = {}

        def _leader_addr(part: int) -> tuple[str, int]:
            addr = brokers.get(leaders.get(part, 0), (boot_host, boot_port))
            # test doubles / NAT'd brokers may advertise an unreachable
            # name; fall back to the bootstrap address for 0.0.0.0/empty
            if not addr[0] or addr[0] == "0.0.0.0":
                addr = (boot_host, addr[1])
            return addr

        def _refresh_metadata() -> None:
            # sarama-style: any live connection can answer Metadata — the
            # broker that moved leadership may be the one that just died,
            # so never pin the refresh to the original bootstrap socket.
            # Try every open connection (bootstrap first for determinism),
            # then fresh dials through the bootstrap list; dead sockets
            # are evicted as they fail.
            nonlocal corr, brokers, leaders
            last: Exception | None = None
            live = list(conns.values())
            candidates = ([boot] if boot in live else []) + [s for s in live if s is not boot]
            for sock in candidates:
                corr += 1
                try:
                    brokers, leaders = request_metadata(sock, topic, corr)
                    return
                except OSError as exc:
                    last = exc
                    for addr, s in list(conns.items()):
                        if s is sock:
                            del conns[addr]
                            try:
                                s.close()
                            except OSError:
                                pass
            for addr in _parse_bootstrap(bootstrap_servers):
                corr += 1
                try:
                    brokers, leaders = request_metadata(_conn(addr), topic, corr)
                    return
                except OSError as exc:
                    last = exc
                    conns.pop(addr, None)
            raise ConnectionError(f"metadata refresh failed on every broker: {last}")

        def _flush(part: int) -> None:
            nonlocal corr
            recs = pending.pop(part, None)
            if not recs:
                return
            batch = encode_record_batch(recs, 0)
            for attempt in (0, 1):
                corr += 1
                try:
                    request_produce(_conn(_leader_addr(part)), topic, part, batch, corr)
                    return
                except ProduceError as exc:
                    # a leadership move between discovery and produce is
                    # routine in a real cluster (broker restart, rebalance):
                    # refresh metadata and re-route ONCE; anything else —
                    # or a second stale answer — propagates so Spark's
                    # task retry owns the failure policy
                    if exc.code != NOT_LEADER_FOR_PARTITION or attempt == 1:
                        raise
                    _refresh_metadata()

        def _feed(row) -> None:
            key = row["key"].encode() if row["key"] is not None else None
            value = row["value"].encode() if row["value"] is not None else None
            headers = [
                (h["key"], bytes(h["value"]) if h["value"] is not None else None)
                for h in (row["headers"] or [])
            ]
            part = sarama_partition(key, n_parts) if key is not None else 0
            pending.setdefault(part, []).append((key, value, headers))
            if len(pending[part]) >= batch_size:
                _flush(part)

        _feed(first)
        for row in rows:
            _feed(row)
        for part in list(pending):
            _flush(part)
    finally:
        for s in conns.values():
            try:
                s.close()
            except OSError:
                pass


def send_kafka_stdlib(
    df,
    kind: str,
    bootstrap_servers: str,
    topic: str,
    batch_size: int = 500,
) -> None:
    """Execute the produce through the stdlib wire client — the
    connector-absent path of sinks.kafka.send_kafka. Distributed via
    foreachPartition over the kafka_messages projection."""
    from parsedmarc_go_spark.sinks.writers import kafka_messages

    msgs = kafka_messages(df, kind)
    msgs.foreachPartition(
        lambda rows: produce_partition(rows, bootstrap_servers, topic, batch_size)
    )
