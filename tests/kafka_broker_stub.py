"""In-process Kafka broker test double.

Speaks just enough of the public Kafka wire protocol — ApiVersions v0,
Metadata v1, Produce v3 — for a producer to complete real batches over a
real socket, mirroring how test_receivers drives the HTTP receiver. The
Produce handler validates the RecordBatch v2 crc32c and decodes every
record, so the test assertions cover the encoder's exact byte layout,
not just "something arrived".
"""

from __future__ import annotations

import socketserver
import struct
import threading

from parsedmarc_go_spark.sinks.kafka_wire import crc32c, zigzag_decode


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


def decode_record_batch(batch: bytes) -> list[tuple[bytes | None, bytes | None, list]]:
    """RecordBatch v2 → [(key, value, [(hkey, hval)])]; raises on a crc
    mismatch or trailing garbage."""
    base_offset, batch_len = struct.unpack_from(">qi", batch, 0)
    leader_epoch, magic, crc = struct.unpack_from(">ibI", batch, 12)
    if magic != 2:
        raise ValueError(f"unsupported magic {magic}")
    after_crc = batch[21 : 12 + batch_len]
    if crc32c(after_crc) != crc:
        raise ValueError("crc32c mismatch")
    (n_records,) = struct.unpack_from(">i", after_crc, 36)
    pos = 40
    out = []
    for _ in range(n_records):
        rec_len, pos = zigzag_decode(after_crc, pos)
        end = pos + rec_len
        pos += 1  # attributes
        _ts_delta, pos = zigzag_decode(after_crc, pos)
        _off_delta, pos = zigzag_decode(after_crc, pos)
        blobs = []
        for _ in range(2):  # key, value
            n, pos = zigzag_decode(after_crc, pos)
            if n < 0:
                blobs.append(None)
            else:
                blobs.append(after_crc[pos : pos + n])
                pos += n
        n_headers, pos = zigzag_decode(after_crc, pos)
        headers = []
        for _ in range(n_headers):
            n, pos = zigzag_decode(after_crc, pos)
            hkey = after_crc[pos : pos + n].decode()
            pos += n
            n, pos = zigzag_decode(after_crc, pos)
            if n < 0:
                hval = None
            else:
                hval = after_crc[pos : pos + n]
                pos += n
            headers.append((hkey, hval))
        if pos != end:
            raise ValueError("record length mismatch")
        out.append((blobs[0], blobs[1], headers))
    return out


NOT_LEADER_FOR_PARTITION = 6


class KafkaBrokerStub:
    """Threaded broker-cluster double; `received[partition]` collects
    decoded (key, value, headers) tuples across all connections.

    With ``num_nodes > 1`` it becomes a cluster: every node answers
    Metadata with the full broker list and the shared leader map
    (partition p led by node ``p % num_nodes``), and a Produce sent to a
    non-leader node is rejected with NOT_LEADER_FOR_PARTITION — exactly
    what a real cluster does, so the producer's per-partition routing is
    observable. ``first_metadata_leaders`` (served to the FIRST Metadata
    request only) simulates a leadership change between discovery and
    produce, driving the client's refresh-and-retry path."""

    def __init__(
        self,
        num_partitions: int = 1,
        num_nodes: int = 1,
        first_metadata_leaders: dict[int, int] | None = None,
        bootstrap_conn_dies_after_first_metadata: bool = False,
    ):
        self.num_partitions = num_partitions
        self.num_nodes = num_nodes
        self.leaders = {p: p % num_nodes for p in range(num_partitions)}
        self.first_metadata_leaders = first_metadata_leaders
        # simulates the broker that answered discovery dying before the
        # produce round: node 0 drops each connection once the first
        # metadata has been served, so any metadata REFRESH pinned to the
        # bootstrap socket hits a dead peer and must fail over to another
        # live connection (the sarama behavior ADVICE r6 asked for)
        self.bootstrap_conn_dies_after_first_metadata = (
            bootstrap_conn_dies_after_first_metadata
        )
        self._metadata_served = False
        self.received: dict[int, list] = {}
        self.received_by_node: dict[tuple[int, int], list] = {}
        self.not_leader_rejections: list[tuple[int, int]] = []  # (node, part)
        self.errors: list[str] = []
        self._lock = threading.Lock()
        stub = self

        self._servers = []
        self._threads = []
        self.ports: list[int] = []
        for node_id in range(num_nodes):

            class Handler(socketserver.BaseRequestHandler):
                _node_id = node_id

                def handle(self) -> None:
                    try:
                        while True:
                            head = self._recv(4)
                            if head is None:
                                return
                            (size,) = struct.unpack(">i", head)
                            payload = self._recv(size)
                            if payload is None:
                                return
                            self.request.sendall(stub._dispatch(payload, self._node_id))
                            if (
                                stub.bootstrap_conn_dies_after_first_metadata
                                and self._node_id == 0
                                and stub._metadata_served
                            ):
                                return  # drop the connection: peer sees EOF
                    except Exception as exc:  # surface in the test, not stderr
                        with stub._lock:
                            stub.errors.append(repr(exc))

                def _recv(self, n: int) -> bytes | None:
                    buf = bytearray()
                    while len(buf) < n:
                        part = self.request.recv(n - len(buf))
                        if not part:
                            return None
                        buf += part
                    return bytes(buf)

            server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
            server.daemon_threads = True
            self._servers.append(server)
            self.ports.append(server.server_address[1])
            self._threads.append(
                threading.Thread(target=server.serve_forever, daemon=True)
            )
        self.port = self.ports[0]  # bootstrap node (back-compat)

    def set_leader(self, partition: int, node_id: int) -> None:
        with self._lock:
            self.leaders[partition] = node_id

    def start(self) -> "KafkaBrokerStub":
        for t in self._threads:
            t.start()
        return self

    def stop(self) -> None:
        for server in self._servers:
            server.shutdown()
            server.server_close()

    # -- request dispatch ---------------------------------------------------

    def _dispatch(self, payload: bytes, node_id: int = 0) -> bytes:
        api_key, api_version, corr_id = struct.unpack_from(">hhi", payload, 0)
        _client, pos = _read_str(payload, 8)
        body = payload[pos:]
        if api_key == 18:  # ApiVersions v0
            resp = struct.pack(">hi", 0, 3)
            for key, lo, hi in ((18, 0, 0), (3, 1, 1), (0, 3, 3)):
                resp += struct.pack(">hhh", key, lo, hi)
        elif api_key == 3:  # Metadata v1
            (n_topics,) = struct.unpack_from(">i", body, 0)
            p = 4
            names = []
            for _ in range(n_topics):
                name, p = _read_str(body, p)
                names.append(name)
            with self._lock:
                if self.first_metadata_leaders is not None and not self._metadata_served:
                    leader_map = dict(self.first_metadata_leaders)
                else:
                    leader_map = dict(self.leaders)
                self._metadata_served = True
            resp = struct.pack(">i", self.num_nodes)
            for nid, port in enumerate(self.ports):
                resp += struct.pack(">i", nid) + _str("127.0.0.1") + struct.pack(">i", port)
                resp += _str(None)  # rack
            resp += struct.pack(">i", 0)  # controller id
            resp += struct.pack(">i", len(names))
            for name in names:
                resp += struct.pack(">h", 0) + _str(name) + b"\x00"  # err, name, internal
                resp += struct.pack(">i", self.num_partitions)
                for part in range(self.num_partitions):
                    leader = leader_map.get(part, 0)
                    resp += struct.pack(">hii", 0, part, leader)  # err, index, leader
                    resp += struct.pack(">ii", 1, leader)  # replicas [leader]
                    resp += struct.pack(">ii", 1, leader)  # isr [leader]
        elif api_key == 0:  # Produce v3
            _txn, p = _read_str(body, 0)
            _acks, _timeout = struct.unpack_from(">hi", body, p)
            p += 6
            (n_topics,) = struct.unpack_from(">i", body, p)
            p += 4
            acks = []
            for _ in range(n_topics):
                name, p = _read_str(body, p)
                (n_parts,) = struct.unpack_from(">i", body, p)
                p += 4
                for _ in range(n_parts):
                    part, blen = struct.unpack_from(">ii", body, p)
                    p += 8
                    batch = body[p : p + blen]
                    p += blen
                    err = 0
                    with self._lock:
                        is_leader = self.leaders.get(part, 0) == node_id
                    if not is_leader:
                        # a real broker rejects produces for partitions it
                        # does not lead — this is what makes the client's
                        # routing and refresh-retry observable
                        err = NOT_LEADER_FOR_PARTITION
                        with self._lock:
                            self.not_leader_rejections.append((node_id, part))
                        acks.append((name, part, err))
                        continue
                    try:
                        records = decode_record_batch(batch)
                        with self._lock:
                            self.received.setdefault(part, []).extend(records)
                            self.received_by_node.setdefault((node_id, part), []).extend(
                                records
                            )
                    except ValueError as exc:
                        err = 2  # CORRUPT_MESSAGE
                        with self._lock:
                            self.errors.append(repr(exc))
                    acks.append((name, part, err))
            resp = struct.pack(">i", len(acks))
            for name, part, err in acks:
                resp += _str(name) + struct.pack(">i", 1)
                resp += struct.pack(">ihqq", part, err, 0, -1)
            resp += struct.pack(">i", 0)  # throttle_time
        else:
            raise ValueError(f"unsupported api key {api_key}")
        return struct.pack(">i", 4 + len(resp)) + struct.pack(">i", corr_id) + resp
