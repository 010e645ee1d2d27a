"""S1 as a first-class Spark source: the reference's HTTP poller
(resources/services/ingestion-worker/lib.js:36-50 — GET
blockchain.info/unconfirmed-transactions every INGESTION_INTERVAL ms,
~100 txs per poll) implemented with the PySpark 4 Python Data Source
API instead of an out-of-engine Fargate worker.

Design:
- One *poll* is the unit of work everywhere: a batch read maps one
  poll to one InputPartition (a backfill over M polls parallelizes
  across executors); the stream advances its offset by one poll per
  micro-batch via ``SimpleDataSourceStreamReader`` (driver-side read —
  the documented fit for low-rate sources; the poller's ceiling is
  ~6.7 rec/s, BASELINE.md).
- The ``endpoint`` option picks the backend. ``fake://`` (default)
  is a deterministic generator keyed ONLY by (seed, poll index), so a
  replayed offset range reproduces identical rows — the source is
  replayable and checkpoint recovery is exactly-once. An ``http(s)``
  endpoint does a real GET (stdlib urllib, gated — this container has
  no network); live polls are inherently non-replayable, giving
  at-least-once, the same contract as the reference (Flink snapshots
  disabled, feature-store.ts:299) whose safety comes from the
  idempotent keyed upsert downstream (T5).
- ~5% duplicate hashes are injected by the fake backend (FIXTURES.md
  §1 requires dup traffic to exercise P1 dedup).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..schemas import TRANSACTION_SCHEMA

__all__ = ["BlockchainPollDataSource", "register", "fake_poll_rows"]

_BASE_EPOCH = 1_704_067_200  # 2024-01-01 00:00:00 UTC
_POLL_INTERVAL_S = 15  # data-ingestion-stack.ts:159


def fake_poll_rows(poll: int, per_poll: int, seed: str) -> list[tuple]:
    """Deterministic stand-in for one GET: ``per_poll`` transactions
    whose every field is a pure function of (seed, global tx index).
    Every 20th tx repeats the previous hash (~5% dups, FIXTURES.md §1);
    event times tick 1s apart inside the 15s poll window with ~2 rows
    per poll out of order (watermark-drop traffic)."""
    rows = []
    base = poll * per_poll
    for j in range(per_poll):
        txid = base + j
        h = hashlib.sha256(f"{seed}:{txid}".encode()).hexdigest()
        if j % 20 == 19:  # duplicate of the previous tx
            h = hashlib.sha256(f"{seed}:{txid - 1}".encode()).hexdigest()
        disorder = -90 if j % 50 == 37 else 0  # late arrival, up to 90s
        t = _BASE_EPOCH + poll * _POLL_INTERVAL_S + (j % _POLL_INTERVAL_S) + disorder
        rows.append(
            (
                h,
                1,  # ver
                txid % 10 + 1,  # vin_sz
                txid % 7 + 1,  # vout_sz
                txid % 1000 + 200,  # size
                txid % 4000 + 800,  # weight
                txid % 500 + 10,  # fee
                f"10.0.{poll % 256}.{j % 256}",  # relayed_by
                0,  # lock_time
                txid,  # tx_index
                False,  # double_spend
                t,  # time (epoch s)
                0,  # block_index
                0,  # block_height
                "[]",  # inputs (opaque JSON, source-schema.json:104-107)
                "[]",  # out
                txid % 13 == 0,  # rbf
            )
        )
    return rows


def _http_poll_rows(endpoint: str, per_poll: int) -> list[tuple]:
    """Real GET against a blockchain.info-shaped endpoint
    (lib.js:38: .../unconfirmed-transactions?format=json)."""
    from urllib.request import urlopen  # stdlib; no extra deps

    with urlopen(endpoint, timeout=10) as resp:  # noqa: S310 (caller-config URL)
        payload = json.loads(resp.read())
    txs = payload.get("txs", [])[:per_poll]
    fields = [f.name for f in TRANSACTION_SCHEMA.fields]
    return [tuple(tx.get(f) for f in fields) for tx in txs]


def _poll(endpoint: str, poll: int, per_poll: int, seed: str) -> list[tuple]:
    if endpoint.startswith("fake://"):
        return fake_poll_rows(poll, per_poll, seed)
    return _http_poll_rows(endpoint, per_poll)


class _PollPartition(InputPartition):
    def __init__(self, poll: int):
        self.poll = poll


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint", "fake://blockchain")
        self.per_poll = int(options.get("per_poll", "100"))
        self.num_polls = int(options.get("num_polls", "10"))

    def partitions(self) -> Sequence[InputPartition]:
        # one poll per partition: a historical backfill of M polls
        # fans out M-wide with no skew (every poll is the same size)
        return [_PollPartition(i) for i in range(self.num_polls)]

    def read(self, partition: _PollPartition) -> Iterator[tuple]:
        yield from _poll(self.endpoint, partition.poll, self.per_poll, "graft")


class _StreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint", "fake://blockchain")
        self.per_poll = int(options.get("per_poll", "100"))

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        poll = start["poll"]
        rows = _poll(self.endpoint, poll, self.per_poll, "graft")
        return iter(rows), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay for recovery: deterministic for fake://, best-effort
        # re-poll for live endpoints (at-least-once, see module doc)
        for poll in range(start["poll"], end["poll"]):
            yield from _poll(self.endpoint, poll, self.per_poll, "graft")


class BlockchainPollDataSource(DataSource):
    """``spark.read/readStream.format("blockchain_poll")``.

    Options: ``endpoint`` (fake://... | http(s)://...), ``per_poll``
    (default 100), ``num_polls`` (batch mode backfill width).
    """

    @classmethod
    def name(cls) -> str:
        return "blockchain_poll"

    def schema(self):
        return TRANSACTION_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(BlockchainPollDataSource)
