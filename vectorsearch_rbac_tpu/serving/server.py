"""Online serving front-end: micro-batching scheduler over a searcher.

The reference isolates concurrent clients with per-user psycopg2
connection pools (reference services/config.py:47-131
initialize_user_connections / get_db_connection_from_pool) and serves one
SQL query per request; Postgres provides the concurrency. The TPU engine
is batch-synchronous — per-query dispatches would waste the MXU and pay a
full tunnel/dispatch round trip each — so the production front-end is the
inverse shape: many concurrent clients SUBMIT single queries, and one
dispatch thread COALESCES them into device batches.

- `submit()` is thread-safe and returns a waitable ticket; any number of
  client threads may call it concurrently.
- The dispatch loop drains whatever is queued, up to `max_batch`; if the
  queue is empty it blocks, and once ONE request arrives it waits at most
  `max_wait_ms` for stragglers (classic micro-batching latency/throughput
  knob: 0 = lowest latency, larger = bigger batches under load).
- Requests are grouped by `k` within a drain (per-query topk rides each
  reference query-dataset entry, read_dataset_function.py:718).
- All device work happens on the dispatch thread — searchers keep host
  state and are not thread-safe; this is the single-writer discipline.

Shutdown: `close()` drains outstanding requests, then stops the thread.
Metrics: per-request wall latency + batch-size histogram (`stats()`).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.logger import get_logger

logger = get_logger("serving")


@dataclass
class SearchResult:
    dists: np.ndarray      # (k,)
    row_ids: np.ndarray    # (k,) arena rows, -1 pads
    latency_ms: float = 0.0
    batch_size: int = 0    # size of the device batch that served this


@dataclass
class SearchRequest:
    query: np.ndarray
    user_id: int
    k: int
    t_submit: float = field(default_factory=time.perf_counter)
    _event: threading.Event = field(default_factory=threading.Event)
    _result: Optional[SearchResult] = None
    _error: Optional[BaseException] = None

    def result(self, timeout: Optional[float] = None) -> SearchResult:
        if not self._event.wait(timeout):
            raise TimeoutError("search request timed out")
        if self._error is not None:
            raise self._error
        assert self._result is not None
        return self._result


class BatchingServer:
    def __init__(
        self,
        searcher,
        user_masks: np.ndarray,
        max_batch: int = 2048,
        max_wait_ms: float = 2.0,
    ):
        self._searcher = searcher
        self._user_masks = user_masks
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._q: "queue.Queue[Optional[SearchRequest]]" = queue.Queue()
        self._batch_sizes: List[int] = []
        self._served = 0
        self._lock = threading.Lock()
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="vsrbac-dispatch")
        self._thread.start()

    # ------------------------------------------------------------- client

    def submit(self, query: np.ndarray, user_id: int, k: int) -> SearchRequest:
        req = SearchRequest(query=np.asarray(query, dtype=np.float32),
                            user_id=int(user_id), k=int(k))
        # closed-check and enqueue under one lock: without it, a submit
        # that passes the check can enqueue AFTER close() drains leftovers
        # and its result() would hang forever
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._q.put(req)
        return req

    def search(self, query: np.ndarray, user_id: int, k: int,
               timeout: Optional[float] = None) -> SearchResult:
        """Blocking convenience wrapper: submit + wait."""
        return self.submit(query, user_id, k).result(timeout)

    # ----------------------------------------------------------- dispatch

    def _drain(self) -> List[SearchRequest]:
        """Block for the first request, then micro-batch stragglers."""
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            try:
                if remaining > 0:
                    nxt = self._q.get(timeout=remaining)
                else:  # window closed: take only what is already queued
                    nxt = self._q.get_nowait()
            except queue.Empty:
                break
            if nxt is None:            # close sentinel: put it back for the
                self._q.put(None)      # outer loop, serve what we have
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while True:
            batch = self._drain()
            if not batch:
                return
            by_k: Dict[int, List[SearchRequest]] = {}
            for r in batch:
                by_k.setdefault(r.k, []).append(r)
            for k, reqs in by_k.items():
                self._serve(reqs, k)
            self._account(len(batch))

    def _serve(self, reqs: List[SearchRequest], k: int) -> None:
        try:
            q = np.stack([r.query for r in reqs])
            uids = np.asarray([r.user_id for r in reqs])
            d, i = self._searcher.search_batch(q, uids, self._user_masks, k)
            now = time.perf_counter()
            for j, r in enumerate(reqs):
                r._result = SearchResult(
                    dists=np.asarray(d[j]), row_ids=np.asarray(i[j]),
                    latency_ms=(now - r.t_submit) * 1e3,
                    batch_size=len(reqs))
                r._event.set()
        except BaseException as e:  # propagate to every waiter
            for r in reqs:
                r._error = e
                r._event.set()

    def _account(self, batch_size: int) -> None:
        with self._lock:
            self._batch_sizes.append(batch_size)
            self._served += batch_size

    # ------------------------------------------------------------ control

    def stats(self) -> Dict[str, float]:
        with self._lock:
            bs = list(self._batch_sizes)
            served = self._served
        return {
            "served": served,
            "dispatches": len(bs),
            "avg_batch": float(np.mean(bs)) if bs else 0.0,
            "max_batch": int(np.max(bs)) if bs else 0,
        }

    def close(self) -> None:
        """Serve everything queued, then stop the dispatch thread."""
        with self._lock:
            self._closed = True
            self._q.put(None)  # all prior submits precede the sentinel
        self._thread.join()
        # drain any requests that raced past the sentinel
        leftovers: List[SearchRequest] = []
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is not None:
                leftovers.append(r)
        if leftovers:  # unreachable with the submit lock; kept as a belt
            by_k: Dict[int, List[SearchRequest]] = {}
            for r in leftovers:
                by_k.setdefault(r.k, []).append(r)
            for k, reqs in by_k.items():
                self._serve(reqs, k)
            self._account(len(leftovers))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
