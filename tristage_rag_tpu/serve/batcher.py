"""Async micro-batching for serving.

Concurrent MCP/web requests coalesce into batches so encoder forwards
are shared: the first request opens a window (``max_wait_ms``); any
request arriving before the current batch finishes joins the next one.
This is the TPU-native replacement for the reference's
blocking-in-the-event-loop dispatch (src/mcp_retrieval_server.py:
148-155; SURVEY.md §7 "serving concurrency").
"""

from __future__ import annotations

import asyncio
import logging
from typing import Callable, Generic, Optional, TypeVar

logger = logging.getLogger(__name__)

TReq = TypeVar("TReq")
TRes = TypeVar("TRes")


class MicroBatcher(Generic[TReq, TRes]):
    """Collects requests and runs ``batch_fn`` on lists of them.

    ``batch_fn: list[TReq] -> list[TRes]`` runs in a worker thread
    (it is allowed to block — it drives the TPU).

    Pipelined mode (``dispatch_fn`` instead of ``batch_fn``):
    ``dispatch_fn: list[TReq] -> () -> list[TRes]`` splits each batch
    into a dispatch phase (runs on ``executor``, the serving worker
    thread) and a finalize closure (the blocking device->host fetch +
    formatting, runs on a dedicated single fetch thread). The worker
    loop dispatches the NEXT batch while up to ``max_inflight`` earlier
    batches are still fetching — the dispatch of batch i+1 overlaps the
    device time and fetch round-trip of batch i. The single fetch
    thread keeps finalizes in dispatch order, so per-client response
    ordering is unchanged.
    """

    def __init__(
        self,
        batch_fn: Optional[Callable[[list[TReq]], list[TRes]]] = None,
        max_batch: int = 32,
        max_wait_ms: float = 2.0,
        executor=None,
        dispatch_fn: Optional[
            Callable[[list[TReq]], Callable[[], list[TRes]]]
        ] = None,
        max_inflight: int = 2,
    ):
        if (batch_fn is None) == (dispatch_fn is None):
            raise ValueError(
                "provide exactly one of batch_fn (simple mode) or "
                "dispatch_fn (pipelined mode)"
            )
        self.batch_fn = batch_fn
        self.dispatch_fn = dispatch_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.executor = executor
        self.max_inflight = max(1, max_inflight)
        self._queue: Optional[asyncio.Queue] = None
        self._worker: Optional[asyncio.Task] = None
        self._inflight: list[asyncio.Task] = []
        self._fetch_executor = None
        if dispatch_fn is not None:
            from concurrent.futures import ThreadPoolExecutor

            self._fetch_executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="fetch"
            )
        self.pending = 0
        self.batches_run = 0
        self.requests_served = 0

    async def start(self) -> None:
        if self._worker is not None:
            return
        self._queue = asyncio.Queue()
        self._worker = asyncio.create_task(self._run())

    async def stop(self) -> None:
        if self._worker is not None:
            self._worker.cancel()
            try:
                await self._worker
            except asyncio.CancelledError:
                pass
            self._worker = None
        if self._inflight:
            await asyncio.gather(*self._inflight, return_exceptions=True)
            self._inflight.clear()

    async def submit(self, request: TReq) -> TRes:
        if self._queue is None:
            await self.start()
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        self.pending += 1
        await self._queue.put((request, fut))
        try:
            return await fut
        finally:
            self.pending -= 1

    async def _run(self) -> None:
        loop = asyncio.get_running_loop()
        while True:
            first = await self._queue.get()
            batch = [first]
            # linger briefly to let concurrent requests coalesce
            deadline = loop.time() + self.max_wait
            while len(batch) < self.max_batch:
                timeout = deadline - loop.time()
                if timeout <= 0:
                    break
                try:
                    item = await asyncio.wait_for(self._queue.get(), timeout)
                    batch.append(item)
                except asyncio.TimeoutError:
                    break
            requests = [r for r, _ in batch]
            if self.dispatch_fn is not None:
                await self._run_pipelined(loop, batch, requests)
                continue
            try:
                results = await loop.run_in_executor(
                    self.executor, self.batch_fn, requests
                )
                if len(results) != len(batch):
                    raise RuntimeError(
                        f"batch_fn returned {len(results)} results for "
                        f"{len(batch)} requests"
                    )
                for (_, fut), res in zip(batch, results):
                    if not fut.done():
                        fut.set_result(res)
            except Exception as e:
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
            self.batches_run += 1
            self.requests_served += len(batch)

    async def _run_pipelined(self, loop, batch, requests) -> None:
        # Backpressure: the device queue (and host memory pinned by
        # un-fetched results) must stay bounded — wait for the oldest
        # in-flight finalize before dispatching past the cap.
        while len(self._inflight) >= self.max_inflight:
            oldest = self._inflight[0]
            await asyncio.wait({oldest})
            if oldest in self._inflight:
                self._inflight.remove(oldest)
        try:
            finalize = await loop.run_in_executor(
                self.executor, self.dispatch_fn, requests
            )
        except Exception as e:
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
            self.batches_run += 1
            self.requests_served += len(batch)
            return
        task = loop.create_task(self._finish(batch, finalize))
        self._inflight.append(task)
        task.add_done_callback(self._on_finish_done)

    def _on_finish_done(self, task) -> None:
        if task in self._inflight:
            self._inflight.remove(task)

    async def _finish(self, batch, finalize) -> None:
        loop = asyncio.get_running_loop()
        try:
            results = await loop.run_in_executor(
                self._fetch_executor, finalize
            )
            if len(results) != len(batch):
                raise RuntimeError(
                    f"finalize returned {len(results)} results for "
                    f"{len(batch)} requests"
                )
            for (_, fut), res in zip(batch, results):
                if not fut.done():
                    fut.set_result(res)
        except Exception as e:
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
        self.batches_run += 1
        self.requests_served += len(batch)
