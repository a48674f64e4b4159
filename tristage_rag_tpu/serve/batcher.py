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
    """

    def __init__(
        self,
        batch_fn: Callable[[list[TReq]], list[TRes]],
        max_batch: int = 32,
        max_wait_ms: float = 2.0,
        executor=None,
    ):
        self.batch_fn = batch_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.executor = executor
        self._queue: Optional[asyncio.Queue] = None
        self._worker: Optional[asyncio.Task] = None
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
