"""Streaming pipeline runtime — threaded software pipelining.

Reference contract: RTL/dataloader.py (a fork of the torch 1.4 DataLoader)
chains ``processors=[fn, ...]`` as per-stage daemon threads connected by
queues, so stage k of frame i overlaps stage k-1 of frame i+1
(dataloader.py:734-751, 1026-1054); it detects dead workers
(:772-809) and runs an elaborate multi-stage shutdown (:939-1009).

TPU-native redesign: the heavy per-frame compute is ONE fused XLA program
(monoport_tpu.engine), so the pipeline's job shrinks to what a host should
do — capture, preprocess, enqueue to device, and drain results — but the
runtime is still a general N-stage threaded pipeline:

  * each stage owns a daemon thread and bounded in/out queues
    (backpressure instead of unbounded growth);
  * exceptions are captured per stage and re-raised at the consumer with
    the stage name (the reference's worker-death detection analog);
  * ordered delivery is preserved by construction (single thread per
    stage, FIFO queues);
  * shutdown: a sentinel flows through all stages; ``close()`` is
    idempotent and joins every thread (the reference's reverse-order
    done-event protocol collapses to this because threads never share
    state outside the queues);
  * per-stage EMA latency stats for observability (SURVEY §5.1 notes the
    reference has none beyond tqdm).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Any, Callable, Iterable, Iterator, Sequence


class _Sentinel:
    pass


_DONE = _Sentinel()


@dataclasses.dataclass
class StageStats:
    name: str
    frames: int = 0
    ema_ms: float = 0.0
    last_ms: float = 0.0

    def update(self, dt: float) -> None:
        ms = dt * 1e3
        self.frames += 1
        self.last_ms = ms
        self.ema_ms = ms if self.frames == 1 else (
            0.9 * self.ema_ms + 0.1 * ms)


class _StageError:
    def __init__(self, stage: str, exc: BaseException):
        self.stage = stage
        self.exc = exc


class Pipeline:
    """N-stage threaded pipeline over a source iterable.

    Args:
      source: iterable producing the initial payloads (frames).
      processors: stage callables, each ``payload -> payload`` (the
        reference passes dicts through; any object works).
      max_queue: per-queue bound (backpressure depth; 2 = double buffer).
    """

    def __init__(self, source: Iterable, processors: Sequence[Callable],
                 max_queue: int = 2, name: str = "pipeline"):
        self.source = source
        self.processors = list(processors)
        self.name = name
        self._queues = [queue.Queue(maxsize=max_queue)
                        for _ in range(len(self.processors) + 1)]
        self.stats = [StageStats("source")] + [
            StageStats(getattr(p, "__name__", f"stage{i}"))
            for i, p in enumerate(self.processors)]
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        self._started = False

    # -- workers ------------------------------------------------------------
    def _source_loop(self) -> None:
        st = self.stats[0]
        try:
            t_prev = time.perf_counter()
            for item in self.source:
                if self._stop.is_set():
                    break
                now = time.perf_counter()
                st.update(now - t_prev)
                t_prev = now
                self._put(self._queues[0], item)
            self._put(self._queues[0], _DONE, force=True)
        except BaseException as exc:  # noqa: BLE001 - forwarded to consumer
            self._put(self._queues[0], _StageError("source", exc), force=True)

    def _stage_loop(self, idx: int) -> None:
        fn = self.processors[idx]
        in_q, out_q = self._queues[idx], self._queues[idx + 1]
        st = self.stats[idx + 1]
        while not self._stop.is_set():
            item = in_q.get()
            if isinstance(item, (_Sentinel, _StageError)):
                self._put(out_q, item, force=True)
                return
            try:
                t0 = time.perf_counter()
                out = fn(item)
                st.update(time.perf_counter() - t0)
            except BaseException as exc:  # noqa: BLE001
                self._put(out_q, _StageError(st.name, exc), force=True)
                return
            self._put(out_q, out)

    def _put(self, q: queue.Queue, item: Any, force: bool = False) -> None:
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue
        if force:  # drain one slot so shutdown markers always land
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            try:
                q.put_nowait(item)
            except queue.Full:
                pass

    # -- public API ---------------------------------------------------------
    def start(self) -> "Pipeline":
        if self._started:
            return self
        self._started = True
        self._threads = [threading.Thread(
            target=self._source_loop, name=f"{self.name}-source",
            daemon=True)]
        for i in range(len(self.processors)):
            self._threads.append(threading.Thread(
                target=self._stage_loop, args=(i,),
                name=f"{self.name}-{self.stats[i + 1].name}", daemon=True))
        for t in self._threads:
            t.start()
        return self

    def __iter__(self) -> Iterator[Any]:
        self.start()
        out_q = self._queues[-1]
        while True:
            item = out_q.get()
            if isinstance(item, _Sentinel):
                return
            if isinstance(item, _StageError):
                self.close()
                raise RuntimeError(
                    f"pipeline stage '{item.stage}' failed") from item.exc
            yield item

    def close(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)

    def __enter__(self) -> "Pipeline":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()

    def report(self) -> str:
        lines = [f"[{self.name}] per-stage latency (EMA):"]
        for st in self.stats:
            lines.append(f"  {st.name:>24}: {st.ema_ms:7.2f} ms "
                         f"({st.frames} frames)")
        return "\n".join(lines)
