"""Async orchestration: background mapping/loop-closing worker.

The reference runs LocalMapping and LoopClosing as persistent threads fed by
mutex-guarded keyframe queues (System.cc:97-103, LocalMapping.cc:47-123,
LoopClosing.cc:64-98), with tracking holding the global map lock per frame
(Tracking.cc:299). This orchestrator reproduces that architecture with one
worker thread consuming a keyframe queue and running the two stages in
order; the tracker keeps latency-critical per-frame work on the caller's
thread and hands keyframes off without blocking.

A single re-entrant map lock plays the role of Map::mMutexMapUpdate: the
tracker takes it for the duration of a frame step; the worker takes it
around each mapping stage, so tracking observes consistent snapshots.
"""
from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np


class MappingWorker:
    def __init__(self, local_mapper, loop_closer, map_lock: threading.RLock,
                 sync_mapping: bool = False):
        """`sync_mapping`: run local mapping inline on the inserting
        (tracker) thread and keep only loop closing on the worker. Used for
        monocular, where triangulation is the sole source of map points:
        the reference never queues monocular keyframes behind a busy mapper
        (Tracking.cc:1277-1297) because tracking accuracy depends on the
        keyframe being mapped before the next frame; when frames arrive
        faster than real time (offline drives) only inline processing
        preserves that invariant."""
        self.local_mapper = local_mapper
        self.loop_closer = loop_closer
        self.map_lock = map_lock
        self.sync_mapping = sync_mapping
        self.queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._idle = threading.Event()
        self._idle.set()
        # serializes idle-flag transitions against enqueues: without it the
        # worker's empty-poll could mark idle in the instant between the
        # tracker's _idle.clear() and queue.put(), making wait_idle()/c1b
        # report idle with an unprocessed keyframe queued
        self._idle_lock = threading.Lock()
        self.loops_closed = 0
        if local_mapper is not None:
            local_mapper.pending_fn = \
                (lambda: False) if sync_mapping else \
                (lambda: not self.queue.empty())
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="mapping-worker")
        self._thread.start()
        # join this thread BEFORE interpreter teardown: a daemon worker
        # mid-XLA-call when the runtime is torn down aborts the process
        # ("FATAL: exception not rethrown"). The thread keeps the worker
        # alive regardless, so a strong atexit ref costs nothing; stop()
        # is idempotent and explicit shutdown() makes this a no-op.
        import atexit
        atexit.register(self.stop)

    # ------------------------------------------------------------------
    def insert_keyframe(self, kf: int, word_ids: Optional[np.ndarray]) -> None:
        """Tracking -> mapping handoff (LocalMapping::InsertKeyFrame)."""
        mapped = False
        if self.sync_mapping and self.local_mapper is not None:
            self.local_mapper.process_keyframe(kf)
            mapped = True
        with self._idle_lock:
            self._idle.clear()
            self.queue.put((kf, word_ids, mapped))

    def queue_size(self) -> int:
        return self.queue.qsize()

    def idle(self) -> bool:
        """bLocalMappingIdle (LocalMapping::AcceptKeyFrames true + queue
        empty): local mapping is caught up. With sync_mapping, mapping runs
        inline at insertion and is always caught up; the loop-closing
        backlog does not gate keyframe insertion (the reference's
        LoopClosing queue never does)."""
        return self.sync_mapping or self._idle.is_set()

    def accept_keyframes(self) -> bool:
        """LocalMapping::AcceptKeyFrames analogue: don't pile up keyframes
        faster than the worker drains them (LocalMapping.cc:624-640)."""
        return self.queue.qsize() < 3

    def wait_idle(self, timeout: float = 60.0) -> bool:
        return self._idle.wait(timeout)

    def stop(self) -> None:
        self._stop.set()
        self.queue.put(None)
        self._thread.join(timeout=60.0)

    # ------------------------------------------------------------------
    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                item = self.queue.get(timeout=0.5)
            except queue.Empty:
                with self._idle_lock:
                    if self.queue.empty():
                        self._idle.set()
                continue
            if item is None:
                break
            kf, word_ids, mapped = item
            try:
                # the local mapper manages its own lock scope: host-state
                # staging/apply under the shared map lock, device solves
                # unlocked so tracker frames are never blocked behind a
                # multi-round-trip mapping stage (the reference likewise
                # holds mMutexMapUpdate only across write-backs). With a
                # backlog (tracker outrunning mapping) the stages turn
                # atomic, throttling the tracker until mapping catches up.
                if self.local_mapper is not None and not mapped:
                    self.local_mapper.process_keyframe(
                        kf, backlog=self.queue.qsize() > 0)
                if self.loop_closer is not None and word_ids is not None:
                    stats = getattr(self.local_mapper, "stats", None)
                    import contextlib
                    stage = stats.stage("loop_closing") if stats is not None \
                        else contextlib.nullcontext()
                    with stage, self.map_lock:
                        if self.loop_closer.process_keyframe(kf, word_ids):
                            self.loops_closed += 1
            except Exception:  # pragma: no cover - worker must not die
                import traceback
                traceback.print_exc()
            with self._idle_lock:
                if self.queue.empty():
                    self._idle.set()
